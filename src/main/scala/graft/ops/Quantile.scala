package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log-histogram quantile sketch — the quantile member of the
  * repo's sketch family (HLL registers = distinct count, count-min =
  * frequency, SpaceSaving = top-k). An HdrHistogram-style encoding with
  * one significant bit: a positive long lands in bucket
  * (octave = bit length, half = second-most-significant bit), giving two
  * buckets per power of two and a guaranteed ≤ 25% relative error at the
  * midpoint estimate — deterministic, no RNG, no sampling.
  *
  * Scale shape: the sketch is ONE partial-aggregated groupBy over a
  * scan-side bucket projection — map-side combine caps shuffle volume at
  * O(buckets · partitions) (≤ 128 rows each) regardless of event count,
  * and cellwise count-sum merges sub-sketches (hour → day → corpus
  * rollups) exactly like the CMS grid. Quantile extraction walks the
  * ≤ 128-row bucket table with a single-partition window — driver-free
  * and trivially cheap because the sketch, not the data, is what's
  * ordered. Bucket math is pure integer/string ops (bin(), substring) —
  * bit-exact across engines, no floating-point boundary ambiguity.
  */
object Quantile {

  /** The sketch: (oct, half, cnt) bucket counts of a positive long
    * expression. Bucket low edge = 2^(oct-1) + half·2^(oct-2).
    * Non-positive inputs are dropped up front: bin() of a negative long
    * is its 64-char two's-complement (a wildly wrong oct=64 bucket) and
    * 0 would alias the value-1 bucket — neither is a representable
    * histogram point, so filtering is the only non-corrupting choice. */
  def logHist(df: DataFrame, value: Column): DataFrame =
    df.filter(value > 0)
      .select(length(bin(value)).cast("int").as("oct"),
        when(length(bin(value)) === 1, 0)
          .otherwise(substring(bin(value), 2, 1).cast("int")).as("half"))
      .groupBy("oct", "half")
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a sketch: for each q, the midpoint of the
    * first bucket whose cumulative count reaches ceil(q·N). ONE pass
    * over the sketch — the q list joins as a broadcast table and the
    * per-q argmin is a min-of-struct aggregate, so the (possibly
    * expensive) hist lineage executes once regardless of |qs|. The
    * window is single-partition BY DESIGN — it orders the ≤ 128-row
    * sketch, not the data. */
  def quantileEstimates(hist: DataFrame, qs: Seq[Double]): DataFrame = {
    val w = Window.orderBy("oct", "half")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = when(col("oct") === 1, lit(1.0)).otherwise(
      pow(lit(2.0), col("oct") - 1) + col("half") * pow(lit(2.0), col("oct") - 2)
        + pow(lit(2.0), col("oct") - 2) / 2.0)
    val qtab = {
      val s = hist.sparkSession
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        qs.map(q => org.apache.spark.sql.Row(q)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("q",
            org.apache.spark.sql.types.DoubleType))))
    }
    // N rides the same single-partition window sort as cum — the hist
    // lineage executes exactly once (no second aggregate branch)
    val wAll = Window.orderBy("oct", "half")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(wAll))
      .crossJoin(broadcast(qtab))
      .filter(col("cum") >= ceil(col("n") * col("q")))
      .groupBy("q")
      .agg(min(struct(col("oct"), col("half"), est.as("est"))).as("_m"))
      .select(col("q"), col("_m.est").as("est"))
  }

  /** Robust per-group outlier detection via median absolute deviation
    * (Hampel's rule): flag |v − median| > k · 1.4826 · MAD, the
    * estimator that survives the very outliers it hunts (a mean/stddev
    * z-score gets dragged by them — the textbook failure this replaces).
    * 1.4826 scales MAD to σ under normality; k = 3 is the standard cut.
    *
    * Two exact-percentile aggregation passes over the value column
    * (medians per group, then deviations against the broadcast median
    * table) plus one counting pass — three partial-agg groupBys, no
    * windows, no sort. Exact interpolated percentile on both engines
    * (Spark `percentile` ≡ DuckDB `quantile_cont`). */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    // No forced broadcast: the median/MAD tables are GROUP-cardinality
    // sized — broadcast-small for typical grouping but driver-OOM bait
    // for a high-cardinality groupCol. AQE broadcasts them when they
    // measure small and shuffles when they don't, which is the right
    // call at every cardinality.
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val mad = df.join(med, groupCol)
      .withColumn("_ad", abs(col(valueCol) - col("med")))
      .groupBy(groupCol)
      .agg(expr("percentile(_ad, 0.5)").as("mad"), first("med").as("med"))
    df.join(mad, groupCol)
      .withColumn("_thresh", lit(k) * lit(1.4826) * col("mad"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(when(abs(col(valueCol) - col("med")) > col("_thresh"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(first("med"), 6).as("median"),
        round(first("mad"), 6).as("mad"))
      .select(col(groupCol), col("n"), col("n_outliers"),
        col("median"), col("mad"),
        round(col("n_outliers").cast("double") / col("n"), 6).as("outlier_rate"))
  }
}
