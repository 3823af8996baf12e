package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed interval algebra over session/interval tables — the
  * sweep-line family (peak concurrency, covered time) that operations
  * dashboards and capacity planners ask of an event store.
  *
  * The classic single-machine sweep sorts ALL boundary events by time —
  * a data-sized total order. The distributed form here buckets time
  * first: every interval is SPLIT at bucket boundaries (a per-row
  * generator explode, fanout = interval span / bucket), after which each
  * bucket's sweep is independent — the per-bucket window partition is
  * bounded by that bucket's event volume and buckets run in parallel.
  * Bucket granularity is the parallelism/size knob (day here; an hour
  * for denser streams). No carry-in bookkeeping: a spanning interval
  * contributes a fragment starting at the bucket's first instant, so
  * each bucket is self-contained by construction.
  */
object Intervals {

  private val DayUs = 86400000000L

  /** Per-day peak concurrency and covered (union) seconds over an
    * interval table (startCol/endCol timestamps, any number of
    * overlapping rows — e.g. [[Sessionize.sessions]] output across all
    * users).
    *
    * Sweep semantics: half-open [start, end) — at an identical
    * timestamp an END is processed before a START (delta ascending in
    * the order), so back-to-back intervals never double-count. Covered
    * time sums gaps between consecutive boundary events while the
    * running count is positive. Zero-length intervals contribute no
    * coverage and no concurrency by the same rule. */
  def dailyCoverage(
      intervals: DataFrame,
      startCol: String,
      endCol: String): DataFrame = {
    val su = unix_micros(col(startCol))
    val eu = unix_micros(col(endCol))
    // split at day boundaries: one fragment per covered day
    val frags = intervals
      .select(su.as("su"), eu.as("eu"))
      .withColumn("day", explode(sequence(
        floor(col("su") / DayUs).cast("long"),
        floor(greatest(col("eu") - 1, col("su")) / DayUs).cast("long"))))
      .select(col("day"),
        greatest(col("su"), col("day") * DayUs).as("fs"),
        least(col("eu"), (col("day") + 1) * DayUs).as("fe"))
      .filter(col("fs") < col("fe"))
    // boundary events: +1 at fragment start, -1 at fragment end
    val events = frags.select(col("day"), col("fs").as("t"), lit(1).as("d"))
      .unionByName(frags.select(col("day"), col("fe").as("t"), lit(-1).as("d")))
      // coalesce same-(t, d) boundaries: count them instead of windowing
      // over every duplicate row (ends sort before starts via d asc)
      .groupBy("day", "t", "d").agg(sum("d").as("delta"))
    val w = Window.partitionBy("day").orderBy(col("t").asc, col("d").asc)
    val swept = events
      .withColumn("conc", sum("delta").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_t", lead("t", 1).over(w))
    swept.groupBy("day")
      .agg(
        max("conc").cast("long").as("peak_concurrency"),
        round(sum(when(col("conc") > 0 && col("next_t").isNotNull,
          col("next_t") - col("t")).otherwise(lit(0L))) / 1e6, 3)
          .as("covered_sec"),
        sum(when(col("delta") > 0, col("delta")).otherwise(lit(0L)))
          .cast("long").as("n_starts"))
      .select(
        to_date(timestamp_micros(col("day") * DayUs)).as("day"),
        col("peak_concurrency"), col("covered_sec"), col("n_starts"))
  }
}
