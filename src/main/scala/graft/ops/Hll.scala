package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog approximate distinct counts (Flajolet et al. 2007) as a
  * pure DataFrame encoding — no custom aggregate class: the register
  * table IS a groupBy-max, so Spark's partial aggregation gives the
  * distributed register merge (max per bucket) for free, map-side, which
  * is the whole trick of the sketch. Hashing is md5-derived and engine-
  * portable, so unlike library HLLs the estimate is bit-reproducible and
  * oracle-checkable — and at 100 TB the shuffle carries at most
  * groups × m register rows, independent of row count.
  */
object Hll {

  /** Registers: bucket = first `bBits` of md5(value); rank = position of
    * the first 1-bit in the next 48 hash bits (+1), maxed per bucket.
    * (49 means "those 48 bits were all zero" — kept deterministic rather
    * than statistically exact; both engines agree on it.) */
  private val HexDigits = 12 // 48 bits of rank material

  /** The register table (groupCol, _bucket, r) — a single groupBy-max,
    * so it runs unchanged as a STREAMING aggregation (one stateful op;
    * the state store holds exactly the registers and merges by max).
    * This is the persisted form of the sketch: registers from disjoint
    * slices of the data union by max, which is why the same estimate
    * falls out however the input was split. */
  def registers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bBits: Int = 8): DataFrame =
    registersBy(df, Seq(groupCol), valueCol, bBits)

  /** [[registers]] keyed by several columns — the persisted per-slice
    * form for incremental maintenance: write registers per (group,
    * ingest slice), and merging slices is a groupBy-max over the key
    * alone (max is the register monoid), bit-identical to recomputing
    * from raw data. */
  def registersBy(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      bBits: Int = 8): DataFrame = {
    val bucketChars = bBits / 4 // whole hex chars keep both engines trivial
    require(bBits % 4 == 0, "bBits must be a multiple of 4")
    val h = md5(col(valueCol).cast("string"))
    val bucket = conv(substring(h, 1, bucketChars), 16, 10).cast("int")
    val remHex = substring(h, bucketChars + 1, HexDigits)
    val rem = conv(remHex, 16, 10).cast("long")
    val rank = when(col("_rem") === 0L, lit(49))
      .otherwise(lit(49) - length(conv(col("_remhex"), 16, 2)))
    df.select(groupCols.map(col) ++
        Seq(bucket.as("_bucket"), rem.as("_rem"), remHex.as("_remhex")): _*)
      .withColumn("_rank", rank)
      .groupBy(groupCols.map(col) :+ col("_bucket"): _*)
      .agg(max("_rank").as("r"))
  }

  /** The read-side estimator fold over a register table — cheap, and
    * kept separate so a streaming sink of registers can be estimated
    * per read without a second stateful operator in the stream. */
  def estimateFromRegisters(regs: DataFrame, groupCol: String, bBits: Int = 8): DataFrame = {
    val m = 1 << bBits
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.groupBy(groupCol)
      .agg(
        count(lit(1)).as("_cnt"),
        sum(pow(lit(2.0), -col("r"))).as("_sumpow"))
      .withColumn("_raw",
        lit(alpha * m * m) / (col("_sumpow") + (lit(m) - col("_cnt"))))
      .withColumn("n_approx", round(
        when(col("_raw") <= 2.5 * m && col("_cnt") < m,
          lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("_cnt"))))
          .otherwise(col("_raw")), 4))
      .select(col(groupCol), col("n_approx"))
  }

  /** Registers + estimator in one batch plan. */
  def estimate(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bBits: Int = 8): DataFrame =
    estimateFromRegisters(registers(df, groupCol, valueCol, bBits), groupCol, bBits)

  /** Approximate distinct `valueCol` per `groupCol`, with the exact
    * count and relative error alongside (the exact side makes the
    * accuracy claim itself oracle-checkable). Batch-only — the exact
    * referee needs countDistinct; streams use [[estimate]]. */
  def approxDistinct(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bBits: Int = 8): DataFrame = {
    val exact = df.groupBy(groupCol)
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    exact.join(estimate(df, groupCol, valueCol, bBits), groupCol)
      .withColumn("rel_err",
        round(abs(col("n_approx") - col("n_exact")) / col("n_exact"), 4))
  }
}
