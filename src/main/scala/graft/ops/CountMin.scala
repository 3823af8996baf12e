package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a pure DataFrame encoding — the frequency-
  * estimation counterpart to the HyperLogLog registers in [[Hll]] and
  * the SpaceSaving top-k in [[graft.functions.TopKSketch]].
  *
  * The sketch is a d×w grid of counters: row j uses an independent
  * salted hash; a key's estimate is the MIN over its d bucket counters,
  * always ≥ the true count (counters only ever over-count on
  * collisions). Both halves are ordinary partial-aggregated shuffles:
  *
  *   - [[sketch]]: one groupBy over (row, bucket) — map-side combine
  *     collapses each input partition to ≤ d·w rows before the exchange,
  *     so the shuffle volume is O(d·w · partitions) no matter how many
  *     billions of events stream through. The resulting grid is also the
  *     mergeable form: sketches of two corpora union by summing cells.
  *   - [[estimates]]: the finished grid (≤ d·w rows) broadcasts to the
  *     key side — no second scan-sized shuffle.
  *
  * Hashing is the repo's standard cross-engine idiom: first 4 hex chars
  * of a salted md5 → int → mod w, reproducible verbatim in the DuckDB
  * oracle.
  */
object CountMin {

  private def bucketOf(key: Column, j: Int, w: Int): Column =
    pmod(
      conv(substring(md5(concat(lit(s"cms$j|"), key.cast("string"))), 1, 4), 16, 10)
        .cast("long"),
      lit(w.toLong))

  /** The d×w counter grid for `df`'s `keyCol`: (j, bucket, cnt). */
  def sketch(df: DataFrame, keyCol: String, d: Int = 3, w: Int = 32): DataFrame = {
    val rows = array((0 until d).map { j =>
      struct(lit(j).as("j"), bucketOf(col(keyCol), j, w).as("bucket"))
    }: _*)
    df.select(explode(rows).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-distinct-key CMS estimate vs exact count. The grid joins
    * broadcast (≤ d·w rows); `collided` marks keys whose estimate
    * over-counts, `rel_err` the relative overshoot. */
  def estimates(df: DataFrame, keyCol: String, d: Int = 3, w: Int = 32): DataFrame = {
    val grid = broadcast(sketch(df, keyCol, d, w))
    val keys = df.groupBy(keyCol).agg(count(lit(1)).cast("long").as("n_exact"))
    val rows = array((0 until d).map { j =>
      struct(lit(j).as("j"), bucketOf(col(keyCol), j, w).as("bucket"))
    }: _*)
    keys
      .select(col(keyCol), col("n_exact"), explode(rows).as("jb"))
      .join(grid, col("jb.j") === grid("j") && col("jb.bucket") === grid("bucket"))
      .groupBy(keyCol)
      .agg(
        first(col("n_exact")).as("n_exact"),
        min(col("cnt")).cast("long").as("cms_est"))
      .select(
        col(keyCol), col("n_exact"), col("cms_est"),
        (col("cms_est") > col("n_exact")).as("collided"),
        round((col("cms_est") - col("n_exact")) * 1.0 / col("n_exact"), 4)
          .as("rel_err"))
  }
}
