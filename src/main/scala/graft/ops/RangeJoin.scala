package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: pair every point with every same-key interval
  * containing it — `point.t ∈ [lo, hi]`.
  *
  * Spark plans a raw `p.t BETWEEN i.lo AND i.hi` join condition as
  * BroadcastNestedLoop (or cartesian when neither side broadcasts): every
  * point × every interval, O(n·m) at scale. The bucketed encoding turns it
  * into an ordinary shuffled equi-join:
  *
  *   - intervals explode to the fixed-width buckets they overlap
  *     (`sequence(floor(lo/w), floor(hi/w))` — short for intervals not
  *     much longer than the bucket width);
  *   - points map to their single bucket (`floor(t/w)`);
  *   - equi-join on (key, bucket), then the exact BETWEEN as a residual
  *     filter.
  *
  * A point lives in exactly one bucket and an interval emits each bucket
  * once, so no pair can duplicate — no DISTINCT pass needed. Cost: one
  * shuffle of points + (intervals × avg buckets per interval), hash-
  * partitioned on a high-cardinality compound key; skew is per (key,
  * bucket), AQE-splittable. Pick `bucketWidth` ≈ the typical interval
  * length: ~2 buckets per interval, candidate density ≈ true-match
  * density. (DuckDB/Postgres solve this with interval trees; Spark-native
  * engines — e.g. Databricks' range-join hints — use exactly this binning.)
  */
object RangeJoin {

  /** Join `points` (carrying `ptCol`) to `intervals` (carrying `loCol`,
    * `hiCol`) on same `key` and `ptCol ∈ [loCol, hiCol]`. All three bound
    * columns must be numeric (e.g. epoch micros); every other column of
    * both inputs survives (names must not collide apart from `key`). */
  def bucketedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      ptCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // the column name doubles as the RangeJoinRewrite marker, so the
    // conf-gated optimizer rule never re-bins an already-binned join
    val b = "_graft_bucket"
    // Floor-division in pure Long arithmetic (negative-safe via pmod): the
    // earlier floor(c / width) ran through Double, which is only exact
    // below 2^53 — wrong for general 64-bit keys. `(c - pmod(c, w)) div w`
    // stays integral end to end (Column `/` would also detour via Double).
    def bucketOf(c: Column): Column = {
      import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal, Pmod, Subtract}
      import org.apache.spark.sql.graftshim.ColumnExpr
      val e = ColumnExpr.expr(c)
      val w = Literal(bucketWidth)
      ColumnExpr.column(IntegralDivide(Subtract(e, Pmod(e, w)), w))
    }
    val pb = points.withColumn(b, bucketOf(col(ptCol)))
    val ib = intervals.withColumn(b,
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    pb.join(ib, Seq(key, b))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop(b)
  }
}
