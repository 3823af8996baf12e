package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / bottom-k) distinct sketches (Bar-Yossef et
  * al. 2002; Beyer et al. SIGMOD'07). Complements [[Hll]]: HLL registers
  * union cheaply but CANNOT estimate intersections — the bottom-k
  * sketch can, because the k smallest hash values of A ∪ B are a
  * uniform sample of the union, and membership of each sampled value in
  * both input sketches is observable. This is the sketch family behind
  * "how much does corpus A overlap corpus B" audits when the exact
  * vocabulary join ([[graft.PipelineQueries.sourceOverlap]]-style) is
  * too expensive to run pairwise at 100 TB.
  *
  * Engine-portable hashing: u(v) = (conv(md5 prefix) + 1) / 16^12 ∈
  * (0, 1], identical in Spark and DuckDB, so every estimate is
  * bit-reproducible and oracle-checkable (the repo-wide md5 convention).
  *
  * Scale shape: per group the sketch is the k ascending-smallest
  * distinct hashes — computed as a distinct + two-phase per-key top-k
  * ([[Retrieval.topKPerKey]] ascending), so a group with billions of
  * distinct values still caps its window input at k · partitions rows.
  * Downstream pair estimation touches only k-row sketches: a per-pair
  * merge of 2k rows, broadcastable at any corpus size.
  */
object Kmv {

  private val Denom = 281474976710656.0 // 16^12

  /** The engine-portable hash fraction u(v) = (conv(md5 prefix) + 1) /
    * 16^12 ∈ (0, 1] — the ONE definition shared by the batch sketch and
    * [[graft.streaming.EventStreams.kmvDistinctStream]], so streaming
    * state always folds into batch sketches via [[merge]]. */
  private[graft] def hashFraction(v: Column): Column =
    (conv(substring(md5(v.cast("string")), 1, 12), 16, 10)
      .cast("double") + lit(1.0)) / lit(Denom)

  /** The per-group bottom-k sketch: (groupCol, u, rank, _k), rank 1..k
    * ascending by hash. The sketch of a group IS this k-row table —
    * persist it, union it, merge it (merge = k smallest of the union).
    * `_k` carries the capacity the sketch was BUILT with: every consumer
    * ([[estimate]]/[[merge]]/[[pairwise]]) asserts its k parameter
    * against it at execution, because a mismatched k (estimate(sk, 128)
    * on a k=256 sketch) silently produces a wrong (k−1)/u_k estimate and
    * a wrong exact-below-k branch — the failure must be loud. */
  def sketch(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 256): DataFrame = {
    val u = hashFraction(col(valueCol))
    Retrieval.topKPerKey(
      df.select(col(groupCol), col(valueCol))
        .distinct()
        .select(col(groupCol), u.as("u"))
        // md5 collisions across distinct values: keep one row per (g, u)
        .distinct(),
      Seq(groupCol), Seq(col("u").asc), k)
      .withColumn("_k", lit(k))
  }

  /** Execution-time guard: every row of the sketch must carry `_k` = the
    * caller's k. A filter whose predicate routes through assert_true —
    * the predicate is non-foldable, so Catalyst keeps it in the plan and
    * a k-mismatched call throws at the first row instead of returning a
    * plausible wrong estimate. A frame without `_k` (not built by
    * [[sketch]]/[[merge]]) fails analysis, which is the same contract
    * one level earlier. */
  private def requireK(sk: DataFrame, k: Int): DataFrame =
    sk.where(assert_true(col("_k") === lit(k),
      concat(lit("KMV k mismatch: sketch built with k="), col("_k"),
        lit(s", consumer called with k=$k"))).isNull)

  /** Distinct-count estimate per group from a [[sketch]]:
    * n̂ = (k − 1) / u_(k) (the classic KMV estimator); a group whose
    * sketch holds fewer than k values is EXACT (every distinct hash is
    * present), so the estimate is its row count. */
  def estimate(sk: DataFrame, groupCol: String, k: Int = 256): DataFrame =
    requireK(sk, k).groupBy(groupCol)
      .agg(count(lit(1)).as("_n"), max("u").as("_uk"))
      .select(col(groupCol),
        round(when(col("_n") < k, col("_n").cast("double"))
          .otherwise(lit(k - 1.0) / col("_uk")), 4).as("n_approx"))

  /** Monoid merge of two [[sketch]] tables — incremental maintenance:
    * the bottom-k of the UNION of two bottom-k sketches equals the
    * bottom-k of the combined data (every union-wide k-smallest hash is
    * k-smallest in whichever slice contained it), so per-slice sketches
    * fold into the exact full-corpus sketch without touching raw data —
    * the same checked merge ≡ recompute contract as the HLL registers
    * and the postings index. */
  def merge(a: DataFrame, b: DataFrame, groupCol: String, k: Int = 256): DataFrame =
    Retrieval.topKPerKey(
      requireK(a, k).select(col(groupCol), col("u"))
        .unionByName(requireK(b, k).select(col(groupCol), col("u")))
        .distinct(),
      Seq(groupCol), Seq(col("u").asc), k)
      .withColumn("_k", lit(k))

  /** Pairwise union/intersection/Jaccard estimates for every ORDERED
    * group pair (g_a < g_b) from one [[sketch]] table. For each pair the
    * merged bottom-k of the union is a uniform sample of A ∪ B; the
    * fraction ρ of sampled values present in BOTH sketches estimates
    * Jaccard, and intersection ≈ ρ · n̂(A ∪ B). Small-union pairs
    * (merged sketch < k values) are exact by the same argument as
    * [[estimate]].
    *
    * Everything after the sketch build is k-row-per-group arithmetic:
    * the pair join fans each group's k rows to its partners — at G
    * groups that is G²k/2 rows of DOUBLES, not corpus data. */
  def pairwise(sk0: DataFrame, groupCol: String, k: Int = 256): DataFrame = {
    val sk = requireK(sk0, k)
    val a = sk.select(col(groupCol).as("g_a"), col("u"))
    val b = sk.select(col(groupCol).as("g_b"), col("u"))
    // full outer per pair via union-side tagging: for each (g_a, g_b)
    // pair, collect the union of sketch values with both-membership
    val pairsAB = a.join(b.select(col("g_b")).distinct(), col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), col("u"), lit(1).as("in_a"), lit(0).as("in_b"))
    val pairsBA = b.join(a.select(col("g_a")).distinct(), col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), col("u"), lit(0).as("in_a"), lit(1).as("in_b"))
    val merged = pairsAB.unionByName(pairsBA)
      .groupBy("g_a", "g_b", "u")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    // bottom-k of each pair's merged value set
    val topk = Retrieval.topKPerKey(merged, Seq("g_a", "g_b"), Seq(col("u").asc), k)
    topk.groupBy("g_a", "g_b")
      .agg(
        count(lit(1)).as("_n"),
        max("u").as("_uk"),
        sum(col("in_a") * col("in_b")).as("_both"))
      .select(
        col("g_a"), col("g_b"),
        round(when(col("_n") < k, col("_n").cast("double"))
          .otherwise(lit(k - 1.0) / col("_uk")), 4).as("union_approx"),
        round(col("_both").cast("double") / col("_n"), 6).as("jaccard_approx"),
        round((col("_both").cast("double") / col("_n")) *
          when(col("_n") < k, col("_n").cast("double"))
            .otherwise(lit(k - 1.0) / col("_uk")), 4).as("intersect_approx"))
  }
}
