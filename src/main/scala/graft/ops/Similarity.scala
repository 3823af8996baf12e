package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Scale design (100 TB): brute-force top-k is the correctness baseline —
  * a broadcast of the (small) query set against a full scan of the corpus,
  * no shuffle except the final per-query top-k (TakeOrdered-style, k
  * rows per partition merge). The scale path is LSH bucketing (random
  * hyperplane signs): corpus and queries hash to buckets scan-side, the
  * join is bucket-equality (shuffle on a short key, prunable), and only
  * in-bucket pairs pay the O(d) dot product. All arithmetic uses built-in
  * higher-order array functions, cast to double for stable results.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double,
    * sequentially (deterministic). Portable HOF formulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the native codegen'd Expression
    * ([[graft.functions.CosineSimilarity]]) — bit-identical to
    * `dot(a,b)/(norm(a)*norm(b))` (pinned by FunctionsSpec), but runs as a
    * primitive loop inside WholeStageCodegen instead of interpreted
    * higher-order lambdas: the difference between feasible and not at
    * 10⁹-vector ANN scans. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnExpr
    ColumnExpr.column(graft.functions.CosineSimilarity(
      ColumnExpr.expr(a), ColumnExpr.expr(b)))
  }

  /** The portable formulation (kept for cross-checks). */
  def cosinePortable(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query (small set, broadcast) against
    * every corpus vector; rank per query. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val scored = c.join(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a value in [-0.5, 0.5) derived from md5 — reproducible everywhere,
    * no RNG state to ship to executors. */
  private def planeComponent(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$p|dim$d".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16).toDouble / 0xffffffffL.toDouble) - 0.5
  }

  /** Sign-bucket signature over `numPlanes` fixed hyperplanes: a
    * numPlanes-char bit string. Vectors in the same bucket are ANN
    * candidates. Plane vectors are literal arrays baked into the plan —
    * broadcast for free with the task binary. */
  def lshBucket(vecCol: Column, dim: Int, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      when(dot(vecCol, plane) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** IVF-style bucketed ANN: hash corpus and queries to LSH buckets, join
    * on bucket equality, rank in-bucket by cosine. Recall < 1 by design;
    * the tradeoff knob is numPlanes (fewer planes = bigger buckets =
    * higher recall, more compute). */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      numPlanes: Int = 8): DataFrame = {
    // Materialize the bucketed tables to parquet: the bucket signature is
    // numPlanes × dim-literal dot products — a large expression tree that
    // would otherwise be duplicated into both join sides and re-optimized
    // per AQE stage. At 100 TB scale this is the "write the index once"
    // step of any IVF/LSH design (corpus side written bucketed by bucket).
    val c = Materialize.index(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
        lshBucket(col(vecCol), dim, numPlanes).as("bucket")), "lsh-corpus")
    val q = Materialize.index(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        lshBucket(col(vecCol), dim, numPlanes).as("bucket")), "lsh-queries")
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** IVF-style ANN: partition the corpus into cells around a fixed set of
    * centroids (deterministically sampled from the corpus itself — every
    * strideth vector, no RNG to ship), assign each vector to its nearest
    * centroid scan-side, then probe only the `nprobe` nearest cells per
    * query. Recall/compute tradeoff is (numCentroids, nprobe).
    *
    * Scale shape: centroids are a broadcast literal (tiny); cell
    * assignment is a per-row argmax (no shuffle); the probe join is
    * cell-id equality — the classic inverted-file layout, and on a real
    * cluster the corpus would be written bucketed by cell id so the probe
    * join is shuffle-free. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cents: Array[(Int, Seq[Float])] = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .limit(numCentroids * 7)
      .collect()
      .zipWithIndex
      .collect { case (r, i) if i % 7 == 0 => (i / 7, r.getSeq[Float](1)) }
      .take(numCentroids)
    def centArray(c: Seq[Float]): Column = array(c.map(lit): _*)
    // nearest-centroid assignment: argmax over an array of similarities.
    // NOT a when/otherwise fold — that duplicates both accumulator branches
    // and grows the expression tree 3^numCentroids (observed: minutes of
    // planner/codegen time at 16 centroids). Each cosine appears exactly
    // once here.
    def cellOf(vec: Column): Column = {
      val sims = array(cents.map { case (_, cvec) => cosine(vec, centArray(cvec)) }: _*)
      (array_position(sims, array_max(sims)) - 1).cast("int")
    }
    // per-query probe list: the nprobe nearest centroids
    def probesOf(vec: Column): Column = {
      val simToCell = cents.map { case (cid, cvec) =>
        struct(cosine(vec, centArray(cvec)).as("s"), lit(cid).as("c"))
      }
      slice(reverse(array_sort(array(simToCell: _*))), 1, nprobe)
    }
    val c = Materialize.index(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
        cellOf(col(vecCol)).as("cell")), "ivf-cells")
    val q = Materialize.index(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(probesOf(col(vecCol))).as("probe"))
        .select(col("query_id"), col("qvec"), col("probe.c").as("cell")),
      "ivf-probes")
    val scored = c.join(broadcast(q), "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, blocked by
    * LSH bucket (the scale path: no all-pairs). */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 6): DataFrame = {
    val withB = Materialize.index(
      df.select(col(idCol), col(vecCol),
        lshBucket(col(vecCol), dim, numPlanes).as("bucket")), "neardup-buckets")
    val l = withB.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"), col("bucket"))
    val r = withB.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"), col("bucket"))
    l.join(r, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .distinct()
  }
}
