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

  /** Native codegen'd dot product ([[graft.functions.DotProduct]]) —
    * bit-identical to [[dot]] (pinned by FunctionsSpec) but a primitive
    * loop inside WholeStageCodegen. This is the banding hot loop: LSH
    * computes bands × planes of these per corpus row. */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnExpr
    ColumnExpr.column(graft.functions.DotProduct(
      ColumnExpr.expr(a), ColumnExpr.expr(b)))
  }

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

  /** Hard-negative mining — the contrastive-training sampling step: for
    * each query, the k most-similar corpus vectors with a DIFFERENT
    * label (semantically close but wrong → exactly the negatives an
    * embedding model learns most from).
    *
    * This is the brute exact baseline (broadcast queries over a corpus
    * scan, same shape as [[bruteForceTopK]]); at corpus scale the label
    * filter composes unchanged with the LSH/IVF candidate generators —
    * generate candidates, join labels, drop same-label, rank. */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(labelCol).as("qlabel"), col(vecCol).as("qvec"))
    val c = corpus.select(
      col(idCol).as("corpus_id"), col(labelCol).as("clabel"), col(vecCol).as("cvec"))
    val scored = c.join(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id") && col("qlabel") =!= col("clabel"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "qlabel", "corpus_id", "clabel", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a value in [-0.5, 0.5) derived from md5 — reproducible everywhere,
    * no RNG state to ship to executors, and emittable as a literal into
    * oracle SQL (Double.toString round-trips exactly). */
  def planeComponent(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$p|dim$d".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16).toDouble / 0xffffffffL.toDouble) - 0.5
  }

  /** Sign-bucket signature of band `band` over `numPlanes` hyperplanes
    * (global plane indices band*numPlanes …): a numPlanes-char bit string.
    * Vectors in the same bucket are ANN candidates. Plane vectors are
    * literal arrays baked into the plan — broadcast for free with the
    * task binary. */
  def lshBucket(vecCol: Column, dim: Int, numPlanes: Int = 8, band: Int = 0): Column = {
    val bits = (0 until numPlanes).map { j =>
      val p = band * numPlanes + j
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      when(dotNative(vecCol, plane) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Planes-per-band sized to the corpus: 2^planes buckets ≈ n / target
    * occupancy, so bucket population stays bounded as n grows (the fixed
    * plane count the round-1 design had would make in-bucket compares
    * O(n²/const) — dead at 100 TB). */
  def autoPlanes(corpusSize: Long, targetPerBucket: Long = 1024): Int =
    math.max(4, math.ceil(
      math.log(math.max(1.0, corpusSize.toDouble / targetPerBucket)) / math.log(2)).toInt)

  /** IVF cell count ~ √n — the classic balance point where cells and
    * cell population grow together. */
  def autoCentroids(corpusSize: Long): Int =
    math.max(4, math.ceil(math.sqrt(corpusSize.toDouble)).toInt)

  /** LSH ANN with multi-band OR-amplification: `numBands` independent
    * sign-bucket signatures; a (query, corpus) pair is a candidate if it
    * collides in ANY band (union → higher recall than one longer
    * signature), then candidates are scored exactly and ranked.
    *
    * Scale shape: the banded corpus index — (corpus_id, band, bucket),
    * no vectors — is written once; per-bucket candidate caps bound the
    * fan-out of a degenerate hot bucket; vectors never flow through the
    * bucket join (candidates join back to the vector tables by id).
    * numPlanes = 0 sizes planes from the corpus count ([[autoPlanes]]).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      numPlanes: Int = 0,
      numBands: Int = 2,
      bucketCap: Int = 100000): DataFrame = {
    val planes = if (numPlanes > 0) numPlanes else autoPlanes(corpus.count())
    def banded(df: DataFrame, idAs: String): DataFrame =
      df.select(col(idCol).as(idAs),
        posexplode(array((0 until numBands).map(b =>
          lshBucket(col(vecCol), dim, planes, b)): _*)).as(Seq("band_idx", "bk")))
    // spread: the per-row banding loop (numBands × planes dot products) is
    // the heavy map stage; a single-row-group corpus file would feed it
    // one task (no-op on a many-file layout)
    val cBand = Materialize.index(
      banded(Materialize.spread(corpus), "corpus_id"), "lsh-cband")
    val wCap = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "bk").orderBy("corpus_id")
    val cCapped = cBand.withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= bucketCap).drop("rn")
    val cand = banded(queries, "query_id")
      .join(cCapped, Seq("band_idx", "bk"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")
      .distinct()
    rankCandidates(cand, corpus, queries, idCol, vecCol, k)
  }

  /** Exact-score + rank the candidate pairs: vectors join back by id
    * (queries broadcast — the small side by construction). */
  private def rankCandidates(
      cand: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val scored = cand
      .join(broadcast(qv), "query_id")
      .join(cv, "corpus_id")
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Deterministic IVF centroid seed — every 7th of the first `nc*7` ids —
    * computed EXECUTOR-side end to end. The r5 encoding collected nc*7
    * full vectors to the driver: O(√n·dim) at the auto-sized path, ~1 GB
    * at 10⁹ vectors × dim 1024 — a growth term, not a bound. Here the
    * id-only prefix is a TakeOrdered (vectors pruned out of the sort), the
    * stride rank is a window over that bounded id set (single partition,
    * ≤ nc*7 longs — ~200k at the 10⁹ design point), and the seed rows pull
    * their vectors back by id as a broadcast-hash-join against the corpus
    * scan. Only the nc centroid rows themselves ever materialize, inside
    * the broadcast exchange. Selection order is identical to the old
    * driver collect (sorted by id, every 7th, first nc), so results and
    * the DuckDB oracle are unchanged. Returns (cid int, cvec). */
  private[ops] def seedCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nc: Int): DataFrame = {
    val wSeed = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    val seedIds = corpus.select(col(idCol))
      .orderBy(col(idCol)).limit(nc * 7)
      .withColumn("rn", row_number().over(wSeed) - 1)
      .filter(col("rn") % 7 === 0 && col("rn") < nc.toLong * 7)
      .select((col("rn") / 7).cast("int").as("cid"), col(idCol))
    broadcast(seedIds)
      .join(corpus.select(col(idCol), col(vecCol).as("cvec")), idCol)
      .select(col("cid"), col("cvec"))
  }

  /** IVF-style ANN: partition the corpus into cells around a fixed set of
    * centroids (deterministically sampled from the corpus itself — every
    * strideth vector, no RNG to ship), assign each vector to its nearest
    * centroid scan-side, then probe only the `nprobe` nearest cells per
    * query. Recall/compute tradeoff is (numCentroids, nprobe).
    *
    * Scale shape: centroids are a tiny broadcast TABLE — not plan
    * literals. The earlier literal-array construction emitted
    * O(numCentroids × dim) literals into the generated code, which hits
    * janino limits around a few hundred centroids — fatal for the
    * auto-sized √n path (√10⁹ ≈ 31k centroids). Cell assignment is a
    * broadcast join + max-of-struct aggregate: partial (map-side) combine
    * collapses the numCentroids rows per vector before any shuffle, so
    * only one (id, cell) row per corpus vector moves. The probe join is
    * cell-id equality — the classic inverted-file layout, and on a real
    * cluster the corpus would be written bucketed by cell id so the probe
    * join is shuffle-free. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 0,
      nprobe: Int = 4): DataFrame = {
    val nc = if (numCentroids > 0) numCentroids else autoCentroids(corpus.count())
    val centDf = broadcast(seedCentroids(corpus, idCol, vecCol, nc))
    // all (vector, centroid) sims for one side; broadcast join, no shuffle
    def sims(df: DataFrame, idAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(vecCol).as("v"))
        .join(centDf)
        .select(col(idAs), col("cid"), cosine(col("v"), col("cvec")).as("s"))
    // Inlined, not Materialize.index'd: unlike the LSH banding self-join,
    // cCell and qProbe each feed the final plan exactly ONCE, so a parquet
    // round-trip buys no recompute and costs two write+read jobs (the
    // round-3 6.5× local regression was mostly this fixed overhead). At
    // 100 TB the cell assignment IS worth persisting — as a bucketed-by-
    // cell inverted-file table reused across query batches — but that is
    // an ingest-time artifact, not a per-query step.
    val cCell = assignCells(Materialize.spread(corpus), centDf, idCol, "corpus_id", vecCol)
    // per-query probe list: the nprobe nearest centroids, ties to the
    // HIGHEST cid (the previous reverse(array_sort(struct(s, c))) order,
    // mirrored by the oracle's ORDER BY s DESC, cid DESC). Queries are the
    // small side by construction — a window is fine here.
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("cid").desc)
    val qProbe =
      sims(queries, "query_id")
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= nprobe)
        .select(col("query_id"), col("cid").as("cell"))
    val cand = qProbe.join(cCell, "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")
      .distinct()
    rankCandidates(cand, corpus, queries, idCol, vecCol, k)
  }

  /** Nearest-centroid cell id per vector against a broadcast centroid
    * table (cid, cvec) — shared by [[ivfTopK]] (the inverted file) and
    * [[semanticDedup]] (the cluster blocking). Broadcast join +
    * max-of-struct aggregate: partial (map-side) combine collapses the
    * numCentroids rows per vector before any shuffle, so only one
    * (id, cell) row per vector moves; ties go to the LOWEST cid (the
    * oracle's ORDER BY s DESC, cid ASC). */
  private[ops] def assignCells(
      df: DataFrame,
      centDf: DataFrame,
      idCol: String,
      idAs: String,
      vecCol: String): DataFrame = {
    df.select(col(idCol).as(idAs), col(vecCol).as("v"))
      .join(centDf)
      .select(col(idAs), col("cid"), cosine(col("v"), col("cvec")).as("s"))
      .groupBy(idAs)
      .agg(argmaxCell.as("cell"))
  }

  /** Hash-combinable argmax over (cid, s) rows — the
    * [[graft.functions.ArgMaxCell]] aggregate (ObjectHashAggregate,
    * 13-byte buffer), NOT `max(struct(s, -cid))`: a struct max falls
    * back to SortAggregate, which SORTS the whole pre-aggregation
    * stream — 3.7 GB of spill on the N·C assignment stream at the 10×
    * vector soak and unboundedly worse at real scale. Same result
    * bit-for-bit (ties to the LOWEST cid; the oracle's ORDER BY s
    * DESC, cid ASC). Shared by [[assignCells]], the label-noise cell
    * audit and [[silhouette]]. */
  private def argmaxCell: Column = {
    import org.apache.spark.sql.graftshim.ColumnExpr
    ColumnExpr.column(graft.functions.ArgMaxCell(
      ColumnExpr.expr(col("cid").cast("int")),
      ColumnExpr.expr(col("s").cast("double"))).toAggregateExpression())
  }

  /** Deterministic semantic clustering of a corpus: nearest-centroid cell
    * per vector over the stride-seeded centroids — the shared front half
    * of [[semanticDedup]] and of cluster-balanced sampling (sample evenly
    * across cells so a subsample covers the semantic space instead of
    * mirroring its density). Returns (idCol, cell). */
  def corpusCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int = 0): DataFrame = {
    val nc = if (numCentroids > 0) numCentroids else autoCentroids(df.count())
    val centDf = broadcast(seedCentroids(df, idCol, vecCol, nc))
    assignCells(Materialize.spread(df), centDf, idCol, idCol, vecCol)
  }

  /** The two tables a PERSISTED IVF index is made of — the ingest-time
    * artifact [[ivfTopK]]'s doc deliberately defers: the broadcastable
    * centroid table (cid, cvec) and the corpus-sized inverted file
    * (corpus_id, cell). Built once over the base corpus (the only
    * corpus-sized assignment pass); later arrivals extend the cells via
    * [[ivfAssign]] — exact by construction, since a vector's nearest
    * centroid is independent of every other vector. */
  def ivfIndexTables(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int): (DataFrame, DataFrame) = {
    val centDf = seedCentroids(corpus, idCol, vecCol, numCentroids)
    val cells =
      assignCells(Materialize.spread(corpus), broadcast(centDf), idCol, "corpus_id", vecCol)
    (centDf, cells)
  }

  /** Nearest-cell assignment of a DELTA batch against an existing
    * centroid table — the nightly IVF maintenance fold: broadcast
    * centroids, one (id, cell) row per delta vector out, nothing of the
    * standing corpus touched. */
  def ivfAssign(
      delta: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    assignCells(delta, broadcast(centroids.select(col("cid"), col("cvec"))),
      idCol, "corpus_id", vecCol)

  /** [[ivfTopK]] served FROM a prebuilt (centroids, cells) index instead
    * of assigning cells in-query — the serving half of the persisted IVF
    * seam: probe lists come from the broadcast centroid table, candidates
    * from the cells inverted file. When the cells table CARRIES the
    * vector payload (every store [[graft.ops.AnnIndex.bootstrap]] writes
    * — the classic IVF layout, vectors in the inverted lists), the final
    * exact ranking reads vectors from the SAME probed-cell-pruned frame
    * and the whole serve never touches the raw corpus: per batch the
    * cost is nprobe cells' files, flat in corpus size. An ids-only cells
    * table (a store written before the payload layout) falls back to
    * re-entering vectors from `corpus` keyed by id — correct, but a
    * corpus-sized scan per batch; [[graft.ops.AnnIndex.refine]] is the
    * migration. Identical output to [[ivfTopK]] over the same centroids
    * by construction. */
  def ivfTopKFromIndex(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: DataFrame,
      cells: DataFrame,
      nprobe: Int = 4): DataFrame = {
    val centDf = broadcast(centroids.select(col("cid"), col("cvec")))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("cid").desc)
    val qProbe = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("v"))
      .join(centDf)
      .select(col("query_id"), col("cid"), cosine(col("v"), col("cvec")).as("s"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cid").as("cell"))
    val cand = qProbe.join(cells.select(col("corpus_id"), col("cell")), "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")
      .distinct()
    rankCandidates(cand, rerankSource(cells, corpus, idCol, vecCol),
      queries, idCol, vecCol, k)
  }

  /** Vector source for the exact candidate ranking of an index-served
    * probe: the cells frame itself when it carries the payload (then a
    * probed-cell-pruned read serves the whole query, corpus untouched),
    * else the raw corpus (legacy ids-only stores). */
  private def rerankSource(
      cells: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    if (cells.columns.contains(vecCol))
      cells.select(col("corpus_id").as(idCol), col(vecCol))
    else corpus

  /** One k-means Lloyd iteration over the stride-seeded centroids — the
    * refinement step that turns the deterministic IVF seeding into real
    * k-means (and, iterated at ingest time, builds the production IVF
    * index): assign → recompute per-cell means → reassign. Returns one
    * row per cell: membership before and after the update, and the L2
    * distance the centroid moved.
    *
    * Scale shape: both assignment passes are broadcast-centroid joins
    * with max-of-struct partial aggregation (only one (id, cell) row per
    * vector ever shuffles); the mean update runs on posexploded
    * (cell, dim, x) skinny rows — fixed-width shuffle keys with full
    * map-side combine, the [[graft.PipelineQueries.embedLabelCentroids]]
    * encoding. New centroids are rounded to 6 decimals BEFORE
    * reassignment — that makes the reassignment input (and hence the
    * argmax) engine-exact rather than at the mercy of double summation
    * order, the same determinism contract as the label-centroid op.
    * Nothing ever collects to the driver. */
  def kmeansRefine(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int): DataFrame = {
    val corpusD = corpus.select(
      col(idCol), expr(s"transform($vecCol, x -> cast(x AS double))").as("v"))
    val cents0 = broadcast(seedCentroids(corpusD, idCol, "v", numCentroids))
    val before = assignCells(Materialize.spread(corpusD), cents0, idCol, "corpus_id", "v")
    val newCents = lloydCentroids(corpusD, idCol, "v", before)
    val after = assignCells(corpusD, broadcast(newCents), idCol, "corpus_id", "v")
    val shift = cents0.select(col("cid").as("cell"), col("cvec").as("c0"))
      .join(newCents.select(col("cid").as("cell"), col("cvec").as("c1")), "cell")
      .select(col("cell"), round(sqrt(expr(
        "aggregate(zip_with(c0, c1, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)")), 6)
        .as("shift"))
    val nBefore = before.groupBy("cell").agg(count(lit(1)).cast("long").as("n_before"))
    val nAfter = after.groupBy("cell").agg(count(lit(1)).cast("long").as("n_after"))
    nBefore
      .join(nAfter, Seq("cell"), "left")
      .join(shift, Seq("cell"), "left")
      .select(col("cell"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"), col("shift"))
  }

  /** The Lloyd centroid UPDATE shared by [[kmeansRefine]] and the
    * persisted-index refine path: per-cell per-dim means of the given
    * nearest-centroid assignment, on posexploded (cell, dim, x) skinny
    * rows (fixed-width shuffle keys, full map-side combine), rounded to
    * 6 decimals so the reassignment input is engine-exact rather than
    * at the mercy of double summation order. Returns (cid, cvec). */
  private[ops] def lloydCentroids(
      corpusD: DataFrame,
      idCol: String,
      vecCol: String,
      assignment: DataFrame): DataFrame =
    assignment
      .join(corpusD.select(col(idCol).as("corpus_id"), col(vecCol).as("_lv")), "corpus_id")
      .select(col("cell"), posexplode(col("_lv")).as(Seq("dim", "x")))
      .groupBy("cell", "dim").agg(round(avg("x"), 6).as("m"))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cvec"))
      .select(col("cell").as("cid"), col("cvec"))

  /** Product-quantization codes (Jégou et al. 2011): split each vector
    * into `m` subvectors of `subDim` dims; per subspace, assign the
    * subvector to its nearest (squared-L2) codebook centroid. The
    * codebooks reuse the deterministic stride seeding ([[seedCentroids]]
    * ids, sliced per subspace) — no RNG, oracle-replayable.
    *
    * Scale shape: the codebook table is m·k rows — broadcast; code
    * assignment is one broadcast join over the exploded (vector,
    * subspace) stream and ONE id-keyed aggregation (min-of-struct per
    * subspace folds map-side). The output — id + m small ints — is the
    * compressed corpus: ~4 bytes/vector instead of 4·dim, which is what
    * makes an exhaustive ADC scan feasible where the raw corpus is
    * hundreds of TB. Returns (idAs, j, code) long-format. */
  private[ops] def pqCodesLong(
      corpus: DataFrame,
      idCol: String,
      idAs: String,
      vecCol: String,
      m: Int,
      subDim: Int,
      k: Int,
      codebooks: Option[DataFrame] = None): DataFrame = {
    val subCents = codebooks.getOrElse(pqCodebooks(corpus, idCol, vecCol, m, subDim, k))
    // hash-combinable argmin (argmax of -d2, ties to the LOWEST cid —
    // exactly min(struct(d2, cid))): a struct min would SortAggregate
    // the N·m·k code-assignment stream; see [[assignCells]]
    import org.apache.spark.sql.graftshim.ColumnExpr
    // nanSmallest: negation maps a NaN distance to NaN, which plain
    // max-semantics would pick as the WINNER — min(struct(d2, cid))
    // never selects a NaN row (NaN sorts greatest under min)
    val argmin = ColumnExpr.column(graft.functions.ArgMaxCell(
      ColumnExpr.expr(col("cid").cast("int")),
      ColumnExpr.expr((-col("d2")).cast("double")),
      nanSmallest = true).toAggregateExpression())
    pqSubDistances(corpus, idCol, idAs, vecCol, subCents, m, subDim)
      .groupBy(idAs, "j")
      .agg(argmin.as("code"))
      .select(col(idAs), col("j"), col("code").cast("int").as("code"))
  }

  /** Per-(vector, subspace, centroid) squared-L2 distances against a
    * codebook table — the shared front of code assignment AND the
    * per-query ADC lookup tables (one formula, one place). */
  private def pqSubDistances(
      df: DataFrame,
      idCol: String,
      idAs: String,
      vecCol: String,
      subCents: DataFrame,
      m: Int,
      subDim: Int): DataFrame =
    df.select(col(idCol).as(idAs), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), j -> slice($vecCol, j * $subDim + 1, $subDim))"))
      .as(Seq("j", "sv")))
      .join(broadcast(subCents), Seq("j"))
      .select(col(idAs), col("j"), col("cid"),
        (dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), col("scv")) +
          dot(col("scv"), col("scv"))).as("d2"))

  /** Per-query ADC lookup tables (query_id, j, cid, contrib) over the
    * codebooks — m·k doubles per query, always broadcastable. */
  private def pqLuts(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      subCents: DataFrame,
      m: Int,
      subDim: Int): DataFrame =
    pqSubDistances(queries, idCol, "query_id", vecCol, subCents, m, subDim)
      .withColumnRenamed("d2", "contrib")

  /** Per-subspace PQ codebooks: (j, cid, scv) — the stride-seeded
    * centroid vectors sliced into subspaces. m·k rows, always tiny. */
  private[ops] def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      subDim: Int,
      k: Int): DataFrame =
    seedCentroids(corpus, idCol, vecCol, k)
      .select(col("cid"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), j -> slice(cvec, j * $subDim + 1, $subDim))"))
        .as(Seq("j", "scv")))

  /** Wide PQ code table: (idCol, c0..c{m-1}) — the persisted form. */
  def pqCodes(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 4,
      subDim: Int = 16,
      k: Int = 8): DataFrame = {
    val long = pqCodesLong(corpus, idCol, idCol, vecCol, m, subDim, k)
    val codeCols = (0 until m).map(j =>
      min(when(col("j") === j, col("code"))).cast("int").as(s"c$j"))
    long.groupBy(idCol).agg(codeCols.head, codeCols.tail: _*)
  }

  /** Per-subspace PQ quantization distortion: each vector's squared-L2
    * error against its CHOSEN centroid (the min over the codebook —
    * identical distances to the code assignment), reduced to mean/max
    * per subspace. The codebook-quality gauge read before trusting
    * PQ/ADC neighbor lists. Two partial-agg groupBys over the
    * (vector, subspace, centroid) distance stream; m-row output. */
  def pqDistortion(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 4,
      subDim: Int = 16,
      k: Int = 8): DataFrame = {
    val subCents = pqCodebooks(corpus, idCol, vecCol, m, subDim, k)
    pqSubDistances(corpus, idCol, idCol, vecCol, subCents, m, subDim)
      .groupBy(col(idCol), col("j"))
      .agg(min("d2").as("d2"))
      .groupBy("j")
      .agg(
        count(lit(1)).cast("long").as("n_vectors"),
        round(avg("d2"), 4).as("avg_d2"),
        round(max("d2"), 4).as("max_d2"))
      .select(col("j").cast("long").as("j"), col("n_vectors"),
        col("avg_d2"), col("max_d2"))
  }

  /** PQ ANN via asymmetric distance computation (ADC): per query, a
    * lookup table of ||q_j − centroid_{j,c}||² contributions (m·k
    * doubles — broadcast), then every corpus vector's approximate
    * distance is the sum of m table lookups over its CODES — the raw
    * vectors never participate in the scan. One (query, corpus)-keyed
    * partial-agg shuffle + a per-query top-k window; compose with IVF
    * cell routing for the classic IVFADC at cluster scale. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      m: Int = 4,
      subDim: Int = 16,
      k: Int = 8): DataFrame = {
    val subCents = pqCodebooks(corpus, idCol, vecCol, m, subDim, k)
    val codes = pqCodesLong(corpus, idCol, "corpus_id", vecCol, m, subDim, k,
      codebooks = Some(subCents))
    adcTopK(codes, pqLuts(queries, idCol, vecCol, subCents, m, subDim), kNeighbors)
  }

  /** The ADC scan + per-query top-k over a prebuilt (codes, luts) pair —
    * the shared tail of [[pqTopK]] and the persisted-index serving path
    * ([[pqTopKRerankFromIndex]]): approximate distance is the sum of m
    * lookup-table contributions over each corpus vector's CODES; the
    * raw vectors never participate. One (query, corpus)-keyed
    * partial-agg shuffle + a per-query top-k window. */
  private[ops] def adcTopK(
      codes: DataFrame, luts: DataFrame, kNeighbors: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist").asc, col("corpus_id").asc)
    codes.join(broadcast(luts),
        codes("j") === luts("j") && codes("code") === luts("cid"))
      .groupBy("query_id", "corpus_id")
      .agg(round(sum(col("contrib")), 4).as("adist"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select("query_id", "corpus_id", "adist", "rank")
  }

  /** PQ shortlist + exact rerank — how PQ is actually deployed: the ADC
    * scan (over codes, never vectors) nominates `shortlist` candidates
    * per query, then ONLY those pairs pull their true vectors for exact
    * distances. The expensive exact math touches |queries|·shortlist
    * rows instead of the corpus; the shortlist pair set is tiny and
    * broadcasts against the corpus scan. On near-random data (distance
    * concentration) pure ADC ranking is noisy — the rerank recovers
    * exact ordering within the shortlist, which is the quantization
    * contract: compress the SCAN, not the final ranking. */
  def pqTopKRerank(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      shortlist: Int = 50,
      m: Int = 4,
      subDim: Int = 16,
      k: Int = 8): DataFrame = {
    val pairs = pqTopK(corpus, queries, idCol, vecCol, shortlist, m, subDim, k)
      .select("query_id", "corpus_id")
    exactRerank(pairs, corpus, queries, idCol, vecCol, kNeighbors)
  }

  /** The exact-rerank tail shared by [[pqTopKRerank]] and the
    * persisted-index serving path: ONLY the shortlist pairs pull their
    * true vectors for exact squared-L2 — the shortlist broadcasts
    * against the corpus scan, so the expensive exact math touches
    * |queries|·shortlist rows, never the corpus. */
  private[ops] def exactRerank(
      pairs: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2").asc, col("corpus_id").asc)
    broadcast(pairs).join(c, "corpus_id").join(broadcast(q), "query_id")
      .withColumn("d2", round(
        dot(col("qvec"), col("qvec")) - lit(2.0) * dot(col("qvec"), col("cvec")) +
          dot(col("cvec"), col("cvec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select("query_id", "corpus_id", "d2", "rank")
  }

  /** [[pqTopKRerank]] served FROM prebuilt (codebooks, codes) tables
    * instead of quantizing in-query — the serving half of the persisted
    * PQ seam ([[graft.ops.AnnIndex]]): per-query lookup tables come from
    * the broadcast standing codebooks, the ADC scan reads the standing
    * CODE table only (id + m small ints — no raw vectors anywhere near
    * the scan, which is the whole point of PQ at 100 TB), and the exact
    * rerank re-enters vectors for just the shortlist pairs, keyed by
    * id. Identical output to [[pqTopKRerank]] over the same codebooks
    * by construction. */
  def pqTopKRerankFromIndex(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      codebooks: DataFrame,
      codes: DataFrame,
      shortlist: Int = 50,
      m: Int = 4,
      subDim: Int = 16): DataFrame = {
    val luts = pqLuts(queries, idCol, vecCol, broadcast(codebooks), m, subDim)
    val pairs = adcTopK(codes.select(col("corpus_id"), col("j"), col("code")),
      luts, shortlist).select("query_id", "corpus_id")
    exactRerank(pairs, corpus, queries, idCol, vecCol, kNeighbors)
  }

  /** IVFADC (Jégou et al. 2011 §IV): the two compressed-ANN halves
    * composed the way a billion-vector index actually runs — the
    * inverted file routes each query to its `nprobe` nearest cells, the
    * ADC code scan ranks ONLY those cells' members, and the exact rerank
    * touches just the surviving shortlist. Per query the work is
    * (corpus/cells)·nprobe code lookups + shortlist exact distances;
    * nothing anywhere reads all raw vectors for a query. Cell routing,
    * codebooks, and lookup tables are all broadcasts; the one corpus-
    * sized shuffle is the (query, candidate)-keyed ADC partial agg. */
  def ivfadcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      numCentroids: Int = 0,
      nprobe: Int = 4,
      shortlist: Int = 50,
      m: Int = 4,
      subDim: Int = 16,
      k: Int = 8): DataFrame = {
    val nc = if (numCentroids > 0) numCentroids else autoCentroids(corpus.count())
    val centDf = broadcast(seedCentroids(corpus, idCol, vecCol, nc))
    val cCell = assignCells(Materialize.spread(corpus), centDf, idCol, "corpus_id", vecCol)
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("cid").desc)
    val qProbe = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("v"))
      .join(centDf)
      .select(col("query_id"), col("cid"), cosine(col("v"), col("cvec")).as("s"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cid").as("cell"))
    val cand = broadcast(qProbe).join(cCell, "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")

    // ADC over the candidate set only: codes for candidate members, luts
    // per query — both joins broadcast, then one (query, candidate) agg.
    val subCents = pqCodebooks(corpus, idCol, vecCol, m, subDim, k)
    val codes = pqCodesLong(corpus, idCol, "corpus_id", vecCol, m, subDim, k,
      codebooks = Some(subCents))
    val luts = pqLuts(queries, idCol, vecCol, subCents, m, subDim)
    val wShort = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist").asc, col("corpus_id").asc)
    // cand is |queries|·nprobe·cellsize — query-bounded, broadcast it
    // against the (much larger) compressed code table
    val candCodes = broadcast(cand).join(codes, "corpus_id")
    // the lut join must pin the SAME query — unlike the all-pairs ADC in
    // [[pqTopK]], candidates here are per-query
    val short = candCodes.join(broadcast(luts),
        candCodes("query_id") === luts("query_id") &&
          candCodes("j") === luts("j") && candCodes("code") === luts("cid"))
      .groupBy(candCodes("query_id"), col("corpus_id"))
      .agg(round(sum(col("contrib")), 4).as("adist"))
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= shortlist)
      .select("query_id", "corpus_id")

    // Exact rerank of the shortlist only.
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val wFinal = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2").asc, col("corpus_id").asc)
    broadcast(short).join(c, "corpus_id").join(broadcast(q), "query_id")
      .withColumn("d2", round(
        dot(col("qvec"), col("qvec")) - lit(2.0) * dot(col("qvec"), col("cvec")) +
          dot(col("cvec"), col("cvec")), 4))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= kNeighbors)
      .select("query_id", "corpus_id", "d2", "rank")
  }

  /** [[ivfadcTopK]] served FROM the two PERSISTED index halves — the
    * full billion-vector serving shape with nothing rebuilt in-query:
    * cell routing against the standing broadcast centroid table,
    * candidates from the standing ids-only inverted file, ADC ranking
    * from the standing code table (id + m small ints — no raw vectors
    * anywhere near the compressed scan), and the exact rerank touching
    * only the shortlist pairs, keyed by id. Identical output to
    * [[ivfadcTopK]] over the same centroids/codebooks by construction
    * (oracle-proven against the from-scratch replay). */
  def ivfadcTopKFromIndex(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      centroids: DataFrame,
      cells: DataFrame,
      codebooks: DataFrame,
      codes: DataFrame,
      nprobe: Int = 4,
      shortlist: Int = 50,
      m: Int = 4,
      subDim: Int = 16): DataFrame = {
    val centDf = broadcast(centroids.select(col("cid"), col("cvec")))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("cid").desc)
    val qProbe = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("v"))
      .join(centDf)
      .select(col("query_id"), col("cid"), cosine(col("v"), col("cvec")).as("s"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cid").as("cell"))
    val cand = broadcast(qProbe)
      .join(cells.select(col("corpus_id"), col("cell")), "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")
    val luts = pqLuts(queries, idCol, vecCol, broadcast(codebooks), m, subDim)
    val wShort = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist").asc, col("corpus_id").asc)
    val candCodes = broadcast(cand)
      .join(codes.select(col("corpus_id"), col("j"), col("code")), "corpus_id")
    val short = candCodes.join(broadcast(luts),
        candCodes("query_id") === luts("query_id") &&
          candCodes("j") === luts("j") && candCodes("code") === luts("cid"))
      .groupBy(candCodes("query_id"), col("corpus_id"))
      .agg(round(sum(col("contrib")), 4).as("adist"))
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= shortlist)
      .select("query_id", "corpus_id")
    // rerank from the probed-cell-pruned cells payload when the store
    // carries it (see [[rerankSource]]) — the shortlist is a subset of
    // the probed cells' members by construction, so the serve never
    // reads a raw corpus vector outside those cells
    exactRerank(short, rerankSource(cells, corpus, idCol, vecCol),
      queries, idCol, vecCol, kNeighbors)
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the embedding
    * space around deterministic centroids, then prune near-identical
    * vectors WITHIN each cell — a vector is dropped when a lower-id
    * vector in its cell has cosine ≥ `threshold`, and reports which one
    * dominated it. Clustering bounds the candidate set the way LSH bands
    * do for [[cosineNearDupPairs]], but by SEMANTIC locality: two
    * paraphrases land in one cell even when their token overlap is nil.
    *
    * Scale shape: cell assignment is the broadcast-join aggregate of
    * [[assignCells]] (one (id, cell) row per vector shuffles); the cell
    * table is parquet-materialized once and self-joined on cell id, so
    * candidate pairs are O(Σ cell²) — sized by `numCentroids` (√n cells
    * of √n vectors at the auto-sized default; pick nc so cells stay
    * bounded, exactly the SemDeDup k choice) with a deterministic
    * per-cell cap as the hot-cell backstop. Vectors join back by id;
    * only ids travel through the pair join.
    *
    * Returns (idCol, cell, dup_of — null when kept, keep). */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numCentroids: Int = 0,
      cellCap: Int = 100000): DataFrame = {
    val nc = if (numCentroids > 0) numCentroids else autoCentroids(df.count())
    val centDf = broadcast(seedCentroids(df, idCol, vecCol, nc))
    val cells = Materialize.index(
      assignCells(Materialize.spread(df), centDf, idCol, idCol, vecCol),
      "semdedup-cells")
    val wCap = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(idCol)
    val capped = cells.withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= cellCap).drop("rn")
    val pairs = capped.select(col(idCol).as("id_a"), col("cell"))
      .join(capped.select(col(idCol).as("id_b"), col("cell")), "cell")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    val dups = pairs.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cos") >= threshold)
      .groupBy(col("id_b").as(idCol))
      .agg(min("id_a").as("dup_of"))
    cells.join(dups, Seq(idCol), "left")
      .withColumn("keep", col("dup_of").isNull)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, blocked by
    * multi-band LSH buckets (the scale path: no all-pairs; OR-amplified
    * recall; per-bucket caps bound hot buckets; numPlanes = 0 sizes the
    * bands from the corpus count). */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 0,
      numBands: Int = 2,
      bucketCap: Int = 100000): DataFrame = {
    val planes = if (numPlanes > 0) numPlanes else autoPlanes(df.count())
    val spreadDf = Materialize.spread(df) // see lshTopK: banding is the heavy map
    val banded = Materialize.index(
      spreadDf.select(col(idCol),
        posexplode(array((0 until numBands).map(b =>
          lshBucket(col(vecCol), dim, planes, b)): _*)).as(Seq("band_idx", "bk"))),
      "neardup-bands")
    val wCap = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "bk").orderBy(idCol)
    val capped = banded.withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= bucketCap).drop("rn")
    val l = capped.select(col(idCol).as("id_a"), col("band_idx"), col("bk"))
    val r = capped.select(col(idCol).as("id_b"), col("band_idx"), col("bk"))
    val cand = l.join(r, Seq("band_idx", "bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Embedding-space outlier detection — the data-quality filter for
    * embedding columns: distance of each vector to its LABEL's centroid,
    * z-scored against the label's own distance distribution; vectors
    * beyond `zThresh` sigma are mislabeled/corrupt/off-distribution
    * candidates. Ingest pipelines quarantine these before ANN indexing
    * (an outlier in an IVF cell poisons the cell's recall).
    *
    * Scale shape: everything is posexploded skinny rows with full
    * partial aggregation — centroid means, per-vector distance sums,
    * and per-label moments are all map-side-combined groupBys; the
    * label-level stats table is tiny and broadcasts back. Centroids
    * round to 6 decimals and distances to 4 BEFORE the downstream
    * stats, so the z-scores are engine-exact (the kmeans precedent).
    * Returns (idCol, labelCol, dist, z, is_outlier). */
  def labelOutliers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      zThresh: Double = 2.0): DataFrame = {
    val flat = Materialize.index(
      df.select(col(labelCol), col(idCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("j", "v"))),
      "outlier-flat")
    val cent = flat.groupBy(labelCol, "j").agg(round(avg("v"), 6).as("c"))
    val dist = flat.join(cent, Seq(labelCol, "j"))
      .groupBy(labelCol, idCol)
      .agg(round(sqrt(sum(pow(col("v") - col("c"), 2))), 4).as("dist"))
    val stats = dist.groupBy(labelCol).agg(
      round(avg("dist"), 4).as("mdist"),
      round(stddev_pop("dist"), 4).as("sdist"))
    dist.join(broadcast(stats), labelCol)
      .withColumn("z", round((col("dist") - col("mdist")) / col("sdist"), 2))
      .withColumn("is_outlier", col("z") >= zThresh)
      .select(idCol, labelCol, "dist", "z", "is_outlier")
  }

  /** Johnson-Lindenstrauss random projection: reduce `dIn`-dim embeddings
    * to `dOut` components with a deterministic ±1 sign matrix,
    * out_j = Σ_i sign(i,j)·v_i / √dOut. Signs derive from md5 hex parity
    * (content-addressed, no RNG to ship or seed-sync across executors) —
    * the same projection is reproducible on any engine, which is also
    * what makes the DuckDB oracle possible.
    *
    * Scale shape: the sign matrix is dIn·dOut rows — KBs — built
    * executor-side from `range` and BROADCAST; the corpus flattens to a
    * skinny (id, i, v) stream via posexplode and the contraction is a
    * broadcast join + partial-aggregated groupBy on (id, j). Nothing
    * collects to the driver; the n·dIn·dOut intermediate is the honest
    * cost of a dense matmul and map-side combine collapses it to n·dOut
    * before the exchange. Returns (idCol, j, comp) skinny form. */
  /** kNN label-noise audit over a labeled embedding corpus: every
    * point's k nearest neighbors vote; points whose neighborhood
    * majority disagrees with their own label are flagged, aggregated
    * to a per-label noise rate — the standard mislabel sweep before a
    * labeled set trains a quality gate.
    *
    * This is self-kNN with the FULL corpus as the query side, so
    * unlike [[ivfTopK]] (small query batch → broadcast) every join
    * here is cell- or id-keyed: IVF cell assignment and per-point
    * probe lists come off ONE materialized (point, centroid, sim)
    * stream, candidates are the probe⋈cell equi-join, and scoring
    * joins vectors back BY ID — nothing corpus-sized broadcasts or
    * collects. Ranking windows partition per point (bounded by probed
    * cell membership, the IVF contract; a hot cell is AQE's skew
    * case). Majority tie-break: (votes desc, label asc); neighbor
    * tie-break: (cos desc, id asc) on 4-dp cosine, both
    * oracle-mirrored.
    *
    * Returns (label, n, n_flagged, noise_rate). */
  def labelNoise(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      numCentroids: Int,
      nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpusD = corpus.select(
      col(idCol), expr(s"transform($vecCol, x -> cast(x AS double))").as("v"),
      col(labelCol).as("_lab"))
    val cents = broadcast(seedCentroids(corpusD, idCol, "v", numCentroids))
    val sims = Materialize.index(
      Materialize.spread(corpusD).select(col(idCol).as("pid"), col("v"))
        .join(cents)
        .select(col("pid"), col("cid"), cosine(col("v"), col("cvec")).as("s")),
      "noise-sims")
    val cells = sims.groupBy("pid")
      .agg(argmaxCell.as("cell")) // hash-combinable; see [[argmaxCell]]
      .select(col("pid").as("corpus_id"), col("cell"))
    val wProbe = Window.partitionBy("pid").orderBy(col("s").desc, col("cid").desc)
    val probes = sims.withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("pid").as("query_id"), col("cid").as("cell"))
    val cand = probes.join(cells, "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")
      .distinct()
    val scored = cand
      .join(corpusD.select(col(idCol).as("query_id"), col("v").as("qv")), "query_id")
      .join(corpusD.select(col(idCol).as("corpus_id"), col("v").as("cv")), "corpus_id")
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
    val wRank = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id").asc)
    val knn = scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id")
    val votes = knn
      .join(corpusD.select(col(idCol).as("corpus_id"), col("_lab").as("nlabel")), "corpus_id")
      .groupBy("query_id", "nlabel").agg(count(lit(1)).as("votes"))
    val wVote = Window.partitionBy("query_id").orderBy(col("votes").desc, col("nlabel"))
    votes.withColumn("rn", row_number().over(wVote)).filter(col("rn") === 1)
      .join(corpusD.select(col(idCol).as("query_id"), col("_lab").as("label")), "query_id")
      .groupBy("label")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("nlabel") =!= col("label"), 1L).otherwise(0L)).as("n_flagged"))
      .select(col("label"), col("n"), col("n_flagged"),
        round(col("n_flagged").cast("double") / col("n"), 4).as("noise_rate"))
  }

  /** Cross-set embedding novelty gate — the ANN analog of
    * [[graft.ops.Dedup.simhashNovelty]]: for each NEW-batch vector, the
    * max cosine into the EXISTING corpus among IVF-probed cells, plus a
    * novel flag (no candidate above `threshold`). The ingest-time dedup
    * decision for an embedding lake: centroids seed from the standing
    * corpus (at scale they're the persisted IVF index), the existing
    * side's cell assignment is reused across batches, and each new
    * vector pays nprobe cells of candidates — cross-set equi-joins plus
    * one max partial aggregate, nothing corpus-sized broadcast or
    * re-derived per batch. New vectors whose probed cells hold no
    * candidates stay novel with null max_cos.
    *
    * Returns (idCol, max_cos, novel) for every new-batch vector. */
  def embedNovelty(
      newBatch: DataFrame,
      existing: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int,
      nprobe: Int,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def prep(df: DataFrame) = df.select(
      col(idCol), expr(s"transform($vecCol, x -> cast(x AS double))").as("v"))
    val exD = prep(existing)
    val nwD = prep(newBatch)
    val cents = broadcast(seedCentroids(exD, idCol, "v", numCentroids))
    val cells = assignCells(Materialize.spread(exD), cents, idCol, "corpus_id", "v")
    val wProbe = Window.partitionBy("qid").orderBy(col("s").desc, col("cid").desc)
    val probes = nwD.select(col(idCol).as("qid"), col("v"))
      .join(cents)
      .select(col("qid"), col("cid"), cosine(col("v"), col("cvec")).as("s"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("cid").as("cell"))
    val cand = probes.join(cells, "cell").select("qid", "corpus_id").distinct()
    val scored = cand
      .join(nwD.select(col(idCol).as("qid"), col("v").as("qv")), "qid")
      .join(exD.select(col(idCol).as("corpus_id"), col("v").as("cv")), "corpus_id")
      .groupBy("qid")
      .agg(max(round(cosine(col("qv"), col("cv")), 4)).as("max_cos"))
    nwD.select(col(idCol).as("qid"))
      .join(scored, Seq("qid"), "left")
      .select(col("qid").as(idCol), col("max_cos"),
        coalesce(col("max_cos") < lit(threshold), lit(true)).as("novel"))
  }

  /** Simplified (centroid) silhouette — the clustering-quality half of
    * the eval family: per point, a = cosine distance to its OWN cell
    * centroid, b = min distance to any OTHER centroid,
    * sil = (b − a) / max(a, b) ∈ [−1, 1], averaged per cell. The
    * classical pairwise silhouette is O(n²); the centroid form
    * (Hruschka et al. 2004) is the one that survives 100 TB: one
    * broadcast-centroid join per point (n·k skinny rows, fully
    * map-side combinable), the same argmax-of-struct cell assignment
    * as [[corpusCells]], and a cell-keyed mean.
    *
    * Determinism: per-point distances round to 6 dp, sil rounds to
    * 6 dp, and the per-cell mean sums FIXED-POINT longs (exactly
    * associative) — partial-agg reordering cannot move the result.
    * The argmax tie-break (lowest cid) matches [[assignCells]], so own
    * vs other centroids can't fork across engines.
    *
    * Returns (cell, n, mean_sil) — low mean_sil flags cells whose
    * members straddle centroids (candidates for re-clustering before
    * cell-based semantic dedup trusts them). */
  def silhouette(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int): DataFrame = {
    val corpusD = corpus.select(
      col(idCol).as("pid"), expr(s"transform($vecCol, x -> cast(x AS double))").as("v"))
    val cents = broadcast(seedCentroids(corpusD, "pid", "v", numCentroids))
    val sims = Materialize.index(
      corpusD.join(cents)
        .select(col("pid"), col("cid"), cosine(col("v"), col("cvec")).as("s")),
      "sil-sims")
    // argmax cell + max(s) in ONE hash aggregate: s_own IS the winning
    // row's s by definition (see [[argmaxCell]] for why not max(struct))
    val best = sims.groupBy("pid")
      .agg(argmaxCell.as("cell"), max(col("s")).as("s_own"))
      .select(col("pid"), col("cell"), col("s_own"))
    val other = sims.join(best.select("pid", "cell"), "pid")
      .filter(col("cid") =!= col("cell"))
      .groupBy("pid").agg(max("s").as("s_other"))
    best.join(other, "pid")
      .withColumn("a", round(lit(1.0) - col("s_own"), 6))
      .withColumn("b", round(lit(1.0) - col("s_other"), 6))
      .withColumn("sil",
        when(greatest(col("a"), col("b")) <= lit(0.0), lit(0.0))
          .otherwise(round((col("b") - col("a")) / greatest(col("a"), col("b")), 6)))
      .withColumn("silfx", round(col("sil") * lit(1e6), 0).cast("long"))
      .groupBy("cell")
      .agg(count(lit(1)).cast("long").as("n"), sum("silfx").as("sfx"))
      .select(col("cell"), col("n"),
        round(col("sfx").cast("double") / col("n") / lit(1e6), 6).as("mean_sil"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL'19 — the "ratio"
    * margin): pair each query vector of language X with its best
    * candidate in language Y, scored by cosine DIVIDED by the average of
    * the two directions' k-NN cosines. The normalization kills hubness —
    * a Y vector close to *everything* has a high backward average, so
    * its raw-cosine wins stop counting; absolute-threshold mining can't
    * do that. The standard parallel-corpus construction for translation
    * pairs and, generally, for cross-set alignment of any two embedding
    * collections.
    *
    * Engine-exactness: every margin is computed in INTEGER arithmetic on
    * 4-dp fixed-point cosines — `m4 = (2·(2·c4·nx·ny)·10⁴ + D) div (2·D)`
    * with `D = sx·ny + sy·nx` — so the ratio (and its rank order) cannot
    * fork between Spark and the oracle on a rounding half. Negative-cos
    * candidates are dropped up front (a non-positive similarity is never
    * a translation pair), which also keeps the integer div in the
    * positive regime where Spark `div` ≡ DuckDB `//`.
    *
    * Scale shape: this is the exact brute baseline — query slice
    * broadcasts over the Y scan, candidate Ys broadcast over the X scan,
    * per-key cuts are rank windows on bounded candidate sets. At corpus
    * scale the two neighbor searches swap to the IVF/LSH candidate
    * generators (same (id, cos) candidate shape); the margin algebra is
    * unchanged. */
  def bitextMarginMine(
      xQueries: DataFrame,
      xCorpus: DataFrame,
      yCorpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = xQueries.select(col(idCol).as("x_id"), col(vecCol).as("xv"))
    val y = yCorpus.select(col(idCol).as("y_id"), col(vecCol).as("yv"))
    val c4 = (a: Column, b: Column) =>
      round(round(cosine(a, b), 4) * 10000).cast("long")
    // forward: each x's top-k positive-cos candidates in Y
    val fwd = y.join(broadcast(q))
      .withColumn("c4", c4(col("xv"), col("yv")))
      .filter(col("c4") > 0)
    val wf = Window.partitionBy("x_id").orderBy(col("c4").desc, col("y_id"))
    val fTop = Materialize.index(
      fwd.withColumn("rk", row_number().over(wf)).filter(col("rk") <= k)
        .select("x_id", "y_id", "c4"),
      "bitext-fwd")
    val fAvg = fTop.groupBy("x_id")
      .agg(sum("c4").as("sx"), count(lit(1)).as("nx"))
    // backward: each CANDIDATE y's top-k against the full X corpus
    val candY = fTop.select("y_id").distinct().join(y, "y_id")
    val xc = xCorpus.select(col(idCol).as("cx_id"), col(vecCol).as("cxv"))
    val wb = Window.partitionBy("y_id").orderBy(col("c4").desc, col("cx_id"))
    val bAvg = xc.join(broadcast(candY))
      .withColumn("c4", c4(col("yv"), col("cxv")))
      .filter(col("c4") > 0)
      .withColumn("rk", row_number().over(wb)).filter(col("rk") <= k)
      .groupBy("y_id")
      .agg(sum("c4").as("sy"), count(lit(1)).as("ny"))
    // integer fixed-point margin; best candidate per x by (margin, y_id)
    val scored = fTop
      .join(fAvg, "x_id")
      .join(bAvg, "y_id")
      .withColumn("_d", col("sx") * col("ny") + col("sy") * col("nx"))
      .withColumn("m4",
        expr("(2 * (2 * c4 * nx * ny) * 10000 + _d) div (2 * _d)"))
    val wm = Window.partitionBy("x_id").orderBy(col("m4").desc, col("y_id"))
    scored.withColumn("mrk", row_number().over(wm)).filter(col("mrk") === 1)
      .select(col("x_id"), col("y_id"),
        round(col("c4") / 10000.0, 4).as("cos"),
        round(col("m4") / 10000.0, 4).as("margin"))
  }

  def randomProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dIn: Int,
      dOut: Int): DataFrame = {
    val mat = df.sparkSession.range(dIn.toLong * dOut)
      .select(
        (col("id") / dOut).cast("int").as("i"),
        (col("id") % dOut).cast("int").as("j"))
      .withColumn("s", when(
        expr("instr('13579bdf', substring(md5(concat(cast(i AS string), '_', cast(j AS string))), 1, 1))") > 0,
        -1.0).otherwise(1.0))
    val flat = df.select(col(idCol),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "v")))
    flat.join(broadcast(mat), "i")
      .groupBy(col(idCol), col("j"))
      .agg(round(sum(col("v") * col("s")) / math.sqrt(dOut.toDouble), 4).as("comp"))
  }
}
