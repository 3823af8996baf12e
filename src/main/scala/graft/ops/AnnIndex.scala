package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVF ANN index through the generic [[StandingState]] seam —
  * the last expensive index family that was still rebuilt in-query: the
  * standing `centroids` (cid, cvec — tiny, broadcastable) and `cells`
  * (corpus_id, cell — the inverted file) tables live in a snapshot
  * store behind the tamper witness.
  *
  * Nightly maintenance is EXACT by construction: a vector's nearest
  * centroid is independent of every other vector, so [[ingest]] assigns
  * ONLY the delta batch against the standing centroids (broadcast join,
  * one row per delta vector) and APPENDS the delta cells partition —
  * the standing corpus is never re-read and nothing is rewritten. What
  * drifts under arrivals is centroid QUALITY (recall), not correctness;
  * [[ingest]] therefore measures CUMULATIVE drift — the fraction of the
  * index assigned under arrivals since the last seed/[[refine]]
  * (a replace-snapshot is the reset point) — and reports when it
  * crosses the gate; [[refine]] is the honest full rewrite: one Lloyd
  * update over the full corpus seeded from the standing centroids,
  * committed as a replace-snapshot compaction.
  *
  * The drift fraction is derived ENTIRELY from snapshot metadata: the
  * witness records each partition's row count from the write's own
  * file-sizing pass, and a partition dir's name carries the snapshot
  * that wrote it — rows in partitions newer than the seed/refine
  * partition are exactly the rows assigned under stale centroids. So
  * the gate costs zero Spark jobs (no `readCells().count()`), it is
  * cumulative by construction (ten 5% nights correctly cross a 0.25
  * gate around night six, where a per-delta fraction would never
  * fire and recall would erode unobserved), and a same-`owner` replay
  * returns the SAME verdict as the original call — the skipped append
  * leaves the committed metadata, the only input, unchanged.
  *
  * Scale shape: centroids broadcast; the cells file is ids-only (the
  * serving path [[Similarity.ivfTopKFromIndex]] re-enters vectors only
  * for final candidate ranking, keyed by id); each cells partition is
  * range-clustered on `cell`, so a probe's cell-equality join prunes
  * files by footer min/max — the bucketed-by-cell inverted-file layout
  * the in-query op's doc promised for ingest time. */
object AnnIndex {

  private val CentTable = "centroids"
  private val CellTable = "cells"

  /** Night 0: seed centroids from the base corpus (deterministic stride
    * sampling, no RNG to ship) and assign every base vector — the only
    * corpus-sized assignment pass and the only corpus-sized write. The
    * cells table carries the VECTOR PAYLOAD alongside (cell, id) — the
    * classic IVF layout (Jégou et al. 2011: inverted lists store the
    * vectors) — so serving's exact rerank reads only probed cells'
    * files and never re-scans the raw corpus (which at 100 TB would
    * make every query batch a full-corpus pass). */
  def bootstrap(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int,
      store: String,
      targetRowsPerFile: Long = 4000000L): Unit = {
    val (cents, cells) = Similarity.ivfIndexTables(corpus, idCol, vecCol, numCentroids)
    StandingState.writeTables(store, Seq(
      StandingState.TableSpec(CentTable, cents, "cid"),
      StandingState.TableSpec(CellTable,
        withPayload(cells, corpus, idCol, vecCol), "cell")), targetRowsPerFile)
    ()
  }

  /** (cell, corpus_id) assignment + the vector payload, joined back by
    * id — one write-time id-keyed join, so read-time probes never pay
    * it. */
  private def withPayload(
      assigned: DataFrame,
      vectors: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    assigned.join(
        vectors.select(col(idCol).as("corpus_id"), col(vecCol)), "corpus_id")
      .select(col("cell"), col("corpus_id"), col(vecCol))

  /** Witness-verified standing centroid table. */
  def readCentroids(spark: SparkSession, store: String): DataFrame =
    StandingState.readTable(spark, store, CentTable)

  /** Witness-verified standing inverted file (union of every night's
    * partition). */
  def readCells(spark: SparkSession, store: String): DataFrame =
    StandingState.readTable(spark, store, CellTable)

  /** The serving batch's probed cell ids as driver literals — the
    * nprobe-nearest standing centroids per query, exactly the ranking
    * the serving plan re-derives in-flight (both deterministic, so they
    * agree). One tiny job: the centroid table broadcasts against the
    * query batch and |queries|·nprobe skinny rows reduce to ≤
    * |queries|·nprobe distinct ints on the driver — bounded by the
    * SERVING REQUEST, never the corpus. With these, the standing cells
    * read prunes to only the files whose witness zone covers a probed
    * cell ([[StandingState.readTablePruned]]) — at 100 TB the inverted
    * file is corpus-sized and a probe touches nprobe/ncells of it, so
    * metadata file-pruning is the difference between reading the probed
    * cells and scanning the whole index. None past the literal cap
    * (a huge query batch amortizes the full scan it falls back to). */
  private def probedCells(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cents: DataFrame,
      nprobe: Int): Option[Seq[Int]] = {
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("cid").desc)
    val ids = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("v"))
      .join(broadcast(cents.select(col("cid"), col("cvec"))))
      .select(col("query_id"), col("cid"),
        Similarity.cosine(col("v"), col("cvec")).as("s"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select("cid").distinct()
      .limit(StandingState.ProbeLiteralCap + 1)
      .collect().map(_.getInt(0)).toIndexedSeq
    if (ids.size > StandingState.ProbeLiteralCap) None else Some(ids)
  }

  /** The standing cells table pruned to the batch's probed cells when
    * the literal path applies, the full witness-verified read
    * otherwise. */
  private def cellsFor(
      spark: SparkSession,
      store: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cents: DataFrame,
      nprobe: Int): DataFrame =
    probedCells(queries, idCol, vecCol, cents, nprobe) match {
      case Some(ids) => StandingState.readTablePruned(spark, store, CellTable, ids)
      case None => readCells(spark, store)
    }

  /** Pruning census for a serving batch: (admitting files, total files)
    * of the standing cells table under the batch's probed cell ids —
    * the soak's measured evidence that a probe reads nprobe cells'
    * files, not the index ([[StandingState.prunedFileCounts]]; None
    * when the batch's keys overflow the literal cap and the read falls
    * back to the full scan). */
  private[graft] def probeFileCounts(
      spark: SparkSession,
      store: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      nprobe: Int): Option[(Int, Int)] =
    probedCells(queries, idCol, vecCol, readCentroids(spark, store), nprobe)
      .map(ids => StandingState.prunedFileCounts(spark, store, CellTable, ids))

  /** One nightly fold: assign the delta against the standing centroids
    * and append its cells partition. Returns true when the CUMULATIVE
    * drift — rows appended since the last seed/[[refine]] over the
    * resulting index size, read from snapshot metadata (see object doc)
    * — crosses `refineAt`, i.e. when the caller should schedule a
    * [[refine]]; the fold itself is always exact regardless. */
  def ingest(
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      store: String,
      refineAt: Double = 0.25,
      owner: String = ""): Boolean = {
    val spark = delta.sparkSession
    val cents = readCentroids(spark, store)
    val assigned = Similarity.ivfAssign(delta, cents, idCol, vecCol)
    // match the standing cells shape: payload-carrying stores append
    // payload cells; a legacy ids-only store keeps its shape (the
    // schema-drift gate would refuse a mixed append) until a refine
    // rewrites it into the payload layout
    val newCells =
      if (readCells(spark, store).columns.contains(vecCol))
        withPayload(assigned, delta, idCol, vecCol)
      else assigned
    val snap = StandingState.appendTables(store,
      Seq(StandingState.TableSpec(CellTable, newCells, "cell")), owner)
    driftSinceRefine(spark, store, CellTable, snap) > refineAt
  }

  /** Cumulative IVF drift at the latest snapshot — the fraction of the
    * standing index assigned under arrivals since the last
    * seed/[[refine]], from witness metadata alone (one witness file
    * read, zero Spark jobs — cheap enough for a serving-layer gauge).
    * This is the OPERATIONAL surface of the gate [[ingest]] returns to
    * its caller: a deployment wires it into its metrics registry
    * (`ServingMetrics.registerAnnDrift`) so index staleness is visible
    * on the wire, not just to whichever job ran last night's fold. */
  def drift(spark: SparkSession, store: String): Double =
    driftSinceRefine(spark, store, CellTable,
      StandingState.latestSnapshot(spark, store))

  /** Cumulative PQ drift at the latest snapshot (codes coded under
    * codebooks older than the last seed/[[refinePq]]) — see [[drift]]. */
  def driftPq(spark: SparkSession, store: String): Double =
    driftSinceRefine(spark, store, CodeTable,
      StandingState.latestSnapshot(spark, store))

  /** Fraction of `table`'s rows (at snapshot `snap`) living in
    * partitions APPENDED after the last replace-commit — the cumulative
    * assigned-under-stale-centroids share, from witness metadata alone.
    * The seed/refine partition is the one carrying the OLDEST snapshot
    * id in the partition-dir name (a replace drops everything older). */
  private[ops] def driftSinceRefine(
      spark: SparkSession, store: String, table: String, snap: Long): Double = {
    val rows = StandingState.partitionRows(spark, store, snap, table)
    require(rows.nonEmpty,
      s"store $store snapshot $snap records no row counts for $table — " +
        "committed by a pre-rowcount writer; refine to rewrite the witness")
    val bySnap = rows.map { case (dir, n) =>
      val m = "/p(\\d+)-".r.findFirstMatchIn(dir).getOrElse(
        throw new IllegalStateException(s"unparseable partition dir $dir"))
      (m.group(1).toLong, n)
    }
    val seedSnap = bySnap.map(_._1).min
    val total = bySnap.map(_._2).sum
    val appended = bySnap.filter(_._1 > seedSnap).map(_._2).sum
    appended.toDouble / math.max(1L, total)
  }

  /** The drift response: one Lloyd centroid update over the FULL corpus
    * seeded from the standing centroids, then a full reassignment —
    * committed as a replace-snapshot (the bounded-cadence honest
    * rewrite; [[StandingState.keepSnapshots]] reclaims the superseded
    * partitions). Deterministic: means round to 6 decimals before
    * reassignment, the [[Similarity.kmeansRefine]] contract. */
  def refine(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      store: String): Unit = {
    val spark = corpus.sparkSession
    val corpusD = corpus.select(
      col(idCol), expr(s"transform($vecCol, x -> cast(x AS double))").as("v"))
    val standing = readCentroids(spark, store)
      .select(col("cid"), expr("transform(cvec, x -> cast(x AS double))").as("cvec"))
    val assigned = Similarity.ivfAssign(corpusD, standing, idCol, "v")
    val newCents = Similarity.lloydCentroids(corpusD, idCol, "v", assigned)
    val newCells = Similarity.ivfAssign(corpusD, newCents, idCol, "v")
    // replace commits are the schema migration path: a refine upgrades
    // an ids-only legacy store to the payload-carrying layout
    // payload keeps the CALLER's native vector type (no double-cast):
    // a later delta ingest appends the same shape, so the drift gate
    // stays quiet across refine → ingest cycles
    StandingState.writeTables(store, Seq(
      StandingState.TableSpec(CentTable, newCents, "cid"),
      StandingState.TableSpec(CellTable,
        withPayload(newCells, corpus, idCol, vecCol), "cell")))
    ()
  }

  // ------------------------------------------------------------- PQ seam
  // The OTHER compressed-ANN half persisted through the same snapshot
  // store: per-subspace codebooks (m·k rows — tiny, broadcastable) and
  // per-vector codes ((id, j, code) — ~4 bytes of payload per vector
  // instead of 4·dim, the layout that makes an exhaustive ADC scan
  // feasible where the raw corpus is hundreds of TB). Nightly
  // maintenance is EXACT by construction, like the IVF half: a vector's
  // code in each subspace depends only on the standing codebooks, so
  // the delta is coded against them (broadcast join) and APPENDED; what
  // drifts is codebook quality (quantization distortion), measured by
  // the same cumulative metadata gate and reset by [[refinePq]].

  private val CbTable = "pq_codebooks"
  private val CodeTable = "pq_codes"

  /** Night 0 of the PQ index: learn codebooks from the base corpus
    * (deterministic stride seeding, sliced per subspace — no RNG) and
    * code every base vector — the only corpus-sized coding pass. Codes
    * are range-clustered on `corpus_id`, so candidate joins keyed by id
    * (the IVFADC composition) prune code files by footer min/max. */
  def bootstrapPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      store: String,
      m: Int = 4,
      subDim: Int = 16,
      k: Int = 8): Unit = {
    val cb = Similarity.pqCodebooks(corpus, idCol, vecCol, m, subDim, k)
    val codes = Similarity.pqCodesLong(
      corpus, idCol, "corpus_id", vecCol, m, subDim, k, Some(cb))
    StandingState.writeTables(store, Seq(
      StandingState.TableSpec(CbTable, cb, "cid"),
      StandingState.TableSpec(CodeTable, codes, "corpus_id")))
    ()
  }

  /** Witness-verified standing PQ codebooks (j, cid, scv). */
  def readCodebooks(spark: SparkSession, store: String): DataFrame =
    StandingState.readTable(spark, store, CbTable)

  /** Witness-verified standing PQ code table — the union of every
    * night's partition: (corpus_id, j, code). */
  def readCodes(spark: SparkSession, store: String): DataFrame =
    StandingState.readTable(spark, store, CodeTable)

  /** One nightly PQ fold: code the delta against the STANDING codebooks
    * (broadcast — exact per vector by construction) and append its code
    * partition. Returns true when the cumulative drift since the last
    * seed/[[refinePq]] crosses `refineAt`, from the same witness
    * metadata as the IVF gate (code rows are m× vector rows uniformly,
    * so the row fraction equals the vector fraction). */
  def ingestPq(
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      store: String,
      refineAt: Double = 0.25,
      owner: String = "",
      m: Int = 4,
      subDim: Int = 16): Boolean = {
    val spark = delta.sparkSession
    val cb = readCodebooks(spark, store)
    val codes = Similarity.pqCodesLong(
      delta, idCol, "corpus_id", vecCol, m, subDim, k = 0, Some(cb))
    val snap = StandingState.appendTables(store,
      Seq(StandingState.TableSpec(CodeTable, codes, "corpus_id")), owner)
    driftSinceRefine(spark, store, CodeTable, snap) > refineAt
  }

  /** The PQ drift response: relearn codebooks over the FULL corpus and
    * recode every vector — committed as a replace-snapshot (the
    * bounded-cadence honest rewrite and the drift gate's reset point;
    * [[StandingState.keepSnapshots]] reclaims the superseded
    * partitions). */
  def refinePq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      store: String,
      m: Int = 4,
      subDim: Int = 16,
      k: Int = 8): Unit = {
    val cb = Similarity.pqCodebooks(corpus, idCol, vecCol, m, subDim, k)
    val codes = Similarity.pqCodesLong(
      corpus, idCol, "corpus_id", vecCol, m, subDim, k, Some(cb))
    StandingState.writeTables(store, Seq(
      StandingState.TableSpec(CbTable, cb, "cid"),
      StandingState.TableSpec(CodeTable, codes, "corpus_id")))
    ()
  }

  /** PQ ANN (ADC shortlist + exact rerank) served FROM the persisted
    * index (latest snapshot): the ADC scan reads the standing code
    * table only — no raw vectors — and the rerank re-enters vectors
    * for just the shortlist. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      store: String,
      shortlist: Int = 50,
      m: Int = 4,
      subDim: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    Similarity.pqTopKRerankFromIndex(
      corpus, queries, idCol, vecCol, k,
      readCodebooks(spark, store), readCodes(spark, store),
      shortlist, m, subDim)
  }

  /** IVFADC served FROM BOTH persisted halves (latest snapshots) — the
    * composed serving shape a billion-vector deployment runs: cell
    * routing from the standing IVF store (`ivfStore`), ADC candidate
    * ranking from the standing PQ store (`pqStore`), exact rerank of
    * the shortlist only. Nothing is rebuilt in-query; the two stores
    * maintain independently ([[ingest]] / [[ingestPq]], each under its
    * own cumulative drift gate) and compose at read time. */
  def ivfadcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      ivfStore: String,
      pqStore: String,
      nprobe: Int = 4,
      shortlist: Int = 50,
      m: Int = 4,
      subDim: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    val cents = readCentroids(spark, ivfStore)
    Similarity.ivfadcTopKFromIndex(
      corpus, queries, idCol, vecCol, k,
      cents, cellsFor(spark, ivfStore, queries, idCol, vecCol, cents, nprobe),
      readCodebooks(spark, pqStore), readCodes(spark, pqStore),
      nprobe, shortlist, m, subDim)
  }

  /** ANN top-k served FROM the persisted index (latest snapshot). The
    * inverted-file read is zone-map-pruned to the batch's probed cells
    * ([[cellsFor]]) — at scale a probe reads nprobe cells' files, never
    * the whole index. */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      store: String,
      nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val cents = readCentroids(spark, store)
    Similarity.ivfTopKFromIndex(
      corpus, queries, idCol, vecCol, k,
      cents, cellsFor(spark, store, queries, idCol, vecCol, cents, nprobe), nprobe)
  }

  // -------------------------------------------- composed IVFADC store

  /** ONE standing store carrying all four IVFADC tables — centroids,
    * payload cells, codebooks, and codes CLUSTERED BY CELL — the
    * serving-optimal layout a dedicated vector-serving deployment
    * runs. With codes range-clustered on the vector's cell, the ADC
    * scan file-prunes to the probed cells exactly like the cells read
    * does, so NO stage of a query batch reads bytes outside the probed
    * cells (the two-store composition [[ivfadcTopK]] keeps independent
    * maintenance but its ADC pass scans the whole compressed code
    * table — ~1% of corpus bytes, linear all the same). One commit
    * writes all four tables; one commit appends each night's cells +
    * codes, so the index is never half-visible. */
  def bootstrapComposed(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int,
      store: String,
      m: Int = 4,
      subDim: Int = 16,
      k: Int = 8,
      targetRowsPerFile: Long = 4000000L): Unit = {
    val (cents, assigned) = Similarity.ivfIndexTables(corpus, idCol, vecCol, numCentroids)
    val cb = Similarity.pqCodebooks(corpus, idCol, vecCol, m, subDim, k)
    val codes = Similarity.pqCodesLong(
      corpus, idCol, "corpus_id", vecCol, m, subDim, k, Some(cb))
    StandingState.writeTables(store, Seq(
      StandingState.TableSpec(CentTable, cents, "cid"),
      StandingState.TableSpec(CellTable,
        withPayload(assigned, corpus, idCol, vecCol), "cell"),
      StandingState.TableSpec(CbTable, cb, "cid"),
      StandingState.TableSpec(CodeTable,
        codesByCell(codes, assigned), "cell")), targetRowsPerFile)
    ()
  }

  /** (corpus_id, j, code) + the vector's cell, range-clustered on it —
    * the write-time join that buys the read-time ADC file pruning. */
  private def codesByCell(codes: DataFrame, assigned: DataFrame): DataFrame =
    codes.join(assigned.select(col("corpus_id"), col("cell")), "corpus_id")
      .select(col("cell"), col("corpus_id"), col("j"), col("code"))

  /** One nightly fold into the composed store: assign + code the delta
    * against the standing centroids/codebooks (both broadcast-exact)
    * and append cells + codes in ONE commit. Returns the same
    * cumulative-drift verdict as [[ingest]]. */
  def ingestComposed(
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      store: String,
      refineAt: Double = 0.25,
      owner: String = "",
      m: Int = 4,
      subDim: Int = 16): Boolean = {
    val spark = delta.sparkSession
    val assigned = Similarity.ivfAssign(delta, readCentroids(spark, store), idCol, vecCol)
    val codes = Similarity.pqCodesLong(
      delta, idCol, "corpus_id", vecCol, m, subDim, k = 0,
      Some(readCodebooks(spark, store)))
    val snap = StandingState.appendTables(store, Seq(
      StandingState.TableSpec(CellTable,
        withPayload(assigned, delta, idCol, vecCol), "cell"),
      StandingState.TableSpec(CodeTable,
        codesByCell(codes, assigned), "cell")), owner)
    driftSinceRefine(spark, store, CellTable, snap) > refineAt
  }

  /** IVFADC served ENTIRELY from the composed store — no corpus
    * argument at all: cell routing from the broadcast centroids, the
    * candidate list AND the rerank vectors from the probed-cell-pruned
    * cells read, the ADC codes from the probed-cell-pruned codes read.
    * Identical results to [[ivfadcTopK]] over the same tables by
    * construction (the pruned code read is a superset restriction:
    * every candidate's codes live in a probed cell). */
  def ivfadcTopKComposed(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      store: String,
      nprobe: Int = 4,
      shortlist: Int = 50,
      m: Int = 4,
      subDim: Int = 16): DataFrame = {
    val spark = queries.sparkSession
    val cents = readCentroids(spark, store)
    // ONE probe collect shared by both pruned reads
    val probed = probedCells(queries, idCol, vecCol, cents, nprobe)
    val cells = probed match {
      case Some(ids) => StandingState.readTablePruned(spark, store, CellTable, ids)
      case None => readCells(spark, store)
    }
    val codes = probed match {
      case Some(ids) => StandingState.readTablePruned(spark, store, CodeTable, ids)
      case None => StandingState.readTable(spark, store, CodeTable)
    }
    // `queries` stands in for the (unused) corpus parameter: the cells
    // frame carries the payload, so the legacy corpus-rerank branch is
    // never taken
    Similarity.ivfadcTopKFromIndex(
      queries, queries, idCol, vecCol, kNeighbors,
      cents, cells, readCodebooks(spark, store),
      codes.select(col("corpus_id"), col("j"), col("code")),
      nprobe, shortlist, m, subDim)
  }
}
