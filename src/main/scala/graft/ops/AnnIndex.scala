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
  * [[ingest]] therefore measures drift (the fraction of the index
  * assigned under arrivals since the last seed/refine) and reports when
  * it crosses the gate, and [[refine]] is the honest full rewrite: one
  * Lloyd update over the full corpus seeded from the standing
  * centroids, committed as a replace-snapshot compaction.
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
    * corpus-sized assignment pass and the only corpus-sized write. */
  def bootstrap(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int,
      store: String): Unit = {
    val (cents, cells) = Similarity.ivfIndexTables(corpus, idCol, vecCol, numCentroids)
    StandingState.writeTables(store, Seq(
      StandingState.TableSpec(CentTable, cents, "cid"),
      StandingState.TableSpec(CellTable, cells, "cell")))
    ()
  }

  /** Witness-verified standing centroid table. */
  def readCentroids(spark: SparkSession, store: String): DataFrame =
    StandingState.readTable(spark, store, CentTable)

  /** Witness-verified standing inverted file (union of every night's
    * partition). */
  def readCells(spark: SparkSession, store: String): DataFrame =
    StandingState.readTable(spark, store, CellTable)

  /** One nightly fold: assign the delta against the standing centroids
    * and append its cells partition. Returns true when the measured
    * drift — delta rows over the resulting index size — crosses
    * `refineAt`, i.e. when the caller should schedule a [[refine]];
    * the fold itself is always exact regardless. */
  def ingest(
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      store: String,
      refineAt: Double = 0.25,
      owner: String = ""): Boolean = {
    val spark = delta.sparkSession
    val cents = readCentroids(spark, store)
    val standingN = readCells(spark, store).count()
    val newCells = Similarity.ivfAssign(delta, cents, idCol, vecCol)
    StandingState.appendTables(store,
      Seq(StandingState.TableSpec(CellTable, newCells, "cell")), owner)
    val deltaN = delta.count()
    deltaN.toDouble / math.max(1L, standingN + deltaN) > refineAt
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
    StandingState.writeTables(store, Seq(
      StandingState.TableSpec(CentTable, newCents, "cid"),
      StandingState.TableSpec(CellTable, newCells, "cell")))
    ()
  }

  /** ANN top-k served FROM the persisted index (latest snapshot). */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      store: String,
      nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    Similarity.ivfTopKFromIndex(
      corpus, queries, idCol, vecCol, k,
      readCentroids(spark, store), readCells(spark, store), nprobe)
  }
}
