package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-14 pins: the CUMULATIVE ANN drift gate (rows-since-refine from
  * witness metadata, zero Spark count jobs, replay-stable), retention
  * and compaction under the writer lease, the stale-base refusal on
  * replace commits, honest lease error classification, and the
  * fully-qualified witness-digest registry. */
class RoundFourteenSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def assets(texts: Seq[(Long, String)]) =
    Multimodal.assetsFromText(texts.toDF("id", "txt"), "id", "txt")
      .withColumnRenamed("id", "asset_id")

  private val corpusTexts: Seq[(Long, String)] = (1L to 40L).map { i =>
    i -> s"unique material number $i with its own distinct words " * 2
  }

  private def vecs(ids: Range) = ids.map(i => (i.toLong, Seq(
    (i % 7).toDouble, (i * 3 % 5).toDouble, (i * 5 % 11).toDouble, 1.0)))
    .toDF("vec_id", "embedding")

  test("ANN drift gate is CUMULATIVE: N sub-gate nights fire exactly when the sum crosses") {
    val store = SparkFixture.tempDir("r14-cumdrift")
    AnnIndex.bootstrap(vecs(0 until 100), "vec_id", "embedding",
      numCentroids = 4, store)
    // four nights of 12 rows each against a 100-row seed, gate at 0.30:
    // each night's OWN fraction stays under 0.11 (a per-delta gate would
    // never fire), but the cumulative crosses on night 4 (48/148 = 0.324)
    val verdicts = (0 until 4).map { n =>
      AnnIndex.ingest(vecs(100 + 12 * n until 112 + 12 * n),
        "vec_id", "embedding", store, refineAt = 0.30)
    }
    verdicts shouldBe Seq(false, false, false, true)
    // refine is the reset point: the replace-snapshot partition becomes
    // the new seed, so the next sub-gate night reports no drift debt
    AnnIndex.refine(vecs(0 until 148), "vec_id", "embedding", store)
    StandingState.keepSnapshots(spark, store, keep = 1)
    AnnIndex.ingest(vecs(148 until 160), "vec_id", "embedding", store,
      refineAt = 0.30) shouldBe false
  }

  test("ANN ingest replay under the same owner returns the ORIGINAL drift verdict") {
    val store = SparkFixture.tempDir("r14-replaydrift")
    AnnIndex.bootstrap(vecs(0 until 20), "vec_id", "embedding",
      numCentroids = 2, store)
    // 12 rows on a 20-row seed: 12/32 = 0.375 > 0.3 → fires
    val first = AnnIndex.ingest(vecs(20 until 32), "vec_id", "embedding",
      store, refineAt = 0.30, owner = "night-1")
    first shouldBe true
    val snaps = StandingState.snapshots(spark, store)
    // the replay skips the append (same owner) AND reports the same
    // verdict — the gate reads committed metadata, which the skip left
    // unchanged (a standing-count recount would double-count the delta
    // and flip this to false)
    AnnIndex.ingest(vecs(20 until 32), "vec_id", "embedding",
      store, refineAt = 0.30, owner = "night-1") shouldBe true
    StandingState.snapshots(spark, store) shouldBe snaps
  }

  test("persisted PQ index: chained nightly coding ≡ from-scratch; cumulative gate + refine reset") {
    val emb = vecs(0 until 60)
    val base = emb.filter(col("vec_id") < 28)
    val store = SparkFixture.tempDir("r14-pq")
    AnnIndex.bootstrapPq(base, "vec_id", "embedding", store,
      m = 2, subDim = 2, k = 3)
    // two nightly folds against the STANDING codebooks
    AnnIndex.ingestPq(emb.filter(col("vec_id") >= 28 && col("vec_id") < 31),
      "vec_id", "embedding", store, m = 2, subDim = 2) shouldBe false
    AnnIndex.ingestPq(emb.filter(col("vec_id") >= 31 && col("vec_id") < 34),
      "vec_id", "embedding", store, m = 2, subDim = 2) shouldBe false
    val corpus34 = emb.filter(col("vec_id") < 34)
    val queries = emb.filter(col("vec_id") < 3)
    val persisted = AnnIndex.pqTopK(corpus34, queries, "vec_id", "embedding",
      k = 4, store, shortlist = 10, m = 2, subDim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // from-scratch: codebooks from the base, codes over the full corpus
    val scratch = Similarity.pqTopKRerank(
      corpus34, queries, "vec_id", "embedding", kNeighbors = 4,
      shortlist = 10, m = 2, subDim = 2, k = 3)
    // pqTopKRerank seeds from its corpus arg — rebuild via the index form
    // so the codebooks come from the BASE, exactly like the chain
    val cbBase = AnnIndex.readCodebooks(spark, store).collect()
    val scratchFromBase = Similarity.pqTopKRerankFromIndex(
      corpus34, queries, "vec_id", "embedding", kNeighbors = 4,
      codebooks = AnnIndex.readCodebooks(spark, store),
      codes = {
        // recode the FULL corpus in one pass against the base codebooks
        val cb = AnnIndex.readCodebooks(spark, store)
        graft.ops.Similarity.pqCodesLong(
          corpus34, "vec_id", "corpus_id", "embedding", 2, 2, 0, Some(cb))
      },
      shortlist = 10, m = 2, subDim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    persisted shouldBe scratchFromBase
    cbBase.length shouldBe 2 * 3 // m subspaces × k centroids
    scratch.collect() // the in-query form still runs (different seeding)
    // a big delta crosses the cumulative gate; refinePq resets it
    AnnIndex.ingestPq(emb.filter(col("vec_id") >= 34), "vec_id", "embedding",
      store, refineAt = 0.30, m = 2, subDim = 2) shouldBe true
    AnnIndex.refinePq(emb, "vec_id", "embedding", store, m = 2, subDim = 2, k = 3)
    StandingState.keepSnapshots(spark, store, keep = 1)
    AnnIndex.readCodes(spark, store).select("corpus_id").distinct()
      .count() shouldBe 60L
    AnnIndex.ingestPq(vecs(60 until 63), "vec_id", "embedding",
      store, refineAt = 0.30, m = 2, subDim = 2) shouldBe false
  }

  test("witness row counts: per-partition rows recorded on write, inherited by reference") {
    val store = SparkFixture.tempDir("r14-rows")
    StandingState.bootstrap(assets(corpusTexts.take(12)), store)
    StandingState.ingest(assets(corpusTexts.slice(12, 16)), store)
    val latest = StandingState.latestSnapshot(spark, store)
    val fpRows = StandingState.partitionRows(spark, store, latest, "fingerprints")
    fpRows.map(_._2).sum shouldBe
      StandingState.readFingerprints(spark, store).count()
    // two partitions: the inherited base (12) and the appended delta (4)
    fpRows.map(_._2).sorted shouldBe Seq(4L, 12L)
    // the base partition's count was inherited from snapshot 0's witness,
    // not recounted: snapshot 0 records it identically
    StandingState.partitionRows(spark, store, 0L, "fingerprints")
      .map(_._2) shouldBe Seq(12L)
  }

  test("retention runs under the writer lease: a held foreign lease refuses loudly") {
    val store = SparkFixture.tempDir("r14-leaseret")
    StandingState.bootstrap(assets(corpusTexts.take(12)), store)
    StandingState.ingest(assets(corpusTexts.slice(12, 16)), store)
    val lease = new java.io.File(s"$store/_LEASE")
    val os = new java.io.FileOutputStream(lease)
    try os.write("mid-commit-writer".getBytes("UTF-8")) finally os.close()
    // every retention path is a mutation: racing a live commit could
    // sweep its freshly written, not-yet-referenced partitions
    intercept[StandingState.StaleStateException] {
      StandingState.keepSnapshots(spark, store, keep = 1)
    }.getMessage should include("write-leased")
    intercept[StandingState.StaleStateException] {
      StandingState.rollbackTo(spark, store, 0L)
    }.getMessage should include("write-leased")
    intercept[StandingState.StaleStateException] {
      StandingState.retireSnapshot(spark, store, 0L)
    }.getMessage should include("write-leased")
    intercept[StandingState.StaleStateException] {
      StandingState.retire(spark, store)
    }.getMessage should include("write-leased")
    StandingState.breakLease(spark, store)
    noException should be thrownBy StandingState.keepSnapshots(spark, store, keep = 1)
  }

  test("replace-commit with expectedBase refuses a base that moved (no silent drop)") {
    val store = SparkFixture.tempDir("r14-replacebase")
    StandingState.bootstrap(assets(corpusTexts.take(12)), store)
    val readAt = StandingState.latestSnapshot(spark, store)
    val compacted = StandingState.readFingerprints(spark, store)
    // another writer commits between the compaction's read and its write
    StandingState.ingest(assets(corpusTexts.slice(12, 16)), store)
    val ex = intercept[StandingState.StaleStateException] {
      StandingState.writeTables(store, Seq(
        StandingState.TableSpec("fingerprints", compacted, "asset_id")),
        expectedBase = Some(readAt))
    }
    ex.getMessage should include("not the latest")
    // the interleaving writer's delta survived
    StandingState.readFingerprints(spark, store).count() shouldBe 16
  }

  test("lease acquisition I/O failures surface as the real error, never 'write-leased'") {
    // an ancestor of the store path is a regular FILE: lease acquisition
    // cannot possibly succeed, and the failure is an I/O error — not a
    // held lease to be reported as a concurrent writer
    val parent = new java.io.File(SparkFixture.tempDir("r14-ioerr"), "blocker")
    val os = new java.io.FileOutputStream(parent)
    try os.write(1) finally os.close()
    val bad = s"${parent.getAbsolutePath}/store"
    val ex = intercept[java.io.IOException] {
      StandingState.keepSnapshots(spark, bad, keep = 1)
    }
    ex should not be a[StandingState.StaleStateException]
  }

  test("witness-digest registry keys are fully qualified; ambiguity refuses the bridge") {
    val store = SparkFixture.tempDir("r14-qualified")
    StandingState.bootstrap(assets(corpusTexts.take(8)), store)
    val dataFile = s"$store/data/fingerprints/p00000-x/part-0.parquet"
    // scheme-qualified and bare spellings of the SAME local store match
    StandingState.witnessedVersion(s"file:$dataFile") should not be empty
    StandingState.witnessedVersion(dataFile) should not be empty
    // an explicit FOREIGN scheme on the same path must NOT be served the
    // local store's digest — that aliasing is the stale-cache-hit bug
    StandingState.witnessedVersion(s"hdfs://nn$dataFile") shouldBe empty
    // and both spellings resolve to the same tag (one registry entry)
    StandingState.witnessedVersion(s"file:$dataFile") shouldBe
      StandingState.witnessedVersion(dataFile)
  }
}
