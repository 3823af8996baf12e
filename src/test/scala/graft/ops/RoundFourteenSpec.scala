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

  // ------------------------------------------------- block-key probes

  /** (id, 64-char simhash) frames with a planted near-dup structure:
    * old ids 1..n, new ids offset by 1000, a few new fingerprints copy
    * or 1-bit-flip old ones. */
  private def fpFrame(rows: Seq[(Long, String)]) = rows.toDF("asset_id", "simhash")

  private def bits(seed: Int): String = {
    val r = new scala.util.Random(seed)
    (1 to 64).map(_ => if (r.nextBoolean()) '1' else '0').mkString
  }

  private def flip(s: String, i: Int): String =
    s.updated(i, if (s(i) == '1') '0' else '1')

  test("indexed cross-set probe ≡ the unindexed probe, with and without literal keys") {
    val old = (1 to 30).map(i => (i.toLong, bits(i)))
    // new side: two exact copies, two 1-bit flips, six unrelated
    val fresh = Seq(
      (1001L, bits(3)), (1002L, bits(7)),
      (1003L, flip(bits(11), 5)), (1004L, flip(bits(20), 60))) ++
      (1005 to 1010).map(i => (i.toLong, bits(i)))
    val fpNew = fpFrame(fresh)
    val fpOld = fpFrame(old)
    val expected = Dedup.hammingPairsDelta(fpNew, fpOld, "asset_id")
      .select("id_a", "id_b", "hd").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    expected.size should be >= 4 // the plants actually pair
    val oldBlocks = Dedup.blockRows(fpOld, "asset_id", "p|")
    val keys = Dedup.blockRows(fpNew, "asset_id", "p|")
      .select("bk").distinct().collect().map(_.getString(0)).toSeq
    Seq(None, Some(keys)).foreach { pk =>
      val got = Dedup.hammingPairsDeltaIndexed(
        fpNew, oldBlocks, "asset_id", prefix = "p|", probeKeys = pk)
        .select("id_a", "id_b", "hd").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got shouldBe expected
    }
  }

  test("fpblocks probe: pushed IN(bk) filter; sorted layout's footers skip files") {
    val store = SparkFixture.tempDir("r14-fpblocks")
    // 120 assets at 40 rows/file: fingerprints 3 files, fpblocks
    // (6 rows/asset = 720 rows) 18 files, each a narrow sorted bk range
    val base = assets((1L to 120L).map(i =>
      i -> s"standing corpus member $i with its own words " * 3))
    StandingState.bootstrap(base, store, targetRowsPerFile = 40)
    val standingBlocks = StandingState.readTable(spark, store, "fpblocks")
    val total = standingBlocks.count()
    total shouldBe 720L
    // a 2-asset delta probes with its literal keys pushed to the scan
    val delta = assets(Seq(
      201L -> ("standing corpus member 7 with its own words " * 3),
      202L -> "wholly novel content nothing like the base "))
    val deltaFam = Multimodal.perceptualHash(delta)
      .select(col("asset_id"), col("phash").as("simhash"))
    val keys = Dedup.blockRows(deltaFam, "asset_id", "p|")
      .select("bk").distinct().collect().map(_.getString(0)).toSeq
    keys.size shouldBe 6 // 2 distinct fingerprints x 3 blocks
    val probe = Dedup.hammingPairsDeltaIndexed(
      deltaFam, standingBlocks, "asset_id", prefix = "p|",
      probeKeys = Some(keys))
    // the copy of asset 7 pairs at distance 0 through the pruned scan
    probe.select("id_a", "id_b").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet should contain ((7L, 201L))
    // plan pin: the standing-block scan carries the pushed IN filter
    val planText = probe.queryExecution.executedPlan.toString
    planText should include regex "PushedFilters: \\[.*In\\(bk"
    // footer pin: per-file bk min/max (the sorted layout's zone maps)
    // admit the probe's keys into only a few of the files — the rest
    // are skippable without opening their data pages
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val fsys = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(conf)
    val partDir = fsys.listStatus(
      new org.apache.hadoop.fs.Path(s"$store/data/fpblocks")).head.getPath
    val files = fsys.listStatus(partDir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    files.length should be >= 10
    val touched = files.count { f =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        rdr.getFooter.getBlocks.asScala.exists { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == "bk").get.getStatistics
          val mn = st.genericGetMin
            .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
          val mx = st.genericGetMax
            .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
          keys.exists(k => mn <= k && k <= mx)
        }
      } finally rdr.close()
    }
    withClue(s"touched $touched of ${files.length} files: ") {
      touched should be <= (files.length / 2)
    }
    // and the nightly fold over the same store stays exact: ingest the
    // delta, the copy joins asset 7's cluster
    val merged = StandingState.ingest(delta, store)
    val clusterOf = merged.collect().map(r =>
      r.getLong(0) -> r.getLong(1)).toMap
    clusterOf(201L) shouldBe clusterOf(7L)
    // the appended fpblocks partition keeps the table consistent: a
    // full re-read pairs the delta rows through the standing path
    StandingState.readTable(spark, store, "fpblocks").count() shouldBe
      total + 6 * 2
  }

  test("witness zone maps: pruned reads touch only admitting files, verify everything") {
    val store = SparkFixture.tempDir("r14-zonemap")
    val base = assets((1L to 120L).map(i =>
      i -> s"zone mapped corpus member $i with its own words " * 3))
    StandingState.bootstrap(base, store, targetRowsPerFile = 40)
    val allBlocks = StandingState.readTable(spark, store, "fpblocks")
    val totalFiles = allBlocks.inputFiles.length
    totalFiles should be >= 10
    // a 2-asset delta's literal keys: the zone-mapped read must select
    // only the files whose recorded bk range admits one
    val delta = assets(Seq(
      301L -> ("zone mapped corpus member 9 with its own words " * 3),
      302L -> "entirely different payload for the zone test "))
    val deltaFam = Multimodal.perceptualHash(delta)
      .select(col("asset_id"), col("phash").as("simhash"))
    val keys = Dedup.blockRows(deltaFam, "asset_id", "p|")
      .select("bk").distinct().collect().map(_.getString(0)).toSeq
    val pruned = StandingState.readTablePruned(spark, store, "fpblocks", keys)
    withClue(s"${pruned.inputFiles.length} of $totalFiles files: ") {
      pruned.inputFiles.length should be < totalFiles / 2
      pruned.inputFiles.length should be >= 1
    }
    // lossless: the pruned scan holds every key match the full scan holds
    pruned.filter(col("bk").isin(keys: _*)).count() shouldBe
      allBlocks.filter(col("bk").isin(keys: _*)).count()
    // a key outside every zone yields an empty, schema-correct frame
    val none = StandingState.readTablePruned(
      spark, store, "fpblocks", Seq("zz|unmatched"))
    none.count() shouldBe 0L
    none.columns.toSeq shouldBe Seq("bk", "simhash", "asset_id")
    // integral-kind zones: the fingerprint table clusters on asset_id
    val fpAll = StandingState.readTable(spark, store, "fingerprints")
    val fpPruned = StandingState.readTablePruned(
      spark, store, "fingerprints", Seq(7L))
    fpPruned.inputFiles.length should be < fpAll.inputFiles.length
    fpPruned.filter(col("asset_id") === 7L).count() shouldBe 1L
    // appended partitions inherit the base's zones: after a nightly
    // ingest the pruned read still skips non-admitting base files
    StandingState.ingest(delta, store)
    val afterTotal = StandingState.readTable(spark, store, "fpblocks")
      .inputFiles.length
    val afterPruned = StandingState.readTablePruned(
      spark, store, "fpblocks", keys)
    afterPruned.inputFiles.length should be < afterTotal / 2
    // pruning never weakens the tamper gate: corrupting a file the
    // probe would SKIP still refuses the pruned read (verification
    // covers the whole snapshot listing before selection)
    val victim = StandingState.readTable(spark, store, "fpblocks")
      .inputFiles.map(f => f.stripPrefix("file:"))
      .filterNot(f => afterPruned.inputFiles.map(_.stripPrefix("file:")).contains(f))
      .head
    val os = new java.io.FileOutputStream(victim, true)
    try os.write('x') finally os.close()
    intercept[StandingState.StaleStateException] {
      StandingState.readTablePruned(spark, store, "fpblocks", keys).count()
    }
  }

  test("persisted ANN serving: the cells read zone-prunes to the batch's probed cells") {
    val store = SparkFixture.tempDir("r14-cellzone")
    // 8 well-separated uniform clusters (±one-hot over 4 dims), 32
    // vectors each, at 16 rows/file: the inverted file is 16 sorted
    // files, 2 per cell
    def cvecs(ids: Range) = ids.map { i =>
      val c = i % 8
      val v = Array.fill(4)(0.1)
      v(c % 4) = if (c < 4) 10.0 else -10.0
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    AnnIndex.bootstrap(cvecs(0 until 256), "vec_id", "embedding",
      numCentroids = 8, store, targetRowsPerFile = 16)
    val allCells = AnnIndex.readCells(spark, store)
    // range partitioning on the 8 distinct cell values: one file per cell
    val totalFiles = allCells.inputFiles.length
    totalFiles should be >= 8
    val queries = cvecs(0 until 2)
    val out = AnnIndex.topK(cvecs(0 until 256), queries,
      "vec_id", "embedding", k = 3, store, nprobe = 1)
    out.collect()
    // the executed plan's cells scan lists only the files whose witness
    // zone covers one of the (at most 2) probed cells (descend through
    // AQE stages — the final plan hides scans behind QueryStageExec)
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collectWithSubqueries {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
      }.flatten
    val cellScans = scansOf(out.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("cell"))
    cellScans should not be empty
    val listed = cellScans.flatMap(_.relation.location.inputFiles).distinct
    withClue(s"${listed.length} of $totalFiles files: ") {
      listed.length should be < totalFiles / 2
    }
    // pruning is invisible to results: identical to the full-read serve
    val full = Similarity.ivfTopKFromIndex(cvecs(0 until 256), queries,
      "vec_id", "embedding", 3,
      AnnIndex.readCentroids(spark, store), allCells, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe full
  }

  test("generic bounded-cadence compaction: union-fold tables to one partition, zones refreshed") {
    import StandingState.TableSpec
    val store = SparkFixture.tempDir("r14-compact")
    def part(ids: Range) = ids.map(i => (s"tok$i", i.toLong, i.toLong * 2))
      .toDF("tok", "doc_id", "tf")
    StandingState.writeTables(store, Seq(
      TableSpec("postings", part(0 until 40), "tok")), targetRowsPerFile = 10)
    (1 to 4).foreach { n =>
      StandingState.appendTables(store, Seq(
        TableSpec("postings", part(40 * n until 40 * (n + 1)), "tok")))
    }
    val before = StandingState.readTable(spark, store, "postings")
      .collect().map(_.toSeq).toSet
    before.size shouldBe 200
    // under the cap: no-op
    StandingState.compactTables(spark, store,
      Seq("postings" -> "tok"), maxPartitions = 8) shouldBe false
    // over the cap: one replace-snapshot, rows identical, ONE partition
    StandingState.compactTables(spark, store,
      Seq("postings" -> "tok"), maxPartitions = 2,
      targetRowsPerFile = 10) shouldBe true
    val after = StandingState.readTable(spark, store, "postings")
    after.collect().map(_.toSeq).toSet shouldBe before
    after.inputFiles.map(_.split("/data/postings/")(1).split("/")(0))
      .distinct.length shouldBe 1
    StandingState.snapshots(spark, store).size shouldBe 1 // superseded reclaimed
    // the rewrite re-recorded zone maps: a key probe still file-prunes
    val pruned = StandingState.readTablePruned(spark, store, "postings", Seq("tok7"))
    pruned.inputFiles.length should be < after.inputFiles.length
    pruned.filter(col("tok") === "tok7").count() shouldBe 1L
  }

  // ---------------------------------------------- real video frames

  private def gifFrame(i: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.BLACK)
      g.fillRect(0, 0, 32, 32)
      g.setColor(java.awt.Color.WHITE)
      g.fillRect((i % 4) * 8, (i / 4 % 4) * 8, 8, 8)
    } finally g.dispose()
    img
  }

  private def gifBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach(f =>
        w.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    baos.toByteArray
  }

  test("real animated GIF: trimmed copy detected at the planted offset over real pixels") {
    val full = gifBytes((0 until 10).map(gifFrame))
    val trimmed = gifBytes((3 until 10).map(gifFrame)) // drops the first 3 frames
    val media = Seq((1L, full), (2L, trimmed), (3L, "not a gif".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val decoded = Multimodal.decodeWith(
      media, Multimodal.videoDecodedSchema)(Multimodal.gifFrameDecoder)
    val byAsset = decoded.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byAsset(1L) shouldBe 10L // every container frame decoded
    byAsset(2L) shouldBe 7L
    byAsset(3L) shouldBe 1L  // poison pill: one null row, partition alive
    decoded.filter(col("asset_id") === 3L && col("luma64").isNotNull)
      .count() shouldBe 0L
    val fh = Multimodal.videoFrameHashes(decoded)
    // real pixels, distinct per frame pattern: 10 distinct fingerprints
    fh.filter(col("asset_id") === 1L).select("fhash").distinct()
      .count() shouldBe 10L
    // frame-set Jaccard finds the pair (7 shared of 10 distinct = 0.7)
    val pairs = Multimodal.videoPairsFrom(fh, threshold = 0.5).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq shouldBe
      Seq((1L, 2L, 0.7))
    // temporal alignment recovers the planted trim offset: asset 1's
    // frame 3 is asset 2's frame 0, on 7 aligned positions
    val align = Multimodal.frameAlignmentFrom(fh, minAligned = 3).collect()
    align.map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSeq shouldBe Seq((1L, 2L, 3L, 7L))
  }
}
