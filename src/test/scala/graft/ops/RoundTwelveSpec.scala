package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-12 pins: the PERSISTED standing-state seam (nightly ingest
  * reads yesterday's tables, folds the delta, writes today's —
  * merge ≡ recompute across the write/read boundary), its tamper
  * witness, and the frameHashes composite-id envelope guard. */
class RoundTwelveSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def assets(texts: Seq[(Long, String)]) =
    Multimodal.assetsFromText(texts.toDF("id", "txt"), "id", "txt")
      .withColumnRenamed("id", "asset_id")

  // near-dup families spanning the night splits: ids ≡ 0 mod 4 share a
  // payload family (small leading edits), everything else is unique
  private val corpusTexts: Seq[(Long, String)] = (1L to 36L).map { i =>
    i -> (if (i % 4 == 0)
      s"x$i" + ("shared near duplicate payload body with stable words " * 3).drop(3)
    else s"unique material number $i with its own distinct words " * 2)
  }

  private def clustersOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** First file under `dir` (recursive) whose name satisfies `pred`. */
  private def findFile(dir: java.io.File, pred: String => Boolean): java.io.File = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (pred(f.getName)) Seq(f) else Seq.empty
    walk(dir).head
  }

  private def tamperPartFile(root: String, table: String): Unit = {
    val part = findFile(
      new java.io.File(s"$root/data/$table"), _.startsWith("part-"))
    val os = new java.io.FileOutputStream(part, true)
    try os.write(Array[Byte](0x42)) finally os.close()
  }

  test("standing state: bootstrap round-trips through the witness gate") {
    val root = SparkFixture.tempDir("standing-boot")
    StandingState.bootstrap(assets(corpusTexts), root)
    val fp = StandingState.readFingerprints(spark, root)
    fp.columns.toSet shouldBe Set("asset_id", "phash", "dhash")
    fp.count() shouldBe corpusTexts.size
    StandingState.readClusters(spark, root).columns.toSet shouldBe
      Set("doc_id", "cluster")
  }

  test("nightly chain: two persisted ingests ≡ bootstrap over the full corpus") {
    val base = corpusTexts.filter(_._1 % 3 == 0)
    val d1 = corpusTexts.filter(_._1 % 3 == 1)
    val d2 = corpusTexts.filter(_._1 % 3 == 2)
    val store = SparkFixture.tempDir("standing-chain")
    StandingState.bootstrap(assets(base), store)
    StandingState.ingest(assets(d1), store)
    StandingState.ingest(assets(d2), store)
    val full = SparkFixture.tempDir("standing-full")
    StandingState.bootstrap(assets(corpusTexts), full)
    clustersOf(StandingState.readClusters(spark, store)) shouldBe
      clustersOf(StandingState.readClusters(spark, full))
    // the chained fingerprint table covers every asset exactly once
    StandingState.readFingerprints(spark, store).count() shouldBe corpusTexts.size
  }

  test("witness: a tampered standing file refuses the fold loudly") {
    val root = SparkFixture.tempDir("standing-tamper")
    StandingState.bootstrap(assets(corpusTexts.take(8)), root)
    tamperPartFile(root, "clusters")
    val ex = intercept[StandingState.StaleStateException] {
      StandingState.readClusters(spark, root).collect()
    }
    ex.getMessage should include("does not match")
    // the untampered sibling table still reads
    noException should be thrownBy
      StandingState.readFingerprints(spark, root).collect()
  }

  test("witness: a missing witness file refuses the read") {
    val root = SparkFixture.tempDir("standing-nowit")
    StandingState.bootstrap(assets(corpusTexts.take(6)), root)
    findFile(new java.io.File(root), _ == "_WITNESS").delete() shouldBe true
    intercept[StandingState.StaleStateException] {
      StandingState.readFingerprints(spark, root).collect()
    }
  }

  test("generic standing tables: any table set round-trips behind the witness") {
    import org.apache.spark.sql.functions._
    val root = SparkFixture.tempDir("standing-generic")
    val (p, l) = Retrieval.postingsIndex(
      corpusTexts.take(6).toDF("doc_id", "text"), "doc_id", "text")
    StandingState.writeTables(root, Seq(
      StandingState.TableSpec("postings", p, "tok"),
      StandingState.TableSpec("doclens", l, "doc_id")))
    StandingState.readTable(spark, root, "doclens").count() shouldBe 6
    val total = StandingState.readTable(spark, root, "postings")
      .agg(sum("tf")).collect().head.getLong(0)
    total should be > 0L
    // the witness covers EVERY table of the set: tampering one refuses
    // that table, the sibling still reads
    tamperPartFile(root, "postings")
    intercept[StandingState.StaleStateException] {
      StandingState.readTable(spark, root, "postings").collect()
    }
    noException should be thrownBy
      StandingState.readTable(spark, root, "doclens").collect()
  }

  test("retire: deletes a coherent old night; refuses tampered or foreign dirs") {
    val root = SparkFixture.tempDir("standing-retire")
    StandingState.bootstrap(assets(corpusTexts.take(6)), root)
    StandingState.retire(spark, root)
    new java.io.File(root).exists() shouldBe false
    // tampered state: refuse to delete (something else wrote here)
    val root2 = SparkFixture.tempDir("standing-retire2")
    StandingState.bootstrap(assets(corpusTexts.take(6)), root2)
    val pdir = findFile(
      new java.io.File(s"$root2/data/clusters"), _.startsWith("part-")).getParentFile
    val stray = new java.io.File(pdir, "stray.tmp")
    val os = new java.io.FileOutputStream(stray)
    try os.write(1) finally os.close()
    intercept[StandingState.StaleStateException] {
      StandingState.retire(spark, root2)
    }
    new java.io.File(root2).exists() shouldBe true
    // a directory that is not a standing state at all: refused
    val foreign = SparkFixture.tempDir("not-a-state")
    intercept[StandingState.StaleStateException] {
      StandingState.retire(spark, foreign)
    }
  }

  test("frameHashes: an over-envelope asset fails loudly, in-envelope hashes fine") {
    // stride 1 ⇒ one frame per char: 10^4 chars hits the composite-id
    // envelope exactly (frame ids would bleed into the next asset)
    val over = assets(Seq(1L -> ("a" * 10000)))
    val ex = intercept[Exception] {
      Multimodal.frameHashes(over, frameLen = 4, stride = 1).count()
    }
    // the task failure wraps the assert_true message — walk the causes
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    msgs should include("frameHashes")
    val under = assets(Seq(1L -> ("a" * 9999)))
    Multimodal.frameHashes(under, frameLen = 4, stride = 1)
      .count() shouldBe 9999L
  }
}
