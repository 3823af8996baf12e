package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-11 operator pins: the dHash gradient bit rule on payloads we
  * can reason about exactly, the cross-modal caption-agreement gate with
  * planted mismatches, and the native HLL aggregate's bit-equality with
  * the oracle-checked DataFrame op under any partitioning. */
class RoundElevenSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def assets(texts: (Long, String)*) =
    Multimodal.assetsFromText(
      texts.toSeq.toDF("id", "txt"), "id", "txt")

  test("dhash: uniform payload is all zeros (no adjacent block strictly greater)") {
    val fp = Multimodal.dhash(assets(1L -> ("a" * 130))).collect().head.getString(1)
    fp shouldBe "0" * 64
  }

  test("dhash: strictly descending 65-byte payload is all ones, ascending all zeros") {
    // L = 65: each of the 65 blocks holds exactly one byte, so bit b is
    // literally code(b) > code(b+1) — the gradient rule with no averaging
    val desc = (0 until 65).map(i => (122 - i).toChar).mkString // 'z' down
    val asc = desc.reverse
    val fps = Multimodal.dhash(assets(1L -> desc, 2L -> asc)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    fps(1L) shouldBe "1" * 64
    fps(2L) shouldBe "0" * 64
  }

  test("dhash: zero-length payload still emits the all-zero fingerprint") {
    val fp = Multimodal.dhash(assets(1L -> "")).collect().head.getString(1)
    fp shouldBe "0" * 64
  }

  test("dhash pairs: a same-length edit pairs with its original; unrelated payloads don't") {
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val a = assets(
      1L -> base,
      2L -> ("zzz" + base.drop(3)),
      3L -> ("completely different material about database engines and scans " * 3))
    val pairs = Multimodal.dhashPairs(a).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 3L))
    pairs should not contain ((2L, 3L))
  }

  test("hammingPairsDelta: base∪delta edges reproduce the full self-join pair set") {
    val texts = (1L to 20L).map(i =>
      i -> (if (i % 5 == 0) "shared near duplicate payload body " * 3 + i.toString
      else s"unique material number $i with its own words " * 2))
    val all = assets(texts: _*)
    val full = Multimodal.phashPairs(all).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = assets(texts.filter(_._1 % 3 != 0): _*)
    val delta = assets(texts.filter(_._1 % 3 == 0): _*)
    val basePairs = Multimodal.phashPairs(base).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deltaPairs = Multimodal.phashPairsDelta(delta, base).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (basePairs ++ deltaPairs) shouldBe full
  }

  test("caption agreement: honest captions score exactly 10000; planted mismatches flag") {
    val docs = Seq(
      (1L, "alpha beta gamma delta content words here"),
      (2L, "epsilon zeta eta theta more body text"),
      (3L, "iota kappa lambda mu further material")).toDF("id", "txt")
    val a = Multimodal.assetsFromText(docs, "id", "txt")
    val captions = Seq(
      (1L, "alpha beta gamma"),             // honest: prefix of content
      (2L, "epsilon zeta eta theta"),       // honest
      (3L, "unrelated caption about boats") // planted mismatch
    ).toDF("asset_id", "caption")
    val out = Multimodal.captionAgreement(a, captions).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    out(1L) shouldBe ((10000L, false))
    out(2L) shouldBe ((10000L, false))
    out(3L)._2 shouldBe true
    out(3L)._1 should be < 9000L
  }

  test("video pairs: a replaced frame window still pairs; whole-asset hashes would not") {
    val base = ("frame one content here padded out " * 8).take(256) +
      ("frame two content quite different " * 8).take(256)
    // replace the SECOND sampled window (chars 129-256) wholesale — a
    // temporal edit: most frame fingerprints survive
    val edited = base.substring(0, 128) + ("Z" * 128) + base.substring(256)
    val other = ("totally unrelated material about engines " * 12).take(512)
    val a = assets(1L -> base, 2L -> edited, 3L -> other)
    val pairs = Multimodal.videoPairs(a).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.keySet should contain((1L, 2L))
    pairs((1L, 2L)) should be >= 0.5
    pairs.keySet should not contain ((1L, 3L))
    Materialize.clearCache()
  }

  test("video pairs: a ubiquitous stop-frame is df-capped out of candidate generation") {
    // 60 assets share one identical frame window but are otherwise
    // unique: with maxDf=50 the shared frame is a stop-frame, no shared
    // NON-stop frame exists, and the candidate set must be EMPTY —
    // without the cap this would be a 60² bucket
    val shared = ("common intro frame content everywhere " * 4).take(128)
    // per-asset tails must be PERCEPTUALLY distinct (aHash is coarse —
    // prose with a different digit hashes identically): a step pattern
    // '~'*i + '!'*(64-i) per 64-char window yields EXACTLY the
    // fingerprint 1*i 0*(64-i) — provably unique per asset id ≤ 60
    val docs = (1L to 60L).map { i =>
      val win = "~" * i.toInt + "!" * (64 - i.toInt)
      i -> (shared + win * 6)
    }
    val pairs = Multimodal.videoPairs(assets(docs: _*), maxDf = 50).collect()
    pairs shouldBe empty
    // with the cap lifted the same corpus pairs freely off the shared frame
    Materialize.clearCache()
    val uncapped = Multimodal.videoPairs(assets(docs: _*), maxDf = 1000, threshold = 0.1)
      .collect()
    uncapped.length should be > 0
    Materialize.clearCache()
  }

  test("graft_approx_distinct ≡ ops.Hll estimate, under any partitioning") {
    graft.functions.GraftExtensions.register(spark)
    val df = (1 to 5000).map(i => ("g" + (i % 3), (i % 700).toString))
      .toDF("g", "v")
    val expected = Hll.estimate(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts).groupBy("g")
        .agg(expr("graft_approx_distinct(v)").as("n_approx"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      got shouldBe expected
    }
  }

  test("graft_approx_distinct: explicit bBits widens the register file; empty group is 0") {
    graft.functions.GraftExtensions.register(spark)
    val df = (1 to 2000).map(i => (i % 500).toString).toDF("v")
    val est12 = df.agg(expr("graft_approx_distinct(v, 12)")).collect().head.getDouble(0)
    val exact = 500.0
    math.abs(est12 - exact) / exact should be < 0.1 // 4096 registers: tight
    val empty = df.filter(lit(false))
      .agg(expr("graft_approx_distinct(v)")).collect().head.getDouble(0)
    empty shouldBe 0.0
  }

  test("frameAlignment: stride-aligned trim detected at the exact offset") {
    // step patterns give distinct per-frame fingerprints (aHash on prose
    // is coarse); stride 128 / frame 64 means only each block's first 64
    // chars are hashed — filler is never sampled
    def pat(i: Int) = "~" * (i + 4) + "!" * (60 - i)
    def block(i: Int) = pat(i) + "." * 64
    val full = (0 until 10).map(block).mkString
    val trimmed = full.substring(256) // exactly 2 strides dropped
    // scattered: two shared frames at INCONSISTENT deltas — never a mode
    // with support >= minAligned, so the pair must not be reported
    val scattered = block(3) + block(7) + block(5)
    val out = Multimodal.frameAlignment(
      assets(1L -> full, 2L -> trimmed, 3L -> scattered))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    out((1L, 2L)) shouldBe ((2L, 8L)) // offset 2, all 8 trimmed frames aligned
    out.keySet should not contain ((1L, 3L))
    out.keySet should not contain ((2L, 3L))
    Materialize.clearCache()
  }

  test("graft_quantile ≡ ops.Quantile.quantileEstimates, under any partitioning") {
    graft.functions.GraftExtensions.register(spark)
    val df = (1 to 5000).map(i => ("g" + (i % 3), (i * 37 % 900 + 1).toLong))
      .toDF("g", "v")
    val expected = (0 to 2).map { g =>
      val est = Quantile.quantileEstimates(
        Quantile.logHist(df.filter(col("g") === s"g$g"), col("v")),
        Seq(0.5, 0.99)).collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      s"g$g" -> est
    }.toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts).groupBy("g")
        .agg(expr("graft_quantile(v, 0.5D)").as("p50"),
          expr("graft_quantile(v, 0.99D)").as("p99"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      got.keySet shouldBe expected.keySet
      got.foreach { case (g, (p50, p99)) =>
        p50 shouldBe expected(g)(0.5)
        p99 shouldBe expected(g)(0.99)
      }
    }
  }

  test("graft_quantile: non-positive dropped, all-dropped group null, ≤25% rel err") {
    graft.functions.GraftExtensions.register(spark)
    val df = Seq(-5L, 0L, 3L, 100L).toDF("v")
    // only {3, 100} count; q=1 walks to 100's bucket: bin(100) = 1100100,
    // oct 7 half 1 → 64 + 32 + 16 = 112 exactly (the ≤25% midpoint rule)
    df.agg(expr("graft_quantile(v, 1.0D)")).collect().head.getDouble(0) shouldBe 112.0
    val allDropped = df.filter(col("v") < 0L)
      .agg(expr("graft_quantile(v, 0.5D)")).collect().head
    allDropped.isNullAt(0) shouldBe true
    val dense = (1L to 10000L).toDF("v")
    val p50 = dense.agg(expr("graft_quantile(v, 0.5D)")).collect().head.getDouble(0)
    math.abs(p50 - 5000.0) / 5000.0 should be <= 0.25
    // contract errors: arity and non-literal q fail analysis loudly
    intercept[Exception] { df.agg(expr("graft_quantile(v)")).collect() }
    intercept[Exception] { df.agg(expr("graft_quantile(v, v)")).collect() }
  }

  test("embed_decontaminate: exactly the planted scaled-copy leaks flag, at cosine 1.0") {
    val rows = graft.PipelineQueries
      .embedDecontaminate(spark, "/root/testdata/sf0.001")
      .collect()
    val flagged = rows.filter(_.getBoolean(2))
    // every flag is a planted leak (re-ingested id range), every planted
    // leak flags, and each scores EXACTLY 1.0 — the scale-invariance of
    // cosine is what makes the x2 "paraphrase" a perfect semantic copy
    flagged.map(_.getLong(0)).foreach(_ should be >= 9000000L)
    flagged.length shouldBe rows.count(_.getLong(0) >= 9000000L)
    flagged.length should be > 0
    flagged.foreach(_.getDouble(1) shouldBe 1.0)
    // clean training vectors sit far below the gate: natural cross-set
    // ceiling on this corpus is ~0.43 vs the 0.9 threshold
    rows.filterNot(_.getBoolean(2)).foreach(_.getDouble(1) should be < 0.9)
  }
}
