package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Multimodal plumbing pins: the swappable decoder seam's contract
  * (per-partition batches, declared schema, stub ≡ expression path), and
  * the perceptual-hash bit rule on payloads we can reason about
  * exactly. */
class MultimodalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def assets(texts: (Long, String)*) =
    Multimodal.assetsFromText(
      texts.toSeq.toDF("id", "txt"), "id", "txt")

  test("decoder seam: stub decoder through mapPartitions matches the expression path") {
    val a = assets(1L -> "hello world", 2L -> "spark assets", 3L -> "payload bytes")
    val viaSeam = Multimodal.decodeWith(a, Multimodal.decodedSchema)(Multimodal.stubDecoder)
      .orderBy("asset_id").collect()
    val viaExpr = Multimodal.fakeDecodeFeatures(a)
      .select(col("asset_id"), col("content_md5"), col("content_bytes"))
      .orderBy("asset_id").collect()
    viaSeam.map(_.toSeq) shouldBe viaExpr.map(_.toSeq)
    viaSeam.map(_.schema.fieldNames.toSeq).distinct shouldBe
      Seq(Seq("asset_id", "content_md5", "content_bytes"))
  }

  test("decoder seam: a custom decoder swaps in with the same signature") {
    val a = assets(7L -> "abc")
    // a stand-in "real" decoder: constant features, still one row per
    // asset, schema declared up front — the swap a codec deployment does
    val custom = Multimodal.decodeWith(a, Multimodal.decodedSchema) { rows =>
      rows.map(r => Row(r.getLong(r.fieldIndex("asset_id")), "decoded", 0L))
    }
    custom.collect().map(_.toSeq) shouldBe Array(Seq(7L, "decoded", 0L))
  }

  test("decoder seam: decode parallelism = input partitions, one output row per asset") {
    val a = assets((1L to 20L).map(i => i -> s"asset number $i"): _*).repartition(4)
    val decoded = Multimodal.decodeWith(a, Multimodal.decodedSchema)(Multimodal.stubDecoder)
    decoded.rdd.getNumPartitions shouldBe 4
    decoded.count() shouldBe 20
  }

  test("perceptual hash: uniform payload is all zeros; one raised byte flips exactly its block") {
    // 128 equal bytes: every block mean == global mean, no strict
    // inequality -> all 64 bits are 0 (the deterministic base case)
    val uniform = assets(1L -> ("a" * 128))
    val fp0 = Multimodal.perceptualHash(uniform).collect().head.getString(1)
    fp0.length shouldBe 64
    fp0 shouldBe "0" * 64
    // raise ONE byte (position 1 -> block 0): only block 0's mean exceeds
    // the global mean, so the fingerprint is exactly bit 0 set
    val edited = assets(2L -> ("z" + "a" * 127))
    val fp1 = Multimodal.perceptualHash(edited).collect().head.getString(1)
    fp1.count(_ == '1') shouldBe 1
    fp1.head shouldBe '1'
  }

  test("perceptualHashRow (stream-legal projection) ≡ batch explode+agg form") {
    val a = assets((1L to 30L).map(i => i -> s"varied payload number $i with content " * (i.toInt % 5 + 1)): _*)
    val batch = Multimodal.perceptualHash(a).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val row = Multimodal.perceptualHashRow(a).select("asset_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    row shouldBe batch
  }

  test("phash pairs: re-ingested near-identical payloads pair; unrelated ones don't") {
    val a = assets(
      1L -> ("the quick brown fox jumps over the lazy dog " * 4),
      2L -> ("zzz" + ("the quick brown fox jumps over the lazy dog " * 4).drop(3)),
      3L -> ("completely different material about database engines and scans " * 3))
    val pairs = Multimodal.phashPairs(a).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) should contain((1L, 2L))
    pairs.map(r => (r.getLong(0), r.getLong(1))) should not contain ((1L, 3L))
    all(pairs.map(_.getLong(2))) should be <= 2L
  }
}
