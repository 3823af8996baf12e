package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pins for the round-10 operators: the perceptual hash's two
  * implementations (batch explode+agg vs the stream-legal per-row
  * projection) must be value-equal on ANY payload set — including empty
  * payloads, which explode to zero rows on the batch path and must still
  * emit the all-zero fingerprint. */
object RoundTenProps extends Properties("RoundTen") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkFixture.spark

  // printable-ASCII payloads, lengths 0..150 (under/over the 64-block
  // width), duplicates allowed
  private val genTexts: Gen[List[String]] = for {
    n <- Gen.choose(1, 8)
    ts <- Gen.listOfN(n, for {
      len <- Gen.frequency((1, Gen.const(0)), (2, Gen.choose(1, 63)), (3, Gen.choose(64, 150)))
      cs <- Gen.listOfN(len, Gen.choose(32, 126).map(_.toChar))
    } yield cs.mkString)
  } yield ts

  property("perceptualHash batch ≡ row form for ANY payloads, incl. empty") =
    forAll(genTexts) { texts =>
      import spark.implicits._
      val a = Multimodal.assetsFromText(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "txt"),
        "id", "txt")
      val batch = Multimodal.perceptualHash(a).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val row = Multimodal.perceptualHashRow(a).select("asset_id", "phash").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val sameKeys = batch.keySet == texts.indices.map(_.toLong).toSet
      val equal = batch == row
      val allLen64 = batch.values.forall(_.length == 64)
      sameKeys && equal && allLen64
    }
}
