package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-16 pins for the OUT-OF-PROCESS Arrow decode worker: a forked
  * JVM on the far side of the stdin/stdout Arrow-IPC framing decodes
  * real GIF pixels value-equal to the in-JVM seam (poison pills
  * included), volumes far beyond one pipe buffer round-trip (the
  * backpressure proof), and a worker killed mid-stream surfaces as a
  * diagnosable error, never a hang or a truncation. */
class ArrowWorkerSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

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

  private def gifBytes(frame: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(frame, "gif", baos)
    baos.toByteArray
  }

  private def media = Seq(
    (1L, gifBytes(gifFrame(0))),
    (2L, gifBytes(gifFrame(3))),
    (3L, "not a gif".getBytes("UTF-8")), // poison pill
    (4L, gifBytes(gifFrame(7))))
    .toDF("asset_id", "content")

  private def decoded(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.getAs[scala.collection.Seq[Int]]("luma64")).map(_.toList))
    }.toSet

  test("forked worker decodes real GIF pixels value-equal to the in-JVM seam") {
    val inJvm = decoded(Multimodal.decodeWithArrow(
      media, Multimodal.imageDecodedSchema, batchRows = 2)(
      Multimodal.imageIoDecoder))
    val forked = decoded(ArrowWorker.viaProcess(
      media, Multimodal.imageDecodedSchema,
      ArrowWorker.jvmCommand("image"), batchRows = 2))
    forked shouldBe inJvm
    forked.size shouldBe 4
    // the poison pill came back as a null-dimension row, not a failure
    forked.count { case (_, w, _, _) => w.isEmpty } shouldBe 1
  }

  test("volume beyond any pipe buffer round-trips exactly (backpressure, echo mode)") {
    // ~6 MB of binary payload through 64 KiB OS pipes in 4-row batches:
    // only interleaved feed/consume (the pipes ARE the queue) finishes
    val df = spark.range(1500).select(col("id"),
      expr("repeat(cast(id AS string), 800)").as("payload"))
      .repartition(2)
    val back = ArrowWorker.viaProcess(
      df, df.schema, ArrowWorker.jvmCommand("echo"), batchRows = 4)
    back.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq shouldBe
      (0L until 1500L).map(i => (i, i.toString * 800))
  }

  test("a worker killed mid-stream is a diagnosable error, not a hang") {
    val many = Seq.tabulate(20)(i => (i.toLong, gifBytes(gifFrame(i % 12))))
      .toDF("asset_id", "content").repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      ArrowWorker.viaProcess(
        many, Multimodal.imageDecodedSchema,
        ArrowWorker.jvmCommand("die:1"), batchRows = 2).collect()
    }
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
    msg should include ("arrow worker died")
    msg should include ("exit 7")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
  private def expr(s: String) = org.apache.spark.sql.functions.expr(s)
}
