package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Degenerate-input behavior of the round-5 operators: empty sides and
  * single-row worlds must produce empty/trivial results, not exceptions —
  * a tiny scale factor or an aggressive upstream filter hits exactly
  * these shapes. */
class EdgeCasesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private val lSchema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("t", LongType)))
  private val rSchema = StructType(Seq(
    StructField("k", StringType), StructField("t", LongType),
    StructField("rid", LongType)))

  test("asof join: empty right keeps every left row with null payload") {
    val out = AsOf.asofJoin(df(lSchema, Row(1L, "a", 5L)), df(rSchema),
      "k", "t", Seq("rid")).collect()
    out.length shouldBe 1
    out.head.isNullAt(3) shouldBe true
    out.head.isNullAt(4) shouldBe true
  }

  test("asof join: empty left yields empty output") {
    AsOf.asofJoin(df(lSchema), df(rSchema, Row("a", 1L, 9L)),
      "k", "t", Seq("rid")).count() shouldBe 0
  }

  test("range join: empty interval side yields empty output") {
    val iv = StructType(Seq(StructField("k", StringType),
      StructField("lo", LongType), StructField("hi", LongType)))
    RangeJoin.bucketedRangeJoin(df(lSchema, Row(1L, "a", 5L)), df(iv),
      "k", "t", "lo", "hi", 10L).count() shouldBe 0
  }

  test("sessionize: empty input and single-event input") {
    val ev = StructType(Seq(StructField("eid", LongType),
      StructField("u", StringType), StructField("ts", TimestampType)))
    Sessionize.sessions(df(ev), "u", "ts", "eid", 100).count() shouldBe 0
    val one = Sessionize.sessions(
      df(ev, Row(1L, "u1", java.sql.Timestamp.from(java.time.Instant.EPOCH))),
      "u", "ts", "eid", 100).collect()
    one.length shouldBe 1
    one.head.getAs[Long]("n_events") shouldBe 1L
  }

  test("connected components: empty pair list converges to empty labels") {
    val pairs = df(StructType(Seq(
      StructField("id_a", LongType), StructField("id_b", LongType))))
    Cluster.connectedComponents(pairs).count() shouldBe 0
    Cluster.connectedComponentsStar(pairs).count() shouldBe 0
  }

  test("connected components: self-pairs alone mean no clusters") {
    val pairs = df(StructType(Seq(
      StructField("id_a", LongType), StructField("id_b", LongType))),
      Row(7L, 7L))
    Cluster.connectedComponentsStar(pairs).count() shouldBe 0
  }

  test("contamination: empty benchmark flags nothing, keeps every doc") {
    val d = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val out = TextAnalysis.contamination(
      df(d, Row(1L, "alpha beta gamma")), df(d)).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("n_hits") shouldBe 0L
    out.head.getAs[Boolean]("contaminated") shouldBe false
  }

  test("compact: empty table round-trips (schema preserved, zero rows)") {
    val d = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType)))
    val out = Layout.compact(df(d), SparkFixture.tempDir("empty-compact"),
      1000, Seq("k"))
    out.count() shouldBe 0
    out.schema.fieldNames.toSeq shouldBe Seq("id", "k")
  }
}
