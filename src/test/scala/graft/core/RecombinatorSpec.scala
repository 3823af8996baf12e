package graft.core

import graft.SparkFixture
import graft.schema._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Ports the behavioral pins of the reference's
  * TestFineoReadTable.java:41-287 and TestFineoRadio.java:51-231:
  * all-types casting, alias coalescing, null-fill of missing declared
  * fields, tenant filtering, `_fm` radio routing, base64 BYTES-over-JSON. */
class RecombinatorSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private val metric = Metric(
    canonicalId = "m_canon",
    displayName = "metricid1",
    fields = Seq(
      Field("f_bool", FieldType.BOOLEAN),
      Field("f_bytes", FieldType.BYTES),
      Field("f_double", FieldType.DOUBLE),
      Field("f_float", FieldType.FLOAT),
      Field("f_int", FieldType.INT),
      Field("f_long", FieldType.LONG),
      Field("f_string", FieldType.STRING)))

  private def rawDf(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(rows.asJava, schema)

  test("alias coalesce precedence is exhaustive: user name > aliases in order > cname") {
    // SURVEY.md §7.4: the reference never exercises conflicting non-null
    // aliases in one row, so the precedence is OUR documented contract —
    // pin it over every null/non-null combination of the four sources.
    val m = Metric("mc", "prec_metric", Seq(
      Field("v", FieldType.STRING, aliases = Seq("a1", "a2"), cname = Some("cn"))))
    val schema = StructType(Seq(
      StructField("companykey", StringType), StructField("metrictype", StringType),
      StructField("timestamp", LongType),
      StructField("v", StringType), StructField("a1", StringType),
      StructField("a2", StringType), StructField("cn", StringType)))
    val combos = for (mask <- 0 until 16) yield {
      def src(bit: Int, name: String): String = if ((mask & (1 << bit)) != 0) name else null
      Row("o", "mc", mask.toLong,
        src(0, "from_v"), src(1, "from_a1"), src(2, "from_a2"), src(3, "from_cn"))
    }
    val out = Recombinator.recombine(rawDf(combos, schema), "o", m)
      .orderBy("timestamp").collect()
    out.zipWithIndex.foreach { case (r, mask) =>
      val expected =
        if ((mask & 1) != 0) "from_v"
        else if ((mask & 2) != 0) "from_a1"
        else if ((mask & 4) != 0) "from_a2"
        else if ((mask & 8) != 0) "from_cn"
        else null
      withClue(s"mask=$mask: ") { Option(r.getString(1)).orNull shouldBe expected }
    }
  }

  test("all seven user types cast to declared types; internal fields dropped") {
    // storage row shape per FIXTURES.md §2 (FineoTestUtil.java:53-61)
    val schema = StructType(Seq(
      StructField("companykey", StringType), StructField("metrictype", StringType),
      StructField("timestamp", LongType), StructField("writetime", LongType),
      StructField("f_bool", BooleanType), StructField("f_bytes", StringType),
      StructField("f_double", StringType), StructField("f_float", DoubleType),
      StructField("f_int", LongType), StructField("f_long", IntegerType),
      StructField("f_string", StringType)))
    val raw = rawDf(Seq(
      Row("orgid1", "m_canon", 315532800000L, 1L,
        true, java.util.Base64.getEncoder.encodeToString("hi".getBytes),
        "2.5", 3.5d, 4L, 5, "six")), schema)
    val out = Recombinator.recombine(raw, "orgid1", metric, bytesAreBase64 = true)

    out.schema.fieldNames.toSeq shouldBe
      Seq("timestamp", "f_bool", "f_bytes", "f_double", "f_float", "f_int", "f_long", "f_string")
    out.schema("f_double").dataType shouldBe DoubleType
    out.schema("f_int").dataType shouldBe IntegerType
    val r = out.collect().head
    r.getLong(0) shouldBe 315532800000L
    r.getBoolean(1) shouldBe true
    new String(r.getAs[Array[Byte]](2)) shouldBe "hi"
    r.getDouble(3) shouldBe 2.5
    r.getFloat(4) shouldBe 3.5f
    r.getInt(5) shouldBe 4
    r.getLong(6) shouldBe 5L
    r.getString(7) shouldBe "six"
  }

  test("tenant filter drops other orgs and other metrics") {
    val schema = StructType(Seq(
      StructField("companykey", StringType), StructField("metrictype", StringType),
      StructField("timestamp", LongType), StructField("f_string", StringType)))
    val raw = rawDf(Seq(
      Row("orgid1", "m_canon", 1L, "mine"),
      Row("orgid2", "m_canon", 2L, "other org"),
      Row("orgid1", "m_other", 3L, "other metric")), schema)
    val out = Recombinator.recombine(raw, "orgid1", metric)
    out.select("f_string").collect().map(_.getString(0)).toSeq shouldBe Seq("mine")
  }

  test("aliases coalesce into the user field with precedence: name, then aliases") {
    val m = Metric("c", "t", Seq(Field("f0", FieldType.FLOAT, aliases = Seq("af0"))))
    val schema = StructType(Seq(
      StructField("timestamp", LongType),
      StructField("af0", DoubleType), StructField("f0", DoubleType)))
    val raw = rawDf(Seq(
      Row(1L, 7.5d, null),  // only alias present → alias value
      Row(2L, null, 2.0d),  // only user name → user value
      Row(3L, 9.0d, 1.0d)), // both → user name wins (coalesce order)
      schema)
    val out = Recombinator.recombine(raw, "org", m)
    out.orderBy("timestamp").collect().map(_.getFloat(1)).toSeq shouldBe Seq(7.5f, 2.0f, 1.0f)
    out.schema("f0").dataType shouldBe FloatType
  }

  test("missing declared fields materialize as NULL columns") {
    val m = Metric("c", "t", Seq(
      Field("present", FieldType.LONG), Field("absent", FieldType.STRING)))
    val schema = StructType(Seq(
      StructField("timestamp", LongType), StructField("present", LongType)))
    val out = Recombinator.recombine(rawDf(Seq(Row(1L, 42L)), schema), "org", m)
    val r = out.collect().head
    r.getLong(1) shouldBe 42L
    r.isNullAt(2) shouldBe true
    out.schema("absent").dataType shouldBe StringType
  }

  test("radio: unknown fields land in _fm as strings; nulls dropped per row") {
    val m = Metric("c", "t", Seq(Field("field1", FieldType.BOOLEAN)), radioEnabled = true)
    val schema = StructType(Seq(
      StructField("timestamp", LongType), StructField("field1", BooleanType),
      StructField("uk_a", LongType), StructField("uk_b", StringType)))
    val raw = rawDf(Seq(
      Row(1L, true, 1L, "hello field 2"),
      Row(2L, false, null, "x")), schema)
    val out = Recombinator.recombine(raw, "org", m)
    out.schema("_fm").dataType shouldBe MapType(StringType, StringType)
    val maps = out.orderBy("timestamp").collect()
      .map(_.getAs[Map[String, String]]("_fm"))
    maps(0) shouldBe Map("uk_a" -> "1", "uk_b" -> "hello field 2")
    maps(1) shouldBe Map("uk_b" -> "x") // null uk_a dropped
  }

  test("radio off: unknown fields are dropped entirely") {
    val m = Metric("c", "t", Seq(Field("field1", FieldType.BOOLEAN)))
    val schema = StructType(Seq(
      StructField("timestamp", LongType), StructField("field1", BooleanType),
      StructField("uk_a", LongType)))
    val out = Recombinator.recombine(rawDf(Seq(Row(1L, true, 5L)), schema), "org", m)
    out.schema.fieldNames.toSeq shouldBe Seq("timestamp", "field1")
  }

  test("nearline string timestamp casts to BIGINT (N-as-string)") {
    val m = Metric("c", "t", Seq(Field("f", FieldType.LONG)))
    val schema = StructType(Seq(
      StructField("timestamp", StringType), StructField("f", StringType)))
    val out = Recombinator.recombine(rawDf(Seq(Row("315532800000", "17")), schema), "org", m)
    out.schema("timestamp").dataType shouldBe LongType
    val r = out.collect().head
    r.getLong(0) shouldBe 315532800000L
    r.getLong(1) shouldBe 17L
  }
}
