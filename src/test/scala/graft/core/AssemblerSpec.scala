package graft.core

import graft.SparkFixture
import graft.schema._
import graft.sources._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** End-to-end multi-source assembly: ports the semantics pinned by the
  * reference's TestClientLikeReads.java (overlap cutoff, multi-source
  * union) and TestPushTimerangePastFMR.java (source pruning). */
class AssemblerSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private val metric = Metric("m1", "metricid1", Seq(
    Field("field1", FieldType.BOOLEAN),
    Field("val", FieldType.LONG, aliases = Seq("v_alias"))))

  private def writeArchive(basedir: String, format: String, rows: Seq[Row]): Unit = {
    val schema = StructType(Seq(
      StructField("companykey", StringType), StructField("metrictype", StringType),
      StructField("timestamp", LongType), StructField("field1", BooleanType),
      StructField("v_alias", LongType)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = s"$basedir/0/$format/orgid1/m1"
    if (format == "json") df.write.mode("overwrite").json(path)
    else df.write.mode("overwrite").parquet(path)
  }

  private def writeNearline(path: String, rows: Seq[Row]): Unit = {
    val schema = StructType(Seq(
      StructField("partition", StringType), StructField("sort", StringType),
      StructField("ids", ArrayType(StringType)),
      StructField("field1", MapType(StringType, StringType)),
      StructField("val", MapType(StringType, StringType))))
    spark.createDataFrame(rows.asJava, schema).write.mode("overwrite").parquet(path)
  }

  test("archive json + parquet union with null-fill and time sort") {
    val dir = SparkFixture.tempDir("assy1")
    writeArchive(dir, "json", Seq(Row("orgid1", "m1", 100L, true, 1L)))
    writeArchive(dir, "parquet", Seq(Row("orgid1", "m1", 50L, false, 2L)))
    val sources = SourceSet(fs = Seq(FsSource("json", dir), FsSource("parquet", dir)))
    val out = Assembler.metricTable(spark, "orgid1", metric, sources)
    val rows = out.collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(50L, 100L) // time-ordered
    rows.map(_.getLong(2)).toSeq shouldBe Seq(2L, 1L)    // alias feeds `val`
  }

  test("overlap cutoff: archive rows at/after min nearline start are dropped; nearline wins") {
    val dir = SparkFixture.tempDir("assy2")
    // archive has ts 100, 200, 300; nearline table covers [200, 400) with ts 200, 250
    writeArchive(dir, "parquet", Seq(
      Row("orgid1", "m1", 100L, true, 10L),
      Row("orgid1", "m1", 200L, true, 20L), // overlaps nearline → must be dropped
      Row("orgid1", "m1", 300L, true, 30L))) // after cutoff → dropped too
    val nlPath = SparkFixture.tempDir("nl1") + "/tbl"
    writeNearline(nlPath, Seq(
      Row("orgid1m1", "200", Seq("w1"), Map("w1" -> "false"), Map("w1" -> "21")),
      Row("orgid1m1", "250", Seq("w1"), Map("w1" -> "true"), Map("w1" -> "25"))))
    val sources = SourceSet(
      fs = Seq(FsSource("parquet", dir)),
      nearline = Seq(NearlineTableDesc("t_200_400", nlPath, 200L, 400L)))
    val out = Assembler.metricTable(spark, "orgid1", metric, sources)
    val rows = out.collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(100L, 200L, 250L)
    // ts=200 comes from nearline (val 21), not archive (val 20)
    rows.map(_.getLong(2)).toSeq shouldBe Seq(10L, 21L, 25L)
  }

  test("non-contiguous nearline windows: archive rows in the gap survive") {
    val dir = SparkFixture.tempDir("assy_gap")
    // nearline windows [0,100) and [200,400) with a gap [100,200); the
    // archive row at ts=150 must NOT be lost (a global min-start cutoff
    // would drop it), while rows inside either window are still excluded.
    writeArchive(dir, "parquet", Seq(
      Row("orgid1", "m1", 50L, true, 5L),   // inside [0,100)  → dropped (nearline wins)
      Row("orgid1", "m1", 150L, true, 15L), // in the gap      → kept
      Row("orgid1", "m1", 250L, true, 25L))) // inside [200,400) → dropped
    val nlA = SparkFixture.tempDir("nlgap") + "/a"
    val nlB = SparkFixture.tempDir("nlgap") + "/b"
    writeNearline(nlA, Seq(Row("orgid1m1", "60", Seq("w"), Map("w" -> "true"), Map("w" -> "6"))))
    writeNearline(nlB, Seq(Row("orgid1m1", "260", Seq("w"), Map("w" -> "true"), Map("w" -> "26"))))
    val sources = SourceSet(
      fs = Seq(FsSource("parquet", dir)),
      nearline = Seq(
        NearlineTableDesc("t_0_100", nlA, 0L, 100L),
        NearlineTableDesc("t_200_400", nlB, 200L, 400L)))
    val out = Assembler.metricTable(spark, "orgid1", metric, sources)
    out.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq shouldBe
      Seq((60L, 6L), (150L, 15L), (260L, 26L))
  }

  test("nearline multi-write items expand to one row per write-id") {
    val nlPath = SparkFixture.tempDir("nl2") + "/tbl"
    writeNearline(nlPath, Seq(
      Row("orgid1m1", "500", Seq("w1", "w2"),
        Map("w1" -> "true", "w2" -> "false"),
        Map("w1" -> "51", "w2" -> "52"))))
    val sources = SourceSet(nearline = Seq(NearlineTableDesc("t_400_600", nlPath, 400L, 600L)))
    val out = Assembler.metricTable(spark, "orgid1", metric, sources)
    val rows = out.orderBy("val").collect()
    rows should have length 2 // testReadOverlappingTimestampRow semantics
    rows.map(_.getLong(0)).toSeq shouldBe Seq(500L, 500L)
    rows.map(_.getLong(2)).toSeq shouldBe Seq(51L, 52L)
  }

  test("time-range pruning drops nearline tables outside the predicate window") {
    val nl1 = SparkFixture.tempDir("nl3") + "/t1"
    val nl2 = SparkFixture.tempDir("nl3") + "/t2"
    writeNearline(nl1, Seq(Row("orgid1m1", "100", Seq("w"), Map("w" -> "true"), Map("w" -> "1"))))
    writeNearline(nl2, Seq(Row("orgid1m1", "900", Seq("w"), Map("w" -> "true"), Map("w" -> "9"))))
    val sources = SourceSet(nearline = Seq(
      NearlineTableDesc("t_0_500", nl1, 0L, 500L),
      NearlineTableDesc("t_500_1000", nl2, 500L, 1000L)))
    val pruned = sources.prune(TimeRange.extract("timestamp", col("timestamp") < 400L))
    pruned.nearline.map(_.name) shouldBe Seq("t_0_500")
    // and the full query honors the residual filter
    val out = Assembler.metricTable(spark, "orgid1", metric, sources,
      timeFilter = Some(col("timestamp") < 400L))
    out.collect().map(_.getLong(0)).toSeq shouldBe Seq(100L)
  }

  test("opaque predicates scan all sources (conservatism)") {
    val sources = SourceSet(nearline = Seq(
      NearlineTableDesc("t_0_500", "x", 0L, 500L),
      NearlineTableDesc("t_500_1000", "y", 500L, 1000L)))
    val r = TimeRange.extract("timestamp", col("timestamp") =!= 100L)
    sources.prune(r).nearline should have length 2
  }

  test("non-radio json reads with the registry schema: no inference, unknown columns dropped") {
    metric.jsonStorageSchema.isDefined shouldBe true
    val dir = SparkFixture.tempDir("assy_schema")
    // hand-written json with an extra unknown column and a missing alias
    val lines = Seq(
      """{"companykey":"orgid1","metrictype":"m1","timestamp":10,"field1":true,"junk":"zzz"}""",
      """{"companykey":"orgid1","metrictype":"m1","timestamp":20,"v_alias":7,"junk":"yyy"}""")
    val d = new java.io.File(s"$dir/0/json/orgid1/m1")
    d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.toString, "part.json"), lines.mkString("\n").getBytes)
    val out = Assembler.metricTable(spark, "orgid1", metric,
      SourceSet(fs = Seq(FsSource("json", dir))))
    val rows = out.collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(10L, 20L)
    out.schema.fieldNames.toSeq shouldBe Seq("timestamp", "field1", "val") // no junk leak
    rows.map(r => Option(r.get(2)).orNull).toSeq shouldBe Seq(null, 7L)   // alias feeds val
    // radio metrics must infer (unknown columns are their contract)
    metric.copy(radioEnabled = true).jsonStorageSchema shouldBe None
  }

  test("DECIMAL fields survive the JSON path losslessly (string carrier, no double round-trip)") {
    // 25 significant digits — a binary double keeps only ~16. If the
    // carrier type were DoubleType this value would come back mangled.
    val big = "1234567890123456789012345.123456789"
    val m = Metric("md", "dec_metric", Seq(Field("amount", FieldType.DECIMAL)))
    m.jsonStorageSchema.get("amount").dataType shouldBe StringType
    val dir = SparkFixture.tempDir("assy_decimal")
    val d = new java.io.File(s"$dir/0/json/orgid1/md")
    d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.toString, "part.json"),
      s"""{"companykey":"orgid1","metrictype":"md","timestamp":10,"amount":"$big"}""".getBytes)
    val out = Assembler.metricTable(spark, "orgid1", m,
      SourceSet(fs = Seq(FsSource("json", dir))))
    out.schema("amount").dataType shouldBe DecimalType(38, 9)
    out.collect().head.getDecimal(1) shouldBe new java.math.BigDecimal(big).setScale(9)
  }

  test("registry JSON accepts DECIMAL and DECIMAL(p,s) declarations") {
    val reg = SchemaRegistry.fromJson(
      """{"orgs":[{"orgId":"o1","metrics":[{"canonicalId":"c1","displayName":"t1",
        |  "fields":[{"name":"exact","type":"DECIMAL(20,4)"},
        |            {"name":"wide","type":"decimal"},
        |            {"name":"n","type":"LONG"}]}]}]}""".stripMargin)
    val m = reg.metric("o1", "t1").get
    m.structType("exact").dataType shouldBe DecimalType(20, 4)
    m.structType("wide").dataType shouldBe DecimalType(38, 9)
    m.structType("n").dataType shouldBe LongType
  }

  test("nearline table name range parsing") {
    NearlineTableDesc.parseRange("pfx-", "pfx-100_200") shouldBe Some((100L, 200L))
    NearlineTableDesc.parseRange("pfx-", "other-100_200") shouldBe None
    NearlineTableDesc.parseRange("pfx-", "pfx-bad") shouldBe None
  }
}
