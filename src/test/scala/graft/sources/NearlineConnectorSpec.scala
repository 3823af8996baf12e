package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DataSourceV2 nearline connector: pushdown + read-mode decisions +
  * correct results, mirroring the reference's TestDynamoFilterPushdown
  * plan assertions at the Spark DSv2 surface. */
class NearlineConnectorSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private lazy val tablePath: String = {
    val p = SparkFixture.tempDir("dsv2") + "/t_0_1000.parquet"
    val schema = StructType(Seq(
      StructField("partition", StringType), StructField("sort", StringType),
      StructField("ids", ArrayType(StringType)),
      StructField("field1", MapType(StringType, StringType))))
    val rows = Seq(
      Row("orgAm1", "100", Seq("w1"), Map("w1" -> "1")),
      Row("orgAm1", "200", Seq("w1", "w2"), Map("w1" -> "2", "w2" -> "3")),
      Row("orgAm1", "300", Seq("w1"), Map("w1" -> "4")),
      Row("orgBm1", "100", Seq("w1"), Map("w1" -> "9")))
    spark.createDataFrame(rows.asJava, schema).write.mode("overwrite").parquet(p)
    p
  }

  private def load(): DataFrame =
    spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", tablePath).load()

  private def scanDesc(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("full scan with no predicates plans SCAN mode and returns all items") {
    val df = load()
    df.count() shouldBe 4
    scanDesc(df) should include("mode=SCAN")
  }

  test("hash-key equality plans QUERY; only that partition's items return") {
    val df = load().filter(col("partition") === "orgAm1")
    df.count() shouldBe 3
    val d = scanDesc(df)
    d should include("mode=QUERY")
    d should include("EqualTo(partition,orgAm1)")
  }

  test("hash + sort equality plans GET; exactly one item") {
    val df = load().filter(col("partition") === "orgAm1" && col("sort") === "200")
    val rows = df.collect()
    rows.length shouldBe 1
    rows.head.getAs[Seq[String]]("ids").toSet shouldBe Set("w1", "w2")
    scanDesc(df) should include("mode=GET")
  }

  test("hash equality + sort range plans QUERY with range; filters rows") {
    val df = load().filter(col("partition") === "orgAm1" && col("sort") >= "150")
    df.collect().map(_.getAs[String]("sort")).sorted.toSeq shouldBe Seq("200", "300")
    scanDesc(df) should include("mode=QUERY")
  }

  test("attribute-only predicate degrades to SCAN with server-side filter") {
    val df = load().filter(col("sort") === "100")
    df.count() shouldBe 2
    scanDesc(df) should include("mode=SCAN")
  }

  test("projection pushdown prunes unread columns at the scan") {
    val df = load().filter(col("partition") === "orgAm1").select("sort")
    df.collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("100", "200", "300")
    // the BatchScan output must carry only the needed columns — ids and
    // field1 are pruned (partition survives for the pushed filter)
    val d = scanDesc(df)
    d should include("BatchScan")
    d should not include "ids#"
    d should not include "field1#"
  }

  test("connector output feeds the standard expansion + recombination path") {
    val desc = NearlineTableDesc("t_0_1000", tablePath, 0, 1000)
    val expanded = NearlineStub.expandRows(
      load().filter(col("partition") === "orgAm1"))
    // 3 items, one with two write-ids → 4 expanded rows
    expanded.count() shouldBe 4
    expanded.filter(col("timestamp") === "200").count() shouldBe 2
  }
}
