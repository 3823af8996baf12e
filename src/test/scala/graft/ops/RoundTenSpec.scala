package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Behavior pins for the round-10 hardening: KMV k-mismatch guard,
  * asofNearest reserved-name guard, and the index cache's data-version
  * witness (stale-cache invalidation on overwrite). */
class RoundTenSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def table(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  test("kmv: consuming a sketch with a mismatched k fails loudly, not silently wrong") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", StringType)))
    val rows = (1 to 10).map(i => Row("A", s"x$i"))
    val sk = Kmv.sketch(table(schema, rows: _*), "g", "v", k = 8)
    // matched k: works
    Kmv.estimate(sk, "g", k = 8).collect().head.getDouble(1) shouldBe 8.0 +- 3.0
    // mismatched k: the execution-time assert fires (wrapped by Spark)
    val e = intercept[Exception](Kmv.estimate(sk, "g", k = 4).collect())
    e.getMessage should include("KMV k mismatch")
    val e2 = intercept[Exception](Kmv.pairwise(sk, "g", k = 256).collect())
    e2.getMessage should include("KMV k mismatch")
    val sk2 = Kmv.sketch(table(schema, rows: _*), "g", "v", k = 16)
    val e3 = intercept[Exception](Kmv.merge(sk, sk2, "g", k = 8).collect())
    e3.getMessage should include("KMV k mismatch")
  }

  test("asofNearest refuses a left frame that collides with reserved output names") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("id", "ts", "direction") // 'direction' is a reserved output
    val right = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("ts", "v")
    val e = intercept[IllegalArgumentException](
      AsOf.asofNearest(left, right, "id", "ts", "id", Seq("v")))
    e.getMessage should include("direction")
    val e2 = intercept[IllegalArgumentException](
      AsOf.asofNearest(left.drop("direction").withColumnRenamed("x", "x"),
        right, "id", "ts", "missing_id", Seq("v")))
    e2.getMessage should include("missing_id")
  }

  test("index cache is invalidated when the source files change under the same plan") {
    val dir = SparkFixture.tempDir("idxver") + "/tbl"
    import spark.implicits._
    (1 to 3).toDF("n").write.mode("overwrite").parquet(dir)
    val first = Materialize.index(spark.read.parquet(dir), "ver-test").count()
    first shouldBe 3
    // Overwrite the SAME path with different data: the logical plan is
    // identical, so without the data-version witness the cache would
    // serve the stale 3-row parquet.
    (1 to 5).toDF("n").write.mode("overwrite").parquet(dir)
    val second = Materialize.index(spark.read.parquet(dir), "ver-test").count()
    second shouldBe 5
  }
}
