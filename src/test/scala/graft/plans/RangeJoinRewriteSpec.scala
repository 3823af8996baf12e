package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The conf-gated optimizer rewrite of BETWEEN joins into bucketed
  * equi-joins. */
class RangeJoinRewriteSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def withWidth[A](w: Long)(f: => A): A = {
    graft.functions.GraftExtensions.register(spark)
    spark.conf.set(RangeJoinRewrite.WidthConf, w.toString)
    try f finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  private lazy val fixture: Unit = {
    val pts = (0L until 300L).map(i => Row(i, i % 5, (i * 41) % 2000))
    val ivs = (0L until 80L).map { i =>
      val lo = (i * 73) % 1900
      Row(i + 1000L, i % 5, lo, lo + (i % 5) * 60)
    }
    spark.createDataFrame(pts.asJava, StructType(Seq(
      StructField("pid", LongType), StructField("k", LongType),
      StructField("t", LongType)))).createOrReplaceTempView("rjr_points")
    spark.createDataFrame(ivs.asJava, StructType(Seq(
      StructField("iid", LongType), StructField("k", LongType),
      StructField("lo", LongType), StructField("hi", LongType))))
      .createOrReplaceTempView("rjr_intervals")
  }

  private val sqlBetween =
    """SELECT pid, iid FROM rjr_points p JOIN rjr_intervals i
      |ON p.k = i.k AND p.t BETWEEN i.lo AND i.hi""".stripMargin

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("rewrite produces the same pairs as the naive plan") {
    fixture
    val naive = pairs(spark.sql(sqlBetween))
    val rewritten = withWidth(64) { pairs(spark.sql(sqlBetween)) }
    rewritten shouldBe naive
    naive.size shouldBe naive.toSet.size // and the naive set is dup-free too
  }

  test("with the width set, the BETWEEN join leaves the nested-loop path") {
    fixture
    val plan = withWidth(64) {
      spark.sql(sqlBetween).queryExecution.executedPlan.toString }
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    plan should include("_graft_bucket")
  }

  test("unset width leaves the plan untouched (rule is opt-in)") {
    fixture
    graft.functions.GraftExtensions.register(spark)
    val plan = spark.sql(sqlBetween).queryExecution.executedPlan.toString
    plan should not include "_graft_bucket"
  }

  test("pure range join (no equi key) also rewrites off the cartesian path") {
    fixture
    val sql =
      """SELECT pid, iid FROM rjr_points p JOIN rjr_intervals i
        |ON p.t >= i.lo AND p.t <= i.hi""".stripMargin
    val naive = pairs(spark.sql(sql))
    val (rewritten, plan) = withWidth(64) {
      val df = spark.sql(sql)
      (pairs(df), df.queryExecution.executedPlan.toString)
    }
    rewritten shouldBe naive
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("strict bounds qualify and keep exact strictness in the residual") {
    fixture
    val sql =
      """SELECT pid, iid FROM rjr_points p JOIN rjr_intervals i
        |ON p.k = i.k AND p.t > i.lo AND p.t < i.hi""".stripMargin
    val naive = pairs(spark.sql(sql))
    withWidth(64) { pairs(spark.sql(sql)) } shouldBe naive
  }

  test("keys above 2^53 bucket exactly (Long floor-division, no Double detour)") {
    // Around 2^60 a Double-cast bucket id merges adjacent buckets; the
    // Long pmod/div math must keep points one bucket apart and the pairs
    // exact. Points straddle interval edges so an off-by-one-bucket error
    // changes the result.
    val base = 1L << 60
    val pts = (0L until 64L).map(i => Row(i, base + i * 13))
    val ivs = (0L until 16L).map(i => Row(i + 500L, base + i * 50, base + i * 50 + 40))
    spark.createDataFrame(pts.asJava, StructType(Seq(
      StructField("pid", LongType), StructField("t", LongType))))
      .createOrReplaceTempView("rjr_big_points")
    spark.createDataFrame(ivs.asJava, StructType(Seq(
      StructField("iid", LongType), StructField("lo", LongType),
      StructField("hi", LongType)))).createOrReplaceTempView("rjr_big_intervals")
    val sql =
      """SELECT pid, iid FROM rjr_big_points p JOIN rjr_big_intervals i
        |ON p.t >= i.lo AND p.t <= i.hi""".stripMargin
    val naive = pairs(spark.sql(sql))
    naive should not be empty
    val (rewritten, optimized) = withWidth(64) {
      val df = spark.sql(sql)
      (pairs(df), df.queryExecution.optimizedPlan.toString)
    }
    rewritten shouldBe naive
    // pin the integer encoding: buckets come from pmod/div, not a cast to double
    optimized.toLowerCase should include("pmod")
    optimized.toLowerCase should not include "cast(t#"
  }

  test("a malformed width conf disables the rule instead of failing every query") {
    fixture
    graft.functions.GraftExtensions.register(spark)
    spark.conf.set(RangeJoinRewrite.WidthConf, "not-a-number")
    try {
      val df = spark.sql(sqlBetween)
      noException should be thrownBy df.collect()
      df.queryExecution.executedPlan.toString should not include "_graft_bucket"
    } finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  test("output schema is unchanged by the rewrite") {
    fixture
    val sql = "SELECT * FROM rjr_points p JOIN rjr_intervals i " +
      "ON p.k = i.k AND p.t BETWEEN i.lo AND i.hi"
    val cols = withWidth(64) { spark.sql(sql).columns.toSeq }
    cols shouldBe Seq("pid", "k", "t", "iid", "k", "lo", "hi")
  }
}
