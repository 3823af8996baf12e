package graft.functions

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bloom semi-join reduction surface: `graft_bloom_agg` builds,
  * `graft_might_contain` probes, and the combination is a sound
  * pre-filter (no false negatives; false positives rare and removed by
  * the exact join). */
class BloomSpec extends AnyFunSuite with Matchers {
  private lazy val spark = {
    val s = SparkFixture.spark
    GraftExtensions.register(s)
    s
  }

  test("every inserted key probes true (no false negatives, the soundness half)") {
    spark.range(0, 500).createOrReplaceTempView("bloom_build")
    val misses = spark.sql(
      """SELECT count(*) AS n FROM bloom_build
        |WHERE NOT graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(id)) FROM bloom_build),
        |  xxhash64(id))""".stripMargin).collect()(0).getLong(0)
    misses shouldBe 0L
  }

  test("disjoint keys overwhelmingly probe false (the filter actually filters)") {
    spark.range(0, 500).createOrReplaceTempView("bloom_in")
    spark.range(1000000, 1001000).createOrReplaceTempView("bloom_out")
    val falsePositives = spark.sql(
      """SELECT count(*) AS n FROM bloom_out
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(id), 500) FROM bloom_in),
        |  xxhash64(id))""".stripMargin).collect()(0).getLong(0)
    // 500 items in a 500-capacity filter: FPP ~3%; 1000 probes stay far
    // under 10% even on an unlucky seed
    falsePositives should be < 100L
  }

  test("graft_bloom_agg arity is validated with a readable error") {
    val e = intercept[Exception] { spark.sql("SELECT graft_bloom_agg()").collect() }
    e.getMessage should include("graft_bloom_agg")
  }

  test("the semi-join query probes the bloom on the scan side of the big table") {
    val df = graft.QueriesExtra.bloomSemiJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the probe must appear as a Filter (scan side), not only post-join
    // (the executed plan prints the engine expression name, might_contain)
    plan should include("might_contain")
    // and the exact semi join is still there to kill false positives
    plan.toLowerCase should include("semi")
    df.count() should be > 0L
  }
}
