package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The driver-smoke flagship: full multi-source path must neither drop nor
  * duplicate rows across the archive/nearline overlap. */
class FlagshipSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark

  test("flagship assembles sf0.001 events exactly once across three sources") {
    val (expected, got) = Flagship.assembledCount(spark, "/root/testdata/sf0.001")
    got shouldBe expected
    expected shouldBe 1000L
  }

  test("entry returns rows (driver smoke contract)") {
    val rows = SparkEntry.entry(spark).collect()
    rows.length should be > 0
    rows.map(_.getAs[String]("etype")).distinct.length shouldBe rows.length
  }
}
