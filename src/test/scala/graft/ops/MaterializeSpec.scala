package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The index store's root resolution: driver-local temp dir by default,
  * `spark.graft.indexDir` (a shared-FS/lake prefix on a real cluster)
  * when set — and `dropAll` cleans whichever root the indexes landed in. */
class MaterializeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark

  test("indexes land under spark.graft.indexDir when set and dropAll cleans them there") {
    Materialize.dropAll() // isolate from other suites' leftovers
    val root = SparkFixture.tempDir("idxroot")
    spark.conf.set(Materialize.IndexDirConf, root)
    try {
      val idx = Materialize.index(spark.range(10).toDF("id"), "t")
      idx.count() shouldBe 10
      val children = new java.io.File(root).listFiles()
      children should not be null
      children.length shouldBe 1
      children.head.getName should startWith("t")
      val scratch = Materialize.scratchDir("s")
      scratch should startWith(root)
      Materialize.liveCount shouldBe 2
      Materialize.dropAll()
      Materialize.liveCount shouldBe 0
      new java.io.File(root).listFiles().length shouldBe 0
    } finally spark.conf.unset(Materialize.IndexDirConf)
  }

  test("without the conf, indexes land in the driver-local default root") {
    Materialize.dropAll()
    val idx = Materialize.index(spark.range(3).toDF("id"), "local")
    idx.count() shouldBe 3
    Materialize.liveCount shouldBe 1
    Materialize.dropAll()
    Materialize.liveCount shouldBe 0
  }
}
