package graft.sources

import graft.SparkFixture
import graft.sources.dsv2.{InMemoryStore, InMemoryTransport, NearlineTransport}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The transport SDK seam, validated with a SECOND backend whose resume
  * cost model matches the real service (O(1) `ExclusiveStartKey` seek).
  * Planning, pushdown, segmentation, and paging are shared machinery; only
  * the storage swaps — the claim the seam makes, now held by two
  * implementations instead of one. */
class InMemoryTransportSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark

  private val schema = StructType(Seq(
    StructField("partition", StringType), StructField("sort", StringType),
    StructField("amount", StringType)))

  private def reg(name: String, n: Int): String = {
    val rows = (0 until n).map { i =>
      Map[String, Any](
        "partition" -> s"p${i % 10}",
        "sort" -> f"$i%06d",
        "amount" -> (i % 100).toString)
    }
    InMemoryStore.register(s"mem://$name", schema, rows)
    s"mem://$name"
  }

  private def load(path: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", path)
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  test("connector round-trips an in-memory table with pushdown modes intact") {
    val p = reg("roundtrip", 500)
    val df = load(p)
    df.count() shouldBe 500
    // Query mode on hash key
    val q = load(p).filter(col("partition") === "p3")
    q.count() shouldBe 50
    q.queryExecution.executedPlan.toString should include("mode=QUERY")
    // Get mode on full key
    val g = load(p).filter(col("partition") === "p3" && col("sort") === "000003")
    g.count() shouldBe 1
    g.queryExecution.executedPlan.toString should include("mode=GET")
    // server-side attribute filter under Scan
    load(p).filter(col("amount") === "7").count() shouldBe 5
  }

  test("resume from a continuation token is O(1): deep tokens touch no preceding rows") {
    val p = reg("o1resume", 10000)
    val t = new InMemoryTransport
    val read = ReadPlanner.Scan(None, None)
    InMemoryStore.rowsTouched.set(0)
    val page = t.page(p, read, "partition", "sort", 0, 1, Some("9990"), 5)
    page.records.length shouldBe 5
    // the O(1)-resume pin: only the page's own rows were examined — a
    // token-proportional resume (the round-3 quadratic) would touch ~9990
    InMemoryStore.rowsTouched.get() shouldBe 5
  }

  test("a full paged read touches each row exactly once (linearity across tokens)") {
    val p = reg("linear", 2000)
    InMemoryStore.rowsTouched.set(0)
    load(p, Map("pagesize" -> "100")).count() shouldBe 2000
    // segments jointly cover the table; every row examined once per
    // segment that scans it — never once per PAGE (the quadratic shape)
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = load(p, Map("pagesize" -> "100"))
    df.count() shouldBe 2000
    val parts = df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get.inputRDD.partitions.length
    InMemoryStore.rowsTouched.set(0)
    df.count() shouldBe 2000
    InMemoryStore.rowsTouched.get() shouldBe parts.toLong * 2000
  }

  test("retry semantics hold on the second transport (same-token re-issue)") {
    // the default session wraps page(); a failed call re-issues from the
    // same token — exact-once delivery must hold here exactly as it does
    // for the parquet transport
    val p = reg("retrymem", 40)
    FlakyOnceMemTransport.reset()
    val df = load(p, Map(
      "pagesize" -> "7",
      "transport" -> classOf[FlakyOnceMemTransport].getName))
    df.count() shouldBe 40
    FlakyOnceMemTransport.fired.get() shouldBe 1
  }
}

object FlakyOnceMemTransport {
  val fired = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = fired.set(0)
}

class FlakyOnceMemTransport extends InMemoryTransport {
  override def page(
      path: String, read: ReadPlanner.Read, hashKey: String, sortKey: String,
      segment: Int, numSegments: Int, token: Option[String], pageSize: Int) = {
    if (token.isDefined && FlakyOnceMemTransport.fired.compareAndSet(0, 1))
      throw new RuntimeException("injected throttle")
    super.page(path, read, hashKey, sortKey, segment, numSegments, token, pageSize)
  }
}
