package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Compaction: file grain, clustering, and content preservation. */
class LayoutSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark

  private def scattered(n: Int, parts: Int) = {
    import spark.implicits._
    // worst-case layout: keys striped across many tiny partitions
    spark.range(n).repartition(parts)
      .select(col("id"), (col("id") % 97).as("k"),
        md5(col("id").cast("string")).as("payload"))
  }

  test("compact hits the target file grain and preserves every row") {
    val dir = SparkFixture.tempDir("compact")
    val src = scattered(10000, 37)
    val out = Layout.compact(src, dir, targetRowsPerFile = 2500, Seq("k", "id"))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    files.length shouldBe 4 // ceil(10000 / 2500)
    out.count() shouldBe 10000
    // content identical, not just counted: anti-join both ways is empty
    out.join(src, Seq("id", "k", "payload"), "left_anti").count() shouldBe 0
    src.join(out, Seq("id", "k", "payload"), "left_anti").count() shouldBe 0
  }

  test("compacted files have disjoint cluster-key ranges (zone-map friendly)") {
    val dir = SparkFixture.tempDir("compact2")
    val out = Layout.compact(scattered(8000, 29), dir, 2000, Seq("k"))
    val stats = Layout.fileStats(out, "k")
      .collect().map(r => (r.getAs[Long]("key_min"), r.getAs[Long]("key_max")))
      .sortBy(_._1)
    stats.foreach { case (lo, hi) => lo should be <= hi }
    // ranges must not interleave: every file's min >= previous file's max
    stats.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => lo2 should be >= hi1
      case _ =>
    }
  }

  test("compact executes the source lineage once (single read of the input files)") {
    // The r5 shape counted the raw df then wrote it — two full executions
    // of the upstream lineage. Now the input is materialized once
    // (localCheckpoint) and both the count and the write read the blocks.
    // Evidence: file-input bytes during compact stay ~1× the source size
    // (a double pass would read ~2×).
    val srcDir = SparkFixture.tempDir("compactsrc")
    scattered(20000, 13).write.mode("overwrite").parquet(srcDir)
    val src = spark.read.parquet(srcDir).filter(col("id") % 2 === 0)
    // Count executed stages that contain a file-scan RDD: the materialize
    // job scans the source once; the count and the write read checkpoint
    // blocks (no FileScanRDD in their lineage). The r5 double-pass shape
    // ran two file-scan stages.
    val scanStages = new java.util.concurrent.atomic.LongAdder
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.rddInfos.exists(_.name.contains("FileScan")))
          scanStages.increment()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Layout.compact(src, SparkFixture.tempDir("compactout"), 5000, Seq("k"))
      org.apache.spark.sql.graftshim.GraftSessions.drainListenerBus(spark)
    } finally spark.sparkContext.removeSparkListener(listener)
    scanStages.sum() shouldBe 1L
  }

  test("z-order narrows BOTH dimensions' per-file ranges; single-key compact does not") {
    // two pseudo-uniform independent dimensions
    val df = spark.range(20000).select(
      (col("id") * 2654435761L % 10007).as("x"),
      (col("id") * 40503 % 9973).as("y"))
    val z = Layout.zorder(df, SparkFixture.tempDir("zord"), 312, "x", "y") // ~64 files
    val c = Layout.compact(df, SparkFixture.tempDir("zordc"), 312, Seq("x"))
    // average per-file span / global span = the expected fraction of files
    // a point filter on that column must touch (the zone-map skip metric);
    // averages absorb the Morton curve's boundary-straddling files
    def avgSpanFrac(t: org.apache.spark.sql.DataFrame, cn: String, global: Double): Double = {
      val s = Layout.fileStats(t, cn).collect()
        .map(r => (r.getAs[Long]("key_max") - r.getAs[Long]("key_min")).toDouble)
      s.sum / s.length / global
    }
    // z-order: a point filter on EITHER dimension skips most files
    avgSpanFrac(z, "x", 10007) should be < 0.4
    avgSpanFrac(z, "y", 9973) should be < 0.4
    // single-key clustering: x razor-thin, y full-width in every file
    avgSpanFrac(c, "x", 10007) should be < 0.05
    avgSpanFrac(c, "y", 9973) should be > 0.8
    // round trip preserves content
    z.count() shouldBe 20000
    df.join(z, Seq("x", "y"), "left_anti").count() shouldBe 0
  }

  test("compact over a bare table scan skips the checkpoint copy; z-order handles empty input") {
    // bare scan: counting is metadata-cheap, a checkpoint would copy the
    // table into executor storage for nothing — content must round-trip
    val srcDir = SparkFixture.tempDir("barecompact")
    scattered(4000, 7).write.mode("overwrite").parquet(srcDir)
    val bare = spark.read.parquet(srcDir)
    val out = Layout.compact(bare, SparkFixture.tempDir("barecompactout"), 1000, Seq("k"))
    out.count() shouldBe 4000
    bare.join(out, Seq("id", "k", "payload"), "left_anti").count() shouldBe 0
    // empty z-order input: an empty table, not an NPE
    val empty = bare.filter(col("id") < 0)
    Layout.zorder(empty, SparkFixture.tempDir("zordempty"), 100, "k", "id")
      .count() shouldBe 0
  }

  test("a filter on the cluster key reads fewer files than the table has") {
    val dir = SparkFixture.tempDir("compact3")
    val out = Layout.compact(scattered(8000, 29), dir, 2000, Seq("k"))
    // key_min/key_max of matching files: only files whose range covers
    // k=3 can contain it — with 97 key values over 4 range-partitioned
    // files, exactly one file qualifies
    val hit = Layout.fileStats(out, "k")
      .filter(col("key_min") <= 3 && col("key_max") >= 3).count()
    hit shouldBe 1
  }
}
