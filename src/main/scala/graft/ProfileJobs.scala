package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scratch main: run named SparkEntry queries with a per-SQL-EXECUTION
  * timeline — each action's wall seconds and callsite description — so a
  * protocol-heavy query (many small actions) can be broken down without
  * the UI. Usage: runMain graft.ProfileJobs <sfDir> <query>...
  * Env: SPARK_GRAFT_PREWARM=1 to run the standing-fixture prep untimed
  * first (what Bench does), so nightly keys measure only the recurring
  * ingest. */
object ProfileJobs {

  private class JobTimeline extends SparkListener {
    import org.apache.spark.sql.execution.ui.{
      SparkListenerSQLExecutionStart, SparkListenerSQLExecutionEnd}
    // t1 is written by the listener-bus thread and read by the main
    // thread after drainListenerBus; @volatile so the report does not
    // depend on the drain's memory semantics if it times out.
    case class Exec(id: Long, desc: String, t0: Long, @volatile var t1: Long = 0L)
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, Exec]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      jobCount.incrementAndGet(); ()
    }
    override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
      case s: SparkListenerSQLExecutionStart =>
        if (execs.putIfAbsent(s.executionId,
            Exec(s.executionId, s.description, s.time)) == null)
          order.add(s.executionId)
        ()
      case s: SparkListenerSQLExecutionEnd =>
        Option(execs.get(s.executionId)).foreach(_.t1 = s.time)
      case _ => ()
    }
    def reset(): Unit = { execs.clear(); order.clear(); jobCount.set(0) }
    def report(): String = {
      import scala.jdk.CollectionConverters._
      val rows = order.asScala.toSeq.flatMap(id => Option(execs.get(id)))
        .filter(_.t1 > 0)
      val bySite = rows.groupBy(_.desc).map { case (s, es) =>
        (s, es.map(e => math.max(0L, e.t1 - e.t0)).sum / 1e3, es.size)
      }.toSeq.sortBy(-_._2)
      val top = rows.sortBy(e => -(e.t1 - e.t0)).take(20).map(e =>
        f"    exec ${e.id}%4d ${(e.t1 - e.t0) / 1e3}%7.2f s  ${e.desc}")
      f"  ${rows.size} sql executions, ${jobCount.get} jobs, " +
        f"${rows.map(e => math.max(0L, e.t1 - e.t0)).sum / 1e3}%.2f s summed\n" +
        "  by callsite:\n" +
        bySite.take(25).map { case (s, sec, n) => f"    $sec%7.2f s  n=$n%-4d $s" }
          .mkString("\n") +
        "\n  slowest executions:\n" + top.mkString("\n")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("pipeline_asset_manifest_nightly")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    spark.range(1000).selectExpr("sum(id)").collect() // warmup
    spark.read.parquet(s"$sfDir/region.parquet").count()
    if (sys.env.get("SPARK_GRAFT_PREWARM").contains("1")) {
      val t0 = System.nanoTime()
      PipelineQueries.prewarmStandingFixtures(spark, sfDir)
      println(f"[profilejobs] fixture prewarm: ${(System.nanoTime() - t0) / 1e9}%.1f s (untimed)")
    }
    val tl = new JobTimeline
    spark.sparkContext.addSparkListener(tl)
    for (name <- names) {
      SparkEntry.queries.get(name) match {
        case None =>
          println(s"[profilejobs] unknown query: $name (skipped)")
        case Some(fn) =>
          tl.reset()
          val t0 = System.nanoTime()
          try {
            val n = fn(spark, sfDir).count()
            val wall = (System.nanoTime() - t0) / 1e9
            org.apache.spark.sql.graftshim.GraftSessions.drainListenerBus(spark)
            println(f"[profilejobs] $name: $wall%.2f s ($n rows)")
            println(tl.report())
          } catch {
            case scala.util.control.NonFatal(e) =>
              println(s"[profilejobs] FAILED $name: ${e.getMessage}")
          } finally graft.ops.Materialize.dropAll()
      }
    }
    graft.ops.Materialize.clearCache()
    spark.stop()
  }
}
