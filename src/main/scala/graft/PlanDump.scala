package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: write `.explain("formatted")` output for named
  * SparkEntry queries to files — the before/after plan evidence the
  * optimization rounds commit under plans/r<k>/.
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query>...
  * (suffix is "before" or "after"; query "ALL" dumps every key). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args.lift(2).contains("ALL")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
    if (sys.env.get("SPARK_GRAFT_PREWARM").contains("1"))
      PipelineQueries.prewarmStandingFixtures(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // queryExecution.explainString == df.explain("formatted") output
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch {
        // NonFatal only: an OOM/linkage error must abort the dump rather
        // than produce misleading partial plans from an unhealthy JVM
        case scala.util.control.NonFatal(e) =>
          println(s"[plandump] FAILED $name: ${e.getMessage}")
      } finally graft.ops.Materialize.dropAll()
    }
    graft.ops.Materialize.clearCache()
    spark.stop()
  }
}
