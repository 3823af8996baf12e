package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: time a named subset of the SparkEntry queries against a
  * scale-factor dir (iterating on one regression without paying for the
  * whole battery). Usage: runMain graft.QuickBench <sfDir> <query>... */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("nearline_pushdown")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    spark.range(1000).selectExpr("sum(id)").collect() // warmup
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      graft.ops.Materialize.dropAll()
      val (ch, cm) = graft.ops.Materialize.cacheStats
      println(f"[quickbench] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows, idxcache $ch hit/$cm miss)")
    }
    graft.ops.Materialize.clearCache()
    spark.stop()
  }
}
