package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for quick experiments (not part of the engine). */
object Playground {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("dedup_minhash_lsh")(PipelineQueries.dedupMinhashLsh(spark, dir).count())
    time("multimodal_decode")(PipelineQueries.multimodalDecode(spark, dir).count())
    time("embed_knn_lsh")(PipelineQueries.embedKnnLsh(spark, dir).count())
    spark.stop()
  }
}
