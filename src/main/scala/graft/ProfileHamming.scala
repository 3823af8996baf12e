package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: stage timing of the simhash hamming-radius pipeline. */
object ProfileHamming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    time("simhash16 only") {
      graft.ops.Dedup.simhash16(docs, "text").selectExpr("count(distinct simhash)").collect()
    }
    time("simhash16 again (warm)") {
      graft.ops.Dedup.simhash16(docs, "text").selectExpr("count(distinct simhash)").collect()
    }
    val sh = time("materialize sh") {
      graft.ops.Materialize.index(
        graft.ops.Dedup.simhash16(docs, "text").select(col("doc_id"), col("simhash")), "ph")
    }
    val probes = sh.select(col("doc_id"), explode(expr(
      """transform(sequence(0, 16), k -> CASE WHEN k = 0 THEN simhash
        |ELSE concat(substring(simhash, 1, k - 1),
        |  CASE WHEN substring(simhash, k, 1) = '1' THEN '0' ELSE '1' END,
        |  substring(simhash, k + 1, 16)) END)""".stripMargin)).as("probe"))
    time("probe explode count") { println(probes.count()) }
    val cand = probes.select(col("doc_id").as("id_a"), col("probe"))
      .join(probes.select(col("doc_id").as("id_b"), col("probe")), "probe")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates") { println(cand.count()) }
    time("full pairs") {
      println(graft.ops.Dedup.simhashHammingPairs(docs, "doc_id", "text").count())
    }
    graft.ops.Materialize.dropAll()
    spark.stop()
  }
}
