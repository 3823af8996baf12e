package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: stage timing of the 64-bit simhash hamming pipeline —
  * fingerprint compute vs index materialize vs block-key probing. */
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
    time("simhash16 compute") {
      graft.ops.Dedup.simhash16(docs, "text").selectExpr("count(distinct simhash)").collect()
    }
    time("simhash64 compute (cold)") {
      graft.ops.Dedup.simhash64(docs, "text").selectExpr("count(distinct simhash)").collect()
    }
    time("simhash64 compute (warm)") {
      graft.ops.Dedup.simhash64(docs, "text").selectExpr("count(distinct simhash)").collect()
    }
    time("simhash64Agg compute (cold)") {
      graft.ops.Dedup.simhash64Agg(docs, "doc_id", "text")
        .selectExpr("count(distinct simhash)").collect()
    }
    time("simhash64Agg compute (warm)") {
      graft.ops.Dedup.simhash64Agg(docs, "doc_id", "text")
        .selectExpr("count(distinct simhash)").collect()
    }
    time("agg == projection (string-for-string)") {
      val proj = graft.ops.Dedup.simhash64(docs, "text").select(col("doc_id"), col("simhash"))
      val agg = graft.ops.Dedup.simhash64Agg(docs, "doc_id", "text")
      val diff = proj.except(agg).count() + agg.except(proj).count()
      println(s"disagreements=$diff")
    }
    val sh = time("materialize simhash64 index") {
      val m = graft.ops.Materialize.index(
        graft.ops.Dedup.simhash64(docs, "text").select(col("doc_id"), col("simhash")), "ph")
      m.count(); m
    }
    val hashes = sh.select("simhash").distinct()
    val probes = hashes.select(col("simhash"),
      explode(expr(s"array(${graft.ops.Dedup.hammingBlockKeySql.mkString(", ")})")).as("probe"))
    val cand = probes.select(col("simhash").as("sa"), col("probe"))
      .join(probes.select(col("simhash").as("sb"), col("probe")), "probe")
      .filter(col("sa") < col("sb"))
      .select("sa", "sb").distinct()
    time("block-key candidates") { println(s"candidates=${cand.count()}") }
    time("full pairs end-to-end") {
      println("pairs=" +
        graft.ops.Dedup.simhashHammingPairs(docs, "doc_id", "text").count())
    }
    graft.ops.Materialize.clearCache()
    spark.stop()
  }
}
