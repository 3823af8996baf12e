package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: stage-by-stage timing of the minhash pipeline (not part
  * of the engine surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    println(s"[profile] docs=${docs.count()} " +
      docs.selectExpr("avg(length(text))", "max(length(text))").collect().head)

    time("tokenize only") {
      docs.selectExpr("sum(size(split(lower(text), ' ')))").collect()
    }
    time("shingles only") {
      docs.select(graft.ops.Dedup.shingles("text", 3).as("sh"))
        .selectExpr("sum(size(sh))").collect()
    }
    time("1 minhash") {
      graft.ops.Dedup.minhashSignatures(docs, "text", numHashes = 1)
        .selectExpr("count(distinct h0)").collect()
    }
    time("4 minhash") {
      graft.ops.Dedup.minhashSignatures(docs, "text", numHashes = 4)
        .selectExpr("count(distinct h3)").collect()
    }
    time("full dedup_minhash_lsh") {
      PipelineQueries.dedupMinhashLsh(spark, sfDir).count()
    }
    val grams = docs.select(col("doc_id"),
      array_distinct(expr(
        "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))"))
        .as("grams"))
    time("gram sets only") { grams.selectExpr("sum(size(grams))").collect() }
    time("gram minhash x1") {
      grams.withColumn("g0",
        expr("array_min(transform(grams, g -> md5(concat('gsalt0|', g))))"))
        .selectExpr("count(distinct g0)").collect()
    }
    time("gram minhash x4") {
      (0 until 4).foldLeft(grams) { (d, i) =>
        d.withColumn(s"g$i",
          expr(s"array_min(transform(grams, g -> md5(concat('gsalt$i|', g))))"))
      }.selectExpr("count(distinct g3)").collect()
    }
    time("full dedup_ngram_jaccard") {
      PipelineQueries.dedupNgramJaccard(spark, sfDir).count()
    }
    spark.stop()
  }
}
