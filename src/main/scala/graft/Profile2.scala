package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Materialize}

/** Scratch main: substage timing of dedup_minhash_lsh (not part of the
  * engine surface). */
object Profile2 {
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
      println(f"[p2] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    val docs0 = Tables.load(spark, sfDir, "documents")
    docs0.count()

    val docs = time("spread") { val d = Materialize.spread(docs0); d.count(); d }
    val sigs = Dedup.minhashSignatures(docs, "text", numHashes = 4)
      .withColumn("toks", array_distinct(split(lower(col("text")), " ")))
      .select("doc_id", "h0", "h1", "h2", "h3", "toks")
    val indexed = time("sig index write") { Materialize.index(sigs, "minhash-sig") }
    val bands = Dedup.lshBands(indexed, numHashes = 4, rowsPerBand = 2)
    val pairs = time("candidate pairs (incl band index write + self-join)") {
      val p = Dedup.lshCandidatePairs(bands, "doc_id", numBands = 2); p.count(); p }
    time("verify joins") {
      Dedup.verifyPairsTok(pairs, indexed.select("doc_id", "toks"), "doc_id", threshold = 0.5)
        .count()
    }
    time("full again, one action") { PipelineQueries.dedupMinhashLsh(spark, sfDir).count() }
    Materialize.dropAll()

    // variant: no spread
    time("variant: full without spread") {
      val sigs2 = Dedup.minhashSignatures(docs0, "text", numHashes = 4)
        .withColumn("toks", array_distinct(split(lower(col("text")), " ")))
        .select("doc_id", "h0", "h1", "h2", "h3", "toks")
      val idx2 = Materialize.index(sigs2, "minhash-sig2")
      val bands2 = Dedup.lshBands(idx2, numHashes = 4, rowsPerBand = 2)
      val pairs2 = Dedup.lshCandidatePairs(bands2, "doc_id", numBands = 2)
      Dedup.verifyPairsTok(pairs2, idx2.select("doc_id", "toks"), "doc_id", 0.5).count()
    }
    Materialize.clearCache()
    spark.stop()
  }
}
