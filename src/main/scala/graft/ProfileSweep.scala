package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch profiling main for the banding-sweep stages (round 10). */
object ProfileSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    def timed(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sweepprof] $n: ${(System.nanoTime()-t0)/1e9}%.2f s ($r rows)")
    }
    val docs = graft.ops.Materialize.spread(
      Tables.load(spark, sfDir, "documents").filter(
        expr("instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 < 4")))
    timed("sample")(docs.count())
    val grams = docs.select(col("doc_id"),
      array_distinct(graft.ops.Dedup.shingles("text", 2)).as("grams"))
    val sigs = (0 until 4).foldLeft(grams) { (d, i) =>
      d.withColumn(s"g$i",
        expr(s"array_min(transform(grams, g -> md5(concat('gsalt$i|', g))))"))
    }.withColumn("grams", expr("transform(grams, g -> substring(md5(g), 1, 16))"))
    val indexed = graft.ops.Materialize.index(sigs, "ngram-sig")
    timed("sig_index")(indexed.count())
    timed("truth")(graft.ops.Dedup.allPairsJaccardTok(
      graft.ops.Dedup.bigramMd5Tok(docs, "doc_id", "text"), "doc_id",
      threshold = 0.5, hexTokens = true).count())
    for ((cfg, bands, nb) <- Seq(
      ("b1r4", indexed.select(col("doc_id"),
        md5(concat_ws("|", col("g0"), col("g1"), col("g2"), col("g3"))).as("band0")), 1),
      ("b2r2", indexed.select(col("doc_id"),
        md5(concat_ws("|", col("g0"), col("g1"))).as("band0"),
        md5(concat_ws("|", col("g2"), col("g3"))).as("band1")), 2),
      ("b4r1", indexed.select(col("doc_id"),
        col("g0").as("band0"), col("g1").as("band1"),
        col("g2").as("band2"), col("g3").as("band3")), 4))) {
      val cand = graft.ops.Dedup.lshCandidatePairs(bands, "doc_id", numBands = nb)
      timed(s"cand_$cfg")(cand.count())
      timed(s"verify_$cfg")(cand
        .join(indexed.select(col("doc_id").as("id_a"), col("grams").as("ga")), "id_a")
        .join(indexed.select(col("doc_id").as("id_b"), col("grams").as("gb")), "id_b")
        .filter(round(size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb"))), 4) >= 0.5).count())
    }
    graft.ops.Materialize.clearCache()
    spark.stop()
  }
}
