package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch profiling main for the phash pipeline stages (round 10). */
object ProfilePhash {
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
      println(f"[phashprof] $n: ${(System.nanoTime()-t0)/1e9}%.2f s ($r rows)")
    }
    val docs = graft.ops.Materialize.spread(Tables.load(spark, sfDir, "documents"))
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("zzzz"), expr("substring(text, 5)")).as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(copies)
    val assets = graft.ops.Multimodal.assetsFromText(corpus, "doc_id", "text")
    timed("assets")(assets.count())
    val fp = graft.ops.Multimodal.perceptualHash(assets, "asset_id", "content")
    timed("fingerprints")(fp.count())
    timed("fingerprints2")(fp.count())
    timed("pairs_total")(graft.ops.Multimodal.phashPairs(assets).count())
    graft.ops.Materialize.clearCache()
    spark.stop()
  }
}
