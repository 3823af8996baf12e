package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Materialize}

/** Scratch main: substage timing + cardinalities of the exact all-pairs
  * build (dedup_allpairs's 3-index cold cost — not part of the engine
  * surface). */
object ProfileAllpairs {
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
      println(f"[pap] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    val docs0 = Tables.load(spark, sfDir, "documents")
    docs0.count()
    val docs = Materialize.spread(docs0)
    val threshold = 0.5

    import org.apache.spark.sql.expressions.Window
    val idCol = "doc_id"
    val tokens = Dedup.bigramMd5Tok(docs, "doc_id", "text")
    val tok = time("tok index write") { Materialize.index(tokens, "allpairs-tok") }
    println(s"[pap] docs=${tok.count()}  avg toks=" +
      tok.select(avg(size(col("toks")))).collect()(0).getDouble(0))
    val exploded = tok.select(col(idCol), explode(col("toks")).as("tok"))
    val dfCounts = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val tPrune = threshold - 5.0e-5 - 1e-9
    val wDoc = Window.partitionBy(idCol)
    val wOrd = Window.partitionBy(idCol).orderBy(col("df"), col("tok"))
    val prefix = time("prefix index write") { Materialize.index(
      exploded
        .join(dfCounts, "tok")
        .withColumn("n", count(lit(1)).over(wDoc))
        .withColumn("rnk", row_number().over(wOrd))
        .filter(col("rnk") <=
          col("n") - ceil(lit(tPrune) * col("n")).cast("int") + lit(1))
        .select(col(idCol), col("n"), col("rnk"), col("tok")),
      "allpairs-prefix") }
    println(s"[pap] prefix rows=${prefix.count()}")
    val alphaFrac = tPrune / (1.0 + tPrune)
    val cand = prefix.select(col(idCol).as("id_a"), col("n").as("na"),
        col("rnk").as("ra"), col("tok"))
      .join(prefix.select(col(idCol).as("id_b"), col("n").as("nb"),
        col("rnk").as("rb"), col("tok")), "tok")
      .filter(col("id_a") < col("id_b") &&
        col("nb") * lit(tPrune) <= col("na") &&
        col("na") * lit(tPrune) <= col("nb") &&
        lit(1.0) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
          lit(alphaFrac) * (col("na") + col("nb")) - lit(1e-9))
      .select("id_a", "id_b")
      .distinct()
    val candM = time("cand count") { val c = cand.count(); println(s"[pap] candidates=$c"); cand }
    val verifyDf = Dedup.verifyPairsTok(candM, tok, idCol, threshold)
    sys.env.get("PAP_PLAN_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        verifyDf.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      println(s"[pap] wrote internal verify plan to $out")
    }
    time("verify + out write") {
      Materialize.index(verifyDf, "allpairs-out").count()
    }
    Materialize.clearCache()
    // the real production path (hex→long fast path), cold
    time("allPairsJaccardTok(hexTokens=true) cold end-to-end") {
      println(s"[pap] hex-path pairs=" + Dedup.allPairsJaccardTok(
        Dedup.bigramMd5Tok(docs, "doc_id", "text"), "doc_id",
        threshold = 0.5, hexTokens = true).count())
    }
    // equality witness: hex-long path ≡ string path, row for row
    val hexOut = Dedup.allPairsJaccardTok(
      Dedup.bigramMd5Tok(docs, "doc_id", "text"), "doc_id",
      threshold = 0.5, hexTokens = true)
    val strOut = Dedup.allPairsJaccardTok(
      Dedup.bigramMd5Tok(docs, "doc_id", "text"), "doc_id",
      threshold = 0.5, hexTokens = false)
    val diff = hexOut.exceptAll(strOut).count() + strOut.exceptAll(hexOut).count()
    println(s"[pap] hex-vs-string symmetric diff rows = $diff (0 = identical)")
    Materialize.clearCache()
    spark.stop()
  }
}
