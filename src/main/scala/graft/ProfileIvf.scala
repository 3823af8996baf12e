package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: stage-by-stage timing of the IVF ANN query (not part of
  * the engine surface). */
object ProfileIvf {
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
      println(f"[ivf] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val emb = Tables.load(spark, sfDir, "embeddings")
    time("corpus count") { emb.count() }
    val queries = emb.filter(col("vec_id") < 10)
    import graft.ops.Similarity
    val nc = 16
    val cents = time("centroid collect") {
      emb.select(col("vec_id"), col("embedding")).orderBy(col("vec_id"))
        .limit(nc * 7).collect().zipWithIndex
        .collect { case (r, i) if i % 7 == 0 => (i / 7, r.getSeq[Float](1)) }.take(nc)
    }
    import spark.implicits._
    val centDf = broadcast(cents.toSeq.toDF("cid", "cvec"))
    def sims(df: org.apache.spark.sql.DataFrame, idAs: String) =
      df.select(col("vec_id").as(idAs), col("embedding").as("v"))
        .join(centDf)
        .select(col(idAs), col("cid"), Similarity.cosine(col("v"), col("cvec")).as("s"))
    val cCellDf = sims(emb, "corpus_id")
      .groupBy("corpus_id")
      .agg(max(struct(col("s"), (-col("cid")).as("negcid"))).as("best"))
      .select(col("corpus_id"), (-col("best.negcid")).cast("int").as("cell"))
    time("cCell compute only (count)") { cCellDf.count() }
    val cCell = time("cCell materialize") { graft.ops.Materialize.index(cCellDf, "ivf-cells") }
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("cid").desc)
    val qProbeDf = sims(queries, "query_id")
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 4)
      .select(col("query_id"), col("cid").as("cell"))
    time("qProbe compute only (count)") { qProbeDf.count() }
    val qProbe = time("qProbe materialize") { graft.ops.Materialize.index(qProbeDf, "ivf-probes") }
    val cand = qProbe.join(cCell, "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id").distinct()
    time("cand count") { cand.count() }
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cv = emb.select(col("vec_id").as("corpus_id"), col("embedding").as("cvec"))
    val scored = cand.join(broadcast(qv), "query_id").join(cv, "corpus_id")
      .withColumn("cos", round(Similarity.cosine(col("qvec"), col("cvec")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id").asc)
    val ranked = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("query_id", "corpus_id", "cos", "rank")
    time("rank+collect") { ranked.orderBy("query_id", "rank").count() }
    time("full embed_knn_ivf (2nd run, warm)") {
      PipelineQueries.embedKnnIvf(spark, sfDir).count()
    }
    graft.ops.Materialize.clearCache()
    spark.stop()
  }
}
