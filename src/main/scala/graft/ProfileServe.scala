package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: component timing of the PERSISTED-ANN serving paths at
  * the vector soak's 10× shape (160k vectors, 640 cells) — the
  * overhead-breakdown half of the IVFADC/brute crossover question (the
  * composed serve was 5.97 s vs brute 4.74 s at 160k in SOAK_r15; which
  * fixed costs dominate?). Not part of the engine surface. */
object ProfileServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[serve] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    // the ScaleSoak stage-22 corpus at replicas=10: 80 perturbed
    // replicas of sf0.1's 2k embeddings = 160k vectors, 640 cells
    val vreplicas = args.drop(1).headOption.map(_.toInt).getOrElse(80)
    val embBase = Tables.load(spark, sfDir, "embeddings")
    val maxVec = embBase.agg(max("vec_id")).head().getLong(0) + 1
    val embScaled = (0 until vreplicas).map { i =>
      val rot = (i % 63) + 1
      val eps = 0.05 * i / vreplicas
      embBase.select((col("vec_id") + lit(i.toLong * maxVec)).as("vec_id"),
        (if (i == 0) expr("transform(embedding, x -> cast(x AS double))")
         else expr(
          s"zip_with(embedding, concat(slice(embedding, ${rot + 1}, ${64 - rot}), slice(embedding, 1, $rot)), " +
            s"(a, b) -> cast(a AS double) + ${eps}D * cast(b AS double))"))
          .as("embedding"))
    }.reduce(_ unionAll _)
    val corpus = graft.ops.Materialize.index(embScaled, "profserve-corpus")
    val nCells = 8 * vreplicas
    val ivfRoot = graft.ops.Materialize.scratchDir("profserve-ivf")
    val pqRoot = graft.ops.Materialize.scratchDir("profserve-pq")
    time("corpus count") { corpus.count() }
    time("bootstrap ivf") {
      graft.ops.AnnIndex.bootstrap(corpus, "vec_id", "embedding", nCells,
        ivfRoot, targetRowsPerFile = 4000)
    }
    time("bootstrap pq") {
      graft.ops.AnnIndex.bootstrapPq(corpus, "vec_id", "embedding", pqRoot)
    }
    val queries = graft.ops.Materialize.index(
      embScaled.filter(col("vec_id") < 16), "profserve-queries")
    time("queries count") { queries.count() }

    // component costs, twice each (cold then warm — the witness-parse
    // cache and FS caches show up in the second pass)
    (1 to 2).foreach { pass =>
      time(s"pass$pass readCentroids collect") {
        graft.ops.AnnIndex.readCentroids(spark, ivfRoot).collect().length
      }
      time(s"pass$pass readCodebooks collect") {
        graft.ops.AnnIndex.readCodebooks(spark, pqRoot).collect().length
      }
      time(s"pass$pass readCodes count") {
        graft.ops.AnnIndex.readCodes(spark, pqRoot).count()
      }
      time(s"pass$pass readCells(all) count") {
        graft.ops.AnnIndex.readCells(spark, ivfRoot).count()
      }
      time(s"pass$pass probeFileCounts") {
        graft.ops.AnnIndex.probeFileCounts(
          spark, ivfRoot, queries, "vec_id", "embedding", nprobe = 4)
      }
      time(s"pass$pass ivf topK collect") {
        graft.ops.AnnIndex.topK(
          corpus, queries, "vec_id", "embedding", k = 5, ivfRoot, nprobe = 4)
          .collect().length
      }
      time(s"pass$pass ivfadc topK collect") {
        graft.ops.AnnIndex.ivfadcTopK(
          corpus, queries, "vec_id", "embedding", k = 5,
          ivfRoot, pqRoot, nprobe = 4, shortlist = 200)
          .collect().length
      }
      time(s"pass$pass brute topK collect") {
        val qv = queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qvec"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("cos").desc, col("corpus_id").asc)
        corpus
          .select(col("vec_id").as("corpus_id"), col("embedding").as("cvec"))
          .join(broadcast(qv))
          .filter(col("query_id") =!= col("corpus_id"))
          .withColumn("cos",
            round(graft.ops.Similarity.cosine(col("qvec"), col("cvec")), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .collect().length
      }
    }
    graft.ops.Materialize.clearCache()
    spark.stop()
  }
}
