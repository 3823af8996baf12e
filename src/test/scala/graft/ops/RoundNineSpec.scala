package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Behavior pins for the round-9 operators: KMV sketches, entity
  * resolution, interval sweep-line, MAD outliers, Kneser–Ney LM,
  * query-likelihood retrieval, mojibake audit, source KL. */
class RoundNineSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def table(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  // ------------------------------------------------------------- KMV
  test("kmv: sub-k groups are exact; pairwise matches exact set algebra on small sets") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", StringType)))
    // A = {x1..x6}, B = {x4..x9}: |A|=6, |B|=6, |A∪B|=9, |A∩B|=3
    val rows = ((1 to 6).map(i => Row("A", s"x$i")) ++
      (4 to 9).map(i => Row("B", s"x$i")) ++
      (1 to 6).map(i => Row("A", s"x$i"))) // duplicates must not matter
    val sk = Kmv.sketch(table(schema, rows: _*), "g", "v", k = 256)
    val est = Kmv.estimate(sk, "g", k = 256).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    est("A") shouldBe 6.0
    est("B") shouldBe 6.0
    val pw = Kmv.pairwise(sk, "g", k = 256).collect()
    pw.length shouldBe 1
    val p = pw.head
    p.getAs[Double]("union_approx") shouldBe 9.0
    p.getAs[Double]("intersect_approx") shouldBe 3.0 +- 1e-9
    p.getAs[Double]("jaccard_approx") shouldBe 0.333333 // round(3/9, 6)
  }

  test("kmv: estimate within 15% on a 10k-distinct group at k=256") {
    val d = spark.range(10000).selectExpr("'G' AS g", "CAST(id AS STRING) AS v")
    val est = Kmv.estimate(Kmv.sketch(d, "g", "v", k = 256), "g", k = 256)
      .collect().head.getDouble(1)
    est shouldBe 10000.0 +- 1500.0
  }

  // ------------------------------------------- entity resolution
  private val partSchema = StructType(Seq(
    StructField("p_partkey", LongType), StructField("p_name", StringType),
    StructField("p_brand", StringType), StructField("p_type", StringType),
    StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))

  test("linkage: same noun+type+brand+adjective matches; different noun never pairs") {
    val parts = table(partSchema,
      Row(1L, "red widget", "B1", "ECONOMY", 10, 100.0),
      Row(2L, "red widget", "B1", "ECONOMY", 12, 110.0), // match with 1 (Δsize 2)
      Row(3L, "red widget", "B2", "ECONOMY", 10, 120.0), // brand differs → 0.7 < 0.9
      Row(4L, "red gizmo", "B1", "ECONOMY", 10, 100.0))  // other noun: never a candidate
    val pairs = Linkage.candidatePairs(parts).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    // score = 0.9 + 0.1·(1 − 2/50)
    pairs.head.getDouble(2) shouldBe 0.996
    val ents = Linkage.entities(parts).collect()
    ents.length shouldBe 1
    ents.head.getAs[Long]("entity") shouldBe 1L
    ents.head.getAs[Long]("n_members") shouldBe 2L
    ents.head.getAs[Double]("price_spread") shouldBe 10.0
  }

  test("linkage: transitive closure chains matches into one entity") {
    // 1-2 share size block, 2-3 share brand block; 1-3 in no block together
    val parts = table(partSchema,
      Row(1L, "red widget", "B1", "T", 10, 100.0),
      Row(2L, "red widget", "B1", "T", 10, 105.0),
      Row(3L, "red widget", "B1", "T", 30, 120.0))
    val ents = Linkage.entities(parts).collect()
    ents.length shouldBe 1
    ents.head.getAs[Long]("n_members") shouldBe 3L
  }

  test("kmv merge: per-slice sketches fold to EXACTLY the full-corpus sketch") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", StringType)))
    val rows = (1 to 900).map(i => Row(if (i % 3 == 0) "A" else "B", s"val$i"))
    val full = table(schema, rows: _*)
    val s1 = Kmv.sketch(full.filter(md5(col("v")).startsWith("0") ||
      md5(col("v")) >= "8"), "g", "v", k = 64)
    val s2 = Kmv.sketch(full.filter(!(md5(col("v")).startsWith("0") ||
      md5(col("v")) >= "8")), "g", "v", k = 64)
    val merged = Kmv.merge(s1, s2, "g", k = 64)
      .select("g", "u").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val direct = Kmv.sketch(full, "g", "v", k = 64)
      .select("g", "u").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    merged shouldBe direct
  }

  // ------------------------------------------------- modularity
  test("modularity: hand-computed contributions on a two-community graph") {
    val pairSchema = StructType(Seq(
      StructField("id_a", LongType), StructField("id_b", LongType)))
    val partSchema2 = StructType(Seq(
      StructField("node", LongType), StructField("comm", StringType)))
    // triangle {1,2,3} in c1, edge {4,5} in c2, one cross edge 3-4; m=5
    val pairs = table(pairSchema,
      Row(1L, 2L), Row(2L, 3L), Row(1L, 3L), Row(4L, 5L), Row(3L, 4L))
    val part = table(partSchema2,
      Row(1L, "c1"), Row(2L, "c1"), Row(3L, "c1"), Row(4L, "c2"), Row(5L, "c2"))
    val out = Cluster.modularity(pairs, part, "node", "comm").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("intra_edges"), r.getAs[Long]("degree_sum"),
          r.getAs[Double]("contribution"))).toMap
    // c1: intra 3, degrees 2+2+3=7 → 3/5 − (7/10)² = 0.11
    out("c1") shouldBe ((3L, 7L, 0.11))
    // c2: intra 1, degrees 2+1=3 → 1/5 − (3/10)² = 0.11
    out("c2") shouldBe ((1L, 3L, 0.11))
  }

  // ------------------------------------------------- interval sweep
  private val ivSchema = StructType(Seq(
    StructField("s", TimestampType), StructField("e", TimestampType)))
  private def ts(x: String) = java.sql.Timestamp.valueOf(x)

  test("intervals: overlap, back-to-back, cross-day split and zero-length all sweep correctly") {
    val iv = table(ivSchema,
      Row(ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      Row(ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")), // overlaps → peak 2
      Row(ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")), // back-to-back: no double count
      Row(ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")), // crosses midnight
      Row(ts("2024-01-02 05:00:00"), ts("2024-01-02 05:00:00"))) // zero-length: nothing
    val out = Intervals.dailyCoverage(iv, "s", "e").orderBy("day").collect()
    out.length shouldBe 2
    val d1 = out(0); val d2 = out(1)
    d1.getAs[Long]("peak_concurrency") shouldBe 2L
    // 10:00–13:00 contiguous (3 h) + 23:00–24:00 (1 h)
    d1.getAs[Double]("covered_sec") shouldBe 4 * 3600.0
    d1.getAs[Long]("n_starts") shouldBe 4L
    d2.getAs[Long]("peak_concurrency") shouldBe 1L
    d2.getAs[Double]("covered_sec") shouldBe 3600.0 // 00:00–01:00
    d2.getAs[Long]("n_starts") shouldBe 1L
  }

  // ------------------------------------------------- MAD outliers
  test("madOutliers: hand-computed median/MAD and Hampel flags") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))
    // values 1..9 plus outlier 100: median 5.5, deviations |v−5.5|
    val rows = ((1 to 9).map(i => Row("a", i.toDouble)) :+ Row("a", 100.0))
    val out = Quantile.madOutliers(table(schema, rows: _*), "k", "v").collect().head
    out.getAs[Double]("median") shouldBe 5.5
    // deviations: 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,94.5 → median 2.5
    out.getAs[Double]("mad") shouldBe 2.5
    // threshold 3·1.4826·2.5 = 11.1195 → only 100 flagged
    out.getAs[Long]("n_outliers") shouldBe 1L
    out.getAs[Long]("n") shouldBe 10L
  }

  // ------------------------------------------------- Kneser–Ney LM
  test("knScore: matches the closed-form KN probability on a tiny corpus") {
    val d = spark.createDataFrame(Seq(
      Row(1L, "a b a b"), Row(2L, "a c")).asJava,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    // bigrams: doc1 = [a b, b a, a b]; doc2 = [a c]
    // counts: c(a b)=2, c(b a)=1, c(a c)=1; c(a·)=3, c(b·)=1
    // N1+(a·)=2, N1+(b·)=1; N1+(·b)=1, N1+(·a)=1, N1+(·c)=1; B=3
    def pkn(cb: Double, cu: Double, fwd: Double, bwd: Double): Double =
      (cb - 0.75) / cu + 0.75 * fwd / cu * (bwd / 3.0)
    val pab = pkn(2, 3, 2, 1); val pba = pkn(1, 1, 1, 1); val pac = pkn(1, 3, 2, 1)
    val exp1 = BigDecimal(-(math.log(pab) * 2 + math.log(pba)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(-math.log(pac))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = TextAnalysis.knScore(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("nll_kn")).toMap
    out(1L) shouldBe exp1
    out(2L) shouldBe exp2
  }

  // ------------------------------------------------- query likelihood
  test("queryLikelihood: docs containing the terms outrank docs without") {
    val d = spark.createDataFrame(Seq(
      Row(1L, "spark query table spark"), Row(2L, "spark runs fast"),
      Row(3L, "nothing relevant here at all")).asJava,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val out = Retrieval.queryLikelihood(d, "doc_id", "text",
      Seq("spark", "query", "table"), topK = 3).collect()
    out.map(_.getLong(0)).head shouldBe 1L
    val scores = out.map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    scores(1L) should be > scores(2L)
    scores(2L) should be > scores(3L)
  }

  // ------------------------------------------------- mojibake
  test("mojibake: artifacts, replacement and control chars flag; clean text doesn't") {
    val d = spark.createDataFrame(Seq(
      Row(1L, "clean plain ascii text"),
      Row(2L, "bad Ã© artifact â€” here"),
      Row(3L, "lost � byte and ctrl  char")).asJava,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val out = TextAnalysis.mojibakeSignals(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Boolean]("suspect") shouldBe false
    out(1L).getAs[Long]("n_artifacts") shouldBe 0L
    out(2L).getAs[Long]("n_artifacts") shouldBe 2L
    out(2L).getAs[Boolean]("suspect") shouldBe true
    out(3L).getAs[Long]("n_replacement") shouldBe 1L
    out(3L).getAs[Long]("n_control") shouldBe 1L
    out(3L).getAs[Boolean]("suspect") shouldBe true
  }

  // ------------------------------------------------- source KL
  test("sourceKl: identical sources diverge ~0; a skewed source diverges more") {
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("text", StringType)))
    val d = table(schema,
      Row("s1", "a b c d a b c d"), Row("s2", "a b c d a b c d"),
      Row("s3", "z z z z z z z z"))
    val out = TextAnalysis.sourceKlDivergence(d).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("kl_vs_corpus")).toMap
    out("s1") shouldBe out("s2")
    out("s3") should be > out("s1")
    out("s3") should be > 0.1
  }
}
