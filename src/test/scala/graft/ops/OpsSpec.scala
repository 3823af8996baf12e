package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Behavior tests for the training-data-pipeline operators. */
class OpsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(rows.map { case (i, t) => Row(i, t) }.asJava, schema)
  }

  test("exact dedup groups identical texts under one keeper") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val g = Dedup.exactGroups(d, "doc_id", "text").collect()
    g.length shouldBe 2
    val dup = g.find(_.getAs[Long]("copies") == 2L).get
    dup.getAs[Long]("keeper") shouldBe 1L
  }

  test("substring novelty: verbatim re-emission owns nothing; fresh content owns all") {
    val d = docs(
      (1L, "a b c d e f g h i j"),   // 3 distinct 8-grams, owns all
      (2L, "a b c d e f g h i j"),   // verbatim copy — owns none
      (3L, "q r s t u v w x y z"))   // disjoint — owns all
    val out = Dedup.substringNovelty(d, "doc_id", "text", shingleWords = 8, keepAt = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_owned"),
          r.getAs[Double]("novelty"), r.getAs[Boolean]("keep"))).toMap
    out(1L) shouldBe ((3L, 3L, 1.0, true))
    out(2L) shouldBe ((3L, 0L, 0.0, false))
    out(3L) shouldBe ((3L, 3L, 1.0, true))
  }

  test("substring novelty catches the mosaic dup pairwise jaccard misses") {
    // doc 4 stitches together halves of docs 1 and 2. Its 4-grams: 13
    // total, 5 owned by doc 1's prefix, 5 by doc 2's prefix, and only the
    // 3 straddling the stitch boundary are genuinely novel → novelty
    // 3/13 ≈ 0.23, dropped — even though against EITHER single source the
    // pairwise overlap is only half and a pair-threshold dedup keeps it.
    val d = docs(
      (1L, "a b c d e f g h i j k l"),
      (2L, "m n o p q r s t u v w x"),
      (4L, "a b c d e f g h m n o p q r s t"))
    val out = Dedup.substringNovelty(d, "doc_id", "text", shingleWords = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("novelty"), r.getAs[Boolean]("keep"))).toMap
    out(1L) shouldBe ((1.0, true))
    out(2L) shouldBe ((1.0, true))
    out(4L) shouldBe ((0.2308, false))
  }

  test("bigram lm score: hand-computed add-k likelihoods on a tiny corpus") {
    val d = docs((1L, "a b"), (2L, "a b"), (3L, "a c"))
    // bigrams: "a b"=2, "a c"=1; prefix counts c(a·)=3; vocab V=1; a=0.5
    // doc1/doc2: nll = -ln((2+.5)/(3+.5)) = ln(3.5/2.5) = 0.3365
    // doc3:      nll = -ln((1+.5)/(3+.5)) = ln(3.5/1.5) = 0.8473
    val out = TextAnalysis.lmScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("nll"))).toMap
    out(1L) shouldBe ((1L, 0.3365))
    out(2L) shouldBe ((1L, 0.3365))
    out(3L) shouldBe ((1L, 0.8473))
  }

  test("line dedup removes corpus-wide boilerplate, preserves order, keeps unique lines") {
    // 3-word "lines"; docs 1 and 2 share a boilerplate line in different
    // positions — it must vanish from BOTH docs while the unique content
    // survives in original order. Doc 3 is entirely unique.
    val d = docs(
      (1L, "copy right footer alpha beta gamma"),
      (2L, "delta epsilon zeta copy right footer"),
      (3L, "eta theta iota kappa lambda mu"))
    val out = Dedup.lineDedup(d, "doc_id", "text", blockWords = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("text_clean"))).toMap
    out(1L) shouldBe ((2L, 1L, "alpha beta gamma"))
    out(2L) shouldBe ((2L, 1L, "delta epsilon zeta"))
    out(3L) shouldBe ((2L, 2L, "eta theta iota kappa lambda mu"))
  }

  test("repetition signals: looping doc fails, diverse doc passes, hand-computed fractions") {
    // doc 1 loops "spam ham": 2-grams of 6 words = 5 grams, distinct 2
    // ("spam ham", "ham spam") → dup2 = 3/5 = 0.6; top gram "spam ham"
    // occurs 3× → top2 = 0.6. Doc 2 has all-distinct grams.
    val d = docs(
      (1L, "spam ham spam ham spam ham"),
      (2L, "one two three four five six"))
    val out = TextAnalysis.repetitionSignals(d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup2_frac"), r.getAs[Double]("top2_share"),
          r.getAs[Boolean]("keep"))).toMap
    out(1L) shouldBe ((0.6, 0.6, false))
    out(2L) shouldBe ((0.0, 0.2, true))
  }

  test("naive bayes recovers a separable labeling, scores held-out docs") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("cat", StringType)))
    // ids 0-7 train (doc_id % 10 < 8); 8 and 9 are held out and carry
    // deliberately WRONG labels — the classifier must predict from text,
    // so hit=false for both proves the train/score separation.
    val d = spark.createDataFrame(Seq(
      Row(0L, "alpha beta gamma beta", "let"),
      Row(1L, "alpha gamma delta beta", "let"),
      Row(2L, "beta alpha alpha gamma", "let"),
      Row(3L, "gamma delta alpha beta", "let"),
      Row(4L, "one two three two", "num"),
      Row(5L, "two three four one", "num"),
      Row(6L, "three one one four", "num"),
      Row(7L, "four two one three", "num"),
      Row(8L, "alpha beta gamma delta", "num"),
      Row(9L, "one two three four", "let")).asJava, schema)
    val out = Classify.naiveBayes(d, "doc_id", "cat", "text",
      trainFilter = col("doc_id") % 10 < 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("pred_cat"), r.getAs[Boolean]("hit"))).toMap
    out.size shouldBe 10 // every doc scored, including the training slice
    (0L to 3L).foreach { i => out(i) shouldBe (("let", true)) }
    (4L to 7L).foreach { i => out(i) shouldBe (("num", true)) }
    out(8L) shouldBe (("let", false))
    out(9L) shouldBe (("num", false))
  }

  test("logisticGd: zero rounds score 0.5 flat; 3 rounds separate a separable feature") {
    import spark.implicits._
    // balanced classes, y determined by x1 with a clean margin
    val f = (1L to 40L).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      val x1 = (if (y == 1.0) 0.8 else 0.2) + (i % 5) * 0.01
      (i, 1.0, x1, y)
    }.toDF("id", "x0", "x1", "y")
    val flat = Classify.logisticGd(f, "id", dims = 2, rounds = 0)
      .collect().map(_.getDouble(2)).toSet
    flat shouldBe Set(0.5) // untrained hard sigmoid at w = 0
    val got = Classify.logisticGd(f, "id", dims = 2, rounds = 3, lr = 1.0)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val pos = got.filter(_._1 == 1.0).map(_._2)
    val neg = got.filter(_._1 == 0.0).map(_._2)
    pos.min should be > neg.max // the learned weight orders the classes
    pos.foreach(s => s should (be >= 0.0 and be <= 1.0))
  }

  test("aucEval: hand-counted pairs, half credit for ties") {
    import spark.implicits._
    // pos {0.9, 0.5}, neg {0.5, 0.1}: 3 wins + 1 tie of 4 pairs → 0.875
    val scored = Seq((0.9, 1.0), (0.5, 1.0), (0.5, 0.0), (0.1, 0.0))
      .toDF("score", "y")
    val r = Classify.aucEval(scored, "score", "y").collect().head
    (r.getDouble(0), r.getLong(1), r.getLong(2)) shouldBe ((0.875, 2L, 2L))
    // perfect separation → 1.0; inverted → 0.0
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0)).toDF("score", "y")
    Classify.aucEval(perfect, "score", "y").collect().head.getDouble(0) shouldBe 1.0
    val inverted = Seq((0.1, 1.0), (0.8, 0.0)).toDF("score", "y")
    Classify.aucEval(inverted, "score", "y").collect().head.getDouble(0) shouldBe 0.0
  }

  test("calibrationBins: decile edges, score 1.0 folds into bin 9, exact means") {
    import spark.implicits._
    val scored = Seq((0.05, 0.0), (0.05, 1.0), (0.95, 1.0), (1.0, 1.0))
      .toDF("score", "y")
    val got = Classify.calibrationBins(scored, "score", "y")
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    got shouldBe Map(
      0L -> ((2L, 0.05, 0.5)),
      9L -> ((2L, 0.975, 1.0)))
  }

  test("f1Sweep: hand-computed optimal threshold with counts") {
    import spark.implicits._
    // pos {0.9, 0.7}, neg {0.8, 0.1}: t=0.7 → tp2 fp1 fn0, F1 0.8 — the max
    val scored = Seq((0.9, 1.0), (0.7, 1.0), (0.8, 0.0), (0.1, 0.0))
      .toDF("score", "y")
    val r = Classify.f1Sweep(scored, "score", "y").collect().head
    r.getDouble(0) shouldBe 0.7
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((2L, 1L, 0L))
    r.getDouble(4) shouldBe 0.666667
    r.getDouble(5) shouldBe 1.0
    r.getDouble(6) shouldBe 0.8
  }

  test("dsir weights: target-domain docs score positive, general model matches lmScore") {
    // two "domains": letter-ish docs (target) vs number-ish docs. A doc
    // from the target domain must look more like the target LM than the
    // general one (log_weight > 0) and vice versa; and scoring against
    // the full-corpus model must reproduce lmScore's nll bit-for-bit.
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    val d = spark.createDataFrame(Seq(
      Row(1L, "alpha beta gamma alpha beta", "tgt"),
      Row(2L, "alpha beta gamma delta beta", "tgt"),
      Row(3L, "one two three one two", "gen"),
      Row(4L, "one two three four two", "gen")).asJava, schema)
    val out = TextAnalysis.dsirWeights(d, col("source") === "tgt").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("nll_gen"), r.getAs[Double]("log_weight"))).toMap
    out(1L)._2 should be > 0.0
    out(2L)._2 should be > 0.0
    out(3L)._2 should be < 0.0
    out(4L)._2 should be < 0.0
    val base = TextAnalysis.lmScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    out.foreach { case (id, (nllGen, _)) => nllGen shouldBe base(id) }
  }

  test("corpus cells: one cell per vector, agrees with semanticDedup's blocking") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cells = Similarity.corpusCells(emb, "vec_id", "embedding", numCentroids = 8)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    cells.size.toLong shouldBe emb.count() // a partition: every vector, once
    cells.values.foreach { c => c should (be >= 0 and be < 8) }
    cells.values.toSet.size should be > 1 // non-degenerate clustering
    val dedupCells = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.35, numCentroids = 8).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    cells shouldBe dedupCells
  }

  test("hard negatives: never the query's own label, ranked by similarity") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val labels = emb.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val out = Similarity.hardNegatives(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", "label", k = 5)
      .collect()
    out.length shouldBe 5 * 5
    out.foreach { r =>
      val q = r.getAs[Long]("query_id")
      r.getAs[Int]("clabel") should not be labels(q)
      r.getAs[Int]("qlabel") shouldBe labels(q)
    }
    // per query: ranks 1..5 with non-increasing cosine
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      sorted.map(_.getAs[Long]("rank")) shouldBe Array(1L, 2L, 3L, 4L, 5L)
      sorted.map(_.getAs[Double]("cos")).sliding(2).foreach {
        case Array(a, b) => a should be >= b
        case _ =>
      }
    }
  }

  test("kmeans refine: membership is conserved, shifts are finite and non-negative") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    val out = Similarity.kmeansRefine(emb, "vec_id", "embedding", numCentroids = 8)
      .collect()
    out.length shouldBe 8
    // every vector is assigned exactly once, before AND after the update
    out.map(_.getAs[Long]("n_before")).sum shouldBe n
    out.map(_.getAs[Long]("n_after")).sum shouldBe n
    out.foreach { r =>
      val s = r.getAs[Double]("shift")
      s should be >= 0.0
      java.lang.Double.isFinite(s) shouldBe true
    }
    // seeded centroids are not already the Lloyd fixed point on real data
    out.map(_.getAs[Double]("shift")).max should be > 0.0
    Materialize.dropAll()
  }

  test("minhash signatures are identical for identical docs, mostly differ otherwise") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different text with other words entirely here"))
    val sigs = Dedup.minhashSignatures(d, "text", numHashes = 4)
      .orderBy("doc_id").collect()
    (0 until 4).foreach { i =>
      sigs(0).getAs[String](s"h$i") shouldBe sigs(1).getAs[String](s"h$i")
    }
    (0 until 4).count(i =>
      sigs(0).getAs[String](s"h$i") == sigs(2).getAs[String](s"h$i")) should be < 2
  }

  test("lsh candidate pairs surface dups and the jaccard verify filters") {
    // identical docs hash to identical signatures → guaranteed same bands
    // (near-dup recall is probabilistic in the salts; don't pin it in a test)
    val d = docs(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val sigs = Dedup.minhashSignatures(d, "text", numHashes = 4)
    val bands = Dedup.lshBands(sigs, 4, 2)
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id", 2)
    val verified = Dedup.verifyPairs(pairs, d, "doc_id", "text", 0.5).collect()
    verified.map(r => (r.getLong(0), r.getLong(1))).toSet should contain((1L, 2L))
    verified.map(r => (r.getLong(0), r.getLong(1))).toSet should not contain ((1L, 3L))
    verified.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
      .get.getDouble(2) shouldBe 1.0
  }

  test("simhash: identical docs equal; near-dups within small hamming distance") {
    val d = docs(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val hs = Dedup.simhash16(d, "text").orderBy("doc_id").collect()
      .map(_.getAs[String]("simhash"))
    hs(0) shouldBe hs(1)
    hs(0).length shouldBe 16
    hs(0).count(c => c == '0' || c == '1') shouldBe 16
  }

  test("jaccard is exact on integer set sizes") {
    val d = docs((1L, "a b c d"), (2L, "a b x y"))
    val tok = d.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("t"))
    val a = tok.filter(col("doc_id") === 1).select(col("t").as("ta"))
    val b = tok.filter(col("doc_id") === 2).select(col("t").as("tb"))
    val j = a.crossJoin(b).select(Dedup.jaccard(col("ta"), col("tb")).as("j"))
      .collect().head.getDouble(0)
    j shouldBe (2.0 / 6.0)
  }

  test("cosine similarity: orthogonal → 0, identical → 1") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(1L, Seq(1.0f, 0.0f)), Row(2L, Seq(0.0f, 1.0f)), Row(3L, Seq(2.0f, 0.0f)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val l = df.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val r = df.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val cos = l.join(r, col("ia") < col("ib"))
      .select(col("ia"), col("ib"), round(Similarity.cosine(col("va"), col("vb")), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    cos((1L, 2L)) shouldBe 0.0
    cos((1L, 3L)) shouldBe 1.0
    cos((2L, 3L)) shouldBe 0.0
  }

  test("brute-force top-k returns k ranked neighbors per query") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val rows = (0L until 20L).map(i =>
      Row(i, Seq((i % 5).toFloat + 1f, ((i * 3) % 7).toFloat + 1f)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = Similarity.bruteForceTopK(df, df.filter(col("vec_id") < 2), "vec_id", "embedding", 3)
    val byQ = out.collect().groupBy(_.getAs[Long]("query_id"))
    byQ.keySet shouldBe Set(0L, 1L)
    byQ.values.foreach { rs =>
      rs.map(_.getAs[Int]("rank")).sorted.toSeq shouldBe Seq(1, 2, 3)
      rs.foreach(r => r.getAs[Long]("corpus_id") should not be r.getAs[Long]("query_id"))
    }
  }

  test("lsh bucket signature is deterministic across invocations") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("v", ArrayType(FloatType))))
    val rows = (0L until 8L).map(i => Row(i, Seq(i.toFloat - 3f, (i * 7 % 5).toFloat - 2f)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val b1 = df.select(col("vec_id"),
      Similarity.lshBucket(col("v"), dim = 2, numPlanes = 6).as("b")).collect()
    val b2 = df.select(col("vec_id"),
      Similarity.lshBucket(col("v"), dim = 2, numPlanes = 6).as("b")).collect()
    b1.map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      b2.map(r => r.getLong(0) -> r.getString(1)).toMap
    b1.foreach(_.getString(1).length shouldBe 6)
  }

  test("ivf ann: high recall vs brute force on the real embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      numCentroids = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate by design: require >= 40% overlap with exact top-5
    (ivf.intersect(brute).size.toDouble / brute.size) should be >= 0.4
    // every query produced results
    ivf.map(_._1) shouldBe Set(0L, 1L, 2L, 3L, 4L)
  }

  test("ivf centroid seed is executor-side: id-only sort, stride selection intact") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val seed = Similarity.seedCentroids(emb, "vec_id", "embedding", nc = 10)
    // selection semantics unchanged from the r5 driver collect (so the
    // DuckDB oracle is unmoved): sorted by id, every 7th, first nc
    val expected = emb.select("vec_id", "embedding").orderBy("vec_id").limit(70)
      .collect().zipWithIndex
      .collect { case (r, i) if i % 7 == 0 => (i / 7, r.getSeq[Float](1)) }
      .toMap
    val got = seed.collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    got.keySet shouldBe expected.keySet
    got.foreach { case (cid, v) => v shouldBe expected(cid) }
    // and the scale shape: the ordered prefix sorts ids ONLY (vectors are
    // pruned from the TakeOrdered), and nothing in the seed plan is a
    // driver-side collect of corpus data
    val plan = seed.queryExecution.executedPlan.toString
    val takeOrdered = plan.linesIterator.filter(_.contains("TakeOrderedAndProject")).toSeq
    takeOrdered should not be empty
    takeOrdered.foreach { line =>
      line should include("vec_id")
      (line should not).include("embedding") // vectors pruned from the sort
    }
    plan should not include "CollectLimit"
  }

  test("semantic dedup drops within-cell near-identicals, keeps the lowest id") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.35, numCentroids = 8)
    val rows = out.collect()
    rows.length shouldBe emb.count() // one verdict per vector
    val byId = rows.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Int]("cell"), Option(r.getAs[Any]("dup_of")), r.getAs[Boolean]("keep"))).toMap
    // keep ⇔ no dominator; every dominator is a lower id in the SAME cell
    byId.foreach { case (id, (cell, dupOf, keep)) =>
      keep shouldBe dupOf.isEmpty
      dupOf.foreach { d =>
        val dom = d.asInstanceOf[Long]
        dom should be < id
        byId(dom)._1 shouldBe cell
      }
    }
    // the threshold actually bites on this corpus (non-trivial both ways)
    rows.count(!_.getAs[Boolean]("keep")) should be > 0
    rows.count(_.getAs[Boolean]("keep")) should be > 0
  }

  test("ivf ann survives hundreds of centroids (broadcast join, no codegen literal blowup)") {
    // the auto-sized path wants √n centroids (√10⁹ ≈ 31k); the round-2
    // plan-literal construction died in janino around a few hundred. The
    // centroid-table broadcast join must not: 500 centroids over a
    // 4000-vector corpus completes and every query answers.
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val rows = (0L until 4000L).map { i =>
      val rnd = new scala.util.Random(i)
      Row(i, Seq.fill(8)(rnd.nextFloat() - 0.5f))
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = Similarity.ivfTopK(df, df.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5, numCentroids = 500, nprobe = 8)
    val byQ = out.collect().groupBy(_.getAs[Long]("query_id"))
    byQ.keySet shouldBe Set(0L, 1L, 2L)
    byQ.values.foreach(_.length should be <= 5)
  }

  test("multi-band lsh ann: recall vs brute force pinned on the real embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", dim = 64, k = 5,
      numPlanes = 3, numBands = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // OR-amplified banding is approximate by design; pin the floor
    // (6 bands × 3 planes measured 0.8 over the full query set)
    (lsh.intersect(brute).size.toDouble / brute.size) should be >= 0.6
    lsh.map(_._1) shouldBe Set(0L, 1L, 2L, 3L, 4L)
  }

  test("bucket caps bound candidate fan-out deterministically") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    // cap of 1: at most numBands distinct candidates can surface per query
    val capped = Similarity.lshTopK(emb, queries, "vec_id", "embedding", dim = 64, k = 5,
      numPlanes = 2, numBands = 2, bucketCap = 1)
    capped.groupBy("query_id").count().collect()
      .foreach(_.getLong(1) should be <= 2L)
  }

  test("auto-sizing scales buckets/cells with corpus size (100 TB shape)") {
    // planes grow logarithmically so bucket occupancy stays ~constant
    Similarity.autoPlanes(1000, targetPerBucket = 1024) shouldBe 4 // floor
    Similarity.autoPlanes(1L << 20, targetPerBucket = 1024) shouldBe 10
    Similarity.autoPlanes(1L << 30, targetPerBucket = 1024) shouldBe 20
    // centroids grow ~√n so cell count and cell population balance
    Similarity.autoCentroids(10000) shouldBe 100
    Similarity.autoCentroids(100000000L) shouldBe 10000
    // defaults engage auto-sizing (numPlanes/numCentroids = 0 sentinels)
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", 3) // 500 vectors → 23 centroids via √n
    out.collect().map(_.getLong(0)).toSet shouldBe Set(0L, 1L)
  }

  test("materialized indexes are reclaimed after the terminal action (no disk leak)") {
    Materialize.clearCache() // clean slate from earlier suites
    Materialize.liveCount shouldBe 0
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // two index-writing queries back to back, as a battery would run them
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      dim = 64, k = 3, numPlanes = 3, numBands = 2).count()
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 3, numCentroids = 8).count()
    Materialize.liveCount should be > 0 // indexes exist while results are live
    Materialize.dropAll()
    // cached (reusable) indexes survive the per-query reclaim, bounded by
    // the LRU cap; the full battery-end cleanup removes everything
    Materialize.liveCount should be <= Materialize.CacheMaxEntries
    Materialize.clearCache()
    Materialize.liveCount shouldBe 0 // and are gone after the battery reclaims
  }

  test("language id picks the lexicon with most overlap") {
    val d = docs((1L, "the cat and the dog of the house"), (2L, "el gato y la casa de que"))
    val out = TextAnalysis.langScores(d, "text").orderBy("doc_id").collect()
    out(0).getAs[String]("pred_lang") shouldBe "en"
    out(1).getAs[String]("pred_lang") shouldBe "es"
  }

  test("quality stats compute exact word counts and ratios") {
    val d = docs((1L, "a b a b"))
    val r = TextAnalysis.qualityStats(d, "text").collect().head
    r.getAs[Int]("n_words") shouldBe 4
    r.getAs[Int]("n_distinct_words") shouldBe 2
    r.getAs[Double]("distinct_ratio") shouldBe 0.5
  }

  test("resize stub: meta rewritten to target dims, payload scaled by area ratio, capped") {
    import graft.ops.Multimodal
    val d = docs((100L, "x" * 100), (1L, "y" * 10))
    val assets = Multimodal.assetsFromText(d, "doc_id", "text")
    val out = Multimodal.fakeResize(assets, 320, 240).orderBy("asset_id").collect()
    val bySize = out.map(r => r.getLong(0) ->
      (r.getStruct(2).getAs[Long]("n_bytes"), r.getStruct(2).getAs[Int]("width"),
        r.getStruct(2).getAs[Int]("height"), r.getAs[Array[Byte]]("resized_content").length)).toMap
    // id=100: src dims 101×101 → area ratio 76800/10201 > 1 → capped at original
    bySize(100L) shouldBe ((100L, 320, 240, 100))
    // id=1: src dims 2×2 → ratio 19200 → also capped (upscale never grows payload)
    bySize(1L) shouldBe ((10L, 320, 240, 10))
    // a genuinely large source shrinks: dims 401×401 over 76800 → ceil(100 × 0.4776...)
    val big = Multimodal.fakeResize(
      Multimodal.assetsFromText(docs((400L, "z" * 100)), "doc_id", "text"), 320, 240)
      .collect().head
    val expect = math.ceil(100 * 76800.0 / (401.0 * 401.0)).toLong
    big.getStruct(2).getAs[Long]("n_bytes") shouldBe expect
    big.getAs[Array[Byte]]("resized_content").length.toLong shouldBe expect
  }

  test("chunking: overlapping windows cover the document; no boundary loss") {
    val text = "abcdefghij" * 5 // 50 chars
    val d = docs((1L, text), (2L, "short"))
    val out = TextAnalysis.chunk(d, "text", size = 20, stride = 15)
      .orderBy("doc_id", "chunk_idx").collect()
    val doc1 = out.filter(_.getLong(0) == 1L).map(_.getAs[String]("chunk"))
    // starts 0,15,30,45 → 4 chunks; last one is the 5-char tail
    doc1.length shouldBe 4
    doc1.head shouldBe text.substring(0, 20)
    doc1.last shouldBe text.substring(45)
    // consecutive chunks overlap by size - stride = 5 chars
    doc1(0).takeRight(5) shouldBe doc1(1).take(5)
    // every char of the doc appears in some chunk at its own offset
    doc1.zipWithIndex.flatMap { case (c, i) => c.zipWithIndex.map { case (ch, j) => (i * 15 + j, ch) } }
      .distinct.sortBy(_._1).map(_._2).mkString shouldBe text
    // a doc shorter than one chunk yields exactly itself
    out.filter(_.getLong(0) == 2L).map(_.getAs[String]("chunk")).toSeq shouldBe Seq("short")
  }

  test("multimodal: asset schema, stub decode, frame sampling and explode") {
    val d = docs((1L, "x" * 300), (2L, "y" * 100))
    val assets = Multimodal.assetsFromText(d, "doc_id", "text")
    assets.schema("content").dataType shouldBe BinaryType
    assets.schema("meta").dataType.isInstanceOf[StructType] shouldBe true
    val feats = Multimodal.fakeDecodeFeatures(assets).collect()
    feats.foreach { r =>
      r.getAs[String]("content_md5").length shouldBe 32
      r.getAs[Seq[Double]]("fake_embedding").length shouldBe 4
    }
    val frames = Multimodal.frameTable(Multimodal.sampleFrames(assets, 128, 2))
    val f1 = frames.filter(col("asset_id") === 1).collect()
    // 300 bytes / 128 = 3 frames (0,1,2); stride 2 keeps frames 0 and 2
    f1.map(_.getAs[Int]("frame_no")).sorted.toSeq shouldBe Seq(0, 2)
  }

  test("fingerprints: sketch stable under identical content") {
    val d = docs((1L, "one two three four five"), (2L, "one two three four five"))
    val fp = TextAnalysis.fingerprints(d, "text").collect()
    fp(0).getAs[String]("sketch") shouldBe fp(1).getAs[String]("sketch")
    fp(0).getAs[String]("md5_fp") shouldBe fp(1).getAs[String]("md5_fp")
  }

  test("contamination: verbatim benchmark copy flags; disjoint doc survives at zero") {
    val bench = docs((100L, "alpha beta gamma delta epsilon"))
    val train = docs(
      (1L, "alpha beta gamma delta epsilon"), // verbatim leak → ratio 1.0
      (2L, "alpha beta gamma zeta eta theta"), // shares exactly gram "alpha beta gamma"
      (3L, "one two three four five six"))    // no overlap — must still appear
    val out = TextAnalysis.contamination(train, bench)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("overlap_ratio"),
          r.getAs[Boolean]("contaminated"))).toMap
    out(1L) shouldBe ((3L, 1.0, true))
    out(2L)._1 shouldBe 1L
    out(3L) shouldBe ((0L, 0.0, false))
    out.size shouldBe 3
  }

  test("contamination plan: benchmark gram side broadcasts") {
    val bench = docs((100L, "alpha beta gamma delta epsilon"))
    val train = docs((1L, "one two three"))
    val plan = TextAnalysis.contamination(train, bench)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("gopher signals: hand-computed values on a known document") {
    val d = docs((1L, "the cat sat on the mat"))
    val r = TextAnalysis.gopherSignals(d).collect().head
    r.getAs[Long]("n_words") shouldBe 6L
    // (22 chars - 6 words + 1) / 6
    r.getAs[Double]("mean_word_len") shouldBe 2.8333
    r.getAs[Double]("stop_frac") shouldBe 0.3333   // "the" twice
    r.getAs[Double]("symbol_ratio") shouldBe 0.0
    r.getAs[Double]("max_tok_frac") shouldBe 0.3333
    r.getAs[Boolean]("passes") shouldBe false      // too short
  }

  test("pq codes: in-range codes; adc correlates with truth; rerank dominates pure adc") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val codes = Similarity.pqCodes(emb, "vec_id", "embedding").collect()
    codes.length.toLong shouldBe emb.count()
    codes.foreach { r =>
      (0 until 4).foreach { j =>
        r.getAs[Int](s"c$j") should (be >= 0 and be < 8)
      }
    }
    // The quantization contract on near-random data (where distance
    // concentration makes ANY compressed top-5 unstable) is NOT exact
    // recall — it is (a) ADC distances correlate positively with true
    // distances, and (b) the shortlist+rerank composition dominates the
    // pure ADC ranking. The vectors here are unit-norm, so exact-cosine
    // top-k ≡ exact-L2 top-k and bruteForceTopK is a fair referee.
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val adcRecall = recallOf(Similarity.pqTopK(emb, q, "vec_id", "embedding", 5))
    val rerankRecall = recallOf(
      Similarity.pqTopKRerank(emb, q, "vec_id", "embedding", 5, shortlist = 50))
    rerankRecall should be >= adcRecall
    rerankRecall should be >= 0.2
    // (a): pearson over all (query, corpus) pairs between the ADC
    // distance and the true squared-L2 distance
    val ad = Similarity.pqTopK(emb, q, "vec_id", "embedding", Int.MaxValue)
      .select("query_id", "corpus_id", "adist")
    val tru = Similarity.pqTopKRerank(emb, q, "vec_id", "embedding",
      Int.MaxValue, shortlist = Int.MaxValue)
      .select("query_id", "corpus_id", "d2")
    val r = ad.join(tru, Seq("query_id", "corpus_id"))
      .agg(corr(col("adist"), col("d2"))).head.getDouble(0)
    r should be > 0.15
  }

  test("ivfadc: results come from probed cells, ranks follow exact distance, no smj") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val res = Similarity.ivfadcTopK(emb, q, "vec_id", "embedding",
      kNeighbors = 5, numCentroids = 8, nprobe = 2)
    val rows = res.collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      rs.length should be <= 5
      // ranks follow the exact reranked distance within each query
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("d2"))
      byRank shouldBe byRank.sorted
    }
    // every returned candidate sits in one of its query's probed cells
    val cells = Similarity.corpusCells(emb, "vec_id", "embedding", numCentroids = 8)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    // nprobe=2 → a candidate's cell must be among the two the query probed;
    // the query's own cell is always probed first, so at minimum the
    // candidate set is cell-restricted (strictly fewer than all cells)
    val usedCells = rows.groupBy(_.getAs[Long]("query_id"))
      .map { case (_, rs) => rs.map(r => cells(r.getAs[Long]("corpus_id"))).toSet }
    usedCells.foreach { s => s.size should be <= 2 }
    val plan = res.queryExecution.executedPlan.toString
    plan should not include "SortMergeJoin"
  }

  test("pq plan: codebooks and luts broadcast; corpus vectors absent from the adc scan") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val plan = Similarity.pqTopK(emb, q, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("bpe merges: hand-traced rounds on the classic low/lower/newest corpus") {
    // vocab: low(2) lower(1) newest(2). Round 1 pair counts: l-o 3,
    // o-w 3, w-e 3, e-r 1, n-e 2, e-w 2, e-s 2, s-t 2 → tie at 3 broken
    // lexicographically → 'l o'. Round 2: lo-w 3, w-e 3 → 'lo w'.
    // Round 3: best remaining is the 2-count tie → 'e s'.
    val d = docs((1L, "low low lower"), (2L, "newest newest"))
    val out = Bpe.learnMerges(d, "text", rounds = 3).orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[String]("merged"), r.getAs[Long]("cnt")))
    out shouldBe Array(
      (1, "l", "o", "lo", 3L),
      (2, "lo", "w", "low", 3L),
      (3, "e", "s", "es", 2L))
  }

  test("bpe segmentation: applies the hand-traced merges and reconstructs every word") {
    val d = docs((1L, "low low lower"), (2L, "newest newest"))
    val seg = Bpe.segmentVocab(d, "text", rounds = 3).collect()
      .map(r => r.getAs[String]("w") ->
        (r.getAs[String]("segmented"), r.getAs[Long]("n_tokens"))).toMap
    // merges: l+o, lo+w, e+s (see the hand-trace above)
    seg("low") shouldBe (("low", 1L))
    seg("lower") shouldBe (("low e r", 3L))
    seg("newest") shouldBe (("n e w es t", 5L))
    // invariant: removing separators reconstructs the word exactly
    seg.foreach { case (w, (s, n)) =>
      s.replace(" ", "") shouldBe w
      s.split(" ").length.toLong shouldBe n
    }
  }

  test("bpe segmentation: a pairless corpus passes every word through unchanged") {
    val seg = Bpe.segmentVocab(docs((1L, "a b a")), "text", rounds = 2).collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Long]("n_tokens")).toMap
    seg shouldBe Map("a" -> 1L, "b" -> 1L)
  }

  test("hll approx distinct: within sketch error at 10k cardinality, exact-side sanity") {
    import spark.implicits._
    // 10k distinct values (well past the 256-register linear-counting
    // regime) plus heavy duplication: the estimate must land within
    // ~3 standard errors (1.04/√256 ≈ 6.5% → 20% ceiling is generous
    // but deterministic), and the exact side must be exactly right.
    val d = (0 until 30000).map(i => ("g", (i % 10000).toLong)).toDF("grp", "v")
    val row = Hll.approxDistinct(d, "grp", "v").collect().head
    row.getAs[Long]("n_exact") shouldBe 10000L
    val approx = row.getAs[Double]("n_approx")
    math.abs(approx - 10000.0) / 10000.0 should be < 0.2
    row.getAs[Double]("rel_err") shouldBe
      (math.abs(approx - 10000.0) / 10000.0 +- 0.0001)
  }

  test("degenerate inputs: new round-6 operators behave at the edges") {
    // line dedup: doc shorter than one block → one line, kept verbatim
    val short = docs((1L, "a b"), (2L, "c d"))
    val ld = Dedup.lineDedup(short, "doc_id", "text", blockWords = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[String]("text_clean"))).toMap
    ld(1L) shouldBe ((1L, "a b"))
    ld(2L) shouldBe ((1L, "c d"))
    // repetition signals: single-word doc → whole text is the one gram
    val one = TextAnalysis.repetitionSignals(docs((1L, "solo"))).collect().head
    one.getAs[Double]("dup2_frac") shouldBe 0.0
    one.getAs[Double]("top2_share") shouldBe 1.0
    one.getAs[Boolean]("keep") shouldBe true
    // bpe: a corpus of single-char words has no pairs → no merges
    Bpe.learnMerges(docs((1L, "a b a")), "text", rounds = 2).count() shouldBe 0L
    // hll: cardinality 1 sits at the linear-counting floor
    import spark.implicits._
    val hll = Hll.approxDistinct(
      Seq(("g", 7L), ("g", 7L)).toDF("grp", "v"), "grp", "v").collect().head
    hll.getAs[Long]("n_exact") shouldBe 1L
    hll.getAs[Double]("n_approx") shouldBe (1.0 +- 0.1)
    // naive bayes: a doc of entirely unseen words still gets a trained class
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("cat", StringType)))
    val nb = Classify.naiveBayes(spark.createDataFrame(Seq(
      Row(0L, "alpha beta", "x"), Row(1L, "gamma delta", "y"),
      Row(9L, "zzz qqq www", "x")).asJava, schema),
      "doc_id", "cat", "text", trainFilter = col("doc_id") % 10 < 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_cat")).toMap
    nb.size shouldBe 3
    Set("x", "y") should contain(nb(9L))
  }

  test("gopher signals: zero shuffles (pure scan-side projection)") {
    val d = docs((1L, "a b c"), (2L, "d e f"))
    val plan = TextAnalysis.gopherSignals(d).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("repetition signals: zero shuffles (rides the scan)") {
    val d = docs((1L, "a b c"), (2L, "d e f"))
    val plan = TextAnalysis.repetitionSignals(d).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("line dedup plan: exactly two exchanges (line-hash window + doc reassembly)") {
    val d = docs((1L, "a b c d e f"), (2L, "a b c x y z"))
    val plan = Dedup.lineDedup(d, "doc_id", "text", blockWords = 3)
      .queryExecution.executedPlan.toString
    plan.linesIterator.count(_.contains("Exchange")) shouldBe 2
  }

  test("naive bayes plan: the word-count model joins broadcast; no shuffle wider than doc_id") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("cat", StringType)))
    val d = spark.createDataFrame(Seq(
      Row(0L, "alpha beta", "let"), Row(4L, "one two", "num"),
      Row(9L, "alpha one", "let")).asJava, schema)
    val plan = Classify.naiveBayes(d, "doc_id", "cat", "text",
      trainFilter = col("doc_id") % 10 < 8)
      .queryExecution.executedPlan.toString
    // scoring path: per-class word counts and priors reach the docs via
    // broadcast — no sort-merge join anywhere (the only hash exchanges
    // are the bounded model-count partial aggs and the doc-keyed ones)
    plan should include("BroadcastHashJoin")
    plan should include("BroadcastNestedLoopJoin") // the 1-row priors cross join
    plan should not include "SortMergeJoin"
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach(_ should (include("doc_id") or include("cls") or include("cat") or include("w#")))
  }

  test("pmi collocations: perfect pair tops the list, hand-checked pmi value") {
    // "new york" always co-occurs (10 times); on this corpus every
    // surviving pair happens to score ln 3, so the deterministic
    // (pmi desc, bigram asc) ordering is what the second half pins.
    val rows = (1L to 10L).map(i =>
      (i, if (i % 2 == 0) "new york the cat" else "new york the dog"))
    val out = TextAnalysis.pmiCollocations(docs(rows: _*), minCount = 2L, topK = 10)
      .collect().map(r => r.getAs[String]("bigram") ->
        (r.getAs[Long]("n_pair"), r.getAs[Double]("pmi"))).toMap
    // stream: 30 bigrams total; "new york" 10/30, c1(new)=10, c2(york)=10
    // pmi = ln(10*30 / (10*10)) = ln 3
    out("new york") shouldBe ((10L, BigDecimal(math.log(3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // "the cat": c(pair)=5, c1(the)=10, c2(cat)=5 -> ln(5*30/50) = ln 3 too;
    // but "york the" is also ln(10*30/(10*10)) = ln 3. All valid pairs
    // surface; ranking is (pmi desc, bigram asc) and deterministic.
    val ordered = TextAnalysis.pmiCollocations(docs(rows: _*), minCount = 2L, topK = 10)
      .collect().map(_.getAs[String]("bigram"))
    ordered.toSeq shouldBe ordered.sortBy(b => (-out(b)._2, b)).toSeq
    Materialize.dropAll()
  }

  test("text normalization: control bytes, case, runs, and ends; changed flag") {
    val d = docs(
      (1L, "Hello\u0007  World\t"),  // bell + double space + tab
      (2L, "already clean"))
    val out = TextAnalysis.normalizeText(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[String]("norm_text"),
        r.getAs[Long]("n_chars_raw"), r.getAs[Long]("n_chars_norm"),
        r.getAs[Boolean]("changed"))).toMap
    out(1L) shouldBe (("hello world", 14L, 11L, true))
    out(2L) shouldBe (("already clean", 13L, 13L, false))
  }

  test("text normalization plan: zero shuffles (rides the scan)") {
    val plan = TextAnalysis.normalizeText(docs((1L, "x")))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("random projection: matches a local matmul with the same sign matrix") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val vecs = Seq(
      1L -> Array.tabulate(8)(i => (i + 1).toFloat / 10f),
      2L -> Array.tabulate(8)(i => (8 - i).toFloat / 5f))
    val d = spark.createDataFrame(
      vecs.map { case (id, v) => Row(id, v) }.asJava, schema)
    val got = Similarity.randomProject(d, "vec_id", "embedding", dIn = 8, dOut = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("j")) -> r.getAs[Double]("comp"))
      .toMap
    def sign(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_$j".getBytes("UTF-8"))
      val hex = f"${(md(0) >> 4) & 0xf}%x"
      if ("13579bdf".contains(hex)) -1.0 else 1.0
    }
    for ((id, v) <- vecs; j <- 0 until 4) {
      val expect = (0 until 8).map(i => v(i).toDouble * sign(i, j)).sum / math.sqrt(4.0)
      got((id, j)) shouldBe BigDecimal(expect)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    }
  }

  test("cross-set near-dups: verbatim and lightly-edited benchmark copies flag; fresh text doesn't") {
    val bench = docs((100L, "the quick brown fox jumps over the lazy dog again and again today"))
    val train = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"), // verbatim
      (2L, "the quick brown fox leaps over the lazy dog again and again today"), // 1-word edit
      (3L, "completely unrelated text about training data pipelines at scale"))
    val out = Dedup.crossSetNearDups(train, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("max_jac"), r.getAs[Boolean]("contaminated"))).toMap
    out(1L) shouldBe ((1.0, true))
    out(2L)._1 should be >= 0.7 // 12/14 distinct-token jaccard
    out(2L)._2 shouldBe true
    out(3L) shouldBe ((0.0, false))
    Materialize.dropAll()
  }

  test("cdc chunks: reassemble to the doc; an insertion only re-chunks the neighborhood") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val edited = base.replace("w30", "w30 inserted")
    val d = docs((1L, base), (2L, edited), (3L, "tiny")) // doc 3 shorter than the window
    val out = TextAnalysis.cdcChunks(d, window = 8, maskBits = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("chunk_id"),
        r.getAs[Long]("chunk_len"), r.getAs[String]("chunk_md5")))
    // chunk lengths per doc must sum back to the full text
    out.filter(_._1 == 1L).map(_._3).sum shouldBe base.length.toLong
    out.filter(_._1 == 2L).map(_._3).sum shouldBe edited.length.toLong
    out.filter(_._1 == 3L) shouldBe Array((3L, 0, 4L, // one whole-doc chunk
      out.find(_._1 == 3L).get._4))
    // translation invariance: chunks strictly after the edit region are
    // IDENTICAL (same content hash) — fixed-size chunking would shift
    // every boundary after the insertion
    val h1 = out.filter(_._1 == 1L).map(_._4)
    val h2 = out.filter(_._1 == 2L).map(_._4)
    val shared = h1.toSet intersect h2.toSet
    withClue(s"doc1 ${h1.length} chunks, doc2 ${h2.length} chunks, shared ${shared.size}: ") {
      shared should not be empty
    }
    // and at least the final chunk survives the edit verbatim
    h1.last shouldBe h2.last
  }

  test("quantile sketch: estimates land within the 25% bucket bound; sketch merges cellwise") {
    val schema = StructType(Seq(StructField("v", LongType)))
    val vals = (1L to 3000L).map(i => Row(1L + (i * i) % 5000L))
    val d = spark.createDataFrame(vals.asJava, schema)
    val hist = Quantile.logHist(d, col("v"))
    val out = Quantile.quantileEstimates(hist, Seq(0.5, 0.9)).collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
    val exact = d.select(expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"))
      .head()
    math.abs(out(0.5) - exact.getDouble(0)) / exact.getDouble(0) should be <= 0.25
    math.abs(out(0.9) - exact.getDouble(1)) / exact.getDouble(1) should be <= 0.25
    // mergeability: hist(a ∪ b) = cellwise sum of hist(a) + hist(b)
    val (a, b) = (vals.take(1500), vals.drop(1500))
    val ha = Quantile.logHist(spark.createDataFrame(a.asJava, schema), col("v"))
    val hb = Quantile.logHist(spark.createDataFrame(b.asJava, schema), col("v"))
    val merged = ha.unionByName(hb).groupBy("oct", "half")
      .agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("cnt")).toMap
    val whole = hist.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("cnt")).toMap
    merged shouldBe whole
  }

  test("quantile sketch plan: one partial-aggregated shuffle; scan side carries no sort") {
    val schema = StructType(Seq(StructField("v", LongType)))
    val d = spark.createDataFrame((1L to 10L).map(Row(_)).asJava, schema)
    val plan = Quantile.logHist(d, col("v")).queryExecution.executedPlan.toString
    plan should include("partial") // map-side combine before the exchange
    plan.split("Exchange").length shouldBe 2 // exactly one exchange
  }

  test("cdc overlap: engulfed doc scores ~1.0 containment; disjoint doc pairs with nobody") {
    val a = (1 to 80).map(i => s"tok$i").mkString(" ")
    val d = docs(
      (1L, a),
      (2L, a + " " + (200 to 240).map(i => s"new$i").mkString(" ")), // engulfs doc 1
      (3L, (500 to 580).map(i => s"other$i").mkString(" ")))
    val out = Dedup.cdcOverlapPairs(
        TextAnalysis.cdcChunks(d, window = 8, maskBits = 4), "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("containment"))
      .toMap
    // doc 1's chunks reappear verbatim inside doc 2 (only the chunk
    // straddling the append boundary can differ) — containment ≈ 1
    // against min(|1|,|2|) even though pair Jaccard would dilute
    out.keySet shouldBe Set((1L, 2L))
    out((1L, 2L)) should be >= 0.85
    Materialize.dropAll()
  }

  test("label outliers: the far vector flags, the cluster doesn't") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", StringType)))
    val rows = (1L to 9L).map(i =>
      Row(i, Array(0.1f * (i % 3), 0.1f * ((i + 1) % 3)), "g")) :+
      Row(10L, Array(10f, 10f), "g")
    val d = spark.createDataFrame(rows.asJava, schema)
    val out = Similarity.labelOutliers(d, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("z"), r.getAs[Boolean]("is_outlier"))).toMap
    out(10L)._2 shouldBe true
    out(10L)._1 should be >= 2.0
    (1L to 9L).foreach { i => out(i)._2 shouldBe false }
    Materialize.dropAll()
  }

  test("oov rate: tokens outside the top-k vocabulary count as OOV") {
    val d = docs(
      (1L, "the cat the cat the"), // all in-vocab once vocab = {the, cat}
      (2L, "the dog zebra"))       // dog/zebra out of a size-2 vocab
    val out = TextAnalysis.oovRate(d, vocabSize = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))).toMap
    out(1L) shouldBe ((5L, 0L, 0.0))
    out(2L) shouldBe ((3L, 2L, 0.6667))
    Materialize.dropAll()
  }

  test("hll register merge: per-slice registers merged by max ≡ from-scratch sketch") {
    import spark.implicits._
    // 3 ingest slices with overlapping values — merge must agree exactly
    val d = (0 until 3000).map(i => ("g", i % 3, (i % 700).toLong))
      .toDF("grp", "slice", "v")
    val daily = Hll.registersBy(d, Seq("grp", "slice"), "v")
    val merged = daily.groupBy("grp", "_bucket").agg(max("r").as("r"))
    val viaMerge = Hll.estimateFromRegisters(merged, "grp").collect().head.getDouble(1)
    val direct = Hll.estimate(d, "grp", "v").collect().head.getDouble(1)
    viaMerge shouldBe direct
  }

  test("silhouette: on-centroid clusters score 1.0; an equidistant straddler scores 0") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // ids 0..6 sit exactly on centroid 0 = vec(id 0) = [1,0];
    // ids 7..13 on centroid 1 = vec(id 7) = [0,1] (stride-7 seeding);
    // id 14 = [1,1] is equidistant → sil 0, tie-broken into cell 0.
    val rows = (0L to 6L).map(i => Row(i, Array(1f, 0f))) ++
      (7L to 13L).map(i => Row(i, Array(0f, 1f))) :+ Row(14L, Array(1f, 1f))
    val d = spark.createDataFrame(rows.asJava, schema)
    val out = Similarity.silhouette(d, "vec_id", "embedding", numCentroids = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out(0) shouldBe ((8L, 0.875)) // seven 1.0s + one 0 straddler
    out(1) shouldBe ((7L, 1.0))
    Materialize.dropAll()
  }

  test("winnowing: shared substring ≥ w+k−1 chars guarantees a shared fingerprint") {
    // k=8, w=4 → any 11-char shared run must fingerprint on both sides
    val shared = "ABCDEFGHIJK" // 11 chars, unique casing so no accidental hits
    val d = docs(
      (1L, s"xxxx$shared"),
      (2L, s"${shared}zzzzzz"),
      (3L, "totally different content here"))
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = fps.groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    byDoc(1L).intersect(byDoc(2L)) should not be empty
    byDoc(3L).intersect(byDoc(1L)) shouldBe empty
    // degenerate shapes: shorter than k → whole-text hash; < w grams → one window
    val tiny = Dedup.winnowFingerprints(docs((9L, "abc")), "doc_id", "text", 8, 4)
      .collect()
    tiny.length shouldBe 1
    val few = Dedup.winnowFingerprints(docs((8L, "abcdefghij")), "doc_id", "text", 8, 4)
      .collect() // 3 grams < w=4 → exactly one min fingerprint
    few.length shouldBe 1
  }

  test("topDupGrams: cross-doc duplicated grams surface, singletons don't") {
    val span = "one two three four five six seven eight"
    val d = docs(
      (1L, s"$span tail1"),
      (2L, s"lead $span"),
      (3L, "no overlap with anything else at all here"))
    val out = TextAnalysis.topDupGrams(d, "doc_id", "text", n = 8, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.map(_._1) should contain(span)
    val row = out.find(_._1 == span).get
    row._2 shouldBe 2L // two docs
    all(out.map(_._2)) should be >= 2L // n_docs >= 2 filter
  }

  test("labelNoise: a mislabeled point inside a tight cluster gets flagged") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", StringType)))
    // ids 0..6 at [1,0] labeled a — except id 3 mislabeled b;
    // ids 7..13 at [0,1] labeled b. Stride-7 seeding puts one centroid
    // on each cluster; id 3's 5-NN are all a → flagged.
    val rows = (0L to 6L).map(i =>
      Row(i, Array(1f, 0f), if (i == 3L) "b" else "a")) ++
      (7L to 13L).map(i => Row(i, Array(0f, 1f), "b"))
    val d = spark.createDataFrame(rows.asJava, schema)
    val out = Similarity.labelNoise(d, "vec_id", "embedding", "label",
      k = 5, numCentroids = 2, nprobe = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    out("a") shouldBe ((6L, 0L, 0.0))
    out("b") shouldBe ((8L, 1L, 0.125))
    Materialize.dropAll()
  }

  test("embedNovelty: exact copy gated, off-axis vector novel, null-cos no-candidate safe") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val existing = spark.createDataFrame(
      ((0L to 13L).map(i =>
        Row(i * 2, if (i < 7) Array(1f, 0f) else Array(0f, 1f)))).asJava, schema)
    val fresh = spark.createDataFrame(Seq(
      Row(101L, Array(1f, 0f)),                 // exact copy of cluster 0
      Row(103L, Array(0.7071f, -0.7071f))).asJava, schema) // cos ≤ 0.71 anywhere
    val out = Similarity.embedNovelty(fresh, existing, "vec_id", "embedding",
      numCentroids = 2, nprobe = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getAs[Any]("max_cos"), r.getBoolean(2)))).toMap
    out(101L)._1.asInstanceOf[Double] shouldBe 1.0
    out(101L)._2 shouldBe false
    out(103L)._1.asInstanceOf[Double] should be < 0.9
    out(103L)._2 shouldBe true
    Materialize.dropAll()
  }

  test("random projection plan: sign matrix broadcasts; corpus side never collects") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val d = spark.createDataFrame(
      Seq(Row(1L, Array.fill(8)(0.5f))).asJava, schema)
    val plan = Similarity.randomProject(d, "vec_id", "embedding", 8, 4)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "CollectLimit"
  }
}
