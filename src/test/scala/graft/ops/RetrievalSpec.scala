package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** BM25 scoring, the capped inverted-index build, and simhash
  * hamming-radius pair detection on controlled toy corpora. */
class RetrievalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25 ranks term-dense short docs above term-sparse long ones") {
    val d = docs(
      1L -> "spark table query",
      2L -> "spark row row row row row row row row row row row",
      3L -> "nothing relevant here at all",
      4L -> "table query")
    val got = Retrieval.bm25(d, "doc_id", "text", Seq("spark", "table", "query"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    got.map(_._1).head shouldBe 1L // all three terms, shortest doc
    got.map(_._1) should not contain 3L // no matching term → never scored
    got.map(_._2).foreach(_ should be > 0.0)
    // scores arrive ranked
    got.map(_._2).sliding(2).foreach { case Array(a, b) => a should be >= b }
  }

  test("inverted index caps postings and counts df/cf over the full stream") {
    val d = docs((1L to 30L).map(i => i -> "hot word").toSeq: _*)
    val row = Retrieval.invertedIndex(d, "doc_id", "text", minDf = 5L, cap = 20)
      .filter(org.apache.spark.sql.functions.col("tok") === "hot")
      .collect().head
    row.getLong(1) shouldBe 30L // df: every doc
    row.getLong(2) shouldBe 30L // cf: once per doc
    // champion list: first 20 doc ids only, sorted, comma-joined
    row.getString(3) shouldBe (1L to 20L).mkString(",")
  }

  test("bm25FromIndex agrees with from-text bm25 exactly, with the term filter pushed to the scan") {
    import org.apache.spark.sql.functions.col
    val d = docs(
      1L -> "spark table query engine",
      2L -> "spark spark spark filler filler filler filler",
      3L -> "unrelated words only here",
      4L -> "table query table query")
    val terms = Seq("spark", "table", "query")
    val direct = Retrieval.bm25(d, "doc_id", "text", terms, topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val (postings, doclens) = Retrieval.postingsIndex(d, "doc_id", "text")
    val pIdx = Materialize.index(postings, "spec-postings")
    val lIdx = Materialize.index(doclens, "spec-doclens")
    val served = Retrieval.bm25FromIndex(pIdx, lIdx, "doc_id", terms, topK = 4)
    val got = served.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // the probe reads the postings parquet through a pushed In(tok) filter
    val plan = served.queryExecution.executedPlan.toString
    plan should include regex "PushedFilters: \\[.*In\\(tok"
    Materialize.dropAll()
    got shouldBe direct
  }

  test("two-phase champion cap: global window input is bounded by cap x partitions") {
    import org.apache.spark.sql.functions._
    // a stop word hitting every one of 300 docs, spread over many input
    // partitions — the shape that used to funnel df ≈ N rows through ONE
    // window task
    val d = docs((1L to 300L).map(i => i -> "stop word").toSeq: _*)
    val perDoc = d
      .select(explode(split(lower(col("text")), " ")).as("tok"), col("doc_id"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
    val cap = 20
    val parts = perDoc.rdd.getNumPartitions
    val precap = Retrieval.championPrecap(perDoc, "doc_id", cap)
    // phase-1 survivors per term — the GLOBAL window's entire input —
    // stay within cap x partitions no matter the term's df
    val survivorCounts = precap.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    survivorCounts.values.foreach(_ should be <= cap.toLong * parts)
    survivorCounts("stop") should be < 300L // actually pruned, not pass-through
    // and phase 2 over the survivors is EXACTLY the naive global cap
    val twoPhase = Retrieval.championCap(precap, "doc_id", cap)
      .select("tok", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val naive = perDoc
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("tok").orderBy("doc_id")))
      .filter(col("rn") <= cap)
      .select("tok", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).sorted
    twoPhase shouldBe naive
  }

  test("hamming pairs: identical docs at distance 0, disjoint docs absent") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon", // exact dup of 1
      3L -> "zeta eta theta iota kappa lambda mu nu xi")
    val got = Dedup.simhashHammingPairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Materialize.dropAll()
    got should contain((1L, 2L, 0L))
    got.foreach { case (a, b, hd) =>
      a should be < b
      hd should be <= 2L
    }
  }

  test("simhash64 agg form agrees with the projection form string-for-string") {
    import org.apache.spark.sql.functions.col
    val d = docs(
      1L -> "alpha beta gamma delta",
      2L -> "one two three four five six seven eight nine ten",
      3L -> "", // single empty token after split
      4L -> "repeated repeated repeated distinct",
      5L -> (null: String)) // null ≡ empty: explode must not drop the row
    val proj = Dedup.simhash64(d, "text").select(col("doc_id"), col("simhash"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val agg = Dedup.simhash64Agg(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    agg shouldBe proj
    agg.values.foreach(_.length shouldBe 64)
  }

  test("simhash novelty: known copies gate at distance 0, fresh content is novel") {
    val existing = docs(
      10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "one two three four five six seven")
    val batch = docs(
      1L -> "alpha beta gamma delta epsilon zeta", // exact re-crawl of 10
      2L -> "entirely new material nothing shared here at all")
    val got = Dedup.simhashNovelty(batch, existing, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toMap
    Materialize.dropAll()
    got(1L) shouldBe ((Some(0L), false)) // known content: not novel
    got(2L) shouldBe ((None, true)) // nothing within distance 2: novel
  }

  test("mergeIndex: delta-merged index is row-identical to the from-scratch build") {
    val d = docs(
      1L -> "spark table query engine",
      2L -> "spark spark filler",
      3L -> "unrelated words only",
      4L -> "table query table data")
    val full = Retrieval.postingsIndex(d, "doc_id", "text")
    val (mp, ml) = Retrieval.mergeIndex(
      Retrieval.postingsIndex(d.filter(org.apache.spark.sql.functions.col("doc_id") <= 2),
        "doc_id", "text"),
      Retrieval.postingsIndex(d.filter(org.apache.spark.sql.functions.col("doc_id") > 2),
        "doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    rows(mp) shouldBe rows(full._1)
    rows(ml) shouldBe rows(full._2)
  }

  test("topKPerKey equals the naive global window; phase-1 survivor set is bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one hot key holding every row — the shape that funnels a whole
    // corpus through a single window task in the naive form
    val d = (1L to 300L).map(i => ("hot", i, (i * 37) % 97)).toDF("k", "id", "v")
    val order = Seq(col("v").desc, col("id").asc)
    val parts = d.rdd.getNumPartitions
    val pre = Retrieval.topKPerKeyPhase1(d, Seq("k"), order, 10)
    pre.count() should be <= 10L * parts
    pre.count() should be < 300L // actually pruned, not pass-through
    val got = Retrieval.topKPerKey(d, Seq("k"), order, 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    val naive = d.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy(order: _*))
        .cast("long"))
      .filter(col("rank") <= 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    got shouldBe naive
  }

  test("bm25Batch agrees per-query with bm25FromIndex on the same index") {
    import spark.implicits._
    val d = docs(
      1L -> "spark table query engine",
      2L -> "spark spark spark filler filler filler",
      3L -> "unrelated words only here",
      4L -> "table query table query data")
    val (p, l) = Retrieval.postingsIndex(d, "doc_id", "text")
    val pIdx = Materialize.index(p, "batch-p")
    val lIdx = Materialize.index(l, "batch-l")
    val queries = Seq((1L, "spark"), (1L, "table"), (2L, "query"), (2L, "data"))
      .toDF("query_id", "tok")
    val batch = Retrieval.bm25Batch(pIdx, lIdx, "doc_id", queries, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    // df is per TERM over the index, independent of which query probes it,
    // so each batch slice must equal the single-query indexed run exactly
    val q1 = Retrieval.bm25FromIndex(pIdx, lIdx, "doc_id", Seq("spark", "table"), topK = 4)
      .collect().map(r => (1L, r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val q2 = Retrieval.bm25FromIndex(pIdx, lIdx, "doc_id", Seq("query", "data"), topK = 4)
      .collect().map(r => (2L, r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    Materialize.dropAll()
    batch shouldBe (q1 ++ q2)
  }

  test("rrfFuse: overlap outranks single-list hits; fixed-point fusion is exact") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "doc_id", k0 = 60, topK = 10)
      .collect()
    // both-lists doc fuses to the top despite ranking first in neither
    fused.head.getLong(0) shouldBe 20L
    val got = fused.map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    got(20L) shouldBe ((0.032522, 2L)) // round6(1/61) + round6(1/62), exactly
    got(10L) shouldBe ((0.016393, 1L)) // round6(1/61)
    got(40L) shouldBe ((0.016129, 1L)) // round6(1/62)
  }

  test("64-bit width keeps pair volume linear: only planted dups pair, 2x corpus -> 2x pairs") {
    // n base docs with disjoint vocabularies, each planted TWICE: at 64
    // bits unrelated fingerprints sit ~32 bits apart, so the ONLY pairs
    // within distance 2 are the n planted dup pairs — and doubling the
    // corpus doubles them. (At the old 16-bit width the hamming<=2 ball
    // covered 137/65536 of the space and near-random docs collided, so
    // pair volume grew ~quadratically: 20k pairs from 500 corpus docs.)
    def planted(n: Int) = docs((1 to n).flatMap { k =>
      val text = (1 to 12).map(w => s"w${k}base$w").mkString(" ")
      Seq((2L * k - 1) -> text, (2L * k) -> text)
    }: _*)
    def pairs(n: Int): Array[(Long, Long, Long)] = {
      val p = Dedup.simhashHammingPairs(planted(n), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      Materialize.dropAll()
      p
    }
    val p40 = pairs(40)
    p40.length shouldBe 40 // exactly the planted dups, zero cross-talk
    p40.foreach { case (a, b, hd) => hd shouldBe 0L; b shouldBe a + 1 }
    pairs(80).length shouldBe 80 // linear, not quadratic
  }

  test("bm25Prf: expansion term from feedback docs surfaces a doc round 1 misses") {
    val d = docs(
      1L -> "alpha beta beta",   // feedback doc, carries the expansion term
      2L -> "alpha beta",        // feedback doc
      3L -> "beta gamma",        // invisible to the seed query
      4L -> "delta delta")       // noise, must stay invisible
    val (p, l) = Retrieval.postingsIndex(d, "doc_id", "text")
    val round1 = Retrieval.bm25FromIndex(p, l, "doc_id", Seq("alpha"), topK = 10)
      .collect().map(_.getLong(0))
    round1 should not contain 3L
    val round2 = Retrieval.bm25Prf(p, l, "doc_id", Seq("alpha"),
      fbDocs = 2, fbTerms = 1, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_terms")).toMap
    round2.keySet should contain(3L) // reached via the expanded term "beta"
    round2(3L) shouldBe 1L           // matched only the expansion term
    round2.keySet should not contain 4L
    Materialize.dropAll()
  }
}
