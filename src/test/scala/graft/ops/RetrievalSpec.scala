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
}
