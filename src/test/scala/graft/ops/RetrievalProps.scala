package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for incremental index maintenance: for ANY corpus and
  * ANY 2-way split into delta batches, the monoid-merged postings and
  * doc-length tables are row-identical to the from-scratch build — the
  * algebraic fact the whole append-only maintenance story rests on. */
object RetrievalProps extends Properties("Retrieval") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkFixture.spark

  private val words = Vector("spark", "table", "query", "data", "filler", "x")

  private val genWorld: Gen[(List[(Long, String)], Set[Long])] = for {
    n <- Gen.choose(1, 20)
    texts <- Gen.listOfN(n, Gen.choose(1, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(words)).map(_.mkString(" "))))
    split <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield (
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    split.zipWithIndex.collect { case (true, i) => i.toLong }.toSet)

  property("delta-merged index equals the from-scratch build for any split") =
    forAll(genWorld) { case (rows, leftIds) =>
      import spark.implicits._
      val d = rows.toDF("doc_id", "text")
      val full = Retrieval.postingsIndex(d, "doc_id", "text")
      val (mp, ml) = Retrieval.mergeIndex(
        Retrieval.postingsIndex(d.filter(r => leftIds(r.getLong(0))), "doc_id", "text"),
        Retrieval.postingsIndex(d.filter(r => !leftIds(r.getLong(0))), "doc_id", "text"))
      def s(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
      s(mp) == s(full._1) && s(ml) == s(full._2)
    }
}
