package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for the prefix-filtering exact similarity join
  * (Bayardo et al. WWW'07, [[Dedup.allPairsJaccard]]): on ANY random
  * corpus it must return EXACTLY the pairs a brute-force all-pairs
  * Jaccard scan finds — the prefix index and the size filter are
  * completeness-preserving by the prefix lemma, and this checks the
  * implementation didn't lose that. Vocab is tiny (6 tokens) so docs
  * collide constantly and the filters actually get exercised on both
  * the keep and prune sides. */
object AllPairsProps extends Properties("AllPairs") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkFixture.spark

  private val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff")

  private val genDocs: Gen[List[String]] = for {
    n <- Gen.choose(2, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 8)
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield toks.mkString(" "))
  } yield docs

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def bruteForce(docs: List[String], t: Double): Set[(Long, Long, Double)] = {
    val tok = docs.zipWithIndex.map { case (d, i) =>
      (i.toLong, d.toLowerCase.split(" ", -1).distinct.toSet)
    }
    (for {
      (ia, ta) <- tok; (ib, tb) <- tok if ia < ib
      jac = round4(ta.intersect(tb).size.toDouble / ta.union(tb).size)
      if jac >= t
    } yield (ia, ib, jac)).toSet
  }

  property("prefix-filtering join ≡ brute-force all-pairs at t=0.5") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("doc_id", "text")
      val got = Dedup.allPairsJaccard(df, "doc_id", "text", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      Materialize.dropAll()
      got == bruteForce(docs, 0.5)
    }

  property("threshold sweep keeps exactness (t=0.3 and t=0.8)") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("doc_id", "text")
      val r = Seq(0.3, 0.8).forall { t =>
        val got = Dedup.allPairsJaccard(df, "doc_id", "text", threshold = t)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        got == bruteForce(docs, t)
      }
      Materialize.dropAll()
      r
    }
}
