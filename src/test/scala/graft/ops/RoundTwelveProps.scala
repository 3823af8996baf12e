package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-12 property pins.
  *
  * 1. The `decontam_ledger_chain` claim generalized: over ANY corpus and
  *    ANY 3-way eval split, SERIALLY folding per-suite flags
  *    ((f(a) ∨ f(b)) ∨ f(c)) equals the full-union sweep at EVERY
  *    prefix — the associativity a quarterly benchmark cadence
  *    exercises, for both union-decomposable gates (8-gram presence,
  *    max cosine).
  *
  * 2. The persisted standing-state contract generalized: over ANY
  *    corpus and ANY base/delta/delta split, chaining two
  *    [[StandingState.ingest]] nights across real write/read
  *    boundaries reproduces the one-shot [[StandingState.bootstrap]]
  *    over everything. */
object RoundTwelveProps extends Properties("RoundTwelve") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkFixture.spark

  private val phrasePool = Vector(
    "the quick brown fox jumps over the lazy dog tonight",
    "data pipelines must never leak benchmark text into training",
    "a third phrase of at least eight plain words here",
    "completely different filler content words for unrelated documents maybe")

  private val genChainCase: Gen[(List[(Long, String, Seq[Double])], Int)] = for {
    n <- Gen.choose(8, 18)
    mod <- Gen.choose(2, 4)
    docs <- Gen.sequence[List[(Long, String, Seq[Double])], (Long, String, Seq[Double])](
      (1 to n).toList.map { i =>
        for {
          p <- Gen.choose(0, phrasePool.size - 1)
          c1 <- Gen.choose(-3, 3)
          c2 <- Gen.choose(-3, 3)
          scale <- Gen.oneOf(1.0, 2.0)
        } yield (i.toLong, phrasePool(p),
          Seq(c1.toDouble, c2.toDouble, 1.0).map(_ * scale))
      })
  } yield (docs, mod)

  property("3-suite serial ledger fold ≡ full-union sweep at every prefix") =
    forAll(genChainCase) { case (docs, mod) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = docs.toDF("doc_id", "text", "v")
      val train = df.filter(col("doc_id") % 4 =!= 0)
      val eval = df.filter(col("doc_id") % 4 === 0)
      // random-ish 3-way suite split; some parts may be empty (the
      // defined-false path of the ledger)
      val s0 = eval.filter(col("doc_id") % mod === 0)
      val s1 = eval.filter(col("doc_id") % mod === 1)
      val s2 = eval.filter(col("doc_id") % mod =!= 0 && col("doc_id") % mod =!= 1)
      def presence(bench: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
        TextAnalysis.contamination(train, bench, shingleWords = 8)
          .collect().map(r => r.getLong(0) -> (r.getLong(2) >= 1L)).toMap
      def maxcos(bench: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
        train.select(col("doc_id").as("qid"), col("v").as("qv"))
          .crossJoin(broadcast(bench.select(col("v").as("ev"))))
          .groupBy("qid")
          .agg(max(round(Similarity.cosine(col("qv"), col("ev")), 4)).as("mx"))
          .collect().map(r => r.getLong(0) -> (r.getDouble(1) >= 0.9)).toMap
      val ids = train.select("doc_id").collect().map(_.getLong(0)).toSeq
      def or(a: Map[Long, Boolean], b: Map[Long, Boolean])(id: Long) =
        a.getOrElse(id, false) || b.getOrElse(id, false)
      val (p0, p1, p2) = (presence(s0), presence(s1), presence(s2))
      val (pu01, pu012) = (presence(s0.unionByName(s1)),
        presence(s0.unionByName(s1).unionByName(s2)))
      val (c0, c1, c2) = (maxcos(s0), maxcos(s1), maxcos(s2))
      val (cu01, cu012) = (maxcos(s0.unionByName(s1)),
        maxcos(s0.unionByName(s1).unionByName(s2)))
      ids.forall { id =>
        // prefix 2: (f0 ∨ f1) ≡ f(s0 ∪ s1)
        or(p0, p1)(id) == pu01.getOrElse(id, false) &&
        or(c0, c1)(id) == cu01.getOrElse(id, false) &&
        // prefix 3: ((f0 ∨ f1) ∨ f2) ≡ f(s0 ∪ s1 ∪ s2)
        (or(p0, p1)(id) || p2.getOrElse(id, false)) == pu012.getOrElse(id, false) &&
        (or(c0, c1)(id) || c2.getOrElse(id, false)) == cu012.getOrElse(id, false)
      }
    }

  // ---- persisted standing state over random splits ----

  private val genStateCase: Gen[(List[(Long, String)], Int)] = for {
    n <- Gen.choose(6, 14)
    mod <- Gen.choose(3, 5)
    docs <- Gen.sequence[List[(Long, String)], (Long, String)]((1 to n).toList.map { i =>
      for {
        base <- Gen.choose(0, 2)
        edit <- Gen.choose(0, 3)
      } yield {
        val body = base match {
          case 0 => "alpha payload body with repeated words " * 3
          case 1 => "beta content stream of rather different material " * 3
          case _ => "gamma third family of asset payload bytes here " * 3
        }
        (i.toLong, ("" + ('w' + edit).toChar) + body.drop(1))
      }
    })
  } yield (docs, mod)

  property("two persisted ingest nights ≡ one-shot bootstrap, any split") =
    forAll(genStateCase) { case (docs, mod) =>
      import spark.implicits._
      def mk(ds: List[(Long, String)]) =
        Multimodal.assetsFromText(ds.toDF("id", "txt"), "id", "txt")
          .withColumnRenamed("id", "asset_id")
      val base = docs.filter(_._1 % mod == 1)
      val d1 = docs.filter(_._1 % mod == 0)
      val d2 = docs.filter(t => t._1 % mod != 0 && t._1 % mod != 1)
      val Seq(store, full) = Seq("p-chain", "p-full").map(SparkFixture.tempDir)
      StandingState.bootstrap(mk(base), store)
      StandingState.ingest(mk(d1), store)
      StandingState.ingest(mk(d2), store)
      StandingState.bootstrap(mk(docs), full)
      def cl(root: String) = StandingState.readClusters(spark, root)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (chained, oneShot) = (cl(store), cl(full))
      Materialize.clearCache()
      // chained state may carry singleton delta nodes the one-shot
      // closure never lists (same envelope as mergeClusters)
      val chainedClustered = chained.filter { case (d, c) =>
        d != c || chained.exists { case (d2x, c2x) => d2x != d && c2x == c }
      }
      chainedClustered == oneShot
    }
}
