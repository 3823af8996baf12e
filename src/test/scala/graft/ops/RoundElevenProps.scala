package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for incremental asset-manifest maintenance: over ANY
  * payload corpus and ANY base/delta split, folding the delta's
  * perceptual pair edges ([[Multimodal.phashPairsDelta]] ∪
  * [[Multimodal.dhashPairsDelta]]) into the base assignment via
  * [[Cluster.mergeClusters]] must reproduce the full-recompute
  * clustering exactly — the guarantee `pipeline_asset_manifest_incremental`'s
  * full-recompute oracle checks on the fixture, generalized to random
  * inputs. Payload pools deliberately mix near-duplicates (shared bases
  * with small salts) so real ≤2-hamming clusters form and MERGE across
  * the split boundary. */
object RoundElevenProps extends Properties("RoundEleven") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkFixture.spark

  // a few base payloads; each doc is a base replica with a tiny
  // same-length edit (preserving block structure → true near-dups)
  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(4, 14)
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
  } yield docs

  private val genSplitMod: Gen[Int] = Gen.choose(2, 5)

  property("mergeClusters over phash∪dhash delta edges ≡ full recompute, any split") =
    forAll(genCorpus, genSplitMod) { (docs, mod) =>
      import spark.implicits._
      def mk(ds: List[(Long, String)]) =
        Multimodal.assetsFromText(ds.toDF("id", "txt"), "id", "txt")
      def pairs(a: org.apache.spark.sql.DataFrame) =
        Multimodal.phashPairs(a).select("id_a", "id_b")
          .unionByName(Multimodal.dhashPairs(a).select("id_a", "id_b"))
          .distinct()
      val all = mk(docs)
      val fullComp = Cluster.dupClusters(pairs(all))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val baseDocs = docs.filter(_._1 % mod != 0)
      val deltaDocs = docs.filter(_._1 % mod == 0)
      val (base, delta) = (mk(baseDocs), mk(deltaDocs))
      val baseComp = Cluster.dupClusters(pairs(base)).select("doc_id", "cluster")
      val deltaPairs =
        if (deltaDocs.isEmpty) spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
        else Multimodal.phashPairsDelta(delta, base).select("id_a", "id_b")
          .unionByName(Multimodal.dhashPairsDelta(delta, base).select("id_a", "id_b"))
          .distinct()
      val merged = Cluster.mergeClusters(baseComp, deltaPairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Materialize.clearCache()
      // merged may carry singleton delta nodes (their own cluster) that a
      // full dupClusters never lists — drop self-labeled non-clustered
      val mergedClustered = merged.filter { case (d, c) =>
        d != c || merged.exists { case (d2, c2) => d2 != d && c2 == c }
      }
      mergedClustered == fullComp
    }

  // ---- decontamination ledger decomposition (decontam_eval_delta) ----

  private val phrasePool = Vector(
    "the quick brown fox jumps over the lazy dog tonight",
    "data pipelines must never leak benchmark text into training",
    "a third phrase of at least eight plain words here",
    "completely different filler content words for unrelated documents maybe")

  private val genDecontamCase: Gen[(List[(Long, String, Seq[Double])], Int)] = for {
    n <- Gen.choose(6, 16)
    mod <- Gen.choose(2, 4)
    docs <- Gen.sequence[List[(Long, String, Seq[Double])], (Long, String, Seq[Double])](
      (1 to n).toList.map { i =>
        for {
          p <- Gen.choose(0, phrasePool.size - 1)
          c1 <- Gen.choose(-3, 3)
          c2 <- Gen.choose(-3, 3)
          c3 <- Gen.choose(-3, 3)
          scale <- Gen.oneOf(1.0, 2.0)
        } yield (i.toLong, phrasePool(p),
          // last component pinned nonzero: a zero-norm vector would make
          // cosine undefined, which is not the contract under test
          Seq(c1.toDouble, c2.toDouble, c3.toDouble, 1.0).map(_ * scale))
      })
  } yield (docs, mod)

  /** The `decontam_eval_delta` claim generalized to random corpora and
    * random eval splits: the verbatim PRESENCE gate (any shared 8-gram)
    * and the semantic MAX gate (max cosine ≥ 0.9) must decompose over
    * eval-set union — the per-doc OR of the per-part flags equals the
    * flag computed against the union. Empty parts (mod collapses one
    * side) exercise the ledger's defined-false path. */
  property("decontam presence/max gates decompose over ANY eval split") =
    forAll(genDecontamCase) { case (docs, mod) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = docs.toDF("doc_id", "text", "v")
      val train = df.filter(col("doc_id") % 3 =!= 0)
      val eval = df.filter(col("doc_id") % 3 === 0)
      val v1 = eval.filter(col("doc_id") % mod === 0)
      val delta = eval.filter(col("doc_id") % mod =!= 0)
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
      val (pv, pd, pf) = (presence(v1), presence(delta),
        presence(v1.unionByName(delta)))
      val (cv, cd, cf) = (maxcos(v1), maxcos(delta),
        maxcos(v1.unionByName(delta)))
      ids.forall { id =>
        (pv.getOrElse(id, false) || pd.getOrElse(id, false)) ==
          pf.getOrElse(id, false) &&
        (cv.getOrElse(id, false) || cd.getOrElse(id, false)) ==
          cf.getOrElse(id, false)
      }
    }
}
