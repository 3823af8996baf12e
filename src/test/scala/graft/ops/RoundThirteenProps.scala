package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-13 property pins for the snapshot store: over ANY corpus and
  * ANY base/delta/delta split, the full lifecycle — bootstrap, two
  * delta-append nights, a bounded-cadence COMPACTION (the honest full
  * rewrite), retention down to one snapshot, and a rollback-refold —
  * reproduces the one-shot bootstrap over everything, and the
  * compacted store's assignment is byte-for-byte the pre-compaction
  * one. Round 12 pinned chain ≡ bootstrap; round 13 pins that the
  * write-path redesign (append partitions, revision resolution,
  * compaction, retention sweeps) cannot change a single row under any
  * ordering the retention policy produces. */
object RoundThirteenProps extends Properties("RoundThirteen") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkFixture.spark

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

  property("append nights + compaction + rollback-refold ≡ one-shot bootstrap, any split") =
    forAll(genStateCase) { case (docs, mod) =>
      import spark.implicits._
      def mk(ds: List[(Long, String)]) =
        Multimodal.assetsFromText(ds.toDF("id", "txt"), "id", "txt")
          .withColumnRenamed("id", "asset_id")
      val base = docs.filter(_._1 % mod == 1)
      val d1 = docs.filter(_._1 % mod == 0)
      val d2 = docs.filter(t => t._1 % mod != 0 && t._1 % mod != 1)
      val Seq(store, full) = Seq("p13-chain", "p13-full").map(SparkFixture.tempDir)
      StandingState.bootstrap(mk(base), store)
      StandingState.ingest(mk(d1), store)
      StandingState.ingest(mk(d2), store)
      def cl(root: String) = StandingState.readClusters(spark, root)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val chained = cl(store)
      // compaction folds the revision partitions; the assignment is
      // unchanged and the store shrinks to one snapshot
      StandingState.compactManifest(spark, store, maxPartitions = 1)
      val compacted = cl(store)
      // rollback to the compacted base and refold NOTHING — still exact
      StandingState.rollbackTo(spark, store, StandingState.latestSnapshot(spark, store))
      val afterRetention = cl(store)
      StandingState.bootstrap(mk(docs), full)
      val oneShot = cl(full)
      Materialize.clearCache()
      val clusteredOnly = chained.filter { case (d, c) =>
        d != c || chained.exists { case (d2x, c2x) => d2x != d && c2x == c }
      }
      compacted == chained && afterRetention == chained && clusteredOnly == oneShot
    }
}
