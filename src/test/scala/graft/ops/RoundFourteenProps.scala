package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-14 property pins for the probe layout: over ANY fingerprint
  * frames (random 64-bit fingerprints plus planted exact copies and
  * 1-bit edits), the block-key-indexed cross-set probe — with and
  * without the literal key filter — reproduces [[Dedup
  * .hammingPairsDelta]] pair-for-pair; and over ANY committed table and
  * ANY key set, the witness-zone-pruned read is LOSSLESS: filtering the
  * pruned scan by the keys equals filtering the full scan. These are
  * the two soundness contracts the round's file-pruning work rests on
  * (a zone that wrongly excluded a file, or a literal filter that
  * dropped a reachable candidate, would silently corrupt every nightly
  * fold downstream). */
object RoundFourteenProps extends Properties("RoundFourteen") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkFixture.spark

  private def bits(seed: Int): String = {
    val r = new scala.util.Random(seed)
    (1 to 64).map(_ => if (r.nextBoolean()) '1' else '0').mkString
  }

  private def flip(s: String, i: Int): String =
    s.updated(i, if (s(i) == '1') '0' else '1')

  private val genProbeCase: Gen[(List[(Long, String)], List[(Long, String)])] = for {
    nOld <- Gen.choose(8, 24)
    nNew <- Gen.choose(3, 10)
    copies <- Gen.choose(0, 3)
    edits <- Gen.choose(0, 3)
    editPos <- Gen.choose(0, 63)
    seed <- Gen.choose(0, 1000)
  } yield {
    val old = (1 to nOld).map(i => (i.toLong, bits(seed + i))).toList
    val fresh = (1 to nNew).map(i => (1000L + i, bits(seed + 500 + i))).toList ++
      (1 to copies).map(c => (2000L + c, bits(seed + (c % nOld) + 1))).toList ++
      (1 to edits).map(c =>
        (3000L + c, flip(bits(seed + (c * 3 % nOld) + 1), editPos))).toList
    (old, fresh)
  }

  property("indexed cross-set probe ≡ hammingPairsDelta, any frames, with/without literals") =
    forAll(genProbeCase) { case (old, fresh) =>
      import spark.implicits._
      val fpOld = old.toDF("asset_id", "simhash")
      val fpNew = fresh.toDF("asset_id", "simhash")
      val expected = Dedup.hammingPairsDelta(fpNew, fpOld, "asset_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val oldBlocks = Dedup.blockRows(fpOld, "asset_id", "p|")
      val keys = Dedup.blockRows(fpNew, "asset_id", "p|")
        .select("bk").distinct().collect().map(_.getString(0)).toSeq
      Seq(None, Some(keys)).forall { pk =>
        Dedup.hammingPairsDeltaIndexed(
            fpNew, oldBlocks, "asset_id", prefix = "p|", probeKeys = pk)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet == expected
      }
    }

  private val genZoneCase: Gen[(List[Long], List[Long], Int)] = for {
    n <- Gen.choose(30, 120)
    rowsPerFile <- Gen.choose(5, 25)
    nKeys <- Gen.choose(0, 8)
    keys <- Gen.listOfN(nKeys, Gen.choose(-10L, 150L))
  } yield ((1L to n).toList, keys, rowsPerFile)

  property("zone-pruned read is lossless: pruned ∩ keys ≡ full ∩ keys, any keys") =
    forAll(genZoneCase) { case (ids, keys, rowsPerFile) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val store = SparkFixture.tempDir("p14-zone")
      StandingState.writeTables(store, Seq(StandingState.TableSpec(
        "t", ids.map(i => (i, s"payload $i")).toDF("id", "payload"), "id")),
        targetRowsPerFile = rowsPerFile.toLong)
      val pruned = StandingState.readTablePruned(spark, store, "t", keys)
      val full = StandingState.readTable(spark, store, "t")
      def hit(df: org.apache.spark.sql.DataFrame) =
        (if (keys.isEmpty) df.filter(org.apache.spark.sql.functions.lit(false))
         else df.filter(col("id").isin(keys: _*)))
          .collect().map(_.getLong(0)).sorted.toSeq
      hit(pruned) == hit(full)
    }
}
