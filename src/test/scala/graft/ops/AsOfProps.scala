package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for the as-of join's union-and-carry encoding: on ANY
  * timeline, every left row matches exactly the maximum right timestamp
  * at-or-before it for its key (and nothing when no such row exists) —
  * the reference semantics computed naively per row. Timestamps collide
  * across keys and against right rows on purpose; per (key, right-ts)
  * uniqueness (the operator's documented precondition) is enforced by
  * construction. */
object AsOfProps extends Properties("AsOf") {

  // each case runs real Spark jobs; 25 random worlds is plenty of timeline
  // shapes without doubling the suite's wall clock
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private case class World(lefts: List[(Long, Int, Long)],  // id, key, ts
                           rights: List[(Int, Long, Long)]) // key, ts, rid

  private val genWorld: Gen[World] = for {
    nL <- Gen.choose(0, 40)
    nR <- Gen.choose(0, 30)
    keys <- Gen.choose(1, 4)
    lts <- Gen.listOfN(nL, for {
      k <- Gen.choose(0, keys); t <- Gen.choose(0L, 50L) } yield (k, t))
    rts <- Gen.listOfN(nR, for {
      k <- Gen.choose(0, keys); t <- Gen.choose(0L, 50L) } yield (k, t))
  } yield World(
    lts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    // dedup (key, ts) on the right — the operator's precondition
    rts.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) })

  private val leftSchema = StructType(Seq(
    StructField("id", LongType), StructField("k", IntegerType),
    StructField("t", LongType)))
  private val rightSchema = StructType(Seq(
    StructField("k", IntegerType), StructField("t", LongType),
    StructField("rid", LongType)))

  property("every left row carries the max right ts at-or-before, or null") =
    forAll(genWorld) { w =>
      val left = spark.createDataFrame(
        w.lefts.map { case (i, k, t) => Row(i, k, t) }.asJava, leftSchema)
      val right = spark.createDataFrame(
        w.rights.map { case (k, t, r) => Row(k, t, r) }.asJava, rightSchema)
      val got = AsOf.asofJoin(left, right, "k", "t", Seq("rid"))
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Long]))
        .toMap
      val want = w.lefts.map { case (i, k, t) =>
        val best = w.rights.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        i -> best.map(_._3)
      }.toMap
      got == want
    }
}
