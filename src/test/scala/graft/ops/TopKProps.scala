package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions.{col, row_number}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for the generalized two-phase per-key top-k: on ANY
  * distribution of rows over keys — including everything on one hot
  * key — and any cap, the result must equal the naive global
  * window's, rank for rank. The phase-1 pre-cap is a pure superset
  * optimization; this is the proof-by-sampling that it never drops a
  * global champion. */
object TopKProps extends Properties("TopKPerKey") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkFixture.spark

  private val genWorld: Gen[(List[(String, Long, Long)], Int)] = for {
    n <- Gen.choose(0, 120)
    keys <- Gen.choose(1, 4) // few keys → hot keys by construction
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, keys - 1)
      v <- Gen.choose(0L, 30L) // narrow value range → plenty of ties
    } yield (s"k$k", v)) // id assigned below for a deterministic tiebreak
    cap <- Gen.choose(1, 12)
  } yield (rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }, cap)

  property("equals the naive global window for any key skew, cap, and ties") =
    forAll(genWorld) { case (rows, cap) =>
      import spark.implicits._
      val df = rows.toDF("k", "v", "id").repartition(7) // spread phase-1 partitions
      val order = Seq(col("v").desc, col("id").asc)
      val got = Retrieval.topKPerKey(df, Seq("k"), order, cap)
        .select("k", "id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val naive = df.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy(order: _*))
          .cast("long"))
        .filter(col("rank") <= cap)
        .select("k", "id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      got == naive
    }
}
