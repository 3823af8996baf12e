package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM pins for the log-histogram buffer behind the `graft_quantile`
  * aggregate ([[LogQuantileSketch]]): the merge is the histogram monoid
  * (commutative; any partitioning of the input merges to the single-pass
  * buffer), the midpoint estimate honors the ≤ 25% relative-error
  * contract on positive longs, and non-positive inputs are dropped per
  * the [[graft.ops.Quantile.logHist]] contract. These are exactly the
  * guarantees that make the TypedImperativeAggregate's value
  * partition-independent on a cluster — pinned here without a
  * SparkSession so they run on every buffer shape ScalaCheck can build,
  * not just the fixture's. */
object QuantileProps extends Properties("QuantileSketch") {

  private def buf(vs: Seq[Long]): LogHistBuffer = {
    val b = new LogHistBuffer
    vs.foreach(b.add(_))
    b
  }

  private val genVals: Gen[List[Long]] =
    Gen.listOf(Gen.oneOf(Gen.choose(-5L, 0L), Gen.choose(1L, 1L << 40)))

  property("merge of ANY split == single-pass buffer, cellwise") =
    forAll(genVals, Gen.choose(1, 7)) { (vs, k) =>
      val whole = buf(vs)
      val chunk = math.max(1, (vs.size + k - 1) / k)
      val parts = vs.grouped(chunk).map(buf).toList
      val merged = parts.foldLeft(new LogHistBuffer) { (a, b) => a.merge(b); a }
      merged.cnt.toSeq == whole.cnt.toSeq
    }

  property("merge is commutative") =
    forAll(genVals, genVals) { (a, b) =>
      val ab = buf(a); ab.merge(buf(b))
      val ba = buf(b); ba.merge(buf(a))
      ab.cnt.toSeq == ba.cnt.toSeq
    }

  property("estimate within 25% of the exact ceil-rank quantile, positive inputs") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 1L << 30)), Gen.choose(0.01, 1.0)) {
      (vs, q) =>
        val est = buf(vs).estimate(q).get
        val sorted = vs.sorted
        val target = math.max(1L, math.ceil(vs.size * q).toLong)
        val exact = sorted((target - 1).toInt).toDouble
        math.abs(est - exact) / exact <= 0.25 + 1e-9
    }

  property("non-positive inputs dropped; all-dropped sketch estimates None") =
    forAll(Gen.listOf(Gen.choose(-100L, 0L))) { vs =>
      buf(vs).estimate(0.5).isEmpty
    }
}
