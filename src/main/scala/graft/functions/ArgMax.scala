package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Fixed-buffer argmax for the nearest-centroid reduction: of a group's
  * (cid INT, s DOUBLE) rows, the cid with the LARGEST s, smallest cid
  * on ties — exactly `max(struct(s, -cid))` re-expressed with a
  * 13-byte mutable buffer so Spark plans it as **ObjectHashAggregate**
  * with map-side partial combine.
  *
  * Why this exists: `max` over a STRUCT type cannot use a hash
  * aggregate (struct agg buffers aren't mutable fixed-width), so Spark
  * falls back to SortAggregate — which SORTS the whole pre-aggregation
  * stream. The centroid-assignment stream is N·C rows (every vector ×
  * every centroid): at the 10× vector soak (158k × 640 cells ≈ 100M
  * rows) the partial sort spilled 3.7 GB; at a 10⁹-vector deployment
  * it would sort ~10¹³ rows. With a hash-combinable argmax the
  * broadcast-join → project → partial-agg pipeline collapses the C
  * rows per vector map-side and only one (id, cell) row per vector
  * ever shuffles — the shape [[graft.ops.Similarity.assignCells]]'s
  * doc always promised.
  *
  * Double ordering mirrors Spark's SQL comparator: `±0.0` equal, NaN
  * greatest — so the result is bit-identical to the `max(struct)`
  * form on every input, ties included (the DuckDB oracles pin this). */
final class ArgMaxBuffer extends Serializable {
  var has: Boolean = false
  var bestS: Double = Double.NegativeInfinity
  var bestCid: Int = 0

  @inline private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b) // ±0.0 equal, NaN largest

  def add(cid: Int, s: Double): Unit = {
    if (!has) { has = true; bestS = s; bestCid = cid }
    else {
      val c = cmp(s, bestS)
      if (c > 0 || (c == 0 && cid < bestCid)) { bestS = s; bestCid = cid }
    }
  }

  def merge(o: ArgMaxBuffer): Unit = if (o.has) add(o.bestCid, o.bestS)
}

case class ArgMaxCell(
    cidExpr: Expression,
    scoreExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgMaxBuffer] with BinaryLike[Expression] {

  override def left: Expression = cidExpr
  override def right: Expression = scoreExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (cidExpr.dataType == IntegerType && scoreExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax expects (int, double); got " +
        s"${cidExpr.dataType.simpleString}, ${scoreExpr.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): ArgMaxBuffer = new ArgMaxBuffer

  override def update(b: ArgMaxBuffer, input: InternalRow): ArgMaxBuffer = {
    val cid = cidExpr.eval(input)
    val s = scoreExpr.eval(input)
    if (cid != null && s != null)
      b.add(cid.asInstanceOf[Int], s.asInstanceOf[Double])
    b
  }

  override def merge(b: ArgMaxBuffer, o: ArgMaxBuffer): ArgMaxBuffer = {
    b.merge(o); b
  }

  override def eval(b: ArgMaxBuffer): Any = if (b.has) b.bestCid else null

  override def serialize(b: ArgMaxBuffer): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13)
    out.put(if (b.has) 1.toByte else 0.toByte)
    out.putDouble(b.bestS)
    out.putInt(b.bestCid)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val b = new ArgMaxBuffer
    b.has = in.get() == 1
    b.bestS = in.getDouble()
    b.bestCid = in.getInt()
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgMaxCell =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgMaxCell =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ArgMaxCell =
    copy(cidExpr = l, scoreExpr = r)
  override def prettyName: String = "graft_argmax"
}
