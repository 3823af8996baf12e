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

/** Buffer for [[ArgMaxLong]]: the LONG payload of the row with the
  * largest double key, ties to the lowest (or highest) payload. */
final class ArgMaxLongBuffer extends Serializable {
  var has: Boolean = false
  var bestKey: Double = Double.NegativeInfinity
  var bestVal: Long = 0L

  @inline private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b) // ±0.0 equal, NaN largest

  def add(v: Long, key: Double, preferLowValue: Boolean): Unit = {
    if (!has) { has = true; bestKey = key; bestVal = v }
    else {
      val c = cmp(key, bestKey)
      if (c > 0 || (c == 0 &&
          (if (preferLowValue) v < bestVal else v > bestVal))) {
        bestKey = key; bestVal = v
      }
    }
  }

  def merge(o: ArgMaxLongBuffer, preferLowValue: Boolean): Unit =
    if (o.has) add(o.bestVal, o.bestKey, preferLowValue)
}

/** Hash-combinable long-payload argmax — `max/min(struct(key, value))`
  * re-expressed with a 17-byte mutable buffer (ObjectHashAggregate,
  * map-side partial combine) for the corpus-scale argmax reductions
  * a struct extremum would SortAggregate: the standing-cluster
  * latest-revision resolve ([[graft.ops.StandingState]] readClusters —
  * max `_seq`, ties to the HIGHEST cluster) and the per-cluster keeper
  * selections ([[graft.ops.Cluster]] priority/rank keepers — max key,
  * ties to the LOWEST doc id). `preferLowValue` picks the tie side;
  * key ordering mirrors Spark's SQL double comparator (±0.0 equal,
  * NaN greatest), so results are bit-identical to the struct forms. */
case class ArgMaxLong(
    valExpr: Expression,
    keyExpr: Expression,
    preferLowValue: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgMaxLongBuffer] with BinaryLike[Expression] {

  override def left: Expression = valExpr
  override def right: Expression = keyExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (valExpr.dataType == LongType && keyExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax_long expects (long, double); got " +
        s"${valExpr.dataType.simpleString}, ${keyExpr.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): ArgMaxLongBuffer = new ArgMaxLongBuffer

  override def update(b: ArgMaxLongBuffer, input: InternalRow): ArgMaxLongBuffer = {
    val v = valExpr.eval(input)
    val k = keyExpr.eval(input)
    if (v != null && k != null)
      b.add(v.asInstanceOf[Long], k.asInstanceOf[Double], preferLowValue)
    b
  }

  override def merge(b: ArgMaxLongBuffer, o: ArgMaxLongBuffer): ArgMaxLongBuffer = {
    b.merge(o, preferLowValue); b
  }

  override def eval(b: ArgMaxLongBuffer): Any = if (b.has) b.bestVal else null

  override def serialize(b: ArgMaxLongBuffer): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(17)
    out.put(if (b.has) 1.toByte else 0.toByte)
    out.putDouble(b.bestKey)
    out.putLong(b.bestVal)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxLongBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val b = new ArgMaxLongBuffer
    b.has = in.get() == 1
    b.bestKey = in.getDouble()
    b.bestVal = in.getLong()
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgMaxLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgMaxLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ArgMaxLong =
    copy(valExpr = l, keyExpr = r)
  override def prettyName: String = "graft_argmax_long"
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
