package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** The engine's log-histogram quantile sketch ([[graft.ops.Quantile]])
  * as a native SQL aggregate — the second pipeline operator on the
  * tenant surface beside [[HllDistinctSketch]]: a
  * `TypedImperativeAggregate` whose buffer is the fixed 126-bucket
  * count array merged by cellwise sum (the histogram monoid), so the
  * shuffle carries ≤ ~1 KB per group whatever the row count.
  *
  * BIT-REPRODUCIBLE with [[graft.ops.Quantile.quantileEstimates]] by
  * construction: identical bucket rule (octave = bit length of the
  * positive long, half = its second-most-significant bit — two buckets
  * per power of two, ≤ 25% relative error at the midpoint), identical
  * first-bucket-reaching-⌈q·N⌉ selection, identical midpoint estimate.
  * Bucket math is pure integer ops, so the value a tenant reads over
  * the wire is the value the oracle-checked `quantile_sketch` pipeline
  * query computes, under ANY partitioning. Non-positive and null
  * inputs are dropped (the [[graft.ops.Quantile.logHist]] contract);
  * an all-dropped group evaluates to null. */
final class LogHistBuffer extends Serializable {
  // index (oct-1)*2 + half; oct ∈ [1, 63] for positive longs
  val cnt: Array[Long] = new Array[Long](126)

  def add(v: Long): Unit = if (v > 0) {
    val oct = 64 - java.lang.Long.numberOfLeadingZeros(v)
    val half = if (oct == 1) 0 else ((v >>> (oct - 2)) & 1L).toInt
    cnt((oct - 1) * 2 + half) += 1
  }

  def merge(o: LogHistBuffer): Unit = {
    var i = 0
    while (i < 126) { cnt(i) += o.cnt(i); i += 1 }
  }

  /** First bucket whose cumulative count reaches ⌈q·N⌉, midpoint
    * estimate — the [[graft.ops.Quantile.quantileEstimates]] walk in
    * scalar form. Null (None) on an empty sketch. */
  def estimate(q: Double): Option[Double] = {
    var n = 0L
    var i = 0
    while (i < 126) { n += cnt(i); i += 1 }
    if (n == 0L) return None
    val target = math.ceil(n * q).toLong
    var cum = 0L
    i = 0
    while (i < 126) {
      cum += cnt(i)
      if (cnt(i) > 0 && cum >= target) {
        val oct = i / 2 + 1
        val half = i % 2
        val est =
          if (oct == 1) 1.0
          else math.pow(2.0, oct - 1) + half * math.pow(2.0, oct - 2) +
            math.pow(2.0, oct - 2) / 2.0
        return Some(est)
      }
      i += 1
    }
    None // unreachable: cum reaches n ≥ target on the last occupied bucket
  }
}

case class LogQuantileSketch(
    child: Expression,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LogHistBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_quantile expects a bigint value (cast it); got " +
          child.dataType.simpleString)
    else if (!(q >= 0.0 && q <= 1.0)) // negated-conjunction form so NaN fails too
      TypeCheckResult.TypeCheckFailure(s"graft_quantile q must be in [0, 1]; got $q")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): LogHistBuffer = new LogHistBuffer

  override def update(b: LogHistBuffer, input: InternalRow): LogHistBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: LogHistBuffer, o: LogHistBuffer): LogHistBuffer = {
    b.merge(o); b
  }

  override def eval(b: LogHistBuffer): Any = b.estimate(q).orNull

  override def serialize(b: LogHistBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(126 * 8)
    b.cnt.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LogHistBuffer = {
    val b = new LogHistBuffer
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < 126) { b.cnt(i) = bb.getLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): LogQuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LogQuantileSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): LogQuantileSketch =
    copy(child = c)
  override def prettyName: String = "graft_quantile"
}
