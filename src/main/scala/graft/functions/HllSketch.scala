package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's HyperLogLog ([[graft.ops.Hll]]) as a native SQL
  * aggregate — the tenant-surface form of the pipeline op: a
  * `TypedImperativeAggregate` whose buffer is the m-register array
  * merged by per-bucket max (the HLL monoid), so the shuffle carries one
  * fixed m-byte sketch per group whatever the row count, exactly like
  * the DataFrame encoding's groupBy-max.
  *
  * BIT-REPRODUCIBLE with [[graft.ops.Hll.estimate]] by construction:
  * same md5-derived bucket/rank (bucket = first `bBits` of md5(value),
  * rank = 49 − bitlength of the next 48 hash bits, 49 for all-zero),
  * same bias-corrected estimator with the linear-counting branch, same
  * 4-dp HALF_UP rounding — so the value a tenant reads over the wire is
  * the value the oracle-checked pipeline op computes, and unlike library
  * HLLs (approx_count_distinct's HLL++) it is engine-portable and
  * oracle-checkable. Read-only and bounded: the buffer is m ≤ 65536
  * bytes regardless of input. */
final class HllRegisters(val bBits: Int) extends Serializable {
  val m: Int = 1 << bBits
  val regs: Array[Byte] = new Array[Byte](m)

  def add(value: String): Unit = {
    val hex = HllRegisters.md5Hex(value)
    val bucketChars = bBits / 4
    val bucket = Integer.parseInt(hex.substring(0, bucketChars), 16)
    val rem = java.lang.Long.parseLong(hex.substring(bucketChars, bucketChars + 12), 16)
    val rank =
      if (rem == 0L) 49
      else 49 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    if (rank > regs(bucket)) regs(bucket) = rank.toByte
  }

  def merge(o: HllRegisters): Unit = {
    var i = 0
    while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
  }

  /** The [[graft.ops.Hll.estimateFromRegisters]] fold, scalar form. */
  def estimate: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var cnt = 0
    var sumpow = 0.0
    var i = 0
    while (i < m) {
      if (regs(i) > 0) { cnt += 1; sumpow += math.pow(2.0, -regs(i).toDouble) }
      i += 1
    }
    val raw = alpha * m * m / (sumpow + (m - cnt))
    val est =
      if (raw <= 2.5 * m && cnt < m) m.toDouble * math.log(m.toDouble / (m - cnt))
      else raw
    // Spark round(x, 4): BigDecimal HALF_UP on the double's shortest form
    java.math.BigDecimal.valueOf(est)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

object HllRegisters {
  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}

case class HllDistinctSketch(
    child: Expression,
    bBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllRegisters] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_approx_distinct expects a string value (cast it); got " +
          child.dataType.simpleString)
    else if (bBits % 4 != 0 || bBits < 4 || bBits > 16)
      TypeCheckResult.TypeCheckFailure(
        s"graft_approx_distinct bBits must be a multiple of 4 in [4, 16]; got $bBits")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllRegisters = new HllRegisters(bBits)

  override def update(b: HllRegisters, input: InternalRow): HllRegisters = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: HllRegisters, o: HllRegisters): HllRegisters = {
    b.merge(o); b
  }

  override def eval(b: HllRegisters): Any = b.estimate

  override def serialize(b: HllRegisters): Array[Byte] = {
    val out = new Array[Byte](1 + b.m)
    out(0) = b.bBits.toByte
    System.arraycopy(b.regs, 0, out, 1, b.m)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllRegisters = {
    val b = new HllRegisters(bytes(0).toInt)
    System.arraycopy(bytes, 1, b.regs, 0, b.m)
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): HllDistinctSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinctSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllDistinctSketch =
    copy(child = c)
  override def prettyName: String = "graft_approx_distinct"
}
