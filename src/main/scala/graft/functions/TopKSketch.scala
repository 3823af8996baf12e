package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * native Spark aggregate — the §2.10 "UDAF" tier: a
  * `TypedImperativeAggregate` whose buffer is a bounded counter table, so
  * top-k-by-count over a 100 TB column needs ONE pass and ONE shuffle of
  * fixed-size sketches instead of a full `groupBy(count)` shuffle of every
  * distinct item plus a top-k. The reference delegates all aggregation to
  * Drill; this is capability the training-pipeline side adds
  * (most-common-tokens / boilerplate detection at corpus scale).
  *
  * Guarantees (standard SpaceSaving, preserved through merge):
  *   - reported count ≥ true count (never undercounts);
  *   - reported count − err ≤ true count (err bounds the overcount);
  *   - if `capacity` ≥ the number of distinct items seen by every partial
  *     buffer, no eviction happens, err = 0, and results are EXACT —
  *     which is what makes the oracle query checkable against a plain
  *     GROUP BY count in DuckDB.
  *
  * Merge is the floor-carrying union: an item absent from one side
  * contributes that side's eviction floor to both count and error, then
  * the union is trimmed back to capacity. Eviction picks the minimum
  * count (ties: lexicographically smallest item) so same-input buffers
  * behave identically; in the exact regime output is fully deterministic
  * under any partitioning.
  *
  * The O(capacity) eviction scan is fine for the capacities this engine
  * uses (≤ 64k); a production stream-summary structure would make it
  * O(1) amortized without changing any semantics pinned here.
  */
final class SpaceSavingBuffer(val capacity: Int) extends Serializable {
  /** item → [count, err] */
  val counts = new java.util.HashMap[String, Array[Long]]()
  /** Max count ever evicted from this buffer (0 until first eviction). */
  var floor: Long = 0L

  def add(item: String, by: Long = 1L): Unit = {
    val cur = counts.get(item)
    if (cur != null) cur(0) += by
    else if (counts.size < capacity) counts.put(item, Array(by, 0L))
    else {
      val (minKey, minCnt) = minEntry()
      counts.remove(minKey)
      if (minCnt > floor) floor = minCnt
      counts.put(item, Array(minCnt + by, minCnt))
    }
  }

  private def minEntry(): (String, Long) = {
    var mk: String = null
    var mc = Long.MaxValue
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c < mc || (c == mc && (mk == null || e.getKey.compareTo(mk) < 0))) {
        mc = c; mk = e.getKey
      }
    }
    (mk, mc)
  }

  def merge(other: SpaceSavingBuffer): Unit = {
    val merged = new java.util.HashMap[String, Array[Long]]()
    val keys = new java.util.HashSet[String](counts.keySet())
    keys.addAll(other.counts.keySet())
    val it = keys.iterator()
    while (it.hasNext) {
      val k = it.next()
      val a = counts.get(k)
      val b = other.counts.get(k)
      val cnt = (if (a != null) a(0) else floor) + (if (b != null) b(0) else other.floor)
      val err = (if (a != null) a(1) else floor) + (if (b != null) b(1) else other.floor)
      merged.put(k, Array(cnt, err))
    }
    floor += other.floor
    counts.clear()
    if (merged.size() <= capacity) counts.putAll(merged)
    else {
      // keep top-capacity by (count desc, item asc); evicted raise the floor
      val entries = new java.util.ArrayList(merged.entrySet())
      entries.sort { (x, y) =>
        val c = java.lang.Long.compare(y.getValue()(0), x.getValue()(0))
        if (c != 0) c else x.getKey.compareTo(y.getKey)
      }
      var i = 0
      while (i < entries.size()) {
        val e = entries.get(i)
        if (i < capacity) counts.put(e.getKey, e.getValue)
        else if (e.getValue()(0) > floor) floor = e.getValue()(0)
        i += 1
      }
    }
  }

  /** Top-k rows by (count desc, item asc). */
  def topK(k: Int): Seq[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    counts.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue()(0), e.getValue()(1)))
      .sortBy { case (item, cnt, _) => (-cnt, item) }
      .take(k)
  }
}

case class TopKCountSketch(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0 && capacity >= k)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (string, k > 0, capacity >= k); got " +
        s"${child.dataType.simpleString}, k=$k, capacity=$capacity")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    b.merge(o); b
  }

  override def eval(b: SpaceSavingBuffer): Any =
    new GenericArrayData(b.topK(k).map { case (item, cnt, err) =>
      InternalRow(UTF8String.fromString(item), cnt, err)
    }.toArray[Any])

  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.capacity)
    out.writeLong(b.floor)
    out.writeInt(b.counts.size())
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new SpaceSavingBuffer(in.readInt())
    b.floor = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      b.counts.put(new String(kb, "UTF-8"), Array(in.readLong(), in.readLong()))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKCountSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKCountSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKCountSketch =
    copy(child = c)
  override def prettyName: String = "graft_topk"
}
