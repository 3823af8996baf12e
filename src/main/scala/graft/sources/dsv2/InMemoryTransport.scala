package graft.sources.dsv2

import graft.sources.ReadPlanner
import org.apache.spark.sql.types.StructType
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** A second, non-parquet nearline backend: an in-process table registry
  * addressed by `mem://<name>` paths. It exists to validate the transport
  * SDK seam with an implementation whose resume cost model matches the
  * real service — a DynamoDB `ExclusiveStartKey` resume is an O(1) seek,
  * and this store's continuation token is a direct row index, so resuming
  * from any token touches zero preceding rows. The round-3 regression
  * shipped because the only transport's resume cost (O(token)) silently
  * diverged from the contract; [[InMemoryStore.rowsTouched]] lets specs
  * pin the O(1) property so a second divergence can't.
  *
  * Planning is identical to the parquet stub — same schema/count
  * metadata surface ([[StubService]] routes `mem://` paths here), same
  * server-side filter evaluation, same segment assignment
  * ([[ParquetSegmentService.segmentKeyFor]]) — only the storage differs,
  * which is exactly the claim the seam makes. */
object InMemoryStore {
  final case class Table(schema: StructType, rows: IndexedSeq[Map[String, Any]])

  private val tables = new ConcurrentHashMap[String, Table]()

  /** Rows examined across all page calls (filter evaluations, NOT resume
    * skips — there are none). Specs reset + read it to pin linearity. */
  val rowsTouched = new AtomicLong(0)

  def register(name: String, schema: StructType, rows: Seq[Map[String, Any]]): Unit =
    tables.put(name, Table(schema, rows.toIndexedSeq))

  def drop(name: String): Unit = tables.remove(name)

  def apply(path: String): Table = {
    val t = tables.get(path)
    if (t == null) throw new IllegalArgumentException(s"no in-memory table: $path")
    t
  }

  def isMemPath(path: String): Boolean = path != null && path.startsWith("mem://")
}

/** Transport over [[InMemoryStore]]: the continuation token indexes the
  * backing row sequence directly, so a page call costs O(rows examined for
  * this page) regardless of the token's position — the O(1)-resume
  * contract (`DynamoRecordReader.java:115-247`). No streaming session
  * override is needed: the default pure re-issue per page is already
  * optimal when resume is free, which is the point. */
class InMemoryTransport extends NearlineTransport {

  override def page(
      path: String,
      read: ReadPlanner.Read,
      hashKey: String,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[String],
      pageSize: Int): NearlinePage = {
    val table = InMemoryStore(path)
    val segKey = ParquetSegmentService.segmentKeyFor(read, hashKey, sortKey)
    val buf = Vector.newBuilder[Map[String, Any]]
    var matched = 0
    var idx = token.map(_.toInt).getOrElse(0) // O(1) resume: direct index
    val n = table.rows.length
    while (idx < n && matched < pageSize) {
      val rec = table.rows(idx)
      InMemoryStore.rowsTouched.incrementAndGet()
      if (ParquetSegmentService.inSegment(rec, segKey, segment, numSegments) &&
          ParquetSegmentService.evalRead(read, rec, hashKey, sortKey)) {
        buf += rec
        matched += 1
      }
      idx += 1
    }
    NearlinePage(buf.result(), if (matched == pageSize) Some(idx.toString) else None)
  }
}
