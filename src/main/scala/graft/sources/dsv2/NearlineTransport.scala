package graft.sources.dsv2

import graft.sources.ReadPlanner
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

/** One page of a segment read: the server-filtered records plus a
  * continuation token for the next call (None = segment exhausted).
  * Mirrors a DynamoDB scan/query page — `Items` + `LastEvaluatedKey`;
  * a non-empty token with an empty record list is legal (the server
  * scanned a page's worth of rows none of which matched the filter). */
case class NearlinePage(records: Seq[Map[String, Any]], nextToken: Option[Long])

/** Operational transport contract of the nearline store — the seam a real
  * SDK-backed client implements (`DynamoRecordReader.java:115-247`):
  *
  *   - **Paging**: the server returns at most `pageSize` matching records
  *     per call (reference default ~100 rows/page,
  *     `ParallelScanProperties.java:23-24`); the reader must loop.
  *   - **Continuation tokens**: each page carries an opaque resume point;
  *     a page call is a pure function of (read, segment, token), so a
  *     failed call can be retried from the same token without dropping or
  *     duplicating records.
  *   - **Server-side filtering**: key conditions and filter expressions
  *     evaluate *inside* the transport (the "server"), exactly like
  *     Dynamo filter expressions — the engine never sees non-matching
  *     rows and does not re-check convertible filters.
  *
  * Implementations must be `Serializable` (instantiated driver-side per
  * scan, shipped to executors inside the reader factory) and stateless
  * across calls — all resume state lives in the token. */
trait NearlineTransport extends Serializable {
  def page(
      path: String,
      read: ReadPlanner.Read,
      hashKey: String,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[Long],
      pageSize: Int): NearlinePage
}

object NearlineTransport {
  /** Reference default page size (`ParallelScanProperties.java:23-24`). */
  val DefaultPageSize = 100
  /** Per-page attempts before a segment read is abandoned. */
  val MaxAttempts = 3

  /** Instantiate a transport by class name (the DSv2 `transport` option —
    * how a real SDK client swaps in without touching planning). */
  def forName(className: String): NearlineTransport =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[NearlineTransport]
}

/** The stubbed "service": pages come straight off the table's parquet
  * files. The continuation token is the raw-stream position (rows of the
  * underlying table consumed so far); every call re-opens from the token,
  * so readers never hold state across pages and a retry is an identical
  * re-issue — the same property a real Dynamo `ExclusiveStartKey` gives.
  * Scan cost per page is O(token) in this stub (parquet has no random
  * row access worth wiring here); the real SDK resumes in O(1). */
class ParquetTransport extends NearlineTransport {

  override def page(
      path: String,
      read: ReadPlanner.Read,
      hashKey: String,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[Long],
      pageSize: Int): NearlinePage = {
    val start = token.getOrElse(0L)
    val buf = Vector.newBuilder[Map[String, Any]]
    var matched = 0
    var idx = 0L
    var full = false
    val files = ParquetSegmentService.partFiles(path).iterator
    while (files.hasNext && !full) {
      val reader =
        ParquetReader.builder(new GroupReadSupport(), new Path(files.next())).build()
      try {
        var g = reader.read()
        while (g != null && !full) {
          if (idx >= start) {
            val rec = ParquetSegmentService.groupToMap(g)
            if (ParquetSegmentService.inSegment(rec, hashKey, segment, numSegments) &&
                ParquetSegmentService.evalRead(read, rec, hashKey, sortKey)) {
              buf += rec
              matched += 1
              if (matched == pageSize) full = true
            }
          }
          idx += 1
          g = if (full) null else reader.read()
        }
      } finally reader.close() // close even when a page ends mid-file
    }
    // a full page may sit exactly at stream end — the follow-up call
    // returns (Nil, None), like Dynamo's possible empty final page
    NearlinePage(buf.result(), if (full) Some(idx) else None)
  }
}

/** Executor-side record stream over a segment: loops transport pages with
  * per-page retry from the same continuation token. A transient segment
  * failure (throttle, connection reset) costs one re-issued page, not the
  * scan; `MaxAttempts` consecutive failures on one page abandon the task
  * (Spark then retries the whole partition, the correct escalation). */
class PagedSegmentIterator(
    transport: NearlineTransport,
    path: String,
    read: ReadPlanner.Read,
    hashKey: String,
    sortKey: String,
    segment: Int,
    numSegments: Int,
    pageSize: Int = NearlineTransport.DefaultPageSize,
    maxAttempts: Int = NearlineTransport.MaxAttempts)
    extends Iterator[Map[String, Any]] {

  private var token: Option[Long] = None
  private var exhausted = false
  private var current: Iterator[Map[String, Any]] = Iterator.empty

  private def fetchPageWithRetry(): NearlinePage = {
    var attempt = 1
    while (true) {
      try return transport.page(
        path, read, hashKey, sortKey, segment, numSegments, token, pageSize)
      catch {
        case e: Exception if attempt < maxAttempts => attempt += 1
        case e: Exception =>
          throw new RuntimeException(
            s"nearline segment $segment/$numSegments failed after $maxAttempts attempts", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def hasNext: Boolean = {
    while (!current.hasNext && !exhausted) {
      val p = fetchPageWithRetry()
      current = p.records.iterator
      token = p.nextToken
      exhausted = p.nextToken.isEmpty
    }
    current.hasNext
  }

  override def next(): Map[String, Any] = {
    if (!hasNext) throw new NoSuchElementException
    current.next()
  }
}
