package graft.sources.dsv2

import graft.sources.ReadPlanner
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile

/** One page of a segment read: the server-filtered records plus a
  * continuation token for the next call (None = segment exhausted).
  * Mirrors a DynamoDB scan/query page — `Items` + `LastEvaluatedKey`;
  * a non-empty token with an empty record list is legal (the server
  * scanned a page's worth of rows none of which matched the filter).
  *
  * The token is OPAQUE to the engine — a transport-defined string. The
  * stub transports encode a stream position; a cloud adapter carries the
  * service's own resume key verbatim (DynamoDB `LastEvaluatedKey` is a
  * key-attribute map, not a number — an earlier Long-typed token could
  * not have round-tripped it, which is exactly the kind of seam defect
  * only a real second implementation surfaces). */
case class NearlinePage(records: Seq[Map[String, Any]], nextToken: Option[String])

/** A live paged read over one segment. May hold transport-side state (an
  * open reader / HTTP connection), so the happy path streams: each
  * [[nextPage]] costs O(pageSize), not O(position). Failure recovery does
  * NOT rely on session state — the caller closes the failed session and
  * opens a new one from the last token it received, which must continue
  * the read exactly (no drops, no duplicates). */
trait NearlineSession extends AutoCloseable {
  def nextPage(): NearlinePage
  override def close(): Unit = ()
}

/** Operational transport contract of the nearline store — the seam a real
  * SDK-backed client implements (`DynamoRecordReader.java:115-247`):
  *
  *   - **Paging**: the server returns at most `pageSize` matching records
  *     per call (reference default ~100 rows/page,
  *     `ParallelScanProperties.java:23-24`); the reader must loop.
  *   - **Continuation tokens**: each page carries an opaque resume point;
  *     a page call is a pure function of (read, segment, token), so a
  *     failed call can be retried from the same token without dropping or
  *     duplicating records. Resume MUST be cheap — Dynamo's
  *     `ExclusiveStartKey` is an O(1) server-side seek, and the round-3
  *     bench collapse (596× on one query) came from a stub whose resume
  *     was O(token). [[ParquetTransport]] now seeks by file via parquet
  *     footer row counts, so a resume decodes at most one file's prefix.
  *   - **Streaming happy path**: [[NearlineTransport.open]] returns a
  *     [[NearlineSession]] that holds the reader open across pages; the
  *     token-resume path is only paid on failure (retry = close + re-open
  *     from the last good token).
  *   - **Server-side filtering**: key conditions and filter expressions
  *     evaluate *inside* the transport (the "server"), exactly like
  *     Dynamo filter expressions — the engine never sees non-matching
  *     rows and does not re-check convertible filters.
  *
  * Implementations must be `Serializable` (instantiated driver-side per
  * scan, shipped to executors inside the reader factory); all resume
  * state lives in the token, never in transport fields. */
trait NearlineTransport extends Serializable {
  def page(
      path: String,
      read: ReadPlanner.Read,
      hashKey: String,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[String],
      pageSize: Int): NearlinePage

  /** Open a live paged read resuming from `token`. Default implementation
    * is a stateless pure re-issue of [[page]] per call — correct for any
    * transport; streaming transports override for O(pageSize) pages. */
  def open(
      path: String,
      read: ReadPlanner.Read,
      hashKey: String,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[String],
      pageSize: Int): NearlineSession = {
    val t = this
    new NearlineSession {
      private var tok = token
      override def nextPage(): NearlinePage = {
        val p = t.page(path, read, hashKey, sortKey, segment, numSegments, tok, pageSize)
        tok = p.nextToken
        p
      }
    }
  }
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
  * underlying table consumed so far, across files in sorted-name order).
  *
  * Cost model (the part that must mirror the real SDK, not just its
  * results): a streaming session decodes each row exactly once across the
  * whole segment read — O(pageSize) per page. A cold token resume (the
  * retry path, or a bare [[page]] call) skips whole files by their footer
  * row counts (metadata only, cached) and decodes at most the prefix of
  * the one file containing the token — never the entire preceding
  * stream. */
class ParquetTransport extends NearlineTransport {

  /** Hook: called once per decoded row (pre-filter). The linearity spec
    * overrides this to pin "rows decoded ≤ rows in table" for a full
    * segment read — the property whose absence shipped a quadratic. */
  protected def onRowDecoded(): Unit = ()

  override def page(
      path: String,
      read: ReadPlanner.Read,
      hashKey: String,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[String],
      pageSize: Int): NearlinePage = {
    val s = open(path, read, hashKey, sortKey, segment, numSegments, token, pageSize)
    try s.nextPage() finally s.close()
  }

  override def open(
      path: String,
      read: ReadPlanner.Read,
      hashKey: String,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[String],
      pageSize: Int): NearlineSession =
    new ParquetPagedSession(this, path, read, hashKey, sortKey,
      segment, numSegments, token.map(_.toLong).getOrElse(0L), pageSize)

  private[dsv2] def rowDecoded(): Unit = onRowDecoded()
}

object ParquetTransport {
  /** Footer row counts per part file (metadata read, cached — Spark part
    * file names are unique per write, so entries never go stale). */
  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def rowCount(file: String): Long =
    rowCountCache.computeIfAbsent(file, f => {
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), new Configuration()))
      try r.getRecordCount finally r.close()
    })
}

/** Streaming paged read over one segment of a parquet-stubbed table.
  * Holds the current file's reader open across pages; `startToken` seeks
  * by skipping whole files via footer row counts, then decode-discarding
  * only within the file containing the token. */
private[dsv2] class ParquetPagedSession(
    transport: ParquetTransport,
    path: String,
    read: ReadPlanner.Read,
    hashKey: String,
    sortKey: String,
    segment: Int,
    numSegments: Int,
    startToken: Long,
    pageSize: Int) extends NearlineSession {

  private val segKey: String =
    ParquetSegmentService.segmentKeyFor(read, hashKey, sortKey)

  private val files: IndexedSeq[String] =
    ParquetSegmentService.partFiles(path).toIndexedSeq
  private var fileIdx = 0
  private var reader: ParquetReader[org.apache.parquet.example.data.Group] = _
  private var globalIdx = 0L // rows of the raw stream consumed so far

  // ---- seek: skip whole files by metadata row counts, decode only the
  // ---- remainder within the file containing startToken
  locally {
    var remaining = startToken
    while (fileIdx < files.length && remaining >= ParquetTransport.rowCount(files(fileIdx))) {
      remaining -= ParquetTransport.rowCount(files(fileIdx))
      globalIdx += ParquetTransport.rowCount(files(fileIdx))
      fileIdx += 1
    }
    if (fileIdx < files.length) {
      openCurrent()
      var skipped = 0L
      while (skipped < remaining && reader.read() != null) {
        transport.rowDecoded()
        skipped += 1
        globalIdx += 1
      }
    }
  }

  private def openCurrent(): Unit =
    reader = ParquetReader.builder(new GroupReadSupport(), new Path(files(fileIdx))).build()

  /** Next raw group, advancing across files; null = stream exhausted. */
  private def nextGroup(): org.apache.parquet.example.data.Group = {
    while (fileIdx < files.length) {
      if (reader == null) openCurrent()
      val g = reader.read()
      if (g != null) { transport.rowDecoded(); globalIdx += 1; return g }
      reader.close(); reader = null; fileIdx += 1
    }
    null
  }

  override def nextPage(): NearlinePage = {
    val buf = Vector.newBuilder[Map[String, Any]]
    var matched = 0
    var g = if (fileIdx < files.length) nextGroup() else null
    while (g != null && matched < pageSize) {
      // segment check on the raw key FIRST: (S−1)/S of the stream fails
      // it, and materializing a full record map for those rows made the
      // stub server's aggregate cost S × N record conversions — the term
      // that amplified 39× under machine contention (r11 adjudication)
      if (ParquetSegmentService.inSegmentValue(
          ParquetSegmentService.segKeyString(g, segKey), segment, numSegments)) {
        val rec = ParquetSegmentService.groupToMap(g)
        if (ParquetSegmentService.evalRead(read, rec, hashKey, sortKey)) {
          buf += rec
          matched += 1
        }
      }
      g = if (matched == pageSize) null else nextGroup()
    }
    // a full page may sit exactly at stream end — the follow-up call
    // returns (Nil, None), like Dynamo's possible empty final page
    NearlinePage(buf.result(), if (matched == pageSize) Some(globalIdx.toString) else None)
  }

  override def close(): Unit = {
    if (reader != null) { reader.close(); reader = null }
  }
}

/** Executor-side record stream over a segment: streams transport pages
  * from an open session; a transient failure (throttle, connection reset)
  * closes the session and re-opens from the last good continuation token —
  * the pure re-issue the token contract guarantees — so a failure costs
  * one resume, not the scan. `MaxAttempts` consecutive failures on one
  * page abandon the task (Spark then retries the whole partition, the
  * correct escalation). */
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
    extends Iterator[Map[String, Any]] with AutoCloseable {

  private var token: Option[String] = None
  private var exhausted = false
  private var current: Iterator[Map[String, Any]] = Iterator.empty
  private var session: NearlineSession = _

  private def fetchPageWithRetry(): NearlinePage = {
    var attempt = 1
    while (true) {
      try {
        if (session == null)
          session = transport.open(
            path, read, hashKey, sortKey, segment, numSegments, token, pageSize)
        return session.nextPage()
      } catch {
        case e: Exception =>
          if (session != null) {
            try session.close() catch { case _: Exception => () }
            session = null // re-open from the last good token on next attempt
          }
          if (attempt >= maxAttempts)
            throw new RuntimeException(
              s"nearline segment $segment/$numSegments failed after $maxAttempts attempts", e)
          attempt += 1
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
      if (exhausted && session != null) {
        try session.close() catch { case _: Exception => () }
        session = null
      }
    }
    current.hasNext
  }

  override def next(): Map[String, Any] = {
    if (!hasNext) throw new NoSuchElementException
    current.next()
  }

  /** Close the live transport session, if any. Sessions self-close on
    * segment exhaustion, but an early-terminated scan (LIMIT, task kill)
    * abandons the iterator mid-stream — the partition reader's close()
    * must release the open file handle / connection here. */
  override def close(): Unit = {
    if (session != null) {
      try session.close() catch { case _: Exception => () }
      session = null
    }
  }
}
