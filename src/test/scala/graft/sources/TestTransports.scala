package graft.sources

import graft.sources.dsv2.{NearlinePage, NearlineSession, NearlineTransport, ParquetTransport}
import graft.sources.ReadPlanner
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Fault-injection / instrumentation transports for the connector specs —
  * instantiated by class name through the DSv2 `transport` option,
  * exactly like a real SDK client would be. */
object FlakyOnceTransport {
  val throwsInjected = new AtomicInteger(0)
  def reset(): Unit = throwsInjected.set(0)
}

/** Fails the first MID-segment page fetch (a page was already delivered,
  * either in this session or before the session was resumed from a
  * token), then behaves normally: proves the reader closes the failed
  * session and resumes from the same continuation token without dropping
  * or duplicating records. */
class FlakyOnceTransport extends ParquetTransport {
  override def open(
      path: String, read: ReadPlanner.Read, hashKey: String, sortKey: String,
      segment: Int, numSegments: Int, token: Option[String], pageSize: Int): NearlineSession = {
    val inner = super.open(path, read, hashKey, sortKey, segment, numSegments, token, pageSize)
    new NearlineSession {
      private var delivered = token.isDefined // resumed ⇒ records already out
      override def nextPage(): NearlinePage = {
        if (delivered && FlakyOnceTransport.throwsInjected.compareAndSet(0, 1))
          throw new RuntimeException("injected transient segment failure (throttle)")
        val p = inner.nextPage()
        delivered = true
        p
      }
      override def close(): Unit = inner.close()
    }
  }
}

/** Every page fetch fails — the reader must exhaust its per-page attempts
  * and abandon the partition (Spark surfaces the task failure). */
class AlwaysFailTransport extends NearlineTransport {
  override def page(
      path: String, read: ReadPlanner.Read, hashKey: String, sortKey: String,
      segment: Int, numSegments: Int, token: Option[String], pageSize: Int): NearlinePage =
    throw new RuntimeException("injected persistent segment failure")
}

/** Counts raw row decodes across all sessions — the linearity pin: a full
  * happy-path segment read must decode each underlying row exactly once
  * (the round-3 quadratic decoded O(N²/pageSize)). */
object CountingTransport {
  val rowsDecoded = new AtomicLong(0)
  val pagesFetched = new AtomicLong(0)
  def reset(): Unit = { rowsDecoded.set(0); pagesFetched.set(0) }
}

class CountingTransport extends ParquetTransport {
  override protected def onRowDecoded(): Unit =
    CountingTransport.rowsDecoded.incrementAndGet()
  override def open(
      path: String, read: ReadPlanner.Read, hashKey: String, sortKey: String,
      segment: Int, numSegments: Int, token: Option[String], pageSize: Int): NearlineSession = {
    val inner = super.open(path, read, hashKey, sortKey, segment, numSegments, token, pageSize)
    new NearlineSession {
      override def nextPage(): NearlinePage = {
        CountingTransport.pagesFetched.incrementAndGet()
        inner.nextPage()
      }
      override def close(): Unit = inner.close()
    }
  }
}
