package graft.sources

import graft.sources.dsv2.{NearlinePage, NearlineTransport, ParquetTransport}
import graft.sources.ReadPlanner
import java.util.concurrent.atomic.AtomicInteger

/** Fault-injection transports for the connector specs — instantiated by
  * class name through the DSv2 `transport` option, exactly like a real
  * SDK client would be. */
object FlakyOnceTransport {
  val throwsInjected = new AtomicInteger(0)
  def reset(): Unit = throwsInjected.set(0)
}

/** Fails the first MID-segment page call (token present ⇒ records were
  * already delivered), then behaves normally: proves the reader resumes
  * from the same continuation token without dropping or duplicating. */
class FlakyOnceTransport extends ParquetTransport {
  override def page(
      path: String, read: ReadPlanner.Read, hashKey: String, sortKey: String,
      segment: Int, numSegments: Int, token: Option[Long], pageSize: Int): NearlinePage = {
    if (token.isDefined && FlakyOnceTransport.throwsInjected.compareAndSet(0, 1))
      throw new RuntimeException("injected transient segment failure (throttle)")
    super.page(path, read, hashKey, sortKey, segment, numSegments, token, pageSize)
  }
}

/** Every page call fails — the reader must exhaust its per-page attempts
  * and abandon the partition (Spark surfaces the task failure). */
class AlwaysFailTransport extends NearlineTransport {
  override def page(
      path: String, read: ReadPlanner.Read, hashKey: String, sortKey: String,
      segment: Int, numSegments: Int, token: Option[Long], pageSize: Int): NearlinePage =
    throw new RuntimeException("injected persistent segment failure")
}
