package graft.frontend

import org.apache.spark.sql.SparkSession

/** Layered engine-liveness health checks — reference parity with the
  * server's Dropwizard health tree (`readerator/server/src/main/java/io/
  * fineo/read/serve/health/RootHealthCheck.java`, `IsAliveHealthCheck
  * .java`, IT-pinned in `readerator-it/.../TestServerHealthChecks.java`):
  * the root check only proves the HTTP listener answers; the engine
  * check proves the QUERY PATH answers by running a real statement
  * through the engine under a deadline (the reference's "Fineo-alive" is
  * a real query through Drill); the tenant check proves one tenant's
  * catalog resolves end-to-end. A wedged SparkSession — stopped context,
  * hung scheduler, starved pool — fails the engine layer while the
  * static server layer still passes, which is exactly the signal an
  * operator pages on.
  *
  * Each check reports (name, healthy, detail, millis); an endpoint maps
  * "all healthy" to 200 and anything else to 503 with the failing layer
  * named in the body. */
object HealthChecks {

  final case class Check(name: String, healthy: Boolean, detail: String, millis: Long) {
    def json: String =
      s"""{"name":${JsonCodec.jstr(name)},"healthy":$healthy,""" +
        s""""detail":${JsonCodec.jstr(detail)},"millis":$millis}"""
  }

  /** The listener answered — trivially healthy (the reference's root
    * check carries the same semantics: reachable ⇒ pass). */
  def serverAlive(): Check = Check("server", healthy = true, "listening", 0L)

  /** Engine-alive: a real 1-row statement through the SparkSession,
    * bounded by `timeoutMs`. Runs on a scratch thread so a hung
    * scheduler can't hang the health endpoint itself; the probe thread
    * is interrupted + abandoned on timeout (daemon — it cannot pin the
    * JVM). A stopped SparkContext short-circuits without submitting. */
  def engineAlive(spark: SparkSession, timeoutMs: Long = 5000L): Check =
    probe("engine", timeoutMs) {
      if (spark.sparkContext.isStopped)
        throw new IllegalStateException("spark context is stopped")
      val n = spark.sql("SELECT 1").collect().length
      s"probe query returned $n row(s)"
    }

  /** Tenant-alive: a statement through a REAL TenantSession — parser,
    * read-only gate, substitution and the tenant's session all on the
    * probed path (the reference's deepest layer: a query through the
    * engine AS a tenant). */
  def tenantAlive(tenant: TenantSession, timeoutMs: Long = 5000L): Check =
    probe(s"tenant:${tenant.orgId}", timeoutMs) {
      val n = tenant.sql("SELECT 1").collect().length
      s"tenant statement returned $n row(s)"
    }

  /** Run the layered battery: server, then engine (when a session is
    * supplied), then tenant (when a tenant session is supplied). */
  def run(
      engine: Option[SparkSession],
      tenant: Option[TenantSession],
      timeoutMs: Long = 5000L): Seq[Check] =
    Seq(serverAlive()) ++
      engine.map(engineAlive(_, timeoutMs)) ++
      tenant.map(tenantAlive(_, timeoutMs))

  /** (status, body) for an HTTP health endpoint over `checks`. */
  def httpResponse(checks: Seq[Check]): (Int, String) = {
    val ok = checks.forall(_.healthy)
    val status = if (ok) 200 else 503
    val failed = checks.filterNot(_.healthy).map(_.name)
    val body =
      s"""{"status":${JsonCodec.jstr(if (ok) "ok" else "fail")},""" +
        s""""failed":${failed.map(JsonCodec.jstr).mkString("[", ",", "]")},""" +
        s""""checks":${checks.map(_.json).mkString("[", ",", "]")}}"""
    (status, body)
  }

  private def probe(name: String, timeoutMs: Long)(body: => String): Check = {
    val t0 = System.nanoTime()
    def ms = (System.nanoTime() - t0) / 1000000L
    val result = new java.util.concurrent.SynchronousQueue[Either[Throwable, String]]()
    val th = new Thread(() => {
      val r = try Right(body) catch { case e: Throwable => Left(e) }
      // offer, not put: nobody drains after the health call timed out
      result.offer(r, timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      ()
    }, s"health-probe-$name")
    th.setDaemon(true)
    th.start()
    Option(result.poll(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)) match {
      case Some(Right(detail)) => Check(name, healthy = true, detail, ms)
      case Some(Left(e)) =>
        Check(name, healthy = false,
          Option(e.getMessage).getOrElse(e.getClass.getName), ms)
      case None =>
        th.interrupt()
        Check(name, healthy = false, s"probe timed out after ${timeoutMs} ms", ms)
    }
  }
}
