package graft.frontend

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Avatica-JSON wire endpoint — the reference's ACTUAL serving protocol:
  * `FineoServer` starts an Avatica `HttpServer` whose remote-JDBC clients
  * speak Calcite Avatica's documented JSON protocol over HTTP
  * (`readerator/server/.../FineoServer.java:49-66`, handler
  * `AvaticaProtobufHandler`/JSON). This endpoint implements the JSON
  * variant's core RPCs — openConnection / createStatement /
  * prepareAndExecute / fetch / closeStatement / closeConnection — over
  * the same [[TenantSession]] objects every other entry point uses, so
  * the full isolation model (plan-level read-only gate, statement-local
  * relation substitution with nearline time pruning, server-side row
  * clamp) applies to this wire too.
  *
  * Tenancy follows the reference's connection contract: the client's
  * `openConnection.info` map must carry the API key (`apikey`, or `user`
  * — the reference forces the JDBC user property to the key), which
  * resolves the per-org TenantSession; an unknown key is an error
  * response, and every later RPC on that connectionId is tenant-bound.
  *
  * Result paging mirrors Avatica frames: `prepareAndExecute` returns a
  * first frame of at most `maxRowCount`/fetch size rows with
  * `done=false` when more remain; `fetch` continues from the held
  * statement result by offset. Results are bounded server-side by the
  * TenantSession clamp before any frame slicing, so a statement never
  * holds an unbounded collect (reference `FineoJdbcMeta.setMaxRows`).
  *
  * Fidelity note: request/response field shapes follow the public
  * Avatica JSON reference; the spec drives them with a hand-rolled
  * client (the stock `avatica-core` jar is not on this classpath, so
  * stock-client interop is asserted against the documented protocol,
  * not a live client). */
class GraftAvaticaServer(
    sessionFor: String => TenantSession,
    port: Int = 0,
    defaultFrameRows: Int = 100,
    serverMaxRows: Int = GraftHttpServer.DefaultMaxRows) {
  require(serverMaxRows > 0, "serverMaxRows must be positive")

  private val mapper = new ObjectMapper()

  private case class Conn(tenant: TenantSession)
  private case class Stmt(
      var columns: Seq[StructField] = Nil,
      var rows: Array[Row] = Array.empty)

  private val conns = new ConcurrentHashMap[String, Conn]()
  private val stmts = new ConcurrentHashMap[(String, Int), Stmt]()
  private val nextStmt = new AtomicInteger(0)

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/", (ex: HttpExchange) => {
      val (status, body) =
        try (200, handle(mapper.readTree(
          new String(ex.getRequestBody.readAllBytes(), UTF_8))))
        catch {
          case e: Exception =>
            // Avatica error response shape: the client rethrows message +
            // SQLSTATE; severity/code are advisory
            (500, s"""{"response":"error","errorMessage":${JsonCodec.jstr(
              Option(e.getMessage).getOrElse(e.getClass.getName))},""" +
              """"errorCode":-1,"sqlState":"00000","severity":"ERROR"}""")
        }
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    })
    s.setExecutor(pool)
    s.start()
    s
  }

  def boundPort: Int = server.getAddress.getPort

  /** Stop the endpoint AND its worker pool — HttpServer.stop leaves the
    * executor alone, and 4 parked non-daemon threads would otherwise keep
    * an embedding JVM alive after stop(). */
  def stop(): Unit = {
    server.stop(0)
    pool.shutdown()
  }

  // ----------------------------------------------------------------- RPCs

  private def handle(req: JsonNode): String = {
    def cid: String = req.get("connectionId").asText()
    def sid: Int = req.get("statementId").asInt()
    req.get("request").asText() match {
      case "openConnection" =>
        val info = Option(req.get("info"))
        val key = info.flatMap(i =>
          Option(i.get("apikey")).orElse(Option(i.get("user"))))
          .map(_.asText()).filter(_.nonEmpty)
          .getOrElse(throw new SecurityException(
            "connection info must carry the tenant api key"))
        conns.put(cid, Conn(sessionFor(key))) // SecurityException if unknown
        """{"response":"openConnection"}"""
      case "closeConnection" =>
        conns.remove(cid)
        stmts.keySet.removeIf(_._1 == cid)
        """{"response":"closeConnection"}"""
      case "createStatement" =>
        connOf(cid)
        val id = nextStmt.incrementAndGet()
        stmts.put((cid, id), Stmt())
        s"""{"response":"createStatement","connectionId":${JsonCodec.jstr(cid)},"statementId":$id}"""
      case "closeStatement" =>
        stmts.remove((cid, sid))
        """{"response":"closeStatement"}"""
      case "prepareAndExecute" =>
        val conn = connOf(cid)
        val st = stmtOf(cid, sid)
        val sql = req.get("sql").asText()
        val maxRowCount = Option(req.get("maxRowCount")).map(_.asLong()).getOrElse(-1L)
        // The SERVER always owns a cap (reference setMaxRows; same
        // invariant as the HTTP layer's mandatory clamp) — a client's
        // maxRowCount may only lower it; -1/absent means "server default",
        // never "unbounded". The statement's collect is therefore bounded
        // regardless of how sessionFor configured the TenantSession.
        val perCall =
          if (maxRowCount > 0) math.min(maxRowCount, serverMaxRows.toLong).toInt
          else serverMaxRows
        val df = conn.tenant.sql(sql, Some(perCall))
        st.columns = df.schema.fields.toSeq
        st.rows = df.collect()
        val frame = frameJson(st, offset = 0, defaultFrameRows)
        s"""{"response":"executeResults","missingStatement":false,"results":[""" +
          s"""{"response":"resultSet","connectionId":${JsonCodec.jstr(cid)},""" +
          s""""statementId":$sid,"ownStatement":true,"signature":${signatureJson(st)},""" +
          s""""firstFrame":$frame,"updateCount":-1}]}"""
      case "fetch" =>
        val st = stmtOf(cid, sid)
        val offset = Option(req.get("offset")).map(_.asInt()).getOrElse(0)
        val n = Option(req.get("fetchMaxRowCount")).map(_.asInt())
          .filter(_ > 0).getOrElse(defaultFrameRows)
        s"""{"response":"fetch","connectionId":${JsonCodec.jstr(cid)},""" +
          s""""statementId":$sid,"frame":${frameJson(st, offset, n)}}"""
      // Metadata RPCs (what a BI tool calls on connect): served by the
      // tenant-bound facade (reference `FineoDatabaseMetaData`), returned
      // as ownStatement result sets the client closes like any other.
      case "schemas" | "tables" | "columns" =>
        val conn = connOf(cid)
        val meta = conn.tenant.metadata
        def pat(field: String): String =
          Option(req.get(field)).map(_.asText()).orNull
        val df = req.get("request").asText() match {
          case "schemas" => meta.getSchemas()
          case "tables"  => meta.getTables(tableNamePattern = pat("tableNamePattern"))
          case _         => meta.getColumns(
            tableNamePattern = pat("tableNamePattern"),
            columnNamePattern = pat("columnNamePattern"))
        }
        val id = nextStmt.incrementAndGet()
        val st = Stmt(df.schema.fields.toSeq, df.collect())
        stmts.put((cid, id), st)
        s"""{"response":"resultSet","connectionId":${JsonCodec.jstr(cid)},""" +
          s""""statementId":$id,"ownStatement":true,"signature":${signatureJson(st)},""" +
          s""""firstFrame":${frameJson(st, 0, Int.MaxValue)},"updateCount":-1}"""
      case other =>
        throw new UnsupportedOperationException(s"unsupported avatica rpc: $other")
    }
  }

  private def connOf(cid: String): Conn = {
    val c = conns.get(cid)
    if (c == null) throw new IllegalStateException(s"no open connection: $cid")
    c
  }

  private def stmtOf(cid: String, sid: Int): Stmt = {
    val st = stmts.get((cid, sid))
    if (st == null) throw new IllegalStateException(s"no statement $sid on $cid")
    st
  }

  // --------------------------------------------------------------- frames

  private def frameJson(st: Stmt, offset: Int, n: Int): String = {
    // Long arithmetic for the slice end: offset + Int.MaxValue ("fetch
    // everything") must not wrap negative into a permanently-empty,
    // never-done frame
    val end = math.min(st.rows.length.toLong, offset.toLong + n).toInt
    val slice = st.rows.slice(offset, end)
    val done = offset + slice.length >= st.rows.length
    val rows = slice.map(r =>
      (0 until r.length).map(i => JsonCodec.jval(r.get(i))).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    s"""{"offset":$offset,"done":$done,"rows":$rows}"""
  }

  /** Avatica signature: column metadata + LIST cursor style (rows travel
    * as JSON arrays in frame order). */
  private def signatureJson(st: Stmt): String = {
    val cols = st.columns.zipWithIndex.map { case (f, i) =>
      val (jdbcType, typeName) = jdbcTypeOf(f.dataType)
      s"""{"ordinal":$i,"columnName":${JsonCodec.jstr(f.name)},""" +
        s""""label":${JsonCodec.jstr(f.name)},"nullable":${if (f.nullable) 1 else 0},""" +
        s""""type":{"type":"scalar","id":$jdbcType,"name":${JsonCodec.jstr(typeName)},"rep":"OBJECT"}}"""
    }.mkString("[", ",", "]")
    s"""{"columns":$cols,"sql":null,"parameters":[],""" +
      """"cursorFactory":{"style":"LIST","clazz":null,"fieldNames":null},"statementType":null}"""
  }

  /** java.sql.Types ids for the signature (the subset the engine emits). */
  private def jdbcTypeOf(dt: DataType): (Int, String) = dt match {
    case BooleanType => (java.sql.Types.BOOLEAN, "BOOLEAN")
    case ByteType => (java.sql.Types.TINYINT, "TINYINT")
    case ShortType => (java.sql.Types.SMALLINT, "SMALLINT")
    case IntegerType => (java.sql.Types.INTEGER, "INTEGER")
    case LongType => (java.sql.Types.BIGINT, "BIGINT")
    case FloatType => (java.sql.Types.REAL, "REAL")
    case DoubleType => (java.sql.Types.DOUBLE, "DOUBLE")
    case _: DecimalType => (java.sql.Types.DECIMAL, "DECIMAL")
    case StringType => (java.sql.Types.VARCHAR, "VARCHAR")
    case BinaryType => (java.sql.Types.VARBINARY, "VARBINARY")
    case TimestampType => (java.sql.Types.TIMESTAMP, "TIMESTAMP")
    case DateType => (java.sql.Types.DATE, "DATE")
    case _ => (java.sql.Types.JAVA_OBJECT, dt.sql)
  }
}
