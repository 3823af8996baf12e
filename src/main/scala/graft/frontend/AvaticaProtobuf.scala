package graft.frontend

import com.fasterxml.jackson.databind.JsonNode

/** Avatica PROTOBUF transport translation — the reference's default
  * production wire (`readerator/server/src/main/java/io/fineo/read/serve/
  * FineoServer.java` wires an `AvaticaProtobufHandler`; JSON is the debug
  * handler). Requests arrive as a protobuf `WireMessage { string name = 1;
  * bytes wrapped_message = 2 }` whose name is the fully-qualified
  * `Requests$Xxx` class; responses go back the same way wrapping a
  * `Responses$Xxx`. Message layouts are hand-rolled from Avatica's
  * PUBLIC proto definitions (calcite-avatica `core/src/main/protobuf/
  * requests.proto`, `responses.proto`, `common.proto`) on top of
  * [[ProtoWire]] — no generated code, no runtime dependency.
  *
  * The translation is thin ON PURPOSE: a protobuf request becomes the
  * equivalent JSON request and runs through the SAME `handle()` as the
  * JSON wire, and the JSON response is re-encoded as protobuf — one
  * implementation of the RPC semantics, two encodings of it, so the two
  * transports cannot drift. */
private[frontend] object AvaticaProtobuf {

  private val ReqPrefix = "org.apache.calcite.avatica.proto.Requests$"
  private val RespPrefix = "org.apache.calcite.avatica.proto.Responses$"

  /** common.proto `enum Rep` — numbers are the protocol. */
  private val RepNames: Map[Int, String] = Map(
    0 -> "PRIMITIVE_BOOLEAN", 1 -> "PRIMITIVE_BYTE", 2 -> "PRIMITIVE_CHAR",
    3 -> "PRIMITIVE_SHORT", 4 -> "PRIMITIVE_INT", 5 -> "PRIMITIVE_LONG",
    6 -> "PRIMITIVE_FLOAT", 7 -> "PRIMITIVE_DOUBLE", 8 -> "BOOLEAN",
    9 -> "BYTE", 10 -> "CHARACTER", 11 -> "SHORT", 12 -> "INTEGER",
    13 -> "LONG", 14 -> "FLOAT", 15 -> "DOUBLE", 16 -> "JAVA_SQL_TIME",
    17 -> "JAVA_SQL_TIMESTAMP", 18 -> "JAVA_SQL_DATE", 19 -> "JAVA_UTIL_DATE",
    20 -> "BYTE_STRING", 21 -> "STRING", 22 -> "NUMBER", 23 -> "OBJECT",
    24 -> "NULL", 25 -> "BIG_INTEGER", 26 -> "BIG_DECIMAL", 27 -> "ARRAY",
    28 -> "STRUCT", 29 -> "MULTISET")
  private val RepNums: Map[String, Int] = RepNames.map(_.swap)

  // ------------------------------------------------------ request decode

  /** WireMessage request bytes → the equivalent JSON-wire request text. */
  def requestToJson(body: Array[Byte]): String = {
    val wire = new ProtoReader(body)
    val name = wire.str(1).stripPrefix(ReqPrefix)
    val m = new ProtoReader(
      wire.first(2).map(_.payload).getOrElse(Array.empty[Byte]))
    def jstr(s: String) = JsonCodec.jstr(s)
    name match {
      case "OpenConnectionRequest" =>
        // { connection_id = 1; map<string,string> info = 2 } — a proto map
        // is repeated entries of { key = 1; value = 2 }
        val info = m.all(2).map { f =>
          val e = new ProtoReader(f.payload)
          s"${jstr(e.str(1))}:${jstr(e.str(2))}"
        }.mkString("{", ",", "}")
        s"""{"request":"openConnection","connectionId":${jstr(m.str(1))},"info":$info}"""
      case "CloseConnectionRequest" =>
        s"""{"request":"closeConnection","connectionId":${jstr(m.str(1))}}"""
      case "ConnectionSyncRequest" =>
        // conn_props = 2 (ConnectionProperties) — acked, not acted on
        s"""{"request":"connectionSync","connectionId":${jstr(m.str(1))},"connProps":{}}"""
      case "CreateStatementRequest" =>
        s"""{"request":"createStatement","connectionId":${jstr(m.str(1))}}"""
      case "CloseStatementRequest" =>
        s"""{"request":"closeStatement","connectionId":${jstr(m.str(1))},"statementId":${m.long(2)}}"""
      case "PrepareAndExecuteRequest" =>
        // { connection_id=1; sql=2; max_row_count=3 (deprecated);
        //   statement_id=4; max_rows_total=5; first_frame_max_size=6 }
        val max = if (m.long(5) != 0) m.long(5) else m.long(3)
        s"""{"request":"prepareAndExecute","connectionId":${jstr(m.str(1))},""" +
          s""""statementId":${m.long(4)},"sql":${jstr(m.str(2))},"maxRowCount":$max}"""
      case "PrepareRequest" =>
        // { connection_id=1; sql=2; max_row_count=3 (deprecated); max_rows_total=4 }
        val max = if (m.long(4) != 0) m.long(4) else m.long(3)
        s"""{"request":"prepare","connectionId":${jstr(m.str(1))},""" +
          s""""sql":${jstr(m.str(2))},"maxRowCount":$max}"""
      case "ExecuteRequest" =>
        // { statementHandle=1; parameter_values=2; deprecated_first_frame_max_size=3;
        //   has_parameter_values=4; first_frame_max_size=5 }
        val h = m.sub(1).getOrElse(new ProtoReader(Array.empty))
        val params = m.all(2).map(f => typedValueToJson(new ProtoReader(f.payload)))
          .mkString("[", ",", "]")
        s"""{"request":"execute","statementHandle":{"connectionId":${jstr(h.str(1))},""" +
          s""""id":${h.long(2)}},"parameterValues":$params}"""
      case "FetchRequest" =>
        // { connection_id=1; statement_id=2; offset=3;
        //   fetch_max_row_count=4 (deprecated); frame_max_size=5 }
        val n = if (m.long(5) != 0) m.long(5) else m.long(4)
        s"""{"request":"fetch","connectionId":${jstr(m.str(1))},""" +
          s""""statementId":${m.long(2)},"offset":${m.long(3)},"fetchMaxRowCount":$n}"""
      case "SyncResultsRequest" =>
        // { connection_id=1; statement_id=2; state=3 (QueryState, unused here); offset=4 }
        s"""{"request":"syncResults","connectionId":${jstr(m.str(1))},""" +
          s""""statementId":${m.long(2)},"offset":${m.long(4)}}"""
      case "CommitRequest" =>
        s"""{"request":"commit","connectionId":${jstr(m.str(1))}}"""
      case "RollbackRequest" =>
        s"""{"request":"rollback","connectionId":${jstr(m.str(1))}}"""
      case "CatalogsRequest" =>
        s"""{"request":"getCatalogs","connectionId":${jstr(m.str(1))}}"""
      case "SchemasRequest" =>
        // { catalog=1; schema_pattern=2; connection_id=3 }
        s"""{"request":"getSchemas","connectionId":${jstr(m.str(3))}}"""
      case "TablesRequest" =>
        // { catalog=1; schema_pattern=2; table_name_pattern=3; type_list=4;
        //   has_type_list=6; connection_id=7 } — proto3 cannot distinguish
        // absent from "", and "" as a LIKE pattern matches nothing, so an
        // empty pattern is treated as absent (no filter), which is what
        // stock clients mean by it
        val pat3 = if (m.str(3).nonEmpty) s""","tableNamePattern":${jstr(m.str(3))}""" else ""
        s"""{"request":"getTables","connectionId":${jstr(m.str(7))}$pat3}"""
      case "ColumnsRequest" =>
        // { catalog=1; schema_pattern=2; table_name_pattern=3;
        //   column_name_pattern=4; connection_id=5 }
        val pats = Seq(
          if (m.str(3).nonEmpty) Some(s""""tableNamePattern":${jstr(m.str(3))}""") else None,
          if (m.str(4).nonEmpty) Some(s""""columnNamePattern":${jstr(m.str(4))}""") else None)
          .flatten.map("," + _).mkString
        s"""{"request":"getColumns","connectionId":${jstr(m.str(5))}$pats}"""
      case "TableTypesRequest" =>
        s"""{"request":"getTableTypes","connectionId":${jstr(m.str(1))}}"""
      case "TypeInfoRequest" =>
        s"""{"request":"getTypeInfo","connectionId":${jstr(m.str(1))}}"""
      case other =>
        throw new UnsupportedOperationException(s"unsupported avatica protobuf rpc: $other")
    }
  }

  /** common.proto TypedValue { type=1; bool_value=2; string_value=3;
    * number_value=4 (sint64); bytes_value=5; double_value=6; null=7;
    * array_value=8; component_type=9 } → the JSON wire's
    * `{"type": rep, "value": v}`. */
  private def typedValueToJson(tv: ProtoReader): String = {
    val rep = RepNames.getOrElse(tv.int(1), "OBJECT")
    val value: String =
      if (tv.boolean(7) || rep == "NULL") "null"
      else rep match {
        case "BOOLEAN" | "PRIMITIVE_BOOLEAN" => tv.boolean(2).toString
        case "FLOAT" | "PRIMITIVE_FLOAT" | "DOUBLE" | "PRIMITIVE_DOUBLE" =>
          val d = tv.first(6).map(_.asDouble)
            .getOrElse(tv.first(4).map(_.sint.toDouble).getOrElse(0.0))
          if (d.isNaN || d.isInfinite) JsonCodec.jstr(d.toString) else d.toString
        case "STRING" | "CHARACTER" | "PRIMITIVE_CHAR" | "BIG_DECIMAL" | "NUMBER" =>
          JsonCodec.jstr(tv.str(3))
        case "BYTE_STRING" =>
          JsonCodec.jstr(java.util.Base64.getEncoder.encodeToString(
            tv.first(5).map(_.payload).getOrElse(Array.empty[Byte])))
        case _ => tv.first(4).map(_.sint).getOrElse(0L).toString
      }
    s"""{"type":${JsonCodec.jstr(rep)},"value":$value}"""
  }

  // ----------------------------------------------------- response encode

  /** JSON-wire response → WireMessage-wrapped protobuf response bytes. */
  def responseToProto(resp: JsonNode): Array[Byte] = {
    val (name, body) = resp.get("response").asText() match {
      case "openConnection" => ("OpenConnectionResponse", metaOnly(1))
      case "closeConnection" => ("CloseConnectionResponse", metaOnly(1))
      case "closeStatement" => ("CloseStatementResponse", metaOnly(1))
      case "commit" => ("CommitResponse", (_: ProtoWriter) => ())
      case "rollback" => ("RollbackResponse", (_: ProtoWriter) => ())
      case "createStatement" =>
        ("CreateStatementResponse", (w: ProtoWriter) => {
          w.string(1, resp.get("connectionId").asText())
          w.uint32(2, resp.get("statementId").asInt())
          meta(w, 3)
        })
      case "connectionSync" =>
        ("ConnectionSyncResponse", (w: ProtoWriter) => {
          w.message(1, _ => ()) // ConnectionProperties ack (server is read-only)
          meta(w, 2)
        })
      case "prepare" =>
        ("PrepareResponse", (w: ProtoWriter) => {
          val st = resp.get("statement")
          w.message(1, statementHandle(_, st))
          meta(w, 2)
        })
      case "executeResults" =>
        // ExecuteResponse { results=1 repeated; missing_statement=2; metadata=3 }
        ("ExecuteResponse", (w: ProtoWriter) => {
          val rs = resp.get("results")
          (0 until rs.size()).foreach(i => w.message(1, resultSet(_, rs.get(i))))
          w.bool(2, resp.path("missingStatement").asBoolean(false))
          meta(w, 3)
        })
      case "resultSet" =>
        ("ResultSetResponse", (w: ProtoWriter) => resultSet(w, resp))
      case "fetch" =>
        // FetchResponse { frame=1; missing_statement=2; missing_results=3; metadata=4 }
        ("FetchResponse", (w: ProtoWriter) => {
          w.message(1, frame(_, resp.get("frame")))
          meta(w, 4)
        })
      case "syncResults" =>
        ("SyncResultsResponse", (w: ProtoWriter) => {
          w.bool(1, resp.path("missingStatement").asBoolean(false))
          w.bool(2, resp.path("moreResults").asBoolean(false))
          meta(w, 3)
        })
      case "error" =>
        ("ErrorResponse", (w: ProtoWriter) => errorBody(w, resp))
      case other =>
        throw new UnsupportedOperationException(s"unmapped response kind: $other")
    }
    wrap(RespPrefix + name, body)
  }

  /** The JSON error shape (errorMessage/errorCode/sqlState/severity) →
    * ErrorResponse { exceptions=1; has_exceptions=2; error_message=3;
    * severity=4; error_code=5; sql_state=6; metadata=7 }. */
  def errorToProto(resp: JsonNode): Array[Byte] =
    wrap(RespPrefix + "ErrorResponse", errorBody(_, resp))

  private def errorBody(w: ProtoWriter, resp: JsonNode): Unit = {
    val msg = resp.path("errorMessage").asText("")
    w.string(1, msg) // exceptions: single rendered trace line
    w.bool(2, true)
    w.string(3, msg)
    w.int64(4, 2) // Severity.ERROR_SEVERITY
    w.uint32(5, resp.path("errorCode").asInt(-1))
    w.string(6, resp.path("sqlState").asText("00000"))
    meta(w, 7)
  }

  private def wrap(name: String, body: ProtoWriter => Unit): Array[Byte] = {
    val inner = new ProtoWriter
    body(inner)
    val w = new ProtoWriter
    w.string(1, name)
    w.bytes(2, inner.toBytes)
    w.toBytes
  }

  private def meta(w: ProtoWriter, field: Int): Unit =
    w.message(field, _.string(1, "localhost"))
  private def metaOnly(field: Int): ProtoWriter => Unit = meta(_, field)

  /** StatementHandle { connection_id=1; id=2; signature=3 }. */
  private def statementHandle(w: ProtoWriter, st: JsonNode): Unit = {
    w.string(1, st.get("connectionId").asText())
    w.uint32(2, st.get("id").asInt())
    w.message(3, signature(_, st.get("signature")))
  }

  /** ResultSetResponse { connection_id=1; statement_id=2; own_statement=3;
    * signature=4; first_frame=5; update_count=6; metadata=7 }. */
  private def resultSet(w: ProtoWriter, rs: JsonNode): Unit = {
    w.string(1, rs.get("connectionId").asText())
    w.uint32(2, rs.get("statementId").asInt())
    w.bool(3, rs.path("ownStatement").asBoolean(true))
    w.message(4, signature(_, rs.get("signature")))
    w.message(5, frame(_, rs.get("firstFrame")))
    w.uint64(6, -1L) // a query: no update count (Avatica's -1 sentinel)
    meta(w, 7)
  }

  /** Signature { columns=1; sql=2; parameters=3; cursor_factory=4;
    * statementType=5 }. */
  private def signature(w: ProtoWriter, sig: JsonNode): Unit = {
    val cols = sig.get("columns")
    (0 until cols.size()).foreach { i =>
      val c = cols.get(i)
      // ColumnMetaData { ordinal=1; ...; nullable=6; label=9;
      //   column_name=10; ...; column_class_name=19; type=20 }
      w.message(1, cw => {
        cw.uint32(1, c.get("ordinal").asInt())
        cw.uint32(6, c.get("nullable").asInt())
        cw.string(9, c.get("label").asText())
        cw.string(10, c.get("columnName").asText())
        cw.bool(16, true) // read_only
        cw.message(20, tw => {
          // AvaticaType { id=1; name=2; rep=3 }
          val t = c.get("type")
          tw.uint32(1, t.get("id").asInt())
          tw.string(2, t.get("name").asText())
          tw.int64(3, RepNums.getOrElse(t.path("rep").asText("OBJECT"), 23).toLong)
        })
      })
    }
    val sql = sig.path("sql")
    if (!sql.isNull && !sql.isMissingNode) w.string(2, sql.asText())
    val params = sig.get("parameters")
    (0 until params.size()).foreach { i =>
      val p = params.get(i)
      // AvaticaParameter { signed=1; precision=2; scale=3; parameter_type=4;
      //   type_name=5; class_name=6; name=7 }
      w.message(3, pw => {
        pw.bool(1, p.path("signed").asBoolean(false))
        pw.uint32(2, p.path("precision").asInt(0))
        pw.uint32(3, p.path("scale").asInt(0))
        pw.uint32(4, p.path("parameterType").asInt(0))
        pw.string(5, p.path("typeName").asText(""))
        pw.string(6, p.path("className").asText(""))
        pw.string(7, p.path("name").asText(""))
      })
    }
    // CursorFactory { style=1 } — LIST = 4 (rows travel as value lists)
    w.message(4, _.int64(1, 4))
  }

  /** Frame { offset=1; done=2; rows=3 }, Row { value=1 repeated
    * ColumnValue }, ColumnValue { scalar_value=4; has_array_value=3;
    * array_value=2 }. */
  private def frame(w: ProtoWriter, f: JsonNode): Unit = {
    w.uint64(1, f.get("offset").asLong())
    w.bool(2, f.get("done").asBoolean())
    val rows = f.get("rows")
    (0 until rows.size()).foreach { r =>
      val row = rows.get(r)
      w.message(3, rw => {
        (0 until row.size()).foreach { c =>
          rw.message(1, cw => columnValue(cw, row.get(c)))
        }
      })
    }
  }

  private def columnValue(w: ProtoWriter, v: JsonNode): Unit =
    if (v.isArray) {
      (0 until v.size()).foreach(i => w.message(2, typedValue(_, v.get(i))))
      w.bool(3, true)
    } else {
      w.message(4, typedValue(_, v))
    }

  /** JSON scalar → self-describing TypedValue (rep 1, value field by
    * kind, null=7). */
  private def typedValue(w: ProtoWriter, v: JsonNode): Unit =
    if (v == null || v.isNull) {
      w.int64(1, RepNums("NULL").toLong)
      w.bool(7, true)
    } else if (v.isBoolean) {
      w.int64(1, RepNums("BOOLEAN").toLong)
      w.bool(2, v.asBoolean(), force = true)
    } else if (v.isIntegralNumber) {
      w.int64(1, RepNums("LONG").toLong)
      w.sint64(4, v.asLong())
    } else if (v.isNumber) {
      w.int64(1, RepNums("DOUBLE").toLong)
      w.double(6, v.asDouble())
    } else {
      w.int64(1, RepNums("STRING").toLong)
      w.string(3, v.asText())
    }
}
