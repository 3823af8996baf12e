package graft.frontend

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkFixture
import graft.schema._
import graft.sources._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

/** The Avatica-JSON wire endpoint driven by a hand-rolled protocol client
  * (openConnection with the tenant key in `info`, createStatement,
  * prepareAndExecute with frame paging, fetch, write rejection, tenant
  * isolation) — the reference's own serving protocol
  * (`FineoServer.java:49-66` + `FineoJdbcMeta`). */
class AvaticaServerSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private val registry = SchemaRegistry(
    Org("orga", Seq(Metric("ma", "avmetric", Seq(Field("v", FieldType.LONG))))),
    Org("orgb", Seq(Metric("mb", "bmetric", Seq(Field("v", FieldType.LONG))))),
    Org("organn", Seq.empty))

  // persisted ANN stores for the vector-search-over-the-wire case: both
  // IVFADC halves bootstrapped once, served through a curated tenant view
  private lazy val annStores: (String, String) = {
    import spark.implicits._
    val emb = (0 until 40).map(i => (i.toLong, Seq(
      (i % 5).toDouble, (i * 3 % 7).toDouble, (i * 2 % 3).toDouble, 1.0)))
      .toDF("vec_id", "embedding")
    val ivf = SparkFixture.tempDir("av-ann-ivf")
    val pq = SparkFixture.tempDir("av-ann-pq")
    graft.ops.AnnIndex.bootstrap(emb, "vec_id", "embedding", 4, ivf)
    graft.ops.AnnIndex.bootstrapPq(emb, "vec_id", "embedding", pq,
      m = 2, subDim = 2, k = 3)
    (ivf, pq)
  }

  private lazy val sources: SourceSet = {
    val dir = SparkFixture.tempDir("avsrv")
    val schema = StructType(Seq(
      StructField("companykey", StringType), StructField("metrictype", StringType),
      StructField("timestamp", LongType), StructField("v", LongType)))
    val rows = (1 to 7).map(i => Row("orga", "ma", i * 10L, i.toLong)) :+
      Row("orgb", "mb", 99L, 42L)
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/0/parquet/orga/ma")
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/0/parquet/orgb/mb")
    SourceSet(fs = Seq(FsSource("parquet", dir)))
  }

  private lazy val server = new GraftAvaticaServer(
    key => {
      val t = TenantSession.open(spark, registry, key, sources)
      if (key == "organn") {
        // the registerView deployment seam: the composed persisted
        // IVFADC top-k (every query id in the corpus) materializes on
        // the tenant's OWN session at connection open
        import t.spark.implicits._
        val emb = (0 until 40).map(i => (i.toLong, Seq(
          (i % 5).toDouble, (i * 3 % 7).toDouble, (i * 2 % 3).toDouble, 1.0)))
          .toDF("vec_id", "embedding")
        val (ivf, pq) = annStores
        t.registerView("knn_neighbors",
          graft.ops.AnnIndex.ivfadcTopK(emb, emb, "vec_id", "embedding",
            k = 5, ivf, pq, nprobe = 2, shortlist = 10, m = 2, subDim = 2))
      }
      t
    },
    defaultFrameRows = 3)
  private val client = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  override def afterAll(): Unit = server.stop()

  private def rpc(json: String): (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val r: HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}/"))
        .POST(BodyPublishers.ofString(json)).build(),
      BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  private def open(cid: String, key: String): Unit = {
    val (st, resp) = rpc(
      s"""{"request":"openConnection","connectionId":"$cid","info":{"apikey":"$key"}}""")
    st shouldBe 200
    resp.get("response").asText() shouldBe "openConnection"
  }

  private def createStatement(cid: String): Int = {
    val (_, resp) = rpc(s"""{"request":"createStatement","connectionId":"$cid"}""")
    resp.get("statementId").asInt()
  }

  test("the documented RPC sequence round-trips a query with frame paging") {
    open("c1", "orga")
    val sid = createStatement("c1")
    val (st, resp) = rpc(
      s"""{"request":"prepareAndExecute","connectionId":"c1","statementId":$sid,""" +
        """"sql":"SELECT `timestamp`, v FROM avmetric ORDER BY `timestamp`","maxRowCount":-1}""")
    st shouldBe 200
    resp.get("response").asText() shouldBe "executeResults"
    val rs = resp.get("results").get(0)
    rs.get("response").asText() shouldBe "resultSet"
    val cols = rs.at("/signature/columns")
    cols.get(0).get("columnName").asText() shouldBe "timestamp"
    cols.get(1).get("columnName").asText() shouldBe "v"
    cols.get(1).at("/type/id").asInt() shouldBe java.sql.Types.BIGINT
    // first frame carries defaultFrameRows=3 of the 7 rows, not done
    val f0 = rs.get("firstFrame")
    f0.get("done").asBoolean() shouldBe false
    f0.get("rows").size() shouldBe 3
    f0.at("/rows/0/0").asLong() shouldBe 10L
    // fetch continues by offset until done
    val (_, f1) = rpc(
      s"""{"request":"fetch","connectionId":"c1","statementId":$sid,"offset":3,"fetchMaxRowCount":10}""")
    f1.at("/frame/done").asBoolean() shouldBe true
    f1.at("/frame/rows").size() shouldBe 4
    f1.at("/frame/rows/3/1").asLong() shouldBe 7L
    rpc(s"""{"request":"closeStatement","connectionId":"c1","statementId":$sid}""")
      ._2.get("response").asText() shouldBe "closeStatement"
  }

  test("per-statement maxRowCount caps the result (setMaxRows semantics)") {
    open("c2", "orga")
    val sid = createStatement("c2")
    val (_, resp) = rpc(
      s"""{"request":"prepareAndExecute","connectionId":"c2","statementId":$sid,""" +
        """"sql":"SELECT v FROM avmetric","maxRowCount":2}""")
    val f = resp.at("/results/0/firstFrame")
    f.get("rows").size() shouldBe 2
    f.get("done").asBoolean() shouldBe true
  }

  test("writes die with an Avatica error response, not a wire hang") {
    open("c3", "orga")
    val sid = createStatement("c3")
    val (st, resp) = rpc(
      s"""{"request":"prepareAndExecute","connectionId":"c3","statementId":$sid,""" +
        """"sql":"INSERT INTO avmetric VALUES (1, 1)","maxRowCount":-1}""")
    st shouldBe 500
    resp.get("response").asText() shouldBe "error"
    resp.get("errorMessage").asText() should include("read-only")
  }

  test("tenant isolation: a connection is bound to its key's org") {
    open("c4", "orgb")
    val sid = createStatement("c4")
    // its own table works
    val (_, ok) = rpc(
      s"""{"request":"prepareAndExecute","connectionId":"c4","statementId":$sid,""" +
        """"sql":"SELECT v FROM bmetric","maxRowCount":-1}""")
    ok.at("/results/0/firstFrame/rows/0/0").asLong() shouldBe 42L
    // the other org's table is unnameable
    val sid2 = createStatement("c4")
    val (st, err) = rpc(
      s"""{"request":"prepareAndExecute","connectionId":"c4","statementId":$sid2,""" +
        """"sql":"SELECT v FROM avmetric","maxRowCount":-1}""")
    st shouldBe 500
    err.get("errorMessage").asText() should include("not found")
  }

  test("metadata RPCs return tenant-scoped result sets") {
    open("c6", "orga")
    val (st, ts) = rpc("""{"request":"tables","connectionId":"c6"}""")
    st shouldBe 200
    ts.get("response").asText() shouldBe "resultSet"
    val rows = ts.at("/firstFrame/rows")
    val names = (0 until rows.size()).map(i => rows.get(i).get(2).asText())
    names should contain("avmetric")
    (names should not).contain("bmetric") // other tenant's table unlisted
    val (_, cols) = rpc(
      """{"request":"columns","connectionId":"c6","tableNamePattern":"avmetric"}""")
    val colRows = cols.at("/firstFrame/rows")
    val colNames = (0 until colRows.size()).map(i => colRows.get(i).get(3).asText())
    colNames should contain allOf ("timestamp", "v")
    val (_, sch) = rpc("""{"request":"schemas","connectionId":"c6"}""")
    sch.at("/firstFrame/rows/0/0").asText() shouldBe "FINEO"
  }

  test("the server cap bounds an unclamped statement (maxRowCount=-1 is not 'unbounded')") {
    val capped = new GraftAvaticaServer(
      key => TenantSession.open(spark, registry, key, sources),
      defaultFrameRows = 10, serverMaxRows = 2)
    try {
      val (_, open) = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${capped.boundPort}/"))
          .POST(BodyPublishers.ofString(
            """{"request":"openConnection","connectionId":"k1","info":{"apikey":"orga"}}"""))
          .build(), BodyHandlers.ofString()) match {
        case r => (r.statusCode(), mapper.readTree(r.body()))
      }
      open.get("response").asText() shouldBe "openConnection"
      def rpcTo(json: String) = mapper.readTree(client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${capped.boundPort}/"))
          .POST(BodyPublishers.ofString(json)).build(), BodyHandlers.ofString()).body())
      val sid = rpcTo("""{"request":"createStatement","connectionId":"k1"}""")
        .get("statementId").asInt()
      val resp = rpcTo(
        s"""{"request":"prepareAndExecute","connectionId":"k1","statementId":$sid,""" +
          """"sql":"SELECT v FROM avmetric","maxRowCount":-1}""")
      val f = resp.at("/results/0/firstFrame")
      f.get("rows").size() shouldBe 2 // 7 rows unclamped; server cap = 2
      f.get("done").asBoolean() shouldBe true
    } finally capped.stop()
  }

  test("a fetch asking for Int.MaxValue rows terminates (no offset overflow)") {
    open("c7", "orga")
    val sid = createStatement("c7")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c7","statementId":$sid,""" +
      """"sql":"SELECT v FROM avmetric ORDER BY v","maxRowCount":-1}""")
    val (_, f) = rpc(
      s"""{"request":"fetch","connectionId":"c7","statementId":$sid,"offset":3,""" +
        s""""fetchMaxRowCount":${Int.MaxValue}}""")
    f.at("/frame/done").asBoolean() shouldBe true
    f.at("/frame/rows").size() shouldBe 4
  }

  test("an unknown api key fails at openConnection") {
    val (st, resp) = rpc(
      """{"request":"openConnection","connectionId":"c5","info":{"apikey":"nosuch"}}""")
    st shouldBe 500
    resp.get("response").asText() shouldBe "error"
  }

  test("parameterized vector search over the wire: prepare/execute on the curated KNN view") {
    open("cknn", "organn")
    val (st, prep) = rpc(
      """{"request":"prepare","connectionId":"cknn","sql":"SELECT corpus_id, rank FROM knn_neighbors WHERE query_id = ? ORDER BY rank","maxRowCount":-1}""")
    st shouldBe 200
    val sid = prep.at("/statement/id").asInt()
    // one prepared statement, re-executed per request with a bound query
    // id — the production shape of parameterized vector serving
    val (st2, r1) = rpc(
      s"""{"request":"execute","statementHandle":{"connectionId":"cknn","id":$sid},""" +
        """"parameterValues":[{"type":"LONG","value":2}]}""")
    st2 shouldBe 200
    val f1 = r1.at("/results/0/firstFrame")
    // k = 5 neighbors, ranks 1..5, never the query itself
    val ranks1 = (0 until f1.get("rows").size()).map(i => f1.at(s"/rows/$i/1").asInt())
    ranks1.take(3) shouldBe Seq(1, 2, 3) // defaultFrameRows = 3 pages the rest
    (0 until f1.get("rows").size()).foreach { i =>
      f1.at(s"/rows/$i/0").asLong() should not be 2L
    }
    val (_, r2) = rpc(
      s"""{"request":"execute","statementHandle":{"connectionId":"cknn","id":$sid},""" +
        """"parameterValues":[{"type":"LONG","value":17}]}""")
    val f2 = r2.at("/results/0/firstFrame")
    f2.at("/rows/0/1").asInt() shouldBe 1
    f2.at("/rows/0/0").asLong() should not be 17L
    // the curated view rides the same read-only gate on this wire
    val sid3 = createStatement("cknn")
    val (_, bad) = rpc(
      s"""{"request":"prepareAndExecute","connectionId":"cknn","statementId":$sid3,""" +
        """"sql":"INSERT INTO knn_neighbors VALUES (1, 2, 0.0, 1)","maxRowCount":-1}""")
    bad.has("errorMessage") shouldBe true
  }

  test("prepare + execute bind TypedValue parameters, including a typed null") {
    open("c8", "orga")
    val (st, prep) = rpc(
      """{"request":"prepare","connectionId":"c8","sql":"SELECT `timestamp`, v FROM avmetric WHERE v > ? AND ? IS NULL ORDER BY `timestamp`","maxRowCount":-1}""")
    st shouldBe 200
    prep.get("response").asText() shouldBe "prepare"
    val sid = prep.at("/statement/id").asInt()
    // the signature advertises one parameter per placeholder
    prep.at("/statement/signature/parameters").size() shouldBe 2
    // execute with v > 4 and a typed NULL (binds as CAST(NULL AS BIGINT))
    val (st2, resp) = rpc(
      s"""{"request":"execute","statementHandle":{"connectionId":"c8","id":$sid},""" +
        """"parameterValues":[{"type":"LONG","value":4},{"type":"LONG","value":null}]}""")
    st2 shouldBe 200
    resp.get("response").asText() shouldBe "executeResults"
    val f = resp.at("/results/0/firstFrame")
    f.get("rows").size() shouldBe 3 // v in {5,6,7}
    f.at("/rows/0/0").asLong() shouldBe 50L
    // re-execute the SAME prepared statement with a different binding
    val (_, resp2) = rpc(
      s"""{"request":"execute","statementHandle":{"connectionId":"c8","id":$sid},""" +
        """"parameterValues":[{"type":"LONG","value":6},{"type":"LONG","value":null}]}""")
    val f2 = resp2.at("/results/0/firstFrame")
    f2.get("rows").size() shouldBe 1
    f2.at("/rows/0/1").asLong() shouldBe 7L
    // string parameters are escaped, not spliced raw
    val (_, prep3) = rpc(
      """{"request":"prepare","connectionId":"c8","sql":"SELECT count(*) AS n FROM avmetric WHERE 'x' = ?","maxRowCount":-1}""")
    val sid3 = prep3.at("/statement/id").asInt()
    val (_, resp3) = rpc(
      s"""{"request":"execute","statementHandle":{"connectionId":"c8","id":$sid3},""" +
        """"parameterValues":[{"type":"STRING","value":"x' OR '1'='1"}]}""")
    resp3.at("/results/0/firstFrame/rows/0/0").asLong() shouldBe 0L
  }

  test("getTableTypes and getTypeInfo route over the wire (documented request names)") {
    open("c10", "orga")
    val (st, tt) = rpc("""{"request":"getTableTypes","connectionId":"c10"}""")
    st shouldBe 200
    tt.get("response").asText() shouldBe "resultSet"
    val ttRows = tt.at("/firstFrame/rows")
    (0 until ttRows.size()).map(i => ttRows.get(i).get(0).asText()) should contain("TABLE")
    val (_, ti) = rpc("""{"request":"getTypeInfo","connectionId":"c10"}""")
    val tiRows = ti.at("/firstFrame/rows")
    tiRows.size() should be > 0
    val typeNames = (0 until tiRows.size()).map(i => tiRows.get(i).get(0).asText())
    typeNames should contain("BIGINT")
    // the get-prefixed documented names alias the bare forms
    val (_, ts) = rpc("""{"request":"getTables","connectionId":"c10"}""")
    val names = (0 until ts.at("/firstFrame/rows").size())
      .map(i => ts.at("/firstFrame/rows").get(i).get(2).asText())
    names should contain("avmetric")
  }

  test("syncResults, commit and rollback acks (stock-client housekeeping)") {
    open("c11", "orga")
    val sid = createStatement("c11")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c11","statementId":$sid,""" +
      """"sql":"SELECT v FROM avmetric ORDER BY v","maxRowCount":-1}""")
    val (_, sr) = rpc(
      s"""{"request":"syncResults","connectionId":"c11","statementId":$sid,"offset":3}""")
    sr.get("response").asText() shouldBe "syncResults"
    sr.get("missingStatement").asBoolean() shouldBe false
    sr.get("moreResults").asBoolean() shouldBe true
    val (_, srGone) = rpc(
      """{"request":"syncResults","connectionId":"c11","statementId":99999,"offset":0}""")
    srGone.get("missingStatement").asBoolean() shouldBe true
    rpc("""{"request":"commit","connectionId":"c11"}""")
      ._2.get("response").asText() shouldBe "commit"
    rpc("""{"request":"rollback","connectionId":"c11"}""")
      ._2.get("response").asText() shouldBe "rollback"
    val (_, cs) = rpc(
      """{"request":"connectionSync","connectionId":"c11","connProps":{"autoCommit":true}}""")
    cs.get("response").asText() shouldBe "connectionSync"
  }

  test("syncResults never advertises an offset the fetch would refuse") {
    open("c16", "orga")
    val sid = createStatement("c16")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c16","statementId":$sid,""" +
      """"sql":"SELECT v FROM avmetric ORDER BY v","maxRowCount":-1}""")
    // advance past the first frame so frameOffset > 0
    rpc(s"""{"request":"fetch","connectionId":"c16","statementId":$sid,""" +
      """"offset":3,"fetchMaxRowCount":3}""")
    // offset 1 sits BEFORE the kept frame: fetch would refuse it as a
    // backward reposition, so syncResults must not call it resumable
    val (_, sr) = rpc(
      s"""{"request":"syncResults","connectionId":"c16","statementId":$sid,"offset":1}""")
    sr.get("moreResults").asBoolean() shouldBe false
    // in-frame and reset offsets stay advertised
    rpc(s"""{"request":"syncResults","connectionId":"c16","statementId":$sid,"offset":3}""")
      ._2.get("moreResults").asBoolean() shouldBe true
    rpc(s"""{"request":"syncResults","connectionId":"c16","statementId":$sid,"offset":0}""")
      ._2.get("moreResults").asBoolean() shouldBe true
  }

  test("statement results stream: peak held rows stays within one frame") {
    open("c12", "orga")
    val sid = createStatement("c12")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c12","statementId":$sid,""" +
      """"sql":"SELECT `timestamp`, v FROM avmetric ORDER BY `timestamp`","maxRowCount":-1}""")
    val (_, f1) = rpc(
      s"""{"request":"fetch","connectionId":"c12","statementId":$sid,"offset":3,"fetchMaxRowCount":3}""")
    f1.at("/frame/done").asBoolean() shouldBe false
    val (_, f2) = rpc(
      s"""{"request":"fetch","connectionId":"c12","statementId":$sid,"offset":6,"fetchMaxRowCount":3}""")
    f2.at("/frame/done").asBoolean() shouldBe true
    f2.at("/frame/rows").size() shouldBe 1
    // the full 7-row result was paged in 3-row frames; the server never
    // buffered more than one frame (the old collect() held all 7)
    server.peakHeldRows("c12", sid) should be <= 3
  }

  test("replay with fetchMaxRowCount=Int.MaxValue hits the buffer, not a re-execution") {
    open("c14", "orga")
    val sid = createStatement("c14")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c14","statementId":$sid,""" +
      """"sql":"SELECT `timestamp` FROM avmetric ORDER BY `timestamp`","maxRowCount":-1}""")
    // firstFrame served rows 0-2; re-fetch the same offset with the huge
    // fetch count stock clients send — int arithmetic would wrap
    // offset+n negative and miss the replay path
    val (_, f) = rpc(s"""{"request":"fetch","connectionId":"c14","statementId":$sid,""" +
      s""""offset":0,"fetchMaxRowCount":${Int.MaxValue}}""")
    // the buffered slice comes back (a short frame is legal, done=false
    // tells the client to fetch on from the cursor)
    f.at("/frame/rows").size() shouldBe 3
    f.at("/frame/done").asBoolean() shouldBe false
    f.at("/frame/rows/0/0").asLong() shouldBe 10L
    // a SHRUNKEN replay window re-slices the same buffer too
    val (_, f2) = rpc(s"""{"request":"fetch","connectionId":"c14","statementId":$sid,""" +
      """"offset":1,"fetchMaxRowCount":1}""")
    f2.at("/frame/rows").size() shouldBe 1
    f2.at("/frame/rows/0/0").asLong() shouldBe 20L
    f2.at("/frame/done").asBoolean() shouldBe false
    // INTERIOR offset with the huge fetch count: start+n must not wrap
    // (an int sum would slice an empty never-done frame — a fetch loop)
    val (_, f3) = rpc(s"""{"request":"fetch","connectionId":"c14","statementId":$sid,""" +
      s""""offset":1,"fetchMaxRowCount":${Int.MaxValue}}""")
    f3.at("/frame/rows").size() shouldBe 2
    f3.at("/frame/rows/0/0").asLong() shouldBe 20L
    server.peakHeldRows("c14", sid) should be <= 3
  }

  test("a fetch past the end leaves the cursor consistent for the next sequential fetch") {
    open("c16", "orga")
    val sid = createStatement("c16")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c16","statementId":$sid,""" +
      """"sql":"SELECT `timestamp` FROM avmetric ORDER BY `timestamp`","maxRowCount":-1}""")
    // 7-row result; skip straight past the end
    val (_, f9) = rpc(
      s"""{"request":"fetch","connectionId":"c16","statementId":$sid,"offset":9,"fetchMaxRowCount":2}""")
    f9.at("/frame/rows").size() shouldBe 0
    f9.at("/frame/done").asBoolean() shouldBe true
    // the true cursor position (7) must still be servable, not refused as
    // a backward reposition (frameOffset may never exceed fetched)
    val (st, f7) = rpc(
      s"""{"request":"fetch","connectionId":"c16","statementId":$sid,"offset":7,"fetchMaxRowCount":2}""")
    st shouldBe 200
    f7.at("/frame/rows").size() shouldBe 0
    f7.at("/frame/done").asBoolean() shouldBe true
  }

  test("non-zero backward reposition past the kept frame is refused, not served inconsistently") {
    open("c15", "orga")
    val sid = createStatement("c15")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c15","statementId":$sid,""" +
      """"sql":"SELECT `timestamp` FROM avmetric ORDER BY `timestamp`","maxRowCount":-1}""")
    // advance: frame now covers offsets 3-5
    rpc(s"""{"request":"fetch","connectionId":"c15","statementId":$sid,"offset":3,"fetchMaxRowCount":3}""")
    // offset 1 is before the kept frame and not 0: Spark row order is not
    // stable across executions, so the server refuses rather than risk
    // serving rows inconsistent with frames already delivered
    val (st, err) = rpc(
      s"""{"request":"fetch","connectionId":"c15","statementId":$sid,"offset":1,"fetchMaxRowCount":2}""")
    st shouldBe 500
    err.get("errorMessage").asText() should include("reposition")
  }

  test("cursor repositioning: a backward fetch re-executes and serves the offset") {
    open("c13", "orga")
    val sid = createStatement("c13")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c13","statementId":$sid,""" +
      """"sql":"SELECT `timestamp` FROM avmetric ORDER BY `timestamp`","maxRowCount":-1}""")
    rpc(s"""{"request":"fetch","connectionId":"c13","statementId":$sid,"offset":3,"fetchMaxRowCount":3}""")
    // rewind to 0 (the syncResults-reset flow) — the cursor re-executes
    val (st, f0) = rpc(
      s"""{"request":"fetch","connectionId":"c13","statementId":$sid,"offset":0,"fetchMaxRowCount":2}""")
    st shouldBe 200
    f0.at("/frame/rows/0/0").asLong() shouldBe 10L
    f0.at("/frame/done").asBoolean() shouldBe false
    // and a mid-stream reposition (neither replay nor next-sequential)
    val (_, f5) = rpc(
      s"""{"request":"fetch","connectionId":"c13","statementId":$sid,"offset":5,"fetchMaxRowCount":5}""")
    f5.at("/frame/rows").size() shouldBe 2
    f5.at("/frame/rows/0/0").asLong() shouldBe 60L
    f5.at("/frame/done").asBoolean() shouldBe true
  }

  test("unknown RPC names count under one metric bucket, never verbatim") {
    // rpcName is raw client input: counting it verbatim would let an
    // untrusted client grow the counter map without bound
    val before = server.metrics.counter("avatica.requests.unknown")
    val (st, resp) = rpc("""{"request":"totallyMadeUpRpc_xyz","connectionId":"cm"}""")
    st shouldBe 500
    resp.get("response").asText() shouldBe "error"
    server.metrics.counter("avatica.requests.unknown") shouldBe (before + 1)
    server.metrics.counter("avatica.requests.totallyMadeUpRpc_xyz") shouldBe 0L
  }

  test("clamp timeout surfaces as retryable SQLSTATE 53300, distinct from execution failure") {
    val tenant = TenantSession.open(spark, registry, "orga", sources,
      maxConcurrentStatements = 1)
    tenant.spark.conf.set("spark.graft.statementClampTimeoutSec", "1")
    val srv = new GraftAvaticaServer(_ => tenant, defaultFrameRows = 3)
    try {
      def srpc(json: String): (Int, com.fasterxml.jackson.databind.JsonNode) = {
        val r = client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.boundPort}/"))
            .POST(BodyPublishers.ofString(json)).build(),
          BodyHandlers.ofString())
        (r.statusCode(), mapper.readTree(r.body()))
      }
      srpc("""{"request":"openConnection","connectionId":"ct","info":{"apikey":"orga"}}""")
      val (_, cs) = srpc("""{"request":"createStatement","connectionId":"ct"}""")
      val sid = cs.get("statementId").asInt()
      val started = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => tenant.runGated { started.countDown(); release.await() })
      holder.start()
      started.await()
      try {
        // the single permit is held: a NEW execute must be rejected by
        // admission control with the retryable shape, not a generic error
        val (st, err) = srpc(
          s"""{"request":"prepareAndExecute","connectionId":"ct","statementId":$sid,""" +
            """"sql":"SELECT `timestamp` FROM avmetric","maxRowCount":-1}""")
        st shouldBe 500
        err.get("response").asText() shouldBe "error"
        err.get("sqlState").asText() shouldBe "53300"
        err.get("errorCode").asInt() shouldBe 53300
        err.get("errorMessage").asText() should include("concurrent-statement limit")
      } finally {
        release.countDown()
        holder.join()
        tenant.spark.conf.unset("spark.graft.statementClampTimeoutSec")
      }
    } finally srv.stop()
  }

  test("concurrent fetches on one statement: buffer replays race advances without errors") {
    // The TOCTOU pin: deciding "this fetch is a pure buffer read" and
    // serving it are ONE atomic statement-lock section, so a concurrent
    // fetch advancing the cursor between the two can neither route a
    // re-execution around the tenant gate nor turn an advertised replay
    // into a 500. Offsets are chosen so every interleaving is LEGAL
    // (walker {0,3,6} strictly forward then reset; hammers replay 0),
    // and each offset's first row is deterministic under ANY
    // interleaving — so content, not just status, is asserted.
    open("c17", "orga")
    val sid = createStatement("c17")
    rpc(s"""{"request":"prepareAndExecute","connectionId":"c17","statementId":$sid,""" +
      """"sql":"SELECT `timestamp`, v FROM avmetric ORDER BY `timestamp`","maxRowCount":-1}""")
    val firstRowAt = Map(0 -> 10L, 3 -> 40L, 6 -> 70L)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def fetchOnce(c: HttpClient, offset: Int): Unit = {
      val r = c.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}/"))
          .POST(BodyPublishers.ofString(
            s"""{"request":"fetch","connectionId":"c17","statementId":$sid,""" +
              s""""offset":$offset,"fetchMaxRowCount":3}"""))
          .build(), BodyHandlers.ofString())
      if (r.statusCode() != 200) bad.add(s"HTTP ${r.statusCode()} @$offset: ${r.body().take(160)}")
      else {
        val f = mapper.readTree(r.body()).get("frame")
        if (f == null) bad.add(s"no frame @$offset: ${r.body().take(160)}")
        else if (f.get("rows").size() == 0 || f.at("/rows/0/0").asLong() != firstRowAt(offset))
          bad.add(s"wrong rows @$offset: ${f.toString.take(160)}")
      }
    }
    val hammers = (1 to 2).map(_ => new Thread(() => {
      val c = HttpClient.newHttpClient()
      (1 to 60).foreach(_ => fetchOnce(c, 0))
    }))
    val walker = new Thread(() => {
      val c = HttpClient.newHttpClient()
      (1 to 20).foreach(_ => Seq(0, 3, 6).foreach(fetchOnce(c, _)))
    })
    val ts = hammers :+ walker
    ts.foreach(_.start()); ts.foreach(_.join())
    withClue(bad.asScala.take(3).mkString(" | ")) { bad.size() shouldBe 0 }
    rpc(s"""{"request":"closeStatement","connectionId":"c17","statementId":$sid}""")
  }

  test("buffered-frame replay skips the tenant's statement permit (no stall behind executes)") {
    // ONE permit: while a long-running statement holds it, paging rows the
    // server already delivered must NOT block or 500 — the replay is a
    // pure buffer read, exempt from the clamp by design.
    val tenant = TenantSession.open(spark, registry, "orga", sources,
      maxConcurrentStatements = 1)
    val srv = new GraftAvaticaServer(_ => tenant, defaultFrameRows = 3)
    try {
      def srpc(json: String): (Int, com.fasterxml.jackson.databind.JsonNode) = {
        val r = client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.boundPort}/"))
            .POST(BodyPublishers.ofString(json)).build(),
          BodyHandlers.ofString())
        (r.statusCode(), mapper.readTree(r.body()))
      }
      srpc("""{"request":"openConnection","connectionId":"cp","info":{"apikey":"orga"}}""")
      val (_, cs) = srpc("""{"request":"createStatement","connectionId":"cp"}""")
      val sid = cs.get("statementId").asInt()
      val (est, _) = srpc(
        s"""{"request":"prepareAndExecute","connectionId":"cp","statementId":$sid,""" +
          """"sql":"SELECT `timestamp` FROM avmetric ORDER BY `timestamp`","maxRowCount":-1}""")
      est shouldBe 200 // first frame (3 rows) now buffered
      val started = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => tenant.runGated { started.countDown(); release.await() })
      holder.start()
      started.await()
      try {
        // the single permit is HELD — a replay of buffered rows must
        // still answer, fast
        val t0 = System.nanoTime()
        val (fst, frame) = srpc(
          s"""{"request":"fetch","connectionId":"cp","statementId":$sid,"offset":0,"fetchMaxRowCount":2}""")
        val elapsedSec = (System.nanoTime() - t0) / 1e9
        fst shouldBe 200
        frame.at("/frame/rows").size() shouldBe 2
        frame.at("/frame/rows/0/0").asLong() shouldBe 10L
        elapsedSec should be < 10.0 // nowhere near the 60 s clamp timeout
        // syncResults is buffer-only too — answers ungated
        val (sst, sync) = srpc(
          s"""{"request":"syncResults","connectionId":"cp","statementId":$sid,"offset":0}""")
        sst shouldBe 200
        sync.get("moreResults").asBoolean() shouldBe true
      } finally {
        release.countDown()
        holder.join()
      }
    } finally srv.stop()
  }
}
