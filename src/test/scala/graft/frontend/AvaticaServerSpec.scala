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
    Org("orgb", Seq(Metric("mb", "bmetric", Seq(Field("v", FieldType.LONG))))))

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
    key => TenantSession.open(spark, registry, key, sources),
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
}
