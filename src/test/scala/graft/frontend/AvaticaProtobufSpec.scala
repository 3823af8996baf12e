package graft.frontend

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

/** The Avatica PROTOBUF transport (the reference's production wire —
  * `AvaticaProtobufHandler` in `FineoServer.java`) driven by a
  * hand-rolled protobuf client built on the same [[ProtoWire]] codec:
  * WireMessage framing, openConnection with the tenant key, statement
  * round-trip with frame paging, prepare/execute with a bound parameter,
  * metadata RPC, and the protobuf error shape. Field numbers follow
  * Avatica's public requests.proto/responses.proto/common.proto. */
class AvaticaProtobufSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private val registry = SchemaRegistry(
    Org("orga", Seq(Metric("ma", "avmetric", Seq(Field("v", FieldType.LONG))))))

  private lazy val sources: SourceSet = {
    val dir = SparkFixture.tempDir("avproto")
    val schema = StructType(Seq(
      StructField("companykey", StringType), StructField("metrictype", StringType),
      StructField("timestamp", LongType), StructField("v", LongType)))
    val rows = (1 to 7).map(i => Row("orga", "ma", i * 10L, i.toLong))
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/0/parquet/orga/ma")
    SourceSet(fs = Seq(FsSource("parquet", dir)))
  }

  private lazy val server = new GraftAvaticaServer(
    key => TenantSession.open(spark, registry, key, sources),
    defaultFrameRows = 3)
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = server.stop()

  private val ReqPrefix = "org.apache.calcite.avatica.proto.Requests$"

  /** POST a WireMessage-wrapped request; unwrap the response. */
  private def rpc(name: String, body: ProtoWriter => Unit): (Int, String, ProtoReader) = {
    val inner = new ProtoWriter
    body(inner)
    val w = new ProtoWriter
    w.string(1, ReqPrefix + name)
    w.bytes(2, inner.toBytes)
    val r: HttpResponse[Array[Byte]] = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}/"))
        .header("Content-Type", "application/x-google-protobuf")
        .POST(BodyPublishers.ofByteArray(w.toBytes)).build(),
      BodyHandlers.ofByteArray())
    val wire = new ProtoReader(r.body())
    val respName = wire.str(1).split('$').last
    (r.statusCode(), respName,
      new ProtoReader(wire.first(2).map(_.payload).getOrElse(Array.empty[Byte])))
  }

  private def open(cid: String, key: String): Unit = {
    val (st, name, _) = rpc("OpenConnectionRequest", w => {
      w.string(1, cid)
      w.message(2, e => { e.string(1, "apikey"); e.string(2, key) })
    })
    st shouldBe 200
    name shouldBe "OpenConnectionResponse"
  }

  /** Decode Frame → rows of scalar TypedValues (LONG → Long, STRING →
    * String, DOUBLE → Double, null → null). */
  private def frameRows(frame: ProtoReader): Seq[Seq[Any]] =
    frame.all(3).map { rowF =>
      new ProtoReader(rowF.payload).all(1).map { cvF =>
        val cv = new ProtoReader(cvF.payload)
        val tv = cv.sub(4).getOrElse(fail("missing scalar_value"))
        tv.int(1) match {
          case 24 => null
          case 13 => tv.first(4).map(_.sint).getOrElse(0L)
          case 15 => tv.first(6).map(_.asDouble).getOrElse(0.0)
          case 8  => tv.boolean(2)
          case _  => tv.str(3)
        }
      }.toSeq
    }.toSeq

  test("query round-trip with frame paging over the protobuf wire") {
    open("p1", "orga")
    val (_, csName, cs) = rpc("CreateStatementRequest", _.string(1, "p1"))
    csName shouldBe "CreateStatementResponse"
    val sid = cs.int(2)
    val (st, exName, ex) = rpc("PrepareAndExecuteRequest", w => {
      w.string(1, "p1")
      w.string(2, "SELECT `timestamp`, v FROM avmetric ORDER BY `timestamp`")
      w.uint32(4, sid)
      w.int64(5, 100) // max_rows_total
    })
    st shouldBe 200
    exName shouldBe "ExecuteResponse"
    val rs = new ProtoReader(ex.first(1).map(_.payload).getOrElse(fail("no results")))
    rs.int(2) shouldBe sid
    // signature carries the column names
    val sig = rs.sub(4).get
    val colNames = sig.all(1).map(c => new ProtoReader(c.payload).str(10))
    colNames shouldBe Vector("timestamp", "v")
    // first frame: 3 rows (defaultFrameRows), done=false
    val f0 = rs.sub(5).get
    f0.boolean(2) shouldBe false
    frameRows(f0) shouldBe Seq(Seq(10L, 1L), Seq(20L, 2L), Seq(30L, 3L))
    // page on: fetch from offset 3
    val (_, fName, fr) = rpc("FetchRequest", w => {
      w.string(1, "p1"); w.uint32(2, sid); w.uint64(3, 3); w.int64(5, 10)
    })
    fName shouldBe "FetchResponse"
    val f1 = fr.sub(1).get
    f1.boolean(2) shouldBe true // done
    frameRows(f1).map(_.head) shouldBe Seq(40L, 50L, 60L, 70L)
  }

  test("prepare + execute binds a protobuf TypedValue parameter") {
    open("p2", "orga")
    val (_, pn, pr) = rpc("PrepareRequest", w => {
      w.string(1, "p2")
      w.string(2, "SELECT v FROM avmetric WHERE v = ? ORDER BY v")
    })
    pn shouldBe "PrepareResponse"
    val handle = pr.sub(1).get
    val hid = handle.int(2)
    // signature advertises one parameter slot
    handle.sub(3).get.all(3).size shouldBe 1
    val (_, en, ex) = rpc("ExecuteRequest", w => {
      w.message(1, h => { h.string(1, "p2"); h.uint32(2, hid) })
      w.message(2, tv => { tv.int64(1, 13); tv.sint64(4, 5L) }) // LONG 5
      w.bool(4, true) // has_parameter_values
    })
    en shouldBe "ExecuteResponse"
    val rs = new ProtoReader(ex.first(1).map(_.payload).getOrElse(fail("no results")))
    frameRows(rs.sub(5).get) shouldBe Seq(Seq(5L))
  }

  test("typed-null and double parameters bind over protobuf") {
    open("p6", "orga")
    val (_, _, pr) = rpc("PrepareRequest", w => {
      w.string(1, "p6")
      w.string(2, "SELECT count(*) AS c FROM avmetric WHERE v = coalesce(?, v) AND v < ?")
    })
    val hid = pr.sub(1).get.int(2)
    val (_, en, ex) = rpc("ExecuteRequest", w => {
      w.message(1, h => { h.string(1, "p6"); h.uint32(2, hid) })
      // typed null LONG: rep=13, null=true — must keep the column type
      w.message(2, tv => { tv.int64(1, 13); tv.bool(7, true) })
      // DOUBLE 3.5: rep=15, double_value (fixed64)
      w.message(2, tv => { tv.int64(1, 15); tv.double(6, 3.5) })
      w.bool(4, true)
    })
    en shouldBe "ExecuteResponse"
    val rs = new ProtoReader(ex.first(1).map(_.payload).getOrElse(fail("no results")))
    frameRows(rs.sub(5).get) shouldBe Seq(Seq(3L)) // v in {1,2,3} < 3.5
  }

  test("deprecated fetch_max_row_count still pages when frame_max_size is absent") {
    open("p7", "orga")
    val (_, _, cs) = rpc("CreateStatementRequest", _.string(1, "p7"))
    val sid = cs.int(2)
    rpc("PrepareAndExecuteRequest", w => {
      w.string(1, "p7")
      w.string(2, "SELECT v FROM avmetric ORDER BY v")
      w.uint32(4, sid)
    })
    val (_, _, fr) = rpc("FetchRequest", w => {
      w.string(1, "p7"); w.uint32(2, sid); w.uint64(3, 3); w.uint32(4, 2) // field 4, not 5
    })
    frameRows(fr.sub(1).get).map(_.head) shouldBe Seq(4L, 5L)
  }

  test("metadata RPC (getTables) rides the protobuf wire as a ResultSetResponse") {
    open("p3", "orga")
    val (_, name, rs) = rpc("TablesRequest", _.string(7, "p3"))
    name shouldBe "ResultSetResponse"
    val names = frameRows(rs.sub(5).get).map(_(2))
    names should contain("avmetric")
  }

  test("writes are refused through the protobuf wire too (same gate)") {
    open("p4", "orga")
    val (_, _, cs) = rpc("CreateStatementRequest", _.string(1, "p4"))
    val sid = cs.int(2)
    val (st, name, err) = rpc("PrepareAndExecuteRequest", w => {
      w.string(1, "p4")
      w.string(2, "DROP TABLE avmetric")
      w.uint32(4, sid)
    })
    st shouldBe 500
    name shouldBe "ErrorResponse"
    err.str(3).toLowerCase should include("read-only")
    err.str(6) shouldBe "00000" // sql_state present
  }

  test("an unknown tenant key is a protobuf ErrorResponse at open") {
    val (st, name, err) = rpc("OpenConnectionRequest", w => {
      w.string(1, "p5")
      w.message(2, e => { e.string(1, "apikey"); e.string(2, "nosuch") })
    })
    st shouldBe 500
    name shouldBe "ErrorResponse"
    err.boolean(2) shouldBe true // has_exceptions
  }

  test("proto wire codec round-trips the scalar kinds (zigzag, fixed64, utf8)") {
    val w = new ProtoWriter
    w.sint64(1, -42L)
    w.double(2, 2.5)
    w.string(3, "héllo\nworld")
    w.uint64(4, Long.MaxValue)
    w.bool(5, true)
    val r = new ProtoReader(w.toBytes)
    r.first(1).get.sint shouldBe -42L
    r.first(2).get.asDouble shouldBe 2.5
    r.str(3) shouldBe "héllo\nworld"
    r.long(4) shouldBe Long.MaxValue
    r.boolean(5) shouldBe true
  }
}
