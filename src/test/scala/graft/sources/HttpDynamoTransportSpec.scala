package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkFixture
import graft.sources.dsv2.{HttpDynamoTransport, PagedSegmentIterator}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** The cloud transport against an in-process stub speaking the PUBLIC
  * DynamoDB wire protocol (JSON over HTTP, Scan/Query/GetItem/
  * DescribeTable, ExclusiveStartKey paging, Dynamo Limit semantics =
  * items EXAMINED not matched — so empty pages with tokens occur, which
  * the seam contract explicitly allows). Fault injection proves the
  * retry path: a 500 mid-stream must resume from the same
  * ExclusiveStartKey with no drops or duplicates. */
class HttpDynamoTransportSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ------------------------------------------------------------ stub data

  private def item(p: String, sort: Long, amount: String): ObjectNode = {
    val o = mapper.createObjectNode()
    o.putObject("partition").put("S", p)
    o.putObject("sort").put("N", sort.toString)
    o.putObject("amount").put("S", amount)
    o
  }

  private val rows: IndexedSeq[ObjectNode] =
    (0 until 200).map(i => item(s"p${i % 5}", 1000L + i, (i % 13).toString))

  private val stub = new DynamoWireStub("tbl", rows)
  private lazy val path = s"dynamo://localhost:${stub.port}/tbl"

  override def afterAll(): Unit = stub.stop()

  private def transport = new HttpDynamoTransport

  private def drain(read: ReadPlanner.Read, segment: Int = 0, numSegments: Int = 1,
      pageSize: Int = 25): Seq[Map[String, Any]] = {
    val it = new PagedSegmentIterator(
      transport, path, read, "partition", "sort", segment, numSegments, pageSize)
    try it.toVector finally it.close()
  }

  // ----------------------------------------------------------------- tests

  test("segmented scan pages every item exactly once through the wire") {
    stub.reset()
    val got = (0 until 3).flatMap(s =>
      drain(ReadPlanner.Scan(None, None), segment = s, numSegments = 3))
    got.length shouldBe 200
    got.map(r => (r("partition"), r("sort"))).toSet.size shouldBe 200
    // N values decode as STRINGS (DynamoRecordReader parity)
    got.head("sort") shouldBe a[String]
    // multiple page round-trips actually happened
    stub.requests.count(_.action == "Scan") should be > 3
  }

  test("every request is SigV4-signed with the documented header shape") {
    stub.reset()
    drain(ReadPlanner.Scan(None, None), pageSize = 120)
    stub.requests should not be empty
    stub.requests.foreach { r =>
      r.auth should fullyMatch regex
        ("AWS4-HMAC-SHA256 Credential=[^/]+/\\d{8}/[a-z0-9-]+/dynamodb/aws4_request, " +
          "SignedHeaders=content-type;host;x-amz-date;x-amz-target, Signature=[0-9a-f]{64}")
      r.amzDate should fullyMatch regex "\\d{8}T\\d{6}Z"
    }
  }

  test("server-side filter expressions evaluate in the service") {
    stub.reset()
    val got = drain(ReadPlanner.Scan(Some(ReadPlanner.Eq("amount", "7")), None))
    got should not be empty
    got.foreach(_("amount") shouldBe "7")
    // the stub (not the client) dropped the non-matching rows
    val scans = stub.requests.filter(_.action == "Scan")
    scans.foreach(_.body.get("FilterExpression").asText() should include("= :v"))
  }

  test("query translates to a KeyConditionExpression with a sort BETWEEN") {
    stub.reset()
    val got = drain(ReadPlanner.Query(
      "p3", Some(ReadPlanner.Between("sort", "1050", "1100")), None, None))
    got.map(_("sort").asInstanceOf[String].toLong).sorted shouldBe
      (1050L to 1100L).filter(s => (s - 1000) % 5 == 3)
    val q = stub.requests.find(_.action == "Query").get
    q.body.get("KeyConditionExpression").asText() should include("BETWEEN")
    // sort-key literals travel as Dynamo numbers, not strings
    q.body.at("/ExpressionAttributeValues/:v1/N").isMissingNode shouldBe false
  }

  test("a point Get issues GetItem and returns at most one record") {
    stub.reset()
    val got = drain(ReadPlanner.Get("p2", "1002", None))
    got.map(r => (r("partition"), r("sort"))) shouldBe Seq(("p2", "1002"))
    stub.requests.map(_.action) should contain("GetItem")
    drain(ReadPlanner.Get("p2", "999999", None)) shouldBe empty
  }

  test("multi-read sequences its sub-reads through the composite token") {
    stub.reset()
    val got = drain(ReadPlanner.MultiRead(Seq(
      ReadPlanner.Get("p1", "1001", None),
      ReadPlanner.Query("p4", Some(ReadPlanner.Cmp("sort", ">=", "1190")), None, None))))
    got.map(r => (r("partition"), r("sort"))) shouldBe
      Seq(("p1", "1001"), ("p4", "1194"), ("p4", "1199"))
  }

  test("a transient 500 resumes from the same ExclusiveStartKey — no drops, no dups") {
    stub.reset()
    stub.failOnceOnResumedPage.set(true)
    val got = drain(ReadPlanner.Scan(None, None), pageSize = 30)
    got.length shouldBe 200
    got.map(r => (r("partition"), r("sort"))).toSet.size shouldBe 200
    stub.injectedFailures.get() shouldBe 1
    // the retried request re-sent the exact token the failed request had
    val failed = stub.failedStartKey.get()
    failed should not be null
    stub.requests.filter(_.action == "Scan")
      .count(r => r.startKey == failed) should be >= 2
  }

  test("the connector reads end-to-end over the wire transport (DescribeTable stats)") {
    stub.reset()
    val schema = StructType(Seq(
      StructField("partition", StringType), StructField("sort", StringType),
      StructField("amount", StringType)))
    val df = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", path).schema(schema).load()
    df.count() shouldBe 200
    // pushdown still plans keyed reads through the wire transport
    val q = df.filter(col("partition") === "p3")
    q.count() shouldBe 40
    q.queryExecution.executedPlan.toString should include("mode=QUERY")
    stub.requests.map(_.action).toSet should contain("DescribeTable")
  }
}

// --------------------------------------------------------------------------
// In-process DynamoDB wire stub
// --------------------------------------------------------------------------

/** Minimal DynamoDB endpoint: Scan (Segment/TotalSegments, Limit as
  * items-EXAMINED, FilterExpression), Query (KeyConditionExpression),
  * GetItem, DescribeTable. LastEvaluatedKey is an `{"_i":{"N":idx}}`
  * index key — opaque to the client, echoed back verbatim, exactly the
  * real service's contract. Instrumented: records every request (action,
  * start key, auth headers) and can inject one 500 on the first resumed
  * page to exercise the retry path. */
class DynamoWireStub(table: String, rows: IndexedSeq[ObjectNode]) {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  case class Req(action: String, body: JsonNode, auth: String, amzDate: String) {
    def startKey: String =
      Option(body.get("ExclusiveStartKey")).map(_.toString).getOrElse("")
  }
  val requests = new java.util.concurrent.CopyOnWriteArrayList[Req]().asScala
  val failOnceOnResumedPage = new java.util.concurrent.atomic.AtomicBoolean(false)
  val injectedFailures = new AtomicInteger(0)
  val failedStartKey = new java.util.concurrent.atomic.AtomicReference[String]()

  def reset(): Unit = {
    requests.clear()
    failOnceOnResumedPage.set(false)
    injectedFailures.set(0)
    failedStartKey.set(null)
  }

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress(0), 0)
    s.createContext("/", (ex: HttpExchange) => {
      val (status, resp) =
        try handle(ex)
        catch { case e: Exception => (400, s"""{"__type":"StubError","message":"${e.getMessage}"}""") }
      val bytes = resp.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.0")
      ex.sendResponseHeaders(status, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    })
    s.start()
    s
  }
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): (Int, String) = {
    val action = Option(ex.getRequestHeaders.getFirst("X-Amz-Target"))
      .map(_.stripPrefix("DynamoDB_20120810.")).getOrElse("?")
    val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
    val req = Req(action,
      body,
      Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""),
      Option(ex.getRequestHeaders.getFirst("X-Amz-Date")).getOrElse(""))
    requests += req
    require(body.get("TableName").asText() == table, "unknown table")
    if (action == "Scan" && req.startKey.nonEmpty &&
        failOnceOnResumedPage.compareAndSet(true, false)) {
      injectedFailures.incrementAndGet()
      failedStartKey.set(req.startKey)
      return (500, """{"__type":"InternalServerError"}""")
    }
    action match {
      case "DescribeTable" =>
        (200, s"""{"Table":{"TableName":"$table","ItemCount":${rows.length}}}""")
      case "GetItem" =>
        val hash = body.at("/Key/partition/S").asText()
        val sort = body.at("/Key/sort/N").asText()
        val hit = rows.find(r => r.at("/partition/S").asText() == hash &&
          r.at("/sort/N").asText() == sort)
        (200, hit.map(h => s"""{"Item":$h}""").getOrElse("{}"))
      case "Scan" =>
        val seg = Option(body.get("Segment")).map(_.asInt()).getOrElse(0)
        val total = Option(body.get("TotalSegments")).map(_.asInt()).getOrElse(1)
        val segRows = rows.zipWithIndex.filter(_._2 % total == seg).map(_._1)
        pageOut(body, segRows, Option(body.get("FilterExpression")).map(f =>
          evaluator(f.asText(), body)))
      case "Query" =>
        val cond = evaluator(body.get("KeyConditionExpression").asText(), body)
        val matching = rows.filter(cond)
        pageOut(body, matching, Option(body.get("FilterExpression")).map(f =>
          evaluator(f.asText(), body)))
      case other => (400, s"""{"__type":"UnknownOperationException","op":"$other"}""")
    }
  }

  /** Dynamo paging: Limit bounds items EXAMINED (post-key-condition,
    * pre-filter), LastEvaluatedKey marks the next examine position. */
  private def pageOut(
      body: JsonNode,
      candidates: IndexedSeq[ObjectNode],
      filter: Option[ObjectNode => Boolean]): (Int, String) = {
    val limit = Option(body.get("Limit")).map(_.asInt()).getOrElse(Int.MaxValue)
    val start = Option(body.get("ExclusiveStartKey"))
      .map(_.at("/_i/N").asText().toInt).getOrElse(0)
    val examined = candidates.slice(start, math.min(candidates.length, start + limit))
    val matched = filter.fold(examined)(f => examined.filter(f))
    val items = matched.mkString("[", ",", "]")
    val more = start + examined.length < candidates.length
    val lek = if (more) s""","LastEvaluatedKey":{"_i":{"N":"${start + examined.length}"}}""" else ""
    (200, s"""{"Items":$items,"Count":${matched.length}$lek}""")
  }

  // --------------------------------------- expression evaluation (stub-side)

  /** Evaluate the placeholder grammar the adapter emits: `#n<i> <op> :v<j>`
    * terms, `BETWEEN ... AND ...`, parenthesized AND/OR chains. Typed
    * compares: N as numbers, S as strings, mismatched types never match. */
  private def evaluator(expr: String, body: JsonNode): ObjectNode => Boolean = {
    val names = body.get("ExpressionAttributeNames")
    val values = body.get("ExpressionAttributeValues")
    val toks = expr.replace("(", " ( ").replace(")", " ) ")
      .split("\\s+").filter(_.nonEmpty).toList

    def cmp(row: ObjectNode, nameRef: String, op: String, valRef: String): Boolean = {
      val field = names.get(nameRef).asText()
      val want = values.get(valRef)
      val have = row.get(field)
      if (have == null) return false
      (Option(have.get("N")), Option(want.get("N"))) match {
        case (Some(a), Some(b)) =>
          val (x, y) = (BigDecimal(a.asText()), BigDecimal(b.asText()))
          op match {
            case "=" => x == y;   case "<>" => x != y
            case "<" => x < y;    case "<=" => x <= y
            case ">" => x > y;    case ">=" => x >= y
          }
        case _ =>
          (Option(have.get("S")), Option(want.get("S"))) match {
            case (Some(a), Some(b)) =>
              val (x, y) = (a.asText(), b.asText())
              op match {
                case "=" => x == y;   case "<>" => x != y
                case "<" => x < y;    case "<=" => x <= y
                case ">" => x > y;    case ">=" => x >= y
              }
            case _ => false // type mismatch never matches
          }
      }
    }

    // recursive descent; the adapter emits fully parenthesized groups so
    // AND/OR chains at one level are unambiguous left-to-right
    def parse(ts: List[String]): (ObjectNode => Boolean, List[String]) = {
      def term(ts: List[String]): (ObjectNode => Boolean, List[String]) = ts match {
        case "(" :: rest =>
          val (f, after) = parse(rest)
          require(after.headOption.contains(")"), s"expected ) at $after")
          (f, after.tail)
        case n :: "BETWEEN" :: lo :: "AND" :: hi :: rest if n.startsWith("#") =>
          ((row: ObjectNode) => cmp(row, n, ">=", lo) && cmp(row, n, "<=", hi), rest)
        case n :: op :: v :: rest if n.startsWith("#") && v.startsWith(":") =>
          ((row: ObjectNode) => cmp(row, n, op, v), rest)
        case other => throw new IllegalArgumentException(s"bad term at $other")
      }
      var (acc, rest) = term(ts)
      while (rest.headOption.exists(t => t == "AND" || t == "OR")) {
        val opTok = rest.head
        val (rhs, rr) = term(rest.tail)
        val lhs = acc
        acc = if (opTok == "AND") (r: ObjectNode) => lhs(r) && rhs(r)
              else (r: ObjectNode) => lhs(r) || rhs(r)
        rest = rr
      }
      (acc, rest)
    }
    val (f, leftover) = parse(toks)
    require(leftover.isEmpty, s"unparsed: $leftover")
    f
  }
}
