package graft.sources.dsv2

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.sources.ReadPlanner
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import scala.collection.mutable

/** Cloud adapter for the nearline seam: speaks the PUBLIC DynamoDB
  * low-level wire protocol (JSON over HTTP, `X-Amz-Target:
  * DynamoDB_20120810.*`, SigV4-signed) using only the JDK's HttpClient —
  * no SDK jars, so it compiles and fault-tests in this sandbox against a
  * stub endpoint and points at a real regional endpoint (or DynamoDB
  * Local) unchanged. This is the production half the parquet/in-memory
  * stubs rehearse (`DynamoRecordReader.java:115-247` is the reference's
  * SDK-backed equivalent).
  *
  * Addressing: `dynamo://host:port/TableName` (plain HTTP — local stubs)
  * or `dynamos://host/TableName` (TLS — a real endpoint). Region and
  * credentials come from system properties `graft.dynamo.region` /
  * `graft.dynamo.access` / `graft.dynamo.secret`, falling back to the
  * standard `AWS_*` environment names; defaults suit local stubs, which
  * accept any signature.
  *
  * Read translation ([[ReadPlanner.Read]] → API calls):
  *
  *   - `Scan` → `Scan` with native `Segment`/`TotalSegments` parallelism
  *     and the filter as a `FilterExpression`;
  *   - `Query` → `Query` with `KeyConditionExpression` (hash equality +
  *     sort condition) and attribute filter. The service has no query
  *     segmentation, so only segment 0 issues the call and sibling
  *     segments return empty — a production refinement would split the
  *     sort range across segments instead;
  *   - `Get` → `GetItem`; `MultiRead` → its sub-reads in sequence, the
  *     composite position carried in the continuation token.
  *
  * Tokens: the service's `LastEvaluatedKey` rides the seam's opaque
  * string token verbatim (serialized JSON) and is echoed back as
  * `ExclusiveStartKey` — the genuine O(1) server-side resume the stub
  * transports model. Transient failures (HTTP 5xx, throttles) surface as
  * exceptions; [[PagedSegmentIterator]] closes the session and re-opens
  * from the last good token, so a throttle costs one page retry, never a
  * rescan.
  *
  * Typing rule (documented, deterministic): the sort key is emitted as a
  * Dynamo `N` (the reference stores epoch-millis sort keys as numbers,
  * `DynamoTimestampHandler.java:50-54`); every other value is `S`.
  * Decoded records keep `N` values as strings — exactly how the reference
  * reads them (`DynamoRecordReader.java:201-216`) and what
  * [[StubService.toInternalRow]] expects. */
class HttpDynamoTransport extends NearlineTransport {
  import HttpDynamoTransport._

  override def page(
      path: String,
      read: ReadPlanner.Read,
      hashKey: String,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[String],
      pageSize: Int): NearlinePage = {
    val ep = Endpoint.parse(path)
    read match {
      case s: ReadPlanner.Scan =>
        scanPage(ep, s, sortKey, segment, numSegments, token, pageSize)
      case q: ReadPlanner.Query =>
        if (segment > 0) NearlinePage(Nil, None)
        else queryPage(ep, q, hashKey, sortKey, token, pageSize)
      case g: ReadPlanner.Get =>
        if (segment > 0) NearlinePage(Nil, None)
        else NearlinePage(getItem(ep, g, hashKey, sortKey).toSeq, None)
      case m: ReadPlanner.MultiRead =>
        if (segment > 0) NearlinePage(Nil, None)
        else multiPage(ep, m, hashKey, sortKey, token, pageSize)
    }
  }

  // ------------------------------------------------------------- actions

  private def scanPage(
      ep: Endpoint,
      s: ReadPlanner.Scan,
      sortKey: String,
      segment: Int,
      numSegments: Int,
      token: Option[String],
      pageSize: Int): NearlinePage = {
    val body = mapper.createObjectNode()
    body.put("TableName", ep.table)
    body.put("Limit", pageSize)
    if (numSegments > 1) {
      body.put("Segment", segment)
      body.put("TotalSegments", numSegments)
    }
    s.filter.foreach(attachExpression(body, "FilterExpression", _, sortKey))
    token.foreach(t => body.set[JsonNode]("ExclusiveStartKey", mapper.readTree(t)))
    val resp = call(ep, "Scan", body)
    pageOf(resp)
  }

  private def queryPage(
      ep: Endpoint,
      q: ReadPlanner.Query,
      hashKey: String,
      sortKey: String,
      token: Option[String],
      pageSize: Int): NearlinePage = {
    val body = mapper.createObjectNode()
    body.put("TableName", ep.table)
    body.put("Limit", pageSize)
    val keyCond = ReadPlanner.And(
      ReadPlanner.Eq(hashKey, q.hash) +: q.sortCond.toSeq)
    attachExpression(body, "KeyConditionExpression", keyCond, sortKey)
    q.filter.foreach(attachExpression(body, "FilterExpression", _, sortKey))
    token.foreach(t => body.set[JsonNode]("ExclusiveStartKey", mapper.readTree(t)))
    val resp = call(ep, "Query", body)
    pageOf(resp)
  }

  private def getItem(
      ep: Endpoint,
      g: ReadPlanner.Get,
      hashKey: String,
      sortKey: String): Option[Map[String, Any]] = {
    val body = mapper.createObjectNode()
    body.put("TableName", ep.table)
    val key = body.putObject("Key")
    key.putObject(hashKey).put("S", g.hash)
    key.putObject(sortKey).put("N", g.sort)
    val resp = call(ep, "GetItem", body)
    Option(resp.get("Item")).map(decodeItem)
  }

  /** Sub-reads run in sequence; the token is `<subReadIndex>|<base64 of
    * the sub-read's own token>` so the composite read resumes exactly. */
  private def multiPage(
      ep: Endpoint,
      m: ReadPlanner.MultiRead,
      hashKey: String,
      sortKey: String,
      token: Option[String],
      pageSize: Int): NearlinePage = {
    val (idx, inner) = token match {
      case None => (0, None)
      case Some(t) =>
        val Array(i, rest) = t.split("\\|", 2)
        (i.toInt, if (rest.isEmpty) None
          else Some(new String(java.util.Base64.getDecoder.decode(rest), UTF_8)))
    }
    if (idx >= m.reads.length) return NearlinePage(Nil, None)
    val p = page(ep.raw, m.reads(idx), hashKey, sortKey, 0, 1, inner, pageSize)
    p.nextToken match {
      case Some(t) =>
        val enc = java.util.Base64.getEncoder.encodeToString(t.getBytes(UTF_8))
        NearlinePage(p.records, Some(s"$idx|$enc"))
      case None =>
        // this sub-read is exhausted; hand the next one to the next page call
        if (idx + 1 < m.reads.length) NearlinePage(p.records, Some(s"${idx + 1}|"))
        else NearlinePage(p.records, None)
    }
  }

  /** `DescribeTable` item count — the planning statistic
    * (`DynamoGroupScan` reads the same metadata service-side). */
  def describeItemCount(path: String): Long = {
    val ep = Endpoint.parse(path)
    val body = mapper.createObjectNode()
    body.put("TableName", ep.table)
    val resp = call(ep, "DescribeTable", body)
    Option(resp.at("/Table/ItemCount")).filter(!_.isMissingNode).map(_.asLong(1L)).getOrElse(1L)
  }

  // --------------------------------------------------- expression builder

  /** Render a [[ReadPlanner.Pred]] as a Dynamo expression with `#n<i>` /
    * `:v<i>` placeholders, merging names/values into the request. */
  private def attachExpression(
      body: ObjectNode, field: String, p: ReadPlanner.Pred, sortKey: String): Unit = {
    val names = Option(body.get("ExpressionAttributeNames"))
      .map(_.asInstanceOf[ObjectNode]).getOrElse(body.putObject("ExpressionAttributeNames"))
    val values = Option(body.get("ExpressionAttributeValues"))
      .map(_.asInstanceOf[ObjectNode]).getOrElse(body.putObject("ExpressionAttributeValues"))
    var n = names.size()
    var v = values.size()
    def nameRef(f: String): String = {
      val ref = s"#n$n"; n += 1
      names.put(ref, f); ref
    }
    def valueRef(f: String, value: String): String = {
      val ref = s":v$v"; v += 1
      values.putObject(ref).put(if (f == sortKey) "N" else "S", value)
      ref
    }
    def build(p: ReadPlanner.Pred): String = p match {
      case ReadPlanner.Eq(f, x) => s"${nameRef(f)} = ${valueRef(f, x)}"
      case ReadPlanner.Ne(f, x) => s"${nameRef(f)} <> ${valueRef(f, x)}"
      case ReadPlanner.Cmp(f, op, x) => s"${nameRef(f)} $op ${valueRef(f, x)}"
      case ReadPlanner.Between(f, lo, hi) =>
        s"${nameRef(f)} BETWEEN ${valueRef(f, lo)} AND ${valueRef(f, hi)}"
      case ReadPlanner.And(ps) => ps.map(build).mkString("(", " AND ", ")")
      case ReadPlanner.Or(ps)  => ps.map(build).mkString("(", " OR ", ")")
      case o: ReadPlanner.Opaque =>
        throw new IllegalArgumentException(s"not expressible server-side: $o")
    }
    body.put(field, build(p))
  }

  // ------------------------------------------------------------ transport

  private def call(ep: Endpoint, action: String, body: ObjectNode): JsonNode = {
    val payload = mapper.writeValueAsString(body)
    val target = s"DynamoDB_20120810.$action"
    val now = java.time.Instant.now().atOffset(ZoneOffset.UTC)
    val amzDate = now.format(DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
    val auth = SigV4.authorization(
      access = prop("graft.dynamo.access", "AWS_ACCESS_KEY_ID", "stub"),
      secret = prop("graft.dynamo.secret", "AWS_SECRET_ACCESS_KEY", "stub"),
      region = prop("graft.dynamo.region", "AWS_REGION", "us-east-1"),
      service = "dynamodb", host = ep.hostHeader, amzDate = amzDate,
      target = target, payload = payload)
    val req = HttpRequest.newBuilder(URI.create(ep.url))
      .header("Content-Type", "application/x-amz-json-1.0")
      .header("X-Amz-Target", target)
      .header("X-Amz-Date", amzDate)
      .header("Authorization", auth)
      .POST(HttpRequest.BodyPublishers.ofString(payload, UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    if (resp.statusCode() != 200)
      // 5xx and throttles are RETRYABLE: the paged iterator re-opens from
      // the last good token (`fetchPageWithRetry`), per the seam contract
      throw new java.io.IOException(
        s"$action on ${ep.table} failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
    mapper.readTree(resp.body())
  }

  private def pageOf(resp: JsonNode): NearlinePage = {
    val items = Option(resp.get("Items")).map(_.asInstanceOf[ArrayNode]).toSeq
      .flatMap(a => (0 until a.size()).map(i => decodeItem(a.get(i))))
    val next = Option(resp.get("LastEvaluatedKey")).filter(!_.isNull)
      .map(mapper.writeValueAsString)
    NearlinePage(items, next)
  }

  // ---------------------------------------------------------- wire codec

  /** Dynamo attribute-value JSON → the seam's plain record shape. `N`
    * stays a STRING (reference parity — `DynamoRecordReader.java:201-216`;
    * the engine's recombinator owns numeric casting). */
  private def decodeItem(item: JsonNode): Map[String, Any] = {
    val it = item.properties().iterator()
    val out = mutable.LinkedHashMap.empty[String, Any]
    while (it.hasNext) {
      val e = it.next()
      out(e.getKey) = decodeValue(e.getValue)
    }
    out.toMap
  }

  private def decodeValue(av: JsonNode): Any = {
    val e = av.properties().iterator().next()
    val t = e.getKey
    val v = e.getValue
    t match {
      case "S"    => v.asText()
      case "N"    => v.asText() // numbers travel as strings, by contract
      case "BOOL" => v.asBoolean()
      case "NULL" => null
      case "B"    => java.util.Base64.getDecoder.decode(v.asText())
      case "L"    => (0 until v.size()).map(i => decodeValue(v.get(i)))
      case "SS" | "NS" => (0 until v.size()).map(i => v.get(i).asText())
      case "M" =>
        val it = v.properties().iterator()
        val m = mutable.LinkedHashMap.empty[String, Any]
        while (it.hasNext) { val x = it.next(); m(x.getKey) = decodeValue(x.getValue) }
        m.toMap
      case other => throw new IllegalArgumentException(s"unsupported attribute type: $other")
    }
  }

  private def prop(sys: String, env: String, dflt: String): String =
    Option(System.getProperty(sys)).orElse(Option(System.getenv(env))).getOrElse(dflt)
}

object HttpDynamoTransport {
  private[dsv2] val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  def isDynamoPath(path: String): Boolean =
    path != null && (path.startsWith("dynamo://") || path.startsWith("dynamos://"))

  /** `dynamo://host:port/Table` (http) or `dynamos://host[:port]/Table`
    * (https, a real endpoint). */
  private[dsv2] case class Endpoint(raw: String, scheme: String, authority: String, table: String) {
    def url: String = s"$scheme://$authority/"
    /** SigV4 signs the Host header incl. non-default port. */
    def hostHeader: String = authority
  }

  private[dsv2] object Endpoint {
    def parse(path: String): Endpoint = {
      val u = URI.create(path)
      val scheme = u.getScheme match {
        case "dynamo" => "http"
        case "dynamos" => "https"
        case other => throw new IllegalArgumentException(s"not a dynamo path: $path")
      }
      val table = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(s"no table in path: $path"))
      Endpoint(path, scheme, u.getAuthority, table)
    }
  }
}

/** AWS Signature Version 4 for the single request shape this transport
  * sends (POST /, JSON body, 4 signed headers) — the public algorithm
  * (AWS "Signature Version 4 signing process"), implemented on JDK
  * crypto so no SDK dependency is needed. Local stubs ignore the header;
  * a real endpoint validates it. */
private[dsv2] object SigV4 {
  import javax.crypto.Mac
  import javax.crypto.spec.SecretKeySpec
  import java.security.MessageDigest

  def authorization(
      access: String, secret: String, region: String, service: String,
      host: String, amzDate: String, target: String, payload: String): String = {
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val signedHeaders = "content-type;host;x-amz-date;x-amz-target"
    val canonicalHeaders =
      s"content-type:application/x-amz-json-1.0\nhost:$host\n" +
        s"x-amz-date:$amzDate\nx-amz-target:$target\n"
    val canonicalRequest =
      s"POST\n/\n\n$canonicalHeaders\n$signedHeaders\n${hex(sha256(payload.getBytes(UTF_8)))}"
    val stringToSign =
      s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n${hex(sha256(canonicalRequest.getBytes(UTF_8)))}"
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secret".getBytes(UTF_8), date), region), service), "aws4_request")
    val signature = hex(hmacRaw(kSigning, stringToSign.getBytes(UTF_8)))
    s"AWS4-HMAC-SHA256 Credential=$access/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }

  private def sha256(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(bytes)

  private def hmac(key: Array[Byte], data: String): Array[Byte] =
    hmacRaw(key, data.getBytes(UTF_8))

  private def hmacRaw(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString
}
