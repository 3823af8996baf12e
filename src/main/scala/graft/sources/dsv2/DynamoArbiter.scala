package graft.sources.dsv2

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

/** [[graft.ops.CommitArbiter]] over the PUBLIC DynamoDB conditional-put
  * wire — the coordination half of object-store standing state, the
  * same way [[HttpDynamoTransport]] is the data half of the nearline
  * seam. One item per claim: `pk` (S, the arbiter key) + `body` (S).
  *
  *   - `putIfAbsent` → `PutItem` with
  *     `ConditionExpression: attribute_not_exists(pk)` — DynamoDB
  *     evaluates the condition atomically server-side, so exactly one
  *     concurrent writer's put succeeds (this primitive is what
  *     Iceberg/Delta S3 commit services are built on);
  *   - `deleteIf` → `DeleteItem` with `ConditionExpression:
  *     body = :b` — atomic compare-and-delete, the lease-release shape;
  *   - failed conditions surface as HTTP 400
  *     `ConditionalCheckFailedException`, mapped to `false`, never an
  *     error.
  *
  * Addressing/credentials are [[HttpDynamoTransport]]'s:
  * `dynamo://host:port/Table` (HTTP, local stubs) or
  * `dynamos://host/Table` (TLS, a real regional endpoint), SigV4-signed
  * from `graft.dynamo.*` system properties / `AWS_*` env. */
final class DynamoArbiter(path: String) extends graft.ops.CommitArbiter {
  import HttpDynamoTransport.Endpoint

  private val ep = Endpoint.parse(path)
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  override def putIfAbsent(key: String, body: String): Boolean = {
    val req = mapper.createObjectNode()
    req.put("TableName", ep.table)
    val item = req.putObject("Item")
    item.putObject("pk").put("S", key)
    item.putObject("body").put("S", body)
    req.put("ConditionExpression", "attribute_not_exists(pk)")
    conditional("PutItem", req)
  }

  override def get(key: String): Option[String] = {
    val req = mapper.createObjectNode()
    req.put("TableName", ep.table)
    req.putObject("Key").putObject("pk").put("S", key)
    val resp = call("GetItem", req)
    val node = resp.at("/Item/body/S")
    if (node.isMissingNode || node.isNull) None else Some(node.asText())
  }

  override def deleteIf(key: String, expect: String): Boolean = {
    val req = deleteNode(key)
    req.put("ConditionExpression", "body = :b")
    req.putObject("ExpressionAttributeValues").putObject(":b").put("S", expect)
    conditional("DeleteItem", req)
  }

  override def delete(key: String): Unit = { call("DeleteItem", deleteNode(key)); () }

  private def deleteNode(key: String) = {
    val req = mapper.createObjectNode()
    req.put("TableName", ep.table)
    req.putObject("Key").putObject("pk").put("S", key)
    req
  }

  /** A conditional write: true on 200, false on the service's
    * ConditionalCheckFailedException (the LOSING side of the race —
    * a normal outcome, not an error), throw on anything else. */
  private def conditional(
      action: String,
      body: com.fasterxml.jackson.databind.node.ObjectNode): Boolean = {
    val resp = send(action, body)
    if (resp.statusCode() == 200) true
    else if (resp.statusCode() == 400 &&
        resp.body().contains("ConditionalCheckFailed")) false
    else throw new java.io.IOException(
      s"$action on ${ep.table} failed: HTTP ${resp.statusCode()} " +
        resp.body().take(200))
  }

  private def call(
      action: String,
      body: com.fasterxml.jackson.databind.node.ObjectNode)
      : com.fasterxml.jackson.databind.JsonNode = {
    val resp = send(action, body)
    if (resp.statusCode() != 200)
      throw new java.io.IOException(
        s"$action on ${ep.table} failed: HTTP ${resp.statusCode()} " +
          resp.body().take(200))
    mapper.readTree(resp.body())
  }

  /** Send with the same bounded-retry discipline as the nearline
    * transport: 5xx responses, DynamoDB throttles
    * (`ProvisionedThroughputExceededException` / `ThrottlingException` —
    * HTTP 400 but retryable by the service's own contract), and
    * connection-level IOExceptions all back off and retry up to
    * [[DynamoArbiter.MaxAttempts]]. NOTE the semantics this creates for
    * conditional writes: a put whose FIRST attempt landed but whose ack
    * was lost comes back from the retry as ConditionalCheckFailed —
    * `false`, not success. The protocol layer resolves that by reading
    * the key back and recognizing its own record
    * ([[graft.ops.StandingState]]'s lost-ack resolution); this layer
    * deliberately does NOT guess. */
  private def send(
      action: String,
      body: com.fasterxml.jackson.databind.node.ObjectNode)
      : HttpResponse[String] = {
    var attempt = 0
    var last: Either[Throwable, HttpResponse[String]] = null
    while (attempt < DynamoArbiter.MaxAttempts) {
      attempt += 1
      last =
        try {
          val resp = sendOnce(action, body)
          if (resp.statusCode() >= 500 ||
              (resp.statusCode() == 400 &&
                (resp.body().contains("ProvisionedThroughputExceeded") ||
                  resp.body().contains("ThrottlingException"))))
            Right(resp) // retryable; fall through to backoff
          else return resp
        } catch { case e: java.io.IOException => Left(e) }
      if (attempt < DynamoArbiter.MaxAttempts)
        Thread.sleep(25L * attempt) // linear backoff, bounded total
    }
    last match {
      case Right(r) => r
      case Left(e) => throw new java.io.IOException(
        s"$action on ${ep.table} failed after " +
          s"${DynamoArbiter.MaxAttempts} attempts", e)
    }
  }

  private def sendOnce(
      action: String,
      body: com.fasterxml.jackson.databind.node.ObjectNode)
      : HttpResponse[String] = {
    val payload = mapper.writeValueAsString(body)
    val target = s"DynamoDB_20120810.$action"
    val amzDate = java.time.Instant.now().atOffset(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
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
    client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
  }

  private def prop(sys: String, env: String, dflt: String): String =
    Option(System.getProperty(sys)).orElse(Option(System.getenv(env))).getOrElse(dflt)
}

object DynamoArbiter {
  /** Bounded attempts per conditional write — same discipline as the
    * nearline read transport. */
  val MaxAttempts = 5
}
