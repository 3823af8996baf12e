package graft.ops

import graft.SparkFixture
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.{FileUtil, Path => HPath}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hadoop filesystem that behaves like an OBJECT STORE where it
  * matters to the commit protocol: `rename` is copy-then-delete (two
  * visible steps, refuses an existing destination only by a racy
  * pre-check) and its scheme is unknown to the engine's atomic-rename
  * allowlist. Everything else delegates to local disk
  * (RawLocalFileSystem — create-exclusive there is check-then-create
  * already, which is the object-store shape too). Top-level class with
  * a no-arg constructor so Hadoop's `fs.naf.impl` reflection loads it. */
class NonAtomicRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.FileStatus

  override def getUri: java.net.URI = java.net.URI.create("naf:///")
  override def getScheme: String = "naf"
  override def rename(src: HPath, dst: HPath): Boolean = {
    if (exists(dst)) return false
    NonAtomicRenameFs.renames.incrementAndGet()
    FileUtil.copy(this, src, this, dst, true /* deleteSource */, getConf)
  }
  // plain FileStatus (no lazy permission load): RawLocalFileSystem's
  // deprecated status class does `new File(uri)` on getPermission,
  // which rejects any scheme but file:
  override def getFileStatus(f: HPath): FileStatus = {
    val file = pathToFile(f)
    if (!file.exists()) throw new java.io.FileNotFoundException(f.toString)
    new FileStatus(file.length(), file.isDirectory, 1,
      getDefaultBlockSize(f), file.lastModified(), makeQualified(f))
  }
  override def listStatus(f: HPath): Array[FileStatus] = {
    val file = pathToFile(f)
    if (!file.exists()) throw new java.io.FileNotFoundException(f.toString)
    if (file.isFile) Array(getFileStatus(f))
    else file.listFiles().map(c => getFileStatus(new HPath(f, c.getName)))
  }
}
object NonAtomicRenameFs {
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Round-16 pins for object-store-safe standing-state commits: loud
  * refusal at open on a non-atomic filesystem, the operator override,
  * arbiter-mediated commits (in-memory and over the public DynamoDB
  * conditional-put wire), the stale-claim recovery path, and a real
  * writer race through the arbiter on the copy+delete filesystem. */
class ObjectStoreCommitSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration
      .set("fs.naf.impl", classOf[NonAtomicRenameFs].getName)
  }

  private def nafStore(prefix: String): String =
    "naf://" + SparkFixture.tempDir(prefix)

  private def spec(name: String, rows: Seq[(String, Long)]) =
    StandingState.TableSpec(name, rows.toDF("k", "v"), "k")

  test("a non-atomic filesystem is refused at open, naming the arbiter and the override") {
    val store = nafStore("osc-refuse")
    val e = intercept[StandingState.StaleStateException] {
      StandingState.writeTables(store, Seq(spec("t", Seq(("a", 1L)))))
    }
    e.getMessage should include ("naf")
    e.getMessage should include ("commit arbiter")
    e.getMessage should include ("spark.graft.state.arbiter")
    e.getMessage should include ("assumeAtomicRename")
    // nothing half-committed: the refusal fired before any write
    new java.io.File(new HPath(store).toUri.getPath).list().length shouldBe 0
  }

  test("assumeAtomicRename is the operator override; commits then ride the FS protocol") {
    val store = nafStore("osc-override")
    spark.conf.set("spark.graft.state.assumeAtomicRename", "true")
    try {
      StandingState.writeTables(store, Seq(spec("t", Seq(("a", 1L)))))
      StandingState.appendTables(store, Seq(spec("t", Seq(("b", 2L)))))
      StandingState.readTable(spark, store, "t").count() shouldBe 2L
    } finally spark.conf.unset("spark.graft.state.assumeAtomicRename")
  }

  test("arbiter-mediated store: full commit cycle on the copy+delete filesystem") {
    val store = nafStore("osc-arb")
    val arb = InMemoryArbiter.named("osc-arb")
    CommitArbiter.register(store, arb)
    try {
      NonAtomicRenameFs.renames.set(0)
      StandingState.writeTables(store, Seq(spec("t", Seq(("a", 1L)))))
      StandingState.appendTables(store, Seq(spec("t", Seq(("b", 2L)))))
      StandingState.readTable(spark, store, "t")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq shouldBe
        Seq(("a", 1L), ("b", 2L))
      // the publishes really went through copy+delete renames
      NonAtomicRenameFs.renames.get() should be >= 2
      // claims are in-flight markers: released after each publish;
      // the lease is released too — a new writer proceeds freely. Keys
      // carry the AUTHORITY-QUALIFIED store identity (scheme included).
      val qualStore = CommitArbiter.storeKey(store)
      qualStore should startWith ("naf://")
      arb.get(s"lease:$qualStore") shouldBe None
      arb.get(s"snap:$qualStore:snap00000") shouldBe None
      arb.get(s"snap:$qualStore:snap00001") shouldBe None
    } finally CommitArbiter.unregister(store)
  }

  test("a crashed commit's stale claim refuses the snapshot; breakLease clears it") {
    val store = nafStore("osc-claim")
    val arb = InMemoryArbiter.named("osc-claim")
    CommitArbiter.register(store, arb)
    try {
      StandingState.writeTables(store, Seq(spec("t", Seq(("a", 1L)))))
      val qualStore = CommitArbiter.storeKey(store)
      // simulate a writer that claimed snapshot 1 and died mid-publish
      arb.putIfAbsent(s"snap:$qualStore:snap00001", "dead-writer\nff") shouldBe true
      val e = intercept[StandingState.StaleStateException] {
        StandingState.appendTables(store, Seq(spec("t", Seq(("b", 2L)))))
      }
      e.getMessage should include ("already claimed")
      e.getMessage should include ("breakLease")
      StandingState.breakLease(spark, store)
      StandingState.appendTables(store, Seq(spec("t", Seq(("b", 2L)))))
      StandingState.readTable(spark, store, "t").count() shouldBe 2L
    } finally CommitArbiter.unregister(store)
  }

  test("racing writers through the arbiter land exactly once on the non-atomic filesystem") {
    // the r15 race, rerun where it actually matters: a filesystem whose
    // rename CANNOT arbitrate. The arbiter's atomic lease serializes the
    // commits; refusals surface as StaleStateException and retry.
    val store = nafStore("osc-race")
    CommitArbiter.register(store, InMemoryArbiter.named("osc-race"))
    try {
      StandingState.writeTables(store, Seq(spec("t", Seq(("base", -1L)))))
      val writers = 4
      val barrier = new java.util.concurrent.CyclicBarrier(writers)
      val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
      val failures = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val threads = (0 until writers).map { i =>
        new Thread(() => {
          try {
            val delta = Seq((f"k$i%02d", i.toLong)).toDF("k", "v")
            barrier.await()
            var done = false
            var attempts = 0
            while (!done && attempts < 300) {
              attempts += 1
              try {
                StandingState.appendTables(store, Seq(
                  StandingState.TableSpec("t", delta, "k")), owner = s"racer-$i")
                done = true
              } catch {
                case _: StandingState.StaleStateException =>
                  refusals.incrementAndGet(); Thread.sleep(15)
              }
            }
            if (!done) failures.add(s"racer-$i: retries exhausted")
          } catch { case e: Throwable => failures.add(s"racer-$i: $e") }
        }, s"osc-racer-$i")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(180000))
      withClue(s"racer failures: $failures: ") { failures.isEmpty shouldBe true }
      info(s"refusals retried: ${refusals.get()}")
      val got = StandingState.readTable(spark, store, "t")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      got shouldBe (("base", -1L) +: (0 until writers).map(i => (f"k$i%02d", i.toLong)))
      StandingState.snapshots(spark, store).size shouldBe (writers + 1)
    } finally CommitArbiter.unregister(store)
  }

  // ------------------------------------ the conditional-put wire arbiter

  test("DynamoArbiter speaks conditional put/delete on the public wire; one racer wins") {
    val stub = new ArbiterWireStub("claims")
    try {
      val arb = CommitArbiter.resolve(s"dynamo://localhost:${stub.port}/claims")
      arb.putIfAbsent("k1", "alpha") shouldBe true
      arb.putIfAbsent("k1", "beta") shouldBe false // condition refused, not an error
      arb.get("k1") shouldBe Some("alpha")
      arb.deleteIf("k1", "wrong") shouldBe false
      arb.get("k1") shouldBe Some("alpha")
      arb.deleteIf("k1", "alpha") shouldBe true
      arb.get("k1") shouldBe None
      arb.delete("k1") // idempotent on absent keys
      // the race: N threads, exactly one conditional put wins
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val barrier = new java.util.concurrent.CyclicBarrier(8)
      val ts = (0 until 8).map { i =>
        new Thread(() => {
          barrier.await()
          if (arb.putIfAbsent("raced", s"writer-$i")) winners.incrementAndGet()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(30000))
      winners.get() shouldBe 1
      // the stub saw SigV4-shaped auth on every call
      stub.sawAuth.get() shouldBe true
    } finally stub.stop()
  }

  test("standing-state commits arbitrated over the DynamoDB wire, end to end") {
    val stub = new ArbiterWireStub("claims")
    val store = nafStore("osc-dyn")
    CommitArbiter.register(store,
      CommitArbiter.resolve(s"dynamo://localhost:${stub.port}/claims"))
    try {
      StandingState.writeTables(store, Seq(spec("t", Seq(("a", 1L)))))
      StandingState.appendTables(store, Seq(spec("t", Seq(("b", 2L)))))
      StandingState.readTable(spark, store, "t").count() shouldBe 2L
      // every lease/claim round-tripped the wire: 2 commits × (lease put
      // + claim put + claim delete + lease delete) = 8 writes minimum
      stub.writes.get() should be >= 8
    } finally {
      CommitArbiter.unregister(store)
      stub.stop()
    }
  }
}

/** Minimal DynamoDB-wire stub for the CONDITIONAL-PUT subset the
  * arbiter uses: PutItem with `attribute_not_exists(pk)`, GetItem,
  * DeleteItem with an optional `body = :b` condition. Conditions
  * evaluate atomically under one lock — the semantics the real service
  * guarantees and the whole arbiter design rests on. Same wire shape as
  * [[graft.sources.HttpDynamoTransportSpec]]'s read stub. */
class ArbiterWireStub(table: String) {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val kv = new java.util.HashMap[String, String]()
  val writes = new java.util.concurrent.atomic.AtomicInteger(0)
  val sawAuth = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** Fault injection: the next N write calls are REFUSED WITHOUT
    * APPLYING with the service's throttle error (the retryable-400
    * shape). */
  val throttleWrites = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Fault injection: the next N write calls APPLY but answer 500 — the
    * lost-ack shape whose transport retry then observes its own landed
    * conditional as a failure. */
  val loseAckWrites = new java.util.concurrent.atomic.AtomicInteger(0)

  private def takeBudget(c: java.util.concurrent.atomic.AtomicInteger): Boolean = {
    var n = c.get()
    while (n > 0) {
      if (c.compareAndSet(n, n - 1)) return true
      n = c.get()
    }
    false
  }

  private val throttled =
    """{"__type":"com.amazonaws.dynamodb.v20120810#ProvisionedThroughputExceededException","message":"throttled"}"""

  private val server = {
    val s = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    s.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val (status, resp) =
        try handle(ex)
        catch { case e: Exception =>
          (400, s"""{"__type":"StubError","message":"${e.getMessage}"}""") }
      val bytes = resp.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.0")
      ex.sendResponseHeaders(status, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    })
    // several request threads so racing putIfAbsent calls really overlap
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    s.start()
    s
  }
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)

  private val conditionFailed =
    """{"__type":"com.amazonaws.dynamodb.v20120810#ConditionalCheckFailedException","message":"The conditional request failed"}"""

  private def handle(ex: com.sun.net.httpserver.HttpExchange): (Int, String) = {
    val action = Option(ex.getRequestHeaders.getFirst("X-Amz-Target"))
      .map(_.stripPrefix("DynamoDB_20120810.")).getOrElse("?")
    if (Option(ex.getRequestHeaders.getFirst("Authorization"))
        .exists(_.startsWith("AWS4-HMAC-SHA256"))) sawAuth.set(true)
    val body = mapper.readTree(
      new String(ex.getRequestBody.readAllBytes(), UTF_8))
    require(body.get("TableName").asText() == table, "unknown table")
    action match {
      case "PutItem" =>
        writes.incrementAndGet()
        val pk = body.at("/Item/pk/S").asText()
        val v = body.at("/Item/body/S").asText()
        val conditional =
          Option(body.get("ConditionExpression")).map(_.asText())
        if (takeBudget(throttleWrites)) (400, throttled)
        else kv.synchronized {
          if (conditional.contains("attribute_not_exists(pk)") &&
              kv.containsKey(pk)) (400, conditionFailed)
          else {
            kv.put(pk, v)
            if (takeBudget(loseAckWrites))
              (500, """{"__type":"InternalServerError","message":"ack lost"}""")
            else (200, "{}")
          }
        }
      case "GetItem" =>
        val pk = body.at("/Key/pk/S").asText()
        kv.synchronized {
          Option(kv.get(pk)) match {
            case Some(v) =>
              (200, mapper.writeValueAsString {
                val n = mapper.createObjectNode()
                val item = n.putObject("Item")
                item.putObject("pk").put("S", pk)
                item.putObject("body").put("S", v)
                n
              })
            case None => (200, "{}")
          }
        }
      case "DeleteItem" =>
        writes.incrementAndGet()
        val pk = body.at("/Key/pk/S").asText()
        val conditional =
          Option(body.get("ConditionExpression")).map(_.asText())
        if (takeBudget(throttleWrites)) (400, throttled)
        else kv.synchronized {
          if (conditional.contains("body = :b")) {
            val want = body.at("/ExpressionAttributeValues/:b/S").asText()
            if (Option(kv.get(pk)).contains(want)) {
              kv.remove(pk)
              if (takeBudget(loseAckWrites))
                (500, """{"__type":"InternalServerError","message":"ack lost"}""")
              else (200, "{}")
            } else (400, conditionFailed)
          } else { kv.remove(pk); (200, "{}") }
        }
      case other => (400, s"""{"__type":"UnknownOperationException","op":"$other"}""")
    }
  }
}
