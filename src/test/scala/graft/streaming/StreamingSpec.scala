package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StreamingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.windowedCounts(df, watermark = "10 minutes", window = "5 minutes")
      .writeStream.queryName("win_counts").outputMode(OutputMode.Complete())
      .format("memory").start()
    try {
      input.addData(
        (1L, ts(1), "click", 1.0), (2L, ts(2), "click", 2.0), (3L, ts(7), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n FROM win_counts ORDER BY win_start, event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      rows shouldBe Seq(("click", 2L), ("view", 1L))
    } finally q.stop()
  }

  test("windowed counts work identically on a batch frame (unification)") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val batch = spark.createDataFrame(Seq(
      Row(1L, ts(1), "click", 1.0), Row(2L, ts(2), "click", 2.0)).asJava, schema)
    val out = EventStreams.windowedCounts(batch).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("n") shouldBe 2L
  }

  test("stream-static LM gate scores a doc stream bit-identically to the batch op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // offline: train the model on a batch corpus
    val corpus = Seq(
      (1L, "a b c a b"), (2L, "a b a c"), (3L, "c c b a b c"))
      .toDF("doc_id", "text")
    val (bi, pre, v) = graft.ops.TextAnalysis.lmModel(corpus)
    val expected = graft.ops.TextAnalysis.lmScore(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // online: the same docs arrive as a stream, scored against the model
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.lmScoreStream(
        input.toDF().toDF("doc_id", "text"), bi, pre, v)
      .writeStream.queryName("lm_gate").outputMode(OutputMode.Update())
      .format("memory").start()
    try {
      input.addData((1L, "a b c a b"), (2L, "a b a c"))
      q.processAllAvailable()
      input.addData((3L, "c c b a b c")) // later micro-batch, same model
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, n_bigrams, nll FROM lm_gate")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      got shouldBe expected
    } finally q.stop()
    graft.ops.Materialize.dropAll()
  }

  test("novelty gate admits only corpus-new, stream-first documents") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq((10L, "already indexed")).toDF("doc_id", "text")
      .select(md5(col("text")).as("fp"))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = EventStreams.noveltyGateStream(
        input.toDF().toDF("doc_id", "ts", "text"), corpus)
      .writeStream.queryName("novelty_gate").outputMode(OutputMode.Append())
      .format("memory").start()
    try {
      input.addData(
        (1L, ts(1), "already indexed"),  // known to the corpus — dropped
        (2L, ts(2), "fresh document"))   // novel — admitted
      q.processAllAvailable()
      input.addData(
        (3L, ts(3), "fresh document"),   // re-delivery within watermark — dropped
        (4L, ts(4), "another new one"))  // novel — admitted
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM novelty_gate")
        .collect().map(_.getLong(0)).toSet
      got shouldBe Set(2L, 4L)
    } finally q.stop()
  }

  test("simhash gate drops near-dups of the corpus, not just exact copies") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val knownText = "already indexed content for the corpus"
    val editedText = "slightly different content for testing near dup admission"
    // hand-plant a corpus fingerprint ONE BIT away from editedText's, so
    // the near-dup path (0 < distance <= 2) is exercised deterministically
    // (text edits shift an uncontrollable number of majority votes)
    def fpOf(text: String): String =
      graft.ops.Dedup.simhash64(Seq((1L, text)).toDF("doc_id", "text"), "text")
        .select("simhash").head.getString(0)
    val editedFp = fpOf(editedText)
    val oneOff = editedFp.updated(7, if (editedFp(7) == '1') '0' else '1')
    val corpus = Seq(fpOf(knownText), oneOff).toDF("simhash")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = EventStreams.simhashGateStream(
        input.toDF().toDF("doc_id", "ts", "text"), corpus)
      .writeStream.queryName("simhash_gate").outputMode(OutputMode.Append())
      .format("memory").start()
    try {
      input.addData(
        (1L, ts(1), knownText), // exact copy of corpus content — dropped (d=0)
        (2L, ts(2), editedText), // one bit from a corpus fingerprint — dropped (d=1)
        (3L, ts(3), "entirely new material nothing shared at all")) // admitted
      q.processAllAvailable()
      input.addData(
        (4L, ts(4), "entirely new material nothing shared at all"), // re-delivery — dropped
        (5L, ts(5), "and one more genuinely fresh document here")) // admitted
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM simhash_gate")
        .collect().map(_.getLong(0)).toSet
      got shouldBe Set(3L, 5L)
    } finally q.stop()
  }

  test("phash gate drops re-ingested near-identical assets at ingest") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // known corpus asset, plus a planted fingerprint ONE BIT from the
    // edited copy's (the simhash-gate spec's determinism trick: payload
    // edits move an uncontrollable number of block votes) — so both the
    // exact (d=0) and near (d=1) drop paths are exercised exactly
    val known = "the quick brown fox jumps over the lazy dog " * 4
    val editedCopy = "zzzz" + known.drop(4)
    val fresh = "completely different material about database engines " * 3
    def fpOf(text: String): String =
      graft.ops.Multimodal.perceptualHash(
        graft.ops.Multimodal.assetsFromText(
          Seq((1L, text)).toDF("id", "txt"), "id", "txt")).head.getString(1)
    val editedFp = fpOf(editedCopy)
    val oneOff = editedFp.updated(9, if (editedFp(9) == '1') '0' else '1')
    val corpus = Seq(fpOf(known), oneOff).toDF("simhash")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val assets = input.toDF().toDF("asset_id", "ts", "txt")
      .withColumn("content", encode(col("txt"), "UTF-8"))
    val q = EventStreams.phashGateStream(assets, corpus)
      .writeStream.queryName("phash_gate").outputMode(OutputMode.Append())
      .format("memory").start()
    try {
      input.addData(
        (1L, ts(1), known),      // exact known payload — dropped (d=0)
        (2L, ts(2), editedCopy), // near-identical re-ingest — dropped (d<=2)
        (3L, ts(3), fresh))      // admitted
      q.processAllAvailable()
      input.addData((4L, ts(4), fresh)) // within-stream re-delivery — dropped
      q.processAllAvailable()
      val got = spark.sql("SELECT asset_id FROM phash_gate")
        .collect().map(_.getLong(0)).toSet
      got shouldBe Set(3L)
    } finally q.stop()
  }

  test("semantic gate drops eval-cosine leaks at ingest, incl. scaled paraphrase copies") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // held-out eval suite: two orthogonal axes
    val evalVecs = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
      .toDF("v")
    val input = MemoryStream[(Long, java.sql.Timestamp, Seq[Double])]
    val q = EventStreams.semanticGateStream(
      input.toDF().toDF("id", "ts", "v"), evalVecs)
      .writeStream.queryName("semantic_gate").outputMode(OutputMode.Append())
      .format("memory").start()
    try {
      input.addData(
        (1L, ts(1), Seq(1.0, 0.0, 0.0, 0.0)),  // exact eval copy — dropped
        (2L, ts(2), Seq(0.0, 2.0, 0.0, 0.0)),  // x2-scaled eval copy: cosine
                                               // exactly 1.0 — the semantic
                                               // catch every gram/hash gate
                                               // misses — dropped
        (3L, ts(3), Seq(0.0, 0.0, 1.0, 0.0)),  // orthogonal fresh — admitted
        (4L, ts(4), Seq(1.0, 1.0, 0.0, 0.0)))  // 45 deg off an eval axis:
                                               // cosine .707 < .9 — admitted
      q.processAllAvailable()
      input.addData(
        (3L, ts(3), Seq(0.0, 0.0, 1.0, 0.0)), // true re-delivery (same id,
                                              // same vector) — dropped
        (5L, ts(5), Seq(0.0, 0.0, 1.0, 0.0))) // DISTINCT event that happens
                                              // to share an embedding —
                                              // admitted (dedup keys on
                                              // id + vector digest, not
                                              // the vector alone)
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM semantic_gate")
        .collect().map(_.getLong(0)).toSeq.sorted
      got shouldBe Seq(3L, 4L, 5L) // 3 exactly once: the replay was deduped
    } finally q.stop()
  }

  test("sessionization accumulates per-user state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.queryName("sessions").outputMode(OutputMode.Update())
      .format("memory").start()
    try {
      input.addData(
        EventStreams.Event(1, ts(1), 7L, "click", 1.0),
        EventStreams.Event(2, ts(2), 7L, "click", 2.5))
      q.processAllAvailable()
      input.addData(EventStreams.Event(3, ts(3), 7L, "view", 1.5))
      q.processAllAvailable()
      val last = spark.sql("SELECT * FROM sessions WHERE user_id = 7 ORDER BY events DESC")
        .collect().head
      last.getAs[Long]("events") shouldBe 3L
      last.getAs[Double]("totalValue") shouldBe 5.0
      last.getAs[Long]("endMs") should be > last.getAs[Long]("startMs")
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered event ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.dedupStream(df)
      .writeStream.queryName("dedup_stream").outputMode(OutputMode.Append())
      .format("memory").start()
    try {
      input.addData((1L, ts(1), "click", 1.0), (2L, ts(2), "view", 2.0))
      q.processAllAvailable()
      // re-delivery of id 1 in a later micro-batch (at-least-once upstream)
      input.addData((1L, ts(1), "click", 1.0), (3L, ts(3), "click", 3.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_stream ORDER BY event_id")
        .collect().map(_.getLong(0)).toSeq
      ids shouldBe Seq(1L, 2L, 3L)
    } finally q.stop()
  }

  test("chunking composes with streaming: per-batch chunks, dedup by chunk hash") {
    // the training-ingest shape: document stream → context-window chunks →
    // content-hash dedup within the watermark → sink. chunk() is a pure
    // generator projection, so it drops into a streaming plan unchanged.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val chunked = graft.ops.TextAnalysis.chunk(docs, "text", size = 10, stride = 8)
      .select(col("doc_id"), col("ts"), col("chunk_idx"), md5(col("chunk")).as("chunk_md5"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("chunk_md5")
    val q = chunked.writeStream.queryName("chunk_stream")
      .outputMode(OutputMode.Append()).format("memory").start()
    try {
      input.addData((1L, ts(1), "abcdefghijklmnop"), (2L, ts(2), "abcdefghijklmnop"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, chunk_idx FROM chunk_stream ORDER BY doc_id, chunk_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // 16 chars, size 10 stride 8 → starts 0,8 → 2 chunks; doc 2's chunks
      // are byte-identical to doc 1's and dedup away entirely
      rows.map(_._1).distinct.toSeq shouldBe Seq(1L)
      rows.map(_._2).toSeq shouldBe Seq(0L, 1L)
    } finally q.stop()
  }

  test("stream-stream attribution join: in-window same-user clicks only, state bounded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = EventStreams.attributionJoinStream(
      imps.toDF().toDF("imp_id", "ts", "user_id"),
      clicks.toDF().toDF("click_id", "cts", "cuser_id"),
      withinSeconds = 600)
    val q = out.writeStream.queryName("attrib").outputMode(OutputMode.Append())
      .format("memory").start()
    try {
      imps.addData((100L, ts(1), 7L), (101L, ts(1), 8L))
      clicks.addData(
        (200L, ts(5), 7L),  // same user, +4 min → attributed
        (201L, ts(20), 7L), // same user, +19 min → outside the window
        (202L, ts(5), 9L))  // wrong user
      q.processAllAvailable()
      val rows = spark.sql("SELECT imp_id, click_id, delay_sec FROM attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      rows shouldBe Seq((100L, 200L, 240.0))
      // the bounded-range predicate is what makes append-mode state
      // evictable — the join must carry watermarks on BOTH sides
      out.isStreaming shouldBe true
    } finally q.stop()
  }

  test("streaming nearline ingest lands items the DSv2 connector reads back") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = SparkFixture.tempDir("nlingest")
    val tableDir = s"$base/t_0_99999999999999"
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.nearlineIngest(df, "org1", "m1", tableDir, s"$base/cp")
    try {
      input.addData((1L, ts(1), "click", 1.5), (2L, ts(2), "view", 2.5))
      q.processAllAvailable()
    } finally q.stop()
    // the written table round-trips through the connector + row expansion
    val raw = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", tableDir).load()
      .filter(col("partition") === "org1m1")
    val rows = graft.sources.NearlineStub.expandRows(raw)
      .select(col("timestamp").cast("long"), col("event_type"), col("value").cast("double"))
      .orderBy("timestamp").collect()
    rows.map(_.getString(1)).toSeq shouldBe Seq("click", "view")
    rows.map(_.getDouble(2)).toSeq shouldBe Seq(1.5, 2.5)
  }

  test("the top-k sketch aggregates across micro-batches (streaming state)") {
    // TypedImperativeAggregate state must survive the streaming state
    // store's serialize/merge cycle: counts accumulated in batch 1 must
    // still be there after batch 2's merge.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.functions.GraftExtensions.register(spark)
    val input = MemoryStream[String]
    val agg = input.toDF().toDF("tok")
      .groupBy().agg(expr("graft_topk(tok, 2, 16)").as("top"))
    val q = agg.writeStream.queryName("topk_stream")
      .outputMode(OutputMode.Complete()).format("memory").start()
    try {
      input.addData("a", "a", "b")
      q.processAllAvailable()
      input.addData("a", "b", "b", "b")
      q.processAllAvailable()
      val top = spark.sql("SELECT explode(top) AS e FROM topk_stream")
        .select("e.item", "e.cnt").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      top shouldBe Map("b" -> 4L, "a" -> 3L) // merged across both batches
    } finally q.stop()
  }

  test("streaming hll registers merge across micro-batches to the batch estimate") {
    // The HLL encoding's register merge is a plain max — so the SAME
    // DataFrame code runs as a streaming aggregation, and after any
    // micro-batch split the registers (and hence the estimate) must be
    // bit-identical to the batch run over the union of the data.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (0 until 600).map(i => ("g", (i % 200).toLong))
    val input = MemoryStream[(String, Long)]
    val streamedRegs = graft.ops.Hll.registers(
      input.toDF().toDF("grp", "v"), "grp", "v")
    val q = streamedRegs.writeStream.queryName("hll_regs")
      .outputMode(OutputMode.Complete()).format("memory").start()
    try {
      input.addData(rows.take(250): _*)
      q.processAllAvailable()
      input.addData(rows.drop(250): _*)
      q.processAllAvailable()
      val got = graft.ops.Hll.estimateFromRegisters(
        spark.table("hll_regs"), "grp").collect().head
      val batch = graft.ops.Hll.approxDistinct(
        rows.toDF("grp", "v"), "grp", "v").collect().head
      batch.getAs[Long]("n_exact") shouldBe 200L
      got.getAs[Double]("n_approx") shouldBe batch.getAs[Double]("n_approx")
    } finally q.stop()
  }

  test("streaming quantile sketch buckets merge across micro-batches to the batch sketch") {
    // Like the HLL registers: the log-histogram's merge is a plain count
    // sum, so the identical logHist code runs as a streaming aggregation
    // and any micro-batch split must yield the batch sketch bit-for-bit
    // — and therefore identical quantile estimates.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vals = (1 until 500).map(i => 1L + (i.toLong * 37) % 3000)
    val input = MemoryStream[Long]
    val streamedHist = graft.ops.Quantile.logHist(input.toDF().toDF("v"), col("v"))
    val q = streamedHist.writeStream.queryName("qsketch_stream")
      .outputMode(OutputMode.Complete()).format("memory").start()
    try {
      input.addData(vals.take(200): _*)
      q.processAllAvailable()
      input.addData(vals.drop(200): _*)
      q.processAllAvailable()
      val got = graft.ops.Quantile.quantileEstimates(
        spark.table("qsketch_stream"), Seq(0.5, 0.9)).collect()
        .map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
      val batch = graft.ops.Quantile.quantileEstimates(
        graft.ops.Quantile.logHist(vals.toDF("v"), col("v")), Seq(0.5, 0.9))
        .collect().map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
      got shouldBe batch
    } finally q.stop()
  }

  test("native session_window: gap sessions emit on watermark passage; batch unifies") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = EventStreams.sessionWindowCounts(df, gap = "5 minutes", watermark = "10 minutes")
      .writeStream.queryName("sess_counts").outputMode(OutputMode.Append())
      .format("memory").start()
    try {
      input.addData((1L, ts(1), 1L, 1.0), (2L, ts(2), 1L, 2.0))
      q.processAllAvailable()
      input.addData((3L, ts(50), 1L, 4.0)) // watermark will pass session 1
      q.processAllAvailable()
      input.addData((4L, ts(59), 2L, 0.0)) // batch that sees wm=40 → emits
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n, total_value FROM sess_counts ORDER BY sess_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      rows should contain((1L, 2L, 3.0)) // minutes 1+2 merged into one session
      rows.map(_._1) should not contain 2L // user 2's session still open
    } finally q.stop()
    // batch unification: same function, plain frame, sessions merge directly
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val batch = spark.createDataFrame(Seq(
      Row(1L, ts(1), 1L, 1.0), Row(2L, ts(2), 1L, 2.0),
      Row(3L, ts(50), 1L, 4.0)).asJava, schema)
    val out = EventStreams.sessionWindowCounts(batch).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("sess_start"), r.getAs[Long]("n")))
      .sortBy(_._1.getTime)
    // 30-min default gap: minutes 1-2 merge, minute 50 starts a new session
    out.map(_._2).toSeq shouldBe Seq(2L, 1L)
  }

  test("streaming windowed top-k via foreachBatch reuses the batch primitive") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val q = EventStreams.windowTopKStream(df, k = 2, sink = b => {
      got ++= b.collect().map(r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Long]("rank")))
    })
    try {
      // one 5-min window: click×3, view×2, error×1 → top-2 is click, view
      input.addData(
        (1L, ts(1), "click", 1.0), (2L, ts(1), "click", 1.0), (3L, ts(2), "click", 1.0),
        (4L, ts(2), "view", 1.0), (5L, ts(3), "view", 1.0), (6L, ts(3), "error", 1.0))
      q.processAllAvailable()
      got shouldBe empty // append mode: nothing finalizes until the watermark moves
      input.addData((7L, ts(30), "click", 1.0)) // watermark → 20, past window [0,5)
      q.processAllAvailable()
      input.addData((8L, ts(31), "click", 1.0)) // batch that SEES watermark 20 → emits
      q.processAllAvailable()
      got.sortBy(_._3).toList shouldBe List(("click", 3L, 1L), ("view", 2L, 2L))
    } finally q.stop()
  }

  test("salted join spreads a hot key and matches the plain join result") {
    import scala.jdk.CollectionConverters._
    val factSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    // heavily skewed: 90% of fact rows share k=1
    val factRows = (1L to 200L).map(i => Row(if (i <= 180) 1L else i % 10 + 1, i))
    val fact = spark.createDataFrame(factRows.asJava, factSchema)
    val dimSchema = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType)))
    val dim = spark.createDataFrame(
      (1L to 11L).map(i => Row(i, s"name$i")).asJava, dimSchema)
    val plain = fact.join(dim, "k").agg(count(lit(1)), sum("v")).collect().head
    val salted = graft.ops.Skew.saltedJoin(fact, dim, "k", salts = 8)
      .agg(count(lit(1)), sum("v")).collect().head
    salted.getLong(0) shouldBe plain.getLong(0)
    salted.getLong(1) shouldBe plain.getLong(1)
  }

  test("streaming KMV sketch: bounded per-group state, exact-below-k estimates across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = graft.streaming.EventStreams.kmvDistinctStream(
      input.toDF().toDF("g", "v"), "g", "v", k = 64)
      .toDF("g", "held", "estimate")
    val q = out.writeStream.queryName("kmv_stream")
      .outputMode(OutputMode.Update()).format("memory").start()
    try {
      input.addData(("A", "x1"), ("A", "x2"), ("A", "x2"), ("B", "y1"))
      q.processAllAvailable()
      // duplicates within and ACROSS batches must not inflate the sketch
      input.addData(("A", "x2"), ("A", "x3"), ("B", "y1"))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT g, held, estimate FROM kmv_stream").collect()
        .groupBy(_.getString(0)).map { case (g, rows) =>
          // Update mode appends one row per group per batch — take the
          // final (largest-held) snapshot per group
          g -> rows.map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1)
        }
      last("A") shouldBe ((3L, 3.0)) // x1, x2, x3 — exact below k
      last("B") shouldBe ((1L, 1.0))
    } finally q.stop()
  }

  test("streaming manifest ingest: micro-batches fold to the bit-identical batch state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{Multimodal, StandingState}
    // near-dup families spanning batches: ids ≡ 0 mod 3 share a payload
    val texts = (1L to 15L).map(i =>
      i -> (if (i % 3 == 0)
        s"x$i" + ("shared streaming payload body with stable words " * 3).drop(3)
      else s"unique streamed material number $i with its own words " * 2))
    def assetsOf(ts: Seq[(Long, String)]) =
      Multimodal.assetsFromText(ts.toDF("id", "txt"), "id", "txt")
    val base = texts.filter(_._1 <= 5)
    val b1 = texts.filter(t => t._1 > 5 && t._1 <= 10)
    val b2 = texts.filter(_._1 > 10)
    val store = graft.SparkFixture.tempDir("stream-store")
    StandingState.bootstrap(assetsOf(base), store)
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.manifestIngestStream(
      Multimodal.assetsFromText(input.toDF().toDF("id", "txt"), "id", "txt"),
      store)
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // two micro-batches committed two delta snapshots on the store —
    // and the stream's in-flow retention keeps the footprint BOUNDED:
    // at most 2 live snapshot witnesses, base data shared by reference
    // (never batches × base copies), no orphan partitions left behind
    StandingState.snapshots(spark, store).size should be <= 2
    val dataDir = new java.io.File(s"$store/data")
    def partDirs(t: String) =
      Option(new java.io.File(dataDir, t).listFiles()).toSeq.flatten
        .filter(_.isDirectory)
    // fingerprints: one base partition + one per batch, nothing swept
    // that is still referenced
    partDirs("fingerprints").size shouldBe 3
    def cl(root: String) = StandingState.readClusters(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = cl(store)
    val full = graft.SparkFixture.tempDir("stream-full")
    StandingState.bootstrap(assetsOf(texts), full)
    val oneShot = cl(full)
    // streamed state may carry singleton batch nodes; cluster-bearing
    // rows must be BIT-identical to the one-shot batch bootstrap
    streamed.filter { case (d, c) =>
      d != c || streamed.exists { case (d2, c2) => d2 != d && c2 == c }
    } shouldBe oneShot
    StandingState.readFingerprints(spark, store)
      .count() shouldBe texts.size
    // a REPLAYED batch (same owner token) is skipped idempotently — the
    // foreachBatch exactly-once story, recorded in the state itself
    val snapsBefore = StandingState.snapshots(spark, store)
    StandingState.ingest(assetsOf(b2), store,
      owner = StandingState.ownerOf(spark, store, snapsBefore.last))
    StandingState.snapshots(spark, store) shouldBe snapsBefore
    graft.ops.Materialize.dropAll()
  }

  test("streaming manifest ingest: in-flow compaction bounds partition growth, replay stays idempotent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{Multimodal, StandingState}
    // ids ≡ 0 mod 3 share a payload family so cross-batch edges exist and
    // the post-compaction ≡ bootstrap check is non-vacuous
    val texts = (1L to 12L).map(i =>
      i -> (if (i % 3 == 0)
        s"x$i" + ("shared compaction payload body with stable words " * 3).drop(3)
      else s"streamed compaction material number $i with its own words " * 2))
    def assetsOf(ts: Seq[(Long, String)]) =
      Multimodal.assetsFromText(ts.toDF("id", "txt"), "id", "txt")
    val store = graft.SparkFixture.tempDir("stream-compact")
    StandingState.bootstrap(assetsOf(texts.filter(_._1 <= 4)), store)
    val input = MemoryStream[(Long, String)]
    // cap 2: the second batch's third partition trips the in-flow fold
    val q = EventStreams.manifestIngestStream(
      Multimodal.assetsFromText(input.toDF().toDF("id", "txt"), "id", "txt"),
      store, compactAtPartitions = 2)
    try {
      input.addData(texts.filter(t => t._1 > 4 && t._1 <= 8): _*)
      q.processAllAvailable()
      input.addData(texts.filter(_._1 > 8): _*)
      q.processAllAvailable()
    } finally q.stop()
    // compaction folded the store back to one snapshot / one partition
    // per table — the long-stream tail is bounded, not accreting
    StandingState.snapshots(spark, store).size shouldBe 1
    Option(new java.io.File(s"$store/data/fingerprints").listFiles())
      .toSeq.flatten.count(_.isDirectory) shouldBe 1
    StandingState.readFingerprints(spark, store).count() shouldBe texts.size
    // the compacted snapshot carries the last batch's owner token, so a
    // post-compaction replay of that batch is STILL skipped
    val snaps = StandingState.snapshots(spark, store)
    StandingState.ownerOf(spark, store, snaps.last) should startWith("batch-")
    StandingState.ingest(assetsOf(texts.filter(_._1 > 8)), store,
      owner = StandingState.ownerOf(spark, store, snaps.last))
    StandingState.snapshots(spark, store) shouldBe snaps
    // and the folded state ≡ a one-shot bootstrap over everything
    val full = graft.SparkFixture.tempDir("stream-compact-full")
    StandingState.bootstrap(assetsOf(texts), full)
    def cl(root: String) = StandingState.readClusters(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = cl(store)
    streamed.filter { case (d, c) =>
      d != c || streamed.exists { case (d2, c2) => d2 != d && c2 == c }
    } shouldBe cl(full)
    graft.ops.Materialize.dropAll()
  }

  test("streaming COMPOSED ANN ingest: each batch lands cells+codes in one commit, serve ≡ one-shot fold") {
    import graft.ops.{AnnIndex, StandingState}
    import spark.implicits._
    def vecs(ids: Range) = ids.map(i => (i.toLong, Seq(
      (i % 7).toDouble, (i * 3 % 5).toDouble, (i * 5 % 11).toDouble, 1.0)))
    // 4-dim vectors → m=2 subspaces of subDim=2
    val store = graft.SparkFixture.tempDir("stream-annc")
    AnnIndex.bootstrapComposed(vecs(0 until 60).toDF("vec_id", "embedding"),
      "vec_id", "embedding", numCentroids = 4, store, m = 2, subDim = 2, k = 4)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.annIngestStreamComposed(
      input.toDF().toDF("vec_id", "embedding"), store, m = 2, subDim = 2)
    try {
      input.addData(vecs(60 until 75): _*)
      q.processAllAvailable()
      input.addData(vecs(75 until 90): _*)
      q.processAllAvailable()
    } finally q.stop()
    // cells and codes agree at every snapshot: m code rows per vector
    AnnIndex.readCells(spark, store).count() shouldBe 90L
    StandingState.readTable(spark, store, "pq_codes").count() shouldBe 180L
    // bounded disk, like the IVF stream
    StandingState.snapshots(spark, store).size should be <= 2
    // streamed folds ≡ bootstrap(base) + ONE composed ingest of the union
    val full = graft.SparkFixture.tempDir("stream-annc-full")
    AnnIndex.bootstrapComposed(vecs(0 until 60).toDF("vec_id", "embedding"),
      "vec_id", "embedding", numCentroids = 4, full, m = 2, subDim = 2, k = 4)
    AnnIndex.ingestComposed(vecs(60 until 90).toDF("vec_id", "embedding"),
      "vec_id", "embedding", full, m = 2, subDim = 2)
    def serve(root: String) = AnnIndex.ivfadcTopKComposed(
      vecs(0 until 5).toDF("vec_id", "embedding"), "vec_id", "embedding",
      kNeighbors = 3, root, nprobe = 2, shortlist = 20, m = 2, subDim = 2)
      .collect().map(_.toString).toSet
    serve(store) shouldBe serve(full)
    // a replayed batch (same owner) is skipped idempotently
    val snaps = StandingState.snapshots(spark, store)
    AnnIndex.ingestComposed(vecs(75 until 90).toDF("vec_id", "embedding"),
      "vec_id", "embedding", store, owner = "batch-1", m = 2, subDim = 2)
    StandingState.snapshots(spark, store) shouldBe snaps
  }

  test("streaming ANN ingest: batches fold to the one-shot index, drift surfaced, replay stable") {
    import graft.ops.{AnnIndex, StandingState}
    import spark.implicits._
    def vecs(ids: Range) = ids.map(i => (i.toLong, Seq(
      (i % 7).toDouble, (i * 3 % 5).toDouble, (i * 5 % 11).toDouble, 1.0)))
    val store = graft.SparkFixture.tempDir("stream-ann")
    AnnIndex.bootstrap(vecs(0 until 60).toDF("vec_id", "embedding"),
      "vec_id", "embedding", numCentroids = 4, store)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val drift = scala.collection.concurrent.TrieMap[Long, Boolean]()
    val input = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.annIngestStream(
      input.toDF().toDF("vec_id", "embedding"), store, refineAt = 0.30,
      onDrift = (b, f) => { drift(b) = f; () })
    try {
      input.addData(vecs(60 until 72): _*) // cumulative 12/72 = 0.167
      q.processAllAvailable()
      input.addData(vecs(72 until 90): _*) // cumulative 30/90 = 0.333 — fires
      q.processAllAvailable()
    } finally q.stop()
    // the gate is CUMULATIVE across micro-batches and surfaced per batch
    drift.toMap shouldBe Map(0L -> false, 1L -> true)
    // exactness: streamed folds ≡ bootstrap(base) + ONE ingest of the union
    val full = graft.SparkFixture.tempDir("stream-ann-full")
    AnnIndex.bootstrap(vecs(0 until 60).toDF("vec_id", "embedding"),
      "vec_id", "embedding", numCentroids = 4, full)
    AnnIndex.ingest(vecs(60 until 90).toDF("vec_id", "embedding"),
      "vec_id", "embedding", full)
    def cells(root: String) = AnnIndex.readCells(spark, root)
      .select("corpus_id", "cell") // cells carry the payload column too now
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    cells(store) shouldBe cells(full)
    // bounded disk: at most two live snapshot witnesses, partitions shared
    StandingState.snapshots(spark, store).size should be <= 2
    // a replayed batch (same owner) is skipped AND reports the original
    // verdict — the gate reads committed metadata the skip left unchanged
    val snapsBefore = StandingState.snapshots(spark, store)
    AnnIndex.ingest(vecs(72 until 90).toDF("vec_id", "embedding"),
      "vec_id", "embedding", store, refineAt = 0.30,
      owner = "batch-1") shouldBe true
    StandingState.snapshots(spark, store) shouldBe snapsBefore
  }
}
