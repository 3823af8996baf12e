package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the events stream.
  *
  * The reference is batch-only — recency is handled architecturally via
  * nearline tables (SURVEY.md §2.9). This module is the forward-looking
  * streaming path a Spark-native deployment gets for free: the same
  * event rows consumed as a stream (`readStream` on the landing
  * directory), with watermarked event-time aggregation and stateful
  * sessionization. At scale: state is partitioned by key in the state
  * store, watermarks bound it, and the output is a normal DataFrame sink.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionSummary(user_id: Long, events: Long, totalValue: Double,
      startMs: Long, endMs: Long)

  /** Watermarked tumbling-window aggregation: events per (window, type)
    * with late data bounded by the watermark. Works identically on a
    * batch DataFrame (windows become plain groupBy) — the classic
    * batch/stream unification test. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      window: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Per-user sessionization with a gap timeout, via
    * mapGroupsWithState — the custom-state path (KeyValueGroupedDataset)
    * for semantics windows can't express. Emits a summary when a
    * session's gap expires. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double, Long, Long), SessionSummary](
        GroupStateTimeout.EventTimeTimeout) {
        case (userId, batch, state: GroupState[(Long, Double, Long, Long)]) =>
          val evs = batch.toSeq
          val (n0, v0, s0, e0) = state.getOption.getOrElse((0L, 0.0, Long.MaxValue, 0L))
          val n = n0 + evs.size
          val v = v0 + evs.map(_.value).sum
          val s = math.min(s0, evs.map(_.ts.getTime).minOption.getOrElse(s0))
          val e = math.max(e0, evs.map(_.ts.getTime).maxOption.getOrElse(e0))
          state.update((n, v, s, e))
          if (state.getCurrentWatermarkMs() > 0)
            state.setTimeoutTimestamp(e + gapMs)
          SessionSummary(userId, n, math.rint(v * 100) / 100, s, e)
      }
  }

  /** Streaming KMV distinct sketch: per group, hold the k smallest
    * md5-derived hash fractions of the values seen so far (bounded
    * state: exactly k doubles per group, however many rows stream
    * through) and emit the group's running distinct estimate per
    * micro-batch — the streaming face of [[graft.ops.Kmv]]: the state
    * IS the batch sketch, so a snapshot folds into batch sketches via
    * `Kmv.merge` with no translation. Estimate rule identical to
    * `Kmv.estimate`: exact below k, (k−1)/u_k at capacity.
    *
    * mapGroupsWithState with NoTimeout: the sketch is monotone (min-k
    * under union) so there is nothing to expire; state size is the
    * k-array regardless of stream length. */
  def kmvDistinctStream(
      values: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 64): Dataset[(String, Long, Double)] = {
    import values.sparkSession.implicits._
    values
      .select(col(groupCol).cast("string").as("g"),
        graft.ops.Kmv.hashFraction(col(valueCol)).as("u"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Double], (String, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (g, batch, state: GroupState[Array[Double]]) =>
          val prev = state.getOption.getOrElse(Array.empty[Double])
          val merged = (prev ++ batch.map(_._2)).distinct.sorted.take(k)
          state.update(merged)
          val est =
            if (merged.length < k) merged.length.toDouble
            else (k - 1.0) / merged.last
          // HALF_UP via BigDecimal.valueOf (shortest-string decimal), the
          // exact rule Spark's round() applies in Kmv.estimate — math.rint
          // is half-EVEN and forks on exact .00005 halves
          val rounded = java.math.BigDecimal.valueOf(est)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          (g, merged.length.toLong, rounded)
      }
  }

  /** Declarative gap-sessionization via the NATIVE `session_window`
    * function — the complement of [[sessionize]]'s hand-rolled
    * mapGroupsWithState: when the per-session result is expressible as
    * aggregates, the built-in operator is preferable (Catalyst's
    * merging-session state format, watermark-driven eviction, and no
    * user state class to version). Works identically on a batch frame
    * (sessions become plain merged groups) — same unification contract
    * as [[windowedCounts]]. */
  def sessionWindowCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n"), col("total_value"))

  /** Streaming per-window top-k event types: the watermarked windowed
    * counts stream in APPEND mode — each window emits exactly once,
    * finalized, when the watermark passes its end — with the top-k cut
    * applied to those finalized windows per micro-batch through
    * `foreachBatch`, reusing the BATCH two-phase
    * [[graft.ops.Retrieval.topKPerKey]] primitive verbatim (rank
    * windows aren't allowed downstream of a streaming aggregation, and
    * foreachBatch is the documented composition point for exactly
    * this). Append, not Complete: complete mode disables watermark
    * eviction, so state and per-trigger work would grow with every
    * window ever seen — append keeps state watermark-bounded and each
    * batch carries only windows that just finalized. `sink` receives
    * (win_start, event_type, n, rank ≤ k) per finalized window. */
  def windowTopKStream(
      events: DataFrame,
      k: Int,
      sink: DataFrame => Unit,
      watermark: String = "10 minutes",
      window: String = "5 minutes"): org.apache.spark.sql.streaming.StreamingQuery =
    windowedCounts(events, watermark, window)
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.ops.Retrieval.topKPerKey(
          batch.select("win_start", "event_type", "n"),
          keys = Seq("win_start"),
          order = Seq(col("n").desc, col("event_type")), k = k))
      }
      .start()

  /** Streaming exact-dedup: drop re-delivered events by id, with state
    * bounded by the watermark (the streaming analog of the batch
    * `Dedup.exactGroups` — at-least-once upstream delivery becomes
    * exactly-once rows downstream). State is one entry per key inside
    * the watermark horizon, partitioned across the state store. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** The nearline WRITE side: transform an event stream into the store's
    * multi-write item format (FIXTURES.md §3 — partition/sort/ids/value
    * maps) and append it as parquet into a time-window table directory.
    * This is how "recent writes" land in the nearline tables the DSv2
    * connector ([[graft.sources.dsv2.NearlineTableProvider]]) serves —
    * the ingestion path the reference delegates to an external writer.
    * Exactly-once via the checkpoint + file-sink manifest. */
  def nearlineIngest(
      events: DataFrame,
      orgId: String,
      metricId: String,
      tableDir: String,
      checkpointDir: String,
      mapper: graft.sources.KeyMapper = graft.sources.KeyMapper.Concat)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .select(
        lit(mapper.partitionKey(orgId, metricId)).as("partition"),
        unix_millis(col("ts")).cast("string").as("sort"),
        array(concat(lit("w"), col("event_id"))).as("ids"),
        map(concat(lit("w"), col("event_id")), col("event_type")).as("event_type"),
        map(concat(lit("w"), col("event_id")), col("value").cast("string")).as("value"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Stream-static quality gate: score an incoming DOCUMENT stream
    * against a batch-trained bigram LM
    * ([[graft.ops.TextAnalysis.lmModel]]) — the offline-train /
    * online-score split every streaming quality filter uses (CCNet's
    * perplexity gate as a stream). The model tables join per micro-batch
    * as stream-static joins (no stream-stream state, the static side is
    * broadcast/reused), unseen bigrams fall to the add-k floor, and the
    * per-doc aggregation emits under update mode. Scores for documents
    * whose n-grams are in-model are BIT-IDENTICAL to the batch
    * [[graft.ops.TextAnalysis.lmScore]] (spec-pinned). */
  def lmScoreStream(
      docs: DataFrame,
      bigramCounts: DataFrame,
      prefixCounts: DataFrame,
      vocabSize: Long,
      alpha: Double = 0.5): DataFrame =
    graft.ops.TextAnalysis.lmScoreAgainst(
      docs, bigramCounts, prefixCounts, vocabSize, alpha = alpha)

  /** Streaming incremental-novelty gate — the online half of
    * [[graft.ops.Curation.incrementalNovelty]]: a document stream is
    * admitted only if its fingerprint is (a) not already in the static
    * corpus fingerprint set and (b) not seen earlier in the stream
    * within the watermark horizon.
    *
    * (a) is a stream-static LEFT ANTI join — the static side is a batch
    * DataFrame of DISTINCT fingerprints, re-read per micro-batch with no
    * stream-stream state; at cluster scale it's the broadcast/bloom side
    * of the batch op. (b) is `dropDuplicatesWithinWatermark`, whose
    * state store holds one entry per fingerprint inside the horizon —
    * bounded by construction, the same guarantee as [[dedupStream]].
    * Together: at-least-once raw ingest becomes an exactly-once stream
    * of genuinely new documents. */
  def noveltyGateStream(
      docs: DataFrame,
      corpusFps: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .withColumn("fp", md5(col("text")))
      .join(corpusFps.select("fp").distinct(), Seq("fp"), "left_anti")
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup novelty gate — the online half of
    * [[graft.ops.Dedup.simhashNovelty]]: a document stream is admitted
    * only if its 64-bit SimHash is NOT within hamming distance ≤ 2 of
    * the static corpus fingerprint index, so a lightly edited re-crawl
    * of a known page is dropped at ingest (the exact-hash
    * [[noveltyGateStream]] admits it).
    *
    * Stream-legal by construction: the fingerprint is the PROJECTION
    * form ([[graft.ops.Dedup.simhash64]] — per-row; the faster agg form
    * needs a groupBy a stream can't run statelessly), and the distance
    * check avoids both explode-self-join and stream-side aggregation by
    * pre-bucketing the STATIC side per Manku block key (probe →
    * collect_set of fingerprints, sparse buckets at 64-bit width) and
    * LEFT-joining the stream's 3 key columns against it — three
    * stream-static joins, then one per-row `exists` over the ≤ 3 small
    * candidate arrays. Within-stream exact re-delivery rides
    * `dropDuplicatesWithinWatermark` on the fingerprint (bounded
    * state); within-stream NEAR-dups are out of scope here — run the
    * batch [[graft.ops.Dedup.simhashHammingPairs]] over the landed
    * horizon for those. */
  def simhashGateStream(
      docs: DataFrame,
      corpusFps: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    hammingGateStream(
      graft.ops.Dedup.simhash64(docs.withWatermark("ts", watermark), "text"),
      corpusFps)

  /** Streaming PERCEPTUAL novelty gate — the asset-side twin of
    * [[simhashGateStream]]: an incoming media stream is admitted only if
    * its aHash-style perceptual fingerprint
    * ([[graft.ops.Multimodal.perceptualHashRow]] — the stream-legal
    * per-row projection form; the batch op's explode+groupBy form needs
    * an aggregation a stream can't run statelessly) is NOT within
    * hamming distance ≤ 2 of the known-asset index, so a re-ingested
    * copy with a few bytes changed (stripped metadata, minor edit) is
    * dropped at ingest. Same block-key bucket machinery, same bounded
    * state story. */
  def phashGateStream(
      assets: DataFrame,
      corpusFps: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    hammingGateStream(
      graft.ops.Multimodal.perceptualHashRow(
        assets.withWatermark("ts", watermark), "content")
        .withColumnRenamed("phash", "simhash"),
      corpusFps)

  /** Streaming SEMANTIC decontamination gate — the embedding-space twin
    * of [[phashGateStream]] and the ingest-time form of the batch
    * `embed_decontaminate` query: an incoming vector stream is admitted
    * only if its max cosine to the held-out EVAL suite is below
    * `threshold`, so a paraphrased eval item (no shared n-grams, no
    * shared perceptual bits, cosine ≈ 1) is dropped at ingest rather
    * than discovered in a nightly sweep.
    *
    * Scale shape: eval suites are tiny and STATIC next to the ingest
    * stream, so the whole eval side is frozen ONCE at stream build time
    * into a single row of pre-normalized vectors (the
    * [[hammingGateStream]] materialize-the-static-side rationale: a
    * stream-static join re-executes an unmaterialized static sub-plan
    * every micro-batch) and cross-joined in — per stream row the work is
    * |eval| dot products, no stream-side aggregation, no shuffle.
    * Within-stream exact re-delivery rides
    * `dropDuplicatesWithinWatermark` keyed on (event id, md5 digest of
    * the normalized vector) — state is one small string per key, and two
    * DISTINCT events sharing an embedding are both admitted. Stream
    * schema: (id, ts, v: array<double>). */
  def semanticGateStream(
      vecs: DataFrame,
      evalVecs: DataFrame,
      threshold: Double = 0.9,
      watermark: String = "10 minutes"): DataFrame = {
    // pre-normalize the eval side so the per-row score is a plain dot
    // product; normalizing the stream row once makes the gate scale-
    // invariant (a x2-scaled eval copy still lands at cosine exactly 1)
    val norm = "sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"
    val evs = graft.ops.Materialize.index(
      evalVecs.select(col("v"))
        .filter(expr(norm) > 0D)
        .select(expr(s"transform(v, x -> x / $norm)").as("_ev"))
        .agg(collect_list("_ev").as("_evs")),
      "gate-eval-vecs")
    vecs.withWatermark("ts", watermark)
      .withColumn("_vn", expr(s"IF($norm > 0D, transform(v, x -> x / $norm), v)"))
      .crossJoin(evs)
      .filter(expr(
        s"""NOT exists(_evs, e ->
           |  aggregate(zip_with(_vn, e, (a, b) -> a * b), 0D, (a, x) -> a + x)
           |    >= $threshold)""".stripMargin))
      // re-delivery key = (event id, vector digest): two DISTINCT events
      // that happen to share an embedding must both pass, and the state
      // store holds a 32-char digest per key, not the full array<double>
      .withColumn("_vd", md5(to_json(struct(col("_vn")))))
      .dropDuplicatesWithinWatermark("id", "_vd")
      .drop("_vn", "_vd", "_evs")
  }

  /** Shared core of the hamming-≤2 novelty gates: the input stream
    * already carries a 64-bit `simhash` fingerprint column; the static
    * corpus index is pre-bucketed per Manku block key and LEFT-joined on
    * the stream's 3 key columns, then one per-row `exists` over the ≤ 3
    * small candidate arrays verifies exact distance — no explode
    * self-join, no stream-side aggregation. Within-stream exact
    * re-delivery rides `dropDuplicatesWithinWatermark` (bounded state);
    * within-stream NEAR-dups are the batch pass's job over the landed
    * horizon. */
  private def hammingGateStream(
      fingerprinted: DataFrame,
      corpusFps: DataFrame): DataFrame = {
    import graft.ops.Dedup
    val keys = Dedup.hammingBlockKeySql
    // the bucket table is STATIC — materialize it once at stream build
    // time: a stream-static join re-executes the static sub-plan every
    // micro-batch, and this one is referenced three times per batch, so
    // an unmaterialized corpus-wide distinct + collect_set aggregate
    // would run 3× per trigger forever; frozen to parquet it's a scan
    val buckets = graft.ops.Materialize.index(
      corpusFps.select(col("simhash").as("_cfp")).distinct()
        .select(col("_cfp"),
          explode(expr(s"array(${keys.map(_.replace("simhash", "_cfp")).mkString(", ")})"))
            .as("_probe"))
        .groupBy("_probe").agg(collect_set("_cfp").as("_fps")),
      "gate-buckets")
    val keyed = keys.zipWithIndex.foldLeft(fingerprinted) {
      case (df, (sql, b)) => df.withColumn(s"_k$b", expr(sql))
    }
    val joined = keys.indices.foldLeft(keyed) { case (df, b) =>
      df.join(
        buckets.withColumnRenamed("_probe", s"_k$b").withColumnRenamed("_fps", s"_fps$b"),
        Seq(s"_k$b"), "left")
    }
    val candidates = keys.indices.map(b => s"coalesce(_fps$b, array())").mkString(", ")
    joined
      .filter(expr(
        s"""NOT exists(concat($candidates), so ->
           |  ${Dedup.hammingDistSql("simhash", "so")} <= 2)""".stripMargin))
      .dropDuplicatesWithinWatermark("simhash")
      .drop((keys.indices.map(b => s"_k$b") ++ keys.indices.map(b => s"_fps$b")): _*)
  }

  /** Stream-STREAM interval join — the attribution primitive: each
    * impression pairs with the clicks of the same user landing within
    * `withinSeconds` after it. Both sides carry watermarks and the join
    * predicate bounds the event-time range, which is exactly what lets
    * Spark size and EVICT each side's join state (an unbounded
    * stream-stream join is rejected in append mode without the bound) —
    * state per side is one watermark+bound horizon, however long the
    * streams run.
    *
    * Left schema: (imp_id, ts, user_id); right: (click_id, cts,
    * cuser_id). Returns (user_id, imp_id, click_id, ts, cts,
    * delay_sec), one row per attributed pair. */
  def attributionJoinStream(
      imps: DataFrame,
      clicks: DataFrame,
      withinSeconds: Long = 600,
      watermark: String = "10 minutes"): DataFrame =
    imps.withWatermark("ts", watermark)
      .join(clicks.withWatermark("cts", watermark),
        expr(s"""user_id = cuser_id AND
                 cts >= ts AND cts <= ts + INTERVAL $withinSeconds SECONDS"""))
      .select(col("user_id"), col("imp_id"), col("click_id"), col("ts"), col("cts"),
        round((unix_micros(col("cts")) - unix_micros(col("ts"))) / 1e6, 3)
          .as("delay_sec"))

  /** Stream the events landing directory (parquet files appearing over
    * time) into the windowed aggregation, writing to an in-memory sink —
    * the readStream → transform → writeStream shape. */
  def runFileStream(spark: SparkSession, landingDir: String, queryName: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(landingDir).schema
    val stream = spark.readStream.schema(schema).parquet(landingDir)
    windowedCounts(stream)
      .writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .format("memory")
      .start()
  }

  /** Streaming incremental MANIFEST maintenance — the online form of the
    * nightly [[graft.ops.StandingState.ingest]]: each micro-batch of
    * newly-landed assets is fingerprinted (batch-local payload work
    * only), probed against the PERSISTED standing fingerprint table via
    * the cross-set block probes, folded into the standing assignment
    * ([[graft.ops.Cluster.mergeClusters]], delta-sized), and the delta
    * APPENDED as a new snapshot for the next batch to read.
    * `foreachBatch` is the composition point (the [[windowTopKStream]]
    * precedent): the fold is a batch operation over persisted lake
    * tables, which streaming aggregation modes cannot express.
    *
    * Exactly-once: each batch commits under `owner = "batch-<id>"` — a
    * replayed batch (restart after a post-commit crash) finds its own
    * owner token on the latest snapshot and is SKIPPED, and a mid-batch
    * failure leaves only unreferenced orphan partitions (the witness
    * rename is the commit point), so the retried batch folds from the
    * last committed snapshot. A concurrent foreign writer on the same
    * store fails the lease loudly instead of interleaving.
    *
    * Disk footprint is BOUNDED: after each commit the stream retires all
    * but the two newest snapshots — a snapshot is one witness file, and
    * data partitions are shared by reference, so the store holds the
    * base partitions plus one delta partition per batch, never
    * batches × base copies; superseded-and-unreferenced partitions are
    * swept by the same retention call.
    *
    * The stream DataFrame carries (asset_id, content) rows
    * ([[graft.ops.Multimodal.assetsFromText]] shape). By the
    * merge ≡ recompute contract the folded state after ANY number of
    * micro-batches is row-identical to a one-shot batch bootstrap over
    * everything ingested (spec-pinned). */
  /** `compactAtPartitions` bounds the long-stream tail: one delta
    * partition lands per micro-batch, so past the cap the batch runs the
    * bounded-cadence [[graft.ops.StandingState.compactManifest]] fold
    * (carrying the batch's owner token, so a post-compaction replay is
    * still skipped) instead of the plain 2-snapshot retention. */
  def manifestIngestStream(
      assets: DataFrame,
      store: String,
      compactAtPartitions: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    assets.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.StandingState.ingest(batch, store, owner = s"batch-$batchId")
          if (!graft.ops.StandingState.compactManifest(
              batch.sparkSession, store, compactAtPartitions, owner = s"batch-$batchId"))
            graft.ops.StandingState.keepSnapshots(batch.sparkSession, store, keep = 2)
        }
      }
      .start()

  /** Streaming incremental ANN-INDEX maintenance — the online form of
    * the nightly [[graft.ops.AnnIndex.ingest]], completing the
    * persisted-family set on the streaming side (manifest r13, ANN
    * r14): each micro-batch of newly arrived vectors is assigned
    * against the STANDING centroids (broadcast — exact per vector by
    * construction, a vector's nearest centroid is independent of every
    * other vector) and APPENDED as a cells partition for the next batch
    * — and any concurrent server — to read.
    *
    * The CUMULATIVE drift verdict (rows appended since the last
    * seed/refine over index size, derived from witness metadata alone —
    * zero extra jobs) is surfaced per batch through `onDrift`. The
    * stream NEVER refines on its own: a refine is a full-corpus rewrite
    * the operator schedules out-of-band; the stream's job is to fold
    * exactly and report the debt. (For the same reason there is no
    * in-flow layout compaction here — a layout-only fold would reset
    * the gate's seed partition; the refine IS the bounded-cadence
    * rewrite for this family.)
    *
    * Exactly-once and bounded disk mirror [[manifestIngestStream]]:
    * each batch commits under `owner = "batch-<id>"` (a replayed batch
    * is skipped and reports the ORIGINAL verdict — the gate reads
    * committed metadata), and retention keeps at most the two newest
    * snapshot witnesses, with cells partitions shared by reference. */
  def annIngestStream(
      vectors: DataFrame,
      store: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      refineAt: Double = 0.25,
      onDrift: (Long, Boolean) => Unit = (_, _) => ()): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val fire = graft.ops.AnnIndex.ingest(
            batch, idCol, vecCol, store, refineAt, owner = s"batch-$batchId")
          graft.ops.StandingState.keepSnapshots(batch.sparkSession, store, keep = 2)
          onDrift(batchId, fire)
        }
      }
      .start()

  /** [[annIngestStream]] for the COMPOSED single-store IVFADC layout
    * ([[graft.ops.AnnIndex.ingestComposed]]): each micro-batch is
    * assigned AND coded against the standing centroids/codebooks and
    * lands cells + cell-clustered codes in ONE commit — the serving
    * side ([[graft.ops.AnnIndex.ivfadcTopKComposed]]) always observes
    * a snapshot where the two tables agree. Same exactly-once,
    * drift-surfacing, and keep-2 retention contract as the IVF
    * stream. */
  def annIngestStreamComposed(
      vectors: DataFrame,
      store: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      refineAt: Double = 0.25,
      m: Int = 4,
      subDim: Int = 16,
      onDrift: (Long, Boolean) => Unit = (_, _) => ()): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val fire = graft.ops.AnnIndex.ingestComposed(
            batch, idCol, vecCol, store, refineAt,
            owner = s"batch-$batchId", m = m, subDim = subDim)
          graft.ops.StandingState.keepSnapshots(batch.sparkSession, store, keep = 2)
          onDrift(batchId, fire)
        }
      }
      .start()
}
