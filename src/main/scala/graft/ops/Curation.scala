package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and tokenization: deterministic training-order
  * sharding, incremental (batch-vs-corpus) novelty checks, source/domain
  * level quality gating, and cross-document boilerplate-line stripping.
  *
  * All four are shuffle-frugal by construction:
  *   - [[shardAssignments]] hash-partitions (no global sort) and the
  *     within-shard position window reuses the shard hash partitioning —
  *     one exchange total, independent of corpus size.
  *   - [[incrementalNovelty]] reduces the existing corpus to DISTINCT
  *     fingerprints before the join (the decontaminate pattern), and the
  *     first-in-batch window runs on the same key as the join, so
  *     Catalyst reuses the exchange.
  *   - [[domainStats]] is a single partial-aggregated shuffle at
  *     source-key grain with pure-integer sums (bit-stable across
  *     engines; no double summation order to disagree on).
  *   - [[boilerplateStrip]] shuffles line hashes once (window) and doc
  *     ids once (reassembly) — same ledger as [[Dedup.lineDedup]].
  */
object Curation {

  /** Deterministic seeded global shuffle for training order.
    *
    * Every row gets a shard (hash bucket of a salted md5 — NOT a ntile
    * over a global sort, which would funnel the corpus through a single
    * ordering) and a within-shard position (row_number over the shard's
    * hash order). At cluster scale this is exactly the training-data
    * "global shuffle": one hash exchange; each shard is written by one
    * task; re-running with the same salt reproduces the order bit-for-bit.
    */
  def shardAssignments(
      df: DataFrame,
      idCol: String,
      salt: String = "shuf42|",
      nShards: Int = 8): DataFrame = {
    val skey = md5(concat(lit(salt), col(idCol).cast("string")))
    val shard = pmod(
      conv(substring(col("skey"), 1, 4), 16, 10).cast("long"),
      lit(nShards.toLong))
    val w = Window.partitionBy("shard").orderBy(col("skey"), col(idCol))
    df.select(col(idCol), skey.as("skey"))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Batch-vs-corpus novelty: which rows of `batch` are new relative to
    * an existing corpus, under an arbitrary fingerprint expression?
    *
    * Returns every batch row with `in_corpus` (fingerprint already known
    * to the corpus), `first_in_batch` (row owns the min id for its
    * fingerprint within the batch), and `novel` (neither seen before nor
    * a within-batch duplicate) — the incremental-ingest shape: only
    * `novel` rows proceed to tokenization.
    *
    * The corpus side collapses to DISTINCT fingerprints before the join,
    * so a 100 TB corpus contributes only its unique-hash set; pair with
    * the bloom-filter scan prefilter ([[graft.functions]] bloom
    * expressions) when the hash set itself is too large to shuffle
    * comfortably.
    */
  def incrementalNovelty(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      fingerprint: Column): DataFrame = {
    val b = batch.select(col(idCol), fingerprint.as("fp"))
    val seen = corpus.select(fingerprint.as("fp")).distinct()
      .withColumn("in_corpus", lit(true))
    val w = Window.partitionBy("fp")
    b.join(seen, Seq("fp"), "left")
      .withColumn("in_corpus", coalesce(col("in_corpus"), lit(false)))
      .withColumn("first_in_batch", col(idCol) === min(col(idCol)).over(w))
      .withColumn("novel", !col("in_corpus") && col("first_in_batch"))
  }

  /** Source/domain-level curation statistics (the CCNet/RefinedWeb
    * "judge the domain, not just the document" gate): per source, doc
    * count, short-doc count, pooled distinct-word ratio, short-doc
    * fraction, and a keep flag.
    *
    * Ratios are single divisions of exact integer sums (sum of per-doc
    * distinct-word counts over sum of word counts), never averages of
    * doubles — so the result is bit-stable regardless of aggregation
    * order, which matters both for the cross-engine oracle and for
    * rerun-reproducibility on a cluster.
    */
  def domainStats(
      df: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      charsCol: String = "n_chars",
      shortChars: Int = 200,
      minRatio: Double = 0.48,
      maxShortFrac: Double = 0.4): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    df.select(
        col(sourceCol),
        size(array_distinct(toks)).cast("long").as("dw"),
        size(toks).cast("long").as("w"),
        when(col(charsCol) < shortChars, 1L).otherwise(0L).as("short"))
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum("short").as("n_short"),
        sum("dw").as("sum_dw"),
        sum("w").as("sum_w"))
      .select(
        col(sourceCol),
        col("n_docs"),
        col("n_short"),
        round(col("sum_dw") * 1.0 / col("sum_w"), 4).as("pooled_ratio"),
        round(col("n_short") * 1.0 / col("n_docs"), 4).as("short_frac"),
        (round(col("sum_dw") * 1.0 / col("sum_w"), 4) >= minRatio &&
          round(col("n_short") * 1.0 / col("n_docs"), 4) <= maxShortFrac)
          .as("keep"))
  }

  /** Token-budget corpus selection (the data-constrained-scaling recipe:
    * take the best documents until the token budget is spent): rank by
    * a quality score, cumulative-sum token counts in that order, keep
    * while the running total fits the budget.
    *
    * The global ordered cumsum is the scale trap here — a naive
    * `Window.orderBy(...)` with no partitioning funnels the WHOLE corpus
    * through one task. This is the two-pass encoding instead:
    * range-repartition on the rank order, per-partition local running
    * sums (each partition windows only its own slice), then add each
    * partition's broadcast prefix offset. Output is identical to the
    * single-partition window, but no task ever sees more than its
    * 1/Nth of the corpus. Range boundaries come from Spark's sampling —
    * WHERE a row lands can vary run to run, but local-cum + prefix is
    * boundary-invariant, so the result never does.
    */
  def budgetSelect(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long,
      partitions: Int = 32): DataFrame = {
    // The pid assignment is parquet-materialized ONCE: both consumers
    // (local cumsum + prefix totals) must see the SAME range boundaries,
    // and those come from sampling — two re-executions of the exchange
    // are not guaranteed to agree. One skinny (id, score, tokens, pid)
    // table settles it, the repo's standard shared-index pattern.
    val ranked = Materialize.index(
      df.select(col(idCol), col(scoreCol).as("score"),
          col(tokensCol).cast("long").as("n_tokens"))
        .repartitionByRange(partitions, col("score").desc, col(idCol))
        .withColumn("_pid", spark_partition_id()),
      "budget-rank")
    val wLocal = Window.partitionBy("_pid")
      .orderBy(col("score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranked.withColumn("_cum_local", sum("n_tokens").over(wLocal))
    val wPrefix = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = ranked.groupBy("_pid")
      .agg(sum("n_tokens").as("_ptot"))
      .withColumn("_prefix", coalesce(sum("_ptot").over(wPrefix), lit(0L)))
      .select("_pid", "_prefix")
    local
      .join(broadcast(prefixes), "_pid")
      .withColumn("cum_tokens", col("_cum_local") + col("_prefix"))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col("score"), col("n_tokens"), col("cum_tokens"))
  }

  /** Cross-document boilerplate stripping: a line (fixed word-block, the
    * same segmentation as [[Dedup.lineDedup]]) that appears in
    * `minDocs`+ DISTINCT documents is boilerplate — headers, footers,
    * cookie banners — and is kept only in the document that first used
    * it (min doc id), stripped everywhere else.
    *
    * Differs from [[Dedup.lineDedup]] (which drops every copy of any
    * repeated line, including within-doc repeats): this is the
    * keep-first-occurrence semantics production pipelines use, counting
    * distinct documents rather than raw copies.
    */
  def boilerplateStrip(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockWords: Int = 10,
      minDocs: Int = 2): DataFrame = {
    val toks = s"split($textCol, ' ')"
    val blocks = expr(
      s"""transform(sequence(0, cast(ceil(size($toks) / ${blockWords}.0) AS INT) - 1),
         |  i -> concat_ws(' ', slice($toks, i * $blockWords + 1, $blockWords)))""".stripMargin)
    val wLine = Window.partitionBy("lh")
    df.select(col(idCol), posexplode(blocks).as(Seq("pos", "line")))
      .withColumn("lh", md5(col("line")))
      .withColumn("nd", size(collect_set(col(idCol)).over(wLine)))
      .withColumn("mindoc", min(col(idCol)).over(wLine))
      .withColumn("kept", col("nd") < minDocs || col(idCol) === col("mindoc"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          " ").as("text_clean"))
  }

  /** Per-domain quota capping: keep at most `cap` documents per domain,
    * ranked by a quality score — the "no single domain dominates the
    * corpus" rule every web-scale mixture applies.
    *
    * The scale trap is a hot domain: a plain
    * `Window.partitionBy(domain)` funnels the whole domain through one
    * task. Two-phase top-k instead: phase 1 windows on
    * (domain, input-partition id) — a hot domain spreads across as many
    * tasks as it has input splits, and each emits at most `cap`
    * survivors — phase 2 windows on domain alone over the pruned
    * ≤ cap·P candidate set. Both exchanges are bounded; no task ever
    * sorts more than its own slice (phase 1) or cap·P rows per domain
    * (phase 2). Ranking is (score desc, id) so the cut is total-ordered
    * and engine-reproducible.
    */
  def domainQuota(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      scoreCol: String,
      cap: Int): DataFrame = {
    val order = Seq(col(scoreCol).desc, col(idCol))
    val wLocal = Window.partitionBy(col(domainCol), col("_pid")).orderBy(order: _*)
    val wGlobal = Window.partitionBy(col(domainCol)).orderBy(order: _*)
    df.select(col(idCol), col(domainCol), col(scoreCol))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrk", row_number().over(wLocal))
      .filter(col("_lrk") <= cap)
      .withColumn("rank_in_domain", row_number().over(wGlobal).cast("long"))
      .filter(col("rank_in_domain") <= cap)
      .drop("_pid", "_lrk")
  }

  /** Leak-free train/val/test split: every row inherits its GROUP's
    * split, where the group is a near-duplicate cluster id (or any other
    * leakage unit — url host, conversation id). Hashing the group
    * instead of the row guarantees near-duplicates can never straddle
    * the train/eval boundary — the contamination mode row-level random
    * splits always have.
    *
    * Assignment is the first hex digit of md5(group): digits 0-1 → val
    * (1/8 expected), 2-3 → test (1/8), rest → train (3/4). Content-hash
    * membership, no RNG — reproducible across runs and engines, and a
    * pure scan-side projection (zero shuffles) given the group column.
    */
  /** Materialize a weighted mixture by integer replication: each row
    * emits floor(w) copies plus one more with probability frac(w),
    * decided by a content-derived hex digit (no RNG — the same doc
    * always resolves the same way, across runs and engines). This is
    * the step that turns [[graft.PipelineQueries.mixTemperature]]'s
    * up/down-weights into an actual resampled corpus: w ≥ 1 languages
    * replicate, w < 1 languages thin to a deterministic subset.
    *
    * The fractional compare (digit < 16·frac) rounds to 4 decimals
    * first so a pow()-derived weight can't flip acceptance on engine
    * ulp. Zero-shuffle: weight arrives pre-joined (broadcast-sized per
    * group), the explode is a generator riding the scan, and rows with
    * n_copies = 0 never materialize.
    */
  def resampleReplicate(
      df: DataFrame,
      idCol: String,
      weightCol: String): DataFrame = {
    val digit = expr(
      s"instr('0123456789abcdef', substring(md5(concat(cast($idCol AS string), '|rep')), 1, 1)) - 1")
    val extra = when(
      digit < round((col(weightCol) - floor(col(weightCol))) * 16, 4), 1L)
      .otherwise(0L)
    df.withColumn("n_copies", floor(col(weightCol)).cast("long") + extra)
      // sequence(1, 0) DESCENDS in Spark — zero-copy rows need an
      // explicit empty list, and explode drops them entirely
      .withColumn("copy_id", explode(expr(
        "CASE WHEN n_copies < 1 THEN cast(array() AS array<bigint>) " +
          "ELSE sequence(1L, n_copies) END")))
  }

  def leakFreeSplit(df: DataFrame, groupCol: String): DataFrame = {
    val digit = expr(
      s"instr('0123456789abcdef', substring(md5(cast($groupCol AS string)), 1, 1)) - 1")
    df.withColumn("split",
      when(digit < 2, "val").when(digit < 4, "test").otherwise("train"))
  }

  /** Schema-drift census over an unknown-fields map column — the audit a
    * schema-flexible read layer runs weekly over its `_fm` capture (the
    * reference's radio column for fields written before they're declared,
    * SURVEY §2.2 P1/P2): per unknown key, how often it appears
    * (coverage), how many distinct values, and whether every value parses
    * as a long / as a number — i.e. which keys are ready to PROMOTE into
    * the declared schema and with what type.
    *
    * Scale shape: one explode of the map into skinny (key, value) rows +
    * one partial-aggregated groupBy on the (low-cardinality) key; the
    * type verdicts are sum(regex)==count equalities, so no engine-varying
    * boolean aggregate (bool_and vs min) is involved; coverage rounds in
    * INTEGER arithmetic ((2n·10⁴+T) div (2T)) so an exact half can't
    * fork. */
  def fmDriftCensus(
      df: DataFrame,
      fmCol: String = "_fm"): DataFrame = {
    val total = df.agg(count(lit(1)).as("_t"))
    df.select(explode(col(fmCol)).as(Seq("key", "value")))
      .groupBy("key")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct("value").as("n_distinct"),
        sum(when(col("value").rlike("^-?[0-9]+$"), 1L).otherwise(0L)).as("_nl"),
        sum(when(col("value").rlike("^-?[0-9]+(\\.[0-9]+)?$"), 1L).otherwise(0L)).as("_nn"))
      .crossJoin(broadcast(total))
      .select(
        col("key"),
        col("n_rows"),
        col("n_distinct"),
        (col("_nl") === col("n_rows")).as("all_long"),
        (col("_nn") === col("n_rows")).as("all_numeric"),
        (expr("(2 * n_rows * 10000 + _t) div (2 * _t)") / 10000.0).as("coverage"))
  }
}
