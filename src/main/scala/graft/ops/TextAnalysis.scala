package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup => DedupOps}

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language id, fingerprinting.
  *
  * Design for 100 TB: every function here is a narrow, codegen-friendly
  * projection over built-in expressions (split / transform / aggregate /
  * regexp) — zero shuffles, zero UDFs, so they run at scan speed and
  * column-prune down to just the text column. Shuffle only happens if the
  * caller aggregates the results.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: alphanumeric runs and individual punctuation
    * marks as separate tokens (a regex approximation of the GPT-2
    * pre-tokenizer split). RE2-compatible pattern — no lookarounds — so
    * the same regex runs in Spark and DuckDB. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Per-document quality stats: length, word counts, distinct ratio,
    * mean word length. All exact-arithmetic except the ratios. */
  def qualityStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_chars_m", length(col(textCol)))
      .withColumn("n_words", size(toks))
      .withColumn("n_distinct_words", size(array_distinct(toks)))
      .withColumn("distinct_ratio",
        round(col("n_distinct_words").cast("double") / col("n_words"), 4))
      .withColumn("mean_word_len",
        round((col("n_chars_m") - col("n_words") + 1).cast("double") / col("n_words"), 4))
  }

  /** Tiny per-language stopword lexicons for the n-gram/stopword-overlap
    * language-id heuristic. Deterministic and SQL-portable. */
  val lexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "de", "un"),
    "de" -> Seq("der", "die", "und", "das", "ein"))

  /** Language-id: score = |tokens ∩ lexicon| per language; predicted
    * language = argmax with deterministic tie-break on language code. */
  def langScores(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = array_distinct(tokens(lower(col(textCol))))
    val scored = lexicons.toSeq.sortBy(_._1).foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang",
        size(array_intersect(toks, array(words.map(lit): _*))))
    }
    // argmax with tie-break: highest score wins; ties go to the
    // lexicographically first language code.
    val langs = lexicons.keys.toSeq.sorted
    val best = langs.foldLeft((lit(-1), lit("und"))) { case ((bs, bl), lang) =>
      val s = col(s"score_$lang")
      (when(s > bs, s).otherwise(bs), when(s > bs, lit(lang)).otherwise(bl))
    }
    scored.withColumn("pred_lang", best._2)
  }

  /** Overlapping fixed-size chunks of a document — the unit a training
    * pipeline tokenizes and embeds (context-window packing with overlap so
    * no boundary content is lost). One output row per chunk, original
    * columns preserved.
    *
    * Scale: a pure generator projection (`explode(sequence(...))` +
    * substring) — no shuffle, no UDF, stays in codegen; output size is
    * ~len/stride rows per doc regardless of corpus size. Chunk text is a
    * derived column, so downstream `select`s that only need offsets/hashes
    * prune it before it is ever materialized.
    *
    * @param size   chunk length in characters
    * @param stride distance between chunk starts; < size ⇒ overlap of
    *               (size - stride) chars between consecutive chunks
    */
  def chunk(df: DataFrame, textCol: String = "text",
      size: Int = 200, stride: Int = 150): DataFrame = {
    require(stride > 0 && size > 0, "chunk size and stride must be positive")
    df.withColumn("chunk_start",
        explode(sequence(lit(0), greatest(length(col(textCol)) - 1, lit(0)), lit(stride))))
      .withColumn("chunk_idx", (col("chunk_start") / stride).cast("long"))
      .withColumn("chunk", col(textCol).substr(col("chunk_start") + 1, lit(size)))
  }

  /** Document fingerprint: md5 of normalized text, plus a winnowing-style
    * k-smallest-shingle-hash fingerprint (rolling content signature that
    * survives small edits). */
  def fingerprints(df: DataFrame, textCol: String = "text", k: Int = 4): DataFrame = {
    // 3-word shingle hashes; k smallest = the document's winnowed sketch
    val shingleHashes = transform(DedupOps.shingles(textCol, 3), s => md5(s))
    df.withColumn("md5_fp", md5(lower(col(textCol))))
      .withColumn("sketch", concat_ws(",", slice(array_sort(shingleHashes), 1, k)))
  }

  /** Benchmark-contamination scan: for every training document, how many
    * of its word n-grams appear ANYWHERE in an evaluation/benchmark
    * corpus. The standard decontamination step before a training run —
    * a train document sharing a large n-gram fraction with a benchmark
    * answer leaks the benchmark.
    *
    * Scale design: grams travel as fixed-width 16-hex md5 prefixes, never
    * as text. The benchmark side reduces to DISTINCT gram hashes — a few
    * MB for real eval suites even at 100 TB of training data — and is
    * broadcast, so the only wide operation is the per-doc hit count
    * (one partial-aggregated groupBy on doc id). Train docs with zero
    * hits survive via the left join back onto the gram counts.
    *
    * Returns (idCol, n_grams, n_hits, overlap_ratio, contaminated). */
  def contamination(
      train: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleWords: Int = 3,
      flagAt: Double = 0.2): DataFrame = {
    def gramHashes(c: Column): Column =
      array_distinct(transform(c, g => substring(md5(g), 1, 16)))
    val benchGrams = bench
      .select(explode(gramHashes(DedupOps.shingles(textCol, shingleWords))).as("gh"))
      .distinct()
    val trainGrams = train.select(col(idCol),
      gramHashes(DedupOps.shingles(textCol, shingleWords)).as("ghs"))
    val hits = trainGrams
      .select(col(idCol), explode(col("ghs")).as("gh"))
      .join(broadcast(benchGrams), "gh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("hits"))
    trainGrams
      .select(col(idCol), size(col("ghs")).cast("long").as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("hits"), lit(0L)))
      .withColumn("overlap_ratio",
        round(col("n_hits").cast("double") / col("n_grams"), 4))
      .withColumn("contaminated", col("overlap_ratio") >= flagAt)
      .drop("hits")
  }

  /** Corpus-trained bigram language-model score — the CCNet-style
    * perplexity quality filter, self-trained (no external model): count
    * unigrams and bigrams over the corpus itself, then score each
    * document by its average negative log-likelihood under add-k
    * smoothing, `-avg ln (c(w1 w2) + a) / (c(w1) + a·V)`. Documents with
    * high NLL are improbable under the corpus's own statistics (noise,
    * boilerplate, wrong language); the consumer thresholds or
    * percentile-buckets the score (CCNet keeps the middle band —
    * head/tail are templated/noisy respectively).
    *
    * Scale shape: the per-occurrence (doc, bigram, prefix) stream is the
    * ONE expensive map stage and is materialized once (the index-step
    * pattern); bigram counts, prefix counts (the proper conditional's
    * denominator, c(w1·)), and the vocabulary size all derive from it as
    * partial-aggregated groupBys, and scoring is two linear joins back
    * plus the 1-row vocabulary scalar as a broadcast cross join. No pair
    * explosion, no windows; per-doc aggregation is partial-combined.
    * Double sums shuffle-order-dependent at ulp scale → round(4) on the
    * output (the repo's established cross-engine defense).
    *
    * Returns (idCol, n_bigrams, nll); perplexity = exp(nll) if wanted. */
  def lmScore(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 0.5): DataFrame = {
    val stream = Materialize.index(
      df.select(col(idCol), explode(Dedup.shingles(textCol, 2)).as("b"))
        .withColumn("w", expr("split_part(b, ' ', 1)")),
      "lm-bigrams")
    val bi = stream.groupBy("b").agg(count(lit(1)).as("cb"))
    val pre = stream.groupBy("w").agg(count(lit(1)).as("cu"))
    val vocab = pre.agg(count(lit(1)).as("v"))
    stream
      .join(bi, "b")
      .join(pre, "w")
      .crossJoin(broadcast(vocab)) // 1-row scalar — the broadcast idiom
      .withColumn("lp",
        log((col("cb") + lit(alpha)) / (col("cu") + lit(alpha) * col("v"))))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        round(-avg(col("lp")), 4).as("nll"))
  }

  /** CCNet's head/middle/tail split of the LM quality score: per-language
    * EXACT percentile cuts (33/66) over the [[lmScore]] NLL, each
    * document bucketed against its language's thresholds — CCNet keeps
    * the middle band (head = templated/boilerplate-like, tail = noise).
    * Scale shape: the cut table is one exact-percentile aggregate over
    * (lang, nll) — tiny output, broadcast back — so the bucketing itself
    * is a scan-side projection; no global sort, no per-doc window. */
  def lmBuckets(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    // scored feeds BOTH the percentile-cut aggregate and the final bucket
    // join — materialize it once or the whole scoring chain (count joins
    // + per-doc aggregation) runs twice
    val scored = Materialize.index(
      lmScore(df, idCol, textCol)
        .join(df.select(col(idCol), col(langCol)), idCol),
      "lm-scored")
    val cuts = scored.groupBy(langCol).agg(
      expr("percentile(nll, 0.33)").as("c33"),
      expr("percentile(nll, 0.66)").as("c66"))
    scored.join(broadcast(cuts), langCol)
      .select(col(idCol), col(langCol), col("nll"),
        when(col("nll") <= col("c33"), "head")
          .when(col("nll") <= col("c66"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Kneser–Ney smoothed bigram LM score (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated form) — the smoothing that actually
    * wins LM quality-filtering evaluations, vs [[lmScore]]'s add-k:
    *
    *   P(w2|w1) = (c(w1w2) − D)/c(w1·)
    *            + D · N1+(w1·)/c(w1·) · N1+(·w2)/B
    *
    * with discount D = 0.75, N1+(w1·) = distinct continuations of w1,
    * N1+(·w2) = distinct histories of w2 (the "how many contexts has
    * this word completed" continuation probability that makes KN work),
    * B = distinct bigram count. Self-trained on the scored corpus, so
    * every scored bigram has c ≥ 1 and the discounted term stays
    * positive — no OOV branch to diverge between engines.
    *
    * Scale shape identical to [[lmScore]]: one materialized bigram
    * stream feeds four partial-aggregated groupBys (bigram counts,
    * prefix totals, forward/backward continuation distincts) and the
    * 1-row B scalar; scoring is linear joins back onto the stream.
    * Returns (idCol, n_bigrams, nll_kn); round(4) cross-engine defense. */
  def knScore(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      discount: Double = 0.75): DataFrame = {
    val stream = Materialize.index(
      df.select(col(idCol), explode(Dedup.shingles(textCol, 2)).as("b"))
        .withColumn("w", expr("split_part(b, ' ', 1)"))
        .withColumn("w2", expr("split_part(b, ' ', 2)")),
      "kn-bigrams")
    val bi = stream.groupBy("b").agg(count(lit(1)).as("cb"))
    val pre = stream.groupBy("w").agg(
      count(lit(1)).as("cu"),
      countDistinct("w2").as("n1fwd"))
    val cont = stream.groupBy("w2").agg(countDistinct("w").as("n1bwd"))
    val btot = bi.agg(count(lit(1)).as("bcnt"))
    stream
      .join(bi, "b")
      .join(pre, "w")
      .join(cont, "w2")
      .crossJoin(broadcast(btot))
      .withColumn("lp", log(
        (col("cb") - lit(discount)) / col("cu") +
          lit(discount) * col("n1fwd") / col("cu") *
          (col("n1bwd").cast("double") / col("bcnt"))))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        round(-avg(col("lp")), 4).as("nll_kn"))
  }

  /** Encoding-damage ("mojibake") audit: the cheap scan-side signals
    * that catch UTF-8 decoded as Latin-1 ('Ã', 'â€¦'-style artifacts),
    * lost bytes (U+FFFD replacement chars), and binary-in-text (control
    * characters) — the triage every crawled corpus runs before any
    * model-side quality scoring. Pure regexp_count projections (RE2-
    * compatible patterns, the repo convention), zero shuffle; the
    * verdict thresholds are scan-side booleans. */
  def mojibakeSignals(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val repl = regexp_count(t, lit("�"))
    val ctrl = regexp_count(t, lit("[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]"))
    // UTF-8 bytes 0xC3/0xE2/0xC2 read as Latin-1 — the classic artifacts
    val arti = regexp_count(t, lit("(Ã.|â€.|Â.)"))
    df.select(
      col(idCol),
      repl.cast("long").as("n_replacement"),
      ctrl.cast("long").as("n_control"),
      arti.cast("long").as("n_artifacts"),
      round((repl + ctrl + arti).cast("double") /
        greatest(length(t), lit(1)), 6).as("damage_ratio"),
      mojibakeSuspect(t).as("suspect"))
  }

  /** The [[mojibakeSignals]] verdict boolean as a bare column expression,
    * so ensemble queries can fuse it into the SAME scan-side projection
    * as the other gates instead of computing a second corpus pass and
    * joining it back by id. */
  def mojibakeSuspect(t: Column): Column = {
    val repl = regexp_count(t, lit("�"))
    val ctrl = regexp_count(t, lit("[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]"))
    val arti = regexp_count(t, lit("(Ã.|â€.|Â.)"))
    (repl + ctrl + arti).cast("double") / greatest(length(t), lit(1)) > lit(0.001)
  }

  /** Per-source unigram-distribution divergence from the corpus-wide
    * distribution: KL(P_src ‖ P_corpus) with add-one smoothing over the
    * corpus vocabulary — the domain-shift ranking that tells a mixture
    * designer which sources are stylistic outliers (complements
    * [[graft.PipelineQueries.sourceOverlap]]'s exact vocabulary Jaccard
    * and DSIR's importance weights). Smoothing over the shared corpus
    * vocab V keeps every term in both supports, so the sum is finite by
    * construction.
    *
    * The words a source NEVER uses still carry probability p0 =
    * 1/(n_s+V) under smoothing; their contribution folds into a CLOSED
    * FORM instead of a per-(source, absent-word) join:
    *
    *   KL(s) = Σ_present p_s ln(p_s/p_c)
    *         + p0 · ((V − n_present)·ln p0 − (Lc − B_s))
    *
    * where Lc = Σ_{w∈V} ln p_c(w) (one corpus scalar) and B_s =
    * Σ_present ln p_c(w). So the computation is: one token stream →
    * (source, word) counts (partial agg), corpus totals by a second
    * groupBy over the same table, two scalar broadcasts, and one final
    * per-source fold. No windows, no pairs, nothing sized
    * sources × vocabulary. */
  def sourceKlDivergence(
      df: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val sw = Materialize.index(
      df.select(col(sourceCol).as("src"),
          explode(split(lower(col(textCol)), " ")).as("word"))
        .groupBy("src", "word").agg(count(lit(1)).as("c")),
      "kl-counts")
    val corpus = sw.groupBy("word").agg(sum("c").as("cc"))
    val vocabStats = corpus.agg(count(lit(1)).as("v"), sum("cc").as("nc"))
    // Lc needs p_c, which needs (v, nc) — one more pass over the corpus
    // word table with the 1-row scalars broadcast in
    val scal = corpus.crossJoin(broadcast(vocabStats))
      .agg(
        sum(log((col("cc") + lit(1.0)) / (col("nc") + col("v")))).as("lc"),
        first("v").as("v"), first("nc").as("nc"))
    val srcTot = sw.groupBy("src").agg(sum("c").as("ns"))
    sw
      .join(corpus, "word")
      .join(broadcast(srcTot), "src")
      .crossJoin(broadcast(scal))
      .withColumn("ps", (col("c") + lit(1.0)) / (col("ns") + col("v")))
      .withColumn("pc", (col("cc") + lit(1.0)) / (col("nc") + col("v")))
      .groupBy("src")
      .agg(
        sum(col("ps") * log(col("ps") / col("pc"))).as("_a"),
        sum(log(col("pc"))).as("_b"),
        count(lit(1)).as("n_present"),
        first("v").as("_v"), first("lc").as("_lc"), first("ns").as("_ns"))
      .withColumn("_p0", lit(1.0) / (col("_ns") + col("_v")))
      .select(
        col("src"),
        col("n_present").cast("long").as("n_words"),
        round(col("_a") + col("_p0") *
          ((col("_v") - col("n_present")) * log(col("_p0")) -
            (col("_lc") - col("_b"))), 4).as("kl_vs_corpus"))
  }

  /** Batch-train the bigram LM [[lmScore]] uses, as STATIC tables — the
    * model half of the offline-train / online-score split: a scoring
    * stream ([[graft.streaming.EventStreams.lmScoreStream]]) joins these
    * per micro-batch (stream-static join, no streaming state). Returns
    * (bigramCounts(b, cb), prefixCounts(w, cu), vocabularySize). */
  def lmModel(
      df: DataFrame,
      textCol: String = "text"): (DataFrame, DataFrame, Long) = {
    val stream = Materialize.index(
      df.select(explode(Dedup.shingles(textCol, 2)).as("b"))
        .withColumn("w", expr("split_part(b, ' ', 1)")),
      "lm-model")
    val bi = stream.groupBy("b").agg(count(lit(1)).as("cb"))
    val pre = stream.groupBy("w").agg(count(lit(1)).as("cu"))
    (bi, pre, pre.count())
  }

  /** Score documents against an ALREADY-TRAINED bigram model (the tables
    * [[lmModel]] returns) — works identically on a batch DataFrame and a
    * streaming one (the stream-static quality gate delegates here).
    * Unseen n-grams fall to the add-k floor via the left joins. */
  def lmScoreAgainst(
      docs: DataFrame,
      bigramCounts: DataFrame,
      prefixCounts: DataFrame,
      vocabSize: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 0.5): DataFrame =
    scoreBigramStream(
      docs.select(col(idCol), explode(Dedup.shingles(textCol, 2)).as("b"))
        .withColumn("w", expr("split_part(b, ' ', 1)")),
      bigramCounts, prefixCounts, vocabSize, idCol, alpha)

  /** The add-α scoring fold over an ALREADY-EXPLODED (id, b, w) stream —
    * the one home of the smoothing formula; [[lmScoreAgainst]] and
    * [[dsirWeights]] both land here. */
  private def scoreBigramStream(
      stream: DataFrame,
      bigramCounts: DataFrame,
      prefixCounts: DataFrame,
      vocabSize: Long,
      idCol: String,
      alpha: Double): DataFrame =
    stream
      .join(bigramCounts, Seq("b"), "left")
      .join(prefixCounts, Seq("w"), "left")
      .withColumn("lp", log(
        (coalesce(col("cb"), lit(0L)) + lit(alpha)) /
          (coalesce(col("cu"), lit(0L)) + lit(alpha) * vocabSize)))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        round(-avg(col("lp")), 4).as("nll"))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * LMs via Importance Resampling" — the hashed-ngram variant): train
    * one LM on the TARGET domain and one on the general corpus, and
    * weight every document by the log-likelihood ratio
    * `log w = nll_general − nll_target` (positive ⇒ the document looks
    * more like the target domain than like the general corpus; sampling
    * ∝ exp(log w) tilts the corpus toward the target). Linear, no pair
    * work — and the expensive stage, exploding the text into the
    * (doc, bigram, prefix) stream, is materialized ONCE (index-step
    * pattern): both models' count tables and both scoring passes are
    * cheap aggregations/joins over that one parquet-backed stream
    * instead of four separate re-explosions of the corpus. */
  def dsirWeights(
      df: DataFrame,
      targetFilter: Column,
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 0.5): DataFrame = {
    val stream = Materialize.index(
      df.select(col(idCol), targetFilter.as("_tgt"),
          explode(Dedup.shingles(textCol, 2)).as("b"))
        .withColumn("w", expr("split_part(b, ' ', 1)")),
      "dsir-stream")
    def model(s: DataFrame): (DataFrame, DataFrame, Long) = {
      val bi = s.groupBy("b").agg(count(lit(1)).as("cb"))
      val pre = s.groupBy("w").agg(count(lit(1)).as("cu"))
      (bi, pre, pre.count())
    }
    val (biG, preG, vG) = model(stream)
    val (biT, preT, vT) = model(stream.filter(col("_tgt")))
    def score(bi: DataFrame, pre: DataFrame, v: Long, asCol: String): DataFrame =
      scoreBigramStream(stream.select(col(idCol), col("b"), col("w")),
        bi, pre, v, idCol, alpha)
        .select(col(idCol), col("nll").as(asCol))
    score(biG, preG, vG, "nll_gen")
      .join(score(biT, preT, vT, "nll_tgt"), idCol)
      .withColumn("log_weight", round(col("nll_gen") - col("nll_tgt"), 4))
  }

  /** Gopher-style within-document repetition signals (Rae et al. 2021
    * §A1.1, the duplicate-n-gram family): per document and per n-gram
    * size, the fraction of gram occurrences that are repeats
    * (`1 − distinct/total`) and the share claimed by the single most
    * frequent gram. A document that loops a phrase sails through
    * corpus-level dedup (nothing else matches it) but fails here.
    *
    * Scale shape: ZERO shuffles — both signals are per-row array
    * expressions over the shingle list (the O(distinct·total) nested
    * scan is bounded by document length, not corpus size), so the whole
    * operator rides the parquet scan. */
  def repetitionSignals(
      df: DataFrame,
      textCol: String = "text",
      ns: Seq[Int] = Seq(2, 3),
      dupMax: Double = 0.3): DataFrame = {
    val out = ns.foldLeft(df) { (d, n) =>
      val g = s"_g$n"
      d.withColumn(g, Dedup.shingles(textCol, n))
        .withColumn(s"dup${n}_frac",
          round((size(col(g)) - size(array_distinct(col(g)))).cast("double") /
            size(col(g)), 4))
        .withColumn(s"top${n}_share",
          round(array_max(transform(array_distinct(col(g)),
            dg => size(filter(col(g), x => x === dg)))).cast("double") /
            size(col(g)), 4))
        .drop(g)
    }
    out.withColumn("keep",
      ns.map(n => col(s"dup${n}_frac") <= dupMax).reduce(_ && _))
  }

  /** Gopher-style rule-based quality signals (Rae et al. 2021 §A1.1-ish):
    * token count, mean word length, stopword fraction, symbol ratio, and
    * the top single-token share (repetition detector), plus the composite
    * pass flag. Pure codegen projections — the corpus is scanned once and
    * never shuffled; thresholds are the tunable part, the plumbing is
    * what scales. */
  def gopherSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val stops = Seq("the", "a", "and", "of", "to", "in", "is")
    val stopArr = array(stops.map(lit): _*)
    val toksC = tokens(lower(col(textCol)))
    df.withColumn("_tk", toksC)
      .withColumn("n_words", size(col("_tk")).cast("long"))
      .withColumn("mean_word_len",
        round((length(col(textCol)) - col("n_words") + 1).cast("double") / col("n_words"), 4))
      .withColumn("stop_frac",
        round(size(filter(col("_tk"), t => array_contains(stopArr, t))).cast("double") /
          col("n_words"), 4))
      .withColumn("symbol_ratio",
        round((length(col(textCol)) -
          length(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""))).cast("double") /
          length(col(textCol)), 4))
      // max token count via a LINEAR sorted-run scan. The transparent
      // form — max over distinct tokens of filter-count — is
      // O(len · distinct) interpreted lambda work PER DOCUMENT, i.e.
      // quadratic in document length: ~3 s of the sf0.1 gate census and
      // unbounded for long web docs. Sorting groups equal tokens into
      // runs, so one linear fold tracking (prev, run, best) computes the
      // identical value; both forms are plain value-equal, so the
      // DuckDB oracle's transparent expression still matches.
      .withColumn("max_tok_frac",
        round(expr(
          """aggregate(sort_array(_tk),
            |  named_struct('prev', '', 'run', 0L, 'best', 0L),
            |  (a, x) -> named_struct(
            |    'prev', x,
            |    'run', IF(x = a.prev, a.run + 1L, 1L),
            |    'best', greatest(a.best, IF(x = a.prev, a.run + 1L, 1L))),
            |  a -> a.best)""".stripMargin).cast("double") /
          col("n_words"), 4))
      .withColumn("passes",
        col("n_words") >= 40 && col("mean_word_len").between(3.0, 8.0) &&
          col("stop_frac") >= 0.05 && col("max_tok_frac") <= 0.15 &&
          col("symbol_ratio") <= 0.1)
      .drop("_tk")
  }

  /** Top-k word collocations by pointwise mutual information,
    * PMI(w1,w2) = ln( c(w1 w2)·N / (c(w1·)·c(·w2)) ) over the corpus's
    * adjacent-bigram stream — the standard phrase-mining signal
    * ("new york", "machine learning") a tokenizer-vocabulary or
    * phrase-merging pass consumes.
    *
    * Scale shape: the per-occurrence bigram stream is the one expensive
    * map stage and is materialized once (the [[lmScore]] pattern); the
    * three count tables (bigram, left-slot, right-slot) are
    * partial-aggregated groupBys over it; the scoring join keys on
    * word-level cardinality (vocabulary-sized, hash-distributed), the
    * 1-row N is a broadcast, and the top-k is a TakeOrdered (no global
    * sort materialization). minCount prunes the long tail BEFORE the
    * scoring joins, which is what keeps the join input collocation-sized
    * rather than corpus-sized.
    */
  def pmiCollocations(
      df: DataFrame,
      textCol: String = "text",
      minCount: Long = 5L,
      topK: Int = 50): DataFrame = {
    val stream = Materialize.index(
      df.select(explode(DedupOps.shingles(textCol, 2)).as("b"))
        .withColumn("w1", expr("split_part(b, ' ', 1)"))
        .withColumn("w2", expr("split_part(b, ' ', 2)")),
      "pmi-bigrams")
    val n = stream.agg(count(lit(1)).as("n"))
    val cb = stream.groupBy("b", "w1", "w2").agg(count(lit(1)).as("cb"))
    val c1 = stream.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = stream.groupBy("w2").agg(count(lit(1)).as("c2"))
    cb.filter(col("cb") >= minCount)
      .join(c1, "w1")
      .join(c2, "w2")
      .crossJoin(broadcast(n)) // 1-row scalar — the broadcast idiom
      .select(
        col("b").as("bigram"),
        col("cb").as("n_pair"),
        // operands cast to double BEFORE multiplying: at corpus scale
        // (N ≈ 10^12 occurrences) cb·N as a long multiplication silently
        // wraps past Long.MaxValue; the double product is exact for all
        // test-scale values (< 2^53) and overflow-free at any scale
        round(log(col("cb").cast("double") * col("n")
          / (col("c1").cast("double") * col("c2"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
  }

  /** Lexical coverage against the corpus's own top-`vocabSize` word
    * vocabulary: per document, token count, out-of-vocabulary count and
    * rate — the cheap "will the tokenizer fragment this?" signal (high
    * OOV → rare-script/noise/code documents that inflate token budgets).
    *
    * Scale shape: the per-occurrence word stream materializes once and
    * feeds both the frequency cut and the per-doc coverage join; the
    * top-k vocabulary cut is a TakeOrdered over the (small) distinct
    * vocabulary, total-ordered by (count desc, word) so the boundary is
    * engine-reproducible; the vocab then BROADCASTS back onto the
    * stream. One expensive map stage, two partial-agg shuffles. */
  def oovRate(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabSize: Int = 1000): DataFrame = {
    val words = Materialize.index(
      df.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("w")),
      "oov-words")
    val vocab = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("known"))
    words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") * 1.0 / col("n_tokens"), 4))
  }

  /** Content-defined chunking (Rabin-style CDC, the dedup-storage /
    * incremental-ingest segmentation): a cut happens after position p
    * whenever the hash of the `window`-char run ending at p lands in the
    * boundary set (first two md5 hex chars clear the `maskBits` high
    * bits → P = 2^-maskBits per position, expected chunk ≈ 2^maskBits
    * chars). Because boundaries depend only on LOCAL content, inserting
    * a byte re-chunks just the neighborhood — unlike fixed-size chunks
    * where one insertion shifts every later boundary — which is the
    * whole point for chunk-level dedup of evolving corpora.
    *
    * Pure zero-shuffle projection: cuts are a higher-order filter over
    * the doc's own positions, chunks explode from the cut list; per-doc
    * work is O(len·window) md5s, embarrassingly parallel, codegen'd.
    * Returns (idCol, chunk_id, chunk_len, chunk_md5) skinny rows. */
  def cdcChunks(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      window: Int = 8,
      maskBits: Int = 6): DataFrame = {
    val thresh = 256 >> maskBits // first-2-hex-char value below this → cut
    // sequence(a, b) DESCENDS when a > b — short docs must short-circuit
    // to an empty cut list, and conv() returns a string, so cast before
    // the numeric compare.
    val cuts = expr(
      s"""CASE WHEN length($textCol) < $window THEN cast(array() AS array<int>)
         |ELSE filter(sequence($window, length($textCol)),
         |  p -> cast(conv(substring(md5(substring($textCol, p - ${window - 1}, $window)), 1, 2), 16, 10) AS int)
         |       < $thresh) END""".stripMargin)
    val chunks = expr(
      s"""transform(sequence(0, size(_cuts)),
         |  i -> substring($textCol,
         |    IF(i = 0, 1, element_at(_cuts, i) + 1),
         |    IF(i = size(_cuts), length($textCol), element_at(_cuts, i + 1))
         |      - IF(i = 0, 0, element_at(_cuts, i))))""".stripMargin)
    df.select(col(idCol), col(textCol))
      .withColumn("_cuts", cuts)
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "chunk")))
      .filter(length(col("chunk")) > 0)
      .select(col(idCol), col("chunk_id"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
  }

  /** Deterministic text normalization — the cheap cleanup every corpus
    * gets before hashing/tokenization: lowercase, non-printable bytes to
    * spaces, whitespace runs collapsed, ends trimmed. RE2-compatible
    * patterns only (no lookarounds), so the identical regexes run in
    * Spark and DuckDB. Pure zero-shuffle projection — scan speed, and
    * the normalized column prunes down to just `textCol`. */
  def normalizeText(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^ -~]", " "), " +", " "))
    df.select(
      col(idCol),
      norm.as("norm_text"),
      length(col(textCol)).cast("long").as("n_chars_raw"),
      length(norm).cast("long").as("n_chars_norm"),
      (norm =!= col(textCol)).as("changed"))
  }

  /** Memorization-risk audit: the most-duplicated word n-grams across
    * the corpus — long verbatim spans appearing in many documents are
    * exactly what a trained model regurgitates (and what boilerplate
    * removal should have caught). One inverted-gram aggregation
    * (exact doc-frequency via partial-dedup count-distinct, occurrence
    * count map-side combined) and a global top-k that compiles to
    * TakeOrdered — no data-sized window, no collect; the full ordering
    * (n_docs, n_occ, gram) makes the cut deterministic under ties.
    * Returns the k worst grams: (gram, n_docs, n_occ). */
  def topDupGrams(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      k: Int = 20): DataFrame =
    docs.select(col(idCol), explode(Dedup.shingles(textCol, n)).as("gram"))
      .groupBy("gram")
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram"))
      .limit(k)
}
