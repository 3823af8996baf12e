package graft

import graft.ops.{Classify, CountMin, Curation, Dedup, Hll, Quantile, Retrieval, Similarity, Skew, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operator queries (dedup / similarity / text
  * analysis / multimodal) with DuckDB oracles over the `documents` and
  * `embeddings` tables. The oracle SQL mirrors each Spark computation
  * construct-for-construct (md5 strings, integer set sizes, double
  * arithmetic in identical order) so results are bit-stable across both
  * engines. Integer-typed outputs are cast to BIGINT on the Spark side to
  * match DuckDB's len()/count() defaults.
  */
object PipelineQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** `documents` with guaranteed core-wide scan parallelism — for queries
    * whose dominant cost is heavy per-row work (md5 shingle loops, LM
    * bigram streams, CDC rolling hashes) that would otherwise run at the
    * single-file local fixture's row-group parallelism (3-14 tasks on 32
    * cores in the r9 bench). [[graft.ops.Materialize.spread]] is a no-op
    * on a many-file lake layout, so at 100 TB no extra shuffle happens. */
  private def td(s: SparkSession, dir: String): DataFrame =
    graft.ops.Materialize.spread(t(s, dir, "documents"))

  // ------------------------------------------------------- text analysis
  def textQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityStats(t(s, dir, "documents"))
      .select(
        col("doc_id"),
        col("n_words").cast("long").as("n_words"),
        col("n_distinct_words").cast("long").as("n_distinct_words"),
        col("distinct_ratio"),
        col("mean_word_len"))
      .orderBy("doc_id")

  /** GD-trained linear quality gate ([[graft.ops.Classify.logisticGd]]):
    * 3 batch rounds over (1, n_words/100, distinct_ratio,
    * mean_word_len/10) toward the curated `src0` label, then every doc
    * scored scan-side with the trained weights as plan literals. The
    * oracle REPLAYS training: unrolled rounds, hard-sigmoid activation,
    * fixed-point gradient sums — the whole loop is engine-exact. */
  def qualityLogreg(s: SparkSession, dir: String): DataFrame = {
    // the feature matrix materializes ONCE: every GD round scans the
    // skinny parquet instead of re-tokenizing the corpus text per round
    val f = graft.ops.Materialize.index(
      TextAnalysis.qualityStats(t(s, dir, "documents"))
        .select(col("doc_id"),
          lit(1.0).as("x0"),
          (col("n_words").cast("double") / lit(100.0)).as("x1"),
          col("distinct_ratio").as("x2"),
          (col("mean_word_len") / lit(10.0)).as("x3"),
          when(col("source") === "src0", lit(1.0)).otherwise(lit(0.0)).as("y")),
      "logreg-feats")
    graft.ops.Classify.logisticGd(f, "doc_id", dims = 4).orderBy("doc_id")
  }

  /** Exact ROC-AUC of the GD quality gate ([[graft.ops.Classify.aucEval]]
    * over [[qualityLogreg]]'s scores) — integer pair counting over the
    * bounded distinct-score grid, engine-exact to the final division. */
  def evalAucQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Classify.aucEval(qualityLogreg(s, dir), "score", "y")

  /** Calibration bins of the GD gate's scores
    * ([[graft.ops.Classify.calibrationBins]]). */
  def evalCalibrationQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Classify.calibrationBins(qualityLogreg(s, dir), "score", "y")
      .orderBy("bin")

  /** F1-optimal threshold for the GD gate
    * ([[graft.ops.Classify.f1Sweep]]). */
  def evalF1SweepQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Classify.f1Sweep(qualityLogreg(s, dir), "score", "y")

  def textLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langScores(t(s, dir, "documents"))
      .select(
        col("doc_id"),
        col("score_de").cast("long").as("score_de"),
        col("score_en").cast("long").as("score_en"),
        col("score_es").cast("long").as("score_es"),
        col("score_fr").cast("long").as("score_fr"),
        col("pred_lang"))
      .orderBy("doc_id")

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(t(s, dir, "documents"))
      .select(col("doc_id"), col("md5_fp"), col("sketch"))
      .orderBy("doc_id")

  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(lower(col("text"))).cast("long").as("bpeish_tokens"))
      .orderBy("doc_id")

  // --------------------------------------------------------------- dedup
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("content_md5")

  /** Verified near-dup pairs (exact Jaccard ≥ 0.5) with MinHash-LSH
    * candidate generation — the shared front half of the pairwise dedup
    * query and the transitive cluster query. */
  private def minhashVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    // spread: a single-row-group input file feeds ONE task, serializing
    // the md5-per-shingle stage; repartition up to core parallelism only
    // when the scan is actually that narrow (no-op on a real lake layout)
    val docs = graft.ops.Materialize.spread(t(s, dir, "documents"))
    // one pass over the corpus computes BOTH the minhash signatures (the
    // expensive 4×md5-per-shingle stage) and the token sets the verify
    // step needs; the combined index is written once and everything
    // downstream (banding, candidate join, verification) reads parquet
    val sigs = Dedup.minhashSignatures(docs, "text", numHashes = 4)
      .withColumn("toks", array_distinct(split(lower(col("text")), " ")))
      .select("doc_id", "h0", "h1", "h2", "h3", "toks")
    val indexed = graft.ops.Materialize.index(sigs, "minhash-sig")
    val bands = Dedup.lshBands(indexed, numHashes = 4, rowsPerBand = 2)
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id", numBands = 2)
    Dedup.verifyPairsTok(pairs, indexed.select("doc_id", "toks"), "doc_id", threshold = 0.5)
  }

  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashVerifiedPairs(s, dir).orderBy("id_a", "id_b")

  /** PageRank over the verified near-dup pair graph
    * ([[graft.ops.Cluster.pageRank]]): 3 synchronous rounds, 8-dp
    * intermediate rounding mirrored by the oracle's unrolled CTEs. */
  def pairGraphRank(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cluster.pageRank(
      minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** PageRank-keeper dedup: compose the cluster closure with
    * [[pairGraphRank]]'s importance scores — within each near-dup
    * cluster the HIGHEST-PageRank member survives
    * ([[graft.ops.Cluster.rankKeepers]]), so dedup keeps the
    * most-referenced copy instead of an arbitrary lowest id. The pair
    * list materializes once and feeds both the closure and the rank
    * iteration. */
  def dedupPagerankKeeper(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ops.Materialize.index(
      minhashVerifiedPairs(s, dir).select("id_a", "id_b"), "prk-pairs")
    val comp = graft.ops.Cluster.dupClusters(pairs).select("doc_id", "cluster")
    val ranks = graft.ops.Cluster.pageRank(pairs)
      .select(col("id").as("doc_id"), col("rank"))
    graft.ops.Cluster.rankKeepers(comp, ranks).orderBy("doc_id")
  }

  /** Transitive near-dup clusters: connected components over the verified
    * pair graph (A~B, B~C ⇒ one cluster). The LSH front half emits edges;
    * [[graft.ops.Cluster]] resolves them to per-document cluster ids with
    * diameter-bounded label propagation — the step that turns pairwise
    * dedup into an actionable keep/drop per document. */
  def dedupCluster(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cluster.dupClusters(minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
      .orderBy("doc_id")

  /** Same clusters via the large-star/small-star contraction — both CC
    * algorithms must agree exactly, so this shares [[dedupCluster]]'s
    * oracle (the judge of record for either is the recursive closure). */
  def dedupClusterStar(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cluster.dupClustersStar(minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
      .orderBy("doc_id")

  /** Leak-free eval-holdout construction — the composed op that CONSUMES
    * the dedup machinery for the most common curation ask: carve a
    * held-out eval set out of the corpus that training can never leak
    * into. The leak unit is the near-dup CLUSTER, not the document: a
    * doc-level split puts a paraphrase of an eval doc in train, so whole
    * verified-near-dup clusters (singletons = their own cluster) are
    * hash-assigned to the eval side atomically (~1/4 by a cluster-rep
    * md5 digit — deterministic, no RNG), quality-gated (Gopher passes:
    * an eval set should be clean text), then cut to a per-source quota
    * by content-hash bottom-k (balanced across sources, reproducible).
    * Docs of an eval cluster NOT selected by the quota are QUARANTINED —
    * they belong to neither side, the rule real pipelines get wrong.
    *
    * The emitted `cross_edges` column — verified near-dup edges from
    * each holdout doc into the TRAIN side — is recomputed by the oracle
    * directly from the pair table, so the driver's hash gate PROVES the
    * zero-leak claim rather than trusting the construction (every edge
    * lives inside one cluster, clusters move atomically, hence 0).
    *
    * Scale shape: the pair→cluster lineage is PLAN-IDENTICAL to
    * `dedup_cluster`'s (content-addressed index cache shares the
    * signature/band/verify work in-battery); assignment and the quality
    * gate are scan-side on the eval subset; the quota is the two-phase
    * per-key top-k; the audit joins skinny (id, id) edges against the
    * holdout ids. */
  def pipelineMakeEvalHoldout(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = minhashVerifiedPairs(s, dir).select("id_a", "id_b")
    val comp = graft.ops.Cluster.dupClusters(pairs).select("doc_id", "cluster")
    val withCluster = docs.select("doc_id", "text", "source")
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    val isEval =
      expr("conv(substring(md5(concat(CAST(cluster AS STRING), 'holdout')), 1, 1), 16, 10)")
        .cast("int") < 4
    val evalSide = withCluster.filter(isEval)
    val passing = TextAnalysis.gopherSignals(evalSide).filter(col("passes"))
      .select("doc_id", "source", "cluster")
    val ranked = Retrieval.topKPerKey(
      passing.withColumn("rk",
        md5(concat(col("doc_id").cast("string"), lit("hrank")))),
      Seq("source"), Seq(col("rk").asc, col("doc_id").asc), 5)
      .select(col("doc_id"), col("source"), col("cluster"), col("rank").as("rn"))
    val trainIds = withCluster.filter(!isEval).select(col("doc_id").as("other"))
    val edges = pairs.select(col("id_a").as("doc_id"), col("id_b").as("other"))
      .unionByName(pairs.select(col("id_b").as("doc_id"), col("id_a").as("other")))
    val cross = edges.join(trainIds, "other")
      .groupBy("doc_id").agg(count(lit(1)).as("cross_edges"))
    ranked.join(cross, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("cluster"), col("rn"),
        coalesce(col("cross_edges"), lit(0L)).as("cross_edges"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling: per-stratum rates from a
    * broadcast dimension, membership by a content-derived hash digit —
    * reproducible across runs/engines (no RNG), zero shuffles (the only
    * wide op would be the rates join, and it broadcasts). The same
    * mechanic at 100 TB: rate table to every executor, scan-side filter,
    * sampled subset never materializes the rejected rows. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // keep16 = hex-digit threshold: lang keeps digit(md5(doc_id)) < keep16,
    // i.e. en 1/8, de+es 1/4, fr+zh 1/2 of rows
    val rates = Seq(("en", 2), ("de", 4), ("es", 4), ("fr", 8), ("zh", 8))
      .toDF("lang", "keep16")
    t(s, dir, "documents")
      .join(broadcast(rates), Seq("lang"))
      .filter(expr(
        "instr('0123456789abcdef', substring(md5(cast(doc_id AS string)), 1, 1)) - 1")
        < col("keep16"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Per-document SimHash fingerprint at the 64-bit production width
    * (the same signature [[dedupSimhashHamming]] buckets on), computed
    * via the codegen explode+partial-agg form. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash64Agg(td(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** SimHash near-dup PAIRS within hamming distance 2 over 64-bit
    * fingerprints via Manku 3-block candidate keys
    * ([[graft.ops.Dedup.simhashHammingPairs]]) — block buckets, never
    * all-pairs; the ORACLE is the all-pairs closure, so a missed true
    * pair can't hide. */
  def dedupSimhashHamming(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashHammingPairs(td(s, dir), "doc_id", "text")
      .orderBy("id_a", "id_b")

  /** Okapi BM25 of the corpus against a fixed probe query
    * ([[graft.ops.Retrieval.bm25]]): scan-side term pruning, broadcast
    * df/stats, TakeOrdered top-k on the rounded score. */
  def bm25Retrieval(s: SparkSession, dir: String): DataFrame =
    Retrieval.bm25(t(s, dir, "documents"), "doc_id", "text",
      terms = Seq("table", "query", "spark"))

  /** The same BM25 probe served FROM the materialized postings index
    * ([[graft.ops.Retrieval.bm25FromIndex]]): the corpus is tokenized
    * once into (term, doc, tf) + doc-length parquet, and the query reads
    * only its terms' postings via a pushed `tok IN` scan filter — shares
    * [[bm25Retrieval]]'s oracle because the scoring core is the same
    * code path on exactly equal inputs. */
  def bm25Indexed(s: SparkSession, dir: String): DataFrame = {
    val (postings, doclens) =
      Retrieval.postingsIndex(t(s, dir, "documents"), "doc_id", "text")
    Retrieval.bm25FromIndex(
      graft.ops.Materialize.index(postings, "bm25-postings"),
      graft.ops.Materialize.index(doclens, "bm25-doclens"),
      "doc_id", terms = Seq("table", "query", "spark"))
  }

  /** Pseudo-relevance feedback retrieval
    * ([[graft.ops.Retrieval.bm25Prf]]): seed probe → top-3 feedback
    * docs → top-5 TF-IDF expansion terms → re-retrieval, all off the
    * postings index. */
  def retrievalPrf(s: SparkSession, dir: String): DataFrame = {
    val (postings, doclens) =
      Retrieval.postingsIndex(t(s, dir, "documents"), "doc_id", "text")
    Retrieval.bm25Prf(
      graft.ops.Materialize.index(postings, "prf-postings"),
      graft.ops.Materialize.index(doclens, "prf-doclens"),
      "doc_id", seed = Seq("table", "query", "spark"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Gate-agreement eval: Cohen's kappa between the Gopher quality gate
    * and the repetition gate — do two independent heuristics flag the
    * same documents, or is each catching different garbage? Counts are
    * exact longs from one join of the two scan-side gate projections;
    * kappa's divisions happen once, at the end, in identical expression
    * order in both engines. One output row
    * (n11, n10, n01, n00, po, kappa). */
  def evalGateAgreement(s: SparkSession, dir: String): DataFrame = {
    // both gates are scan-side projections — compose them over ONE corpus
    // scan (same fusion as [[gateEnsemble]]); the id join the previous
    // shape paid becomes corpus-sized sort-merge work at scale for a
    // query whose true cost is one pass and a 1-row aggregate
    val docs = graft.ops.Materialize.spread(t(s, dir, "documents"))
    graft.ops.TextAnalysis.repetitionSignals(
        graft.ops.TextAnalysis.gopherSignals(docs))
      .select(col("passes").as("a"), col("keep").as("b"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
      .withColumn("po", (col("n11") + col("n00")) / col("n"))
      .withColumn("pa", (col("n11") + col("n10")) / col("n"))
      .withColumn("pb", (col("n11") + col("n01")) / col("n"))
      .withColumn("pe",
        col("pa") * col("pb") + (lit(1.0) - col("pa")) * (lit(1.0) - col("pb")))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        round(col("po"), 4).as("po"),
        // degenerate gates (pe = 1: both constant) make kappa 0/0 — null,
        // consistently in both engines, instead of a NaN/NULL fork
        when(lit(1.0) - col("pe") === 0.0, lit(null).cast("double"))
          .otherwise(round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 4))
          .as("kappa"))
  }

  /** Retrieval ranking-quality eval: ln-discounted nDCG@10 and MRR of
    * the BM25 ranking against term-coverage relevance (gain = number of
    * distinct probe terms a doc contains, 0–3). Both metric inputs are
    * bounded lists (the top-10 ranking and the ideal top-10), every
    * discounted contribution rounds to 6 dp and sums as fixed-point
    * longs, so the metric is engine-exact; the relevance scan is one
    * corpus pass with the gain computed scan-side. */
  def evalNdcg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("table", "query", "spark")
    val docs = t(s, dir, "documents")
    val gains = docs.select(col("doc_id"),
      terms.map(tm =>
        when(array_contains(split(lower(col("text")), " "), tm), 1L).otherwise(0L))
        .reduce(_ + _).as("gain"))
    val wAll = Window.orderBy(col("score").desc, col("doc_id"))
    val ranked = Retrieval.bm25(docs, "doc_id", "text", terms, topK = 10)
      .withColumn("rank", row_number().over(wAll))
    val contrib = ranked.join(gains, "doc_id")
      .select(col("rank"), col("gain"),
        round(round(col("gain") / log(col("rank") + lit(1.0)), 6) * lit(1e6), 0)
          .cast("long").as("cfx"))
    val dcg = contrib.agg(sum("cfx").as("dcgfx"),
      min(when(col("gain") > 0, col("rank"))).as("first_rel"),
      sum(when(col("gain") > 0, 1L).otherwise(0L)).as("n_rel"))
    val wIdeal = Window.orderBy(col("gain").desc, col("doc_id"))
    val idcg = gains.orderBy(col("gain").desc, col("doc_id")).limit(10)
      .withColumn("irank", row_number().over(wIdeal))
      .select(round(round(col("gain") / log(col("irank") + lit(1.0)), 6) * lit(1e6), 0)
        .cast("long").as("ifx"))
      .agg(sum("ifx").as("idcgfx"))
    dcg.crossJoin(idcg)
      .select(
        // no relevant docs at all → ideal DCG 0 → define ndcg as null
        // (not NaN) so both engines agree on the degenerate corpus
        when(col("idcgfx") === 0L, lit(null).cast("double"))
          .otherwise(round(col("dcgfx").cast("double") / col("idcgfx"), 4))
          .as("ndcg10"),
        coalesce(round(lit(1.0) / col("first_rel"), 4), lit(0.0)).as("mrr"),
        col("n_rel"))
  }

  /** Incremental index maintenance proof
    * ([[graft.ops.Retrieval.mergeIndex]]): the corpus indexed as two
    * disjoint delta batches, monoid-merged, then probed — shares
    * [[bm25Retrieval]]'s oracle because the merged index must be
    * bit-equal to the from-scratch build. */
  def indexIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val a = Retrieval.postingsIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val b = Retrieval.postingsIndex(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    val (p, l) = Retrieval.mergeIndex(a, b)
    Retrieval.bm25FromIndex(
      graft.ops.Materialize.index(p, "incr-postings"),
      graft.ops.Materialize.index(l, "incr-doclens"),
      "doc_id", terms = Seq("table", "query", "spark"))
  }

  /** Night-0 retrieval-index store (same lifecycle rationale as
    * [[manifestStandingStore]]): index the base corpus — the only
    * corpus-sized tokenize AND the only corpus-sized write. */
  private def retrievalStandingStore(s: SparkSession, dir: String): String =
    standingStore("retridx", dir) { root =>
      val (p, l) = Retrieval.postingsIndex(
        t(s, dir, "documents").filter(col("doc_id") % 3 === 0), "doc_id", "text")
      graft.ops.StandingState.writeTables(root, Seq(
        graft.ops.StandingState.TableSpec("postings", p, "tok"),
        graft.ops.StandingState.TableSpec("doclens", l, "doc_id")))
    }

  /** PERSISTED nightly retrieval-index maintenance — the
    * [[pipelineAssetManifestNightly]] seam applied to the SECOND
    * incremental family, proving [[graft.ops.StandingState]] generalizes:
    * the standing (postings, doclens) tables live in a snapshot store
    * behind the same tamper witness, night 0 indexes the base corpus,
    * and each nightly ingest tokenizes ONLY its delta and APPENDS its
    * (tok, doc, tf) partition — nightly arrivals are NEW docs, so the
    * per-(tok, doc) tf rows are disjoint across nights and the union of
    * partitions IS the [[graft.ops.Retrieval.mergeIndex]] monoid fold
    * (tf/dl sum over disjoint keys — batch granularity provably
    * irrelevant), with zero standing rows rewritten. TWO nights chain;
    * BM25 then serves FROM the persisted night-2 snapshot, and the
    * oracle is the same full-corpus BM25 replay as
    * `bm25_indexed`/`index_incremental` — bit-equality proves the
    * chained on-disk index ≡ a from-scratch build.
    *
    * Scale shape: every postings partition is range-clustered on `tok`,
    * so the serving-side `isin` term filter prunes files by footer
    * min/max in each night's partition independently; nightly write
    * volume is the delta index only; nothing re-reads (or rewrites)
    * yesterday's data. */
  def retrievalIndexNightly(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.StandingState
    import graft.ops.StandingState.TableSpec
    val docs = t(s, dir, "documents")
    val store = retrievalStandingStore(s, dir)
    // recurring-run retention: refold from the standing night-0 snapshot
    StandingState.rollbackTo(s, store, 0L)
    def ingest(delta: DataFrame): Unit = {
      val (p, l) = Retrieval.postingsIndex(delta, "doc_id", "text")
      StandingState.appendTables(store, Seq(
        TableSpec("postings", p, "tok"), TableSpec("doclens", l, "doc_id")))
      ()
    }
    ingest(docs.filter(col("doc_id") % 3 === 1))
    val night1 = StandingState.latestSnapshot(s, store)
    ingest(docs.filter(col("doc_id") % 3 === 2))
    // superseded night: one witness file retires; its partitions survive
    // by reference from night 2
    StandingState.retireSnapshot(s, store, night1)
    // serving: the witness's per-file `tok` zone maps select only the
    // postings files holding a query term (metadata-only file pruning);
    // bm25FromIndex's isin predicate then prunes row groups within them
    val terms = Seq("table", "query", "spark")
    Retrieval.bm25FromIndex(
      StandingState.readTablePruned(s, store, "postings", terms),
      StandingState.readTable(s, store, "doclens"),
      "doc_id", terms)
  }

  /** Snapshot diff between two corpus versions — the CDC-style audit a
    * lake pipeline runs before re-processing: per doc id,
    * added / removed / changed / unchanged, decided by content hash
    * over a single full-outer join on the id. Versions derive
    * deterministically from the one documents table (old = all but
    * src4; new = all but src0, docs ≡ 0 mod 10 "revised"), so the
    * oracle replays both sides exactly. Scale: two scans + one id-keyed
    * join; hashes compare scan-side — no text ever shuffles. */
  def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val old = docs.filter(col("source") =!= "src4")
      .select(col("doc_id"), md5(col("text")).as("h_old"))
    val neu = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"),
        md5(when(col("doc_id") % 10 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text"))).as("h_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .orderBy("doc_id")
  }

  /** Capped inverted-index build ([[graft.ops.Retrieval.invertedIndex]]):
    * champion postings lists bounded BEFORE any array materializes. */
  def invertedIndexQ(s: SparkSession, dir: String): DataFrame =
    Retrieval.invertedIndex(t(s, dir, "documents"), "doc_id", "text")

  /** Batched multi-query BM25 ([[graft.ops.Retrieval.bm25Batch]]): three
    * probe queries — one stop-wordy on purpose — scored in ONE pass over
    * the postings index, per-query top-5 via the two-phase cap. */
  def bm25BatchQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (postings, doclens) =
      Retrieval.postingsIndex(t(s, dir, "documents"), "doc_id", "text")
    val queries = Seq(
      (1L, "table"), (1L, "query"),
      (2L, "spark"), (2L, "data"),
      (3L, "the"), (3L, "of")).toDF("query_id", "tok")
    Retrieval.bm25Batch(
      graft.ops.Materialize.index(postings, "bm25b-postings"),
      graft.ops.Materialize.index(doclens, "bm25b-doclens"),
      "doc_id", queries)
      .orderBy("query_id", "rank")
  }

  /** Hybrid retrieval ([[graft.ops.Retrieval.rrfFuse]]): reciprocal-rank
    * fusion of the sparse BM25 top-20 and the dense brute-cosine top-20
    * around probe vector 0 (embeddings and documents share ids) — the
    * standard sparse+dense combiner for quality-biased corpus sampling.
    * The post-limit rank windows run over 20 rows, not the corpus. */
  def retrievalHybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = Retrieval.bm25(t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("table", "query", "spark"), topK = 20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "rank")
    val emb = t(s, dir, "embeddings")
    val dense = Similarity.bruteForceTopK(
        corpus = emb, queries = emb.filter(col("vec_id") === 0),
        idCol = "vec_id", vecCol = "embedding", k = 20)
      .select(col("corpus_id").as("doc_id"), col("rank"))
    Retrieval.rrfFuse(Seq(sparse, dense), "doc_id")
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  /** Weekly cohort retention over the event stream
    * ([[graft.ops.Sessionize.cohortRetention]]). */
  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.cohortRetention(t(s, dir, "events"), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")

  /** Rolling 7-day active users ([[graft.ops.Sessionize.rollingActive]]):
    * the sliding distinct-count series via coverage explode, never a
    * per-frame distinct window. */
  def rollingActiveQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.rollingActive(t(s, dir, "events"), "user_id", "ts")
      .orderBy("day")

  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramVerifiedPairs(s, dir).orderBy("id_a", "id_b")

  private def ngramVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.ops.Materialize.spread(t(s, dir, "documents"))
    // n-gram = word BIGRAM sets: char-3-grams of same-language prose share
    // a tiny alphabet, so their baseline Jaccard sits at ~0.43 on this
    // corpus — a 0.5 threshold over them selects a third of ALL pairs,
    // O(n²) output by construction. Word-bigram baseline is ~0.02 with
    // true near-dups ≥ 0.5, a real discriminator.
    // Candidates via minhash-LSH banding over the bigram sets — the
    // blocking key (band hash) is high-cardinality and grows with the
    // corpus, unlike a static (lang, source, length-bucket) key whose
    // fixed block count makes in-block pairs O(n²/blocks) at 100 TB.
    // One corpus pass computes gram sets + 4 gram-minhashes into an index;
    // banding, the candidate self-join, and the exact-Jaccard verify all
    // read that parquet. The index stores 16-hex-char md5 PREFIXES of the
    // grams, not the gram text: set intersection/union cardinalities are
    // preserved (64-bit hashes; collisions negligible) while the verify
    // join shuffles fixed-width hashes instead of corpus-sized bigram
    // strings — at 100 TB the gram text would otherwise move twice.
    val grams = docs.select(
      col("doc_id"),
      array_distinct(Dedup.shingles("text", 2)).as("grams"))
    val sigs = (0 until 4).foldLeft(grams) { (d, i) =>
      d.withColumn(s"g$i",
        expr(s"array_min(transform(grams, g -> md5(concat('gsalt$i|', g))))"))
    }.withColumn("grams", expr("transform(grams, g -> substring(md5(g), 1, 16))"))
    val indexed = graft.ops.Materialize.index(sigs, "ngram-sig")
    val bands = indexed.select(col("doc_id"),
      md5(concat_ws("|", col("g0"), col("g1"))).as("band0"),
      md5(concat_ws("|", col("g2"), col("g3"))).as("band1"))
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id", numBands = 2)
    // per-pair verify = codegen'd sorted-merge intersection count (sort
    // once at the doc-sized gram table, |A∪B| = |A|+|B|−i), over the
    // bijective hex→long re-encode ([[graft.ops.Dedup.hex16ToLongs]]):
    // counts and sizes — and therefore every verified jaccard — are
    // exactly the string domain's, at one long compare per merge step
    val sortedG = indexed.select(col("doc_id"),
      sort_array(Dedup.hex16ToLongs(col("grams"))).as("grams"))
    pairs
      .join(sortedG.select(col("doc_id").as("id_a"), col("grams").as("ga")), "id_a")
      .join(sortedG.select(col("doc_id").as("id_b"), col("grams").as("gb")), "id_b")
      .withColumn("_i", Dedup.sortedIntersectCount(col("ga"), col("gb")).cast("double"))
      .withColumn("jac", round(
        col("_i") / (size(col("ga")) + size(col("gb")) - col("_i")), 4))
      .filter(col("jac") >= 0.5)
      .select("id_a", "id_b", "jac")
  }

  /** Recall@5 of the LSH ANN against brute-force ground truth — the
    * evaluation loop every approximate index needs before it replaces the
    * exact path. Both sides are deterministic, so the metric itself is
    * oracle-checkable; at production scale the brute side runs on a
    * sampled query set (here the standard 10-query panel). */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val brute = embedKnnBrute(s, dir).select("query_id", "corpus_id")
    val lsh = embedKnnLsh(s, dir)
      .select(col("query_id"), col("corpus_id"), lit(1).as("hit"))
    brute.join(lsh, Seq("query_id", "corpus_id"), "left")
      .groupBy("query_id")
      .agg(round(count(col("hit")).cast("double") / count(lit(1)), 4).as("recall"))
      .orderBy("query_id")
  }

  /** PII scrubbing: mask email-shaped and long-digit-run substrings,
    * count what was masked. Pure codegen'd projections (regex at scan
    * speed, zero shuffles) — the pattern set is the pluggable part, the
    * plumbing is what scales. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val longNum = "[0-9]{4,}"
    t(s, dir, "documents").select(
      col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit(email), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(longNum), lit(0)))
        .cast("long").as("n_longnums"),
      regexp_replace(
        regexp_replace(lower(col("text")), email, "<EMAIL>"),
        longNum, "<NUM>").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: src0 plays the eval suite, everything
    * else is the training corpus; flag trainers whose word-8-gram overlap
    * with ANY benchmark doc exceeds 20%. Short grams false-positive once
    * the benchmark grows (a 3-gram set over this corpus's vocabulary
    * blankets 98% of sf0.1 — measured), which is why production
    * decontamination uses 8-13-gram windows; 8 here flags only true
    * leaks at every SF. See [[TextAnalysis.contamination]] for the scale
    * shape (hashed grams, broadcast benchmark, one groupBy). */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.contamination(
      train = docs.filter(col("source") =!= "src0"),
      bench = docs.filter(col("source") === "src0"),
      shingleWords = 8)
      .orderBy("doc_id")
  }

  /** Gopher-style rule-based quality gate signals (one scan, zero
    * shuffles; see [[TextAnalysis.gopherSignals]]). */
  def qualityGopher(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherSignals(t(s, dir, "documents"))
      .select("doc_id", "n_words", "mean_word_len", "stop_frac",
        "symbol_ratio", "max_tok_frac", "passes")
      .orderBy("doc_id")

  /** Deterministic per-stratum uniform sample WITHOUT replacement: the k
    * smallest content-hash ranks per source — a bottom-k / reservoir
    * sample that is reproducible across engines and runs. The cut is
    * [[graft.ops.Retrieval.topKPerKey]]: with a handful of strata a
    * plain per-source window would funnel corpus/strata rows through
    * one task; the two-phase cap bounds it at k · partitions. */
  def sampleReservoir(s: SparkSession, dir: String): DataFrame =
    Retrieval.topKPerKey(
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(concat(col("doc_id").cast("string"), lit("rsv"))).as("rk")),
      Seq("source"), Seq(col("rk").asc, col("doc_id").asc), 3)
      .select(col("doc_id"), col("source"), col("rank").as("rn"))
      .orderBy("doc_id")

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * per document a deterministic uniform u from md5, key = ln(u)/w with
    * w = n_chars (u^(1/w) order-equivalently) — the top keys per source
    * are a weight-proportional sample, the quality-weighted corpus
    * sampling primitive. Zero-shuffle key computation; the per-source
    * cut is the two-phase [[graft.ops.Retrieval.topKPerKey]] (same
    * hot-stratum reasoning as [[sampleReservoir]]). */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val v = conv(substring(
      md5(concat(col("doc_id").cast("string"), lit("wsmp"))), 1, 12), 16, 10)
      .cast("double")
    val u = (v + lit(1.0)) / lit(281474976710657.0) // (16^12)+1: u ∈ (0,1]
    Retrieval.topKPerKey(
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          (log(u) / col("n_chars")).as("skeyRaw")),
      Seq("source"), Seq(col("skeyRaw").desc, col("doc_id").asc), 3)
      .select(col("doc_id"), col("source"),
        round(col("skeyRaw"), 6).as("skey"), col("rank").as("rn"))
      .orderBy("doc_id")
  }

  /** Data-mixture planner: per-language sampling rates that hit a target
    * mixture given the corpus's actual shares. The whole computation is
    * one partial-aggregated groupBy to a 5-row table — the planning side
    * of [[sampleStratified]], which then applies such rates scan-side. */
  def mixPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val target = Seq(("en", 0.30), ("de", 0.20), ("es", 0.20),
      ("fr", 0.20), ("zh", 0.10)).toDF("lang", "target_share")
    val counts = t(s, dir, "documents").groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
    counts
      .crossJoin(counts.agg(sum("n_docs").as("total")))
      .join(broadcast(target), "lang")
      .select(
        col("lang"),
        col("n_docs"),
        round(col("n_docs").cast("double") / col("total"), 4).as("share"),
        col("target_share"),
        round(least(lit(1.0), col("target_share") /
          (col("n_docs").cast("double") / col("total"))), 4).as("sample_rate"))
      .orderBy("lang")
  }

  /** Epoch scheduling for a training mixture: given per-language token
    * inventories and target shares, the repeat factor (epochs) each
    * language needs to fill its slice of a fixed token budget — the
    * up-sampling complement of [[mixPlan]]'s down-sampling rates
    * (epochs > 1 means the slice repeats data, the number a mixture
    * designer watches for memorization risk). One aggregation over the
    * scan-side token count, then a broadcast target join. */
  def mixEpochs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = 200000L
    val target = Seq(("en", 0.30), ("de", 0.20), ("es", 0.20),
      ("fr", 0.20), ("zh", 0.10)).toDF("lang", "target_share")
    t(s, dir, "documents")
      .select(col("lang"),
        size(split(lower(col("text")), " ")).cast("long").as("nt"))
      .groupBy("lang").agg(sum("nt").as("tokens"))
      .join(broadcast(target), "lang")
      .select(col("lang"), col("tokens"), col("target_share"),
        round(lit(budget) * col("target_share"), 0).cast("long").as("budget_tokens"),
        round(lit(budget) * col("target_share") / col("tokens"), 4).as("epochs"),
        (lit(budget) * col("target_share") / col("tokens") > 1.0).as("repeats"))
      .orderBy("lang")
  }

  /** Near-dup cluster-size distribution: how many clusters of each size
    * the transitive closure produced and how many documents they hold —
    * the shape that says whether dedup is trimming boilerplate families
    * (many small clusters) or collapsing a template explosion (few
    * giant ones). Two bounded aggregations off the shared closure. */
  def dedupClusterStats(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cluster.dupClusters(
      minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
      .select("cluster", "csize").distinct()
      .groupBy("csize").agg(count(lit(1)).as("n_clusters"))
      .select(col("csize"), col("n_clusters"),
        (col("csize") * col("n_clusters")).as("n_docs"))
      .orderBy("csize")

  /** Int8 symmetric quantization of the embedding column + reconstruction
    * quality — the compression step before an ANN index ships. Pure
    * per-row array arithmetic (codegen'd HOFs, zero shuffles); the
    * explicit floor(x + 0.5) makes the rounding bit-identical across
    * engines. */
  def embedQuantize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("scale",
        expr("greatest(array_max(transform(v, x -> abs(x))), 1e-12d) / 127.0d"))
      .withColumn("q",
        expr("transform(v, x -> cast(floor(x / scale + 0.5d) AS int))"))
      .withColumn("dq", expr("transform(q, x -> x * scale)"))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale"),
        expr("aggregate(q, 0L, (a, x) -> a + abs(x))").as("q_l1"),
        round(Similarity.cosine(col("v"), col("dq")), 4).as("cos_recon"))
      .orderBy("vec_id")

  /** Interval join via [[graft.ops.RangeJoin]]: every click inside the
    * hour before a same-user purchase (attribution window). The bucketed
    * encoding keeps it an equi-join; the oracle is the plain BETWEEN
    * inequality join, so the rewrite is proven pair-exact. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("cus"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        (unix_micros(col("ts")) - hourUs).as("lo"), unix_micros(col("ts")).as("hi"))
    graft.ops.RangeJoin.bucketedRangeJoin(
        clicks, purchases, key = "user_id",
        ptCol = "cus", loCol = "lo", hiCol = "hi", bucketWidth = hourUs)
      .select("click_id", "purchase_id")
      .orderBy("click_id", "purchase_id")
  }

  /** The SAME range join written as plain declarative SQL, binned
    * automatically by the conf-gated [[graft.plans.RangeJoinRewrite]]
    * optimizer rule — the author writes BETWEEN, the plan gets the
    * bucketed equi-join. Hash-matching the same oracle as [[rangeJoin]]
    * proves the rewrite end-to-end through the driver gate. */
  def rangeJoinAuto(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    // The width conf arms RangeJoinRewrite for EVERY join optimized while
    // it is set — so scope it: set, run the rewritten join to a
    // materialized table inside the try, restore in the finally. Returning
    // a lazy plan and unsetting would disarm the rewrite before the driver
    // ever executes it; leaving it set would silently re-bin every later
    // BETWEEN join on the shared session (ADVICE r5).
    s.conf.set(graft.plans.RangeJoinRewrite.WidthConf, (3600L * 1000000L).toString)
    try {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          unix_micros(col("ts")).as("cus"))
        .createOrReplaceTempView("rj_clicks")
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
          unix_micros(col("ts")).as("pus"))
        .createOrReplaceTempView("rj_purchases")
      val joined = s.sql(
        """SELECT click_id, purchase_id FROM rj_clicks JOIN rj_purchases
          |ON cu = pu AND cus BETWEEN pus - 3600000000 AND pus""".stripMargin)
      graft.ops.Materialize.index(joined, "rangejoin-auto")
        .orderBy("click_id", "purchase_id")
    } finally s.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
  }

  /** Gap-based sessionization of the event stream's archive side
    * ([[graft.ops.Sessionize]]; 6-hour inactivity gap): per-session
    * bounds, counts, duration. */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.sessions(t(s, dir, "events"),
        key = "user_id", tsCol = "ts", idCol = "event_id", gapSeconds = 21600)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_ts"), col("end_ts"), col("duration_sec"))
      .orderBy("user_id", "session_idx")

  /** Sequence packing (concat-and-split): documents concatenated per
    * language in doc-id order, split into 512-token context windows; each
    * doc reports the pack it starts in and its offset there. One window
    * pass per language — the deterministic prep step that turns a corpus
    * into fixed-length training sequences. */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(lower(col("text")), " ")).cast("long").as("n_toks"))
      .withColumn("cum", sum("n_toks").over(w))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        expr("(cum - n_toks) div 512").as("pack_id"),
        ((col("cum") - col("n_toks")) % 512).as("offset_in_pack"))
      .orderBy("doc_id")
  }

  /** Corpus-level TF-IDF: top-3 characteristic terms per source. Two
    * partial-aggregated shuffles (term frequencies, document frequencies)
    * + a broadcast of the 1-row source count — nothing corpus-sized moves
    * twice. ln() is not IEEE-exactly specified, but the 4-digit round
    * makes both engines agree unless a value sits on a .00005 boundary of
    * the ~20 distinct idf inputs here. */
  def tfidfTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val terms = docs.select(col("source"),
      explode(split(lower(col("text")), " ")).as("tok"))
    val tf = terms.groupBy("source", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nsrc = docs.agg(countDistinct("source").as("nsrc"))
    val scored = tf.join(dfreq, "tok")
      .crossJoin(broadcast(nsrc))
      .withColumn("tfidf",
        round(col("tf") * log(col("nsrc").cast("double") / col("df")), 4))
    // per-source cut via the two-phase top-k: the vocabulary of one
    // source is corpus-sized at scale — never one window task's input
    Retrieval.topKPerKey(scored, Seq("source"),
        Seq(col("tfidf").desc, col("tok").asc), 3)
      .select("source", "tok", "tf", "df", "tfidf")
      .orderBy("source", "tok")
  }

  /** Write-side compaction round-trip ([[graft.ops.Layout]]): rewrite the
    * docs table range-clustered on (lang, doc_id) at a fixed file grain,
    * read it back — the oracle (a plain SELECT of the source) proves the
    * rewrite is content-lossless while LayoutSpec pins the file grain and
    * the disjoint zone-map ranges. */
  def layoutCompact(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select("doc_id", "lang", "source", "n_chars")
    graft.ops.Layout.compact(docs,
        graft.ops.Materialize.scratchDir("compacted"),
        targetRowsPerFile = 200, clusterCols = Seq("lang", "doc_id"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------- similarity
  def embedKnnBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(
      corpus = emb, queries = emb.filter(col("vec_id") < 10),
      idCol = "vec_id", vecCol = "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  /** Scale-path ANN: multi-band LSH (2 bands × 4 planes, per-bucket cap).
    * Oracle-checked: the md5-derived hyperplane constants are baked into
    * the DuckDB SQL as double literals (Double.toString round-trips), so
    * both engines compute identical buckets, candidates, and ranks. */
  def embedKnnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopK(
      corpus = emb, queries = emb.filter(col("vec_id") < 10),
      idCol = "vec_id", vecCol = "embedding", dim = 64, k = 5,
      numPlanes = LshPlanesPerBand, numBands = LshBands, bucketCap = LshBucketCap)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  /** IVF-bucketed ANN (scale path #2). Oracle-checked: the deterministic
    * centroid selection (every 7th of the first 112 vectors by id) is
    * replicated in SQL, so centroids, cell assignment, probe lists, and
    * ranks all match bit-for-bit. */
  def embedKnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(
      corpus = emb, queries = emb.filter(col("vec_id") < 10),
      idCol = "vec_id", vecCol = "embedding", k = 5,
      numCentroids = IvfCentroids, nprobe = IvfProbes)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  /** Night-0 ANN store (same lifecycle rationale as
    * [[manifestStandingStore]]): seed IVF centroids from the base
    * embedding corpus (deterministic stride sampling) and assign every
    * base vector — the only corpus-sized assignment pass. */
  private def annStandingStore(s: SparkSession, dir: String): String =
    standingStore("annivf", dir) { root =>
      graft.ops.AnnIndex.bootstrap(
        t(s, dir, "embeddings").filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", IvfCentroids, root)
    }

  /** PERSISTED nightly ANN-index maintenance — the FOURTH family through
    * the [[graft.ops.StandingState]] seam (manifest state, retrieval
    * index, decontamination ledger, now the IVF index): standing
    * centroids + cells live in a snapshot store behind the tamper
    * witness; each nightly ingest assigns ONLY its delta vectors against
    * the standing centroids (broadcast join — exact by construction,
    * since a vector's nearest centroid is independent of every other
    * vector) and APPENDS the delta cells partition. TWO nights chain
    * (delta₁ = ids ≡ 0 mod 10, delta₂ = ids ≡ 5 mod 10 — each ~10% of
    * the index, under the [[graft.ops.AnnIndex.ingest]] drift gate by
    * construction, so the deterministic base seeding persists); ANN
    * top-k then serves FROM the persisted night-2 snapshot, and the
    * oracle replays centroid seeding over the base predicate + full
    * cell assignment + probes from scratch — equality proves the
    * chained on-disk index ≡ a from-scratch build. */
  def embedKnnIvfNightly(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val store = annStandingStore(s, dir)
    // recurring-run retention: refold from the standing night-0 snapshot
    graft.ops.StandingState.rollbackTo(s, store, 0L)
    graft.ops.AnnIndex.ingest(
      emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", store)
    val night1 = graft.ops.StandingState.latestSnapshot(s, store)
    graft.ops.AnnIndex.ingest(
      emb.filter(col("vec_id") % 10 === 5), "vec_id", "embedding", store)
    graft.ops.StandingState.retireSnapshot(s, store, night1) // superseded night
    graft.ops.AnnIndex.topK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, store, nprobe = IvfProbes)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  /** Night-0 PQ store: learn codebooks from the base embedding corpus
    * and code every base vector — the once-ever corpus-sized pass
    * (same lifecycle rationale as [[annStandingStore]]). */
  private def annPqStandingStore(s: SparkSession, dir: String): String =
    standingStore("annpq", dir) { root =>
      graft.ops.AnnIndex.bootstrapPq(
        t(s, dir, "embeddings").filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", root, m = PqM, subDim = PqSubDim, k = PqK)
    }

  /** PERSISTED nightly PQ-index maintenance — the compressed half of
    * IVFADC through the [[graft.ops.StandingState]] seam: standing
    * per-subspace codebooks (broadcastable) + per-vector codes (id and
    * m small ints — the ~4-byte/vector layout that makes an exhaustive
    * ADC scan feasible where the raw corpus is hundreds of TB) live in
    * a snapshot store behind the tamper witness. Each nightly ingest
    * codes ONLY its delta against the standing codebooks (broadcast
    * join — exact per vector by construction) and APPENDS the code
    * partition; the same two-night chain as [[embedKnnIvfNightly]]
    * (deltas ≡ 0 and ≡ 5 mod 10, sub-gate by construction so the
    * base-seeded codebooks persist). Serving is ADC shortlist + exact
    * rerank FROM the persisted night-2 snapshot — the code scan carries
    * no raw vectors (plan-pinned) — and the oracle replays codebook
    * seeding over the base predicate + full coding + ADC + rerank from
    * scratch: equality proves the chained on-disk PQ index ≡ a
    * from-scratch build. */
  def embedKnnPqNightly(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val store = annPqStandingStore(s, dir)
    // recurring-run retention: refold from the standing night-0 snapshot
    graft.ops.StandingState.rollbackTo(s, store, 0L)
    graft.ops.AnnIndex.ingestPq(
      emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", store,
      m = PqM, subDim = PqSubDim)
    val night1 = graft.ops.StandingState.latestSnapshot(s, store)
    graft.ops.AnnIndex.ingestPq(
      emb.filter(col("vec_id") % 10 === 5), "vec_id", "embedding", store,
      m = PqM, subDim = PqSubDim)
    graft.ops.StandingState.retireSnapshot(s, store, night1) // superseded night
    graft.ops.AnnIndex.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, store, shortlist = 50,
        m = PqM, subDim = PqSubDim)
      .orderBy("query_id", "rank")
  }

  /** The COMPOSED persisted ANN serving — IVFADC end to end from the
    * two standing stores maintained by [[embedKnnIvfNightly]] and
    * [[embedKnnPqNightly]]: the same two nightly deltas fold into BOTH
    * stores (cell assignment into the IVF half, coding into the PQ
    * half — each a delta-only broadcast pass under its own cumulative
    * drift gate), then ONE query serves cell routing from the standing
    * centroids, candidates from the standing ids-only inverted file,
    * ADC ranking from the standing code table, and an exact rerank of
    * the shortlist. The oracle replays BOTH halves from scratch with
    * base-predicate seeding (centroids AND codebooks from
    * `vec_id % 5 <> 0`, assignment/coding over the full corpus) —
    * equality proves the chained on-disk composition ≡ a fresh IVFADC
    * build, the full billion-vector deployment shape. */
  def embedKnnIvfadcNightly(s: SparkSession, dir: String): DataFrame = {
    val (ivfStore, pqStore) = ivfadcNightlyStores(s, dir)
    val emb = t(s, dir, "embeddings")
    graft.ops.AnnIndex.ivfadcTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, ivfStore, pqStore,
        nprobe = IvfProbes, shortlist = 50, m = PqM, subDim = PqSubDim)
      .orderBy("query_id", "rank")
  }

  /** Roll both standing ANN stores back to night 0 and fold the two
    * nightly deltas into EACH (cells into the IVF half, codes into the
    * PQ half) — the chain [[embedKnnIvfadcNightly]] and the tenant-
    * served form share. */
  private def ivfadcNightlyStores(s: SparkSession, dir: String): (String, String) = {
    import graft.ops.{AnnIndex, StandingState}
    val emb = t(s, dir, "embeddings")
    val ivfStore = annStandingStore(s, dir)
    val pqStore = annPqStandingStore(s, dir)
    // recurring-run retention: refold both stores from night 0
    StandingState.rollbackTo(s, ivfStore, 0L)
    StandingState.rollbackTo(s, pqStore, 0L)
    def night(pred: org.apache.spark.sql.Column): Unit = {
      AnnIndex.ingest(emb.filter(pred), "vec_id", "embedding", ivfStore)
      AnnIndex.ingestPq(emb.filter(pred), "vec_id", "embedding", pqStore,
        m = PqM, subDim = PqSubDim)
      ()
    }
    night(col("vec_id") % 10 === 0)
    night(col("vec_id") % 10 === 5)
    (ivfStore, pqStore)
  }

  /** VECTOR SEARCH ON THE TENANT SURFACE — the persisted IVFADC
    * composition served as one gated read-only tenant SQL statement:
    * the standing stores chain exactly as [[embedKnnIvfadcNightly]],
    * the composed top-k (built on the TENANT's session — standing
    * centroids/cells/codebooks/codes all witness-verified reads) is
    * registered as a curated view, and the tenant's statement rides the
    * same relation substitution and plan-level read-only gate as every
    * statement. The oracle is the from-scratch IVFADC replay shared
    * with the nightly key — proving the wire-served neighbors ≡ a fresh
    * build. A real deployment parameterizes the query side per request;
    * the serving shape (stores composed at read time inside a tenant
    * session) is what this key pins. */
  def embedKnnIvfadcServed(s: SparkSession, dir: String): DataFrame = {
    val (ivfStore, pqStore) = ivfadcNightlyStores(s, dir)
    val registry = graft.schema.SchemaRegistry(
      graft.schema.Org("pipeline", Seq.empty))
    val tenant = graft.frontend.TenantSession.open(
      s, registry, "pipeline", graft.sources.SourceSet())
    val emb = t(tenant.spark, dir, "embeddings")
    tenant.registerView("knn_neighbors",
      graft.ops.AnnIndex.ivfadcTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, ivfStore, pqStore,
        nprobe = IvfProbes, shortlist = 50, m = PqM, subDim = PqSubDim))
    tenant.sql(
      """SELECT query_id, corpus_id, d2, rank FROM knn_neighbors
        |ORDER BY query_id, rank""".stripMargin)
  }

  /** Night-0 COMPOSED IVFADC store: all four tables (centroids,
    * payload cells, codebooks, cell-clustered codes) in one snapshot
    * store — the serving-optimal layout where the ADC code scan
    * file-prunes to the probed cells exactly like the cells read. */
  private def annComposedStandingStore(s: SparkSession, dir: String): String =
    standingStore("annivfadcc", dir) { root =>
      graft.ops.AnnIndex.bootstrapComposed(
        t(s, dir, "embeddings").filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", IvfCentroids, root,
        m = PqM, subDim = PqSubDim, k = PqK)
    }

  /** The COMPOSED-STORE IVFADC serve: the same two-night chain as
    * [[embedKnnIvfadcNightly]] folded into ONE store whose codes table
    * is range-clustered on the vector's cell, served with NO corpus
    * argument at all ([[graft.ops.AnnIndex.ivfadcTopKComposed]]) —
    * every byte of the query batch comes from probed-cell-pruned
    * standing files. The oracle is the same from-scratch IVFADC replay
    * the two-store nightly checks against, proving layout and
    * composition changes nothing about the results. */
  def embedKnnIvfadcComposed(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{AnnIndex, StandingState}
    val emb = t(s, dir, "embeddings")
    val store = annComposedStandingStore(s, dir)
    // recurring-run retention: refold from the standing night-0 snapshot
    StandingState.rollbackTo(s, store, 0L)
    AnnIndex.ingestComposed(emb.filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", store, m = PqM, subDim = PqSubDim)
    AnnIndex.ingestComposed(emb.filter(col("vec_id") % 10 === 5),
      "vec_id", "embedding", store, m = PqM, subDim = PqSubDim)
    AnnIndex.ivfadcTopKComposed(emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", kNeighbors = 5, store,
        nprobe = IvfProbes, shortlist = 50, m = PqM, subDim = PqSubDim)
      .orderBy("query_id", "rank")
  }

  // ANN constants shared by the Spark queries and their DuckDB oracles.
  // The library auto-sizes (Similarity.autoPlanes/autoCentroids) when not
  // given explicit values; the checked queries pin constants so the
  // oracle SQL can bake them in.
  // 6 bands × 3 planes: measured recall 0.8 vs exact top-5 on the test
  // embeddings at ~half the brute-force candidate count
  private val LshPlanesPerBand = 3
  private val LshBands = 6
  private val LshBucketCap = 200
  private val IvfCentroids = 16
  private val IvfProbes = 4

  /** Embedding near-dup pairs, brute-force within a bounded id range so
    * the oracle stays cheap; the unbounded scale path is
    * [[Similarity.cosineNearDupPairs]] (LSH-blocked). */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").filter(col("vec_id") < 300)
    val l = emb.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val r = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("cos", round(Similarity.cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cos") >= 0.35)
      .select("id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }

  /** The embedding near-dup pair graph every graph-kernel query runs on
    * (vec_id < 300, cosine ≥ 0.35) — ONE definition so the threshold
    * and cut can never desynchronize across the four consumers and
    * their shared oracle CTEs. */
  private def embPairGraph(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").filter(col("vec_id") < 300)
    val l = emb.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val r = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("cos", round(Similarity.cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cos") >= 0.35)
      .select("id_a", "id_b")
  }

  /** Triangle enumeration ([[graft.ops.Cluster.triangles]]) over the
    * embedding near-dup graph: mutual-similarity triangles are the
    * strongest transitivity evidence a near-dup cluster can show (every
    * member pair agrees), and the textbook graph-analytics kernel the
    * degree-ordered wedge join keeps O(m^{3/2}) at any scale. */
  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cluster.triangles(embPairGraph(s, dir)).orderBy("a", "b", "c")

  /** 2-core of the embedding near-dup graph
    * ([[graft.ops.Cluster.kCore]]): peels pendant chains and LSH
    * false-positive tendrils until every surviving doc keeps ≥ 2
    * mutually-similar neighbors — the graph-hygiene cut applied before
    * trusting transitive dedup clusters. */
  def graphKcore(s: SparkSession, dir: String): DataFrame =
    // maxRounds matches the oracle's fixed unroll: convergence past 8
    // rounds must throw (visible), never silently diverge from the replay
    graft.ops.Cluster.kCore(embPairGraph(s, dir), k = 2, maxRounds = 8)
      .orderBy("doc_id")

  /** Local clustering coefficient
    * ([[graft.ops.Cluster.clusteringCoefficient]]) over the embedding
    * near-dup graph: coherent mutual-similarity groups score ~1, hubs
    * stitching unrelated docs score ~0 — the per-node LSH-false-positive
    * smell test. */
  def graphClustering(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cluster.clusteringCoefficient(embPairGraph(s, dir)).orderBy("doc_id")

  /** Composed graph-hygiene audit — the round-8 graph family as one
    * pipeline: the embedding near-dup graph's 2-core (pendant/tendril
    * peel, [[graft.ops.Cluster.kCore]]) intersected with its coherence
    * scores ([[graft.ops.Cluster.clusteringCoefficient]]); survivors are
    * the docs whose similarity neighborhood is BOTH robust (core) and
    * clique-like (coeff ≥ 0.5) — the membership set transitive dedup can
    * trust. The pair list feeds both kernels once. */
  def pipelineGraphHygiene(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ops.Materialize.index(embPairGraph(s, dir), "hygiene-pairs")
    // maxRounds = the oracle's unroll bound, as in graphKcore
    graft.ops.Cluster.kCore(pairs, k = 2, maxRounds = 8)
      .join(graft.ops.Cluster.clusteringCoefficient(pairs), "doc_id")
      .filter(col("coeff") >= 0.5)
      .select("doc_id", "core_deg", "deg", "tri_cnt", "coeff")
      .orderBy("doc_id")
  }

  /** LSH-blocked near-dup — the SCALE path, oracle-checked: same
    * multi-band sign buckets as embed_knn_lsh (plane constants baked into
    * the SQL), per-bucket cap, exact cosine verify over candidates. */
  def embedNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", dim = 64,
      threshold = 0.35, numPlanes = LshPlanesPerBand, numBands = LshBands,
      bucketCap = NearDupBucketCap)
      .orderBy("id_a", "id_b")
  }

  private val NearDupBucketCap = 500

  /** kNN label classification: majority vote of the 5 nearest neighbors'
    * labels vs the query's own — the second half of the ANN evaluation
    * loop (recall says the index finds the neighbors; this says the
    * neighbors carry the signal). Vote resolution is deterministic:
    * (count desc, label asc). */
  def knnClassify(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val knn = Similarity.bruteForceTopK(
      corpus = emb, queries = emb.filter(col("vec_id") < 10),
      idCol = "vec_id", vecCol = "embedding", k = 5)
    val votes = knn
      .join(emb.select(col("vec_id").as("corpus_id"), col("label").as("nlabel")),
        "corpus_id")
      .groupBy("query_id", "nlabel")
      .agg(count(lit(1)).as("votes"))
    votes
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("votes").desc, col("nlabel"))))
      .filter(col("rn") === 1)
      .join(emb.select(col("vec_id").as("query_id"), col("label").as("true_label")),
        "query_id")
      .select(col("query_id"), col("nlabel").as("pred_label"),
        col("votes"), col("true_label"),
        (col("nlabel") === col("true_label")).as("correct"))
      .orderBy("query_id")
  }

  /** Per-label embedding centroids: element-wise mean by (label, dim) via
    * posexplode — the fixed-width shuffle encoding of distributed vector
    * aggregation (n×dim skinny rows, full partial-agg; the treeAggregate
    * alternative without leaving DataFrames). */
  def embedLabelCentroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"),
        posexplode(expr("transform(embedding, x -> cast(x AS double))"))
          .as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), round(avg("x"), 6).as("centroid"))
      .orderBy("label", "dim")

  // ------------------------------------------------------- composed pipeline
  /** The round-5 operators composed into one end-to-end training-data
    * preparation run:
    *
    *   1. transitive near-dup dedup — minhash-LSH pairs → connected
    *      components → keep only each cluster's minimum doc;
    *   2. Gopher-style quality gate (composite `passes` flag);
    *   3. benchmark decontamination — src0 is the eval suite; flagged
    *      docs and the benchmark itself leave the corpus;
    *   4. sequence packing of the survivors into 512-token windows.
    *
    * Shuffle ledger at any scale: the LSH front half (banded index +
    * candidate/verify joins) + 2 label-prop shuffles per round for the
    * clusters, ONE broadcast-gram hit-count groupBy for decontamination
    * (the quality gate is scan-side), and one window pass for packing —
    * nothing corpus-sized moves more than once per stage. */
  def pipelinePrepareTraining(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    // 1. transitive dedup: drop clustered docs that aren't their cluster min
    val drops = graft.ops.Cluster
      .dupClusters(minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
      .filter(col("doc_id") =!= col("cluster"))
      .select("doc_id")
    val kept = docs.join(drops, Seq("doc_id"), "left_anti")
    // 2. quality gate
    val gated = TextAnalysis.gopherSignals(kept)
      .filter(col("passes"))
      .select("doc_id", "lang", "source", "text")
    // 3. decontamination against the src0 eval suite. The gated corpus
    // feeds BOTH the contamination count and the final join — write it
    // once (the index-once discipline) so the dedup-join + quality-gate
    // lineage isn't recomputed through two consumers.
    val train = graft.ops.Materialize.index(
      gated.filter(col("source") =!= "src0"), "train-gated")
    val cleanIds = TextAnalysis.contamination(
        train = train, bench = docs.filter(col("source") === "src0"),
        shingleWords = 8) // long grams: only true leaks match (see decontaminate)
      .filter(!col("contaminated"))
      .select("doc_id")
    val clean = train.join(cleanIds, "doc_id")
    // 4. pack the survivors
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clean
      .select(col("doc_id"), col("lang"),
        size(split(lower(col("text")), " ")).cast("long").as("n_toks"))
      .withColumn("cum", sum("n_toks").over(w))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        expr("(cum - n_toks) div 512").as("pack_id"),
        ((col("cum") - col("n_toks")) % 512).as("offset_in_pack"))
      .orderBy("doc_id")
  }

  /** Pipeline observability: the drop-reason funnel —
    * [[pipelinePrepareTraining]]'s gates re-run as per-(source, stage)
    * COUNTS, the audit a production pipeline publishes next to its
    * output (where did each source's documents go?). Stages: input,
    * dedup_dropped, quality_dropped, benchmark_held_out,
    * decontam_dropped, kept — input = the sum of the rest per source.
    * Each gate's expensive intermediate materializes once (the same
    * index-once discipline as the pipeline itself); every stage count
    * is then one partial aggregate, so the audit adds no shuffle wider
    * than (source, stage). */
  def pipelineAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // the LSH → cluster lineage feeds three branches (dropped, kept,
    // and through kept every later gate) — cut it to parquet once
    val drops = graft.ops.Materialize.index(
      graft.ops.Cluster
        .dupClusters(minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
        .filter(col("doc_id") =!= col("cluster"))
        .select("doc_id"), "audit-drops")
    val dropped = docs.join(drops, "doc_id")
    val kept = docs.join(drops, Seq("doc_id"), "left_anti")
    // one gopher pass; the (doc, source, passes) verdicts re-read as parquet
    val sigs = graft.ops.Materialize.index(
      TextAnalysis.gopherSignals(kept).select("doc_id", "source", "passes"),
      "audit-sigs")
    val gated = kept.join(
      sigs.filter(col("passes")).select("doc_id"), "doc_id")
    val train = graft.ops.Materialize.index(
      gated.filter(col("source") =!= "src0"), "audit-train")
    val verdicts = graft.ops.Materialize.index(
      TextAnalysis.contamination(
          train = train, bench = docs.filter(col("source") === "src0"),
          shingleWords = 8)
        .select("doc_id", "contaminated"), "audit-contam")
    def stage(df: DataFrame, name: String) =
      df.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .withColumn("stage", lit(name))
    stage(docs, "input")
      .unionAll(stage(dropped, "dedup_dropped"))
      .unionAll(stage(sigs.filter(!col("passes")), "quality_dropped"))
      .unionAll(stage(gated.filter(col("source") === "src0"), "benchmark_held_out"))
      .unionAll(stage(
        train.join(verdicts.filter(col("contaminated")).select("doc_id"), "doc_id"),
        "decontam_dropped"))
      .unionAll(stage(
        train.join(verdicts.filter(!col("contaminated")).select("doc_id"), "doc_id"),
        "kept"))
      .select("source", "stage", "n_docs")
      .orderBy("source", "stage")
  }

  /** Pairwise source vocabulary overlap — exact Jaccard between every
    * two sources' token SETS: the corpus-composition diagnostic (two
    * crawls of the same sites show ~1, disjoint domains ~0) that
    * decides whether sources are worth separate mixture weights.
    *
    * Scale shape: the corpus reduces ONCE to DISTINCT (source, token)
    * — bounded by vocabulary · sources, sublinear in corpus size — and
    * materializes for its three consumers; the intersection self-join
    * on the token key emits ≤ sources² rows per token (sources is a
    * handful), and set sizes join back as a tiny broadcast. No
    * all-pairs over documents anywhere. */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val st = graft.ops.Materialize.index(
      t(s, dir, "documents")
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .distinct(), "overlap-st")
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n"))
    st.select(col("source").as("src_a"), col("tok"))
      .join(st.select(col("source").as("src_b"), col("tok")), "tok")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("inter").cast("long").as("inter"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6)
          .as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** The shared word-bigram md5-prefix gram domain
    * ([[graft.ops.Dedup.bigramMd5Tok]]) over the documents table. */
  private def bigramTok(docs: DataFrame): DataFrame =
    Dedup.bigramMd5Tok(docs, "doc_id", "text")

  /** EXACT similarity self-join via prefix filtering
    * ([[graft.ops.Dedup.allPairsJaccardTok]], Bayardo et al. WWW'07):
    * every pair with bigram-gram Jaccard ≥ 0.5, no LSH misses. The
    * oracle is BRUTE FORCE all-pairs — algorithm vs definition, so any
    * false negative from the prefix/size filters would hash-mismatch. */
  def dedupAllpairs(s: SparkSession, dir: String): DataFrame =
    Dedup.allPairsJaccardTok(
      bigramTok(graft.ops.Materialize.spread(t(s, dir, "documents"))),
      "doc_id", threshold = 0.5, hexTokens = true)
      .orderBy("id_a", "id_b")

  /** Cross-source near-dup contamination matrix: for each ordered source
    * pair, how many verified near-dup pairs ([[minhashVerifiedPairs]])
    * link them and what fraction of the row-source's documents have a
    * near-dup in the column source — the "how much of corpus A is
    * already in corpus B" audit that decides whether a new crawl adds
    * anything. Pair list is output-sized, the source lookups are
    * id-keyed joins, per-source totals broadcast. */
  def sourceContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    val pairs = minhashVerifiedPairs(s, dir).select("id_a", "id_b")
    val sym = pairs.union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val totals = docs.groupBy(col("source").as("src_a")).agg(count(lit(1)).as("total_a"))
    sym
      .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("id_a")).as("docs_a"))
      .join(broadcast(totals), "src_a")
      .select(col("src_a"), col("src_b"), col("n_pairs"), col("docs_a"),
        round(col("docs_a").cast("double") / col("total_a"), 6).as("frac_a"))
      .orderBy("src_a", "src_b")
  }

  /** Memorization-risk audit ([[graft.ops.TextAnalysis.topDupGrams]]):
    * the 20 most-duplicated 8-word grams with doc/occurrence counts —
    * the verbatim spans a model would memorize. */
  def memorizationGrams(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.topDupGrams(
      graft.ops.Materialize.spread(t(s, dir, "documents")),
      "doc_id", "text", n = 8, k = 20)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram"))

  /** Winnowing fingerprint overlap ([[graft.ops.Dedup.winnowFingerprints]]
    * → [[graft.ops.Dedup.cdcOverlapPairs]]): MOSS-style plagiarism pairs —
    * min-sampled char-gram fingerprints, then containment over shared
    * fingerprints. */
  def fingerprintWinnow(s: SparkSession, dir: String): DataFrame =
    Dedup.cdcOverlapPairs(
      Dedup.winnowFingerprints(
        graft.ops.Materialize.spread(t(s, dir, "documents")),
        "doc_id", "text", k = 8, w = 4)
        .withColumnRenamed("fp", "chunk_md5"),
      "doc_id", threshold = 0.5, maxDf = 64)
      .orderBy("id_a", "id_b")

  /** Incremental component maintenance ([[graft.ops.Cluster.mergeClusters]]):
    * the standing (doc → cluster) table updated with a delta edge batch
    * — closure runs only on the CONTRACTED cluster graph (delta-sized),
    * history is key-joined, never re-closed. The split point is
    * arbitrary (any split must reach the same fixpoint), so the oracle
    * is dedup_cluster's FULL recursive closure — merge ≡ recompute is
    * the checked contract, like index_incremental and sketch_union. */
  def dedupClusterIncremental(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ops.Materialize.index(
      minhashVerifiedPairs(s, dir).select("id_a", "id_b"), "inc-cc-pairs")
    // bounds lookup (1-row aggregate, the permitted collect class)
    val cut = Option(pairs.agg(max(greatest(col("id_a"), col("id_b")))).head().get(0))
      .map(_.asInstanceOf[Long] / 2).getOrElse(0L)
    val base = pairs.filter(col("id_a") < cut && col("id_b") < cut)
    val delta = pairs.filter(!(col("id_a") < cut && col("id_b") < cut))
    val comp0 = graft.ops.Cluster.connectedComponents(base)
      .select(col("node").as("doc_id"), col("label").as("cluster"))
    val merged = graft.ops.Cluster.mergeClusters(comp0, delta)
    val sizes = merged.groupBy("cluster").agg(count(lit(1)).as("csize"))
    merged.join(sizes, "cluster")
      .select("doc_id", "cluster", "csize").orderBy("doc_id")
  }

  /** Ingest-volume anomaly monitor ([[graft.ops.Sessionize.ewmaAnomaly]]):
    * per (event type, day), today's count vs the half-life-weighted mean
    * of the prior 20 days — dyadic weights make the sums exact, so the
    * spike flag can't fork across engines. */
  def eventsAnomaly(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.ewmaAnomaly(t(s, dir, "events"), "event_type", "ts")
      .orderBy("etype", "day")

  /** Per-source quality dashboard: doc counts, Gopher-gate pass rate,
    * mean-word-length quartiles (exact percentile over 4-dp signals),
    * and the fixed-point mean stopword fraction — the one-glance report
    * deciding which crawl slice needs re-cleaning. One aggregation over
    * the scan-side [[graft.ops.TextAnalysis.gopherSignals]] projection. */
  def sourceQualityReport(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.gopherSignals(t(s, dir, "documents"))
      .groupBy("source")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        round(sum(when(col("passes"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4).as("pass_rate"),
        expr("percentile(mean_word_len, 0.25)").as("mwl_p25"),
        expr("percentile(mean_word_len, 0.5)").as("mwl_p50"),
        expr("percentile(mean_word_len, 0.75)").as("mwl_p75"),
        round(sum(round(col("stop_frac") * lit(1e4), 0).cast("long")).cast("double") /
          count(lit(1)) / lit(1e4), 4).as("mean_stop_frac"))
      .orderBy("source")

  /** Embedding-lake novelty gate ([[graft.ops.Similarity.embedNovelty]]):
    * odd-id vectors as the new batch probed against the even-id standing
    * corpus — max candidate cosine + novel flag per new vector. */
  def embedNoveltyQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.embedNovelty(
      emb.filter(col("vec_id") % 2 === 1),
      emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding",
      numCentroids = IvfCentroids, nprobe = IvfProbes, threshold = 0.35)
      .orderBy("vec_id")
  }

  /** Dedup-quality eval: recall/precision of the gram-minhash-banded
    * near-dup pipeline ([[ngramVerifiedPairs]]) against the EXACT
    * prefix-filtering ground truth over the SAME bigram gram sets and
    * threshold — the measured miss rate of the approximate path (the
    * number that justifies band/hash counts before a 100 TB run).
    * Both sides verify the identical similarity, so precision is 1.0
    * by construction and the interesting number is recall.
    * Three 1-row aggregates cross-joined — pair tables never collect. */
  def dedupRecall(s: SparkSession, dir: String): DataFrame = {
    val truth = Dedup.allPairsJaccardTok(
      bigramTok(graft.ops.Materialize.spread(t(s, dir, "documents"))),
      "doc_id", threshold = 0.5, hexTokens = true).select("id_a", "id_b")
    val lsh = ngramVerifiedPairs(s, dir).select("id_a", "id_b")
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val nLsh = lsh.agg(count(lit(1)).as("n_lsh"))
    val nBoth = truth.join(lsh, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_both"))
    nTruth.crossJoin(nLsh).crossJoin(nBoth)
      .select(col("n_truth"), col("n_lsh"), col("n_both"),
        round(col("n_both").cast("double") / col("n_truth"), 4).as("recall"),
        round(col("n_both").cast("double") / col("n_lsh"), 4).as("precision"))
  }

  /** LSH banding-parameter sweep — the dedup twin of [[annNprobeSweep]]:
    * the SAME 4 gram-minhashes banded three ways (1 band × 4 rows,
    * 2 × 2 — the production config — and 4 × 1), each measured against
    * the exact all-pairs truth set: candidate volume (the cost knob) vs
    * verified recall (the coverage knob). This is the s-curve
    * measurement a 100 TB dedup job runs on a sample BEFORE choosing
    * (b, r) — the collision probability 1−(1−s^r)^b steepens with r and
    * shifts left with b, and the sweep shows where the real corpus sits
    * on it. The signature index, the gram sets, and the truth set are
    * all read from the content-addressed cache (shared with
    * `dedup_ngram_jaccard` / `dedup_allpairs` / `dedup_recall` in a
    * battery), so the sweep pays only the three candidate joins +
    * verifies. Verified pairs are a SUBSET of truth by construction
    * (same exact-Jaccard threshold on the same gram sets), so recall is
    * the single quality number and candidates-per-verified the cost
    * ratio. */
  def lshBandSweep(s: SparkSession, dir: String): DataFrame = {
    // Full-corpus sweep: the signature index, gram sets and (critically)
    // the exact all-pairs truth are then PLAN-IDENTICAL to what
    // dedup_ngram_jaccard / dedup_allpairs / dedup_recall build, so in
    // any battery they come from the content-addressed cache and the
    // sweep pays only its three candidate joins + verifies (a sampled
    // variant measured SLOWER in-battery: a 1/4 sample halves the truth
    // cost but forfeits the share entirely). At 100 TB the sweep runs on
    // a sample by the same mechanism — point it at the sampled corpus
    // version whose truth index the recall eval already built.
    val docs = graft.ops.Materialize.spread(t(s, dir, "documents"))
    val grams = docs.select(
      col("doc_id"),
      array_distinct(Dedup.shingles("text", 2)).as("grams"))
    val sigs = (0 until 4).foldLeft(grams) { (d, i) =>
      d.withColumn(s"g$i",
        expr(s"array_min(transform(grams, g -> md5(concat('gsalt$i|', g))))"))
    }.withColumn("grams", expr("transform(grams, g -> substring(md5(g), 1, 16))"))
    val indexed = graft.ops.Materialize.index(sigs, "ngram-sig")
    val truth = graft.ops.Materialize.index(
      Dedup.allPairsJaccardTok(bigramTok(docs), "doc_id", threshold = 0.5,
          hexTokens = true)
        .select("id_a", "id_b"),
      "sweep-truth")
    def bandsFor(cfg: String): (DataFrame, Int) = cfg match {
      case "b1r4" => (indexed.select(col("doc_id"),
        md5(concat_ws("|", col("g0"), col("g1"), col("g2"), col("g3"))).as("band0")), 1)
      case "b2r2" => (indexed.select(col("doc_id"),
        md5(concat_ws("|", col("g0"), col("g1"))).as("band0"),
        md5(concat_ws("|", col("g2"), col("g3"))).as("band1")), 2)
      case _ => (indexed.select(col("doc_id"),
        col("g0").as("band0"), col("g1").as("band1"),
        col("g2").as("band2"), col("g3").as("band3")), 4)
    }
    // verify over the bijective hex→long re-encode — same jaccards,
    // 8-byte compares (see ngramVerifiedPairs)
    val sortedG = indexed.select(col("doc_id"),
      sort_array(Dedup.hex16ToLongs(col("grams"))).as("grams"))
    Seq("b1r4", "b2r2", "b4r1").map { cfg =>
      val (bands, nb) = bandsFor(cfg)
      val cand = Dedup.lshCandidatePairs(bands, "doc_id", numBands = nb)
      val verified = cand
        .join(sortedG.select(col("doc_id").as("id_a"), col("grams").as("ga")), "id_a")
        .join(sortedG.select(col("doc_id").as("id_b"), col("grams").as("gb")), "id_b")
        .withColumn("_i", Dedup.sortedIntersectCount(col("ga"), col("gb")).cast("double"))
        .filter(round(col("_i") /
          (size(col("ga")) + size(col("gb")) - col("_i")), 4) >= 0.5)
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(verified.agg(count(lit(1)).as("n_verified")))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .select(lit(cfg).as("config"),
          col("n_candidates"), col("n_verified"), col("n_truth"),
          round(col("n_verified").cast("double") / col("n_truth"), 4).as("recall"))
    }.reduce(_ unionByName _).orderBy("config")
  }

  /** kNN label-noise audit ([[graft.ops.Similarity.labelNoise]]): per
    * label, how many members' IVF-probed 5-NN majority disagrees with
    * the label itself. */
  def labelNoiseQ(s: SparkSession, dir: String): DataFrame =
    Similarity.labelNoise(t(s, dir, "embeddings"), "vec_id", "embedding",
      "label", k = 5, numCentroids = IvfCentroids, nprobe = IvfProbes)
      .orderBy("label")

  /** The training-data story end-to-end in ONE declarative pipeline:
    * exact-dedup to keeper docs → token/quality gate → token counting.
    * Every stage is a narrow transformation over one corpus scan plus the
    * dedup groupBy — Catalyst fuses the gate and the counters into the
    * scan projection, so the whole cleanse is two shuffles (dedup keys +
    * keeper join) at any scale. */
  def pipelineCleanCorpus(s: SparkSession, dir: String): DataFrame = {
    // spread: the heavy per-row stages (md5 grouping, BPE-ish token
    // count) otherwise run at the single-file fixture's row-group
    // parallelism (5 tasks on 32 cores in the r9 bench); no-op on a
    // many-file lake layout
    val docs = graft.ops.Materialize.spread(t(s, dir, "documents"))
    val keepers = Dedup.exactGroups(docs, "doc_id", "text")
      .select(col("keeper").as("doc_id"))
    docs.join(keepers, "doc_id")
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("distinct_ratio",
        round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 4))
      .filter(col("n_words") >= 20 && col("distinct_ratio") >= 0.3)
      .select(col("doc_id"), col("lang"), col("n_words"),
        TextAnalysis.bpeishTokenCount(lower(col("text"))).cast("long").as("bpeish_tokens"))
      .orderBy("doc_id")
  }

  /** Column profiling: per-column null/distinct/min/max over one scan —
    * the data-quality snapshot a pipeline takes before training. One
    * pass, partial-aggregated; the unpivoted per-column layout keeps the
    * output fixed-size regardless of corpus size. */
  def profileTable(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"dst_$c"),
        round(min(col(c)), 4).as(s"min_$c"),
        round(max(col(c)), 4).as(s"max_$c"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
      .crossJoin(li.agg(count(lit(1)).as("total")))
    val perCol = cols.map { c =>
      wide.select(lit(c).as("column"),
        (col("total") - col(s"cnt_$c")).as("nulls"),
        col(s"cnt_$c").as("non_null"),
        col(s"dst_$c").as("distinct_vals"),
        col(s"min_$c").as("min_val"),
        col(s"max_$c").as("max_val"))
    }
    perCol.reduce(_ unionByName _).orderBy("column")
  }

  /** Fixed-width numeric histogram of order totals: floor-binned, with
    * empty bins absent — one partial-aggregated groupBy on the bin id. */
  def numericHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(floor(col("o_totalprice") / 20000).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", col("bin") * 20000)
      .select("bin", "lo", "n")
      .orderBy("bin")

  // ----------------------------------------------------------------- skew
  /** Salted join vs a plain-join oracle: salting must be a pure physical
    * transformation — N-way salt on the fact side, dimension replicated
    * ×N — with bit-identical results to the unsalted join. */
  def skewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Skew.saltedJoin(orders, customer, "o_custkey", salts = 8)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("orders"))
      .orderBy("segment")
  }

  /** Heavy-hitter diagnostic (the pre-salting histogram): deterministic
    * top-20 keys by row count. */
  def skewHistogram(s: SparkSession, dir: String): DataFrame =
    Skew.keyHistogram(t(s, dir, "lineitem"), "l_suppkey", topN = 20)

  // ----------------------------------------------------------- multimodal
  /** Frame sampling over an opaque payload (text bytes stand in for media;
    * the chunk/stride plumbing is the real thing — see ops.Multimodal). */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("frame_count", ceil(length(col("text")).cast("double") / 64).cast("int"))
      .select(col("doc_id"), explode(expr(
        "transform(filter(sequence(0, frame_count - 1), i -> i % 2 = 0), " +
          "i -> struct(i AS frame_no, md5(substring(text, i * 64 + 1, 64)) AS frame_md5))"))
        .as("f"))
      .select(col("doc_id"), col("f.frame_no").cast("long").as("frame_no"),
        col("f.frame_md5").as("frame_md5"))
      .orderBy("doc_id", "frame_no")

  /** Stubbed decode features over the payload (md5 id + length + 4 scalar
    * fake-embedding dims derived from the content hash). */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("content_md5"),
        length(col("text")).cast("long").as("content_bytes"),
        expr("(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) / cast(15 as double)").as("emb_0"),
        expr("(instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) / cast(15 as double)").as("emb_1"),
        expr("(instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) / cast(15 as double)").as("emb_2"),
        expr("(instr('0123456789abcdef', substring(md5(text), 4, 1)) - 1) / cast(15 as double)").as("emb_3"))
      .orderBy("doc_id")

  /** Context-window chunking: overlapping 200-char chunks, stride 150 —
    * the tokenize/embed unit of a training pipeline. Chunk content is
    * compared by md5 + length (value-exact, compact). */
  def docChunking(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(t(s, dir, "documents"), size = 200, stride = 150)
      .select(
        col("doc_id"),
        col("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Corpus heavy hitters via the SpaceSaving sketch aggregate
    * ([[graft.functions.TopKCountSketch]]): one pass, one shuffle of
    * bounded sketches — not a full groupBy(count) of every distinct token.
    * Capacity 4096 far exceeds this corpus's vocabulary, so the sketch is
    * in its exact regime and the result hash-matches a plain GROUP BY
    * count oracle (the guarantee the spec pins across partitionings). */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    t(s, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .agg(expr("graft_topk(tok, 10, 4096)").as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item").as("token"), col("e.cnt").as("cnt"), col("e.err").as("err"))
  }

  /** Temporal alignment over video-shaped assets
    * ([[graft.ops.Multimodal.frameAlignment]]): the corpus plus
    * stride-aligned TRIMS of every 10th asset (first 256 payload chars
    * dropped = exactly 2 frame strides), so each planted pair must
    * report offset exactly 2 with the trimmed asset's full frame count
    * behind it — where [[multimodalVideoDedup]] says "these share
    * frames", this says WHERE they line up (clip-within-video
    * detection). Natural coarse-hash pairs resolve to whatever the mode
    * rule yields; the oracle replays the full chain. */
  def multimodalFrameAlign(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.select("doc_id", "text").unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, 257)").as("text")))
    graft.ops.Multimodal.frameAlignment(
      graft.ops.Multimodal.assetsFromText(corpus, "doc_id", "text"))
      .orderBy("id_a", "id_b")
  }

  /** Alignment-aware VIDEO KEEPER — the consumer of
    * [[multimodalFrameAlign]]'s offsets (the r7 "rank computed but
    * unconsumed" lesson applied to video): within each temporal-copy
    * cluster (connected components over the alignment pairs), keep the
    * asset with the MAXIMAL frame span — the superset/longest cut — and
    * report each member's offset INSIDE its keeper as the containment
    * proof (a trim that starts 2 strides in carries keeper_offset 2;
    * the keeper itself carries 0). The planted stride-aligned trims
    * (same fixture as the alignment query, so the battery shares the
    * frame-hash index plan-identically) must each lose to their source.
    *
    * Scale shape: alignment edges come from the df-capped inverted
    * index (never all-pairs), the closure runs on the pair graph (sized
    * by true temporal copies), frame spans are a scan-side length
    * projection with NO fingerprint math, and keeper election is one
    * min-of-struct partial aggregate per cluster — the
    * [[graft.ops.Cluster.priorityKeepers]] shape with frame span as the
    * quality signal. */
  def multimodalVideoKeeper(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.select("doc_id", "text").unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, 257)").as("text")))
    val align = graft.ops.Multimodal.frameAlignment(
      graft.ops.Multimodal.assetsFromText(corpus, "doc_id", "text"))
    val comp = graft.ops.Cluster.dupClusters(align.select("id_a", "id_b"))
      .select("doc_id", "cluster")
    // frame span = the sampling grid's frame count: pure length math,
    // identical to frameHashes' window enumeration (ceil(L / stride))
    val spans = corpus.select(col("doc_id"),
      ceil(length(col("text")) / lit(128.0)).cast("long").as("n_frames"))
    val members = spans.join(comp, Seq("doc_id"), "left")
      .select(col("doc_id").as("asset_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"), col("n_frames"))
    val keepers = members.groupBy("cluster")
      .agg(min(struct((-col("n_frames")).as("_n"), col("asset_id"))).as("_b"))
      .select(col("cluster"), col("_b.asset_id").as("keeper"))
    val offs = align.select("id_a", "id_b", "offset")
    members.join(keepers, "cluster")
      .join(offs.select(col("id_a").as("keeper"), col("id_b").as("asset_id"),
        col("offset").as("_o1")), Seq("keeper", "asset_id"), "left")
      .join(offs.select(col("id_b").as("keeper"), col("id_a").as("asset_id"),
        (-col("offset")).as("_o2")), Seq("keeper", "asset_id"), "left")
      .select(col("asset_id"), col("cluster"), col("n_frames"), col("keeper"),
        (col("asset_id") === col("keeper")).as("is_keeper"),
        when(col("asset_id") === col("keeper"), lit(0L))
          .otherwise(coalesce(col("_o1"), col("_o2"))).as("keeper_offset"))
      .orderBy("asset_id")
  }

  /** Stubbed resize over text-as-payload assets: payload scaled by pixel
    * area ratio, meta rewritten to target dims (ops.Multimodal). */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    val assets = graft.ops.Multimodal.assetsFromText(
      t(s, dir, "documents"), "doc_id", "text")
    graft.ops.Multimodal.fakeResize(assets, 320, 240)
      .select(
        col("asset_id"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.n_bytes").as("n_bytes"),
        md5(col("resized_content")).as("resized_md5"))
      .orderBy("asset_id")
  }

  /** Perceptual near-dup over binary payloads
    * ([[graft.ops.Multimodal.phashPairs]]): aHash-shaped block-mean
    * fingerprints computed through the deterministic byte-level stub
    * seam (integer-only bit rule — engine-exact), then the SAME Manku
    * 3-block hamming candidate machinery as the text SimHash path. The
    * oracle is brute-force all-pairs over the identical fingerprint
    * formula, so a block key that ever missed a true ≤2 pair
    * hash-mismatches here. */
  def multimodalPhashDedup(s: SparkSession, dir: String): DataFrame = {
    // spread: the per-row fingerprint (interpreted HOF over the payload)
    // dominates — core-wide parallelism, no-op on a lake layout
    val docs = td(s, dir)
    // Re-ingested copies — the scenario perceptual dedup exists for:
    // every 10th asset re-appears under a new id with a 4-byte edit
    // (same length, so the block structure is preserved and the aHash
    // lands within the hamming ball of its original — typically 0-2
    // bits moved, exercising BOTH the same-fingerprint and the
    // block-key candidate paths).
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("zzzz"), expr("substring(text, 5)")).as("text"))
    // materialized under the SAME tag/plan as pipeline_asset_manifest's
    // corpus, so the downstream fingerprint index is content-cache-shared
    // between the two queries in a battery
    val corpus = graft.ops.Materialize.index(
      docs.select("doc_id", "text").unionByName(copies), "asset-corpus")
    val assets = graft.ops.Multimodal.assetsFromText(corpus, "doc_id", "text")
    graft.ops.Multimodal.phashPairs(assets)
      .orderBy("id_a", "id_b")
  }

  /** Cross-modal asset↔caption join: the asset table (binary payload +
    * typed meta struct) is MATERIALIZED once as parquet, a typed-meta
    * predicate prunes assets WITHOUT projecting the payload (the scan's
    * ReadSchema excludes `content` — plan-pinned in PlanSpec; at 100 TB
    * this is the difference between moving metadata and moving media),
    * and captions join by asset id with scan-side token stats. */
  def multimodalCaptionJoin(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val assets = graft.ops.Materialize.index(
      graft.ops.Multimodal.assetsFromText(docs, "doc_id", "text"), "mm-assets")
    val captions = docs.select(
      col("doc_id").as("asset_id"),
      expr("array_join(slice(split(text, ' '), 1, 10), ' ')").as("caption"))
    assets
      .filter(col("meta.width") > 320)
      .select(col("asset_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_bytes").as("n_bytes"))
      .join(captions, "asset_id")
      .select(col("asset_id"), col("width"), col("height"), col("n_bytes"),
        size(split(col("caption"), " ")).cast("long").as("caption_tokens"),
        md5(col("caption")).as("caption_md5"))
      .orderBy("asset_id")
  }

  /** Margin-based bitext mining ([[graft.ops.Similarity.bitextMarginMine]]):
    * the even-id embeddings stand in for language X, the odd-id ones for
    * language Y; each X query (id < 400) pairs with its best Y candidate
    * by the Artetxe-Schwenk ratio margin — cosine over the mean of both
    * directions' k-NN cosines, computed entirely in 4-dp fixed-point
    * integers so the ranking is engine-exact. */
  def embedBitextMargin(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val xAll = emb.filter(col("vec_id") % 2 === 0)
    Similarity.bitextMarginMine(
        xQueries = xAll.filter(col("vec_id") < 400),
        xCorpus = xAll,
        yCorpus = emb.filter(col("vec_id") % 2 === 1),
        idCol = "vec_id", vecCol = "embedding", k = 4)
      .orderBy("x_id")
  }

  /** Matryoshka truncation eval: recall@5 of nearest-neighbor search on
    * PREFIX-truncated embeddings (d ∈ 8/16/32/64) against the full-dim
    * ranking — the measurement behind choosing an MRL serving dimension
    * (how much ANN quality survives a 8×/4×/2× vector-size cut). The
    * truncated search is [[graft.ops.Similarity.bruteForceTopK]] over a
    * scan-side `slice` projection; recall denominators are integers, so
    * the averaged recall cannot fork on a rounding half. */
  def embedMrlDistortion(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 10)
    def top5(d: Int): DataFrame = {
      def proj(df: DataFrame) =
        df.withColumn("embedding", expr(s"slice(embedding, 1, $d)"))
      Similarity.bruteForceTopK(proj(emb), proj(qs), "vec_id", "embedding", 5)
        .select(col("query_id"), col("corpus_id"))
    }
    val full = graft.ops.Materialize.index(top5(64), "mrl-full")
    val nQ = 10
    Seq(8, 16, 32, 64).map { d =>
      top5(d).join(full, Seq("query_id", "corpus_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(d.toLong).as("dim"),
          round(col("hits") / lit(nQ * 5.0), 4).as("recall_at_5"))
    }.reduce(_ unionByName _).orderBy("dim")
  }

  /** Schema-drift census over the `_fm` unknown-field capture
    * ([[graft.ops.Curation.fmDriftCensus]]) — the reference's radio
    * column holds fields written before they're declared
    * (`core/Recombinator`, SURVEY §2.2); this is the audit that says
    * which captured keys are ready to PROMOTE into the declared schema
    * and with what type. The `_fm` here is built deterministically from
    * the events table (always-present `k`, a conditional `beta_<type>`
    * numeric field, a sparse `legacy_id` string field) so the census
    * exercises coverage, distinctness and both type verdicts. */
  def fmDriftCensus(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val fm = ev.withColumn("_fm", expr(
      """map_from_entries(filter(array(
        |  struct('k' AS key, regexp_extract(props, '[0-9]+', 0) AS value),
        |  struct(concat('beta_', event_type) AS key,
        |         IF(value > 30, cast(value AS string), cast(NULL AS string)) AS value),
        |  struct('legacy_id' AS key,
        |         IF(event_id % 7 = 0, concat('L-', cast(event_id AS string)),
        |            cast(NULL AS string)) AS value)
        |), e -> e.value IS NOT NULL))""".stripMargin))
    graft.ops.Curation.fmDriftCensus(fm).orderBy("key")
  }

  /** Composed multimodal curation — the asset-side flagship (the
    * [[pipelinePrepareTraining]] shape applied to binary payloads):
    * re-ingested copies planted, perceptual near-dup pairs from BOTH
    * fingerprint families ([[graft.ops.Multimodal.phashPairs]] aHash ∪
    * [[graft.ops.Multimodal.dhashPairs]] gradient dHash) closed into clusters
    * ([[graft.ops.Cluster.dupClusters]], min-id keeper), non-keepers
    * dropped, typed-meta gate (width ≥ 100 — no payload touched), caption
    * join + token-count gate, emitting the training manifest. One corpus
    * materialization feeds both the fingerprint lineage and the caption
    * side; everything downstream of the pair step is keeper-sized. */
  def pipelineAssetManifest(s: SparkSession, dir: String): DataFrame = {
    val docs = td(s, dir)
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("zzzz"), expr("substring(text, 5)")).as("text"))
    val corpus = graft.ops.Materialize.index(
      docs.select("doc_id", "text").unionByName(copies), "asset-corpus")
    val assets = graft.ops.Multimodal.assetsFromText(corpus, "doc_id", "text")
    // BOTH perceptual families vote: aHash (brightness-mean) ∪ dHash
    // (adjacent-block gradient) — each catches re-encodes the other
    // misses; distinct'd because a 4-byte edit usually lands within both
    // hamming balls and the closure must not count edges twice
    val pairs = graft.ops.Multimodal.phashPairs(assets).select("id_a", "id_b")
      .unionByName(graft.ops.Multimodal.dhashPairs(assets).select("id_a", "id_b"))
      .distinct()
    val drops = graft.ops.Cluster.dupClusters(pairs)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as("asset_id"))
    val captions = corpus.select(col("doc_id").as("asset_id"),
      expr("array_join(slice(split(text, ' '), 1, 10), ' ')").as("caption"))
    assets
      .join(drops, Seq("asset_id"), "left_anti")
      .filter(col("meta.width") >= 100)
      .select(col("asset_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_bytes").as("n_bytes"))
      .join(captions, "asset_id")
      .withColumn("caption_tokens", size(split(col("caption"), " ")).cast("long"))
      .filter(col("caption_tokens") >= 5)
      .select(col("asset_id"), col("width"), col("height"), col("n_bytes"),
        col("caption_tokens"), md5(col("caption")).as("caption_md5"))
      .orderBy("asset_id")
  }

  /** Gradient perceptual near-dup ([[graft.ops.Multimodal.dhashPairs]]):
    * the dHash adjacent-block-gradient fingerprint beside
    * [[multimodalPhashDedup]]'s brightness-mean aHash, over the SAME
    * planted re-ingested copies and the same Manku block-key machinery.
    * The oracle is brute-force all-pairs over the identical gradient
    * bit rule, so a candidate key that ever missed a true ≤2 pair
    * hash-mismatches. */
  def multimodalDhashDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = td(s, dir)
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("zzzz"), expr("substring(text, 5)")).as("text"))
    // same tag/plan as the aHash query and the manifest flagship — one
    // corpus materialization feeds all three in a battery
    val corpus = graft.ops.Materialize.index(
      docs.select("doc_id", "text").unionByName(copies), "asset-corpus")
    val assets = graft.ops.Multimodal.assetsFromText(corpus, "doc_id", "text")
    graft.ops.Multimodal.dhashPairs(assets)
      .orderBy("id_a", "id_b")
  }

  /** INCREMENTAL asset-manifest maintenance — the nightly-delta form of
    * [[pipelineAssetManifest]]: the corpus splits into a standing BASE
    * (its pair graph already closed into a materialized assignment) and
    * a DELTA batch; only the delta's payloads are fingerprinted, delta
    * edges come from the cross-set block probes
    * ([[graft.ops.Multimodal.phashPairsDelta]] ∪ dhashPairsDelta), the
    * assignment folds forward via [[graft.ops.Cluster.mergeClusters]]
    * (closure sized by the DELTA, never the corpus), and the manifest
    * re-emits. The oracle is the FULL recompute — identical SQL to
    * `pipeline_asset_manifest` — so any divergence between incremental
    * and from-scratch maintenance hash-mismatches (merge ≡ recompute is
    * additionally property-pinned over random splits in RoundElevenProps). */
  def pipelineAssetManifestIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = td(s, dir)
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("zzzz"), expr("substring(text, 5)")).as("text"))
    val corpus = graft.ops.Materialize.index(
      docs.select("doc_id", "text").unionByName(copies), "asset-corpus")
    // deterministic ~1/7 delta batch; copies split by their own ids, so
    // a copy can land in the delta while its original sits in the base —
    // exactly the cross-set edge the block probe exists for
    val base = corpus.filter(col("doc_id") % 7 =!= 3)
    val delta = corpus.filter(col("doc_id") % 7 === 3)
    val baseAssets = graft.ops.Multimodal.assetsFromText(base, "doc_id", "text")
    val deltaAssets = graft.ops.Multimodal.assetsFromText(delta, "doc_id", "text")
    // the standing state a production lake materializes nightly
    val basePairs = graft.ops.Multimodal.phashPairs(baseAssets).select("id_a", "id_b")
      .unionByName(graft.ops.Multimodal.dhashPairs(baseAssets).select("id_a", "id_b"))
      .distinct()
    val baseComp = graft.ops.Materialize.index(
      graft.ops.Cluster.dupClusters(basePairs).select("doc_id", "cluster"),
      "manifest-base-comp")
    val deltaPairs = graft.ops.Multimodal
      .phashPairsDelta(deltaAssets, baseAssets).select("id_a", "id_b")
      .unionByName(graft.ops.Multimodal
        .dhashPairsDelta(deltaAssets, baseAssets).select("id_a", "id_b"))
      .distinct()
    val merged = graft.ops.Cluster.mergeClusters(baseComp, deltaPairs)
    val drops = merged.filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as("asset_id"))
    val assets = graft.ops.Multimodal.assetsFromText(corpus, "doc_id", "text")
    val captions = corpus.select(col("doc_id").as("asset_id"),
      expr("array_join(slice(split(text, ' '), 1, 10), ' ')").as("caption"))
    assets
      .join(drops, Seq("asset_id"), "left_anti")
      .filter(col("meta.width") >= 100)
      .select(col("asset_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_bytes").as("n_bytes"))
      .join(captions, "asset_id")
      .withColumn("caption_tokens", size(split(col("caption"), " ")).cast("long"))
      .filter(col("caption_tokens") >= 5)
      .select(col("asset_id"), col("width"), col("height"), col("n_bytes"),
        col("caption_tokens"), md5(col("caption")).as("caption_md5"))
      .orderBy("asset_id")
  }

  /** Night-0 standing stores, bootstrapped once per corpus per JVM — the
    * standing lake a production nightly job reads. NOT a
    * [[graft.ops.Materialize.scratchDir]]: scratch dirs are reaped by
    * `dropAll` between battery queries, while standing state must
    * survive from one "night" (query run) to the next — that
    * persistence is the entire seam under test. */
  private val standingStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Shutdown reaper for the standing fixture stores: `File.deleteOnExit`
    * is a no-op on non-empty directories, so without this every JVM run
    * would leak one full standing-state copy per family per corpus under
    * the temp dir. */
  private lazy val standingReaper: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      standingStores.values.forEach(r => deleteRecursively(new java.io.File(r)))))
    ()
  }

  /** Build-once accessor for a family's night-0 standing store. The
    * bootstrap runs OUTSIDE any map lock (a full Spark job inside
    * `computeIfAbsent` would hold the CHM bin lock and block unrelated
    * keys hashing to the same bin); a lost publication race discards the
    * duplicate and adopts the winner. */
  private def standingStore(family: String, dir: String)(build: String => Unit): String = {
    val key = s"$family:$dir"
    val existing = standingStores.get(key)
    if (existing != null) return existing
    standingReaper
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-standing-$family").toString
    build(root)
    val winner = standingStores.putIfAbsent(key, root)
    if (winner == null) root
    else { deleteRecursively(new java.io.File(root)); winner }
  }

  /** Untimed bench/battery fixture prep: build every night-0 standing
    * store the nightly queries fold from. Night-0 bootstrap is a
    * once-EVER corpus cost (like generating the test data), not part of
    * the recurring nightly job the per-query records are meant to
    * measure — benches call this during warmup so the committed nightly
    * timings measure only the recurring ingest (the bootstrap seconds
    * are reported separately in the bench diagnostics). */
  def prewarmStandingFixtures(s: SparkSession, dir: String): Unit = {
    manifestStandingStore(s, dir)
    retrievalStandingStore(s, dir)
    ledgerStandingStore(s, dir)
    annStandingStore(s, dir)
    annPqStandingStore(s, dir)
    annComposedStandingStore(s, dir)
    graft.ops.Materialize.dropAll() // fixture prep must not leak scratch
  }

  /** The asset corpus every manifest-family query folds over — built with
    * the EXACT plan (and Materialize tag) the other asset queries use, so
    * the content-addressed index is shared across the battery. */
  private def manifestCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = td(s, dir)
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("zzzz"), expr("substring(text, 5)")).as("text"))
    graft.ops.Materialize.index(
      docs.select("doc_id", "text").unionByName(copies), "asset-corpus")
  }

  /** Night-0 manifest store: bootstrap the standing fingerprint + cluster
    * snapshot over the non-delta corpus, once per corpus per JVM. Exposed
    * through [[prewarmStandingFixtures]] so benches pay this once-ever
    * cost in untimed fixture prep. */
  private def manifestStandingStore(s: SparkSession, dir: String): String =
    standingStore("manifest", dir) { root =>
      val corpus = manifestCorpus(s, dir)
      graft.ops.StandingState.bootstrap(
        graft.ops.Multimodal.assetsFromText(
          corpus.filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 7 =!= 2),
          "doc_id", "text"),
        root)
    }

  /** NIGHTLY asset-manifest maintenance — the PERSISTED form of
    * [[pipelineAssetManifestIncremental]], with the standing state
    * crossing a real write/read boundary instead of being re-derived
    * in-query: night 0 bootstraps the base corpus's fingerprint +
    * cluster tables into a snapshot store
    * ([[graft.ops.StandingState.bootstrap]] — the only corpus-sized
    * fingerprint pass AND the only corpus-sized write, paid once per
    * JVM); each subsequent night READS the latest snapshot
    * (witness-verified: a tampered file refuses the fold loudly),
    * fingerprints ONLY its delta, probes delta↔standing via the
    * cross-set block probes, folds the assignment forward, and APPENDS
    * the delta — the new fingerprints plus only the cluster rows whose
    * assignment changed, committed as a new snapshot that inherits the
    * base partitions by reference (per-night write volume is
    * delta-sized, never standing-sized). TWO nights chain here (delta₁
    * = ids ≡ 3 mod 7, delta₂ = ids ≡ 2 mod 7), and the manifest emits
    * from the night-2 cluster assignment as read back from disk — so
    * the oracle (the verbatim full-recompute manifest SQL shared with
    * the flagship and the in-query incremental form) proves
    * merge ≡ recompute ACROSS the persistence boundary, not just
    * within one plan.
    *
    * Retention runs in-flow both ways: the store first rolls back to
    * the standing bootstrap (reclaiming the PRIOR run's delta
    * snapshots, so recurring runs never accumulate state), and after
    * night 2 commits, night 1's superseded snapshot is retired — one
    * witness file; its delta partitions survive because night 2
    * references them.
    *
    * Scale shape: steady-state nightly cost is sized by the delta —
    * fingerprint math touches only delta payloads, the block probes key
    * on buckets, the cluster fold contracts to delta-cluster edges, and
    * every standing partition is range-clustered on id so the fold's
    * id-keyed joins prune files by footer min/max. The corpus-sized
    * work left per night is the manifest's scan-side metadata
    * projection, which carries no fingerprint math. */
  def pipelineAssetManifestNightly(s: SparkSession, dir: String): DataFrame = {
    val corpus = manifestCorpus(s, dir)
    def assetsOf(d: DataFrame) =
      graft.ops.Multimodal.assetsFromText(d, "doc_id", "text")
    // copies carry doc_id + 10^6 ≡ doc_id + 1 (mod 7), so a copy and its
    // original land in DIFFERENT nights for most residues — exactly the
    // cross-night edges the standing-state probe exists for
    val store = manifestStandingStore(s, dir)
    // recurring-run retention: refold tonight's chain from the standing
    // bootstrap; the prior run's delta snapshots retire here
    graft.ops.StandingState.rollbackTo(s, store, 0L)
    graft.ops.StandingState.ingest(
      assetsOf(corpus.filter(col("doc_id") % 7 === 3)), store)
    val night1 = graft.ops.StandingState.latestSnapshot(s, store)
    graft.ops.StandingState.ingest(
      assetsOf(corpus.filter(col("doc_id") % 7 === 2)), store)
    // retention: night 1 was read and superseded by night 2's committed
    // snapshot — retire it (witness-gated; the bootstrap snapshot
    // survives as the chain's fixture base, night-1 partitions survive
    // by reference from night 2)
    graft.ops.StandingState.retireSnapshot(s, store, night1)
    // manifest from the PERSISTED night-2 assignment — read back through
    // the witness gate like any consumer of the standing lake would
    val clusters = graft.ops.StandingState.readClusters(s, store)
    val drops = clusters.filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as("asset_id"))
    val assets = assetsOf(corpus)
    val captions = corpus.select(col("doc_id").as("asset_id"),
      expr("array_join(slice(split(text, ' '), 1, 10), ' ')").as("caption"))
    assets
      .join(drops, Seq("asset_id"), "left_anti")
      .filter(col("meta.width") >= 100)
      .select(col("asset_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_bytes").as("n_bytes"))
      .join(captions, "asset_id")
      .withColumn("caption_tokens", size(split(col("caption"), " ")).cast("long"))
      .filter(col("caption_tokens") >= 5)
      .select(col("asset_id"), col("width"), col("height"), col("n_bytes"),
        col("caption_tokens"), md5(col("caption")).as("caption_md5"))
      .orderBy("asset_id")
  }

  /** Cross-modal MISMATCH gate — the curation check the caption join
    * enables: flag assets whose caption disagrees with their content.
    * The content-side token profile is read from the DECODED binary
    * payload (the stub decode seam; a real deployment substitutes
    * caption-model/CLIP agreement here — the gate's plumbing and the
    * fixed-point scoring stay identical), the caption-side profile from
    * the caption string; agreement = caption-token containment in the
    * content profile, computed in 4-dp fixed-point integers
    * (`(2i·10⁴ + n) div (2n)`, positive regime) so the flag cannot fork
    * on a rounding half. Planted mismatches: every 13th asset's caption
    * is character-reversed (its tokens vanish from the content profile,
    * containment ≈ 0 vs exactly 1.0 for honest captions). Scored like
    * `lang_mismatch` grounds lang metadata — this grounds caption
    * quality for the asset manifest. */
  def multimodalMismatch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val assets = graft.ops.Multimodal.assetsFromText(docs, "doc_id", "text")
    val captions = docs.select(col("doc_id").as("asset_id"),
      expr("""IF(doc_id % 13 = 0,
             |   reverse(array_join(slice(split(text, ' '), 1, 10), ' ')),
             |   array_join(slice(split(text, ' '), 1, 10), ' '))""".stripMargin)
        .as("caption"))
    graft.ops.Multimodal.captionAgreement(assets, captions)
      .orderBy("asset_id")
  }

  /** Video-style near-dup over frame-fingerprint sets
    * ([[graft.ops.Multimodal.videoPairs]]): per-frame aHash → inverted
    * index on exact frame fingerprints (df-capped: a ubiquitous frame
    * must not make an m² bucket) → set-Jaccard verify. Robust to the
    * TEMPORAL edits (segment replacement, trims) that move every bit of
    * a whole-asset fingerprint — the planted copies replace one full
    * sampled frame window (chars 129–256) and still pair at high
    * Jaccard, while aHash/dHash would need the whole payload to stay
    * close. The planted 'yyyy…' window is itself the stop-frame demo:
    * every copy shares its all-zero fingerprint, so the df-cap is what
    * keeps the candidate bucket from going quadratic. */
  def multimodalVideoDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = td(s, dir)
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(expr("substring(text, 1, 128)"), lit("y" * 128),
          expr("substring(text, 257)")).as("text"))
    val corpus = graft.ops.Materialize.index(
      docs.select("doc_id", "text").unionByName(copies), "video-corpus")
    graft.ops.Multimodal.videoPairs(
      graft.ops.Multimodal.assetsFromText(corpus, "doc_id", "text"))
      .orderBy("id_a", "id_b")
  }

  /** Multimodal eval-set DECONTAMINATION — the asset analog of
    * `decontaminate_fuzzy`: flag training assets perceptually within
    * hamming ≤ 2 of ANY held-out eval asset, so a re-encoded copy of an
    * eval image smuggled into the training set is caught even though its
    * bytes (and exact hash) differ. Planted leaks: re-ingested copies of
    * eval assets under new ids with the standard 4-byte edit.
    *
    * Scale shape: this is [[graft.ops.Multimodal.phashPairsDelta]]'s
    * cross-set block probe with train as the "delta" and the (much
    * smaller) eval set as the standing side — train fingerprints once,
    * probes key on block buckets, and the flag join is id-keyed. Only
    * the CROSS pairs gate (train↔train near-dups are dedup's business,
    * not contamination). */
  def multimodalDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = td(s, dir)
    val evalDocs = docs.filter(col("doc_id") % 17 === 0).select("doc_id", "text")
    val leaks = evalDocs.filter(col("doc_id") % 34 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("zzzz"), expr("substring(text, 5)")).as("text"))
    val train = docs.filter(col("doc_id") % 17 =!= 0).select("doc_id", "text")
      .unionByName(leaks)
    val pairs = graft.ops.Multimodal.phashPairsDelta(
      graft.ops.Multimodal.assetsFromText(train, "doc_id", "text"),
      graft.ops.Multimodal.assetsFromText(evalDocs, "doc_id", "text"))
      .select("id_a", "id_b")
    val evalIds = evalDocs.select(col("doc_id").as("eid"))
    val contaminated = pairs.join(evalIds, pairs("id_a") === evalIds("eid"))
      .select(col("id_b").as("doc_id"))
      .unionByName(pairs.join(evalIds, pairs("id_b") === evalIds("eid"))
        .select(col("id_a").as("doc_id")))
      .distinct()
      .withColumn("contaminated", lit(true))
    train.select("doc_id")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .orderBy("doc_id")
  }

  /** SEMANTIC eval-set decontamination — the embedding-space member of
    * the family (`decontaminate` catches verbatim 8-gram leaks,
    * `decontaminate_fuzzy` near-verbatim edits, `multimodal_decontaminate`
    * re-encoded assets): a PARAPHRASED eval item shares no n-grams and no
    * perceptual bits with its source, but its embedding still sits at
    * cosine ≈ 1. Flag every training vector whose max cosine to ANY
    * held-out eval vector ≥ 0.9 (natural cross-set ceiling on this corpus
    * is 0.43, so the gate discriminates). Planted leaks: eval vectors
    * re-ingested under new ids SCALED ×2 — cosine is scale-invariant, so
    * the "paraphrase" scores exactly 1.0 while byte/exact-hash equality
    * (and every gram family) misses it.
    *
    * Scale shape: eval suites are tiny (thousands of rows) next to a
    * 100 TB training corpus, so the eval side BROADCASTS and scoring is
    * ONE pass over train — a broadcast nested-loop producing |train|×|eval|
    * skinny (id, cos) rows that partial-aggregate to one max per train id
    * map-side before the id-keyed shuffle. No train-side join, no
    * candidate index needed: the broadcast IS the scale path when one
    * side is eval-sized (the `decontaminate` broadcast-gram precedent). */
  def embedDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val evalSet = e.filter(col("vec_id") % 19 === 0)
    val leaks = e.filter(col("vec_id") % 38 === 0)
      .select((col("vec_id") + 9000000L).as("vec_id"),
        expr("transform(v, x -> x * 2.0D)").as("v"))
    val train = e.filter(col("vec_id") % 19 =!= 0).unionByName(leaks)
    val scored = train.select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(evalSet.select(col("v").as("ev"))))
      .groupBy("qid")
      .agg(max(round(Similarity.cosine(col("qv"), col("ev")), 4)).as("max_eval_cos"))
    train.select("vec_id")
      .join(scored, col("vec_id") === col("qid"), "left")
      .select(col("vec_id"), col("max_eval_cos"),
        coalesce(col("max_eval_cos") >= 0.9, lit(false)).as("contaminated"))
      .orderBy("vec_id")
  }

  /** Composed decontamination recall matrix — the sign-off table a
    * training run reads before trusting its eval numbers: three leak
    * classes are PLANTED from the held-out suite (verbatim copies,
    * every-7th-word paraphrases, scaled-vector semantic copies with
    * unrelated text) beside the natural corpus, then ALL THREE gate
    * families run over the union — exact 8-gram overlap
    * ([[graft.ops.TextAnalysis.contamination]]), fuzzy MinHash cross-set
    * banding at the recall-heavy 8×1 config
    * ([[graft.ops.Dedup.crossSetNearDups]]; decontamination wants recall
    * over precision, the banding the `lsh_band_sweep` s-curve points at),
    * and max-eval-cosine ≥ 0.9 (the [[embedDecontaminate]] rule) — and
    * the census reports per-cohort catch counts. The point IS the
    * complementarity: verbatim falls to exact+fuzzy, the paraphrase
    * defeats every 8-gram (a swap every 7 words leaves no intact window)
    * but not the gram-minhash, and the scaled vector is invisible to
    * both text gates while cosine's scale-invariance scores it exactly
    * 1.0.
    *
    * Scale shape: every eval-sided structure broadcasts (gram set,
    * banded bench index, eval vectors — eval suites are tiny next to
    * 100 TB of train); each channel is its own already-proven one-pass
    * shape over the train scan, and the census joins only skinny
    * (id, bool) channel outputs before a 4-group aggregate. Plant
    * construction is eval-sized. Plant vectors for the text-channel
    * cohorts are ROTATED (unrelated direction, natural-level cosine) so
    * each cohort isolates its own family. */
  def pipelineDecontamMatrix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text", "source")
    val emb = t(s, dir, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val withV = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), lower(col("text")).as("text"), col("source"), col("v"))
    val evalSet = withV.filter(col("source") === "src0")
      .select("doc_id", "text", "v")
    val natural = withV.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"), col("v"), lit("natural").as("cohort"))
    val plantVerbatim = evalSet.select(
      (col("doc_id") + 10000000L).as("doc_id"), col("text"),
      expr("concat(slice(v, 17, 48), slice(v, 1, 16))").as("v"),
      lit("plant_verbatim").as("cohort"))
    val plantParaphrase = evalSet.select(
      (col("doc_id") + 20000000L).as("doc_id"),
      expr("concat_ws(' ', transform(split(text, ' '), (w, i) -> " +
        "IF(i % 7 = 0, 'zzleak', w)))").as("text"),
      expr("concat(slice(v, 33, 32), slice(v, 1, 32))").as("v"),
      lit("plant_paraphrase").as("cohort"))
    val plantSemantic = evalSet.select(
      (col("doc_id") + 30000000L).as("doc_id"),
      lit("zz zz zz zz zz zz zz zz").as("text"),
      expr("transform(v, x -> x * 2.0D)").as("v"),
      lit("plant_semantic").as("cohort"))
    val train = natural.unionByName(plantVerbatim)
      .unionByName(plantParaphrase).unionByName(plantSemantic)
    val exact = TextAnalysis.contamination(train, evalSet, shingleWords = 8)
      .select(col("doc_id"), col("contaminated").as("ex"))
    val fuzzy = Dedup.crossSetNearDups(train, evalSet, "doc_id", "text",
        numHashes = 8, rowsPerBand = 1)
      .select(col("doc_id"), col("contaminated").as("fz"))
    val sem = train.select(col("doc_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(evalSet.select(col("v").as("ev"))))
      .groupBy("qid")
      .agg(max(round(Similarity.cosine(col("qv"), col("ev")), 4)).as("mx"))
      .select(col("qid").as("doc_id"), (col("mx") >= 0.9).as("se"))
    train.select("doc_id", "cohort")
      .join(exact, "doc_id").join(fuzzy, "doc_id").join(sem, "doc_id")
      .groupBy("cohort")
      .agg(count(lit(1)).as("n"),
        sum(col("ex").cast("long")).as("exact_n"),
        sum(col("fz").cast("long")).as("fuzzy_n"),
        sum(col("se").cast("long")).as("semantic_n"),
        sum((col("ex") || col("fz") || col("se")).cast("long")).as("any_n"))
      .orderBy("cohort")
  }

  /** Eval-suite DELTA decontamination sweep — the operational event the
    * standing decontamination ledger exists for: a NEW benchmark lands
    * (and, as happens in practice, accidentally contains text and
    * near-copies of documents already in the training corpus), and the
    * corpus must be re-swept WITHOUT a full re-scan against the whole
    * grown suite. The sweep runs against the delta only and the merged
    * verdict is the OR of the standing ledger and the delta flags.
    *
    * The load-bearing design fact: that merge is exact ONLY for
    * union-decomposable gates — the verbatim PRESENCE gate (any shared
    * 8-gram: shared-with-union ⟺ shared-with-either) and the semantic
    * MAX gate (max cosine over a union = greatest of the per-set
    * maxima) decompose; the [[decontaminate]] overlap-RATIO gate does
    * NOT (0.15 of v1 grams + 0.10 of distinct delta grams crosses a 0.2
    * threshold that neither sweep sees). The oracle PROVES the
    * decomposition rather than replaying it: Spark emits the
    * incremental OR-merge while the oracle recomputes `contaminated`
    * from one full-union sweep — hash equality is merge ≡ recompute,
    * the [[pipelineAssetManifestIncremental]] proof pattern.
    *
    * Planted delta leaks: the new benchmark includes verbatim copies of
    * train docs (doc_id % 97) and ×2-scaled copies of train vectors
    * (doc_id % 89) — cosine's scale-invariance scores the latter
    * exactly 1.0.
    *
    * Scale shape: the delta side is benchmark-sized and BROADCASTS
    * (gram set and vector list both); the sweep is one pass over the
    * standing corpus with map-side partial aggregation, and the ledger
    * merge is a per-doc OR on skinny (id, bool) columns. Nothing
    * corpus-sized shuffles; docs without embeddings take the defined
    * semantic-false path. */
  def decontamEvalDelta(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), lower(col("text")).as("text"), col("source"))
    val emb = t(s, dir, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val evalV1 = docs.filter(col("source") === "src0")
    // natural delta: a deterministic third of src1 (src assignment is
    // doc_id % 20, so ids ≡ 1 mod 20 hit doc_id % 3 == 0 for a third of
    // them — a % 5 predicate would select NOTHING from src1)
    val isDeltaNat = col("source") === "src1" && col("doc_id") % 3 === 0
    val deltaNat = docs.filter(isDeltaNat)
    val train = docs.filter(col("source") =!= "src0" && !isDeltaNat)
    val deltaTxt = deltaNat.select("doc_id", "text").unionByName(
      train.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 40000000L).as("doc_id"), col("text")))
    def gramFlag(bench: DataFrame, name: String) =
      TextAnalysis.contamination(train, bench, shingleWords = 8)
        .select(col("doc_id"), (col("n_hits") >= 1).as(name))
    val trainVec = train.select("doc_id")
      .join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("v"))
    val v1Vecs = evalV1.select("doc_id")
      .join(emb, col("doc_id") === col("vec_id")).select(col("v"))
    val deltaVecs = deltaNat.select("doc_id")
      .join(emb, col("doc_id") === col("vec_id")).select(col("v"))
      .unionByName(trainVec.filter(col("doc_id") % 89 === 0)
        .select(expr("transform(v, x -> x * 2.0D)").as("v")))
    def cosFlag(vs: DataFrame, name: String) =
      trainVec.select(col("doc_id").as("qid"), col("v").as("qv"))
        .crossJoin(broadcast(vs.select(col("v").as("ev"))))
        .groupBy("qid")
        .agg(max(round(Similarity.cosine(col("qv"), col("ev")), 4)).as("mx"))
        .select(col("qid").as("doc_id"), (col("mx") >= 0.9).as(name))
    train.select("doc_id")
      .join(gramFlag(evalV1, "verbatim_v1"), "doc_id")
      .join(gramFlag(deltaTxt, "verbatim_new"), "doc_id")
      .join(cosFlag(v1Vecs, "semantic_v1"), Seq("doc_id"), "left")
      .join(cosFlag(deltaVecs, "semantic_new"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("verbatim_v1"),
        coalesce(col("semantic_v1"), lit(false)).as("semantic_v1"),
        col("verbatim_new"),
        coalesce(col("semantic_new"), lit(false)).as("semantic_new"))
      .withColumn("contaminated",
        col("verbatim_v1") || col("semantic_v1")
          || col("verbatim_new") || col("semantic_new"))
      .orderBy("doc_id")
  }

  /** THREE-suite decontamination ledger chain — the associativity pin a
    * quarterly benchmark cadence actually exercises, extending
    * [[decontamEvalDelta]]'s one-delta proof: eval suite v1 plus TWO
    * later benchmark deltas are folded SERIALLY into the ledger
    * (ledger₂ = (ledger₀ ∨ sweep(d₁)) ∨ sweep(d₂)) while the oracle
    * recomputes every prefix from a FULL-UNION sweep — hash equality
    * pins that the per-suite OR-fold is associative and order-stable
    * for the union-decomposable gates (8-gram presence, max cosine) at
    * N = 3, not just N = 2. Planted leaks land one per delta: verbatim
    * copies of train docs ride d₁ (ids % 101), ×2-scaled train vectors
    * ride d₂ (ids % 103, caught ONLY by the semantic gate).
    *
    * Scale shape: identical to [[decontamEvalDelta]] — each suite is
    * benchmark-sized and BROADCASTS (gram set + vector list), each
    * sweep is one pass over the standing corpus with map-side partial
    * aggregation, and the ledger fold is a per-doc OR on skinny
    * (id, bool) columns; the corpus never re-shuffles, and suite count
    * grows the broadcast list, not the scan count per suite (one scan
    * per new benchmark, the nightly cadence). */
  def decontamLedgerChain(s: SparkSession, dir: String): DataFrame = {
    val (ids, flags) = ledgerSuiteFlags(s, dir)
    ids
      .join(flags(0).withColumnRenamed("flag", "a0"), "doc_id")
      .join(flags(1).withColumnRenamed("flag", "a1"), "doc_id")
      .join(flags(2).withColumnRenamed("flag", "a2"), "doc_id")
      // the serial ledger fold, one column per "quarter"
      .select(col("doc_id"), col("a0").as("after_v1"),
        (col("a0") || col("a1")).as("after_d1"),
        (col("a0") || col("a1") || col("a2")).as("after_d2"))
      .orderBy("doc_id")
  }

  /** Night-0 decontamination-ledger store (same lifecycle rationale as
    * [[manifestStandingStore]]): the v1 sweep, persisted LONG-format —
    * one (doc_id, suite, flag) row per doc per benchmark suite, so each
    * later benchmark APPENDS its own partition instead of rewriting the
    * widening table. */
  private def ledgerStandingStore(s: SparkSession, dir: String): String =
    standingStore("ledger", dir) { root =>
      val (ids, flags) = ledgerSuiteFlags(s, dir)
      graft.ops.StandingState.writeTables(root, Seq(
        graft.ops.StandingState.TableSpec("ledger",
          ids.join(flags(0), "doc_id")
            .select(col("doc_id"), lit("v1").as("suite"), col("flag")),
          "doc_id")))
    }

  /** PERSISTED decontamination-ledger maintenance — the THIRD standing
    * table through [[graft.ops.StandingState]] (manifest state, the
    * retrieval index, now the ledger — closing the standing
    * "fingerprint/cluster/ledger" set): the per-doc verdict table lives
    * in a snapshot store behind the tamper witness with ONE PARTITION
    * PER BENCHMARK SUITE ((doc_id, suite, flag) long format), night 0
    * sweeps the corpus against v1, each later benchmark's nightly run
    * sweeps ONLY the new suite (benchmark-sized broadcast, one corpus
    * pass) and APPENDS its verdict partition — per-night write volume
    * is one boolean column's worth of rows, never the widening ledger.
    * Serving the prefix verdicts is a pure suite-OR over the persisted
    * flags (one max-of-struct-free partial aggregate) — rebuilding any
    * historical "as-of benchmark k" verdict without re-sweeping
    * anything. Output (and oracle — per-prefix full-union recompute,
    * shared VERBATIM with [[decontamLedgerChain]]) proves the persisted
    * fold ≡ the in-query fold ≡ from-scratch sweeps at every prefix. */
  def decontamLedgerNightly(s: SparkSession, dir: String): DataFrame =
    ledgerAsOfColumns(
      graft.ops.StandingState.readTable(s, ledgerNightlyChain(s, dir)._1, "ledger"))
      .orderBy("doc_id")

  /** Run the two benchmark-delta ledger nights against the standing v1
    * store — shared by the nightly, tenant as-of, and time-travel keys.
    * Returns (store, night-1 snapshot id); `retireIntermediate` retires
    * night 1 after night 2 commits (the retention demonstration) —
    * time travel keeps it, because history IS the point there. */
  private def ledgerNightlyChain(
      s: SparkSession, dir: String, retireIntermediate: Boolean = true): (String, Long) = {
    import graft.ops.StandingState
    import graft.ops.StandingState.TableSpec
    val (ids, flags) = ledgerSuiteFlags(s, dir)
    val store = ledgerStandingStore(s, dir)
    // recurring-run retention: refold from the standing v1 snapshot
    StandingState.rollbackTo(s, store, 0L)
    def night(f: DataFrame, name: String): Unit = {
      StandingState.appendTables(store, Seq(TableSpec("ledger",
        ids.join(f, "doc_id")
          .select(col("doc_id"), lit(name).as("suite"), col("flag")),
        "doc_id")))
      ()
    }
    night(flags(1), "d1")
    val night1 = StandingState.latestSnapshot(s, store)
    night(flags(2), "d2")
    if (retireIntermediate)
      StandingState.retireSnapshot(s, store, night1) // superseded night
    (store, night1)
  }

  /** SNAPSHOT TIME TRAVEL on the persisted ledger — the lake-table
    * feature the snapshot store gives for free, here PROVEN rather than
    * assumed: any committed snapshot stays exactly readable after later
    * commits (data partitions are immutable, witnesses are
    * per-snapshot), so the "as of benchmark d1" ledger is served by
    * reading the night-1 SNAPSHOT after night 2 has committed on the
    * same store — no rewind job, no re-sweep, no copy made in advance.
    * The oracle recomputes the v1/d1 prefix verdicts from full-union
    * sweeps (the chain oracle, projected): equality proves the
    * historical read is bit-exact, not merely plausible. */
  def decontamLedgerTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val (store, night1) = ledgerNightlyChain(s, dir, retireIntermediate = false)
    graft.ops.StandingState.readTable(s, store, "ledger", night1)
      .groupBy("doc_id")
      .agg(
        max(when(col("suite") === "v1", col("flag"))).as("f_v1"),
        max(when(col("suite") === "d1", col("flag"))).as("f_d1"))
      .select(col("doc_id"), col("f_v1").as("after_v1"),
        (col("f_v1") || col("f_d1")).as("after_d1"))
      .orderBy("doc_id")
  }

  /** The persisted decontamination ledger ON THE TENANT SURFACE: the
    * standing long-format ledger is registered as a read-only tenant
    * view and the "as of benchmark k" verdicts are served as ONE gated
    * tenant SQL statement (a pure suite-OR pivot over the persisted
    * flags — no re-sweep), through the same plan-level read-only gate
    * and relation substitution as every tenant statement. The oracle is
    * [[decontamLedgerChain]]'s per-prefix full-union recompute, shared
    * verbatim — proving the wire-served as-of ≡ from-scratch sweeps. */
  def decontamLedgerAsof(s: SparkSession, dir: String): DataFrame = {
    val store = ledgerNightlyChain(s, dir)._1
    val registry = graft.schema.SchemaRegistry(
      graft.schema.Org("pipeline", Seq.empty))
    val tenant = graft.frontend.TenantSession.open(
      s, registry, "pipeline", graft.sources.SourceSet())
    tenant.registerView("decontam_ledger",
      graft.ops.StandingState.readTable(tenant.spark, store, "ledger"))
    tenant.sql(
      """SELECT doc_id, f_v1 AS after_v1, f_v1 OR f_d1 AS after_d1,
        |  f_v1 OR f_d1 OR f_d2 AS after_d2
        |FROM (SELECT doc_id,
        |        max(CASE WHEN suite = 'v1' THEN flag END) AS f_v1,
        |        max(CASE WHEN suite = 'd1' THEN flag END) AS f_d1,
        |        max(CASE WHEN suite = 'd2' THEN flag END) AS f_d2
        |      FROM decontam_ledger GROUP BY doc_id)
        |ORDER BY doc_id""".stripMargin)
  }

  /** SNAPSHOT TIME TRAVEL on the TENANT SURFACE — the serving form of
    * [[decontamLedgerTimeTravel]]: after benchmark d2 has committed, a
    * tenant queries "the ledger exactly as benchmark d1 saw it" over
    * the wire, via a read-only view pinned to the night-1 SNAPSHOT
    * (`readTable(snap)` — immutable data partitions + per-snapshot
    * witness, so the historical read costs nothing to serve and cannot
    * drift). The view rides the same relation substitution and
    * read-only plan gate as every tenant statement; a second,
    * UNPINNED view on the same store would see d2 — the spec pins that
    * divergence over the wire. Oracle: the chain oracle's v1/d1 prefix
    * projection, shared verbatim with the time-travel key — proving
    * the wire-served historical verdicts ≡ from-scratch sweeps. */
  def decontamLedgerSnapshotServed(s: SparkSession, dir: String): DataFrame = {
    val (store, night1) = ledgerNightlyChain(s, dir, retireIntermediate = false)
    val registry = graft.schema.SchemaRegistry(
      graft.schema.Org("pipeline", Seq.empty))
    val tenant = graft.frontend.TenantSession.open(
      s, registry, "pipeline", graft.sources.SourceSet())
    tenant.registerView("decontam_ledger_d1",
      graft.ops.StandingState.readTable(tenant.spark, store, "ledger", night1))
    tenant.sql(
      """SELECT doc_id, f_v1 AS after_v1, f_v1 OR f_d1 AS after_d1
        |FROM (SELECT doc_id,
        |        max(CASE WHEN suite = 'v1' THEN flag END) AS f_v1,
        |        max(CASE WHEN suite = 'd1' THEN flag END) AS f_d1
        |      FROM decontam_ledger_d1 GROUP BY doc_id)
        |ORDER BY doc_id""".stripMargin)
  }

  /** The as-of pivot every ledger consumer (this query and the tenant
    * SQL view) shares: per doc, the serial prefix verdicts — any "as of
    * benchmark k" answer is a pure OR over the persisted suite flags. */
  private[graft] def ledgerAsOfColumns(ledgerLong: DataFrame): DataFrame =
    ledgerLong.groupBy("doc_id")
      .agg(
        max(when(col("suite") === "v1", col("flag"))).as("f_v1"),
        max(when(col("suite") === "d1", col("flag"))).as("f_d1"),
        max(when(col("suite") === "d2", col("flag"))).as("f_d2"))
      .select(col("doc_id"), col("f_v1").as("after_v1"),
        (col("f_v1") || col("f_d1")).as("after_d1"),
        (col("f_v1") || col("f_d1") || col("f_d2")).as("after_d2"))

  /** Per-suite merged flags (gram presence ∨ max cosine, one boolean per
    * train doc per suite) over the 3-suite fixture — the sweep core
    * [[decontamLedgerNightly]] persists one column per night of.
    * Returns (train ids, per-suite (doc_id, flag) frames for v1/d1/d2). */
  private def ledgerSuiteFlags(
      s: SparkSession, dir: String): (DataFrame, Seq[DataFrame]) = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), lower(col("text")).as("text"), col("source"))
    val emb = t(s, dir, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val evalV1 = docs.filter(col("source") === "src0")
    val isD1 = col("source") === "src2" && col("doc_id") % 3 === 2
    val isD2 = col("source") === "src3" && col("doc_id") % 3 === 0
    val d1nat = docs.filter(isD1)
    val d2nat = docs.filter(isD2)
    val train = docs.filter(col("source") =!= "src0" && !isD1 && !isD2)
    val d1txt = d1nat.select("doc_id", "text").unionByName(
      train.filter(col("doc_id") % 101 === 0)
        .select((col("doc_id") + 50000000L).as("doc_id"), col("text")))
    val trainVec = train.select("doc_id")
      .join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("v"))
    def vecsOf(suite: DataFrame) = suite.select("doc_id")
      .join(emb, col("doc_id") === col("vec_id")).select(col("v"))
    val d2Vecs = vecsOf(d2nat).unionByName(
      trainVec.filter(col("doc_id") % 103 === 0)
        .select(expr("transform(v, x -> x * 2.0D)").as("v")))
    def suiteFlag(bench: DataFrame, vs: DataFrame): DataFrame = {
      val g = TextAnalysis.contamination(train, bench, shingleWords = 8)
        .select(col("doc_id"), (col("n_hits") >= 1).as("g"))
      val c = trainVec.select(col("doc_id").as("qid"), col("v").as("qv"))
        .crossJoin(broadcast(vs.select(col("v").as("ev"))))
        .groupBy("qid")
        .agg(max(round(Similarity.cosine(col("qv"), col("ev")), 4)).as("mx"))
        .select(col("qid").as("doc_id"), (col("mx") >= 0.9).as("c"))
      // materialized: the chain and nightly forms build PLAN-IDENTICAL
      // flag frames through this one helper, so the battery computes
      // each suite's sweep once and both queries read the shared index
      graft.ops.Materialize.index(
        g.join(c, Seq("doc_id"), "left")
          .select(col("doc_id"), (col("g") || coalesce(col("c"), lit(false))).as("flag")),
        "ledger-flag")
    }
    (train.select("doc_id"), Seq(
      suiteFlag(evalV1.select("doc_id", "text"), vecsOf(evalV1)),
      suiteFlag(d1txt, vecsOf(d1nat)),
      suiteFlag(d2nat.select("doc_id", "text"), d2Vecs)))
  }

  /** Exact-substring novelty dedup ([[graft.ops.Dedup.substringNovelty]]):
    * per document, the fraction of its distinct word 8-grams it is the
    * FIRST (min-id) owner of — the linear suffix-array-dedup
    * approximation that catches mosaic re-emissions pairwise dedup
    * can't. */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    // spread: the ~93-md5s-per-doc shingle explode otherwise runs at the
    // single-row-group fixture's parallelism — ONE task on 32 cores
    // (profiled 1.95 s in one 4-task execution; the exact serial-map
    // hazard Materialize.spread documents). No-op on a real lake layout.
    Dedup.substringNovelty(td(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Corpus-trained bigram LM scoring ([[graft.ops.TextAnalysis.lmScore]]):
    * the CCNet-style perplexity quality signal, average negative
    * log-likelihood under add-k-smoothed corpus bigram statistics. */
  def lmPerplexity(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScore(td(s, dir))
      .orderBy("doc_id")

  /** Z-order layout ([[graft.ops.Layout.zorder]]): rewrite the table
    * clustered on the Morton interleave of two columns, then return the
    * round-tripped rows with the (integer-exact, oracle-mirrored)
    * Z-value — proving both the writer round-trip and the bit
    * interleave. The multi-dim file-skipping effect itself is pinned in
    * LayoutSpec (both dims' per-file ranges narrow; single-key
    * clustering leaves the second at full width). */
  def layoutZorder(s: SparkSession, dir: String): DataFrame = {
    val out = graft.ops.Layout.zorder(
      t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
      graft.ops.Materialize.scratchDir("zorder"),
      targetRowsPerFile = 200, colA = "doc_id", colB = "n_chars")
    out.select(col("doc_id"), col("n_chars"),
      graft.ops.Layout.zValue(
        pmod(col("doc_id"), lit(65536L)), pmod(col("n_chars"), lit(65536L))).as("zval"))
      .orderBy("doc_id")
  }

  /** Zone-map skipping audit — the number that justifies
    * [[graft.ops.Layout.zorder]]: model BOTH layouts' file assignment
    * deterministically (exact ntile in layout order: insertion order vs
    * Morton order), derive each file's (doc_id, n_chars) min/max zone
    * maps, and count the files a box predicate must scan under each.
    * Z-order should leave most files skippable on BOTH dimensions;
    * linear order only on the insertion key. The ntile model mirrors
    * what the physical writer's range-partitioned sort produces while
    * keeping file boundaries engine-deterministic; the audit itself at
    * lake scale reads footer metadata (n_files rows), so the global
    * ntile here is the modeling step, not the production plan. */
  def layoutSkipping(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = 25
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val zdocs = docs.withColumn("zval", graft.ops.Layout.zValue(
      pmod(col("doc_id"), lit(65536L)), pmod(col("n_chars"), lit(65536L))))
    val lin = docs
      .withColumn("f", ntile(files).over(Window.orderBy(col("doc_id"))))
      .withColumn("layout", lit("linear"))
    val zor = zdocs
      .withColumn("f", ntile(files).over(Window.orderBy(col("zval"), col("doc_id"))))
      .drop("zval")
      .withColumn("layout", lit("zorder"))
    val zone = lin.unionByName(zor).groupBy("layout", "f")
      .agg(min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        min("n_chars").as("min_nc"), max("n_chars").as("max_nc"))
    val b = broadcast(docs.agg(
      min("doc_id").as("i0"), max("doc_id").as("i1"),
      min("n_chars").as("c0"), max("n_chars").as("c1")))
    zone.crossJoin(b)
      .withColumn("loI", (col("i0") + floor((col("i1") - col("i0")) * 0.25)).cast("long"))
      .withColumn("hiI", (col("i0") + floor((col("i1") - col("i0")) * 0.35)).cast("long"))
      .withColumn("loC", (col("c0") + floor((col("c1") - col("c0")) * 0.3)).cast("long"))
      .withColumn("hiC", (col("c0") + floor((col("c1") - col("c0")) * 0.6)).cast("long"))
      .withColumn("hit_id",
        !(col("max_id") < col("loI") || col("min_id") > col("hiI")))
      .withColumn("hit_nc",
        !(col("max_nc") < col("loC") || col("min_nc") > col("hiC")))
      .withColumn("hit_box", col("hit_id") && col("hit_nc"))
      .groupBy("layout")
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("hit_id"), 1L).otherwise(0L)).as("scan_id_range"),
        sum(when(col("hit_nc"), 1L).otherwise(0L)).as("scan_nc_range"),
        sum(when(col("hit_box"), 1L).otherwise(0L)).as("scan_box"))
      .orderBy("layout")
  }

  /** CCNet head/middle/tail bucketing of the LM score
    * ([[graft.ops.TextAnalysis.lmBuckets]]): per-language exact
    * percentile cuts, broadcast back, scan-side bucket assignment. */
  def lmPplBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmBuckets(td(s, dir))
      .select("doc_id", "lang", "nll", "bucket")
      .orderBy("doc_id")

  /** DSIR-style importance weights
    * ([[graft.ops.TextAnalysis.dsirWeights]]): log-likelihood ratio of a
    * target-domain LM (trained on source src0) vs the general-corpus LM,
    * per document — positive log_weight ⇒ closer to the target domain. */
  def lmDsirWeights(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirWeights(td(s, dir), col("source") === "src0")
      .select("doc_id", "nll_gen", "nll_tgt", "log_weight")
      .orderBy("doc_id")

  /** Cluster-balanced subsample ([[graft.ops.Similarity.corpusCells]] +
    * deterministic per-cell bottom-k by content hash): even coverage of
    * the semantic space instead of mirroring its density. The per-cell
    * cut is the two-phase [[graft.ops.Retrieval.topKPerKey]] — a cell
    * holds corpus/centroids vectors, a data-sized window partition at
    * scale. */
  def embedCellSample(s: SparkSession, dir: String): DataFrame = {
    val cells = Similarity.corpusCells(
      t(s, dir, "embeddings"), "vec_id", "embedding", numCentroids = IvfCentroids)
      .withColumn("rk", md5(concat(col("vec_id").cast("string"), lit("cellsmp"))))
    Retrieval.topKPerKey(cells, Seq("cell"),
        Seq(col("rk").asc, col("vec_id").asc), 8)
      .select(col("vec_id"), col("cell"), col("rank").as("rn"))
      .orderBy("vec_id")
  }

  /** Semantic dedup over the embeddings
    * ([[graft.ops.Similarity.semanticDedup]], SemDeDup): IVF-cell
    * blocking + within-cell cosine pruning, lowest-id representative
    * kept; the oracle recomputes cells and within-cell pairs exactly. */
  def embedSemanticDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.35, numCentroids = IvfCentroids)
      .select(col("vec_id"), col("cell"), col("dup_of"), col("keep"))
      .orderBy("vec_id")

  /** Line-level corpus dedup ([[graft.ops.Dedup.lineDedup]], the
    * CCNet/RefinedWeb paragraph-dedup step; "lines" here are 10-word
    * blocks since the corpus has no newlines): corpus-wide duplicate
    * lines removed from every document, documents reassembled in order. */
  def dedupLines(s: SparkSession, dir: String): DataFrame =
    Dedup.lineDedup(t(s, dir, "documents"), "doc_id", "text", blockWords = 10)
      .orderBy("doc_id")

  /** Within-document repetition signals
    * ([[graft.ops.TextAnalysis.repetitionSignals]], the Gopher
    * duplicate-n-gram family): duplicate-gram fraction and top-gram
    * share for n=2,3 — all scan-side, zero shuffles. */
  def repetitionSignals(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionSignals(t(s, dir, "documents"))
      .select("doc_id", "dup2_frac", "top2_share", "dup3_frac", "top3_share", "keep")
      .orderBy("doc_id")

  /** Naive-Bayes language classifier ([[graft.ops.Classify.naiveBayes]],
    * the fastText-style corpus-filter shape): trained on the 80% slice
    * `doc_id % 10 < 8`, scored over everything. */
  def nbClassify(s: SparkSession, dir: String): DataFrame =
    Classify.naiveBayes(t(s, dir, "documents"), "doc_id", "lang", "text",
      trainFilter = col("doc_id") % 10 < 8)
      .orderBy("doc_id")

  /** Product-quantization codes ([[graft.ops.Similarity.pqCodes]]):
    * every embedding compressed to 4 subspace codes against the
    * deterministic stride-seeded codebooks. */
  def embedPqCodes(s: SparkSession, dir: String): DataFrame =
    Similarity.pqCodes(t(s, dir, "embeddings"), "vec_id", "embedding",
      m = PqM, subDim = PqSubDim, k = PqK)
      .orderBy("vec_id")

  /** PQ ANN via asymmetric distance ([[graft.ops.Similarity.pqTopK]]):
    * per-query lookup tables over the codebooks, corpus scanned as
    * codes only — the compressed-scan path that composes with IVF at
    * cluster scale (IVFADC). */
  def embedKnnPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      kNeighbors = 5, m = PqM, subDim = PqSubDim, k = PqK)
      .orderBy("query_id", "rank")
  }

  /** PQ shortlist + exact rerank ([[graft.ops.Similarity.pqTopKRerank]],
    * the IVFADC+rerank deployment shape): ADC nominates 50 candidates
    * per query from the code scan, exact distances rerank them. */
  def embedKnnPqRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.pqTopKRerank(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      kNeighbors = 5, shortlist = 50, m = PqM, subDim = PqSubDim, k = PqK)
      .orderBy("query_id", "rank")
  }

  /** IVFADC ([[graft.ops.Similarity.ivfadcTopK]]): inverted-file cell
    * routing + ADC code ranking of only the probed cells + exact rerank
    * of the shortlist — the billion-vector index layout end to end. */
  def embedKnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfadcTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      kNeighbors = 5, numCentroids = IvfCentroids, nprobe = IvfProbes,
      shortlist = 50, m = PqM, subDim = PqSubDim, k = PqK)
      .orderBy("query_id", "rank")
  }

  private val PqM = 4
  private val PqSubDim = 16
  private val PqK = 8

  /** HLL approximate distinct users per event type
    * ([[graft.ops.Hll.approxDistinct]]): md5-derived registers make the
    * sketch bit-reproducible, so approximate AND exact AND the relative
    * error are all oracle-checked. */
  def approxDistinctUsers(s: SparkSession, dir: String): DataFrame =
    Hll.approxDistinct(t(s, dir, "events"), "event_type", "user_id")
      .orderBy("event_type")

  /** The tenant-surface HLL aggregate
    * ([[graft.functions.HllDistinctSketch]], SQL `graft_approx_distinct`)
    * against the SAME DuckDB register-replay oracle as the DataFrame op —
    * proving the native TypedImperativeAggregate (register buffer merged
    * by max through partial aggregation) is bit-identical to the
    * oracle-checked encoding end-to-end, not just spec-equal to
    * [[graft.ops.Hll.estimate]]. */
  def approxDistinctFn(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    t(s, dir, "events").createOrReplaceTempView("ev_adfn")
    s.sql("""SELECT event_type, graft_approx_distinct(user_id) AS n_approx
            |FROM ev_adfn GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** The tenant-surface log-quantile aggregate
    * ([[graft.functions.LogQuantileSketch]], SQL `graft_quantile`)
    * against a DuckDB bucket-replay oracle — the quantile sibling of
    * [[approxDistinctFn]]: the fixed 126-bucket histogram buffer merges
    * by cellwise sum through partial aggregation, and the
    * first-bucket-reaching-⌈q·N⌉ midpoint estimate is pure integer
    * bucket math, so the wire value is bit-identical to the
    * oracle-checked `quantile_sketch` pipeline query under ANY
    * partitioning. Per (group × q) the shuffle carries one ≤ 1 KB
    * sketch whatever the row count — the 100 TB shape. */
  def quantileFn(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    t(s, dir, "events").createOrReplaceTempView("ev_qfn")
    s.sql("""SELECT event_type,
            |  graft_quantile(CAST(round(value * 100, 0) AS BIGINT), 0.5D) AS p50,
            |  graft_quantile(CAST(round(value * 100, 0) AS BIGINT), 0.9D) AS p90,
            |  graft_quantile(CAST(round(value * 100, 0) AS BIGINT), 0.99D) AS p99
            |FROM ev_qfn GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** The tenant-surface SpaceSaving aggregate
    * ([[graft.functions.TopKCountSketch]], SQL `graft_topk`) per GROUP,
    * against an exact-replay oracle — the third mergeable sketch on the
    * wire beside [[approxDistinctFn]] and [[quantileFn]]: per event
    * type, the top-5 users by event count. Capacity 4096 far exceeds
    * the per-type user vocabulary, so every partial buffer stays in the
    * EXACT regime (no eviction, err = 0) and the sketch's
    * (cnt desc, item asc) ranking is deterministic under any
    * partitioning — which is what lets a plain GROUP BY count + window
    * rank replay it row-for-row. Per (group × partition) the shuffle
    * carries one bounded counter table, not every distinct user. */
  def topkFn(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    t(s, dir, "events").createOrReplaceTempView("ev_tkfn")
    s.sql("""SELECT event_type, e.item AS user_key, e.cnt AS cnt, e.err AS err,
            |  CAST(pos + 1 AS BIGINT) AS rk
            |FROM (SELECT event_type,
            |        graft_topk(CAST(user_id AS STRING), 5, 4096) AS top
            |      FROM ev_tkfn GROUP BY event_type)
            |LATERAL VIEW posexplode(top) AS pos, e
            |ORDER BY event_type, rk""".stripMargin)
  }

  /** Sketch-union maintenance proof ([[graft.ops.Hll.registersBy]]): the
    * per-day register tables an append-only lake would persist, merged
    * by the register monoid (groupBy-max over the key), must estimate
    * BIT-IDENTICALLY to a from-scratch sketch over all events — the
    * mergeIndex contract applied to the sketch family. One partial-agg
    * shuffle per day's delta at any scale; nothing rescans history. */
  def sketchUnion(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val daily = graft.ops.Materialize.index(
      Hll.registersBy(ev, Seq("event_type", "day"), "user_id"), "hll-daily")
    val merged = daily.groupBy("event_type", "_bucket").agg(max("r").as("r"))
    Hll.estimateFromRegisters(merged, "event_type")
      .withColumnRenamed("n_approx", "n_merged")
      .join(Hll.estimate(ev, "event_type", "user_id")
        .withColumnRenamed("n_approx", "n_full"), "event_type")
      .select(col("event_type"), col("n_full"), col("n_merged"),
        (col("n_merged") === col("n_full")).as("merge_exact"))
      .orderBy("event_type")
  }

  /** Clustering-quality eval ([[graft.ops.Similarity.silhouette]]):
    * simplified per-cell silhouette over the IVF cells — the number
    * that says whether cell-blocked semantic dedup / sampling can
    * trust the cells. */
  def evalSilhouette(s: SparkSession, dir: String): DataFrame =
    Similarity.silhouette(t(s, dir, "embeddings"), "vec_id", "embedding",
      numCentroids = IvfCentroids)
      .orderBy("cell")

  /** BPE merge learning ([[graft.ops.Bpe.learnMerges]]): three merge
    * rounds over the corpus vocabulary — the ordered merge list a
    * tokenizer would persist, every round oracle-replayed. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.learnMerges(t(s, dir, "documents"), "text", rounds = 3)
      .orderBy("round")

  /** One k-means Lloyd iteration ([[graft.ops.Similarity.kmeansRefine]]):
    * assign → per-cell mean update (rounded 6, the determinism contract)
    * → reassign, reporting per-cell membership drift and centroid shift.
    * Iterated at ingest time this is how the production IVF index gets
    * built; here one full iteration is oracle-replayed. */
  def kmeansIterate(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansRefine(t(s, dir, "embeddings"), "vec_id", "embedding",
      numCentroids = IvfCentroids)
      .orderBy("cell")

  /** Token-budget corpus selection ([[graft.ops.Curation.budgetSelect]]):
    * best-scored documents until the token budget is spent, via the
    * two-pass (local cumsum + broadcast prefix offsets) encoding — no
    * single-task global window. */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(col("text")), " ")
    val scored = t(s, dir, "documents").select(
      col("doc_id"),
      round(size(array_distinct(toks)) * 1.0 / size(toks), 4).as("score"),
      size(toks).cast("long").as("ws_tokens"))
    Curation.budgetSelect(scored, "doc_id", "score", "ws_tokens", budget = 10000L)
      .orderBy("cum_tokens")
  }

  /** Temperature-flattened language mixture (the multilingual-training
    * resampling recipe: p_l ∝ n_l^α, α=0.7): per language, raw share,
    * temperature share, and the implied up/down-weighting factor. All
    * driver-free aggregation; rounding absorbs libm pow/sum ulp noise. */
  def mixTemperature(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents").groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum("n_docs").as("total"),
      sum(pow(col("n_docs").cast("double"), 0.7)).as("zsum"))
    counts.crossJoin(broadcast(tot))
      .select(
        col("lang"), col("n_docs"),
        round(col("n_docs") * 1.0 / col("total"), 4).as("share"),
        round(pow(col("n_docs").cast("double"), 0.7) / col("zsum"), 4).as("temp_share"),
        round((pow(col("n_docs").cast("double"), 0.7) / col("zsum")) /
          (col("n_docs") * 1.0 / col("total")), 4).as("upweight"))
      .orderBy("lang")
  }

  /** Per-domain quota capping ([[graft.ops.Curation.domainQuota]]): at
    * most 5 docs per source, ranked by distinct-word ratio — two-phase
    * top-k, no single-task hot-domain window. */
  def domainQuota(s: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(col("text")), " ")
    val scored = t(s, dir, "documents").select(
      col("doc_id"), col("source"),
      round(size(array_distinct(toks)) * 1.0 / size(toks), 4).as("score"))
    Curation.domainQuota(scored, "doc_id", "source", "score", cap = 5)
      .orderBy("source", "rank_in_domain")
  }

  /** Leak-free split assignment ([[graft.ops.Curation.leakFreeSplit]]):
    * every document inherits its near-dup CLUSTER's hash split, so
    * near-duplicates can never straddle train/eval. Singletons are their
    * own cluster (LEFT join + coalesce against the CC labels). */
  def splitAssign(s: SparkSession, dir: String): DataFrame = {
    val comp = graft.ops.Cluster
      .dupClusters(minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
      .select(col("doc_id"), col("cluster"))
    val grouped = t(s, dir, "documents").select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    Curation.leakFreeSplit(grouped, "cluster").orderBy("doc_id")
  }

  /** PMI collocations ([[graft.ops.TextAnalysis.pmiCollocations]]): the
    * 50 strongest adjacent-word associations in the corpus. */
  def pmiCollocations(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(td(s, dir), minCount = 5L, topK = 50)

  /** Deterministic normalization pass
    * ([[graft.ops.TextAnalysis.normalizeText]]) — zero-shuffle scan-speed
    * projection. */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.normalizeText(t(s, dir, "documents")).orderBy("doc_id")

  /** Johnson-Lindenstrauss projection
    * ([[graft.ops.Similarity.randomProject]]): 64-dim embeddings down to
    * 16 deterministic ±1-sign components, skinny (id, j, comp) form. */
  def embedProject(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProject(t(s, dir, "embeddings"), "vec_id", "embedding",
        dIn = 64, dOut = 16)
      .orderBy("vec_id", "j")

  /** Session journey assembly ([[graft.ops.Sessionize.sessionPaths]]):
    * per (user, session) the time-ordered event-type path string — the
    * sequence-training prep over an event log. */
  def sessionPaths(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.sessionPaths(t(s, dir, "events"),
        key = "user_id", tsCol = "ts", idCol = "event_id",
        typeCol = "event_type", gapSeconds = 21600)
      .orderBy("user_id", "session_idx")

  /** Composed corpus selection: the round-6 curation ops chained —
    * quality scoring → per-domain quota (cap 20) → global token budget
    * (30k, distributed cumsum) → leak-free cluster split. One
    * self-contained query; the oracle replays the full chain. */
  def pipelineSelectCorpus(s: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(col("text")), " ")
    val scored = t(s, dir, "documents").select(
      col("doc_id"), col("source"),
      round(size(array_distinct(toks)) * 1.0 / size(toks), 4).as("score"),
      size(toks).cast("long").as("n_tokens"))
    val quota = Curation.domainQuota(scored, "doc_id", "source", "score", cap = 20)
    val picked = Curation.budgetSelect(
      quota.join(scored.select("doc_id", "n_tokens"), "doc_id"),
      "doc_id", "score", "n_tokens", budget = 30000L)
    val comp = graft.ops.Cluster
      .dupClusters(minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
      .select(col("doc_id"), col("cluster"))
    val grouped = picked.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    Curation.leakFreeSplit(grouped, "cluster")
      .select("doc_id", "score", "n_tokens", "cum_tokens", "cluster", "split")
      .orderBy("doc_id")
  }

  /** Conversion funnel ([[graft.ops.Sessionize.funnelSteps]]) over the
    * event log: per user the earliest view → click-after-view →
    * purchase-after-click times and the consecutive depth reached. */
  def funnelStepsQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.funnelSteps(t(s, dir, "events"),
        key = "user_id", tsCol = "ts", typeCol = "event_type",
        steps = Seq("view", "click", "purchase"))
      .orderBy("user_id")

  /** Language-consistency audit: per source, how often the n-gram
    * lang-id disagrees with the declared `lang` column — the metadata
    * quality check run before trusting per-language mixture weights.
    * One partial-agg shuffle over the zero-shuffle scoring projection. */
  def langMismatch(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langScores(t(s, dir, "documents"))
      .groupBy("source")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("pred_lang") =!= col("lang"), 1L).otherwise(0L)).as("n_mismatch"))
      .withColumn("mismatch_rate", round(col("n_mismatch") * 1.0 / col("n_docs"), 4))
      .orderBy("source")

  /** Chunk-containment dedup ([[graft.ops.Dedup.cdcOverlapPairs]]) over
    * [[graft.ops.TextAnalysis.cdcChunks]] — the storage-dedup
    * composition: shared-chunk containment catches engulfed/mosaic
    * duplicates pair-Jaccard dilutes away. */
  def dedupCdcOverlap(s: SparkSession, dir: String): DataFrame =
    Dedup.cdcOverlapPairs(
        TextAnalysis.cdcChunks(td(s, dir)), "doc_id", threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** Embedding outliers ([[graft.ops.Similarity.labelOutliers]]):
    * distance-to-label-centroid z-scores — the quarantine filter before
    * ANN indexing. */
  def embedOutliers(s: SparkSession, dir: String): DataFrame =
    Similarity.labelOutliers(t(s, dir, "embeddings"), "vec_id", "embedding", "label")
      .orderBy("vec_id")

  /** Lexical coverage ([[graft.ops.TextAnalysis.oovRate]]): per-doc OOV
    * rate against the corpus's own top-1000 word vocabulary. */
  def oovRateQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.oovRate(t(s, dir, "documents")).orderBy("doc_id")

  /** Temperature resampling MATERIALIZED ([[graft.ops.Curation.resampleReplicate]]):
    * the [[mixTemperature]] up/down-weights turned into an actual
    * replicated corpus — floor(w) copies per doc plus a
    * deterministically-hashed fractional copy. */
  def resampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents").groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum("n_docs").as("total"),
      sum(pow(col("n_docs").cast("double"), 0.7)).as("zsum"))
    val weights = counts.crossJoin(broadcast(tot))
      .select(col("lang"),
        round((pow(col("n_docs").cast("double"), 0.7) / col("zsum")) /
          (col("n_docs") * 1.0 / col("total")), 4).as("weight"))
    Curation.resampleReplicate(
        t(s, dir, "documents").select("doc_id", "lang")
          .join(broadcast(weights), "lang"),
        "doc_id", "weight")
      .select("doc_id", "lang", "weight", "n_copies", "copy_id")
      .orderBy("doc_id", "copy_id")
  }

  /** Quality-aware dedup keeper selection
    * ([[graft.ops.Cluster.priorityKeepers]]): within each near-dup
    * cluster keep the copy from the best-ranked source instead of the
    * lowest id. The rank table derives deterministically from the
    * source names (numeric suffix mod 4). */
  def dedupPriorityKeeper(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val comp = graft.ops.Cluster
      .dupClusters(minhashVerifiedPairs(s, dir).select("id_a", "id_b"))
      .select(col("doc_id"), col("cluster"))
    val members = docs.select("doc_id", "source")
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    val prio = docs.select("source").distinct()
      .withColumn("rank", expr("cast(substring(source, 4) AS int) % 4"))
    graft.ops.Cluster.priorityKeepers(members, prio)
      .select("doc_id", "source", "cluster", "keeper", "is_keeper")
      .orderBy("doc_id")
  }

  /** Fuzzy decontamination ([[graft.ops.Dedup.crossSetNearDups]]): max
    * verified Jaccard of each training doc against the benchmark split
    * (src0) via cross-set MinHash banding — catches the lightly-edited
    * copies the exact 8-gram `decontaminate` misses. */
  def decontaminateFuzzy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.crossSetNearDups(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Content-defined chunking ([[graft.ops.TextAnalysis.cdcChunks]]):
    * Rabin-style cut points from an 8-char rolling window, ~1/64 cut
    * probability per position. */
  def cdcChunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.cdcChunks(td(s, dir))
      .orderBy("doc_id", "chunk_id")

  /** Log-histogram quantile sketch ([[graft.ops.Quantile]]) over event
    * amounts in cents, with the exact percentile and the realized
    * relative error alongside — the sketch's ≤25% midpoint bound is
    * itself oracle-checked. */
  def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    val cents = t(s, dir, "events")
      .select(round(col("value") * 100, 0).cast("long").as("c"))
    val ests = Quantile.quantileEstimates(
      Quantile.logHist(cents, col("c")), Seq(0.5, 0.9, 0.99))
    val exactTall = cents
      .agg(
        expr("percentile(c, 0.5)").as("e50"),
        expr("percentile(c, 0.9)").as("e90"),
        expr("percentile(c, 0.99)").as("e99"))
      .select(explode(map(
        lit(0.5), col("e50"), lit(0.9), col("e90"), lit(0.99), col("e99")))
        .as(Seq("q", "exact")))
    ests.join(broadcast(exactTall), "q")
      .select(col("q"), round(col("est"), 4).as("est"),
        round(col("exact"), 4).as("exact"),
        round(abs(col("est") - col("exact")) / col("exact"), 4).as("rel_err"))
      .orderBy("q")
  }

  /** Context-length padding-waste analysis: for each candidate sequence
    * length, per-language document count, token total, sequence count
    * (one doc per padded sequence), and the padding fraction — the
    * "pick the context length" planning table. Pure integer arithmetic
    * ((n+c-1) div c), one partial-agg shuffle after a broadcast explode
    * of the 4-row context list. */
  def packEfficiency(s: SparkSession, dir: String): DataFrame = {
    val ctxs = Seq(128, 256, 512, 1024)
    t(s, dir, "documents")
      .select(col("lang"),
        size(split(lower(col("text")), " ")).cast("long").as("n_toks"))
      .select(col("lang"), col("n_toks"),
        explode(array(ctxs.map(c => lit(c)): _*)).as("ctx"))
      .withColumn("n_seqs", expr("(n_toks + ctx - 1) div ctx"))
      .groupBy("ctx", "lang")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum("n_toks").as("total_toks"),
        sum("n_seqs").as("total_seqs"))
      .select(col("ctx"), col("lang"), col("n_docs"), col("total_toks"),
        col("total_seqs"),
        round(lit(1.0) - col("total_toks") * 1.0 / (col("total_seqs") * col("ctx")), 4)
          .as("pad_frac"))
      .orderBy("ctx", "lang")
  }

  /** Hard-negative mining ([[graft.ops.Similarity.hardNegatives]]): per
    * query, the 5 most-similar vectors with a DIFFERENT label — the
    * contrastive-training negative-sampling step. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", "label", k = 5)
      .orderBy("query_id", "rank")
  }

  /** BPE segmentation ([[graft.ops.Bpe.segmentVocab]], the APPLY half):
    * the learned merges run over the deduplicated vocabulary and every
    * word gets its final symbol sequence — the per-word table a 100 TB
    * tokenization would broadcast-join back onto documents. */
  def bpeSegment(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.segmentVocab(t(s, dir, "documents"), "text", rounds = 3)
      .orderBy("w")

  /** Composed curation v2 over the round-6 operators: line-level corpus
    * dedup strips boilerplate blocks, then the within-document
    * repetition gate runs on the CLEANED text (order matters — a doc
    * whose repetition lived in the removed boilerplate should survive).
    * Shuffle ledger: two line-keyed/doc-keyed shuffles from the dedup,
    * zero from the gate (scan-side), one lang join. */
  def pipelineCurateV2(s: SparkSession, dir: String): DataFrame = {
    val docs = td(s, dir)
    val cleaned = Dedup.lineDedup(docs, "doc_id", "text", blockWords = 10)
      .filter(col("n_kept") >= 1)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .withColumnRenamed("text_clean", "text2")
    TextAnalysis.repetitionSignals(cleaned, textCol = "text2")
      .filter(col("keep"))
      .select(col("doc_id"), col("lang"), col("n_lines"), col("n_kept"),
        size(split(col("text2"), " ")).cast("long").as("n_words_clean"),
        col("dup2_frac"), col("dup3_frac"))
      .orderBy("doc_id")
  }

  /** Deterministic training-order shuffle
    * ([[graft.ops.Curation.shardAssignments]]): salted-hash shard +
    * within-shard position — one hash exchange, no global sort. */
  def shuffleShards(s: SparkSession, dir: String): DataFrame =
    Curation.shardAssignments(t(s, dir, "documents"), "doc_id")
      .orderBy("doc_id")

  /** Incremental ingest novelty ([[graft.ops.Curation.incrementalNovelty]]):
    * odd-id docs are the "new batch", even-id docs the existing corpus;
    * fingerprint = md5 of the first 10-word block (head-line hash), which
    * does collide in this corpus so all three flags carry signal. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val fp = md5(concat_ws(" ", slice(split(col("text"), " "), 1, 10)))
    Curation.incrementalNovelty(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0),
      "doc_id", fp)
      .select("doc_id", "fp", "in_corpus", "first_in_batch", "novel")
      .orderBy("doc_id")
  }

  /** Ingest-time near-dup novelty ([[graft.ops.Dedup.simhashNovelty]]):
    * odd-id docs are the "new batch", even-id the existing corpus (the
    * [[dedupIncremental]] split) — but gated on 64-bit SimHash hamming
    * distance ≤ 2 instead of an exact head-line hash, so lightly edited
    * re-crawls are caught too. */
  def dedupSimhashNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = td(s, dir)
    Dedup.simhashNovelty(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Source-level curation gate ([[graft.ops.Curation.domainStats]]):
    * pooled distinct-word ratio + short-doc fraction per source, with
    * integer-sum arithmetic so the keep flag is bit-stable. */
  def domainFilter(s: SparkSession, dir: String): DataFrame =
    Curation.domainStats(t(s, dir, "documents"))
      .orderBy("source")

  /** Cross-document boilerplate stripping
    * ([[graft.ops.Curation.boilerplateStrip]]): repeated lines survive
    * only in the first document that used them (min doc id). */
  def stripBoilerplate(s: SparkSession, dir: String): DataFrame =
    Curation.boilerplateStrip(t(s, dir, "documents"), "doc_id", "text",
      blockWords = 10, minDocs = 2)
      .orderBy("doc_id")

  /** Count-min sketch estimates ([[graft.ops.CountMin.estimates]]):
    * d=3 × w=32 grid over 150 distinct users forces collisions, so the
    * over-count flag and relative error are real signal — and, like the
    * HLL query, sketch AND exact AND error are all oracle-checked. */
  def cmsCounts(s: SparkSession, dir: String): DataFrame =
    CountMin.estimates(t(s, dir, "events"), "user_id", d = 3, w = 32)
      .orderBy("user_id")

  /** KMV bottom-k sketch overlap between source vocabularies
    * ([[graft.ops.Kmv.pairwise]]): per source-pair approximate union /
    * intersection / Jaccard of the word sets from k = 256-value
    * sketches — the sketch-side answer to [[sourceOverlap]]'s exact
    * join, usable when pairwise exact vocabulary joins are too wide. */
  def kmvSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val sk = graft.ops.Materialize.index(
      graft.ops.Kmv.sketch(
        t(s, dir, "documents")
          .select(col("source"), explode(split(lower(col("text")), " ")).as("word")),
        "source", "word", k = 256),
      "kmv-sketch")
    graft.ops.Kmv.pairwise(sk, "source", k = 256)
      .orderBy("g_a", "g_b")
  }

  /** Kneser–Ney bigram LM quality score
    * ([[graft.ops.TextAnalysis.knScore]]) per document. */
  def lmKneserNey(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.knScore(td(s, dir)).orderBy("doc_id")

  /** Dirichlet query-likelihood retrieval
    * ([[graft.ops.Retrieval.queryLikelihood]]) — same probe terms as
    * [[bm25Retrieval]], language-modeling scoring instead of BM25. */
  def retrievalQlm(s: SparkSession, dir: String): DataFrame =
    Retrieval.queryLikelihood(t(s, dir, "documents"), "doc_id", "text",
      terms = Seq("table", "query", "spark"))

  /** Encoding-damage audit ([[graft.ops.TextAnalysis.mojibakeSignals]])
    * over every document. */
  def textMojibake(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.mojibakeSignals(t(s, dir, "documents")).orderBy("doc_id")

  /** Per-source KL divergence from the corpus unigram distribution
    * ([[graft.ops.TextAnalysis.sourceKlDivergence]]). */
  def sourceKl(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceKlDivergence(t(s, dir, "documents")).orderBy("src")

  /** Entity-resolution candidate pairs over the part catalog
    * ([[graft.ops.Linkage.candidatePairs]]). */
  def erPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Linkage.candidatePairs(t(s, dir, "part"))
      .orderBy("id_a", "id_b")

  /** Resolved entities ([[graft.ops.Linkage.entities]]): transitive
    * match closure + per-entity member count and price spread. */
  def erEntities(s: SparkSession, dir: String): DataFrame =
    graft.ops.Linkage.entities(t(s, dir, "part"))
      .orderBy("entity")

  /** Daily peak concurrency and covered time over the event sessions
    * ([[graft.ops.Intervals.dailyCoverage]] on [[sessionize]]'s
    * intervals — all users pooled). */
  def intervalCoverage(s: SparkSession, dir: String): DataFrame =
    graft.ops.Intervals.dailyCoverage(
      graft.ops.Sessionize.sessions(t(s, dir, "events"),
        key = "user_id", tsCol = "ts", idCol = "event_id", gapSeconds = 21600),
      "start_ts", "end_ts")
      .orderBy("day")

  /** Robust per-event-type outlier rates via median/MAD
    * ([[graft.ops.Quantile.madOutliers]], Hampel's k = 3 rule). */
  def robustOutliers(s: SparkSession, dir: String): DataFrame =
    Quantile.madOutliers(t(s, dir, "events"), "event_type", "value")
      .orderBy("event_type")

  /** Point-in-time state reconstruction: each user's latest event at or
    * before the cutoff — the event-sourcing "state as of T" read (the
    * time-series analog of an SCD-2 snapshot). Per-user window, bounded
    * by per-user event count; the cutoff filter pushes to the scan. */
  def stateAsof(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .filter(col("ts") <= cutoff)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_event_type"),
        col("value").as("last_value"), col("ts").as("last_ts"))
      .orderBy("user_id")
  }

  /** Modularity of the LABEL partition on the embedding similarity
    * graph ([[graft.ops.Cluster.modularity]]): are same-label vectors
    * denser-connected than chance? The quality score that says whether
    * a labeling (or any community assignment) actually reflects the
    * similarity structure. Q = sum(contribution). */
  def graphModularity(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cluster.modularity(
      embPairGraph(s, dir),
      t(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), col("label")),
      "vec_id", "label")
      .orderBy("label")

  /** Seasonal-naive forecast backtest: tomorrow's per-type daily event
    * count predicted by the same weekday LAST week (the no-model
    * baseline every real forecaster must beat); MAE/MAPE per event_type
    * over the final 7 days. Daily counts are one partial-agg groupBy;
    * the lag-7 join is day-keyed; the horizon cutoff is a 1-row max-day
    * broadcast. */
  def forecastSnaive(s: SparkSession, dir: String): DataFrame = {
    val daily = graft.ops.Materialize.index(
      t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")),
      "daily-counts")
    val maxDay = daily.agg(max("day").as("max_day"))
    val pred = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("c").as("pred"))
    daily.join(pred, Seq("event_type", "day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") > date_sub(col("max_day"), 7))
      .groupBy("event_type")
      .agg(
        count(lit(1)).cast("long").as("n_days"),
        round(avg(abs(col("c") - col("pred")).cast("double")), 4).as("mae"),
        round(avg(abs(col("c") - col("pred")).cast("double") / col("c")), 6).as("mape"))
      .orderBy("event_type")
  }

  /** Flesch reading-ease per document with a vowel-group syllable
    * approximation — the classic readability gate (very low or very
    * high scores both correlate with non-prose content). Scan-side
    * regexp projections only; identical RE2 patterns run in the
    * oracle. */
  def textReadability(s: SparkSession, dir: String): DataFrame = {
    val words = size(split(col("text"), " ")).cast("double")
    val sents = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1)).cast("double")
    val sylls = greatest(
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))), lit(1))
      .cast("double")
    t(s, dir, "documents").select(
      col("doc_id"),
      words.cast("long").as("n_words"),
      sents.cast("long").as("n_sentences"),
      sylls.cast("long").as("n_syllables"),
      round(lit(206.835) - lit(1.015) * (words / sents) -
        lit(84.6) * (sylls / words), 4).as("flesch"))
      .orderBy("doc_id")
  }

  /** KMV sketch merge ≡ full rebuild — the incremental-maintenance
    * contract checked the same way as [[sketchUnion]] (HLL registers)
    * and [[indexIncremental]] (postings): per-source sketches built
    * from two arbitrary corpus slices fold by [[graft.ops.Kmv.merge]]
    * into estimates the oracle recomputes from the FULL data in one
    * pass. Any merge bug hash-mismatches. */
  def kmvMerge(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), " ")).as("word"))
    def side(even: Boolean) = graft.ops.Kmv.sketch(
      words.filter((col("doc_id") % 2 === 0) === even), "source", "word", k = 256)
    graft.ops.Kmv.estimate(
      graft.ops.Kmv.merge(side(true), side(false), "source", k = 256),
      "source", k = 256)
      .orderBy("source")
  }

  /** IVF tuning curve: pooled recall@5 of the IVF index vs the brute
    * ground truth at nprobe ∈ {1, 2, 4} — the measurement that picks an
    * operating point on the recall/cost frontier before a corpus-wide
    * ANN job. The brute top-k and the probe table build once (the
    * content-addressed index cache serves repeats); each sweep point is
    * one candidate join + top-k + a 1-row recall aggregate. */
  def annNprobeSweep(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val brute = graft.ops.Materialize.index(
      embedKnnBrute(s, dir).select("query_id", "corpus_id"), "sweep-brute")
    Seq(1, 2, 4).map { p =>
      val ivf = Similarity.ivfTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5,
        numCentroids = IvfCentroids, nprobe = p)
        .select(col("query_id"), col("corpus_id"), lit(1).as("hit"))
      brute.join(ivf, Seq("query_id", "corpus_id"), "left")
        .agg(round(count(col("hit")).cast("double") / count(lit(1)), 4).as("recall"))
        .select(lit(p).as("nprobe"), col("recall"))
    }.reduce(_ unionByName _)
      .orderBy("nprobe")
  }

  /** Tokenizer fertility per language: BPE-ish subword tokens per
    * whitespace word — the tokenizer-efficiency number that decides
    * whether a language is under-served by the vocabulary (high
    * fertility = more compute per word of signal). One scan, one
    * partial-agg groupBy. */
  def tokenFertility(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("lang")
      .agg(
        sum(size(split(lower(col("text")), " "))).cast("long").as("ws_tokens"),
        sum(TextAnalysis.bpeishTokenCount(lower(col("text")))).cast("long")
          .as("bpeish_tokens"))
      .withColumn("fertility",
        round(col("bpeish_tokens").cast("double") / col("ws_tokens"), 4))
      .orderBy("lang")

  /** Time-series gap fill + forward fill: the dense per-(type, day)
    * grid a downstream consumer expects from a sparse event store —
    * missing days appear with n = 0, the value column carries forward
    * the last observed daily average, and `stale_days` says how old the
    * carried value is (the staleness alarm). The forward fill avoids
    * IGNORE NULLS (not portable to the oracle) via the ff_day trick:
    * running max of observed days, then a keyed join back for that
    * day's value. Grid = types × span (tiny); windows partition by
    * type, bounded by the span. */
  def eventsGapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = graft.ops.Materialize.index(
      t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        // fixed-point value sum: a plain avg() can land a 0.5-ulp from a
        // 4-dp rounding boundary and flip under partial-agg reordering
        // (observed at sf0.001) — long sums are order-exact
        // fixed-point to the end: the 4-dp rounded average is computed by
        // INTEGER half-up division ((2s + c) div 2c at 1e-4 scale) —
        // a double division can land exactly on a .00005 half, where
        // Spark (BigDecimal of the shortest string) and DuckDB (binary
        // round) disagree; integer arithmetic can't (values ≥ 0 here)
        .agg(count(lit(1)).as("c"),
          (expr("(2 * sum(cast(round(value * 10000.0) as bigint)) + count(1)) div (2 * count(1))")
            .cast("double") / lit(10000.0)).as("v")),
      "gapfill-daily")
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val grid = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("event_type", "day"), "left")
      .withColumn("ff_day",
        max(when(col("c").isNotNull, col("day"))).over(w))
      .join(daily.select(col("event_type"), col("day").as("ff_day"),
        col("v").as("filled_v")), Seq("event_type", "ff_day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).as("n"),
        col("filled_v"),
        datediff(col("day"), col("ff_day")).cast("long").as("stale_days"))
      .orderBy("event_type", "day")
  }

  /** Three-gate quality ensemble: Gopher rules, repetition signals and
    * the mojibake audit as independent votes, each documented gate left
    * exactly as its own query defines it — the ensemble reports the
    * vote-pattern census (how many docs each gate combination claims)
    * plus the majority-vote keep count. Eight bounded rows from ONE
    * corpus scan: all three gates are scan-side projections, so they
    * compose in a single select over a single pass ([[gopherSignals]] and
    * [[repetitionSignals]] are withColumn chains, the mojibake verdict a
    * bare expression) — zero joins, zero extra scans. At 100 TB this is
    * the difference between one corpus pass and three passes plus two
    * corpus-sized sort-merge joins (the round-9 plan defect this
    * replaces). The operational read: patterns where exactly one gate
    * dissents are the review queue. [[graft.ops.Materialize.spread]]
    * lifts the single-file local fixture to core-wide parallelism; on a
    * many-file lake layout it is a no-op. */
  def gateEnsemble(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.ops.Materialize.spread(t(s, dir, "documents"))
    val gated = graft.ops.TextAnalysis.repetitionSignals(
      graft.ops.TextAnalysis.gopherSignals(docs))
    gated
      .select(
        col("passes").as("g"),
        col("keep").as("r"),
        (!graft.ops.TextAnalysis.mojibakeSuspect(col("text"))).as("m"))
      .groupBy(col("g"), col("r"), col("m"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("votes",
        (col("g").cast("int") + col("r").cast("int") + col("m").cast("int"))
          .cast("long"))
      .withColumn("majority_keep", col("votes") >= 2)
      .orderBy("g", "r", "m")
  }

  /** Length-matched sampling: pick, per length decile of a TARGET slice
    * (source src0), the same NUMBER of non-target docs from that decile
    * — the standard construction for a comparison corpus where length
    * is a confounder (eval pairs, ablation sets). Decile edges are
    * exact percentiles of the target (a 1-row broadcast); the per-decile
    * cut is deterministic md5 order through the two-phase per-key top-k,
    * so no decile funnels the corpus through one window task. Emits the
    * per-decile demand and the sampled doc ids. */
  def sampleLengthMatched(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val target = docs.filter(col("source") === "src0")
    val edges = target.agg(
      expr("percentile(n_chars, 0.25)").as("q1"),
      expr("percentile(n_chars, 0.5)").as("q2"),
      expr("percentile(n_chars, 0.75)").as("q3"))
    def decile(nc: org.apache.spark.sql.Column) =
      when(nc <= col("q1"), 0).when(nc <= col("q2"), 1)
        .when(nc <= col("q3"), 2).otherwise(3)
    val demand = target.crossJoin(broadcast(edges))
      .groupBy(decile(col("n_chars")).as("bucket"))
      .agg(count(lit(1)).as("want"))
    val pool = docs.filter(col("source") =!= "src0")
      .crossJoin(broadcast(edges))
      .select(col("doc_id"), decile(col("n_chars")).as("bucket"),
        md5(concat(col("doc_id").cast("string"), lit("lms"))).as("ord"))
    // 1-row bounds read (the repo's accepted driver aggregate): the
    // two-phase top-k needs a STATIC cap, and max(want) ≤ |target| keeps
    // every bucket's window input at cap · partitions rows
    val maxWant = demand.agg(max("want")).head().getLong(0).toInt
    val ranked = Retrieval.topKPerKey(
      pool, Seq("bucket"), Seq(col("ord").asc, col("doc_id").asc), k = maxWant)
    ranked
      .join(broadcast(demand), "bucket")
      .filter(col("rank") <= col("want"))
      .select(col("bucket").cast("long").as("bucket"), col("doc_id"),
        col("rank").as("rn"), col("want"))
      .orderBy("bucket", "rn")
  }

  /** Language-ID confusion matrix: labeled lang × predicted lang with
    * counts — the eval census behind [[langMismatch]]'s per-source rate
    * (which cell is wrong tells you WHICH lexicon needs work). One scan,
    * one partial-agg groupBy over a ≤ |langs|² grid. */
  def langConfusion(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langScores(t(s, dir, "documents"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .orderBy("lang", "pred_lang")

  /** PQ quantization distortion per subspace: mean/max squared L2 error
    * of each vector's chosen centroid — the "is the codebook good
    * enough" read before trusting PQ/IVFADC neighbors (a subspace with
    * outsized error needs more centroids or a rotation). Reuses the
    * code-assignment distances; two partial-agg groupBys, m-row
    * output. */
  def embedPqDistortion(s: SparkSession, dir: String): DataFrame =
    Similarity.pqDistortion(t(s, dir, "embeddings"), "vec_id", "embedding",
      m = PqM, subDim = PqSubDim, k = PqK)
      .orderBy("j")

  // ================================================================ maps
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmv_source_overlap" -> (kmvSourceOverlap _),
    "graph_modularity" -> (graphModularity _),
    "ann_nprobe_sweep" -> (annNprobeSweep _),
    "events_gap_fill" -> (eventsGapFill _),
    "gate_ensemble" -> (gateEnsemble _),
    "lang_confusion" -> (langConfusion _),
    "embed_pq_distortion" -> (embedPqDistortion _),
    "sample_length_matched" -> (sampleLengthMatched _),
    "token_fertility" -> (tokenFertility _),
    "forecast_snaive" -> (forecastSnaive _),
    "text_readability" -> (textReadability _),
    "kmv_merge" -> (kmvMerge _),
    "lm_kneser_ney" -> (lmKneserNey _),
    "retrieval_qlm" -> (retrievalQlm _),
    "text_mojibake" -> (textMojibake _),
    "source_kl" -> (sourceKl _),
    "er_pairs" -> (erPairs _),
    "er_entities" -> (erEntities _),
    "interval_coverage" -> (intervalCoverage _),
    "robust_outliers" -> (robustOutliers _),
    "state_asof" -> (stateAsof _),
    "shuffle_shards" -> (shuffleShards _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_simhash_novelty" -> (dedupSimhashNovelty _),
    "domain_filter" -> (domainFilter _),
    "strip_boilerplate" -> (stripBoilerplate _),
    "cms_counts" -> (cmsCounts _),
    "pipeline_curate_v2" -> (pipelineCurateV2 _),
    "bpe_merges" -> (bpeMerges _),
    "bpe_segment" -> (bpeSegment _),
    "kmeans_iterate" -> (kmeansIterate _),
    "hard_negatives" -> (hardNegatives _),
    "token_budget" -> (tokenBudget _),
    "mix_temperature" -> (mixTemperature _),
    "domain_quota" -> (domainQuota _),
    "split_assign" -> (splitAssign _),
    "pmi_collocations" -> (pmiCollocations _),
    "text_normalize" -> (textNormalize _),
    "embed_project" -> (embedProject _),
    "decontaminate_fuzzy" -> (decontaminateFuzzy _),
    "cdc_chunks" -> (cdcChunks _),
    "quantile_sketch" -> (quantileSketch _),
    "pack_efficiency" -> (packEfficiency _),
    "resample_temperature" -> (resampleTemperature _),
    "dedup_priority_keeper" -> (dedupPriorityKeeper _),
    "dedup_cdc_overlap" -> (dedupCdcOverlap _),
    "embed_outliers" -> (embedOutliers _),
    "oov_rate" -> (oovRateQ _),
    "session_paths" -> (sessionPaths _),
    "pipeline_select_corpus" -> (pipelineSelectCorpus _),
    "funnel_steps" -> (funnelStepsQ _),
    "lang_mismatch" -> (langMismatch _),
    "approx_distinct" -> (approxDistinctUsers _),
    "approx_distinct_fn" -> (approxDistinctFn _),
    "quantile_fn" -> (quantileFn _),
    "topk_fn" -> (topkFn _),
    "sketch_union" -> (sketchUnion _),
    "eval_silhouette" -> (evalSilhouette _),
    "embed_pq_codes" -> (embedPqCodes _),
    "embed_knn_pq" -> (embedKnnPq _),
    "embed_knn_pq_rerank" -> (embedKnnPqRerank _),
    "embed_knn_ivfpq" -> (embedKnnIvfPq _),
    "dedup_lines" -> (dedupLines _),
    "repetition_signals" -> (repetitionSignals _),
    "nb_classify" -> (nbClassify _),
    "dedup_substring" -> (dedupSubstring _),
    "lm_perplexity" -> (lmPerplexity _),
    "lm_ppl_buckets" -> (lmPplBuckets _),
    "lm_dsir_weights" -> (lmDsirWeights _),
    "embed_cell_sample" -> (embedCellSample _),
    "embed_semantic_dedup" -> (embedSemanticDedup _),
    "layout_zorder" -> (layoutZorder _),
    "layout_skipping" -> (layoutSkipping _),
    "doc_chunking" -> (docChunking _),
    "multimodal_resize" -> (multimodalResize _),
    "heavy_hitters" -> (heavyHitters _),
    "text_quality" -> (textQuality _),
    "text_lang_id" -> (textLangId _),
    "text_fingerprint" -> (textFingerprint _),
    "token_counts" -> (tokenCounts _),
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_allpairs" -> (dedupAllpairs _),
    "source_contamination" -> (sourceContamination _),
    "memorization_grams" -> (memorizationGrams _),
    "fingerprint_winnow" -> (fingerprintWinnow _),
    "label_noise" -> (labelNoiseQ _),
    "dedup_recall" -> (dedupRecall _),
    "dedup_cluster_incremental" -> (dedupClusterIncremental _),
    "events_anomaly" -> (eventsAnomaly _),
    "source_quality_report" -> (sourceQualityReport _),
    "embed_novelty" -> (embedNoveltyQ _),
    "retrieval_prf" -> (retrievalPrf _),
    "eval_ndcg" -> (evalNdcg _),
    "eval_gate_agreement" -> (evalGateAgreement _),
    "pair_graph_rank" -> (pairGraphRank _),
    "dedup_pagerank_keeper" -> (dedupPagerankKeeper _),
    "dedup_cluster" -> (dedupCluster _),
    "dedup_cluster_star" -> (dedupClusterStar _),
    "sample_stratified" -> (sampleStratified _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_simhash_hamming" -> (dedupSimhashHamming _),
    "bm25_retrieval" -> (bm25Retrieval _),
    "bm25_indexed" -> (bm25Indexed _),
    "bm25_batch" -> (bm25BatchQ _),
    "index_incremental" -> (indexIncremental _),
    "retrieval_index_nightly" -> (retrievalIndexNightly _),
    "corpus_diff" -> (corpusDiff _),
    "pipeline_audit" -> (pipelineAudit _),
    "source_overlap" -> (sourceOverlap _),
    "retrieval_hybrid_rrf" -> (retrievalHybridRrf _),
    "cohort_retention" -> (cohortRetention _),
    "rolling_active" -> (rollingActiveQ _),
    "graph_triangles" -> (graphTriangles _),
    "graph_kcore" -> (graphKcore _),
    "graph_clustering" -> (graphClustering _),
    "pipeline_graph_hygiene" -> (pipelineGraphHygiene _),
    "quality_logreg" -> (qualityLogreg _),
    "eval_auc" -> (evalAucQ _),
    "eval_calibration" -> (evalCalibrationQ _),
    "eval_f1_sweep" -> (evalF1SweepQ _),
    "inverted_index" -> (invertedIndexQ _),
    "decontaminate" -> (decontaminate _),
    "range_join" -> (rangeJoin _),
    "range_join_auto" -> (rangeJoinAuto _),
    "sessionize" -> (sessionize _),
    "pack_sequences" -> (packSequences _),
    "tfidf_terms" -> (tfidfTerms _),
    "layout_compact" -> (layoutCompact _),
    "quality_gopher" -> (qualityGopher _),
    "sample_reservoir" -> (sampleReservoir _),
    "sample_weighted" -> (sampleWeighted _),
    "mix_plan" -> (mixPlan _),
    "mix_epochs" -> (mixEpochs _),
    "dedup_cluster_stats" -> (dedupClusterStats _),
    "embed_quantize" -> (embedQuantize _),
    "knn_classify" -> (knnClassify _),
    "embed_label_centroids" -> (embedLabelCentroids _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "embed_knn_brute" -> (embedKnnBrute _),
    "embed_knn_lsh" -> (embedKnnLsh _),
    "ann_recall" -> (annRecall _),
    "pii_scrub" -> (piiScrub _),
    "embed_knn_ivf" -> (embedKnnIvf _),
    "embed_knn_ivf_nightly" -> (embedKnnIvfNightly _),
    "embed_knn_pq_nightly" -> (embedKnnPqNightly _),
    "embed_knn_ivfadc_nightly" -> (embedKnnIvfadcNightly _),
    "embed_knn_ivfadc_served" -> (embedKnnIvfadcServed _),
    "embed_knn_ivfadc_composed" -> (embedKnnIvfadcComposed _),
    "embed_near_dup" -> (embedNearDup _),
    "embed_near_dup_lsh" -> (embedNearDupLsh _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_phash_dedup" -> (multimodalPhashDedup _),
    "multimodal_caption_join" -> (multimodalCaptionJoin _),
    "embed_bitext_margin" -> (embedBitextMargin _),
    "embed_mrl_distortion" -> (embedMrlDistortion _),
    "lsh_band_sweep" -> (lshBandSweep _),
    "fm_drift_census" -> (fmDriftCensus _),
    "pipeline_asset_manifest" -> (pipelineAssetManifest _),
    "multimodal_dhash_dedup" -> (multimodalDhashDedup _),
    "multimodal_video_dedup" -> (multimodalVideoDedup _),
    "multimodal_frame_align" -> (multimodalFrameAlign _),
    "video_keeper" -> (multimodalVideoKeeper _),
    "multimodal_decontaminate" -> (multimodalDecontaminate _),
    "embed_decontaminate" -> (embedDecontaminate _),
    "pipeline_decontam_matrix" -> (pipelineDecontamMatrix _),
    "decontam_eval_delta" -> (decontamEvalDelta _),
    "decontam_ledger_chain" -> (decontamLedgerChain _),
    "decontam_ledger_nightly" -> (decontamLedgerNightly _),
    "decontam_ledger_asof" -> (decontamLedgerAsof _),
    "decontam_ledger_time_travel" -> (decontamLedgerTimeTravel _),
    "decontam_ledger_snapshot_served" -> (decontamLedgerSnapshotServed _),
    "pipeline_make_eval_holdout" -> (pipelineMakeEvalHoldout _),
    "pipeline_asset_manifest_incremental" -> (pipelineAssetManifestIncremental _),
    "pipeline_asset_manifest_nightly" -> (pipelineAssetManifestNightly _),
    "multimodal_mismatch" -> (multimodalMismatch _),
    "skew_salted_join" -> (skewSaltedJoin _),
    "skew_histogram" -> (skewHistogram _),
    "pipeline_clean_corpus" -> (pipelineCleanCorpus _),
    "pipeline_prepare_training" -> (pipelinePrepareTraining _),
    "profile_table" -> (profileTable _),
    "numeric_histogram" -> (numericHistogram _),
  )

  // DuckDB oracle building blocks (mirror the Spark expressions exactly)
  private val toks = "string_split(lower(text), ' ')"

  /** Shared CTE chain producing `vpairs` — the verified minhash near-dup
    * pairs — reused by the pairwise oracle and the cluster oracle. */
  private lazy val duckMinhashPairCtes: String =
    s"""sig AS (SELECT doc_id,
       |  ${duckMinhash(0)} AS h0, ${duckMinhash(1)} AS h1,
       |  ${duckMinhash(2)} AS h2, ${duckMinhash(3)} AS h3
       |FROM documents),
       |bands AS (SELECT doc_id, md5(h0 || '|' || h1) AS band0, md5(h2 || '|' || h3) AS band1 FROM sig),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
       |  UNION
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band1 = b.band1 AND a.doc_id < b.doc_id),
       |tok AS (SELECT doc_id, list_distinct($toks) AS ts FROM documents),
       |vpairs AS (SELECT id_a, id_b,
       |  round(len(list_intersect(ta.ts, tb.ts)) / len(list_distinct(list_concat(ta.ts, tb.ts))), 4) AS jac
       |FROM pairs JOIN tok ta ON ta.doc_id = id_a JOIN tok tb ON tb.doc_id = id_b
       |WHERE round(len(list_intersect(ta.ts, tb.ts)) / len(list_distinct(list_concat(ta.ts, tb.ts))), 4) >= 0.5)""".stripMargin
  /** CTE chain producing `ngpairs` — the word-bigram gram-minhash-banded
    * verified near-dup pairs (id_a, id_b, jac ≥ 0.5) — shared by the
    * ngram-jaccard oracle and the dedup-recall oracle's approximate
    * side. Also defines `g` (doc_id, grams as md5-16 prefixes), the
    * similarity domain the recall oracle's brute-force truth reuses. */
  // Full corpus, matching lshBandSweep: the sweep runs the SAME chain as
  // the dedup queries so its index-cache entries are plan-identical and
  // shared (a sampled variant measured slower in-battery by forfeiting
  // the share — the sampling happens at 100 TB by pointing the sweep at
  // an already-sampled corpus, not here).
  private lazy val duckNgramPairCtes: String =
    s"""graw AS (SELECT doc_id, list_distinct(${duckShingles(2)}) AS grams
       |FROM documents),
       |g AS (SELECT doc_id,
       |  list_transform(grams, x -> substr(md5(x), 1, 16)) AS grams FROM graw),
       |sig AS (SELECT doc_id,
       |  list_min(list_transform(grams, x -> md5('gsalt0|' || x))) AS g0,
       |  list_min(list_transform(grams, x -> md5('gsalt1|' || x))) AS g1,
       |  list_min(list_transform(grams, x -> md5('gsalt2|' || x))) AS g2,
       |  list_min(list_transform(grams, x -> md5('gsalt3|' || x))) AS g3
       |FROM graw),
       |gbands AS (SELECT doc_id, md5(g0 || '|' || g1) AS band0, md5(g2 || '|' || g3) AS band1 FROM sig),
       |gpairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM gbands a JOIN gbands b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
       |  UNION
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM gbands a JOIN gbands b ON a.band1 = b.band1 AND a.doc_id < b.doc_id),
       |ngpairs AS (SELECT id_a, id_b,
       |  round(len(list_intersect(ga.grams, gb.grams)) /
       |        len(list_distinct(list_concat(ga.grams, gb.grams))), 4) AS jac
       |FROM gpairs JOIN g ga ON ga.doc_id = id_a JOIN g gb ON gb.doc_id = id_b
       |WHERE round(len(list_intersect(ga.grams, gb.grams)) /
       |        len(list_distinct(list_concat(ga.grams, gb.grams))), 4) >= 0.5)""".stripMargin

  /** CTE chain extending `vpairs` to `comp` — per-node transitive cluster
    * assignment (recursive reachability closure + min per node), shared by
    * the cluster oracle and the composed-pipeline oracle. Callers must
    * open with WITH RECURSIVE. */

  /** Shared per-frame aHash CTE chain over a `corpus(doc_id, text)` CTE,
    * yielding `vf(doc_id, fno, fh)` — mirrors
    * [[graft.ops.Multimodal.frameHashes]] (stride 128, frame 64) exactly;
    * reused by the video-dedup and frame-alignment oracles. */
  private lazy val duckFrameHashCtes: String =
    """vfr AS (SELECT doc_id, CAST(t.i AS INT) AS fno,
      |    substr(text, CAST(t.i AS INT) * 128 + 1, 64) AS frame
      |  FROM corpus, unnest(range(0, greatest(CAST(ceil(len(text) / 128.0) AS BIGINT), 1))) AS t(i)
      |  WHERE CAST(t.i AS INT) * 128 < len(text)),
      |vc AS (SELECT doc_id, fno, CAST(length(frame) AS BIGINT) AS L,
      |    list_transform(range(1, CAST(length(frame) AS INT) + 1),
      |      i -> CAST(ascii(substr(frame, CAST(i AS INT), 1)) AS BIGINT)) AS codes
      |  FROM vfr),
      |vf AS (SELECT doc_id, fno, array_to_string(list_transform(range(0, 64),
      |    b -> CASE WHEN
      |      CAST(coalesce(list_sum(list_slice(codes,
      |        CAST(b * L // 64 AS INT) + 1,
      |        CAST((b + 1) * L // 64 AS INT))), 0) AS BIGINT) * L >
      |      CAST(list_sum(codes) AS BIGINT) * ((b + 1) * L // 64 - b * L // 64)
      |      THEN '1' ELSE '0' END), '') AS fh
      |  FROM vc)""".stripMargin

  /** Shared phash CTE chain over a `corpus(doc_id, text)` CTE: aHash
    * fingerprints (integer-only bit rule, construct-matching
    * [[graft.ops.Multimodal.perceptualHash]]) and brute-force all-pairs
    * hamming, yielding `php(id_a, id_b, hd)` with hd <= 2. */
  private lazy val duckPhashPairCtes: String =
    """a AS (SELECT doc_id AS id, text AS s,
      |    CAST(length(text) AS BIGINT) AS L FROM corpus),
      |c AS (SELECT id, L,
      |    list_transform(range(1, CAST(L AS INT) + 1),
      |      i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT)) AS codes
      |  FROM a),
      |f AS (SELECT id, array_to_string(list_transform(range(0, 64),
      |    b -> CASE WHEN
      |      CAST(coalesce(list_sum(list_slice(codes,
      |        CAST(b * L // 64 AS INT) + 1,
      |        CAST((b + 1) * L // 64 AS INT))), 0) AS BIGINT) * L >
      |      CAST(list_sum(codes) AS BIGINT) * ((b + 1) * L // 64 - b * L // 64)
      |      THEN '1' ELSE '0' END), '') AS fp
      |  FROM c),
      |php AS (SELECT id_a, id_b, hd FROM (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      i -> CASE WHEN substr(a.fp, CAST(i AS INT), 1)
      |                   = substr(b.fp, CAST(i AS INT), 1)
      |           THEN 0 ELSE 1 END)) AS BIGINT) AS hd
      |  FROM f a JOIN f b ON a.id < b.id)
      |WHERE hd <= 2)""".stripMargin

  /** The dHash sibling of [[duckPhashPairCtes]], over the same
    * `corpus(doc_id, text)` CTE: 65-block adjacent-gradient fingerprints
    * (integer-only bit rule s_b·l_{b+1} > s_{b+1}·l_b, slice partition ≡
    * [[graft.ops.Multimodal.dhash]]'s closed form) and brute-force
    * all-pairs hamming, yielding `dhp(id_a, id_b, hd)` with hd <= 2.
    * CTE names are disjoint from the aHash chain so both can ride one
    * WITH clause for the union'd manifest closure. */
  private lazy val duckDhashPairCtes: String =
    """da AS (SELECT doc_id AS id, text AS s,
      |    CAST(length(text) AS BIGINT) AS L FROM corpus),
      |dc AS (SELECT id, L,
      |    list_transform(range(1, CAST(L AS INT) + 1),
      |      i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT)) AS codes
      |  FROM da),
      |df AS (SELECT id, array_to_string(list_transform(range(0, 64),
      |    b -> CASE WHEN
      |      CAST(coalesce(list_sum(list_slice(codes,
      |        CAST(b * L // 65 AS INT) + 1,
      |        CAST((b + 1) * L // 65 AS INT))), 0) AS BIGINT) *
      |      CAST((b + 2) * L // 65 - (b + 1) * L // 65 AS BIGINT) >
      |      CAST(coalesce(list_sum(list_slice(codes,
      |        CAST((b + 1) * L // 65 AS INT) + 1,
      |        CAST((b + 2) * L // 65 AS INT))), 0) AS BIGINT) *
      |      CAST((b + 1) * L // 65 - b * L // 65 AS BIGINT)
      |      THEN '1' ELSE '0' END), '') AS fp
      |  FROM dc),
      |dhp AS (SELECT id_a, id_b, hd FROM (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      i -> CASE WHEN substr(a.fp, CAST(i AS INT), 1)
      |                   = substr(b.fp, CAST(i AS INT), 1)
      |           THEN 0 ELSE 1 END)) AS BIGINT) AS hd
      |  FROM df a JOIN df b ON a.id < b.id)
      |WHERE hd <= 2)""".stripMargin

  /** Full-recompute asset-manifest oracle (aHash ∪ dHash pair closure
    * + meta/caption gates) — shared VERBATIM by `pipeline_asset_manifest`
    * and `pipeline_asset_manifest_incremental`: incremental maintenance
    * is correct exactly when it is indistinguishable from this. */
  private lazy val duckAssetManifestSql: String =
    s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, 'zzzz' || substr(text, 5)
         |  FROM documents WHERE doc_id % 10 = 0),
         |$duckPhashPairCtes,
         |$duckDhashPairCtes,
         |ppairs AS (SELECT DISTINCT id_a, id_b FROM (
         |  SELECT id_a, id_b FROM php UNION ALL SELECT id_a, id_b FROM dhp)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM ppairs
         |          UNION ALL SELECT id_b, id_a FROM ppairs),
         |reach(node, r) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst),
         |comp AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node),
         |drops AS (SELECT node FROM comp WHERE node <> cluster),
         |meta AS (SELECT doc_id AS asset_id,
         |    CAST(doc_id % 640 + 1 AS INTEGER) AS width,
         |    CAST(doc_id % 480 + 1 AS INTEGER) AS height,
         |    CAST(length(text) AS BIGINT) AS n_bytes,
         |    array_to_string(list_slice(string_split(text, ' '), 1, 10), ' ') AS caption
         |  FROM corpus)
         |SELECT asset_id, width, height, n_bytes,
         |  CAST(len(string_split(caption, ' ')) AS BIGINT) AS caption_tokens,
         |  md5(caption) AS caption_md5
         |FROM meta
         |WHERE asset_id NOT IN (SELECT node FROM drops)
         |  AND width >= 100 AND len(string_split(caption, ' ')) >= 5
         |ORDER BY asset_id""".stripMargin

  private lazy val duckClusterCtes: String =
    s"""$duckMinhashPairCtes,
       |edges AS (SELECT id_a AS src, id_b AS dst FROM vpairs
       |          UNION ALL SELECT id_b, id_a FROM vpairs),
       |reach(node, r) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst),
       |comp AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node)""".stripMargin

  /** CDC cut + chunk CTEs (window 8, maskBits 6 → first-2-hex < 4),
    * construct-matching [[graft.ops.TextAnalysis.cdcChunks]]; yields
    * `ch(doc_id, chunk_id, chunk)`. */
  private lazy val duckCdcCtes: String =
    """c AS (SELECT doc_id, text,
      |    list_filter(range(8, length(text) + 1),
      |      p -> (instr('0123456789abcdef',
      |              substring(md5(substring(text, CAST(p - 7 AS INT), 8)), 1, 1)) - 1) * 16
      |         + (instr('0123456789abcdef',
      |              substring(md5(substring(text, CAST(p - 7 AS INT), 8)), 2, 1)) - 1) < 4) AS cuts
      |  FROM documents),
      |u AS (SELECT doc_id, text, cuts, unnest(range(0, len(cuts) + 1)) AS i FROM c),
      |ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_id,
      |    substring(text,
      |      CAST(CASE WHEN i = 0 THEN 1 ELSE cuts[CAST(i AS INT)] + 1 END AS INT),
      |      CAST((CASE WHEN i = CAST(len(cuts) AS BIGINT) THEN length(text)
      |              ELSE cuts[CAST(i + 1 AS INT)] END)
      |        - (CASE WHEN i = 0 THEN 0 ELSE cuts[CAST(i AS INT)] END) AS INT)) AS chunk
      |  FROM u)""".stripMargin

  private def duckShingles(n: Int): String = duckShinglesOf(toks, n)
  private def duckMinhash(i: Int): String =
    s"list_min(list_transform(${duckShingles(3)}, s -> md5('salt$i|' || s)))"

  /** Shared CTE chain for the degree-oriented triangle kernel over the
    * embedding near-dup graph, ending at `tri(u, v, z)` (one row per
    * triangle, u the order-minimal anchor) with `dg(x, deg)` available —
    * mirrors [[graft.ops.Cluster.triangles]] stage for stage. */
  private val duckTriangleCtes: String =
    """e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings WHERE vec_id < 300),
      |pe AS MATERIALIZED (SELECT a.vec_id AS x, b.vec_id AS y
      |  FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
      |  WHERE round(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.35),
      |ue AS (SELECT x, y FROM pe UNION ALL SELECT y, x FROM pe),
      |dg AS MATERIALIZED (SELECT x, CAST(count(*) AS BIGINT) AS deg FROM ue GROUP BY x),
      |orient AS MATERIALIZED (SELECT
      |    CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND p.x < p.y)
      |      THEN p.x ELSE p.y END AS src,
      |    CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND p.x < p.y)
      |      THEN p.y ELSE p.x END AS dst
      |  FROM pe p JOIN dg dx ON p.x = dx.x JOIN dg dy ON p.y = dy.x),
      |od AS (SELECT o.src, o.dst, d.deg AS ddst
      |  FROM orient o JOIN dg d ON o.dst = d.x),
      |wd AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS z
      |  FROM od e1 JOIN od e2 ON e1.src = e2.src
      |  WHERE e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)),
      |tri AS (SELECT u, v, z FROM wd JOIN orient o ON wd.v = o.src AND wd.z = o.dst)""".stripMargin

  /** Unrolled GD round r for the quality-logreg oracle: gradient CTE
    * g`r` (fixed-point component sums over f × w`r-1`) then weights
    * w`r` — arithmetic in the EXACT operation order
    * [[graft.ops.Classify.logisticGd]] uses, hard-sigmoid activation,
    * so the replayed weights are bit-identical per round. */
  private def duckGdRound(r: Int, lr: Double): String = {
    def gsum(j: Int) =
      s"CAST(sum(CAST(round(round(err * x$j, 8) * 1e8, 0) AS BIGINT)) AS DOUBLE) AS s$j"
    def wupd(j: Int) =
      s"round(a$j - $lr * (s$j / 1e8 / n), 8) AS a$j"
    s"""g$r AS (SELECT ${(0 to 3).map(gsum).mkString(", ")}
       |  FROM (SELECT x0, x1, x2, x3,
       |      greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
       |        0.5 + (a0*x0 + a1*x1 + a2*x2 + a3*x3) / CAST(4.0 AS DOUBLE))) - y AS err
       |    FROM f CROSS JOIN w${r - 1})),
       |w$r AS (SELECT ${(0 to 3).map(wupd).mkString(", ")}
       |  FROM w${r - 1} CROSS JOIN g$r CROSS JOIN nn)""".stripMargin
  }

  /** Shared CTE chain replaying [[graft.ops.Classify.logisticGd]]'s
    * 3-round training on the documents quality features, ending at
    * `lrscored(doc_id, y, score)` — consumed by both the classifier
    * query and its AUC evaluation. */
  private def duckLogregCtes: String =
    s"""f AS MATERIALIZED (SELECT doc_id,
       |    CAST(1.0 AS DOUBLE) AS x0,
       |    len($toks) / CAST(100.0 AS DOUBLE) AS x1,
       |    round(len(list_distinct($toks)) / len($toks), 4) AS x2,
       |    round((length(text) - len($toks) + 1) / len($toks), 4)
       |      / CAST(10.0 AS DOUBLE) AS x3,
       |    CASE WHEN source = 'src0' THEN CAST(1.0 AS DOUBLE)
       |         ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM documents),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
       |w0 AS (SELECT CAST(0.0 AS DOUBLE) AS a0, CAST(0.0 AS DOUBLE) AS a1,
       |  CAST(0.0 AS DOUBLE) AS a2, CAST(0.0 AS DOUBLE) AS a3),
       |${(1 to 3).map(duckGdRound(_, 0.5)).mkString(",\n")},
       |lrscored AS MATERIALIZED (SELECT doc_id, y, round(p, 6) AS score
       |  FROM (SELECT doc_id, y,
       |      greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
       |        0.5 + (a0*x0 + a1*x1 + a2*x2 + a3*x3) / CAST(4.0 AS DOUBLE))) AS p
       |    FROM f CROSS JOIN w3))""".stripMargin

  /** One unrolled k-core peel round over the bidirectional edge CTE
    * u`r-1` → survivors s`r` → u`r`. Peeling is monotone — converged
    * rounds are no-ops — so a generous fixed unroll replays the Spark
    * loop's run-to-fixpoint exactly. MATERIALIZED: u(r-1) is referenced
    * three times per round and DuckDB would otherwise inline the
    * 3^rounds reference tree (fd exhaustion). */
  private def duckPeel(r: Int): String =
    s"""s$r AS MATERIALIZED (SELECT x
       |  FROM (SELECT x, count(*) AS c FROM u${r - 1} GROUP BY x)
       |  WHERE c >= 2),
       |u$r AS MATERIALIZED (SELECT u.x, u.y FROM u${r - 1} u
       |  JOIN s$r a ON u.x = a.x JOIN s$r b ON u.y = b.x)""".stripMargin

  /** One unrolled PageRank round over (e, d, r`r-1`): the per-edge 8-dp
    * contribution is lifted to a fixed-point BIGINT before the sum — the
    * identical lift [[graft.ops.Cluster.pageRank]] applies — so the
    * iterated per-node sum is integer arithmetic in BOTH engines and no
    * float-reorder ulp can flip a round and compound. */
  private def duckPagerankRound(r: Int): String =
    s"""r$r AS (SELECT dst AS id,
       |    round(CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
       |      * (CAST(sum(CAST(round(round(r.rank / d.deg, 8) * 1e8, 0) AS BIGINT)) AS DOUBLE) / 1e8), 8) AS rank
       |  FROM e JOIN r${r - 1} r ON e.src = r.id JOIN d ON e.src = d.src
       |  GROUP BY dst)""".stripMargin
  /** Okapi BM25 of the corpus against the fixed probe terms — judges BOTH
    * `bm25_retrieval` (scored from raw text) and `bm25_indexed` (scored
    * from the materialized postings index): the two must agree exactly. */
  private val duckBm25Ctes: String =
    """base AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
      |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM base),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(tk) AS tok FROM base)
      |  WHERE tok IN ('table', 'query', 'spark') GROUP BY doc_id, tok),
      |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
      |sc AS (SELECT doc_id,
      |    ln((n - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
      |        + CAST(1.0 AS DOUBLE))
      |      * (tf * CAST(2.2 AS DOUBLE))
      |      / (tf + CAST(1.2 AS DOUBLE)
      |          * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS w
      |  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN st)""".stripMargin
  /** Fixed-point BM25 score sum — the identical 6-dp lift
    * [[graft.ops.Retrieval]]'s bm25Score applies before aggregating. */
  private val duckBm25Sum: String =
    "round(CAST(sum(CAST(round(round(w, 6) * 1e6, 0) AS BIGINT)) AS DOUBLE) / 1e6, 4)"
  private val duckBm25: String =
    s"""WITH $duckBm25Ctes
       |SELECT doc_id, $duckBm25Sum AS score, CAST(count(*) AS BIGINT) AS n_terms
       |FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** The BM25 per-(doc, term) weight formula over aliased tf/df tables —
    * shared by the PRF oracle's two retrieval rounds. */
  private def duckBm25W: String =
    """ln((n - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
      |        + CAST(1.0 AS DOUBLE))
      |      * (tf * CAST(2.2 AS DOUBLE))
      |      / (tf + CAST(1.2 AS DOUBLE)
      |          * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))""".stripMargin

  /** Rocchio PRF: round 1 over the seed terms, top-3 docs, fixed-point
    * tf·idf expansion term selection, round 2 over seed ∪ expansion —
    * mirrors [[graft.ops.Retrieval.bm25Prf]] stage for stage. */
  private val duckBm25Prf: String =
    s"""WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
       |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM base),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
       |tfall AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(tk) AS tok FROM base) GROUP BY doc_id, tok),
       |tf1 AS (SELECT * FROM tfall WHERE tok IN ('table', 'query', 'spark')),
       |dfq1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf1 GROUP BY tok),
       |sc1 AS (SELECT doc_id, $duckBm25W AS w
       |  FROM tf1 JOIN dfq1 USING (tok) JOIN dl USING (doc_id) CROSS JOIN st),
       |r1 AS (SELECT doc_id FROM (
       |    SELECT doc_id, $duckBm25Sum AS score FROM sc1 GROUP BY doc_id)
       |  ORDER BY score DESC, doc_id LIMIT 3),
       |cand AS (SELECT tfall.* FROM tfall JOIN r1 USING (doc_id)
       |  WHERE tok NOT IN ('table', 'query', 'spark')),
       |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tfall
       |  WHERE tok IN (SELECT tok FROM cand) GROUP BY tok),
       |tsc AS (SELECT cand.tok,
       |    sum(CAST(round(round(cand.tf * ln((n - df + CAST(0.5 AS DOUBLE))
       |      / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)), 6) * 1e6, 0)
       |      AS BIGINT)) AS twfx
       |  FROM cand JOIN dfc USING (tok) CROSS JOIN st GROUP BY cand.tok),
       |expn AS (SELECT tok FROM tsc ORDER BY twfx DESC, tok LIMIT 5),
       |tf2 AS (SELECT * FROM tfall WHERE tok IN ('table', 'query', 'spark')
       |  OR tok IN (SELECT tok FROM expn)),
       |dfq2 AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY tok),
       |sc2 AS (SELECT doc_id, $duckBm25W AS w
       |  FROM tf2 JOIN dfq2 USING (tok) JOIN dl USING (doc_id) CROSS JOIN st)
       |SELECT doc_id, $duckBm25Sum AS score, CAST(count(*) AS BIGINT) AS n_terms
       |FROM sc2 GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** 64-bit simhash bits over a precomputed per-doc digit array `ds`
    * (list of 16-digit lists, one per token) — mirrors
    * [[graft.ops.Dedup.simhash64]]'s bit/digit arithmetic exactly. */
  private val duckSimhashBits64: String = (1 to 64).map { i =>
    val digit = (i - 1) / 4 + 1
    val pow = 1 << (3 - ((i - 1) % 4))
    s"""CASE WHEN 2 * list_sum(list_transform(ds,
       |  d -> (d[$digit] // $pow) % 2)) > len(ds) THEN '1' ELSE '0' END""".stripMargin
  }.mkString("concat(", ", ", ")")
  private val duckCos =
    """round(list_dot_product(qvec, cvec) /
      |  (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(cvec, cvec))), 4)""".stripMargin

  /** Hyperplane p as a DuckDB double-array literal (identical values to
    * Similarity.lshBucket's plan literals — same md5 derivation). */
  private def duckPlane(p: Int): String =
    (0 until 64).map(d => Similarity.planeComponent(p, d).toString)
      .mkString("[", ", ", "]")

  /** Band b's sign-bucket bit string over v (a DOUBLE[] column). */
  private def duckBucket(b: Int): String =
    (0 until LshPlanesPerBand).map { j =>
      s"(CASE WHEN list_dot_product(v, ${duckPlane(b * LshPlanesPerBand + j)}) >= 0 " +
        "THEN '1' ELSE '0' END)"
    }.mkString("concat(", ", ", ")")

  /** Shared LM CTE chain (mirrors [[graft.ops.TextAnalysis.lmScore]]):
    * per-occurrence bigram stream → bigram/prefix counts → per-doc NLL as
    * `lmscored(doc_id, n_bigrams, nll)`. */
  private def duckLmCte: String =
    s"""WITH db AS (SELECT doc_id, b, split_part(b, ' ', 1) AS w
       |  FROM (SELECT doc_id, unnest(${duckShingles(2)}) AS b FROM documents)),
       |bi AS (SELECT b, count(*) AS cb FROM db GROUP BY b),
       |pre AS (SELECT w, count(*) AS cu FROM db GROUP BY w),
       |vocab AS (SELECT count(*) AS v FROM pre),
       |lmscored AS (SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_bigrams,
       |    round(-avg(ln((cb + 0.5) / (cu + 0.5 * v))), 4) AS nll
       |  FROM db JOIN bi USING (b) JOIN pre USING (w) CROSS JOIN vocab
       |  GROUP BY doc_id)""".stripMargin

  /** Morton interleave mirror of [[graft.ops.Layout.zValue]]: bit i of `a`
    * at position 2i, of `b` at 2i+1 — pure integer shift/mask, exact in
    * both engines. */
  private def duckZ(a: String, b: String): String =
    ((0 until 16).map(i => s"((($a >> $i) & 1) << ${2 * i})") ++
      (0 until 16).map(i => s"((($b >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  private val duckCosIds =
    """round(list_dot_product(qv.v, cv.v) /
      |    (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))), 4)""".stripMargin

  /** CTE chain ending in `lshk` — the LSH top-k table — shared by the
    * standalone LSH oracle and the recall-evaluation oracle. */
  private def duckKnnLshCtes: String = {
    val bandSelects = (0 until LshBands).map(b =>
      s"SELECT vec_id, $b AS band_idx, ${duckBucket(b)} AS bk FROM e").mkString("\nUNION ALL\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |banded AS ($bandSelects),
       |cband AS (SELECT vec_id, band_idx, bk FROM (
       |    SELECT *, row_number() OVER (PARTITION BY band_idx, bk ORDER BY vec_id) AS rn
       |    FROM banded) WHERE rn <= $LshBucketCap),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
       |         FROM banded q JOIN cband c ON q.band_idx = c.band_idx AND q.bk = c.bk
       |         WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |scored AS (SELECT query_id, corpus_id, $duckCosIds AS cos
       |           FROM cand JOIN e qv ON qv.vec_id = query_id
       |                     JOIN e cv ON cv.vec_id = corpus_id),
       |lshk AS (SELECT query_id, corpus_id, cos, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, corpus_id) AS rank
       |  FROM scored) WHERE rank <= 5)""".stripMargin
  }

  private def duckKnnLshSql: String =
    s"""WITH $duckKnnLshCtes
       |SELECT query_id, corpus_id, cos, rank FROM lshk
       |ORDER BY query_id, rank""".stripMargin

  /** Recall@5 of the LSH ANN against brute-force ground truth, per query —
    * brute CTE names (q/c/s) are disjoint from the LSH chain's. */
  private def duckAnnRecallSql: String =
    s"""WITH $duckKnnLshCtes,
       |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
       |      FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
       |s AS (SELECT query_id, corpus_id, $duckCos AS cos
       |      FROM c CROSS JOIN q WHERE query_id <> corpus_id),
       |brutek AS (SELECT query_id, corpus_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, corpus_id) AS rank
       |  FROM s) WHERE rank <= 5)
       |SELECT b.query_id AS query_id, round(count(l.corpus_id) / count(*), 4) AS recall
       |FROM brutek b LEFT JOIN lshk l
       |  ON l.query_id = b.query_id AND l.corpus_id = b.corpus_id
       |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin

  /** Shared CTE chain: e (typed embeddings) → cents (deterministic stride
    * centroids, mirrors [[graft.ops.Similarity.seedCentroids]]) → sims →
    * cells (nearest-centroid assignment, ties to lowest cid) — the prefix
    * of both the IVF-ANN and the semantic-dedup oracles. */
  /** IVF cells CTE, centroid seeding restricted to `centPred` — "TRUE"
    * replays the in-query op; a base predicate replays the PERSISTED
    * index's night-0 seeding (cells still assign the whole corpus:
    * nearest-centroid is per-vector, so nightly assignment ≡ one-shot). */
  private def duckIvfCellsCteFrom(centPred: String): String = {
    val rawCos =
      """list_dot_product(e.v, cents.cvec) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.cvec, cents.cvec)))""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cents AS (SELECT CAST((rn - 1) // 7 AS INT) AS cid, v AS cvec FROM (
       |    SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
       |    FROM e WHERE $centPred ORDER BY vec_id LIMIT ${IvfCentroids * 7})
       |  WHERE (rn - 1) % 7 = 0),
       |sims AS (SELECT e.vec_id, cents.cid, $rawCos AS s FROM e CROSS JOIN cents),
       |cells AS (SELECT vec_id AS corpus_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
       |    FROM sims) WHERE rn = 1)""".stripMargin
  }

  private def duckIvfCellsCte: String = duckIvfCellsCteFrom("TRUE")

  private def duckKnnIvfBody: String =
    s"""probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rn
       |    FROM sims WHERE vec_id < 10) WHERE rn <= $IvfProbes),
       |cand AS (SELECT DISTINCT query_id, corpus_id
       |         FROM probes JOIN cells USING (cell)
       |         WHERE query_id <> corpus_id),
       |scored AS (SELECT query_id, corpus_id, $duckCosIds AS cos
       |           FROM cand JOIN e qv ON qv.vec_id = query_id
       |                     JOIN e cv ON cv.vec_id = corpus_id)
       |SELECT query_id, corpus_id, cos, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, corpus_id) AS rank
       |  FROM scored) WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  private def duckKnnIvfSql: String =
    s"""$duckIvfCellsCte,
       |$duckKnnIvfBody""".stripMargin

  /** Oracle for the PERSISTED nightly IVF index: centroids seeded from
    * the base corpus (ids ∉ 0 mod 5 — the night-0 predicate), cells over
    * the full corpus, probes and ranking verbatim. */
  private def duckKnnIvfNightlySql: String =
    s"""${duckIvfCellsCteFrom("vec_id % 5 <> 0")},
       |$duckKnnIvfBody""".stripMargin

  /** The per-subspace slice expression shared by every PQ CTE. */
  private def duckPqSlice(v: String): String =
    s"$v[CAST(j * $PqSubDim + 1 AS INT):CAST(j * $PqSubDim + $PqSubDim AS INT)]"

  /** WITH-continuation fragment (no leading WITH — composable after any
    * chain that defines `e`) producing `codes` — the PQ subspace code
    * per (vector, subspace) against the stride-seeded codebooks;
    * mirrors [[graft.ops.Similarity.pqCodesLong]]
    * construct-for-construct. Defines pc/scents/sub/dd/codes. */
  private def duckPqChain: String = duckPqChainFrom("TRUE")

  /** [[duckPqChain]] with codebook seeding restricted to `centPred` —
    * the persisted-PQ oracle seeds from the night-0 base corpus while
    * codes still cover the full table (mirrors
    * [[graft.ops.AnnIndex.bootstrapPq]] + nightly [[graft.ops.AnnIndex
    * .ingestPq]] chains exactly). */
  private def duckPqChainFrom(centPred: String): String =
    s"""pc AS (SELECT CAST((rn - 1) // 7 AS INT) AS cid, v AS cvec FROM (
       |    SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
       |    FROM e WHERE $centPred ORDER BY vec_id LIMIT ${PqK * 7})
       |  WHERE (rn - 1) % 7 = 0),
       |scents AS (SELECT cid, j, ${duckPqSlice("cvec")} AS scv
       |  FROM pc, unnest(range(0, $PqM)) AS t(j)),
       |sub AS (SELECT vec_id, j, ${duckPqSlice("v")} AS sv
       |  FROM e, unnest(range(0, $PqM)) AS t(j)),
       |dd AS (SELECT vec_id, s.j, cid,
       |    list_dot_product(sv, sv) - 2 * list_dot_product(sv, scv)
       |      + list_dot_product(scv, scv) AS d2
       |  FROM sub s JOIN scents c ON s.j = c.j),
       |codes AS (SELECT vec_id, j, code FROM (
       |    SELECT vec_id, j, cid AS code,
       |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn FROM dd)
       |  WHERE rn = 1)""".stripMargin

  /** WITH-continuation fragment defining q/lut — the per-query ADC
    * lookup tables over `scents`; shared by every PQ ANN oracle. */
  private def duckPqLutChain: String =
    s"""q AS (SELECT vec_id AS query_id, j, ${duckPqSlice("v")} AS qv
       |  FROM e, unnest(range(0, $PqM)) AS t(j) WHERE vec_id < 10),
       |lut AS (SELECT query_id, q.j, cid,
       |    list_dot_product(qv, qv) - 2 * list_dot_product(qv, scv)
       |      + list_dot_product(scv, scv) AS contrib
       |  FROM q JOIN scents c ON q.j = c.j)""".stripMargin

  private def duckPqCodesCte: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$duckPqChain""".stripMargin

  private def duckPqCodesCteFrom(centPred: String): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${duckPqChainFrom(centPred)}""".stripMargin

  /** Unrolled BPE oracle: each round = pair-count + argmax + triple
    * literal replace, mirroring [[graft.ops.Bpe]] construct-for-
    * construct (MergePasses = 3). */
  private def duckBpeCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
         |    SELECT f, syms[CAST(i AS INT)] || ' ' || syms[CAST(i + 1 AS INT)] AS pair
         |    FROM (SELECT f, list_filter(string_split(state, '|'), x -> x <> '') AS syms
         |      FROM v${r - 1}),
         |      unnest(range(1, len(syms))) AS t(i))
         |  GROUP BY pair),
         |b$r AS (SELECT split_part(pair, ' ', 1) AS sym_a, split_part(pair, ' ', 2) AS sym_b,
         |    replace(pair, ' ', '') AS merged, cnt
         |  FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         |v$r AS (SELECT w, f,
         |    coalesce(replace(replace(replace(state,
         |      '|' || sym_a || '|' || sym_b || '|', '|' || merged || '|'),
         |      '|' || sym_a || '|' || sym_b || '|', '|' || merged || '|'),
         |      '|' || sym_a || '|' || sym_b || '|', '|' || merged || '|'), state) AS state
         |  FROM v${r - 1} LEFT JOIN b$r ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH v0 AS (SELECT w, count(*) AS f,
       |    '|' || array_to_string(list_transform(range(1, len(w) + 1),
       |      i -> substring(w, CAST(i AS INT), 1)), '|') || '|' AS state
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |$roundCtes""".stripMargin
  }

  private def duckBpeSql(rounds: Int): String = {
    val finalSel = (1 to rounds).map { r =>
      s"SELECT $r AS round, sym_a, sym_b, merged, cnt FROM b$r"
    }.mkString("\nUNION ALL ")
    s"""${duckBpeCtes(rounds)}
       |$finalSel
       |ORDER BY round""".stripMargin
  }

  private def duckBpeSegmentSql(rounds: Int): String =
    s"""${duckBpeCtes(rounds)}
       |SELECT w, CAST(f AS BIGINT) AS f,
       |  array_to_string(list_filter(string_split(state, '|'), x -> x <> ''), ' ')
       |    AS segmented,
       |  CAST(len(list_filter(string_split(state, '|'), x -> x <> '')) AS BIGINT)
       |    AS n_tokens
       |FROM v$rounds ORDER BY w""".stripMargin

  /** DuckDB shingles over an arbitrary token-list column (the fixed
    * [[duckShingles]] is bound to the raw `text` column). */
  private def duckShinglesOf(tk: String, n: Int): String =
    s"""CASE WHEN len($tk) < $n THEN [array_to_string($tk, ' ')]
       |ELSE list_transform(range(1, len($tk) - ${n - 2}),
       |  i -> array_to_string($tk[i:i+${n - 1}], ' ')) END""".stripMargin

  private def duckSweepPoint(p: Int): String =
    s"""pr$p AS (SELECT vec_id AS query_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rn
       |    FROM sims WHERE vec_id < 10) WHERE rn <= $p),
       |cd$p AS (SELECT DISTINCT query_id, corpus_id
       |  FROM pr$p JOIN cells USING (cell) WHERE query_id <> corpus_id),
       |sc$p AS (SELECT query_id, corpus_id, $duckCosIds AS cos
       |  FROM cd$p JOIN e qv ON qv.vec_id = query_id JOIN e cv ON cv.vec_id = corpus_id),
       |tp$p AS (SELECT query_id, corpus_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, corpus_id) AS rank FROM sc$p) WHERE rank <= 5),
       |r$p AS (SELECT $p AS nprobe,
       |    round(CAST(count(t.query_id) AS DOUBLE) / count(*), 4) AS recall
       |  FROM brute b LEFT JOIN tp$p t USING (query_id, corpus_id))""".stripMargin

  val oracles: Map[String, String] = Map(
    "events_gap_fill" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS c,
        |    CAST((2 * sum(CAST(round(value * 10000.0, 0) AS BIGINT)) + count(*))
        |      // (2 * count(*)) AS DOUBLE) / 10000.0 AS v
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |grid AS (SELECT event_type, CAST(unnest(generate_series(
        |      CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM daily) CROSS JOIN span),
        |j AS (SELECT g.event_type, g.day, d.c FROM grid g
        |  LEFT JOIN daily d USING (event_type, day)),
        |f AS (SELECT *, max(CASE WHEN c IS NOT NULL THEN day END)
        |    OVER (PARTITION BY event_type ORDER BY day
        |          ROWS UNBOUNDED PRECEDING) AS ff_day FROM j)
        |SELECT f.event_type, f.day, CAST(coalesce(f.c, 0) AS BIGINT) AS n,
        |  d2.v AS filled_v,
        |  CAST(f.day - f.ff_day AS BIGINT) AS stale_days
        |FROM f LEFT JOIN daily d2
        |  ON d2.event_type = f.event_type AND d2.day = f.ff_day
        |ORDER BY f.event_type, f.day""".stripMargin,
    "ann_nprobe_sweep" ->
      s"""$duckIvfCellsCte,
         |bq AS (SELECT vec_id AS query_id, v AS qvec FROM e WHERE vec_id < 10),
         |bs AS (SELECT query_id, e.vec_id AS corpus_id,
         |    round(list_dot_product(qvec, e.v) /
         |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(e.v, e.v))), 4) AS cos
         |  FROM e CROSS JOIN bq WHERE query_id <> e.vec_id),
         |brute AS (SELECT query_id, corpus_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, corpus_id) AS rank FROM bs) WHERE rank <= 5),
         |${duckSweepPoint(1)},
         |${duckSweepPoint(2)},
         |${duckSweepPoint(4)}
         |SELECT nprobe, recall FROM (
         |  SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r4)
         |ORDER BY nprobe""".stripMargin,
    "token_fertility" ->
      s"""SELECT lang,
         |  CAST(sum(len($toks)) AS BIGINT) AS ws_tokens,
         |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))) AS BIGINT)
         |    AS bpeish_tokens,
         |  round(CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))) AS DOUBLE) /
         |    sum(len($toks)), 4) AS fertility
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "graph_modularity" ->
      s"""WITH $duckTriangleCtes,
         |lab AS (SELECT vec_id, label FROM embeddings WHERE vec_id < 300),
         |mm AS (SELECT count(*) AS m FROM pe),
         |tagged AS (SELECT p.x, p.y, la.label AS ca, lb.label AS cb
         |  FROM pe p JOIN lab la ON la.vec_id = p.x JOIN lab lb ON lb.vec_id = p.y),
         |intra AS (SELECT ca AS label, CAST(count(*) AS BIGINT) AS intra_edges
         |  FROM tagged WHERE ca = cb GROUP BY 1),
         |deg AS (SELECT label, CAST(count(*) AS BIGINT) AS degree_sum FROM (
         |    SELECT ca AS label FROM tagged UNION ALL SELECT cb FROM tagged)
         |  GROUP BY 1)
         |SELECT label, coalesce(intra_edges, 0) AS intra_edges, degree_sum,
         |  round(CAST(coalesce(intra_edges, 0) AS DOUBLE) / m -
         |    power(CAST(degree_sum AS DOUBLE) / (2.0 * m), 2.0), 6) AS contribution
         |FROM deg LEFT JOIN intra USING (label) CROSS JOIN mm
         |ORDER BY label""".stripMargin,
    "forecast_snaive" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |md AS (SELECT max(day) AS max_day FROM daily),
        |j AS (SELECT d.event_type, d.c, p.c AS pred
        |  FROM daily d JOIN daily p
        |    ON p.event_type = d.event_type AND p.day + 7 = d.day
        |  CROSS JOIN md WHERE d.day > md.max_day - 7)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  round(avg(CAST(abs(c - pred) AS DOUBLE)), 4) AS mae,
        |  round(avg(CAST(abs(c - pred) AS DOUBLE) / c), 6) AS mape
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "text_readability" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |    AS n_sentences,
        |  CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT)
        |    AS n_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE) /
        |        CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE))
        |    - 84.6 * (CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS DOUBLE) /
        |        CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin,
    "kmv_merge" ->
      """WITH toksrc AS (SELECT DISTINCT source, word FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS word FROM documents)),
        |hs AS (SELECT DISTINCT source,
        |    (list_sum(list_transform(range(1, 13),
        |      i -> (instr('0123456789abcdef', substring(md5(word), CAST(i AS INT), 1)) - 1)
        |        * 16 ** (12 - i))) + 1.0) / 281474976710656.0 AS u
        |  FROM toksrc),
        |sk AS (SELECT source, u FROM (
        |    SELECT source, u, row_number() OVER (PARTITION BY source ORDER BY u) AS rn
        |    FROM hs) WHERE rn <= 256)
        |SELECT source, round(CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |    ELSE 255.0 / max(u) END, 4) AS n_approx
        |FROM sk GROUP BY source ORDER BY source""".stripMargin,
    "kmv_source_overlap" ->
      """WITH toksrc AS (SELECT DISTINCT source AS g, word FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS word FROM documents)),
        |hs AS (SELECT DISTINCT g,
        |    (list_sum(list_transform(range(1, 13),
        |      i -> (instr('0123456789abcdef', substring(md5(word), CAST(i AS INT), 1)) - 1)
        |        * 16 ** (12 - i))) + 1.0) / 281474976710656.0 AS u
        |  FROM toksrc),
        |sk AS (SELECT g, u FROM (
        |    SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u) AS rn FROM hs)
        |  WHERE rn <= 256),
        |gs AS (SELECT DISTINCT g FROM sk),
        |pr AS (SELECT a.g AS g_a, b.g AS g_b FROM gs a JOIN gs b ON a.g < b.g),
        |merged AS (SELECT g_a, g_b, u, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        |    SELECT p.g_a, p.g_b, s.u, 1 AS in_a, 0 AS in_b FROM pr p JOIN sk s ON s.g = p.g_a
        |    UNION ALL
        |    SELECT p.g_a, p.g_b, s.u, 0, 1 FROM pr p JOIN sk s ON s.g = p.g_b)
        |  GROUP BY 1, 2, 3),
        |topk AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY g_a, g_b ORDER BY u) AS rn FROM merged)
        |  WHERE rn <= 256)
        |SELECT g_a, g_b,
        |  round(CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |    ELSE 255.0 / max(u) END, 4) AS union_approx,
        |  round(CAST(sum(in_a * in_b) AS DOUBLE) / count(*), 6) AS jaccard_approx,
        |  round((CAST(sum(in_a * in_b) AS DOUBLE) / count(*)) *
        |    CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |    ELSE 255.0 / max(u) END, 4) AS intersect_approx
        |FROM topk GROUP BY g_a, g_b ORDER BY g_a, g_b""".stripMargin,
    "lm_kneser_ney" ->
      s"""WITH db AS (SELECT doc_id, b, split_part(b, ' ', 1) AS w, split_part(b, ' ', 2) AS w2
         |  FROM (SELECT doc_id, unnest(${duckShingles(2)}) AS b FROM documents)),
         |bi AS (SELECT b, count(*) AS cb FROM db GROUP BY b),
         |pre AS (SELECT w, count(*) AS cu, count(DISTINCT w2) AS n1fwd FROM db GROUP BY w),
         |cont AS (SELECT w2, count(DISTINCT w) AS n1bwd FROM db GROUP BY w2),
         |btot AS (SELECT count(*) AS bcnt FROM bi)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(-avg(ln((cb - 0.75) / cu +
         |    0.75 * n1fwd / cu * (CAST(n1bwd AS DOUBLE) / bcnt))), 4) AS nll_kn
         |FROM db JOIN bi USING (b) JOIN pre USING (w) JOIN cont USING (w2) CROSS JOIN btot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "retrieval_qlm" ->
      """WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM base),
        |tk AS (SELECT doc_id, unnest(toks) AS tok FROM base),
        |ctot AS (SELECT sum(dl) AS ct FROM dl),
        |terms(tok) AS (VALUES ('table'), ('query'), ('spark')),
        |cstat AS (SELECT tok, pc FROM (
        |    SELECT t.tok, CAST(coalesce(cf, 0) AS DOUBLE) / ct AS pc
        |    FROM terms t LEFT JOIN (SELECT tok, count(*) AS cf FROM tk GROUP BY tok) c
        |      ON c.tok = t.tok CROSS JOIN ctot)
        |  WHERE pc > 0),
        |qstats AS (SELECT sum(ln(pc * 2000.0)) AS lp_all, count(*) AS nq FROM cstat),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk JOIN terms USING (tok) GROUP BY 1, 2),
        |pres AS (SELECT doc_id, sum(ln(tf + 2000.0 * pc) - ln(2000.0 * pc)) AS dsum
        |  FROM tf JOIN cstat USING (tok) GROUP BY doc_id)
        |SELECT doc_id, dl,
        |  round(coalesce(dsum, 0.0) + lp_all - nq * ln(dl + 2000.0), 4) AS score
        |FROM dl LEFT JOIN pres USING (doc_id) CROSS JOIN qstats
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "text_mojibake" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '�')) AS BIGINT) AS n_replacement,
        |  CAST(len(regexp_extract_all(text, '[\x01-\x08\x0b\x0c\x0e-\x1f]')) AS BIGINT) AS n_control,
        |  CAST(len(regexp_extract_all(text, '(Ã.|â€.|Â.)')) AS BIGINT) AS n_artifacts,
        |  round(CAST(len(regexp_extract_all(text, '�')) +
        |      len(regexp_extract_all(text, '[\x01-\x08\x0b\x0c\x0e-\x1f]')) +
        |      len(regexp_extract_all(text, '(Ã.|â€.|Â.)')) AS DOUBLE) /
        |    greatest(length(text), 1), 6) AS damage_ratio,
        |  (CAST(len(regexp_extract_all(text, '�')) +
        |      len(regexp_extract_all(text, '[\x01-\x08\x0b\x0c\x0e-\x1f]')) +
        |      len(regexp_extract_all(text, '(Ã.|â€.|Â.)')) AS DOUBLE) /
        |    greatest(length(text), 1) > 0.001) AS suspect
        |FROM documents ORDER BY doc_id""".stripMargin,
    "source_kl" ->
      """WITH sw AS (SELECT source AS src, word, count(*) AS c FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  GROUP BY 1, 2),
        |corpus AS (SELECT word, sum(c) AS cc FROM sw GROUP BY word),
        |vs AS (SELECT count(*) AS v, sum(cc) AS nc FROM corpus),
        |scal AS (SELECT sum(ln((cc + 1.0) / (nc + v))) AS lc FROM corpus CROSS JOIN vs),
        |st AS (SELECT src, sum(c) AS ns FROM sw GROUP BY src)
        |SELECT src, CAST(count(*) AS BIGINT) AS n_words,
        |  round(sum(ps * ln(ps / pc)) +
        |    (1.0 / (ns + v)) * ((v - count(*)) * ln(1.0 / (ns + v)) -
        |      (lc - sum(ln(pc)))), 4) AS kl_vs_corpus
        |FROM (SELECT src, ns, v, lc,
        |    (c + 1.0) / (ns + v) AS ps, (cc + 1.0) / (nc + v) AS pc
        |  FROM sw JOIN corpus USING (word) JOIN st USING (src) CROSS JOIN vs CROSS JOIN scal)
        |GROUP BY src, ns, v, lc ORDER BY src""".stripMargin,
    "er_pairs" ->
      """WITH recs AS (SELECT p_partkey AS id, split_part(p_name, ' ', 1) AS adj,
        |    string_split(p_name, ' ')[-1] AS noun, p_brand AS brand,
        |    p_type AS ptype, p_size AS size FROM part),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.ptype AS ta, b.ptype AS tb, a.brand AS ba, b.brand AS bb,
        |    a.adj AS aa, b.adj AS ab, a.size AS sa, b.size AS sb
        |  FROM recs a JOIN recs b
        |    ON a.noun = b.noun AND a.id < b.id AND (a.size = b.size OR a.brand = b.brand))
        |SELECT id_a, id_b, score FROM (
        |  SELECT id_a, id_b, round(
        |    CASE WHEN ta = tb THEN 0.4 ELSE 0.0 END +
        |    CASE WHEN ba = bb THEN 0.3 ELSE 0.0 END +
        |    CASE WHEN aa = ab THEN 0.2 ELSE 0.0 END +
        |    0.1 * (1.0 - CAST(abs(sa - sb) AS DOUBLE) / 50.0), 4) AS score
        |  FROM cand)
        |WHERE score >= 0.9 ORDER BY id_a, id_b""".stripMargin,
    "er_entities" ->
      """WITH RECURSIVE recs AS (SELECT p_partkey AS id, split_part(p_name, ' ', 1) AS adj,
        |    string_split(p_name, ' ')[-1] AS noun, p_brand AS brand,
        |    p_type AS ptype, p_size AS size FROM part),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.ptype AS ta, b.ptype AS tb, a.brand AS ba, b.brand AS bb,
        |    a.adj AS aa, b.adj AS ab, a.size AS sa, b.size AS sb
        |  FROM recs a JOIN recs b
        |    ON a.noun = b.noun AND a.id < b.id AND (a.size = b.size OR a.brand = b.brand)),
        |pairs AS (SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b, round(
        |      CASE WHEN ta = tb THEN 0.4 ELSE 0.0 END +
        |      CASE WHEN ba = bb THEN 0.3 ELSE 0.0 END +
        |      CASE WHEN aa = ab THEN 0.2 ELSE 0.0 END +
        |      0.1 * (1.0 - CAST(abs(sa - sb) AS DOUBLE) / 50.0), 4) AS score
        |    FROM cand)
        |  WHERE score >= 0.9),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
        |comp AS (SELECT node, min(lab) AS entity FROM reach GROUP BY node)
        |SELECT entity, CAST(count(*) AS BIGINT) AS n_members,
        |  round(max(p_retailprice) - min(p_retailprice), 2) AS price_spread
        |FROM comp JOIN part ON p_partkey = node
        |GROUP BY entity ORDER BY entity""".stripMargin,
    "interval_coverage" ->
      """WITH o AS (SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pus
        |  FROM events),
        |m AS (SELECT user_id, event_id, ts,
        |    CASE WHEN pus IS NULL OR epoch_us(ts) - pus > 21600000000 THEN 1 ELSE 0 END AS st
        |  FROM o),
        |x AS (SELECT user_id, ts,
        |    CAST(sum(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM m),
        |sess AS (SELECT epoch_us(min(ts)) AS su, epoch_us(max(ts)) AS eu
        |  FROM x GROUP BY user_id, session_idx),
        |frags AS (SELECT day, greatest(su, day * 86400000000) AS fs,
        |    least(eu, (day + 1) * 86400000000) AS fe
        |  FROM (SELECT su, eu, unnest(range(su // 86400000000,
        |      greatest(eu - 1, su) // 86400000000 + 1)) AS day FROM sess)
        |  WHERE greatest(su, day * 86400000000) < least(eu, (day + 1) * 86400000000)),
        |ev AS (SELECT day, t, d, CAST(sum(d) AS BIGINT) AS delta FROM (
        |    SELECT day, fs AS t, 1 AS d FROM frags
        |    UNION ALL SELECT day, fe, -1 FROM frags) GROUP BY 1, 2, 3),
        |sw AS (SELECT day, t, d, delta,
        |    CAST(sum(delta) OVER (PARTITION BY day ORDER BY t, d
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc,
        |    lead(t) OVER (PARTITION BY day ORDER BY t, d) AS next_t
        |  FROM ev)
        |SELECT CAST(make_timestamp(day * 86400000000) AS DATE) AS day,
        |  CAST(max(conc) AS BIGINT) AS peak_concurrency,
        |  round(CAST(sum(CASE WHEN conc > 0 AND next_t IS NOT NULL
        |    THEN next_t - t ELSE 0 END) AS DOUBLE) / 1e6, 3) AS covered_sec,
        |  CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS BIGINT) AS n_starts
        |FROM sw GROUP BY day ORDER BY day""".stripMargin,
    "robust_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |mad AS (SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM events JOIN med USING (event_type) GROUP BY event_type)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN abs(value - med) > 3.0 * 1.4826 * mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  round(med, 6) AS median, round(mad, 6) AS mad,
        |  round(CAST(sum(CASE WHEN abs(value - med) > 3.0 * 1.4826 * mad THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS outlier_rate
        |FROM events JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY event_type, med, mad ORDER BY event_type""".stripMargin,
    "state_asof" ->
      """SELECT user_id, event_type AS last_event_type, value AS last_value,
        |  ts AS last_ts
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "shuffle_shards" ->
      """WITH s AS (SELECT doc_id, md5('shuf42|' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM documents),
        |b AS (SELECT doc_id, skey,
        |    CAST(((instr('0123456789abcdef', substring(skey, 1, 1)) - 1) * 4096
        |      + (instr('0123456789abcdef', substring(skey, 2, 1)) - 1) * 256
        |      + (instr('0123456789abcdef', substring(skey, 3, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substring(skey, 4, 1)) - 1)) % 8 AS BIGINT)
        |      AS shard
        |  FROM s)
        |SELECT doc_id, skey, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS BIGINT)
        |    AS pos
        |FROM b ORDER BY doc_id""".stripMargin,
    "dedup_incremental" ->
      """WITH f AS (SELECT doc_id,
        |    md5(array_to_string(string_split(text, ' ')[1:10], ' ')) AS fp
        |  FROM documents),
        |c AS (SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id, fp FROM f WHERE doc_id % 2 = 1)
        |SELECT b.doc_id, b.fp, c.fp IS NOT NULL AS in_corpus,
        |  b.doc_id = min(b.doc_id) OVER (PARTITION BY b.fp) AS first_in_batch,
        |  c.fp IS NULL AND b.doc_id = min(b.doc_id) OVER (PARTITION BY b.fp) AS novel
        |FROM b LEFT JOIN c ON b.fp = c.fp ORDER BY doc_id""".stripMargin,
    // Block-join candidate oracle: by pigeonhole (3 blocks, <=2 differing
    // bits) block-sharing candidates provably contain EVERY hd<=2 pair, so
    // this is exactly equivalent to brute force for the gated output (the
    // brute-force completeness of the block scheme itself is already
    // oracle-pinned by dedup_simhash_hamming on the same corpus).
    "dedup_simhash_novelty" -> {
      val blockKeyCtes = (tbl: String) =>
        graft.ops.Dedup.HammingBlocks.zipWithIndex.map { case ((st, ln), b) =>
          s"SELECT DISTINCT s, concat('$b|', substring(s, $st, $ln)) AS k FROM $tbl"
        }.mkString(" UNION ALL ")
      s"""WITH dg AS (SELECT doc_id,
         |    list_transform(list_transform($toks, t -> md5(t)),
         |      h -> list_transform(range(1, 17),
         |        j -> instr('0123456789abcdef', substring(h, CAST(j AS INT), 1)) - 1)) AS ds
         |  FROM documents),
         |sh AS (SELECT doc_id, $duckSimhashBits64 AS s FROM dg),
         |nw AS (SELECT doc_id, s FROM sh WHERE doc_id % 2 = 1),
         |old AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
         |kn AS (${blockKeyCtes("nw")}),
         |ko AS (${blockKeyCtes("old")}),
         |cand AS (SELECT DISTINCT kn.s AS sn, ko.s AS so
         |  FROM kn JOIN ko ON kn.k = ko.k),
         |hd AS (SELECT sn, so,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CASE WHEN substring(sn, CAST(i AS INT), 1)
         |          = substring(so, CAST(i AS INT), 1) THEN 0 ELSE 1 END)) AS d
         |  FROM cand),
         |h AS (SELECT sn, CAST(min(d) AS BIGINT) AS min_dist
         |  FROM hd WHERE d <= 2 GROUP BY sn)
         |SELECT nw.doc_id, nw.s AS simhash, h.min_dist,
         |  h.min_dist IS NULL AS novel
         |FROM nw LEFT JOIN h ON nw.s = h.sn ORDER BY nw.doc_id""".stripMargin
    },
    "domain_filter" ->
      """WITH d AS (SELECT source,
        |    CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS dw,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS w,
        |    CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS short
        |  FROM documents),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(short) AS BIGINT) AS n_short,
        |    sum(dw) AS sum_dw, sum(w) AS sum_w
        |  FROM d GROUP BY 1)
        |SELECT source, n_docs, n_short,
        |  round(sum_dw * 1.0 / sum_w, 4) AS pooled_ratio,
        |  round(n_short * 1.0 / n_docs, 4) AS short_frac,
        |  round(sum_dw * 1.0 / sum_w, 4) >= 0.48
        |    AND round(n_short * 1.0 / n_docs, 4) <= 0.4 AS keep
        |FROM a ORDER BY source""".stripMargin,
    "strip_boilerplate" ->
      """WITH l AS (SELECT doc_id, i,
        |    array_to_string(wr[CAST(i * 10 + 1 AS INT):CAST(i * 10 + 10 AS INT)], ' ') AS line
        |  FROM (SELECT doc_id, string_split(text, ' ') AS wr FROM documents),
        |    unnest(range(0, CAST(ceil(len(wr) / 10.0) AS INT))) AS t(i)),
        |c AS (SELECT md5(line) AS lh, count(DISTINCT doc_id) AS nd, min(doc_id) AS mindoc
        |  FROM l GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN nd < 2 OR doc_id = mindoc THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  coalesce(string_agg(CASE WHEN nd < 2 OR doc_id = mindoc THEN line END,
        |    ' ' ORDER BY i), '') AS text_clean
        |FROM l JOIN c ON md5(line) = lh
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "cms_counts" ->
      """WITH hx AS (SELECT user_id, j,
        |    md5('cms' || CAST(j AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)) AS h
        |  FROM events, unnest([0, 1, 2]) AS t(j)),
        |hb AS (SELECT user_id, j,
        |    ((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096
        |      + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 256
        |      + (instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substring(h, 4, 1)) - 1)) % 32 AS bucket
        |  FROM hx),
        |sk AS (SELECT j, bucket, count(*) AS cnt FROM hb GROUP BY 1, 2),
        |kb AS (SELECT DISTINCT user_id, j, bucket FROM hb),
        |est AS (SELECT user_id, CAST(min(cnt) AS BIGINT) AS cms_est
        |  FROM kb JOIN sk USING (j, bucket) GROUP BY 1),
        |k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT k.user_id, k.n_exact, est.cms_est,
        |  est.cms_est > k.n_exact AS collided,
        |  round((est.cms_est - k.n_exact) * 1.0 / k.n_exact, 4) AS rel_err
        |FROM k JOIN est USING (user_id) ORDER BY user_id""".stripMargin,
    "pipeline_curate_v2" ->
      s"""WITH l AS (SELECT doc_id, i,
         |    array_to_string(wr[CAST(i * 10 + 1 AS INT):CAST(i * 10 + 10 AS INT)], ' ') AS line
         |  FROM (SELECT doc_id, string_split(text, ' ') AS wr FROM documents),
         |    unnest(range(0, CAST(ceil(len(wr) / 10.0) AS INT))) AS t(i)),
         |c AS (SELECT md5(line) AS lh, count(*) AS copies FROM l GROUP BY 1),
         |cl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |    CAST(sum(CASE WHEN copies <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    coalesce(string_agg(CASE WHEN copies <= 1 THEN line END, ' ' ORDER BY i), '')
         |      AS text2
         |  FROM l JOIN c ON md5(line) = lh GROUP BY doc_id),
         |tk AS (SELECT cl.*, d.lang, string_split(lower(text2), ' ') AS tk2
         |  FROM cl JOIN documents d USING (doc_id) WHERE n_kept >= 1),
         |g AS (SELECT *, ${duckShinglesOf("tk2", 2)} AS g2,
         |    ${duckShinglesOf("tk2", 3)} AS g3 FROM tk),
         |r AS (SELECT doc_id, lang, n_lines, n_kept,
         |    CAST(len(tk2) AS BIGINT) AS n_words_clean,
         |    round((len(g2) - len(list_distinct(g2))) / len(g2), 4) AS dup2_frac,
         |    round((len(g3) - len(list_distinct(g3))) / len(g3), 4) AS dup3_frac
         |  FROM g)
         |SELECT * FROM r WHERE dup2_frac <= 0.3 AND dup3_frac <= 0.3
         |ORDER BY doc_id""".stripMargin,
    "bpe_merges" -> duckBpeSql(3),
    "bpe_segment" -> duckBpeSegmentSql(3),
    "token_budget" ->
      """WITH d AS (SELECT doc_id,
        |    round(len(list_distinct(string_split(lower(text), ' '))) * 1.0
        |      / len(string_split(lower(text), ' ')), 4) AS score,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, score, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM d)
        |SELECT doc_id, score, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 10000 ORDER BY cum_tokens""".stripMargin,
    "mix_temperature" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS total, sum(n_docs ** 0.7) AS zsum FROM c)
        |SELECT lang, n_docs,
        |  round(n_docs * 1.0 / total, 4) AS share,
        |  round((n_docs ** 0.7) / zsum, 4) AS temp_share,
        |  round(((n_docs ** 0.7) / zsum) / (n_docs * 1.0 / total), 4) AS upweight
        |FROM c CROSS JOIN t ORDER BY lang""".stripMargin,
    "domain_quota" ->
      """WITH d AS (SELECT doc_id, source,
        |    round(len(list_distinct(string_split(lower(text), ' '))) * 1.0
        |      / len(string_split(lower(text), ' ')), 4) AS score
        |  FROM documents),
        |r AS (SELECT doc_id, source, score,
        |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id)
        |      AS rank_in_domain
        |  FROM d)
        |SELECT doc_id, source, score, rank_in_domain FROM r
        |WHERE rank_in_domain <= 5 ORDER BY source, rank_in_domain""".stripMargin,
    "split_assign" ->
      s"""WITH RECURSIVE $duckClusterCtes,
         |allc AS (SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         |dg AS (SELECT doc_id, cluster,
         |    instr('0123456789abcdef',
         |      substring(md5(CAST(cluster AS VARCHAR)), 1, 1)) - 1 AS g
         |  FROM allc)
         |SELECT doc_id, cluster,
         |  CASE WHEN g < 2 THEN 'val' WHEN g < 4 THEN 'test'
         |       ELSE 'train' END AS split
         |FROM dg ORDER BY doc_id""".stripMargin,
    "pmi_collocations" ->
      s"""WITH s AS (SELECT unnest(${duckShingles(2)}) AS b FROM documents),
         |w AS (SELECT b, split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2 FROM s),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w),
        |cb AS (SELECT b, w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM w GROUP BY 1, 2, 3),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM w GROUP BY 1),
        |c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM w GROUP BY 1)
        |SELECT b AS bigram, n_pair,
        |  round(ln((CAST(n_pair AS DOUBLE) * n) / (CAST(c1.c1 AS DOUBLE) * c2.c2)), 4) AS pmi
        |FROM cb JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
        |WHERE n_pair >= 5
        |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS norm_text,
        |  CAST(length(text) AS BIGINT) AS n_chars_raw,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', ' ', 'g'),
        |    ' +', ' ', 'g')) <> text AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "embed_project" ->
      """WITH m AS (SELECT CAST(i.i AS INT) AS i, CAST(j.j AS INT) AS j,
        |    CASE WHEN instr('13579bdf', substring(md5(CAST(i.i AS VARCHAR)
        |      || '_' || CAST(j.j AS VARCHAR)), 1, 1)) > 0
        |    THEN -1.0 ELSE 1.0 END AS s
        |  FROM (SELECT unnest(range(0, 64)) AS i) i,
        |       (SELECT unnest(range(0, 16)) AS j) j),
        |f AS (SELECT vec_id, CAST(i AS INT) AS i,
        |    CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) AS v
        |  FROM (SELECT vec_id, embedding,
        |          unnest(range(0, len(embedding))) AS i FROM embeddings))
        |SELECT vec_id, j, round(sum(v * s) / sqrt(16), 4) + 0.0 AS comp
        |FROM f JOIN m USING (i)
        |GROUP BY vec_id, j ORDER BY vec_id, j""".stripMargin,
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.et = 'click' AND e.t > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.et = 'purchase' AND e.t > s2.t2 GROUP BY 1)
        |SELECT u.user_id, t1, t2, t3,
        |  (CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS steps_reached
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "lang_mismatch" ->
      s"""WITH s AS (SELECT doc_id, source, lang,
         |  len(list_intersect(list_distinct($toks), ['der','die','und','das','ein'])) AS score_de,
         |  len(list_intersect(list_distinct($toks), ['the','a','and','of','to'])) AS score_en,
         |  len(list_intersect(list_distinct($toks), ['el','la','de','y','que'])) AS score_es,
         |  len(list_intersect(list_distinct($toks), ['le','la','et','de','un'])) AS score_fr
         |FROM documents),
         |p AS (SELECT source, lang,
         |  CASE WHEN score_fr > greatest(score_de, score_en, score_es) THEN 'fr'
         |       WHEN score_es > greatest(score_de, score_en) THEN 'es'
         |       WHEN score_en > score_de THEN 'en' ELSE 'de' END AS pred_lang
         |FROM s)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
         |  round(sum(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         |    AS mismatch_rate
         |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "session_paths" ->
      """WITH o AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pus
        |  FROM events),
        |m AS (SELECT user_id, event_id, event_type, t,
        |    CASE WHEN pus IS NULL OR t - pus > 21600000000 THEN 1 ELSE 0 END AS st
        |  FROM o),
        |x AS (SELECT user_id, event_id, event_type, t,
        |    CAST(sum(st) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                       ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(t) - min(t) AS BIGINT) AS dur_us,
        |  string_agg(event_type, '>' ORDER BY t, event_id) AS path
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "pipeline_select_corpus" ->
      s"""WITH RECURSIVE $duckClusterCtes,
         |sc AS (SELECT doc_id, source,
         |    round(len(list_distinct($toks)) * 1.0 / len($toks), 4) AS score,
         |    CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |q AS (SELECT doc_id, source, score, n_tokens,
         |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rk
         |  FROM sc),
         |cm AS (SELECT doc_id, score, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM q WHERE rk <= 20),
         |picked AS (SELECT * FROM cm WHERE cum_tokens <= 30000),
         |ac AS (SELECT p.doc_id, p.score, p.n_tokens, p.cum_tokens,
         |    coalesce(c.cluster, p.doc_id) AS cluster
         |  FROM picked p LEFT JOIN comp c ON p.doc_id = c.node)
         |SELECT doc_id, score, n_tokens, cum_tokens, cluster,
         |  CASE WHEN dg < 2 THEN 'val' WHEN dg < 4 THEN 'test'
         |       ELSE 'train' END AS split
         |FROM (SELECT ac.*, instr('0123456789abcdef',
         |        substring(md5(CAST(cluster AS VARCHAR)), 1, 1)) - 1 AS dg FROM ac)
         |ORDER BY doc_id""".stripMargin,
    "resample_temperature" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS total, sum(n_docs ** 0.7) AS zsum FROM c),
        |wt AS (SELECT lang,
        |    round((n_docs ** 0.7 / zsum) / (n_docs * 1.0 / total), 4) AS weight
        |  FROM c CROSS JOIN t),
        |d AS (SELECT doc_id, lang, weight,
        |    CAST(floor(weight) AS BIGINT) +
        |    CASE WHEN instr('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR) || '|rep'), 1, 1)) - 1
        |      < round((weight - floor(weight)) * 16, 4) THEN 1 ELSE 0 END AS n_copies
        |  FROM documents JOIN wt USING (lang))
        |SELECT doc_id, lang, weight, n_copies, CAST(copy_id AS BIGINT) AS copy_id
        |FROM (SELECT doc_id, lang, weight, n_copies,
        |        unnest(range(1, n_copies + 1)) AS copy_id FROM d)
        |ORDER BY doc_id, copy_id""".stripMargin,
    "dedup_priority_keeper" ->
      s"""WITH RECURSIVE $duckClusterCtes,
         |mem AS (SELECT d.doc_id, d.source, coalesce(c.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         |pr AS (SELECT DISTINCT source,
         |    CAST(substring(source, 4) AS INT) % 4 AS rank FROM documents),
         |mr AS (SELECT m.doc_id, m.source, m.cluster, p.rank
         |  FROM mem m JOIN pr p USING (source)),
         |k AS (SELECT cluster, doc_id AS keeper,
         |    row_number() OVER (PARTITION BY cluster ORDER BY rank, doc_id) AS rn
         |  FROM mr)
         |SELECT m.doc_id, m.source, m.cluster, k.keeper,
         |  m.doc_id = k.keeper AS is_keeper
         |FROM mr m JOIN (SELECT cluster, keeper FROM k WHERE rn = 1) k USING (cluster)
         |ORDER BY doc_id""".stripMargin,
    "decontaminate_fuzzy" ->
      s"""WITH tr AS (SELECT * FROM documents WHERE source <> 'src0'),
         |be AS (SELECT * FROM documents WHERE source = 'src0'),
         |st AS (SELECT doc_id, ${duckMinhash(0)} AS h0, ${duckMinhash(1)} AS h1,
         |    ${duckMinhash(2)} AS h2, ${duckMinhash(3)} AS h3 FROM tr),
         |sb AS (SELECT doc_id, ${duckMinhash(0)} AS h0, ${duckMinhash(1)} AS h1,
         |    ${duckMinhash(2)} AS h2, ${duckMinhash(3)} AS h3 FROM be),
         |bt AS (SELECT doc_id, md5(h0 || '|' || h1) AS band0, md5(h2 || '|' || h3) AS band1 FROM st),
         |bb AS (SELECT doc_id, md5(h0 || '|' || h1) AS band0, md5(h2 || '|' || h3) AS band1 FROM sb),
         |cand AS (
         |  SELECT DISTINCT t.doc_id AS tid, b.doc_id AS bid FROM bt t JOIN bb b ON t.band0 = b.band0
         |  UNION
         |  SELECT DISTINCT t.doc_id, b.doc_id FROM bt t JOIN bb b ON t.band1 = b.band1),
         |tkt AS (SELECT doc_id, list_distinct($toks) AS ts FROM tr),
         |tkb AS (SELECT doc_id, list_distinct($toks) AS ts FROM be),
         |mj AS (SELECT tid,
         |    max(round(len(list_intersect(a.ts, b.ts)) /
         |      len(list_distinct(list_concat(a.ts, b.ts))), 4)) AS max_jac
         |  FROM cand JOIN tkt a ON a.doc_id = tid JOIN tkb b ON b.doc_id = bid
         |  GROUP BY tid)
         |SELECT t.doc_id, coalesce(mj.max_jac, 0.0) AS max_jac,
         |  coalesce(mj.max_jac, 0.0) >= 0.5 AS contaminated
         |FROM tr t LEFT JOIN mj ON mj.tid = t.doc_id ORDER BY doc_id""".stripMargin,
    "cdc_chunks" ->
      s"""WITH $duckCdcCtes
         |SELECT doc_id, chunk_id, CAST(length(chunk) AS BIGINT) AS chunk_len,
         |  md5(chunk) AS chunk_md5
         |FROM ch WHERE length(chunk) > 0 ORDER BY doc_id, chunk_id""".stripMargin,
    "dedup_cdc_overlap" ->
      s"""WITH $duckCdcCtes,
         |hs AS (SELECT DISTINCT doc_id, md5(chunk) AS h
         |  FROM ch WHERE length(chunk) > 0),
         |nc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nch FROM hs GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(count(*) AS BIGINT) AS shared
         |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, shared,
         |  round(shared / least(na.nch, nb.nch), 4) AS containment
         |FROM p JOIN nc na ON na.doc_id = id_a JOIN nc nb ON nb.doc_id = id_b
         |WHERE round(shared / least(na.nch, nb.nch), 4) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "dedup_recall" ->
      s"""WITH $duckNgramPairCtes,
         |tr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.grams, b.grams)) /
         |        len(list_distinct(list_concat(a.grams, b.grams))), 4) >= 0.5),
         |vp AS (SELECT id_a, id_b FROM ngpairs),
         |c1 AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM tr),
         |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM vp),
         |c3 AS (SELECT CAST(count(*) AS BIGINT) AS n_both
         |  FROM tr JOIN vp USING (id_a, id_b))
         |SELECT n_truth, n_lsh, n_both,
         |  round(CAST(n_both AS DOUBLE) / n_truth, 4) AS recall,
         |  round(CAST(n_both AS DOUBLE) / n_lsh, 4) AS precision
         |FROM c1, c2, c3""".stripMargin,
    "fm_drift_census" ->
      """WITH fm AS (
        |  SELECT 'k' AS key, regexp_extract(props, '[0-9]+', 0) AS value FROM events
        |  UNION ALL
        |  SELECT 'beta_' || event_type, CAST(value AS VARCHAR)
        |  FROM events WHERE value > 30
        |  UNION ALL
        |  SELECT 'legacy_id', 'L-' || CAST(event_id AS VARCHAR)
        |  FROM events WHERE event_id % 7 = 0),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM events)
        |SELECT key,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
        |  CAST(sum(CASE WHEN regexp_matches(value, '^-?[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT)
        |    = count(*) AS all_long,
        |  CAST(sum(CASE WHEN regexp_matches(value, '^-?[0-9]+(\.[0-9]+)?$') THEN 1 ELSE 0 END) AS BIGINT)
        |    = count(*) AS all_numeric,
        |  ((2 * CAST(count(*) AS BIGINT) * 10000 + t) // (2 * t)) / 10000.0 AS coverage
        |FROM fm, tot GROUP BY key, t ORDER BY key""".stripMargin,
    "pipeline_asset_manifest" -> duckAssetManifestSql,
    // incremental maintenance must be INDISTINGUISHABLE from a full
    // recompute — same oracle, verbatim
    "pipeline_asset_manifest_incremental" -> duckAssetManifestSql,
    // ... and so must the PERSISTED two-night chain: same oracle again,
    // now proving merge ≡ recompute across the write/read boundary
    "pipeline_asset_manifest_nightly" -> duckAssetManifestSql,
    "lsh_band_sweep" ->
      s"""WITH $duckNgramPairCtes,
         |tr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.grams, b.grams)) /
         |        len(list_distinct(list_concat(a.grams, b.grams))), 4) >= 0.5),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM tr),
         |b1 AS (SELECT doc_id,
         |    md5(g0 || '|' || g1 || '|' || g2 || '|' || g3) AS band FROM sig),
         |p1 AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM b1 a JOIN b1 b ON a.band = b.band AND a.doc_id < b.doc_id),
         |p2 AS (SELECT id_a, id_b FROM gpairs),
         |p4 AS (SELECT DISTINCT id_a, id_b FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |    FROM sig a JOIN sig b ON a.g0 = b.g0 AND a.doc_id < b.doc_id
         |  UNION ALL SELECT a.doc_id, b.doc_id
         |    FROM sig a JOIN sig b ON a.g1 = b.g1 AND a.doc_id < b.doc_id
         |  UNION ALL SELECT a.doc_id, b.doc_id
         |    FROM sig a JOIN sig b ON a.g2 = b.g2 AND a.doc_id < b.doc_id
         |  UNION ALL SELECT a.doc_id, b.doc_id
         |    FROM sig a JOIN sig b ON a.g3 = b.g3 AND a.doc_id < b.doc_id)),
         |stats AS (
         |  SELECT 'b1r4' AS config,
         |    (SELECT CAST(count(*) AS BIGINT) FROM p1) AS n_candidates,
         |    (SELECT CAST(count(*) AS BIGINT) FROM p1 JOIN g ga ON ga.doc_id = id_a
         |       JOIN g gb ON gb.doc_id = id_b
         |     WHERE round(len(list_intersect(ga.grams, gb.grams)) /
         |       len(list_distinct(list_concat(ga.grams, gb.grams))), 4) >= 0.5) AS n_verified
         |  UNION ALL
         |  SELECT 'b2r2',
         |    (SELECT CAST(count(*) AS BIGINT) FROM p2),
         |    (SELECT CAST(count(*) AS BIGINT) FROM p2 JOIN g ga ON ga.doc_id = id_a
         |       JOIN g gb ON gb.doc_id = id_b
         |     WHERE round(len(list_intersect(ga.grams, gb.grams)) /
         |       len(list_distinct(list_concat(ga.grams, gb.grams))), 4) >= 0.5)
         |  UNION ALL
         |  SELECT 'b4r1',
         |    (SELECT CAST(count(*) AS BIGINT) FROM p4),
         |    (SELECT CAST(count(*) AS BIGINT) FROM p4 JOIN g ga ON ga.doc_id = id_a
         |       JOIN g gb ON gb.doc_id = id_b
         |     WHERE round(len(list_intersect(ga.grams, gb.grams)) /
         |       len(list_distinct(list_concat(ga.grams, gb.grams))), 4) >= 0.5))
         |SELECT config, n_candidates, n_verified, n_truth,
         |  round(CAST(n_verified AS DOUBLE) / n_truth, 4) AS recall
         |FROM stats, nt ORDER BY config""".stripMargin,
    "memorization_grams" ->
      s"""WITH g AS (SELECT doc_id, unnest(${duckShingles(8)}) AS gram FROM documents)
         |SELECT gram, count(DISTINCT doc_id) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occ
         |FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, n_occ DESC, gram LIMIT 20""".stripMargin,
    "fingerprint_winnow" ->
      """WITH g AS (SELECT doc_id,
        |    CASE WHEN length(text) < 8 THEN [md5(text)]
        |    ELSE list_transform(range(1, length(text) - 6),
        |      p -> md5(substring(text, CAST(p AS INT), 8))) END AS wh
        |  FROM documents),
        |fp AS (SELECT DISTINCT doc_id, h FROM (
        |    SELECT doc_id, unnest(
        |      CASE WHEN len(wh) < 4 THEN [list_min(wh)]
        |      ELSE list_transform(range(1, len(wh) - 2),
        |        i -> list_min(wh[CAST(i AS INT):CAST(i + 3 AS INT)])) END) AS h
        |    FROM g)),
        |fj AS (SELECT fp.* FROM fp JOIN (
        |    SELECT h FROM fp GROUP BY h HAVING count(*) <= 64) k USING (h)),
        |nc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nch FROM fj GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(count(*) AS BIGINT) AS shared
        |  FROM fj a JOIN fj b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, shared,
        |  round(shared / least(na.nch, nb.nch), 4) AS containment
        |FROM p JOIN nc na ON na.doc_id = id_a JOIN nc nb ON nb.doc_id = id_b
        |WHERE round(shared / least(na.nch, nb.nch), 4) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "label_noise" ->
      s"""$duckIvfCellsCte,
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rn
         |    FROM sims) WHERE rn <= $IvfProbes),
         |cand AS (SELECT DISTINCT query_id, corpus_id
         |         FROM probes JOIN cells USING (cell)
         |         WHERE query_id <> corpus_id),
         |scored AS (SELECT query_id, corpus_id, $duckCosIds AS cos
         |           FROM cand JOIN e qv ON qv.vec_id = query_id
         |                     JOIN e cv ON cv.vec_id = corpus_id),
         |knn AS (SELECT query_id, corpus_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, corpus_id) AS rank
         |  FROM scored) WHERE rank <= 5),
         |votes AS (SELECT query_id, lab.label AS nlabel, count(*) AS votes
         |  FROM knn JOIN embeddings lab ON lab.vec_id = knn.corpus_id GROUP BY 1, 2),
         |pred AS (SELECT query_id, nlabel FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY votes DESC, nlabel) AS rn
         |  FROM votes) WHERE rn = 1)
         |SELECT own.label AS label, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN pred.nlabel <> own.label THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged,
         |  round(CAST(sum(CASE WHEN pred.nlabel <> own.label THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 4) AS noise_rate
         |FROM pred JOIN embeddings own ON own.vec_id = pred.query_id
         |GROUP BY own.label ORDER BY label""".stripMargin,
    "embed_outliers" ->
      """WITH f AS (SELECT vec_id, label, CAST(i AS INT) AS j,
        |    CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) AS v
        |  FROM (SELECT vec_id, label, embedding,
        |          unnest(range(0, len(embedding))) AS i FROM embeddings)),
        |c AS (SELECT label, j, round(avg(v), 6) AS c FROM f GROUP BY 1, 2),
        |d AS (SELECT f.label, vec_id, round(sqrt(sum((v - c.c) ** 2)), 4) AS dist
        |  FROM f JOIN c ON f.label = c.label AND f.j = c.j GROUP BY 1, 2),
        |s AS (SELECT label, round(avg(dist), 4) AS mdist,
        |    round(stddev_pop(dist), 4) AS sdist FROM d GROUP BY 1)
        |SELECT vec_id, label, dist, round((dist - mdist) / sdist, 2) AS z,
        |  round((dist - mdist) / sdist, 2) >= 2.0 AS is_outlier
        |FROM d JOIN s USING (label) ORDER BY vec_id""".stripMargin,
    "oov_rate" ->
      s"""WITH w AS (SELECT doc_id, unnest($toks) AS w FROM documents),
         |v AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM w GROUP BY 1
         |        ORDER BY cnt DESC, w LIMIT 1000)),
         |j AS (SELECT w.doc_id, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
         |  FROM w LEFT JOIN v ON w.w = v.w)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(oov) AS BIGINT) AS n_oov,
         |  round(sum(oov) * 1.0 / count(*), 4) AS oov_rate
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "quantile_sketch" ->
      """WITH c AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c FROM events
        |  WHERE CAST(round(value * 100, 0) AS BIGINT) > 0),
        |h AS (SELECT CAST(length(bin(c)) AS INT) AS oct,
        |    CASE WHEN length(bin(c)) = 1 THEN 0
        |         ELSE CAST(substring(bin(c), 2, 1) AS INT) END AS half,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM c GROUP BY 1, 2),
        |w AS (SELECT oct, half,
        |    CAST(sum(cnt) OVER (ORDER BY oct, half ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS n FROM h),
        |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |    CAST(0.99 AS DOUBLE)]) AS q),
        |sel AS (SELECT q, oct, half,
        |    CASE WHEN oct = 1 THEN 1.0
        |         ELSE pow(2.0, oct - 1) + half * pow(2.0, oct - 2)
        |            + pow(2.0, oct - 2) / 2.0 END AS est,
        |    row_number() OVER (PARTITION BY q ORDER BY oct, half) AS rn
        |  FROM w CROSS JOIN qs WHERE cum >= ceil(n * q)),
        |ex AS (SELECT quantile_cont(c, 0.5) AS e50, quantile_cont(c, 0.9) AS e90,
        |    quantile_cont(c, 0.99) AS e99 FROM c),
        |tall AS (SELECT CAST(0.5 AS DOUBLE) AS q, e50 AS exact FROM ex
        |  UNION ALL SELECT CAST(0.9 AS DOUBLE), e90 FROM ex
        |  UNION ALL SELECT CAST(0.99 AS DOUBLE), e99 FROM ex)
        |SELECT s.q, round(s.est, 4) AS est, round(t.exact, 4) AS exact,
        |  round(abs(s.est - t.exact) / t.exact, 4) AS rel_err
        |FROM (SELECT q, est FROM sel WHERE rn = 1) s JOIN tall t USING (q)
        |ORDER BY q""".stripMargin,
    "pack_efficiency" ->
      """WITH cx AS (SELECT unnest([128, 256, 512, 1024]) AS ctx),
        |d AS (SELECT lang, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |e AS (SELECT ctx, lang, n_toks, (n_toks + ctx - 1) // ctx AS n_seqs
        |  FROM d CROSS JOIN cx)
        |SELECT ctx, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS total_toks,
        |  CAST(sum(n_seqs) AS BIGINT) AS total_seqs,
        |  round(1.0 - sum(n_toks) * 1.0 / (sum(n_seqs) * ctx), 4) AS pad_frac
        |FROM e GROUP BY ctx, lang ORDER BY ctx, lang""".stripMargin,
    "hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
         |    CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS corpus_id, label AS clabel,
         |    CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
         |s AS (SELECT query_id, qlabel, corpus_id, clabel, $duckCos AS cos
         |      FROM c CROSS JOIN q
         |      WHERE query_id <> corpus_id AND qlabel <> clabel)
         |SELECT query_id, qlabel, corpus_id, clabel, cos, CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rank
         |  FROM s) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "kmeans_iterate" ->
      s"""$duckIvfCellsCte,
         |ncd AS (SELECT cell, i AS dim, round(avg(e.v[CAST(i + 1 AS INT)]), 6) AS m
         |  FROM cells JOIN e ON e.vec_id = corpus_id,
         |    unnest(range(0, len(e.v))) AS t(i)
         |  GROUP BY 1, 2),
         |ncv AS (SELECT cell AS cid, array_agg(m ORDER BY dim) AS cvec FROM ncd GROUP BY 1),
         |sims2 AS (SELECT e.vec_id, ncv.cid,
         |    list_dot_product(e.v, ncv.cvec) /
         |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(ncv.cvec, ncv.cvec))) AS s
         |  FROM e CROSS JOIN ncv),
         |cells2 AS (SELECT vec_id AS corpus_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
         |    FROM sims2) WHERE rn = 1),
         |shift AS (SELECT c0.cid AS cell,
         |    round(sqrt(list_sum(list_transform(range(1, len(c0.cvec) + 1),
         |      i -> (c0.cvec[CAST(i AS INT)] - n.cvec[CAST(i AS INT)])
         |        * (c0.cvec[CAST(i AS INT)] - n.cvec[CAST(i AS INT)])))), 6) AS shift
         |  FROM cents c0 JOIN ncv n ON n.cid = c0.cid),
         |b AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_before FROM cells GROUP BY 1),
         |a AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_after FROM cells2 GROUP BY 1)
         |SELECT b.cell, b.n_before, coalesce(a.n_after, 0) AS n_after, s.shift
         |FROM b LEFT JOIN a USING (cell) JOIN shift s ON s.cell = b.cell
         |ORDER BY cell""".stripMargin,
    "embed_knn_ivfpq" ->
      s"""$duckIvfCellsCte,
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rn
         |    FROM sims WHERE vec_id < 10) WHERE rn <= $IvfProbes),
         |cand AS (SELECT p.query_id, c.corpus_id FROM probes p
         |  JOIN cells c ON c.cell = p.cell WHERE p.query_id <> c.corpus_id),
         |$duckPqChain,
         |$duckPqLutChain,
         |a AS (SELECT cand.query_id, cand.corpus_id, round(sum(contrib), 4) AS adist
         |  FROM cand JOIN codes ON codes.vec_id = cand.corpus_id
         |  JOIN lut ON lut.query_id = cand.query_id
         |    AND lut.j = codes.j AND lut.cid = codes.code
         |  GROUP BY 1, 2),
         |short AS (SELECT query_id, corpus_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, corpus_id) AS srn FROM a) WHERE srn <= 50),
         |ex AS (SELECT s.query_id, s.corpus_id,
         |    round(list_dot_product(qe.v, qe.v) - 2 * list_dot_product(qe.v, ce.v)
         |      + list_dot_product(ce.v, ce.v), 4) AS d2
         |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
         |  JOIN e ce ON ce.vec_id = s.corpus_id)
         |SELECT query_id, corpus_id, d2, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY d2, corpus_id) AS rank FROM ex)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // composed persisted IVFADC: both halves seeded from the night-0
    // base predicate, assignment/coding/ADC/rerank replayed from scratch
    "embed_knn_ivfadc_nightly" ->
      s"""${duckIvfCellsCteFrom("vec_id % 5 <> 0")},
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rn
         |    FROM sims WHERE vec_id < 10) WHERE rn <= $IvfProbes),
         |cand AS (SELECT p.query_id, c.corpus_id FROM probes p
         |  JOIN cells c ON c.cell = p.cell WHERE p.query_id <> c.corpus_id),
         |${duckPqChainFrom("vec_id % 5 <> 0")},
         |$duckPqLutChain,
         |a AS (SELECT cand.query_id, cand.corpus_id, round(sum(contrib), 4) AS adist
         |  FROM cand JOIN codes ON codes.vec_id = cand.corpus_id
         |  JOIN lut ON lut.query_id = cand.query_id
         |    AND lut.j = codes.j AND lut.cid = codes.code
         |  GROUP BY 1, 2),
         |short AS (SELECT query_id, corpus_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, corpus_id) AS srn FROM a) WHERE srn <= 50),
         |ex AS (SELECT s.query_id, s.corpus_id,
         |    round(list_dot_product(qe.v, qe.v) - 2 * list_dot_product(qe.v, ce.v)
         |      + list_dot_product(ce.v, ce.v), 4) AS d2
         |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
         |  JOIN e ce ON ce.vec_id = s.corpus_id)
         |SELECT query_id, corpus_id, d2, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY d2, corpus_id) AS rank FROM ex)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the tenant-served composition shares the nightly replay oracle
    "embed_knn_ivfadc_served" ->
      s"""${duckIvfCellsCteFrom("vec_id % 5 <> 0")},
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rn
         |    FROM sims WHERE vec_id < 10) WHERE rn <= $IvfProbes),
         |cand AS (SELECT p.query_id, c.corpus_id FROM probes p
         |  JOIN cells c ON c.cell = p.cell WHERE p.query_id <> c.corpus_id),
         |${duckPqChainFrom("vec_id % 5 <> 0")},
         |$duckPqLutChain,
         |a AS (SELECT cand.query_id, cand.corpus_id, round(sum(contrib), 4) AS adist
         |  FROM cand JOIN codes ON codes.vec_id = cand.corpus_id
         |  JOIN lut ON lut.query_id = cand.query_id
         |    AND lut.j = codes.j AND lut.cid = codes.code
         |  GROUP BY 1, 2),
         |short AS (SELECT query_id, corpus_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, corpus_id) AS srn FROM a) WHERE srn <= 50),
         |ex AS (SELECT s.query_id, s.corpus_id,
         |    round(list_dot_product(qe.v, qe.v) - 2 * list_dot_product(qe.v, ce.v)
         |      + list_dot_product(ce.v, ce.v), 4) AS d2
         |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
         |  JOIN e ce ON ce.vec_id = s.corpus_id)
         |SELECT query_id, corpus_id, d2, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY d2, corpus_id) AS rank FROM ex)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the composed single-store form shares the same replay oracle
    "embed_knn_ivfadc_composed" ->
      s"""${duckIvfCellsCteFrom("vec_id % 5 <> 0")},
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rn
         |    FROM sims WHERE vec_id < 10) WHERE rn <= $IvfProbes),
         |cand AS (SELECT p.query_id, c.corpus_id FROM probes p
         |  JOIN cells c ON c.cell = p.cell WHERE p.query_id <> c.corpus_id),
         |${duckPqChainFrom("vec_id % 5 <> 0")},
         |$duckPqLutChain,
         |a AS (SELECT cand.query_id, cand.corpus_id, round(sum(contrib), 4) AS adist
         |  FROM cand JOIN codes ON codes.vec_id = cand.corpus_id
         |  JOIN lut ON lut.query_id = cand.query_id
         |    AND lut.j = codes.j AND lut.cid = codes.code
         |  GROUP BY 1, 2),
         |short AS (SELECT query_id, corpus_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, corpus_id) AS srn FROM a) WHERE srn <= 50),
         |ex AS (SELECT s.query_id, s.corpus_id,
         |    round(list_dot_product(qe.v, qe.v) - 2 * list_dot_product(qe.v, ce.v)
         |      + list_dot_product(ce.v, ce.v), 4) AS d2
         |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
         |  JOIN e ce ON ce.vec_id = s.corpus_id)
         |SELECT query_id, corpus_id, d2, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY d2, corpus_id) AS rank FROM ex)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "approx_distinct" -> {
      val m = 256
      val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
      s"""WITH hh AS (SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS h
         |  FROM events),
         |rr AS (SELECT event_type,
         |    (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
         |      + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) AS bucket,
         |    CAST(list_sum(list_transform(range(1, 13),
         |      i -> (instr('0123456789abcdef', substring(h, CAST(i + 2 AS INT), 1)) - 1)
         |        * 16 ** (12 - i))) AS BIGINT) AS rem
         |  FROM hh),
         |regs AS (SELECT event_type, bucket,
         |    max(CASE WHEN rem = 0 THEN 49
         |      ELSE 49 - len(ltrim(bin(rem), '0')) END) AS r
         |  FROM rr GROUP BY 1, 2),
         |est AS (SELECT event_type, count(*) AS cnt, sum(pow(2.0, -r)) AS sumpow
         |  FROM regs GROUP BY 1),
         |ap AS (SELECT event_type,
         |    round(CASE WHEN $alphaM2 / (sumpow + ($m - cnt)) <= ${2.5 * m} AND cnt < $m
         |      THEN ${m.toDouble} * ln(${m.toDouble} / ($m - cnt))
         |      ELSE $alphaM2 / (sumpow + ($m - cnt)) END, 4) AS n_approx
         |  FROM est),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
         |SELECT event_type, n_exact, n_approx,
         |  round(abs(n_approx - n_exact) / n_exact, 4) AS rel_err
         |FROM ex JOIN ap USING (event_type) ORDER BY event_type""".stripMargin
    },
    // The native SQL aggregate replays the IDENTICAL register chain —
    // the bit-reproducibility claim checked by the driver's own gate
    "approx_distinct_fn" -> {
      val m = 256
      val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
      s"""WITH hh AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h
         |  FROM events),
         |rr AS (SELECT event_type,
         |    (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
         |      + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) AS bucket,
         |    CAST(list_sum(list_transform(range(1, 13),
         |      i -> (instr('0123456789abcdef', substring(h, CAST(i + 2 AS INT), 1)) - 1)
         |        * 16 ** (12 - i))) AS BIGINT) AS rem
         |  FROM hh),
         |regs AS (SELECT event_type, bucket,
         |    max(CASE WHEN rem = 0 THEN 49
         |      ELSE 49 - len(ltrim(bin(rem), '0')) END) AS r
         |  FROM rr GROUP BY 1, 2),
         |est AS (SELECT event_type, count(*) AS cnt, sum(pow(2.0, -r)) AS sumpow
         |  FROM regs GROUP BY 1)
         |SELECT event_type,
         |  round(CASE WHEN $alphaM2 / (sumpow + ($m - cnt)) <= ${2.5 * m} AND cnt < $m
         |    THEN ${m.toDouble} * ln(${m.toDouble} / ($m - cnt))
         |    ELSE $alphaM2 / (sumpow + ($m - cnt)) END, 4) AS n_approx
         |FROM est ORDER BY event_type""".stripMargin
    },
    // The native SQL aggregate replays the IDENTICAL 126-bucket
    // log-histogram chain as the quantile_sketch oracle, per group and
    // pivoted to the three requested quantiles — midpoint estimates are
    // sums of powers of two, so doubles are bit-identical cross-engine
    "quantile_fn" ->
      """WITH base AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c FROM events
        |  WHERE CAST(round(value * 100, 0) AS BIGINT) > 0),
        |h AS (SELECT event_type, CAST(length(bin(c)) AS INT) AS oct,
        |    CASE WHEN length(bin(c)) = 1 THEN 0
        |         ELSE CAST(substring(bin(c), 2, 1) AS INT) END AS half,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM c GROUP BY 1, 2, 3),
        |w AS (SELECT event_type, oct, half,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY oct, half
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM h),
        |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |    CAST(0.99 AS DOUBLE)]) AS q),
        |sel AS (SELECT event_type, q,
        |    CASE WHEN oct = 1 THEN 1.0
        |         ELSE pow(2.0, oct - 1) + half * pow(2.0, oct - 2)
        |            + pow(2.0, oct - 2) / 2.0 END AS est,
        |    row_number() OVER (PARTITION BY event_type, q ORDER BY oct, half) AS rn
        |  FROM w CROSS JOIN qs WHERE cum >= ceil(n * q)),
        |p AS (SELECT event_type,
        |    max(CASE WHEN q = 0.5 THEN est END) AS p50,
        |    max(CASE WHEN q = 0.9 THEN est END) AS p90,
        |    max(CASE WHEN q = 0.99 THEN est END) AS p99
        |  FROM sel WHERE rn = 1 GROUP BY event_type)
        |SELECT b.event_type, p.p50, p.p90, p.p99
        |FROM base b LEFT JOIN p USING (event_type) ORDER BY event_type""".stripMargin,
    // capacity >> per-type vocabulary ⇒ the SpaceSaving sketch is exact
    // (no eviction, err = 0) and its (cnt desc, item asc) rank is the
    // plain GROUP BY count + window rank — item is the STRINGIFIED user
    // id, so ties break on VARCHAR order in both engines
    "topk_fn" ->
      """WITH cnts AS (SELECT event_type, CAST(user_id AS VARCHAR) AS user_key,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY cnt DESC, user_key) AS rk
        |  FROM cnts)
        |SELECT event_type, user_key, cnt, CAST(0 AS BIGINT) AS err,
        |  CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,
    "sketch_union" -> {
      val m = 256
      val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
      val est = (regs: String, out: String) =>
        s"""est_$out AS (SELECT event_type, count(*) AS cnt, sum(pow(2.0, -r)) AS sumpow
           |  FROM $regs GROUP BY 1),
           |ap_$out AS (SELECT event_type,
           |    round(CASE WHEN $alphaM2 / (sumpow + ($m - cnt)) <= ${2.5 * m} AND cnt < $m
           |      THEN ${m.toDouble} * ln(${m.toDouble} / ($m - cnt))
           |      ELSE $alphaM2 / (sumpow + ($m - cnt)) END, 4) AS $out
           |  FROM est_$out)""".stripMargin
      s"""WITH hh AS (SELECT event_type, CAST(ts AS DATE) AS day, user_id,
         |    md5(CAST(user_id AS VARCHAR)) AS h FROM events),
         |rr AS (SELECT event_type, day,
         |    (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
         |      + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) AS bucket,
         |    CAST(list_sum(list_transform(range(1, 13),
         |      i -> (instr('0123456789abcdef', substring(h, CAST(i + 2 AS INT), 1)) - 1)
         |        * 16 ** (12 - i))) AS BIGINT) AS rem
         |  FROM hh),
         |daily AS (SELECT event_type, day, bucket,
         |    max(CASE WHEN rem = 0 THEN 49
         |      ELSE 49 - len(ltrim(bin(rem), '0')) END) AS r
         |  FROM rr GROUP BY 1, 2, 3),
         |merged AS (SELECT event_type, bucket, max(r) AS r FROM daily GROUP BY 1, 2),
         |full_regs AS (SELECT event_type, bucket,
         |    max(CASE WHEN rem = 0 THEN 49
         |      ELSE 49 - len(ltrim(bin(rem), '0')) END) AS r
         |  FROM rr GROUP BY 1, 2),
         |${est("merged", "n_merged")},
         |${est("full_regs", "n_full")}
         |SELECT event_type, n_full, n_merged, n_merged = n_full AS merge_exact
         |FROM ap_n_full JOIN ap_n_merged USING (event_type)
         |ORDER BY event_type""".stripMargin
    },
    "eval_silhouette" ->
      s"""$duckIvfCellsCte,
         |own AS (SELECT s.vec_id, c.cell, s.s AS s_own
         |  FROM sims s JOIN cells c ON c.corpus_id = s.vec_id AND s.cid = c.cell),
         |oth AS (SELECT s.vec_id, max(s.s) AS s_other
         |  FROM sims s JOIN cells c ON c.corpus_id = s.vec_id AND s.cid <> c.cell
         |  GROUP BY 1),
         |pp AS (SELECT own.cell, round(1.0 - s_own, 6) AS a, round(1.0 - s_other, 6) AS b
         |  FROM own JOIN oth USING (vec_id)),
         |ps AS (SELECT cell,
         |    CASE WHEN greatest(a, b) <= 0.0 THEN 0.0
         |    ELSE round((b - a) / greatest(a, b), 6) END AS sil FROM pp),
         |pf AS (SELECT cell, CAST(round(sil * 1000000.0, 0) AS BIGINT) AS silfx FROM ps)
         |SELECT cell, count(*) AS n,
         |  round(CAST(sum(silfx) AS DOUBLE) / count(*) / 1000000.0, 6) + 0.0 AS mean_sil
         |FROM pf GROUP BY cell ORDER BY cell""".stripMargin,
    "embed_pq_codes" ->
      s"""$duckPqCodesCte
         |SELECT vec_id,
         |  CAST(max(CASE WHEN j = 0 THEN code END) AS INT) AS c0,
         |  CAST(max(CASE WHEN j = 1 THEN code END) AS INT) AS c1,
         |  CAST(max(CASE WHEN j = 2 THEN code END) AS INT) AS c2,
         |  CAST(max(CASE WHEN j = 3 THEN code END) AS INT) AS c3
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "embed_knn_pq" ->
      s"""$duckPqCodesCte,
         |$duckPqLutChain,
         |a AS (SELECT query_id, vec_id AS corpus_id, round(sum(contrib), 4) AS adist
         |  FROM codes JOIN lut ON codes.j = lut.j AND codes.code = lut.cid
         |  WHERE query_id <> vec_id GROUP BY 1, 2)
         |SELECT query_id, corpus_id, adist, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, corpus_id) AS rank FROM a)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "embed_knn_pq_rerank" ->
      s"""$duckPqCodesCte,
         |$duckPqLutChain,
         |a AS (SELECT query_id, vec_id AS corpus_id, round(sum(contrib), 4) AS adist
         |  FROM codes JOIN lut ON codes.j = lut.j AND codes.code = lut.cid
         |  WHERE query_id <> vec_id GROUP BY 1, 2),
         |short AS (SELECT query_id, corpus_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, corpus_id) AS srn FROM a) WHERE srn <= 50),
         |ex AS (SELECT s.query_id, s.corpus_id,
         |    round(list_dot_product(qe.v, qe.v) - 2 * list_dot_product(qe.v, ce.v)
         |      + list_dot_product(ce.v, ce.v), 4) AS d2
         |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
         |  JOIN e ce ON ce.vec_id = s.corpus_id)
         |SELECT query_id, corpus_id, d2, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY d2, corpus_id) AS rank FROM ex)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // persisted nightly PQ index: codebooks seeded from the night-0 base
    // predicate, codes + ADC + rerank replayed from scratch over the full
    // corpus — equality proves the chained on-disk index ≡ a fresh build
    "embed_knn_pq_nightly" ->
      s"""${duckPqCodesCteFrom("vec_id % 5 <> 0")},
         |$duckPqLutChain,
         |a AS (SELECT query_id, vec_id AS corpus_id, round(sum(contrib), 4) AS adist
         |  FROM codes JOIN lut ON codes.j = lut.j AND codes.code = lut.cid
         |  WHERE query_id <> vec_id GROUP BY 1, 2),
         |short AS (SELECT query_id, corpus_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, corpus_id) AS srn FROM a) WHERE srn <= 50),
         |ex AS (SELECT s.query_id, s.corpus_id,
         |    round(list_dot_product(qe.v, qe.v) - 2 * list_dot_product(qe.v, ce.v)
         |      + list_dot_product(ce.v, ce.v), 4) AS d2
         |  FROM short s JOIN e qe ON qe.vec_id = s.query_id
         |  JOIN e ce ON ce.vec_id = s.corpus_id)
         |SELECT query_id, corpus_id, d2, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY d2, corpus_id) AS rank FROM ex)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "dedup_lines" ->
      """WITH l AS (SELECT doc_id, i,
        |    array_to_string(wr[CAST(i * 10 + 1 AS INT):CAST(i * 10 + 10 AS INT)], ' ') AS line
        |  FROM (SELECT doc_id, string_split(text, ' ') AS wr FROM documents),
        |    unnest(range(0, CAST(ceil(len(wr) / 10.0) AS INT))) AS t(i)),
        |c AS (SELECT md5(line) AS lh, count(*) AS copies FROM l GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN copies <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN copies <= 1 THEN line END, ' ' ORDER BY i), '')
        |    AS text_clean
        |FROM l JOIN c ON md5(line) = lh
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "repetition_signals" ->
      s"""WITH g AS (SELECT doc_id,
         |    ${duckShingles(2)} AS g2, ${duckShingles(3)} AS g3 FROM documents)
         |SELECT doc_id,
         |  round((len(g2) - len(list_distinct(g2))) / len(g2), 4) AS dup2_frac,
         |  round(list_max(list_transform(list_distinct(g2),
         |    d -> len(list_filter(g2, x -> x = d)))) / len(g2), 4) AS top2_share,
         |  round((len(g3) - len(list_distinct(g3))) / len(g3), 4) AS dup3_frac,
         |  round(list_max(list_transform(list_distinct(g3),
         |    d -> len(list_filter(g3, x -> x = d)))) / len(g3), 4) AS top3_share,
         |  round((len(g2) - len(list_distinct(g2))) / len(g2), 4) <= 0.3 AND
         |    round((len(g3) - len(list_distinct(g3))) / len(g3), 4) <= 0.3 AS keep
         |FROM g ORDER BY doc_id""".stripMargin,
    "nb_classify" ->
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 10 < 8),
        |tw AS (SELECT lang AS cls, unnest(string_split(text, ' ')) AS w FROM train),
        |cw AS (SELECT cls, w, count(*) AS cw FROM tw GROUP BY 1, 2),
        |tc AS (SELECT cls, count(*) AS tc FROM tw GROUP BY 1),
        |voc AS (SELECT count(DISTINCT w) AS v FROM tw),
        |pri AS (SELECT lang AS cls, ln(count(*) * 1.0 / (SELECT count(*) FROM train)) AS prior
        |  FROM train GROUP BY 1),
        |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |m AS (SELECT doc_id, cls, sum(ln(cw + 0.5)) AS sm, count(*) AS mn
        |  FROM dw JOIN cw USING (w) GROUP BY 1, 2),
        |sc AS (SELECT d.doc_id, d.lang, p.cls,
        |    round(p.prior + coalesce(m.sm, 0)
        |      + (len(string_split(d.text, ' ')) - coalesce(m.mn, 0)) * ln(0.5)
        |      - len(string_split(d.text, ' ')) * ln(t.tc + 0.5 * voc.v), 4) AS score
        |  FROM documents d CROSS JOIN pri p
        |  JOIN tc t ON t.cls = p.cls CROSS JOIN voc
        |  LEFT JOIN m ON m.doc_id = d.doc_id AND m.cls = p.cls)
        |SELECT doc_id, lang, cls AS pred_lang, score, cls = lang AS hit FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
        |  FROM sc)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "layout_zorder" ->
      s"""SELECT doc_id, n_chars,
         |  ${duckZ("(doc_id % 65536)", "(n_chars % 65536)")} AS zval
         |FROM documents ORDER BY doc_id""".stripMargin,
    "layout_skipping" ->
      s"""WITH d AS (SELECT doc_id, n_chars FROM documents),
         |z AS (SELECT doc_id, n_chars,
         |    ${duckZ("(doc_id % 65536)", "(n_chars % 65536)")} AS zval FROM documents),
         |lin AS (SELECT 'linear' AS layout,
         |    ntile(25) OVER (ORDER BY doc_id) AS f, doc_id, n_chars FROM d),
         |zor AS (SELECT 'zorder' AS layout,
         |    ntile(25) OVER (ORDER BY zval, doc_id) AS f, doc_id, n_chars FROM z),
         |u AS (SELECT * FROM lin UNION ALL SELECT * FROM zor),
         |zone AS (SELECT layout, f, min(doc_id) AS min_id, max(doc_id) AS max_id,
         |    min(n_chars) AS min_nc, max(n_chars) AS max_nc FROM u GROUP BY 1, 2),
         |b AS (SELECT min(doc_id) AS i0, max(doc_id) AS i1,
         |    min(n_chars) AS c0, max(n_chars) AS c1 FROM d),
         |k AS (SELECT zone.*,
         |    CAST(i0 + floor((i1 - i0) * 0.25) AS BIGINT) AS loI,
         |    CAST(i0 + floor((i1 - i0) * 0.35) AS BIGINT) AS hiI,
         |    CAST(c0 + floor((c1 - c0) * 0.3) AS BIGINT) AS loC,
         |    CAST(c0 + floor((c1 - c0) * 0.6) AS BIGINT) AS hiC
         |  FROM zone, b),
         |h AS (SELECT layout,
         |    CASE WHEN NOT (max_id < loI OR min_id > hiI) THEN 1 ELSE 0 END AS hid,
         |    CASE WHEN NOT (max_nc < loC OR min_nc > hiC) THEN 1 ELSE 0 END AS hnc
         |  FROM k)
         |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(hid) AS BIGINT) AS scan_id_range,
         |  CAST(sum(hnc) AS BIGINT) AS scan_nc_range,
         |  CAST(sum(hid * hnc) AS BIGINT) AS scan_box
         |FROM h GROUP BY layout ORDER BY layout""".stripMargin,
    "embed_semantic_dedup" ->
      s"""$duckIvfCellsCte,
         |pairs AS (SELECT a.corpus_id AS id_a, b.corpus_id AS id_b
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.corpus_id < b.corpus_id),
         |dups AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM (
         |    SELECT id_a, id_b, $duckCosIds AS cos
         |    FROM pairs JOIN e qv ON qv.vec_id = id_a JOIN e cv ON cv.vec_id = id_b)
         |  WHERE cos >= 0.35 GROUP BY id_b)
         |SELECT c.corpus_id AS vec_id, c.cell, d.dup_of, d.dup_of IS NULL AS keep
         |FROM cells c LEFT JOIN dups d ON d.vec_id = c.corpus_id
         |ORDER BY vec_id""".stripMargin,
    "dedup_substring" ->
      s"""WITH g AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |    ${duckShingles(8)}, g -> substr(md5(g), 1, 16)))) AS gh FROM documents),
         |o AS (SELECT gh, min(doc_id) AS owner FROM g GROUP BY gh)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_owned,
         |  round(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) / count(*), 4) AS novelty,
         |  round(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) / count(*), 4) >= 0.5 AS keep
         |FROM g JOIN o USING (gh)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "lm_perplexity" ->
      s"""$duckLmCte
         |SELECT doc_id, n_bigrams, nll FROM lmscored ORDER BY doc_id""".stripMargin,
    "lm_dsir_weights" ->
      s"""WITH db AS (SELECT doc_id, b, split_part(b, ' ', 1) AS w
         |  FROM (SELECT doc_id, unnest(${duckShingles(2)}) AS b FROM documents)),
         |tdb AS (SELECT b, split_part(b, ' ', 1) AS w
         |  FROM (SELECT unnest(${duckShingles(2)}) AS b FROM documents WHERE source = 'src0')),
         |biG AS (SELECT b, count(*) AS cbg FROM db GROUP BY b),
         |preG AS (SELECT w, count(*) AS cug FROM db GROUP BY w),
         |vocG AS (SELECT count(*) AS vg FROM preG),
         |biT AS (SELECT b, count(*) AS cbt FROM tdb GROUP BY b),
         |preT AS (SELECT w, count(*) AS cut FROM tdb GROUP BY w),
         |vocT AS (SELECT count(*) AS vt FROM preT),
         |gen AS (SELECT doc_id, round(-avg(ln((cbg + 0.5) / (cug + 0.5 * vg))), 4) AS nll_gen
         |  FROM db JOIN biG USING (b) JOIN preG USING (w) CROSS JOIN vocG GROUP BY doc_id),
         |tgt AS (SELECT doc_id,
         |    round(-avg(ln((coalesce(cbt, 0) + 0.5) / (coalesce(cut, 0) + 0.5 * vt))), 4) AS nll_tgt
         |  FROM db LEFT JOIN biT USING (b) LEFT JOIN preT USING (w) CROSS JOIN vocT
         |  GROUP BY doc_id)
         |SELECT doc_id, nll_gen, nll_tgt, round(nll_gen - nll_tgt, 4) AS log_weight
         |FROM gen JOIN tgt USING (doc_id) ORDER BY doc_id""".stripMargin,
    "embed_cell_sample" ->
      s"""$duckIvfCellsCte
         |SELECT corpus_id AS vec_id, cell, CAST(rn AS BIGINT) AS rn FROM (
         |  SELECT corpus_id, cell, row_number() OVER (PARTITION BY cell
         |    ORDER BY md5(CAST(corpus_id AS VARCHAR) || 'cellsmp'), corpus_id) AS rn
         |  FROM cells)
         |WHERE rn <= 8 ORDER BY vec_id""".stripMargin,
    "lm_ppl_buckets" ->
      s"""$duckLmCte,
         |sl AS (SELECT s.doc_id, d.lang, s.nll
         |  FROM lmscored s JOIN documents d USING (doc_id)),
         |cuts AS (SELECT lang, quantile_cont(nll, 0.33) AS c33,
         |    quantile_cont(nll, 0.66) AS c66 FROM sl GROUP BY lang)
         |SELECT doc_id, lang, nll,
         |  CASE WHEN nll <= c33 THEN 'head'
         |       WHEN nll <= c66 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM sl JOIN cuts USING (lang) ORDER BY doc_id""".stripMargin,
    "heavy_hitters" ->
      // the sketch runs in its exact regime (capacity >> vocabulary), so
      // the oracle is the plain count with the same (cnt desc, token asc)
      // tie-break; err is identically 0 with no evictions
      """SELECT token, count(*) AS cnt, CAST(0 AS BIGINT) AS err
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 10""".stripMargin,
    "multimodal_resize" ->
      // mirrors assetsFromText dims ((id % 640)+1, (id % 480)+1) and
      // fakeResize's area-ratio byte scaling, capped at the original
      """SELECT doc_id AS asset_id, 320 AS width, 240 AS height,
        |  least(len(text), CAST(ceil(len(text) * 76800.0
        |    / (((doc_id % 640) + 1) * ((doc_id % 480) + 1))) AS BIGINT)) AS n_bytes,
        |  md5(substr(text, 1, CAST(least(len(text), CAST(ceil(len(text) * 76800.0
        |    / (((doc_id % 640) + 1) * ((doc_id % 480) + 1))) AS BIGINT)) AS INT))) AS resized_md5
        |FROM documents ORDER BY asset_id""".stripMargin,
    // Brute-force all-pairs over the SAME integer-only aHash bit rule
    // (block sum · L > total sum · block len) — deliberately not
    // mirroring the 3-block candidate scheme, so a candidate key that
    // ever missed a true <=2 pair would hash-mismatch here.
    "multimodal_phash_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, 'zzzz' || substr(text, 5)
         |  FROM documents WHERE doc_id % 10 = 0),
         |$duckPhashPairCtes
         |SELECT id_a, id_b, hd FROM php ORDER BY id_a, id_b""".stripMargin,
    // Brute-force all-pairs over the SAME integer-only dHash gradient
    // rule (block sum · next block len > next block sum · block len) —
    // the candidate-free truth for the gradient family
    "multimodal_dhash_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, 'zzzz' || substr(text, 5)
         |  FROM documents WHERE doc_id % 10 = 0),
         |$duckDhashPairCtes
         |SELECT id_a, id_b, hd FROM dhp ORDER BY id_a, id_b""".stripMargin,
    // Frame-set video dedup: sampled frame windows, per-frame aHash (the
    // SAME integer bit rule), stop-frame df-cap, set-Jaccard verify —
    // every stage replayed; the candidate inverted index is mirrored too
    // so a df-cap divergence would change the pair set and hash-mismatch
    "multimodal_video_dedup" ->
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substr(text, 1, 128) || repeat('y', 128) || substr(text, 257)
        |  FROM documents WHERE doc_id % 10 = 0),
        |$duckFrameHashCtes,
        |vsets AS (SELECT doc_id, list_distinct(list(fh)) AS fs FROM vf GROUP BY doc_id),
        |vkey AS (SELECT DISTINCT doc_id, fh FROM vf),
        |vhot AS (SELECT fh FROM vkey GROUP BY fh HAVING count(*) > 50),
        |vkf AS (SELECT doc_id, fh FROM vkey WHERE fh NOT IN (SELECT fh FROM vhot)),
        |vcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM vkf a JOIN vkf b ON a.fh = b.fh AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  round(len(list_intersect(sa.fs, sb.fs)) /
        |        len(list_distinct(list_concat(sa.fs, sb.fs))), 4) AS jac
        |FROM vcand JOIN vsets sa ON sa.doc_id = id_a JOIN vsets sb ON sb.doc_id = id_b
        |WHERE round(len(list_intersect(sa.fs, sb.fs)) /
        |        len(list_distinct(list_concat(sa.fs, sb.fs))), 4) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    // Temporal alignment replay: same frame chain, df-cap, and
    // mode-of-deltas with the identical (count DESC, |delta|, delta)
    // tie-break; planted stride-aligned trims must land at offset 2
    "multimodal_frame_align" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substr(text, 257)
         |  FROM documents WHERE doc_id % 10 = 0),
         |$duckFrameHashCtes,
         |hot AS (SELECT fh FROM (SELECT DISTINCT doc_id, fh FROM vf)
         |  GROUP BY fh HAVING count(*) > 50),
         |kept AS (SELECT doc_id, fno, fh FROM vf
         |  WHERE fh NOT IN (SELECT fh FROM hot)),
         |m AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(a.fno - b.fno AS BIGINT) AS delta, a.fno AS fa
         |  FROM kept a JOIN kept b ON a.fh = b.fh AND a.doc_id < b.doc_id),
         |sup AS (SELECT id_a, id_b, delta, CAST(count(*) AS BIGINT) AS aligned_n
         |  FROM m GROUP BY 1, 2, 3),
         |best AS (SELECT id_a, id_b, delta, aligned_n,
         |    row_number() OVER (PARTITION BY id_a, id_b
         |      ORDER BY aligned_n DESC, abs(delta), delta) AS rn
         |  FROM sup)
         |SELECT id_a, id_b, delta AS "offset", aligned_n FROM best
         |WHERE rn = 1 AND aligned_n >= 3 ORDER BY id_a, id_b""".stripMargin,
    // Keeper election replay: same alignment chain, then components over
    // the alignment pairs, max-frame-span keeper (ties: smaller id), and
    // each member's offset inside its keeper; `ap`/`members` are
    // MATERIALIZED — DuckDB inlines CTEs per reference, and both are
    // referenced 3-4 times (round-8 Too-many-open-files precedent)
    "video_keeper" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substr(text, 257)
         |  FROM documents WHERE doc_id % 10 = 0),
         |$duckFrameHashCtes,
         |hot AS (SELECT fh FROM (SELECT DISTINCT doc_id, fh FROM vf)
         |  GROUP BY fh HAVING count(*) > 50),
         |kept AS (SELECT doc_id, fno, fh FROM vf
         |  WHERE fh NOT IN (SELECT fh FROM hot)),
         |m AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(a.fno - b.fno AS BIGINT) AS delta, a.fno AS fa
         |  FROM kept a JOIN kept b ON a.fh = b.fh AND a.doc_id < b.doc_id),
         |sup AS (SELECT id_a, id_b, delta, CAST(count(*) AS BIGINT) AS aligned_n
         |  FROM m GROUP BY 1, 2, 3),
         |best AS (SELECT id_a, id_b, delta, aligned_n,
         |    row_number() OVER (PARTITION BY id_a, id_b
         |      ORDER BY aligned_n DESC, abs(delta), delta) AS rn
         |  FROM sup),
         |ap AS MATERIALIZED (SELECT id_a, id_b, delta AS off FROM best
         |  WHERE rn = 1 AND aligned_n >= 3),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM ap
         |          UNION ALL SELECT id_b, id_a FROM ap),
         |reach(node, r) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst),
         |comp AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node),
         |spans AS (SELECT doc_id, CAST(ceil(len(text) / 128.0) AS BIGINT) AS n_frames
         |  FROM corpus),
         |members AS MATERIALIZED (SELECT s.doc_id AS asset_id,
         |    coalesce(c.cluster, s.doc_id) AS cluster, s.n_frames
         |  FROM spans s LEFT JOIN comp c ON c.node = s.doc_id),
         |k AS (SELECT cluster, asset_id AS keeper, row_number() OVER (
         |    PARTITION BY cluster ORDER BY n_frames DESC, asset_id) AS rn
         |  FROM members),
         |kk AS (SELECT cluster, keeper FROM k WHERE rn = 1)
         |SELECT mm.asset_id, mm.cluster, mm.n_frames, kk.keeper,
         |  mm.asset_id = kk.keeper AS is_keeper,
         |  CASE WHEN mm.asset_id = kk.keeper THEN CAST(0 AS BIGINT)
         |       ELSE coalesce(o1.off, -o2.off) END AS keeper_offset
         |FROM members mm JOIN kk USING (cluster)
         |LEFT JOIN ap o1 ON o1.id_a = kk.keeper AND o1.id_b = mm.asset_id
         |LEFT JOIN ap o2 ON o2.id_b = kk.keeper AND o2.id_a = mm.asset_id
         |ORDER BY mm.asset_id""".stripMargin,
    // Asset decontamination: brute all-pairs aHash over train ∪ eval,
    // keep only CROSS pairs, flag the train side — the candidate-free
    // truth for the cross-set block-probe path
    "multimodal_decontaminate" ->
      s"""WITH trainset AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, 'zzzz' || substr(text, 5)
         |  FROM documents WHERE doc_id % 34 = 0),
         |evalset AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
         |corpus AS (SELECT doc_id, text FROM trainset
         |           UNION ALL SELECT doc_id, text FROM evalset),
         |$duckPhashPairCtes,
         |cont AS (
         |  SELECT php.id_b AS doc_id FROM php JOIN evalset e ON php.id_a = e.doc_id
         |  UNION
         |  SELECT php.id_a FROM php JOIN evalset e ON php.id_b = e.doc_id)
         |SELECT t.doc_id,
         |  t.doc_id IN (SELECT doc_id FROM cont) AS contaminated
         |FROM trainset t ORDER BY t.doc_id""".stripMargin,
    // Semantic decontamination: brute max-cosine of every train vector
    // against the eval set; planted leaks are eval vectors scaled x2
    // (cosine is scale-invariant, so they score exactly 1.0)
    "embed_decontaminate" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ev AS (SELECT vec_id, v FROM e WHERE vec_id % 19 = 0),
        |leaks AS (SELECT vec_id + 9000000 AS vec_id, list_transform(v, x -> x * 2.0) AS v
        |          FROM e WHERE vec_id % 38 = 0),
        |train AS (SELECT vec_id, v FROM e WHERE vec_id % 19 <> 0
        |          UNION ALL SELECT vec_id, v FROM leaks),
        |mc AS (SELECT t.vec_id,
        |    max(round(list_dot_product(t.v, x.v) /
        |        (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(x.v, x.v))), 4)) AS max_eval_cos
        |  FROM train t CROSS JOIN ev x GROUP BY 1)
        |SELECT t.vec_id, mc.max_eval_cos,
        |  coalesce(mc.max_eval_cos >= 0.9, false) AS contaminated
        |FROM train t LEFT JOIN mc USING (vec_id)
        |ORDER BY vec_id""".stripMargin,
    // Full replay of the composed matrix: plant construction (verbatim /
    // every-7th-word swap / x2-scaled vector), then all three gate
    // families, then the per-cohort census. Channel CTEs mirror the
    // decontaminate / decontaminate_fuzzy / embed_decontaminate oracles.
    "pipeline_decontam_matrix" -> {
      val mh8 = (0 until 8).map(duckMinhash).mkString(",\n|    ")
      s"""WITH ev0 AS (SELECT d.doc_id, lower(d.text) AS text,
         |    CAST(e.embedding AS DOUBLE[]) AS v
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
         |  WHERE d.source = 'src0'),
         |nat AS (SELECT d.doc_id, lower(d.text) AS text,
         |    CAST(e.embedding AS DOUBLE[]) AS v, 'natural' AS cohort
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
         |  WHERE d.source <> 'src0'),
         |pw AS (SELECT doc_id, i, ws[CAST(i + 1 AS INT)] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM ev0),
         |    unnest(range(0, len(ws))) AS tt(i)),
         |sw AS (SELECT doc_id,
         |    string_agg(CASE WHEN i % 7 = 0 THEN 'zzleak' ELSE w END, ' ' ORDER BY i) AS text
         |  FROM pw GROUP BY doc_id),
         |pv AS (SELECT doc_id + 10000000 AS doc_id, text,
         |    list_concat(v[17:64], v[1:16]) AS v, 'plant_verbatim' AS cohort FROM ev0),
         |pp AS (SELECT e.doc_id + 20000000 AS doc_id, sw.text,
         |    list_concat(v[33:64], v[1:32]) AS v, 'plant_paraphrase' AS cohort
         |  FROM ev0 e JOIN sw ON sw.doc_id = e.doc_id),
         |psm AS (SELECT doc_id + 30000000 AS doc_id, 'zz zz zz zz zz zz zz zz' AS text,
         |    list_transform(v, x -> x * 2.0) AS v, 'plant_semantic' AS cohort FROM ev0),
         |tr AS (SELECT * FROM nat UNION ALL SELECT * FROM pv
         |  UNION ALL SELECT * FROM pp UNION ALL SELECT * FROM psm),
         |bg AS (SELECT DISTINCT substr(md5(g), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS g FROM ev0)),
         |tg AS (SELECT doc_id,
         |    list_distinct(list_transform(${duckShingles(8)}, g -> substr(md5(g), 1, 16))) AS ghs
         |  FROM tr),
         |hx AS (SELECT doc_id, count(*) AS hits
         |  FROM (SELECT doc_id, unnest(ghs) AS gh FROM tg) JOIN bg USING (gh)
         |  GROUP BY doc_id),
         |exact AS (SELECT t.doc_id,
         |    round(coalesce(h.hits, 0) / len(t.ghs), 4) >= 0.2 AS ex
         |  FROM tg t LEFT JOIN hx h USING (doc_id)),
         |sigt AS (SELECT doc_id, [$mh8] AS hs FROM tr),
         |sigb AS (SELECT doc_id, [$mh8] AS hs FROM ev0),
         |bt AS (SELECT doc_id, i, hs[CAST(i + 1 AS INT)] AS h
         |  FROM sigt, unnest(range(0, 8)) AS tt(i)),
         |bb AS (SELECT doc_id, i, hs[CAST(i + 1 AS INT)] AS h
         |  FROM sigb, unnest(range(0, 8)) AS tt(i)),
         |cand AS (SELECT DISTINCT t.doc_id AS tid, b.doc_id AS bid
         |  FROM bt t JOIN bb b ON t.i = b.i AND t.h = b.h),
         |tkt AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM tr),
         |tkb AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM ev0),
         |mj AS (SELECT tid,
         |    max(round(len(list_intersect(a.ts, b.ts)) /
         |      len(list_distinct(list_concat(a.ts, b.ts))), 4)) AS max_jac
         |  FROM cand JOIN tkt a ON a.doc_id = tid JOIN tkb b ON b.doc_id = bid
         |  GROUP BY tid),
         |fuzzy AS (SELECT t.doc_id, coalesce(mj.max_jac, 0.0) >= 0.5 AS fz
         |  FROM tr t LEFT JOIN mj ON mj.tid = t.doc_id),
         |sem AS (SELECT t.doc_id,
         |    max(round(list_dot_product(t.v, e.v) /
         |      (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(e.v, e.v))), 4))
         |      >= 0.9 AS se
         |  FROM tr t CROSS JOIN ev0 e GROUP BY t.doc_id)
         |SELECT cohort, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT) AS exact_n,
         |  CAST(sum(CASE WHEN fz THEN 1 ELSE 0 END) AS BIGINT) AS fuzzy_n,
         |  CAST(sum(CASE WHEN se THEN 1 ELSE 0 END) AS BIGINT) AS semantic_n,
         |  CAST(sum(CASE WHEN ex OR fz OR se THEN 1 ELSE 0 END) AS BIGINT) AS any_n
         |FROM tr JOIN exact USING (doc_id) JOIN fuzzy USING (doc_id) JOIN sem USING (doc_id)
         |GROUP BY cohort ORDER BY cohort""".stripMargin
    },
    // The per-suite columns replay the incremental sweeps, but
    // `contaminated` is recomputed from ONE full-union sweep — hash
    // equality with Spark's OR-merge IS the union-decomposition proof
    // (presence + max gates decompose over eval-set union; ratio gates
    // don't, which is why this ledger carries presence verdicts).
    "decontam_eval_delta" ->
      s"""WITH tk AS (SELECT doc_id, lower(text) AS text, source FROM documents),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ev1 AS (SELECT doc_id, text FROM tk WHERE source = 'src0'),
         |dnat AS (SELECT doc_id, text FROM tk
         |  WHERE source = 'src1' AND doc_id % 3 = 0),
         |tr AS (SELECT doc_id, text FROM tk
         |  WHERE source <> 'src0' AND NOT (source = 'src1' AND doc_id % 3 = 0)),
         |dtxt AS (SELECT doc_id, text FROM dnat
         |  UNION ALL SELECT doc_id + 40000000, text FROM tr WHERE doc_id % 97 = 0),
         |gtr AS (SELECT doc_id,
         |    list_distinct(list_transform(${duckShingles(8)}, g -> substr(md5(g), 1, 16))) AS ghs
         |  FROM tr),
         |gtru AS (SELECT doc_id, unnest(ghs) AS gh FROM gtr),
         |gv1 AS (SELECT DISTINCT substr(md5(g), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS g FROM ev1)),
         |gdn AS (SELECT DISTINCT substr(md5(g), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS g FROM dtxt)),
         |vb1 AS (SELECT DISTINCT doc_id FROM gtru JOIN gv1 USING (gh)),
         |vbn AS (SELECT DISTINCT doc_id FROM gtru JOIN gdn USING (gh)),
         |vbf AS (SELECT DISTINCT doc_id FROM gtru
         |  JOIN (SELECT gh FROM gv1 UNION SELECT gh FROM gdn) USING (gh)),
         |vtr AS (SELECT t.doc_id, e.v FROM tr t JOIN e ON e.vec_id = t.doc_id),
         |vv1 AS (SELECT e.v FROM ev1 x JOIN e ON e.vec_id = x.doc_id),
         |vdn AS (SELECT e.v FROM dnat x JOIN e ON e.vec_id = x.doc_id
         |  UNION ALL SELECT list_transform(t.v, x -> x * 2.0)
         |    FROM vtr t WHERE t.doc_id % 89 = 0),
         |sc1 AS (SELECT t.doc_id, max(round(list_dot_product(t.v, u.v) /
         |    (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(u.v, u.v))), 4)) AS m
         |  FROM vtr t CROSS JOIN vv1 u GROUP BY 1),
         |scn AS (SELECT t.doc_id, max(round(list_dot_product(t.v, u.v) /
         |    (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(u.v, u.v))), 4)) AS m
         |  FROM vtr t CROSS JOIN vdn u GROUP BY 1),
         |scf AS (SELECT t.doc_id, max(round(list_dot_product(t.v, u.v) /
         |    (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(u.v, u.v))), 4)) AS m
         |  FROM vtr t CROSS JOIN (SELECT v FROM vv1 UNION ALL SELECT v FROM vdn) u
         |  GROUP BY 1)
         |SELECT tr.doc_id,
         |  (vb1.doc_id IS NOT NULL) AS verbatim_v1,
         |  coalesce(sc1.m >= 0.9, false) AS semantic_v1,
         |  (vbn.doc_id IS NOT NULL) AS verbatim_new,
         |  coalesce(scn.m >= 0.9, false) AS semantic_new,
         |  ((vbf.doc_id IS NOT NULL) OR coalesce(scf.m >= 0.9, false)) AS contaminated
         |FROM tr LEFT JOIN vb1 USING (doc_id) LEFT JOIN vbn USING (doc_id)
         |  LEFT JOIN vbf USING (doc_id) LEFT JOIN sc1 USING (doc_id)
         |  LEFT JOIN scn USING (doc_id) LEFT JOIN scf USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // Every ledger prefix recomputed from a FULL-UNION sweep: equality
    // with Spark's serial OR-fold pins N=3 associativity of the
    // presence/max gates. gtru/vtr MATERIALIZED (3 references each).
    // The PERSISTED ledger must be indistinguishable from the in-query
    // fold — both keys share this SQL verbatim.
    "decontam_ledger_chain" -> duckLedgerChainSql,
    "decontam_ledger_nightly" -> duckLedgerChainSql,
    "decontam_ledger_asof" -> duckLedgerChainSql,
    "decontam_ledger_time_travel" ->
      s"SELECT doc_id, after_v1, after_d1 FROM ($duckLedgerChainSql) t ORDER BY doc_id",
    "decontam_ledger_snapshot_served" ->
      s"SELECT doc_id, after_v1, after_d1 FROM ($duckLedgerChainSql) t ORDER BY doc_id",
    // Caption-containment agreement in 4-dp fixed point; the planted
    // every-13th reversed caption mirrors the Spark side verbatim
    "multimodal_mismatch" ->
      """WITH caps AS (SELECT doc_id AS asset_id,
        |    CASE WHEN doc_id % 13 = 0
        |      THEN reverse(array_to_string(list_slice(string_split(text, ' '), 1, 10), ' '))
        |      ELSE array_to_string(list_slice(string_split(text, ' '), 1, 10), ' ')
        |    END AS caption FROM documents),
        |prof AS (SELECT doc_id AS asset_id,
        |    list_distinct(string_split(text, ' ')) AS ctoks FROM documents),
        |j AS (SELECT asset_id,
        |    CAST(len(list_distinct(string_split(caption, ' '))) AS BIGINT) AS n,
        |    CAST(len(list_intersect(list_distinct(string_split(caption, ' ')), ctoks)) AS BIGINT) AS i
        |  FROM caps JOIN prof USING (asset_id))
        |SELECT asset_id, n AS caption_tokens,
        |  (2 * i * 10000 + n) // (2 * n) AS contain4,
        |  ((2 * i * 10000 + n) // (2 * n)) < 9000 AS mismatch
        |FROM j ORDER BY asset_id""".stripMargin,
    "multimodal_caption_join" ->
      // mirrors assetsFromText's meta formulas ((id % 640)+1 width,
      // (id % 480)+1 height, byte length) and the 10-word caption cut
      """WITH assets AS (SELECT doc_id AS asset_id,
        |    CAST(doc_id % 640 + 1 AS INTEGER) AS width,
        |    CAST(doc_id % 480 + 1 AS INTEGER) AS height,
        |    CAST(length(text) AS BIGINT) AS n_bytes
        |  FROM documents),
        |caps AS (SELECT doc_id AS asset_id,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 10), ' ') AS caption
        |  FROM documents)
        |SELECT asset_id, width, height, n_bytes,
        |  CAST(len(string_split(caption, ' ')) AS BIGINT) AS caption_tokens,
        |  md5(caption) AS caption_md5
        |FROM assets JOIN caps USING (asset_id)
        |WHERE width > 320 ORDER BY asset_id""".stripMargin,
    "embed_bitext_margin" ->
      """WITH x AS (SELECT vec_id AS x_id, CAST(embedding AS DOUBLE[]) AS xv
        |           FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 400),
        |xc AS (SELECT vec_id AS cx_id, CAST(embedding AS DOUBLE[]) AS cxv
        |       FROM embeddings WHERE vec_id % 2 = 0),
        |y AS (SELECT vec_id AS y_id, CAST(embedding AS DOUBLE[]) AS yv
        |      FROM embeddings WHERE vec_id % 2 = 1),
        |fwd AS (SELECT x_id, y_id,
        |    CAST(round(round(list_dot_product(xv, yv) /
        |      (sqrt(list_dot_product(xv, xv)) * sqrt(list_dot_product(yv, yv))), 4)
        |      * 10000) AS BIGINT) AS c4
        |  FROM x CROSS JOIN y),
        |ftop AS (SELECT x_id, y_id, c4 FROM (
        |    SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY c4 DESC, y_id) AS rk
        |    FROM fwd WHERE c4 > 0) WHERE rk <= 4),
        |fx AS (SELECT x_id, CAST(sum(c4) AS BIGINT) AS sx, count(*) AS nx
        |       FROM ftop GROUP BY x_id),
        |bwd AS (SELECT y.y_id, xc.cx_id,
        |    CAST(round(round(list_dot_product(y.yv, xc.cxv) /
        |      (sqrt(list_dot_product(y.yv, y.yv)) * sqrt(list_dot_product(xc.cxv, xc.cxv))), 4)
        |      * 10000) AS BIGINT) AS c4
        |  FROM (SELECT DISTINCT y_id FROM ftop) t JOIN y USING (y_id) CROSS JOIN xc),
        |btop AS (SELECT y_id, c4 FROM (
        |    SELECT *, row_number() OVER (PARTITION BY y_id ORDER BY c4 DESC, cx_id) AS rk
        |    FROM bwd WHERE c4 > 0) WHERE rk <= 4),
        |byy AS (SELECT y_id, CAST(sum(c4) AS BIGINT) AS sy, count(*) AS ny
        |        FROM btop GROUP BY y_id),
        |m AS (SELECT f.x_id, f.y_id, f.c4,
        |    (2 * (2 * f.c4 * fx.nx * byy.ny) * 10000 +
        |      (fx.sx * byy.ny + byy.sy * fx.nx))
        |      // (2 * (fx.sx * byy.ny + byy.sy * fx.nx)) AS m4
        |  FROM ftop f JOIN fx USING (x_id) JOIN byy USING (y_id))
        |SELECT x_id, y_id, round(c4 / 10000.0, 4) AS cos,
        |  round(m4 / 10000.0, 4) AS margin
        |FROM (SELECT *, row_number() OVER (PARTITION BY x_id
        |        ORDER BY m4 DESC, y_id) AS mrk FROM m)
        |WHERE mrk = 1 ORDER BY x_id""".stripMargin,
    "embed_mrl_distortion" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        |dims(d) AS (VALUES (8), (16), (32), (64)),
        |s AS (SELECT d, q.vec_id AS qid, e.vec_id AS cid,
        |    round(list_dot_product(list_slice(q.v, 1, d), list_slice(e.v, 1, d)) /
        |      (sqrt(list_dot_product(list_slice(q.v, 1, d), list_slice(q.v, 1, d))) *
        |       sqrt(list_dot_product(list_slice(e.v, 1, d), list_slice(e.v, 1, d)))), 4) AS cos
        |  FROM dims, q, e WHERE q.vec_id <> e.vec_id),
        |t AS (SELECT d, qid, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY d, qid ORDER BY cos DESC, cid) AS rk
        |    FROM s) WHERE rk <= 5),
        |f AS (SELECT qid, cid FROM t WHERE d = 64)
        |SELECT CAST(d AS BIGINT) AS dim, round(count(*) / 50.0, 4) AS recall_at_5
        |FROM t JOIN f USING (qid, cid) GROUP BY d ORDER BY dim""".stripMargin,
    "doc_chunking" ->
      """SELECT doc_id,
        |  CAST(s / 150 AS BIGINT) AS chunk_idx,
        |  CAST(len(substr(text, s + 1, 200)) AS BIGINT) AS chunk_len,
        |  md5(substr(text, s + 1, 200)) AS chunk_md5
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, greatest(len(text) - 1, 0), 150)) AS s
        |      FROM documents)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  len($toks) AS n_words,
         |  len(list_distinct($toks)) AS n_distinct_words,
         |  round(len(list_distinct($toks)) / len($toks), 4) AS distinct_ratio,
         |  round((length(text) - len($toks) + 1) / len($toks), 4) AS mean_word_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      s"""WITH s AS (SELECT doc_id,
         |  len(list_intersect(list_distinct($toks), ['der','die','und','das','ein'])) AS score_de,
         |  len(list_intersect(list_distinct($toks), ['the','a','and','of','to'])) AS score_en,
         |  len(list_intersect(list_distinct($toks), ['el','la','de','y','que'])) AS score_es,
         |  len(list_intersect(list_distinct($toks), ['le','la','et','de','un'])) AS score_fr
         |FROM documents)
         |SELECT doc_id, score_de, score_en, score_es, score_fr,
         |  CASE WHEN score_fr > greatest(score_de, score_en, score_es) THEN 'fr'
         |       WHEN score_es > greatest(score_de, score_en) THEN 'es'
         |       WHEN score_en > score_de THEN 'en' ELSE 'de' END AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id, md5(lower(text)) AS md5_fp,
         |  array_to_string(list_sort(list_transform(${duckShingles(3)}, s -> md5(s)))[1:4], ',') AS sketch
         |FROM documents ORDER BY doc_id""".stripMargin,
    "token_counts" ->
      s"""SELECT doc_id, len($toks) AS ws_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keeper, count(*) AS copies
        |FROM documents GROUP BY 1 ORDER BY content_md5""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $duckMinhashPairCtes
         |SELECT id_a, id_b, jac FROM vpairs ORDER BY id_a, id_b""".stripMargin,
    "dedup_allpairs" ->
      // brute-force all-pairs over the bigram gram sets: the DEFINITION
      // the prefix-filtering join must reproduce exactly (no
      // candidate-generation shortcuts here)
      s"""WITH graw AS (SELECT doc_id, list_distinct(${duckShingles(2)}) AS grams
         |FROM documents),
         |g AS (SELECT doc_id,
         |  list_transform(grams, x -> substr(md5(x), 1, 16)) AS ts FROM graw)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_intersect(a.ts, b.ts)) /
         |        len(list_distinct(list_concat(a.ts, b.ts))), 4) AS jac
         |FROM g a JOIN g b ON a.doc_id < b.doc_id
         |WHERE round(len(list_intersect(a.ts, b.ts)) /
         |        len(list_distinct(list_concat(a.ts, b.ts))), 4) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "source_contamination" ->
      s"""WITH $duckMinhashPairCtes,
         |sym AS (SELECT id_a, id_b FROM vpairs
         |        UNION ALL SELECT id_b, id_a FROM vpairs),
         |j AS (SELECT da.source AS src_a, db.source AS src_b, s.id_a
         |      FROM sym s
         |      JOIN documents da ON da.doc_id = s.id_a
         |      JOIN documents db ON db.doc_id = s.id_b),
         |tot AS (SELECT source AS src_a, count(*) AS total_a FROM documents GROUP BY 1)
         |SELECT j.src_a, j.src_b, count(*) AS n_pairs,
         |  count(DISTINCT j.id_a) AS docs_a,
         |  round(count(DISTINCT j.id_a) / CAST(tot.total_a AS DOUBLE), 6) AS frac_a
         |FROM j JOIN tot ON tot.src_a = j.src_a
         |GROUP BY j.src_a, j.src_b, tot.total_a
         |ORDER BY 1, 2""".stripMargin,
    "pair_graph_rank" -> {
      s"""WITH $duckMinhashPairCtes,
         |e AS (SELECT id_a AS src, id_b AS dst FROM vpairs
         |  UNION SELECT id_b, id_a FROM vpairs),
         |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) AS rank FROM d),
         |${duckPagerankRound(1)},
         |${duckPagerankRound(2)},
         |${duckPagerankRound(3)}
         |SELECT id AS doc_id, d.deg, round(rank, 4) AS rank
         |FROM r3 JOIN d ON r3.id = d.src ORDER BY doc_id""".stripMargin
    },
    "dedup_pagerank_keeper" -> {
      s"""WITH RECURSIVE $duckClusterCtes,
         |e AS (SELECT DISTINCT src, dst FROM (
         |  SELECT id_a AS src, id_b AS dst FROM vpairs
         |  UNION ALL SELECT id_b, id_a FROM vpairs)),
         |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) AS rank FROM d),
         |${duckPagerankRound(1)},
         |${duckPagerankRound(2)},
         |${duckPagerankRound(3)},
         |m AS (SELECT node AS doc_id, cluster, round(rank, 4) AS rank
         |  FROM comp JOIN r3 ON comp.node = r3.id),
         |k AS (SELECT cluster, doc_id AS keeper FROM (
         |    SELECT cluster, doc_id,
         |      row_number() OVER (PARTITION BY cluster ORDER BY rank DESC, doc_id) AS rn
         |    FROM m) WHERE rn = 1)
         |SELECT m.doc_id, m.cluster, m.rank, k.keeper,
         |  m.doc_id = k.keeper AS is_keeper
         |FROM m JOIN k USING (cluster) ORDER BY m.doc_id""".stripMargin
    },
    "dedup_cluster" ->
      // Connected components of the verified pair graph as a recursive
      // reachability closure + min-per-node: tiny in DuckDB at oracle
      // scale, exactly what the distributed label propagation computes.
      s"""WITH RECURSIVE $duckClusterCtes
         |SELECT node AS doc_id, cluster,
         |  count(*) OVER (PARTITION BY cluster) AS csize
         |FROM comp ORDER BY doc_id""".stripMargin,
    // Holdout construction replay; cross_edges is recomputed from the
    // verified pair table DIRECTLY (not assumed 0), so the hash gate
    // proves cluster-atomic assignment leaks nothing into train
    "pipeline_make_eval_holdout" ->
      s"""WITH RECURSIVE $duckClusterCtes,
         |allc AS (SELECT d.doc_id, d.source, d.text,
         |    coalesce(c.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
         |ev AS (SELECT * FROM allc
         |  WHERE (instr('0123456789abcdef',
         |    substring(md5(CAST(cluster AS VARCHAR) || 'holdout'), 1, 1)) - 1) < 4),
         |gq AS (SELECT doc_id, text, $toks AS tk, len($toks) AS n_words FROM ev),
         |pass AS (SELECT doc_id FROM gq
         |  WHERE n_words >= 40
         |    AND round((length(text) - n_words + 1) / n_words, 4) BETWEEN 3.0 AND 8.0
         |    AND round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t))) / n_words, 4) >= 0.05
         |    AND round(list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d)))) / n_words, 4) <= 0.15
         |    AND round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(text), 4) <= 0.1),
         |ranked AS (SELECT e.doc_id, e.source, e.cluster,
         |    row_number() OVER (PARTITION BY e.source
         |      ORDER BY md5(CAST(e.doc_id AS VARCHAR) || 'hrank'), e.doc_id) AS rn
         |  FROM ev e JOIN pass USING (doc_id)),
         |sel AS (SELECT * FROM ranked WHERE rn <= 5),
         |tr AS (SELECT doc_id FROM allc
         |  WHERE cluster NOT IN (SELECT DISTINCT cluster FROM ev)),
         |ed AS (SELECT id_a AS doc_id, id_b AS other FROM vpairs
         |  UNION ALL SELECT id_b, id_a FROM vpairs),
         |cx AS (SELECT ed.doc_id, CAST(count(*) AS BIGINT) AS cross_edges
         |  FROM ed JOIN tr ON tr.doc_id = ed.other GROUP BY 1)
         |SELECT s.doc_id, s.source, s.cluster, CAST(s.rn AS BIGINT) AS rn,
         |  coalesce(cx.cross_edges, 0) AS cross_edges
         |FROM sel s LEFT JOIN cx USING (doc_id) ORDER BY doc_id""".stripMargin,
    "dedup_cluster_incremental" ->
      // merge ≡ recompute: the incremental path must land on the same
      // full closure whatever the base/delta split was
      s"""WITH RECURSIVE $duckClusterCtes
         |SELECT node AS doc_id, cluster,
         |  count(*) OVER (PARTITION BY cluster) AS csize
         |FROM comp ORDER BY doc_id""".stripMargin,
    "source_quality_report" ->
      s"""WITH g AS (SELECT doc_id, source, text, $toks AS tk, len($toks) AS n_words
         |  FROM documents),
         |sig AS (SELECT source,
         |    round((length(text) - n_words + 1) / n_words, 4) AS mwl,
         |    round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t)))
         |      / n_words, 4) AS stop_frac,
         |    (n_words >= 40
         |      AND round((length(text) - n_words + 1) / n_words, 4) BETWEEN 3.0 AND 8.0
         |      AND round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t))) / n_words, 4) >= 0.05
         |      AND round(list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d)))) / n_words, 4) <= 0.15
         |      AND round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(text), 4) <= 0.1
         |    ) AS passes
         |  FROM g)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
         |    AS pass_rate,
         |  quantile_cont(mwl, 0.25) AS mwl_p25,
         |  quantile_cont(mwl, 0.5) AS mwl_p50,
         |  quantile_cont(mwl, 0.75) AS mwl_p75,
         |  round(CAST(sum(CAST(round(stop_frac * 10000, 0) AS BIGINT)) AS DOUBLE)
         |    / count(*) / 10000.0, 4) AS mean_stop_frac
         |FROM sig GROUP BY source ORDER BY source""".stripMargin,
    "embed_novelty" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ex AS (SELECT * FROM e WHERE vec_id % 2 = 0),
         |nw AS (SELECT * FROM e WHERE vec_id % 2 = 1),
         |cents AS (SELECT CAST((rn - 1) // 7 AS INT) AS cid, v AS cvec FROM (
         |    SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
         |    FROM ex ORDER BY vec_id LIMIT ${IvfCentroids * 7})
         |  WHERE (rn - 1) % 7 = 0),
         |exsims AS (SELECT ex.vec_id, cents.cid,
         |    list_dot_product(ex.v, cents.cvec) /
         |      (sqrt(list_dot_product(ex.v, ex.v)) * sqrt(list_dot_product(cents.cvec, cents.cvec))) AS s
         |  FROM ex CROSS JOIN cents),
         |cells AS (SELECT vec_id AS corpus_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
         |    FROM exsims) WHERE rn = 1),
         |nwsims AS (SELECT nw.vec_id, cents.cid,
         |    list_dot_product(nw.v, cents.cvec) /
         |      (sqrt(list_dot_product(nw.v, nw.v)) * sqrt(list_dot_product(cents.cvec, cents.cvec))) AS s
         |  FROM nw CROSS JOIN cents),
         |probes AS (SELECT vec_id AS qid, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rn
         |    FROM nwsims) WHERE rn <= $IvfProbes),
         |cand AS (SELECT DISTINCT p.qid, c.corpus_id FROM probes p JOIN cells c USING (cell)),
         |mc AS (SELECT cand.qid, max($duckCosIds) AS max_cos
         |  FROM cand JOIN e qv ON qv.vec_id = cand.qid
         |            JOIN e cv ON cv.vec_id = cand.corpus_id
         |  GROUP BY 1)
         |SELECT nw.vec_id, mc.max_cos,
         |  coalesce(mc.max_cos < 0.35, true) AS novel
         |FROM nw LEFT JOIN mc ON mc.qid = nw.vec_id
         |ORDER BY vec_id""".stripMargin,
    "events_anomaly" ->
      """WITH daily AS (SELECT event_type AS etype, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |ew AS (SELECT d.etype, d.day,
        |    round(sum(h.cnt * pow(0.5, datediff('day', h.day, d.day) - 1)) /
        |          sum(pow(0.5, datediff('day', h.day, d.day) - 1)), 4) AS ewma_prev
        |  FROM daily d JOIN daily h ON d.etype = h.etype
        |    AND datediff('day', h.day, d.day) BETWEEN 1 AND 20
        |  GROUP BY 1, 2)
        |SELECT d.etype, d.day, d.cnt, ew.ewma_prev,
        |  round(d.cnt / ew.ewma_prev, 4) AS ratio,
        |  coalesce(round(d.cnt / ew.ewma_prev, 4) > 3.0, false) AS is_spike
        |FROM daily d LEFT JOIN ew ON d.etype = ew.etype AND d.day = ew.day
        |ORDER BY 1, 2""".stripMargin,
    "dedup_cluster_star" -> // star contraction must agree with the same closure
      s"""WITH RECURSIVE $duckClusterCtes
         |SELECT node AS doc_id, cluster,
         |  count(*) OVER (PARTITION BY cluster) AS csize
         |FROM comp ORDER BY doc_id""".stripMargin,
    "pipeline_prepare_training" ->
      s"""WITH RECURSIVE $duckClusterCtes,
         |drops AS (SELECT node FROM comp WHERE node <> cluster),
         |kept AS (SELECT * FROM documents
         |         WHERE doc_id NOT IN (SELECT node FROM drops)),
         |g AS (SELECT doc_id, lang, source, text, $toks AS tk,
         |             len($toks) AS n_words FROM kept),
         |gated AS (SELECT doc_id, lang, source, text FROM g WHERE
         |  n_words >= 40
         |  AND round((length(text) - n_words + 1) / n_words, 4) BETWEEN 3.0 AND 8.0
         |  AND round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t))) / n_words, 4) >= 0.05
         |  AND round(list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d)))) / n_words, 4) <= 0.15
         |  AND round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(text), 4) <= 0.1),
         |bg AS (SELECT DISTINCT substr(md5(gr), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS gr FROM documents WHERE source = 'src0')),
         |train AS (SELECT doc_id, lang, text,
         |    list_distinct(list_transform(${duckShingles(8)}, g2 -> substr(md5(g2), 1, 16))) AS ghs
         |  FROM gated WHERE source <> 'src0'),
         |h AS (SELECT doc_id, count(*) AS hits
         |  FROM (SELECT doc_id, unnest(ghs) AS gh FROM train) JOIN bg USING (gh)
         |  GROUP BY doc_id),
         |clean AS (SELECT tr.doc_id, tr.lang, tr.text
         |  FROM train tr LEFT JOIN h USING (doc_id)
         |  WHERE round(coalesce(h.hits, 0) / len(tr.ghs), 4) < 0.2),
         |packed AS (SELECT doc_id, lang, len($toks) AS n_toks,
         |    sum(len($toks)) OVER (PARTITION BY lang ORDER BY doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM clean)
         |SELECT doc_id, lang, n_toks,
         |  CAST((cum - n_toks) // 512 AS BIGINT) AS pack_id,
         |  CAST((cum - n_toks) % 512 AS BIGINT) AS offset_in_pack
         |FROM packed ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """WITH rates(lang, keep16) AS (VALUES
        |  ('en', 2), ('de', 4), ('es', 4), ('fr', 8), ('zh', 8))
        |SELECT doc_id, lang, source
        |FROM documents JOIN rates USING (lang)
        |WHERE instr('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < keep16
        |ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      s"""WITH dg AS (SELECT doc_id,
         |    list_transform(list_transform($toks, t -> md5(t)),
         |      h -> list_transform(range(1, 17),
         |        j -> instr('0123456789abcdef', substring(h, CAST(j AS INT), 1)) - 1)) AS ds
         |  FROM documents)
         |SELECT doc_id, $duckSimhashBits64 AS simhash
         |FROM dg ORDER BY doc_id""".stripMargin,
    // Oracle is BRUTE-FORCE all-pairs over the same 64-bit fingerprints —
    // deliberately not mirroring the 3-block candidate scheme, so a block
    // key that ever MISSED a true <=2 pair would hash-mismatch here.
    "dedup_simhash_hamming" ->
      s"""WITH dg AS (SELECT doc_id,
         |    list_transform(list_transform($toks, t -> md5(t)),
         |      h -> list_transform(range(1, 17),
         |        j -> instr('0123456789abcdef', substring(h, CAST(j AS INT), 1)) - 1)) AS ds
         |  FROM documents),
         |sh AS (SELECT doc_id, $duckSimhashBits64 AS s FROM dg),
         |h AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> CASE WHEN substring(a.s, CAST(i AS INT), 1)
         |          = substring(b.s, CAST(i AS INT), 1) THEN 0 ELSE 1 END)) AS BIGINT) AS hd
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hd FROM h WHERE hd <= 2 ORDER BY id_a, id_b""".stripMargin,
    "bm25_retrieval" -> duckBm25,
    // the indexed variant must agree with the from-text variant exactly —
    // one oracle judges both, and the delta-merged index a third time
    "bm25_indexed" -> duckBm25,
    "retrieval_prf" -> duckBm25Prf,
    "lang_confusion" ->
      s"""WITH s AS (SELECT doc_id, lang,
         |  len(list_intersect(list_distinct($toks), ['der','die','und','das','ein'])) AS score_de,
         |  len(list_intersect(list_distinct($toks), ['the','a','and','of','to'])) AS score_en,
         |  len(list_intersect(list_distinct($toks), ['el','la','de','y','que'])) AS score_es,
         |  len(list_intersect(list_distinct($toks), ['le','la','et','de','un'])) AS score_fr
         |FROM documents),
         |p AS (SELECT lang,
         |  CASE WHEN score_fr > greatest(score_de, score_en, score_es) THEN 'fr'
         |       WHEN score_es > greatest(score_de, score_en) THEN 'es'
         |       WHEN score_en > score_de THEN 'en' ELSE 'de' END AS pred_lang
         |FROM s)
         |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,
    "embed_pq_distortion" ->
      s"""$duckPqCodesCte,
         |best AS (SELECT vec_id, j, min(d2) AS d2 FROM dd GROUP BY 1, 2)
         |SELECT CAST(j AS BIGINT) AS j, CAST(count(*) AS BIGINT) AS n_vectors,
         |  round(avg(d2), 4) AS avg_d2, round(max(d2), 4) AS max_d2
         |FROM best GROUP BY j ORDER BY j""".stripMargin,
    "gate_ensemble" ->
      s"""WITH g AS (SELECT doc_id, text, $toks AS tk, len($toks) AS n_words
         |  FROM documents),
         |ga AS (SELECT doc_id,
         |    (n_words >= 40
         |      AND round((length(text) - n_words + 1) / n_words, 4) BETWEEN 3.0 AND 8.0
         |      AND round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t))) / n_words, 4) >= 0.05
         |      AND round(list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d)))) / n_words, 4) <= 0.15
         |      AND round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(text), 4) <= 0.1
         |    ) AS a
         |  FROM g),
         |gr AS (SELECT doc_id, ${duckShingles(2)} AS g2, ${duckShingles(3)} AS g3
         |  FROM documents),
         |gb AS (SELECT doc_id,
         |    round((len(g2) - len(list_distinct(g2))) / len(g2), 4) <= 0.3 AND
         |    round((len(g3) - len(list_distinct(g3))) / len(g3), 4) <= 0.3 AS b
         |  FROM gr),
         |gm AS (SELECT doc_id,
         |    NOT (CAST(len(regexp_extract_all(text, '�')) +
         |      len(regexp_extract_all(text, '[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]')) +
         |      len(regexp_extract_all(text, '(Ã.|â€.|Â.)')) AS DOUBLE) /
         |      greatest(length(text), 1) > 0.001) AS m
         |  FROM documents)
         |SELECT a AS g, b AS r, m, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(CAST(a AS INT) + CAST(b AS INT) + CAST(m AS INT) AS BIGINT) AS votes,
         |  (CAST(a AS INT) + CAST(b AS INT) + CAST(m AS INT)) >= 2 AS majority_keep
         |FROM ga JOIN gb USING (doc_id) JOIN gm USING (doc_id)
         |GROUP BY a, b, m ORDER BY g, r, m""".stripMargin,
    "sample_length_matched" ->
      """WITH t AS (SELECT * FROM documents WHERE source = 'src0'),
        |e AS (SELECT quantile_cont(n_chars, 0.25) AS q1,
        |    quantile_cont(n_chars, 0.5) AS q2,
        |    quantile_cont(n_chars, 0.75) AS q3 FROM t),
        |dem AS (SELECT CASE WHEN n_chars <= q1 THEN 0 WHEN n_chars <= q2 THEN 1
        |      WHEN n_chars <= q3 THEN 2 ELSE 3 END AS bucket,
        |    count(*) AS want
        |  FROM t CROSS JOIN e GROUP BY 1),
        |pool AS (SELECT doc_id,
        |    CASE WHEN n_chars <= q1 THEN 0 WHEN n_chars <= q2 THEN 1
        |      WHEN n_chars <= q3 THEN 2 ELSE 3 END AS bucket,
        |    md5(CAST(doc_id AS VARCHAR) || 'lms') AS ord
        |  FROM documents CROSS JOIN e WHERE source <> 'src0'),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY bucket
        |    ORDER BY ord, doc_id) AS rn FROM pool)
        |SELECT CAST(bucket AS BIGINT) AS bucket, doc_id,
        |  CAST(rn AS BIGINT) AS rn, want
        |FROM rk JOIN dem USING (bucket) WHERE rn <= want
        |ORDER BY bucket, rn""".stripMargin,
    "eval_gate_agreement" ->
      s"""WITH g AS (SELECT doc_id, text, $toks AS tk, len($toks) AS n_words
         |  FROM documents),
         |ga AS (SELECT doc_id,
         |    (n_words >= 40
         |      AND round((length(text) - n_words + 1) / n_words, 4) BETWEEN 3.0 AND 8.0
         |      AND round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t))) / n_words, 4) >= 0.05
         |      AND round(list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d)))) / n_words, 4) <= 0.15
         |      AND round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(text), 4) <= 0.1
         |    ) AS a
         |  FROM g),
         |gr AS (SELECT doc_id, ${duckShingles(2)} AS g2, ${duckShingles(3)} AS g3
         |  FROM documents),
         |gb AS (SELECT doc_id,
         |    round((len(g2) - len(list_distinct(g2))) / len(g2), 4) <= 0.3 AND
         |    round((len(g3) - len(list_distinct(g3))) / len(g3), 4) <= 0.3 AS b
         |  FROM gr),
         |c AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM ga JOIN gb USING (doc_id)),
         |k AS (SELECT *, (n11 + n00) / n AS po, (n11 + n10) / n AS pa,
         |    (n11 + n01) / n AS pb FROM c),
         |k2 AS (SELECT *, pa * pb + (1.0 - pa) * (1.0 - pb) AS pe FROM k)
         |SELECT n11, n10, n01, n00, round(po, 4) AS po,
         |  CASE WHEN 1.0 - pe = 0.0 THEN NULL
         |    ELSE round((po - pe) / (1.0 - pe), 4) END AS kappa
         |FROM k2""".stripMargin,
    "eval_ndcg" ->
      s"""WITH $duckBm25Ctes,
         |gains AS (SELECT doc_id,
         |    (CASE WHEN list_contains(tk, 'table') THEN 1 ELSE 0 END
         |   + CASE WHEN list_contains(tk, 'query') THEN 1 ELSE 0 END
         |   + CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END) AS gain
         |  FROM base),
         |ranked AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM (
         |    SELECT doc_id, $duckBm25Sum AS score FROM sc GROUP BY doc_id
         |    ORDER BY score DESC, doc_id LIMIT 10)),
         |co AS (SELECT r.rank, g.gain,
         |    CAST(round(round(g.gain / ln(r.rank + 1.0), 6) * 1e6, 0) AS BIGINT) AS cfx
         |  FROM ranked r JOIN gains g USING (doc_id)),
         |d AS (SELECT CAST(sum(cfx) AS BIGINT) AS dcgfx,
         |    min(CASE WHEN gain > 0 THEN rank END) AS first_rel,
         |    CAST(sum(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
         |  FROM co),
         |ideal AS (SELECT gain, row_number() OVER (ORDER BY gain DESC, doc_id) AS irank
         |  FROM (SELECT doc_id, gain FROM gains ORDER BY gain DESC, doc_id LIMIT 10)),
         |i AS (SELECT CAST(sum(CAST(round(round(gain / ln(irank + 1.0), 6) * 1e6, 0)
         |    AS BIGINT)) AS BIGINT) AS idcgfx FROM ideal)
         |SELECT CASE WHEN idcgfx = 0 THEN NULL
         |    ELSE round(CAST(dcgfx AS DOUBLE) / idcgfx, 4) END AS ndcg10,
         |  coalesce(round(1.0 / first_rel, 4), 0.0) AS mrr, n_rel
         |FROM d, i""".stripMargin,
    "index_incremental" -> duckBm25,
    // the chained PERSISTED index must be indistinguishable from a
    // from-scratch build — same full-corpus BM25 replay, verbatim
    "retrieval_index_nightly" -> duckBm25,
    "source_overlap" ->
      s"""WITH st AS MATERIALIZED (SELECT DISTINCT source, tok
         |  FROM (SELECT source, unnest($toks) AS tok FROM documents)),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY source),
         |iv AS (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT src_a, src_b, inter,
         |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
         |FROM iv JOIN sz sa ON iv.src_a = sa.source
         |  JOIN sz sb ON iv.src_b = sb.source
         |ORDER BY src_a, src_b""".stripMargin,
    "pipeline_audit" ->
      // the prepare-training chain (proven CTEs), re-read as per-stage counts
      s"""WITH RECURSIVE $duckClusterCtes,
         |drops AS (SELECT node FROM comp WHERE node <> cluster),
         |kept AS (SELECT * FROM documents
         |         WHERE doc_id NOT IN (SELECT node FROM drops)),
         |g AS (SELECT doc_id, lang, source, text, $toks AS tk,
         |             len($toks) AS n_words FROM kept),
         |gated AS (SELECT doc_id, lang, source, text FROM g WHERE
         |  n_words >= 40
         |  AND round((length(text) - n_words + 1) / n_words, 4) BETWEEN 3.0 AND 8.0
         |  AND round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t))) / n_words, 4) >= 0.05
         |  AND round(list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d)))) / n_words, 4) <= 0.15
         |  AND round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(text), 4) <= 0.1),
         |bg AS (SELECT DISTINCT substr(md5(gr), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS gr FROM documents WHERE source = 'src0')),
         |train AS (SELECT doc_id, source,
         |    list_distinct(list_transform(${duckShingles(8)}, g2 -> substr(md5(g2), 1, 16))) AS ghs
         |  FROM gated WHERE source <> 'src0'),
         |h AS (SELECT doc_id, count(*) AS hits
         |  FROM (SELECT doc_id, unnest(ghs) AS gh FROM train) JOIN bg USING (gh)
         |  GROUP BY doc_id),
         |cln AS (SELECT tr.doc_id FROM train tr LEFT JOIN h USING (doc_id)
         |  WHERE round(coalesce(h.hits, 0) / len(tr.ghs), 4) < 0.2),
         |a AS (
         |  SELECT source, 'input' AS stage, CAST(count(*) AS BIGINT) AS n_docs
         |    FROM documents GROUP BY source
         |  UNION ALL SELECT source, 'dedup_dropped', CAST(count(*) AS BIGINT)
         |    FROM documents WHERE doc_id IN (SELECT node FROM drops) GROUP BY source
         |  UNION ALL SELECT source, 'quality_dropped', CAST(count(*) AS BIGINT)
         |    FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM gated) GROUP BY source
         |  UNION ALL SELECT source, 'benchmark_held_out', CAST(count(*) AS BIGINT)
         |    FROM gated WHERE source = 'src0' GROUP BY source
         |  UNION ALL SELECT source, 'decontam_dropped', CAST(count(*) AS BIGINT)
         |    FROM train WHERE doc_id NOT IN (SELECT doc_id FROM cln) GROUP BY source
         |  UNION ALL SELECT source, 'kept', CAST(count(*) AS BIGINT)
         |    FROM train WHERE doc_id IN (SELECT doc_id FROM cln) GROUP BY source)
         |SELECT source, stage, n_docs FROM a ORDER BY source, stage""".stripMargin,
    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h_old
        |  FROM documents WHERE source <> 'src4'),
        |n AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 0 THEN text || ' [rev2]' ELSE text END) AS h_new
        |  FROM documents WHERE source <> 'src0')
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.h_old IS NULL THEN 'added'
        |       WHEN n.h_new IS NULL THEN 'removed'
        |       WHEN o.h_old <> n.h_new THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    "bm25_batch" ->
      """WITH qt AS (SELECT CAST(query_id AS BIGINT) AS query_id, tok FROM (VALUES
        |    (1, 'table'), (1, 'query'), (2, 'spark'), (2, 'data'),
        |    (3, 'the'), (3, 'of')) AS v(query_id, tok)),
        |base AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM base),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
        |tfb AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(tk) AS tok FROM base)
        |  WHERE tok IN (SELECT tok FROM qt) GROUP BY doc_id, tok),
        |dfb AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tfb GROUP BY tok),
        |sc2 AS (SELECT query_id, doc_id,
        |    ln((n - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
        |        + CAST(1.0 AS DOUBLE))
        |      * (tf * CAST(2.2 AS DOUBLE))
        |      / (tf + CAST(1.2 AS DOUBLE)
        |          * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS w
        |  FROM qt JOIN tfb USING (tok) JOIN dfb USING (tok)
        |    JOIN dl USING (doc_id) CROSS JOIN st),
        |ag AS (SELECT query_id, doc_id,
        |    round(CAST(sum(CAST(round(round(w, 6) * 1e6, 0) AS BIGINT)) AS DOUBLE) / 1e6, 4) AS score,
        |    CAST(count(*) AS BIGINT) AS n_terms
        |  FROM sc2 GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, score, n_terms, rank FROM (
        |  SELECT *, CAST(row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM ag) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "retrieval_hybrid_rrf" ->
      s"""WITH $duckBm25Ctes,
         |bs AS (SELECT doc_id, $duckBm25Sum AS score
         |  FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
         |sr AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bs),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec
         |  FROM embeddings WHERE vec_id = 0),
         |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM embeddings WHERE vec_id <> 0),
         |s2 AS (SELECT corpus_id, $duckCos AS cos FROM c CROSS JOIN q),
         |dr AS (SELECT corpus_id AS doc_id, rank FROM (
         |    SELECT corpus_id,
         |      row_number() OVER (ORDER BY cos DESC, corpus_id) AS rank FROM s2)
         |  WHERE rank <= 20),
         |fx AS (SELECT doc_id, CAST(round(round(CAST(1.0 AS DOUBLE) / (60 + rank), 6)
         |      * 1e6, 0) AS BIGINT) AS cfx FROM sr
         |  UNION ALL
         |  SELECT doc_id, CAST(round(round(CAST(1.0 AS DOUBLE) / (60 + rank), 6)
         |      * 1e6, 0) AS BIGINT) FROM dr)
         |SELECT doc_id, round(CAST(sum(cfx) AS DOUBLE) / 1e6, 6) AS rrf,
         |  CAST(count(*) AS BIGINT) AS n_lists
         |FROM fx GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    "graph_triangles" ->
      s"""WITH $duckTriangleCtes
         |SELECT l[1] AS a, l[2] AS b, l[3] AS c
         |FROM (SELECT list_sort([u, v, z]) AS l FROM tri)
         |ORDER BY a, b, c""".stripMargin,
    "graph_clustering" ->
      s"""WITH $duckTriangleCtes,
         |tc AS (SELECT x, CAST(count(*) AS BIGINT) AS tri_cnt FROM (
         |  SELECT unnest([u, v, z]) AS x FROM tri) GROUP BY x)
         |SELECT d.x AS doc_id, d.deg, coalesce(tc.tri_cnt, 0) AS tri_cnt,
         |  round(CAST(2.0 AS DOUBLE) * coalesce(tc.tri_cnt, 0)
         |    / (d.deg * (d.deg - 1)), 4) AS coeff
         |FROM dg d LEFT JOIN tc ON d.x = tc.x WHERE d.deg >= 2
         |ORDER BY doc_id""".stripMargin,
    "quality_logreg" ->
      s"""WITH $duckLogregCtes
         |SELECT doc_id, y, score, score >= 0.5 AS pred
         |FROM lrscored ORDER BY doc_id""".stripMargin,
    "eval_auc" ->
      s"""WITH $duckLogregCtes,
         |sg AS (SELECT score AS sc,
         |    CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS np,
         |    CAST(sum(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS nn2
         |  FROM lrscored GROUP BY score),
         |cum AS (SELECT np, nn2,
         |    CAST(sum(nn2) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      - nn2 AS cumnn
         |  FROM sg)
         |SELECT round((CAST(sum(np * cumnn) AS DOUBLE)
         |      + 0.5 * CAST(sum(np * nn2) AS DOUBLE))
         |    / (CAST(sum(np) AS DOUBLE) * CAST(sum(nn2) AS DOUBLE)), 6) AS auc,
         |  CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn2) AS BIGINT) AS n_neg
         |FROM cum""".stripMargin,
    "eval_f1_sweep" ->
      s"""WITH $duckLogregCtes,
         |sg AS (SELECT score AS sc,
         |    CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS np,
         |    CAST(sum(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS nn2
         |  FROM lrscored GROUP BY score),
         |pts AS MATERIALIZED (SELECT sc,
         |    CAST(sum(np) OVER (ORDER BY sc DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
         |    CAST(sum(nn2) OVER (ORDER BY sc DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp,
         |    CAST(sum(np) OVER () AS BIGINT)
         |      - CAST(sum(np) OVER (ORDER BY sc DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fn
         |  FROM sg),
         |pts2 AS (SELECT *, round(CAST(2.0 AS DOUBLE) * tp
         |    / (CAST(2.0 AS DOUBLE) * tp + fp + fn), 6) AS f1 FROM pts)
         |SELECT sc AS threshold, tp, fp, fn,
         |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
         |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall, f1
         |FROM pts2 ORDER BY f1 DESC, sc LIMIT 1""".stripMargin,
    "eval_calibration" ->
      s"""WITH $duckLogregCtes
         |SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
         |  CAST(count(*) AS BIGINT) AS n,
         |  round(CAST(sum(CAST(round(score * 1e6, 0) AS BIGINT)) AS DOUBLE)
         |    / 1e6 / count(*), 6) AS mean_score,
         |  round(CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS frac_pos
         |FROM lrscored GROUP BY bin ORDER BY bin""".stripMargin,
    "graph_kcore" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings WHERE vec_id < 300),
         |pe AS MATERIALIZED (SELECT a.vec_id AS x, b.vec_id AS y
         |  FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.v, b.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.35),
         |u0 AS MATERIALIZED (SELECT DISTINCT x, y FROM
         |  (SELECT x, y FROM pe UNION ALL SELECT y, x FROM pe)),
         |${(1 to 8).map(duckPeel).mkString(",\n")}
         |SELECT x AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
         |FROM u8 GROUP BY x ORDER BY doc_id""".stripMargin,
    "pipeline_graph_hygiene" ->
      // the triangle chain supplies pe/dg/tri; the peel unroll runs off
      // the same bidirectional ue; survivors join coherence scores
      s"""WITH $duckTriangleCtes,
         |u0 AS MATERIALIZED (SELECT x, y FROM ue),
         |${(1 to 8).map(duckPeel).mkString(",\n")},
         |core AS (SELECT x AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
         |  FROM u8 GROUP BY x),
         |tc AS (SELECT x, CAST(count(*) AS BIGINT) AS tri_cnt FROM (
         |  SELECT unnest([u, v, z]) AS x FROM tri) GROUP BY x),
         |cc AS (SELECT d.x AS doc_id, d.deg, coalesce(tc.tri_cnt, 0) AS tri_cnt,
         |    round(CAST(2.0 AS DOUBLE) * coalesce(tc.tri_cnt, 0)
         |      / (d.deg * (d.deg - 1)), 4) AS coeff
         |  FROM dg d LEFT JOIN tc ON d.x = tc.x WHERE d.deg >= 2)
         |SELECT core.doc_id, core.core_deg, cc.deg, cc.tri_cnt, cc.coeff
         |FROM core JOIN cc USING (doc_id) WHERE cc.coeff >= 0.5
         |ORDER BY doc_id""".stripMargin,
    "rolling_active" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
        |r AS (SELECT DISTINCT user_id, day + CAST(i AS INT) AS rday
        |  FROM d, unnest(range(0, 7)) AS t(i))
        |SELECT rday AS day, CAST(count(*) AS BIGINT) AS active_keys
        |FROM r CROSS JOIN b WHERE rday BETWEEN lo AND hi
        |GROUP BY rday ORDER BY rday""".stripMargin,
    "cohort_retention" ->
      """WITH w AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY user_id)
        |SELECT cohort_week, CAST((wk - cohort_week) // 7 AS BIGINT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "inverted_index" ->
      """WITH pd AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok, doc_id FROM documents)
        |  GROUP BY tok, doc_id),
        |ag AS (SELECT tok, CAST(count(*) AS BIGINT) AS df, CAST(sum(c) AS BIGINT) AS cf
        |  FROM pd GROUP BY tok),
        |cap AS (SELECT tok, doc_id FROM (
        |    SELECT tok, doc_id, row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
        |    FROM pd) WHERE rn <= 20),
        |po AS (SELECT tok, array_to_string(list_transform(list_sort(list(doc_id)),
        |    x -> CAST(x AS VARCHAR)), ',') AS postings
        |  FROM cap GROUP BY tok)
        |SELECT tok, df, cf, postings FROM ag JOIN po USING (tok)
        |WHERE df >= 5 ORDER BY tok""".stripMargin,
    "range_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
        |ORDER BY click_id, purchase_id""".stripMargin,
    "range_join_auto" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
        |ORDER BY click_id, purchase_id""".stripMargin,
    "sessionize" ->
      """WITH o AS (SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pus
        |  FROM events),
        |m AS (SELECT user_id, event_id, ts,
        |    CASE WHEN pus IS NULL OR epoch_us(ts) - pus > 21600000000 THEN 1 ELSE 0 END AS st
        |  FROM o),
        |x AS (SELECT user_id, ts,
        |    CAST(sum(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts,
        |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 3) AS duration_sec
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "pack_sequences" ->
      s"""SELECT doc_id, lang, n_toks,
         |  CAST((cum - n_toks) // 512 AS BIGINT) AS pack_id,
         |  CAST((cum - n_toks) % 512 AS BIGINT) AS offset_in_pack
         |FROM (SELECT doc_id, lang, len($toks) AS n_toks,
         |        sum(len($toks)) OVER (PARTITION BY lang ORDER BY doc_id
         |                              ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "layout_compact" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tfidf_terms" ->
      """WITH e AS (SELECT source, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |tf AS (SELECT source, tok, count(*) AS tf FROM e GROUP BY source, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |ns AS (SELECT count(DISTINCT source) AS nsrc FROM documents),
        |sc AS (SELECT source, tok, tf, df,
        |    round(tf * ln(CAST(nsrc AS DOUBLE) / df), 4) AS tfidf
        |  FROM tf JOIN df USING (tok) CROSS JOIN ns)
        |SELECT source, tok, tf, df, tfidf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY tfidf DESC, tok) AS rn
        |  FROM sc)
        |WHERE rn <= 3 ORDER BY source, tok""".stripMargin,
    "decontaminate" ->
      s"""WITH bg AS (SELECT DISTINCT substr(md5(g), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS g FROM documents WHERE source = 'src0')),
         |tg AS (SELECT doc_id,
         |    list_distinct(list_transform(${duckShingles(8)}, g -> substr(md5(g), 1, 16))) AS ghs
         |  FROM documents WHERE source <> 'src0'),
         |h AS (SELECT doc_id, count(*) AS hits
         |  FROM (SELECT doc_id, unnest(ghs) AS gh FROM tg) JOIN bg USING (gh)
         |  GROUP BY doc_id)
         |SELECT t.doc_id AS doc_id,
         |  CAST(len(t.ghs) AS BIGINT) AS n_grams,
         |  CAST(coalesce(h.hits, 0) AS BIGINT) AS n_hits,
         |  round(coalesce(h.hits, 0) / len(t.ghs), 4) AS overlap_ratio,
         |  round(coalesce(h.hits, 0) / len(t.ghs), 4) >= 0.2 AS contaminated
         |FROM tg t LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin,
    "quality_gopher" ->
      s"""WITH g AS (SELECT doc_id, text, $toks AS tk, len($toks) AS n_words FROM documents)
         |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |  round((length(text) - n_words + 1) / n_words, 4) AS mean_word_len,
         |  round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t)))
         |    / n_words, 4) AS stop_frac,
         |  round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
         |    / length(text), 4) AS symbol_ratio,
         |  round(list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d))))
         |    / n_words, 4) AS max_tok_frac,
         |  (n_words >= 40
         |    AND round((length(text) - n_words + 1) / n_words, 4) BETWEEN 3.0 AND 8.0
         |    AND round(len(list_filter(tk, t -> list_contains(['the','a','and','of','to','in','is'], t))) / n_words, 4) >= 0.05
         |    AND round(list_max(list_transform(list_distinct(tk), d -> len(list_filter(tk, x -> x = d)))) / n_words, 4) <= 0.15
         |    AND round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / length(text), 4) <= 0.1
         |  ) AS passes
         |FROM g ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      """WITH k AS (SELECT doc_id, source,
        |    ln((list_sum(list_transform(range(1, 13),
        |      i -> (instr('0123456789abcdef', substring(
        |        md5(CAST(doc_id AS VARCHAR) || 'wsmp'), CAST(i AS INT), 1)) - 1)
        |        * 16 ** (12 - i))) + 1.0) / 281474976710657.0) / n_chars AS skeyraw
        |  FROM documents)
        |SELECT doc_id, source, round(skeyraw, 6) AS skey, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY skeyraw DESC, doc_id) AS rn FROM k)
        |WHERE rn <= 3 ORDER BY doc_id""".stripMargin,
    "sample_reservoir" ->
      """SELECT doc_id, source, rn FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || 'rsv'), doc_id) AS rn
        |  FROM documents) WHERE rn <= 3 ORDER BY doc_id""".stripMargin,
    "mix_epochs" ->
      s"""WITH t(lang, target_share) AS (VALUES
         |  ('en', CAST(0.30 AS DOUBLE)), ('de', CAST(0.20 AS DOUBLE)),
         |  ('es', CAST(0.20 AS DOUBLE)), ('fr', CAST(0.20 AS DOUBLE)),
         |  ('zh', CAST(0.10 AS DOUBLE))),
         |c AS (SELECT lang, CAST(sum(len($toks)) AS BIGINT) AS tokens
         |  FROM documents GROUP BY lang)
         |SELECT lang, tokens, target_share,
         |  CAST(round(200000 * target_share, 0) AS BIGINT) AS budget_tokens,
         |  round(200000 * target_share / tokens, 4) AS epochs,
         |  200000 * target_share / tokens > 1.0 AS repeats
         |FROM c JOIN t USING (lang) ORDER BY lang""".stripMargin,
    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $duckClusterCtes,
         |cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS csize FROM comp GROUP BY 1)
         |SELECT csize, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(csize * count(*) AS BIGINT) AS n_docs
         |FROM cs GROUP BY csize ORDER BY csize""".stripMargin,
    "mix_plan" ->
      """WITH t(lang, target_share) AS (VALUES
        |  ('en', CAST(0.30 AS DOUBLE)), ('de', CAST(0.20 AS DOUBLE)),
        |  ('es', CAST(0.20 AS DOUBLE)), ('fr', CAST(0.20 AS DOUBLE)),
        |  ('zh', CAST(0.10 AS DOUBLE))),
        |c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |tot AS (SELECT sum(n_docs) AS total FROM c)
        |SELECT lang, n_docs, round(n_docs / total, 4) AS share, target_share,
        |  round(least(CAST(1.0 AS DOUBLE), target_share / (n_docs / total)), 4) AS sample_rate
        |FROM c CROSS JOIN tot JOIN t USING (lang)
        |ORDER BY lang""".stripMargin,
    "embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |    greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS scale
        |  FROM e),
        |qd AS (SELECT vec_id, v, scale,
        |    list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT)) AS q
        |  FROM sc),
        |dd AS (SELECT vec_id, v, scale, q,
        |    list_transform(q, x -> x * scale) AS dq
        |  FROM qd)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
        |  round(list_dot_product(v, dq) /
        |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(dq, dq))), 4) AS cos_recon
        |FROM dd ORDER BY vec_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $duckNgramPairCtes
         |SELECT id_a, id_b, jac FROM ngpairs ORDER BY id_a, id_b""".stripMargin,
    "embed_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
         |s AS (SELECT query_id, corpus_id, $duckCos AS cos
         |      FROM c CROSS JOIN q WHERE query_id <> corpus_id)
         |SELECT query_id, corpus_id, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rank
         |  FROM s) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "embed_near_dup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings WHERE vec_id < 300)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_dot_product(a.v, b.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, i AS frame_no, md5(substring(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM documents,
        |  unnest(list_filter(range(0, CAST(ceil(length(text) / 64.0) AS INT)), i -> i % 2 = 0)) AS t(i)
        |ORDER BY doc_id, frame_no""".stripMargin,
    "multimodal_decode" ->
      """SELECT doc_id, md5(text) AS content_md5, length(text) AS content_bytes,
        |  (instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) / cast(15 as double) AS emb_0,
        |  (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) / cast(15 as double) AS emb_1,
        |  (instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) / cast(15 as double) AS emb_2,
        |  (instr('0123456789abcdef', substring(md5(text), 4, 1)) - 1) / cast(15 as double) AS emb_3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "embed_knn_lsh" -> duckKnnLshSql,
    "ann_recall" -> duckAnnRecallSql,
    "pii_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '[0-9]{4,}')) AS n_longnums,
        |  regexp_replace(
        |    regexp_replace(lower(text), '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{4,}', '<NUM>', 'g') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "embed_knn_ivf" -> duckKnnIvfSql,
    "embed_knn_ivf_nightly" -> duckKnnIvfNightlySql,
    "knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
         |s AS (SELECT query_id, corpus_id, $duckCos AS cos
         |      FROM c CROSS JOIN q WHERE query_id <> corpus_id),
         |knn AS (SELECT query_id, corpus_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rank
         |  FROM s) WHERE rank <= 5),
         |v AS (SELECT query_id, e.label AS nlabel, count(*) AS votes
         |      FROM knn JOIN embeddings e ON e.vec_id = corpus_id
         |      GROUP BY query_id, e.label),
         |w AS (SELECT query_id, nlabel, votes FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, nlabel) AS rn
         |  FROM v) WHERE rn = 1)
         |SELECT query_id, nlabel AS pred_label, votes, t.label AS true_label,
         |  nlabel = t.label AS correct
         |FROM w JOIN embeddings t ON t.vec_id = query_id
         |ORDER BY query_id""".stripMargin,
    "embed_label_centroids" ->
      """SELECT label, CAST(i AS INT) AS dim, count(*) AS n,
        |  round(avg(CAST(embedding AS DOUBLE[])[CAST(i + 1 AS INT)]), 6) AS centroid
        |FROM embeddings, unnest(range(0, len(embedding))) AS t(i)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "embed_near_dup_lsh" -> duckNearDupLshSql,
    "profile_table" ->
      """WITH w AS (SELECT count(*) AS total,
        |  count(l_quantity) AS c1, count(DISTINCT l_quantity) AS d1,
        |    round(min(l_quantity), 4) AS mn1, round(max(l_quantity), 4) AS mx1,
        |  count(l_extendedprice) AS c2, count(DISTINCT l_extendedprice) AS d2,
        |    round(min(l_extendedprice), 4) AS mn2, round(max(l_extendedprice), 4) AS mx2,
        |  count(l_discount) AS c3, count(DISTINCT l_discount) AS d3,
        |    round(min(l_discount), 4) AS mn3, round(max(l_discount), 4) AS mx3,
        |  count(l_tax) AS c4, count(DISTINCT l_tax) AS d4,
        |    round(min(l_tax), 4) AS mn4, round(max(l_tax), 4) AS mx4
        |  FROM lineitem)
        |SELECT 'l_quantity' AS "column", total - c1 AS nulls, c1 AS non_null,
        |  d1 AS distinct_vals, mn1 AS min_val, mx1 AS max_val FROM w
        |UNION ALL SELECT 'l_extendedprice', total - c2, c2, d2, mn2, mx2 FROM w
        |UNION ALL SELECT 'l_discount', total - c3, c3, d3, mn3, mx3 FROM w
        |UNION ALL SELECT 'l_tax', total - c4, c4, d4, mn4, mx4 FROM w
        |ORDER BY "column"""".stripMargin,
    "numeric_histogram" ->
      """SELECT bin, bin * 20000 AS lo, count(*) AS n
        |FROM (SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bin FROM orders)
        |GROUP BY bin ORDER BY bin""".stripMargin,
    "skew_salted_join" ->
      """SELECT c_mktsegment AS segment, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,
    "skew_histogram" ->
      """SELECT l_suppkey, count(*) AS n FROM lineitem
        |GROUP BY l_suppkey ORDER BY n DESC, l_suppkey LIMIT 20""".stripMargin,
    "pipeline_clean_corpus" ->
      s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |d AS (SELECT doc_id, lang, text, $toks AS tk FROM documents
         |      WHERE doc_id IN (SELECT doc_id FROM keep))
         |SELECT doc_id, lang, len(tk) AS n_words,
         |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) AS bpeish_tokens
         |FROM d
         |WHERE len(tk) >= 20 AND round(len(list_distinct(tk)) / len(tk), 4) >= 0.3
         |ORDER BY doc_id""".stripMargin,
  )

  /** Per-prefix full-union ledger oracle, shared verbatim by the
    * in-query chain and the persisted nightly form. */
  private lazy val duckLedgerChainSql: String =
    s"""WITH tk AS (SELECT doc_id, lower(text) AS text, source FROM documents),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ev1 AS (SELECT doc_id, text FROM tk WHERE source = 'src0'),
         |d1n AS (SELECT doc_id, text FROM tk
         |  WHERE source = 'src2' AND doc_id % 3 = 2),
         |d2n AS (SELECT doc_id, text FROM tk
         |  WHERE source = 'src3' AND doc_id % 3 = 0),
         |tr AS (SELECT doc_id, text FROM tk WHERE source <> 'src0'
         |  AND NOT (source = 'src2' AND doc_id % 3 = 2)
         |  AND NOT (source = 'src3' AND doc_id % 3 = 0)),
         |d1t AS (SELECT doc_id, text FROM d1n
         |  UNION ALL SELECT doc_id + 50000000, text FROM tr WHERE doc_id % 101 = 0),
         |gtr AS (SELECT doc_id,
         |    list_distinct(list_transform(${duckShingles(8)}, g -> substr(md5(g), 1, 16))) AS ghs
         |  FROM tr),
         |gtru AS MATERIALIZED (SELECT doc_id, unnest(ghs) AS gh FROM gtr),
         |g0 AS (SELECT DISTINCT substr(md5(g), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS g FROM ev1)),
         |g1 AS (SELECT DISTINCT substr(md5(g), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS g FROM d1t)),
         |g2 AS (SELECT DISTINCT substr(md5(g), 1, 16) AS gh
         |  FROM (SELECT unnest(${duckShingles(8)}) AS g FROM d2n)),
         |p0 AS (SELECT DISTINCT doc_id FROM gtru JOIN g0 USING (gh)),
         |p01 AS (SELECT DISTINCT doc_id FROM gtru
         |  JOIN (SELECT gh FROM g0 UNION SELECT gh FROM g1) USING (gh)),
         |p012 AS (SELECT DISTINCT doc_id FROM gtru
         |  JOIN (SELECT gh FROM g0 UNION SELECT gh FROM g1
         |        UNION SELECT gh FROM g2) USING (gh)),
         |vtr AS MATERIALIZED (SELECT t.doc_id, e.v FROM tr t JOIN e ON e.vec_id = t.doc_id),
         |v0 AS (SELECT e.v FROM ev1 x JOIN e ON e.vec_id = x.doc_id),
         |v1 AS (SELECT e.v FROM d1n x JOIN e ON e.vec_id = x.doc_id),
         |v2 AS (SELECT e.v FROM d2n x JOIN e ON e.vec_id = x.doc_id
         |  UNION ALL SELECT list_transform(t.v, x -> x * 2.0)
         |    FROM vtr t WHERE t.doc_id % 103 = 0),
         |c0 AS (SELECT t.doc_id, max(round(list_dot_product(t.v, u.v) /
         |    (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(u.v, u.v))), 4)) AS m
         |  FROM vtr t CROSS JOIN v0 u GROUP BY 1),
         |c01 AS (SELECT t.doc_id, max(round(list_dot_product(t.v, u.v) /
         |    (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(u.v, u.v))), 4)) AS m
         |  FROM vtr t CROSS JOIN (SELECT v FROM v0 UNION ALL SELECT v FROM v1) u
         |  GROUP BY 1),
         |c012 AS (SELECT t.doc_id, max(round(list_dot_product(t.v, u.v) /
         |    (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(u.v, u.v))), 4)) AS m
         |  FROM vtr t CROSS JOIN (SELECT v FROM v0 UNION ALL SELECT v FROM v1
         |                         UNION ALL SELECT v FROM v2) u
         |  GROUP BY 1)
         |SELECT tr.doc_id,
         |  ((p0.doc_id IS NOT NULL) OR coalesce(c0.m >= 0.9, false)) AS after_v1,
         |  ((p01.doc_id IS NOT NULL) OR coalesce(c01.m >= 0.9, false)) AS after_d1,
         |  ((p012.doc_id IS NOT NULL) OR coalesce(c012.m >= 0.9, false)) AS after_d2
         |FROM tr LEFT JOIN p0 USING (doc_id) LEFT JOIN p01 USING (doc_id)
         |  LEFT JOIN p012 USING (doc_id) LEFT JOIN c0 USING (doc_id)
         |  LEFT JOIN c01 USING (doc_id) LEFT JOIN c012 USING (doc_id)
         |ORDER BY doc_id""".stripMargin

  private def duckNearDupLshSql: String = {
    val bandSelects = (0 until LshBands).map(b =>
      s"SELECT vec_id, $b AS band_idx, ${duckBucket(b)} AS bk FROM e").mkString("\nUNION ALL\n")
    val cosAB =
      """round(list_dot_product(va.v, vb.v) /
        |    (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))), 4)""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |banded AS ($bandSelects),
       |capped AS (SELECT vec_id, band_idx, bk FROM (
       |    SELECT *, row_number() OVER (PARTITION BY band_idx, bk ORDER BY vec_id) AS rn
       |    FROM banded) WHERE rn <= $NearDupBucketCap),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM capped a JOIN capped b
       |           ON a.band_idx = b.band_idx AND a.bk = b.bk AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, $cosAB AS cos
       |FROM cand JOIN e va ON va.vec_id = id_a JOIN e vb ON vb.vec_id = id_b
       |WHERE $cosAB >= 0.35
       |ORDER BY id_a, id_b""".stripMargin
  }
}
