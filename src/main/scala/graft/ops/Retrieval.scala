package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval primitives — the search half of a training-data
  * pipeline (quality-biased sampling pulls the docs most similar to a
  * trusted seed set; eval-set mining pulls the docs matching a probe
  * query): Okapi BM25 scoring against a fixed term set, and the
  * capped inverted-index build that serves it at scale.
  */
object Retrieval {

  /** Okapi BM25 (Robertson et al.) of every document against a fixed
    * bag of query `terms`; top-`topK` docs by rounded score.
    *
    * Scale shape: the query terms broadcast onto the token stream and
    * prune it SCAN-SIDE (the per-doc token explode never leaves the map
    * stage for non-query terms); tf is a partial-agg groupBy on
    * (doc, term) — |terms| · |docs| worst case, not corpus tokens; df
    * and the (N, avgdl) stats are tiny broadcasts back onto it. The
    * final top-k is a TakeOrdered, no global sort. Tie-break is on the
    * ROUNDED score then doc id, so the cut is engine-reproducible.
    *
    * All double arithmetic is written in the exact operation order the
    * DuckDB oracle uses (constants pre-cast to double) so scores match
    * bit-for-bit before the defensive round. */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val termTab = terms.toDF("tok")
    val base = docs.select(col(idCol), split(lower(col(textCol)), " ").as("toks"))
    val dl = base.select(col(idCol), size(col("toks")).cast("long").as("dl"))
    val tf = base.select(col(idCol), explode(col("toks")).as("tok"))
      .join(broadcast(termTab), "tok")
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    bm25Score(tf, dl, idCol, k1, b, topK)
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Ponte & Croft '98;
    * Zhai & Lafferty '01) — the language-modeling alternative to
    * [[bm25]], scoring each document by the log-probability its unigram
    * LM assigns the query:
    *
    *   score(d) = Σ_q ln( (tf(q,d) + μ·P(q|C)) / (dl(d) + μ) )
    *
    * with P(q|C) = corpus term frequency. Because the smoothing term is
    * nonzero for every query word, a doc missing a term is penalized,
    * not zeroed — the property that makes QL robust for quality-biased
    * sampling probes. Every doc scores on ALL query terms (the missing
    * ones via the μ·P(q|C)/(dl+μ) floor), so the per-doc sum folds the
    * absent-term contribution in closed form rather than left-joining
    * the full doc × term grid.
    *
    * Scale shape mirrors [[bm25]]: terms broadcast and prune the token
    * stream scan-side; corpus term stats are |terms| rows; the
    * missing-term fold needs only (dl, per-doc present terms) — one
    * partial-agg groupBy — and the final cut is a TakeOrdered on the
    * rounded score with id tie-break. */
  def queryLikelihood(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      mu: Double = 2000.0,
      topK: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val termTab = terms.toDF("tok")
    val base = docs.select(col(idCol), split(lower(col(textCol)), " ").as("toks"))
    val dl = base.select(col(idCol), size(col("toks")).cast("long").as("dl"))
    val toks = base.select(col(idCol), explode(col("toks")).as("tok"))
    val corpusTokens = dl.agg(sum("dl").as("ct"))
    // corpus probability of each query term (left join keeps zero-count
    // probes at P=0 — they contribute a constant to every doc and are
    // dropped from the fold to keep ln() finite: ln of the pure floor)
    val cstat = broadcast(termTab
      .join(toks.groupBy("tok").agg(count(lit(1)).as("cf")), Seq("tok"), "left")
      .crossJoin(corpusTokens)
      .select(col("tok"),
        (coalesce(col("cf"), lit(0L)).cast("double") / col("ct")).as("pc"))
      .filter(col("pc") > 0)) // a zero-corpus-count probe term would put
                              // ln(0) into every doc equally — drop it
    val qstats = cstat.agg(
      sum(log(col("pc") * lit(mu))).as("lp_all"), // Σ_q ln(μ·P(q|C)), floor numerators
      count(lit(1)).as("nq"))
    val tf = toks.join(broadcast(termTab), "tok")
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    // present terms: ln(tf + μ·pc) − the floor ln(μ·pc) it replaces
    val present = tf.join(cstat, "tok")
      .withColumn("delta",
        log(col("tf") + lit(mu) * col("pc")) - log(lit(mu) * col("pc")))
      .groupBy(idCol).agg(sum("delta").as("dsum"))
    val scored = dl
      .join(present, Seq(idCol), "left")
      .crossJoin(broadcast(qstats))
      .select(col(idCol), col("dl"),
        round(coalesce(col("dsum"), lit(0.0)) + col("lp_all") -
          col("nq") * log(col("dl") + lit(mu)), 4).as("score"))
    scored.orderBy(col("score").desc, col(idCol)).limit(topK)
  }

  /** Full (UNCAPPED) postings + doc-length tables — the index layout that
    * serves [[bm25FromIndex]] without touching the raw text again. At
    * lake scale both land in parquet partitioned large (postings carries
    * one row per distinct (term, doc), doclens one per doc), and the
    * probe-time read is a pushed `tok IN (...)` scan, so a query touches
    * only its terms' row groups — the whole point of an inverted index. */
  def postingsIndex(docs: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol), split(lower(col(textCol)), " ").as("toks"))
    val postings = base.select(col(idCol), explode(col("toks")).as("tok"))
      .groupBy("tok", idCol).agg(count(lit(1)).as("tf"))
    val doclens = base.select(col(idCol), size(col("toks")).cast("long").as("dl"))
    (postings, doclens)
  }

  /** Monoid merge of two [[postingsIndex]] builds — incremental index
    * maintenance: yesterday's index plus today's delta batch combine by
    * re-aggregating (term, doc) rows, WITHOUT touching yesterday's raw
    * text. Both tables are commutative-monoid encoded (tf and dl sum),
    * so merge order and batch granularity don't matter: daily deltas,
    * hourly deltas, or a full rebuild all land on the identical index,
    * and [[bm25FromIndex]] scores from the merged index are bit-equal
    * to a from-scratch build. For a REVISED document, anti-join its id
    * out of the old index first (delete + re-insert); for append-only
    * corpora — the training-data lake case — the merge is the whole
    * maintenance story. Cost: one partial-agg shuffle over the DELTA
    * plus the touched old rows, not the corpus. */
  def mergeIndex(
      a: (DataFrame, DataFrame),
      b: (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    val idc = a._1.columns.filterNot(Set("tok", "tf")).head
    val posts = a._1.unionAll(b._1)
      .groupBy("tok", idc).agg(sum("tf").as("tf"))
    val lens = a._2.unionAll(b._2)
      .groupBy(idc).agg(sum("dl").as("dl"))
    (posts, lens)
  }

  /** Okapi BM25 served FROM a [[postingsIndex]] instead of re-tokenizing
    * the corpus: term selection is a literal `isin` filter that pushes
    * into the postings scan (parquet reads only matching row groups —
    * assert `PushedFilters: [In(tok, ...)]` in the plan), df comes from
    * the filtered postings (exact — the index is uncapped), and the
    * scoring arithmetic is the SAME code path as [[bm25]], so both agree
    * to the bit. */
  def bm25FromIndex(
      postings: DataFrame,
      doclens: DataFrame,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val tf = postings.filter(col("tok").isin(terms: _*))
    bm25Score(tf, doclens, idCol, k1, b, topK)
  }

  /** Shared BM25 scoring core over a (doc, term, tf) stream and a doc
    * length table: df/(N,avgdl) reduce to tiny broadcasts back onto the
    * term-pruned tf stream; the final top-k is a TakeOrdered on the
    * rounded score with an id tiebreak, no global sort. Per-term weights
    * are rounded to 6 dp and summed as FIXED-POINT longs (the
    * [[Cluster.pageRank]] convention) — the per-doc score is integer
    * arithmetic, immune to partial-agg reordering in either engine. */
  private def bm25Score(
      tf: DataFrame,
      dl: DataFrame,
      idCol: String,
      k1: Double,
      b: Double,
      topK: Int): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("wfx",
        round(round(col("w"), 6) * lit(1e6), 0).cast("long"))
      .groupBy(col(idCol))
      .agg(
        round(sum("wfx").cast("double") / lit(1e6), 4).as("score"),
        count(lit(1)).cast("long").as("n_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Inverted-index build: per term, document frequency, collection
    * frequency, and a postings list CAPPED at the first `cap` doc ids
    * (a champion list). Terms under `minDf` are dropped.
    *
    * Scale shape: the cap is applied by a TWO-PHASE row_number BEFORE any
    * list materializes (the [[Curation.domainQuota]] pattern) — a
    * stop-word appearing in every document never funnels df ≈ corpus
    * rows through one window task: phase 1 caps per (term, input
    * partition), so the global per-term window reads ≤ cap · partitions
    * survivors, and `collect_list` only ever sees ≤ cap rows per term.
    * df/cf come from the same (term, doc) partial agg the cap reads.
    * Postings travel as a comma-joined string — the engine-neutral wire
    * form. */
  def invertedIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 5L,
      cap: Int = 20): DataFrame = {
    val perDoc = docs
      .select(explode(split(lower(col(textCol)), " ")).as("tok"), col(idCol))
      .groupBy("tok", idCol).agg(count(lit(1)).as("c"))
    val agg = perDoc.groupBy("tok").agg(
      count(lit(1)).cast("long").as("df"),
      sum("c").cast("long").as("cf"))
    val capped = championCap(championPrecap(perDoc, idCol, cap), idCol, cap)
    val posts = capped.groupBy("tok").agg(
      array_join(transform(sort_array(collect_list(col(idCol))),
        (x: Column) => x.cast("string")), ",").as("postings"))
    agg.join(posts, "tok")
      .filter(col("df") >= minDf)
      .select("tok", "df", "cf", "postings")
      .orderBy("tok")
  }

  /** Phase 1 of the champion cap: keep, per (term, INPUT partition), the
    * `cap` lowest doc ids — [[topKPerKeyPhase1]] with the term key. */
  private[ops] def championPrecap(perDoc: DataFrame, idCol: String, cap: Int): DataFrame =
    topKPerKeyPhase1(perDoc, Seq("tok"), Seq(col(idCol).asc), cap)

  /** Phase 2: the exact global first-`cap` per term, over phase 1's
    * bounded survivor set. */
  private[ops] def championCap(precapped: DataFrame, idCol: String, cap: Int): DataFrame =
    topKPerKeyPhase2(precapped, Seq("tok"), Seq(col(idCol).asc), cap).drop("rank")

  /** Exact per-key top-`k` in the given `order` WITHOUT a data-sized
    * window partition — the generalized two-phase champion pattern
    * ([[Curation.domainQuota]] lineage). Any row in a key's global
    * top-`k` is also in the top-`k` of whatever input partition it sits
    * in, so phase 1's per-(key, partition) window — whose partition key
    * spreads a hot key over the whole shuffle — provably keeps a
    * superset, bounded at k · partitions rows per key, and phase 2's
    * exact global window only ever reads that bounded survivor set. A
    * key matching the entire corpus (a stop-word query term, a
    * celebrity join key) costs the same as any other. Appends `rank`
    * (1-based long, in `order`). */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame =
    topKPerKeyPhase2(topKPerKeyPhase1(df, keys, order, k), keys, order, k)

  private[ops] def topKPerKeyPhase1(
      df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("_pid", spark_partition_id())
      .withColumn("_lrk", row_number().over(
        Window.partitionBy((keys.map(col) :+ col("_pid")): _*).orderBy(order: _*)))
      .filter(col("_lrk") <= k)
      .drop("_pid", "_lrk")

  private[ops] def topKPerKeyPhase2(
      df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rank", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order: _*)).cast("long"))
      .filter(col("rank") <= k)

  /** Batched multi-query BM25 from a [[postingsIndex]]: every query's
    * top-`topK` docs in ONE pass over the postings — the shape that
    * serves an eval-mining or seed-expansion batch of thousands of
    * probes without thousands of corpus scans.
    *
    * Scale shape: the whole query batch is a small (query_id, tok)
    * dimension that BROADCASTS onto the term-filtered postings stream
    * (the scan reads only probed terms' row groups, as in
    * [[bm25FromIndex]]); df comes from the same filtered stream
    * per-term, NOT per-query. The per-query cut is [[topKPerKey]], so a
    * stop-wordy probe whose candidate set is the whole corpus never
    * funnels through one window task. Scoring arithmetic is the same
    * operation order as [[bm25]]/[[bm25Score]], bit-replayable by the
    * oracle. */
  def bm25Batch(
      postings: DataFrame,
      doclens: DataFrame,
      idCol: String,
      queryTerms: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 5): DataFrame = {
    val probeToks = queryTerms.select("tok").distinct()
    val tf = postings.join(broadcast(probeToks), "tok")
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = doclens.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val scored = tf
      .join(broadcast(queryTerms), "tok")
      .join(broadcast(dfreq), "tok")
      .join(doclens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("wfx",
        round(round(col("w"), 6) * lit(1e6), 0).cast("long"))
      .groupBy(col("query_id"), col(idCol))
      .agg(
        round(sum("wfx").cast("double") / lit(1e6), 4).as("score"),
        count(lit(1)).cast("long").as("n_terms"))
    topKPerKey(scored, Seq("query_id"), Seq(col("score").desc, col(idCol).asc), topK)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    * lists — the standard hybrid-retrieval combiner (sparse BM25 +
    * dense ANN): each list contributes `1/(k0 + rank)` for the docs it
    * ranked, fused docs sort by the summed contribution.
    *
    * Inputs carry (`idCol`, `rank`); ranks need not be dense or
    * bounded. Contributions are rounded to 6 dp and lifted to
    * fixed-point longs before the sum (the [[Cluster.pageRank]]
    * convention), so the fusion score is exact integer arithmetic —
    * order-independent and engine-reproducible regardless of how many
    * lists fuse. Cost: the inputs are top-k lists (k rows each), so the
    * union + groupBy is trivially small at any corpus scale. */
  def rrfFuse(
      ranked: Seq[DataFrame],
      idCol: String,
      k0: Int = 60,
      topK: Int = 10): DataFrame = {
    val contribs = ranked
      .map(_.select(col(idCol),
        round(round(lit(1.0) / (lit(k0) + col("rank")), 6) * lit(1e6), 0)
          .cast("long").as("cfx")))
      .reduce(_ unionAll _)
    contribs.groupBy(idCol)
      .agg(
        round(sum("cfx").cast("double") / lit(1e6), 6).as("rrf"),
        count(lit(1)).cast("long").as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }

  /** Pseudo-relevance feedback (Rocchio-style query expansion, the
    * classic PRF loop): seed query → BM25 top `fbDocs` — assumed
    * relevant — → their top `fbTerms` TF-IDF terms (seed terms
    * excluded) join the query → one re-retrieval. The retrieval-side
    * vocabulary-mismatch fix: a query for "table" also surfaces docs
    * that say "relation" if the feedback docs do.
    *
    * Everything stays declarative off the postings index: round 1 is
    * [[bm25FromIndex]]'s pushed `tok IN` scan; candidate terms come
    * from fbDocs' postings rows (bounded by a handful of docs'
    * vocabularies) with df looked up by a term semi-join — never a full
    * vocabulary aggregation at query time; the expansion top-k is a
    * TakeOrdered over fixed-point (tf·idf) sums (deterministic under
    * ties by term); the expanded term set is a ~(seed+fbTerms)-row
    * broadcast feeding the same [[bm25Score]] core — no collect, the
    * expansion terms never touch the driver.
    *
    * Returns round-2's (idCol, score, n_terms) top `topK`. */
  def bm25Prf(
      postings: DataFrame,
      doclens: DataFrame,
      idCol: String,
      seed: Seq[String],
      fbDocs: Int = 3,
      fbTerms: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val topDocs = bm25FromIndex(postings, doclens, idCol, seed, k1, b, fbDocs)
      .select(col(idCol))
    val n1 = broadcast(doclens.agg(count(lit(1)).as("n")))
    val cand = postings.join(topDocs, idCol)
      .filter(!col("tok").isin(seed: _*))
    val dfCand = postings
      .join(cand.select("tok").distinct(), "tok")
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val expansion = cand
      .join(dfCand, "tok")
      .crossJoin(n1)
      .withColumn("idf",
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("twfx",
        round(round(col("tf") * col("idf"), 6) * lit(1e6), 0).cast("long"))
      .groupBy("tok").agg(sum("twfx").as("tw"))
      .orderBy(col("tw").desc, col("tok"))
      .limit(fbTerms)
    val terms2 = seed.toDF("tok").union(expansion.select("tok"))
    val tf2 = postings.join(broadcast(terms2), "tok")
    bm25Score(tf2, doclens, idCol, k1, b, topK)
  }
}
