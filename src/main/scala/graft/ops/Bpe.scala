package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge learning (Sennrich et al. 2016) — the tokenizer-training
  * primitive of an LM data pipeline: count adjacent symbol pairs over
  * the corpus vocabulary (weighted by word frequency), merge the most
  * frequent pair everywhere, repeat.
  *
  * Scale shape: the corpus collapses to its VOCABULARY first (one
  * word-count shuffle — the classic trick: merge learning is linear in
  * distinct words, not corpus tokens); each round is then one
  * pair-count partial agg over vocab-sized data plus a 1-row best-pair
  * table broadcast back scan-side. The round count is a fixed small
  * parameter and the whole loop builds ONE declarative plan — no
  * per-round driver actions, no collect.
  *
  * Symbol sequences travel as `|`-delimited strings (`|l|o|w|`), and a
  * merge is a literal-string replace of `|a|b|` with `|ab|` applied
  * [[MergePasses]] times — replace() scans left-to-right non-overlapping
  * with IDENTICAL semantics in Spark and DuckDB, so every round
  * (including the merge application) is oracle-replayable. A run of the
  * same pair longer than 2·MergePasses symbols would need more passes
  * (bounded-run approximation, deterministic on both engines either
  * way; real text keeps same-pair runs short).
  */
object Bpe {

  val MergePasses = 3

  /** Initial vocabulary state: distinct words with corpus frequency and
    * the char-delimited symbol string. */
  private[ops] def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .withColumn("state",
        concat(lit("|"), array_join(
          expr("filter(split(w, ''), c -> c <> '')"), "|"), lit("|")))

  /** One merge round: (vocab with the merge applied, the 1-row chosen
    * pair (sym_a, sym_b, merged, cnt)). */
  private def mergeRound(v: DataFrame): (DataFrame, DataFrame) = {
    val pairCounts = v
      .withColumn("syms", expr("filter(split(state, '\\\\|'), x -> x <> '')"))
      .withColumn("pair", explode(expr(
        """CASE WHEN size(syms) < 2 THEN array()
          |ELSE transform(sequence(1, size(syms) - 1),
          |  i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))) END"""
          .stripMargin)))
      .groupBy("pair").agg(sum(col("f")).as("cnt"))
    val best = pairCounts
      .orderBy(col("cnt").desc, col("pair").asc).limit(1)
      .select(
        expr("split_part(pair, ' ', 1)").as("sym_a"),
        expr("split_part(pair, ' ', 2)").as("sym_b"),
        regexp_replace(col("pair"), " ", "").as("merged"),
        col("cnt"))
    val find = concat(lit("|"), col("sym_a"), lit("|"), col("sym_b"), lit("|"))
    val repl = concat(lit("|"), col("merged"), lit("|"))
    // LEFT join on a constant key (not crossJoin): a pairless round has an
    // EMPTY best table, and the merge apply must then pass the vocab
    // through unchanged — replace() over the null find-string nulls out,
    // and coalesce restores the untouched state.
    val applied = v.withColumn("_k", lit(1))
      .join(broadcast(best.withColumn("_k", lit(1))), Seq("_k"), "left")
      .withColumn("state",
        (1 to MergePasses).foldLeft(col("state")) { (s, _) =>
          coalesce(replace(s, find, repl), s)
        })
      .select("w", "f", "state")
    (applied, best)
  }

  /** The shared `rounds`-round loop: returns (final applied vocab, the
    * ordered merge list). Each round's vocab state feeds BOTH the next
    * pair count and the merge apply, so without a cut the plan doubles
    * per round (~2^rounds subplans); the tiny vocab table is
    * parquet-materialized between rounds instead, keeping plan size
    * linear in `rounds`. The final round's apply is left lazy (its vocab
    * input is already materialized). */
  private def runRounds(
      df: DataFrame, textCol: String, rounds: Int): (DataFrame, DataFrame) = {
    var v = vocab(df, textCol)
    var out: Option[DataFrame] = None
    var applied = v
    for (r <- 1 to rounds) {
      val (a, best) = mergeRound(v)
      applied = a
      val row = best.withColumn("round", lit(r))
        .select(col("round"), col("sym_a"), col("sym_b"), col("merged"), col("cnt"))
      out = Some(out.fold(row)(_.unionAll(row)))
      if (r < rounds) v = Materialize.index(applied, s"bpe-vocab-r$r")
    }
    (applied, out.get)
  }

  /** Learn `rounds` merges; returns (round, sym_a, sym_b, merged, cnt) —
    * the ordered merge list a tokenizer would persist. */
  def learnMerges(df: DataFrame, textCol: String, rounds: Int = 3): DataFrame =
    runRounds(df, textCol, rounds)._2

  /** BPE segmentation — the APPLY half of the tokenizer: run the learned
    * merges over the corpus vocabulary and emit each word's final symbol
    * sequence. Tokenizing a 100 TB corpus with a learned merge table is
    * this exact computation: per-word, on the deduplicated vocabulary
    * (linear in distinct words, not corpus tokens), then a broadcast
    * word→tokens join back onto the documents. */
  def segmentVocab(df: DataFrame, textCol: String, rounds: Int = 3): DataFrame = {
    val (applied, _) = runRounds(df, textCol, rounds)
    val syms = "filter(split(state, '\\\\|'), x -> x <> '')"
    applied.select(
      col("w"), col("f"),
      array_join(expr(syms), " ").as("segmented"),
      size(expr(syms)).cast("long").as("n_tokens"))
  }
}
