package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lightweight text classification for corpus filtering — the fastText-
  * style "train a cheap classifier on a labeled slice, score everything"
  * step of a training-data pipeline (quality filters, domain routers,
  * language filters all share this shape).
  *
  * Multinomial Naive Bayes with add-alpha smoothing is the deliberately
  * simple model: the whole model is THREE count tables (class priors,
  * class word totals, per-class word counts), each produced by one
  * partial-aggregated pass over the training slice and each bounded by
  * vocabulary × classes — broadcastable at any corpus scale. Scoring is
  * a scan-side broadcast join: no shuffle keyed on anything wider than
  * the document id.
  */
object Classify {

  /** Train multinomial NB on `trainFilter` rows (label = labelCol) and
    * score EVERY row: per document, the argmax class of
    * `log P(c) + Σ_w log((count_cw + α) / (total_c + α·V))`.
    *
    * Encoding: for each (doc, class), `score = prior_c
    * + Σ_matched log(count_cw + α) + (n_d − matched)·log α
    * − n_d·log(total_c + α·V)` — matched word-occurrences come from one
    * broadcast join against the (word, class) count table, unseen words
    * fall to the α floor arithmetically (no grid materialization). Ties
    * and cross-engine float noise are absorbed by rounding scores to 4
    * decimals before the argmax, lexicographic class as the tiebreak.
    *
    * Returns (idCol, labelCol, pred label, score, hit flag). */
  def naiveBayes(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      textCol: String,
      trainFilter: Column,
      alpha: Double = 0.5): DataFrame = {
    val words = s"split($textCol, ' ')"
    val train = df.filter(trainFilter)
    val trainWords = train.select(col(labelCol).as("cls"),
      explode(expr(words)).as("w"))

    // The model: three bounded count tables off one exploded pass.
    val cw = trainWords.groupBy("cls", "w")
      .agg(count(lit(1)).as("cw"))
    val tc = trainWords.groupBy("cls").agg(count(lit(1)).as("tc"))
    val nTrainDocs = train.count()
    val vocab = trainWords.select("w").distinct().count()
    val priors = train.groupBy(col(labelCol).as("cls"))
      .agg(log(count(lit(1)).cast("double") / nTrainDocs).as("prior"))
      .join(tc, "cls")

    // Matched-word partial sums per (doc, class): broadcast join, then a
    // doc-keyed aggregation — the only shuffle wider than the model.
    val docWords = df.select(col(idCol), explode(expr(words)).as("w"))
    val matched = docWords.join(broadcast(cw), Seq("w"))
      .groupBy(idCol, "cls")
      .agg(sum(log(col("cw") + alpha)).as("sm"), count(lit(1)).as("mn"))

    val scored = df
      .select(col(idCol), col(labelCol), size(expr(words)).cast("long").as("n_d"))
      .crossJoin(broadcast(priors))
      .join(matched, Seq(idCol, "cls"), "left")
      .withColumn("score", round(
        col("prior") + coalesce(col("sm"), lit(0.0)) +
          (col("n_d") - coalesce(col("mn"), lit(0L))) * math.log(alpha) -
          col("n_d") * log(col("tc") + lit(alpha) * vocab), 4))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("cls"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(labelCol),
        col("cls").as(s"pred_$labelCol"), col("score"),
        (col("cls") === col(labelCol)).as("hit"))
  }

  /** Linear quality classifier trained by distributed batch gradient
    * descent — the "train a cheap model on a trusted slice, score the
    * corpus" gate modern pipelines put in front of the tokenizer
    * (DCLM / FineWeb-Edu style), with every engine-forking float op
    * pinned so another engine replays the training bit-for-bit:
    *
    *  - the activation is the HARD sigmoid `clamp(0.5 + z/4, 0, 1)` —
    *    pure rational arithmetic. libm `exp()` differs across runtimes
    *    by ulps, and a weights-update loop COMPOUNDS an ulp per round;
    *    the piecewise-linear unit has no transcendental to fork on.
    *  - per-row gradient components round to 8 dp and sum as
    *    FIXED-POINT longs (the pageRank convention): the update is
    *    order-independent under partial-agg reordering.
    *  - weights round to 8 dp per round, so round r+1 starts from
    *    identical inputs in every engine.
    *
    * `feats` carries (idCol, x0..x{dims-1}, y ∈ {0,1}). Each round is
    * ONE partial-aggregated pass producing `dims` fixed-point sums (a
    * 1-row aggregate — the accepted driver touch, same class as the
    * bounds/stats collects); weights return to the plan as literals, so
    * scoring is scan-side codegen with no join at all. Returns every
    * row scored: (idCol, y, score, pred). */
  def logisticGd(
      feats: DataFrame,
      idCol: String,
      dims: Int,
      rounds: Int = 3,
      lr: Double = 0.5): DataFrame = {
    def round8(x: Double): Double =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = feats.count()
    val w = Array.fill(dims)(0.0)
    for (_ <- 1 to rounds) {
      val z = (0 until dims).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
      val p = greatest(lit(0.0), least(lit(1.0), lit(0.5) + z / lit(4.0)))
      val err = p - col("y")
      val gs = (0 until dims).map(j =>
        sum(round(round(err * col(s"x$j"), 8) * lit(1e8), 0).cast("long")).as(s"g$j"))
      val row = feats.agg(gs.head, gs.tail: _*).head()
      for (j <- 0 until dims)
        w(j) = round8(w(j) - lr * (row.getLong(j).toDouble / 1e8 / n))
    }
    val z = (0 until dims).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
    val p = greatest(lit(0.0), least(lit(1.0), lit(0.5) + z / lit(4.0)))
    feats.select(col(idCol), col("y"),
      round(p, 6).as("score"), (round(p, 6) >= 0.5).as("pred"))
  }

  /** Threshold sweep → the F1-optimal operating point: every DISTINCT
    * score is a candidate threshold (predict positive when
    * score ≥ threshold); precision/recall/F1 come from suffix-cumulative
    * integer counts over the score grid, and the argmax is a TakeOrdered
    * over that grid (highest F1, ties → lowest threshold).
    * Same bounded-window argument as [[aucEval]]: the sweep's input is
    * one row per distinct 6-dp score, never the corpus. tp/fp/fn are
    * exact suffix-cumulative longs; F1 = 2tp/(2tp+fp+fn) rounds to 6 dp
    * before the argmax so the comparison can't fork on an ulp. Returns
    * one row: (threshold, tp, fp, fn, precision, recall, f1). */
  def f1Sweep(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = scored.groupBy(col(scoreCol).as("sc"))
      .agg(
        sum(when(col(labelCol) === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col(labelCol) === 1.0, 0L).otherwise(1L)).as("nn"))
    val wSuffix = Window.orderBy(col("sc").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totPos = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pts = s
      .withColumn("tp", sum("np").over(wSuffix))
      .withColumn("fp", sum("nn").over(wSuffix))
      .withColumn("fn", sum("np").over(totPos) - col("tp"))
      .withColumn("f1", round(
        lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn")), 6))
    // the grid is bounded (one row per distinct 6-dp score), so the
    // argmax is a TakeOrdered over it — no self-join, single lineage
    pts
      .orderBy(col("f1").desc, col("sc").asc)
      .limit(1)
      .select(
        col("sc").as("threshold"),
        col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
        col("fn").cast("long").as("fn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6).as("precision"),
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6).as("recall"),
        col("f1"))
  }

  /** Calibration (reliability) bins: decile buckets of the score, each
    * reporting its doc count, mean score, and positive fraction — the
    * diagram that shows whether a gate's scores can be READ as
    * probabilities or only as a ranking. Mean scores accumulate as
    * fixed-point longs (scores are 6-dp by construction, so ×1e6 is
    * exact) — integer arithmetic to the final division, engine-exact.
    * One partial-agg pass; output is ≤ 10 rows at any scale. */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    scored
      .groupBy(least(floor(col(scoreCol) * 10), lit(9L)).cast("long").as("bin"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(round(col(scoreCol) * lit(1e6), 0).cast("long")).as("sfx"),
        sum(when(col(labelCol) === 1.0, 1L).otherwise(0L)).as("npos"))
      .select(col("bin"), col("n"),
        round(col("sfx").cast("double") / lit(1e6) / col("n"), 6).as("mean_score"),
        round(col("npos").cast("double") / col("n"), 6).as("frac_pos"))

  /** Exact ROC-AUC of a scored frame (Mann–Whitney U rank form) — the
    * evaluation step that decides whether a quality gate is worth its
    * threshold. AUC = (#correctly-ordered (pos, neg) pairs + ½·ties) /
    * (n_pos·n_neg), computed in INTEGER pair counts — no per-pair join,
    * no float accumulation, engine-exact to the final division.
    *
    * Scale shape: rows reduce to one row PER DISTINCT SCORE first
    * (partial-agg), and because scores are defensively rounded (6 dp in
    * [0, 1] → ≤ 10⁶ + 1 values), the cumulative window's input is
    * bounded BY CONSTRUCTION regardless of corpus size — a
    * single-partition window over a table that cannot grow past the
    * score grid. Returns one row: (auc, n_pos, n_neg). */
  def aucEval(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = scored.groupBy(col(scoreCol).as("sc"))
      .agg(
        sum(when(col(labelCol) === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col(labelCol) === 1.0, 0L).otherwise(1L)).as("nn"))
    val w = Window.orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.withColumn("cumnn", sum("nn").over(w) - col("nn"))
      .agg(
        sum(col("np") * col("cumnn")).as("wins"),
        sum(col("np") * col("nn")).as("ties"),
        sum("np").as("npos"), sum("nn").as("nneg"))
      .select(
        round((col("wins").cast("double") + lit(0.5) * col("ties").cast("double")) /
          (col("npos").cast("double") * col("nneg").cast("double")), 6).as("auc"),
        col("npos").cast("long").as("n_pos"),
        col("nneg").cast("long").as("n_neg"))
  }
}
