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
}
