package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for the BPE loop's bounded-run approximation
  * ([[Bpe.MergePasses]]): a merge is a literal `|a|b|`→`|ab|` replace
  * applied MergePasses times, so a run of the same pair longer than
  * 2·MergePasses symbols is deliberately left partially merged that
  * round. The property replays the EXACT construct chain (pair count
  * weighted by word frequency, argmax by (cnt desc, pair asc), bounded
  * left-to-right non-overlapping replace, pairless-round pass-through)
  * as a pure-Scala model and pins Spark to it on adversarial inputs —
  * including same-char runs well past 2·MergePasses and all-single-
  * symbol vocabularies (the pairless edge). `replace()` is left-to-right
  * non-overlapping with identical semantics in Java, Spark and DuckDB,
  * so agreement with the model IS agreement with the oracle's unrolled
  * CTE chain (`PipelineQueries.duckBpeCtes`). */
object BpeProps extends Properties("Bpe") {

  // each case drives full Spark rounds incl. parquet vocab cuts — a few
  // adversarial worlds beat many cheap ones
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkFixture.spark

  private val Rounds = 3

  // ---- pure-Scala model of the engine/oracle construct chain ----

  private case class VState(w: String, f: Long, state: String)

  private def initState(w: String): String =
    "|" + w.map(_.toString).mkString("|") + "|"

  private def pairsOf(state: String): Seq[String] = {
    val syms = state.split("\\|").filter(_.nonEmpty)
    if (syms.length < 2) Nil
    else syms.sliding(2).map(a => a(0) + " " + a(1)).toSeq
  }

  private def modelRound(vs: Seq[VState])
      : (Seq[VState], Option[(String, String, String, Long)]) = {
    val counts = vs.flatMap(v => pairsOf(v.state).map(_ -> v.f))
      .groupMapReduce(_._1)(_._2)(_ + _)
    if (counts.isEmpty) (vs, None)
    else {
      val (bestPair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val Array(a, b) = bestPair.split(" ")
      val merged = a + b
      val (find, repl) = (s"|$a|$b|", s"|$merged|")
      val applied = vs.map(v => v.copy(state =
        (1 to Bpe.MergePasses).foldLeft(v.state)((s, _) => s.replace(find, repl))))
      (applied, Some((a, b, merged, cnt)))
    }
  }

  private def modelRun(words: Seq[String])
      : (Seq[VState], Seq[(Int, String, String, String, Long)]) = {
    var vs = words.groupBy(identity).toSeq
      .map { case (w, occ) => VState(w, occ.length.toLong, initState(w)) }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to Rounds) {
      val (next, best) = modelRound(vs)
      vs = next
      best.foreach { case (a, b, m, c) => merges += ((r, a, b, m, c)) }
    }
    (vs, merges.result())
  }

  // ---- adversarial corpus generator ----

  private val genWord: Gen[String] = Gen.frequency(
    // same-char runs PAST 2·MergePasses: the bounded-run case itself
    4 -> Gen.choose(2 * Bpe.MergePasses + 2, 2 * Bpe.MergePasses + 8)
      .map("a" * _),
    3 -> (for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString),
    // single-symbol words: drives the pairless-round pass-through when
    // they make up the whole vocabulary
    2 -> Gen.oneOf("a", "b"))

  private val genCorpus: Gen[List[String]] = for {
    n <- Gen.choose(1, 7)
    ws <- Gen.listOfN(n, genWord)
  } yield ws

  // ---- the pin ----

  property("merge list and segmentation match the model on bounded runs") =
    forAll(genCorpus) { words =>
      import spark.implicits._
      val df = words.toDF("text")
      val (modelStates, modelMerges) = modelRun(words)

      val merges = Bpe.learnMerges(df, "text", Rounds)
        .orderBy("round")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
        .toSeq
      Materialize.dropAll()

      val seg = Bpe.segmentVocab(df, "text", Rounds)
        .orderBy("w")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSeq
      Materialize.dropAll()

      val modelSeg = modelStates.sortBy(_.w).map { v =>
        (v.w, v.f, v.state.split("\\|").filter(_.nonEmpty).mkString(" "))
      }
      merges == modelMerges && seg == modelSeg
    }
}
