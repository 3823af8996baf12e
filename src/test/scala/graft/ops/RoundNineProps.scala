package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pins for the round-9 operators against brute-force driver
  * computations: the interval sweep must agree with a per-microsecond
  * simulation on ANY random interval set, and KMV sketches must be
  * split-invariant (merge of per-slice sketches ≡ the full-data sketch,
  * for ANY split) with exact estimates below capacity. */
object RoundNineProps extends Properties("RoundNine") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkFixture.spark

  // ---------------------------------------------------------- intervals
  // random second-granularity intervals inside a 3-day window (so day
  // splits happen), including zero-length and duplicates
  private val DayUs = 86400000000L
  private val genIntervals: Gen[List[(Long, Long)]] = for {
    m <- Gen.choose(1, 25)
    es <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, 3L * 86400 - 1)
      len <- Gen.choose(0L, 90000L) // up to 25 h — spans ≥ 1 boundary often
    } yield (s * 1000000L, math.min((s + len), 3L * 86400) * 1000000L))
  } yield es

  property("dailyCoverage ≡ brute-force per-second sweep on any interval set") =
    forAll(genIntervals) { ivs =>
      import spark.implicits._
      val df = ivs.map { case (s, e) =>
        (new java.sql.Timestamp(s / 1000), new java.sql.Timestamp(e / 1000))
      }.toDF("s", "e")
      val got = Intervals.dailyCoverage(df, "s", "e").collect().map { r =>
        r.getAs[java.sql.Date]("day").toString ->
          (r.getAs[Long]("peak_concurrency"), r.getAs[Double]("covered_sec"),
            r.getAs[Long]("n_starts"))
      }.toMap
      // brute force: per-SECOND concurrency over each day's fragments
      val secs = ivs.map { case (s, e) => (s / 1000000L, e / 1000000L) }
      def dayName(day: Long) =
        java.time.Instant.ofEpochSecond(day * 86400).toString.take(10)
      val expect = (0L until 3L).flatMap { day =>
        val lo = day * 86400; val hi = lo + 86400
        val frags = secs.flatMap { case (s, e) =>
          val fs = math.max(s, lo); val fe = math.min(e, hi)
          if (fs < fe) Some((fs, fe)) else None
        }
        if (frags.isEmpty) None
        else {
          // diff-array sweep: delta at each second, prefix-sum = concurrency
          val diff = new Array[Int](86401)
          frags.foreach { case (s, e) =>
            diff((s - lo).toInt) += 1; diff((e - lo).toInt) -= 1
          }
          var c = 0; var covered = 0; var peak = 0
          var t = 0
          while (t < 86400) {
            c += diff(t)
            if (c > 0) covered += 1
            if (c > peak) peak = c
            t += 1
          }
          Some(dayName(day) -> (peak.toLong, covered.toDouble, frags.size.toLong))
        }
      }.toMap
      got == expect
    }

  // --------------------------------------------------------------- KMV
  private val genVals: Gen[(List[String], Int)] = for {
    n <- Gen.choose(1, 120)
    vs <- Gen.listOfN(n, Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty))
    cut <- Gen.choose(0, n)
  } yield (vs, cut)

  property("Kmv.merge(slice sketches) ≡ full-data sketch for ANY split; exact below k") =
    forAll(genVals) { case (vs, cut) =>
      import spark.implicits._
      val k = 16
      val (l, r) = vs.splitAt(cut)
      def df(xs: List[String]) = xs.map(("G", _)).toDF("g", "v")
      val full = Kmv.sketch(df(vs), "g", "v", k)
      val merged =
        if (l.isEmpty) Kmv.sketch(df(r), "g", "v", k)
        else if (r.isEmpty) Kmv.sketch(df(l), "g", "v", k)
        else Kmv.merge(Kmv.sketch(df(l), "g", "v", k),
          Kmv.sketch(df(r), "g", "v", k), "g", k)
      val fullSet = full.select("u").as[Double].collect().sorted.toSeq
      val mergedSet = merged.select("u").as[Double].collect().sorted.toSeq
      val est = Kmv.estimate(merged, "g", k).collect().head.getDouble(1)
      val distinct = vs.distinct.size
      val exactOk = distinct >= k || est == distinct.toDouble
      fullSet == mergedSet && exactOk
    }
}
