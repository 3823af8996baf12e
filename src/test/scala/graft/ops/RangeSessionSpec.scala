package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bucketed range join + gap sessionization semantics and plan shape. */
class RangeSessionSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  // ------------------------------------------------------------ range join
  private val ptSchema = StructType(Seq(
    StructField("pid", LongType), StructField("k", StringType),
    StructField("t", LongType)))
  private val ivSchema = StructType(Seq(
    StructField("iid", LongType), StructField("k", StringType),
    StructField("lo", LongType), StructField("hi", LongType)))

  test("bucketed range join equals the naive BETWEEN join, pair-exactly") {
    // deterministic pseudo-random layout: points and intervals scattered
    // across buckets, intervals spanning 0-3 bucket boundaries
    val pts = (0L until 200L).map(i => Row(i, s"k${i % 3}", (i * 37) % 1000))
    val ivs = (0L until 60L).map { i =>
      val lo = (i * 53) % 900
      Row(i, s"k${i % 3}", lo, lo + (i % 4) * 40)
    }
    val points = df(ptSchema, pts: _*)
    val intervals = df(ivSchema, ivs: _*)
    val got = RangeJoin
      .bucketedRangeJoin(points, intervals, "k", "t", "lo", "hi", bucketWidth = 64)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") && col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.sorted.toSeq shouldBe want.sorted.toSeq
    // and no pair duplicates (a point lives in exactly one bucket)
    got.length shouldBe got.toSet.size
  }

  test("boundary points match: t == lo and t == hi are inside") {
    val points = df(ptSchema, Row(1L, "a", 100L), Row(2L, "a", 200L), Row(3L, "a", 99L))
    val intervals = df(ivSchema, Row(10L, "a", 100L, 200L))
    val got = RangeJoin
      .bucketedRangeJoin(points, intervals, "k", "t", "lo", "hi", bucketWidth = 50)
      .select("pid").collect().map(_.getLong(0)).sorted
    got.toSeq shouldBe Seq(1L, 2L)
  }

  test("range join plans as an equi-join — no nested-loop/cartesian") {
    val points = df(ptSchema, Row(1L, "a", 100L))
    val intervals = df(ivSchema, Row(10L, "a", 50L, 150L))
    val plan = RangeJoin
      .bucketedRangeJoin(points, intervals, "k", "t", "lo", "hi", bucketWidth = 64)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  // --------------------------------------------------------- sessionization
  private val evSchema = StructType(Seq(
    StructField("eid", LongType), StructField("u", StringType),
    StructField("ts", TimestampType)))
  private def ev(eid: Long, u: String, sec: Long) =
    Row(eid, u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)))

  test("sessions split exactly at gaps > threshold; gap == threshold stays") {
    val events = df(evSchema,
      ev(1L, "u1", 0L), ev(2L, "u1", 100L),   // gap 100 <= 100 → same session
      ev(3L, "u1", 201L),                      // gap 101 > 100 → new session
      ev(4L, "u1", 250L),
      ev(5L, "u2", 0L))                        // other key independent
    val got = Sessionize.assign(events, "u", "ts", "eid", gapSeconds = 100)
      .select("eid", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L)
  }

  test("session rollup: bounds, counts, duration") {
    val events = df(evSchema,
      ev(1L, "u1", 0L), ev(2L, "u1", 50L), ev(3L, "u1", 1000L))
    val got = Sessionize.sessions(events, "u", "ts", "eid", gapSeconds = 100)
      .orderBy("session_idx").collect()
    got.length shouldBe 2
    got(0).getAs[Long]("n_events") shouldBe 2L
    got(0).getAs[Double]("duration_sec") shouldBe 50.0
    got(1).getAs[Long]("n_events") shouldBe 1L
    got(1).getAs[Double]("duration_sec") shouldBe 0.0
  }

  test("session paths: time-ordered type strings, bit-identical under repartition") {
    val pSchema = StructType(Seq(
      StructField("eid", LongType), StructField("u", StringType),
      StructField("ts", TimestampType), StructField("et", StringType)))
    def pe(eid: Long, u: String, sec: Long, et: String) =
      Row(eid, u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), et)
    val events = df(pSchema,
      pe(1L, "u1", 0L, "view"), pe(2L, "u1", 50L, "click"),
      pe(3L, "u1", 50L, "add"), // ts tie with eid 2 — eid breaks it
      pe(4L, "u1", 1000L, "buy"),
      pe(5L, "u2", 0L, "view"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sessionize.sessionPaths(d, "u", "ts", "eid", "et", gapSeconds = 100)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("dur_us"), r.getAs[String]("path")))
        .toMap
    val got = run(events)
    got(("u1", 0L)) shouldBe ((3L, 50000000L, "view>click>add"))
    got(("u1", 1L)) shouldBe ((1L, 0L, "buy"))
    got(("u2", 0L)) shouldBe ((1L, 0L, "view"))
    run(events.repartition(7)) shouldBe got // collect_list order can't leak
  }

  test("sessionize is one key shuffle (single Window partitioning)") {
    val events = df(evSchema, ev(1L, "u1", 0L), ev(2L, "u1", 10L))
    val plan = Sessionize.assign(events, "u", "ts", "eid", 100)
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\(u".r.findAllIn(plan).size shouldBe 1
  }

  // --------------------------------------------------------------- funnel
  test("funnelSteps: strict ordering — a purchase BEFORE the click does not count") {
    val fSchema = StructType(Seq(
      StructField("u", StringType), StructField("ts", TimestampType),
      StructField("et", StringType)))
    def fe(u: String, sec: Long, et: String) =
      Row(u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), et)
    val events = df(fSchema,
      // u1 completes the funnel in order
      fe("u1", 10L, "view"), fe("u1", 20L, "click"), fe("u1", 30L, "buy"),
      // u2: buy happens BEFORE its click — depth stops at 2
      fe("u2", 10L, "view"), fe("u2", 30L, "click"), fe("u2", 20L, "buy"),
      // u3: click with no prior view — depth 0 (strict prefix)
      fe("u3", 10L, "click"), fe("u3", 20L, "buy"),
      // u4: view only
      fe("u4", 10L, "view"))
    try {
      val got = Sessionize
        .funnelSteps(events, "u", "ts", "et", Seq("view", "click", "buy"))
        .collect()
        .map(r => r.getString(0) -> (
          Option(r.getAs[java.lang.Long]("t1")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t2")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t3")).map(_.toLong),
          r.getAs[Int]("steps_reached")))
        .toMap
      got("u1") shouldBe ((Some(10000000L), Some(20000000L), Some(30000000L), 3))
      got("u2") shouldBe ((Some(10000000L), Some(30000000L), None, 2))
      got("u3") shouldBe ((None, None, None, 0))
      got("u4") shouldBe ((Some(10000000L), None, None, 1))
    } finally Materialize.dropAll()
  }

  test("funnelSteps: same-timestamp step does not advance (strictly-after)") {
    val fSchema = StructType(Seq(
      StructField("u", StringType), StructField("ts", TimestampType),
      StructField("et", StringType)))
    def fe(u: String, sec: Long, et: String) =
      Row(u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), et)
    val events = df(fSchema, fe("u1", 10L, "view"), fe("u1", 10L, "click"))
    try {
      val r = Sessionize.funnelSteps(events, "u", "ts", "et", Seq("view", "click"))
        .collect().head
      r.getAs[Int]("steps_reached") shouldBe 1
      r.getAs[java.lang.Long]("t2") shouldBe null
    } finally Materialize.dropAll()
  }

  test("cohortRetention: first-week cohorts, exact offsets, per-week-deduped counts") {
    val cSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def ce(u: Long, iso: String) =
      Row(u, java.sql.Timestamp.from(java.time.Instant.parse(iso)))
    // 2026-01-05 is a Monday. user 1: joins that week, returns twice in
    // week+1 (must count once) and once in week+3; user 2: joins the same
    // week, never returns; user 3: joins week+1
    val ev = df(cSchema,
      ce(1L, "2026-01-06T10:00:00Z"), ce(1L, "2026-01-13T09:00:00Z"),
      ce(1L, "2026-01-14T12:00:00Z"), ce(1L, "2026-01-27T11:00:00Z"),
      ce(2L, "2026-01-07T11:00:00Z"),
      ce(3L, "2026-01-15T08:00:00Z"))
    val got = Sessionize.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe Map(
      ("2026-01-05", 0L) -> 2L, // users 1 and 2 join
      ("2026-01-05", 1L) -> 1L, // user 1 — two events, ONE active week
      ("2026-01-05", 3L) -> 1L, // user 1 again
      ("2026-01-12", 0L) -> 1L) // user 3's own cohort
  }

  test("rollingActive: trailing-window coverage, clipped to the observed range") {
    val cSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def ce(u: Long, iso: String) =
      Row(u, java.sql.Timestamp.from(java.time.Instant.parse(iso)))
    // u1 active Jan 1 (twice — same day dedups) and Jan 9; u2 active Jan 1.
    // Jan-1 actives cover report days 1-7; day 8 is covered by nobody
    // (absent, not zero); Jan-9 coverage clips at the max observed day.
    val ev = df(cSchema,
      ce(1L, "2026-01-01T10:00:00Z"), ce(1L, "2026-01-01T11:00:00Z"),
      ce(1L, "2026-01-09T12:00:00Z"),
      ce(2L, "2026-01-01T09:00:00Z"))
    val got = Sessionize.rollingActive(ev, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val expected =
      (1 to 7).map(d => f"2026-01-0$d" -> 2L).toMap + ("2026-01-09" -> 1L)
    got shouldBe expected
  }

  test("ewma anomaly: half-life weights, first-day null history, spike flagged") {
    val aSchema = StructType(Seq(
      StructField("et", StringType), StructField("ts", TimestampType)))
    def day(d: Int, n: Int): Seq[Row] = (1 to n).map(_ =>
      Row("a", java.sql.Timestamp.valueOf(f"2026-03-0$d 10:00:00")))
    // day1: 2 events, day2: 2, day3: 12 → ewma_prev(d3) = (2·1 + 2·0.5)/1.5 = 2.0
    val events = df(aSchema, (day(1, 2) ++ day(2, 2) ++ day(3, 12)): _*)
    val got = Sessionize.ewmaAnomaly(events, "et", "ts")
      .orderBy("day").collect()
    got.length shouldBe 3
    got(0).isNullAt(3) shouldBe true            // no history
    got(0).getAs[Boolean]("is_spike") shouldBe false
    got(1).getAs[Double]("ewma_prev") shouldBe 2.0
    got(1).getAs[Double]("ratio") shouldBe 1.0
    got(1).getAs[Boolean]("is_spike") shouldBe false
    got(2).getAs[Double]("ewma_prev") shouldBe 2.0
    got(2).getAs[Double]("ratio") shouldBe 6.0
    got(2).getAs[Boolean]("is_spike") shouldBe true
    Materialize.dropAll()
  }
}
