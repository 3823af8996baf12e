package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's event timeline into sessions at
  * inactivity gaps — the classic gap-based definition (a new session
  * starts when the time since the previous event exceeds `gap`).
  *
  * Encoding: one window pass per key — `lag` marks session starts, a
  * running sum of the marks numbers them. Cost at any scale: ONE hash
  * shuffle on the key + per-partition sort (both window functions share
  * the same window frame, so Catalyst plans a single Window operator).
  * The streaming twin (mapGroupsWithState with a gap timeout) lives in
  * [[graft.streaming.EventStreams]]; this is the backfill path over the
  * archive, same session definition.
  */
object Sessionize {

  /** Assign `session_idx` (0-based per key, in time order) to every event.
    * Ties on the timestamp break deterministically by `idCol`. */
  def assign(
      events: DataFrame,
      key: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(idCol))
    // micros throughout: portable (DuckDB epoch_us) and exact-integer
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isStart = when(
      prev.isNull ||
        unix_micros(col(tsCol)) - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_idx",
        sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }

  /** Per-session rollup: bounds, event count, duration. */
  def sessions(
      events: DataFrame,
      key: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long): DataFrame =
    assign(events, key, tsCol, idCol, gapSeconds)
      .groupBy(col(key), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))
      .withColumn("duration_sec",
        round((unix_micros(col("end_ts")) - unix_micros(col("start_ts"))) / 1e6, 3))

  /** Per-session event-type path — the "user journey" assembly that
    * turns an event log into sequence training data (next-action
    * models, funnel mining). collect_list is order-nondeterministic
    * under parallel merge, so the path sorts (ts, id) STRUCTS after
    * collection — total order, engine-reproducible. Same single
    * key-shuffle ledger as [[sessions]]: the groupBy reuses the
    * window's hash partitioning on the key. */
  def sessionPaths(
      events: DataFrame,
      key: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      gapSeconds: Long): DataFrame =
    assign(events, key, tsCol, idCol, gapSeconds)
      .groupBy(col(key), col("session_idx"))
      .agg(
        count(lit(1)).cast("long").as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("dur_us"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              unix_micros(col(tsCol)).as("t"),
              col(idCol).as("i"),
              col(typeCol).as("e")))),
            x => x.getField("e")),
          ">").as("path"))

  /** Ordered funnel analysis: for each key, the earliest time it reached
    * step k STRICTLY AFTER its step-k-1 time (the classic conversion
    * funnel — a purchase before the click doesn't count). `steps_reached`
    * counts the consecutive prefix completed; once a step is missing,
    * later stages can't match (their `t > prev` predicate is null-safe
    * false), so the depth is well-defined.
    *
    * Scale shape: the skinny (key, t, type) stream materializes once;
    * each step is a filtered partial-aggregated min keyed on the funnel
    * key, LEFT-joined back — |steps| bounded shuffles all on the SAME
    * key (exchange-reusable), no windows, no per-key event arrays.
    * Returns (key, t1..tN micros, steps_reached). */
  def funnelSteps(
      events: DataFrame,
      key: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    val keyed = Materialize.index(
      events.select(col(key), unix_micros(col(tsCol)).as("t"),
        col(typeCol).as("et")),
      "funnel-events")
    var acc = keyed.select(col(key)).distinct()
    var prev: Option[String] = None
    steps.zipWithIndex.foreach { case (step, i) =>
      val cname = s"t${i + 1}"
      val cand = prev match {
        case None =>
          keyed.filter(col("et") === step)
            .groupBy(key).agg(min("t").as(cname))
        case Some(p) =>
          keyed.filter(col("et") === step)
            .join(acc.select(col(key), col(p)), key)
            .filter(col("t") > col(p)) // null prev → no match, by design
            .groupBy(key).agg(min("t").as(cname))
      }
      acc = acc.join(cand, Seq(key), "left")
      prev = Some(cname)
    }
    acc.withColumn("steps_reached",
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Rolling `windowDays`-day active keys per day (the WAU/N-day-active
    * series): for each day in the observed range, how many distinct keys
    * had ≥ 1 event in the trailing window ending that day.
    *
    * Scale shape: a sliding COUNT DISTINCT is the classic trap (a
    * window-function form would re-scan each day's trailing events and
    * still need per-frame distinct state). Instead the stream reduces to
    * DISTINCT (key, day) first — bounded by keys · days regardless of
    * event volume — then each active day COVERS the `windowDays` report
    * days it contributes to via a bounded explode (×7, not ×events), a
    * second distinct collapses multi-active keys per report day, and the
    * count is a plain partial-agg groupBy. Report days clip to the
    * observed [min, max] day range (1-row broadcast bound), so trailing
    * partial windows don't emit. */
  def rollingActive(
      events: DataFrame,
      key: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    val days = events
      .select(col(key), to_date(col(tsCol)).as("day"))
      .distinct()
    val bounds = days.agg(min("day").as("lo"), max("day").as("hi"))
    days
      .select(col(key),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"), col("day"))
      .select(col(key), date_add(col("day"), col("off")).as("rday"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .filter(col("rday").between(col("lo"), col("hi")))
      .groupBy(col("rday").as("day"))
      .agg(count(lit(1)).cast("long").as("active_keys"))
  }

  /** Weekly cohort retention: keys grouped by the week (Monday-truncated)
    * of their FIRST event; cell (cohort_week, week_offset) counts how
    * many of that cohort's keys were active `week_offset` weeks after
    * joining — the classic retention triangle.
    *
    * Scale shape: the event stream reduces immediately to DISTINCT
    * (key, week) — at most 52·|keys| rows/year no matter the event
    * volume; the cohort week is a per-key partial-aggregated min; the
    * join back is on the key (exchange-reusable with the distinct's
    * hash partitioning), and the final cell aggregate's output is
    * |weeks|² rows. `n_users` is a plain count: rows are already
    * distinct per (key, week), so no count-distinct shuffle is needed.
    * Both week columns are exact 7-day multiples apart, so the offset
    * division is exact in any engine. */
  def cohortRetention(events: DataFrame, key: String, tsCol: String): DataFrame = {
    val weeks = events
      .select(col(key), date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .distinct()
    val cohorts = weeks.groupBy(key).agg(min("wk").as("cohort_week"))
    weeks.join(cohorts, key)
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).cast("long").as("n_users"))
  }

  /** EWMA spike detection over the per-(type, day) event-count series —
    * the volume-anomaly monitor an ingest pipeline runs before trusting
    * a day's data. Each day's count is compared against the
    * exponentially-weighted mean of the PREVIOUS `trailingDays` days
    * (half-life decay: yesterday weighs 1, the day before 0.5, …).
    *
    * Engine-exactness by construction: the raw stream first reduces to
    * per-(type, day) counts — bounded by calendar × type cardinality,
    * not event volume — and every EWMA term is count·2^−k, a dyadic
    * rational; with counts < 2^33 and k ≤ 20 the weighted sum needs at
    * most 33 + 19 + 1 ≤ 53 mantissa bits, so it is EXACT in double (no
    * summation-order ulp to defend against) and the only rounding is
    * the final display round. (Past ~8.6e9 events per (type, day) the
    * sum would go inexact and the cross-engine guarantee would need the
    * fixed-point-long treatment instead.) The trailing window
    * runs as a bounded self-join on the small daily table (fan-out ≤
    * trailingDays), not a window over the event stream; days with no
    * events are absent (missing, not zero) and calendar distance still
    * drives the decay.
    *
    * Returns (etype, day, cnt, ewma_prev, ratio, is_spike); the first
    * day of a type has no history → null ewma/ratio, is_spike false. */
  def ewmaAnomaly(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      trailingDays: Int = 20,
      spikeFactor: Double = 3.0): DataFrame = {
    val daily = Materialize.index(
      events.select(col(typeCol).as("etype"), to_date(col(tsCol)).as("day"))
        .groupBy("etype", "day").agg(count(lit(1)).as("cnt")),
      "ewma-daily")
    val hist = daily.select(col("etype"), col("day").as("hday"), col("cnt").as("hcnt"))
    val w = pow(lit(0.5), datediff(col("day"), col("hday")) - 1)
    val ew = daily.join(hist, "etype")
      .filter(datediff(col("day"), col("hday")).between(1, trailingDays))
      .groupBy("etype", "day")
      .agg(round(sum(col("hcnt") * w) / sum(w), 4).as("ewma_prev"))
    daily.join(ew, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"), col("cnt"), col("ewma_prev"),
        round(col("cnt") / col("ewma_prev"), 4).as("ratio"),
        coalesce(round(col("cnt") / col("ewma_prev"), 4) > lit(spikeFactor),
          lit(false)).as("is_spike"))
  }
}
