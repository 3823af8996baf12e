package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single most recent
  * right row with the same key and `right.ts <= left.ts`.
  *
  * Spark has no native as-of join, and the two obvious encodings both die
  * at scale: a range-inequality join plans as BroadcastNestedLoop (row-pair
  * explosion), and a per-left-row correlated subquery re-scans the right
  * side. This is the union-and-carry encoding instead — tag both sides,
  * union them, sort each key's timeline once, and carry the latest right
  * payload forward with `last(ignoreNulls)` over a running window:
  *
  *   cost = ONE hash shuffle of (|left| + |right|) rows on the key plus a
  *   per-partition sort — the same shape as a sort-merge join, no pair
  *   explosion, and a skewed key is ordinary window skew (AQE-visible),
  *   not a quadratic bucket.
  *
  * DuckDB ships this natively as `ASOF JOIN` (which is what the oracle
  * query uses); Flink calls it a temporal join; kdb calls it `aj`.
  *
  * Tie semantics: at-or-before — a right row at exactly `left.ts` matches
  * (right rows sort before left rows at equal timestamps). Among right
  * rows the match is the max-timestamp row; (key, ts) pairs should be
  * unique on the right for full determinism (the same precondition
  * DuckDB's ASOF has).
  */
object AsOf {

  /** Left as-of join. Right columns named in `rightPayload` (plus the
    * right timestamp) are appended to every left row under `suffix`;
    * left rows with no preceding right row keep them null.
    *
    * `left` and `right` must both carry `key` and `ts` columns; the right
    * payload is carried atomically (one struct per right row), so all
    * `_r` columns always come from the SAME matched row. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[String],
      suffix: String = "_r"): DataFrame = {
    val payload = (ts +: rightPayload.filterNot(_ == ts)).distinct
    val payStruct = struct(payload.map(c => col(c).as(c)): _*)
    val payType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ord", col(ts))
      .withColumn("_side", lit(1))
      .withColumn("_rpay", lit(null).cast(payType))
    // NULL right timestamps never match in ASOF semantics (DuckDB's ASOF —
    // the oracle — compares ts <= probe, false for NULL). Unfiltered they'd
    // sort FIRST (asc = nulls first) carrying a non-null payload, becoming
    // the "match" for every left row that precedes any real right row.
    // Left NULL-ts rows need no symmetric filter: they sort before every
    // non-null right row, so the running last() has nothing to carry and
    // they get the defined no-match (null payload).
    val r = right
      .filter(col(ts).isNotNull)
      .select(
        col(key) +:
          leftCols.filterNot(Set(key, ts)).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) :+
          col(ts).as(ts) :+            // right ts doubles as the sort position
          lit(0).as("_side") :+
          payStruct.as("_rpay"): _*)
      .withColumn("_ord", col(ts))

    // Right rows sort before left rows at equal _ord (side 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row. The
    // running last() carries the newest right struct forward in time.
    val w = Window.partitionBy(key)
      .orderBy(col("_ord").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("_rpay"), ignoreNulls = true).over(w).as("_match")

    l.unionByName(r.select(l.columns.map(col): _*))
      .select(col("*"), carried)
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("_match").getField(c).as(s"$c$suffix")): _*)
  }

  /** [[asofJoin]] with a staleness bound — pandas `merge_asof`'s
    * `tolerance`: a carried match older than `toleranceUs` microseconds
    * is treated as NO match (payload nulled), so a sensor that went
    * silent hours ago doesn't keep "matching" every later probe. Same
    * single-shuffle cost: the bound is a scan-side conditional on the
    * already-carried payload, in microseconds so the cutoff can't fork
    * on sub-second timestamps. */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[String],
      toleranceUs: Long,
      suffix: String = "_r"): DataFrame = {
    val joined = asofJoin(left, right, key, ts, rightPayload, suffix)
    val payload = (ts +: rightPayload.filterNot(_ == ts)).distinct
    val fresh = unix_micros(col(ts)) - unix_micros(col(s"$ts$suffix")) <= toleranceUs
    payload.foldLeft(joined) { (d, c) =>
      d.withColumn(s"$c$suffix", when(fresh, col(s"$c$suffix")))
    }
  }

  /** NEAREST-in-time join: for every left row, the right row with the
    * smallest |Δt| in EITHER direction — the sensor-alignment semantics
    * when "most recent before" is the wrong default (a reading 1 ms
    * later beats one an hour earlier). Ties (equal backward and forward
    * distance, including the exact-equal case) resolve BACKWARD, the
    * industry ASOF convention.
    *
    * Built as two [[asofJoin]] passes — the normal backward carry, and a
    * forward pass running the SAME union-and-carry on negated
    * microsecond ordinals (so "first at-or-after" is "last at-or-before"
    * of the reversed axis; no new window machinery) — stitched by
    * `leftIdCol`, a unique left row id. Cost: two key-shuffle sorts plus
    * one id-keyed join; still no range-join pair explosion.
    *
    * Returns left columns + per-direction payloads under `_bk`/`_fw`
    * + (`near_<ts>`, nearest payload under `suffix`, `direction`,
    * `delta_us`). */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      leftIdCol: String,
      rightPayload: Seq[String],
      suffix: String = "_n"): DataFrame = {
    val payload = (ts +: rightPayload.filterNot(_ == ts)).distinct
    // The stitch emits fixed working/output names; a left frame already
    // carrying one of them would silently shadow or ambiguate rather
    // than error — refuse up front with the offending names spelled out.
    val reserved = Seq("direction", "delta_us", "_nts", "_nts_pay") ++
      payload.flatMap(c => Seq(s"${c}_bk", s"${c}_fw", s"$c$suffix"))
    val collisions = left.columns.filter(reserved.contains)
    require(collisions.isEmpty,
      s"asofNearest reserved column collision on left frame: ${collisions.mkString(", ")} " +
        s"— rename them or choose a different suffix")
    require(left.columns.contains(leftIdCol),
      s"asofNearest: leftIdCol '$leftIdCol' not in left frame")
    val back = asofJoin(left, right, key, ts, rightPayload, "_bk")
    // forward = backward over the time-reversed axis: negated µs ordinal
    val lN = left.withColumn("_nts", -unix_micros(col(ts)))
    val rN = right.withColumn("_nts", -unix_micros(col(ts)))
    val fwd = asofJoin(
      lN.drop(ts), rN.drop(ts).withColumnRenamed("_nts", "_nts_pay")
        .withColumn("_nts", col("_nts_pay")),
      key, "_nts", rightPayload :+ "_nts_pay", "_fw")
      .select(col(leftIdCol) +:
        (("_nts_pay" +: rightPayload).map(c => col(s"${c}_fw"))): _*)
    val db = unix_micros(col(ts)) - unix_micros(col(s"${ts}_bk"))
    val df_ = -col("_nts_pay_fw") - unix_micros(col(ts))
    val pickBack = col("_nts_pay_fw").isNull ||
      (col(s"${ts}_bk").isNotNull && db <= df_)
    val stitched = back.join(fwd, Seq(leftIdCol), "left")
    val withNearest = payload.foldLeft(stitched) { (d, c) =>
      val fwdCol =
        if (c == ts) timestamp_micros(-col("_nts_pay_fw"))
        else col(s"${c}_fw")
      d.withColumn(s"$c$suffix", when(pickBack, col(s"${c}_bk")).otherwise(fwdCol))
    }
    withNearest
      .withColumn("direction",
        when(col(s"$ts$suffix").isNull, lit(null).cast("string"))
          .when(pickBack, lit("backward")).otherwise(lit("forward")))
      .withColumn("delta_us",
        when(col(s"$ts$suffix").isNull, lit(null).cast("long"))
          .when(pickBack, db).otherwise(df_))
      .drop("_nts_pay_fw")
  }
}
