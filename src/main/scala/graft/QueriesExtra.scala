package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third query batch: breadth across the delegated scalar/date/set-op
  * surface (SURVEY.md §2.8, §2.7) — everything the reference hands to
  * stock Drill, re-checked against DuckDB here. */
object QueriesExtra {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Date/time functions on order dates: parts, truncation, diff. */
  def dateFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("oyear"),
        month(col("o_orderdate")).cast("long").as("omonth"),
        dayofmonth(col("o_orderdate")).cast("long").as("oday"),
        date_trunc("month", col("o_orderdate")).as("omonth_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"))
      .orderBy("o_orderkey")

  /** More string functions: replace, lpad, trim variants, position,
    * repeat, reverse, left/right slices. */
  def stringFunctions2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "a", "@").as("subst"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        substring(col("p_name"), 1, 5).as("left5"),
        reverse(col("p_type")).as("rev_type"),
        instr(col("p_name"), "o").cast("long").as("first_o"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** HAVING-style post-aggregation filter. */
  def havingFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("lines"))
      .filter(col("lines") >= 20)
      .orderBy("l_suppkey")

  /** EXCEPT set operation: customers that never ordered via priority '1-URGENT'. */
  def exceptOp(s: SparkSession, dir: String): DataFrame = {
    val all = t(s, dir, "customer").select(col("c_custkey").as("ck"))
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority").startsWith("1"))
      .select(col("o_custkey").as("ck"))
    all.except(urgent).orderBy("ck")
  }

  /** Exact DECIMAL arithmetic end-to-end (§2.8 + the reference's
    * scaffolded-but-unshipped decimal38, `DynamoRecordReader.java:26-39`):
    * cast at the scan, multiply (scale grows 2→4), aggregate, compare
    * exactly — no float rounding on either engine. Final casts pin
    * precision AND scale so both engines render identical digits. */
  def decimalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        col("l_discount").cast("decimal(4,2)").as("disc"))
      .groupBy("l_returnflag")
      .agg(
        // Final projection renders the decimals as strings: the driver's
        // compare reads the two sides through different clients, and a
        // wide DECIMAL that one client keeps exact ('…8990') and the other
        // narrows to float64 ('…899') hash-mismatches on trailing zeros
        // (CORRECTNESS_r04). Text of a decimal is exact on both engines;
        // the aggregation itself still runs in decimal arithmetic.
        sum(col("price")).cast("decimal(38,2)").cast("string").as("sum_price"),
        sum(col("price") * (lit(1) - col("disc"))).cast("decimal(38,4)").cast("string").as("sum_disc_price"),
        max(col("price")).cast("decimal(38,2)").cast("string").as("max_price"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** Array functions (§2.8 "array"): split, size, contains, sort+join,
    * 1-based element access. Outputs are scalars (joined strings), not
    * array columns, so the oracle compare stays value-exact. */
  def arrayFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
      .select(
        col("p_partkey"),
        size(col("words")).cast("long").as("n_words"),
        array_contains(col("words"), "green").as("has_green"),
        array_join(sort_array(col("words")), "_").as("sorted_joined"),
        element_at(col("words"), 1).as("first_word"))
      .orderBy("p_partkey")

  /** JSON functions (§2.8 "json"): build a JSON document from row values
    * identically on both engines, then extract present and missing paths. */
  def jsonFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        concat(lit("{\"key\":"), col("o_orderkey"),
          lit(",\"priority\":\""), col("o_orderpriority"), lit("\"}")).as("j"))
      .select(
        col("o_orderkey"),
        get_json_object(col("j"), "$.key").as("jkey"),
        get_json_object(col("j"), "$.priority").as("jpriority"),
        get_json_object(col("j"), "$.missing").as("jmissing"))
      .orderBy("o_orderkey")

  /** collect_list aggregation (§2.4): per-group gathered values, sorted
    * for determinism and joined to a scalar for exact compare. */
  def aggCollect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("lines"),
        count(lit(1)).as("n"))
      .orderBy("l_orderkey")

  /** Exact percentiles per group (§2.4): Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation definition but order
    * the arithmetic differently, so a non-dyadic fraction (0.9) over
    * doubles can flip the last ulp. Dyadic fractions (.25/.5/.75) over
    * integer data make both formulas exact — bit-identical by
    * construction. */
  def percentileAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        round(min("l_extendedprice"), 2).as("pmin"),
        round(max("l_extendedprice"), 2).as("pmax"))
      .orderBy("l_returnflag")

  /** UNPIVOT / melt (§2.7-adjacent reshaping): wide columns to (metric,
    * value) rows. */
  def unpivotOp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        col("o_custkey").cast("double").as("cust"))
      .unpivot(Array(col("o_orderkey")), Array(col("price"), col("cust")), "metric", "val")
      .orderBy("o_orderkey", "metric")

  /** Tumbling time-window aggregation (§2.5/streaming-adjacent batch
    * form): Spark's `window()` vs DuckDB's `time_bucket` — both
    * epoch-aligned hour buckets. */
  def windowTumbling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("bucket"), col("n"), col("sum_value"))
      .orderBy("bucket")

  /** Rank-distribution window functions (ntile / percent_rank /
    * cume_dist) — the analytic trio the §2.5 battery didn't yet cover;
    * partitions are per-nation customer sets (bounded by the dimension,
    * never data-sized). */
  def windowNtile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .filter(col("c_custkey") % 10 === 0) // thin the output, keep full ranks
      .orderBy("c_custkey")
  }

  /** LIKE / pattern filters (recognized but residual in the reference's
    * pushdown map — here they run native). */
  def likeFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").like("%e%") && !col("p_type").like("%C%"))
      .select("p_partkey", "p_name", "p_type")
      .orderBy("p_partkey")

  /** Pivot-style conditional aggregation: revenue per linestatus spread
    * into columns (expressed as CASE sums so the oracle is portable). */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(sum(when(col("l_linestatus") === "F", col("l_extendedprice"))
          .otherwise(lit(0.0))), 2).as("rev_f"),
        round(sum(when(col("l_linestatus") === "O", col("l_extendedprice"))
          .otherwise(lit(0.0))), 2).as("rev_o"))
      .orderBy("l_returnflag")

  /** Conditional/null functions: nullif, greatest/least, coalesce chain. */
  def nullFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_nationkey").cast("long"), lit(10L)).as("nk_cap"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or"))
      .orderBy("c_custkey")

  /** Math functions with stable rounding. */
  def mathFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .select(
        col("s_suppkey"),
        round(sqrt(abs(col("s_acctbal"))), 4).as("sqrt_bal"),
        round(pow(col("s_suppkey").cast("double"), 2.0), 1).as("key_sq"),
        round(exp(col("s_suppkey").cast("double") / 1000), 6).as("exp_k"),
        floor(col("s_acctbal")).cast("long").as("bal_floor"),
        ceil(col("s_acctbal")).cast("long").as("bal_ceil"))
      .orderBy("s_suppkey")

  /** CUBE grouping sets (SQL surface, like rollup_counts — the
    * DataFrame-API variant trips Spark 4's DetectAmbiguousSelfJoin on
    * join outputs). */
  def cubeCounts(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").as("c")
      .join(broadcast(t(s, dir, "nation")).as("n"), col("c.c_nationkey") === col("n.n_nationkey"))
      .join(broadcast(t(s, dir, "region")).as("r"), col("n.n_regionkey") === col("r.r_regionkey"))
      .select(col("r.r_name").as("r_name"), col("n.n_name").as("n_name"),
        col("c.c_acctbal").as("c_acctbal"))
      .createOrReplaceTempView("graft_cube_base")
    s.sql(
      """SELECT coalesce(r_name, '*') AS region, coalesce(n_name, '*') AS nation,
        |  count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM graft_cube_base GROUP BY CUBE (r_name, n_name)
        |ORDER BY region, nation""".stripMargin)
  }

  /** Explicit GROUPING SETS: per-region, per-segment, and grand total in
    * one pass. */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").as("c")
      .join(broadcast(t(s, dir, "nation")).as("n"), col("c.c_nationkey") === col("n.n_nationkey"))
      .join(broadcast(t(s, dir, "region")).as("r"), col("n.n_regionkey") === col("r.r_regionkey"))
      .select(col("r.r_name").as("r_name"), col("c.c_mktsegment").as("seg"))
      .createOrReplaceTempView("graft_gsets_base")
    s.sql(
      """SELECT coalesce(r_name, '*') AS region, coalesce(seg, '*') AS segment,
        |  count(*) AS n
        |FROM graft_gsets_base
        |GROUP BY GROUPING SETS ((r_name), (seg), ())
        |ORDER BY region, segment""".stripMargin)
  }

  /** Bloom-filter semi-join reduction: customers with an urgent order,
    * probed through `graft_bloom_agg`/`graft_might_contain` (the engine's
    * runtime-filter expressions, exposed as SQL) before the exact semi
    * join. The bloom is a scalar subquery — one small-side aggregation
    * broadcast to every scan task — so at 100 TB the big side discards
    * non-matching rows AT THE SCAN, and the shuffle only carries probable
    * matches; the IN semi-join then removes bloom false positives, making
    * the result exact (hence SQL-oracle-checkable). */
  def bloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    t(s, dir, "customer").createOrReplaceTempView("graft_bloom_cust")
    t(s, dir, "orders").createOrReplaceTempView("graft_bloom_ord")
    s.sql(
      """SELECT c_custkey, c_name FROM graft_bloom_cust
        |WHERE graft_might_contain(
        |    (SELECT graft_bloom_agg(xxhash64(o_custkey))
        |     FROM graft_bloom_ord WHERE o_orderpriority = '1-URGENT'),
        |    xxhash64(c_custkey))
        |  AND c_custkey IN (SELECT o_custkey FROM graft_bloom_ord
        |                    WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Offset window functions: previous/next order per customer. */
  def windowLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t(s, dir, "orders")
      .withColumn("prev_price", round(lag("o_totalprice", 1).over(w), 2))
      .withColumn("next_orderkey", lead("o_orderkey", 1).over(w))
      .select("o_custkey", "o_orderkey", "prev_price", "next_orderkey")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** As-of join ([[graft.ops.AsOf]]): attribute every click to the most
    * recent at-or-before error of the same user — one key shuffle + sort,
    * no range-join pair explosion. The oracle is DuckDB's native
    * `ASOF LEFT JOIN`, so the operator's tie/miss semantics are pinned to
    * the industry-standard definition. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    graft.ops.AsOf.asofJoin(clicks, errors,
        key = "user_id", ts = "ts", rightPayload = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("ts_r").as("err_ts"), col("event_id_r").as("err_event_id"))
      .orderBy("event_id")
  }

  /** [[asofJoin]] with a 1-hour staleness tolerance
    * ([[graft.ops.AsOf.asofJoinTolerance]]): an error older than an hour
    * no longer explains a click — pandas merge_asof `tolerance`
    * semantics, microsecond-exact cutoff. */
  def asofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    graft.ops.AsOf.asofJoinTolerance(clicks, errors,
        key = "user_id", ts = "ts", rightPayload = Seq("event_id"),
        toleranceUs = 3600L * 1000000L)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("ts_r").as("err_ts"), col("event_id_r").as("err_event_id"))
      .orderBy("event_id")
  }

  /** Nearest-in-time join ([[graft.ops.AsOf.asofNearest]]): every click
    * paired with the error whose timestamp is CLOSEST in either
    * direction (ties backward) — the sensor-alignment semantics where
    * "most recent before" is the wrong default. The oracle runs BOTH
    * DuckDB ASOF directions and replays the pick, pinning the tie and
    * null rules to the native operator pair. */
  def asofNearestQ(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    graft.ops.AsOf.asofNearest(clicks, errors,
        key = "user_id", ts = "ts", leftIdCol = "event_id",
        rightPayload = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("ts_n").as("near_ts"), col("event_id_n").as("near_event_id"),
        col("direction"), col("delta_us"))
      .orderBy("event_id")
  }

  /** Per-user session rollup over [[graft.ops.Sessionize.sessions]]:
    * session count, bounce rate (single-event sessions), mean duration —
    * the engagement summary an events store serves daily. One extra
    * partial-agg groupBy on the session table (already user-keyed). */
  def sessionStats(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.sessions(t(s, dir, "events"),
        key = "user_id", tsCol = "ts", idCol = "event_id", gapSeconds = 21600)
      .groupBy("user_id")
      .agg(
        count(lit(1)).cast("long").as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"),
        // integer half-up rounding of the mean duration (the
        // events_gap_fill convention): a plain round(avg, 4) can land on
        // an exact .00005 half where the engines' rounding modes fork
        sum(round(col("duration_sec") * lit(1000.0)).cast("long")).as("_sm"),
        max(col("n_events")).cast("long").as("max_events"))
      .withColumn("avg_duration_sec",
        expr("(2 * _sm * 10 + n_sessions) div (2 * n_sessions)")
          .cast("double") / lit(10000.0))
      .withColumn("bounce_rate",
        round(col("n_bounces").cast("double") / col("n_sessions"), 4))
      .select("user_id", "n_sessions", "n_bounces", "avg_duration_sec",
        "max_events", "bounce_rate")
      .orderBy("user_id")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_nearest" -> (asofNearestQ _),
    "session_stats" -> (sessionStats _),
    "asof_join" -> (asofJoin _),
    "asof_tolerance" -> (asofTolerance _),
    "cube_counts" -> (cubeCounts _),
    "grouping_sets" -> (groupingSets _),
    "window_lead_lag" -> (windowLeadLag _),
    "date_functions" -> (dateFunctions _),
    "string_functions2" -> (stringFunctions2 _),
    "having_filter" -> (havingFilter _),
    "except_op" -> (exceptOp _),
    "like_filter" -> (likeFilter _),
    "pivot_status" -> (pivotStatus _),
    "null_functions" -> (nullFunctions _),
    "math_functions" -> (mathFunctions _),
    "decimal_agg" -> (decimalAgg _),
    "bloom_semi_join" -> (bloomSemiJoin _),
    "array_functions" -> (arrayFunctions _),
    "json_functions" -> (jsonFunctions _),
    "agg_collect" -> (aggCollect _),
    "percentile_agg" -> (percentileAgg _),
    "unpivot_op" -> (unpivotOp _),
    "window_tumbling" -> (windowTumbling _),
    "window_ntile" -> (windowNtile _),
  )

  val oracles: Map[String, String] = Map(
    "asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'),
        |b AS (SELECT c.event_id, e.ts AS bts, e.event_id AS bid
        |  FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts >= e.ts),
        |f AS (SELECT c.event_id, e.ts AS fts, e.event_id AS fid
        |  FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts <= e.ts),
        |j AS (SELECT c.event_id, c.user_id, c.ts, bts, bid, fts, fid,
        |    (fts IS NULL OR (bts IS NOT NULL AND
        |      epoch_us(c.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(c.ts)))
        |      AS pick_back
        |  FROM c JOIN b USING (event_id) JOIN f USING (event_id))
        |SELECT event_id, user_id, ts,
        |  CASE WHEN pick_back THEN bts ELSE fts END AS near_ts,
        |  CASE WHEN pick_back THEN bid ELSE fid END AS near_event_id,
        |  CASE WHEN (CASE WHEN pick_back THEN bts ELSE fts END) IS NULL THEN NULL
        |    WHEN pick_back THEN 'backward' ELSE 'forward' END AS direction,
        |  CASE WHEN (CASE WHEN pick_back THEN bts ELSE fts END) IS NULL THEN NULL
        |    WHEN pick_back THEN epoch_us(ts) - epoch_us(bts)
        |    ELSE epoch_us(fts) - epoch_us(ts) END AS delta_us
        |FROM j ORDER BY event_id""".stripMargin,
    "session_stats" ->
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
        |sess AS (SELECT user_id, session_idx, count(*) AS n_events,
        |    round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 3) AS duration_sec
        |  FROM x GROUP BY user_id, session_idx)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  CAST((2 * sum(CAST(round(duration_sec * 1000.0, 0) AS BIGINT)) * 10 + count(*))
        |    // (2 * count(*)) AS DOUBLE) / 10000.0 AS avg_duration_sec,
        |  CAST(max(n_events) AS BIGINT) AS max_events,
        |  round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS bounce_rate
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "asof_join" ->
      """SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
        |  e.ts AS err_ts, e.event_id AS err_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY event_id""".stripMargin,
    "asof_tolerance" ->
      """SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
        |  CASE WHEN epoch_us(c.ts) - epoch_us(e.ts) <= 3600000000 THEN e.ts END
        |    AS err_ts,
        |  CASE WHEN epoch_us(c.ts) - epoch_us(e.ts) <= 3600000000 THEN e.event_id END
        |    AS err_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY event_id""".stripMargin,
    "cube_counts" ->
      """SELECT coalesce(r_name, '*') AS region, coalesce(n_name, '*') AS nation,
        |  count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "grouping_sets" ->
      """SELECT coalesce(r_name, '*') AS region, coalesce(c_mktsegment, '*') AS segment,
        |  count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
        |ORDER BY region, segment""".stripMargin,
    "window_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
        |  lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS next_orderkey
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "date_functions" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS oyear, month(o_orderdate) AS omonth,
        |  dayofmonth(o_orderdate) AS oday,
        |  date_trunc('month', o_orderdate) AS omonth_start,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "string_functions2" ->
      """SELECT p_partkey,
        |  replace(p_name, 'a', '@') AS subst,
        |  lpad(p_brand, 12, '_') AS padded,
        |  substr(p_name, 1, 5) AS left5,
        |  reverse(p_type) AS rev_type,
        |  instr(p_name, 'o') AS first_o,
        |  concat_ws('/', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "having_filter" ->
      """SELECT l_suppkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS lines
        |FROM lineitem GROUP BY l_suppkey HAVING count(*) >= 20
        |ORDER BY l_suppkey""".stripMargin,
    "except_op" ->
      """SELECT c_custkey AS ck FROM customer
        |EXCEPT
        |SELECT o_custkey AS ck FROM orders WHERE o_orderpriority LIKE '1%'
        |ORDER BY ck""".stripMargin,
    "like_filter" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%e%' AND p_type NOT LIKE '%C%'
        |ORDER BY p_partkey""".stripMargin,
    "pivot_status" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0.0 END), 2) AS rev_f,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0.0 END), 2) AS rev_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "null_functions" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_nb,
        |  greatest(c_acctbal, 0.0) AS bal_floor,
        |  least(CAST(c_nationkey AS BIGINT), 10) AS nk_cap,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "math_functions" ->
      """SELECT s_suppkey,
        |  round(sqrt(abs(s_acctbal)), 4) AS sqrt_bal,
        |  round(pow(CAST(s_suppkey AS DOUBLE), 2.0), 1) AS key_sq,
        |  round(exp(CAST(s_suppkey AS DOUBLE) / 1000), 6) AS exp_k,
        |  CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
        |  CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "decimal_agg" ->
      """SELECT l_returnflag,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
        |  CAST(CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS max_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "bloom_semi_join" ->
      // the bloom is a pre-filter only; the exact result is the semi join
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "array_functions" ->
      """SELECT p_partkey,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
        |  array_to_string(list_sort(string_split(p_name, ' ')), '_') AS sorted_joined,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "json_functions" ->
      """SELECT o_orderkey,
        |  json_extract_string(j, '$.key') AS jkey,
        |  json_extract_string(j, '$.priority') AS jpriority,
        |  json_extract_string(j, '$.missing') AS jmissing
        |FROM (SELECT o_orderkey,
        |        '{"key":' || o_orderkey || ',"priority":"' || o_orderpriority || '"}' AS j
        |      FROM orders) ORDER BY o_orderkey""".stripMargin,
    "agg_collect" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "window_ntile" ->
      """SELECT c_custkey, c_nationkey, c_acctbal, quartile, pct_rank, cdist
        |FROM (SELECT c_custkey, c_nationkey, c_acctbal,
        |    ntile(4) OVER w AS quartile,
        |    round(percent_rank() OVER w, 6) AS pct_rank,
        |    round(cume_dist() OVER w, 6) AS cdist
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal DESC, c_custkey))
        |WHERE c_custkey % 10 = 0 ORDER BY c_custkey""".stripMargin,
    "percentile_agg" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  round(min(l_extendedprice), 2) AS pmin,
        |  round(max(l_extendedprice), 2) AS pmax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "unpivot_op" ->
      """SELECT o_orderkey, metric, val
        |FROM (SELECT o_orderkey, round(o_totalprice, 2) AS price,
        |        CAST(o_custkey AS DOUBLE) AS cust FROM orders)
        |  UNPIVOT (val FOR metric IN (price, cust))
        |ORDER BY o_orderkey, metric""".stripMargin,
    "window_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
