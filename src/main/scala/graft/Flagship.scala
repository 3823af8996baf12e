package graft

import graft.frontend.TenantSession
import graft.schema._
import graft.sources._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship end-to-end path for the driver's smoke check: builds a
  * real multi-source fineo layout from the sf0.001 events table (archive
  * parquet + archive json + a nearline time-window table with multi-write
  * items), registers a tenant with aliased/canonical fields, and runs
  * tenant SQL through the whole engine — source pruning, recombination,
  * union, overlap cutoff, time sort.
  */
object Flagship {
  private val OrgId = "org1"
  private val MetricId = "m_events"

  private val metric = Metric(
    canonicalId = MetricId,
    displayName = "events",
    fields = Seq(
      Field("etype", FieldType.STRING, aliases = Seq("event_type")),
      Field("val", FieldType.DOUBLE, aliases = Seq("value")),
      Field("user", FieldType.LONG, cname = Some("user_id"))),
    tableAliases = Seq("eventstream"))

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_entry").toString

    // storage-shaped rows from the events table (FIXTURES.md §2 shape)
    val ev = Tables.load(spark, sfDir, "events")
      .select(
        lit(OrgId).as("companykey"),
        lit(MetricId).as("metrictype"),
        unix_millis(col("ts")).as("timestamp"),
        (unix_millis(col("ts")) + 1000L).as("writetime"),
        col("event_type"),
        col("value"),
        col("user_id"))
    val bounds = ev.agg(min("timestamp"), max("timestamp")).collect().head
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val cutParquet = lo + (hi - lo) * 6 / 10 // archive parquet: oldest 60%
    val nearlineStart = lo + (hi - lo) * 7 / 10 // nearline window start (overlaps json)

    ev.filter(col("timestamp") < cutParquet)
      .write.mode("overwrite").parquet(s"$base/0/parquet/$OrgId/$MetricId")
    // archive json extends INTO the nearline window — the overlap the
    // cutoff semantics must remove (nearline wins)
    ev.filter(col("timestamp") >= cutParquet)
      .write.mode("overwrite").json(s"$base/0/json/$OrgId/$MetricId")

    // nearline items: one write per row, packed in the multi-write format
    val nlPath = s"$base/nearline/t_${nearlineStart}_${hi + 1}"
    ev.filter(col("timestamp") >= nearlineStart)
      .select(
        graft.sources.KeyMapper.Concat
          .partitionKeyCol(col("companykey"), col("metrictype")).as("partition"),
        col("timestamp").cast("string").as("sort"),
        array(lit("w1")).as("ids"),
        map(lit("w1"), col("event_type")).as("event_type"),
        map(lit("w1"), col("value").cast("string")).as("value"),
        map(lit("w1"), col("user_id").cast("string")).as("user_id"))
      .write.mode("overwrite").parquet(nlPath)

    val sources = SourceSet(
      fs = Seq(FsSource("parquet", base), FsSource("json", base)),
      nearline = Seq(NearlineTableDesc(s"t_${nearlineStart}_${hi + 1}", nlPath,
        nearlineStart, hi + 1)))
    val registry = SchemaRegistry(Org(OrgId, Seq(metric)))
    val tenant = TenantSession.open(spark, registry, OrgId, sources)

    // tenant SQL over the assembled table: declared names (etype/val/user),
    // time-range filter, aggregation — exercises the full engine surface
    tenant.sql(
      """SELECT etype, count(*) AS n, round(sum(val), 2) AS total_val,
        |       min(`timestamp`) AS first_ts, max(`timestamp`) AS last_ts
        |FROM events
        |GROUP BY etype ORDER BY etype""".stripMargin)
  }

  /** Sanity invariant used by tests: assembled row count equals the
    * original event count (no dup from the overlap, none lost). */
  def assembledCount(spark: SparkSession, sfDir: String): (Long, Long) = {
    val expected = Tables.load(spark, sfDir, "events").count()
    val got = run(spark, sfDir).agg(sum("n")).collect().head.getLong(0)
    (expected, got)
  }
}
