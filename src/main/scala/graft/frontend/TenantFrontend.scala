package graft.frontend

import graft.core.Assembler
import graft.schema.{Metric, SchemaRegistry}
import graft.sources.SourceSet
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tenant-facing SQL frontend: the rebuild of the reference's forked
  * parser + Avatica server surface (SURVEY.md §2.11, §3 entry point A).
  *
  * Isolation model: one `SparkSession.newSession()` per tenant — shared
  * SparkContext/cached data, but an isolated temp-view catalog. Each of the
  * tenant's metrics is registered as a temp view under its display name (and
  * aliases), so bare table identifiers resolve only to that tenant's tables.
  * This replaces the reference's identifier-rewriting parser fork
  * (`FineoDrillParserWithCompoundIdConverter.java`): instead of rewriting
  * `metricid1` → `fineo.org1.metricid1` in SQL text, the resolution scope
  * itself is tenant-bound — structurally equivalent isolation with zero
  * string surgery, and the full Spark SQL SELECT surface (joins, aggs,
  * windows, subqueries, set ops) comes along for free, like the reference
  * delegated to stock Drill.
  */
class TenantSession private (
    val spark: SparkSession,
    val orgId: String,
    registry: SchemaRegistry,
    sources: SourceSet) {
  import graft.core.TimeRange
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}

  /** Statements the reference removed from its grammar for isolation
    * (`fineo-reparser/src/main/codegen/README.md`): DDL/DML rejected. */
  private val forbidden =
    Seq("create", "drop", "insert", "update", "delete", "alter", "merge",
      "truncate", "refresh", "set", "reset", "cache", "uncache", "analyze")

  /** Run tenant SQL. SELECT/WITH/VALUES + SHOW/DESCRIBE/USE only. */
  def sql(statement: String): DataFrame = {
    val head = statement.trim.split("\\s+", 2).headOption.getOrElse("").toLowerCase
    if (forbidden.contains(head))
      throw new UnsupportedOperationException(
        s"read-only tenant surface: '$head' statements are not allowed")
    head match {
      case "show" =>
        val rest = statement.trim.split("\\s+", 3).lift(1).map(_.toLowerCase)
        rest match {
          case Some("tables")                      => showTables()
          case Some("schemas") | Some("databases") => showSchemas()
          case other =>
            throw new UnsupportedOperationException(s"SHOW ${other.getOrElse("")} not supported")
        }
      case "describe" | "desc" =>
        describeTable(statement.trim.split("\\s+").last)
      case "use" => showSchemas() // USE is a no-op: a tenant has exactly one schema
      case _ =>
        pruneSourcesFor(statement)
        spark.sql(statement)
    }
  }

  /** Plan-time time-range source pruning for arbitrary tenant SQL — the
    * reference's `PushTimerangeFilterPastRecombinator` +
    * `ConvertFineoMarkerIntoFilteredInputTables` (SURVEY.md §4 R1) at the
    * SQL surface: parse the statement, extract conservative `timestamp`
    * bounds from its filters, and re-register the referenced metric's view
    * assembled from only the sources overlapping the range. Applies only
    * to single-table statements (multi-table queries scan all, exactly the
    * widen-don't-narrow contract); the residual WHERE still runs row-wise.
    * Safe to re-register per statement: `spark.sql` resolves the view at
    * call time, so previously returned DataFrames are unaffected. */
  private def pruneSourcesFor(statement: String): Unit = {
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(statement)
      catch { case _: Exception => return }
    val rels = parsed.collect { case r: UnresolvedRelation => r }.toSeq
    val metricOpt = rels match {
      case Seq(one) => registry.metric(orgId, one.multipartIdentifier.mkString("."))
      case _ => None
    }
    metricOpt.foreach { m =>
      val filters = parsed.collect { case f: LFilter => f.condition }.toSeq
      val range =
        if (filters.isEmpty) TimeRange.Full
        else filters.map(TimeRange.extractExpr(Metric.TimestampField, _))
          .reduce(_ intersect _)
      registerMetric(m, if (range.isFull) sources else sources.prune(range))
    }
  }

  private[frontend] def registerMetric(m: Metric, srcs: SourceSet): Unit = {
    val df = Assembler.metricTable(spark, orgId, m, srcs, sorted = false)
    (m.displayName +: m.tableAliases).foreach(n => df.createOrReplaceTempView(n))
  }

  /** Tenant-scoped SHOW TABLES (reference `SqlShowTables`, info-schema
    * filtering `FineoInfoSchemaUserTranslator.java:30-103`). */
  def showTables(): DataFrame =
    toDf(registry.listTables(orgId).map(t => Row("FINEO", t)),
      StructType(Seq(StructField("schema", StringType), StructField("table", StringType))))

  /** A tenant sees exactly one schema, the constant catalog FINEO. */
  def showSchemas(): DataFrame =
    toDf(Seq(Row("FINEO")), StructType(Seq(StructField("schema", StringType))))

  def describeTable(table: String): DataFrame = {
    val metric = registry.metric(orgId, table).getOrElse(
      throw new IllegalArgumentException(s"table not found: $table"))
    val rows = metric.structType.fields.toSeq.map(f => Row(f.name, f.dataType.sql, f.nullable))
    toDf(rows, StructType(Seq(
      StructField("column", StringType), StructField("type", StringType),
      StructField("nullable", BooleanType))))
  }

  private def toDf(rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
}

object TenantSession {

  /** Open a tenant session: validates the org exists (the reference's
    * `TenantValidator`), registers each metric (and its table aliases) as
    * temp views in an isolated session. */
  def open(
      root: SparkSession,
      registry: SchemaRegistry,
      orgId: String,
      sources: SourceSet,
      errorsDir: Option[String] = None): TenantSession = {
    val org = registry.org(orgId).getOrElse(
      throw new SecurityException(s"unknown tenant: $orgId"))
    val session = root.newSession()
    // tenant SQL gets the engine functions, incl. the reference's
    // fineo_base64_decode UDF surface
    graft.functions.GraftExtensions.register(session)
    val tenant = new TenantSession(session, orgId, registry, sources)
    org.metrics.foreach(m => tenant.registerMetric(m, sources))
    // Errors table: JSON (possibly gzipped — Spark reads .gz natively)
    // under Hive-style partition dirs stream/stage=…/type=…/year=…/month=…/
    // day=…, so the directory components surface as partition columns and
    // prune natively (vs the reference's raw dirs, S7 in SURVEY.md §2.1).
    // The forced tenant predicate is baked into the view itself — the
    // reference appends `apikey = '<org>'` to every errors query
    // (`FineoErrorWhereForce.java:38-68`); baking it into the view is
    // structurally unbypassable.
    errorsDir.filter(d => new java.io.File(d).exists).foreach { dir =>
      val errs = session.read.json(s"$dir/stream").filter(col("apikey") === orgId)
      errs.createOrReplaceTempView("errors_stream")
    }
    tenant
  }
}
