package graft.frontend

import graft.schema.SchemaRegistry
import graft.sources.SourceSet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, Limit, LogicalPlan}
import org.apache.spark.sql.execution.command.ExplainCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** Everything the wire rewriter needs to substitute statements for ONE
  * tenant; installed after the serving session is constructed (the parser
  * is built during session-state init, before the session object exists —
  * hence the indirection). */
private[frontend] case class WireTenantContext(
    spark: SparkSession,
    orgId: String,
    registry: SchemaRegistry,
    sources: SourceSet,
    views: Set[String],
    maxRows: Option[Int])

/** The Thrift wire path's statement hook: Spark's Thrift frontend plans
  * client SQL directly (`session.sql`), bypassing [[TenantSession]]'s
  * dispatch — so the per-statement work rides the session's PARSER
  * instead. For every parsed query this wrapper:
  *
  *   1. splices the tenant's bare metric names with freshly assembled
  *      plans whose nearline sources are TIME-PRUNED by the statement's
  *      own filters ([[Substitution]], reference R1 —
  *      `ConvertFineoMarkerIntoFilteredInputTables.java:183-285`, which
  *      the reference applies to every entry point including JDBC). A BI
  *      tool's `WHERE timestamp >= X` now scans only in-range nearline
  *      segments instead of the full assembled range;
  *   2. applies the server-side row clamp when configured (reference
  *      `FineoJdbcMeta.setMaxRows:143-159`) by wrapping the query in a
  *      LIMIT — commands (SHOW/DESCRIBE/USE/EXPLAIN) are never wrapped.
  *
  * `EXPLAIN` is substituted through to its inner plan (the tenant sees
  * the pruned plan they'd actually run). Statements arriving before the
  * context is installed (none in practice — installation precedes the
  * Thrift listener start) pass through untouched; the registered session
  * views still make them correct, just unpruned.
  *
  * Ordering note: the delegate chain is
  * `WireQueryRewriter(ReadOnlyParser(spark parser))` — the read-only and
  * namespace gates run FIRST, so substitution only ever sees statements
  * that already passed them. */
private[frontend] class WireQueryRewriter(
    delegate: ParserInterface,
    ctx: () => Option[WireTenantContext],
    requireTenant: Boolean = false,
    metrics: Option[ServingMetrics] = None) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = delegate.parsePlan(sqlText)
    ctx() match {
      // Multi-tenant endpoints REQUIRE a resolved tenant: a keyless
      // connection's session clone still carries Spark's conf DEFAULTS
      // (runSQLOnFiles=true — file-path relations would resolve) and no
      // row clamp, because hardening runs inside tenant init. Refusing
      // the statement outright closes both holes — no key, no service
      // (the reference's connection contract).
      case None if requireTenant =>
        throw new SecurityException(
          "no tenant key on this connection: statements are refused " +
            s"(set ${GraftJdbcServer.TenantConfKey} in the JDBC URL's conf list)")
      case None => plan
      case Some(c) =>
        metrics.foreach { m =>
          m.inc("thrift.statements")
          m.inc(s"thrift.statements.${c.orgId}")
          if (plan.isInstanceOf[Command]) m.inc("thrift.commands")
        }
        def subst(p: LogicalPlan): LogicalPlan = Substitution.substituteMetrics(
          c.spark, c.orgId, c.registry, c.sources, c.views, p, strict = false)
        plan match {
          case e: ExplainCommand => e.copy(logicalPlan = subst(e.logicalPlan))
          case _: Command        => plan
          case q => c.maxRows.fold(subst(q))(n => Limit(Literal(n), subst(q)))
        }
    }
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
