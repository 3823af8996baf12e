package graft.frontend

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoDir, LogicalPlan, ParsedStatement}
import org.apache.spark.sql.types.{DataType, StructType}

/** A `ParserInterface` that parses the full SQL surface but refuses any
  * statement whose PLAN contains a write or side-effecting command — the
  * Spark-native equivalent of the reference's forked grammar, which
  * removes DDL/DML productions outright
  * (`fineo-reparser/src/main/codegen/README.md`). Injected via
  * `SparkSessionExtensions.injectParser` on a serving session, it guards
  * every entry point that session has — including wire protocols like the
  * Thrift/JDBC endpoint, which bypass [[TenantSession]]'s statement
  * dispatch and go straight to `session.sql`.
  *
  * Decision is plan-shape, not first-token: comment prefixes, CTE-wrapped
  * INSERTs, `LOAD DATA`, EXPLAIN-wrapped writes and every other lexical
  * disguise parse to `Command` / `ParsedStatement` / `InsertIntoDir`
  * nodes and are rejected wherever they sit in the tree.
  *
  * Read-only metadata commands a JDBC client legitimately issues —
  * SHOW/DESCRIBE forms and USE — stay allowed; `SET` does NOT (a client
  * that can run `SET spark.sql.runSQLOnFiles=true` un-does the session's
  * defense-in-depth, so session tuning belongs to the server, not the
  * wire).
  */
class ReadOnlyParser(
    delegate: ParserInterface,
    blockedNamespaces: Set[String] = Set.empty) extends ParserInterface {

  private val blocked = blockedNamespaces.map(_.toLowerCase)

  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = delegate.parsePlan(sqlText)
    val offender = plan.collectWithSubqueries {
      case c: Command if !ReadOnlyParser.allowedCommand(c) => c.nodeName
      case p: ParsedStatement => p.nodeName
      case d: InsertIntoDir => d.nodeName
    }
    offender.headOption.foreach { n =>
      throw new UnsupportedOperationException(
        s"read-only serving surface: $n statements are not allowed")
    }
    // Namespace fence: a serving session shares SharedState with its root
    // session, so `global_temp.*` views (and catalog-qualified tables) the
    // host app registers would otherwise be readable by any tenant —
    // ReadOnlyParser blocks writes, not reads. Every legitimate tenant
    // table is a single-part session view, so qualified escapes into the
    // blocked namespaces are refused at parse time.
    if (blocked.nonEmpty) {
      val escape = plan.collectWithSubqueries {
        case r: UnresolvedRelation
            if blocked.contains(r.multipartIdentifier.head.toLowerCase) =>
          r.multipartIdentifier.mkString(".")
        case t: UnresolvedTableOrView
            if blocked.contains(t.multipartIdentifier.head.toLowerCase) =>
          t.multipartIdentifier.mkString(".")
      }
      escape.headOption.foreach { n =>
        throw new SecurityException(
          s"tenant serving surface: namespace of $n is not accessible")
      }
    }
    plan
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

object ReadOnlyParser {
  /** Commands with no write/side-effect surface: metadata listings and
    * namespace selection. Matched on node name so new SHOW/DESCRIBE
    * variants stay covered; everything else is denied by default. */
  private[frontend] def allowedCommand(c: Command): Boolean = {
    val n = c.nodeName
    n.startsWith("Show") || n.startsWith("Describe") ||
      n == "SetCatalogAndNamespace" || n == "ExplainCommand"
  }
}
