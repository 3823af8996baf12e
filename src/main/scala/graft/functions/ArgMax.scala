package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Fixed-width argmax for the nearest-centroid reduction: of a group's
  * (cid INT, s DOUBLE) rows, the cid with the LARGEST s, smallest cid
  * on ties — exactly `max(struct(s, -cid))` re-expressed as a
  * DECLARATIVE aggregate over two primitive buffer slots so Spark
  * plans it as **HashAggregateExec**: whole-stage-codegen'd update,
  * Tungsten UnsafeRow hash map with map-side partial combine and
  * graceful sort-spill — no ObjectHashAggregate, no
  * sortBased.fallbackThreshold dependence at any group cardinality.
  *
  * Why this exists: `max` over a STRUCT type cannot use a hash
  * aggregate (struct agg buffers aren't mutable fixed-width), so Spark
  * falls back to SortAggregate — which SORTS the whole pre-aggregation
  * stream. The centroid-assignment stream is N·C rows (every vector ×
  * every centroid): at the 10× vector soak (158k × 640 cells ≈ 100M
  * rows) the partial sort spilled 3.7 GB; at a 10⁹-vector deployment
  * it would sort ~10¹³ rows. With a hash-combinable argmax the
  * broadcast-join → project → partial-agg pipeline collapses the C
  * rows per vector map-side and only one (id, cell) row per vector
  * ever shuffles — the shape [[graft.ops.Similarity.assignCells]]'s
  * doc always promised. (Round 15 shipped this as a
  * TypedImperativeAggregate / ObjectHashAggregate; that required a
  * session-global raise of the 128-key sort-based fallback threshold,
  * which also governs every UNBOUNDED-buffer aggregate in the session
  * — the declarative form needs no such knob and codegens besides.)
  *
  * Double ordering mirrors Spark's SQL comparator (the codegen'd
  * `nanSafeCompareDoubles` / `genEqual` semantics): `±0.0` equal, NaN
  * greatest, NaN = NaN — so the result is bit-identical to the
  * `max(struct)` form on every input, ties included (the DuckDB
  * oracles pin this).
  *
  * `nanSmallest` is for the NEGATED-key call sites (argmin expressed
  * as argmax of -key, e.g. nearest-PQ-centroid and lowest-rank
  * keeper): under `min(struct(key, v))` a NaN key sorts GREATEST and
  * so never wins, but negation maps NaN to NaN, which under plain
  * max-semantics would suddenly WIN. With `nanSmallest = true` a NaN
  * key loses to every real key (and ties against another NaN fall to
  * the payload tie-break), restoring exact min-of-struct semantics on
  * NaN inputs. Positive-key sites keep the default. */
case class ArgMaxCell(
    cidExpr: Expression,
    scoreExpr: Expression,
    nanSmallest: Boolean = false)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = cidExpr
  override def right: Expression = scoreExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (cidExpr.dataType == IntegerType && scoreExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax expects (int, double); got " +
        s"${cidExpr.dataType.simpleString}, ${scoreExpr.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  // null bestKey = empty group (the Max/Min buffer idiom): both slots
  // are fixed-width primitives + null bits, so HashAggregateExec's
  // UnsafeRow map holds them directly
  private lazy val bestKey =
    AttributeReference("bestKey", DoubleType)()
  private lazy val bestCid =
    AttributeReference("bestCid", IntegerType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestKey, bestCid)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, IntegerType))

  override lazy val updateExpressions: Seq[Expression] = {
    val take = ArgMaxOrdering.takes(
      scoreExpr, cidExpr, bestKey, bestCid, nanSmallest,
      preferLowPayload = true)
    Seq(If(take, scoreExpr, bestKey), If(take, cidExpr, bestCid))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = ArgMaxOrdering.takes(
      bestKey.right, bestCid.right, bestKey.left, bestCid.left, nanSmallest,
      preferLowPayload = true)
    Seq(If(take, bestKey.right, bestKey.left),
      If(take, bestCid.right, bestCid.left))
  }

  override lazy val evaluateExpression: Expression = bestCid

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ArgMaxCell =
    copy(cidExpr = l, scoreExpr = r)
  override def prettyName: String = "graft_argmax"
}

/** Fixed-width long-payload argmax — `max/min(struct(key, value))`
  * re-expressed declaratively over two primitive buffer slots
  * (HashAggregateExec: codegen'd update, Tungsten map, map-side
  * partial combine) for the corpus-scale argmax reductions a struct
  * extremum would SortAggregate: the standing-cluster latest-revision
  * resolve ([[graft.ops.StandingState]] readClusters — max `_seq`,
  * ties to the HIGHEST cluster) and the per-cluster keeper selections
  * ([[graft.ops.Cluster]] priority/rank keepers — max key, ties to the
  * LOWEST doc id). `preferLowValue` picks the tie side; key ordering
  * mirrors Spark's SQL double comparator (±0.0 equal, NaN greatest),
  * so results are bit-identical to the struct forms; `nanSmallest`
  * restores min-of-struct NaN semantics at negated-key call sites
  * (see [[ArgMaxCell]]). */
case class ArgMaxLong(
    valExpr: Expression,
    keyExpr: Expression,
    preferLowValue: Boolean,
    nanSmallest: Boolean = false)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = valExpr
  override def right: Expression = keyExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (valExpr.dataType == LongType && keyExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax_long expects (long, double); got " +
        s"${valExpr.dataType.simpleString}, ${keyExpr.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val bestKey =
    AttributeReference("bestKey", DoubleType)()
  private lazy val bestVal =
    AttributeReference("bestVal", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestKey, bestVal)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, LongType))

  override lazy val updateExpressions: Seq[Expression] = {
    val take = ArgMaxOrdering.takes(
      keyExpr, valExpr, bestKey, bestVal, nanSmallest, preferLowValue)
    Seq(If(take, keyExpr, bestKey), If(take, valExpr, bestVal))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = ArgMaxOrdering.takes(
      bestKey.right, bestVal.right, bestKey.left, bestVal.left, nanSmallest,
      preferLowValue)
    Seq(If(take, bestKey.right, bestKey.left),
      If(take, bestVal.right, bestVal.left))
  }

  override lazy val evaluateExpression: Expression = bestVal

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ArgMaxLong =
    copy(valExpr = l, keyExpr = r)
  override def prettyName: String = "graft_argmax_long"
}

/** The shared argmax comparison, as a Catalyst predicate: does the
  * incoming (key, payload) pair REPLACE the current buffer state?
  *
  * Spark's own binary comparisons on DOUBLE already implement exactly
  * the ordering the argmax promises — `GreaterThan` codegens
  * `nanSafeCompareDoubles` (NaN greatest), `EqualTo` codegens the
  * NaN-aware equality (NaN = NaN true, -0.0 = 0.0 true) — so the
  * predicate is plain `>` / `=` composition, and null handling is the
  * Max/Min idiom: a null incoming key (or payload) never takes; a null
  * buffer key (empty so far) always yields to a real pair. */
private[functions] object ArgMaxOrdering {
  def takes(
      key: Expression,
      payload: Expression,
      curKey: Expression,
      curPayload: Expression,
      nanSmallest: Boolean,
      preferLowPayload: Boolean): Expression = {
    val greater =
      if (nanSmallest)
        // negated-key argmin: a NaN key only beats a NaN-free... no —
        // it beats NOTHING real; it only ties another NaN (EqualTo
        // below) and always loses to a real key
        And(Not(IsNaN(key)), Or(IsNaN(curKey), GreaterThan(key, curKey)))
      else GreaterThan(key, curKey) // NaN greatest (nanSafeCompare)
    val tieBreak =
      if (preferLowPayload) LessThan(payload, curPayload)
      else GreaterThan(payload, curPayload)
    val wins = Or(greater, And(EqualTo(key, curKey), tieBreak))
    val valid = And(IsNotNull(key), IsNotNull(payload))
    And(valid, Or(IsNull(curKey), wins))
  }
}
