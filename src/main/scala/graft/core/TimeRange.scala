package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnExpr
import org.apache.spark.sql.graftshim.ColumnExpr.{Attr, Fn, Lit, P}

/** Interval over epoch millis with inclusive bounds [min, max];
  * `Full` means "no information — scan everything". */
case class TimeRange(min: Long = Long.MinValue, max: Long = Long.MaxValue) {
  def isFull: Boolean = min == Long.MinValue && max == Long.MaxValue
  def isEmpty: Boolean = min > max
  def intersect(o: TimeRange): TimeRange = TimeRange(math.max(min, o.min), math.min(max, o.max))
  /** Convex hull — used for OR; may over-approximate, which is safe. */
  def union(o: TimeRange): TimeRange = TimeRange(math.min(min, o.min), math.max(max, o.max))
  /** Does this requested range overlap a table covering [start, end)? */
  def overlaps(start: Long, endExclusive: Long): Boolean =
    !isEmpty && min < endExclusive && max >= start
}

object TimeRange {
  val Full: TimeRange = TimeRange()

  /** Extract the timestamp bounds implied by a filter Column.
    *
    * Mirrors the conservatism of the reference's
    * `TimestampExpressionBuilder` (`fineo-adapter-drill/.../partition/
    * TimestampExpressionBuilder.java:71-134`): only `=, <, <=, >, >=`
    * on the given column, combined with AND/OR, narrow the range. Any
    * construct we don't understand (`<>`, arithmetic, IS NULL, other
    * columns, …) widens to Full — never narrows. Widening is always safe:
    * the residual Spark filter still applies row-by-row; this range only
    * drives *source selection* (which tables/directories to read at all).
    *
    * Works on the pre-analysis ColumnNode tree (the predicate is built
    * against a not-yet-assembled table, so catalyst resolution hasn't
    * happened yet).
    */
  def extract(tsColumn: String, cond: Column): TimeRange =
    extract(tsColumn.toLowerCase, ColumnExpr.predTree(cond))

  private def extract(ts: String, p: P): TimeRange = p match {
    case Fn("and", Seq(l, r)) => extract(ts, l).intersect(extract(ts, r))
    case Fn("or", Seq(l, r))  => extract(ts, l).union(extract(ts, r))
    case Fn(op, Seq(Attr(`ts`), LongLit(v))) => fromCompare(op, v, flipped = false)
    case Fn(op, Seq(LongLit(v), Attr(`ts`))) => fromCompare(op, v, flipped = true)
    case _ => Full
  }

  private object LongLit {
    def unapply(p: P): Option[Long] = p match {
      case Lit(v: Long)  => Some(v)
      case Lit(v: Int)   => Some(v.toLong)
      case Lit(v: Short) => Some(v.toLong)
      case _ => None
    }
  }

  private def fromCompare(op: String, v: Long, flipped: Boolean): TimeRange = op match {
    case "=" | "==" | "===" | "equal" => TimeRange(v, v)
    case "<"  => if (flipped) TimeRange(min = v + 1) else TimeRange(max = v - 1)
    case "<=" => if (flipped) TimeRange(min = v) else TimeRange(max = v)
    case ">"  => if (flipped) TimeRange(max = v - 1) else TimeRange(min = v + 1)
    case ">=" => if (flipped) TimeRange(max = v) else TimeRange(min = v)
    case _ => Full
  }
}
