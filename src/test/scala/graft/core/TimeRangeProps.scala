package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The widen-don't-narrow contract of timestamp-bound extraction
  * (reference `TimestampExpressionBuilder.java:71-134` conservatism):
  * for ANY predicate built from comparisons/AND/OR — including conjuncts
  * the extractor can't parse — every timestamp that satisfies the
  * predicate lies inside the extracted range. Source pruning driven by
  * the range can therefore never drop a matching row.
  */
object TimeRangeProps extends Properties("TimeRange") {

  sealed trait TP
  case class Leaf(op: String, v: Long) extends TP
  case class AndT(l: TP, r: TP) extends TP
  case class OrT(l: TP, r: TP) extends TP
  /** inner AND an always-true conjunct the extractor can't parse. */
  case class OpaqueAnd(inner: TP) extends TP

  private val genV: Gen[Long] = Gen.choose(-100L, 100L)
  private val genLeafT: Gen[TP] =
    for { op <- Gen.oneOf("=", "<", "<=", ">", ">="); v <- genV } yield Leaf(op, v)

  private def genTP(d: Int): Gen[TP] =
    if (d <= 0) genLeafT
    else Gen.frequency(
      3 -> genLeafT,
      2 -> (for { l <- genTP(d - 1); r <- genTP(d - 1) } yield AndT(l, r)),
      2 -> (for { l <- genTP(d - 1); r <- genTP(d - 1) } yield OrT(l, r)),
      1 -> genTP(d - 1).map(OpaqueAnd(_)),
    )

  private def toColumn(t: TP): Column = t match {
    case Leaf("=", v)  => col("timestamp") === v
    case Leaf("<", v)  => col("timestamp") < v
    case Leaf("<=", v) => col("timestamp") <= v
    case Leaf(">", v)  => col("timestamp") > v
    case Leaf(_, v)    => col("timestamp") >= v
    case AndT(l, r)    => toColumn(l) && toColumn(r)
    case OrT(l, r)     => toColumn(l) || toColumn(r)
    // arithmetic over another column: the extractor must widen this
    // conjunct to Full, not misparse it
    case OpaqueAnd(i)  => toColumn(i) && (col("other") + 1 > 0)
  }

  /** Ground truth under an assignment where `other` makes the opaque
    * conjunct true. */
  private def eval(t: TP, ts: Long): Boolean = t match {
    case Leaf("=", v)  => ts == v
    case Leaf("<", v)  => ts < v
    case Leaf("<=", v) => ts <= v
    case Leaf(">", v)  => ts > v
    case Leaf(_, v)    => ts >= v
    case AndT(l, r)    => eval(l, ts) && eval(r, ts)
    case OrT(l, r)     => eval(l, ts) || eval(r, ts)
    case OpaqueAnd(i)  => eval(i, ts)
  }

  property("every satisfying timestamp is inside the extracted range") =
    forAll(genTP(3), genV) { (t, ts) =>
      val r = TimeRange.extract("timestamp", toColumn(t))
      !eval(t, ts) || (ts >= r.min && ts <= r.max)
    }

  property("extraction is stable under flipped operand order") =
    forAll(genV, Gen.oneOf("<", "<=", ">", ">=")) { (v, op) =>
      val normal = op match {
        case "<"  => col("timestamp") < v
        case "<=" => col("timestamp") <= v
        case ">"  => col("timestamp") > v
        case _    => col("timestamp") >= v
      }
      val flippedOp = op match {
        case "<" => lit(v) > col("timestamp"); case "<=" => lit(v) >= col("timestamp")
        case ">" => lit(v) < col("timestamp"); case _    => lit(v) <= col("timestamp")
      }
      TimeRange.extract("timestamp", normal) ==
        TimeRange.extract("timestamp", flippedOp)
    }
}
