package graft.sources

import graft.sources.ReadPlanner._
import graft.sources.dsv2.ParquetSegmentService
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for the read-planning decision module (the reference's
  * ~950-line `DynamoReadBuilder` state machine re-derived): for ANY
  * predicate tree, evaluating the planned read through the transport —
  * including its residual predicates — must agree exactly with direct
  * predicate evaluation. I.e. the Scan/Query/Get decomposition, BETWEEN
  * reconstruction, duplicate-key handling, and MultiRead fan-out never
  * drop or invent rows. (`Opaque` predicates evaluate true on both sides:
  * the connector never pushes them, Spark re-checks them itself.)
  *
  * This property caught two real bugs on introduction: duplicate hash/
  * sort equalities being discarded by planAnd, and Get/Query residuals
  * never being applied by the reader.
  */
object ReadPlannerProps extends Properties("ReadPlanner") {
  private val HK = "partition"
  private val SK = "sort"
  private val fields = Seq(HK, SK, "attr_a", "attr_b")

  private val genField: Gen[String] = Gen.oneOf(fields)
  // a small value domain so collisions (matching records, duplicate
  // equalities, crossed ranges) actually happen
  private val genVal: Gen[String] = Gen.choose(0, 5).map(_.toString)

  private val genLeaf: Gen[Pred] = Gen.frequency(
    3 -> (for { f <- genField; v <- genVal } yield Eq(f, v)),
    2 -> (for { f <- genField; v <- genVal } yield Ne(f, v)),
    3 -> (for {
      f <- genField; op <- Gen.oneOf("<", "<=", ">", ">="); v <- genVal
    } yield Cmp(f, op, v)),
    2 -> (for { f <- genField; lo <- genVal; hi <- genVal } yield Between(f, lo, hi)),
    1 -> Gen.const(Opaque("f LIKE '%x%'")),
  )

  private def genPred(depth: Int): Gen[Pred] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      2 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, genPred(depth - 1)).map(ps => And(ps))),
      2 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, genPred(depth - 1)).map(ps => Or(ps))),
    )

  private val genRecord: Gen[Map[String, Any]] = for {
    vs <- Gen.listOfN(fields.size, Gen.option(genVal))
  } yield fields.zip(vs).collect { case (f, Some(v)) => f -> (v: Any) }.toMap

  /** Independent ground truth with SQL three-valued / Dynamo absent-attribute
    * semantics: every comparison on a missing attribute is FALSE (not just
    * Ne). Deliberately does NOT share any code with ParquetSegmentService —
    * the round-2 null bug survived because both sides of the old property
    * shared the same broken `compare`. */
  private def truth(p: Pred, rec: Map[String, Any]): Boolean = p match {
    case Eq(f, v) => rec.get(f).exists(x => String.valueOf(x) == v)
    case Ne(f, v) => rec.get(f).exists(x => String.valueOf(x) != v)
    case Cmp(f, op, v) => rec.get(f).exists { x =>
      val c = cmpVals(String.valueOf(x), v)
      op match {
        case "<" => c < 0; case "<=" => c <= 0
        case ">" => c > 0; case ">=" => c >= 0
      }
    }
    case Between(f, lo, hi) => rec.get(f).exists { x =>
      val s = String.valueOf(x)
      cmpVals(s, lo) >= 0 && cmpVals(s, hi) <= 0
    }
    case And(ps) => ps.forall(truth(_, rec))
    case Or(ps)  => ps.exists(truth(_, rec))
    case Opaque(_) => true
  }

  private def cmpVals(a: String, b: String): Int =
    (a.toDoubleOption, b.toDoubleOption) match {
      case (Some(x), Some(y)) => java.lang.Double.compare(x, y)
      case _ => a.compareTo(b)
    }

  property("server predicate evaluation ≡ independent null-aware truth") =
    forAll(genPred(3), genRecord) { (p, rec) =>
      ParquetSegmentService.evalPred(p, rec) == truth(p, rec)
    }

  property("planned read + residuals ≡ direct predicate evaluation") =
    forAll(genPred(3), genRecord) { (p, rec) =>
      val read = ReadPlanner.plan(HK, SK, Some(p))
      ParquetSegmentService.evalRead(read, rec, HK, SK) ==
        ParquetSegmentService.evalPred(p, rec)
    }

  property("planned read ≡ independent null-aware truth (end to end)") =
    forAll(genPred(3), genRecord) { (p, rec) =>
      val read = ReadPlanner.plan(HK, SK, Some(p))
      ParquetSegmentService.evalRead(read, rec, HK, SK) == truth(p, rec)
    }

  property("no predicate plans a full unfiltered scan only when truly empty") =
    forAll(genRecord) { rec =>
      ParquetSegmentService.evalRead(ReadPlanner.plan(HK, SK, None), rec, HK, SK)
    }
}
