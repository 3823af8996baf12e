package graft.sources

import graft.sources.ReadPlanner._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Decision-table tests translated from the reference's
  * TestDynamoFilterPushdown.java:33-319 (SURVEY.md §4 R4). */
class ReadPlannerSpec extends AnyFunSuite with Matchers {
  private val HK = "partition"
  private val SK = "sort"
  private def plan(p: Pred): Read = ReadPlanner.plan(HK, SK, Some(p))

  test("no predicate → full scan") {
    ReadPlanner.plan(HK, SK, None) shouldBe Scan(None, None)
  }

  test("hash-key equality alone → Query") {
    plan(Eq(HK, "org1m1")) shouldBe Query("org1m1", None, None, None)
  }

  test("hash = AND sort = → Get") {
    plan(And(Seq(Eq(HK, "o"), Eq(SK, "123")))) shouldBe Get("o", "123", None)
  }

  test("hash = AND sort range → Query with sort condition") {
    plan(And(Seq(Eq(HK, "o"), Cmp(SK, ">=", "100")))) shouldBe
      Query("o", Some(Cmp(SK, ">=", "100")), None, None)
  }

  test("sort >= AND sort <= reconstructs BETWEEN (BetweenBuilder semantics)") {
    plan(And(Seq(Eq(HK, "o"), Cmp(SK, ">=", "100"), Cmp(SK, "<=", "200")))) shouldBe
      Query("o", Some(Between(SK, "100", "200")), None, None)
    // order-independent
    plan(And(Seq(Cmp(SK, "<=", "200"), Eq(HK, "o"), Cmp(SK, ">=", "100")))) shouldBe
      Query("o", Some(Between(SK, "100", "200")), None, None)
  }

  test("attribute predicates attach to the Query as a filter") {
    plan(And(Seq(Eq(HK, "o"), Eq("field1", "true")))) shouldBe
      Query("o", None, Some(Eq("field1", "true")), None)
  }

  test("non-filterable attribute predicates stay residual") {
    plan(And(Seq(Eq(HK, "o"), Opaque("field1 LIKE '%x%'")))) shouldBe
      Query("o", None, None, Some(Opaque("field1 LIKE '%x%'")))
  }

  test("no hash-key equality → Scan with server-side filter") {
    plan(Cmp("field1", ">", "5")) shouldBe Scan(Some(Cmp("field1", ">", "5")), None)
    plan(Eq(SK, "123")) shouldBe Scan(Some(Eq(SK, "123")), None)
  }

  test("OR of key equalities fans out into MultiRead of Gets/Queries") {
    plan(Or(Seq(
      And(Seq(Eq(HK, "a"), Eq(SK, "1"))),
      Eq(HK, "b")))) shouldBe
      MultiRead(Seq(Get("a", "1", None), Query("b", None, None, None)))
  }

  test("OR with a non-keyed branch degrades to a single Scan (never wrong)") {
    val p = Or(Seq(Eq(HK, "a"), Cmp("field1", ">", "5")))
    plan(p) shouldBe Scan(Some(p), None)
  }

  test("opaque top-level predicate → Scan with residual, no server filter") {
    val p = Opaque("f IS NULL")
    plan(p) shouldBe Scan(None, Some(p))
  }

  test("nested ANDs flatten") {
    plan(And(Seq(And(Seq(Eq(HK, "o"))), Eq(SK, "9")))) shouldBe Get("o", "9", None)
  }

  test("<> is server-filterable but never a key condition (DynamoFilterSpec.java:25-46)") {
    // bare <> → Scan with a server-side filter, not residual
    plan(Ne("field1", "x")) shouldBe Scan(Some(Ne("field1", "x")), None)
    // under a hash equality, <> on an attribute attaches to the Query filter
    plan(And(Seq(Eq(HK, "o"), Ne("field1", "x")))) shouldBe
      Query("o", None, Some(Ne("field1", "x")), None)
    // <> on the SORT key is an attribute filter too — Dynamo key conditions
    // have no <>, so it must not become a sort condition
    plan(And(Seq(Eq(HK, "o"), Ne(SK, "5")))) shouldBe
      Query("o", None, Some(Ne(SK, "5")), None)
  }

  test("scan segmentation heuristics mirror the reference caps") {
    // ~rows/1000 segments, capped by executors*10, floor 1
    ReadPlanner.scanSegments(100, 4) shouldBe 1
    ReadPlanner.scanSegments(100000, 4) shouldBe 40
    ReadPlanner.scanSegments(5000, 4) shouldBe 5
    ReadPlanner.scanSegments(Long.MaxValue, 200000) shouldBe 1000000
  }
}
