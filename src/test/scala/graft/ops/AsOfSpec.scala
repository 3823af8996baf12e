package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** As-of join semantics + plan shape. */
class AsOfSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private val leftSchema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("t", LongType)))
  private val rightSchema = StructType(Seq(
    StructField("k", StringType), StructField("t", LongType),
    StructField("rid", LongType), StructField("tag", StringType)))

  private val left = df(leftSchema,
    Row(1L, "a", 10L), // after a's first right row
    Row(2L, "a", 25L), // between a's rights
    Row(3L, "a", 30L), // EXACTLY at a right ts — must match it
    Row(4L, "b", 5L),  // before any b right row — no match
    Row(5L, "b", 99L), // after all b rights — latest wins
    Row(6L, "c", 50L)) // key with no right rows at all
  private val right = df(rightSchema,
    Row("a", 8L, 100L, "a8"),
    Row("a", 20L, 101L, "a20"),
    Row("a", 30L, 102L, "a30"),
    Row("b", 7L, 200L, "b7"),
    Row("b", 40L, 201L, "b40"))

  private lazy val joined = AsOf.asofJoin(
    left, right, key = "k", ts = "t", rightPayload = Seq("rid", "tag"))
    .collect().map(r => r.getLong(0) ->
      (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.getString(5))))
    .toMap

  test("each left row matches the newest right row at-or-before it") {
    joined(1L) shouldBe (Some(8L), Some(100L), Some("a8"))
    joined(2L) shouldBe (Some(20L), Some(101L), Some("a20"))
    joined(5L) shouldBe (Some(40L), Some(201L), Some("b40"))
  }

  test("a right row at exactly the left timestamp matches (at-or-before)") {
    joined(3L) shouldBe (Some(30L), Some(102L), Some("a30"))
  }

  test("left rows with no preceding right row keep null payload") {
    joined(4L) shouldBe (None, None, None)
    joined(6L) shouldBe (None, None, None)
  }

  test("payload is carried atomically — all _r columns from the same row") {
    // every matched (ts_r, rid_r, tag_r) triple must be one of the right
    // rows verbatim; a per-column carry could mix rows
    val rightRows = Set((8L, 100L, "a8"), (20L, 101L, "a20"),
      (30L, 102L, "a30"), (7L, 200L, "b7"), (40L, 201L, "b40"))
    joined.values.collect { case (Some(t), Some(r), Some(g)) => (t, r, g) }
      .foreach(m => rightRows should contain(m))
  }

  test("plan is one key shuffle + window — no nested-loop/cartesian join") {
    val plan = AsOf.asofJoin(left, right, "k", "t", Seq("rid"))
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    plan should include("Window")
    // both sides flow through a single hashpartitioning exchange on the key
    "Exchange hashpartitioning\\(k".r.findAllIn(plan).size shouldBe 1
  }

  test("left rows never disappear or duplicate (exactly |left| out)") {
    AsOf.asofJoin(left, right, "k", "t", Seq("rid")).count() shouldBe left.count()
  }

  test("NULL right timestamps never match (ASOF parity on dirty data)") {
    // A NULL-ts right row would sort FIRST (asc = nulls first) and carry a
    // non-null payload — without the filter it becomes the "match" for
    // every left row preceding any real right row. DuckDB's ASOF (the
    // oracle semantics) never matches a NULL timestamp.
    val dirtyRight = df(rightSchema,
      Row("a", null, 900L, "poison"), // must never match anyone
      Row("a", 20L, 101L, "a20"),
      Row("b", null, 901L, "poison"))
    val got = AsOf.asofJoin(left, dirtyRight, "k", "t", Seq("rid", "tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(5))).toMap
    got(1L) shouldBe None              // t=10 precedes a20 — not "poison"
    got(2L) shouldBe Some("a20")
    got(4L) shouldBe None              // b has only the NULL-ts row
    got(5L) shouldBe None
  }

  test("NULL left timestamps get the defined no-match (null payload)") {
    val dirtyLeft = df(leftSchema, Row(7L, "a", null))
    val got = AsOf.asofJoin(dirtyLeft, right, "k", "t", Seq("rid"))
      .collect()
    got.length shouldBe 1
    got.head.isNullAt(3) shouldBe true
  }

  test("tolerance: matches older than the bound null out, fresh ones survive") {
    def tsec(s: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val lSchema = StructType(Seq(
      StructField("id", LongType), StructField("k", StringType),
      StructField("t", TimestampType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("t", TimestampType),
      StructField("rid", LongType)))
    val l = df(lSchema,
      Row(1L, "a", tsec(1000L)),  // 600 s after the right row → fresh
      Row(2L, "a", tsec(2000L)))  // 1600 s after → stale, nulled
    val r = df(rSchema, Row("a", tsec(400L), 100L))
    val got = AsOf.asofJoinTolerance(l, r, "k", "t", Seq("rid"),
        toleranceUs = 900L * 1000000L)
      .collect().map(x => x.getLong(0) ->
        (Option(x.getAs[Any]("t_r")), Option(x.getAs[Any]("rid_r")))).toMap
    got(1L)._1 should not be None
    got(1L)._2 shouldBe Some(100L)
    got(2L) shouldBe ((None, None))
  }
}
