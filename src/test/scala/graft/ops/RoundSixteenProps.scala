package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-16 property pins for the DECLARATIVE argmax: over random
  * grouped (cid, key) streams whose keys deliberately mix NaN, ±0.0,
  * ±Infinity and ordinary doubles — the exact values where double
  * orderings fork — [[graft.functions.ArgMaxCell]] equals the
  * `max(struct)` oracle bit for bit (ties included), and the
  * `nanSmallest` negated-key form equals `min(struct)` (where a NaN
  * key NEVER wins). These are the orderings every serving-path
  * reduction (centroid assignment, PQ code assignment, keeper
  * selection) rests on. */
object RoundSixteenProps extends Properties("RoundSixteen") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkFixture.spark

  private val genKeyDouble: Gen[Double] = Gen.oneOf(
    Gen.oneOf(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.0, -1.0),
    Gen.choose(-4, 4).map(_.toDouble / 2), // engineered ties
    Gen.choose(-1e6, 1e6).map(x => math.rint(x) / 16))

  private val genRows: Gen[List[(Long, Int, Double)]] = for {
    n <- Gen.choose(1, 80)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0L, 5L)
      cid <- Gen.choose(0, 9)
      k <- genKeyDouble
    } yield (g, cid, k))
  } yield rows

  property("ArgMaxCell ≡ max(struct(key, -cid)) on NaN/±0/±Inf streams") =
    forAll(genRows) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.graftshim.ColumnExpr
      val df = rows.toDF("g", "cid", "s")
      val got = df.groupBy("g")
        .agg(ColumnExpr.column(graft.functions.ArgMaxCell(
          ColumnExpr.expr(col("cid").cast("int")),
          ColumnExpr.expr(col("s").cast("double"))).toAggregateExpression())
          .as("c"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val oracle = df.groupBy("g")
        .agg(max(struct(col("s"), (-col("cid")).as("negcid"))).as("m"))
        .select(col("g"), (-col("m.negcid")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      got == oracle
    }

  property("nanSmallest argmin-via-negation ≡ min(struct(key, cid)): NaN never wins") =
    forAll(genRows) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.graftshim.ColumnExpr
      val df = rows.toDF("g", "cid", "d2")
      val got = df.select(col("g"), col("cid"), (-col("d2")).as("s"))
        .groupBy("g")
        .agg(ColumnExpr.column(graft.functions.ArgMaxCell(
          ColumnExpr.expr(col("cid").cast("int")),
          ColumnExpr.expr(col("s").cast("double")),
          nanSmallest = true).toAggregateExpression()).as("c"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val oracle = df.groupBy("g")
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("g"), col("m.cid").as("c"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      got == oracle
    }

  property("ArgMaxLong preferLowValue tie side ≡ max(struct(key, -v)) / high ≡ max(struct(key, v))") =
    forAll(genRows, Gen.oneOf(true, false)) { (rows, preferLow) =>
      import spark.implicits._
      import org.apache.spark.sql.graftshim.ColumnExpr
      val df = rows.map { case (g, cid, k) => (g, cid.toLong, k) }
        .toDF("g", "v", "key")
      val got = df.groupBy("g")
        .agg(ColumnExpr.column(graft.functions.ArgMaxLong(
          ColumnExpr.expr(col("v").cast("long")),
          ColumnExpr.expr(col("key").cast("double")),
          preferLowValue = preferLow).toAggregateExpression()).as("w"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val tieCol = if (preferLow) (-col("v")).as("tv") else col("v").as("tv")
      val unTie = if (preferLow) -col("m.tv") else col("m.tv")
      val oracle = df.groupBy("g")
        .agg(max(struct(col("key"), tieCol)).as("m"))
        .select(col("g"), unTie.cast("long").as("w"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == oracle
    }
}
