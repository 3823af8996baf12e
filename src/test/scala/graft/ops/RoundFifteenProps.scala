package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-15 property pins for byte-order string zones: over ANY
  * committed table whose STRING cluster keys mix ASCII, high-BMP
  * ([U+E000, U+FFFF]) and supplementary-plane code points — exactly
  * the ranges where UTF-16 code-unit order and UTF-8 byte order
  * disagree — the witness-zone-pruned read is LOSSLESS: filtering the
  * pruned scan by any probed key subset equals filtering the full
  * scan. The r14 zone props covered ASCII keys only, which is how the
  * UTF-16 comparison shipped as a latent defect; this generator makes
  * the divergent ranges first-class. */
object RoundFifteenProps extends Properties("RoundFifteen") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkFixture.spark

  // code points drawn from the three regimes; surrogate range excluded
  // (not encodable alone), everything else fair game
  private val genCodePoint: Gen[Int] = Gen.oneOf(
    Gen.choose('a'.toInt, 'z'.toInt),          // ASCII
    Gen.choose(0xE000, 0xFFFD),                // high BMP (sorts HIGH in UTF-16)
    Gen.choose(0x1F300, 0x1F64F),              // supplementary (sorts LOW in UTF-16)
    Gen.choose(0x0391, 0x03C9))                // Greek (2-byte UTF-8)

  private val genKey: Gen[String] = for {
    len <- Gen.choose(1, 6)
    cps <- Gen.listOfN(len, genCodePoint)
  } yield cps.flatMap(Character.toChars(_).toSeq).mkString

  private val genCase: Gen[(List[String], List[String], Int)] = for {
    n <- Gen.choose(12, 60)
    all <- Gen.listOfN(n, genKey)
    distinct = all.distinct
    nProbe <- Gen.choose(0, 6)
    probes <- Gen.listOfN(nProbe, Gen.oneOf(genKey, Gen.oneOf(
      if (distinct.nonEmpty) distinct else List("x"))))
    rowsPerFile <- Gen.choose(2, 9)
  } yield (distinct, probes.distinct, rowsPerFile)

  // --- canonicalSchema: the schema-drift comparator itself (pure) ----
  private val genField: Gen[org.apache.spark.sql.types.StructField] = for {
    name <- Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    dt <- Gen.oneOf[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.DoubleType,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.BooleanType)
    nullable <- Gen.oneOf(true, false)
  } yield org.apache.spark.sql.types.StructField(name, dt, nullable)

  private val genSchema: Gen[org.apache.spark.sql.types.StructType] =
    Gen.choose(1, 7).flatMap(n => Gen.listOfN(n, genField))
      .map(fs => org.apache.spark.sql.types.StructType(
        fs.groupBy(_.name).map(_._2.head).toSeq)) // distinct names

  property("canonicalSchema: reorder + nullability invariant; name/type changes detected") =
    forAll(genSchema, Gen.long) { (schema, seed) =>
      import org.apache.spark.sql.types._
      val rnd = new scala.util.Random(seed)
      val shuffled = StructType(rnd.shuffle(schema.fields.toSeq))
      val flipped = StructType(shuffled.fields.map(f =>
        f.copy(nullable = !f.nullable)))
      val same =
        StandingState.canonicalSchema(schema) ==
          StandingState.canonicalSchema(flipped)
      // any single retype (to a type not already the field's) must differ
      val len = schema.fields.length
      val f0 = schema.fields((((seed % len) + len) % len).toInt)
      val newType = if (f0.dataType == LongType) StringType else LongType
      val retyped = StructType(schema.fields.map(f =>
        if (f.name == f0.name) f.copy(dataType = newType) else f))
      val typeDiffers =
        StandingState.canonicalSchema(schema) !=
          StandingState.canonicalSchema(retyped)
      // and a dropped field must differ
      val dropped = StructType(schema.fields.filterNot(_.name == f0.name))
      val dropDiffers =
        StandingState.canonicalSchema(schema) !=
          StandingState.canonicalSchema(dropped)
      same && typeDiffers && dropDiffers
    }

  property("zone-pruned read lossless over mixed-plane string keys, any probes") =
    forAll(genCase) { case (keys, probes, rowsPerFile) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit}
      val store = SparkFixture.tempDir("p15-utf8zone")
      StandingState.writeTables(store, Seq(StandingState.TableSpec(
        "t", keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
          .toDF("k", "v"), "k")),
        targetRowsPerFile = rowsPerFile.toLong)
      val pruned = StandingState.readTablePruned(spark, store, "t", probes)
      val full = StandingState.readTable(spark, store, "t")
      def hit(df: org.apache.spark.sql.DataFrame) =
        (if (probes.isEmpty) df.filter(lit(false))
         else df.filter(col("k").isin(probes: _*)))
          .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq
      hit(pruned) == hit(full)
    }
}
