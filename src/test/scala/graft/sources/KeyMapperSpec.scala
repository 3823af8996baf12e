package graft.sources

import graft.SparkFixture
import graft.core.Assembler
import graft.schema.{Field, FieldType, Metric}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pluggable key composition (reference `DynamoKeyMapper` /
  * `TestDynamoKeyMapper.java`): a deployment with a different partition-key
  * scheme configures one mapper on its SourceSet instead of forking the
  * stub. The load-bearing property is literal/column parity — the read
  * side filters on [[KeyMapper.partitionKey]] while the write side derives
  * keys with [[KeyMapper.partitionKeyCol]]; any disagreement reads zero
  * rows silently. */
class KeyMapperSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private val mappers = Seq[(String, KeyMapper)](
    "concat" -> KeyMapper.Concat,
    "delimited" -> KeyMapper.Delimited("|"),
    "hash-prefixed" -> KeyMapper.HashPrefixed(4),
    "hash-prefixed-delimited" -> KeyMapper.HashPrefixed(8, KeyMapper.Delimited("#")))

  test("literal and column composition agree bit-for-bit, for every mapper") {
    val pairs = Seq(
      ("org1", "m_events"), ("o", ""), ("", "m"), ("同じ", "テナント"),
      ("org|with|delims", "metric#x"), ("a" * 100, "b" * 100))
    val df = spark.createDataFrame(
      pairs.map { case (o, m) => Row(o, m) }.asJava,
      StructType(Seq(StructField("org", StringType), StructField("metric", StringType))))
    for ((name, mapper) <- mappers) {
      val fromCol = df
        .select(mapper.partitionKeyCol(col("org"), col("metric")).as("k"))
        .collect().map(_.getString(0)).toSeq
      val fromLit = pairs.map { case (o, m) => mapper.partitionKey(o, m) }
      withClue(s"mapper $name: ") { fromCol shouldBe fromLit }
    }
  }

  test("distinct (org, metric) pairs stay distinct under every mapper") {
    // concat is knowingly ambiguous ("ab"+"c" == "a"+"bc" — the reference's
    // own default has this property); the recoverable schemes must not be.
    val pairs = Seq(("ab", "c"), ("a", "bc"), ("abc", ""))
    for ((name, mapper) <- mappers.filterNot(_._1 == "concat")) {
      val keys = pairs.map { case (o, m) => mapper.partitionKey(o, m) }
      withClue(s"mapper $name: ") { keys.distinct.size shouldBe pairs.size }
    }
  }

  test("hash prefix has the declared width and preserves the inner key") {
    // default inner is Delimited("|") — unambiguous (see previous test);
    // the reference's concat scheme is an explicit opt-in
    val k = KeyMapper.HashPrefixed(6).partitionKey("org1", "m1")
    k.length shouldBe 6 + "org1|m1".length
    k.substring(6) shouldBe "org1|m1"
    k.substring(0, 6).forall(c => c.isDigit || ('a' to 'f').contains(c)) shouldBe true
  }

  test("assembled metric table honors a non-default mapper end-to-end") {
    val mapper = KeyMapper.HashPrefixed(4, KeyMapper.Delimited("|"))
    val dir = SparkFixture.tempDir("keymap")
    val metric = Metric("mk", "keyed_metric", Seq(Field("v", FieldType.LONG)))

    // write nearline items under the non-default key scheme
    val itemSchema = StructType(Seq(
      StructField("partition", StringType), StructField("sort", StringType),
      StructField("ids", ArrayType(StringType)),
      StructField("v", MapType(StringType, StringType))))
    val items = Seq(
      Row(mapper.partitionKey("orgk", "mk"), "100", Seq("w1"), Map("w1" -> "7")),
      Row(mapper.partitionKey("orgk", "mk"), "200", Seq("w1"), Map("w1" -> "8")),
      // another tenant's row in the same physical table must not leak in
      Row(mapper.partitionKey("other", "mk"), "150", Seq("w1"), Map("w1" -> "99")))
    spark.createDataFrame(items.asJava, itemSchema)
      .write.mode("overwrite").parquet(s"$dir/t_0_1000")

    val sources = SourceSet(
      nearline = Seq(NearlineTableDesc("t_0_1000", s"$dir/t_0_1000", 0L, 1000L)),
      keyMapper = mapper)
    val rows = Assembler.metricTable(spark, "orgk", metric, sources)
      .select("timestamp", "v").collect()
    rows.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((100L, 7L), (200L, 8L))

    // the same table read under the DEFAULT mapper finds nothing — the
    // scheme mismatch is loud in this spec so it can't be silent in prod
    val defaultRead = Assembler.metricTable(
      spark, "orgk", metric, sources.copy(keyMapper = KeyMapper.Concat))
    defaultRead.count() shouldBe 0L
  }
}
