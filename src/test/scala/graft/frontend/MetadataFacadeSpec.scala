package graft.frontend

import graft.SparkFixture
import graft.schema._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** JDBC metadata facade behaviors, mirroring the reference's
  * `TestFineoMeta.java` pins: constant catalog FINEO, tenant filtering,
  * SQL-LIKE pattern matching (`RegexpUtil.sqlToRegexLike`). */
class MetadataFacadeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark

  private val registry = SchemaRegistry(
    Org("org1", Seq(
      Metric("m1", "device_events", Seq(
        Field("temp", FieldType.DOUBLE),
        Field("ok", FieldType.BOOLEAN)), radioEnabled = true),
      Metric("m2", "heartbeats", Seq(Field("seq", FieldType.LONG))))),
    Org("org2", Seq(Metric("m9", "secret_metric", Seq(Field("z", FieldType.STRING))))))

  private def facade = new MetadataFacade(spark, registry, "org1")

  test("getCatalogs returns the single constant catalog") {
    facade.getCatalogs.collect().map(_.getString(0)).toSeq shouldBe Seq("FINEO")
  }

  test("getSchemas honors patterns; non-matching pattern yields empty, not error") {
    facade.getSchemas().collect().map(_.getString(0)).toSeq shouldBe Seq("FINEO")
    facade.getSchemas(schemaPattern = "FIN%").collect() should have length 1
    facade.getSchemas(schemaPattern = "fineo").collect() should have length 1 // case-insensitive
    facade.getSchemas(schemaPattern = "NOPE%").collect() shouldBe empty
  }

  test("getTables is tenant-filtered and pattern-matched") {
    facade.getTables().collect().map(_.getString(2)).toSeq shouldBe
      Seq("device_events", "heartbeats")
    // another org's tables never appear
    facade.getTables().collect().map(_.getString(2)) should not contain "secret_metric"
    facade.getTables(tableNamePattern = "device%").collect()
      .map(_.getString(2)).toSeq shouldBe Seq("device_events")
    facade.getTables(tableNamePattern = "heart_eats").collect()
      .map(_.getString(2)).toSeq shouldBe Seq("heartbeats") // _ matches one char
    facade.getTables(types = Seq("VIEW")).collect() shouldBe empty
    facade.getTables(types = Seq("TABLE", "VIEW")).collect() should have length 2
  }

  test("getColumns lists declared fields with base timestamp first and JDBC types") {
    val rows = facade.getColumns(tableNamePattern = "device_events").collect()
    rows.map(_.getString(3)).toSeq shouldBe Seq("timestamp", "temp", "ok", "_fm")
    rows.map(_.getInt(6)).toSeq shouldBe Seq(1, 2, 3, 4) // ordinal positions
    val byName = rows.map(r => r.getString(3) -> (r.getInt(4), r.getString(5))).toMap
    byName("timestamp") shouldBe (java.sql.Types.BIGINT, "BIGINT")
    byName("temp") shouldBe (java.sql.Types.DOUBLE, "DOUBLE")
    byName("ok") shouldBe (java.sql.Types.BOOLEAN, "BOOLEAN")
    byName("_fm") shouldBe (java.sql.Types.OTHER, "MAP")
    // column pattern filters
    facade.getColumns(columnNamePattern = "te%").collect()
      .map(_.getString(3)).toSeq shouldBe Seq("temp")
  }

  test("getTypeInfo covers the Avro primitive surface; getTableTypes serves TABLE") {
    val types = facade.getTypeInfo.collect().map(_.getString(0)).toSet
    types shouldBe Set(
      "VARCHAR", "BOOLEAN", "BINARY", "INTEGER", "BIGINT", "FLOAT", "DOUBLE", "DECIMAL")
    facade.getTableTypes.collect().map(_.getString(0)).toSeq shouldBe Seq("TABLE")
  }

  test("sqlToRegexLike escapes regex metacharacters and honors the escape char") {
    MetadataFacade.sqlToRegexLike("a%b") shouldBe "\\Qa\\E.*\\Qb\\E"
    "a.b".matches(MetadataFacade.sqlToRegexLike("a_b")) shouldBe true
    "axb".matches(MetadataFacade.sqlToRegexLike("a_b")) shouldBe true
    "a.b".matches(MetadataFacade.sqlToRegexLike("a.b")) shouldBe true
    "axb".matches(MetadataFacade.sqlToRegexLike("a.b")) shouldBe false // dot is literal
    "a_b".matches(MetadataFacade.sqlToRegexLike("a\\_b")) shouldBe true // escaped _ is literal
    "axb".matches(MetadataFacade.sqlToRegexLike("a\\_b")) shouldBe false
  }
}
