package graft.frontend

import graft.schema.{FieldType, SchemaRegistry}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** JDBC-style metadata facade, tenant-scoped — the rebuild of the
  * reference's `FineoDatabaseMetaData.java:39-105` (constant catalog
  * FINEO, delegated + filtered listings) and `RegexpUtil.sqlToRegexLike:
  * 58-120` (SQL-LIKE pattern matching on catalog/schema/table/column
  * patterns). Every BI tool hits these six calls on connect.
  *
  * Results are tiny synthetic DataFrames (the reference hand-rolls
  * `IteratorResult`/`SimpleMetadata` ResultSets); column names and
  * SQL type codes follow `java.sql.DatabaseMetaData`.
  */
class MetadataFacade(
    spark: SparkSession,
    registry: SchemaRegistry,
    orgId: String,
    views: Set[String] = Set.empty) {
  import MetadataFacade._

  /** The single constant catalog every tenant sees. */
  def getCatalogs: DataFrame =
    df(Seq(Row(Catalog)), StructType(Seq(StructField("TABLE_CAT", StringType))))

  /** FINEO (metrics), plus ERRORS when the tenant has a registered errors
    * view — the reference's two tenant-visible schemas
    * (`FineoInfoSchemaUserTranslator.java:96-97` maps
    * `fineo.errors.default` → ERRORS). Patterns that match neither yield
    * an empty result (JDBC contract), not an error. */
  def getSchemas(catalogPattern: String = null, schemaPattern: String = null): DataFrame = {
    val rows =
      if (!matchesLike(catalogPattern, Catalog)) Nil
      else visibleSchemas.filter(matchesLike(schemaPattern, _)).map(Row(_, Catalog))
    df(rows, StructType(Seq(
      StructField("TABLE_SCHEM", StringType), StructField("TABLE_CATALOG", StringType))))
  }

  private def visibleSchemas: Seq[String] =
    Catalog +: (if (views.nonEmpty) Seq(ErrorsSchema) else Nil)

  def getTableTypes: DataFrame =
    df(Seq(Row(TableType)), StructType(Seq(StructField("TABLE_TYPE", StringType))))

  /** Tenant tables matching the LIKE patterns. `types` filters on
    * TABLE_TYPE ("TABLE" is the only type served). */
  def getTables(
      catalogPattern: String = null,
      schemaPattern: String = null,
      tableNamePattern: String = null,
      types: Seq[String] = Nil): DataFrame = {
    val inScope = matchesLike(catalogPattern, Catalog) &&
      (types.isEmpty || types.exists(_.equalsIgnoreCase(TableType)))
    val metricRows =
      if (!inScope || !matchesLike(schemaPattern, Catalog)) Nil
      else registry.listTables(orgId)
        .filter(matchesLike(tableNamePattern, _))
        .map(t => Row(Catalog, Catalog, t, TableType, null))
    val viewRows =
      if (!inScope || !matchesLike(schemaPattern, ErrorsSchema)) Nil
      else views.toSeq.sorted.filter(matchesLike(tableNamePattern, _))
        .map(v => Row(Catalog, ErrorsSchema, v, TableType, null))
    val rows = metricRows ++ viewRows
    df(rows, StructType(Seq(
      StructField("TABLE_CAT", StringType), StructField("TABLE_SCHEM", StringType),
      StructField("TABLE_NAME", StringType), StructField("TABLE_TYPE", StringType),
      StructField("REMARKS", StringType))))
  }

  /** Columns of matching tables: declared fields in declared order, with
    * the base `timestamp` field first (ordinal 1), JDBC type codes per
    * the Avro→SQL mapping (SURVEY.md §1.2). */
  def getColumns(
      catalogPattern: String = null,
      schemaPattern: String = null,
      tableNamePattern: String = null,
      columnNamePattern: String = null): DataFrame = {
    val metricRows =
      if (!matchesLike(catalogPattern, Catalog) || !matchesLike(schemaPattern, Catalog)) Nil
      else for {
        table <- registry.listTables(orgId).filter(matchesLike(tableNamePattern, _))
        metric = registry.metric(orgId, table).get
        (field, idx) <- metric.structType.fields.toSeq.zipWithIndex
        if matchesLike(columnNamePattern, field.name)
      } yield Row(
        Catalog, Catalog, table, field.name,
        jdbcTypeCode(field.dataType), jdbcTypeName(field.dataType),
        idx + 1, if (field.nullable) "YES" else "NO",
        if (field.nullable) 1 else 0) // columnNullable / columnNoNulls
    val viewRows =
      if (!matchesLike(catalogPattern, Catalog) || !matchesLike(schemaPattern, ErrorsSchema)) Nil
      else for {
        v <- views.toSeq.sorted.filter(matchesLike(tableNamePattern, _))
        (field, idx) <- spark.table(v).schema.fields.toSeq.zipWithIndex
        if matchesLike(columnNamePattern, field.name)
      } yield Row(
        Catalog, ErrorsSchema, v, field.name,
        jdbcTypeCode(field.dataType), jdbcTypeName(field.dataType),
        idx + 1, "YES", 1)
    val rows = metricRows ++ viewRows
    df(rows, StructType(Seq(
      StructField("TABLE_CAT", StringType), StructField("TABLE_SCHEM", StringType),
      StructField("TABLE_NAME", StringType), StructField("COLUMN_NAME", StringType),
      StructField("DATA_TYPE", IntegerType), StructField("TYPE_NAME", StringType),
      StructField("ORDINAL_POSITION", IntegerType), StructField("IS_NULLABLE", StringType),
      StructField("NULLABLE", IntegerType))))
  }

  /** The engine's type surface: the Avro primitive set (SURVEY.md §1.2). */
  def getTypeInfo: DataFrame = {
    val rows = FieldType.values.toSeq.map { t =>
      val dt = FieldType.toSpark(t)
      Row(jdbcTypeName(dt), jdbcTypeCode(dt), 1) // typeNullable
    }
    df(rows, StructType(Seq(
      StructField("TYPE_NAME", StringType), StructField("DATA_TYPE", IntegerType),
      StructField("NULLABLE", IntegerType))))
  }

  private def df(rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
}

object MetadataFacade {
  val Catalog = "FINEO"
  /** The errors view's schema name in listings
    * (`FineoInfoSchemaUserTranslator.java:96-97`). */
  val ErrorsSchema = "ERRORS"
  val TableType = "TABLE"

  /** SQL-LIKE pattern → Java regex (reference `RegexpUtil.sqlToRegexLike:
    * 58-120`): `%` → `.*`, `_` → `.`, a backslash escapes the next char,
    * everything else is quoted literally. */
  def sqlToRegexLike(pattern: String, escape: Char = '\\'): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == escape && i + 1 < pattern.length) {
        sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
        i += 1
      } else if (c == '%') sb.append(".*")
      else if (c == '_') sb.append('.')
      else sb.append(java.util.regex.Pattern.quote(c.toString))
      i += 1
    }
    sb.toString
  }

  /** JDBC semantics: a null pattern means "no filter"; matching is
    * case-insensitive (Drill's info schema compares case-insensitively). */
  def matchesLike(pattern: String, value: String): Boolean =
    pattern == null ||
      value.matches("(?i)^" + sqlToRegexLike(pattern) + "$")

  def jdbcTypeCode(dt: DataType): Int = dt match {
    case StringType  => java.sql.Types.VARCHAR
    case BooleanType => java.sql.Types.BOOLEAN
    case BinaryType  => java.sql.Types.BINARY
    case IntegerType => java.sql.Types.INTEGER
    case LongType    => java.sql.Types.BIGINT
    case FloatType   => java.sql.Types.FLOAT
    case DoubleType  => java.sql.Types.DOUBLE
    case _: DecimalType => java.sql.Types.DECIMAL
    case _: MapType  => java.sql.Types.OTHER
    case _           => java.sql.Types.OTHER
  }

  def jdbcTypeName(dt: DataType): String = dt match {
    case StringType  => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case BinaryType  => "BINARY"
    case IntegerType => "INTEGER"
    case LongType    => "BIGINT"
    case FloatType   => "FLOAT"
    case DoubleType  => "DOUBLE"
    // Type LISTING name, not a column's concrete type: precision/scale are
    // per-column attributes (getColumns), the type itself is DECIMAL.
    case _: DecimalType => "DECIMAL"
    case m: MapType  => "MAP"
    case other       => other.sql
  }
}
