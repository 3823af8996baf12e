package graft.core

import graft.schema.{Field, FieldType, Metric}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field recombination: maps raw storage rows (any mix of user names,
  * aliases, canonical names, unknown fields) onto a metric's declared
  * schema.
  *
  * Re-expresses the reference's recombinator operator pair — the logical
  * rule (`fineo-adapter-drill/.../recombinator/logical/FineoRecombinatorRule.java:49-177`)
  * and the vector-level physical batch
  * (`.../recombinator/physical/batch/RecombinatorRecordBatch.java:79-239`) —
  * as a single declarative projection: coalesce(alias columns) + cast +
  * null-fill + tenant filter + `_fm` map assembly. Catalyst then gets full
  * freedom to push the tenant/time filters into the scan and prune columns,
  * and the whole thing stays inside WholeStageCodegen; there is no
  * SINGLETON bottleneck like the reference's `FineoRecombinatorPrule`
  * (SURVEY.md §4 R11) — recombination is embarrassingly parallel.
  */
object Recombinator {

  /** Recombine a raw storage DataFrame onto the metric's declared schema.
    *
    * @param bytesAreBase64 JSON stores BYTES fields base64-encoded
    *                       (reference wraps BINARY casts in
    *                       `FINEO_BASE64_DECODE`, `FineoRecombinatorRule.java:130-139`);
    *                       parquet stores real binary.
    */
  def recombine(
      raw: DataFrame,
      orgId: String,
      metric: Metric,
      bytesAreBase64: Boolean = false): DataFrame = {
    val filtered = tenantFilter(raw, orgId, metric)
    project(filtered, metric, bytesAreBase64)
  }

  /** Tenant/metric row filter: `companykey = org AND metrictype = canonicalId`
    * (the FS branch of the reference rule; the Dynamo branch filters on
    * `partition-key = concat(org, metricId)` — see [[graft.nearline]]). */
  def tenantFilter(raw: DataFrame, orgId: String, metric: Metric): DataFrame = {
    val cols = lowerColumnSet(raw)
    var df = raw
    if (cols.contains(Metric.OrgKey)) df = df.filter(col(Metric.OrgKey) === orgId)
    if (cols.contains(Metric.MetricTypeKey))
      df = df.filter(col(Metric.MetricTypeKey) === metric.canonicalId)
    df
  }

  /** The declared-schema projection (no filtering). */
  def project(df: DataFrame, metric: Metric, bytesAreBase64: Boolean): DataFrame = {
    val byLower: Map[String, StructField] =
      df.schema.fields.map(f => f.name.toLowerCase -> f).toMap

    def storageCol(name: String): Option[(Column, DataType)] =
      byLower.get(name.toLowerCase).map(sf => (col(s"`${sf.name}`"), sf.dataType))

    // One declared field <- coalesce over its source columns in precedence
    // order (user name, aliases, cname); each cast to the declared type
    // first so coalesce is type-stable. Only non-null values win, matching
    // the physical batch's "only write non-null" tie-break
    // (RecombinatorRecordBatch.java:211-217).
    def fieldCol(f: Field): Column = {
      val sources = f.sourceColumns.flatMap(storageCol(_).map {
        case (c, dt) => castTo(c, dt, f.sparkType, bytesAreBase64)
      })
      val c =
        if (sources.isEmpty) lit(null).cast(f.sparkType) // null-fill missing declared fields
        else if (sources.size == 1) sources.head
        else coalesce(sources: _*)
      c.as(f.name)
    }

    // timestamp base field: always BIGINT epoch millis; nearline sources
    // deliver it as a string (N-as-string), so cast unconditionally.
    val tsCol = storageCol(Metric.TimestampField) match {
      case Some((c, _)) => c.cast(LongType).as(Metric.TimestampField)
      case None         => lit(null).cast(LongType).as(Metric.TimestampField)
    }

    val userCols = metric.fields.map(fieldCol)

    // Radio: unknown storage fields -> `_fm` map<string,string>, dropping
    // null entries per row. A storage column literally named `_fm` is itself
    // unknown and lands in the map (TestFineoRadio.testUnknownFieldWithRadioName).
    val radioCols =
      if (!metric.radioEnabled) Nil
      else {
        val known = metric.knownStorageColumns
        val unknown = df.schema.fields
          .filter(sf => !known.contains(sf.name.toLowerCase))
          .sortBy(_.name)
        if (unknown.isEmpty)
          Seq(lit(null).cast(MapType(StringType, StringType)).as(Metric.RadioField))
        else {
          val m = map_from_arrays(
            array(unknown.map(sf => lit(sf.name)): _*),
            array(unknown.map(sf => col(s"`${sf.name}`").cast(StringType)): _*))
          Seq(map_filter(m, (_, v) => v.isNotNull).as(Metric.RadioField))
        }
      }

    df.select((tsCol +: userCols) ++ radioCols: _*)
  }

  /** Cast a storage column to a declared type, honoring the base64 rule for
    * BYTES read from JSON text. */
  private def castTo(
      c: Column,
      storageType: DataType,
      declared: DataType,
      bytesAreBase64: Boolean): Column =
    declared match {
      case BinaryType if storageType == StringType && bytesAreBase64 => unbase64(c)
      case _ if storageType == declared => c
      case dt => c.cast(dt)
    }

  private def lowerColumnSet(df: DataFrame): Set[String] =
    df.schema.fieldNames.map(_.toLowerCase).toSet
}
