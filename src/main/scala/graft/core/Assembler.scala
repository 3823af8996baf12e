package graft.core

import graft.schema.Metric
import graft.sources.{FsSource, NearlineStub, SourceSet}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Assembles the per-metric logical table: the reference's whole custom
  * plan chain — marker rel → source selection → per-source recombination →
  * UNION ALL → overlap cutoff → sort (SURVEY.md §3, lifecycle steps 5-6) —
  * as eager DataFrame construction. Source selection happens here, at
  * assembly time, from the caller-supplied time predicate; Catalyst then
  * handles everything the reference needed bespoke rules for (filter
  * pushdown past the union, partition pruning on `date=`, column pruning).
  */
object Assembler {

  /** Build the time-ordered DataFrame for one (org, metric).
    *
    * @param timeFilter optional predicate over this metric's columns; its
    *   `timestamp` bounds (extracted with [[TimeRange]]'s conservative
    *   rules) drive nearline-table pruning; the predicate itself is also
    *   applied as a normal row filter (residual semantics).
    * @param sorted the table contract is time-ordered output
    *   (`FineoRecombinatorRule.java:171-177`); pass false for inner use
    *   where an aggregation on top would destroy order anyway.
    */
  def metricTable(
      spark: SparkSession,
      orgId: String,
      metric: Metric,
      sources: SourceSet,
      timeFilter: Option[Column] = None,
      sorted: Boolean = true): DataFrame = {
    val range = timeFilter.map(TimeRange.extract(Metric.TimestampField, _)).getOrElse(TimeRange.Full)
    val pruned = sources.prune(range)

    val fsDfs = pruned.fs.flatMap(readFs(spark, _, orgId, metric))

    // Overlap de-duplication by cutoff, not by key (reference R2,
    // `ConvertFineoMarkerIntoFilteredInputTables.java:144-177`): archive
    // rows whose timestamp falls inside some nearline window [start, end)
    // are dropped — nearline wins on a timestamp present in both. The
    // reference cuts everything >= min(start), which silently loses archive
    // rows falling in a GAP between non-contiguous nearline windows; the
    // per-window exclusion is identical when windows are contiguous (the
    // deployed layout) and strictly lossless when they are not. The
    // predicate is a short OR over window bounds — it pushes to the scan
    // as plain range filters.
    val cutFsDfs =
      if (pruned.nearline.nonEmpty && fsDfs.nonEmpty) {
        val ts = col(Metric.TimestampField)
        val coveredByNearline = pruned.nearline
          .map(w => ts >= w.startMillis && ts < w.endMillis)
          .reduce(_ || _)
        fsDfs.map(_.filter(!coveredByNearline))
      } else fsDfs

    val nearlineDfs = pruned.nearline.map { desc =>
      val raw = NearlineStub.readForMetric(
        spark, desc, orgId, metric.canonicalId, mapper = sources.keyMapper)
      Recombinator.project(raw, metric, bytesAreBase64 = false)
    }

    val all = cutFsDfs ++ nearlineDfs
    require(all.nonEmpty, s"no sources for $orgId/${metric.displayName}")
    val unioned = all.reduce(_.unionByName(_, allowMissingColumns = true))
    val filtered = timeFilter.fold(unioned)(unioned.filter)
    if (sorted) filtered.orderBy(Metric.TimestampField) else filtered
  }

  /** Read + recombine one FS source for a metric. Returns None when the
    * metric's directory doesn't exist in this source (a metric need not be
    * present in every archive generation). */
  private def readFs(
      spark: SparkSession,
      src: FsSource,
      orgId: String,
      metric: Metric): Option[DataFrame] = {
    val path = src.metricPath(orgId, metric.canonicalId)
    if (!new java.io.File(path).exists) return None
    val raw = src.format match {
      // Non-radio metrics read JSON with the registry-derived schema — no
      // inference pass (a full extra read of every file at scale). Radio
      // metrics must infer: unknown columns are their contract.
      case "json" => metric.jsonStorageSchema match {
        case Some(schema) => spark.read.schema(schema).json(path)
        case None         => spark.read.json(path)
      }
      case "parquet" => spark.read.parquet(path)
    }
    Some(Recombinator.recombine(raw, orgId, metric, bytesAreBase64 = src.format == "json"))
  }
}
