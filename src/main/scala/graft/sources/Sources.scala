package graft.sources

import graft.core.TimeRange

/** Archive (filesystem) source directory, reference layout
  * `basedir/<version>/<format>/<org>/<metricId>/…`
  * (`SubTableScanBuilder.java:106-112`). We diverge from the reference's
  * `Date.toString()` date directories and use Hive-style `date=YYYY-MM-DD`
  * partition dirs instead, so Spark's native partition pruning replaces the
  * reference's custom `_fd0` PruneScanRule machinery (SURVEY.md §4 R7) —
  * at 100 TB this is the difference between listing every file and reading
  * only matching partitions' footers.
  */
case class FsSource(format: String, basedir: String) {
  require(format == "json" || format == "parquet", s"unsupported format $format")
  def metricPath(orgId: String, metricCanonicalId: String, version: String = "0"): String =
    s"$basedir/$version/$format/$orgId/$metricCanonicalId"
}

/** A nearline (recent-writes) table covering the time window
  * [startMillis, endMillis). The reference encodes the range in the
  * DynamoDB table name `<prefix><start>_<end>` and parses it back
  * (`DynamoTimestampHandler.java:50-54`); we keep the same convention. */
case class NearlineTableDesc(name: String, path: String, startMillis: Long, endMillis: Long) {
  def covers(range: TimeRange): Boolean = range.overlaps(startMillis, endMillis)
}

object NearlineTableDesc {
  /** Parse `[start]_[end]` out of a table name with the given prefix. */
  def parseRange(prefix: String, name: String): Option[(Long, Long)] =
    if (!name.startsWith(prefix)) None
    else name.stripPrefix(prefix).split('_') match {
      case Array(s, e) => try Some((s.toLong, e.toLong)) catch { case _: NumberFormatException => None }
      case _ => None
    }
}

/** The full set of physical sources backing one org's metrics.
  *
  * @param keyMapper nearline partition-key scheme for THIS deployment —
  *   every nearline read under this source set composes its hash-key
  *   filter through it (reference `DynamoKeyMapper` pluggability). */
case class SourceSet(
    fs: Seq[FsSource] = Nil,
    nearline: Seq[NearlineTableDesc] = Nil,
    keyMapper: KeyMapper = KeyMapper.Concat) {
  def minNearlineStart: Option[Long] =
    if (nearline.isEmpty) None else Some(nearline.map(_.startMillis).min)

  /** Time-range source pruning (reference R1,
    * `ConvertFineoMarkerIntoFilteredInputTables.java:183-285`): drop
    * nearline tables whose window can't contain rows in `range`. FS sources
    * always stay (their pruning is per-partition-dir, handled natively by
    * the parquet/json scan). */
  def prune(range: TimeRange): SourceSet =
    if (range.isFull) this
    else copy(nearline = nearline.filter(_.covers(range)))
}
