package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side table layout: compaction + clustering for lake tables.
  *
  * At 100 TB the write layout decides every later read's cost:
  *   - many small files ⇒ driver-side listing and task-scheduling
  *     overhead dominate (the "small files problem"); readers want files
  *     near the FS block / row-group sweet spot;
  *   - rows clustered on the dominant filter column ⇒ per-file min/max
  *     footer stats prune whole files (zone-map skipping), and
  *     range-partitioned output aligns partition pruning with the
  *     predicate.
  *
  * `compact` is both knobs in one pass: range-repartition on the cluster
  * key (one shuffle, contiguous key ranges per output file) + sort WITHIN
  * each partition (exact footer min/max), with file count derived from a
  * target rows-per-file. Hive-style directory partitioning stays the
  * caller's choice via `partitionBy` — this operator fixes the
  * file-grain, not the directory-grain.
  */
object Layout {

  /** Rewrite `df` under `outDir` as ~`ceil(rows / targetRowsPerFile)`
    * parquet files, range-clustered and sorted on `clusterCols`.
    * Returns a scan of the compacted table. */
  def compact(
      df: DataFrame,
      outDir: String,
      targetRowsPerFile: Long,
      clusterCols: Seq[String]): DataFrame = {
    require(clusterCols.nonEmpty, "compact needs at least one cluster column")
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val spark = df.sparkSession
    // The file count needs a row count BEFORE the write, but counting the
    // raw `df` and then writing it executes the full upstream lineage
    // TWICE — for a compaction fed by anything beyond a bare scan (a
    // cleanse pipeline, a join) that doubles the job. Materialize once
    // (localCheckpoint: executor-local blocks, lineage truncated), count
    // the materialized blocks, write from them, then release the blocks.
    val mat = df.localCheckpoint(eager = true)
    try {
      val rows = mat.count()
      val files = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      val keyCols = clusterCols.map(col)
      mat.repartitionByRange(files, keyCols: _*)
        .sortWithinPartitions(keyCols: _*)
        .write.mode(SaveMode.Overwrite).parquet(outDir)
    } finally org.apache.spark.sql.graftshim.GraftSessions.unpersistLocalCheckpoint(mat)
    spark.read.parquet(outDir)
  }

  /** Per-file layout audit of a parquet table: row count and cluster-key
    * min/max per file — the zone-map view a reader's file-skipping sees.
    * Computed from the data keyed by `input_file_name`, no driver-side
    * footer parsing. */
  def fileStats(df: DataFrame, clusterCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        min(col(clusterCol)).as("key_min"),
        max(col(clusterCol)).as("key_max"))
}
