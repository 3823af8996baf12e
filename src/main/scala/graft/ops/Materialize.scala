package graft.ops

import org.apache.spark.sql.DataFrame

/** The "build the index once" step shared by the dedup/similarity
  * operators: write an intermediate table (signatures, buckets, token
  * sets) to parquet and read it back.
  *
  * Why parquet and not `localCheckpoint`/`persist`:
  *   - lineage is truncated *durably* — on a real cluster the write goes
  *     to the shared FS, so executor loss doesn't kill the job the way
  *     lost localCheckpoint blocks do;
  *   - zero executor-memory footprint after the write — checkpoint blocks
  *     otherwise accumulate across a query battery and amplify GC/memory
  *     pressure (the round-1 driver bench degraded 10-50× on the queries
  *     *after* the first checkpoint-heavy one for exactly this reason);
  *   - both sides of a self-join read the same files instead of
  *     recomputing the signature expression tree through the join lineage
  *     (a >100× slowdown observed with naive lineage).
  *
  * Each call gets a unique directory under java.io.tmpdir (deleted on JVM
  * exit); at 100 TB the same call writes a bucketed table to the lake.
  */
object Materialize {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-index")
    p.toFile.deleteOnExit()
    p
  }

  /** Materialize `df` as a parquet index table and return a fresh scan of
    * it. `tag` names the index for debuggability; the directory is unique
    * per call, so concurrent queries never clobber each other. */
  def index(df: DataFrame, tag: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(root, tag).toString
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }
}
