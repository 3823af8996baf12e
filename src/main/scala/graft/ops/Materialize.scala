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
  * Lifecycle: every index directory is registered in a live set;
  * [[dropAll]] deletes them once the consuming query's terminal action
  * has run. Query batteries (Bench/Verify) and any long-lived serving
  * process call it between statements — `deleteOnExit` alone would leak
  * one directory per dedup/ANN query onto local disk for the life of the
  * JVM (the round-1 memory-accumulation lesson, one level down the
  * storage hierarchy). At 100 TB the same call writes a bucketed table
  * to the lake and `dropAll` is the table-retention policy.
  */
object Materialize {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-index")
    p.toFile.deleteOnExit()
    p
  }

  private val live =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  /** Materialize `df` as a parquet index table and return a fresh scan of
    * it. `tag` names the index for debuggability; the directory is unique
    * per call, so concurrent queries never clobber each other. */
  def index(df: DataFrame, tag: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(root, tag)
    live.add(dir)
    df.write.mode("overwrite").parquet(dir.toString)
    df.sparkSession.read.parquet(dir.toString)
  }

  /** Ensure a heavy map stage (per-shingle md5 loops, signature
    * computation) gets at least the session's core parallelism. A parquet
    * file is split by byte range but never below row-group granularity, so
    * a single-row-group file — however large — feeds exactly ONE task and
    * the whole map stage runs serially. Repartition only when the input's
    * parallelism is actually short: on a many-file / many-row-group lake
    * layout this is a no-op, so at 100 TB no extra shuffle happens; when
    * it does fire, it moves the raw input once to unlock a cores-wide
    * compute stage that dominates it. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** A fresh scratch directory under the index root, registered for
    * [[dropAll]] like any index — for operators that manage their own
    * write (e.g. [[Layout.compact]]'s output table). */
  def scratchDir(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(root, tag)
    live.add(dir)
    dir.toString
  }

  /** Number of index directories currently on disk. */
  def liveCount: Int = live.size()

  /** Delete every index directory created so far. Only call after the
    * terminal action of every query whose plan reads them — the returned
    * DataFrames scan these files lazily. */
  def dropAll(): Unit = {
    val it = live.iterator()
    while (it.hasNext) {
      deleteRecursively(it.next().toFile)
      it.remove()
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
