package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED standing state for the incremental maintenance family —
  * the production seam the in-query incremental ops
  * (`pipeline_asset_manifest_incremental`, `decontam_eval_delta`) only
  * simulated: a nightly ingest job READS yesterday's standing tables
  * from the lake, folds tonight's delta against them, and WRITES
  * today's tables — the base corpus is never re-fingerprinted and the
  * cluster closure is sized by the delta (the
  * [[graft.ops.Cluster.mergeClusters]] contract, applied across a real
  * write/read boundary).
  *
  * Layout under a state root (a shared-FS/lake prefix on a real
  * cluster):
  * {{{
  *   <root>/fingerprints/   (asset_id, phash, dhash)  — Layout.compact'd
  *   <root>/clusters/       (doc_id, cluster)         — Layout.compact'd
  *   <root>/_WITNESS        per-file (path, length, mtime) manifest
  * }}}
  *
  * The witness is [[Materialize]]'s data-version idea made durable:
  * every read verifies the current file listing (names + sizes +
  * modification times) against what the writer recorded, so a standing
  * table that was tampered with, partially deleted, appended to, or
  * clobbered by a concurrent writer fails LOUDLY with
  * [[StandingState.StaleStateException]] instead of silently folding a
  * delta into corrupt state — for incremental maintenance a silent
  * wrong base poisons every later night, which is why this is a hard
  * gate and not a warning.
  *
  * Scale shape: both tables are skinny (64-char fingerprints, long
  * ids) and range-clustered on their id via [[Layout.compact]], so the
  * nightly delta's id-keyed joins prune files by footer min/max; the
  * delta probe ([[graft.ops.Dedup.hammingPairsDelta]]) keys on block
  * buckets, never all-pairs; and the only full-corpus pass left in a
  * nightly run is the final manifest projection (scan-side metadata,
  * no fingerprint math). Fingerprinting cost is paid exactly once per
  * asset, on the night it arrives. */
object StandingState {

  /** A standing table's witness no longer matches its files — the state
    * was modified outside the nightly writer. Refuse to fold. */
  final class StaleStateException(msg: String) extends IllegalStateException(msg)

  private val FpTable = "fingerprints"
  private val ClTable = "clusters"
  private val WitnessFile = "_WITNESS"

  // ------------------------------------------------------------- witness

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Recursive (relativePath, length, mtime) listing of a table dir,
    * sorted for a canonical witness. Every file counts — including
    * commit markers — so ANY foreign write shows up. */
  private def listing(
      spark: SparkSession, root: String, table: String): Seq[(String, Long, Long)] = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/$table")
    val filesystem = fs(spark, root)
    if (!filesystem.exists(dir)) return Seq.empty
    val out = Seq.newBuilder[(String, Long, Long)]
    val it = filesystem.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toString.stripPrefix(dir.toString).stripPrefix("/")
      out += ((rel, st.getLen, st.getModificationTime))
    }
    out.result().sortBy(_._1)
  }

  private def writeWitness(
      spark: SparkSession, root: String, tables: Seq[String]): Unit = {
    val body = tables.flatMap { t =>
      listing(spark, root, t).map { case (p, len, mt) => s"$t\t$p\t$len\t$mt" }
    }.mkString("\n")
    val p = new org.apache.hadoop.fs.Path(s"$root/$WitnessFile")
    val os = fs(spark, root).create(p, true)
    try os.write(body.getBytes("UTF-8"))
    finally os.close()
  }

  private def recordedWitness(
      spark: SparkSession, root: String): Map[String, Seq[(String, Long, Long)]] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$WitnessFile")
    val filesystem = fs(spark, root)
    if (!filesystem.exists(p))
      throw new StaleStateException(
        s"standing state at $root has no $WitnessFile — not written by " +
          "StandingState.write, or the witness was removed")
    val is = filesystem.open(p)
    val body =
      try scala.io.Source.fromInputStream(is, "UTF-8").mkString
      finally is.close()
    body.split("\n").filter(_.nonEmpty).toSeq
      .map { line =>
        val Array(t, rel, len, mt) = line.split("\t", 4)
        (t, (rel, len.toLong, mt.toLong))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  /** Hard gate: the table's current files must be EXACTLY what the
    * writer recorded (same names, sizes, modification times). */
  private def verify(spark: SparkSession, root: String, table: String): Unit = {
    val recorded = recordedWitness(spark, root).getOrElse(table, Seq.empty)
    val actual = listing(spark, root, table)
    if (recorded != actual) {
      val rec = recorded.map(_._1).toSet
      val act = actual.map(_._1).toSet
      val missing = rec -- act
      val extra = act -- rec
      val changed = actual.filter { case (p, l, m) =>
        rec.contains(p) && !recorded.contains((p, l, m))
      }.map(_._1)
      throw new StaleStateException(
        s"standing table $root/$table does not match its witness " +
          s"(missing=${missing.toSeq.sorted.mkString(",")} " +
          s"extra=${extra.toSeq.sorted.mkString(",")} " +
          s"modified=${changed.sorted.mkString(",")}) — the state was " +
          "written or edited outside the nightly job; refusing to fold " +
          "a delta into it")
    }
  }

  // ------------------------------------------------------------ tables

  /** One standing table to persist: a name under the state root, the
    * rows, and the column [[Layout.compact]] range-clusters the files
    * on (the column downstream reads key or filter by, so per-file
    * footer min/max prune). */
  case class TableSpec(name: String, df: DataFrame, clusterCol: String)

  /** Write a standing state — EVERY table of a state root in one call
    * (each range-clustered through [[Layout.compact]]) — and stamp the
    * witness over exactly those tables. The generic seam: the manifest
    * state persists (fingerprints, clusters); the retrieval index
    * persists (postings, doclens); any future incremental family brings
    * its own table set. */
  def writeTables(
      root: String,
      tables: Seq[TableSpec],
      targetRowsPerFile: Long = 4000000L): Unit = {
    require(tables.nonEmpty, "a standing state needs at least one table")
    val spark = tables.head.df.sparkSession
    tables.foreach { t =>
      Layout.compact(t.df, s"$root/${t.name}", targetRowsPerFile, Seq(t.clusterCol))
    }
    writeWitness(spark, root, tables.map(_.name))
  }

  /** Witness-verified scan of one standing table. */
  def readTable(spark: SparkSession, root: String, name: String): DataFrame = {
    verify(spark, root, name)
    spark.read.parquet(s"$root/$name")
  }

  /** Write the asset-manifest standing state (fingerprints + clusters). */
  def write(
      root: String,
      fingerprints: DataFrame,
      clusters: DataFrame,
      targetRowsPerFile: Long = 4000000L): Unit =
    writeTables(root, Seq(
      TableSpec(FpTable, fingerprints, "asset_id"),
      TableSpec(ClTable, clusters, "doc_id")), targetRowsPerFile)

  /** Witness-verified scan of the standing fingerprint table. */
  def readFingerprints(spark: SparkSession, root: String): DataFrame =
    readTable(spark, root, FpTable)

  /** Witness-verified scan of the standing cluster assignment. */
  def readClusters(spark: SparkSession, root: String): DataFrame =
    readTable(spark, root, ClTable)

  // ------------------------------------------------------------- nights

  /** Both perceptual fingerprint families for an asset batch, one row
    * per asset: (asset_id, phash, dhash) — MATERIALIZED once
    * ([[Materialize.index]]): three consumers read it per night (each
    * family's block probe plus the table write), and without the
    * materialization each would re-derive both hash computations
    * through its own lineage (payload hashing ×3, the exact cost the
    * standing-state seam exists to avoid). The only place payload bytes
    * are ever decoded — everything downstream is fingerprint-keyed. */
  def fingerprint(assets: DataFrame): DataFrame =
    Materialize.index(
      Multimodal.perceptualHash(assets)
        .join(Multimodal.dhash(assets), "asset_id"),
      "standing-fp")

  private def pairsOf(fpNew: DataFrame, fpOld: DataFrame): DataFrame =
    Dedup.hammingPairsDelta(
        fpNew.select(col("asset_id"), col("phash").as("simhash")),
        fpOld.select(col("asset_id"), col("phash").as("simhash")), "asset_id")
      .select("id_a", "id_b")
      .unionByName(Dedup.hammingPairsDelta(
          fpNew.select(col("asset_id"), col("dhash").as("simhash")),
          fpOld.select(col("asset_id"), col("dhash").as("simhash")), "asset_id")
        .select("id_a", "id_b"))
      .distinct()

  /** Night 0: fingerprint the FULL initial corpus, close its pair graph,
    * write the first standing state. The only night that pays a
    * corpus-sized fingerprint pass. */
  def bootstrap(assets: DataFrame, root: String): Unit = {
    val fp = fingerprint(assets)
    val pairs = Dedup.hammingPairs64(
        fp.select(col("asset_id"), col("phash").as("simhash")), "asset_id")
      .select("id_a", "id_b")
      .unionByName(Dedup.hammingPairs64(
          fp.select(col("asset_id"), col("dhash").as("simhash")), "asset_id")
        .select("id_a", "id_b"))
      .distinct()
    val clusters = Cluster.dupClusters(pairs).select("doc_id", "cluster")
    write(root, fp, clusters)
  }

  /** Retire an OLD night's state root — the retention step a nightly
    * chain needs (each ingest writes a fresh root; without retirement
    * the lake keeps one full state copy per night forever). Deliberately
    * witness-GATED: the root must still be a coherent standing state
    * (witness present and matching), so a typo'd path, a half-written
    * root, or a directory some other process has scribbled into is
    * REFUSED rather than recursively deleted — deletion is the one
    * operation where "loud refusal on anything unexpected" matters
    * most. Callers retire a root only after the night that READ it has
    * committed its output. */
  def retire(spark: SparkSession, root: String): Unit = {
    val recorded = recordedWitness(spark, root)
    recorded.keys.foreach(verify(spark, root, _))
    val filesystem = fs(spark, root)
    filesystem.delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  /** One nightly ingest: read the standing state at `inRoot`
    * (witness-verified), fingerprint ONLY `deltaAssets`, probe delta
    * fingerprints against the standing fingerprint table (new↔new ∪
    * new↔old block probes — the base is never re-fingerprinted), fold
    * the edges into the standing assignment via
    * [[graft.ops.Cluster.mergeClusters]], and write the updated state
    * to `outRoot`. Chaining nights is exact: the fold over any sequence
    * of deltas is row-identical to the full recompute over the union of
    * all assets ever ingested (the merge ≡ recompute contract, here
    * proven ACROSS the write/read boundary by the nightly oracle).
    * Returns the updated (doc_id, cluster) assignment. */
  def ingest(deltaAssets: DataFrame, inRoot: String, outRoot: String): DataFrame = {
    val spark = deltaAssets.sparkSession
    val standingFp = readFingerprints(spark, inRoot)
    val standingCl = readClusters(spark, inRoot)
    val deltaFp = fingerprint(deltaAssets)
    val merged = Cluster.mergeClusters(standingCl, pairsOf(deltaFp, standingFp))
      .select("doc_id", "cluster")
    write(outRoot, standingFp.unionByName(deltaFp), merged)
    readClusters(spark, outRoot)
  }
}
