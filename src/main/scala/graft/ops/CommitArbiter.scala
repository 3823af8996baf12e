package graft.ops

/** External commit arbiter for standing-state stores on filesystems
  * that cannot supply the protocol's two atomic primitives themselves.
  *
  * The [[StandingState]] exactly-once story rests on (a) a
  * create-exclusive writer lease and (b) one atomic publish of each
  * snapshot's witness. HDFS and POSIX filesystems provide both; object
  * stores provide NEITHER — "rename" is copy-then-delete, and
  * create-no-overwrite is check-then-create (the reference's own
  * archive tier is S3 via hadoop-aws, `SubTableScanBuilder.java:
  * 106-112`, so this is the deployment reality, not a corner case).
  * Iceberg solves it by moving the commit decision to a catalog swap;
  * this trait is the same idea reduced to its minimal primitive: a
  * CONDITIONAL PUT on an external coordination store. One conditional
  * put claims the lease; one claims each snapshot number. Everything
  * else (immutable data partitions, witness verification, base-latest
  * checks) already tolerates non-atomic filesystems because files are
  * only ever referenced by a witness that commits after them.
  *
  * Contract: `putIfAbsent` must be ATOMIC (exactly one concurrent
  * caller wins), `deleteIf` must be an atomic compare-and-delete.
  * DynamoDB conditional writes, etcd transactions, or any RDBMS unique
  * insert satisfy this; [[graft.sources.dsv2.DynamoArbiter]] is the
  * wire implementation over public DynamoDB conditional-put JSON. */
trait CommitArbiter {
  /** Atomically create `key → body` iff `key` is absent. True iff THIS
    * call created it. */
  def putIfAbsent(key: String, body: String): Boolean

  /** Current body of `key`, if present. */
  def get(key: String): Option[String]

  /** Atomically delete `key` iff its current body equals `expect`.
    * True iff this call deleted it. */
  def deleteIf(key: String, expect: String): Boolean

  /** Unconditional delete — the breakLease analog, operator-invoked. */
  def delete(key: String): Unit
}

object CommitArbiter {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitArbiter]()

  /** AUTHORITY-QUALIFIED store identity — the key every arbiter-facing
    * structure (this registry, [[graft.ops.StandingState]]'s lease and
    * snapshot-claim keys, the witness-parse cache) uses. Rendered
    * `scheme://authority/path` so `s3a://bucket-a/state` and
    * `s3a://bucket-b/state` NEVER alias at a shared arbiter table
    * (path-only keys would let a same-owner retake compare-and-delete
    * the OTHER store's live lease). A schemeless spelling defaults to
    * `file` with empty authority, so `/tmp/x` and `file:/tmp/x` — the
    * local respellings of one store — still agree; any store that
    * actually NEEDS an arbiter carries an explicit object-store scheme
    * and is keyed exactly. */
  def storeKey(store: String): String = {
    val u = new org.apache.hadoop.fs.Path(store).toUri
    val scheme = Option(u.getScheme).getOrElse("file")
    val auth = Option(u.getAuthority).getOrElse("")
    val path = Option(u.getPath).filter(_.nonEmpty).getOrElse(store)
    s"$scheme://$auth$path"
  }

  /** Register an arbiter for one store root (keyed by [[storeKey]] —
    * scheme+authority+path, so same-path stores in different buckets
    * resolve to their OWN arbiters). Programmatic twin of the
    * `spark.graft.state.arbiter` conf. */
  def register(store: String, arbiter: CommitArbiter): Unit =
    registry.put(storeKey(store), arbiter)

  def unregister(store: String): Unit = registry.remove(storeKey(store))

  /** The arbiter governing `store`: an explicit registration wins, else
    * the session-wide `spark.graft.state.arbiter` spec
    * (`memory:<name>` for the process-local map — tests and single-JVM
    * demos — or a `dynamo://host:port/Table` / `dynamos://…` endpoint
    * for the conditional-put wire). */
  def forStore(
      spark: org.apache.spark.sql.SparkSession,
      store: String): Option[CommitArbiter] =
    Option(registry.get(storeKey(store))).orElse(
      spark.conf.getOption("spark.graft.state.arbiter").map(resolve))

  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[String, CommitArbiter]()

  /** Memoized per spec: forStore resolves on every lease/claim call, so
    * a wire-backed arbiter must not rebuild its HTTP client each time. */
  def resolve(spec: String): CommitArbiter =
    resolved.computeIfAbsent(spec, s =>
      if (s.startsWith("memory:")) InMemoryArbiter.named(s.stripPrefix("memory:"))
      else if (s.startsWith("dynamo://") || s.startsWith("dynamos://"))
        new graft.sources.dsv2.DynamoArbiter(s)
      else throw new IllegalArgumentException(
        s"unknown commit-arbiter spec '$s' — expected memory:<name> or " +
          "dynamo[s]://host[:port]/Table"))
}

/** Process-local conditional-put map — the spec/demo arbiter. Named so
  * independent "writers" (threads, sessions) in one JVM meet at the
  * same map, mirroring how independent drivers meet at one DynamoDB
  * table. Atomicity comes from ConcurrentHashMap's per-key compute
  * locks — a real exactly-one-winner `putIfAbsent`, unlike the
  * check-then-create of Hadoop's LocalFileSystem. */
final class InMemoryArbiter private () extends CommitArbiter {
  private val kv = new java.util.concurrent.ConcurrentHashMap[String, String]()
  override def putIfAbsent(key: String, body: String): Boolean =
    kv.putIfAbsent(key, body) == null
  override def get(key: String): Option[String] = Option(kv.get(key))
  override def deleteIf(key: String, expect: String): Boolean =
    kv.remove(key, expect)
  override def delete(key: String): Unit = kv.remove(key)
}

object InMemoryArbiter {
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, InMemoryArbiter]()
  def named(name: String): InMemoryArbiter =
    instances.computeIfAbsent(name, _ => new InMemoryArbiter())
}
