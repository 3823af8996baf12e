package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-16 pins: NaN semantics at the negated-key argmax sites
  * (argmin-via-negation must match min-of-struct, where a NaN key
  * never wins), the budget-derived ObjectHashAggregate fallback
  * threshold, and the conservative no-record lease release. */
class RoundSixteenSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def argmaxCell(nanSmallest: Boolean) = {
    import org.apache.spark.sql.graftshim.ColumnExpr
    ColumnExpr.column(graft.functions.ArgMaxCell(
      ColumnExpr.expr(col("cid").cast("int")),
      ColumnExpr.expr(col("s").cast("double")),
      nanSmallest).toAggregateExpression())
  }

  test("positive-key argmax: NaN is greatest, exactly like max(struct)") {
    val df = Seq((1L, 0, 0.9), (1L, 1, Double.NaN), (1L, 2, 0.1),
      (2L, 3, 0.5), (2L, 4, 0.7))
      .toDF("g", "cid", "s")
    val got = df.groupBy("g").agg(argmaxCell(nanSmallest = false).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the struct-max oracle: NaN sorts greatest, so cid 1 wins group 1
    val oracle = df.groupBy("g")
      .agg(max(struct(col("s"), (-col("cid")).as("negcid"))).as("m"))
      .select(col("g"), (-col("m.negcid")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got shouldBe oracle
    got shouldBe Map(1L -> 1, 2L -> 4)
  }

  test("negated-key argmin: a NaN distance NEVER wins, like min(struct)") {
    // argmin over d2 expressed as argmax over -d2: negation keeps NaN
    // NaN, so without nanSmallest the NaN row would WIN — min(struct)
    // never selects it (NaN sorts greatest under min)
    val df = Seq((1L, 0, 5.0), (1L, 1, Double.NaN), (1L, 2, 3.0),
      (2L, 3, Double.NaN), (2L, 4, Double.NaN))
      .toDF("g", "cid", "d2")
    val got = df.select(col("g"), col("cid"), (-col("d2")).as("s"))
      .groupBy("g").agg(argmaxCell(nanSmallest = true).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val oracle = df.groupBy("g")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("g"), col("m.cid").as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got shouldBe oracle
    // group 1: real distance 3.0 beats NaN; group 2 all-NaN: lowest cid
    got shouldBe Map(1L -> 2, 2L -> 3)
  }

  test("priorityKeepers with a NaN rank: the NaN member loses the keeper race") {
    val members = Seq((1L, 100L, "a"), (2L, 100L, "b"), (3L, 200L, "a"),
      (4L, 200L, "a"))
      .toDF("doc_id", "cluster", "source")
    val prios = Seq(("a", Double.NaN), ("b", 5.0)).toDF("source", "rank")
    val kept = Cluster.priorityKeepers(members, prios)
      .filter(col("is_keeper")).select("cluster", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster 100: source b's real rank 5 beats a's NaN (min-of-struct:
    // NaN greatest). cluster 200: all-NaN ranks → lowest doc id.
    kept shouldBe Map(100L -> 2L, 200L -> 3L)
  }

  test("object-agg fallback threshold is budget-derived and yields to an explicit setting") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    // the math: budget / per-buffer, floored at Spark's 128 default
    graft.functions.GraftExtensions.objectAggThreshold(spark) shouldBe
      (64L << 20) / 4096L // 16,384
    spark.conf.set("spark.graft.objectAgg.budgetBytes", (8L << 20).toString)
    spark.conf.set("spark.graft.objectAgg.bufferBytes", "65536")
    try
      graft.functions.GraftExtensions.objectAggThreshold(spark) shouldBe 128L
    finally {
      spark.conf.unset("spark.graft.objectAgg.budgetBytes")
      spark.conf.unset("spark.graft.objectAgg.bufferBytes")
    }
    // an EXPLICIT user threshold — even one equal to the default —
    // stays authoritative through register()
    spark.conf.set(key, "128")
    try {
      graft.functions.GraftExtensions.register(spark)
      spark.conf.get(key) shouldBe "128"
    } finally spark.conf.unset(key)
    // unset (default): register applies the budget-derived bound
    graft.functions.GraftExtensions.register(spark)
    spark.conf.get(key) shouldBe "16384"
  }

  test("witness parse at manifest scale: 10⁵ and 10⁶ file entries, measured; cache hits skip the re-parse") {
    // The per-snapshot witness is ONE text file listing every data file
    // (rows/zones/schema included), parsed driver-side on verified
    // reads. This measures that parse at file counts compaction would
    // only reach if left un-run for a long time — the honest answer to
    // "does the witness scale": numbers, plus the parse cache that
    // makes repeat serving reads O(1 stat).
    def synthStore(files: Int): String = {
      val store = SparkFixture.tempDir(s"r16-wit$files")
      val dir = new java.io.File(store, "snap00000")
      dir.mkdirs()
      val sb = new StringBuilder("#owner=scale\n")
      sb.append("#schema=t\tk%3Astring%2Cv%3Abigint\n")
      (0 until files).foreach { i =>
        sb.append(f"#rows=t\tdata/t/p00000-$i%x\t4096\n")
        sb.append(f"#stats=t\tdata/t/p00000-$i%x/f.parquet\tS\tk$i%08d\tk$i%08dz\n")
        sb.append(f"t\tdata/t/p00000-$i%x/f.parquet\t123456\t171234$i%06d\n")
      }
      java.nio.file.Files.write(
        new java.io.File(dir, "_WITNESS").toPath,
        sb.toString.getBytes("UTF-8"))
      store
    }
    Seq(100000, 1000000).foreach { files =>
      val store = synthStore(files)
      val bytes = new java.io.File(s"$store/snap00000/_WITNESS").length()
      val t0 = System.nanoTime()
      val w = StandingState.recordedWitness(spark, store, 0L)
      val coldMs = (System.nanoTime() - t0) / 1000000
      w.files("t").size shouldBe files
      val t1 = System.nanoTime()
      StandingState.recordedWitness(spark, store, 0L).files("t").size shouldBe files
      val warmMs = (System.nanoTime() - t1) / 1000000
      info(f"$files%,d files: witness ${bytes / 1048576.0}%.1f MiB, " +
        f"cold parse $coldMs ms, cached $warmMs ms")
      coldMs should be < 30000L // loose sanity bound; real numbers in info
      warmMs should be <= coldMs
      // the cache revalidates: a changed witness is re-parsed, not served stale
      val wf = new java.io.File(s"$store/snap00000/_WITNESS")
      val out = new java.io.FileOutputStream(wf, true)
      try out.write("t\tdata/t/extra.parquet\t1\t1\n".getBytes("UTF-8"))
      finally out.close()
      StandingState.recordedWitness(spark, store, 0L)
        .files("t").size shouldBe (files + 1)
    }
  }

  test("payload-carrying IVF store: serving never touches the raw corpus (poisoned-corpus pin)") {
    val vecs = (0L until 60L).map(i => (i, Seq.tabulate(8)(d =>
      math.sin(i * 1.7 + d).abs + 0.1)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val store = SparkFixture.tempDir("r16-annpay")
    AnnIndex.bootstrap(corpus, "vec_id", "embedding", numCentroids = 4, store)
    AnnIndex.readCells(spark, store).columns should contain ("embedding")
    val queries = corpus.filter(col("vec_id") < 3)
    // a corpus whose evaluation THROWS: if any serving stage scanned the
    // raw corpus, the query would fail — the payload layout must serve
    // entirely from the standing store
    // non-foldable (column-referencing) so it throws at RUNTIME on any
    // scanned row, never at plan time (r10 assert_true precedent)
    val poisoned = corpus.withColumn("embedding",
      when(expr("assert_true(vec_id IS NULL, 'serving scanned the raw corpus')").isNull,
        col("embedding")))
    val served = AnnIndex.topK(
      poisoned, queries, "vec_id", "embedding", k = 3, store, nprobe = 2)
      .collect()
    served.length shouldBe 9 // 3 queries × k
    val servedAdc = {
      val pq = SparkFixture.tempDir("r16-annpq")
      AnnIndex.bootstrapPq(corpus, "vec_id", "embedding", pq)
      AnnIndex.ivfadcTopK(poisoned, queries, "vec_id", "embedding", k = 3,
        store, pq, nprobe = 2, shortlist = 20).collect()
    }
    servedAdc.length shouldBe 9
    // and the results match serving with the real corpus (same store)
    val real = AnnIndex.topK(
      corpus, queries, "vec_id", "embedding", k = 3, store, nprobe = 2)
      .collect().map(_.toString).sorted
    served.map(_.toString).sorted shouldBe real
  }

  test("releaseOwnLease without a recorded body leaves the lease for breakLease") {
    val store = SparkFixture.tempDir("r16-lease")
    // acquire on a DIFFERENT thread: the body record is thread-local,
    // so this thread releases with no record of its own
    val t = new Thread(() => StandingState.acquireLease(spark, store, "w1"))
    t.start(); t.join()
    val lease = new java.io.File(store, "_LEASE")
    lease.exists() shouldBe true
    StandingState.releaseOwnLease(spark, store)
    // conservative: no record → no delete (a live holder's lease must
    // never be removed by a thread that can't prove ownership)
    lease.exists() shouldBe true
    StandingState.breakLease(spark, store)
    lease.exists() shouldBe false
  }
}
