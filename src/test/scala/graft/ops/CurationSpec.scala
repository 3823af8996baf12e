package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantics + plan-shape pins for the curation operators and the
  * count-min sketch. */
class CurationSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(rows.map { case (i, t) => Row(i, t) }.asJava, schema)
  }

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // ------------------------------------------------------ shard shuffle
  test("shardAssignments: positions are contiguous per shard, rerun is bit-identical") {
    val d = docs((1L to 100L).map(i => i -> s"doc $i"): _*)
    val a = Curation.shardAssignments(d, "doc_id", nShards = 8)
    val rows = a.collect()
    rows.length shouldBe 100
    // every shard's positions are exactly 1..count(shard)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      rs.map(_.getAs[Long]("pos")).sorted shouldBe (1L to rs.length).toArray
    }
    rows.map(_.getAs[Long]("shard")).distinct.foreach { sh =>
      sh should be >= 0L; sh should be < 8L
    }
    // determinism: a second evaluation produces the same assignment
    val again = Curation.shardAssignments(d, "doc_id", nShards = 8).collect()
    again.map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos"))).sorted shouldBe
      rows.map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos"))).sorted
  }

  test("shardAssignments plan: one exchange (hash partition), no global sort") {
    val d = docs((1L to 50L).map(i => i -> "x"): _*)
    val p = physicalPlan(Curation.shardAssignments(d, "doc_id"))
    "Exchange".r.findAllIn(p).length shouldBe 1
    // the only sort is the per-partition window sort, never a global range sort
    p should not include "rangepartitioning"
  }

  // ------------------------------------------------- incremental novelty
  test("incrementalNovelty: corpus hit, batch dup, and fresh rows flag correctly") {
    val corpus = docs((2L, "seen before"), (4L, "old stuff"))
    val batch = docs(
      (1L, "seen before"),   // fingerprint known to corpus
      (3L, "brand new"),     // novel
      (5L, "brand new"),     // within-batch dup of 3
      (7L, "also fresh"))    // novel
    val out = Curation.incrementalNovelty(batch, corpus, "doc_id", md5(col("text")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("in_corpus"), r.getAs[Boolean]("first_in_batch"),
          r.getAs[Boolean]("novel"))).toMap
    out(1L) shouldBe ((true, true, false))
    out(3L) shouldBe ((false, true, true))
    out(5L) shouldBe ((false, false, false))
    out(7L) shouldBe ((false, true, true))
  }

  test("incrementalNovelty: empty corpus makes every first-in-batch row novel") {
    val out = Curation.incrementalNovelty(
      docs((1L, "a"), (2L, "a")), docs().limit(0), "doc_id", md5(col("text")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("novel")).toMap
    out shouldBe Map(1L -> true, 2L -> false)
  }

  test("incrementalNovelty plan: window reuses the join's hash partitioning on fp") {
    val corpus = docs((1L to 20L).map(i => i -> s"c $i"): _*)
    val batch = docs((21L to 40L).map(i => i -> s"b $i"): _*)
    val p = physicalPlan(
      Curation.incrementalNovelty(batch, corpus, "doc_id", md5(col("text"))))
    // corpus distinct (2 partial/final stages share 1 exchange) + batch join
    // side: the window adds NO exchange of its own on top of the join's
    withClue(p) {
      "Exchange".r.findAllIn(p).length should be <= 3
    }
  }

  // ----------------------------------------------------------- domains
  test("domainStats: integer-sum ratios and both keep outcomes") {
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("text", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      // good source: all-distinct words, long docs
      Row("good", "alpha beta gamma delta", 400L),
      Row("good", "one two three four", 300L),
      // bad source: heavy repetition + short docs
      Row("bad", "spam spam spam spam", 100L),
      Row("bad", "buy buy buy buy", 120L))
    val d = spark.createDataFrame(rows.asJava, schema)
    val out = Curation.domainStats(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("pooled_ratio"),
          r.getAs[Double]("short_frac"), r.getAs[Boolean]("keep"))).toMap
    out("good") shouldBe ((2L, 1.0, 0.0, true))
    out("bad") shouldBe ((2L, 0.25, 1.0, false))
  }

  // ------------------------------------------------------- boilerplate
  test("boilerplateStrip: repeated line survives only in the first doc") {
    val banner = "one two three four five six seven eight nine ten"
    val d = docs(
      (1L, s"$banner unique alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, s"$banner other kappa lambda mu nu xi omicron pi rho sigma"),
      (3L, "fresh content with no shared lines at all here now"))
    val out = Curation.boilerplateStrip(d, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("text_clean"))).toMap
    out(1L)._1 shouldBe 2L
    out(1L)._2 shouldBe 2L           // min doc keeps the banner
    out(1L)._3 should startWith(banner)
    out(2L)._2 shouldBe 1L           // banner stripped from the later doc
    out(2L)._3 should not include "one two three"
    out(3L) shouldBe ((1L, 1L, "fresh content with no shared lines at all here now"))
  }

  test("boilerplateStrip: within-doc repeat in the owning doc is kept whole") {
    val line = "a b c d e f g h i j"
    val d = docs((1L, s"$line $line"), (2L, s"$line k l m n o p q r s t"))
    val out = Curation.boilerplateStrip(d, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    out(1L) shouldBe 2L   // both copies live in the min doc
    out(2L) shouldBe 1L   // stripped here
  }

  // ------------------------------------------------------ token budget
  test("budgetSelect: matches the naive global cumsum, across partition boundaries") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("q", DoubleType),
      StructField("tok", LongType)))
    val rows = (1L to 500L).map(i => Row(i, (i % 97).toDouble / 97.0, 10L + i % 7))
    val d = spark.createDataFrame(rows.asJava, schema)
    val got = Curation.budgetSelect(d, "id", "q", "tok", budget = 2000L, partitions = 8)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cum_tokens"))).sortBy(_._1)
    // naive reference: sort by (q desc, id), running sum, cut at budget
    val ref = rows.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
      .scanLeft((0L, 0.0, 0L, 0L)) { case ((_, _, _, cum), (id, q, t)) => (id, q, t, cum + t) }
      .drop(1)
      .takeWhile(_._4 <= 2000L)
      .map(t => (t._1, t._4)).sortBy(_._1)
    got shouldBe ref.toArray
    got.length should be > 8 // spans multiple range partitions
    Materialize.dropAll()
  }

  test("budgetSelect: zero budget selects nothing; infinite budget selects everything") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("q", DoubleType),
      StructField("tok", LongType)))
    val d = spark.createDataFrame(
      (1L to 20L).map(i => Row(i, 0.5, 5L)).asJava, schema)
    Curation.budgetSelect(d, "id", "q", "tok", budget = 0L).count() shouldBe 0L
    Curation.budgetSelect(d, "id", "q", "tok", budget = Long.MaxValue).count() shouldBe 20L
    Materialize.dropAll()
  }

  // ------------------------------------------------------ domain quota
  test("domainQuota: two-phase top-k matches the naive global window") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("dom", StringType),
      StructField("sc", DoubleType)))
    // one hot domain (200 rows), several small ones, deliberate score ties
    val rows = (1L to 200L).map(i => Row(i, "hot", (i % 13).toDouble)) ++
      (201L to 230L).map(i => Row(i, s"d${i % 3}", (i % 7).toDouble))
    val d = spark.createDataFrame(rows.asJava, schema).repartition(8)
    val got = Curation.domainQuota(d, "id", "dom", "sc", cap = 5)
      .collect()
      .map(r => (r.getAs[String]("dom"), r.getAs[Long]("rank_in_domain"), r.getLong(0)))
      .sortBy(t => (t._1, t._2))
    val ref = rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._2).toSeq.flatMap { case (dom, rs) =>
        rs.sortBy { case (id, _, sc) => (-sc, id) }.take(5).zipWithIndex
          .map { case ((id, _, _), i) => (dom, i + 1L, id) }
      }.sortBy(t => (t._1, t._2))
    got.toSeq shouldBe ref
    got.count(_._1 == "hot") shouldBe 5
  }

  test("domainQuota: cap larger than any domain passes everything through") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("dom", StringType),
      StructField("sc", DoubleType)))
    val d = spark.createDataFrame(
      (1L to 30L).map(i => Row(i, s"d${i % 4}", 1.0)).asJava, schema)
    Curation.domainQuota(d, "id", "dom", "sc", cap = 100).count() shouldBe 30L
  }

  // --------------------------------------------------- leak-free split
  test("leakFreeSplit: same group always lands in the same split; all splits occur") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", LongType)))
    val d = spark.createDataFrame(
      (1L to 400L).map(i => Row(i, i % 50)).asJava, schema)
    val rows = Curation.leakFreeSplit(d, "grp").collect()
      .map(r => (r.getAs[Long]("grp"), r.getAs[String]("split")))
    rows.groupBy(_._1).values.foreach { members =>
      members.map(_._2).distinct.length shouldBe 1 // no straddling
    }
    rows.map(_._2).distinct.sorted shouldBe Array("test", "train", "val")
    // train is the bulk (12/16 of hash space)
    val byFreq = rows.groupBy(_._2).view.mapValues(_.size).toMap
    byFreq("train") should be > byFreq("val")
    byFreq("train") should be > byFreq("test")
  }

  test("leakFreeSplit plan: pure projection, no exchange") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", LongType)))
    val d = spark.createDataFrame((1L to 5L).map(i => Row(i, i)).asJava, schema)
    physicalPlan(Curation.leakFreeSplit(d, "grp")) should not include "Exchange"
  }

  // ------------------------------------------------- weighted replicate
  test("resampleReplicate: integer weights replicate exactly; fractional part is a hash subset") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("w", DoubleType)))
    val d = spark.createDataFrame(
      ((1L to 40L).map(i => Row(i, 2.0)) ++ (41L to 80L).map(i => Row(i, 0.25))).asJava,
      schema)
    val out = Curation.resampleReplicate(d, "id", "w").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_copies"), r.getAs[Long]("copy_id")))
    // w = 2.0: every doc exactly twice, copy ids 1 and 2
    val whole = out.filter(_._1 <= 40L)
    whole.length shouldBe 80
    whole.groupBy(_._1).values.foreach(_.map(_._3).sorted shouldBe Array(1L, 2L))
    // w = 0.25: only docs whose hash digit < 4 survive, exactly once —
    // a deterministic subset, the same one on every run
    val frac = out.filter(_._1 > 40L)
    frac.foreach(_._2 shouldBe 1L)
    val again = Curation.resampleReplicate(d, "id", "w").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("copy_id"))).sorted
    again shouldBe out.map(t => (t._1, t._3)).sorted
    frac.length should (be > 0 and be < 40) // thinned, not empty/full
  }

  // --------------------------------------------------- priority keeper
  test("priorityKeepers: best-ranked source wins the cluster; ties break by id") {
    val mSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("cluster", LongType)))
    val pSchema = StructType(Seq(
      StructField("source", StringType), StructField("rank", IntegerType)))
    val members = spark.createDataFrame(Seq(
      Row(1L, "scrape", 1L), Row(2L, "curated", 1L), Row(3L, "scrape", 1L),
      Row(4L, "scrape", 4L), Row(5L, "scrape", 4L),
      Row(6L, "curated", 6L)).asJava, mSchema)
    val prio = spark.createDataFrame(Seq(
      Row("curated", 0), Row("scrape", 1)).asJava, pSchema)
    val out = graft.ops.Cluster.priorityKeepers(members, prio).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("keeper"), r.getAs[Boolean]("is_keeper"))).toMap
    out(1L) shouldBe ((2L, false)) // curated doc 2 beats lower-id scrape doc 1
    out(2L) shouldBe ((2L, true))
    out(3L) shouldBe ((2L, false))
    out(4L) shouldBe ((4L, true))  // all-scrape cluster: min id wins
    out(5L) shouldBe ((4L, false))
    out(6L) shouldBe ((6L, true))  // singleton keeps itself
  }

  // --------------------------------------------------------- count-min
  test("CMS invariant: estimate >= exact for every key; grid mass = d * rows") {
    val schema = StructType(Seq(StructField("k", LongType)))
    val rows = (1L to 300L).map(i => Row(i % 37)) // 37 keys, skewed none
    val d = spark.createDataFrame(rows.asJava, schema)
    val est = CountMin.estimates(d, "k", d = 3, w = 16).collect()
    est.length shouldBe 37
    est.foreach { r =>
      withClue(s"key ${r.getAs[Long]("k")}: ") {
        r.getAs[Long]("cms_est") should be >= r.getAs[Long]("n_exact")
      }
    }
    // with 37 keys in 16 buckets, collisions MUST occur
    est.count(_.getAs[Boolean]("collided")) should be > 0
    val grid = CountMin.sketch(d, "k", d = 3, w = 16).collect()
    grid.map(_.getAs[Long]("cnt")).sum shouldBe 3L * 300L
  }

  test("CMS merge: sketch of a union equals cellwise sum of the halves") {
    val schema = StructType(Seq(StructField("k", LongType)))
    def df(rows: Seq[Long]) =
      spark.createDataFrame(rows.map(Row(_)).asJava, schema)
    val a = df((1L to 100L).map(_ % 11))
    val b = df((1L to 80L).map(_ % 7))
    def cells(g: Array[Row]) = g.map(r =>
      (r.getAs[Int]("j"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    val merged = cells(CountMin.sketch(a.union(b), "k").collect())
    val added = {
      val ca = cells(CountMin.sketch(a, "k").collect())
      val cb = cells(CountMin.sketch(b, "k").collect())
      (ca.keySet ++ cb.keySet).map(k =>
        k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
    }
    merged shouldBe added
  }

  test("CMS estimates plan: the grid joins broadcast, never shuffles the key side") {
    val schema = StructType(Seq(StructField("k", LongType)))
    val d = spark.createDataFrame((1L to 200L).map(i => Row(i % 23)).asJava, schema)
    val p = physicalPlan(CountMin.estimates(d, "k"))
    p should include("BroadcastHashJoin")
  }
}
