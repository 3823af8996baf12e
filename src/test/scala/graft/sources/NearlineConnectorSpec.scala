package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DataSourceV2 nearline connector: pushdown + read-mode decisions +
  * correct results, mirroring the reference's TestDynamoFilterPushdown
  * plan assertions at the Spark DSv2 surface. */
class NearlineConnectorSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private lazy val tablePath: String = {
    val p = SparkFixture.tempDir("dsv2") + "/t_0_1000.parquet"
    val schema = StructType(Seq(
      StructField("partition", StringType), StructField("sort", StringType),
      StructField("ids", ArrayType(StringType)),
      StructField("field1", MapType(StringType, StringType))))
    val rows = Seq(
      Row("orgAm1", "100", Seq("w1"), Map("w1" -> "1")),
      Row("orgAm1", "200", Seq("w1", "w2"), Map("w1" -> "2", "w2" -> "3")),
      Row("orgAm1", "300", Seq("w1"), Map("w1" -> "4")),
      Row("orgBm1", "100", Seq("w1"), Map("w1" -> "9")))
    spark.createDataFrame(rows.asJava, schema).write.mode("overwrite").parquet(p)
    p
  }

  private def load(): DataFrame =
    spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", tablePath).load()

  private def scanDesc(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("full scan with no predicates plans SCAN mode and returns all items") {
    val df = load()
    df.count() shouldBe 4
    scanDesc(df) should include("mode=SCAN")
  }

  test("hash-key equality plans QUERY; only that partition's items return") {
    val df = load().filter(col("partition") === "orgAm1")
    df.count() shouldBe 3
    val d = scanDesc(df)
    d should include("mode=QUERY")
    d should include("EqualTo(partition,orgAm1)")
  }

  test("hash + sort equality plans GET; exactly one item") {
    val df = load().filter(col("partition") === "orgAm1" && col("sort") === "200")
    val rows = df.collect()
    rows.length shouldBe 1
    rows.head.getAs[Seq[String]]("ids").toSet shouldBe Set("w1", "w2")
    scanDesc(df) should include("mode=GET")
  }

  test("hash equality + sort range plans QUERY with range; filters rows") {
    val df = load().filter(col("partition") === "orgAm1" && col("sort") >= "150")
    df.collect().map(_.getAs[String]("sort")).sorted.toSeq shouldBe Seq("200", "300")
    scanDesc(df) should include("mode=QUERY")
  }

  test("attribute-only predicate degrades to SCAN with server-side filter") {
    val df = load().filter(col("sort") === "100")
    df.count() shouldBe 2
    scanDesc(df) should include("mode=SCAN")
  }

  test("projection pushdown prunes unread columns at the scan") {
    val df = load().filter(col("partition") === "orgAm1").select("sort")
    df.collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("100", "200", "300")
    // the BatchScan output must carry only the needed columns — ids and
    // field1 are pruned (partition survives for the pushed filter)
    val d = scanDesc(df)
    d should include("BatchScan")
    d should not include "ids#"
    d should not include "field1#"
  }

  test("OR of key equalities fans out into a MultiRead of keyed reads") {
    // Catalyst factors the common `sort = 100` out of this OR before
    // pushdown; the planner distributes it back (the archetypal "these
    // partitions, this time range" query must not degrade to a Scan)
    val df = load().filter(
      (col("partition") === "orgAm1" && col("sort") === "100") ||
        (col("partition") === "orgBm1" && col("sort") === "100"))
    val rows = df.collect()
    rows.length shouldBe 2
    rows.map(_.getAs[String]("partition")).sorted.toSeq shouldBe Seq("orgAm1", "orgBm1")
    scanDesc(df) should include("mode=MULTI(2)")
    // same-partition OR-of-sorts factors to ONE keyed Query with a
    // server-side sort filter — keyed either way, never a full Scan
    val df2 = load().filter(
      (col("partition") === "orgAm1" && col("sort") === "100") ||
        (col("partition") === "orgAm1" && col("sort") === "300"))
    df2.collect().map(_.getAs[String]("sort")).sorted.toSeq shouldBe Seq("100", "300")
    val d2 = scanDesc(df2)
    d2 should include("mode=QUERY")
    d2 should not include "mode=SCAN"
  }

  test("hash-key IN list plans a MultiRead of Queries (one per key)") {
    val df = load().filter(col("partition").isin("orgAm1", "orgBm1"))
      .filter(col("sort") === "100")
    df.count() shouldBe 2
    scanDesc(df) should include("mode=MULTI(2)")
  }

  test("<> pushes down as a server-side filter (DynamoFilterSpec parity)") {
    val df = load().filter(col("sort") =!= "100")
    df.collect().map(_.getAs[String]("sort")).sorted.toSeq shouldBe Seq("200", "300")
    val d = scanDesc(df)
    d should include("mode=SCAN")
    d should include("Not(EqualTo(sort,100))") // pushed, not residual-only
  }

  test("partitions are (path, segment) descriptors; rows materialize executor-side only") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // a table big enough for the segmentation heuristics to split
    val p = SparkFixture.tempDir("dsv2seg") + "/t_0_9000.parquet"
    spark.range(2500)
      .selectExpr("concat('p', id % 50) AS partition", "cast(id as string) AS sort",
        "array('w1') AS ids", "map('w1', cast(id as string)) AS field1")
      .write.mode("overwrite").parquet(p)
    val df = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", p).load()
    df.count() shouldBe 2500 // segments jointly cover the key space, no dups
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    val parts = scan.inputRDD.partitions.length
    parts should be > 1 // ceil(2500/1000) = 3 segments
    // the partition descriptors carry no row data — only the read plan
    val descs = scan.scan.toBatch.planInputPartitions()
    descs.foreach { ip =>
      val np = ip.asInstanceOf[graft.sources.dsv2.NearlinePartition]
      np.path shouldBe p
      np.numSegments shouldBe descs.length
    }
  }

  test("nested map/list/struct values read through the connector with point-selection null-fill") {
    val p = SparkFixture.tempDir("dsv2nested") + "/t_0_1000.parquet"
    val nested = StructType(Seq(
      StructField("partition", StringType), StructField("sort", StringType),
      StructField("attrs", StructType(Seq(
        StructField("colors", ArrayType(StringType)),
        StructField("meta", MapType(StringType, StringType))))),
      StructField("readings", ArrayType(LongType))))
    val rows = Seq(
      Row("orgAm1", "100", Row(Seq("red", "blue"), Map("k" -> "v1")), Seq(1L, 2L, 3L)),
      Row("orgAm1", "200", Row(Seq("green"), Map("k" -> "v2", "j" -> "x")), Seq(9L)),
      Row("orgBm1", "100", null, null))
    spark.createDataFrame(rows.asJava, nested).write.mode("overwrite").parquet(p)
    val df = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", p).load()
    // nested values round-trip (DynamoRecordReader handleMap/handleList parity)
    val got = df.filter(col("partition") === "orgAm1")
      .select(
        col("sort"),
        col("attrs.colors").getItem(0).as("c0"),
        element_at(col("attrs.meta"), "k").as("mk"),
        // point-selection past the end of a list null-fills
        // (adjustListValueForPointSelections:378-400); under ANSI mode the
        // null-tolerant accessor is try_element_at
        try_element_at(col("readings"), lit(3)).as("r2"))
      .orderBy("sort").collect()
    got.map(_.getString(1)).toSeq shouldBe Seq("red", "green")
    got.map(_.getString(2)).toSeq shouldBe Seq("v1", "v2")
    got.map(r => if (r.isNullAt(3)) null else r.getLong(3)).toSeq shouldBe Seq(3L, null)
    // wholly-null nested columns survive
    df.filter(col("partition") === "orgBm1").select("attrs", "readings")
      .collect().head.toSeq shouldBe Seq(null, null)
    // projection pushdown prunes sibling columns of a nested access: a
    // query touching only attrs must not read readings/ids at the scan
    val pruned = df.select(element_at(col("attrs.meta"), "k").as("mk"))
    pruned.collect()
    val d = pruned.queryExecution.executedPlan.toString
    d should include("BatchScan")
    d should not include "readings#"
    d should not include "sort#"
  }

  test("null attributes never satisfy pushed range filters (Dynamo absent-attribute semantics)") {
    // Spark trusts the source for convertible (pushed) filters and does NOT
    // re-check them, so the server-side evaluation must drop rows whose
    // attribute is null — SQL three-valued logic and DynamoDB filter
    // expressions agree. Round-2 bug: compare() treated null as -infinity,
    // so `amount < 5` wrongly kept null-amount rows.
    val p = SparkFixture.tempDir("dsv2null") + "/t_0_1000.parquet"
    val schema = StructType(Seq(
      StructField("partition", StringType), StructField("sort", StringType),
      StructField("amount", StringType)))
    val rows = Seq(
      Row("orgAm1", "100", "2"),
      Row("orgAm1", "200", null),     // must NOT satisfy amount < 5 / <= / > / >= / between
      Row("orgAm1", "300", "7"),
      Row("orgBm1", "100", null),
      Row("orgBm1", "200", "4"))
    spark.createDataFrame(rows.asJava, schema).write.mode("overwrite").parquet(p)
    val viaConnector = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", p).load()
    val viaParquet = spark.read.parquet(p)
    for (cond <- Seq(
        col("amount") < "5", col("amount") <= "4", col("amount") > "2",
        col("amount") >= "2", col("amount").between("1", "6"))) {
      val got = viaConnector.filter(cond)
        .select("partition", "sort").collect().map(r => (r.getString(0), r.getString(1))).sorted
      val want = viaParquet.filter(cond)
        .select("partition", "sort").collect().map(r => (r.getString(0), r.getString(1))).sorted
      got.toSeq shouldBe want.toSeq
    }
    // and the filter really is pushed (not silently residual)
    val df = viaConnector.filter(col("amount") < "5")
    df.collect().map(_.getString(1)).sorted.toSeq shouldBe Seq("100", "200")
    scanDesc(df) should include("LessThan(amount,5)")
  }

  test("server-side numeric compare is exact past double precision (Dynamo 38-digit N)") {
    // Two 20-digit values that collide when parsed as doubles: a double-
    // based compare returns 0 and `>` wrongly fails. Dynamo N comparison
    // is exact to 38 digits; so is the stub's.
    import graft.sources.dsv2.ParquetSegmentService.evalPred
    val lo = "10000000000000000000"
    val hi = "10000000000000000001"
    lo.toDouble shouldBe hi.toDouble // the collision double arithmetic can't see
    evalPred(ReadPlanner.Cmp("amount", ">", lo), Map("amount" -> hi)) shouldBe true
    evalPred(ReadPlanner.Cmp("amount", "<", hi), Map("amount" -> lo)) shouldBe true
    evalPred(ReadPlanner.Cmp("amount", ">", lo), Map("amount" -> lo)) shouldBe false
    evalPred(ReadPlanner.Between("amount", lo, lo), Map("amount" -> hi)) shouldBe false
    // scale-insensitive numeric equality via range ops ("1.10" ≡ "1.1")
    evalPred(ReadPlanner.Between("amount", "1.10", "1.10"), Map("amount" -> "1.1")) shouldBe true
    // non-numeric values still compare as strings
    evalPred(ReadPlanner.Cmp("name", "<", "b"), Map("name" -> "a")) shouldBe true
  }

  test("transport paging returns every record exactly once across continuation tokens") {
    // page size 2 over 4 rows forces multiple pages per segment; the
    // token-resume contract must neither drop nor duplicate
    val df = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", tablePath).option("pagesize", "2").load()
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    rows shouldBe Seq(
      ("orgAm1", "100"), ("orgAm1", "200"), ("orgAm1", "300"), ("orgBm1", "100"))
    // pushed filters still evaluate server-side under paging
    val q = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", tablePath).option("pagesize", "1").load()
      .filter(col("partition") === "orgAm1" && col("sort") >= "150")
    q.collect().map(_.getString(1)).sorted.toSeq shouldBe Seq("200", "300")
  }

  test("transient mid-segment failure is retried from the same continuation token") {
    FlakyOnceTransport.reset()
    val df = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", tablePath)
      .option("pagesize", "1") // several pages → a mid-segment call exists
      .option("transport", classOf[FlakyOnceTransport].getName)
      .load()
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    rows shouldBe Seq(
      ("orgAm1", "100"), ("orgAm1", "200"), ("orgAm1", "300"), ("orgBm1", "100"))
    FlakyOnceTransport.throwsInjected.get() shouldBe 1 // the fault really fired
  }

  test("persistent segment failure abandons the scan after bounded attempts") {
    val df = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", tablePath)
      .option("transport", classOf[AlwaysFailTransport].getName)
      .load()
    val e = intercept[Exception] { df.collect() }
    val messages = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(x => Option(x.getMessage)).toSeq
    messages.exists(_.contains("failed after 3 attempts")) shouldBe true
  }

  test("happy-path read decodes each raw row exactly once per segment (linear, not quadratic)") {
    // The round-3 regression: page resume re-decoded the stream prefix on
    // every call — O(N²/pageSize) row decodes for an N-row segment. The
    // streaming session must decode each row exactly once per segment,
    // and fetch at most rows/pageSize + a constant per segment of pages.
    val p = SparkFixture.tempDir("dsv2lin") + "/t_0_9000.parquet"
    val n = 2500
    spark.range(n)
      .selectExpr("concat('p', id % 50) AS partition", "cast(id as string) AS sort")
      .coalesce(1).write.mode("overwrite").parquet(p)
    CountingTransport.reset()
    val df = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", p).option("pagesize", "100")
      .option("transport", classOf[CountingTransport].getName)
      .load()
    df.count() shouldBe n
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val parts = df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get.inputRDD.partitions.length
    // each segment streams the raw file once: decodes == segments × rows
    CountingTransport.rowsDecoded.get() shouldBe parts.toLong * n
    // page fetches stay linear in delivered rows (+2 pages/segment slack:
    // the final partial page and a possible empty end-of-stream page)
    CountingTransport.pagesFetched.get() should be <= (n / 100 + 2 * parts).toLong
  }

  test("Query-mode reads over a hot hash key segment across multiple partitions") {
    // one hash key covering a big table must NOT serialize through one
    // task (round-3: 2035 s single-partition Query). Stub segments split
    // Query reads on the sort key; jointly exact, no dups.
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val p = SparkFixture.tempDir("dsv2qseg") + "/t_0_9000.parquet"
    // zero-padded sort: lexical compare (Spark's re-check on strings)
    // agrees with the server's numeric-aware compare, like the 13-digit
    // epoch-ms sorts the real tables use
    spark.range(25000)
      .selectExpr("'porg1' AS partition", "lpad(cast(id as string), 5, '0') AS sort")
      .write.mode("overwrite").parquet(p)
    val df = spark.read.format("graft.sources.dsv2.NearlineTableProvider")
      .option("path", p).load()
      .filter(col("partition") === "porg1")
    df.count() shouldBe 25000
    scanDesc(df) should include("mode=QUERY")
    val parts = df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get.inputRDD.partitions.length
    parts should be > 1 // ceil(25000/10/1000) = 3 Query segments
    // sort-range pushdown still composes with segmentation
    val ranged = df.filter(col("sort") >= "20000")
    ranged.count() shouldBe spark.read.parquet(p)
      .filter(col("sort") >= "20000").count()
  }

  test("connector output feeds the standard expansion + recombination path") {
    val desc = NearlineTableDesc("t_0_1000", tablePath, 0, 1000)
    val expanded = NearlineStub.expandRows(
      load().filter(col("partition") === "orgAm1"))
    // 3 items, one with two write-ids → 4 expanded rows
    expanded.count() shouldBe 4
    expanded.filter(col("timestamp") === "200").count() shouldBe 2
  }
}
