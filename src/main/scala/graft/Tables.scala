package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * All queries in [[SparkEntry]] read through here so that the scan always
  * comes from a parquet file source (column pruning + predicate pushdown
  * reach the scan; see SURVEY.md §2.1 S1/S2).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark cannot represent
    // natively (PARQUET_TYPE_ILLEGAL). Sessions set
    // spark.sql.legacy.parquet.nanosAsLong=true, so it arrives as an
    // epoch-nanos long; normalize to a microsecond TimestampType here
    // (integer-div truncation — identical semantics to DuckDB's reading of
    // the full nanos value when later truncated to millis).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
