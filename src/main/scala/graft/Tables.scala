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
    // Normalize events.ts to a session-tz TimestampType whatever physical
    // type the generator used:
    //   - TIMESTAMP(NANOS): Spark cannot represent it natively
    //     (PARQUET_TYPE_ILLEGAL); sessions set
    //     spark.sql.legacy.parquet.nanosAsLong=true, so it arrives as an
    //     epoch-nanos long — truncate to micros (identical semantics to
    //     DuckDB's nanos read truncated later to millis);
    //   - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    //     TIMESTAMP_NTZ — reinterpret the wall clock in the session zone
    //     (sessions pin UTC), matching DuckDB's naive TIMESTAMP read.
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    } else df
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
