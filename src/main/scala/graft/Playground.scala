package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for quick experiments (not part of the engine). */
object Playground {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // drive the file-stream surface: land event files, stream them through
    // the watermarked windowed agg, read the memory sink
    val landing = java.nio.file.Files.createTempDirectory("landing").toString
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "event_type", "value")
    ev.filter(col("event_id") < 500).write.mode("append").parquet(landing)
    val q = graft.streaming.EventStreams.runFileStream(spark, landing, "pg_stream")
    q.processAllAvailable()
    val afterFirst = spark.sql("SELECT count(*) FROM pg_stream").collect()(0).getLong(0)
    ev.filter(col("event_id") >= 500).write.mode("append").parquet(landing)
    q.processAllAvailable()
    val afterSecond = spark.sql("SELECT count(*) FROM pg_stream").collect()(0).getLong(0)
    q.stop()
    println(s"STREAM windows after batch1=$afterFirst after batch2=$afterSecond")
    spark.sql("SELECT * FROM pg_stream ORDER BY win_start, event_type LIMIT 5").show()
    spark.stop()
  }
}
