package org.apache.spark.sql.graftshim

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** COLUMNAR-BATCH decoder seam over Arrow IPC — the 100×-scale shape of
  * the media decode path: a native codec worker (ffmpeg behind JNI, a
  * sidecar process, a GPU batch decoder) consumes and produces
  * **serialized Arrow record batches**, the interchange format Spark
  * itself uses for Pandas UDFs, so the partition crosses the
  * JVM/native boundary as a handful of contiguous buffers instead of
  * row-at-a-time object traffic. This shim lives in the spark.sql
  * package tree purely to reach the `private[sql]`
  * `ArrowConverters`/`internalCreateDataFrame` internals — no Spark
  * internals are modified, and the bytes each callback sees are
  * standard Arrow record-batch messages any Arrow implementation can
  * read.
  *
  * [[mapArrowBatches]] is the raw byte-level seam;
  * [[mapArrowRows]] adapts a row-level decoder onto it (batches
  * deserialize to rows, the decoder runs, results re-serialize) — the
  * in-repo stand-in for the native worker on the far side of the IPC
  * boundary, letting the pure-JVM codecs prove the batched plumbing
  * end-to-end (spec-pinned value-equal to the row-iterator seam). */
object ArrowSeam {

  /** Run `f` over each partition as an iterator of serialized Arrow
    * record batches (≤ `batchRows` rows each); `f`'s output batches
    * must carry `outSchema`. No shuffle; parallelism = input
    * partitions — identical plan shape to the row seam. */
  def mapArrowBatches(
      df: DataFrame,
      outSchema: StructType,
      batchRows: Long)(
      f: Iterator[Array[Byte]] => Iterator[Array[Byte]]): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val inSchema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val inRdd =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution.toRdd
    val outRdd = inRdd.mapPartitions { it =>
      val ctx = TaskContext.get()
      val batches = ArrowConverters.toBatchIterator(
        it, inSchema, batchRows, tz,
        true /* errorOnDuplicatedFieldNames */, false /* largeVarTypes */, ctx)
      ArrowConverters.fromBatchIterator(f(batches), outSchema, tz, true, false, ctx)
        .map(_.copy())
    }
    spark.internalCreateDataFrame(outRdd, outSchema)
  }

  /** Row-level decoder on the Arrow seam: each partition's rows flow
    * through Arrow record batches on BOTH sides of `decode` — the
    * batched transport is real; only the worker is in-JVM. */
  def mapArrowRows(
      df: DataFrame,
      outSchema: StructType,
      batchRows: Long)(
      decode: Iterator[Row] => Iterator[Row]): DataFrame = {
    val inSchema = df.schema
    // the worker must parse/emit batches under the SAME session time
    // zone the outer seam serialized with, or timestamp columns shift
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    mapArrowBatches(df, outSchema, batchRows) { batches =>
      val ctx = TaskContext.get()
      val fromRow = ExpressionEncoder(RowEncoder.encoderFor(inSchema))
        .resolveAndBind().createDeserializer()
      val toRow =
        ExpressionEncoder(RowEncoder.encoderFor(outSchema)).createSerializer()
      val rows = ArrowConverters
        .fromBatchIterator(batches, inSchema, tz, true, false, ctx)
        .map(ir => fromRow(ir.copy()))
      ArrowConverters.toBatchIterator(
        decode(rows).map(r => toRow(r).copy()), outSchema, batchRows, tz,
        true, false, ctx)
    }
  }
}
