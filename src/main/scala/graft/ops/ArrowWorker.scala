package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.graftshim.{ArrowSeam, ArrowWorkerBridge}
import org.apache.spark.sql.types.StructType

/** OUT-OF-PROCESS decoder seam: [[Multimodal.decodeWithArrow]]'s batch
  * stream driven through a FORKED worker process — the deployment shape
  * where the codec is a native sidecar (ffmpeg wrapper, GPU batch
  * decoder) rather than JVM code. Each partition forks one worker and
  * streams serialized Arrow record batches over stdin/stdout
  * (length-framed; see [[ArrowWorkerBridge]]); the pipes' OS buffers
  * are the backpressure, a dead worker surfaces as an IOException with
  * its exit code and stderr tail, and a poison-pill asset yields a
  * null row exactly like the in-JVM path (the worker runs the same
  * row codecs, so the two paths are value-equal by construction —
  * spec-pinned over real GIF bytes).
  *
  * Scale shape: worker fork cost is per-TASK (hundreds of batches each
  * at 100 TB), parallelism = input partitions, no shuffle — identical
  * plan to the in-JVM seam; only the decode boundary moves across the
  * process line. Reference: the native-worker half of the codec claim
  * (fineo-readerator keeps decode inside its JVM readers —
  * `DynamoRecordReader.java` — so this surface is the training-data
  * extension, not a port). */
object ArrowWorker {

  /** Decode `assets` through a forked worker. `command` is the full
    * argv (see [[jvmCommand]] for the in-repo JVM worker); the worker
    * must speak the bridge framing and emit `outSchema`-shaped
    * batches. */
  def viaProcess(
      assets: DataFrame,
      outSchema: StructType,
      command: Seq[String],
      batchRows: Int = 512): DataFrame = {
    val schemaJson = assets.schema.json
    ArrowSeam.mapArrowBatches(assets, outSchema, batchRows.toLong) { batches =>
      ArrowWorkerBridge.pipeThrough(command, schemaJson, batches)
    }
  }

  /** argv for the in-repo JVM worker ([[ArrowWorkerMain]]): same JVM,
    * same classpath, the module opens Spark 4 needs on JDK 17+. A real
    * deployment replaces this wholesale with its native binary. */
  def jvmCommand(mode: String, xmx: String = "1g"): Seq[String] = {
    val java = System.getProperty("java.home") + "/bin/java"
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    Seq(java) ++ opens ++ Seq(
      "-Dio.netty.tryReflectionSetAccessible=true",
      s"-Xmx$xmx",
      "-cp", System.getProperty("java.class.path"),
      "graft.ops.ArrowWorkerMain", mode)
  }
}

/** The worker process entry point. Modes:
  *   - `image`   — [[Multimodal.imageIoDecoder]] (real javax.imageio
  *                 pixels, poison-pill-safe) → [[Multimodal.imageDecodedSchema]]
  *   - `stub`    — [[Multimodal.stubDecoder]] → [[Multimodal.decodedSchema]]
  *   - `echo`    — identity transform, output schema = input schema
  *                 (the volume/backpressure exercise)
  *   - `die:N`   — `image`, but exit(7) after N output batches with no
  *                 end sentinel (the killed-worker fault injection) */
object ArrowWorkerMain {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("image")
    val (modeName, dieAfter) =
      if (mode.startsWith("die:")) ("image", mode.stripPrefix("die:").toInt)
      else (mode, Int.MaxValue)
    val decoderFor: StructType => (Iterator[Row] => Iterator[Row], StructType) =
      modeName match {
        case "image" =>
          _ => (Multimodal.imageIoDecoder, Multimodal.imageDecodedSchema)
        case "stub" => _ => (Multimodal.stubDecoder, Multimodal.decodedSchema)
        case "echo" => s => (identity, s)
        case other => sys.error(s"unknown worker mode: $other")
      }
    try ArrowWorkerBridge.workerLoop(System.in, System.out, decoderFor, dieAfter)
    catch {
      case e: Throwable =>
        System.err.println(s"worker failed: ${e.getClass.getName}: ${e.getMessage}")
        sys.exit(2)
    }
  }
}
