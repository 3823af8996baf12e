package org.apache.spark.sql.graftshim

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, InputStream, OutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{VectorLoader, VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.ipc.{ReadChannel, WriteChannel}
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.spark.TaskContext
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}
import scala.jdk.CollectionConverters._

/** The OUT-OF-PROCESS half of the Arrow decode seam: everything needed
  * to run [[ArrowSeam.mapArrowBatches]]'s batch stream through a FORKED
  * worker over stdin/stdout — the sidecar-codec deployment shape
  * (ffmpeg wrapper, GPU batch decoder) the in-JVM seam stands in for.
  * Lives in the spark.sql package tree to reach the same
  * `private[sql]` internals the seam uses (`ArrowUtils` for the
  * schema mapping, `ArrowWriter` for building batches worker-side,
  * `TaskContext.setTaskContext` so the feeder thread can consume the
  * task's scan iterator — the exact trick Spark's own PythonRunner
  * writer thread uses).
  *
  * Wire framing (both directions): 4-byte big-endian length + payload;
  * length −1 is the clean end-of-stream sentinel. Frame 0 driver→worker
  * is the INPUT schema as Spark schema JSON; every later frame is one
  * serialized Arrow record-batch message (`MessageSerializer` form —
  * byte-identical to what [[ArrowSeam]]'s batch iterators produce and
  * consume, so any Arrow implementation can sit on the far side).
  * Backpressure is the pipes': a slow consumer fills the OS pipe
  * buffer and blocks the producer — no unbounded queue anywhere. */
object ArrowWorkerBridge {

  // ------------------------------------------------------------ framing

  def writeFrame(out: OutputStream, bytes: Array[Byte]): Unit = {
    val d = new DataOutputStream(out)
    d.writeInt(bytes.length)
    d.write(bytes)
  }

  def writeEof(out: OutputStream): Unit =
    new DataOutputStream(out).writeInt(-1)

  /** None = clean −1 sentinel. A stream that ends mid-frame (or before
    * a sentinel) throws EOFException — the caller turns that into a
    * dead-worker diagnosis. */
  def readFrame(in: InputStream): Option[Array[Byte]] = {
    val d = new DataInputStream(in)
    val len = d.readInt()
    if (len < 0) None
    else {
      val buf = new Array[Byte](len)
      d.readFully(buf)
      Some(buf)
    }
  }

  // ------------------------------------------------------ driver side

  /** Pipe a partition's Arrow batch stream through one forked worker
    * process. Feeder thread writes (schema frame, batch frames, EOF)
    * to the worker's stdin under the task's TaskContext; the returned
    * iterator reads transformed batch frames off stdout. A worker that
    * dies mid-stream surfaces as an IOException naming the exit code
    * and the tail of its stderr — never a hang or a silent truncation. */
  def pipeThrough(
      command: Seq[String],
      inSchemaJson: String,
      batches: Iterator[Array[Byte]]): Iterator[Array[Byte]] = {
    val proc = new ProcessBuilder(command.asJava).start()
    val taskCtx = TaskContext.get()
    // reap the worker even when the consumer abandons the iterator
    // mid-partition (a LIMIT, a failed task): the task's end is the
    // worker's end
    if (taskCtx != null)
      taskCtx.addTaskCompletionListener[Unit] { _ =>
        if (proc.isAlive) proc.destroyForcibly()
        ()
      }

    // stderr drainer: keep the tail for diagnostics, never block the worker
    val stderrTail = new java.util.concurrent.ConcurrentLinkedDeque[String]()
    val errThread = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getErrorStream, UTF_8))
      var line = r.readLine()
      while (line != null) {
        stderrTail.addLast(line)
        while (stderrTail.size() > 50) stderrTail.removeFirst()
        line = r.readLine()
      }
    }, "arrow-worker-stderr")
    errThread.setDaemon(true)
    errThread.start()

    val feedError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val feeder = new Thread(() => {
      // the scan iterator belongs to the task: bind its context here
      // (PythonRunner's writer-thread pattern) or columnar readers NPE
      if (taskCtx != null) TaskContext.setTaskContext(taskCtx)
      val os = new BufferedOutputStream(proc.getOutputStream, 1 << 16)
      try {
        writeFrame(os, inSchemaJson.getBytes(UTF_8))
        batches.foreach(writeFrame(os, _))
        writeEof(os)
        os.flush()
        os.close()
      } catch {
        case t: Throwable =>
          // broken pipe = the worker died; the reader side diagnoses it
          feedError.set(t)
          try os.close() catch { case _: Throwable => () }
      }
    }, "arrow-worker-feeder")
    feeder.setDaemon(true)
    feeder.start()

    val stdout = new BufferedInputStream(proc.getInputStream, 1 << 16)
    new Iterator[Array[Byte]] {
      private var pending: Option[Array[Byte]] = None
      private var done = false

      private def diePath(cause: Throwable): Nothing = {
        val code = try { proc.waitFor() } catch { case _: InterruptedException => -1 }
        feeder.join(10000)
        errThread.join(2000)
        val err = stderrTail.asScala.mkString(" | ").takeRight(800)
        throw new java.io.IOException(
          s"arrow worker died mid-stream (exit $code)" +
            (if (err.nonEmpty) s"; stderr: $err" else ""), cause)
      }

      private def advance(): Unit = if (pending.isEmpty && !done) {
        pending =
          try readFrame(stdout)
          catch { case e: java.io.EOFException => diePath(e) }
        if (pending.isEmpty) {
          done = true
          val code = proc.waitFor()
          feeder.join(10000)
          if (code != 0) diePath(null)
          Option(feedError.get()).foreach { t =>
            throw new java.io.IOException("arrow worker feed failed", t)
          }
        }
      }

      override def hasNext: Boolean = { advance(); pending.isDefined }
      override def next(): Array[Byte] = {
        advance()
        val b = pending.getOrElse(throw new NoSuchElementException)
        pending = None
        b
      }
    }
  }

  // ------------------------------------------------------ worker side

  /** The worker's whole life: read the schema frame, then transform
    * record batches one at a time until the EOF sentinel — decode via
    * pure Arrow Java (`MessageSerializer`/`VectorLoader` in,
    * `ArrowWriter`/`VectorUnloader` out), with the row decoder supplied
    * by the caller. `dieAfter` is the fault-injection hook: exit(7)
    * without a sentinel after that many output frames (the spec's
    * killed-worker case). */
  def workerLoop(
      stdin: InputStream,
      stdout: OutputStream,
      decoderFor: StructType => (Iterator[Row] => Iterator[Row], StructType),
      dieAfter: Int = Int.MaxValue): Unit = {
    val in = new BufferedInputStream(stdin, 1 << 16)
    val out = new BufferedOutputStream(stdout, 1 << 16)
    val inSchema = DataType.fromJson(new String(
      readFrame(in).getOrElse(throw new java.io.EOFException("no schema frame")),
      UTF_8)).asInstanceOf[StructType]
    val (decoder, outSchema) = decoderFor(inSchema)
    val tz = "UTC" // media-decode shapes carry no session-zoned timestamps
    val allocator = new RootAllocator()
    val inRoot = VectorSchemaRoot.create(
      ArrowUtils.toArrowSchema(inSchema, tz, true, false), allocator)
    val outRoot = VectorSchemaRoot.create(
      ArrowUtils.toArrowSchema(outSchema, tz, true, false), allocator)
    val loader = new VectorLoader(inRoot)
    val unloader = new VectorUnloader(outRoot)
    val arrowWriter = ArrowWriter.create(outRoot)
    val fromRow = ExpressionEncoder(RowEncoder.encoderFor(inSchema))
      .resolveAndBind().createDeserializer()
    val toRow = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
      .createSerializer()
    var emitted = 0
    var frame = readFrame(in)
    while (frame.isDefined) {
      val batch = MessageSerializer.deserializeRecordBatch(
        new ReadChannel(Channels.newChannel(new ByteArrayInputStream(frame.get))),
        allocator)
      try loader.load(batch) finally batch.close()
      val cols: Array[ColumnVector] =
        inRoot.getFieldVectors.asScala.map(new ArrowColumnVector(_)).toArray
      val cb = new ColumnarBatch(cols, inRoot.getRowCount)
      val rows = cb.rowIterator().asScala.map(ir => fromRow(ir.copy()))
      arrowWriter.reset()
      decoder(rows).foreach(r => arrowWriter.write(toRow(r)))
      arrowWriter.finish()
      val rb = unloader.getRecordBatch
      val bos = new ByteArrayOutputStream()
      try MessageSerializer.serialize(
        new WriteChannel(Channels.newChannel(bos)), rb)
      finally rb.close()
      writeFrame(out, bos.toByteArray)
      out.flush() // per-batch: the pipe, not a buffer, is the queue
      emitted += 1
      if (emitted >= dieAfter) sys.exit(7) // fault injection: no sentinel
      frame = readFrame(in)
    }
    writeEof(out)
    out.flush()
    inRoot.close(); outRoot.close(); allocator.close()
  }
}
