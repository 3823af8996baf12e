package graft.frontend

import java.io.ByteArrayOutputStream

/** Minimal protocol-buffers wire codec — just the four wire types the
  * Avatica protobuf transport needs (varint, 64-bit, length-delimited,
  * 32-bit), hand-rolled against the public protobuf encoding spec
  * (developers.google.com/protocol-buffers/docs/encoding). No generated
  * code and no protobuf runtime dependency: messages are encoded with
  * [[ProtoWriter]] field by field and decoded into a field-number →
  * values multimap by [[ProtoReader]], which is all a fixed protocol
  * needs. Unknown fields are skipped by wire type, so newer clients
  * degrade gracefully. */
private[frontend] object ProtoWire {
  final val WireVarint = 0
  final val WireFixed64 = 1
  final val WireBytes = 2
  final val WireFixed32 = 5
}

/** Append-only protobuf message writer. All field writers skip
  * proto3-default values (0 / "" / false / empty) unless `force`d, the
  * same omission rule generated encoders apply. */
private[frontend] final class ProtoWriter {
  private val out = new ByteArrayOutputStream()

  def toBytes: Array[Byte] = out.toByteArray

  private def varint(v: Long): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0) {
      out.write(((x & 0x7f) | 0x80).toInt)
      x >>>= 7
    }
    out.write((x & 0x7f).toInt)
  }

  private def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)

  def uint64(field: Int, v: Long, force: Boolean = false): Unit =
    if (v != 0 || force) { tag(field, ProtoWire.WireVarint); varint(v) }

  def uint32(field: Int, v: Int): Unit = uint64(field, v.toLong & 0xffffffffL)

  /** int32/int64/enum: negative values encode as 10-byte two's complement
    * varints, per spec. */
  def int64(field: Int, v: Long): Unit = uint64(field, v)

  def sint64(field: Int, v: Long): Unit =
    uint64(field, (v << 1) ^ (v >> 63)) // zigzag

  def bool(field: Int, v: Boolean, force: Boolean = false): Unit =
    if (v || force) { tag(field, ProtoWire.WireVarint); varint(1) }

  def double(field: Int, v: Double): Unit =
    if (v != 0.0 || (1.0 / v) < 0) { // keep -0.0, skip +0.0
      tag(field, ProtoWire.WireFixed64)
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
    }

  def bytes(field: Int, v: Array[Byte]): Unit =
    if (v.nonEmpty) { tag(field, ProtoWire.WireBytes); varint(v.length); out.write(v, 0, v.length) }

  def string(field: Int, v: String): Unit =
    if (v != null && v.nonEmpty) bytes(field, v.getBytes("UTF-8"))

  /** Nested message — ALWAYS emitted (an empty submessage is still
    * presence-signalling in proto3 since it is a message field). */
  def message(field: Int, body: ProtoWriter => Unit): Unit = {
    val w = new ProtoWriter
    body(w)
    val b = w.toBytes
    tag(field, ProtoWire.WireBytes)
    varint(b.length)
    out.write(b, 0, b.length)
  }
}

/** One decoded field occurrence: varints land in `num`, fixed64 raw bits
  * in `num`, length-delimited payloads in `payload`. */
private[frontend] final case class ProtoField(wire: Int, num: Long, payload: Array[Byte]) {
  def utf8: String = new String(payload, "UTF-8")
  def sint: Long = (num >>> 1) ^ -(num & 1) // un-zigzag
  def asDouble: Double = java.lang.Double.longBitsToDouble(num)
}

/** Single-pass protobuf message reader: all occurrences of every field,
  * in order, keyed by field number. */
private[frontend] final class ProtoReader(buf: Array[Byte]) {
  val fields: Map[Int, Vector[ProtoField]] = {
    var i = 0
    var acc = Map.empty[Int, Vector[ProtoField]].withDefaultValue(Vector.empty)
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        require(i < buf.length, "truncated varint")
        val b = buf(i); i += 1
        v |= (b.toLong & 0x7f) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    while (i < buf.length) {
      val key = varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      val f = wire match {
        case ProtoWire.WireVarint => ProtoField(wire, varint(), Array.empty)
        case ProtoWire.WireFixed64 =>
          var v = 0L
          var k = 0
          while (k < 8) { v |= (buf(i).toLong & 0xff) << (8 * k); i += 1; k += 1 }
          ProtoField(wire, v, Array.empty)
        case ProtoWire.WireBytes =>
          val len = varint().toInt
          // copyOfRange would silently NUL-pad past the end — a truncated
          // request must be an error, not garbage SQL
          require(len >= 0 && i + len <= buf.length,
            s"truncated length-delimited field: need $len bytes, have ${buf.length - i}")
          val p = java.util.Arrays.copyOfRange(buf, i, i + len)
          i += len
          ProtoField(wire, 0, p)
        case ProtoWire.WireFixed32 =>
          var v = 0L
          var k = 0
          while (k < 4) { v |= (buf(i).toLong & 0xff) << (8 * k); i += 1; k += 1 }
          ProtoField(wire, v, Array.empty)
        case other => throw new IllegalArgumentException(s"unsupported wire type $other")
      }
      acc = acc.updated(field, acc(field) :+ f)
    }
    acc
  }

  def first(field: Int): Option[ProtoField] = fields(field).headOption
  def all(field: Int): Vector[ProtoField] = fields(field)
  def str(field: Int): String = first(field).map(_.utf8).getOrElse("")
  def long(field: Int): Long = first(field).map(_.num).getOrElse(0L)
  def int(field: Int): Int = long(field).toInt
  def boolean(field: Int): Boolean = long(field) != 0
  def sub(field: Int): Option[ProtoReader] = first(field).map(f => new ProtoReader(f.payload))
}
