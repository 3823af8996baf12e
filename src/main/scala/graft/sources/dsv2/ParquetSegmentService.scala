package graft.sources.dsv2

import graft.sources.ReadPlanner
import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.{GroupType, PrimitiveType, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Executor-side record transport for the stubbed nearline service: each
  * [[NearlinePartition]] reads its own slice of the table directly from
  * the parquet file(s) — no driver-side materialization anywhere. This is
  * the partition contract of the reference's segmented Dynamo scan
  * (`DynamoGroupScan.applyAssignments:110-164`: a partition carries
  * (table, segment) and the *reader* pulls pages), so a real SDK-backed
  * transport slots in by swapping only this object.
  *
  * Records surface as plain `Map[fieldName -> value]` (String / Long /
  * Double / Boolean / bytes / Seq / Map / nested Map-for-struct), which is
  * also what the server-side filter evaluation runs against — mirroring
  * Dynamo item JSON, including nested maps and lists
  * (`DynamoRecordReader.java:281-375` handleMap/handleList).
  */
object ParquetSegmentService {

  /** Part files of a parquet table directory (or a single file). */
  def partFiles(tablePath: String): Seq[String] = {
    val f = new java.io.File(tablePath)
    if (f.isFile) Seq(tablePath)
    else f.listFiles((_, name) => name.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted.toSeq
  }

  // ------------------------------------------------- Group → Scala values

  def groupToMap(g: Group): Map[String, Any] = {
    val gt = g.getType
    (0 until gt.getFieldCount).map { i =>
      val f = gt.getType(i)
      val v = if (g.getFieldRepetitionCount(i) == 0) null else fieldValue(g, i, f)
      f.getName -> v
    }.toMap
  }

  private def fieldValue(g: Group, i: Int, f: Type): Any = f match {
    case p: PrimitiveType => primitive(g, i, 0, p)
    case grp: GroupType =>
      val ann = Option(grp.getLogicalTypeAnnotation).map(_.toString).getOrElse("")
      if (ann.startsWith("LIST")) listValue(g.getGroup(i, 0))
      else if (ann.startsWith("MAP")) mapValue(g.getGroup(i, 0))
      else groupToMap(g.getGroup(i, 0)) // plain struct
  }

  /** Standard parquet LIST shape: repeated group holding one element. */
  private def listValue(lg: Group): Seq[Any] = {
    val n = lg.getFieldRepetitionCount(0)
    (0 until n).map { j =>
      val wrapper = lg.getGroup(0, j)
      val et = wrapper.getType.getType(0)
      if (wrapper.getFieldRepetitionCount(0) == 0) null
      else fieldValue(wrapper, 0, et)
    }
  }

  /** Standard parquet MAP shape: repeated key_value(key, value). */
  private def mapValue(mg: Group): Map[Any, Any] = {
    val n = mg.getFieldRepetitionCount(0)
    (0 until n).map { j =>
      val kv = mg.getGroup(0, j)
      val k = fieldValue(kv, 0, kv.getType.getType(0))
      val v =
        if (kv.getType.getFieldCount < 2 || kv.getFieldRepetitionCount(1) == 0) null
        else fieldValue(kv, 1, kv.getType.getType(1))
      k -> v
    }.toMap
  }

  private def primitive(g: Group, i: Int, r: Int, p: PrimitiveType): Any =
    p.getPrimitiveTypeName match {
      case BINARY | FIXED_LEN_BYTE_ARRAY =>
        val ann = Option(p.getLogicalTypeAnnotation).map(_.toString).getOrElse("")
        if (ann.contains("STRING") || ann.contains("ENUM") || ann.contains("JSON"))
          g.getBinary(i, r).toStringUsingUTF8
        else g.getBinary(i, r).getBytes
      case INT64   => g.getLong(i, r)
      case INT32   => g.getInteger(i, r)
      case DOUBLE  => g.getDouble(i, r)
      case FLOAT   => g.getFloat(i, r)
      case BOOLEAN => g.getBoolean(i, r)
      case _       => g.getValueToString(i, r)
    }

  // -------------------------------------- server-side predicate semantics

  /** Evaluate a planned read against one record — the "server side" of the
    * stub. String comparison on the hash key (equality), numeric-aware
    * compare on sort key / scalar attributes (Dynamo's typed N compare).
    *
    * Residual predicates are evaluated here too: the connector tells
    * Spark that every *convertible* filter is fully handled by the
    * source, so a residual that came from pushed filters (e.g. the
    * duplicate key-equality or attribute conjuncts a Get can't encode)
    * MUST be applied by the reader. `Opaque` residuals evaluate to true —
    * they only arise for filters the connector never pushes, which Spark
    * re-checks itself. */
  def evalRead(read: ReadPlanner.Read, rec: Map[String, Any],
      hashKey: String, sortKey: String): Boolean = read match {
    case ReadPlanner.Scan(filter, res) =>
      filter.forall(evalPred(_, rec)) && res.forall(evalPred(_, rec))
    case ReadPlanner.Query(hash, sortCond, filter, res) =>
      str(rec, hashKey) == hash &&
        sortCond.forall(evalPred(_, rec)) && filter.forall(evalPred(_, rec)) &&
        res.forall(evalPred(_, rec))
    case ReadPlanner.Get(hash, sort, res) =>
      str(rec, hashKey) == hash && str(rec, sortKey) == sort &&
        res.forall(evalPred(_, rec))
    case ReadPlanner.MultiRead(reads) => reads.exists(evalRead(_, rec, hashKey, sortKey))
  }

  def evalPred(p: ReadPlanner.Pred, rec: Map[String, Any]): Boolean = p match {
    case ReadPlanner.Eq(f, v) => str(rec, f) == v
    case ReadPlanner.Ne(f, v) =>
      val s = str(rec, f)
      s != null && s != v // SQL three-valued: NULL <> v is unknown → drop
    case ReadPlanner.Cmp(f, op, v) =>
      // Absent/null attribute never satisfies a range condition: DynamoDB
      // filter expressions are false on missing attributes and SQL
      // three-valued logic drops NULL comparisons (the same rule Ne above
      // applies). Spark trusts the source for convertible filters, so this
      // must hold server-side.
      val s = str(rec, f)
      s != null && {
        val c = compare(s, v)
        op match {
          case "<" => c < 0; case "<=" => c <= 0
          case ">" => c > 0; case ">=" => c >= 0
          case _ => true
        }
      }
    case ReadPlanner.Between(f, lo, hi) =>
      val s = str(rec, f)
      s != null && compare(s, lo) >= 0 && compare(s, hi) <= 0
    case ReadPlanner.And(ps) => ps.forall(evalPred(_, rec))
    case ReadPlanner.Or(ps)  => ps.exists(evalPred(_, rec))
    case ReadPlanner.Opaque(_) => true // server can't evaluate; Spark re-checks
  }

  private def str(rec: Map[String, Any], f: String): String =
    rec.getOrElse(f, null) match {
      case null => null
      case v    => render(v)
    }

  /** Canonical string rendering of a record value. Byte arrays (BINARY
    * columns without a STRING annotation) are hex-encoded: `String
    * .valueOf` on an array is identity-based (`[B@...`), so two
    * evaluations of the SAME stored bytes would render (and therefore
    * hash-segment) differently — content-based encoding is the only
    * rendering under which segment membership is a function of the data. */
  def render(v: Any): String = v match {
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case other          => String.valueOf(other)
  }

  /** Numeric-aware compare, mirroring Dynamo's typed N comparison —
    * EXACT, like Dynamo's 38-digit N arithmetic: BigDecimal, not double,
    * so two long decimals that collide at double precision (digit 17+)
    * still order correctly. Callers guard null (a null attribute fails
    * every range condition). */
  private def compare(a: String, b: String): Int =
    try new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    catch { case _: NumberFormatException => a.compareTo(b) }

  /** Segment assignment: hash of the partition-key value, like Dynamo's
    * internal hash segmentation — all items of one partition key land in
    * one segment, segments jointly cover the key space. */
  def inSegment(rec: Map[String, Any], hashKey: String,
      segment: Int, numSegments: Int): Boolean =
    numSegments <= 1 ||
      inSegmentValue(str(rec, hashKey), segment, numSegments)

  /** [[inSegment]] on an already-extracted key string. */
  def inSegmentValue(h: String, segment: Int, numSegments: Int): Boolean =
    numSegments <= 1 ||
      java.lang.Math.floorMod(if (h == null) 0 else h.hashCode, numSegments) == segment

  /** Segment-key value straight off the raw Group, WITHOUT materializing
    * the full record map — the per-row fast path of a segmented stub
    * read. Every segment's session decodes the whole raw stream and
    * keeps only its 1/S slice (the stub "server" has no physical
    * partitioning, unlike the real service), so at S segments the table
    * pays S × N full-record conversions unless the (S−1)/S non-matching
    * rows are rejected on the key alone. Produces EXACTLY what
    * `str(groupToMap(g), key)` would ([[render]] of the same primitive
    * conversion — including the hex encoding of non-STRING BINARY keys,
    * whose Java array rendering is identity-based and would otherwise
    * make segment membership arbitrary per evaluation), so segment
    * assignment cannot fork between the fast and slow paths; nested or
    * absent keys fall back to the full-map route. */
  def segKeyString(g: Group, key: String): String = {
    val gt = g.getType
    if (!gt.containsField(key)) return null
    val i = gt.getFieldIndex(key)
    gt.getType(i) match {
      case p: PrimitiveType =>
        if (g.getFieldRepetitionCount(i) == 0) null
        else render(primitive(g, i, 0, p))
      case _ => str(groupToMap(g), key)
    }
  }

  /** Which key splits a read across segments: Scan segments split on the
    * hash key (Dynamo's own segmentation); Query reads key every matching
    * row to ONE hash value, so their stub segments split on the SORT key —
    * a whole-table hash key must not serialize through one task. Shared by
    * every transport so segment semantics can't diverge between them. */
  def segmentKeyFor(read: ReadPlanner.Read, hashKey: String, sortKey: String): String =
    read match {
      case _: ReadPlanner.Query => sortKey
      case _ => hashKey
    }
}
