package graft.sources.dsv2

import graft.sources.ReadPlanner
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap, Set => JSet}
import scala.jdk.CollectionConverters._

/** DataSourceV2 connector for the nearline (DynamoDB-style) store —
  * the Spark-native rebuild of the reference's Drill storage plugin
  * (`storage-dynamo`, SURVEY.md §2.1 S3-S5, §4 R4/R5/R8/R9):
  *
  *   - `SupportsPushDownFilters`: pushed predicates run through
  *     [[ReadPlanner]] to decide Scan vs Query vs Get (the reference's
  *     `DynamoReadBuilder` decision table); whatever the "server" can't
  *     evaluate is returned as residual for Spark to re-check.
  *   - `SupportsPushDownRequiredColumns`: projection pushdown
  *     (`DynamoGroupScan.canPushdownProjects`).
  *   - `planInputPartitions`: one partition per scan segment
  *     (`DynamoGroupScan.applyAssignments` segmentation); keyed reads
  *     (Query/Get) plan a single partition.
  *   - `SupportsReportStatistics`: row-count estimates matching the
  *     reference's cost model (scan = item count, query ≈ count/10,
  *     get = #gets — `DynamoGroupScan.java:187-215`).
  *
  * The transport layer is stubbed for this environment (no AWS): "the
  * service" is a parquet file per table, snapshotted at plan time, with
  * server-side filtering and segmentation emulated faithfully — each
  * [[NearlinePartition]] carries only its segment's rows, exactly like a
  * segmented DynamoDB Scan response. A real deployment swaps
  * [[StubService]] for an SDK-backed implementation with the same
  * interface; every planning decision above is transport-independent.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.dsv2.NearlineTableProvider")
  *     .option("path", "/data/nearline/tbl_100_200.parquet")
  *     .load()
  * }}}
  */
class NearlineTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StubService.schema(options.get("path"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new NearlineTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object NearlineTableProvider {
  val HashKey = "partition"
  val SortKey = "sort"
}

class NearlineTable(path: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"nearline(${new java.io.File(path).getName})"
  override def schema(): StructType = schema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NearlineScanBuilder(path, schema)
}

class NearlineScanBuilder(path: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import NearlineTableProvider._

  private var required: StructType = fullSchema
  private var pushed: Array[sources.Filter] = Array.empty
  private var residualToSpark: Array[sources.Filter] = Array.empty

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    // Keep filters the "server" can evaluate (key + scalar attribute
    // predicates); give everything else back to Spark. Spark also
    // re-applies pushed filters — harmless, and required anyway for
    // filters the ReadPlanner later classifies residual.
    val (ours, theirs) = filters.partition(convertible)
    pushed = ours
    residualToSpark = theirs
    theirs
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val pred = toPred(pushed)
    val read = ReadPlanner.plan(HashKey, SortKey, pred)
    new NearlineScan(path, required, read, pushed)
  }

  private def convertible(f: sources.Filter): Boolean = f match {
    case _: sources.EqualTo | _: sources.GreaterThan | _: sources.GreaterThanOrEqual |
         _: sources.LessThan | _: sources.LessThanOrEqual => true
    case sources.And(l, r) => convertible(l) && convertible(r)
    case sources.Or(l, r)  => convertible(l) && convertible(r)
    case _ => false
  }

  private def toPred(fs: Array[sources.Filter]): Option[ReadPlanner.Pred] = {
    def conv(f: sources.Filter): ReadPlanner.Pred = f match {
      case sources.EqualTo(a, v)            => ReadPlanner.Eq(a, String.valueOf(v))
      case sources.GreaterThan(a, v)        => ReadPlanner.Cmp(a, ">", String.valueOf(v))
      case sources.GreaterThanOrEqual(a, v) => ReadPlanner.Cmp(a, ">=", String.valueOf(v))
      case sources.LessThan(a, v)           => ReadPlanner.Cmp(a, "<", String.valueOf(v))
      case sources.LessThanOrEqual(a, v)    => ReadPlanner.Cmp(a, "<=", String.valueOf(v))
      case sources.And(l, r) => ReadPlanner.And(Seq(conv(l), conv(r)))
      case sources.Or(l, r)  => ReadPlanner.Or(Seq(conv(l), conv(r)))
      case other => ReadPlanner.Opaque(other.toString)
    }
    if (fs.isEmpty) None else Some(ReadPlanner.And(fs.map(conv).toSeq))
  }
}

class NearlineScan(
    path: String,
    required: StructType,
    read: ReadPlanner.Read,
    pushed: Array[sources.Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def description(): String = {
    val mode = read match {
      case _: ReadPlanner.Get => "GET"
      case _: ReadPlanner.Query => "QUERY"
      case m: ReadPlanner.MultiRead => s"MULTI(${m.reads.size})"
      case _: ReadPlanner.Scan => "SCAN"
    }
    s"NearlineScan mode=$mode pushed=[${pushed.mkString(", ")}]"
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val rows = StubService.read(path, read, required)
    read match {
      case _: ReadPlanner.Get | _: ReadPlanner.Query | _: ReadPlanner.MultiRead =>
        // keyed reads return one bounded result page
        Array(NearlinePartition(rows))
      case _: ReadPlanner.Scan =>
        // segmented parallel scan (DynamoGroupScan.applyAssignments):
        // segment count from the reference heuristics, rows dealt to
        // segments like the service's hash segmentation would
        val n = ReadPlanner.scanSegments(
          approxRows = math.max(rows.length, 1),
          executors = Runtime.getRuntime.availableProcessors())
        rows.grouped(math.max(1, math.ceil(rows.length.toDouble / n).toInt))
          .map(NearlinePartition.apply)
          .toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NearlineReaderFactory

  override def estimateStatistics(): Statistics = new Statistics {
    private val total = StubService.count(path)
    private val estimate: Long = read match {
      case g: ReadPlanner.Get => 1L
      case m: ReadPlanner.MultiRead => m.reads.size.toLong
      case _: ReadPlanner.Query => math.max(1L, total / 10) // reference: count/10
      case _: ReadPlanner.Scan => total
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(estimate * 256)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(estimate)
  }
}

/** One scan segment's worth of already-serialized rows. */
case class NearlinePartition(rows: Array[InternalRow]) extends InputPartition

class NearlineReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[NearlinePartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

/** The stubbed nearline "service": parquet file per table, read with a
  * bare ParquetFileReader-free path (we snapshot via a throwaway local
  * Spark read at plan time). Server-side filter semantics: string
  * comparison on the hash key (equality) and on the sort key / scalar
  * attributes (numeric-aware compare, like Dynamo's typed N compare). */
object StubService {
  import NearlineTableProvider._

  def schema(path: String): StructType =
    spark().read.parquet(path).schema

  def count(path: String): Long = spark().read.parquet(path).count()

  def read(path: String, read: ReadPlanner.Read, required: StructType): Array[InternalRow] = {
    val df = spark().read.parquet(path)
    val all = df.collect()
    val schema = df.schema
    val kept = all.filter(r => evalRead(read, r, schema))
    val proj = required.fieldNames.map(schema.fieldIndex)
    kept.map { row =>
      InternalRow.fromSeq(proj.toSeq.map(i => toCatalyst(row.get(i), schema.fields(i).dataType)))
    }
  }

  private def spark() = org.apache.spark.sql.SparkSession.active

  private def evalRead(read: ReadPlanner.Read, r: org.apache.spark.sql.Row, s: StructType): Boolean =
    read match {
      case ReadPlanner.Scan(filter, _) => filter.forall(evalPred(_, r, s))
      case ReadPlanner.Query(hash, sortCond, filter, _) =>
        str(r, s, HashKey) == hash &&
          sortCond.forall(evalPred(_, r, s)) && filter.forall(evalPred(_, r, s))
      case ReadPlanner.Get(hash, sort, _) =>
        str(r, s, HashKey) == hash && str(r, s, SortKey) == sort
      case ReadPlanner.MultiRead(reads) => reads.exists(evalRead(_, r, s))
    }

  private def evalPred(p: ReadPlanner.Pred, r: org.apache.spark.sql.Row, s: StructType): Boolean =
    p match {
      case ReadPlanner.Eq(f, v) => str(r, s, f) == v
      case ReadPlanner.Cmp(f, op, v) =>
        val c = compare(str(r, s, f), v)
        op match {
          case "<" => c < 0; case "<=" => c <= 0
          case ">" => c > 0; case ">=" => c >= 0
          case _ => true
        }
      case ReadPlanner.Between(f, lo, hi) =>
        compare(str(r, s, f), lo) >= 0 && compare(str(r, s, f), hi) <= 0
      case ReadPlanner.And(ps) => ps.forall(evalPred(_, r, s))
      case ReadPlanner.Or(ps)  => ps.exists(evalPred(_, r, s))
      case ReadPlanner.Opaque(_) => true // server can't evaluate; Spark re-checks
    }

  private def str(r: org.apache.spark.sql.Row, s: StructType, f: String): String = {
    val i = s.fieldIndex(f)
    if (r.isNullAt(i)) null else String.valueOf(r.get(i))
  }

  /** Numeric-aware compare, mirroring Dynamo's typed N comparison. */
  private def compare(a: String, b: String): Int = {
    if (a == null) return -1
    (a.toDoubleOption, b.toDoubleOption) match {
      case (Some(x), Some(y)) => java.lang.Double.compare(x, y)
      case _ => a.compareTo(b)
    }
  }

  private def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      new GenericArrayData(seq.map(toCatalyst(_, et)).toArray)
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      ArrayBasedMapData(m.toMap, (k: Any) => toCatalyst(k, kt), (x: Any) => toCatalyst(x, vt))
    case (x, _) => x
  }
}
