package graft.sources.zipnum

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.model.Cdx
import graft.sources.zipnum.ZipNumIndex.Slice

/**
 * `spark.read.format("zipnum").load(clusterDir)` — DataSource V2 over a
 * ZipNum cluster (SURVEY §2 S5/Q1/Q2; §4 "Range-partition pruning via sorted
 * block index").
 *
 * Filter pushdown: urlkey range/equality/prefix predicates prune gzip blocks
 * via `ALL.summary` before any task launches — `.explain` shows the pruned
 * block count in the scan description. All filters are also left in the
 * post-scan plan (returned as residuals), so pruning can only over-read,
 * never drop rows. Column pruning is honored when materializing rows
 * (parsing stays line-wise — the format is row-oriented text).
 */
class ZipNumDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zipnum"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Cdx.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ZipNumTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

private[zipnum] class ZipNumTable(props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  private val dir: String = props.getOrElse("path",
    throw new IllegalArgumentException(
      "zipnum: exactly one cluster directory path is required " +
        "(multi-cluster = union of single-path reads)"))
  override def name(): String = s"zipnum:$dir"
  override def schema(): StructType = Cdx.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZipNumScanBuilder(dir,
      Option(options.get("start")), Option(options.get("end")))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ZipNumWriteBuilder(dir, info)
}

private[zipnum] class ZipNumScanBuilder(dir: String,
                                        optStart: Option[String],
                                        optEnd: Option[String])
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Option[String] = optStart
  private var hi: Option[String] = optEnd
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Cdx.schema

  private def tightenLo(v: String): Unit =
    if (lo.forall(graft.util.KeyOrder.lt(_, v))) lo = Some(v)
  private def tightenHi(v: String): Unit =
    if (hi.forall(graft.util.KeyOrder.lt(v, _))) hi = Some(v)

  /** Tight exclusive upper bound for keys <= v / keys starting with v:
    * rightmost non-maximal CODE POINT incremented (suffix dropped),
    * skipping the surrogate range — monotone under [[graft.util.KeyOrder]]
    * byte order, where incrementing a raw UTF-16 unit is NOT (0xDFFF→
    * 0xE000 would jump DOWN and pruning would silently drop rows).
    * Assumes well-formed UTF-16 input (no lone surrogates). */
  private def successor(v: String): Option[String] = {
    val cps = v.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) == 0x10FFFF) i -= 1
    if (i < 0) None
    else {
      val next0 = cps(i) + 1
      val next = if (next0 >= 0xD800 && next0 <= 0xDFFF) 0xE000 else next0
      val sb = new java.lang.StringBuilder
      (0 until i).foreach(j => sb.appendCodePoint(cps(j)))
      sb.appendCodePoint(next)
      Some(sb.toString)
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = filters.filter {
      case GreaterThanOrEqual("urlkey", v: String) => tightenLo(v); true
      case GreaterThan("urlkey", v: String) => tightenLo(v); true
      case LessThan("urlkey", v: String) => tightenHi(v); true
      case LessThanOrEqual("urlkey", v: String) =>
        successor(v).foreach(tightenHi); true
      case EqualTo("urlkey", v: String) =>
        tightenLo(v); successor(v).foreach(tightenHi); true
      case StringStartsWith("urlkey", v: String) =>
        tightenLo(v); successor(v).foreach(tightenHi); true
      case _ => false
    }
    pushed = usable
    filters // everything stays post-scan: pruning over-reads, never drops
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ZipNumScan(dir, lo, hi, required)
}

private[zipnum] class ZipNumScan(dir: String, lo: Option[String],
                                 hi: Option[String], required: StructType)
    extends Scan with Batch with SupportsReportOrdering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Each partition streams blocks in cluster key order — report it so
    * downstream per-partition sorts on (urlkey, timestamp) are elided
    * (SURVEY §7 "nice": ordered-output reporting). Only reportable when
    * both key columns survive column pruning. */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    val names = required.fieldNames.toSet
    if (names.contains("urlkey") && names.contains("timestamp"))
      Array(
        Expressions.sort(Expressions.column("urlkey"), SortDirection.ASCENDING),
        Expressions.sort(Expressions.column("timestamp"), SortDirection.ASCENDING))
    else Array.empty
  }
  override def description(): String =
    s"zipnum $dir [${lo.getOrElse("-inf")}, ${hi.getOrElse("+inf")}) " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val index = ZipNumIndex.load(dir, conf)
    val pruned = index.prune(lo, hi)
    index.slices(pruned)
      .map(s => ZipNumInputPartition(s, lo, hi): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    new ZipNumReaderFactory(conf, required)
  }
}

private[zipnum] case class ZipNumInputPartition(slice: Slice,
                                                lo: Option[String],
                                                hi: Option[String])
    extends InputPartition

private[zipnum] class ZipNumReaderFactory(conf: SerializableConfiguration,
                                          required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZipNumInputPartition]
    new ZipNumPartitionReader(conf.value, p, required)
  }
}

private[zipnum] class ZipNumPartitionReader(conf: Configuration,
                                            part: ZipNumInputPartition,
                                            required: StructType)
    extends PartitionReader[InternalRow] {

  // base-schema ordinal of each required column
  private val ordinals: Array[Int] =
    required.fieldNames.map(Cdx.schema.fieldIndex)

  private val (rawLines, closer) =
    ZipNumReader.readSliceWithCloser(conf, part.slice, part.lo, part.hi)
  private val it: Iterator[InternalRow] =
    rawLines
      .flatMap(Cdx.splitLine(_))
      .map { cells =>
        val vals = new Array[Any](ordinals.length)
        var i = 0
        while (i < ordinals.length) {
          vals(i) = convert(ordinals(i), cells(ordinals(i)))
          i += 1
        }
        new GenericInternalRow(vals)
      }

  /** Cell → Catalyst value, per base-schema ordinal (4=statuscode INT,
    * 8/9=size/offset LONG, rest STRING; non-numeric → null, matching
    * Cdx.parseLine). */
  private def convert(ord: Int, cell: String): Any = {
    if (cell == null) return null
    ord match {
      case 4 => cell.toIntOption.map(Int.box).orNull
      case 8 | 9 => cell.toLongOption.map(Long.box).orNull
      case _ => UTF8String.fromString(cell)
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (it.hasNext) { current = it.next(); true } else false
  override def get(): InternalRow = current
  // early termination (limit, task kill) must release the shard handle —
  // auto-close only fires on exhaustion
  override def close(): Unit = closer()
}
