package graft.sources

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the ASCII "spec" format produced by
  * Certified Scientific's *spec* instrument-control software — the
  * capability that defines the reference library (pyspec
  * `spec.py` `SpecDataFile`/`SpecScan`: `#S` scan headers, `#D`
  * dates, `#O`/`#P` motor names+positions, `#L` column labels,
  * numeric data blocks, random access to scans by number).
  *
  * Layout: one Spark partition per (file, scan) — a 10k-scan corpus
  * parallelizes across the cluster with zero coordination, and
  * pyspec's "random access by scan number" maps onto partition
  * PRUNING: equality/IN filters on the `scan` column skip whole
  * partitions before any byte of their data block is read.
  *
  * Schema (one row per data point):
  *   file string, scan long, command string, date string,
  *   count_time double, monitor double, geometry array<double>,
  *   hkl array<double>, point long,
  *   motors map<string,double>, data map<string,double>,
  *   mca array<double>
  * (`count_time`/`monitor` come from `#T`/`#M` — pyspec's
  * `scan.count_time`/monitor-normalization inputs; `geometry` is the
  * concatenated `#G` block — pyspec's `scan.G` diffractometer/UB
  * values; `hkl` is the `#Q` reciprocal-space position; `mca` is the
  * point's multichannel-analyzer spectrum from `@A ... \` continuation
  * blocks — pyspec's `scan.MCA`. All null when the scan omits them.)
  */
class SpecDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "spec"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SpecSchema.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    // `paths` is a JSON array (written by DataFrameReader.load(paths*));
    // parse it properly so paths containing commas/quotes survive.
    val paths = opts.get("paths")
      .map(SpecSchema.parseJsonPaths)
      .orElse(opts.get("path").map(Seq(_)))
      .getOrElse(Seq.empty)
    new SpecTable(paths)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object SpecSchema {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("scan", LongType, nullable = false),
    StructField("command", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("count_time", DoubleType, nullable = true),
    StructField("monitor", DoubleType, nullable = true),
    StructField("geometry", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("hkl", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("point", LongType, nullable = false),
    StructField("motors", MapType(StringType, DoubleType), nullable = true),
    StructField("data", MapType(StringType, DoubleType), nullable = true),
    StructField("mca", ArrayType(DoubleType, containsNull = false), nullable = true)))

  /** Parse the DSv2 `paths` option (a JSON string array). Jackson is
    * already on the classpath via Spark. Falls back to treating the
    * raw string as a single path if it isn't valid JSON.
    */
  def parseJsonPaths(json: String): Seq[String] =
    scala.util.Try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(json)
      require(node.isArray)
      (0 until node.size()).map(i => node.get(i).asText())
    }.getOrElse(Seq(json))

  /** `#O`/`#L` fields are separated by TWO or more spaces (single
    * spaces can occur inside a name) — pyspec spec.py convention. */
  def splitLabels(s: String): Array[String] =
    s.trim.split("\\s{2,}").filter(_.nonEmpty)

  /** Expand a path (file, directory, or glob like `dir/run*.spec`)
    * into concrete files, sorted for deterministic partition order. */
  def expand(paths: Seq[String]): Seq[String] = paths.flatMap { p =>
    val f = new java.io.File(p)
    if (f.isDirectory) f.listFiles().filter(_.isFile).map(_.getPath).sorted.toSeq
    else if (p.exists(c => c == '*' || c == '?' || c == '[')) {
      val dir = Option(f.getParentFile).getOrElse(new java.io.File("."))
      val matcher = java.nio.file.FileSystems.getDefault
        .getPathMatcher("glob:" + f.getName)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(c => c.isFile && matcher.matches(c.toPath.getFileName))
        .map(_.getPath).sorted.toSeq
    } else Seq(p)
  }

  /** Driver-side index pass: (scanNo, startLine, endLineExcl) per
    * file plus the file-level motor names from the `#O` block. Only
    * header lines are inspected; data lines are skipped by prefix.
    */
  def indexFile(path: String): (Array[String], Seq[(Long, Int, Int)]) = {
    val lines = scala.io.Source.fromFile(path)
    try {
      val motorNames = mutable.ArrayBuffer[String]()
      val scans = mutable.ArrayBuffer[(Long, Int, Int)]()
      var curScan = -1L
      var curStart = -1
      var i = 0
      for (line <- lines.getLines()) {
        if (line.startsWith("#O")) motorNames ++= splitLabels(line.dropWhile(_ != ' '))
        else if (line.startsWith("#S ")) {
          if (curScan >= 0) scans += ((curScan, curStart, i))
          curScan = line.drop(3).trim.takeWhile(_.isDigit) match {
            case "" => -1L
            case d => d.toLong
          }
          curStart = i
        }
        i += 1
      }
      if (curScan >= 0) scans += ((curScan, curStart, i))
      (motorNames.toArray, scans.toSeq)
    } finally lines.close()
  }
}

final case class SpecInputPartition(path: String, scanNo: Long,
                                    startLine: Int, endLine: Int,
                                    motorNames: Array[String]) extends InputPartition

class SpecTable(paths: Seq[String]) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"spec(${paths.mkString(",")})"
  override def schema(): StructType = SpecSchema.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SpecWriteSupport.SpecWriteBuilder(paths)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // duplicates=last mirrors pyspec SpecDataFile: re-running scan N
    // appends a fresh "#S N" block, and the index keeps only the
    // newest occurrence per file. Default "all" exposes every block.
    new SpecScanBuilder(paths,
      options.getOrDefault("duplicates", "all").toLowerCase == "last")
}

class SpecScanBuilder(paths: Seq[String], keepLast: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters {
  private var scanEq: Option[Set[Long]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val wanted = filters.collect {
      case EqualTo("scan", v: Long) => Set(v)
      case EqualTo("scan", v: Int) => Set(v.toLong)
      case In("scan", vs) => vs.collect { case v: Long => v; case v: Int => v.toLong }.toSet
    }
    if (wanted.nonEmpty) {
      scanEq = Some(wanted.reduce(_ intersect _))
      pushed = filters.filter {
        case EqualTo("scan", _) | In("scan", _) => true
        case _ => false
      }
    }
    filters // all filters stay as residual (pruning is an extra win)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = SpecSchema.schema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      SpecSchema.expand(paths).flatMap { p =>
        val (motors, indexed) = SpecSchema.indexFile(p)
        val scans =
          if (keepLast)
            indexed.groupBy(_._1).values.map(_.maxBy(_._2)).toSeq.sortBy(_._2)
          else indexed
        scans.collect {
          case (no, s, e) if scanEq.forall(_.contains(no)) =>
            SpecInputPartition(p, no, s, e, motors)
        }
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new SpecReaderFactory
  }
}

class SpecReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SpecPartitionReader(partition.asInstanceOf[SpecInputPartition])
}

/** Parses one scan's line range into data-point rows. */
class SpecPartitionReader(p: SpecInputPartition) extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = {
    val src = scala.io.Source.fromFile(p.path)
    val lines = try src.getLines().slice(p.startLine, p.endLine).toArray finally src.close()
    var command: String = null
    var date: String = null
    var countTime: java.lang.Double = null
    var monitor: java.lang.Double = null
    val geom = mutable.ArrayBuffer[Double]()
    val hkl = mutable.ArrayBuffer[Double]()
    val positions = mutable.ArrayBuffer[Double]()
    var positionsValid = true
    var labels: Array[String] = Array.empty
    val dataRows = mutable.ArrayBuffer[Array[Double]]()
    val mcaRows = mutable.ArrayBuffer[Array[Double]]() // parallel to dataRows
    var pendingMca: mutable.ArrayBuffer[Double] = null
    var inMcaContinuation = false
    def mcaVals(s: String): Array[Double] =
      s.stripSuffix("\\").trim.split("\\s+").filter(_.nonEmpty)
        .flatMap(t => scala.util.Try(t.toDouble).toOption)
    def headerNum(line: String): java.lang.Double =
      line.drop(3).trim.split("\\s+").headOption
        .flatMap(t => scala.util.Try(t.toDouble).toOption)
        .map(Double.box).orNull
    for (line <- lines) {
      // "@A v1 v2 ... \" begins a point's MCA spectrum (pyspec
      // scan.MCA); lines continue while they end with a backslash,
      // and the block attaches to the NEXT scalar data row.
      if (inMcaContinuation) {
        pendingMca ++= mcaVals(line)
        inMcaContinuation = line.trim.endsWith("\\")
      }
      else if (line.startsWith("@A")) {
        pendingMca = mutable.ArrayBuffer[Double]()
        pendingMca ++= mcaVals(line.drop(2))
        inMcaContinuation = line.trim.endsWith("\\")
      }
      else if (line.startsWith("#S ")) command = line.drop(3).trim.dropWhile(_.isDigit).trim
      else if (line.startsWith("#D ")) date = line.drop(3).trim
      else if (line.startsWith("#T ")) countTime = headerNum(line)
      else if (line.startsWith("#M ")) monitor = headerNum(line)
      else if (line.startsWith("#G"))
        geom ++= line.dropWhile(_ != ' ').trim.split("\\s+").filter(_.nonEmpty)
          .flatMap(t => scala.util.Try(t.toDouble).toOption)
      else if (line.startsWith("#Q "))
        hkl ++= line.drop(3).trim.split("\\s+").filter(_.nonEmpty)
          .flatMap(t => scala.util.Try(t.toDouble).toOption)
      else if (line.startsWith("#P")) {
        // #P values align positionally with #O names — a malformed
        // token can't just be dropped (it would shift every later
        // motor), so it invalidates the whole motors map instead of
        // failing the partition.
        val toks = line.dropWhile(_ != ' ').trim.split("\\s+").filter(_.nonEmpty)
          .map(t => scala.util.Try(t.toDouble).toOption)
        if (toks.exists(_.isEmpty)) positionsValid = false
        positions ++= toks.map(_.getOrElse(Double.NaN))
      }
      else if (line.startsWith("#L")) labels = SpecSchema.splitLabels(line.drop(2))
      else if (!line.startsWith("#") && line.trim.nonEmpty) {
        // tolerate malformed points (truncated writes mid-scan are
        // common in live spec files) — skip the line, keep the scan
        val vals = line.trim.split("\\s+")
          .flatMap(t => scala.util.Try(t.toDouble).toOption)
        if (vals.nonEmpty) {
          dataRows += vals
          mcaRows += (if (pendingMca == null) null else pendingMca.toArray)
          pendingMca = null
        }
      }
    }
    val motorMap =
      if (positionsValid) mapData(p.motorNames.take(positions.length), positions.toArray)
      else null
    val fileU = UTF8String.fromString(p.path)
    val cmdU = if (command == null) null else UTF8String.fromString(command)
    val dateU = if (date == null) null else UTF8String.fromString(date)
    val geomArr = if (geom.isEmpty) null
      else new GenericArrayData(geom.toArray.map(v => v: Any))
    val hklArr = if (hkl.isEmpty) null
      else new GenericArrayData(hkl.toArray.map(v => v: Any))
    dataRows.iterator.zipWithIndex.map { case (vals, idx) =>
      val dataMap = mapData(labels.take(vals.length), vals)
      val mca = mcaRows(idx)
      val mcaArr = if (mca == null) null
        else new GenericArrayData(mca.map(v => v: Any))
      InternalRow(fileU, p.scanNo, cmdU, dateU, countTime, monitor,
        geomArr, hklArr, idx.toLong, motorMap, dataMap, mcaArr)
    }
  }

  private def mapData(keys: Array[String], values: Array[Double]): ArrayBasedMapData = {
    val n = math.min(keys.length, values.length)
    new ArrayBasedMapData(
      new GenericArrayData(keys.take(n).map(UTF8String.fromString(_)).asInstanceOf[Array[Any]]),
      new GenericArrayData(values.take(n).map(v => v: Any)))
  }

  private var cur: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { cur = rows.next(); true } else false }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}
