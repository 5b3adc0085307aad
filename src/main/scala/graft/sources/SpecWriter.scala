package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.distributions
import org.apache.spark.sql.connector.write._

/** DSv2 batch writer for the "spec" format — the sink half of
  * [[SpecDataSource]], so pipelines can round-trip scan data through
  * the reference's native ASCII representation
  * (`df.write.format("spec").mode("append").save(dir)`).
  *
  * All IO goes through Hadoop `FileSystem` (file:/hdfs:/s3a:).
  * Two layouts:
  *
  *  - **Default**: each Spark partition writes one self-contained
  *    `part-<partition>-<task>.spec` file (concurrent, no
  *    coordination — the reader treats a directory as a multi-file
  *    dataset anyway).
  *  - **`.option("singleFile", "<name>.spec")`** (or `"true"` for
  *    `merged.spec`): one LOGICAL spec file. Serialization — the
  *    CPU-heavy part — still runs partition-parallel: each task
  *    writes its scan blocks to a hidden `.specpart` temp, and the
  *    driver's commit streams the temps into the target in partition
  *    order behind a single `#F`/`#O0` header (a linear byte copy,
  *    the unavoidable cost of "one file"). Parts whose motor-name
  *    set doesn't prefix-align with the chosen file-level `#O` set
  *    get their `#P` lines dropped during the merge — motors read
  *    back null rather than positionally misaligned.
  *
  * Rows are buffered per scan and emitted as `#S` blocks sorted by
  * (scan, point); headers (`#D`/`#T`/`#M`/`#G0`/`#Q`/`#O0`+`#P0`/
  * `#L`) are reconstructed from the first row of each scan, and MCA
  * arrays are written back as `@A` lines before their data point.
  *
  * Input must use the reader's schema ([[SpecSchema.schema]]); the
  * column-label order of `#L` follows the `data` map's key order
  * (which the reader preserves from the original file).
  */
object SpecWriteSupport {

  final case class SpecCommitMessage(path: String, partitionId: Int,
                                     motorNames: Array[String]) extends WriterCommitMessage

  class SpecWriteBuilder(paths: Seq[String], info: LogicalWriteInfo) extends WriteBuilder {
    override def build(): Write = {
      val single = Option(info.options.get("singleFile")).map {
        case "true" => "merged.spec"
        case name => name
      }
      def batch = new SpecBatchWrite(paths, single,
        new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))
      single match {
        case None => new Write { override def toBatch: BatchWrite = batch }
        case Some(_) => new Write with RequiresDistributionAndOrdering {
          // One logical file must serialize each scan as ONE #S block,
          // so the write declares "cluster by scan" and Spark inserts
          // the shuffle — scans stay partition-parallel, but a scan's
          // rows never straddle two parts.
          override def requiredDistribution(): distributions.Distribution =
            distributions.Distributions.clustered(
              Array(org.apache.spark.sql.connector.expressions.Expressions.identity("scan")))
          override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            Array.empty // the writer buffers and sorts rows per scan itself
          override def toBatch: BatchWrite = batch
        }
      }
    }
  }

  class SpecBatchWrite(paths: Seq[String], singleFile: Option[String],
                       conf: SerializableHadoopConf) extends BatchWrite {
    require(paths.size == 1, s"spec write needs exactly one target dir, got $paths")
    private val dir = paths.head

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new SpecDataWriterFactory(dir, singleFile.isDefined, conf)

    override def commit(messages: Array[WriterCommitMessage]): Unit = singleFile.foreach { name =>
      // Merge the partition-parallel temps into ONE logical spec file.
      val fs = new Path(dir).getFileSystem(conf.value)
      val parts = messages.collect { case m: SpecCommitMessage if m.path.nonEmpty => m }
        .sortBy(_.partitionId)
      // File-level #O = the LONGEST motor list among the parts: any
      // part whose list is a prefix of it keeps its #P lines below.
      // Picking the first nonempty list instead would truncate a later
      // superset list and silently drop its positions even though they
      // align. (Parts that genuinely conflict still lose their #P.)
      val fileMotors = parts.map(_.motorNames)
        .foldLeft(Array.empty[String])((best, m) => if (m.length > best.length) m else best)
      val target = new Path(dir, name)
      val out = new BufferedWriter(new OutputStreamWriter(fs.create(target, true),
        StandardCharsets.UTF_8))
      try {
        out.write(s"#F $name\n")
        if (fileMotors.nonEmpty) out.write(s"#O0 ${fileMotors.mkString("  ")}\n")
        parts.foreach { part =>
          val p = new Path(part.path)
          // A part whose motor set prefix-aligns with the file-level
          // #O keeps its #P lines; otherwise they are dropped so
          // values never land under the wrong names. Either way the
          // copy STREAMS — driver memory stays O(buffer), not O(part).
          val keepPositions = part.motorNames.isEmpty ||
            part.motorNames.sameElements(fileMotors.take(part.motorNames.length))
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
          try {
            var line = in.readLine()
            while (line != null) {
              if (keepPositions || !line.startsWith("#P")) {
                out.write(line); out.write("\n")
              }
              line = in.readLine()
            }
          } finally in.close()
        }
      } finally out.close()
      parts.foreach(part => fs.delete(new Path(part.path), false))
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir).getFileSystem(conf.value)
      messages.collect { case SpecCommitMessage(p, _, _) if p.nonEmpty =>
        fs.delete(new Path(p), false) }
    }
  }

  class SpecDataWriterFactory(dir: String, asPart: Boolean,
                              conf: SerializableHadoopConf) extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new SpecDataWriter(dir, partitionId, taskId, asPart, conf)
  }

  private final case class ScanRow(point: Long, command: String, date: String,
                                   countTime: java.lang.Double, monitor: java.lang.Double,
                                   geometry: Array[Double], hkl: Array[Double],
                                   motorNames: Array[String], motorVals: Array[Double],
                                   labels: Array[String], values: Array[Double],
                                   mca: Array[Double])

  /** `asPart = false`: emit a self-contained `part-*.spec` file.
    * `asPart = true`: emit a headerless `.specpart` temp (scan blocks
    * only) for the driver-side single-file merge.
    */
  class SpecDataWriter(dir: String, partitionId: Int, taskId: Long, asPart: Boolean,
                       conf: SerializableHadoopConf)
      extends DataWriter[InternalRow] {
    private val scans = mutable.LinkedHashMap[Long, mutable.ArrayBuffer[ScanRow]]()

    private def strOrNull(row: InternalRow, i: Int): String =
      if (row.isNullAt(i)) null else row.getUTF8String(i).toString
    private def dblOrNull(row: InternalRow, i: Int): java.lang.Double =
      if (row.isNullAt(i)) null else Double.box(row.getDouble(i))
    private def arrOrNull(row: InternalRow, i: Int): Array[Double] =
      if (row.isNullAt(i)) null else row.getArray(i).toDoubleArray()
    private def mapParts(row: InternalRow, i: Int): (Array[String], Array[Double]) =
      if (row.isNullAt(i)) (Array.empty, Array.empty)
      else {
        val m: MapData = row.getMap(i)
        val ks: ArrayData = m.keyArray()
        (Array.tabulate(m.numElements())(j => ks.getUTF8String(j).toString),
          m.valueArray().toDoubleArray())
      }

    override def write(row: InternalRow): Unit = {
      val scan = row.getLong(1)
      val (mNames, mVals) = mapParts(row, 9)
      val (labels, values) = mapParts(row, 10)
      scans.getOrElseUpdate(scan, mutable.ArrayBuffer[ScanRow]()) += ScanRow(
        row.getLong(8), strOrNull(row, 2), strOrNull(row, 3),
        dblOrNull(row, 4), dblOrNull(row, 5),
        arrOrNull(row, 6), arrOrNull(row, 7),
        mNames, mVals, labels, values, arrOrNull(row, 11))
    }

    private def fmt(v: Double): String =
      if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString else v.toString

    override def commit(): WriterCommitMessage = {
      // empty partitions (e.g. from the scan-clustered shuffle in
      // singleFile mode) produce no file at all
      if (scans.isEmpty) return SpecCommitMessage("", partitionId, Array.empty)
      val fs = new Path(dir).getFileSystem(conf.value)
      fs.mkdirs(new Path(dir))
      val fname =
        if (asPart) f".part-$partitionId%05d-$taskId.specpart"
        else f"part-$partitionId%05d-$taskId.spec"
      val target = new Path(dir, fname)
      val w = new BufferedWriter(new OutputStreamWriter(fs.create(target, true),
        StandardCharsets.UTF_8))
      // #O motor names are FILE-level in the spec format (the reader
      // accumulates every #O line in the file), so they are emitted
      // once, from the LONGEST motor list of any scan here — every
      // scan whose list is a prefix of it still aligns. Scans whose
      // motor names don't prefix-match the file set get NO #P line —
      // their motors read back null instead of positionally
      // misaligned against the wrong names.
      val fileMotors = scans.valuesIterator
        .map(_.minBy(_.point).motorNames)
        .foldLeft(Array.empty[String])((best, m) => if (m.length > best.length) m else best)
      try {
        if (!asPart) {
          w.write(s"#F $fname\n")
          if (fileMotors.nonEmpty)
            w.write(s"#O0 ${fileMotors.mkString("  ")}\n")
        }
        for (scanNo <- scans.keys.toSeq.sorted) {
          val rows = scans(scanNo).sortBy(_.point)
          val h = rows.head
          w.write("\n")
          w.write(s"#S $scanNo ${Option(h.command).getOrElse("")}\n".replaceAll(" +\n", "\n"))
          if (h.date != null) w.write(s"#D ${h.date}\n")
          if (h.countTime != null) w.write(s"#T ${fmt(h.countTime)} (Seconds)\n")
          if (h.monitor != null) w.write(s"#M ${fmt(h.monitor)} (Monitor)\n")
          if (h.geometry != null) w.write(s"#G0 ${h.geometry.map(fmt).mkString(" ")}\n")
          if (h.hkl != null) w.write(s"#Q ${h.hkl.map(fmt).mkString(" ")}\n")
          if (h.motorNames.nonEmpty &&
              h.motorNames.sameElements(fileMotors.take(h.motorNames.length)))
            w.write(s"#P0 ${h.motorVals.map(fmt).mkString(" ")}\n")
          if (h.labels.nonEmpty) w.write(s"#L ${h.labels.mkString("  ")}\n")
          for (r <- rows) {
            if (r.mca != null) w.write(s"@A ${r.mca.map(fmt).mkString(" ")}\n")
            w.write(r.values.map(fmt).mkString(" ") + "\n")
          }
        }
      } finally w.close()
      SpecCommitMessage(target.toString, partitionId, fileMotors)
    }

    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}
