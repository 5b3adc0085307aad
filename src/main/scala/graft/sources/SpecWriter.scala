package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.write._

/** DSv2 batch writer for the "spec" format — the sink half of
  * [[SpecDataSource]], so pipelines can round-trip scan data through
  * the reference's native ASCII representation
  * (`df.write.format("spec").mode("append").save(dir)`).
  *
  * Layout: each Spark partition writes one self-contained
  * `part-<partition>-<task>.spec` file (concurrent, no coordination —
  * the reader treats a directory as a multi-file dataset anyway).
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

  final case class SpecCommitMessage(path: String) extends WriterCommitMessage

  class SpecWriteBuilder(paths: Seq[String]) extends WriteBuilder {
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = new SpecBatchWrite(paths)
    }
  }

  class SpecBatchWrite(paths: Seq[String]) extends BatchWrite {
    require(paths.size == 1, s"spec write needs exactly one target dir, got $paths")
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new SpecDataWriterFactory(paths.head)
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.collect { case SpecCommitMessage(p) => new File(p).delete() }
  }

  class SpecDataWriterFactory(dir: String) extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new SpecDataWriter(dir, partitionId, taskId)
  }

  private final case class ScanRow(point: Long, command: String, date: String,
                                   countTime: java.lang.Double, monitor: java.lang.Double,
                                   geometry: Array[Double], hkl: Array[Double],
                                   motorNames: Array[String], motorVals: Array[Double],
                                   labels: Array[String], values: Array[Double],
                                   mca: Array[Double])

  class SpecDataWriter(dir: String, partitionId: Int, taskId: Long)
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
      val target = new File(dir)
      target.mkdirs()
      val f = new File(target, f"part-$partitionId%05d-$taskId.spec")
      val w = new BufferedWriter(new FileWriter(f))
      try {
        w.write(s"#F ${f.getName}\n")
        // #O motor names are FILE-level in the spec format (the reader
        // accumulates every #O line in the file), so they are emitted
        // once, from the first scan that has any. Scans whose motor
        // names don't prefix-match the file set get NO #P line —
        // their motors read back null instead of positionally
        // misaligned against the wrong names.
        val fileMotors = scans.keys.toSeq.sorted.iterator
          .map(scans(_).minBy(_.point).motorNames)
          .find(_.nonEmpty).getOrElse(Array.empty[String])
        if (fileMotors.nonEmpty)
          w.write(s"#O0 ${fileMotors.mkString("  ")}\n")
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
      SpecCommitMessage(f.getPath)
    }

    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}
