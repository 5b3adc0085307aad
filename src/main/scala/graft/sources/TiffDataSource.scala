package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util
import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for TIFF detector images — the third
  * detector-container source next to SPE and EDF, covering the most
  * common beamline interchange format (Pilatus exports 32-bit signed
  * TIFF, marCCD 16-bit unsigned; pyspec's `ccd` scope reads such
  * stacks frame by frame).
  *
  * Format scope is the baseline grayscale profile of the public TIFF
  * 6.0 specification, which is what detector software writes:
  * uncompressed (Compression=1), single-sample (SamplesPerPixel=1),
  * strip-organized images of 8/16/32-bit unsigned/signed integers or
  * 32/64-bit IEEE floats, both byte orders ("II" little / "MM" big),
  * multi-page (a chained-IFD stack = a frame series) or one frame per
  * file (a directory read composes the series).
  *
  * Cluster model mirrors SPE/EDF: planning walks ONLY the 8-byte
  * header and the IFD chain — bounded positional reads of tag
  * tables, never pixel data; a frame descriptor carries its strip
  * offsets/byte counts so readers seek straight to their own strips.
  * Partitions cover contiguous frame runs capped at
  * `maxPartitionBytes`; `frame` equality/range/IN filters prune
  * partitions before any data byte is read, and a `pixels`-pruned
  * projection never opens the data section at all.
  *
  * Schema (one row per frame/page):
  *   file string, frame long, width int, height int, n_frames long,
  *   datatype string (uint8/uint16/int16/uint32/int32/float32/float64),
  *   byte_order string ("II"|"MM"), pixels array<double> (row-major).
  */
class TiffDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tiff"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = TiffSchema.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val paths = Option(properties.get("paths"))
      .map(p => SpecSchema.parseJsonPaths(p))
      .orElse(Option(properties.get("path")).map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException("tiff reader needs a path"))
    new TiffTable(paths, Option(properties.get("maxPartitionBytes"))
      .map(_.toLong).getOrElse(SpeSchema.DefaultMaxPartitionBytes))
  }
}

object TiffSchema {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("frame", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", LongType),
    StructField("datatype", StringType),
    StructField("byte_order", StringType),
    StructField("pixels", ArrayType(DoubleType))))

  /** One page's decode plan: everything a reader needs to fetch and
    * interpret its strips without reopening the IFD chain. */
  final case class TiffFrame(width: Int, height: Int, bits: Int,
                             sampleFormat: Int, littleEndian: Boolean,
                             stripOffsets: Seq[Long], stripByteCounts: Seq[Long]) {
    def dataBytes: Long = stripByteCounts.sum
    def datatypeName: String = (sampleFormat, bits) match {
      case (3, 32) => "float32"
      case (3, 64) => "float64"
      case (2, b) => s"int$b"
      case (_, b) => s"uint$b"
    }
  }

  // TIFF 6.0 tag ids (public specification)
  private val TagWidth = 256
  private val TagHeight = 257
  private val TagBits = 258
  private val TagCompression = 259
  private val TagStripOffsets = 273
  private val TagSamplesPerPixel = 277
  private val TagStripByteCounts = 279
  private val TagSampleFormat = 339

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
    case 3 | 8 => 2 // SHORT/SSHORT
    case 4 | 9 | 11 => 4 // LONG/SLONG/FLOAT
    case 5 | 10 | 12 => 8 // RATIONAL/SRATIONAL/DOUBLE
    case t => throw new IllegalArgumentException(s"unsupported TIFF field type $t")
  }

  /** [[walk]] tolerating a LIVE file: a truncated or inconsistent
    * IFD/strip (a page mid-write) STOPS the walk and returns the
    * complete pages so far, instead of throwing. A TIFF appender
    * patches the previous last IFD's next-pointer when it adds a
    * page, so — unlike the EDF block tail — there is no resume
    * position to cache: the tail re-walks the chain (headers only)
    * whenever the file length changes.
    */
  def walkLenient(path: String, conf: Configuration): Seq[TiffFrame] =
    try walk(path, conf, lenient = true)
    catch { case _: Throwable => Seq.empty }

  /** Walk the header + IFD chain with bounded positional reads; pixel
    * data is never touched. Returns one descriptor per page, in chain
    * order (= frame order). With `lenient`, a malformed/truncated
    * page stops the walk (returning complete pages) instead of
    * throwing — the live-tail contract of [[walkLenient]].
    */
  def walk(path: String, conf: Configuration, lenient: Boolean = false): Seq[TiffFrame] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len >= 8, s"$path: not a TIFF (len $len < 8)")
    val in = fs.open(p)
    try {
      val head = new Array[Byte](8)
      in.readFully(0L, head)
      val little = (head(0), head(1)) match {
        case ('I', 'I') => true
        case ('M', 'M') => false
        case _ => throw new IllegalArgumentException(s"$path: not a TIFF (bad byte-order mark)")
      }
      val order = if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val hb = ByteBuffer.wrap(head).order(order)
      require((hb.getShort(2) & 0xFFFF) == 42, s"$path: not a TIFF (magic != 42)")
      var ifdOff = hb.getInt(4).toLong & 0xFFFFFFFFL

      /** A tag's values as longs, inline or out-of-line. */
      def values(tpe: Int, count: Long, field: Array[Byte]): Seq[Long] = {
        val sz = typeSize(tpe)
        val total = sz * count
        require(count <= (len / math.max(1, sz)) && count <= 1048576,
          s"$path: implausible TIFF tag count $count")
        val raw =
          if (total <= 4) field
          else {
            val off = ByteBuffer.wrap(field).order(order).getInt(0).toLong & 0xFFFFFFFFL
            val b = new Array[Byte](total.toInt)
            in.readFully(off, b)
            b
          }
        val bb = ByteBuffer.wrap(raw).order(order)
        (0 until count.toInt).map { i =>
          sz match {
            case 1 => (raw(i) & 0xFF).toLong
            case 2 => (bb.getShort(i * 2) & 0xFFFF).toLong
            case 4 => bb.getInt(i * 4).toLong & 0xFFFFFFFFL
            case 8 => bb.getLong(i * 8)
          }
        }
      }

      val frames = mutable.ArrayBuffer[TiffFrame]()
      val seen = mutable.Set[Long]()
      var halt = false
      while (ifdOff != 0L && !halt) try {
        require(seen.add(ifdOff), s"$path: cyclic IFD chain at $ifdOff")
        require(ifdOff + 2 <= len, s"$path: IFD offset $ifdOff beyond EOF")
        val cntB = new Array[Byte](2)
        in.readFully(ifdOff, cntB)
        val n = ByteBuffer.wrap(cntB).order(order).getShort(0) & 0xFFFF
        val body = new Array[Byte](n * 12 + 4)
        in.readFully(ifdOff + 2, body)
        val bodyBuf = ByteBuffer.wrap(body).order(order)
        val tags = mutable.Map[Int, (Int, Long, Array[Byte])]()
        (0 until n).foreach { i =>
          val tag = bodyBuf.getShort(i * 12) & 0xFFFF
          val tpe = bodyBuf.getShort(i * 12 + 2) & 0xFFFF
          val cnt = bodyBuf.getInt(i * 12 + 4).toLong & 0xFFFFFFFFL
          tags(tag) = (tpe, cnt, body.slice(i * 12 + 8, i * 12 + 12))
        }
        def tagVals(tag: Int): Option[Seq[Long]] =
          tags.get(tag).map { case (tpe, cnt, f) => values(tpe, cnt, f) }
        def one(tag: Int, default: => Long): Long =
          tagVals(tag).map(_.head).getOrElse(default)

        val w = one(TagWidth, throw err(path, "missing ImageWidth")).toInt
        val h = one(TagHeight, throw err(path, "missing ImageLength")).toInt
        val bits = one(TagBits, 1L).toInt
        val comp = one(TagCompression, 1L)
        val spp = one(TagSamplesPerPixel, 1L)
        val fmt = one(TagSampleFormat, 1L).toInt
        require(comp == 1, s"$path: compressed TIFF (Compression=$comp) unsupported")
        require(spp == 1, s"$path: SamplesPerPixel=$spp unsupported (grayscale only)")
        require(Set(8, 16, 32, 64).contains(bits), s"$path: BitsPerSample=$bits unsupported")
        require(fmt >= 1 && fmt <= 3, s"$path: SampleFormat=$fmt unsupported")
        require(fmt != 3 || bits >= 32, s"$path: float TIFF must be 32/64-bit")
        val offs = tagVals(TagStripOffsets).getOrElse(throw err(path, "missing StripOffsets"))
        val cnts = tagVals(TagStripByteCounts)
          .getOrElse(throw err(path, "missing StripByteCounts"))
        require(offs.size == cnts.size, s"$path: StripOffsets/StripByteCounts mismatch")
        val expect = w.toLong * h * (bits / 8)
        require(cnts.sum == expect,
          s"$path: strip bytes ${cnts.sum} != ${w}x$h x${bits / 8}")
        require(expect <= Int.MaxValue,
          s"$path: TIFF page is $expect bytes (> 2 GiB unsupported)")
        offs.zip(cnts).foreach { case (o, c) =>
          require(o + c <= len, s"$path: strip [$o, ${o + c}) beyond EOF $len")
        }
        frames += TiffFrame(w, h, bits, fmt, little, offs, cnts)
        ifdOff = bodyBuf.getInt(n * 12).toLong & 0xFFFFFFFFL
      } catch {
        // live tail: a page mid-write (or trailing garbage) ends the
        // walk at the last complete page
        case e: Throwable => if (lenient) halt = true else throw e
      }
      frames.toSeq
    } finally in.close()
  }

  private def err(path: String, msg: String) =
    new IllegalArgumentException(s"$path: $msg")
}

final case class TiffInputPartition(path: String, frameStart: Long, nFrames: Long,
                                    frames: Seq[TiffSchema.TiffFrame]) extends InputPartition

class TiffTable(paths: Seq[String], maxPartBytes: Long) extends Table with SupportsRead {
  override def name(): String = s"tiff(${paths.mkString(",")})"
  override def schema(): StructType = TiffSchema.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TiffScanBuilder(paths, maxPartBytes)
}

class TiffScanBuilder(paths: Seq[String], maxPartBytes: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TiffSchema.schema
  private var frameEq: Option[Set[Long]] = None
  private var frameLo: Long = Long.MinValue
  private var frameHi: Long = Long.MaxValue
  // pushed aggregate tags: "count" | "min_frame" | "max_frame"
  private var aggTags: Option[Seq[String]] = None

  /** COUNT(*) / MIN(frame) / MAX(frame) with no grouping are answered
    * from the PLANNING index alone — the header walk that happens
    * anyway — so a whole-dataset frame census never opens a data
    * section and emits ONE row instead of one per frame. Partial
    * semantics: Spark still merges (sum/min/max), so multi-scan
    * unions stay correct.
    */
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
  private def tagOf(e: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc)
      : Option[String] = e match {
    case _: CountStar => Some("count")
    case m: Min if m.column.describe() == "frame" => Some("min_frame")
    case m: Max if m.column.describe() == "frame" => Some("max_frame")
    case _ => None
  }
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions.nonEmpty) return false
    val tags = agg.aggregateExpressions.toSeq.map(tagOf)
    if (tags.exists(_.isEmpty)) return false
    aggTags = Some(tags.map(_.get))
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // integral literals only; anything else stays residual (the EDF
    // planning-robustness contract)
    def asLOpt(v: Any): Option[Long] = v match {
      case l: Long => Some(l); case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong); case b: Byte => Some(b.toLong)
      case _ => None
    }
    def asL(v: Any): Long = asLOpt(v).get
    val (accepted, rest) = filters.partition {
      case EqualTo("frame", v) => asLOpt(v).isDefined
      case In("frame", vs) => vs != null && vs.forall(asLOpt(_).isDefined)
      case GreaterThan("frame", v) => asLOpt(v).isDefined
      case GreaterThanOrEqual("frame", v) => asLOpt(v).isDefined
      case LessThan("frame", v) => asLOpt(v).isDefined
      case LessThanOrEqual("frame", v) => asLOpt(v).isDefined
      // frame is non-null by construction: accepting the inferred
      // IsNotNull keeps it out of the residual (a residual blocks
      // aggregate pushdown and costs a per-row filter for nothing)
      case IsNotNull("frame") => true
      case _ => false
    }
    def narrow(s: Set[Long]): Unit =
      frameEq = Some(frameEq.map(_.intersect(s)).getOrElse(s))
    accepted.foreach {
      case EqualTo("frame", v) => narrow(Set(asL(v)))
      case In("frame", vs) => narrow(vs.map(asL).toSet)
      case GreaterThan("frame", v) => frameLo = math.max(frameLo, asL(v) + 1)
      case GreaterThanOrEqual("frame", v) => frameLo = math.max(frameLo, asL(v))
      case LessThan("frame", v) => frameHi = math.min(frameHi, asL(v) - 1)
      case LessThanOrEqual("frame", v) => frameHi = math.min(frameHi, asL(v))
      case _ => ()
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Header walk + frame-filter, shared by the row scan and the
    * aggregate fast path: (path, total frames, wanted (frame, idx)). */
  private def plannedFrames(): Seq[(String, Long, Seq[(TiffSchema.TiffFrame, Int)])] = {
    val session = SparkSession.active
    val conf = session.sessionState.newHadoopConf()
    val files = SpecSchema.expand(paths, conf)
      .filterNot(_.path.endsWith(SpecIndex.SidecarSuffix))
    // same driver-vs-job split as the SPE/EDF header passes
    val walks: Map[String, Seq[TiffSchema.TiffFrame]] =
      if (files.size <= SpeSchema.ParallelHeaderThreshold)
        files.map(m => m.path -> TiffSchema.walk(m.path, conf)).toMap
      else {
        val sconf = new SerializableHadoopConf(conf)
        session.sparkContext
          .parallelize(files.map(_.path), files.size)
          .map(p => p -> TiffSchema.walk(p, sconf.value))
          .collect().toMap
      }
    files.map { meta =>
      val all = walks(meta.path)
      val wanted = all.zipWithIndex.filter { case (_, f) =>
        f >= frameLo && f <= frameHi && frameEq.forall(_.contains(f.toLong))
      }
      (meta.path, all.size.toLong, wanted)
    }
  }

  override def build(): Scan = aggTags match {
    case Some(tags) => new TiffAggScan(tags, () => plannedFrames())
    case None => new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      plannedFrames().flatMap { case (path, n, wanted) =>
        // contiguous runs capped by data bytes per partition
        val parts = mutable.ArrayBuffer[TiffInputPartition]()
        var runStart = -1L
        var prevIdx = -2
        val run = mutable.ArrayBuffer[TiffSchema.TiffFrame]()
        var runBytes = 0L
        def flush(): Unit = if (run.nonEmpty) {
          parts += TiffInputPartition(path, runStart, n, run.toSeq)
          run.clear(); runBytes = 0L; runStart = -1L
        }
        wanted.foreach { case (fr, idx) =>
          val contiguous = idx == prevIdx + 1
          if ((!contiguous && run.nonEmpty) || runBytes + fr.dataBytes > maxPartBytes) flush()
          if (run.isEmpty) runStart = idx.toLong
          run += fr; runBytes += fr.dataBytes; prevIdx = idx
        }
        flush()
        parts
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new TiffReaderFactory(new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()), required.fieldNames)

    override def toMicroBatchStream(checkpointLocation: String):
        org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new TiffMicroBatchStream(paths,
        new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()),
        required.fieldNames, maxPartBytes)
    }
  }
}

/** Structured-Streaming source over LIVE TIFF stacks — watch an
  * acquisition appending pages. A TIFF appender writes the new page's
  * strips + IFD, then PATCHES the previous last IFD's next-pointer,
  * so (unlike the EDF block tail) there is no append-only resume
  * position: whenever a file's length changes the tail re-walks its
  * IFD chain leniently — headers only, a page mid-write (dangling
  * next-pointer, truncated IFD, strip beyond EOF) ends the walk at
  * the last complete page and is retried next trigger. The per-file
  * offset is that complete-page count; an unchanged file length skips
  * the walk entirely, so an idle stream costs one listStatus per
  * trigger. `n_frames` in streamed rows = the batch's END offset
  * (pages discovered so far — the EDF tail's replay-deterministic
  * contract); only a batch re-read of the finished file reports the
  * final total. New files under the path are picked up automatically;
  * partitions and readers are the batch ones.
  */
class TiffMicroBatchStream(paths: Seq[String], conf: SerializableHadoopConf,
                           columns: Array[String], maxPartBytes: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // path -> (complete-page descriptors at last walk, file length then)
  private val cache = mutable.Map[String, (Vector[TiffSchema.TiffFrame], Long)]()

  private def refresh(path: String, len: Long): Vector[TiffSchema.TiffFrame] = {
    cache.get(path) match {
      case Some((have, lastLen)) if lastLen == len => have
      case _ =>
        val all = TiffSchema.walkLenient(path, conf.value).toVector
        cache(path) = (all, len)
        all
    }
  }

  override def initialOffset(): Offset = SpecStreamOffset(Map.empty)
  override def deserializeOffset(json: String): Offset = SpecStreamOffset.fromJson(json)

  override def latestOffset(): Offset = {
    val files = SpecSchema.expand(paths, conf.value)
      .filterNot(_.path.endsWith(SpecIndex.SidecarSuffix))
    SpecStreamOffset(files.map(m => m.path -> refresh(m.path, m.len).size.toLong).toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SpecStreamOffset].files
    val e = end.asInstanceOf[SpecStreamOffset].files
    e.toSeq.sortBy(_._1).flatMap { case (path, to) =>
      val from = s.getOrElse(path, 0L)
      if (to <= from) Seq.empty
      else {
        // normally latestOffset just refreshed; after a checkpoint
        // restart the cache is cold and the walk reruns here
        val cached = cache.get(path).map(_._1).getOrElse(Vector.empty)
        val all =
          if (cached.size >= to) cached
          else {
            val p = new Path(path)
            refresh(path, p.getFileSystem(conf.value).getFileStatus(p).getLen)
          }
        val wanted = all.slice(from.toInt, to.toInt)
        val parts = mutable.ArrayBuffer[TiffInputPartition]()
        var runStart = from
        val run = mutable.ArrayBuffer[TiffSchema.TiffFrame]()
        var runBytes = 0L
        def flush(nextStart: Long): Unit = if (run.nonEmpty) {
          parts += TiffInputPartition(path, runStart, to, run.toSeq)
          run.clear(); runBytes = 0L; runStart = nextStart
        }
        wanted.zipWithIndex.foreach { case (fr, i) =>
          if (runBytes + fr.dataBytes > maxPartBytes) flush(from + i)
          run += fr; runBytes += fr.dataBytes
        }
        flush(-1L)
        parts
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TiffReaderFactory(conf, columns)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Aggregate-pushdown fast path: one row of planning-index partial
  * aggregates, zero data-section IO. Values pre-reduced at planning;
  * Spark's final merge (sum/min/max over one row) is a no-op
  * arithmetic-wise but keeps union/multi-scan plans correct.
  */
final case class TiffAggPartition(values: Array[Any]) extends InputPartition

class TiffAggScan(tags: Seq[String],
                  planned: () => Seq[(String, Long, Seq[(TiffSchema.TiffFrame, Int)])])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(tags.map(t => StructField(s"agg_$t", LongType, nullable = t != "count")))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val frames = planned().flatMap(_._3.map(_._2.toLong))
    val values: Array[Any] = tags.map {
      case "count" => frames.size.toLong
      case "min_frame" => if (frames.isEmpty) null else frames.min
      case "max_frame" => if (frames.isEmpty) null else frames.max
    }.toArray
    Array(TiffAggPartition(values))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          private val row = InternalRow.fromSeq(
            p.asInstanceOf[TiffAggPartition].values.toSeq)
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
    }
}

class TiffReaderFactory(conf: SerializableHadoopConf,
                        columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TiffPartitionReader(partition.asInstanceOf[TiffInputPartition], conf.value, columns)
}

/** Reads one partition's pages: seek to each strip, bounded reads,
  * strips concatenated in order. With `pixels` pruned the file is
  * never opened — rows come from the planned descriptors alone.
  */
class TiffPartitionReader(part: TiffInputPartition, conf: Configuration,
                          columns: Array[String]) extends PartitionReader[InternalRow] {
  private val needPixels = columns.contains("pixels")
  private val fileUtf8 = UTF8String.fromString(part.path)
  private var i = -1
  private val in = if (needPixels) {
    val p = new Path(part.path)
    p.getFileSystem(conf).open(p)
  } else null
  private var pixels: GenericArrayData = null

  override def next(): Boolean = {
    i += 1
    val more = i < part.frames.size
    if (more && needPixels) pixels = decode(part.frames(i))
    more
  }

  private def decode(fr: TiffSchema.TiffFrame): GenericArrayData = {
    val buf = new Array[Byte](fr.dataBytes.toInt)
    var at = 0
    fr.stripOffsets.zip(fr.stripByteCounts).foreach { case (off, cnt) =>
      in.readFully(off, buf, at, cnt.toInt)
      at += cnt.toInt
    }
    val bb = ByteBuffer.wrap(buf)
      .order(if (fr.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val n = fr.width * fr.height
    val out = new Array[Double](n)
    (fr.sampleFormat, fr.bits) match {
      case (3, 32) => val tb = bb.asFloatBuffer; var j = 0; while (j < n) { out(j) = tb.get(j).toDouble; j += 1 }
      case (3, 64) => val tb = bb.asDoubleBuffer; var j = 0; while (j < n) { out(j) = tb.get(j); j += 1 }
      case (2, 8) => var j = 0; while (j < n) { out(j) = buf(j).toDouble; j += 1 }
      case (2, 16) => val tb = bb.asShortBuffer; var j = 0; while (j < n) { out(j) = tb.get(j).toDouble; j += 1 }
      case (2, 32) => val tb = bb.asIntBuffer; var j = 0; while (j < n) { out(j) = tb.get(j).toDouble; j += 1 }
      case (_, 8) => var j = 0; while (j < n) { out(j) = (buf(j) & 0xFF).toDouble; j += 1 }
      case (_, 16) => val tb = bb.asShortBuffer; var j = 0; while (j < n) { out(j) = (tb.get(j) & 0xFFFF).toDouble; j += 1 }
      case (_, 32) => val tb = bb.asIntBuffer; var j = 0; while (j < n) { out(j) = (tb.get(j).toLong & 0xFFFFFFFFL).toDouble; j += 1 }
      case (f, b) => throw new IllegalArgumentException(
        s"${part.path}: unsupported TIFF sample (format $f, $b bits)")
    }
    new GenericArrayData(out)
  }

  override def get(): InternalRow = {
    val fr = part.frames(i)
    val vals: Array[Any] = columns.map {
      case "file" => fileUtf8
      case "frame" => part.frameStart + i
      case "width" => fr.width
      case "height" => fr.height
      case "n_frames" => part.nFrames
      case "datatype" => UTF8String.fromString(fr.datatypeName)
      case "byte_order" => UTF8String.fromString(if (fr.littleEndian) "II" else "MM")
      case "pixels" => pixels
    }
    InternalRow.fromSeq(vals.toSeq)
  }

  override def close(): Unit = if (in != null) in.close()
}
