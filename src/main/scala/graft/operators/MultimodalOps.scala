package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline (SURVEY.md §2 #32) — the Spark
  * shape of pyspec's CCD image-file handling: opaque binary payloads
  * with typed metadata, batch-wise feature extraction on executors.
  *
  * The decode step uses the JDK's own `javax.imageio` (PNG/BMP/GIF/
  * JPEG — zero external dependencies), so real image payloads yield
  * real width/height/mean-luma. Payloads that aren't decodable images
  * (e.g. text bytes) fall back to a deterministic synthetic feature
  * with `decoded = false`, keeping mixed-corpus pipelines total.
  * Swapping in a heavier codec (video frames, audio) changes one
  * function body; the batching/partitioning plumbing stays.
  */
object MultimodalOps {

  /** Attach a binary payload + declarative metadata (byte length and
    * content digest) — all codegen'd expressions, SQL-checkable.
    */
  def withPayloadMeta(df: DataFrame, id: Column, content: Column): DataFrame = {
    val payload = content.cast("binary")
    df.select(id.as("doc_id"), payload.as("payload"),
      length(payload).cast("long").as("n_bytes"),
      md5(payload).as("payload_md5"))
  }

  final case class Feature(doc_id: Long, width: Int, height: Int,
                           mean_luma: Double, decoded: Boolean, batch_size: Int)

  /** Magic-byte sniff (PNG/BMP/GIF/JPEG): non-image payloads skip
    * `ImageIO`'s per-call reader discovery entirely — on a mostly-text
    * corpus the decode stage costs a 4-byte compare per row. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte))

  final case class ResizedImage(doc_id: Long, png: Array[Byte],
                                width: Int, height: Int, decoded: Boolean)

  /** Batched image resize: decode → nearest-neighbour resample →
    * re-encode PNG, all with the JDK (`javax.imageio`). The NN loop
    * is explicit (not `Graphics2D` scaling) so output bytes are
    * deterministic across JVMs. Non-image payloads pass through with
    * `decoded = false` and a null png.
    */
  def resizeImages(ds: Dataset[(Long, Array[Byte])], outW: Int, outH: Int,
                   batchSize: Int): Dataset[ResizedImage] = {
    import ds.sparkSession.implicits._
    require(outW > 0 && outH > 0)
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, bytes) =>
          val img =
            if (!looksLikeImage(bytes)) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
            ResizedImage(id, null, 0, 0, decoded = false)
          else {
            val out = new java.awt.image.BufferedImage(outW, outH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < outH) {
              val sy = (y.toLong * img.getHeight / outH).toInt
              var x = 0
              while (x < outW) {
                out.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / outW).toInt, sy))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedImage(id, bos.toByteArray, outW, outH, decoded = true)
          }
        }
      }
    }
  }

  /** Minimal multi-frame container (for video-like payloads without a
    * codec): `[int32 n][int32 len_0][bytes_0]...[int32 len_{n-1}]
    * [bytes_{n-1}]`, big-endian. Real video decode would replace
    * [[sampleFrames]]' unpack step; the Spark-side plumbing — schema,
    * batching, per-frame fan-out — is the part that matters at scale.
    */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  final case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Frame sampling: emit every `every`-th frame of each container
    * payload (frame 0 always included) — the video keyframe-sampling
    * shape: one input row fans out to its sampled frames, batched per
    * partition, no shuffle. Malformed containers yield zero frames
    * rather than failing the task.
    */
  def sampleFrames(ds: Dataset[(Long, Array[Byte])], every: Int,
                   batchSize: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    require(every > 0)
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          try {
            val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
            val n = in.readInt()
            require(n >= 0 && n < (1 << 20))
            (0 until n).flatMap { i =>
              val len = in.readInt()
              require(len >= 0 && len <= in.available())
              val buf = new Array[Byte](len)
              in.readFully(buf)
              if (i % every == 0) Some(Frame(id, i, buf)) else None
            }
          } catch { case _: Exception => Seq.empty }
        }
      }
    }
  }

  final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                             bits_per_sample: Int, n_samples: Long,
                             duration_s: Double, valid: Boolean)

  /** WAV (RIFF) header metadata: sample rate, channels, bit depth,
    * sample count, duration — parsed directly from the RIFF `fmt `/
    * `data` chunks (little-endian, no codec needed). Non-WAV payloads
    * return `valid = false`.
    */
  def audioMeta(ds: Dataset[(Long, Array[Byte])]): Dataset[AudioMeta] = {
    import ds.sparkSession.implicits._
    def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 3) & 0xffL) << 24)
    def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")
    ds.map { case (id, b) =>
      val bad = AudioMeta(id, 0, 0, 0, 0L, 0.0, valid = false)
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") bad
      else {
        // walk chunks: [tag][int32 size][payload] from offset 12
        var i = 12
        var rate = 0; var ch = 0; var bits = 0; var dataLen = -1L
        var ok = true
        while (ok && i + 8 <= b.length && (rate == 0 || dataLen < 0)) {
          val t = tag(b, i)
          val sz = le32(b, i + 4)
          if (t == "fmt " && i + 24 <= b.length) {
            ch = le16(b, i + 10); rate = le32(b, i + 12).toInt
            bits = le16(b, i + 22)
          } else if (t == "data") dataLen = math.min(sz, (b.length - i - 8).toLong)
          // a corrupt size that doesn't advance the cursor would loop
          // forever — treat it as end-of-chunks instead
          if (sz < 0 || sz > b.length) ok = false
          else i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
        }
        if (rate <= 0 || ch <= 0 || bits <= 0 || dataLen < 0) bad
        else {
          val n = dataLen / (ch.toLong * (bits / 8))
          AudioMeta(id, rate, ch, bits, n, n.toDouble / rate, valid = true)
        }
      }
    }
  }

  /** Batched executor-side decode: iterates payload batches (the shape
    * that amortizes per-batch codec/model setup for heavier decoders),
    * decoding each payload with `javax.imageio`. Decodable images
    * yield their true width/height and Rec.601 mean luma
    * (0.299R + 0.587G + 0.114B, 0–255 scale); everything else gets a
    * deterministic byte-derived synthetic feature with
    * `decoded = false` so mixed corpora never fail the pipeline.
    */
  def decodeFeatures(ds: Dataset[(Long, Array[Byte])], batchSize: Int): Dataset[Feature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, bytes) =>
          val img =
            if (!looksLikeImage(bytes)) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null } // corrupt image = not an image
          if (img != null && img.getWidth > 0 && img.getHeight > 0) {
            val w = img.getWidth
            val h = img.getHeight
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                       0.587 * ((rgb >> 8) & 0xff) +
                       0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            Feature(id, w, h, sum / (w.toLong * h), decoded = true, batch_size = batch.size)
          } else {
            val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffffL)
            Feature(id,
              width = 64 + (checksum % 512).toInt,
              height = 64 + ((checksum / 512) % 512).toInt,
              mean_luma = (checksum % 256000) / 1000.0,
              decoded = false,
              batch_size = batch.size)
          }
        }
      }
    }
  }
}
