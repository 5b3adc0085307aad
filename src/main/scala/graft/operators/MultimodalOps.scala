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

  final case class ImageQuality(doc_id: Long, lap_var_micro: Long,
                                mean_luma_milli: Long, contrast_milli: Long,
                                decoded: Boolean)

  /** Image sharpness / exposure quality metrics (#401): variance of
    * the 4-neighbor Laplacian on a 32×32 luma resample (Pech-Pacheco
    * 2000 — THE standard blur detector: blurry ≈ 0, sharp ≫ 0),
    * plus mean luma (exposure) and luma standard deviation
    * (contrast) — the image-corpus quality filter that plays the
    * role Gopher rules (#85) play for text: drop the blurry, the
    * black, and the blown-out BEFORE they poison training. Same
    * deterministic decode + area-average luma as [[pHash]] (explicit
    * loops, bit-identical across JVMs); per-row arithmetic on
    * executors, zero shuffle, batched; non-decodable payloads emit
    * zeros with `decoded = false` so mixed corpora stay total.
    */
  def imageQuality(ds: Dataset[(Long, Array[Byte])],
                   batchSize: Int = 64): Dataset[ImageQuality] = {
    import ds.sparkSession.implicits._
    val s = 32
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, bytes) =>
          val img =
            if (!looksLikeImage(bytes)) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth == 0 || img.getHeight == 0)
            ImageQuality(id, 0L, 0L, 0L, decoded = false)
          else {
            val px = grayResize(img, s)
            var sum = 0.0; var sq = 0.0
            var i = 0
            while (i < s * s) { sum += px(i); sq += px(i) * px(i); i += 1 }
            val n = (s * s).toDouble
            val mean = sum / n
            val varL = math.max(sq / n - mean * mean, 0.0)
            // interior 4-neighbor Laplacian: 4p − left − right − up − down
            var lsum = 0.0; var lsq = 0.0; var m = 0
            var y = 1
            while (y < s - 1) {
              var x = 1
              while (x < s - 1) {
                val l = 4.0 * px(y * s + x) - px(y * s + x - 1) - px(y * s + x + 1) -
                  px((y - 1) * s + x) - px((y + 1) * s + x)
                lsum += l; lsq += l * l; m += 1
                x += 1
              }
              y += 1
            }
            val lapVar = math.max(lsq / m - (lsum / m) * (lsum / m), 0.0)
            ImageQuality(id,
              math.floor(lapVar * 1000000.0).toLong,
              math.floor(mean * 1000.0).toLong,
              math.floor(math.sqrt(varL) * 1000.0).toLong,
              decoded = true)
          }
        }
      }
    }
  }

  final case class PHash(doc_id: Long, phash: Long, decoded: Boolean)

  /** Area-average box resample to `s`×`s` Rec.601 luma — explicit
    * loops (not `Graphics2D`) so the values are bit-deterministic
    * across JVMs. */
  private def grayResize(img: java.awt.image.BufferedImage, s: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](s * s)
    var by = 0
    while (by < s) {
      var bx = 0
      while (bx < s) {
        val x0 = bx * w / s; val x1 = math.max(x0 + 1, (bx + 1) * w / s)
        val y0 = by * h / s; val y1 = math.max(y0 + 1, (by + 1) * h / s)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        out(by * s + bx) = sum / n
        bx += 1
      }
      by += 1
    }
    out
  }

  /** Top-left 8×8 block of the 2-D DCT-II of an `s`×`s` pixel block
    * (the low-frequency structure pHash thresholds). */
  private def dctLow8(px: Array[Double], s: Int): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var sum = 0.0
        var y = 0
        while (y < s) {
          var x = 0
          while (x < s) {
            sum += px(y * s + x) * math.cos((2 * x + 1) * u * math.Pi / (2 * s)) *
              math.cos((2 * y + 1) * v * math.Pi / (2 * s))
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = sum
        u += 1
      }
      v += 1
    }
    out
  }

  /** 64-bit perceptual hash (classic pHash: 32×32 luma → 8×8
    * low-frequency DCT → median threshold) — the image analogue of
    * SimHash: near-identical images (re-encodes, mild crops/rescales,
    * brightness-preserving edits) land within a few bits, so image
    * near-dup becomes the same banded hamming join the text side
    * already runs. Bit `i` (1–63) is set iff AC coefficient `i`
    * exceeds the median of the 63 AC coefficients; the DC bit stays 0.
    * Non-decodable payloads get a deterministic byte-polynomial
    * fallback with `decoded = false`, keeping mixed corpora total.
    * Per-row arithmetic on executors — zero shuffle, batched like
    * [[decodeFeatures]].
    */
  def pHash(ds: Dataset[(Long, Array[Byte])], batchSize: Int = 64): Dataset[PHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, bytes) =>
          val img =
            if (!looksLikeImage(bytes)) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img != null && img.getWidth > 0 && img.getHeight > 0) {
            val dct = dctLow8(grayResize(img, 32), 32)
            val ac = java.util.Arrays.copyOfRange(dct, 1, 64)
            java.util.Arrays.sort(ac)
            val med = ac(31)
            var h = 0L
            var i = 1
            while (i < 64) {
              if (dct(i) > med) h |= (1L << i)
              i += 1
            }
            PHash(id, h, decoded = true)
          } else {
            var h = 1125899906842597L
            var i = 0
            while (i < bytes.length) { h = 31L * h + (bytes(i) & 0xff); i += 1 }
            PHash(id, h, decoded = false)
          }
        }
      }
    }
  }

  /** Banded hamming near-dup over 64-bit perceptual hashes: split each
    * hash into `bands` equal slices, hash-join on (band, slice) —
    * pigeonhole guarantees any pair within `maxHamming < bands` bits
    * shares at least one exact slice — then confirm with
    * `bit_count(xor)`. One shuffle keyed by (band, slice); never
    * all-pairs. The same LSH shape as MinHash banding, with exact
    * slices as the band keys.
    */
  def pHashPairs(df: DataFrame, id: Column, hash: Column,
                 maxHamming: Int, bands: Int = 8): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"banding guarantees recall only for maxHamming < bands ($maxHamming >= $bands)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val keyed = df.select(id.as("doc_id"), hash.as("ph"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            (shiftrightunsigned(hash, b * width).bitwiseAND(lit(mask))).as("slice"))): _*)).as("bk"))
      .select(col("doc_id"), col("ph"), col("bk.band").as("band"), col("bk.slice").as("slice"))
    val l = keyed.select(col("band"), col("slice"),
      col("doc_id").as("id_a"), col("ph").as("ph_a"))
    val r = keyed.select(col("band"), col("slice"),
      col("doc_id").as("id_b"), col("ph").as("ph_b"))
    l.join(r, Seq("band", "slice"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Minimal PCM WAV container (RIFF / `fmt ` / `data`, little-endian
    * 16-bit) — the writer half of the audio path, used by fixtures and
    * round-trip specs. Interleaved samples are written verbatim.
    */
  def wavBytes(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  final case class PcmStats(doc_id: Long, n_samples: Long, sum_abs: Long,
                            sum_sq: Long, n_clipped: Long, n_silent: Long,
                            peak: Long, valid: Boolean)

  /** Sample-level PCM statistics from 16-bit WAV payloads — the audio
    * quality-filter signals a corpus curation run needs (silence and
    * clipping shares, energy): `sum_abs`/`sum_sq` exact integer sums,
    * clipped = |s| ≥ `clipAbs`, silent = |s| ≤ `silentAbs`, `peak` =
    * max |s|. Walks the RIFF chunks like [[audioMeta]]; anything that
    * is not 16-bit PCM comes back `valid = false` with zeroed stats so
    * mixed corpora never fail. Per-row arithmetic only — zero shuffle;
    * downstream thresholds (e.g. drop >50%-silent clips) are plain
    * filters on the result.
    */
  def pcmStats(ds: Dataset[(Long, Array[Byte])], clipAbs: Int = 32700,
               silentAbs: Int = 100): Dataset[PcmStats] = {
    import ds.sparkSession.implicits._
    def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 3) & 0xffL) << 24)
    def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")
    ds.map { case (id, b) =>
      val bad = PcmStats(id, 0L, 0L, 0L, 0L, 0L, 0L, valid = false)
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") bad
      else {
        var i = 12
        var bits = 0; var dataOff = -1; var dataLen = 0L
        var ok = true
        while (ok && i + 8 <= b.length && (bits == 0 || dataOff < 0)) {
          val t = tag(b, i)
          val sz = le32(b, i + 4)
          if (t == "fmt " && i + 24 <= b.length) bits = le16(b, i + 22)
          else if (t == "data") {
            dataOff = i + 8
            dataLen = math.min(sz, (b.length - i - 8).toLong)
          }
          if (sz < 0 || sz > b.length) ok = false
          else i += 8 + sz.toInt + (sz.toInt & 1)
        }
        if (bits != 16 || dataOff < 0) bad
        else {
          val n = (dataLen / 2).toInt
          var j = 0
          var sumAbs = 0L; var sumSq = 0L
          var clipped = 0L; var silent = 0L; var peak = 0L
          while (j < n) {
            val v = le16(b, dataOff + 2 * j).toShort.toInt
            val a = math.abs(v).toLong
            sumAbs += a; sumSq += a * a
            if (a >= clipAbs) clipped += 1
            if (a <= silentAbs) silent += 1
            if (a > peak) peak = a
            j += 1
          }
          PcmStats(id, n.toLong, sumAbs, sumSq, clipped, silent, peak, valid = true)
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

  final case class AudioFp(doc_id: Long, fp: Long, n_samples: Long, valid: Boolean)

  /** Audio fingerprint in the Haitsma–Kalker shape (Haitsma & Kalker
    * 2002, "A Highly Robust Audio Fingerprinting System"): the signal
    * is framed, per-frame band energies computed, and each bit is the
    * sign of the energy difference ACROSS adjacent bands differenced
    * ACROSS adjacent frames — robust to level/offset changes, cheap,
    * and byte-deterministic. Bands here are contiguous TIME segments
    * of each frame (a documented simplification of HK's spectral
    * bands — no FFT dependency; adequate for the near-identical-clip
    * dedup a corpus run needs, not for radio-grade retrieval).
    *
    * Frames×bands default to 16×5 → (16−1)·(5−1) = 60 bits packed in
    * one long (kept under 63 so the SQL oracle's BIGINT shift mirror
    * stays exact). Near-dup pairs then come from the SAME banded
    * hamming join as image pHash ([[pHashPairs]] — any 64-bit hash).
    * Per-row arithmetic, zero shuffle; exact integer energies.
    */
  def audioFingerprint(ds: Dataset[(Long, Array[Byte])], frames: Int = 16,
                       bands: Int = 5): Dataset[AudioFp] = {
    require(frames >= 2 && bands >= 2, "need >= 2 frames and >= 2 bands")
    require((frames - 1) * (bands - 1) <= 63,
      s"fingerprint bits must fit a positive long: ($frames-1)*($bands-1)")
    import ds.sparkSession.implicits._
    def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 3) & 0xffL) << 24)
    def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")
    ds.map { case (id, b) =>
      val bad = AudioFp(id, 0L, 0L, valid = false)
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") bad
      else {
        var i = 12
        var bits16 = 0; var dataOff = -1; var dataLen = 0L
        var ok = true
        while (ok && i + 8 <= b.length && (bits16 == 0 || dataOff < 0)) {
          val t = tag(b, i)
          val sz = le32(b, i + 4)
          if (t == "fmt " && i + 24 <= b.length) bits16 = le16(b, i + 22)
          else if (t == "data") {
            dataOff = i + 8
            dataLen = math.min(sz, (b.length - i - 8).toLong)
          }
          if (sz < 0 || sz > b.length) ok = false
          else i += 8 + sz.toInt + (sz.toInt & 1)
        }
        val n = (dataLen / 2).toInt
        val frameLen = n / frames
        val bandW = frameLen / bands
        if (bits16 != 16 || dataOff < 0 || bandW == 0) bad
        else {
          // exact integer band energies E[f][b] = Σ v² over the band's
          // bandW samples (frame tail beyond bands*bandW cropped)
          val en = Array.ofDim[Long](frames, bands)
          var f = 0
          while (f < frames) {
            var bb = 0
            while (bb < bands) {
              val base = f * frameLen + bb * bandW
              var s = 0L
              var j = 0
              while (j < bandW) {
                val v = le16(b, dataOff + 2 * (base + j)).toShort.toLong
                s += v * v
                j += 1
              }
              en(f)(bb) = s
              bb += 1
            }
            f += 1
          }
          var fp = 0L
          var pos = 0
          f = 1
          while (f < frames) {
            var bb = 0
            while (bb < bands - 1) {
              val d = (en(f)(bb) - en(f)(bb + 1)) - (en(f - 1)(bb) - en(f - 1)(bb + 1))
              if (d > 0) fp |= 1L << pos
              pos += 1
              bb += 1
            }
            f += 1
          }
          AudioFp(id, fp, n.toLong, valid = true)
        }
      }
    }
  }
}
