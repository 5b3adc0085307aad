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
