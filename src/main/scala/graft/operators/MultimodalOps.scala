package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline (SURVEY.md §2 #32) — the Spark
  * shape of pyspec's CCD image-file handling: opaque binary payloads
  * with typed metadata, batch-wise feature extraction on executors.
  *
  * The DECODE step is a clearly-marked deterministic STUB (this
  * container ships no image/audio codecs); everything around it —
  * schema, partitioning, batch shape, typed Dataset plumbing — is
  * real and tested, so swapping in an actual decoder (JNI/opencv or a
  * Python `mapInPandas` worker) changes one function body only.
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
                           mean_luma: Double, batch_size: Int)

  /** Batched executor-side "decode": iterates payload batches exactly
    * the way a real decoder would (amortizing per-batch model/codec
    * setup), producing a deterministic fake feature vector derived
    * from the bytes. STUB — replace the body marked below with a real
    * codec to productionize; the surrounding plumbing stays.
    */
  def decodeFeaturesStub(ds: Dataset[(Long, Array[Byte])], batchSize: Int): Dataset[Feature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // --- STUB decode: a real implementation decodes image/audio
        // bytes here (per-batch codec reuse); this fake is
        // deterministic in the payload so tests are stable. ---
        batch.map { case (id, bytes) =>
          val n = bytes.length
          val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffffL)
          Feature(id,
            width = 64 + (checksum % 512).toInt,
            height = 64 + ((checksum / 512) % 512).toInt,
            mean_luma = (checksum % 256000) / 1000.0,
            batch_size = batch.size)
        }
      }
    }
  }
}
