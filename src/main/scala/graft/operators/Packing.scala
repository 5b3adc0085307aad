package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: assign documents to fixed
  * token-budget training sequences, maximizing fill — the step
  * between a curated corpus and a dataloader.
  *
  * Packing is inherently order-dependent stateful work, so this is
  * the documented `mapPartitions` case (SURVEY §2): documents are
  * hash-distributed into `buckets` independent partitions, each
  * partition runs first-fit-decreasing locally, and sequence ids are
  * namespaced by bucket — zero coordination between buckets, so the
  * same code packs a trillion documents across a cluster. Memory per
  * task is O(docs-per-bucket) doc-id/size pairs (16 bytes each;
  * size `buckets` so a bucket's ids fit comfortably in an executor).
  *
  * Determinism: the bucket assignment is a pure hash of the doc id,
  * and each bucket packs its docs in (tokens DESC, doc_id) order —
  * repeated runs and any cluster layout produce identical sequences.
  *
  * Documents larger than the budget become singleton sequences
  * (flagged by fill > 1) — truncation policy belongs to the
  * tokenizer, not the packer.
  */
object Packing {

  /** @param tokenCount exact integer token count column
    * @return one row per packed sequence:
    *         (bucket, seq_id, n_docs, total_tokens, fill, doc_ids)
    */
  def packSequences(docs: DataFrame, id: Column, tokenCount: Column,
                    budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0, "buckets must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .select(id.cast("long").as("doc_id"), tokenCount.cast("long").as("n_tok"))
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(buckets)).cast("int"))
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("n_tok").desc, col("doc_id"))
      .as[(Long, Long, Int)]
    prepared.mapPartitions { it =>
      // first-fit-decreasing per (already sorted) bucket run
      final class Bin(var remaining: Long) {
        val ids = scala.collection.mutable.ArrayBuffer[Long]()
        var total = 0L
      }
      val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Int, Long, Double, Seq[Long])]()
      var curBucket = Int.MinValue
      var bins = scala.collection.mutable.ArrayBuffer[Bin]()
      def flush(bucket: Int): Unit = {
        var i = 0
        while (i < bins.length) {
          val b = bins(i)
          out += ((bucket, i.toLong, b.ids.length, b.total,
            b.total.toDouble / budget, b.ids.toSeq))
          i += 1
        }
        bins = scala.collection.mutable.ArrayBuffer[Bin]()
      }
      for ((docId, nTok, bucket) <- it) {
        if (bucket != curBucket) {
          if (curBucket != Int.MinValue) flush(curBucket)
          curBucket = bucket
        }
        var placed = false
        var i = 0
        while (!placed && i < bins.length) {
          if (bins(i).remaining >= nTok) {
            bins(i).remaining -= nTok
            bins(i).ids += docId
            bins(i).total += nTok
            placed = true
          }
          i += 1
        }
        if (!placed) {
          val b = new Bin(math.max(0L, budget - nTok))
          b.ids += docId
          b.total = nTok
          bins += b
        }
      }
      if (curBucket != Int.MinValue) flush(curBucket)
      out.iterator
    }.toDF("bucket", "seq_id", "n_docs", "total_tokens", "fill", "doc_ids")
  }
}
