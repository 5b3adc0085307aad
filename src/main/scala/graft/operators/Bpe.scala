package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the
  * GPT-2/LLaMA tokenizer family): a learned merges table turns
  * per-word character sequences into subword tokens, and the TOKEN
  * COUNT — not the regex approximation — is what sequence packing
  * and token-budget accounting at scale should run on.
  *
  * Training is the classic greedy pair-count loop, run on the driver
  * over the corpus's DISTINCT-WORD vocabulary with multiplicities —
  * model-state-on-driver like [[IvfIndex]]: the distributed step is
  * one (word, count) aggregate of a deterministic document sample
  * (tokenizer trainers cap their sample by design; HF tokenizers do
  * the same), bounded by `maxVocab`, and every subsequent iteration
  * is O(vocab) driver arithmetic — the corpus is never rescanned.
  * Deterministic: ties on pair frequency break lexicographically, so
  * reruns and any partitioning produce the identical merges list.
  *
  * Counting deploys as a native expression
  * ([[graft.expressions.TextExpressions.bpeCount]]) with the merges
  * table inlined — zero join, zero shuffle, streaming-safe, exactly
  * like the classifier deployments.
  */
object Bpe {

  /** Greedy left-to-right non-overlapping application of one merge to
    * a symbol sequence. */
  def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `nMerges` merges from (word, count) vocabulary rows. */
  def trainMerges(vocab: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var v: Map[Vector[String], Long] = vocab
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap // defensive re-group
      .map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = mutable.ArrayBuffer[(String, String)]()
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val counts = mutable.Map[(String, String), Long]()
      v.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic: most frequent pair, lexicographic tie-break
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        v = v.groupBy { case (syms, _) => applyMerge(syms, best._1, best._2) }
          .map { case (k, g) => k -> g.values.sum }
      }
      m += 1
    }
    merges.toSeq
  }

  /** Distributed vocabulary extraction + driver training: a
    * deterministic `samplePct`% document sample aggregates to
    * (word, count) rows — vocab-sized model input, not corpus-sized —
    * then [[trainMerges]] runs on the driver. `maxVocab` fails loudly
    * if the sample's vocabulary exceeds the driver budget (shrink the
    * sample, as every tokenizer trainer does).
    */
  def trainFromCorpus(docs: DataFrame, text: Column, nMerges: Int,
                      samplePct: Int = 100, maxVocab: Int = 1000000): Seq[(String, String)] = {
    val sampled =
      if (samplePct >= 100) docs
      else docs.filter(Sampling.samplePredicate(col("doc_id"), samplePct, "bpe"))
    val vocab = sampled
      .select(explode(TextOps.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    require(vocab.size <= maxVocab,
      s"BPE training vocabulary ${vocab.size} exceeds maxVocab $maxVocab — lower samplePct")
    trainMerges(vocab, nMerges)
  }

  /** Reference (driver-side) greedy BPE token count of one text —
    * the semantic spec the native expression must match. */
  def countTokensRef(text: String, merges: Seq[(String, String)]): Long = {
    val ranks = merges.zipWithIndex.toMap
    text.split(" ").filter(_.nonEmpty).map { w =>
      var syms = w.map(_.toString).toVector
      var more = true
      while (more && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bi = -1
        var i = 0
        while (i + 1 < syms.length) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bi = i }
          i += 1
        }
        if (bi < 0) more = false
        else syms = applyMerge(syms, syms(bi), syms(bi + 1))
      }
      syms.length.toLong
    }.sum
  }
}
