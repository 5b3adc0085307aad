package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level diagnostic statistics — the audit queries a curation
  * run reports next to its filters: lexical diversity per source
  * (type-token ratio, hapax share) and per-source unigram KL
  * divergence against the whole-corpus distribution (the quantitative
  * "how different is this slice from the mix" signal behind
  * data-mixing decisions; cf. the importance-weight view of DSIR,
  * Xie et al. 2023).
  *
  * Scale shape (both operators): explode → ONE (source, word)-keyed
  * hash aggregate with map-side combine — the shuffle is bounded by
  * vocab × sources × partitions, never corpus tokens — then
  * source-keyed scalar relations (one row per source) ride as
  * broadcasts. No corpus-scale join appears anywhere.
  */
object CorpusStats {

  /** Per-(source, word) exact counts — the shared first stage. */
  private def sourceWordCounts(docs: DataFrame, source: Column,
                               text: Column): DataFrame =
    docs.select(source.as("source"), explode(TextOps.tokens(text)).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c_sw"))

  /** Type-token ratio and vocabulary statistics per source:
    * n_tokens, n_types (distinct words), n_hapax (words occurring
    * exactly once in the source), ttr = types/tokens and the hapax
    * share of the vocabulary — exact integer counts with
    * [[Exact.roundedRatio]] finals.
    */
  def ttr(docs: DataFrame, source: Column, text: Column): DataFrame =
    sourceWordCounts(docs, source, text)
      .groupBy(col("source"))
      .agg(sum(col("c_sw")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c_sw") === 1, lit(1L)).otherwise(lit(0L))).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        Exact.roundedRatio(col("n_types"), col("n_tokens"), 4).as("ttr"),
        Exact.roundedRatio(col("n_hapax"), col("n_types"), 4).as("hapax_share"))

  /** Per-document unigram (Shannon) entropy in nats — the classic
    * repetitiveness signal (a doc that repeats a few tokens has low
    * entropy; boilerplate and keyword-stuffed spam sit far below
    * natural text):
    *
    *   H = ln n − (Σ_w c_w · ln c_w) / n
    *
    * Each `c_w · microLn(c_w)` term is an exact integer (microLn of a
    * small integer count), so the doc-keyed aggregate is an exact
    * integer sum; ln n enters once per doc through the same microLn.
    * Shape: explode → (doc, word) count → doc-keyed aggregate — the
    * same two map-side-combined shuffles as every other text statistic.
    */
  def docEntropy(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(TextOps.tokens(text)).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        sum(col("c") * Curation.microLn(col("c"))).cast("long").as("s_clnc"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") * Curation.microLn(col("n_tokens")) - col("s_clnc"))
          .as("h_micro_sum"),
        Exact.roundedRatioSigned(
          col("n_tokens") * Curation.microLn(col("n_tokens")) - col("s_clnc"),
          col("n_tokens") * lit(1000000L), 6).as("entropy"))

  /** Per-source unigram KL divergence vs the corpus distribution:
    *
    *   KL(p_s ‖ p) = Σ_w (c_sw / N_s) · ln( (c_sw·N) / (N_s·c_w) )
    *
    * Every per-word log ratio is micro-ln-quantized
    * ([[Curation.microLn]]) BEFORE the weighted sum, so the
    * distributed aggregate is an exact integer sum — order- and
    * engine-independent, the same determinism contract as the LM
    * scores. The log argument is built from exact integer products
    * with one double division (IEEE-identical on both engines).
    *
    * Returned: (source, n_tokens, kl_micro, kl) with kl in nats.
    * kl_micro can dip epsilon-negative from quantization on a
    * near-identical slice; true KL is ≥ 0.
    *
    * Shape: corpus word counts and the per-source totals both DERIVE
    * from the (source, word) relation (no second corpus scan); the
    * word-keyed model join is vocab-sized on both sides, and the
    * source totals / corpus total are broadcast scalars.
    */
  def sourceKl(docs: DataFrame, source: Column, text: Column): DataFrame = {
    val sw = sourceWordCounts(docs, source, text)
    val w = sw.groupBy(col("word")).agg(sum(col("c_sw")).cast("long").as("c_w"))
    val ns = sw.groupBy(col("source")).agg(sum(col("c_sw")).cast("long").as("n_s"))
    val tot = ns.agg(sum(col("n_s")).cast("long").as("n"))
    val q = Curation.microLn(
      (col("c_sw") * col("n")).cast("double") /
        (col("n_s") * col("c_w")).cast("double"))
    sw.join(w, Seq("word"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        sum(col("c_sw") * q).cast("long").as("kl_micro"))
      .select(col("source"), col("n_tokens"), col("kl_micro"),
        Exact.roundedRatioSigned(col("kl_micro"),
          col("n_tokens") * lit(1000000L), 6).as("kl"))
  }
}
