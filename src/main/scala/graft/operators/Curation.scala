package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators from the published pretraining-data
  * playbook, re-expressed as declarative Spark plans:
  *
  *  - [[lineDedup]] — corpus-wide segment-level deduplication in the
  *    style of C4's line dedup (Raffel et al. 2020, "Exploring the
  *    Limits of Transfer Learning", §2.2: "we discard all but one of
  *    any three-sentence span occurring more than once"). The driver
  *    corpus has no newlines, so the unit is a fixed-K-word segment;
  *    the semantics (first occurrence wins, corpus-wide) are C4's.
  *  - [[unigramLogProbs]] / perplexity scoring — CCNet-style language
  *    -model quality filtering (Wenzek et al. 2020): score every doc
  *    by its negative log-likelihood under a reference LM trained on
  *    a trusted slice; here a Laplace-smoothed unigram LM trained on
  *    the corpus's own `lang = 'en'` slice.
  *  - DSIR importance weights — Data Selection via Importance
  *    Resampling (Xie et al. 2023): hashed n-gram bag features, a
  *    per-bucket log-ratio between the target and raw feature
  *    distributions, and a per-doc importance weight that upranks
  *    target-like documents.
  *  - [[mixRates]] — source-mix rebalancing: derive per-source
  *    deterministic sampling rates that hit a target mix/budget (the
  *    "data mixing" step of a pretraining pipeline), applied with the
  *    portable hash predicate from [[Sampling]].
  *  - [[substrDedup]] — exact substring dedup (Lee et al. 2021);
  *    [[bigramLogProbs]]/[[trigramLogProbs]] — the stupid-backoff
  *    n-gram chain (Brants et al. 2007); [[gumbelScore]] — DSIR's
  *    Gumbel-top-k resampling; [[fimSplit]] — fill-in-the-middle
  *    preprocessing (Bavarian et al. 2022). The discriminative
  *    quality filter lives in [[QualityClassifier]].
  *
  * Everything is exact-integer on the comparison surface: float
  * logs are quantized to micro-nats (`floor(ln(x)·1e6)` as BIGINT)
  * BEFORE summation, so per-doc sums are order-independent integer
  * adds that reproduce bit-for-bit in any engine; ratios go through
  * [[Exact.roundedRatio]].
  *
  * Scale notes (100 TB):
  *  - lineDedup/substrDedup find first occurrences with ONE
  *    partition-window shuffle of the exploded relation (no
  *    aggregate+self-join). lineDedup keys are the segment strings so
  *    the DuckDB oracle can replay them; the drop-in scale key is a
  *    128-bit digest (shuffle bytes, not semantics).
  *  - The LM / DSIR model tables (vocab logprobs; n-gram
  *    conditionals; 2^b hashed-feature log-ratios) reach the scorer
  *    through [[modelJoin]] — broadcast while the size estimate fits,
  *    plain AQE-replanned equi-join past that — and are bounded by a
  *    cap: DSIR's by construction (`buckets`), the unigram vocab by
  *    `topV` (CCNet does the same), the bigram/trigram tables by
  *    Brants-style `minCount` pruning. Broadcast is an optimization
  *    here, never a requirement.
  *  - Single-row stats (corpus totals) attach via [[withStats]] —
  *    a 1-row broadcast whose cost is independent of corpus size.
  */
object Curation {

  /** Consecutive non-overlapping K-word segments over a word-array
    * column, in order; the final segment may be shorter. `w` MUST be
    * a materialized attribute (project the `split` into a named
    * column first): higher-order lambdas get no common-subexpression
    * elimination, so an inlined `split` would re-tokenize the doc for
    * every element — O(words²) per row.
    */
  def segmentsOfWords(w: Column, k: Int): Column =
    transform(
      sequence(lit(0), ceil(size(w).cast("double") / lit(k.toDouble)).cast("int") - 1),
      i => concat_ws(" ", slice(w, i * k + 1, lit(k))))

  /** Convenience single-expression form of [[segmentsOfWords]] for
    * small inputs/tests; hot paths should hoist the tokens column. */
  def segments(text: Column, k: Int): Column =
    segmentsOfWords(TextOps.tokens(text), k)

  /** DuckDB mirror of [[segments]] over a `w` word-list column:
    * a list comprehension producing the same K-word segment strings.
    */
  def segmentsSql(k: Int): String =
    s"[array_to_string(w[(i*$k+1):(i*$k+$k)], ' ') for i in range(0, CAST(ceil(len(w)/$k.0) AS BIGINT))]"

  /** C4-style corpus-wide segment dedup: every K-word segment keeps
    * only its FIRST occurrence (smallest (doc_id, seg_idx)) across the
    * whole corpus; all later occurrences — in other docs or the same
    * doc — are dropped, and each document is re-assembled from its
    * surviving segments in order.
    *
    * Output: (doc_id, n_segs, n_kept, new_md5) where new_md5 is the
    * md5 of the re-assembled text ('' when everything was dropped —
    * the fate of an exact-duplicate document, which C4-dedups to
    * nothing here because its every segment already occurred).
    *
    * Plan: explode → min-over-partition(seg) window → groupBy(doc).
    * One shuffle of the segment relation for the argmin, no corpus²
    * anywhere.
    */
  def lineDedup(docs: DataFrame, k: Int): DataFrame = {
    val segs = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"), posexplode(segmentsOfWords(col("w"), k)).as(Seq("i", "seg")))
    val pos = packedPos(col("doc_id"), col("i"))
    // First occurrence via a partition window, not groupBy+self-join:
    // ONE shuffle of the segment relation instead of two.
    val surv = segs
      .withColumn("first_pos",
        min(pos).over(org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))))
      .filter(pos === col("first_pos"))
    val re = surv.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      md5(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("i"), col("seg")))),
          s => s("seg")))).as("new_md5"))
    // per-doc totals are ARITHMETIC — ceil(len(w)/k) is exactly the
    // segment count (every doc has >= 1 token, so >= 1 segment): no
    // second explode, no segment strings, no shuffle
    val tot = docs.select(col("doc_id"),
      ceil(size(TextOps.tokens(col("text"))).cast("double") / lit(k.toDouble))
        .cast("long").as("n_segs"))
    tot
      .join(re, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("new_md5"), lit(EmptyMd5)).as("new_md5"))
  }

  /** pos = doc_id·base + seg_idx is a collision-free total order
    * matching (doc_id, seg_idx) lexicographic PROVIDED seg_idx <
    * PosBase and |doc_id| < 2^63 / PosBase. 2^21 bounds documents at
    * ~2M segments/windows (≈17M words at k=8) and doc ids at ~4.4e12
    * — both far beyond realistic corpora; a document or id space
    * exceeding them should be range-sharded first (same contract as
    * DocPairsExpr's 2^31 id bound). [[packedPos]] ENFORCES the bound:
    * a violation raises at run time instead of silently
    * mis-deduplicating on a corrupted order.
    */
  val PosBase = 1L << 21
  private val EmptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"

  /** doc_id·PosBase + i with the packing bound enforced (cheap per-row
    * comparisons, codegen-friendly; never fires on in-contract data).
    */
  private def packedPos(docId: Column, i: Column): Column =
    when(i >= PosBase || i < 0 ||
         docId >= Long.MaxValue / PosBase || docId <= Long.MinValue / PosBase,
      raise_error(concat(lit("Curation: (doc_id, idx) exceeds the PosBase packing bound: ("),
        docId.cast("string"), lit(", "), i.cast("string"), lit(")"))).cast("long"))
      .otherwise(docId * lit(PosBase) + i)

  /** Rolling L-token window keys (60-bit md5-derived, portable) at
    * every start position, NOT distinct — positions matter for exact
    * substring dedup. `w` must be a materialized attribute (see
    * [[segmentsOfWords]]). Docs shorter than L yield no windows.
    */
  def windowKeysOfWords(w: Column, l: Int): Column =
    when(size(w) >= l,
      transform(sequence(lit(1), size(w) - (l - 1)),
        i => conv(substring(md5(concat_ws(" ", slice(w, i, lit(l)))), 1, 15), 16, 10).cast("long")))
      .otherwise(array().cast("array<long>"))

  /** Exact substring deduplication (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): any L-token span
    * occurring more than once in the corpus is kept ONLY at its first
    * occurrence (smallest (doc_id, pos)); every other occurrence's
    * tokens are deleted and each document re-assembled from its
    * surviving tokens. Overlapping duplicate windows union cleanly
    * (delete-set semantics), so a repeat longer than L is removed
    * whole.
    *
    * Output: (doc_id, n_tokens, n_kept, new_md5) — new_md5 of the
    * re-assembled text, md5('') when the doc dissolved entirely (an
    * exact duplicate document).
    *
    * Plan ([[substrDedup]]): window relation = one row per token
    * (corpus-token-sized, not corpus²); min-over-partition window
    * argmin (one shuffle); the delete fan-out is f·L per duplicated
    * window — LINEAR in occurrences, so boilerplate-heavy corpora
    * stay safe; a left-anti join prunes the token relation; final
    * per-doc reassembly groupBy. [[substrDedupStats]] is the
    * counts-only keep-decision path.
    *
    * The delete-set: (doc_id, idx) token positions
    * covered by a NON-first occurrence of some L-window. NOT
    * deduplicated — left_anti consumers don't care, and the
    * counts-only path distincts exactly once where it must.
    */
  private[graft] def substrDeleteSet(docs: DataFrame, l: Int): DataFrame = {
    val wins = docs
      .select(col("doc_id"),
        posexplode(graft.expressions.TextExpressions.windowKeys(col("text"), l)).as(Seq("p", "h")))
      .select(col("doc_id"), (col("p") + 1).as("pos"), col("h"))
    val occ = packedPos(col("doc_id"), col("pos"))
    // First occurrence via a partition window (one shuffle, no
    // self-join).
    wins
      .withColumn("fp",
        min(occ).over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(occ =!= col("fp"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(l - 1))).as("idx"))
  }

  /** Counts-only [[substrDedup]] — (doc_id, n_tokens, n_kept) without
    * re-assembling any text: the delete-set distincts and counts per
    * doc instead of anti-joining the token relation and rebuilding
    * strings. The funnel / keep-decision path, where the corrected
    * text itself is never needed.
    */
  def substrDedupStats(docs: DataFrame, l: Int): DataFrame =
    substrDedupStatsFromDel(docs, substrDeleteSet(docs, l))

  /** [[substrDedupStats]] over a precomputed delete set — for a
    * session that materialized [[substrDeleteSet]] once and fans
    * several consumers off it. Identical values. */
  def substrDedupStatsFromDel(docs: DataFrame, del: DataFrame): DataFrame = {
    val delCnt = del.distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_del"))
    docs.select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(delCnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_del"), lit(0L))).as("n_kept"))
  }

  def substrDedup(docs: DataFrame, l: Int): DataFrame =
    substrDedupFromDel(docs, substrDeleteSet(docs, l))

  /** [[substrDedup]] over a precomputed delete set. Identical values. */
  def substrDedupFromDel(docs: DataFrame, del: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
    val tokRel = toks
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p", "word")))
      .select(col("doc_id"), (col("p") + 1).as("idx"), col("word"))
    val re = tokRel.join(del, Seq("doc_id", "idx"), "left_anti")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("idx"), col("word")))),
            s => s("word")))).as("new_md5"))
    toks.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(re, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("new_md5"), lit(EmptyMd5)).as("new_md5"))
  }

  /** floor(ln(x)·1e6) as BIGINT — micro-nat quantization. Sums of
    * these are exact integer arithmetic (order-independent across
    * engines); the double `ln` itself is computed identically from
    * identical rational inputs on both sides, and a last-ulp libm
    * disagreement only matters if it straddles a 1e-6 boundary
    * (probability ~1e-10 per DISTINCT input — vocab-sized, not
    * corpus-sized).
    */
  def microLn(x: Column): Column = floor(log(x) * lit(1000000)).cast("long")

  /** DuckDB mirror of [[microLn]]. */
  def microLnSql(x: String): String =
    s"CAST(floor(ln($x) * 1000000) AS BIGINT)"

  /** Laplace-smoothed unigram log-probabilities (micro-nats) of every
    * word in `refToks` (one row per token occurrence, column `word`):
    * q(w) = microLn((c_w + 1) / (N + V)). Returns (word, q) — the LM
    * "model table", vocab-sized, broadcast to the scorer. Cap it with
    * a top-V filter before broadcasting at cluster scale.
    */
  def unigramLogProbs(refToks: DataFrame, scale: Double = 1.0,
                      topV: Option[Int] = None): DataFrame = {
    val ref0 = refToks.groupBy(col("word")).agg(count(lit(1)).as("c"))
    // Smoothing stats come from the FULL vocabulary either way, so a
    // cap changes which words score as OOV but not the model's mass
    // accounting (CCNet-style: cap the broadcast table, not the LM).
    val st = ref0.agg(sum(col("c")).cast("long").as("n"), count(lit(1)).as("v"))
    val ref = topV match {
      case Some(k) =>
        ref0.orderBy(col("c").desc, col("word")).limit(k)
      case None => ref0
    }
    withStats(ref, st)
      .select(col("word"),
        microLn(lit(scale) * (col("c") + lit(1.0)) / (col("n") + col("v"))).as("q"))
  }

  /** The matching out-of-vocabulary score: microLn(scale / (N + V)),
    * a single-row DataFrame with column `oovq`. `scale` < 1 is the
    * backoff penalty when this is the last rung of a backoff chain.
    */
  def oovLogProb(refToks: DataFrame, scale: Double = 1.0): DataFrame = {
    val ref = refToks.groupBy(col("word")).agg(count(lit(1)).as("c"))
    ref.agg(sum(col("c")).cast("long").as("n"), count(lit(1)).as("v"))
      .select(microLn(lit(scale) * lit(1.0) / (col("n") + col("v"))).as("oovq"))
  }

  /** [[unigramLogProbs]] + [[oovLogProb]] built from ONE vocabulary
    * aggregate: the (word, c) table is computed and cached once
    * (vocab-sized — the natural thing to hold), then the smoothing
    * stats, the top-V model slice and the OOV floor all read it.
    * Values are identical to calling the two functions separately;
    * only the number of corpus passes changes (3 → 1). The cache is
    * freed by the harness post-action like every gate-lifetime cache.
    */
  def unigramModel(refToks: DataFrame, scale: Double = 1.0,
                   topV: Option[Int] = None): (DataFrame, DataFrame) =
    unigramModelFromCounts(
      refToks.groupBy(col("word")).agg(count(lit(1)).as("c")).persist(),
      scale, topV)

  /** [[unigramModel]] over a pre-counted (word, c[, n, v]) vocabulary
    * table — the entry point for a count relation materialized ONCE
    * per session ([[graft.SharedRelations]]): the corpus never
    * re-scans, every rung reads the snapshot. Snapshot-resident
    * smoothing scalars (n, v) save the stats aggregate + scalar
    * attach per gate. Values identical to counting inline. */
  def unigramModelFromCounts(ref0: DataFrame, scale: Double = 1.0,
                             topV: Option[Int] = None): (DataFrame, DataFrame) = {
    val hasStats = ref0.columns.contains("n") && ref0.columns.contains("v")
    val st =
      if (hasStats)
        ref0.agg(max(col("n")).cast("long").as("n"), max(col("v")).as("v"))
      else ref0.agg(sum(col("c")).cast("long").as("n"), count(lit(1)).as("v"))
    val ref = topV match {
      case Some(k) => ref0.orderBy(col("c").desc, col("word")).limit(k)
      case None => ref0
    }
    val lp0 = if (hasStats) ref else withStats(ref, st)
    val lp = lp0.select(col("word"),
      microLn(lit(scale) * (col("c") + lit(1.0)) / (col("n") + col("v"))).as("q"))
    val oov = st.select(
      microLn(lit(scale) * lit(1.0) / (col("n") + col("v"))).as("oovq"))
    (lp, oov)
  }

  /** Trigram rung of the stupid-backoff chain: q = microLn(
    * c(w1,w2,w3) / c(w1,w2,·)) for every trigram observed in the
    * reference slice (predecessor-pair normalized). Unseen trigrams
    * back off to 0.4·bigram, then 0.4²·unigram/OOV — each rung's
    * scale folds into ITS quantized table so no post-hoc addition of
    * quantized values is needed. `refTrigrams`: one row per instance,
    * columns w1, w2, w3.
    *
    * `minCount` is Brants-style count pruning: trigrams rarer than the
    * cutoff leave the model table (their probes fall to the bigram
    * rung) while the predecessor-pair normalizer keeps the FULL
    * successor mass, so surviving conditionals don't drift. This is
    * what bounds the table at corpus scale — a web-scale slice has
    * billions of singleton trigrams and minCount 2–5 removes most of
    * them (Brants et al. 2007 §3).
    */
  def trigramLogProbs(refTrigrams: DataFrame, minCount: Long = 1L): DataFrame =
    // count table cached: both the normalizer aggregate and the model
    // join read it, so the corpus-scale count runs once (model-sized)
    trigramLogProbsFromCounts(
      refTrigrams.groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("c3")).persist(), minCount)

  /** [[trigramLogProbs]] over a pre-counted (w1, w2, w3, c3[, c12])
    * table — for counts materialized once per session
    * ([[graft.SharedRelations]]); a snapshot-resident c12 makes the
    * model a pure scan + project. Identical values. */
  def trigramLogProbsFromCounts(c3: DataFrame, minCount: Long = 1L): DataFrame = {
    val normed =
      if (c3.columns.contains("c12")) c3
      else c3.join(c3.groupBy(col("w1"), col("w2"))
        .agg(sum(col("c3")).cast("long").as("c12")), Seq("w1", "w2"))
    normed.filter(col("c3") >= minCount)
      .select(col("w1"), col("w2"), col("w3"), microLn(col("c3") / col("c12")).as("qt"))
  }

  /** Stupid-backoff bigram model (Brants et al. 2007, "Large Language
    * Models in Machine Translation"): for every bigram observed in the
    * reference slice, q = microLn(c(w1,w2) / c(w1·)) where c(w1·) is
    * w1's count as a PREDECESSOR (so the conditional sums to 1 over
    * observed successors). Unseen bigrams back off to
    * 0.4 · unigram ([[unigramLogProbs]] with scale = 0.4). Returns
    * (w1, w2, qb) — the bigram model table.
    *
    * `minCount` count-prunes the table (see [[trigramLogProbs]]):
    * pruned bigrams fall to the unigram rung, the predecessor
    * normalizer keeps the full mass. This is the bound that makes the
    * table broadcastable — or at least joinable — at corpus scale.
    *
    * `refBigrams` is one row per bigram INSTANCE with columns w1, w2.
    */
  def bigramLogProbs(refBigrams: DataFrame, scale: Double = 1.0,
                     minCount: Long = 1L): DataFrame =
    // count table cached — see trigramLogProbs
    bigramLogProbsFromCounts(
      refBigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb")).persist(),
      scale, minCount)

  /** [[bigramLogProbs]] over a pre-counted (w1, w2, cb[, cw1]) table
    * — for counts materialized once per session
    * ([[graft.SharedRelations]]). If the predecessor normalizer cw1
    * is already a snapshot column the whole model table is a pure
    * scan + project (zero shuffles per gate). Identical values. */
  def bigramLogProbsFromCounts(cb: DataFrame, scale: Double = 1.0,
                               minCount: Long = 1L): DataFrame = {
    val normed =
      if (cb.columns.contains("cw1")) cb
      else cb.join(cb.groupBy(col("w1"))
        .agg(sum(col("cb")).cast("long").as("cw1")), "w1")
    normed.filter(col("cb") >= minCount)
      .select(col("w1"), col("w2"),
        microLn(lit(scale) * col("cb") / col("cw1")).as("qb"))
  }

  /** Interpolated Kneser–Ney bigram model tables (Chen & Goodman 1999
    * §2.7 — THE standard n-gram smoothing; stupid backoff trades it
    * away for distributability, KN keeps proper probabilities):
    *
    *   P(w2|w1) = (max(c(w1,w2) − D, 0) + D·n1p(w1)·Pcont(w2)) / c(w1·)
    *   Pcont(w2) = n1m(w2) / n1pp
    *
    * with D = 0.75 (exactly representable), n1p(w1) = distinct
    * successors of w1, n1m(w2) = distinct predecessors of w2, n1pp =
    * total distinct bigrams. Returns the model tables a scorer
    * left-joins: `kb` (w1, w2, c), `kw` (w1, cw1, n1p), `kc` (w2,
    * n1m), and the 1-row `kt` (n1pp). All exact integer counts; the
    * probability itself is evaluated in the scorer so its double
    * association can be mirrored in SQL verbatim.
    *
    * `minCount` prunes only the per-bigram table (pruned probes fall
    * to the continuation-only rung, like [[bigramLogProbs]]); the
    * unigram-shaped `kw`/`kc` tables are vocab-bounded. Same
    * [[modelJoin]] size-switch discipline applies at corpus scale.
    */
  def knBigramTables(refBigrams: DataFrame, minCount: Long = 1L)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    // the bigram-count table feeds all four derived tables — cache it
    // (model-sized, far below the corpus that produces it) so the
    // corpus-scale count aggregate runs once, not four times
    knBigramTablesFromCounts(
      refBigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c")).persist(),
      minCount)

  /** [[knBigramTables]] over a pre-counted (w1, w2, c) table — for
    * counts materialized once per session
    * ([[graft.SharedRelations]]). Identical values. */
  def knBigramTablesFromCounts(cb: DataFrame, minCount: Long = 1L)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val kw = cb.groupBy(col("w1")).agg(
      sum(col("c")).cast("long").as("cw1"), count(lit(1)).as("n1p"))
    val kc = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1m"))
    val kt = cb.agg(count(lit(1)).as("n1pp"))
    (cb.filter(col("c") >= minCount), kw, kc, kt)
  }

  /** Join a corpus-derived MODEL table into a scoring relation with a
    * size-selected strategy (the `bucketRelAuto` pattern from the
    * embedding gates): while the model's optimizer size estimate fits
    * the session's `autoBroadcastJoinThreshold` it is planned as a
    * broadcast build side — the fast path at bench scale, where these
    * tables are vocab-sized. Past the threshold (an uncapped n-gram
    * table over a 100 TB corpus is billions of rows) it becomes a
    * plain equi-join that AQE re-plans from OBSERVED shuffle sizes, so
    * the driver is never forced to materialize an unbounded model.
    * Both strategies produce identical rows; only the plan changes.
    * Pair with the `minCount`/`topV` caps above, which are what make
    * the broadcast path reachable at scale in the first place.
    */
  def modelJoin(rel: DataFrame, model: DataFrame, keys: Seq[String],
                joinType: String = "left"): DataFrame = {
    val thresh = rel.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val bytes = model.queryExecution.optimizedPlan.stats.sizeInBytes
    if (thresh > 0 && bytes <= BigInt(thresh)) rel.join(broadcast(model), keys, joinType)
    else rel.join(model, keys, joinType)
  }

  /** Attach a SINGLE-ROW stats relation to every row of `df` via a
    * broadcast join — the plan-level spelling of a scalar broadcast
    * variable. Catalyst folds the literal equi-key away, so this
    * plans as a 1-row IdentityBroadcast nested-loop: scale-safe at
    * any corpus size (same precedent as the dark-frame and
    * histogram-range scalars in the gate allowlist).
    */
  def withStats(df: DataFrame, oneRow: DataFrame): DataFrame =
    df.withColumn("jk", lit(1))
      .join(broadcast(oneRow.withColumn("jk", lit(1))), "jk")
      .drop("jk")

  /** Hashed-bigram DSIR features over a MATERIALIZED word-array
    * column (see [[segmentsOfWords]] for why): for each doc one
    * bucket id per bigram instance, bucket = base_hash(w_i + " " +
    * w_{i+1}) mod `buckets`. Portable (md5-derived) so the oracle
    * replays it.
    */
  def bigramBucketsOfWords(w: Column, buckets: Int): Column =
    when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => pmod(TextOps.baseHash(
          concat_ws(" ", element_at(w, i), element_at(w, i + 1))), lit(buckets.toLong))))
      .otherwise(array().cast("array<long>"))

  /** Convenience single-expression form of [[bigramBucketsOfWords]]
    * for small inputs/tests; hot paths hoist the tokens column. */
  def bigramBuckets(text: Column, buckets: Int): Column =
    bigramBucketsOfWords(TextOps.tokens(text), buckets)

  /** DuckDB mirror of one [[bigramBuckets]] list over `w`. */
  def bigramBucketsSql(buckets: Int): String =
    s"[${TextOps.baseHashSql("w[i] || ' ' || w[i+1]")} % $buckets for i in range(1, len(w))]"

  /** DSIR importance weights (Xie et al. 2023): per-doc sum of hashed
    * -bigram log-ratios between the target (`lang = 'en'`) and raw
    * feature distributions, Laplace-smoothed over `buckets` buckets,
    * micro-nat-quantized. Returns (doc_id, n_feat, w_micro); docs
    * with < 2 tokens drop out (no features).
    *
    * Shape: one groupBy(bucket) over the exploded bigram relation
    * (map-side combined), the 2^b-row model broadcast back, one
    * groupBy(doc). The model size is bounded by construction.
    */
  def dsirWeights(docs: DataFrame, buckets: Int): DataFrame = {
    val bg = docs
      .select(col("doc_id"), col("lang"),
        explode(graft.expressions.TextExpressions.bigramBuckets(col("text"), buckets)).as("b"))
    val cb = bg.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === "en", lit(1))).as("ct"))
    val st = cb.agg(sum(col("cr")).cast("long").as("nr"), sum(col("ct")).cast("long").as("nt"))
    val lr = withStats(cb, st)
      .select(col("b"),
        floor((log((col("ct") + lit(1.0)) / (col("nt") + lit(buckets)))
             - log((col("cr") + lit(1.0)) / (col("nr") + lit(buckets)))) * lit(1000000))
          .cast("long").as("q"))
    bg.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"), sum(col("q")).cast("long").as("w_micro"))
  }

  /** DSIR's resampling stage: sampling k docs WITHOUT replacement with
    * probability ∝ exp(weight) is exactly "keep the top-k of
    * weight + Gumbel noise" (the Gumbel-top-k trick the DSIR paper
    * uses). The noise here is deterministic and engine-portable:
    * u = (base_hash("gumbel:" + id) + 0.5) / 2^32  ∈ (0,1),
    * g = −ln(−ln(u)), both micro-nat-quantized, so reruns and the
    * SQL oracle agree row-for-row. Returns `w_micro + g_micro` — rank
    * desc and take k. Zero shuffle, per-row expression.
    */
  def gumbelScore(id: Column, wMicro: Column): Column = {
    val u = (TextOps.baseHash(concat(lit("gumbel:"), id.cast("string"))) + lit(0.5)) /
      lit(4294967296.0)
    wMicro + floor(-log(-log(u)) * lit(1000000)).cast("long")
  }

  /** DuckDB mirror of [[gumbelScore]]. */
  def gumbelScoreSql(idSql: String, wSql: String): String = {
    val u = s"((${TextOps.baseHashSql(s"'gumbel:' || CAST($idSql AS VARCHAR)")} + 0.5) / 4294967296.0)"
    s"($wSql + CAST(floor(-ln(-ln($u)) * 1000000) AS BIGINT))"
  }

  /** Fill-in-the-middle preprocessing (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * split each document into (prefix, middle, suffix) at two
    * deterministic hash-chosen token positions and flag the ~50%
    * SPM-ordered subset — the standard FIM transformation, rerun- and
    * engine-stable because the "random" split points derive from the
    * portable base hash of the doc id, not a seed stream. Documents
    * under 3 tokens are dropped. The two positions land in
    * [1, n−1], so prefix and suffix are never empty; an equal pair
    * yields an empty middle (the paper allows it).
    *
    * Output: (doc_id, n_tokens, p1, p2, spm, prefix_md5, middle_md5,
    * suffix_md5). Zero shuffle — pure per-row expressions.
    */
  def fimSplit(docs: DataFrame): DataFrame = {
    val n = size(col("w"))
    def cut(prefix: String) =
      pmod(TextOps.baseHash(concat(lit(prefix + ":"), col("doc_id").cast("string"))),
        (n - 1).cast("long")) + lit(1L)
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"),
        least(cut("fim1"), cut("fim2")).as("p1"),
        greatest(cut("fim1"), cut("fim2")).as("p2"),
        (pmod(TextOps.baseHash(concat(lit("fimo:"), col("doc_id").cast("string"))),
          lit(10L)) < 5).as("spm"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        col("p1"), col("p2"), col("spm"),
        md5(concat_ws(" ", slice(col("w"), lit(1), col("p1").cast("int")))).as("prefix_md5"),
        md5(concat_ws(" ", slice(col("w"), col("p1").cast("int") + 1,
          (col("p2") - col("p1")).cast("int")))).as("middle_md5"),
        md5(concat_ws(" ", slice(col("w"), col("p2").cast("int") + 1,
          (size(col("w")) - col("p2")).cast("int")))).as("suffix_md5"))
  }

  /** Per-source sampling rates (basis points) that rebalance the
    * corpus toward a UNIFORM source mix within a `budgetPct`% budget:
    * every source gets quota = (total·budgetPct/100)/n_sources docs,
    * rate_s = min(10000, quota·10000 // n_s). Over-represented sources
    * are downsampled; under-represented ones keep everything (a rate
    * is capped at 100% — deterministic sampling can't upsample).
    * Input: (source, n_docs) counts; output adds (rate_bp).
    */
  def mixRates(counts: DataFrame, budgetPct: Int): DataFrame = {
    val st = counts.agg(sum(col("n_docs")).cast("long").as("total"),
      count(lit(1)).as("n_src"))
    withStats(counts, st)
      .withColumn("rate_bp",
        least(lit(10000L),
          expr(s"(total * $budgetPct DIV 100 DIV n_src) * 10000 DIV n_docs")))
      .select(col("source"), col("n_docs"), col("rate_bp"))
  }

  /** The deterministic keep predicate applied against a row's rate:
    * base_hash("mix:" + id) mod 10000 < rate_bp. */
  def mixKeep(id: Column, rateBp: Column): Column =
    pmod(TextOps.baseHash(concat(lit("mix:"), id.cast("string"))), lit(10000L)) < rateBp

  /** DuckDB mirror of [[mixKeep]]. */
  def mixKeepSql(idSql: String, rateSql: String): String =
    s"(${TextOps.baseHashSql(s"'mix:' || CAST($idSql AS VARCHAR)")} % 10000) < $rateSql"

  /** Moore–Lewis cross-entropy-difference score as a STATELESS
    * literal-model expression: Σ_tokens (q_in(w) − q_gen(w)) in
    * exact micro-nats, with both topV-capped model tables inlined as
    * map LITERALS (bounded driver state — the same deployment shape
    * as [[QualityClassifier.scoreExpr]]: train in batch, ship the
    * model INSIDE the plan). Because the expression carries no
    * state and no join, it runs identically over a batch relation
    * and a structured stream — batch==stream parity is exact by
    * construction (pinned in StreamingSpec), and at 100 TB the
    * scorer is one codegen-friendly projection, zero shuffles.
    */
  def mlScoreExpr(text: Column, inModel: Map[String, Long], oovIn: Long,
                  genModel: Map[String, Long], oovGen: Long): Column = {
    val mIn = typedLit(inModel)
    val mGen = typedLit(genModel)
    aggregate(TextOps.tokens(text), lit(0L),
      (acc, w) => acc + coalesce(element_at(mIn, w), lit(oovIn)) -
        coalesce(element_at(mGen, w), lit(oovGen)))
  }

  /** Collect a [[unigramModel]] pair (model table, 1-row OOV floor)
    * into the literal form [[mlScoreExpr]] inlines: (word→micro-nat
    * map, OOV micro-nats). Bounded by the model's topV cap — never
    * call on an uncapped vocab at corpus scale.
    */
  def collectModel(lp: DataFrame, oov: DataFrame): (Map[String, Long], Long) = {
    val m = lp.select(col("word"), col("q")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (m, oov.select(col("oovq")).head().getLong(0))
  }
}
