package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SharedRelations, Tables}
import graft.operators.{Binning, Curation, Exact}
import graft.operators.Exact.{roundedRatioSql, roundedRatioSignedSql}

/** Published-playbook corpus-curation gates (SURVEY.md §2 #83–#86)
  * over the `documents` table: C4-style corpus-wide segment dedup,
  * CCNet-style reference-LM perplexity scoring, DSIR hashed-bigram
  * importance weights, and target-mix rebalancing. All four are full
  * SQL-oracle gates — the float-log paths are quantized to micro-nat
  * integers before any aggregation (see [[graft.operators.Curation]]).
  */
object CurationQueries {

  private val SegK = 8
  private val DsirBuckets = 256

  /** LM model-table caps, wired through every LM gate and MIRRORED in
    * each oracle SQL: the unigram vocab keeps its `LmTopV` most
    * frequent words (CCNet's cap), the bigram/trigram conditional
    * tables drop n-grams rarer than `LmMinCount` (Brants et al. 2007
    * count pruning). The gate values are deliberate no-ops at bench
    * scale — the synthetic vocab is tiny — so the oracle hashes are
    * unchanged; at corpus scale they are what bounds the model tables
    * that [[Curation.modelJoin]] then broadcasts-or-shuffles by size.
    */
  private val LmTopV = 1 << 20
  private val LmMinCount = 1L

  /** #83 — corpus-wide segment (line) dedup, first occurrence wins.
    * Bench note (r11, measured): ~0.5 s vs DuckDB's 0.16 s at sf0.1 —
    * the segment explode + first-occurrence window + doc re-aggregate
    * are the minimal 3 stages for the semantics, and the gate is
    * floor-dominated (every stage sub-200 ms of compute); the r7
    * job-count pass already removed the removable jobs. Documented
    * floor. */
  val qLineDedup = GateQuery.sql(
    "q_line_dedup",
    s"""WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sl AS (SELECT doc_id, ${Curation.segmentsSql(SegK)} AS segs FROM tw),
       |sg AS (SELECT doc_id, unnest(range(0, len(segs))) AS i, unnest(segs) AS seg FROM sl),
       |fst AS (SELECT seg, min(doc_id * ${Curation.PosBase} + i) AS first_pos
       |        FROM sg GROUP BY seg),
       |surv AS (SELECT sg.doc_id, sg.i, sg.seg FROM sg JOIN fst USING (seg)
       |         WHERE sg.doc_id * ${Curation.PosBase} + sg.i = fst.first_pos),
       |re AS (SELECT doc_id, count(*) AS n_kept,
       |         md5(string_agg(seg, ' ' ORDER BY i)) AS new_md5
       |       FROM surv GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_segs FROM sg GROUP BY doc_id)
       |SELECT tot.doc_id AS doc_id, n_segs, coalesce(n_kept, 0) AS n_kept,
       |  coalesce(new_md5, md5('')) AS new_md5
       |FROM tot LEFT JOIN re USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.lineDedup(Tables.documents(s, d), SegK)
      .orderedSmall(col("doc_id"))
  }

  private val SubL = 6

  /** Session snapshot of the [[SubL]]-window substring-dedup delete
    * set (doc_id, idx) — the windowed-hash explode + first-occurrence
    * window both q_substr_dedup and q_curation_pipeline's substring
    * rung previously re-ran per gate. Dup-mass-bounded (L rows per
    * non-first duplicated window). */
  private def substrDel(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SharedRelations.snapshot(s, s"sdel$SubL", d)(
      Curation.substrDeleteSet(Tables.documents(s, d), SubL))

  /** #93 — exact substring dedup (Lee et al. 2021): every duplicated
    * L-token span survives only at its corpus-first occurrence.
    */
  val qSubstrDedup = GateQuery.sql(
    "q_substr_dedup",
    s"""WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |wins AS (SELECT doc_id,
       |    unnest(range(1, len(w) - ${SubL - 2})) AS pos,
       |    unnest([${graft.operators.TextOps.shingleKeySql(s"array_to_string(w[i:i+${SubL - 1}], ' ')")}
       |            for i in range(1, len(w) - ${SubL - 2})]) AS h
       |  FROM tw WHERE len(w) >= $SubL),
       |fst AS (SELECT h, min(doc_id * ${Curation.PosBase} + pos) AS fp FROM wins GROUP BY h),
       |del AS (SELECT DISTINCT doc_id, idx FROM (
       |    SELECT w2.doc_id AS doc_id, unnest(range(w2.pos, w2.pos + $SubL)) AS idx
       |    FROM wins w2 JOIN fst USING (h)
       |    WHERE w2.doc_id * ${Curation.PosBase} + w2.pos <> fst.fp)),
       |tok AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS idx, unnest(w) AS word FROM tw),
       |kept AS (SELECT t.doc_id AS doc_id, t.idx AS idx, t.word AS word
       |         FROM tok t ANTI JOIN del d ON t.doc_id = d.doc_id AND t.idx = d.idx),
       |re AS (SELECT doc_id, count(*) AS n_kept,
       |         md5(string_agg(word, ' ' ORDER BY idx)) AS new_md5
       |       FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, len(w) AS n_tokens FROM tw)
       |SELECT tot.doc_id AS doc_id, n_tokens, coalesce(n_kept, 0) AS n_kept,
       |  coalesce(new_md5, md5('')) AS new_md5
       |FROM tot LEFT JOIN re USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
    // the L-window delete set is the corpus-scale stage, shared with
    // q_curation_pipeline's substring rung via a session snapshot
    Curation.substrDedupFromDel(Tables.documents(s, d), substrDel(s, d))
      .orderedSmall(col("doc_id"))
  }

  /** Shared CTE chain of the unigram-LM gates: per-doc token count +
    * micro-nat negative log-likelihood (`sc(doc_id, n_tokens,
    * nll_micro)`).
    */
  private lazy val PplScoredSql =
    s"""toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
       |              FROM documents),
       |ref AS (SELECT word, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY word),
       |st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM ref),
       |refv AS (SELECT word, c FROM ref ORDER BY c DESC, word LIMIT $LmTopV),
       |lp AS (SELECT word, ${Curation.microLnSql("(c + 1.0) / (n + v)")} AS q FROM refv, st),
       |oov AS (SELECT ${Curation.microLnSql("1.0 / (n + v)")} AS oovq FROM st),
       |sc AS (SELECT t.doc_id AS doc_id, count(*) AS n_tokens,
       |         CAST(-sum(coalesce(lp.q, oov.oovq)) AS BIGINT) AS nll_micro
       |       FROM toks t LEFT JOIN lp USING (word), oov GROUP BY t.doc_id)""".stripMargin

  /** Spark mirror of [[PplScoredSql]]'s `sc` relation. Since r13 the
    * tokenized corpus and the en unigram count table come from the
    * session snapshots ([[graft.SharedRelations.docTokens]] /
    * [[graft.SharedRelations.enUnigramCounts]] — the r12 LM-family
    * pattern extended to the perplexity rung): three gates
    * (q_lm_perplexity, q_ppl_buckets, q_minkpct) each re-tokenized
    * and re-counted the same relations before. Values identical —
    * `unigramModelFromCounts` on the snapshot is the same arithmetic
    * as counting inline.
    */
  /** (word, q) Laplace unigram model table (in-plan, from a
    * [[graft.SharedRelations]] count snapshot) plus the matching OOV
    * floor as a session-cached DRIVER LITERAL: consumers previously
    * attached the 1-row oov relation via a cross-join broadcast per
    * gate. The scalar replays microLn(scale·1.0/(n+v)) on the driver
    * — identical IEEE double ops to the in-plan expression, so every
    * consumer's values are unchanged. Keyed by (count table, scale).
    * (Materializing the model TABLE itself to parquet was measured
    * ~0.1 s SLOWER per consumer at the bench point than deriving it
    * in-plan from the count snapshot — the broadcast build off a
    * fresh file scan costs more than the in-plan limit — so the
    * table stays in-plan.)
    */
  private def unigramModelLit(s: org.apache.spark.sql.SparkSession, d: String,
      key: String, counts: DataFrame, scale: Double = 1.0): (DataFrame, Long) = {
    val lp = Curation.unigramModelFromCounts(counts, scale, topV = Some(LmTopV))._1
    val oov = graft.SharedRelations.cachedValue(s"ulmoov:$key:$scale", d) {
      // mirror unigramModelFromCounts' dual-shape handling: derive
      // n/v from the counts when the stats columns are absent, and
      // guard the empty-relation nulls (r13 advice — the bare
      // max(n)/max(v) probe failed analysis on a plain (word, c)
      // table and NPE'd on an empty one)
      val hasStats = counts.columns.contains("n") && counts.columns.contains("v")
      val r =
        if (hasStats) counts.agg(max(col("n")).cast("long"), max(col("v")).cast("long")).head
        else counts.agg(sum(col("c")).cast("long"), count(lit(1)).cast("long")).head
      val nv = (if (r.isNullAt(0)) 0L else r.getLong(0)) +
        (if (r.isNullAt(1)) 0L else r.getLong(1))
      java.lang.Long.valueOf(math.floor(
        math.log(scale * 1.0 / nv) * 1000000).toLong)
    }
    (lp, oov.longValue)
  }

  private def pplScored(s: org.apache.spark.sql.SparkSession, d: String) = {
    val toks = graft.SharedRelations.docTokens(s, d)
      .select(col("doc_id"), explode(col("w")).as("word"))
    val (lp, oovq) = unigramModelLit(s, d, "enug",
      graft.SharedRelations.enUnigramCounts(s, d))
    Curation.modelJoin(toks, lp, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (-sum(coalesce(col("q"), lit(oovq)))).cast("long").as("nll_micro"))
  }

  /** #84 — CCNet-style quality scoring: per-doc average negative
    * log-likelihood (nats, micro-quantized) under a Laplace unigram
    * LM trained on the corpus's own `lang = 'en'` slice.
    */
  val qLmPerplexity = GateQuery.sql(
    "q_lm_perplexity",
    s"""WITH $PplScoredSql
       |SELECT doc_id, n_tokens, nll_micro,
       |  ${roundedRatioSql("nll_micro", "n_tokens * 1000000", 4)} AS avg_nll
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    pplScored(s, d)
      .select(col("doc_id"), col("n_tokens"), col("nll_micro"),
        Exact.roundedRatio(col("nll_micro"), col("n_tokens") * lit(1000000L), 4).as("avg_nll"))
      .orderedSmall(col("doc_id"))
  }

  /** #114 — CCNet head/middle/tail perplexity bucketing (Wenzek et
    * al. 2020 §4.3: the corpus is cut into terciles of LM perplexity;
    * "head" trains, "tail" is usually dropped). Thresholds are VALUE
    * cutoffs from a milli-nat histogram of the per-doc average NLL —
    * the histogram relation is bounded by the value range (≤ tens of
    * thousands of distinct milli-nat keys), never by corpus size, so
    * the cumulative window that finds the two cutoffs is scale-safe
    * where a global per-doc ntile would single-task-sort the corpus.
    * Docs AT a cutoff land in the lower bucket on both engines (≤
    * comparisons over exact integers).
    */
  val qPplBuckets = GateQuery.sql(
    "q_ppl_buckets",
    s"""WITH $PplScoredSql,
       |b AS (SELECT doc_id, n_tokens, nll_micro,
       |        CAST(floor(CAST(nll_micro AS DOUBLE) / n_tokens) AS BIGINT) // 1000 AS mk
       |      FROM sc),
       |pv AS (SELECT mk, count(*) AS c FROM b GROUP BY 1),
       |cw AS (SELECT mk, sum(c) OVER (ORDER BY mk) AS cum FROM pv),
       |nn AS (SELECT count(*) AS nd FROM b),
       |th AS (SELECT min(CASE WHEN cum * 3 >= nd THEN mk END) AS t1,
       |              min(CASE WHEN cum * 3 >= 2 * nd THEN mk END) AS t2
       |       FROM cw, nn)
       |SELECT doc_id, n_tokens, nll_micro,
       |  CASE WHEN mk <= t1 THEN 'head' WHEN mk <= t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM b, th ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // the scored relation (one narrow row per doc) feeds the histogram,
    // the doc count AND the final bucket join — cache it so the whole
    // unigram-LM scoring pipeline runs once, not three times
    val b = pplScored(s, d).select(col("doc_id"), col("n_tokens"), col("nll_micro"),
      (floor(col("nll_micro").cast("double") / col("n_tokens")).cast("long") / lit(1000L))
        .cast("long").as("mk")).persist()
    val pv = b.groupBy(col("mk")).agg(count(lit(1)).as("c"))
    val cw = pv.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("mk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val th = Curation.withStats(cw, b.agg(count(lit(1)).as("nd")))
      .agg(min(when(col("cum") * 3 >= col("nd"), col("mk"))).as("t1"),
        min(when(col("cum") * 3 >= lit(2) * col("nd"), col("mk"))).as("t2"))
    Curation.withStats(b, th)
      .select(col("doc_id"), col("n_tokens"), col("nll_micro"),
        when(col("mk") <= col("t1"), lit("head"))
          .when(col("mk") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderedSmall(col("doc_id"))
  }

  /** #94 — stupid-backoff bigram LM scoring: tokens 2..n of every doc
    * scored by P(w_i | w_{i-1}) from the `en`-slice bigram model,
    * backing off to 0.4·unigram (Laplace) for unseen bigrams, then to
    * the 0.4·OOV floor. Micro-nat integer sums throughout.
    *
    * Wall-clock note (r12): model inputs ride the
    * [[graft.SharedRelations]] snapshots (tokens + pre-normalized
    * counts — the r12 structural pass that took the LM family down
    * 25-30%); what remains (~0.75 s sf0.1, ~11 jobs) is the scoring
    * pass itself — corpus-scale bigram explode, two model joins, one
    * doc aggregate — where each AQE stage bills the local job floor
    * DuckDB's in-process pipeline doesn't pay. The joins are
    * size-switched ([[Curation.modelJoin]]); no stage's work grows
    * faster than corpus × model-lookup at 100 TB.
    */
  val qLmBigram = GateQuery.sql(
    "q_lm_bigram",
    s"""WITH tw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |bi AS (SELECT doc_id, lang,
       |         unnest([w[i] for i in range(1, len(w))]) AS w1,
       |         unnest([w[i+1] for i in range(1, len(w))]) AS w2
       |       FROM tw WHERE len(w) >= 2),
       |cb AS (SELECT w1, w2, count(*) AS cb FROM bi WHERE lang = 'en' GROUP BY w1, w2),
       |cw AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1 FROM cb GROUP BY w1),
       |qb AS (SELECT w1, w2, ${Curation.microLnSql("cb / cw1")} AS qb
       |       FROM cb JOIN cw USING (w1) WHERE cb >= $LmMinCount),
       |toks AS (SELECT lang, unnest(w) AS word FROM tw),
       |ref AS (SELECT word, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY word),
       |st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM ref),
       |refv AS (SELECT word, c FROM ref ORDER BY c DESC, word LIMIT $LmTopV),
       |qu AS (SELECT word, ${Curation.microLnSql("0.4 * (c + 1.0) / (n + v)")} AS qu
       |       FROM refv, st),
       |oov AS (SELECT ${Curation.microLnSql("0.4 * 1.0 / (n + v)")} AS oovq FROM st),
       |sc AS (SELECT bi.doc_id AS doc_id, count(*) AS n_scored,
       |         CAST(-sum(coalesce(qb.qb, qu.qu, oov.oovq)) AS BIGINT) AS nll_micro
       |       FROM bi LEFT JOIN qb ON bi.w1 = qb.w1 AND bi.w2 = qb.w2
       |               LEFT JOIN qu ON bi.w2 = qu.word, oov
       |       GROUP BY bi.doc_id)
       |SELECT doc_id, n_scored, nll_micro,
       |  ${roundedRatioSql("nll_micro", "n_scored * 1000000", 4)} AS avg_nll
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    // model inputs ride the session-materialized snapshots (r12):
    // the tokenized corpus and the en-slice count tables build once
    // per (dir), every LM rung reads the columnar snapshot
    val tw = SharedRelations.docTokens(s, d)
    val bi = SharedRelations.bigramInstances(tw, "doc_id")
    val qb = Curation.bigramLogProbsFromCounts(
      SharedRelations.enBigramCounts(s, d).withColumnRenamed("c", "cb"),
      minCount = LmMinCount)
    val (qu, oovq) = unigramModelLit(s, d, "enug",
      SharedRelations.enUnigramCounts(s, d), scale = 0.4)
    val scored = Curation.modelJoin(
        Curation.modelJoin(
          bi,
          qb, Seq("w1", "w2")),
        qu.select(col("word").as("w2"), col("q").as("qu")), Seq("w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        (-sum(coalesce(col("qb"), col("qu"), lit(oovq)))).cast("long").as("nll_micro"))
    scored
      .select(col("doc_id"), col("n_scored"), col("nll_micro"),
        Exact.roundedRatio(col("nll_micro"), col("n_scored") * lit(1000000L), 4).as("avg_nll"))
      .orderedSmall(col("doc_id"))
  }

  /** #123 — interpolated Kneser–Ney bigram LM (Chen & Goodman 1999
    * §2.7): the proper-probability smoothing the stupid-backoff
    * family approximates. Per bigram instance, the full interpolated
    * probability (absolute discount D = 0.75, continuation-count
    * backoff) is evaluated as ONE double expression whose association
    * the oracle mirrors verbatim, micro-ln-quantized per instance and
    * summed exactly. Unseen-predecessor probes fall to the pure
    * continuation distribution; unseen-successor probes to the
    * 1/(n1pp+1) floor — never ln(0). Model tables ride
    * [[Curation.modelJoin]]'s size-switched joins; the per-bigram
    * table takes the `LmMinCount` Brants prune (pruned probes
    * interpolate from c = 0, mass intact).
    *
    * Wall-clock note (r12): all four KN tables are scan+project off
    * the pre-normalized [[graft.SharedRelations]] bigram snapshots;
    * the residual ~0.7 s / 12 jobs at sf0.1 is the three scoring
    * joins + doc aggregate billing local job floors (DuckDB ~0.2 s
    * in-process) — see the q_lm_bigram note.
    */
  val qLmKn = GateQuery.sql(
    "q_lm_kn",
    s"""WITH tw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |bi AS (SELECT doc_id, lang,
       |         unnest([w[i] for i in range(1, len(w))]) AS w1,
       |         unnest([w[i+1] for i in range(1, len(w))]) AS w2
       |       FROM tw WHERE len(w) >= 2),
       |kb0 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bi
       |        WHERE lang = 'en' GROUP BY 1, 2),
       |kw AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
       |          CAST(count(*) AS BIGINT) AS n1p FROM kb0 GROUP BY 1),
       |kc AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1m FROM kb0 GROUP BY 1),
       |kt AS (SELECT CAST(count(*) AS BIGINT) AS n1pp FROM kb0),
       |kb AS (SELECT * FROM kb0 WHERE c >= $LmMinCount),
       |pr AS (SELECT bi.doc_id AS doc_id,
       |    CASE WHEN kc.n1m IS NOT NULL AND kw.cw1 IS NOT NULL THEN
       |        (greatest(CAST(coalesce(kb.c, 0) AS DOUBLE) - 0.75, 0.0)
       |          + 0.75 * kw.n1p * (CAST(kc.n1m AS DOUBLE) / kt.n1pp)) / kw.cw1
       |      WHEN kc.n1m IS NOT NULL THEN CAST(kc.n1m AS DOUBLE) / kt.n1pp
       |      ELSE 1.0 / (kt.n1pp + 1) END AS p
       |  FROM bi LEFT JOIN kb ON bi.w1 = kb.w1 AND bi.w2 = kb.w2
       |          LEFT JOIN kw ON bi.w1 = kw.w1
       |          LEFT JOIN kc ON bi.w2 = kc.w2, kt),
       |sc AS (SELECT doc_id, count(*) AS n_scored,
       |         CAST(-sum(${Curation.microLnSql("p")}) AS BIGINT) AS kn_micro
       |       FROM pr GROUP BY doc_id)
       |SELECT doc_id, n_scored, kn_micro,
       |  ${roundedRatioSql("kn_micro", "n_scored * 1000000", 4)} AS avg_kn
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    // session-materialized token + count snapshots (r12, see
    // qLmBigram): all four KN tables derive from the shared en-slice
    // bigram-count relation, no corpus re-scan per table
    val tw = SharedRelations.docTokens(s, d)
    val bi = SharedRelations.bigramInstances(tw, "doc_id")
    val cbn = SharedRelations.enBigramCounts(s, d)
    val kb = cbn.filter(col("c") >= LmMinCount).select(col("w1"), col("w2"), col("c"))
    val kw = SharedRelations.enBigramW1(s, d)
    val kc = SharedRelations.enBigramW2(s, d)
    val kt = cbn.agg(count(lit(1)).as("n1pp"))
    val joined = Curation.modelJoin(
      Curation.modelJoin(
        Curation.modelJoin(
          Curation.withStats(bi, kt), kb, Seq("w1", "w2")),
        kw, Seq("w1")),
      kc.select(col("w2"), col("n1m")), Seq("w2"))
    // association mirrored verbatim by the oracle's CASE expression
    val p = when(col("n1m").isNotNull && col("cw1").isNotNull,
        (greatest(coalesce(col("c"), lit(0L)).cast("double") - lit(0.75), lit(0.0))
          + lit(0.75) * col("n1p") * (col("n1m").cast("double") / col("n1pp")))
          / col("cw1"))
      .when(col("n1m").isNotNull, col("n1m").cast("double") / col("n1pp"))
      .otherwise(lit(1.0) / (col("n1pp") + lit(1)))
    joined
      .select(col("doc_id"), Curation.microLn(p).as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        (-sum(col("q"))).cast("long").as("kn_micro"))
      .select(col("doc_id"), col("n_scored"), col("kn_micro"),
        Exact.roundedRatio(col("kn_micro"), col("n_scored") * lit(1000000L), 4).as("avg_kn"))
      .orderedSmall(col("doc_id"))
  }

  /** #102 — trigram stupid-backoff LM: tokens 3..n scored by
    * P(w₃ | w₁w₂) from the `en` slice, backing off to 0.4·bigram,
    * then 0.4²·unigram/OOV; each rung's scale folds into its own
    * quantized model table.
    *
    * Wall-clock note (r12): every rung's model is scan+project off a
    * pre-normalized [[graft.SharedRelations]] snapshot (r11's 1.42 s
    * → 1.06 s); the residual ~13 jobs are the trigram scoring
    * explode + three rung joins + doc aggregate, each billing the
    * local job floor vs DuckDB's ~0.3 s in-process run of the same
    * joins — see the q_lm_bigram note.
    */
  val qLmTrigram = GateQuery.sql(
    "q_lm_trigram",
    s"""WITH tw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |tri AS (SELECT doc_id, lang,
       |         unnest([w[i] for i in range(1, len(w) - 1)]) AS w1,
       |         unnest([w[i+1] for i in range(1, len(w) - 1)]) AS w2,
       |         unnest([w[i+2] for i in range(1, len(w) - 1)]) AS w3
       |       FROM tw WHERE len(w) >= 3),
       |bi AS (SELECT lang,
       |         unnest([w[i] for i in range(1, len(w))]) AS w1,
       |         unnest([w[i+1] for i in range(1, len(w))]) AS w2
       |       FROM tw WHERE len(w) >= 2),
       |c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri WHERE lang = 'en' GROUP BY w1, w2, w3),
       |c12 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c12 FROM c3 GROUP BY w1, w2),
       |qt AS (SELECT w1, w2, w3, ${Curation.microLnSql("c3 / c12")} AS qt
       |       FROM c3 JOIN c12 USING (w1, w2) WHERE c3 >= $LmMinCount),
       |cb AS (SELECT w1, w2, count(*) AS cb FROM bi WHERE lang = 'en' GROUP BY w1, w2),
       |cw AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1 FROM cb GROUP BY w1),
       |qb AS (SELECT w1, w2, ${Curation.microLnSql("0.4 * cb / cw1")} AS qb
       |       FROM cb JOIN cw USING (w1) WHERE cb >= $LmMinCount),
       |toks AS (SELECT lang, unnest(w) AS word FROM tw),
       |ref AS (SELECT word, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY word),
       |st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM ref),
       |refv AS (SELECT word, c FROM ref ORDER BY c DESC, word LIMIT $LmTopV),
       |qu AS (SELECT word, ${Curation.microLnSql("0.16000000000000003 * (c + 1.0) / (n + v)")} AS qu
       |       FROM refv, st),
       |oov AS (SELECT ${Curation.microLnSql("0.16000000000000003 * 1.0 / (n + v)")} AS oovq FROM st),
       |sc AS (SELECT tri.doc_id AS doc_id, count(*) AS n_scored,
       |         CAST(-sum(coalesce(qt.qt, qb.qb, qu.qu, oov.oovq)) AS BIGINT) AS nll_micro
       |       FROM tri LEFT JOIN qt ON tri.w1 = qt.w1 AND tri.w2 = qt.w2 AND tri.w3 = qt.w3
       |               LEFT JOIN qb ON tri.w2 = qb.w1 AND tri.w3 = qb.w2
       |               LEFT JOIN qu ON tri.w3 = qu.word, oov
       |       GROUP BY tri.doc_id)
       |SELECT doc_id, n_scored, nll_micro,
       |  ${roundedRatioSql("nll_micro", "n_scored * 1000000", 4)} AS avg_nll
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    // All three model rungs ride the session-materialized count
    // snapshots (r12) — what DuckDB's shared `tw` CTE approximates
    // within one query, done ACROSS queries and sessions: the
    // trigram/bigram/unigram count tables build once per (dir) and
    // each rung reads its columnar snapshot. Only the scoring
    // instances (doc-keyed trigram explode) still touch the corpus.
    val tw = SharedRelations.docTokens(s, d)
    val tri = SharedRelations.trigramInstances(tw, "doc_id")
    val qt = Curation.trigramLogProbsFromCounts(
      SharedRelations.enTrigramCounts(s, d), minCount = LmMinCount)
    val qb = Curation.bigramLogProbsFromCounts(
      SharedRelations.enBigramCounts(s, d).withColumnRenamed("c", "cb"),
      scale = 0.4, minCount = LmMinCount)
    val (qu, oovq) = unigramModelLit(s, d, "enug",
      SharedRelations.enUnigramCounts(s, d), scale = 0.4 * 0.4)
    val scored = Curation.modelJoin(
        Curation.modelJoin(
          Curation.modelJoin(
            tri,
            qt, Seq("w1", "w2", "w3")),
          qb.select(col("w1").as("w2"), col("w2").as("w3"), col("qb")), Seq("w2", "w3")),
        qu.select(col("word").as("w3"), col("q").as("qu")), Seq("w3"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        (-sum(coalesce(col("qt"), col("qb"), col("qu"), lit(oovq))))
          .cast("long").as("nll_micro"))
    scored
      .select(col("doc_id"), col("n_scored"), col("nll_micro"),
        Exact.roundedRatio(col("nll_micro"), col("n_scored") * lit(1000000L), 4).as("avg_nll"))
      .orderedSmall(col("doc_id"))
  }

  /** #103 — FIM preprocessing: deterministic (prefix, middle, suffix)
    * splits with a ~50% SPM flag, hash-derived so reruns and the
    * oracle agree row-for-row.
    */
  val qFimSplit = GateQuery.sql(
    "q_fim_split", {
      def cutSql(p: String) =
        s"(${graft.operators.TextOps.baseHashSql(s"'$p:' || CAST(doc_id AS VARCHAR)")} % (len(w) - 1)) + 1"
      s"""WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |f AS (SELECT doc_id, w,
         |        least(${cutSql("fim1")}, ${cutSql("fim2")}) AS p1,
         |        greatest(${cutSql("fim1")}, ${cutSql("fim2")}) AS p2,
         |        (${graft.operators.TextOps.baseHashSql("'fimo:' || CAST(doc_id AS VARCHAR)")} % 10) < 5 AS spm
         |      FROM tw WHERE len(w) >= 3)
         |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, p1, p2, spm,
         |  md5(array_to_string(w[1:p1], ' ')) AS prefix_md5,
         |  md5(coalesce(array_to_string(w[p1+1:p2], ' '), '')) AS middle_md5,
         |  md5(array_to_string(w[p2+1:len(w)], ' ')) AS suffix_md5
         |FROM f ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    Curation.fimSplit(Tables.documents(s, d))
      .orderedSmall(col("doc_id"))
  }

  /** #85 — DSIR importance weights: per-doc sum of hashed-bigram
    * log-ratios between the `lang = 'en'` target distribution and the
    * raw corpus distribution (micro-nats; positive = target-like).
    */
  val qDsirWeights = GateQuery.sql(
    "q_dsir_weights",
    s"""WITH tw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |bg AS (SELECT doc_id, lang, unnest(${Curation.bigramBucketsSql(DsirBuckets)}) AS b FROM tw),
       |cb AS (SELECT b, count(*) AS cr, count(*) FILTER (WHERE lang = 'en') AS ct
       |       FROM bg GROUP BY b),
       |st AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM cb),
       |lr AS (SELECT b, CAST(floor((ln((ct + 1.0) / (nt + $DsirBuckets))
       |                            - ln((cr + 1.0) / (nr + $DsirBuckets))) * 1000000) AS BIGINT) AS q
       |       FROM cb, st),
       |sc AS (SELECT doc_id, count(*) AS n_feat, CAST(sum(q) AS BIGINT) AS w_micro
       |       FROM bg JOIN lr USING (b) GROUP BY doc_id)
       |SELECT doc_id, n_feat, w_micro,
       |  ${roundedRatioSignedSql("w_micro", "n_feat * 1000000", 4)} AS avg_lr
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.dsirWeights(Tables.documents(s, d), DsirBuckets)
      .select(col("doc_id"), col("n_feat"), col("w_micro"),
        Exact.roundedRatioSigned(col("w_micro"), col("n_feat") * lit(1000000L), 4).as("avg_lr"))
      .orderedSmall(col("doc_id"))
  }

  private val DsirK = 100

  /** #95 — DSIR resampling: Gumbel-top-k over the importance weights
    * (sample-without-replacement ∝ exp(w), deterministic portable
    * noise), keeping the K most target-like docs. Measured floor
    * (r13, sf0.1): 6 jobs ≈ 0.6 s of the ~0.7-0.8 s wall — the
    * weight pipeline (bigram explode + bucket aggregate + per-doc
    * score join) plus the TakeOrdered stage under AQE; DuckDB runs
    * the same SQL ~0.3 s in-process, so the >2× ratio is
    * multi-stage job floors over near-floor compute, flat in corpus
    * size (the per-doc relation never sorts globally — Gumbel keys
    * TakeOrdered to K).
    */
  val qDsirSelect = GateQuery.sql(
    "q_dsir_select",
    s"""WITH tw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |bg AS (SELECT doc_id, lang, unnest(${Curation.bigramBucketsSql(DsirBuckets)}) AS b FROM tw),
       |cb AS (SELECT b, count(*) AS cr, count(*) FILTER (WHERE lang = 'en') AS ct
       |       FROM bg GROUP BY b),
       |st AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM cb),
       |lr AS (SELECT b, CAST(floor((ln((ct + 1.0) / (nt + $DsirBuckets))
       |                            - ln((cr + 1.0) / (nr + $DsirBuckets))) * 1000000) AS BIGINT) AS q
       |       FROM cb, st),
       |sc AS (SELECT doc_id, CAST(sum(q) AS BIGINT) AS w_micro
       |       FROM bg JOIN lr USING (b) GROUP BY doc_id)
       |SELECT doc_id, w_micro,
       |  ${Curation.gumbelScoreSql("doc_id", "w_micro")} AS s_micro
       |FROM sc ORDER BY s_micro DESC, doc_id LIMIT $DsirK""".stripMargin) { (s, d) =>
    Curation.dsirWeights(Tables.documents(s, d), DsirBuckets)
      .select(col("doc_id"), col("w_micro"),
        Curation.gumbelScore(col("doc_id"), col("w_micro")).as("s_micro"))
      .orderBy(col("s_micro").desc, col("doc_id"))
      .limit(DsirK)
  }

  /** #86 — source-mix rebalancing: uniform-mix sampling rates within
    * a 60% budget, applied with the portable hash predicate; reports
    * per-source before/after.
    */
  val qMixRebalance = GateQuery.sql(
    "q_mix_rebalance",
    s"""WITH cnt AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
       |st AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS n_src FROM cnt),
       |rt AS (SELECT source, n_docs,
       |         least(10000, (total * 60 // 100 // n_src) * 10000 // n_docs) AS rate_bp
       |       FROM cnt, st),
       |sel AS (SELECT d.source AS source, count(*) AS n_kept,
       |          CAST(sum(n_chars) AS BIGINT) AS kept_chars
       |        FROM documents d JOIN rt USING (source)
       |        WHERE ${Curation.mixKeepSql("doc_id", "rate_bp")}
       |        GROUP BY d.source)
       |SELECT rt.source AS source, n_docs AS n_before, rate_bp,
       |  coalesce(n_kept, 0) AS n_kept, coalesce(kept_chars, 0) AS kept_chars
       |FROM rt LEFT JOIN sel USING (source) ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val rt = Curation.mixRates(counts, budgetPct = 60)
    val sel = docs.join(broadcast(rt), "source")
      .filter(Curation.mixKeep(col("doc_id"), col("rate_bp")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).cast("long").as("kept_chars"))
    rt.join(sel, Seq("source"), "left")
      .select(col("source"), col("n_docs").as("n_before"), col("rate_bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"))
      .orderedSmall(col("source"))
  }

  /** #96 — discriminative quality classifier (GPT-3/LLaMA playbook):
    * logistic regression over hashed-bigram features separating the
    * `en` reference slice from the rest, scores for every doc.
    * Hash-checked SQL since r10: training is the micro-quantized GD
    * of [[graft.operators.QualityClassifier]] — margins are exact
    * integer sums, residuals micro-floor after one mirrored sigmoid,
    * and the weight update is one mirrored double rounding — so the
    * 8 iterations UNROLL to margin→residual→gradient→weights CTE
    * quadruples (the Lloyd-CTE recipe; exp parity rides the
    * q_dsir_weights ln precedent). Scoring is the plain final-weight
    * join.
    */
  val qQualityClassifier = GateQuery.sql(
    "q_quality_classifier", {
      val iters = (1 to 8).map { i =>
        val wp = s"w${i - 1}"
        s"""m$i AS MATERIALIZED (SELECT bg.doc_id, any_value(bg.label) AS label,
           |    CAST(sum(w.wt) AS BIGINT) AS m
           |  FROM bg JOIN $wp w USING (b) GROUP BY bg.doc_id),
           |r$i AS MATERIALIZED (SELECT doc_id,
           |    CAST(floor((1.0 / (1.0 + exp((-(m)) / 1000000.0)) - label)
           |      * 1000000) AS BIGINT) AS r
           |  FROM m$i),
           |g$i AS MATERIALIZED (SELECT bg.b, CAST(sum(r$i.r) AS BIGINT) AS g
           |  FROM bg JOIN r$i USING (doc_id) GROUP BY bg.b),
           |w$i AS MATERIALIZED (SELECT w.b, w.wt - CAST(floor((0.5 * ((CAST(g.g AS DOUBLE)
           |      / 1000000.0) / (SELECT nd FROM nd))) * 1000000.0 + 0.5) AS BIGINT)
           |    AS wt
           |  FROM $wp w JOIN g$i g USING (b))""".stripMargin
      }.mkString(",\n")
      s"""WITH tw AS (SELECT doc_id, (lang = 'en')::INT AS label,
         |    string_split(text, ' ') AS w FROM documents),
         |bg AS MATERIALIZED (SELECT doc_id, label,
         |    unnest(${Curation.bigramBucketsSql(DsirBuckets)}) AS b
         |  FROM tw WHERE len(w) >= 2),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM bg),
         |w0 AS MATERIALIZED (SELECT DISTINCT b, CAST(0 AS BIGINT) AS wt FROM bg),
         |$iters
         |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_feat,
         |  CAST(sum(w.wt) AS BIGINT) AS score_micro
         |FROM bg JOIN w8 w USING (b)
         |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin
    }) { (s, d) =>
    import graft.operators.QualityClassifier
    val docs = Tables.documents(s, d)
    val feat = QualityClassifier.features(docs, col("lang") === "en", DsirBuckets)
      .persist()
    try {
      val w = QualityClassifier.train(feat, DsirBuckets, iters = 8, lr = 0.5)
      QualityClassifier.score(feat, w)
        .select(col("doc_id"), col("n_feat"), col("score_micro"))
        .orderedSmall(col("doc_id"))
    } finally feat.unpersist()
  }

  /** Keep a doc when at least half its tokens survive substring
    * dedup, in exact integer arithmetic. */
  private val SubstrKeepPct = 50

  /** LM-quality ceiling: average NLL ≤ 3.404 nats under the
    * `en`-slice unigram LM (micro-nat integer compare — no float
    * thresholds). The driver corpus's NLLs sit in a tight 3.36–3.99
    * band, so this cuts roughly the worse-scoring half — the stage
    * must actually FILTER for the gate to prove anything.
    */
  private val MaxAvgNllMicro = 3404000L

  /** #101 — the composed published-playbook funnel, v2: exact dedup
    * (first doc per content hash) → substring-dedup survival (≥50%
    * of tokens kept) → reference-LM quality ceiling, reported as
    * staged per-source counts. One gate proves the three signals
    * compose identically cross-engine.
    */
  val qCurationPipeline = GateQuery.sql(
    "q_curation_pipeline",
    s"""WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |ex AS (SELECT doc_id,
       |         doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep_exact
       |       FROM documents),
       |wins AS (SELECT doc_id,
       |    unnest(range(1, len(w) - ${SubL - 2})) AS pos,
       |    unnest([${graft.operators.TextOps.shingleKeySql(s"array_to_string(w[i:i+${SubL - 1}], ' ')")}
       |            for i in range(1, len(w) - ${SubL - 2})]) AS h
       |  FROM tw WHERE len(w) >= $SubL),
       |fst AS (SELECT h, min(doc_id * ${Curation.PosBase} + pos) AS fp FROM wins GROUP BY h),
       |del AS (SELECT DISTINCT doc_id, idx FROM (
       |    SELECT w2.doc_id AS doc_id, unnest(range(w2.pos, w2.pos + $SubL)) AS idx
       |    FROM wins w2 JOIN fst USING (h)
       |    WHERE w2.doc_id * ${Curation.PosBase} + w2.pos <> fst.fp)),
       |sub AS (SELECT tw.doc_id AS doc_id,
       |         (len(w) - coalesce(dd.n_del, 0)) * 100 >= len(w) * $SubstrKeepPct AS keep_substr
       |       FROM tw LEFT JOIN (SELECT doc_id, count(*) AS n_del FROM del GROUP BY doc_id) dd
       |         USING (doc_id)),
       |toks AS (SELECT doc_id, lang, unnest(w) AS word FROM
       |         (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)),
       |ref AS (SELECT word, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY word),
       |st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM ref),
       |refv AS (SELECT word, c FROM ref ORDER BY c DESC, word LIMIT $LmTopV),
       |lp AS (SELECT word, ${Curation.microLnSql("(c + 1.0) / (n + v)")} AS q FROM refv, st),
       |oov AS (SELECT ${Curation.microLnSql("1.0 / (n + v)")} AS oovq FROM st),
       |lm AS (SELECT t.doc_id AS doc_id,
       |         CAST(-sum(coalesce(lp.q, oov.oovq)) AS BIGINT) <= count(*) * $MaxAvgNllMicro AS lm_ok
       |       FROM toks t LEFT JOIN lp USING (word), oov GROUP BY t.doc_id)
       |SELECT d.source AS source, count(*) AS n_total,
       |  CAST(count(*) FILTER (WHERE keep_exact) AS BIGINT) AS n_exact,
       |  CAST(count(*) FILTER (WHERE keep_exact AND keep_substr) AS BIGINT) AS n_substr,
       |  CAST(count(*) FILTER (WHERE keep_exact AND keep_substr AND lm_ok) AS BIGINT) AS n_final
       |FROM documents d JOIN ex USING (doc_id) JOIN sub USING (doc_id) JOIN lm USING (doc_id)
       |GROUP BY d.source ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val ex = docs.select(col("doc_id"),
      (col("doc_id") === min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .as("keep_exact"))
    // substring rung off the shared delete-set snapshot (q_substr_dedup
    // builds the same set); LM rung off the shared perplexity scorer
    // (q_lm_perplexity / q_ppl_buckets / q_minkpct) — identical
    // arithmetic, the corpus-scale window/tokenize/count stages run
    // once per session instead of once per gate
    val sub = Curation.substrDedupStatsFromDel(docs, substrDel(s, d))
      .select(col("doc_id"),
        (col("n_kept") * 100 >= col("n_tokens") * SubstrKeepPct).as("keep_substr"))
    val lm = pplScored(s, d)
      .select(col("doc_id"),
        (col("nll_micro") <= col("n_tokens") * lit(MaxAvgNllMicro)).as("lm_ok"))
    docs.select(col("doc_id"), col("source"))
      .join(ex, "doc_id").join(sub, "doc_id").join(lm, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("keep_exact"), lit(1))).as("n_exact"),
        count(when(col("keep_exact") && col("keep_substr"), lit(1))).as("n_substr"),
        count(when(col("keep_exact") && col("keep_substr") && col("lm_ok"), lit(1)))
          .as("n_final"))
      .orderedSmall(col("source"))
  }

  /** #116 — per-domain document cap (RefinedWeb's anti-domination
    * rule: no source/domain may contribute more than K docs). The
    * selection key is a portable hash of the doc id — an unbiased
    * deterministic "random" K per domain, where ordering by crawl/id
    * would bias toward early documents. Scale shape: the top-K runs
    * through the salted two-phase window ([[graft.operators.Relational.topKPerGroupSalted]]),
    * so one viral domain with billions of rows never lands on a
    * single task; K rows per salt bucket survive phase 1, and phase 2
    * ranks K·buckets rows per domain.
    */
  val qDomainCap = GateQuery.sql(
    "q_domain_cap",
    s"""WITH r AS (SELECT doc_id, source,
       |    ${graft.operators.TextOps.baseHashSql("'cap:' || doc_id")} AS _r
       |  FROM documents),
       |k AS (SELECT doc_id, source,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY _r, doc_id) AS BIGINT) AS rnk
       |  FROM r)
       |SELECT source, doc_id, rnk FROM k WHERE rnk <= 15
       |ORDER BY source, rnk""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      graft.operators.TextOps.baseHash(
        concat(lit("cap:"), col("doc_id").cast("string"))).as("_r"))
    graft.operators.Relational.topKPerGroupSalted(docs, Seq(col("source")),
        Seq(col("_r"), col("doc_id")), 15, col("doc_id"))
      .select(col("source"), col("doc_id"), col("rnk"))
      .orderedSmall(col("source"), col("rnk"))
  }

  /** #122 — robust (median/MAD) length-outlier detection per source:
    * docs whose token count sits more than 3 MADs from their source's
    * median — the robust-statistics form of the length filters every
    * curation pipeline runs (mean/stddev break on the heavy-tailed
    * length distributions of web text; median/MAD do not).
    *
    * Scale shape: BOTH order statistics come from per-(source, length)
    * VALUE histograms — the cumulative windows run over value-bounded
    * relations (distinct lengths per source), never per-doc sorts; the
    * 1-row-per-source median/MAD tables broadcast back. Lower-median
    * semantics (smallest value with cum·2 ≥ n) keep everything exact
    * integers on both engines.
    */
  val qMadOutliers = GateQuery.sql(
    "q_mad_outliers",
    """WITH d AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS L
      |           FROM documents),
      |pv AS (SELECT source, L, count(*) AS c FROM d GROUP BY 1, 2),
      |cw AS (SELECT source, L, sum(c) OVER (PARTITION BY source ORDER BY L) AS cum,
      |          sum(c) OVER (PARTITION BY source) AS n FROM pv),
      |med AS (SELECT source, min(CASE WHEN cum * 2 >= n THEN L END) AS med FROM cw GROUP BY source),
      |dev AS (SELECT d.doc_id, d.source, d.L, abs(d.L - med) AS dv, med
      |        FROM d JOIN med USING (source)),
      |pv2 AS (SELECT source, dv, count(*) AS c FROM dev GROUP BY 1, 2),
      |cw2 AS (SELECT source, dv, sum(c) OVER (PARTITION BY source ORDER BY dv) AS cum,
      |          sum(c) OVER (PARTITION BY source) AS n FROM pv2),
      |mad AS (SELECT source, min(CASE WHEN cum * 2 >= n THEN dv END) AS mad FROM cw2 GROUP BY source)
      |SELECT doc_id, source, L AS n_tokens, med, mad
      |FROM dev JOIN mad USING (source) WHERE dv > 3 * mad
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    def lowerMedian(rel: org.apache.spark.sql.DataFrame, v: String, out: String) = {
      val pv = rel.groupBy(col("source"), col(v)).agg(count(lit(1)).as("c"))
      val bySrc = Window.partitionBy(col("source"))
      val cum = Window.partitionBy(col("source")).orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pv.withColumn("cum", sum(col("c")).over(cum))
        .withColumn("n", sum(col("c")).over(bySrc))
        .groupBy(col("source"))
        .agg(min(when(col("cum") * 2 >= col("n"), col(v))).as(out))
    }
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("L"))
    val dev = docs.join(broadcast(lowerMedian(docs, "L", "med")), Seq("source"))
      .withColumn("dv", abs(col("L") - col("med")))
    dev.join(broadcast(lowerMedian(dev, "dv", "mad")), Seq("source"))
      .filter(col("dv") > lit(3) * col("mad"))
      .select(col("doc_id"), col("source"), col("L").as("n_tokens"),
        col("med"), col("mad"))
      .orderedSmall(col("doc_id"))
  }

  /** #133 — temperature-scaled source mixing (the multilingual/
    * multi-source sampling rule of Lample & Conneau 2019 §3.1 and T5:
    * sample source s with probability ∝ p_s^τ, τ < 1 upsampling the
    * tail). τ = 0.5, so the reweighted mass is sqrt(p_s) — written
    * with `sqrt` only (correctly rounded per IEEE in every engine)
    * and micro-quantized BEFORE the cross-source normalization sum,
    * which therefore sums exact integers: bit-stable across engines
    * and summation orders where a double Σ sqrt would not be. All
    * relations after the per-source count are scalar-sized (one row
    * per source); `target_docs` allocates a 60% budget by exact floor
    * division.
    */
  val qMixTemperature = GateQuery.sql(
    "q_mix_temperature",
    s"""WITH cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |             FROM documents GROUP BY source),
       |st AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM cnt),
       |wm AS (SELECT source, n_docs, total,
       |         CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / total) * 1000000.0) AS BIGINT) AS w_micro
       |       FROM cnt, st),
       |sw AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w_sum FROM wm)
       |SELECT source, n_docs, w_micro,
       |  ${roundedRatioSql("w_micro", "w_sum", 4)} AS share,
       |  total * 60 // 100 * w_micro // w_sum AS target_docs
       |FROM wm, sw ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val cnt = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val st = cnt.agg(sum(col("n_docs")).cast("long").as("total"))
    val wm = Curation.withStats(cnt, st)
      .withColumn("w_micro",
        floor(sqrt(col("n_docs").cast("double") / col("total")) * lit(1000000.0)).cast("long"))
    val sw = wm.agg(sum(col("w_micro")).cast("long").as("w_sum"))
    Curation.withStats(wm, sw)
      .select(col("source"), col("n_docs"), col("w_micro"),
        Exact.roundedRatio(col("w_micro"), col("w_sum"), 4).as("share"),
        graft.operators.Binning.floorDivCol(
          graft.operators.Binning.floorDivCol(col("total") * lit(60L), lit(100L)) * col("w_micro"),
          col("w_sum")).as("target_docs"))
      .orderedSmall(col("source"))
  }

  /** #137 — lexical-diversity diagnostics per source: type-token
    * ratio, vocabulary size and hapax share — the corpus-audit
    * numbers a curation report prints next to its filters (template/
    * boilerplate-heavy sources show depressed TTR). One (source,
    * word)-keyed aggregate; exact integer counts throughout.
    */
  val qTtr = GateQuery.sql(
    "q_ttr",
    s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS word
       |              FROM documents),
       |sw AS (SELECT source, word, count(*) AS c FROM toks GROUP BY source, word)
       |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
       |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       |  ${roundedRatioSql("count(*)", "CAST(sum(c) AS BIGINT)", 4)} AS ttr,
       |  ${roundedRatioSql("CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)", "count(*)", 4)} AS hapax_share
       |FROM sw GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    graft.operators.CorpusStats.ttr(Tables.documents(s, d), col("source"), col("text"))
      .orderedSmall(col("source"))
  }

  /** #138 — per-source unigram KL divergence vs the corpus mix: the
    * quantitative "how far is this slice from the blend" signal behind
    * data-mixing decisions (the distribution-matching view DSIR's
    * importance weights come from, Xie et al. 2023). Micro-ln
    * quantization before the weighted sum keeps the distributed
    * aggregate an exact integer sum on both engines.
    */
  val qKlMix = GateQuery.sql(
    "q_kl_mix",
    s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS word
       |              FROM documents),
       |sw AS (SELECT source, word, count(*) AS c_sw FROM toks GROUP BY source, word),
       |w AS (SELECT word, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY word),
       |ns AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY source),
       |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM ns),
       |con AS (SELECT sw.source AS source, ns.n_s AS n_s,
       |    sw.c_sw * ${Curation.microLnSql("(sw.c_sw * tot.n) * 1.0 / (ns.n_s * w.c_w)")} AS q
       |  FROM sw JOIN w USING (word) JOIN ns USING (source), tot)
       |SELECT source, n_s AS n_tokens, CAST(sum(q) AS BIGINT) AS kl_micro,
       |  ${roundedRatioSignedSql("CAST(sum(q) AS BIGINT)", "n_s * 1000000", 6)} AS kl
       |FROM con GROUP BY source, n_s ORDER BY source""".stripMargin) { (s, d) =>
    graft.operators.CorpusStats.sourceKl(Tables.documents(s, d), col("source"), col("text"))
      .orderedSmall(col("source"))
  }

  /** #142 — per-document unigram entropy (nats): the classic
    * repetitiveness quality signal — H = ln n − (Σ c·ln c)/n with
    * every c·microLn(c) term an exact integer before the doc-keyed
    * sum, so the distributed aggregate is order/engine-independent.
    */
  val qDocEntropy = GateQuery.sql(
    "q_doc_entropy", {
      val h = s"n * ${Curation.microLnSql("n")} - s"
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |              FROM documents),
         |dw AS (SELECT doc_id, word, count(*) AS c FROM toks GROUP BY doc_id, word),
         |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |        CAST(sum(c * ${Curation.microLnSql("c")}) AS BIGINT) AS s
         |      FROM dw GROUP BY doc_id)
         |SELECT doc_id, n AS n_tokens, $h AS h_micro_sum,
         |  ${roundedRatioSignedSql(h, "n * 1000000", 6)} AS entropy
         |FROM d ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    graft.operators.CorpusStats.docEntropy(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderedSmall(col("doc_id"))
  }

  /** #213 — Zipf-slope diagnostic: per source, the log-log slope of
    * word frequency against frequency rank over the top 200 words —
    * natural corpora sit near −1 (Zipf's law); a source that
    * deviates hard is usually boilerplate, spam or templated text,
    * which makes the slope a cheap corpus-audit signal next to #137's
    * TTR. The rank window runs over the (source, word) COUNT relation
    * (vocab-bounded, never corpus tokens); x = µln(rank) and
    * y = µln(count) are micro-ln integers, all five regression sums
    * accumulate as exact decimals, and the OLS slope leaves as ONE
    * sign-decomposed half-up ratio (negative slopes are the norm —
    * clamping or raw floor division would diverge across engines).
    */
  val qZipfFit = GateQuery.sql(
    "q_zipf_fit",
    s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS word
       |             FROM documents),
       |wc AS (SELECT source, word, count(*) AS c FROM toks GROUP BY 1, 2),
       |rk AS (SELECT source, c,
       |         row_number() OVER (PARTITION BY source ORDER BY c DESC, word) AS r
       |       FROM wc),
       |t AS (SELECT source, ${Curation.microLnSql("r")} AS x,
       |        ${Curation.microLnSql("c")} AS y
       |      FROM rk WHERE r <= 200),
       |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
       |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
       |      FROM t GROUP BY source),
       |f AS (SELECT source, n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
       |      FROM a)
       |SELECT source, n AS n_words,
       |  CASE WHEN n < 2 OR den = 0 THEN NULL ELSE
       |    (CASE WHEN num >= 0
       |      THEN (CAST((num * 2000000 + den) // (den * 2) AS DOUBLE) / 1000000.0)
       |      ELSE -(CAST(((-num) * 2000000 + den) // (den * 2) AS DOUBLE) / 1000000.0) + 0.0
       |    END) END AS zipf_slope
       |FROM f ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(graft.operators.TextOps.tokens(col("text"))).as("word"))
    val wc = toks.groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
    val rk = wc.withColumn("r",
      row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("word"))))
    val t = rk.filter(col("r") <= 200)
      .select(col("source"), Curation.microLn(col("r")).as("x"),
        Curation.microLn(col("c")).as("y"))
    val a = t.groupBy(col("source")).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("sxy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)").as("sxx"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    def ratio(v: org.apache.spark.sql.Column) =
      (Exact.floorDivBig(v * lit(2000000L) + den, den * lit(2L)).cast("double") / lit(1000000.0))
    a.select(col("source"), col("n").as("n_words"),
        when(col("n") < 2 || den === lit(0L).cast("decimal(38,0)"), lit(null).cast("double"))
          .otherwise(when(num >= 0, ratio(num)).otherwise(-ratio(-num) + lit(0.0)))
          .as("zipf_slope"))
      .orderedSmall(col("source"))
  }

  /** #214 — Min-K% prob membership signal (Shi et al. 2023, the
    * pretraining-data detection statistic): per document, the mean
    * NLL of its k = ⌈n/5⌉ LOWEST-probability tokens under the
    * reference unigram LM. Documents the model has memorized have no
    * surprisingly-improbable tokens, so a low Min-K% score next to a
    * low average NLL flags likely training-set membership — the
    * per-doc refinement of #59/#88's n-gram contamination checks.
    * Per-token NLLs come from the SAME capped/broadcast model tables
    * as #90; the top-k rank window is DOC-KEYED (bounded by document
    * length, never corpus-wide); identical tied tokens make any
    * k-subset sum equal, so the window tie order cannot change the
    * answer. All micro-nat integers; one floor division per doc.
    */
  val qMinkPct = GateQuery.sql(
    "q_minkpct",
    s"""WITH $PplScoredSql,
       |tn AS (SELECT t.doc_id AS doc_id, t.word AS word,
       |         CAST(-coalesce(lp.q, oov.oovq) AS BIGINT) AS nll
       |       FROM toks t LEFT JOIN lp USING (word), oov),
       |rk AS (SELECT doc_id, nll,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY nll DESC, word) AS r,
       |         count(*) OVER (PARTITION BY doc_id) AS n
       |       FROM tn),
       |k AS (SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_tokens,
       |        CAST(greatest(1, any_value(n) // 5) AS BIGINT) AS k,
       |        CAST(sum(CASE WHEN r <= greatest(1, n // 5) THEN nll END) AS BIGINT) AS sk
       |      FROM rk GROUP BY doc_id)
       |SELECT doc_id, n_tokens, k, sk // k AS mink_nll_micro
       |FROM k ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // tokenized corpus + en unigram counts from the session
    // snapshots (the pplScored r13 pattern — same arithmetic)
    val toks = graft.SharedRelations.docTokens(s, d)
      .select(col("doc_id"), explode(col("w")).as("word"))
    val (lp, oovq) = unigramModelLit(s, d, "enug",
      graft.SharedRelations.enUnigramCounts(s, d))
    val tn = Curation.modelJoin(toks, lp, Seq("word"))
      .select(col("doc_id"), col("word"),
        (-coalesce(col("q"), lit(oovq))).cast("long").as("nll"))
    val wd = Window.partitionBy(col("doc_id"))
    val rk = tn
      .withColumn("r", row_number().over(wd.orderBy(col("nll").desc, col("word"))))
      .withColumn("n", count(lit(1)).over(wd))
    val kk = rk.groupBy(col("doc_id")).agg(
      first(col("n")).cast("long").as("n_tokens"),
      greatest(lit(1L), graft.operators.Binning.floorDiv(first(col("n")), 5L))
        .cast("long").as("k"),
      sum(when(col("r") <= greatest(lit(1L),
        graft.operators.Binning.floorDiv(col("n"), 5L)), col("nll")))
        .cast("long").as("sk"))
    kk.select(col("doc_id"), col("n_tokens"), col("k"),
        graft.operators.Binning.floorDivCol(col("sk"), col("k")).as("mink_nll_micro"))
      .orderedSmall(col("doc_id"))
  }

  /** #217b/#221 family — jusText-shape boilerplate SEGMENT filter
    * (Pomikálek 2011's insight at K-word granularity, since the
    * corpus has no line structure): a segment whose function-word
    * density falls below 1/8 is navigation/template debris, not
    * prose — drop it and reassemble the document from the surviving
    * segments in order. Pure per-row expressions up to ONE doc-keyed
    * aggregate (conditional collect over (idx, seg) structs — no
    * join, no window); density thresholds compare exact integer ppm.
    * The dual of #89's cross-corpus segment dedup: that drops
    * repeated segments, this drops low-prose segments, both feeding
    * the same reassembly discipline (md5-certified cross-engine).
    */
  val qBoilerplate = GateQuery.sql(
    "q_boilerplate",
    s"""WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sl AS (SELECT doc_id, ${Curation.segmentsSql(SegK)} AS segs FROM tw),
       |sg AS (SELECT doc_id, unnest(range(0, len(segs))) AS i, unnest(segs) AS seg FROM sl),
       |st AS (SELECT doc_id, i, seg,
       |    len(string_split(seg, ' ')) AS nt,
       |    len(list_filter(string_split(seg, ' '), t -> t IN ('a', 'the'))) AS ns
       |  FROM sg),
       |k AS (SELECT doc_id, i, seg, (ns * 1000000) // nt >= 125000 AS keep FROM st)
       |SELECT doc_id, count(*) AS n_segs,
       |  count(*) FILTER (keep) AS n_kept,
       |  md5(coalesce(string_agg(seg, ' ' ORDER BY i) FILTER (keep), '')) AS new_md5
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    // the whole computation is per-document, so it runs as ONE kernel
    // expression per row — the r8 plan exploded every segment, ran
    // interpreted HOF lambdas per token, and shuffled all segment
    // text back to the doc key just to reassemble what one pass over
    // the row already had (4.4× DuckDB on what should be a
    // scan-bound gate)
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.expressions.CurationExpressions.boilerplateStats(
          col("text"), SegK, Seq("a", "the"), 125000L).as("bs"))
      .select(col("doc_id"), col("bs.n_segs").as("n_segs"),
        col("bs.n_kept").as("n_kept"), col("bs.new_md5").as("new_md5"))
      .orderedSmall(col("doc_id"))
  }

  /** #228 — OOV rate against a reference vocabulary: per source, the
    * share of tokens OUTSIDE the top-100 words of the `en` reference
    * slice — CCNet's cheap "is this even the target language/domain"
    * screen, and the denominator sanity check for every LM gate
    * (#90's OOV floor fires exactly on these tokens). The reference
    * vocab is a bounded top-k (ties to smallest word) broadcast into
    * a left join; one (source)-keyed aggregate out. Exact ppm.
    */
  val qOovRate = GateQuery.sql(
    "q_oov_rate",
    s"""WITH toks AS (SELECT source, lang, unnest(string_split(text, ' ')) AS word
       |              FROM documents),
       |ref AS (SELECT word, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY word),
       |refv AS (SELECT word FROM ref ORDER BY c DESC, word LIMIT 100),
       |j AS (SELECT t.source AS source,
       |    CASE WHEN r.word IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM toks t LEFT JOIN refv r ON r.word = t.word)
       |SELECT source, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
       |  (CAST(sum(oov) AS BIGINT) * 1000000) // count(*) AS oov_ppm
       |FROM j GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(col("source"), col("lang"),
      explode(graft.operators.TextOps.tokens(col("text"))).as("word"))
    val refv = toks.filter(col("lang") === "en")
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(100)
      .select(col("word"), lit(1L).as("in_ref"))
    toks.join(broadcast(refv), Seq("word"), "left")
      .select(col("source"), when(col("in_ref").isNull, 1L).otherwise(0L).as("oov"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("oov")).cast("long").as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        graft.operators.Binning.floorDivCol(col("n_oov") * lit(1000000L),
          col("n_tokens")).as("oov_ppm"))
      .orderedSmall(col("source"))
  }

  /** #235 — negative-sampling weight table (word2vec/GloVe's
    * count^0.75 unigram distribution, Mikolov et al. 2013): the
    * candidate table contrastive training draws "random" negatives
    * from, flattened so frequent words aren't drawn proportionally.
    * c^0.75 = sqrt(c·sqrt(c)) uses ONLY sqrt — IEEE correctly
    * rounded on both engines, no libm pow in the gate path — then
    * micro-floors to an exact integer weight. Top-50 by (weight,
    * word) off the vocab-bounded count relation; the actual draw
    * reuses #203's gated Efraimidis–Spirakis machinery unchanged.
    */
  val qNegativeSampling = GateQuery.sql(
    "q_negative_sampling",
    """WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
      |ref AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM toks
      |        WHERE lang = 'en' GROUP BY word),
      |w AS (SELECT word, c,
      |    CAST(floor(sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE))) * 1000000) AS BIGINT)
      |      AS weight_micro
      |  FROM ref),
      |t AS (SELECT CAST(sum(weight_micro) AS HUGEINT) AS tw FROM w),
      |r AS (SELECT word, c, weight_micro,
      |    row_number() OVER (ORDER BY weight_micro DESC, word) AS rk
      |  FROM w)
      |SELECT word, c, weight_micro,
      |  CAST((CAST(weight_micro AS HUGEINT) * 1000000) // tw AS BIGINT) AS draw_ppm
      |FROM r, t WHERE rk <= 50 ORDER BY weight_micro DESC, word""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d).select(col("lang"),
      explode(graft.operators.TextOps.tokens(col("text"))).as("word"))
    val ref = toks.filter(col("lang") === "en")
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("c"))
    val w = ref.withColumn("weight_micro",
      floor(sqrt(col("c").cast("double") * sqrt(col("c").cast("double"))) * lit(1000000L))
        .cast("long"))
    val t = w.agg(sum(col("weight_micro")).cast("decimal(38,0)").as("tw"))
    val r = w.withColumn("rk",
      row_number().over(Window.orderBy(col("weight_micro").desc, col("word"))))
    graft.operators.Curation.withStats(r.filter(col("rk") <= 50), t)
      .select(col("word"), col("c"), col("weight_micro"),
        Exact.floorDivBig(col("weight_micro").cast("decimal(38,0)") * lit(1000000L),
          col("tw")).cast("long").as("draw_ppm"))
      .orderedSmall(col("weight_micro").desc, col("word"))
  }

  /** #238b/#239 — quantile normalization across sources: remap each
    * source's length distribution onto the POOLED distribution (the
    * cross-source feature-alignment step batch-effect pipelines run
    * before any threshold is shared between feeds). For a source
    * value v: target = the smallest pooled value p with
    * cumP(p)·n_s ≥ cum_s(v)·N — a FORWARD AS-OF join on the
    * cross-scaled integer rank key (#218's union+carry operator,
    * reused verbatim; DuckDB mirrors with ASOF JOIN >=). Every
    * relation is VALUE-COLLAPSED (per-source and pooled value grids
    * — bounded by the value domain, never doc count); all
    * comparisons exact cross-scaled integers, the W1/KS discipline.
    */
  val qQuantileNorm = GateQuery.sql(
    "q_quantile_norm",
    """WITH v AS (SELECT source, n_chars AS val, count(*) AS c FROM documents GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM v GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |sv AS (SELECT v.source AS source, v.val AS val, v.c AS c,
      |    CAST(sum(v.c) OVER (PARTITION BY v.source ORDER BY v.val) AS BIGINT) AS cum_s
      |  FROM v),
      |p AS (SELECT val AS pval, CAST(sum(c) AS BIGINT) AS pc FROM v GROUP BY val),
      |pc AS (SELECT pval, CAST(sum(pc) OVER (ORDER BY pval) AS BIGINT) AS cum_p FROM p),
      |l AS (SELECT sv.source AS source, sv.val AS val, sv.c AS c,
      |    sv.cum_s * tot.n AS r FROM sv, tot),
      |r AS (SELECT ns.source AS source, pc.pval AS pval, pc.cum_p * ns.n_s AS key
      |  FROM pc CROSS JOIN ns)
      |SELECT l.source AS source, l.val AS val, l.c AS n_docs, r.pval AS target
      |FROM l ASOF LEFT JOIN r ON l.source = r.source AND r.key >= l.r
      |ORDER BY source, val""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val v = docs.groupBy(col("source"), col("n_chars").as("val"))
      .agg(count(lit(1)).as("c"))
    val ns = v.groupBy(col("source")).agg(sum(col("c")).cast("long").as("n_s"))
    val tot = docs.agg(count(lit(1)).cast("long").as("n"))
    val sv = v.withColumn("cum_s",
      sum(col("c")).over(Window.partitionBy(col("source")).orderBy(col("val"))).cast("long"))
    val p = v.groupBy(col("val").as("pval")).agg(sum(col("c")).cast("long").as("pc"))
    val pcm = p.withColumn("cum_p",
      sum(col("pc")).over(Window.orderBy(col("pval"))).cast("long"))
    val left = Curation.withStats(sv, tot)
      .select(col("source"), col("val"), col("c"), (col("cum_s") * col("n")).as("r"))
    val right = pcm.crossJoin(broadcast(ns))
      .select(col("source"), col("pval").as("target"), (col("cum_p") * col("n_s")).as("r"))
    graft.operators.AsOfJoin.forward(left, right, "source", "r", Seq("target"))
      .select(col("source"), col("val"), col("c").as("n_docs"),
        col("right_target").as("target"))
      .orderedSmall(col("source"), col("val"))
  }

  /** #240b/#241 — Hill tail-index estimator (Hill 1975): per source,
    * α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the k = 10 largest
    * document lengths — the heavy-tail diagnostic that tells a
    * pipeline whether truncation budgets are even meaningful (α ≤ 1
    * ⟹ the mean is dominated by a vanishing fraction of giant docs;
    * reads next to #213's Zipf slope, which measures the RANK law
    * where Hill measures the TAIL law). The top-(k+1) per source
    * comes through the salted two-phase window (never a per-source
    * full sort); each ln is micro-quantized BEFORE the sum, and α
    * leaves as one exact nonnegative floor division (all-equal tail
    * → Σ = 0 → NULL, guarded identically).
    */
  val qHillTail = GateQuery.sql(
    "q_hill_tail",
    s"""WITH r AS (SELECT source, n_chars, doc_id,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM documents),
       |t AS (SELECT source, n_chars, rn FROM r WHERE rn <= 11),
       |xk AS (SELECT source, max(CASE WHEN rn = 11 THEN n_chars END) AS xk1,
       |    count(*) AS n_top FROM t GROUP BY source),
       |s AS (SELECT t.source AS source, any_value(xk.xk1) AS xk1,
       |    CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(${Curation.microLnSql("t.n_chars * 1.0 / xk.xk1")}) AS BIGINT) AS sum_ln
       |  FROM t JOIN xk ON xk.source = t.source
       |  WHERE t.rn <= 10 AND xk.xk1 IS NOT NULL GROUP BY t.source)
       |SELECT source, k, xk1 AS x_k1, sum_ln AS sum_ln_micro,
       |  CASE WHEN sum_ln <= 0 THEN NULL
       |    ELSE CAST((k * 1000000 * 1000000) // sum_ln AS BIGINT) END AS alpha_ppm
       |FROM s ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("source"), col("n_chars"), col("doc_id"))
    val top = graft.operators.Relational.topKPerGroupSalted(docs, Seq(col("source")),
      Seq(col("n_chars").desc, col("doc_id")), 11, col("doc_id"), rankCol = "rn")
    val xk = top.groupBy(col("source"))
      .agg(max(when(col("rn") === 11, col("n_chars"))).as("xk1"))
    val t = top.filter(col("rn") <= 10)
      .join(broadcast(xk), "source")
      .filter(col("xk1").isNotNull)
    val sm = t.groupBy(col("source")).agg(
      first(col("xk1")).as("xk1"), count(lit(1)).cast("long").as("k"),
      sum(Curation.microLn(col("n_chars").cast("double") / col("xk1")))
        .cast("long").as("sum_ln"))
    sm.select(col("source"), col("k"), col("xk1").as("x_k1"),
        col("sum_ln").as("sum_ln_micro"),
        when(col("sum_ln") <= 0, lit(null).cast("long"))
          .otherwise(Exact.floorDivBig(
            col("k").cast("decimal(38,0)") * lit(1000000L) * lit(1000000L),
            col("sum_ln")).cast("long")).as("alpha_ppm"))
      .orderedSmall(col("source"))
  }

  /** #242c/#244 — cross-validated classifier AUC: the HONEST
    * evaluation of #96's quality classifier — train on folds 1–4 of
    * the #232 k-fold assignment, score the UNSEEN fold 0, and report
    * the held-out Mann–Whitney AUC (the #175 machinery,
    * value-collapsed over distinct scores). The in-sample score the
    * classifier gate reports cannot detect memorized hash buckets;
    * this gate can — it is the composition that turns three gated
    * operators (folds, classifier, AUC) into a leak-aware pipeline.
    * Hash-checked SQL since r10: the q_quality_classifier unrolled-GD
    * oracle restricted to the train folds, held-out scoring via LEFT
    * JOIN + coalesce(wt, 0) (buckets unseen in training carry the
    * driver's zero weight), and the exact-integer rank-sum AUC on
    * top. no_oracle residue shrinks by the last
    * driver-trained-model gate.
    */
  val qCvAuc = GateQuery.sql(
    "q_cv_auc", {
      val iters = (1 to 8).map { i =>
        val wp = s"w${i - 1}"
        s"""m$i AS MATERIALIZED (SELECT bg.doc_id, any_value(bg.label) AS label,
           |    CAST(sum(w.wt) AS BIGINT) AS m
           |  FROM bg JOIN $wp w USING (b) GROUP BY bg.doc_id),
           |r$i AS MATERIALIZED (SELECT doc_id,
           |    CAST(floor((1.0 / (1.0 + exp((-(m)) / 1000000.0)) - label)
           |      * 1000000) AS BIGINT) AS r
           |  FROM m$i),
           |g$i AS MATERIALIZED (SELECT bg.b, CAST(sum(r$i.r) AS BIGINT) AS g
           |  FROM bg JOIN r$i USING (doc_id) GROUP BY bg.b),
           |w$i AS MATERIALIZED (SELECT w.b, w.wt - CAST(floor((0.5 * ((CAST(g.g AS DOUBLE)
           |      / 1000000.0) / (SELECT nd FROM nd))) * 1000000.0 + 0.5) AS BIGINT)
           |    AS wt
           |  FROM $wp w JOIN g$i g USING (b))""".stripMargin
      }.mkString(",\n")
      s"""WITH tw AS (SELECT doc_id, (lang = 'en')::INT AS label,
         |    ${graft.operators.TextOps.baseHashSql("concat('fold:', CAST(doc_id AS VARCHAR))")}
         |      % 5 AS fold,
         |    string_split(text, ' ') AS w FROM documents),
         |bg AS MATERIALIZED (SELECT doc_id, label,
         |    unnest(${Curation.bigramBucketsSql(DsirBuckets)}) AS b
         |  FROM tw WHERE len(w) >= 2 AND fold <> 0),
         |hbg AS MATERIALIZED (SELECT doc_id, label,
         |    unnest(${Curation.bigramBucketsSql(DsirBuckets)}) AS b
         |  FROM tw WHERE len(w) >= 2 AND fold = 0),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM bg),
         |w0 AS MATERIALIZED (SELECT DISTINCT b, CAST(0 AS BIGINT) AS wt FROM bg),
         |$iters,
         |hsc AS MATERIALIZED (SELECT h.doc_id, any_value(h.label) AS label,
         |    CAST(sum(coalesce(w.wt, 0)) AS BIGINT) AS sc
         |  FROM hbg h LEFT JOIN w8 w USING (b) GROUP BY h.doc_id),
         |v AS (SELECT sc, CAST(count(*) AS BIGINT) AS c,
         |    CAST(sum(label) AS BIGINT) AS p FROM hsc GROUP BY sc),
         |cm AS (SELECT sc, c, p,
         |    CAST(sum(c) OVER (ORDER BY sc) AS BIGINT) AS cum FROM v),
         |f AS (SELECT CAST(sum(p * (2 * cum - c + 1)) AS BIGINT) AS sp2,
         |    CAST(sum(p) AS BIGINT) AS np, CAST(sum(c - p) AS BIGINT) AS nn
         |  FROM cm)
         |SELECT np AS n_heldout_pos, nn AS n_heldout_neg,
         |  CAST(((sp2 - np * (np + 1)) * 1000000) // (2 * np * nn) AS BIGINT)
         |    AS heldout_auc_ppm
         |FROM f""".stripMargin
    }) { (s, d) =>
    import graft.operators.{QualityClassifier, TextOps}
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).withColumn("fold",
      pmod(TextOps.baseHash(concat(lit("fold:"), col("doc_id").cast("string"))), lit(5L)))
    val trainFeat = QualityClassifier.features(
      docs.filter(col("fold") =!= 0), col("lang") === "en", DsirBuckets).persist()
    val heldFeat = QualityClassifier.features(
      docs.filter(col("fold") === 0), col("lang") === "en", DsirBuckets)
    val w = QualityClassifier.train(trainFeat, DsirBuckets, iters = 8, lr = 0.5)
    val scored = QualityClassifier.score(heldFeat, w)
      .join(heldFeat.select(col("doc_id"), col("label")), "doc_id")
    val v = scored.groupBy(col("score_micro").as("sc"))
      .agg(count(lit(1)).as("c"), sum(col("label")).cast("long").as("p"))
    val cum = v.withColumn("cum", sum(col("c")).over(Window.orderBy(col("sc"))).cast("long"))
    cum.agg(
        sum(col("p") * (lit(2L) * col("cum") - col("c") + 1)).cast("long").as("sp2"),
        sum(col("p")).cast("long").as("np"),
        sum(col("c") - col("p")).cast("long").as("nn"))
      .select(col("np").as("n_heldout_pos"), col("nn").as("n_heldout_neg"),
        graft.operators.Binning.floorDivCol(
          (col("sp2") - col("np") * (col("np") + 1)) * lit(1000000L),
          lit(2L) * col("np") * col("nn")).as("heldout_auc_ppm"))
  }

  /** #246b/#247 — bigram conditional entropy per source: H(w₂|w₁) =
    * (Σ c₁₂·µln(c₁/c₁₂)) / N over observed bigrams — the lexical
    * PREDICTABILITY audit that separates templated text (near-zero:
    * every word determines the next) from prose at equal #137 TTR or
    * #142 unigram entropy. Every c₁₂·µln(c₁/c₁₂) term is an exact
    * integer before the source-keyed sum (#138's discipline); the
    * bigram relation is vocab²-bounded, never corpus tokens.
    */
  val qCondEntropy = GateQuery.sql(
    "q_cond_entropy",
    s"""WITH tw AS (SELECT source, string_split(text, ' ') AS w FROM documents),
       |bi AS (SELECT source,
       |         unnest([w[i] for i in range(1, len(w))]) AS w1,
       |         unnest([w[i+1] for i in range(1, len(w))]) AS w2
       |       FROM tw WHERE len(w) >= 2),
       |cb AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c12
       |       FROM bi GROUP BY 1, 2, 3),
       |cw AS (SELECT source, w1, CAST(sum(c12) AS BIGINT) AS c1
       |       FROM cb GROUP BY 1, 2),
       |t AS (SELECT cb.source AS source,
       |    CAST(sum(cb.c12) AS BIGINT) AS n,
       |    CAST(sum(cb.c12 * ${Curation.microLnSql("cw.c1 * 1.0 / cb.c12")}) AS BIGINT) AS h_sum
       |  FROM cb JOIN cw ON cw.source = cb.source AND cw.w1 = cb.w1
       |  GROUP BY 1)
       |SELECT source, n AS n_bigrams, h_sum AS h_micro_sum,
       |  ${Exact.roundedRatioSignedSql("h_sum", "n * 1000000", 6)} AS cond_entropy
       |FROM t ORDER BY source""".stripMargin) { (s, d) =>
    val tw = Tables.documents(s, d).select(col("source"),
      graft.operators.TextOps.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    val bi = tw.select(col("source"),
      posexplode(expr("transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))"))
        .as(Seq("i", "p")))
      .select(col("source"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = bi.groupBy(col("source"), col("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("c12"))
    val cw = cb.groupBy(col("source"), col("w1")).agg(sum(col("c12")).cast("long").as("c1"))
    val q = Curation.microLn(
      col("c1").cast("double") / col("c12").cast("double"))
    cb.join(cw, Seq("source", "w1"))
      .groupBy(col("source"))
      .agg(sum(col("c12")).cast("long").as("n"),
        sum(col("c12") * q).cast("long").as("h_sum"))
      .select(col("source"), col("n").as("n_bigrams"), col("h_sum").as("h_micro_sum"),
        Exact.roundedRatioSigned(col("h_sum"), col("n") * lit(1000000L), 6)
          .as("cond_entropy"))
      .orderedSmall(col("source"))
  }

  /** #316 — Moore–Lewis cross-entropy-difference data selection
    * (Moore & Lewis 2010): rank every document by how much better an
    * IN-DOMAIN LM predicts it than a GENERAL-corpus LM —
    * score(d) = Σ_tokens [ln P_in(w) − ln P_gen(w)], positive means
    * "looks like the target domain beyond generic frequency". THE
    * classic targeted-selection operator next to DSIR (#91, hashed
    * importance weights): Moore–Lewis contrasts full LMs where DSIR
    * contrasts hashed feature distributions. Both models here are
    * the unigram Laplace instantiation (the #84 scorer, trained on
    * the `lang='en' AND source='src0'` slice vs the whole corpus);
    * each per-token term is the DIFFERENCE of two already-micro-
    * quantized log-probs — exact integers, order-free sum — and the
    * per-token average is a sign-aware HALF_UP ratio. Model tables
    * are topV-capped vocab relations through the [[Curation
    * .modelJoin]] broadcast-vs-shuffle switch; OOV floors ride
    * 1-row broadcasts. `selected` = score > 0 (the Moore–Lewis
    * acceptance rule at threshold 0).
    */
  val qMooreLewis = GateQuery.sql(
    "q_moore_lewis",
    s"""WITH tw AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w
       |  FROM documents),
       |toks AS (SELECT doc_id, unnest(w) AS word FROM tw),
       |lt AS (SELECT lang, source, unnest(w) AS word FROM tw),
       |rin AS (SELECT word, count(*) AS c FROM lt
       |  WHERE lang = 'en' AND source = 'src0' GROUP BY word),
       |sin AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM rin),
       |rinv AS (SELECT word, c FROM rin ORDER BY c DESC, word LIMIT $LmTopV),
       |qin AS (SELECT word, ${Curation.microLnSql("(c + 1.0) / (n + v)")} AS qi
       |  FROM rinv, sin),
       |oin AS (SELECT ${Curation.microLnSql("1.0 / (n + v)")} AS oqi FROM sin),
       |rgn AS (SELECT word, count(*) AS c FROM lt GROUP BY word),
       |sgn AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM rgn),
       |rgnv AS (SELECT word, c FROM rgn ORDER BY c DESC, word LIMIT $LmTopV),
       |qgn AS (SELECT word, ${Curation.microLnSql("(c + 1.0) / (n + v)")} AS qg
       |  FROM rgnv, sgn),
       |ogn AS (SELECT ${Curation.microLnSql("1.0 / (n + v)")} AS oqg FROM sgn),
       |sc AS (SELECT toks.doc_id AS doc_id, count(*) AS n_tokens,
       |    CAST(sum(coalesce(qin.qi, oin.oqi) - coalesce(qgn.qg, ogn.oqg)) AS BIGINT)
       |      AS ml_micro
       |  FROM toks LEFT JOIN qin ON toks.word = qin.word
       |            LEFT JOIN qgn ON toks.word = qgn.word, oin, ogn
       |  GROUP BY toks.doc_id)
       |SELECT doc_id, n_tokens, ml_micro,
       |  ${roundedRatioSignedSql("ml_micro", "n_tokens * 1000000", 4)} AS avg_ml,
       |  ml_micro > 0 AS selected
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    // tokens and both domains' model tables ride the session
    // snapshots (the q_moore_lewis_bi r12 pattern — this gate was
    // still re-tokenizing and re-counting both domains inline)
    val toks = SharedRelations.docTokens(s, d)
      .select(col("doc_id"), explode(col("w")).as("word"))
    val (quI, oqi) = unigramModelLit(s, d, "iug",
      SharedRelations.enSrc0UnigramCounts(s, d))
    val (quG, oqg) = unigramModelLit(s, d, "alug",
      SharedRelations.allUnigramCounts(s, d))
    val scored = Curation.modelJoin(
        Curation.modelJoin(
          toks,
          quI.select(col("word"), col("q").as("qi")), Seq("word")),
        quG.select(col("word"), col("q").as("qg")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("qi"), lit(oqi)) - coalesce(col("qg"), lit(oqg)))
          .cast("long").as("ml_micro"))
    scored.select(col("doc_id"), col("n_tokens"), col("ml_micro"),
        Exact.roundedRatioSigned(col("ml_micro"), col("n_tokens") * lit(1000000L), 4)
          .as("avg_ml"),
        (col("ml_micro") > 0).as("selected"))
      .orderedSmall(col("doc_id"))
  }

  /** #319 — bigram Moore–Lewis data selection: the cross-entropy
    * difference of #316 lifted to the bigram stupid-backoff rung
    * (#94's chain): score(d) = Σ_bigrams [ln P_in(w₂|w₁) −
    * ln P_gen(w₂|w₁)] with BOTH sides the full backoff chain (bigram
    * conditional → 0.4·Laplace unigram → 0.4·OOV floor). Moore &
    * Lewis 2010 §3 report the contrast sharpens with n-gram order —
    * a generic-frequency word pair ("of the") stops scoring while an
    * in-domain COLLOCATION still does; the unigram gate (#316) cannot
    * see that difference. Same exactness scheme: every rung's
    * log-prob is micro-ln-quantized at the model table, a per-
    * instance score is the DIFFERENCE of two already-quantized
    * integers, and the doc sum is order-free. Model tables are
    * minCount-pruned bigram + topV-capped unigram relations through
    * the [[Curation.modelJoin]] broadcast-vs-shuffle switch; OOV
    * floors ride 1-row broadcasts; tokens and BOTH domains' count
    * tables ride the [[graft.SharedRelations]] snapshots.
    *
    * Wall-clock note (r12): r11's 2.14 s → ~1.0 s once all four
    * model tables are snapshot scan+projects; the residual jobs are
    * FOUR scoring joins (two bigram rungs × two domains) + the doc
    * aggregate, each billing the local job floor vs DuckDB's ~0.3 s
    * — the q_lm_bigram note's class, doubled because Moore–Lewis
    * runs two full backoff chains.
    */
  val qMooreLewisBigram = GateQuery.sql(
    "q_moore_lewis_bi",
    s"""WITH tw AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w
       |  FROM documents),
       |bi AS (SELECT doc_id, lang, source,
       |         unnest([w[i] for i in range(1, len(w))]) AS w1,
       |         unnest([w[i+1] for i in range(1, len(w))]) AS w2
       |       FROM tw WHERE len(w) >= 2),
       |cbi AS (SELECT w1, w2, count(*) AS cb FROM bi
       |  WHERE lang = 'en' AND source = 'src0' GROUP BY 1, 2),
       |cwi AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1 FROM cbi GROUP BY 1),
       |qbi AS (SELECT w1, w2, ${Curation.microLnSql("cb / cw1")} AS qbi
       |  FROM cbi JOIN cwi USING (w1) WHERE cb >= $LmMinCount),
       |cbg AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
       |cwg AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1 FROM cbg GROUP BY 1),
       |qbg AS (SELECT w1, w2, ${Curation.microLnSql("cb / cw1")} AS qbg
       |  FROM cbg JOIN cwg USING (w1) WHERE cb >= $LmMinCount),
       |ti AS (SELECT unnest(w) AS word FROM tw WHERE lang = 'en' AND source = 'src0'),
       |ri AS (SELECT word, count(*) AS c FROM ti GROUP BY word),
       |si AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM ri),
       |riv AS (SELECT word, c FROM ri ORDER BY c DESC, word LIMIT $LmTopV),
       |qui AS (SELECT word, ${Curation.microLnSql("0.4 * (c + 1.0) / (n + v)")} AS qui
       |  FROM riv, si),
       |oi AS (SELECT ${Curation.microLnSql("0.4 * 1.0 / (n + v)")} AS oqi FROM si),
       |tg AS (SELECT unnest(w) AS word FROM tw),
       |rg AS (SELECT word, count(*) AS c FROM tg GROUP BY word),
       |sg AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM rg),
       |rgv AS (SELECT word, c FROM rg ORDER BY c DESC, word LIMIT $LmTopV),
       |qug AS (SELECT word, ${Curation.microLnSql("0.4 * (c + 1.0) / (n + v)")} AS qug
       |  FROM rgv, sg),
       |og AS (SELECT ${Curation.microLnSql("0.4 * 1.0 / (n + v)")} AS oqg FROM sg),
       |sc AS (SELECT bi.doc_id AS doc_id, count(*) AS n_scored,
       |    CAST(sum(coalesce(qbi.qbi, qui.qui, oi.oqi)
       |           - coalesce(qbg.qbg, qug.qug, og.oqg)) AS BIGINT) AS mlb_micro
       |  FROM bi LEFT JOIN qbi ON bi.w1 = qbi.w1 AND bi.w2 = qbi.w2
       |          LEFT JOIN qbg ON bi.w1 = qbg.w1 AND bi.w2 = qbg.w2
       |          LEFT JOIN qui ON bi.w2 = qui.word
       |          LEFT JOIN qug ON bi.w2 = qug.word, oi, og
       |  GROUP BY bi.doc_id)
       |SELECT doc_id, n_scored, mlb_micro,
       |  ${roundedRatioSignedSql("mlb_micro", "n_scored * 1000000", 4)} AS avg_mlb,
       |  mlb_micro > 0 AS selected
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    // BOTH model domains ride the session snapshots (r12): tokens,
    // the whole-corpus general-domain counts, and the (en ∧ src0)
    // in-domain counts — every one of the four model tables is a
    // scan + project, only the scoring join chain touches the corpus
    val tw = SharedRelations.docTokens(s, d)
    val bi = SharedRelations.bigramInstances(tw, "doc_id")
    val qbI = Curation.bigramLogProbsFromCounts(
        SharedRelations.enSrc0BigramCounts(s, d).withColumnRenamed("c", "cb"),
        minCount = LmMinCount)
      .select(col("w1"), col("w2"), col("qb").as("qbi"))
    val qbG = Curation.bigramLogProbsFromCounts(
        SharedRelations.allBigramCounts(s, d).withColumnRenamed("c", "cb"),
        minCount = LmMinCount)
      .select(col("w1"), col("w2"), col("qb").as("qbg"))
    val (quI0, oqi) = unigramModelLit(s, d, "iug",
      SharedRelations.enSrc0UnigramCounts(s, d), scale = 0.4)
    val (quG0, oqg) = unigramModelLit(s, d, "alug",
      SharedRelations.allUnigramCounts(s, d), scale = 0.4)
    val scored = Curation.modelJoin(
        Curation.modelJoin(
          Curation.modelJoin(
            Curation.modelJoin(
              bi,
              qbI, Seq("w1", "w2")),
            qbG, Seq("w1", "w2")),
          quI0.select(col("word").as("w2"), col("q").as("qui")), Seq("w2")),
        quG0.select(col("word").as("w2"), col("q").as("qug")), Seq("w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        sum(coalesce(col("qbi"), col("qui"), lit(oqi)) -
            coalesce(col("qbg"), col("qug"), lit(oqg))).cast("long").as("mlb_micro"))
    scored.select(col("doc_id"), col("n_scored"), col("mlb_micro"),
        Exact.roundedRatioSigned(col("mlb_micro"), col("n_scored") * lit(1000000L), 4)
          .as("avg_mlb"),
        (col("mlb_micro") > 0).as("selected"))
      .orderedSmall(col("doc_id"))
  }

  /** Chao1 vocabulary-richness estimate (#331): how much vocabulary
    * has the corpus NOT seen yet — the nonparametric lower bound on
    * total species richness from singleton/doubleton counts (Chao
    * 1984, bias-corrected form; the ecology estimator lexicography
    * adopted). Per source: Chao1 = V + n₁(n₁−1)/(2(n₂+1)) with n₁/n₂
    * the words seen exactly once/twice, plus Good's coverage estimate
    * C = 1 − n₁/N (Good 1953) — together they size every topV cap and
    * minCount prune in the LM family (#90/#94/#102) and the tokenizer
    * vocab (#107) against what's actually missing. Shape: the
    * (source, word) count relation collapses to a COUNT-OF-COUNTS
    * relation (bounded by distinct multiplicities — the #279
    * coverage-curve discipline), everything after is exact integer
    * milli/ppm floor division.
    */
  val qChao1 = GateQuery.sql(
    "q_chao1",
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |c AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
      |cc AS (SELECT source, c, CAST(count(*) AS BIGINT) AS f FROM c GROUP BY 1, 2),
      |a AS (SELECT source,
      |    CAST(sum(f) AS BIGINT) AS v,
      |    CAST(sum(c * f) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN c = 1 THEN f ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN c = 2 THEN f ELSE 0 END) AS BIGINT) AS n2
      |  FROM cc GROUP BY 1)
      |SELECT source, n_tokens, v AS v_observed, n1 AS n_singletons, n2 AS n_doubletons,
      |  v * 1000 + (n1 * (n1 - 1) * 1000) // (2 * (n2 + 1)) AS chao1_milli,
      |  1000000 - (n1 * 1000000) // n_tokens AS coverage_ppm
      |FROM a ORDER BY source""".stripMargin) { (s, d) =>
    val w = Tables.documents(s, d).select(col("source"),
      explode(graft.operators.TextOps.tokens(col("text"))).as("word"))
    val c = w.groupBy(col("source"), col("word")).agg(count(lit(1)).cast("long").as("c"))
    val cc = c.groupBy(col("source"), col("c")).agg(count(lit(1)).cast("long").as("f"))
    val a = cc.groupBy(col("source")).agg(
      sum(col("f")).cast("long").as("v"),
      sum(col("c") * col("f")).cast("long").as("n_tokens"),
      sum(when(col("c") === 1, col("f")).otherwise(0L)).cast("long").as("n1"),
      sum(when(col("c") === 2, col("f")).otherwise(0L)).cast("long").as("n2"))
    a.select(col("source"), col("n_tokens"), col("v").as("v_observed"),
        col("n1").as("n_singletons"), col("n2").as("n_doubletons"),
        (col("v") * lit(1000L) +
          Binning.floorDivCol(col("n1") * (col("n1") - 1) * lit(1000L),
            lit(2L) * (col("n2") + 1))).as("chao1_milli"),
        (lit(1000000L) -
          Binning.floorDivCol(col("n1") * lit(1000000L), col("n_tokens")))
          .as("coverage_ppm"))
      .orderedSmall(col("source"))
  }

  /** Burrows' Delta stylometry (#347): which sources "write alike"?
    * The standard authorship/register distance (Burrows 2002) — each
    * source profiled by its relative frequencies of the corpus's 50
    * most frequent words, z-scored ACROSS sources per word, distance
    * = mean |z₁−z₂|. In a data pipeline this is the provenance
    * screen: two "different" crawls with near-zero Delta are the same
    * upstream feed (dedup #22–#24 sees shared strings; Delta sees
    * shared STYLE). Shape: (source, word) counts → top-50 vocab
    * (driver-bounded like every topV cap) → the dense source×vocab
    * grid is a BOUNDED 20×50 broadcast product; per-word ppm
    * frequencies and z-score sufficient stats are exact integers; z
    * mirrored doubles, each |z₁−z₂| micro-floored BEFORE the
    * order-free per-pair sum; pair fan-out is sources², never data.
    */
  val qBurrowsDelta = GateQuery.sql(
    "q_burrows_delta",
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |sw AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM sw GROUP BY 1),
      |wc AS (SELECT word, CAST(sum(c) AS BIGINT) AS cw FROM sw GROUP BY 1),
      |topw AS (SELECT word FROM wc ORDER BY cw DESC, word LIMIT 50),
      |grid AS (SELECT ns.source, ns.n_s, topw.word FROM ns, topw),
      |f AS (SELECT g.source, g.word,
      |    (coalesce(sw.c, 0) * 1000000) // g.n_s AS f_ppm
      |  FROM grid g LEFT JOIN sw ON sw.source = g.source AND sw.word = g.word),
      |ws AS (SELECT word, CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(f_ppm) AS BIGINT) AS sf,
      |    CAST(sum(CAST(f_ppm AS HUGEINT) * f_ppm) AS HUGEINT) AS sf2
      |  FROM f GROUP BY 1),
      |z AS (SELECT f.source AS source, f.word AS word,
      |    CAST(f.f_ppm * ws.k - ws.sf AS DOUBLE)
      |      / sqrt(CAST(ws.k * ws.sf2 - CAST(ws.sf AS HUGEINT) * ws.sf AS DOUBLE)) AS z
      |  FROM f JOIN ws ON f.word = ws.word
      |  WHERE ws.k * ws.sf2 > CAST(ws.sf AS HUGEINT) * ws.sf),
      |p AS (SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(floor(abs(a.z - b.z) * 1000000) AS BIGINT) AS t
      |  FROM z a JOIN z b ON a.word = b.word AND a.source < b.source),
      |dd AS (SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(sum(t) AS BIGINT) AS sum_micro
      |  FROM p GROUP BY 1, 2)
      |SELECT source_a, source_b, n_words, sum_micro // n_words AS delta_micro
      |FROM dd ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(col("source"),
      explode(graft.operators.TextOps.tokens(col("text"))).as("word"))
    val sw = toks.groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("long").as("c"))
    val ns = sw.groupBy(col("source")).agg(sum(col("c")).cast("long").as("n_s"))
    val wc = sw.groupBy(col("word")).agg(sum(col("c")).cast("long").as("cw"))
    val topw = wc.orderBy(col("cw").desc, col("word")).limit(50).select(col("word"))
    val grid = ns.crossJoin(broadcast(topw))
    val f = grid.join(sw, Seq("source", "word"), "left")
      .select(col("source"), col("word"),
        Binning.floorDivCol(coalesce(col("c"), lit(0L)) * lit(1000000L), col("n_s"))
          .as("f_ppm"))
    def dec(x: org.apache.spark.sql.Column) = x.cast("decimal(38,0)")
    val ws = f.groupBy(col("word")).agg(
      count(lit(1)).cast("long").as("k"),
      sum(col("f_ppm")).cast("long").as("sf"),
      sum(dec(col("f_ppm")) * col("f_ppm")).cast("decimal(38,0)").as("sf2"))
    val z = f.join(broadcast(ws), "word")
      .filter(dec(col("k")) * col("sf2") > dec(col("sf")) * col("sf"))
      .select(col("source"), col("word"),
        ((col("f_ppm") * col("k") - col("sf")).cast("double") /
          sqrt((dec(col("k")) * col("sf2") - dec(col("sf")) * col("sf"))
            .cast("double"))).as("z"))
    val za = z.select(col("source").as("source_a"), col("word"), col("z").as("za"))
    val zb = z.select(col("source").as("source_b"), col("word"), col("z").as("zb"))
    val p = za.join(zb, Seq("word")).filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        floor(abs(col("za") - col("zb")) * lit(1000000L)).cast("long").as("t"))
    p.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("t")).cast("long").as("sum_micro"))
      .select(col("source_a"), col("source_b"), col("n_words"),
        Binning.floorDivCol(col("sum_micro"), col("n_words")).as("delta_micro"))
      .orderedSmall(col("source_a"), col("source_b"))
  }

  /** Source-concentration audit: HHI + effective source count
    * (#371) — is the corpus really "diverse" or is it three crawls
    * in a trench coat? The Herfindahl–Hirschman index Σsᵢ² (the
    * antitrust concentration standard) over token shares, its
    * inverse 1/HHI = the EFFECTIVE number of equally-sized sources
    * (Hill-number order 2 — the robust companion of Simpson #253,
    * here by TOKENS not docs), and the top-1/top-3 shares. One
    * aggregate to per-source token counts, exact ppm shares, HHI as
    * an exact decimal-lifted Σshare² in ppm² units, effective count
    * one exact floor division; the top-3 sum rides a bounded
    * rank window over the source relation.
    */
  val qSourceHhi = GateQuery.sql(
    "q_source_hhi",
    """WITH toks AS (SELECT source, len(string_split(text, ' ')) AS nt FROM documents),
      |s AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n FROM toks GROUP BY 1),
      |t AS (SELECT source, n, CAST(sum(n) OVER () AS BIGINT) AS tot,
      |    CAST(row_number() OVER (ORDER BY n DESC, source) AS BIGINT) AS rk
      |  FROM s),
      |p AS (SELECT source, n, tot, rk, (n * 1000000) // tot AS share_ppm FROM t),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS k, any_value(tot) AS tot,
      |    CAST(sum(CAST(share_ppm AS HUGEINT) * share_ppm) AS BIGINT) AS hhi_ppm2,
      |    CAST(sum(CASE WHEN rk = 1 THEN share_ppm ELSE 0 END) AS BIGINT) AS top1_ppm,
      |    CAST(sum(CASE WHEN rk <= 3 THEN share_ppm ELSE 0 END) AS BIGINT) AS top3_ppm
      |  FROM p)
      |SELECT k AS n_sources, CAST(tot AS BIGINT) AS n_tokens, hhi_ppm2,
      |  top1_ppm, top3_ppm,
      |  CASE WHEN hhi_ppm2 = 0 THEN NULL
      |    ELSE (1000000000000 * 1000) // hhi_ppm2 END AS effective_sources_milli
      |FROM a""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(col("source"),
      size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("nt"))
    val sdf = toks.groupBy(col("source")).agg(sum(col("nt")).cast("long").as("n"))
    val t = sdf
      .withColumn("tot", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()).cast("long"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("source")))
        .cast("long"))
    val p = t.select(col("source"), col("n"), col("tot"), col("rk"),
      Binning.floorDivCol(col("n") * lit(1000000L), col("tot")).as("share_ppm"))
    val a = p.agg(count(lit(1)).cast("long").as("k"), first(col("tot")).as("tot"),
      sum(col("share_ppm").cast("decimal(38,0)") * col("share_ppm"))
        .cast("long").as("hhi_ppm2"),
      sum(when(col("rk") === 1, col("share_ppm")).otherwise(0L)).cast("long").as("top1_ppm"),
      sum(when(col("rk") <= 3, col("share_ppm")).otherwise(0L)).cast("long").as("top3_ppm"))
    a.select(col("k").as("n_sources"), col("tot").cast("long").as("n_tokens"),
      col("hhi_ppm2"), col("top1_ppm"), col("top3_ppm"),
      when(col("hhi_ppm2") === 0, lit(null).cast("long"))
        .otherwise(Binning.floorDivCol(lit(1000000000000L) * lit(1000L),
          col("hhi_ppm2"))).as("effective_sources_milli"))
  }

  /** LCP clone detection over sorted suffixes (#377): the
    * longest-duplicated-span detector — "which exact long passages
    * recur across documents, and how long do they run?" — the
    * variable-length companion of fixed-k shingle dedup (#22) and
    * exact substring dedup (#93), in the suffix-array tradition of
    * Lee et al. 2021 (arXiv:2107.06499) re-expressed Spark-first:
    * no global suffix array is ever built. Suffixes are taken at
    * WORD STARTS (the published granularity), truncated to 64 chars;
    * clones shorter than the 16-char threshold are out of scope BY
    * DEFINITION, which is exactly what makes the distributed shape an
    * equi-shuffle: any clone ≥ 16 chars forces its two suffixes into
    * the same 16-char-prefix bucket, so neighbor-LCP only ever runs
    * INSIDE a bucket (partitioned window — never a global sort, never
    * all-pairs). Per-bucket work is bounded by the 256-suffix hot-
    * bucket cap (boilerplate guard, the `maxBandDf` convention), the
    * 49-step prefix-compare fold is a constant per adjacent pair, and
    * the final top-20 is a TakeOrdered, not a sort. Exact: pure
    * string ops; the LCP fold is monotone so the fold max equals the
    * oracle's list_max; equal-but-short suffix inflation is clamped
    * by least(·, len, len).
    */
  val qLcpClones = GateQuery.sql(
    "q_lcp_clones",
    """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |p AS (SELECT doc_id, text, unnest(ws) AS word,
      |    generate_subscripts(ws, 1) AS i FROM d),
      |o AS (SELECT doc_id, text, i,
      |    CAST(coalesce(sum(length(word) + 1) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM p),
      |s AS (SELECT doc_id, i, substr(text, CAST(off AS INT) + 1, 64) AS sfx
      |  FROM o WHERE length(text) - off >= 16),
      |b AS (SELECT doc_id, i, sfx, substr(sfx, 1, 16) AS bucket FROM s),
      |c AS (SELECT *, count(*) OVER (PARTITION BY bucket) AS df FROM b),
      |k AS (SELECT bucket, doc_id, i, sfx,
      |    lag(sfx) OVER (PARTITION BY bucket ORDER BY sfx, doc_id, i) AS psfx,
      |    lag(doc_id) OVER (PARTITION BY bucket ORDER BY sfx, doc_id, i) AS pdoc
      |  FROM c WHERE df <= 256),
      |l AS (SELECT bucket, doc_id, sfx,
      |    CASE WHEN psfx IS NOT NULL AND pdoc <> doc_id THEN
      |      least(list_max(list_filter(range(16, 65),
      |          j -> substr(sfx, 1, CAST(j AS INT)) = substr(psfx, 1, CAST(j AS INT)))),
      |        length(sfx), length(psfx))
      |    END AS lcp
      |  FROM k),
      |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_sfx,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |    CAST(max(lcp) AS BIGINT) AS max_lcp
      |  FROM l GROUP BY bucket)
      |SELECT bucket, n_sfx, n_docs, max_lcp FROM g
      |WHERE n_docs >= 2 AND max_lcp IS NOT NULL
      |ORDER BY max_lcp DESC, bucket LIMIT 20""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // suffix generation is per-doc — one kernel call replaces the
    // explode → cumulative-offset window → substring chain; the
    // neighbor LCP is one char-loop expression instead of the
    // 49-step substring-compare fold (both r9, same values: the fold
    // is monotone and in-bucket pairs always share the 16 prefix)
    val sx = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(graft.expressions.CurationExpressions.docSuffixes(
          col("text"), width = 64, minRemain = 16)).as(Seq("i", "sfx")))
    val b = sx.withColumn("bucket", expr("substring(sfx, 1, 16)"))
    val c = b.withColumn("df", count(lit(1)).over(Window.partitionBy(col("bucket"))))
    val wB = Window.partitionBy(col("bucket"))
      .orderBy(col("sfx"), col("doc_id"), col("i"))
    val k = c.filter(col("df") <= 256)
      .withColumn("psfx", lag(col("sfx"), 1).over(wB))
      .withColumn("pdoc", lag(col("doc_id"), 1).over(wB))
    val l = k.select(col("bucket"), col("doc_id"), col("sfx"),
      when(col("psfx").isNotNull && col("pdoc") =!= col("doc_id"),
        graft.expressions.CurationExpressions.commonPrefixLen(col("sfx"), col("psfx")))
        .as("lcp"))
    val g = l.groupBy(col("bucket")).agg(
      count(lit(1)).cast("long").as("n_sfx"),
      countDistinct(col("doc_id")).cast("long").as("n_docs"),
      max(col("lcp")).cast("long").as("max_lcp"))
    g.filter(col("n_docs") >= 2 && col("max_lcp").isNotNull)
      .orderBy(col("max_lcp").desc, col("bucket"))
      .limit(20)
  }

  /** Term burstiness / adaptation (#380, Church & Gale 1995; Church
    * 2000): per term, mean occurrences per CONTAINING document
    * (cf/df) and the adaptation probability P(k≥2 | k≥1) = df₂/df —
    * the two classic measures of how far a word departs from the
    * Poisson "spread evenly" null. High-burstiness terms are topical
    * or boilerplate (they stack inside few docs); near-uniform terms
    * are function words — the corpus diagnostic behind Poisson-
    * mixture LM priors and a useful stoplist/keyword splitter next
    * to keyness (#302) and dispersion (#304, which measures the
    * complementary cross-part evenness). Two hash aggregates —
    * (word, doc) then word — both bounded by vocab·docs structure;
    * ratios exact milli/ppm floors; top-20 via TakeOrdered.
    */
  val qBurstiness = GateQuery.sql(
    "q_burstiness",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |              FROM documents),
      |wd AS (SELECT word, doc_id, CAST(count(*) AS BIGINT) AS c
      |  FROM toks GROUP BY 1, 2),
      |a AS (SELECT word, CAST(count(*) AS BIGINT) AS df,
      |    CAST(sum(c) AS BIGINT) AS cf,
      |    CAST(count(*) FILTER (c >= 2) AS BIGINT) AS df2
      |  FROM wd GROUP BY 1)
      |SELECT word, df, cf,
      |  (cf * 1000) // df AS burstiness_milli,
      |  (df2 * 1000000) // df AS adaptation_ppm
      |FROM a WHERE df >= 20
      |ORDER BY burstiness_milli DESC, word LIMIT 20""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val wd = toks.groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("c"))
    val a = wd.groupBy(col("word")).agg(
      count(lit(1)).cast("long").as("df"),
      sum(col("c")).cast("long").as("cf"),
      count(when(col("c") >= 2, 1)).cast("long").as("df2"))
    a.filter(col("df") >= 20)
      .select(col("word"), col("df"), col("cf"),
        Binning.floorDivCol(col("cf") * lit(1000L), col("df")).as("burstiness_milli"),
        Binning.floorDivCol(col("df2") * lit(1000000L), col("df")).as("adaptation_ppm"))
      .orderBy(col("burstiness_milli").desc, col("word"))
      .limit(20)
  }

  /** Good–Turing count-of-counts estimates (#385, Good 1953): for
    * each low count r = 1..5, the frequency-of-frequencies N_r and
    * the GT-adjusted count r* = (r+1)·N_{r+1}/N_r — the unseen-mass
    * machinery under every smoothed LM (and the literal discount KN
    * (#123) approximates with a constant). The observed mass at r=1,
    * p₁ = N₁/N, IS the GT estimate of the unseen-species mass — the
    * "how much vocabulary haven't we crawled yet" number next to
    * Chao1 (#331, which estimates unseen TYPES, not mass). Runs over
    * word TRIGRAMS — the n-gram order whose count spectrum actually
    * has a low-count tail (the unigram vocab saturates; GT on it is
    * vacuous) and the granularity the backoff LMs (#102) smooth. One
    * trigram aggregate + one count-of-counts aggregate (bounded by
    * the distinct-count domain) + a self-join on r+1; exact
    * micro/ppm floors throughout.
    */
  val qGoodTuring = GateQuery.sql(
    "q_good_turing",
    """WITH tw AS (SELECT string_split(text, ' ') AS w FROM documents),
      |tri AS (SELECT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |    for i in range(1, len(w) - 1)]) AS g
      |  FROM tw WHERE len(w) >= 3),
      |gc AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM tri GROUP BY 1),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM gc),
      |cc AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM gc
      |  WHERE c <= 6 GROUP BY 1)
      |SELECT a.r, a.n_r, coalesce(b.n_r, 0) AS n_r_next,
      |  ((a.r + 1) * coalesce(b.n_r, 0) * 1000000) // a.n_r AS r_star_micro,
      |  (a.r * a.n_r * 1000000) // t.n AS mass_ppm
      |FROM cc a LEFT JOIN cc b ON b.r = a.r + 1, t
      |WHERE a.r <= 5 ORDER BY a.r""".stripMargin) { (s, d) =>
    val tw = Tables.documents(s, d)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
    val tri = tw
      .select(col("w"), posexplode(slice(col("w"), lit(1), size(col("w")) - 2))
        .as(Seq("p", "w1")))
      .select(concat_ws(" ", col("w1"),
        element_at(col("w"), col("p") + 2),
        element_at(col("w"), col("p") + 3)).as("g"))
    val wc = tri.groupBy(col("g")).agg(count(lit(1)).cast("long").as("c"))
    val t = wc.agg(sum(col("c")).cast("long").as("n"))
    val cc = wc.filter(col("c") <= 6)
      .groupBy(col("c").as("r")).agg(count(lit(1)).cast("long").as("n_r"))
    val j = cc.as("a")
      .join(cc.select((col("r") - 1).as("r"), col("n_r").as("n_r_next")).as("b"),
        Seq("r"), "left")
    Curation.withStats(j, t)
      .filter(col("r") <= 5)
      .select(col("r"), col("n_r"),
        coalesce(col("n_r_next"), lit(0L)).as("n_r_next"),
        Binning.floorDivCol(
          (col("r") + 1) * coalesce(col("n_r_next"), lit(0L)) * lit(1000000L),
          col("n_r")).as("r_star_micro"),
        Binning.floorDivCol(col("r") * col("n_r") * lit(1000000L), col("n"))
          .as("mass_ppm"))
      .orderedSmall(col("r"))
  }

  /** Yule's K vocabulary-richness characteristic (#386, Yule 1944):
    * per source, K = 10⁴·(Σc² − N)/N² over the word-count vector —
    * the repeat-rate statistic that is (unlike raw TTR #137)
    * asymptotically length-invariant, which is exactly what makes it
    * comparable ACROSS sources of different sizes; the stylometric
    * companion of Burrows' Delta (#347). Two hash aggregates;
    * Σc² decimal-lifted (squares past long at corpus scale); K as
    * an exact milli floor of nonnegative integers (Σc² ≥ N always).
    */
  val qYuleK = GateQuery.sql(
    "q_yule_k",
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS word
      |              FROM documents),
      |wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
      |  FROM toks GROUP BY 1, 2),
      |a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS v,
      |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
      |  FROM wc GROUP BY 1)
      |SELECT source, n AS n_tokens, v AS n_types,
      |  CAST((CAST(s2 - n AS HUGEINT) * 10000 * 1000)
      |    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS yule_k_milli
      |FROM a ORDER BY source""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
    val wc = toks.groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("long").as("c"))
    val a = wc.groupBy(col("source")).agg(
      sum(col("c")).cast("long").as("n"),
      count(lit(1)).cast("long").as("v"),
      sum(col("c").cast("decimal(38,0)") * col("c")).cast("decimal(38,0)").as("s2"))
    a.select(col("source"), col("n").as("n_tokens"), col("v").as("n_types"),
        Exact.floorDivBig(
          (col("s2") - col("n")) * lit(10000L) * lit(1000L),
          col("n").cast("decimal(38,0)") * col("n")).cast("long")
          .as("yule_k_milli"))
      .orderedSmall(col("source"))
  }

  /** Weight of evidence + information value (#407, the credit-
    * scoring binning diagnostic, Siddiqi 2006): per length decile,
    * WoE = ln(good-share/bad-share) for the lang='en' label, and
    * IV = Σ(Δshare·WoE) — the standard "is this feature worth
    * binning into the model" number (IV < 0.02 useless, > 0.3
    * strong), sharper than a single AUC because it localizes WHERE
    * the feature separates. Same decile relation as #209; +1
    * Laplace cells (mirrored) keep zero buckets finite; WoE is an
    * exact micro-nat difference mln(g_b·B) − mln(b_b·G); IV terms
    * are exact integer products floored per bucket then summed
    * exactly (windowed over ≤10 rows).
    */
  val qWoeIv = GateQuery.sql(
    "q_woe_iv", {
      val mln = Curation.microLnSql _
      s"""WITH s AS (SELECT 1 + max(n_chars) AS mx FROM documents),
         |p AS (SELECT (n_chars * 10) // mx AS bucket,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents, s),
         |b AS (SELECT bucket, CAST(sum(y) + 1 AS BIGINT) AS g,
         |    CAST(count(*) - sum(y) + 1 AS BIGINT) AS bd
         |  FROM p GROUP BY 1),
         |t AS (SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(bd) AS BIGINT) AS bt
         |  FROM b),
         |w AS (SELECT bucket, g, bd,
         |    ${mln("CAST(g AS HUGEINT) * bt")} - ${mln("CAST(bd AS HUGEINT) * gt")}
         |      AS woe_micro,
         |    (g * 1000000) // gt - (bd * 1000000) // bt AS dshare_ppm
         |  FROM b, t)
         |SELECT bucket, g - 1 AS n_good, bd - 1 AS n_bad,
         |  CAST(woe_micro AS BIGINT) AS woe_micro,
         |  CAST(sum((dshare_ppm * woe_micro) // 1000000) OVER () AS BIGINT)
         |    AS iv_micro
         |FROM w ORDER BY bucket""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import Curation.microLn
    val docs = Tables.documents(s, d)
    val mx = docs.agg((lit(1L) + max(col("n_chars"))).as("mx"))
    val p = Curation.withStats(docs.select(col("n_chars"), col("lang")), mx)
      .select(Binning.floorDivCol(col("n_chars") * lit(10L), col("mx")).as("bucket"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val b = p.groupBy(col("bucket")).agg(
      (sum(col("y")) + 1).cast("long").as("g"),
      (count(lit(1)) - sum(col("y")) + 1).cast("long").as("bd"))
    val t = b.agg(sum(col("g")).cast("long").as("gt"),
      sum(col("bd")).cast("long").as("bt"))
    val w = Curation.withStats(b, t).select(col("bucket"), col("g"), col("bd"),
      (microLn(col("g").cast("decimal(38,0)") * col("bt")) -
        microLn(col("bd").cast("decimal(38,0)") * col("gt"))).as("woe_micro"),
      (Binning.floorDivCol(col("g") * lit(1000000L), col("gt")) -
        Binning.floorDivCol(col("bd") * lit(1000000L), col("bt"))).as("dshare_ppm"))
    // signed product floor: DuckDB's // truncates toward zero only for
    // nonnegative operands; dshare·woe can be negative, so decompose
    val prod = col("dshare_ppm") * col("woe_micro")
    val term = when(prod >= 0, Binning.floorDivCol(prod, lit(1000000L)))
      .otherwise(-Binning.floorDivCol(-prod, lit(1000000L)))
    w.select(col("bucket"), (col("g") - 1).as("n_good"), (col("bd") - 1).as("n_bad"),
        col("woe_micro").cast("long").as("woe_micro"),
        sum(term).over(Window.partitionBy()).cast("long").as("iv_micro"))
      .orderedSmall(col("bucket"))
  }

  /** Context-length truncation-loss curve (#402): for each candidate
    * context length L, the share of documents that overflow and the
    * share of TOKENS lost to truncation — the pretraining-planning
    * number behind choosing a context window (and the sibling of
    * packing #60, which salvages what this gate quantifies; chunking
    * #117 is the other mitigation). Per-doc token counts explode
    * against the literal L-grid (6 rows per doc — a column, not a
    * join, so no nested loop) and one hash aggregate per L; losses
    * are exact ppm floors.
    */
  val qTruncationLoss = GateQuery.sql(
    "q_truncation_loss",
    """WITH d AS (SELECT len(string_split(text, ' ')) AS ntok FROM documents),
      |t AS (SELECT CAST(sum(ntok) AS BIGINT) AS total,
      |    CAST(count(*) AS BIGINT) AS ndocs FROM d),
      |g AS (SELECT ntok, unnest([128, 256, 512, 1024, 2048, 4096]) AS l FROM d),
      |a AS (SELECT l, CAST(count(CASE WHEN ntok > l THEN 1 END) AS BIGINT) AS docs_over,
      |    CAST(sum(greatest(ntok - l, 0)) AS BIGINT) AS tokens_lost
      |  FROM g GROUP BY 1)
      |SELECT l AS context_len, docs_over, tokens_lost,
      |  (docs_over * 1000000) // t.ndocs AS docs_over_ppm,
      |  (tokens_lost * 1000000) // t.total AS tokens_lost_ppm
      |FROM a, t ORDER BY l""".stripMargin) { (s, d) =>
    val dd = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast("long").as("ntok"))
    val t = dd.agg(sum(col("ntok")).cast("long").as("total"),
      count(lit(1)).cast("long").as("ndocs"))
    val g = dd.select(col("ntok"),
      explode(lit(Array(128L, 256L, 512L, 1024L, 2048L, 4096L))).as("l"))
    val a = g.groupBy(col("l")).agg(
      count(when(col("ntok") > col("l"), 1)).cast("long").as("docs_over"),
      sum(greatest(col("ntok") - col("l"), lit(0L))).cast("long").as("tokens_lost"))
    Curation.withStats(a, t)
      .select(col("l").as("context_len"), col("docs_over"), col("tokens_lost"),
        Binning.floorDivCol(col("docs_over") * lit(1000000L), col("ndocs"))
          .as("docs_over_ppm"),
        Binning.floorDivCol(col("tokens_lost") * lit(1000000L), col("total"))
          .as("tokens_lost_ppm"))
      .orderedSmall(col("context_len"))
  }

  /** Heaps' law vocabulary-growth fit (#395, Heaps 1978): V(n) ≈
    * K·n^β over corpus-order prefixes — the growth EXPONENT the
    * coverage curve (#279) plots but never fits, and the capacity
    *-planning number for vocab tables (β ≈ 0.5 natural text; β → 0
    * = the corpus has stopped teaching new types, the same signal
    * Chao1 #331 reads cross-sectionally). Types are word TRIGRAMS —
    * the order whose type inventory actually grows (#385's
    * rationale: the unigram vocab saturates in the first decile and
    * β degenerates to 0). Docs split into ten corpus-order chunks by
    * equal spans of the ingest-ordered doc_id SPACE (r12: rank-free
    * — one min/max scalar instead of a corpus-wide row_number, which
    * was a single-task sort of every document; on the dense
    * sequential ids corpora actually carry the spans ARE the
    * equal-count deciles, and the growth fit only needs ten ordered
    * checkpoints, not exact-count ones); each trigram charges its
    * FIRST-occurrence chunk (one type aggregate + an equi-join
    * back); cumulative (n_k, V_k) over the 10 chunk rows; β is the
    * log-log regression slope over the checkpoints, micro-ln
    * quantized inputs and one mirrored double out.
    */
  val qHeapsLaw = GateQuery.sql(
    "q_heaps_law", {
      val mln = Curation.microLnSql _
      s"""WITH dt AS (SELECT doc_id,
         |    greatest(len(string_split(text, ' ')) - 2, 0) AS ntok
         |  FROM documents),
         |bb AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM dt),
         |dd AS (SELECT doc_id, ntok,
         |    ((doc_id - mn) * 10) // (mx - mn + 1) + 1 AS k FROM dt, bb),
         |tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tri AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |    for i in range(1, len(w) - 1)]) AS word
         |  FROM tw WHERE len(w) >= 3),
         |fw AS (SELECT min(doc_id) AS fdoc FROM tri GROUP BY word),
         |nv AS (SELECT dd.k, CAST(count(*) AS BIGINT) AS newv
         |  FROM fw JOIN dd ON fw.fdoc = dd.doc_id GROUP BY 1),
         |tk AS (SELECT k, CAST(sum(ntok) AS BIGINT) AS tok FROM dd GROUP BY 1),
         |cum AS (SELECT tk.k,
         |    CAST(sum(tk.tok) OVER (ORDER BY tk.k) AS BIGINT) AS n_tokens,
         |    CAST(sum(coalesce(nv.newv, 0)) OVER (ORDER BY tk.k) AS BIGINT) AS n_types
         |  FROM tk LEFT JOIN nv ON tk.k = nv.k),
         |lg AS (SELECT k, n_tokens, n_types,
         |    ${mln("n_tokens")} AS x, ${mln("n_types")} AS y FROM cum),
         |rg AS (SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM lg)
         |SELECT lg.k, lg.n_tokens, lg.n_types,
         |  CASE WHEN rg.m * rg.sxx - rg.sx * rg.sx <> 0 THEN
         |    round(CAST(rg.m * rg.sxy - rg.sx * rg.sy AS DOUBLE)
         |      / CAST(rg.m * rg.sxx - rg.sx * rg.sx AS DOUBLE), 4) + 0.0
         |  END AS heaps_beta
         |FROM lg, rg ORDER BY lg.k""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import Curation.microLn
    val docs = Tables.documents(s, d)
    val dt = docs.select(col("doc_id"),
      greatest(size(split(col("text"), " ")).cast("long") - 2, lit(0L)).as("ntok"))
    val bb = dt.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val dd = Curation.withStats(dt, bb).select(col("doc_id"), col("ntok"),
      (Binning.floorDivCol((col("doc_id") - col("mn")) * lit(10L),
        col("mx") - col("mn") + lit(1L)) + 1).as("k"))
    val tw = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
    val tri = tw
      .select(col("doc_id"), col("w"),
        posexplode(slice(col("w"), lit(1), size(col("w")) - 2)).as(Seq("p", "w1")))
      .select(col("doc_id"), concat_ws(" ", col("w1"),
        element_at(col("w"), col("p") + 2),
        element_at(col("w"), col("p") + 3)).as("word"))
    val fw = tri.groupBy(col("word")).agg(min(col("doc_id")).as("fdoc"))
    val nv = fw.join(dd.select(col("doc_id").as("fdoc"), col("k")), "fdoc")
      .groupBy(col("k")).agg(count(lit(1)).cast("long").as("newv"))
    val tk = dd.groupBy(col("k")).agg(sum(col("ntok")).cast("long").as("tok"))
    val wk = Window.orderBy(col("k"))
    val cum = tk.join(nv, Seq("k"), "left")
      .withColumn("n_tokens", sum(col("tok")).over(wk).cast("long"))
      .withColumn("n_types",
        sum(coalesce(col("newv"), lit(0L))).over(wk).cast("long"))
      .select(col("k"), col("n_tokens"), col("n_types"))
    val lg = cum.select(col("k"), col("n_tokens"), col("n_types"),
      microLn(col("n_tokens")).as("x"), microLn(col("n_types")).as("y"))
    val rg = lg.agg(count(lit(1)).cast("long").as("m"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)").as("sxx"),
      sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("sxy"))
    val md = col("m").cast("decimal(38,0)")
    val det = md * col("sxx") - col("sx") * col("sx")
    Curation.withStats(lg, rg)
      .select(col("k"), col("n_tokens"), col("n_types"),
        when(det =!= 0,
          round((md * col("sxy") - col("sx") * col("sy")).cast("double") /
            det.cast("double"), 4) + lit(0.0)).as("heaps_beta"))
      .orderedSmall(col("k"))
  }

  /** Iterative proportional fitting / raking (#393, Deming &
    * Stephan 1940): calibrate the (event_type × cohort) count table
    * to UNIFORM target margins on both axes by alternately scaling
    * rows then columns, 3 full rounds — the survey-weighting /
    * mix-calibration workhorse that generalizes the 1-D source
    * rebalance (#92) to two constraints at once (e.g. "equal share
    * per source AND per language" for a training mix). Weights stay
    * exact micro integers: each round is two window-sum scalings
    * with floor divisions mirrored verbatim (the rounding ORDER is
    * part of the spec, so parity is exact, not approximate); the
    * k_r×k_c table is bounded by the category domains, never data.
    */
  val qIpfRaking = GateQuery.sql(
    "q_ipf_raking", {
      def roundSql(src: String, axis: String): String =
        s"""SELECT et, g,
           |    (w * ((tgt$axis * 1000000)
           |      // CAST(sum(w) OVER (PARTITION BY $axis) AS HUGEINT))) // 1000000 AS w,
           |    tgtet, tgtg
           |  FROM $src""".stripMargin
      s"""WITH a AS (SELECT event_type AS et, user_id % 4 AS g,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
         |    CAST(count(DISTINCT et) AS BIGINT) AS kr,
         |    CAST(count(DISTINCT g) AS BIGINT) AS kc FROM a),
         |w0 AS (SELECT et, g, CAST(n AS HUGEINT) * 1000000 AS w,
         |    (nt * 1000000) // kr AS tgtet, (nt * 1000000) // kc AS tgtg
         |  FROM a, t),
         |r1 AS (${roundSql("w0", "et")}), c1 AS (${roundSql("r1", "g")}),
         |r2 AS (${roundSql("c1", "et")}), c2 AS (${roundSql("r2", "g")}),
         |r3 AS (${roundSql("c2", "et")}), c3 AS (${roundSql("r3", "g")})
         |SELECT c3.et AS et, c3.g AS g, a.n, CAST(c3.w AS BIGINT) AS w_micro
         |FROM c3 JOIN a ON c3.et = a.et AND c3.g = a.g
         |ORDER BY c3.et, c3.g""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val a = ev.groupBy(col("event_type").as("et"),
        pmod(col("user_id"), lit(4L)).as("g"))
      .agg(count(lit(1)).cast("long").as("n"))
    val t = a.agg(sum(col("n")).cast("long").as("nt"),
      countDistinct(col("et")).cast("long").as("kr"),
      countDistinct(col("g")).cast("long").as("kc"))
    val w0 = Curation.withStats(a, t).select(col("et"), col("g"),
      (col("n").cast("decimal(38,0)") * lit(1000000L)).as("w"),
      Binning.floorDivCol(col("nt") * lit(1000000L), col("kr")).as("tgtet"),
      Binning.floorDivCol(col("nt") * lit(1000000L), col("kc")).as("tgtg"))
    def scale(df: org.apache.spark.sql.DataFrame, axis: String,
              tgt: String): org.apache.spark.sql.DataFrame = {
      val axisSum = sum(col("w")).over(Window.partitionBy(col(axis)))
        .cast("decimal(38,0)")
      df.select(col("et"), col("g"),
        Exact.floorDivBig(
          col("w") * Exact.floorDivBig(
            col(tgt).cast("decimal(38,0)") * lit(1000000L), axisSum),
          lit(1000000L)).as("w"),
        col("tgtet"), col("tgtg"))
    }
    val c3 = Seq(("et", "tgtet"), ("g", "tgtg"), ("et", "tgtet"),
        ("g", "tgtg"), ("et", "tgtet"), ("g", "tgtg"))
      .foldLeft(w0) { case (df, (ax, tg)) => scale(df, ax, tg) }
    c3.join(a, Seq("et", "g"))
      .select(col("et"), col("g"), col("n"), col("w").cast("long").as("w_micro"))
      .orderedSmall(col("et"), col("g"))
  }

  val all: Seq[GateQuery] =
    Seq(qLineDedup, qLmPerplexity, qDsirWeights, qMixRebalance, qSubstrDedup,
      qLmBigram, qLmTrigram, qDsirSelect, qQualityClassifier, qCurationPipeline,
      qFimSplit, qPplBuckets, qDomainCap, qMadOutliers, qLmKn, qMixTemperature,
      qTtr, qKlMix, qDocEntropy, qZipfFit, qMinkPct, qBoilerplate, qOovRate,
      qNegativeSampling, qQuantileNorm, qHillTail, qCvAuc, qCondEntropy,
      qMooreLewis, qMooreLewisBigram, qChao1, qBurrowsDelta, qSourceHhi,
      qLcpClones, qBurstiness, qGoodTuring, qYuleK, qIpfRaking, qHeapsLaw,
      qTruncationLoss, qWoeIv)
}
