package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Binning, Curation, Exact}
import graft.operators.Exact.centsSql

/** Classifier-evaluation / statistical-testing completions
  * (SURVEY.md §2 #207–#212): confusion-matrix metrics, Brier score,
  * expected calibration error, Cohen's kappa, one-way ANOVA and the
  * Mann–Whitney U test — the remaining audit metrics a production
  * quality-filter pipeline reads before trusting a threshold, next
  * to the existing AUC / reliability / average-precision / NDCG
  * family.
  *
  * Discipline is SURVEY.md §4 throughout: scores quantized to exact
  * integer ppm BEFORE any aggregate, integer floor division only on
  * NONNEGATIVE numerators (sign-decomposed otherwise), per-term
  * products lifted to decimal(38,0)/HUGEINT before multiplication
  * (overflow-before-cast is the #1 cross-engine trap), and doubles
  * confined to final closed forms mirrored textually.
  *
  * Scale shapes: every gate is one or two hash aggregates whose
  * keyed relations are bounded by the VALUE DOMAIN (distinct scores,
  * buckets, cohorts) — never a per-row global sort; corpus-wide
  * scalars (means, maxima) ride 1-row broadcasts.
  */
object EvalQueries {

  /** Shared DuckDB prep over events (mirror of [[ev]]). */
  private val E: String =
    """(SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |   (epoch_us(ts) // 1000000) - 1704067200 AS xs,
      |   CAST(value AS DECIMAL(18,2)) AS vd, event_type
      | FROM events)""".stripMargin

  /** Shared Spark prep — mirror of [[E]]. */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("ts_us"),
      (expr("ts_us div 1000000") - lit(1704067200L)).as("xs"),
      col("value").cast("decimal(18,2)").as("vd"),
      col("event_type"))

  import Exact.{floorDivBig, floorDivBigSql}

  /** Confusion-matrix metrics (#207): tp/fp/fn/tn and the derived
    * precision / recall / F1 / accuracy of the length-thresholded
    * lang='en' classifier (the same score/label derivation as
    * #175's AUC, so the two gates audit the SAME ranker at one
    * operating point vs across all of them). The threshold is the
    * corpus mean length (floored — exact on both engines) riding a
    * 1-row broadcast; then ONE conditional aggregate. Every rate in
    * exact ppm via nonnegative floor division.
    */
  val qConfusion = GateQuery.sql(
    "q_confusion",
    """WITH s AS (SELECT CAST(sum(n_chars) // count(*) AS BIGINT) AS t FROM documents),
      |c AS (SELECT
      |    count(*) FILTER (n_chars > t AND lang = 'en') AS tp,
      |    count(*) FILTER (n_chars > t AND lang <> 'en') AS fp,
      |    count(*) FILTER (n_chars <= t AND lang = 'en') AS fn,
      |    count(*) FILTER (n_chars <= t AND lang <> 'en') AS tn,
      |    any_value(t) AS t
      |  FROM documents, s)
      |SELECT CAST(t AS BIGINT) AS threshold, CAST(tp AS BIGINT) AS tp,
      |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
      |  (tp * 1000000) // (tp + fp) AS precision_ppm,
      |  (tp * 1000000) // (tp + fn) AS recall_ppm,
      |  (2 * tp * 1000000) // (2 * tp + fp + fn) AS f1_ppm,
      |  ((tp + tn) * 1000000) // (tp + fp + fn + tn) AS accuracy_ppm
      |FROM c""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val t = docs.agg(floorDivBig(sum(col("n_chars")), count(lit(1))).cast("long").as("t"))
    val c = Curation.withStats(docs.select(col("n_chars"), col("lang")), t)
      .agg(
        count(when(col("n_chars") > col("t") && col("lang") === "en", 1)).as("tp"),
        count(when(col("n_chars") > col("t") && col("lang") =!= "en", 1)).as("fp"),
        count(when(col("n_chars") <= col("t") && col("lang") === "en", 1)).as("fn"),
        count(when(col("n_chars") <= col("t") && col("lang") =!= "en", 1)).as("tn"),
        first(col("t")).as("t"))
    c.select(col("t").cast("long").as("threshold"),
      col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
      col("fn").cast("long").as("fn"), col("tn").cast("long").as("tn"),
      Binning.floorDivCol(col("tp") * lit(1000000L), col("tp") + col("fp")).as("precision_ppm"),
      Binning.floorDivCol(col("tp") * lit(1000000L), col("tp") + col("fn")).as("recall_ppm"),
      Binning.floorDivCol(lit(2L) * col("tp") * lit(1000000L),
        lit(2L) * col("tp") + col("fp") + col("fn")).as("f1_ppm"),
      Binning.floorDivCol((col("tp") + col("tn")) * lit(1000000L),
        col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy_ppm"))
  }

  /** Brier score (#208): mean squared error of a PROBABILISTIC
    * prediction — here p = n_chars/(1+max) in exact ppm (the same
    * normalized-length score as #176's reliability deciles) against
    * the lang='en' label. Each squared gap (p_ppm − y·1e6)² ≤ 1e12 is
    * an exact integer accumulated in decimal(38,0)/HUGEINT (a 100 TB
    * corpus overflows a long sum), so brier_ppm is engine-exact.
    * One 1-row broadcast (the max) + one aggregate.
    */
  val qBrier = GateQuery.sql(
    "q_brier",
    """WITH s AS (SELECT 1 + max(n_chars) AS mx FROM documents),
      |p AS (SELECT (n_chars * 1000000) // mx AS p_ppm,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents, s),
      |a AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
      |    CAST(sum(p_ppm) AS HUGEINT) AS sp,
      |    CAST(sum(CAST(p_ppm - y * 1000000 AS HUGEINT)
      |      * (p_ppm - y * 1000000)) AS HUGEINT) AS sq
      |  FROM p)
      |SELECT CAST(n AS BIGINT) AS n, n_pos,
      |  CAST(sp // n AS BIGINT) AS mean_p_ppm,
      |  (n_pos * 1000000) // n AS base_rate_ppm,
      |  CAST(sq // (n * 1000000) AS BIGINT) AS brier_ppm
      |FROM a""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val mx = docs.agg((lit(1L) + max(col("n_chars"))).as("mx"))
    val p = Curation.withStats(docs.select(col("n_chars"), col("lang")), mx)
      .select(Binning.floorDivCol(col("n_chars") * lit(1000000L), col("mx")).as("p_ppm"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))
    val gap = col("p_ppm").cast("decimal(38,0)") - col("y") * lit(1000000L)
    val a = p.agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n_pos"),
      sum(col("p_ppm")).cast("decimal(38,0)").as("sp"),
      sum(gap * gap).cast("decimal(38,0)").as("sq"))
    a.select(col("n").cast("long").as("n"), col("n_pos"),
      floorDivBig(col("sp"), col("n")).cast("long").as("mean_p_ppm"),
      Binning.floorDivCol(col("n_pos") * lit(1000000L), col("n")).as("base_rate_ppm"),
      floorDivBig(col("sq"), col("n").cast("decimal(38,0)") * lit(1000000L))
        .cast("long").as("brier_ppm"))
  }

  /** Expected calibration error (#209): the single-number summary of
    * #176's reliability diagram — Σ_b (n_b/N)·|acc_b − conf_b|, which
    * telescopes to Σ_b |pos_b·1e6 − Σp_ppm_b| / N: ENTIRELY exact
    * integers (no per-bucket division ever happens, so no rounding
    * order to disagree on). Also reports the worst single-bucket
    * calibration gap. One decile aggregate + one final aggregate.
    */
  val qEce = GateQuery.sql(
    "q_ece",
    """WITH s AS (SELECT 1 + max(n_chars) AS mx FROM documents),
      |p AS (SELECT (n_chars * 10) // mx AS bucket,
      |    (n_chars * 1000000) // mx AS p_ppm,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents, s),
      |b AS (SELECT bucket, count(*) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b,
      |    CAST(sum(p_ppm) AS HUGEINT) AS sp_b
      |  FROM p GROUP BY bucket)
      |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
      |  CAST(sum(n_b) AS BIGINT) AS n,
      |  CAST(CAST(sum(abs(pos_b * 1000000 - sp_b)) AS HUGEINT)
      |    // CAST(sum(n_b) AS HUGEINT) AS BIGINT) AS ece_ppm,
      |  CAST(max(abs(pos_b * 1000000 - sp_b) // n_b) AS BIGINT) AS max_gap_ppm
      |FROM b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val mx = docs.agg((lit(1L) + max(col("n_chars"))).as("mx"))
    val p = Curation.withStats(docs.select(col("n_chars"), col("lang")), mx)
      .select(Binning.floorDivCol(col("n_chars") * lit(10L), col("mx")).as("bucket"),
        Binning.floorDivCol(col("n_chars") * lit(1000000L), col("mx")).as("p_ppm"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))
    val b = p.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"), sum(col("y")).cast("long").as("pos_b"),
        sum(col("p_ppm")).cast("decimal(38,0)").as("sp_b"))
    val gapB = abs(col("pos_b").cast("decimal(38,0)") * lit(1000000L) - col("sp_b"))
    b.agg(count(lit(1)).as("nb"), sum(col("n_b")).cast("decimal(38,0)").as("n"),
        sum(gapB).cast("decimal(38,0)").as("g"),
        max(floorDivBig(gapB, col("n_b"))).cast("long").as("max_gap_ppm"))
      .select(col("nb").cast("long").as("n_buckets"), col("n").cast("long").as("n"),
        floorDivBig(col("g"), col("n")).cast("long").as("ece_ppm"),
        col("max_gap_ppm"))
  }

  /** Murphy decomposition of the Brier score (#378, Murphy 1973):
    * Brier = REL − RES + UNC over the #176/#209 deciles — the
    * diagnosis behind the single numbers: REL (reliability) is the
    * calibration error #209 squares, RES (resolution) is how much the
    * forecast actually separates outcomes, UNC the irreducible base-
    * rate variance. A score can have a great Brier (#208) purely by
    * base rate; this gate says which component earns it. Same decile
    * relation as #209 (one bounded aggregate); totals ride a 1-row
    * broadcast back over the ≤10 bucket rows; per-bucket terms
    * (sp_b − pos_b·1e6)²//n_b and (pos_b·1e6 − n_b·base_ppm)²//n_b
    * are exact integer floors of nonnegative squares (decimal-lifted
    * — n_b²·1e12 ≈ 1e32 at corpus scale, far past long), so every
    * component is engine-exact in ppm²; the identity row
    * brier_bins = REL − RES + UNC is plain long arithmetic.
    */
  val qMurphy = GateQuery.sql(
    "q_murphy",
    """WITH s AS (SELECT 1 + max(n_chars) AS mx FROM documents),
      |p AS (SELECT (n_chars * 10) // mx AS bucket,
      |    (n_chars * 1000000) // mx AS p_ppm,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents, s),
      |b AS (SELECT bucket, count(*) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b,
      |    CAST(sum(p_ppm) AS HUGEINT) AS sp_b
      |  FROM p GROUP BY bucket),
      |g AS (SELECT CAST(sum(n_b) AS HUGEINT) AS n,
      |    CAST(sum(pos_b) AS HUGEINT) AS pos FROM b),
      |t AS (SELECT n_b, pos_b, sp_b, n, pos,
      |    (pos * 1000000) // n AS base_ppm FROM b, g),
      |a AS (SELECT any_value(n) AS n, any_value(pos) AS pos,
      |    any_value(base_ppm) AS base_ppm, count(*) AS n_buckets,
      |    sum((sp_b - CAST(pos_b AS HUGEINT) * 1000000)
      |      * (sp_b - CAST(pos_b AS HUGEINT) * 1000000) // n_b) AS rel_num,
      |    sum((CAST(pos_b AS HUGEINT) * 1000000 - CAST(n_b AS HUGEINT) * base_ppm)
      |      * (CAST(pos_b AS HUGEINT) * 1000000 - CAST(n_b AS HUGEINT) * base_ppm)
      |      // n_b) AS res_num
      |  FROM t)
      |SELECT CAST(n AS BIGINT) AS n, CAST(n_buckets AS BIGINT) AS n_buckets,
      |  CAST(base_ppm AS BIGINT) AS base_rate_ppm,
      |  CAST(rel_num // n AS BIGINT) AS rel_ppm2,
      |  CAST(res_num // n AS BIGINT) AS res_ppm2,
      |  CAST((pos * (n - pos) * 1000000000000) // (n * n) AS BIGINT) AS unc_ppm2,
      |  CAST(rel_num // n - res_num // n
      |    + (pos * (n - pos) * 1000000000000) // (n * n) AS BIGINT) AS brier_bins_ppm2
      |FROM a""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val mx = docs.agg((lit(1L) + max(col("n_chars"))).as("mx"))
    val p = Curation.withStats(docs.select(col("n_chars"), col("lang")), mx)
      .select(Binning.floorDivCol(col("n_chars") * lit(10L), col("mx")).as("bucket"),
        Binning.floorDivCol(col("n_chars") * lit(1000000L), col("mx")).as("p_ppm"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))
    val b = p.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"), sum(col("y")).cast("long").as("pos_b"),
        sum(col("p_ppm")).cast("decimal(38,0)").as("sp_b"))
    val g = b.agg(sum(col("n_b")).cast("decimal(38,0)").as("n"),
      sum(col("pos_b")).cast("decimal(38,0)").as("pos"))
    val t = Curation.withStats(b, g)
      .withColumn("base_ppm", floorDivBig(col("pos") * lit(1000000L), col("n")))
    val relGap = col("sp_b") - col("pos_b").cast("decimal(38,0)") * lit(1000000L)
    val resGap = col("pos_b").cast("decimal(38,0)") * lit(1000000L) -
      col("n_b").cast("decimal(38,0)") * col("base_ppm")
    val a = t.agg(first(col("n")).as("n"), first(col("pos")).as("pos"),
      first(col("base_ppm")).as("base_ppm"), count(lit(1)).as("n_buckets"),
      sum(floorDivBig(relGap * relGap, col("n_b"))).cast("decimal(38,0)").as("rel_num"),
      sum(floorDivBig(resGap * resGap, col("n_b"))).cast("decimal(38,0)").as("res_num"))
    val rel = floorDivBig(col("rel_num"), col("n")).cast("long")
    val res = floorDivBig(col("res_num"), col("n")).cast("long")
    val unc = floorDivBig(col("pos") * (col("n") - col("pos")) * lit(1000000000000L),
      col("n") * col("n")).cast("long")
    a.select(col("n").cast("long").as("n"),
      col("n_buckets").cast("long").as("n_buckets"),
      col("base_ppm").cast("long").as("base_rate_ppm"),
      rel.as("rel_ppm2"), res.as("res_ppm2"), unc.as("unc_ppm2"),
      (rel - res + unc).as("brier_bins_ppm2"))
  }

  /** Cohen's kappa (#210): chance-corrected agreement between two
    * cheap quality raters (is the doc longer than the mean length?
    * does it have more tokens than the mean count?) — the
    * annotation-audit statistic for weak-label pipelines. All four
    * cell counts from ONE conditional aggregate (means ride a 1-row
    * broadcast); κ = (po·N − pe·N²)/(N² − pe·N²) with both N²-scale
    * terms exact decimals and the final signed ratio HALF_UP-rounded
    * away from zero identically on both engines (κ < 0 is possible,
    * so the floor-vs-truncate trap is dodged by sign decomposition,
    * not clamping).
    */
  val qCohenKappa = GateQuery.sql(
    "q_cohen_kappa",
    """WITH s AS (SELECT CAST(sum(n_chars) // count(*) AS BIGINT) AS mc,
      |    CAST(sum(len(string_split(text, ' '))) // count(*) AS BIGINT) AS mt
      |  FROM documents),
      |r AS (SELECT CASE WHEN n_chars > mc THEN 1 ELSE 0 END AS a,
      |    CASE WHEN len(string_split(text, ' ')) > mt THEN 1 ELSE 0 END AS b
      |  FROM documents, s),
      |c AS (SELECT count(*) AS n,
      |    count(*) FILTER (a = 1 AND b = 1) AS n11,
      |    count(*) FILTER (a = 1 AND b = 0) AS n10,
      |    count(*) FILTER (a = 0 AND b = 1) AS n01,
      |    count(*) FILTER (a = 0 AND b = 0) AS n00
      |  FROM r),
      |k AS (SELECT n, n11, n10, n01, n00,
      |    CAST(n11 + n00 AS HUGEINT) * n AS po_n2,
      |    CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
      |      + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS pe_n2,
      |    CAST(n AS HUGEINT) * n AS n2
      |  FROM c)
      |SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
      |  CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
      |  CAST(n00 AS BIGINT) AS n00,
      |  ((n11 + n00) * 1000000) // n AS po_ppm,
      |  CASE WHEN n2 = pe_n2 THEN NULL ELSE
      |    (CASE WHEN po_n2 - pe_n2 >= 0
      |      THEN (CAST(((po_n2 - pe_n2) * 2000000 + (n2 - pe_n2)) // ((n2 - pe_n2) * 2) AS DOUBLE) / 1000000.0)
      |      ELSE -(CAST(((pe_n2 - po_n2) * 2000000 + (n2 - pe_n2)) // ((n2 - pe_n2) * 2) AS DOUBLE) / 1000000.0) + 0.0
      |    END) END AS kappa
      |FROM k""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("n_chars"), size(split(col("text"), " ")).cast("long").as("ntok"))
    val st = docs.agg(
      floorDivBig(sum(col("n_chars")), count(lit(1))).cast("long").as("mc"),
      floorDivBig(sum(col("ntok")), count(lit(1))).cast("long").as("mt"))
    val r = Curation.withStats(docs, st)
      .select(when(col("n_chars") > col("mc"), 1L).otherwise(0L).as("a"),
        when(col("ntok") > col("mt"), 1L).otherwise(0L).as("b"))
    val c = r.agg(count(lit(1)).as("n"),
      count(when(col("a") === 1 && col("b") === 1, 1)).as("n11"),
      count(when(col("a") === 1 && col("b") === 0, 1)).as("n10"),
      count(when(col("a") === 0 && col("b") === 1, 1)).as("n01"),
      count(when(col("a") === 0 && col("b") === 0, 1)).as("n00"))
    val poN2 = (col("n11") + col("n00")).cast("decimal(38,0)") * col("n")
    val peN2 = (col("n11") + col("n10")).cast("decimal(38,0)") * (col("n11") + col("n01")) +
      (col("n01") + col("n00")).cast("decimal(38,0)") * (col("n10") + col("n00"))
    val n2 = col("n").cast("decimal(38,0)") * col("n")
    val den = n2 - peN2
    def ratio(num: Column): Column =
      (floorDivBig(num * lit(2000000L) + den, den * lit(2L)).cast("double") / lit(1000000.0))
    c.select(col("n").cast("long").as("n"),
      col("n11").cast("long").as("n11"), col("n10").cast("long").as("n10"),
      col("n01").cast("long").as("n01"), col("n00").cast("long").as("n00"),
      Binning.floorDivCol((col("n11") + col("n00")) * lit(1000000L), col("n")).as("po_ppm"),
      when(den === lit(0L).cast("decimal(38,0)"), lit(null).cast("double"))
        .otherwise(when(poN2 - peN2 >= 0, ratio(poN2 - peN2))
          .otherwise(-ratio(peN2 - poN2) + lit(0.0))).as("kappa"))
  }

  /** One-way ANOVA (#211): does mean event value differ across the 8
    * user cohorts? The k-sample generalization of #179's Welch test.
    * Per-group (n, S, Q) accumulate as exact integers in ONE
    * cohort-keyed aggregate (8 rows at any corpus size); the
    * between/within sum-of-squares decomposition runs in micro-scaled
    * exact integers (Σ_g ⌊S_g²·1e6/n_g⌋ — per-group flooring in a
    * FIXED group order both engines share, since integer addition
    * commutes), and F leaves as one exact-ppm floor division.
    */
  val qAnova = GateQuery.sql(
    "q_anova",
    s"""WITH e AS (SELECT user_id % 8 AS g, ${centsSql("vd")} AS c
       |  FROM $E t WHERE event_type IN ('click', 'view', 'purchase')),
       |a AS (SELECT g, count(*) AS n_g, CAST(sum(c) AS BIGINT) AS s_g,
       |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q_g
       |  FROM e GROUP BY g),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS HUGEINT) AS s,
       |    CAST(sum(q_g) AS HUGEINT) AS q,
       |    CAST(sum((CAST(s_g AS HUGEINT) * s_g * 1000000) // n_g) AS HUGEINT) AS a_scaled
       |  FROM a),
       |f AS (SELECT k, n, q,
       |    greatest(a_scaled - (s * s * 1000000) // n, 0) AS ssb_micro,
       |    q * 1000000 - a_scaled AS ssw_micro
       |  FROM t)
       |SELECT k, n, k - 1 AS dof_between, n - k AS dof_within,
       |  CAST(ssb_micro // 1000000 AS BIGINT) AS ssb_cents2,
       |  CAST(ssw_micro // 1000000 AS BIGINT) AS ssw_cents2,
       |  CASE WHEN ssw_micro = 0 OR k <= 1 THEN NULL
       |    ELSE CAST((ssb_micro * (n - k) * 1000000) // (ssw_micro * (k - 1)) AS BIGINT)
       |  END AS f_ppm
       |FROM f""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type").isin("click", "view", "purchase"))
      .select(pmod(col("user_id"), lit(8L)).as("g"), Exact.cents(col("vd")).as("c"))
    val a = e.groupBy(col("g")).agg(
      count(lit(1)).as("n_g"), sum(col("c")).cast("long").as("s_g"),
      sum(col("c").cast("decimal(38,0)") * col("c")).cast("decimal(38,0)").as("q_g"))
    val t = a.agg(
      count(lit(1)).cast("long").as("k"), sum(col("n_g")).cast("long").as("n"),
      sum(col("s_g")).cast("decimal(38,0)").as("s"),
      sum(col("q_g")).cast("decimal(38,0)").as("q"),
      sum(floorDivBig(col("s_g").cast("decimal(38,0)") * col("s_g") * lit(1000000L),
        col("n_g"))).cast("decimal(38,0)").as("a_scaled"))
    val f = t.select(col("k"), col("n"), col("q"),
      greatest(col("a_scaled") - floorDivBig(col("s") * col("s") * lit(1000000L), col("n")),
        lit(0L).cast("decimal(38,0)")).as("ssb_micro"),
      (col("q") * lit(1000000L) - col("a_scaled")).as("ssw_micro"))
    f.select(col("k"), col("n"),
      (col("k") - 1).as("dof_between"), (col("n") - col("k")).as("dof_within"),
      floorDivBig(col("ssb_micro"), lit(1000000L)).cast("long").as("ssb_cents2"),
      floorDivBig(col("ssw_micro"), lit(1000000L)).cast("long").as("ssw_cents2"),
      when(col("ssw_micro") === lit(0L).cast("decimal(38,0)") || col("k") <= 1,
          lit(null).cast("long"))
        .otherwise(floorDivBig(
          col("ssb_micro") * (col("n") - col("k")) * lit(1000000L),
          col("ssw_micro") * (col("k") - 1)).cast("long")).as("f_ppm"))
  }

  /** Two-way ANOVA by unweighted means (#370): cohort × day-part
    * main effects AND their interaction on spend — the factorial
    * upgrade of #211's one-way decomposition (Yates 1934's
    * unweighted-means analysis for mildly unbalanced cells; the
    * interaction F is the "does the daily pattern DIFFER by cohort"
    * question no pair of one-way ANOVAs can ask). Exactness: cell
    * means are HALF_UP micro integers, so row/column/grand mean
    * deviations become EXACT integer contrasts (da = 4·Σ_row −
    * Σ_all, scaled ×16) and the three between sums of squares are
    * exact integer sums P = Σd² (decimal-lifted); SS_W is the #211
    * micro-scaled exact within decomposition; the harmonic cell size
    * uses pico-floored reciprocals (order-free integer sum). Only
    * the final F ratios are mirrored doubles with explicit scale
    * constants. Incomplete 16-cell designs emit zero rows on both
    * engines by the exact cell-count predicate.
    */
  val qTwowayAnova = GateQuery.sql(
    "q_twoway_anova",
    s"""WITH e AS (SELECT user_id % 4 AS a, ((xs // 3600) % 24) // 6 AS b,
       |    ${centsSql("vd")} AS c FROM $E t),
       |cl AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab,
       |    CAST(sum(c) AS BIGINT) AS s_ab,
       |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q_ab
       |  FROM e GROUP BY 1, 2),
       |m AS (SELECT a, b, n_ab, s_ab, q_ab,
       |    (2 * CAST(s_ab AS HUGEINT) * 1000000 + n_ab) // (2 * n_ab) AS m_micro,
       |    (q_ab * 1000000 - (CAST(s_ab AS HUGEINT) * s_ab * 1000000) // n_ab) AS w_micro,
       |    1000000000000 // n_ab AS r_pico
       |  FROM cl),
       |w AS (SELECT a, b, n_ab, m_micro, w_micro, r_pico,
       |    CAST(sum(m_micro) OVER (PARTITION BY a) AS BIGINT) AS sa_q,
       |    CAST(sum(m_micro) OVER (PARTITION BY b) AS BIGINT) AS sb_q,
       |    CAST(sum(m_micro) OVER () AS BIGINT) AS tot_q,
       |    CAST(count(*) OVER () AS BIGINT) AS n_cells
       |  FROM m),
       |s AS (SELECT any_value(n_cells) AS n_cells,
       |    CAST(sum(n_ab) AS BIGINT) AS n,
       |    CAST(sum(CAST(4 * sa_q - tot_q AS HUGEINT) * (4 * sa_q - tot_q)) AS HUGEINT) AS pa,
       |    CAST(sum(CAST(4 * sb_q - tot_q AS HUGEINT) * (4 * sb_q - tot_q)) AS HUGEINT) AS pb,
       |    CAST(sum(CAST(16 * m_micro - 4 * sa_q - 4 * sb_q + tot_q AS HUGEINT)
       |      * (16 * m_micro - 4 * sa_q - 4 * sb_q + tot_q)) AS HUGEINT) AS pab,
       |    CAST(sum(w_micro) AS HUGEINT) AS ssw,
       |    CAST(sum(r_pico) AS BIGINT) AS rsum
       |  FROM w),
       |f AS (SELECT n, pa, pb, pab, ssw, rsum,
       |    16.0 * 1000000000000 / rsum AS nh,
       |    CAST(ssw AS DOUBLE) / (n - 16) AS msw
       |  FROM s WHERE n_cells = 16 AND n > 16 AND ssw > 0)
       |SELECT n AS n_events, round(nh, 4) + 0.0 AS n_harmonic,
       |  round((CAST(pa AS DOUBLE) * nh / (1024.0 * 3.0)) / (msw * 1000000.0), 4) + 0.0 AS f_a,
       |  round((CAST(pb AS DOUBLE) * nh / (1024.0 * 3.0)) / (msw * 1000000.0), 4) + 0.0 AS f_b,
       |  round((CAST(pab AS DOUBLE) * nh / (256.0 * 9.0)) / (msw * 1000000.0), 4) + 0.0 AS f_ab
       |FROM f""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(pmod(col("user_id"), lit(4L)).as("a"),
      Binning.floorDiv(pmod(Binning.floorDiv(col("xs"), 3600L), lit(24L)), 6L).as("b"),
      Exact.cents(col("vd")).as("c"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val cl = e.groupBy(col("a"), col("b")).agg(
      count(lit(1)).cast("long").as("n_ab"),
      sum(col("c")).cast("long").as("s_ab"),
      sum(dec(col("c")) * col("c")).cast("decimal(38,0)").as("q_ab"))
    val m = cl.select(col("a"), col("b"), col("n_ab"), col("s_ab"), col("q_ab"),
      Exact.floorDivBig(lit(2L) * dec(col("s_ab")) * lit(1000000L) + col("n_ab"),
        lit(2L) * col("n_ab")).cast("long").as("m_micro"),
      (col("q_ab") * lit(1000000L) -
        Exact.floorDivBig(dec(col("s_ab")) * col("s_ab") * lit(1000000L), col("n_ab")))
        .as("w_micro"),
      Binning.floorDivCol(lit(1000000000000L), col("n_ab")).as("r_pico"))
    val w = m
      .withColumn("sa_q", sum(col("m_micro")).over(Window.partitionBy(col("a"))).cast("long"))
      .withColumn("sb_q", sum(col("m_micro")).over(Window.partitionBy(col("b"))).cast("long"))
      .withColumn("tot_q", sum(col("m_micro")).over(Window.partitionBy()).cast("long"))
      .withColumn("n_cells", count(lit(1)).over(Window.partitionBy()).cast("long"))
    val da = lit(4L) * col("sa_q") - col("tot_q")
    val db = lit(4L) * col("sb_q") - col("tot_q")
    val dab = lit(16L) * col("m_micro") - lit(4L) * col("sa_q") -
      lit(4L) * col("sb_q") + col("tot_q")
    val st = w.agg(first(col("n_cells")).as("n_cells"),
      sum(col("n_ab")).cast("long").as("n"),
      sum(dec(da) * da).cast("decimal(38,0)").as("pa"),
      sum(dec(db) * db).cast("decimal(38,0)").as("pb"),
      sum(dec(dab) * dab).cast("decimal(38,0)").as("pab"),
      sum(col("w_micro")).cast("decimal(38,0)").as("ssw"),
      sum(col("r_pico")).cast("long").as("rsum"))
    val f = st.filter(col("n_cells") === 16 && col("n") > 16 && col("ssw") > 0)
      .select(col("n"), col("pa"), col("pb"), col("pab"), col("ssw"), col("rsum"),
        (lit(16.0) * lit(1000000000000L) / col("rsum")).as("nh"),
        (col("ssw").cast("double") / (col("n") - 16)).as("msw"))
    f.select(col("n").as("n_events"), (round(col("nh"), 4) + lit(0.0)).as("n_harmonic"),
      (round((col("pa").cast("double") * col("nh") / (lit(1024.0) * lit(3.0))) /
        (col("msw") * lit(1000000.0)), 4) + lit(0.0)).as("f_a"),
      (round((col("pb").cast("double") * col("nh") / (lit(1024.0) * lit(3.0))) /
        (col("msw") * lit(1000000.0)), 4) + lit(0.0)).as("f_b"),
      (round((col("pab").cast("double") * col("nh") / (lit(256.0) * lit(9.0))) /
        (col("msw") * lit(1000000.0)), 4) + lit(0.0)).as("f_ab"))
  }

  /** Cronbach's alpha (#366): internal-consistency reliability of
    * the four day-part spend "items" per user — do the bands measure
    * ONE underlying engagement trait (Cronbach 1951)? The
    * multi-item companion of ICC (#339): α = k/(k−1)·(1 − Σσᵢ²/σ_T²).
    * Missing bands score 0 (a real zero-spend observation, so every
    * user is a complete case). Shape: users pivot to one (b0..b3)
    * row, then ONE global aggregate of ten sufficient statistics
    * (4×(Σx,Σx²) + total (ΣT,ΣT²), decimal-lifted squares); item and
    * total variances and α are mirrored double closed forms;
    * zero total variance → NULL by the exact predicate.
    */
  val qCronbach = GateQuery.sql(
    "q_cronbach", {
      val bands = 0 to 3
      val pivots = bands.map(b =>
        s"coalesce(sum(c) FILTER (band = $b), 0) AS b$b").mkString(",\n    ")
      val sums = bands.map(b =>
        s"CAST(sum(b$b) AS BIGINT) AS s$b, CAST(sum(CAST(b$b AS HUGEINT) * b$b) AS HUGEINT) AS q$b")
        .mkString(",\n    ")
      val itemVar = bands.map(b =>
        s"(CAST(q$b AS DOUBLE) - CAST(s$b AS DOUBLE) * s$b / n)").mkString("\n      + ")
      s"""WITH e AS (SELECT user_id, ((xs // 3600) % 24) // 6 AS band,
         |    ${centsSql("vd")} AS c
         |  FROM $E t),
         |u AS (SELECT user_id,
         |    $pivots
         |  FROM e GROUP BY user_id),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    $sums,
         |    CAST(sum(b0 + b1 + b2 + b3) AS BIGINT) AS st,
         |    CAST(sum(CAST(b0 + b1 + b2 + b3 AS HUGEINT) * (b0 + b1 + b2 + b3)) AS HUGEINT) AS qt
         |  FROM u)
         |SELECT n AS n_users,
         |  CASE WHEN CAST(qt AS HUGEINT) * n = CAST(st AS HUGEINT) * st THEN NULL
         |    ELSE round((4.0 / 3.0) * (1.0 - ($itemVar)
         |      / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)), 6) + 0.0
         |  END AS cronbach_alpha
         |FROM a""".stripMargin
    }) { (s, d) =>
    val e = ev(s, d).select(col("user_id"),
      Binning.floorDiv(pmod(Binning.floorDiv(col("xs"), 3600L), lit(24L)), 6L).as("band"),
      Exact.cents(col("vd")).as("c"))
    val u = e.groupBy(col("user_id")).agg(
      coalesce(sum(when(col("band") === 0, col("c"))), lit(0L)).as("b0"),
      (1 to 3).map(b =>
        coalesce(sum(when(col("band") === b, col("c"))), lit(0L)).as(s"b$b")): _*)
    def dec(x: Column) = x.cast("decimal(38,0)")
    val tot = col("b0") + col("b1") + col("b2") + col("b3")
    val a = u.agg(count(lit(1)).cast("long").as("n"),
      ((0 to 3).flatMap(b => Seq(
        sum(col(s"b$b")).cast("long").as(s"s$b"),
        sum(dec(col(s"b$b")) * col(s"b$b")).cast("decimal(38,0)").as(s"q$b"))) ++ Seq(
        sum(tot).cast("long").as("st"),
        sum(dec(tot) * tot).cast("decimal(38,0)").as("qt"))): _*)
    val itemVar = (0 to 3).map(b =>
      col(s"q$b").cast("double") - col(s"s$b").cast("double") * col(s"s$b") / col("n"))
      .reduce(_ + _)
    val totVar = col("qt").cast("double") - col("st").cast("double") * col("st") / col("n")
    a.select(col("n").as("n_users"),
      when(dec(col("qt")) * col("n") === dec(col("st")) * col("st"),
          lit(null).cast("double"))
        .otherwise(round((lit(4.0) / lit(3.0)) * (lit(1.0) - itemVar / totVar), 6) +
          lit(0.0)).as("cronbach_alpha"))
  }

  /** Split-half reliability with Spearman–Brown step-up (#368): the
    * oldest reliability design (Spearman 1910, Brown 1910) — split
    * each user's spend into odd-hour and even-hour halves, correlate
    * the halves across users, and step up r to full-length
    * reliability 2r/(1+r). Read next to Cronbach's alpha (#366):
    * alpha IS the mean of all split-half coefficients, so a
    * particular split far from alpha flags an items-structure
    * problem. Users collapse to one (odd, even) cents row; Pearson r
    * from five decimal-lifted exact sums; r and the step-up mirrored
    * doubles; degenerate halves → NULL.
    */
  val qSplitHalf = GateQuery.sql(
    "q_split_half",
    s"""WITH u AS (SELECT user_id,
       |    coalesce(sum(${centsSql("vd")}) FILTER ((xs // 3600) % 2 = 1), 0) AS o,
       |    coalesce(sum(${centsSql("vd")}) FILTER ((xs // 3600) % 2 = 0), 0) AS ev
       |  FROM $E t GROUP BY user_id),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(o) AS BIGINT) AS so, CAST(sum(ev) AS BIGINT) AS se,
       |    CAST(sum(CAST(o AS HUGEINT) * o) AS HUGEINT) AS qo,
       |    CAST(sum(CAST(ev AS HUGEINT) * ev) AS HUGEINT) AS qe,
       |    CAST(sum(CAST(o AS HUGEINT) * ev) AS HUGEINT) AS x
       |  FROM u),
       |r AS (SELECT n,
       |    CASE WHEN CAST(n AS HUGEINT) * qo = CAST(so AS HUGEINT) * so
       |        OR CAST(n AS HUGEINT) * qe = CAST(se AS HUGEINT) * se THEN NULL
       |      ELSE CAST(n * x - CAST(so AS HUGEINT) * se AS DOUBLE)
       |        / sqrt(CAST(n * qo - CAST(so AS HUGEINT) * so AS DOUBLE)
       |          * CAST(n * qe - CAST(se AS HUGEINT) * se AS DOUBLE))
       |    END AS r
       |  FROM a)
       |SELECT n AS n_users, round(r, 6) + 0.0 AS r_half,
       |  CASE WHEN r IS NULL OR 1.0 + r = 0.0 THEN NULL
       |    ELSE round(2.0 * r / (1.0 + r), 6) + 0.0 END AS spearman_brown
       |FROM r""".stripMargin) { (s, d) =>
    val u = ev(s, d).groupBy(col("user_id")).agg(
      coalesce(Exact.sumUnits(when(pmod(Binning.floorDiv(col("xs"), 3600L), lit(2L)) === 1,
        Exact.cents(col("vd")))).cast("long"), lit(0L)).as("o"),
      coalesce(Exact.sumUnits(when(pmod(Binning.floorDiv(col("xs"), 3600L), lit(2L)) === 0,
        Exact.cents(col("vd")))).cast("long"), lit(0L)).as("ev"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val a = u.agg(count(lit(1)).cast("long").as("n"),
      sum(col("o")).cast("long").as("so"), sum(col("ev")).cast("long").as("se"),
      sum(dec(col("o")) * col("o")).cast("decimal(38,0)").as("qo"),
      sum(dec(col("ev")) * col("ev")).cast("decimal(38,0)").as("qe"),
      sum(dec(col("o")) * col("ev")).cast("decimal(38,0)").as("x"))
    val rr = when(dec(col("n")) * col("qo") === dec(col("so")) * col("so") ||
        dec(col("n")) * col("qe") === dec(col("se")) * col("se"),
        lit(null).cast("double"))
      .otherwise((dec(col("n")) * col("x") - dec(col("so")) * col("se")).cast("double") /
        sqrt((dec(col("n")) * col("qo") - dec(col("so")) * col("so")).cast("double") *
          (dec(col("n")) * col("qe") - dec(col("se")) * col("se")).cast("double")))
    val r = a.select(col("n"), rr.as("r"))
    r.select(col("n").as("n_users"), (round(col("r"), 6) + lit(0.0)).as("r_half"),
      when(col("r").isNull || lit(1.0) + col("r") === 0.0, lit(null).cast("double"))
        .otherwise(round(lit(2.0) * col("r") / (lit(1.0) + col("r")), 6) + lit(0.0))
        .as("spearman_brown"))
  }

  /** Bland–Altman agreement analysis (#369): do two measurement
    * methods of document length — raw characters vs a 6·words proxy —
    * agree well enough to interchange? (Bland & Altman 1986 — THE
    * method-comparison standard; correlation alone cannot answer it,
    * two methods can correlate 0.99 and still disagree by half a
    * scale.) Bias = mean difference, limits of agreement = bias ±
    * 1.96·sd(diff), plus the share of docs inside the limits
    * (two-pass: the limits ride a 1-row broadcast). Differences are
    * exact integers; bias/LoA mirrored doubles; the inside-share an
    * exact ppm count against micro-floored limits.
    */
  val qBlandAltman = GateQuery.sql(
    "q_bland_altman",
    """WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS m1,
      |    6 * CAST(len(string_split(text, ' ')) AS BIGINT) AS m2
      |  FROM documents),
      |d AS (SELECT doc_id, m1 - m2 AS df FROM t),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(df) AS BIGINT) AS s,
      |    CAST(sum(CAST(df AS HUGEINT) * df) AS HUGEINT) AS q
      |  FROM d),
      |l AS (SELECT n, s, q,
      |    CAST(s AS DOUBLE) / n AS bias,
      |    sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) AS sd
      |  FROM a WHERE n > 1),
      |lim AS (SELECT n, bias, sd,
      |    CAST(floor((bias - 1.96 * sd) * 1000000) AS BIGINT) AS lo_micro,
      |    CAST(floor((bias + 1.96 * sd) * 1000000) AS BIGINT) AS hi_micro
      |  FROM l),
      |c AS (SELECT CAST(sum(CASE WHEN df * 1000000 >= lo_micro
      |      AND df * 1000000 <= hi_micro THEN 1 ELSE 0 END) AS BIGINT) AS inside
      |  FROM d, lim)
      |SELECT n AS n_docs, round(bias, 4) + 0.0 AS bias,
      |  round(sd, 4) + 0.0 AS sd_diff, lo_micro, hi_micro,
      |  (inside * 1000000) // n AS inside_ppm
      |FROM lim, c""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d).select(col("doc_id"),
      col("n_chars").cast("long").as("m1"),
      (lit(6L) * size(split(col("text"), " "))).cast("long").as("m2"))
    val dd = t.select(col("doc_id"), (col("m1") - col("m2")).as("df"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val a = dd.agg(count(lit(1)).cast("long").as("n"),
      sum(col("df")).cast("long").as("s"),
      sum(dec(col("df")) * col("df")).cast("decimal(38,0)").as("q"))
    val l = a.filter(col("n") > 1).select(col("n"), col("s"), col("q"),
      (col("s").cast("double") / col("n")).as("bias"),
      sqrt((col("q").cast("double") - col("s").cast("double") * col("s") / col("n")) /
        (col("n") - 1)).as("sd"))
    val lim = l.select(col("n"), col("bias"), col("sd"),
      floor((col("bias") - lit(1.96) * col("sd")) * lit(1000000L)).cast("long").as("lo_micro"),
      floor((col("bias") + lit(1.96) * col("sd")) * lit(1000000L)).cast("long").as("hi_micro"))
    val c = Curation.withStats(dd, lim)
      .agg(sum(when(col("df") * lit(1000000L) >= col("lo_micro") &&
        col("df") * lit(1000000L) <= col("hi_micro"), 1L).otherwise(0L))
        .cast("long").as("inside"))
    Curation.withStats(lim, c)
      .select(col("n").as("n_docs"), (round(col("bias"), 4) + lit(0.0)).as("bias"),
        (round(col("sd"), 4) + lit(0.0)).as("sd_diff"),
        col("lo_micro"), col("hi_micro"),
        Binning.floorDivCol(col("inside") * lit(1000000L), col("n")).as("inside_ppm"))
  }

  /** Lepage joint location-scale test (#362): did click values shift
    * in MEAN or in SPREAD vs view values? L = z_W² + z_AB² combines
    * the Wilcoxon rank-sum (location, #212's statistic) with the
    * Ansari–Bradley center-outward ranks (scale) into one χ²₂ test
    * (Lepage 1971) — the distribution-free "did ANYTHING change"
    * screen sharper than KS (#206) against location-scale
    * alternatives. Both rank sums come off the SAME value-collapsed
    * (cohort, cents) grid and share ONE window exchange: doubled
    * midranks r₂ = 2·cum−t+1 keep ties integer, the AB score is
    * min(r₂, 2(N+1)−r₂), and the two z's + L are mirrored double
    * closed forms (AB moments by the classic even/odd-N formulas,
    * midranks standing in for ties — the #354/#355 convention).
    */
  val qLepage = GateQuery.sql(
    "q_lepage",
    s"""WITH e AS (SELECT user_id % 8 AS g, event_type, ${centsSql("vd")} AS c
       |  FROM $E t WHERE event_type IN ('click', 'view')),
       |v AS (SELECT g, c,
       |    count(*) FILTER (event_type = 'click') AS c1,
       |    count(*) FILTER (event_type = 'view') AS c2
       |  FROM e GROUP BY g, c),
       |w AS (SELECT g, c1, c2, c1 + c2 AS t,
       |    CAST(sum(c1 + c2) OVER (PARTITION BY g ORDER BY c) AS BIGINT) AS cum,
       |    CAST(sum(c1 + c2) OVER (PARTITION BY g) AS BIGINT) AS nn
       |  FROM v),
       |a AS (SELECT g, CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
       |    any_value(nn) AS nn,
       |    CAST(sum(CAST(c1 AS HUGEINT) * (2 * cum - t + 1)) AS HUGEINT) AS r1x2,
       |    CAST(sum(CAST(c1 AS HUGEINT)
       |      * least(2 * cum - t + 1, 2 * (nn + 1) - (2 * cum - t + 1))) AS HUGEINT) AS a2,
       |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties
       |  FROM w GROUP BY g),
       |f AS (SELECT g, n1, n2, nn, a2, ties,
       |    r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2
       |  FROM a),
       |z AS (SELECT g, n1, n2, nn, a2,
       |    CASE WHEN nn < 2 OR (nn + 1) * CAST(nn AS HUGEINT) * (nn - 1) <= ties THEN NULL
       |      ELSE (CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
       |        / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
       |          * ((CAST(nn AS DOUBLE) + 1.0)
       |            - CAST(ties AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))))
       |    END AS zw,
       |    CASE WHEN n1 = 0 OR n2 = 0 OR nn < 3 THEN NULL
       |      WHEN nn % 2 = 0 THEN
       |        (CAST(a2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (nn + 2) / 2.0)
       |        / sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 2) * (nn - 2) / (12.0 * (nn - 1)))
       |      ELSE
       |        (CAST(a2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (nn + 1) * (nn + 1) / (2.0 * nn))
       |        / sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1)
       |          * (3.0 + CAST(nn AS DOUBLE) * nn) / (12.0 * CAST(nn AS DOUBLE) * nn))
       |    END AS zab
       |  FROM f)
       |SELECT g, n1, n2, CAST(a2 AS BIGINT) AS ab_doubled,
       |  round(zw, 4) + 0.0 AS z_wilcoxon, round(zab, 4) + 0.0 AS z_ansari,
       |  CASE WHEN zw IS NULL OR zab IS NULL THEN NULL
       |    ELSE round(zw * zw + zab * zab, 4) + 0.0 END AS lepage_l
       |FROM z ORDER BY g""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type").isin("click", "view"))
      .select(pmod(col("user_id"), lit(8L)).as("g"), col("event_type"),
        Exact.cents(col("vd")).as("c"))
    val v = e.groupBy(col("g"), col("c")).agg(
      count(when(col("event_type") === "click", 1)).as("c1"),
      count(when(col("event_type") === "view", 1)).as("c2"))
    val w = v.withColumn("t", col("c1") + col("c2"))
      .withColumn("cum",
        sum(col("c1") + col("c2"))
          .over(Window.partitionBy(col("g")).orderBy(col("c"))).cast("long"))
      .withColumn("nn",
        sum(col("c1") + col("c2")).over(Window.partitionBy(col("g"))).cast("long"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val r2 = lit(2L) * col("cum") - col("t") + 1
    val a = w.groupBy(col("g")).agg(
      sum(col("c1")).cast("long").as("n1"), sum(col("c2")).cast("long").as("n2"),
      first(col("nn")).as("nn"),
      sum(dec(col("c1")) * r2).cast("decimal(38,0)").as("r1x2"),
      sum(dec(col("c1")) * least(r2, lit(2L) * (col("nn") + 1) - r2))
        .cast("decimal(38,0)").as("a2"),
      sum(dec(col("t")) * col("t") * col("t") - col("t"))
        .cast("decimal(38,0)").as("ties"))
    val f = a.withColumn("u1x2",
      col("r1x2") - dec(col("n1")) * (col("n1") + 1))
    def d2(x: Column) = x.cast("double")
    val nnD = d2(col("nn"))
    val zw = when(col("nn") < 2 ||
        (col("nn") + 1) * dec(col("nn")) * (col("nn") - 1) <= col("ties"),
        lit(null).cast("double"))
      .otherwise((d2(col("u1x2")) - d2(col("n1")) * d2(col("n2"))) /
        (lit(2.0) * sqrt(d2(col("n1")) * d2(col("n2")) / lit(12.0) *
          ((nnD + lit(1.0)) - d2(col("ties")) / (nnD * (nnD - lit(1.0)))))))
    val zab = when(col("n1") === 0 || col("n2") === 0 || col("nn") < 3,
        lit(null).cast("double"))
      .when(pmod(col("nn"), lit(2L)) === 0,
        (d2(col("a2")) - d2(col("n1")) * (col("nn") + 2) / lit(2.0)) /
          sqrt(d2(col("n1")) * col("n2") * (col("nn") + 2) * (col("nn") - 2) /
            (lit(12.0) * (col("nn") - 1))))
      .otherwise(
        (d2(col("a2")) - d2(col("n1")) * (col("nn") + 1) * (col("nn") + 1) /
          (lit(2.0) * col("nn"))) /
          sqrt(d2(col("n1")) * col("n2") * (col("nn") + 1) *
            (lit(3.0) + nnD * col("nn")) / (lit(12.0) * nnD * col("nn"))))
    val z = f.select(col("g"), col("n1"), col("n2"), col("a2"),
      zw.as("zw"), zab.as("zab"))
    z.select(col("g"), col("n1"), col("n2"),
        col("a2").cast("long").as("ab_doubled"),
        (round(col("zw"), 4) + lit(0.0)).as("z_wilcoxon"),
        (round(col("zab"), 4) + lit(0.0)).as("z_ansari"),
        when(col("zw").isNull || col("zab").isNull, lit(null).cast("double"))
          .otherwise(round(col("zw") * col("zw") + col("zab") * col("zab"), 4) + lit(0.0))
          .as("lepage_l"))
      .orderedSmall(col("g"))
  }

  /** Siegel–Tukey scale test (#375): the rank-from-the-extremes
    * two-sample dispersion test (Siegel & Tukey 1960) on the SAME
    * click-vs-view per-cohort samples as Lepage (#362) — its Ansari
    * half answers "did spread change?" only jointly with location;
    * Siegel–Tukey is the standalone scale screen whose ranks are a
    * PERMUTATION of 1..N, so the whole Wilcoxon machinery applies
    * unchanged. Scores: alternating extremes (1 → smallest, 2,3 →
    * two largest, 4,5 → next two smallest, …; the odd-N middle takes
    * rank N), assigned WITHOUT materializing positions — the
    * per-value score SUM over a tied run [cum−t+1, cum] is the
    * closed-form prefix difference T(cum) − T(cum−t) with
    * T(m) = L(min(m,h)) + mid + G-range (EvalEdgeSpec pins it
    * against the brute-force alternating assignment, middle and
    * tie-midrank cases included), so
    * the grid stays VALUE-COLLAPSED — bounded by distinct cents,
    * never events. Ties take micro-quantized midranks (the #367
    * floor-division convention); z is the general permutation-score
    * form (W − n₁s̄)/√(n₁n₂/(N(N−1))·Σ(s−s̄)²) — exact decimal sums
    * into ONE mirrored double, degenerate variance → NULL by exact
    * predicate.
    */
  val qSiegelTukey = GateQuery.sql(
    "q_siegel_tukey",
    s"""WITH e AS (SELECT user_id % 8 AS g, event_type, ${centsSql("vd")} AS c
       |  FROM $E t WHERE event_type IN ('click', 'view')),
       |v AS (SELECT g, c,
       |    count(*) FILTER (event_type = 'click') AS c1,
       |    count(*) FILTER (event_type = 'view') AS c2
       |  FROM e GROUP BY g, c),
       |w AS (SELECT g, c1, c2, c1 + c2 AS t,
       |    CAST(sum(c1 + c2) OVER (PARTITION BY g ORDER BY c) AS BIGINT) AS cum,
       |    CAST(sum(c1 + c2) OVER (PARTITION BY g) AS BIGINT) AS nn
       |  FROM v),
       |w2 AS (SELECT g, c1, c2, t, nn, cum - t AS m0, cum AS m1,
       |    nn // 2 AS h, nn % 2 AS odd FROM w),
       |w3 AS (SELECT g, c1, c2, t, nn, m0, m1, h, odd,
       |    least(m1, h) AS k1, least(m0, h) AS k0, nn - h - odd AS jmax FROM w2),
       |w4 AS (SELECT g, c1, c2, t, nn,
       |    (k1 * (k1 + 1) - (k1 + 1) // 2
       |      + CASE WHEN odd = 1 AND m1 >= h + 1 THEN nn ELSE 0 END
       |      + CASE WHEN m1 >= h + 1 + odd THEN
       |          (jmax * jmax + (jmax + 1) // 2)
       |            - ((nn - m1) * (nn - m1) + (nn - m1 + 1) // 2) ELSE 0 END)
       |    - (k0 * (k0 + 1) - (k0 + 1) // 2
       |      + CASE WHEN odd = 1 AND m0 >= h + 1 THEN nn ELSE 0 END
       |      + CASE WHEN m0 >= h + 1 + odd THEN
       |          (jmax * jmax + (jmax + 1) // 2)
       |            - ((nn - m0) * (nn - m0) + (nn - m0 + 1) // 2) ELSE 0 END)
       |    AS sdiff FROM w3),
       |w5 AS (SELECT g, c1, c2, t, nn,
       |    (CAST(sdiff AS HUGEINT) * 1000000) // t AS mm FROM w4),
       |a AS (SELECT g, CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
       |    any_value(nn) AS nn,
       |    CAST(sum(CAST(c1 AS HUGEINT) * mm) AS HUGEINT) AS w1,
       |    CAST(sum(CAST(t AS HUGEINT) * mm) AS HUGEINT) AS sm,
       |    CAST(sum(CAST(t AS HUGEINT) * mm * mm) AS HUGEINT) AS sq
       |  FROM w5 GROUP BY g)
       |SELECT g, n1, n2, CAST(w1 AS BIGINT) AS w1_micro,
       |  CASE WHEN nn < 2 OR n1 = 0 OR n2 = 0
       |      OR CAST(nn AS HUGEINT) * sq - sm * sm <= 0 THEN NULL
       |    ELSE round(
       |      (CAST(w1 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(nn AS DOUBLE))
       |      / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
       |        * (CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(nn AS DOUBLE))
       |        / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))), 4) + 0.0
       |  END AS z_siegel_tukey
       |FROM a ORDER BY g""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type").isin("click", "view"))
      .select(pmod(col("user_id"), lit(8L)).as("g"), col("event_type"),
        Exact.cents(col("vd")).as("c"))
    val v = e.groupBy(col("g"), col("c")).agg(
      count(when(col("event_type") === "click", 1)).as("c1"),
      count(when(col("event_type") === "view", 1)).as("c2"))
    val w = v.withColumn("t", col("c1") + col("c2"))
      .withColumn("cum",
        sum(col("c1") + col("c2"))
          .over(Window.partitionBy(col("g")).orderBy(col("c"))).cast("long"))
      .withColumn("nn",
        sum(col("c1") + col("c2")).over(Window.partitionBy(col("g"))).cast("long"))
    val w2 = w.select(col("g"), col("c1"), col("c2"), col("t"), col("nn"),
      (col("cum") - col("t")).as("m0"), col("cum").as("m1"),
      Binning.floorDiv(col("nn"), 2L).as("h"), pmod(col("nn"), lit(2L)).as("odd"))
    val w3 = w2
      .withColumn("k1", least(col("m1"), col("h")))
      .withColumn("k0", least(col("m0"), col("h")))
      .withColumn("jmax", col("nn") - col("h") - col("odd"))
    def tPart(m: Column, k: Column) =
      (k * (k + 1) - Binning.floorDiv(k + 1, 2L)
        + when(col("odd") === 1 && m >= col("h") + 1, col("nn")).otherwise(lit(0L))
        + when(m >= col("h") + 1 + col("odd"),
          (col("jmax") * col("jmax") + Binning.floorDiv(col("jmax") + 1, 2L))
            - ((col("nn") - m) * (col("nn") - m)
              + Binning.floorDiv(col("nn") - m + 1, 2L))).otherwise(lit(0L)))
    val w4 = w3.select(col("g"), col("c1"), col("c2"), col("t"), col("nn"),
      (tPart(col("m1"), col("k1")) - tPart(col("m0"), col("k0"))).as("sdiff"))
    val w5 = w4.withColumn("mm",
      Exact.floorDivBig(col("sdiff").cast("decimal(38,0)") * lit(1000000L), col("t")))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val a = w5.groupBy(col("g")).agg(
      sum(col("c1")).cast("long").as("n1"), sum(col("c2")).cast("long").as("n2"),
      first(col("nn")).as("nn"),
      sum(dec(col("c1")) * col("mm")).cast("decimal(38,0)").as("w1"),
      sum(dec(col("t")) * col("mm")).cast("decimal(38,0)").as("sm"),
      sum(dec(col("t")) * col("mm") * col("mm")).cast("decimal(38,0)").as("sq"))
    def d2(x: Column) = x.cast("double")
    a.select(col("g"), col("n1"), col("n2"), col("w1").cast("long").as("w1_micro"),
        when(col("nn") < 2 || col("n1") === 0 || col("n2") === 0 ||
            dec(col("nn")) * col("sq") - col("sm") * col("sm") <= 0,
          lit(null).cast("double"))
          .otherwise(round(
            (d2(col("w1")) - d2(col("n1")) * d2(col("sm")) / d2(col("nn"))) /
              sqrt(d2(col("n1")) * d2(col("n2")) *
                (d2(col("sq")) - d2(col("sm")) * d2(col("sm")) / d2(col("nn"))) /
                (d2(col("nn")) * (d2(col("nn")) - lit(1.0)))), 4) + lit(0.0))
          .as("z_siegel_tukey"))
      .orderedSmall(col("g"))
  }

  /** Jonckheere–Terpstra ordered k-sample test (#355): do event
    * values trend UP across the four ordered day-part bands? The
    * independent-sample sibling of Page's L (#354, which needs
    * complete blocks) and the ordered-alternative Kruskal–Wallis
    * (#211/#311 squander power on unordered alternatives):
    * J = Σᵢ<ⱼ Uᵢⱼ over band pairs (Jonckheere 1954, Terpstra 1952).
    * Doubled counting (2·cum + t per distinct value — the #212
    * midrank trick) keeps tie halves integer: every Uᵢⱼ contribution
    * is exact off the VALUE-COLLAPSED (cents) grid with per-band
    * exclusive cumulative counts sharing ONE window exchange; J₂ and
    * E[J₂] exact integers; z the single mirrored double on the
    * classic variance. Grid bounded by distinct values, never event
    * count; the 6 pair terms are a pure projection per grid row.
    */
  val qJonckheere = GateQuery.sql(
    "q_jonckheere", {
      val pairs = for { i <- 0 to 3; j <- 0 to 3 if i < j } yield (i, j)
      val rowTerm = pairs.map { case (i, j) =>
        s"CAST(c$j AS HUGEINT) * (2 * cx$i + c$i)" }.mkString(" + ")
      s"""WITH e AS (SELECT ((xs // 3600) % 24) // 6 AS band, ${centsSql("vd")} AS c
         |  FROM $E t),
         |v AS (SELECT c,
         |    ${(0 to 3).map(i => s"count(*) FILTER (band = $i) AS c$i").mkString(", ")}
         |  FROM e GROUP BY c),
         |w AS (SELECT c, c0, c1, c2, c3,
         |    ${(0 to 3).map(i =>
              s"CAST(coalesce(sum(c$i) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED " +
                s"PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cx$i").mkString(",\n    ")}
         |  FROM v),
         |a AS (SELECT
         |    CAST(sum($rowTerm) AS HUGEINT) AS j2,
         |    ${(0 to 3).map(i => s"CAST(sum(c$i) AS BIGINT) AS n$i").mkString(", ")}
         |  FROM w),
         |f AS (SELECT j2, n0 + n1 + n2 + n3 AS n,
         |    CAST(n0 AS HUGEINT) * n0 + CAST(n1 AS HUGEINT) * n1
         |      + CAST(n2 AS HUGEINT) * n2 + CAST(n3 AS HUGEINT) * n3 AS sn2,
         |    CAST(n0 AS DOUBLE) * n0 * (2 * n0 + 3) + CAST(n1 AS DOUBLE) * n1 * (2 * n1 + 3)
         |      + CAST(n2 AS DOUBLE) * n2 * (2 * n2 + 3)
         |      + CAST(n3 AS DOUBLE) * n3 * (2 * n3 + 3) AS sv
         |  FROM a)
         |SELECT CAST(n AS BIGINT) AS n_events, CAST(j2 AS BIGINT) AS j_doubled,
         |  CAST((CAST(n AS HUGEINT) * n - sn2) // 2 AS BIGINT) AS e_doubled,
         |  CASE WHEN CAST(n AS DOUBLE) * n * (2 * n + 3) - sv <= 0.0 THEN NULL
         |    ELSE round((CAST(j2 AS DOUBLE) - CAST(CAST(n AS HUGEINT) * n - sn2 AS DOUBLE) / 2)
         |      / (2.0 * sqrt((CAST(n AS DOUBLE) * n * (2 * n + 3) - sv) / 72.0)), 4) + 0.0
         |  END AS z_trend
         |FROM f""".stripMargin
    }) { (s, d) =>
    val e = ev(s, d).select(
      Binning.floorDiv(pmod(Binning.floorDiv(col("xs"), 3600L), lit(24L)), 6L).as("band"),
      Exact.cents(col("vd")).as("c"))
    val v = e.groupBy(col("c")).agg(
      count(when(col("band") === 0, 1)).as("c0"),
      (1 to 3).map(i => count(when(col("band") === i, 1)).as(s"c$i")): _*)
    val wSpec = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val w = (0 to 3).foldLeft(v)((df, i) =>
      df.withColumn(s"cx$i", coalesce(sum(col(s"c$i")).over(wSpec), lit(0L)).cast("long")))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val pairs = for { i <- 0 to 3; j <- 0 to 3 if i < j } yield (i, j)
    val rowTerm = pairs.map { case (i, j) =>
      dec(col(s"c$j")) * (lit(2L) * col(s"cx$i") + col(s"c$i")) }.reduce(_ + _)
    val a = w.agg(
      sum(rowTerm).cast("decimal(38,0)").as("j2"),
      (0 to 3).map(i => sum(col(s"c$i")).cast("long").as(s"n$i")): _*)
    val n = col("n0") + col("n1") + col("n2") + col("n3")
    val sn2 = (0 to 3).map(i => dec(col(s"n$i")) * col(s"n$i")).reduce(_ + _)
    val sv = (0 to 3).map(i =>
      col(s"n$i").cast("double") * col(s"n$i") * (lit(2L) * col(s"n$i") + 3)).reduce(_ + _)
    val f = a.select(col("j2"), n.as("n"), sn2.as("sn2"), sv.as("sv"))
    f.select(col("n").cast("long").as("n_events"),
      col("j2").cast("long").as("j_doubled"),
      Exact.floorDivBig(dec(col("n")) * col("n") - col("sn2"), lit(2L))
        .cast("long").as("e_doubled"),
      when(col("n").cast("double") * col("n") * (lit(2L) * col("n") + 3) - col("sv") <= 0.0,
          lit(null).cast("double"))
        .otherwise(round((col("j2").cast("double") -
          (dec(col("n")) * col("n") - col("sn2")).cast("double") / lit(2)) /
          (lit(2.0) * sqrt((col("n").cast("double") * col("n") *
            (lit(2L) * col("n") + 3) - col("sv")) / lit(72.0))), 4) + lit(0.0))
        .as("z_trend"))
  }

  /** Intraclass correlation ICC(1,1) (#339): how much of the
    * event-value variance is BETWEEN users vs within them — the
    * one-way random-effects reliability coefficient (Shrout & Fleiss
    * 1979 case 1; Donner 1986 unequal-n k₀), the continuous-rating
    * agreement measure next to Cohen's kappa (#210, nominal) and the
    * design-effect input every user-clustered A/B variance
    * calculation needs (#323's within-user clustering, quantified):
    *
    *   ICC = (MSB − MSW) / (MSB + (k₀−1)·MSW),
    *   k₀ = (N − Σnᵢ²/N) / (G−1).
    *
    * Shape: the SAME sufficient statistics as #211's ANOVA with users
    * as groups — per-user (n, Σc, Σc²) then ONE global aggregate;
    * SSB/SSW as micro-scaled exact integers (per-user s²/n floors),
    * MSB/MSW/k₀/ICC mirrored double closed forms; single-user or
    * no-repeated-measures corpora → NULL by exact predicates.
    */
  val qIcc = GateQuery.sql(
    "q_icc",
    s"""WITH e AS (SELECT user_id AS g, ${centsSql("vd")} AS c FROM $E t),
       |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
       |    CAST(sum(c) AS BIGINT) AS s_g,
       |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q_g
       |  FROM e GROUP BY g),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS gg,
       |    CAST(sum(n_g) AS BIGINT) AS n,
       |    CAST(sum(CAST(n_g AS HUGEINT) * n_g) AS HUGEINT) AS n2,
       |    CAST(sum(s_g) AS HUGEINT) AS s, CAST(sum(q_g) AS HUGEINT) AS q,
       |    CAST(sum((CAST(s_g AS HUGEINT) * s_g * 1000000) // n_g) AS HUGEINT) AS a_scaled
       |  FROM a),
       |f AS (SELECT gg, n,
       |    greatest(a_scaled - (s * s * 1000000) // n, 0) AS ssb_micro,
       |    q * 1000000 - a_scaled AS ssw_micro,
       |    (n - CAST(n2 AS DOUBLE) / n) / (gg - 1) AS k0
       |  FROM t WHERE gg > 1 AND n > gg)
       |SELECT gg AS n_users, n AS n_obs,
       |  CAST(ssb_micro // 1000000 AS BIGINT) AS ssb_cents2,
       |  CAST(ssw_micro // 1000000 AS BIGINT) AS ssw_cents2,
       |  round(k0, 6) + 0.0 AS k0,
       |  CASE WHEN CAST(ssb_micro AS DOUBLE) / (gg - 1)
       |      + (k0 - 1.0) * (CAST(ssw_micro AS DOUBLE) / (n - gg)) <= 0.0 THEN NULL
       |    ELSE round((CAST(ssb_micro AS DOUBLE) / (gg - 1)
       |        - CAST(ssw_micro AS DOUBLE) / (n - gg))
       |      / (CAST(ssb_micro AS DOUBLE) / (gg - 1)
       |        + (k0 - 1.0) * (CAST(ssw_micro AS DOUBLE) / (n - gg))), 6) + 0.0
       |  END AS icc
       |FROM f""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(col("user_id").as("g"), Exact.cents(col("vd")).as("c"))
    val a = e.groupBy(col("g")).agg(
      count(lit(1)).cast("long").as("n_g"), sum(col("c")).cast("long").as("s_g"),
      sum(col("c").cast("decimal(38,0)") * col("c")).cast("decimal(38,0)").as("q_g"))
    val t = a.agg(
      count(lit(1)).cast("long").as("gg"), sum(col("n_g")).cast("long").as("n"),
      sum(col("n_g").cast("decimal(38,0)") * col("n_g")).cast("decimal(38,0)").as("n2"),
      sum(col("s_g")).cast("decimal(38,0)").as("s"),
      sum(col("q_g")).cast("decimal(38,0)").as("q"),
      sum(floorDivBig(col("s_g").cast("decimal(38,0)") * col("s_g") * lit(1000000L),
        col("n_g"))).cast("decimal(38,0)").as("a_scaled"))
    val f = t.filter(col("gg") > 1 && col("n") > col("gg"))
      .select(col("gg"), col("n"),
        greatest(col("a_scaled") -
            floorDivBig(col("s") * col("s") * lit(1000000L), col("n")),
          lit(0L).cast("decimal(38,0)")).as("ssb_micro"),
        (col("q") * lit(1000000L) - col("a_scaled")).as("ssw_micro"),
        ((col("n") - col("n2").cast("double") / col("n")) / (col("gg") - 1)).as("k0"))
    val msb = col("ssb_micro").cast("double") / (col("gg") - 1)
    val msw = col("ssw_micro").cast("double") / (col("n") - col("gg"))
    f.select(col("gg").as("n_users"), col("n").as("n_obs"),
      floorDivBig(col("ssb_micro"), lit(1000000L)).cast("long").as("ssb_cents2"),
      floorDivBig(col("ssw_micro"), lit(1000000L)).cast("long").as("ssw_cents2"),
      (round(col("k0"), 6) + lit(0.0)).as("k0"),
      when(msb + (col("k0") - lit(1.0)) * msw <= 0.0, lit(null).cast("double"))
        .otherwise(round((msb - msw) / (msb + (col("k0") - lit(1.0)) * msw), 6) + lit(0.0))
        .as("icc"))
  }

  /** Mann–Whitney U test (#212): the nonparametric two-sample test
    * behind #175's AUC (U and AUC are the same statistic) — per user
    * cohort, are 'click' values stochastically larger than 'view'
    * values? Exact tied MIDRANKS off the VALUE-COLLAPSED (cohort,
    * cents) relation (2·cum − t + 1 per distinct value — windows run
    * over distinct values only), the tie-correction term Σ(t³−t)
    * exact, and the normal-approximation z the single mirrored
    * closed form sqrt at the end. 2·U is reported exactly.
    */
  val qMannWhitney = GateQuery.sql(
    "q_mannwhitney",
    s"""WITH e AS (SELECT user_id % 8 AS g, event_type, ${centsSql("vd")} AS c
       |  FROM $E t WHERE event_type IN ('click', 'view')),
       |v AS (SELECT g, c,
       |    count(*) FILTER (event_type = 'click') AS c1,
       |    count(*) FILTER (event_type = 'view') AS c2
       |  FROM e GROUP BY g, c),
       |w AS (SELECT g, c1, c2, c1 + c2 AS t,
       |    CAST(sum(c1 + c2) OVER (PARTITION BY g ORDER BY c) AS BIGINT) AS cum
       |  FROM v),
       |a AS (SELECT g, CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
       |    CAST(sum(CAST(c1 AS HUGEINT) * (2 * cum - t + 1)) AS HUGEINT) AS r1x2,
       |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties
       |  FROM w GROUP BY g),
       |u AS (SELECT g, n1, n2, ties,
       |    r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2,
       |    CAST(n1 AS HUGEINT) + n2 AS nn
       |  FROM a)
       |SELECT g, n1, n2, CAST(u1x2 AS BIGINT) AS u1_x2,
       |  CASE WHEN nn < 2 OR (nn + 1) * nn * (nn - 1) <= ties THEN NULL ELSE
       |  round((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
       |    / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
       |      * ((CAST(nn AS DOUBLE) + 1.0)
       |        - CAST(ties AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))))),
       |    4) + 0.0 END AS z_approx
       |FROM u ORDER BY g""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type").isin("click", "view"))
      .select(pmod(col("user_id"), lit(8L)).as("g"), col("event_type"),
        Exact.cents(col("vd")).as("c"))
    val v = e.groupBy(col("g"), col("c")).agg(
      count(when(col("event_type") === "click", 1)).as("c1"),
      count(when(col("event_type") === "view", 1)).as("c2"))
    val w = v.withColumn("t", col("c1") + col("c2"))
      .withColumn("cum",
        sum(col("c1") + col("c2"))
          .over(Window.partitionBy(col("g")).orderBy(col("c"))).cast("long"))
    val a = w.groupBy(col("g")).agg(
      sum(col("c1")).cast("long").as("n1"), sum(col("c2")).cast("long").as("n2"),
      sum(col("c1").cast("decimal(38,0)") * (lit(2L) * col("cum") - col("t") + 1))
        .cast("decimal(38,0)").as("r1x2"),
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .cast("decimal(38,0)").as("ties"))
    val u = a
      .withColumn("u1x2", col("r1x2") - col("n1").cast("decimal(38,0)") * (col("n1") + 1))
      .withColumn("nn", (col("n1") + col("n2")).cast("decimal(38,0)"))
    val nnD = col("nn").cast("double")
    // z is undefined when every value is tied (variance 0) — guard with
    // the EXACT integer predicate (nn+1)·nn·(nn−1) ≤ ties (the variance
    // numerator scaled by nn(nn−1) > 0), identical on both engines;
    // Spark 4 ANSI errors even on double ÷0 where DuckDB yields ±inf
    val degenerate = col("nn") < 2 ||
      (col("nn") + 1) * col("nn") * (col("nn") - 1) <= col("ties")
    u.select(col("g"), col("n1"), col("n2"), col("u1x2").cast("long").as("u1_x2"),
        when(degenerate, lit(null).cast("double")).otherwise(
          round((col("u1x2").cast("double") - col("n1").cast("double") * col("n2").cast("double")) /
            (lit(2.0) * sqrt(col("n1").cast("double") * col("n2").cast("double") / lit(12.0) *
              ((nnD + lit(1.0)) - col("ties").cast("double") / (nnD * (nnD - lit(1.0)))))),
            4) + lit(0.0)).as("z_approx"))
      .orderedSmall(col("g"))
  }

  /** Two-proportion z-test (#230): is the purchase RATE different
    * between user cohorts A (user_id%8 < 4) and B (≥ 4)? The most
    * common A/B-test primitive of all (conversion rates), filling the
    * gap between #179 (means) and #178 (full independence). All four
    * counts from ONE conditional aggregate; rates in exact ppm; the
    * pooled-variance z is the single mirrored sqrt closed form, with
    * the degenerate pooled rate (0 or 1 ⟺ x_pool·(n−x_pool) = 0)
    * guarded by an exact integer predicate → NULL on both engines.
    */
  val qPropTest = GateQuery.sql(
    "q_prop_test",
    s"""WITH e AS (SELECT user_id % 8 AS g, event_type FROM $E t),
       |a AS (SELECT
       |    count(*) FILTER (g < 4) AS n1,
       |    count(*) FILTER (g < 4 AND event_type = 'purchase') AS x1,
       |    count(*) FILTER (g >= 4) AS n2,
       |    count(*) FILTER (g >= 4 AND event_type = 'purchase') AS x2
       |  FROM e)
       |SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
       |  CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
       |  (x1 * 1000000) // n1 AS rate1_ppm, (x2 * 1000000) // n2 AS rate2_ppm,
       |  CASE WHEN (x1 + x2) * (n1 + n2 - x1 - x2) = 0 THEN NULL ELSE
       |    round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
       |      / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
       |        * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
       |        * (1.0 / n1 + 1.0 / n2)), 4) + 0.0
       |  END AS z_stat
       |FROM a""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(pmod(col("user_id"), lit(8L)).as("g"), col("event_type"))
    val a = e.agg(
      count(when(col("g") < 4, 1)).as("n1"),
      count(when(col("g") < 4 && col("event_type") === "purchase", 1)).as("x1"),
      count(when(col("g") >= 4, 1)).as("n2"),
      count(when(col("g") >= 4 && col("event_type") === "purchase", 1)).as("x2"))
    val pPool = (col("x1") + col("x2")).cast("double") / (col("n1") + col("n2"))
    a.select(col("n1").cast("long").as("n1"), col("x1").cast("long").as("x1"),
      col("n2").cast("long").as("n2"), col("x2").cast("long").as("x2"),
      Binning.floorDivCol(col("x1") * lit(1000000L), col("n1")).as("rate1_ppm"),
      Binning.floorDivCol(col("x2") * lit(1000000L), col("n2")).as("rate2_ppm"),
      when((col("x1") + col("x2")) * (col("n1") + col("n2") - col("x1") - col("x2")) === 0,
          lit(null).cast("double"))
        .otherwise(round(
          (col("x1").cast("double") / col("n1") - col("x2").cast("double") / col("n2")) /
            sqrt(pPool * (lit(1.0) - pPool) *
              (lit(1.0) / col("n1") + lit(1.0) / col("n2"))), 4) + lit(0.0))
        .as("z_stat"))
  }

  /** Cochran–Armitage trend test (#333): does the purchase SHARE
    * trend monotonically across ordered day-part bands (night /
    * morning / afternoon / evening)? The ordered-alternative upgrade
    * of #178's omnibus independence test and #230's two-group z —
    * against a monotone dose-response, CA concentrates all its power
    * on the single trend degree of freedom (Cochran 1954, Armitage
    * 1955). Scores w = band index 0..3; with per-event success s:
    *
    *   z = (Σws − X·Σw/N) / √( (X/N)(1−X/N)·(Σw² − (Σw)²/N) )
    *
    * Shape: ONE conditional aggregate over events (map-side
    * combined, 5 sufficient statistics + 8 per-band counts — no
    * per-user pass, no shuffle beyond the single global combine);
    * z is one mirrored double closed form over exact integer sums;
    * degenerate all-success/no-success and single-band inputs → NULL
    * by exact decimal-lifted predicates.
    */
  val qCochranArmitage = GateQuery.sql(
    "q_cochran_armitage",
    s"""WITH e AS (SELECT ((xs // 3600) % 24) // 6 AS w,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
       |  FROM $E t),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS x,
       |    CAST(sum(w * s) AS BIGINT) AS sws, CAST(sum(w) AS BIGINT) AS sw,
       |    CAST(sum(w * w) AS BIGINT) AS sw2,
       |    CAST(count(*) FILTER (w = 0) AS BIGINT) AS n0,
       |    CAST(count(*) FILTER (w = 1) AS BIGINT) AS n1,
       |    CAST(count(*) FILTER (w = 2) AS BIGINT) AS n2,
       |    CAST(count(*) FILTER (w = 3) AS BIGINT) AS n3,
       |    CAST(sum(s) FILTER (w = 0) AS BIGINT) AS x0,
       |    CAST(sum(s) FILTER (w = 1) AS BIGINT) AS x1,
       |    CAST(sum(s) FILTER (w = 2) AS BIGINT) AS x2,
       |    CAST(sum(s) FILTER (w = 3) AS BIGINT) AS x3
       |  FROM e)
       |SELECT n0, x0, n1, x1, n2, x2, n3, x3, n AS n_total, x AS x_total,
       |  CASE WHEN x * (n - x) = 0
       |      OR CAST(n AS HUGEINT) * sw2 = CAST(sw AS HUGEINT) * sw THEN NULL
       |    ELSE round((sws - CAST(x AS DOUBLE) * sw / n)
       |      / sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n)
       |        * (sw2 - CAST(sw AS DOUBLE) * sw / n)), 4) + 0.0
       |  END AS z_trend
       |FROM a""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(
      Binning.floorDiv(pmod(Binning.floorDiv(col("xs"), 3600L), lit(24L)), 6L).as("w"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("s"))
    val a = e.agg(
      count(lit(1)).cast("long").as("n"), sum(col("s")).cast("long").as("x"),
      sum(col("w") * col("s")).cast("long").as("sws"),
      sum(col("w")).cast("long").as("sw"),
      sum(col("w") * col("w")).cast("long").as("sw2"),
      count(when(col("w") === 0, 1)).cast("long").as("n0"),
      count(when(col("w") === 1, 1)).cast("long").as("n1"),
      count(when(col("w") === 2, 1)).cast("long").as("n2"),
      count(when(col("w") === 3, 1)).cast("long").as("n3"),
      sum(when(col("w") === 0, col("s"))).cast("long").as("x0"),
      sum(when(col("w") === 1, col("s"))).cast("long").as("x1"),
      sum(when(col("w") === 2, col("s"))).cast("long").as("x2"),
      sum(when(col("w") === 3, col("s"))).cast("long").as("x3"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    a.select(col("n0"), col("x0"), col("n1"), col("x1"), col("n2"), col("x2"),
      col("n3"), col("x3"), col("n").as("n_total"), col("x").as("x_total"),
      when(col("x") * (col("n") - col("x")) === 0 ||
          dec(col("n")) * dec(col("sw2")) === dec(col("sw")) * dec(col("sw")),
          lit(null).cast("double"))
        .otherwise(round((col("sws") - col("x").cast("double") * col("sw") / col("n")) /
          sqrt((col("x").cast("double") / col("n")) *
            (lit(1.0) - col("x").cast("double") / col("n")) *
            (col("sw2") - col("sw").cast("double") * col("sw") / col("n"))), 4) + lit(0.0))
        .as("z_trend"))
  }

  /** Higher-moment profile (#242): per event type, mean / sd /
    * skewness / excess kurtosis from the four raw power sums — the
    * distribution-shape audit that decides whether #179/#211's
    * normal-theory tests are even applicable. Σx..Σx⁴ accumulate as
    * exact decimals in ONE aggregate (x⁴ at cents scale overflows a
    * long by sf0.1 — every power is decimal-lifted BEFORE its first
    * multiplication); the central-moment closed forms are mirrored
    * doubles, and zero variance is guarded by the exact predicate
    * n·Σx² = (Σx)² → NULL skew/kurtosis.
    */
  val qMoments = GateQuery.sql(
    "q_moments",
    s"""WITH e AS (SELECT event_type, ${centsSql("vd")} AS x FROM $E t),
       |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS s1,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
       |    CAST(sum(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3,
       |    CAST(sum(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT) AS s4
       |  FROM e GROUP BY 1),
       |m AS (SELECT event_type, n, s1, s2, s3, s4,
       |    CAST(s1 AS DOUBLE) / n AS mu,
       |    CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
       |    CAST(s3 AS DOUBLE) / n
       |      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
       |      + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m3,
       |    CAST(s4 AS DOUBLE) / n
       |      - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
       |      + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
       |      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
       |        * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
       |  FROM a)
       |SELECT event_type, n, round(mu, 4) + 0.0 AS mean_cents,
       |  round(sqrt(m2), 4) + 0.0 AS sd_cents,
       |  CASE WHEN n * s2 = s1 * s1 THEN NULL
       |    ELSE round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 6) + 0.0 END AS skewness,
       |  CASE WHEN n * s2 = s1 * s1 THEN NULL
       |    ELSE round(m4 / (m2 * m2) - 3.0, 6) + 0.0 END AS excess_kurtosis
       |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(col("event_type"), Exact.cents(col("vd")).as("x"))
    val xd = col("x").cast("decimal(38,0)")
    val a = e.groupBy(col("event_type")).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("s1"),
      sum(xd * col("x")).cast("decimal(38,0)").as("s2"),
      sum(xd * col("x") * col("x")).cast("decimal(38,0)").as("s3"),
      sum(xd * col("x") * col("x") * col("x")).cast("decimal(38,0)").as("s4"))
    def dv(c: Column) = c.cast("double") / col("n")
    val mu = dv(col("s1"))
    val m2 = dv(col("s2")) - mu * mu
    val m3 = dv(col("s3")) - lit(3) * mu * dv(col("s2")) + lit(2) * mu * mu * mu
    val m4 = dv(col("s4")) - lit(4) * mu * dv(col("s3")) +
      lit(6) * mu * mu * dv(col("s2")) - lit(3) * mu * mu * mu * mu
    val degenerate = col("n") * col("s2") === col("s1") * col("s1")
    a.select(col("event_type"), col("n"),
        (round(mu, 4) + lit(0.0)).as("mean_cents"),
        (round(sqrt(m2), 4) + lit(0.0)).as("sd_cents"),
        when(degenerate, lit(null).cast("double"))
          .otherwise(round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 6) + lit(0.0))
          .as("skewness"),
        when(degenerate, lit(null).cast("double"))
          .otherwise(round(m4 / (m2 * m2) - lit(3.0), 6) + lit(0.0))
          .as("excess_kurtosis"))
      .orderedSmall(col("event_type"))
  }

  /** Kruskal–Wallis H test (#311): the k-sample nonparametric ANOVA
    * (Kruskal & Wallis 1952) completing the family — #212's
    * Mann–Whitney generalized past two cohorts, #211's ANOVA without
    * its normality/equal-variance assumptions (which #307/#306 exist
    * to check). Per user cohort (user_id mod 8): do the five event
    * types' value distributions differ in location?
    * H = 3/(N(N+1))·Σᵢ S2ᵢ²/nᵢ − 3(N+1) over DOUBLED rank units
    * (S2ᵢ = Σ midrank2, midrank2 = 2·cum − t + 1 — always an
    * integer), computed off the VALUE-COLLAPSED (cohort, cents) grid
    * exactly as #212: windows see distinct values, never rows. Each
    * cohort's S2ᵢ²/nᵢ micro-floors BEFORE the k-bounded sum; H
    * clamps at 0 (analytically nonnegative — flooring may undershoot
    * by micro units) so the tie-correction division
    * H* = H·(N³−N)/((N³−N)−Σ(t³−t)) stays on nonnegative integers
    * where `//` mirrors floor. All-tied cohorts ((N³−N) ≤ T) are
    * NULL by exact predicate. Widest intermediate S2ᵢ²·1e6 ≲ 4N⁴·1e6
    * — both engines fail loudly past ~3e7 rows per cohort group.
    */
  val qKruskalWallis = GateQuery.sql(
    "q_kruskal_wallis",
    s"""WITH e AS (SELECT user_id % 8 AS g, event_type, ${centsSql("vd")} AS c
       |  FROM $E t),
       |v AS (SELECT g, c, event_type, CAST(count(*) AS BIGINT) AS cnt
       |  FROM e GROUP BY 1, 2, 3),
       |tv AS (SELECT g, c, CAST(sum(cnt) AS BIGINT) AS t,
       |    CAST(sum(sum(cnt)) OVER (PARTITION BY g ORDER BY c) AS BIGINT) AS cum
       |  FROM v GROUP BY 1, 2),
       |r AS (SELECT v.g, v.event_type, v.cnt,
       |    CAST(v.cnt AS HUGEINT) * (2 * tv.cum - tv.t + 1) AS contrib
       |  FROM v JOIN tv ON v.g = tv.g AND v.c = tv.c),
       |s AS (SELECT g, event_type, CAST(sum(cnt) AS BIGINT) AS n_i,
       |    CAST(sum(contrib) AS HUGEINT) AS s2
       |  FROM r GROUP BY 1, 2),
       |a AS (SELECT g, CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(n_i) AS BIGINT) AS n,
       |    CAST(sum((s2 * s2 * 1000000) // n_i) AS HUGEINT) AS aterm
       |  FROM s GROUP BY 1),
       |tt AS (SELECT g, CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties
       |  FROM tv GROUP BY 1),
       |h AS (SELECT a.g, a.k, a.n, tt.ties,
       |    greatest(CAST(0 AS HUGEINT),
       |      (3 * a.aterm) // (CAST(a.n AS HUGEINT) * (a.n + 1))
       |        - 3 * (a.n + 1) * 1000000) AS h_micro,
       |    CAST(a.n AS HUGEINT) * a.n * a.n - a.n AS n3n
       |  FROM a JOIN tt ON a.g = tt.g)
       |SELECT g, n AS n_obs, k AS k_cohorts, CAST(k - 1 AS BIGINT) AS dof,
       |  CASE WHEN n >= 2 AND n3n > ties
       |    THEN CAST((h_micro * n3n) // (n3n - ties) AS BIGINT)
       |    ELSE NULL END AS h_micro
       |FROM h ORDER BY g""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(pmod(col("user_id"), lit(8L)).as("g"),
      col("event_type"), Exact.cents(col("vd")).as("c"))
    val v = e.groupBy(col("g"), col("c"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    // r14: ONE corpus aggregate to the value-collapsed (g, c, type)
    // grid, then the rank/tie/H folds replay on the driver in the SQL
    // mirror's exact integer arithmetic (BigInt where the oracle says
    // HUGEINT) — the q_levene convention; the distributed shape paid
    // a grid window + grid join + four aggregate stages. The grid is
    // value-domain bounded only by assumption, so the collect carries
    // the same fused limit-probe bound, with the distributed shape
    // below unchanged as the fallback.
    val kwCap = 2000000
    val kwRows = v.limit(kwCap + 1).collect()
    if (kwRows.length <= kwCap) {
      import s.implicits._
      val byG = kwRows.map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .groupBy(_._1).toSeq.sortBy(_._1)
      val out = byG.map { case (g, rows) =>
        // tv: per ascending c, t = Σ cnt and running cum
        val byC = rows.groupBy(_._2).toSeq.sortBy(_._1)
        var cum = 0L
        val tieT = new scala.collection.mutable.HashMap[Long, (Long, Long)]() // c -> (t, cum)
        var ties = BigInt(0)
        byC.foreach { case (c, rs) =>
          val t = rs.iterator.map(_._4).sum
          cum += t
          tieT(c) = (t, cum)
          ties += BigInt(t) * t * t - t
        }
        // s: per event_type, n_i = Σ cnt, s2 = Σ cnt·(2·cum − t + 1)
        val byEt = rows.groupBy(_._3)
        var k = 0L
        var n = 0L
        var aterm = BigInt(0)
        byEt.foreach { case (_, rs) =>
          var nI = 0L
          var s2 = BigInt(0)
          rs.foreach { case (_, c, _, cnt) =>
            val (t, cm) = tieT(c)
            nI += cnt
            s2 += BigInt(cnt) * (2L * cm - t + 1)
          }
          k += 1
          n += nI
          aterm += s2 * s2 * 1000000L / nI
        }
        val h0 = (BigInt(3) * aterm / (BigInt(n) * (n + 1)) -
          BigInt(3) * (n + 1) * 1000000L).max(BigInt(0))
        val n3n = BigInt(n) * n * n - n
        val hMicro =
          if (n >= 2 && n3n > ties) Some((h0 * n3n / (n3n - ties)).toLong)
          else None
        (g, n, k, k - 1, hMicro)
      }
      out.toDF("g", "n_obs", "k_cohorts", "dof", "h_micro")
        .orderedSmall(col("g"))
    } else {
    val tv = v.groupBy(col("g"), col("c"))
      .agg(sum(col("cnt")).cast("long").as("t"))
      .withColumn("cum",
        sum(col("t")).over(Window.partitionBy(col("g")).orderBy(col("c"))).cast("long"))
    val r = v.join(tv, Seq("g", "c"))
      .select(col("g"), col("event_type"),
        col("cnt"),
        (col("cnt").cast("decimal(38,0)") *
          (lit(2L) * col("cum") - col("t") + 1)).as("contrib"))
    val sdf = r.groupBy(col("g"), col("event_type"))
      .agg(sum(col("cnt")).cast("long").as("n_i"),
        sum(col("contrib")).cast("decimal(38,0)").as("s2"))
    val a = sdf.groupBy(col("g")).agg(
      count(lit(1)).cast("long").as("k"),
      sum(col("n_i")).cast("long").as("n"),
      sum(floorDivBig(col("s2") * col("s2") * lit(1000000L),
        col("n_i").cast("decimal(38,0)"))).cast("decimal(38,0)").as("aterm"))
    val tt = tv.groupBy(col("g"))
      .agg(sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .cast("decimal(38,0)").as("ties"))
    val h = a.join(tt, "g")
      .withColumn("h_micro0", greatest(lit(0L).cast("decimal(38,0)"),
        floorDivBig(lit(3L) * col("aterm"),
          col("n").cast("decimal(38,0)") * (col("n") + 1)) -
          lit(3L) * (col("n").cast("decimal(38,0)") + 1) * lit(1000000L)))
      .withColumn("n3n",
        col("n").cast("decimal(38,0)") * col("n") * col("n") - col("n"))
    h.select(col("g"), col("n").as("n_obs"), col("k").as("k_cohorts"),
        (col("k") - 1).cast("long").as("dof"),
        when(col("n") >= 2 && col("n3n") > col("ties"),
          floorDivBig(col("h_micro0") * col("n3n"),
            col("n3n") - col("ties")).cast("long"))
          .otherwise(lit(null).cast("long")).as("h_micro"))
      .orderedSmall(col("g"))
    }
  }

  /** CUPED variance reduction (#322): the deployed experimentation
    * standard (Deng et al. 2013 — Controlled experiments Using
    * Pre-Experiment Data) next to Welch (#179) / power-MDE (#298) —
    * adjust each user's experiment-period metric by their
    * PRE-period metric, y_adj = y − θ(x − x̄), shrinking metric
    * variance by exactly ρ² and with it the experiment runtime.
    * The corpus midpoint splits pre/post (1-row broadcast scalar);
    * users collapse to ONE (x, y) row each (user-keyed conditional
    * aggregate — the only corpus-scale shuffle); pooled
    * n/Σx/Σy/Σxy/Σx²/Σy² come from ONE aggregate over the user
    * relation. The variance-reduction identity makes the headline
    * number EXACT: reduction = ρ² = c²/(vx·vy) with c = n·Σxy−ΣxΣy,
    * vx/vy the denominator-cleared variances — all exact integers
    * (ppm via mirrored-double product of the two exact ratios, c²
    * alone would overflow int128 at corpus scale). θ = c/vx and the
    * per-arm adjusted means ȳ_a − θ(x̄_a − x̄) are mirrored double
    * closed forms; zero pre- or post-variance → NULL by exact
    * predicate.
    */
  val qCuped = GateQuery.sql(
    "q_cuped",
    s"""WITH mm AS (SELECT (min(xs) + max(xs)) // 2 AS ms FROM $E t),
       |u AS (SELECT user_id,
       |    CAST(sum(CASE WHEN xs < ms THEN ${centsSql("vd")} ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN xs >= ms THEN ${centsSql("vd")} ELSE 0 END) AS BIGINT) AS y
       |  FROM $E e, mm GROUP BY user_id),
       |p AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
       |  FROM u),
       |st AS (SELECT n, sx, sy,
       |    n * sxy - sx * sy AS c, n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy
       |  FROM p),
       |a AS (SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(x) AS HUGEINT) AS sxa, CAST(sum(y) AS HUGEINT) AS sya
       |  FROM u GROUP BY 1)
       |SELECT arm, n_users,
       |  (2 * CAST(sya AS BIGINT) + n_users) // (2 * n_users) AS mean_post_cents,
       |  CASE WHEN vx > 0 AND vy > 0 THEN
       |    round(CAST(sya AS DOUBLE) / n_users
       |      - (CAST(c AS DOUBLE) / CAST(vx AS DOUBLE))
       |        * (CAST(sxa AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n), 2) + 0.0
       |  END AS adj_mean_post,
       |  CASE WHEN vx > 0 THEN
       |    round(CAST(c AS DOUBLE) / CAST(vx AS DOUBLE), 6) + 0.0 END AS theta,
       |  CASE WHEN vx > 0 AND vy > 0 THEN
       |    CAST(floor(1000000 * (CAST(c AS DOUBLE) / CAST(vx AS DOUBLE))
       |      * (CAST(c AS DOUBLE) / CAST(vy AS DOUBLE))) AS BIGINT)
       |  END AS var_reduction_ppm
       |FROM a, st ORDER BY arm""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    val mm = e.agg(expr("(min(xs) + max(xs)) div 2").as("ms"))
    val u = Curation.withStats(e, mm)
      .groupBy(col("user_id"))
      .agg(sum(when(col("xs") < col("ms"), Exact.cents(col("vd"))).otherwise(lit(0L)))
          .cast("long").as("x"),
        sum(when(col("xs") >= col("ms"), Exact.cents(col("vd"))).otherwise(lit(0L)))
          .cast("long").as("y"))
    val xd = col("x").cast("decimal(38,0)")
    val yd = col("y").cast("decimal(38,0)")
    val p = u.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(xd * col("y")).cast("decimal(38,0)").as("sxy"),
      sum(xd * col("x")).cast("decimal(38,0)").as("sxx"),
      sum(yd * col("y")).cast("decimal(38,0)").as("syy"))
    val st = p.select(col("n"), col("sx"), col("sy"),
      (col("n") * col("sxy") - col("sx") * col("sy")).as("c"),
      (col("n") * col("sxx") - col("sx") * col("sx")).as("vx"),
      (col("n") * col("syy") - col("sy") * col("sy")).as("vy"))
    val a = u.groupBy(pmod(col("user_id"), lit(2L)).as("arm"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("x")).cast("decimal(38,0)").as("sxa"),
        sum(col("y")).cast("decimal(38,0)").as("sya"))
    val ok = col("vx") > 0 && col("vy") > 0
    val thetaD = col("c").cast("double") / col("vx").cast("double")
    Curation.withStats(a, st)
      .select(col("arm"), col("n_users"),
        Binning.floorDivCol(lit(2L) * col("sya").cast("long") + col("n_users"),
          lit(2L) * col("n_users")).as("mean_post_cents"),
        when(ok, round(col("sya").cast("double") / col("n_users") -
            thetaD * (col("sxa").cast("double") / col("n_users") -
              col("sx").cast("double") / col("n")), 2) + lit(0.0))
          .otherwise(lit(null).cast("double")).as("adj_mean_post"),
        when(col("vx") > 0, round(thetaD, 6) + lit(0.0))
          .otherwise(lit(null).cast("double")).as("theta"),
        when(ok, floor(lit(1000000) * thetaD *
            (col("c").cast("double") / col("vy").cast("double"))).cast("long"))
          .otherwise(lit(null).cast("long")).as("var_reduction_ppm"))
      .orderedSmall(col("arm"))
  }

  /** Delta-method ratio-metric CI (#323): the correct standard error
    * for ratio metrics under USER-level randomization (revenue per
    * event, CTR per session — Deng et al. 2017, "Applying the Delta
    * Method in Metric Analytics"). The naive per-event variance is
    * wrong because events cluster within users; with users the iid
    * unit, R = ΣY/ΣN and
    *
    *   Var(R) ≈ (s_y² − 2R·s_yn + R²·s_n²) / (m·n̄²)
    *
    * over per-user totals (y_u, n_u). Shape: users collapse to one
    * row each (the only corpus shuffle), then ONE conditional
    * aggregate per arm carries all six sufficient statistics as
    * exact integers. The point estimate is an exact HALF_UP
    * cents-per-event ppm ratio; the variance and the ±1.96·se bounds
    * are mirrored double closed forms over the exact sums (the z
    * literal — no inverse-CDF libm). Degenerate arms (m < 2 or zero
    * event mass) → NULL by exact predicates.
    */
  val qRatioDelta = GateQuery.sql(
    "q_ratio_delta",
    s"""WITH u AS (SELECT user_id % 2 AS arm, user_id,
       |    CAST(sum(${centsSql("vd")}) AS BIGINT) AS y,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM $E e GROUP BY 1, 2),
       |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(n) AS HUGEINT) AS sn,
       |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
       |    CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS snn,
       |    CAST(sum(CAST(y AS HUGEINT) * n) AS HUGEINT) AS syn
       |  FROM u GROUP BY 1),
       |r AS (SELECT arm, m, sy, sn, syy, snn, syn,
       |    CAST(sy AS DOUBLE) / CAST(sn AS DOUBLE) AS rr,
       |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / m) / (m - 1) AS vy,
       |    (CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / m) / (m - 1) AS vn,
       |    (CAST(syn AS DOUBLE) - CAST(sy AS DOUBLE) * sn / m) / (m - 1) AS cyn
       |  FROM a WHERE m >= 2 AND sn > 0)
       |SELECT arm, m AS n_users, CAST(sn AS BIGINT) AS n_events,
       |  CAST((2 * sy * 1000000 + sn) // (2 * sn) AS BIGINT) AS ratio_ppm,
       |  round(sqrt((vy - 2.0 * rr * cyn + rr * rr * vn)
       |    / (m * (CAST(sn AS DOUBLE) / m) * (CAST(sn AS DOUBLE) / m))), 4) + 0.0 AS se,
       |  round(rr - 1.959964 * sqrt((vy - 2.0 * rr * cyn + rr * rr * vn)
       |    / (m * (CAST(sn AS DOUBLE) / m) * (CAST(sn AS DOUBLE) / m))), 2) + 0.0 AS ci_lo,
       |  round(rr + 1.959964 * sqrt((vy - 2.0 * rr * cyn + rr * rr * vn)
       |    / (m * (CAST(sn AS DOUBLE) / m) * (CAST(sn AS DOUBLE) / m))), 2) + 0.0 AS ci_hi
       |FROM r ORDER BY arm""".stripMargin) { (s, d) =>
    val u = ev(s, d)
      .groupBy(pmod(col("user_id"), lit(2L)).as("arm"), col("user_id"))
      .agg(Exact.sumUnits(Exact.cents(col("vd"))).cast("long").as("y"),
        count(lit(1)).cast("long").as("n"))
    val yd = col("y").cast("decimal(38,0)")
    val nd = col("n").cast("decimal(38,0)")
    val a = u.groupBy(col("arm")).agg(
      count(lit(1)).cast("long").as("m"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("n")).cast("decimal(38,0)").as("sn"),
      sum(yd * col("y")).cast("decimal(38,0)").as("syy"),
      sum(nd * col("n")).cast("decimal(38,0)").as("snn"),
      sum(yd * col("n")).cast("decimal(38,0)").as("syn"))
      .filter(col("m") >= 2 && col("sn") > 0)
    val rr = col("sy").cast("double") / col("sn").cast("double")
    val vy = (col("syy").cast("double") - col("sy").cast("double") * col("sy") / col("m")) /
      (col("m") - 1)
    val vn = (col("snn").cast("double") - col("sn").cast("double") * col("sn") / col("m")) /
      (col("m") - 1)
    val cyn = (col("syn").cast("double") - col("sy").cast("double") * col("sn") / col("m")) /
      (col("m") - 1)
    val nbar = col("sn").cast("double") / col("m")
    val se = sqrt((vy - lit(2.0) * rr * cyn + rr * rr * vn) / (col("m") * nbar * nbar))
    a.select(col("arm"), col("m").as("n_users"), col("sn").cast("long").as("n_events"),
        Exact.floorDivBig(lit(2L) * col("sy") * lit(1000000L) + col("sn"),
          lit(2L) * col("sn")).cast("long").as("ratio_ppm"),
        (round(se, 4) + lit(0.0)).as("se"),
        (round(rr - lit(1.959964) * se, 2) + lit(0.0)).as("ci_lo"),
        (round(rr + lit(1.959964) * se, 2) + lit(0.0)).as("ci_hi"))
      .orderedSmall(col("arm"))
  }

  /** Bradley–Terry pairwise-comparison ratings (#412, Bradley &
    * Terry 1952; Zermelo 1929): rate the five event types from
    * hourly head-to-head revenue wins by 5 rounds of the classic
    * minorization fixed point p_i ← W_i / Σ_j n_ij/(p_i+p_j) — THE
    * model behind arena-style pairwise evals (Elo is its online
    * approximation), turning "A beat B in 58% of hours" tables into
    * a consistent rating scale. Wins come from one grid self-join
    * (players², hour-bounded); +1 Laplace per direction keeps every
    * rating positive (mirrored). The fixed point itself runs
    * driver-side over the collected k²-bounded win matrix (bounded
    * model state, the IVF-centroid convention — a DataFrame loop
    * would re-plan the grid self-join every round for zero
    * parallelism gain on a k-row relation) with ALL divisions exact
    * BigInt floors in fixed micro units, renormalized to Σ = k·1e6
    * each round — the rounding order is part of the spec, so parity
    * with the oracle's unrolled HUGEINT CTE rounds is exact.
    */
  val qBradleyTerry = GateQuery.sql(
    "q_bradley_terry", {
      val rounds = (1 to 5).map { r =>
        s"""t$r AS MATERIALIZED (SELECT nn.i AS p,
           |    CAST(sum((CAST(nn.n AS HUGEINT) * 1000000000000)
           |      // (pi.r + pj.r)) AS HUGEINT) AS t
           |  FROM nn JOIN p${r - 1} pi ON nn.i = pi.p
           |    JOIN p${r - 1} pj ON nn.j = pj.p GROUP BY 1),
           |u$r AS MATERIALIZED (SELECT wi.i AS p,
           |    (CAST(wi.wins AS HUGEINT) * 1000000000000) // t$r.t AS r
           |  FROM wi JOIN t$r ON wi.i = t$r.p),
           |s$r AS MATERIALIZED (SELECT CAST(sum(r) AS HUGEINT) AS s,
           |    CAST(count(*) AS HUGEINT) AS k FROM u$r),
           |p$r AS MATERIALIZED (SELECT p, (r * k * 1000000) // s AS r FROM u$r, s$r)"""
          .stripMargin
      }.mkString(",\n")
      // AS MATERIALIZED throughout: the rounds reference each CTE
      // 2-4x, and DuckDB's default inlining re-evaluates the whole
      // upstream chain per reference - measured 514 s for a query
      // whose materialized form runs in milliseconds (r9 baseline)
      s"""WITH g AS MATERIALIZED (SELECT event_type AS p, xs // 3600 AS grid,
         |    CAST(sum(${centsSql("vd")}) AS BIGINT) AS y
         |  FROM $E e GROUP BY 1, 2),
         |pr AS MATERIALIZED (SELECT a.p AS i, b.p AS j,
         |    CAST(count(CASE WHEN a.y > b.y THEN 1 END) + 1 AS BIGINT) AS w
         |  FROM g a JOIN g b ON a.grid = b.grid AND a.p <> b.p GROUP BY 1, 2),
         |nn AS MATERIALIZED (SELECT x.i, x.j, x.w, x.w + y.w AS n
         |  FROM pr x JOIN pr y ON x.i = y.j AND x.j = y.i),
         |wi AS MATERIALIZED (SELECT i, CAST(sum(w) AS BIGINT) AS wins,
         |    CAST(sum(n) AS BIGINT) AS n_games FROM nn GROUP BY 1),
         |p0 AS MATERIALIZED (SELECT i AS p, CAST(1000000 AS HUGEINT) AS r FROM wi),
         |$rounds
         |SELECT wi.i AS player, wi.wins, wi.n_games,
         |  CAST(p5.r AS BIGINT) AS rating_micro
         |FROM wi JOIN p5 ON wi.i = p5.p ORDER BY player""".stripMargin
    }) { (s, d) =>
    val g = ev(s, d)
      .groupBy(col("event_type").as("p"), Binning.floorDiv(col("xs"), 3600L).as("grid"))
      .agg(Exact.sumUnits(Exact.cents(col("vd"))).cast("long").as("y"))
    val a = g.select(col("p").as("i"), col("grid"), col("y").as("ya"))
    val b = g.select(col("p").as("j"), col("grid"), col("y").as("yb"))
    val pr = a.join(b, Seq("grid")).filter(col("i") =!= col("j"))
      .groupBy(col("i"), col("j"))
      .agg((count(when(col("ya") > col("yb"), 1)) + 1).cast("long").as("w"))
    // gate-lifetime cache: the win matrix is read THREE times (the
    // mat collect, the wins collect, and the returned plan through
    // wi) — uncached, each re-runs the corpus grid self-join chain;
    // freed by the harness post-action like every gate cache
    val nn = pr.as("x")
      .join(pr.select(col("i").as("j"), col("j").as("i"), col("w").as("wr")).as("yy"),
        Seq("i", "j"))
      .select(col("i"), col("j"), col("w"), (col("w") + col("wr")).as("n"))
      .persist()
    val wi = nn.groupBy(col("i")).agg(sum(col("w")).cast("long").as("wins"),
      sum(col("n")).cast("long").as("n_games"))
    // the fixed point runs DRIVER-SIDE over the collected k²-bounded
    // win matrix (k = event-type domain, ≤ 25 pairs — the same
    // bounded-model-state convention as the IVF centroids): a
    // DataFrame-loop version re-plans the whole grid self-join per
    // round and the lineage grows superlinearly for zero parallelism
    // gain on a k-row relation. BigInt floors reproduce the oracle's
    // HUGEINT `//` exactly.
    val mat = nn.select(col("i"), col("j"), col("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val winsM = wi.select(col("i"), col("wins")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val players = winsM.keys.toSeq.sorted
    val k = BigInt(players.size)
    var r = players.map(_ -> BigInt(1000000L)).toMap
    for (_ <- 1 to 5) {
      val t = players.map { i =>
        i -> mat.collect { case (`i`, j, n) =>
          (BigInt(n) * BigInt(1000000000000L)) / (r(i) + r(j))
        }.sum
      }.toMap
      val u = players.map(i =>
        i -> (BigInt(winsM(i)) * BigInt(1000000000000L)) / t(i)).toMap
      val sNorm = u.values.sum
      r = players.map(i => i -> (u(i) * k * BigInt(1000000L)) / sNorm).toMap
    }
    val sess = s
    import sess.implicits._
    val ratings = players.map(i => (i, r(i).toLong)).toDF("i", "rating_micro")
    wi.join(broadcast(ratings), "i")
      .select(col("i").as("player"), col("wins"), col("n_games"),
        col("rating_micro"))
      .orderedSmall(col("player"))
  }

  /** Group fairness audit (#408, Feldman 2015 disparate impact;
    * Hardt 2016 equalized odds): per user-group, the selection rate
    * of an activity-threshold "classifier" plus its TPR/FPR against
    * a spend label — then the two headline fairness numbers: the
    * disparate-impact ratio (min/max selection rate; < 0.8 fails
    * the four-fifths rule) and the equal-opportunity gap (max−min
    * TPR). The audit every deployed filter should ship next to its
    * accuracy (#207) — a quality classifier (#96) can be accurate
    * AND selection-skewed. One user aggregate; thresholds on a
    * 1-row broadcast; per-group exact ppm rates; the cross-group
    * extremes ride windows over the 4-row group relation.
    */
  val qFairness = GateQuery.sql(
    "q_fairness",
    s"""WITH u AS (SELECT user_id, user_id % 4 AS grp,
       |    CAST(count(*) AS BIGINT) AS ne,
       |    CAST(sum(${centsSql("vd")}) AS BIGINT) AS sp
       |  FROM $E t GROUP BY 1, 2),
       |m AS (SELECT CAST(sum(ne) // count(*) AS BIGINT) AS me,
       |    CAST(sum(sp) // count(*) AS BIGINT) AS ms FROM u),
       |c AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(count(CASE WHEN ne > me THEN 1 END) AS BIGINT) AS npred,
       |    CAST(count(CASE WHEN sp > ms THEN 1 END) AS BIGINT) AS npos,
       |    CAST(count(CASE WHEN ne > me AND sp > ms THEN 1 END) AS BIGINT) AS ntp,
       |    CAST(count(CASE WHEN ne > me AND sp <= ms THEN 1 END) AS BIGINT) AS nfp
       |  FROM u, m GROUP BY 1),
       |r AS (SELECT grp, n,
       |    (npred * 1000000) // n AS sel_ppm,
       |    CASE WHEN npos > 0 THEN (ntp * 1000000) // npos END AS tpr_ppm,
       |    CASE WHEN n - npos > 0 THEN (nfp * 1000000) // (n - npos) END AS fpr_ppm
       |  FROM c)
       |SELECT grp, n, sel_ppm, tpr_ppm, fpr_ppm,
       |  CASE WHEN max(sel_ppm) OVER () > 0 THEN
       |    (min(sel_ppm) OVER () * 1000000) // (max(sel_ppm) OVER ()) END
       |    AS di_ratio_ppm,
       |  max(tpr_ppm) OVER () - min(tpr_ppm) OVER () AS eo_gap_ppm
       |FROM r ORDER BY grp""".stripMargin) { (s, d) =>
    val u = ev(s, d).groupBy(col("user_id"), pmod(col("user_id"), lit(4L)).as("grp"))
      .agg(count(lit(1)).cast("long").as("ne"),
        Exact.sumUnits(Exact.cents(col("vd"))).cast("long").as("sp"))
    val m = u.agg(floorDivBig(sum(col("ne")), count(lit(1))).cast("long").as("me"),
      floorDivBig(sum(col("sp")), count(lit(1))).cast("long").as("ms"))
    val c = Curation.withStats(u, m).groupBy(col("grp")).agg(
      count(lit(1)).cast("long").as("n"),
      count(when(col("ne") > col("me"), 1)).cast("long").as("npred"),
      count(when(col("sp") > col("ms"), 1)).cast("long").as("npos"),
      count(when(col("ne") > col("me") && col("sp") > col("ms"), 1))
        .cast("long").as("ntp"),
      count(when(col("ne") > col("me") && col("sp") <= col("ms"), 1))
        .cast("long").as("nfp"))
    val r = c.select(col("grp"), col("n"),
      Binning.floorDivCol(col("npred") * lit(1000000L), col("n")).as("sel_ppm"),
      when(col("npos") > 0,
        Binning.floorDivCol(col("ntp") * lit(1000000L), col("npos"))).as("tpr_ppm"),
      when(col("n") - col("npos") > 0,
        Binning.floorDivCol(col("nfp") * lit(1000000L), col("n") - col("npos")))
        .as("fpr_ppm"))
    val wAll = Window.partitionBy()
    r.select(col("grp"), col("n"), col("sel_ppm"), col("tpr_ppm"), col("fpr_ppm"),
        when(max(col("sel_ppm")).over(wAll) > 0,
          Binning.floorDivCol(min(col("sel_ppm")).over(wAll) * lit(1000000L),
            max(col("sel_ppm")).over(wAll))).as("di_ratio_ppm"),
        (max(col("tpr_ppm")).over(wAll) - min(col("tpr_ppm")).over(wAll))
          .as("eo_gap_ppm"))
      .orderedSmall(col("grp"))
  }

  /** Wald instrumental-variable estimator (#398, Wald 1940; Angrist
    * 1990): with a binary instrument z (user-id parity — the
    * assignment-like bit), the LATE of click exposure on spend is
    * the reduced-form/first-stage ratio (ȳ₁−ȳ₀)/(x̄₁−x̄₀) — the
    * simplest causal estimate that survives confounded exposure,
    * next to DiD (#269, which needs a time axis) and CUPED (#322,
    * which only de-noises). One user aggregate + one 2-row arm
    * aggregate, all exact cents/counts; the Wald ratio and the
    * first-stage share are the mirrored doubles; a weak instrument
    * (first stage = 0) yields NULL by exact predicate.
    */
  val qIvWald = GateQuery.sql(
    "q_iv_wald",
    s"""WITH u AS (SELECT user_id, user_id % 2 AS z,
       |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS x,
       |    CAST(sum(${centsSql("vd")}) AS BIGINT) AS y
       |  FROM $E t GROUP BY 1, 2),
       |a AS (SELECT z, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy
       |  FROM u GROUP BY 1),
       |w AS (SELECT
       |    (SELECT n FROM a WHERE z = 1) AS n1, (SELECT n FROM a WHERE z = 0) AS n0,
       |    (SELECT sx FROM a WHERE z = 1) AS sx1, (SELECT sx FROM a WHERE z = 0) AS sx0,
       |    (SELECT sy FROM a WHERE z = 1) AS sy1, (SELECT sy FROM a WHERE z = 0) AS sy0)
       |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
       |  round(CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0, 4) + 0.0
       |    AS first_stage,
       |  round(CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0, 4) + 0.0
       |    AS reduced_form,
       |  CASE WHEN sx1 * n0 <> sx0 * n1 THEN
       |    round((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
       |      / (CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0), 4) + 0.0
       |  END AS wald_late
       |FROM w""".stripMargin) { (s, d) =>
    val u = ev(s, d).groupBy(col("user_id"), pmod(col("user_id"), lit(2L)).as("z"))
      .agg(count(when(col("event_type") === "click", 1)).cast("long").as("x"),
        Exact.sumUnits(Exact.cents(col("vd"))).cast("long").as("y"))
    val a = u.groupBy(col("z")).agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"))
    val w = a.groupBy().pivot("z", Seq(0, 1)).agg(
      first(col("n")).as("n"), first(col("sx")).as("sx"), first(col("sy")).as("sy"))
    def d2(c: Column) = c.cast("double")
    val fs = d2(col("1_sx")) / d2(col("1_n")) - d2(col("0_sx")) / d2(col("0_n"))
    val rf = d2(col("1_sy")) / d2(col("1_n")) - d2(col("0_sy")) / d2(col("0_n"))
    w.select(col("1_n").cast("long").as("n1"), col("0_n").cast("long").as("n0"),
      (round(fs, 4) + lit(0.0)).as("first_stage"),
      (round(rf, 4) + lit(0.0)).as("reduced_form"),
      when(col("1_sx") * col("0_n").cast("decimal(38,0)") =!=
          col("0_sx") * col("1_n").cast("decimal(38,0)"),
        round(rf / fs, 4) + lit(0.0)).as("wald_late"))
  }

  /** Regression discontinuity (#399, Thistlethwaite & Campbell 1960;
    * Imbens & Lemieux 2008): the jump in per-user spend at an
    * activity cutoff (mean event count), estimated by two local
    * linear fits on either side inside a ±half-cutoff bandwidth —
    * the quasi-experimental design for threshold-triggered
    * treatments (fee tiers, rate limits), next to DiD (#269) and IV
    * (#398). Cutoff + bandwidth ride a 1-row broadcast; each side's
    * regression is exact integer sums (Σx, Σy, Σxx, Σxy on the
    * centered running variable); the two boundary intercepts and
    * their gap are mirrored doubles; degenerate sides (no spread)
    * yield NULL by exact predicate.
    */
  val qRdd = GateQuery.sql(
    "q_rdd",
    s"""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS r,
       |    CAST(sum(${centsSql("vd")}) AS BIGINT) AS y
       |  FROM $E t GROUP BY 1),
       |cc AS (SELECT CAST(sum(r) // count(*) AS BIGINT) AS c,
       |    CAST(sum(r) // count(*) AS BIGINT) // 2 AS h FROM u),
       |b AS (SELECT CASE WHEN r >= c THEN 1 ELSE 0 END AS side,
       |    r - c AS x, y FROM u, cc WHERE r >= c - h AND r < c + h),
       |g AS (SELECT side, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
       |  FROM b GROUP BY 1),
       |i AS (SELECT side, n,
       |    CASE WHEN n * sxx - sx * sx <> 0 THEN
       |      (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
       |        / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      / CAST(n AS DOUBLE) END AS icept
       |  FROM g)
       |SELECT
       |  (SELECT n FROM i WHERE side = 0) AS n_left,
       |  (SELECT n FROM i WHERE side = 1) AS n_right,
       |  round((SELECT icept FROM i WHERE side = 0), 4) + 0.0 AS y_left,
       |  round((SELECT icept FROM i WHERE side = 1), 4) + 0.0 AS y_right,
       |  round((SELECT icept FROM i WHERE side = 1)
       |    - (SELECT icept FROM i WHERE side = 0), 4) + 0.0 AS rdd_gap""".stripMargin) {
    (s, d) =>
    val u = ev(s, d).groupBy(col("user_id")).agg(
      count(lit(1)).cast("long").as("r"),
      Exact.sumUnits(Exact.cents(col("vd"))).cast("long").as("y"))
    val cc = u.agg(floorDivBig(sum(col("r")), count(lit(1))).cast("long").as("c"))
      .select(col("c"), Binning.floorDivCol(col("c"), lit(2L)).as("h"))
    val b = Curation.withStats(u, cc)
      .filter(col("r") >= col("c") - col("h") && col("r") < col("c") + col("h"))
      .select(when(col("r") >= col("c"), 1L).otherwise(0L).as("side"),
        (col("r") - col("c")).as("x"), col("y"))
    val g = b.groupBy(col("side")).agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)").as("sxx"),
      sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("sxy"))
    val det = col("n").cast("decimal(38,0)") * col("sxx") - col("sx") * col("sx")
    val icept = when(det =!= 0,
      (col("sy").cast("double") -
        (col("n").cast("decimal(38,0)") * col("sxy") - col("sx") * col("sy"))
          .cast("double") / det.cast("double") * col("sx").cast("double")) /
        col("n").cast("double"))
    val i = g.select(col("side"), col("n"), icept.as("icept"))
    val w = i.groupBy().pivot("side", Seq(0, 1)).agg(
      first(col("n")).as("n"), first(col("icept")).as("icept"))
    w.select(col("0_n").as("n_left"), col("1_n").as("n_right"),
      (round(col("0_icept"), 4) + lit(0.0)).as("y_left"),
      (round(col("1_icept"), 4) + lit(0.0)).as("y_right"),
      (round(col("1_icept") - col("0_icept"), 4) + lit(0.0)).as("rdd_gap"))
  }

  /** Oaxaca–Blinder gap decomposition (#400, Oaxaca 1973; Blinder
    * 1973): how much of the spend gap between two user cohorts is
    * EXPLAINED by activity level (endowments) vs different returns
    * to activity (coefficients)? ΔY = β_B·(x̄_A−x̄_B) +
    * x̄_A·(β_A−β_B) with a single covariate — the audit that says
    * whether a metric gap is a mix effect or a behavior effect,
    * completing the causal shelf (#269/#398/#399). Two per-cohort
    * exact regressions off one aggregate; the decomposition terms
    * are mirrored doubles; the identity endowments + coefficients =
    * gap holds exactly in doubles on both engines (same expression
    * tree).
    */
  val qOaxaca = GateQuery.sql(
    "q_oaxaca",
    s"""WITH u AS (SELECT user_id, user_id % 2 AS grp,
       |    CAST(count(*) AS BIGINT) AS x,
       |    CAST(sum(${centsSql("vd")}) AS BIGINT) AS y
       |  FROM $E t GROUP BY 1, 2),
       |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
       |  FROM u GROUP BY 1),
       |p AS (SELECT grp, n,
       |    CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
       |    CASE WHEN n * sxx - sx * sx <> 0 THEN
       |      CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       |    END AS beta
       |  FROM g),
       |w AS (SELECT
       |    (SELECT n FROM p WHERE grp = 1) AS na, (SELECT n FROM p WHERE grp = 0) AS nb,
       |    (SELECT mx FROM p WHERE grp = 1) AS mxa, (SELECT mx FROM p WHERE grp = 0) AS mxb,
       |    (SELECT my FROM p WHERE grp = 1) AS mya, (SELECT my FROM p WHERE grp = 0) AS myb,
       |    (SELECT beta FROM p WHERE grp = 1) AS ba, (SELECT beta FROM p WHERE grp = 0) AS bb)
       |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       |  round(mya - myb, 4) + 0.0 AS gap,
       |  round(bb * (mxa - mxb), 4) + 0.0 AS endowments,
       |  round(mya - myb - bb * (mxa - mxb), 4) + 0.0 AS coefficients
       |FROM w""".stripMargin) { (s, d) =>
    val u = ev(s, d).groupBy(col("user_id"), pmod(col("user_id"), lit(2L)).as("grp"))
      .agg(count(lit(1)).cast("long").as("x"),
        Exact.sumUnits(Exact.cents(col("vd"))).cast("long").as("y"))
    val g = u.groupBy(col("grp")).agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)").as("sxx"),
      sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("sxy"))
    val det = col("n").cast("decimal(38,0)") * col("sxx") - col("sx") * col("sx")
    val p = g.select(col("grp"), col("n"),
      (col("sx").cast("double") / col("n").cast("double")).as("mx"),
      (col("sy").cast("double") / col("n").cast("double")).as("my"),
      when(det =!= 0,
        (col("n").cast("decimal(38,0)") * col("sxy") - col("sx") * col("sy"))
          .cast("double") / det.cast("double")).as("beta"))
    val w = p.groupBy().pivot("grp", Seq(0, 1)).agg(
      first(col("n")).as("n"), first(col("mx")).as("mx"),
      first(col("my")).as("my"), first(col("beta")).as("beta"))
    val gap = col("1_my") - col("0_my")
    val endow = col("0_beta") * (col("1_mx") - col("0_mx"))
    w.select(col("1_n").cast("long").as("n_a"), col("0_n").cast("long").as("n_b"),
      (round(gap, 4) + lit(0.0)).as("gap"),
      (round(endow, 4) + lit(0.0)).as("endowments"),
      (round(gap - endow, 4) + lit(0.0)).as("coefficients"))
  }

  /** Cucconi joint location-scale test (#388, Cucconi 1968; Marozzi
    * 2009): the OTHER classic two-sample location+scale test — one
    * quadratic form over squared ranks and squared ANTI-ranks,
    * predating and often outpowering Lepage (#362, which sums two
    * separate z²). Same value-collapsed grid and DOUBLED midranks as
    * #212/#362 (midranks are the spec-pinned tie convention); the
    * squared-rank sums stay exact integers in quarter units
    * (S4 = Σc·r2², r2 = 2·midrank), so the U/V numerators
    * 3·S4 − 2n(N+1)(2N+1) are exact; U, V, the rank correlation
    * ρ = 2(N²−4)/((2N+1)(8N+11)) − 1 and
    * C = (U² + V² − 2ρUV)/(2(1−ρ²)) are the mirrored doubles.
    */
  val qCucconi = GateQuery.sql(
    "q_cucconi",
    s"""WITH e AS (SELECT user_id % 8 AS g, event_type, ${centsSql("vd")} AS c
       |  FROM $E t WHERE event_type IN ('click', 'view')),
       |v AS (SELECT g, c,
       |    count(*) FILTER (event_type = 'click') AS c1,
       |    count(*) FILTER (event_type = 'view') AS c2
       |  FROM e GROUP BY g, c),
       |w AS (SELECT g, c1, c2, c1 + c2 AS t,
       |    CAST(sum(c1 + c2) OVER (PARTITION BY g ORDER BY c) AS BIGINT) AS cum,
       |    CAST(sum(c1 + c2) OVER (PARTITION BY g) AS BIGINT) AS nn
       |  FROM v),
       |a AS (SELECT g, CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
       |    any_value(nn) AS nn,
       |    CAST(sum(CAST(c1 AS HUGEINT) * (2 * cum - t + 1) * (2 * cum - t + 1))
       |      AS HUGEINT) AS s4,
       |    CAST(sum(CAST(c1 AS HUGEINT) * (2 * (nn + 1) - (2 * cum - t + 1))
       |      * (2 * (nn + 1) - (2 * cum - t + 1))) AS HUGEINT) AS s4v
       |  FROM w GROUP BY g),
       |z AS (SELECT g, n1, n2, nn,
       |    CASE WHEN n1 = 0 OR n2 = 0 OR nn < 3 THEN NULL ELSE
       |      CAST(3 * s4 - 2 * CAST(n1 AS HUGEINT) * (nn + 1) * (2 * nn + 1) AS DOUBLE)
       |      / (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1) * (2.0 * nn + 1)
       |        * (8.0 * nn + 11) / 5.0)) END AS u,
       |    CASE WHEN n1 = 0 OR n2 = 0 OR nn < 3 THEN NULL ELSE
       |      CAST(3 * s4v - 2 * CAST(n1 AS HUGEINT) * (nn + 1) * (2 * nn + 1) AS DOUBLE)
       |      / (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1) * (2.0 * nn + 1)
       |        * (8.0 * nn + 11) / 5.0)) END AS v,
       |    CASE WHEN nn < 3 THEN NULL ELSE
       |      2.0 * (CAST(nn AS DOUBLE) * nn - 4.0)
       |        / ((2.0 * nn + 1) * (8.0 * nn + 11)) - 1.0 END AS rho
       |  FROM a)
       |SELECT g, n1, n2, round(u, 4) + 0.0 AS u_stat, round(v, 4) + 0.0 AS v_stat,
       |  CASE WHEN u IS NULL OR v IS NULL OR rho IS NULL OR 1.0 - rho * rho <= 0
       |    THEN NULL
       |    ELSE round((u * u + v * v - 2.0 * rho * u * v)
       |      / (2.0 * (1.0 - rho * rho)), 4) + 0.0 END AS cucconi_c
       |FROM z ORDER BY g""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type").isin("click", "view"))
      .select(pmod(col("user_id"), lit(8L)).as("g"), col("event_type"),
        Exact.cents(col("vd")).as("c"))
    val v = e.groupBy(col("g"), col("c")).agg(
      count(when(col("event_type") === "click", 1)).as("c1"),
      count(when(col("event_type") === "view", 1)).as("c2"))
    val w = v.withColumn("t", col("c1") + col("c2"))
      .withColumn("cum",
        sum(col("c1") + col("c2"))
          .over(Window.partitionBy(col("g")).orderBy(col("c"))).cast("long"))
      .withColumn("nn",
        sum(col("c1") + col("c2")).over(Window.partitionBy(col("g"))).cast("long"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val r2 = lit(2L) * col("cum") - col("t") + 1
    val r2v = lit(2L) * (col("nn") + 1) - r2
    val a = w.groupBy(col("g")).agg(
      sum(col("c1")).cast("long").as("n1"), sum(col("c2")).cast("long").as("n2"),
      first(col("nn")).as("nn"),
      sum(dec(col("c1")) * r2 * r2).cast("decimal(38,0)").as("s4"),
      sum(dec(col("c1")) * r2v * r2v).cast("decimal(38,0)").as("s4v"))
    def d2(x: Column) = x.cast("double")
    val nnD = d2(col("nn"))
    val den = lit(2.0) * sqrt(d2(col("n1")) * d2(col("n2")) *
      (nnD + lit(1.0)) * (lit(2.0) * nnD + lit(1.0)) *
      (lit(8.0) * nnD + lit(11.0)) / lit(5.0))
    val degenerate = col("n1") === 0 || col("n2") === 0 || col("nn") < 3
    val uNum = lit(3L) * col("s4") -
      lit(2L) * dec(col("n1")) * (col("nn") + 1) * (lit(2L) * col("nn") + 1)
    val vNum = lit(3L) * col("s4v") -
      lit(2L) * dec(col("n1")) * (col("nn") + 1) * (lit(2L) * col("nn") + 1)
    val u = when(degenerate, lit(null).cast("double")).otherwise(d2(uNum) / den)
    val vv = when(degenerate, lit(null).cast("double")).otherwise(d2(vNum) / den)
    val rho = when(col("nn") < 3, lit(null).cast("double")).otherwise(
      lit(2.0) * (nnD * nnD - lit(4.0)) /
        ((lit(2.0) * nnD + lit(1.0)) * (lit(8.0) * nnD + lit(11.0))) - lit(1.0))
    val z = a.select(col("g"), col("n1"), col("n2"),
      u.as("u"), vv.as("v"), rho.as("rho"))
    z.select(col("g"), col("n1"), col("n2"),
        (round(col("u"), 4) + lit(0.0)).as("u_stat"),
        (round(col("v"), 4) + lit(0.0)).as("v_stat"),
        when(col("u").isNull || col("v").isNull || col("rho").isNull ||
            lit(1.0) - col("rho") * col("rho") <= 0, lit(null).cast("double"))
          .otherwise(round((col("u") * col("u") + col("v") * col("v") -
            lit(2.0) * col("rho") * col("u") * col("v")) /
            (lit(2.0) * (lit(1.0) - col("rho") * col("rho"))), 4) + lit(0.0))
          .as("cucconi_c"))
      .orderedSmall(col("g"))
  }

  /** Wilcoxon signed-rank test (#387, Wilcoxon 1945): the PAIRED
    * rank test the family was missing — per user-cohort, did
    * per-user revenue shift between the first and second half of
    * the window? McNemar (#259) answers this for binary outcomes
    * and the t-test (#179) assumes normality; this is the
    * distribution-free middle. Pairs are per-user half-sums around
    * the global time midpoint (one 1-row broadcast); zero
    * differences drop (Wilcoxon's rule); |d| ranks live on a
    * VALUE-COLLAPSED grid (one cumsum window per cohort, never a
    * per-row sort) with DOUBLED midranks 2·cum−t+1 kept integer;
    * W⁺×2 and the tie term Σ(t³−t) are exact decimal sums; z =
    * (W2−E2)·√12/√(48·Var-scale) is the one mirrored double, with
    * the degenerate guard an exact integer predicate.
    */
  val qWilcoxon = GateQuery.sql(
    "q_wilcoxon",
    s"""WITH m AS (SELECT (min(xs) + max(xs)) // 2 AS mid FROM $E t),
       |p AS (SELECT user_id % 8 AS g,
       |    CAST(sum(CASE WHEN xs <= mid THEN ${centsSql("vd")} ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN xs > mid THEN ${centsSql("vd")} ELSE 0 END) AS BIGINT) AS c2
       |  FROM $E t, m GROUP BY 1),
       |d AS (SELECT g, c2 - c1 AS d FROM p WHERE c2 <> c1),
       |v AS (SELECT g, abs(d) AS ad, CAST(count(*) AS BIGINT) AS t,
       |    CAST(count(*) FILTER (d > 0) AS BIGINT) AS tp
       |  FROM d GROUP BY 1, 2),
       |w AS (SELECT g, ad, t, tp,
       |    CAST(sum(t) OVER (PARTITION BY g ORDER BY ad) AS BIGINT) AS cum
       |  FROM v),
       |a AS (SELECT g, CAST(sum(t) AS BIGINT) AS n,
       |    CAST(sum(CAST(tp AS HUGEINT) * (2 * cum - t + 1)) AS HUGEINT) AS wp2,
       |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties
       |  FROM w GROUP BY 1)
       |SELECT g, n, CAST(wp2 AS BIGINT) AS w_plus_x2,
       |  CASE WHEN n >= 1
       |      AND 2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - ties > 0 THEN
       |    round((CAST(wp2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1.0) / 2.0)
       |      * sqrt(12.0)
       |      / sqrt(CAST(2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - ties
       |          AS DOUBLE)), 4) + 0.0
       |  END AS z_stat
       |FROM a ORDER BY g""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    val m = e.agg(Binning.floorDivCol(min(col("xs")) + max(col("xs")), lit(2L)).as("mid"))
    val p = Curation.withStats(e, m)
      .groupBy(pmod(col("user_id"), lit(8L)).as("g"))
      .agg(
        sum(when(col("xs") <= col("mid"), Exact.cents(col("vd"))).otherwise(0L))
          .cast("long").as("c1"),
        sum(when(col("xs") > col("mid"), Exact.cents(col("vd"))).otherwise(0L))
          .cast("long").as("c2"))
    val dd = p.filter(col("c2") =!= col("c1"))
      .select(col("g"), (col("c2") - col("c1")).as("d"))
    val v = dd.groupBy(col("g"), abs(col("d")).as("ad")).agg(
      count(lit(1)).cast("long").as("t"),
      count(when(col("d") > 0, 1)).cast("long").as("tp"))
    val w = v.withColumn("cum",
      sum(col("t")).over(Window.partitionBy(col("g")).orderBy(col("ad"))).cast("long"))
    val a = w.groupBy(col("g")).agg(
      sum(col("t")).cast("long").as("n"),
      sum(col("tp").cast("decimal(38,0)") * (lit(2L) * col("cum") - col("t") + 1))
        .cast("decimal(38,0)").as("wp2"),
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .cast("decimal(38,0)").as("ties"))
    val var48 = lit(2L) * col("n").cast("decimal(38,0)") * (col("n") + 1) *
      (lit(2L) * col("n") + 1) - col("ties")
    a.select(col("g"), col("n"), col("wp2").cast("long").as("w_plus_x2"),
        when(col("n") >= 1 && var48 > 0,
          round((col("wp2").cast("double") -
              col("n").cast("double") * (col("n").cast("double") + lit(1.0)) / lit(2.0)) *
            sqrt(lit(12.0)) / sqrt(var48.cast("double")), 4) + lit(0.0))
          .as("z_stat"))
      .orderedSmall(col("g"))
  }

  /** Ordered-logit (proportional-odds) score test (#416, McCullagh
    * 1980): does language predict the ORDINAL length class of a
    * document? The score test of β = 0 in the proportional-odds
    * model with one binary covariate reduces EXACTLY to the
    * tie-corrected Wilcoxon rank-sum statistic computed on the
    * grouped ordinal scale (the classic identity the rank test's
    * "efficiency" results come from) — so the whole test runs on the
    * K=4 category count table: doubled midranks 2·cum−c+1 stay
    * integer, the tie term Σ(c³−c) is an exact HUGEINT sum (ordinal
    * data is ALL ties — the correction is the point), and z is one
    * mirrored double. Complements Mann–Whitney (#212, continuous
    * values) and Cochran–Armitage (#trend on binary outcomes).
    */
  val qOlogitScore = GateQuery.sql(
    "q_ologit_score",
    """WITH c0 AS (SELECT CASE WHEN n_chars < 200 THEN 1 WHEN n_chars < 400 THEN 2
      |      WHEN n_chars < 800 THEN 3 ELSE 4 END AS cat,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS x
      |  FROM documents),
      |c AS (SELECT cat, CAST(count(*) AS BIGINT) AS c, CAST(sum(x) AS BIGINT) AS c1
      |  FROM c0 GROUP BY cat),
      |w AS (SELECT cat, c, c1,
      |    CAST(2 * (sum(c) OVER (ORDER BY cat) - c) + c + 1 AS BIGINT) AS r2 FROM c),
      |a AS (SELECT CAST(sum(c1 * r2) AS BIGINT) AS w2,
      |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c) AS BIGINT) AS nn,
      |    CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS tcube
      |  FROM w)
      |SELECT n1, nn - n1 AS n0, w2 AS w2_sum, n1 * (nn + 1) AS e2,
      |  CAST(tcube AS BIGINT) AS tie_cube,
      |  CASE WHEN nn > 1 AND n1 > 0 AND nn > n1
      |      AND CAST(nn AS HUGEINT) * nn * nn - nn > tcube THEN
      |    round(CAST(w2 - n1 * (nn + 1) AS DOUBLE) /
      |      (2.0 * sqrt(CAST(n1 AS DOUBLE) * (nn - n1) / 12.0 / nn / (nn - 1)
      |        * CAST(CAST(nn AS HUGEINT) * nn * nn - nn - tcube AS DOUBLE))), 4) + 0.0
      |  END AS z_score
      |FROM a""".stripMargin) { (s, d) =>
    val c0 = Tables.documents(s, d).select(
      when(col("n_chars") < 200, 1L).when(col("n_chars") < 400, 2L)
        .when(col("n_chars") < 800, 3L).otherwise(4L).as("cat"),
      when(col("lang") === "en", 1L).otherwise(0L).as("x"))
    val c = c0.groupBy(col("cat"))
      .agg(count(lit(1)).cast("long").as("c"), sum(col("x")).cast("long").as("c1"))
    // 4-row category table: the single-partition window is bounded by
    // the ordinal DOMAIN, not the corpus
    val w = c.withColumn("r2",
      (lit(2L) * (sum(col("c")).over(Window.orderBy(col("cat"))) - col("c"))
        + col("c") + 1).cast("long"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val a = w.agg(sum(col("c1") * col("r2")).cast("long").as("w2"),
      sum(col("c1")).cast("long").as("n1"), sum(col("c")).cast("long").as("nn"),
      sum(dec(col("c")) * col("c") * col("c") - col("c")).cast("decimal(38,0)").as("tcube"))
    val nnn = dec(col("nn")) * col("nn") * col("nn") - col("nn")
    a.select(col("n1"), (col("nn") - col("n1")).as("n0"), col("w2").as("w2_sum"),
      (col("n1") * (col("nn") + 1)).as("e2"),
      col("tcube").cast("long").as("tie_cube"),
      when(col("nn") > 1 && col("n1") > 0 && col("nn") > col("n1") &&
          nnn > col("tcube"),
        round((col("w2") - col("n1") * (col("nn") + 1)).cast("double") /
          (lit(2.0) * sqrt(col("n1").cast("double") * (col("nn") - col("n1"))
            / lit(12.0) / col("nn") / (col("nn") - 1)
            * (nnn - col("tcube")).cast("double"))), 4) + lit(0.0))
        .as("z_score"))
  }

  val all: Seq[GateQuery] = Seq(
    qOlogitScore,
    qConfusion, qBrier, qEce, qMurphy, qCohenKappa, qAnova, qMannWhitney, qPropTest,
    qMoments, qKruskalWallis, qJonckheere, qLepage, qSiegelTukey, qCronbach, qSplitHalf, qBlandAltman, qTwowayAnova, qCuped, qRatioDelta, qCochranArmitage, qIcc,
    qWilcoxon, qCucconi, qIvWald, qRdd, qOaxaca, qFairness, qBradleyTerry)
}
