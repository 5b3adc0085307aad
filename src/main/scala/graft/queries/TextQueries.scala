package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Binning, Dedup, Exact, MultimodalOps, Packing, Relational, Sampling, TextOps}
import graft.operators.Exact.roundedRatioSql
import graft.operators.TextOps.{baseHashSql, markerCountSql}

/** Text / dedup gate queries (SURVEY.md §2 #21–#24, #28–#31) over the
  * `documents` table — the LLM-training-data-pipeline family: exact
  * dedup, n-gram Jaccard, MinHash+LSH, SimHash, language ID, quality
  * scoring, token counting, rolling fingerprints.
  *
  * All hashing uses the cross-engine `base_hash` scheme (SURVEY.md §4)
  * so every signature is SQL-checkable in DuckDB; all ratios use
  * [[Exact.roundedRatio]] integer rounding (no double-division ties).
  */
object TextQueries {

  /** Shared DuckDB fragment: distinct 60-bit 3-gram shingle keys per
    * doc with the per-doc count `m` carried along (mirror of
    * [[graft.operators.Dedup]]'s shingle relation). */
  private[queries] val ShinglesSql =
    s"""sh AS (
       |  SELECT doc_id, unnest(shl) AS h, len(shl) AS m
       |  FROM (SELECT doc_id, list_distinct(
       |          [${TextOps.shingleKeySql("array_to_string(w[i:i+2], ' ')")} for i in range(1, len(w) - 1)]) AS shl
       |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) tw) tl)""".stripMargin

  val qDedupExact = GateQuery.sql(
    "q_dedup_exact",
    """SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY content_md5 ORDER BY content_md5""".stripMargin) { (s, d) =>
    Relational.dedupExact(Tables.documents(s, d), col("text"), col("doc_id"))
      .orderedSmall(col("content_md5"))
  }

  val qTokenCount = GateQuery.sql(
    "q_token_count",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_words,
      |  len(regexp_extract_all(text, '[a-z]+')) AS n_tokens,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
        col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_words"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("n_tokens"),
        col("n_chars"))
      .orderedSmall(col("doc_id"))
  }

  val qTextQuality = GateQuery.sql(
    "q_text_quality",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |q AS (SELECT doc_id,
       |    len(w) AS n_words,
       |    CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS sum_len,
       |    len(list_filter(w, x -> x IN ('a', 'the'))) AS n_stop,
       |    len(list_distinct(w)) AS n_distinct
       |  FROM t)
       |SELECT doc_id, n_words,
       |  ${roundedRatioSql("sum_len", "n_words", 4)} AS avg_word_len,
       |  ${roundedRatioSql("n_stop", "n_words", 4)} AS stop_ratio,
       |  ${roundedRatioSql("n_distinct", "n_words", 4)} AS distinct_ratio
       |FROM q ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = TextOps.tokens(col("text"))
    Tables.documents(s, d).select(
        col("doc_id"),
        size(w).cast("long").as("n_words"),
        aggregate(w, lit(0L), (acc, x) => acc + length(x)).as("sum_len"),
        TextOps.markerCount(col("text"), Seq("a", "the")).as("n_stop"),
        size(array_distinct(w)).cast("long").as("n_distinct"))
      .select(
        col("doc_id"), col("n_words"),
        Exact.roundedRatio(col("sum_len"), col("n_words"), 4).as("avg_word_len"),
        Exact.roundedRatio(col("n_stop"), col("n_words"), 4).as("stop_ratio"),
        Exact.roundedRatio(col("n_distinct"), col("n_words"), 4).as("distinct_ratio"))
      .orderedSmall(col("doc_id"))
  }

  /** Marker-word language ID. Ties broken by fixed priority
    * en > de > es > fr; no markers at all → 'und'. */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("a", "the"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "les", "et", "une"))

  val qLangId = GateQuery.sql(
    "q_lang_id", {
      val scores = Markers.map { case (lang, ms) =>
        s"${markerCountSql("text", ms)} AS s_$lang"
      }.mkString(",\n    ")
      """WITH t AS (SELECT doc_id,
        |    SCORES
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
        |       WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de'
        |       WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |       WHEN s_fr > 0 THEN 'fr'
        |       ELSE 'und' END AS pred_lang,
        |  s_en + s_de + s_es + s_fr AS n_markers
        |FROM t ORDER BY doc_id""".stripMargin.replace("SCORES", scores)
    }) { (s, d) =>
    val scored = Tables.documents(s, d).select(
      col("doc_id") +: Markers.map { case (lang, ms) =>
        TextOps.markerCount(col("text"), ms).as(s"s_$lang")
      }: _*)
    scored.select(
        col("doc_id"),
        when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr")) && col("s_en") > 0, "en")
          .when(col("s_de") >= greatest(col("s_es"), col("s_fr")) && col("s_de") > 0, "de")
          .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
          .when(col("s_fr") > 0, "fr")
          .otherwise("und").as("pred_lang"),
        (col("s_en") + col("s_de") + col("s_es") + col("s_fr")).as("n_markers"))
      .orderedSmall(col("doc_id"))
  }

  /** Krippendorff's alpha (#341): chance-corrected agreement between
    * the corpus's lang labels and the marker-heuristic lang-id (#28)
    * treated as two raters over every document — the
    * coincidence-matrix generalization of Cohen's kappa (#210)
    * (Krippendorff 2004; kappa corrects by each rater's OWN
    * marginals, alpha by the POOLED marginals, so it extends to many
    * raters/missing data and is the reliability standard in
    * annotation pipelines). Nominal metric, 2 raters, complete data:
    *
    *   α = 1 − (n−1)·Σ_{v≠w} o(v,w) / (n² − Σ_v n_v²)
    *
    * with o the coincidence counts and n_v the pooled category
    * totals — ALL exact integers here (no entropy, no doubles):
    * alpha_ppm is one exact decimal-lifted floor division. Shape:
    * one doc-keyed projection (the lang-id expression), one
    * category-keyed count (bounded by the language domain), one
    * global conditional aggregate.
    */
  val qKrippendorff = GateQuery.sql(
    "q_krippendorff", {
      val scores = Markers.map { case (lang, ms) =>
        s"${markerCountSql("text", ms)} AS s_$lang"
      }.mkString(",\n    ")
      """WITH t AS (SELECT doc_id, lang,
        |    SCORES
        |  FROM documents),
        |p AS (SELECT lang AS r1,
        |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
        |       WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de'
        |       WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |       WHEN s_fr > 0 THEN 'fr'
        |       ELSE 'und' END AS r2
        |  FROM t),
        |cats AS (SELECT cat, CAST(count(*) AS BIGINT) AS nv FROM
        |  (SELECT r1 AS cat FROM p UNION ALL SELECT r2 FROM p) u GROUP BY 1),
        |s AS (SELECT CAST(sum(nv) AS BIGINT) AS n,
        |    CAST(sum(CAST(nv AS HUGEINT) * nv) AS HUGEINT) AS nv2,
        |    CAST(count(*) AS BIGINT) AS k FROM cats),
        |d AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(CASE WHEN r1 <> r2 THEN 1 ELSE 0 END) AS BIGINT) AS ndis
        |  FROM p)
        |SELECT nd AS n_units, k AS n_categories, ndis AS n_disagree,
        |  CASE WHEN CAST(n AS HUGEINT) * n = nv2 THEN NULL
        |    ELSE CAST(1000000 - (CAST(n - 1 AS HUGEINT) * (2 * ndis) * 1000000)
        |      // (CAST(n AS HUGEINT) * n - nv2) AS BIGINT)
        |  END AS alpha_ppm
        |FROM d, s""".stripMargin.replace("SCORES", scores)
    }) { (s, d) =>
    val t = Tables.documents(s, d).select(
      col("doc_id") +: col("lang") +: Markers.map { case (lang, ms) =>
        TextOps.markerCount(col("text"), ms).as(s"s_$lang")
      }: _*)
    val p = t.select(col("lang").as("r1"),
      when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr")) && col("s_en") > 0, "en")
        .when(col("s_de") >= greatest(col("s_es"), col("s_fr")) && col("s_de") > 0, "de")
        .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
        .when(col("s_fr") > 0, "fr")
        .otherwise("und").as("r2"))
    val cats = p.select(col("r1").as("cat")).union(p.select(col("r2").as("cat")))
      .groupBy(col("cat")).agg(count(lit(1)).cast("long").as("nv"))
    val st = cats.agg(sum(col("nv")).cast("long").as("n"),
      sum(col("nv").cast("decimal(38,0)") * col("nv")).cast("decimal(38,0)").as("nv2"),
      count(lit(1)).cast("long").as("k"))
    val dd = p.agg(count(lit(1)).cast("long").as("nd"),
      sum(when(col("r1") =!= col("r2"), 1L).otherwise(0L)).cast("long").as("ndis"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    graft.operators.Curation.withStats(dd, st)
      .select(col("nd").as("n_units"), col("k").as("n_categories"),
        col("ndis").as("n_disagree"),
        when(dec(col("n")) * col("n") === col("nv2"), lit(null).cast("long"))
          .otherwise(lit(1000000L) - graft.operators.Exact.floorDivBig(
            dec(col("n") - 1) * (lit(2L) * col("ndis")) * lit(1000000L),
            dec(col("n")) * col("n") - col("nv2")).cast("long"))
          .as("alpha_ppm"))
  }

  /** #106 — fastText-grade language ID: multi-class linear classifier
    * over hashed character-trigram features, trained on the corpus's
    * own labels and deployed as an inlined argmax expression — the
    * model family CCNet/C4 actually run for lang-id at corpus scale.
    * Hash-checked SQL since r10 (the unrolled-GD recipe of
    * q_quality_classifier, lifted to multi-class by keying the
    * weight/gradient relations on (class, bucket) — the class list
    * stays DATA-DERIVED via a distinct-lang CTE, so the oracle keeps
    * training on the corpus's own labels): 6 one-vs-rest iterations
    * over the deterministic 25% hash subsample, full-corpus argmax
    * scoring with ties to the lexicographically-last label
    * (max-struct convention). The accuracy floor on a multilingual
    * fixture stays LangClassifierSpec's.
    * [[qLangId]] (the marker heuristic) remains the cheap-path gate.
    */
  val qLangIdFt = GateQuery.sql(
    "q_lang_id_ft", {
      val trigrams =
        s"[${TextOps.baseHashSql("substr(text, CAST(i AS INTEGER), 3)")} % 1024 " +
          "for i in range(1, len(text) - 1)]"
      val iters = (1 to 6).map { i =>
        val wp = s"w${i - 1}"
        s"""m$i AS MATERIALIZED (SELECT g.doc_id, any_value(g.lang) AS lang, w.cl,
           |    CAST(sum(w.wt) AS BIGINT) AS m
           |  FROM bgs g JOIN $wp w USING (b) GROUP BY g.doc_id, w.cl),
           |r$i AS MATERIALIZED (SELECT doc_id, cl,
           |    CAST(floor((1.0 / (1.0 + exp((-(m)) / 1000000.0))
           |      - (lang = cl)::INT) * 1000000) AS BIGINT) AS r
           |  FROM m$i),
           |g$i AS MATERIALIZED (SELECT g.b, r.cl, CAST(sum(r.r) AS BIGINT) AS gr
           |  FROM bgs g JOIN r$i r USING (doc_id) GROUP BY g.b, r.cl),
           |w$i AS MATERIALIZED (SELECT w.cl, w.b, w.wt - CAST(floor((0.5 * ((CAST(g.gr AS DOUBLE)
           |      / 1000000.0) / (SELECT nd FROM nd))) * 1000000.0 + 0.5) AS BIGINT)
           |    AS wt
           |  FROM $wp w JOIN g$i g ON g.b = w.b AND g.cl = w.cl)""".stripMargin
      }.mkString(",\n")
      s"""WITH tw AS (SELECT doc_id, lang, text FROM documents WHERE len(text) >= 3),
         |bg AS MATERIALIZED (SELECT doc_id, lang, unnest($trigrams) AS b FROM tw),
         |cls AS (SELECT DISTINCT lang AS cl FROM tw),
         |smp AS MATERIALIZED (SELECT doc_id FROM tw
         |  WHERE ${graft.operators.Sampling.sampleByHashSql("doc_id", 25, "lidtrain")}),
         |bgs AS MATERIALIZED (SELECT bg.* FROM bg JOIN smp USING (doc_id)),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM bgs),
         |w0 AS MATERIALIZED (SELECT c.cl, b.b, CAST(0 AS BIGINT) AS wt
         |  FROM cls c CROSS JOIN (SELECT DISTINCT b FROM bgs) b),
         |$iters,
         |msc AS (SELECT bg.doc_id, c.cl,
         |    CAST(sum(coalesce(w.wt, 0)) AS BIGINT) AS s2,
         |    CAST(count(*) AS BIGINT) AS nf
         |  FROM bg CROSS JOIN cls c
         |  LEFT JOIN w6 w ON w.b = bg.b AND w.cl = c.cl
         |  GROUP BY bg.doc_id, c.cl),
         |win AS (SELECT doc_id, nf, cl, s2, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY s2 DESC, cl DESC) AS rn FROM msc)
         |SELECT doc_id, nf AS n_feat, cl AS pred_lang, s2 AS score_micro
         |FROM win WHERE rn = 1 ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    import graft.operators.LangClassifier
    val docs = Tables.documents(s, d)
    val packed = LangClassifier.features(docs, buckets = 1024, n = 3)
    // the trained model is a deterministic driver value (langs +
    // (class, bucket) weights) — session-cached like the LM model
    // tables, so the 6-iteration GD loop trains once per corpus and
    // the gate itself is one featurize+argmax scoring pass
    val m = graft.SharedRelations.cachedValue("lidft", d) {
      val p = packed.persist()
      try {
        val langs = p.select(col("lang")).distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        // playbook: train on a deterministic 25% subsample (each GD
        // pass explodes ~one feature per character)
        LangClassifier.train(p, langs, buckets = 1024, iters = 6,
          lr = 0.5, samplePct = 25)
      } finally p.unpersist()
    }
    LangClassifier.predict(packed, m)
      .orderedSmall(col("doc_id"))
  }

  val qFingerprint = GateQuery.sql(
    "q_fingerprint",
    s"""SELECT doc_id, CAST(${TextOps.fingerprintSql("text")} AS BIGINT) AS fp
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), graft.expressions.TextExpressions.fingerprint(col("text")).as("fp"))
      .orderedSmall(col("doc_id"))
  }

  val qSimHash = GateQuery.sql(
    "q_simhash",
    s"""WITH t AS (SELECT doc_id,
       |    list_transform(string_split(text, ' '), tk -> ${baseHashSql("tk")}) AS hs
       |  FROM documents)
       |SELECT doc_id, CAST(${TextOps.simHashSql("hs")} AS BIGINT) AS simhash
       |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), graft.expressions.TextExpressions.simHash32(col("text")).as("simhash"))
      .orderedSmall(col("doc_id"))
  }

  val qJaccardPairs = GateQuery.sql(
    "q_jaccard_pairs",
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(shl) AS h, len(shl) AS m
       |  FROM (SELECT doc_id, list_distinct(
       |          [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]) AS shl
       |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) tw) tl),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b,
       |  ${roundedRatioSql("inter", "(ma + mb - inter)", 4)} AS jaccard
       |FROM p
       |WHERE inter * 100 >= (ma + mb - inter) * 50
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    // shared candidate-pair snapshot (SharedRelations.docPairCounts3):
    // only the pair-domain threshold filter runs in-gate
    Dedup.jaccardPairsFrom(graft.SharedRelations.docPairCounts3(s, d), 50)
      .orderedSmall(col("doc_a"), col("doc_b"))
  }

  /** Index of coincidence (#359): per source, the probability two
    * random letters match — IC = Σfᵢ(fᵢ−1)/(N(N−1)) (Friedman 1922;
    * ~0.065 for English, 1/26 ≈ 0.038 for uniform noise). In a data
    * pipeline this is the encrypted/compressed/base64-payload screen
    * next to the compression-ratio signal (#161): flat letter
    * statistics at normal character shares = not natural language.
    * Zero explode: each of the 26 letter counts is a
    * length-difference expression (len(x) − len(replace(x, c, ''))) —
    * a pure codegen projection per doc — summed per source in ONE
    * aggregate; Σf(f−1) and the ppm ratio are exact decimal-lifted
    * integer arithmetic over the 26-column source relation.
    */
  val qIndexCoincidence = GateQuery.sql(
    "q_index_coincidence", {
      val letters = ('a' to 'z').toSeq
      val perDoc = letters.map(c =>
        s"CAST(len(text) - len(replace(text, '$c', '')) AS BIGINT) AS f_$c")
        .mkString(",\n    ")
      val sums = letters.map(c => s"CAST(sum(f_$c) AS BIGINT) AS f_$c").mkString(", ")
      val sumF = letters.map(c => s"f_$c").mkString(" + ")
      val sumFF1 = letters.map(c => s"CAST(f_$c AS HUGEINT) * (f_$c - 1)").mkString("\n      + ")
      s"""WITH t AS (SELECT source,
         |    $perDoc
         |  FROM documents),
         |s AS (SELECT source, $sums FROM t GROUP BY source),
         |a AS (SELECT source, $sumF AS n, $sumFF1 AS ff1 FROM s)
         |SELECT source, CAST(n AS BIGINT) AS n_letters,
         |  CASE WHEN n > 1 THEN
         |    CAST((ff1 * 1000000) // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
         |  END AS ic_ppm,
         |  CASE WHEN n > 1 THEN
         |    CAST((ff1 * 26000000) // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
         |  END AS ic_norm_ppm
         |FROM a ORDER BY source""".stripMargin
    }) { (s, d) =>
    val letters = ('a' to 'z').toSeq
    // NOTE (r9): measured AGAINST replacing this with a one-pass
    // letter-count kernel (both element_at-sums and posexplode
    // fan-out shapes) — the docs are short enough that 26 codegen'd
    // replace projections inside one whole-stage span beat both
    // (0.55 s vs 0.68/0.80 s at sf0.1); the gate is aggregate-bound
    val t = Tables.documents(s, d).select(
      col("source") +: letters.map(c =>
        (length(col("text")) - length(expr(s"replace(text, '$c', '')")))
          .cast("long").as(s"f_$c")): _*)
    val sdf = t.groupBy(col("source"))
      .agg(sum(col(s"f_${letters.head}")).cast("long").as(s"f_${letters.head}"),
        letters.tail.map(c => sum(col(s"f_$c")).cast("long").as(s"f_$c")): _*)
    def dec(x: Column) = x.cast("decimal(38,0)")
    val n = letters.map(c => col(s"f_$c")).reduce(_ + _)
    val ff1 = letters.map(c => dec(col(s"f_$c")) * (col(s"f_$c") - 1)).reduce(_ + _)
    val a = sdf.select(col("source"), n.as("n"), ff1.as("ff1"))
    a.select(col("source"), col("n").cast("long").as("n_letters"),
        when(col("n") > 1,
          Exact.floorDivBig(col("ff1") * lit(1000000L), dec(col("n")) * (col("n") - 1))
            .cast("long")).as("ic_ppm"),
        when(col("n") > 1,
          Exact.floorDivBig(col("ff1") * lit(26000000L), dec(col("n")) * (col("n") - 1))
            .cast("long")).as("ic_norm_ppm"))
      .orderedSmall(col("source"))
  }

  /** Fleiss' kappa (#352): do the corpus's quality heuristics AGREE?
    * Three deterministic "raters" each vote good/bad per document —
    * word count ≥ 40, lexical diversity (2·distinct ≥ words), length
    * ≥ 400 chars — and Fleiss' kappa (1971) measures their
    * chance-corrected agreement, the k-rater generalization Cohen's
    * kappa (#210) can't do. Low kappa = the quality rules measure
    * DIFFERENT things (keep all three in the funnel); high kappa =
    * redundant rules (drop the expensive one). Binary categories and
    * k=3 raters collapse the whole statistic to THREE corpus sums
    * (n, S=Σrᵢ, A=Σ(rᵢ²+(3−rᵢ)²−3)) in ONE aggregate; clearing
    * denominators by 18n² makes kappa a single signed HALF_UP ppm
    * ratio of decimal-lifted exact integers — no doubles until the
    * final rounded output.
    */
  val qFleissKappa = GateQuery.sql(
    "q_fleiss_kappa",
    """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents),
      |v AS (SELECT
      |    (CASE WHEN len(w) >= 40 THEN 1 ELSE 0 END)
      |      + (CASE WHEN 2 * len(list_distinct(w)) >= len(w) THEN 1 ELSE 0 END)
      |      + (CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS r
      |  FROM t),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS s,
      |    CAST(sum(r * r + (3 - r) * (3 - r) - 3) AS BIGINT) AS aa
      |  FROM v),
      |f AS (SELECT n, s, aa,
      |    3 * CAST(n AS HUGEINT) * aa
      |      - 2 * (CAST(s AS HUGEINT) * s + CAST(3 * n - s AS HUGEINT) * (3 * n - s)) AS num,
      |    18 * CAST(n AS HUGEINT) * n
      |      - 2 * (CAST(s AS HUGEINT) * s + CAST(3 * n - s AS HUGEINT) * (3 * n - s)) AS den
      |  FROM a)
      |SELECT n AS n_docs, s AS n_good_votes, aa AS agree_sum,
      |  CASE WHEN den = 0 THEN NULL
      |    ELSE (CASE WHEN num >= 0 THEN CAST((num * 2000000 + den) // (den * 2) AS BIGINT)
      |          ELSE -CAST(((-num) * 2000000 + den) // (den * 2) AS BIGINT) END)
      |  END AS kappa_ppm
      |FROM f""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
      TextOps.tokens(col("text")).as("w"))
    val v = t.select(
      (when(size(col("w")) >= 40, 1L).otherwise(0L) +
        when(lit(2) * size(array_distinct(col("w"))) >= size(col("w")), 1L).otherwise(0L) +
        when(col("n_chars") >= 400, 1L).otherwise(0L)).as("r"))
    val a = v.agg(count(lit(1)).cast("long").as("n"), sum(col("r")).cast("long").as("s"),
      sum(col("r") * col("r") + (lit(3L) - col("r")) * (lit(3L) - col("r")) - 3L)
        .cast("long").as("aa"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val pe2 = dec(col("s")) * col("s") +
      dec(lit(3L) * col("n") - col("s")) * (lit(3L) * col("n") - col("s"))
    val f = a.select(col("n"), col("s"), col("aa"),
      (lit(3L) * dec(col("n")) * col("aa") - lit(2L) * pe2).as("num"),
      (lit(18L) * dec(col("n")) * col("n") - lit(2L) * pe2).as("den"))
    def halfUp(num: Column, den: Column) =
      Exact.floorDivBig(num * lit(2000000L) + den, den * lit(2L)).cast("long")
    f.select(col("n").as("n_docs"), col("s").as("n_good_votes"),
      col("aa").as("agree_sum"),
      when(col("den") === 0, lit(null).cast("long"))
        .otherwise(when(col("num") >= 0, halfUp(col("num"), col("den")))
          .otherwise(-halfUp(-col("num"), col("den")))).as("kappa_ppm"))
  }

  /** Lincoln–Petersen capture–recapture duplication estimate (#338):
    * how many near-duplicate documents does the corpus REALLY hold —
    * including the ones every detector misses? Treat two partially-
    * independent detectors as ecology "captures" (Lincoln 1930,
    * Chapman 1951 bias-corrected): capture A = docs in any
    * SimHash hamming≤3 pair (banded 4×8-bit equi-join — bit-flip
    * failure mode), capture B = docs in any ≥50% Jaccard shingle
    * pair (the capped group-join stage — shingle-overlap failure
    * mode). N̂ = (n₁+1)(n₂+1)/(m+1) − 1 sizes the residual dup
    * population the union missed — the number that decides whether
    * another dedup pass is worth its cost at 100 TB. All counts and
    * the Chapman estimator are exact integers; the only pair stages
    * are the two detectors' own banded/capped joins.
    */
  val qCaptureRecapture = GateQuery.sql(
    "q_capture_recapture",
    s"""WITH t AS (SELECT doc_id,
       |    list_transform(string_split(text, ' '), tk -> ${baseHashSql("tk")}) AS hs
       |  FROM documents),
       |shh AS (SELECT doc_id, CAST(${TextOps.simHashSql("hs")} AS BIGINT) AS s FROM t),
       |bb AS (SELECT doc_id, s, b, (s >> (8 * b)) & 255 AS k
       |  FROM shh, (SELECT unnest(generate_series(0, 3)) AS b) bs),
       |cp AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.s AS sa, b.s AS sb
       |  FROM bb a JOIN bb b ON a.b = b.b AND a.k = b.k AND a.doc_id < b.doc_id),
       |hp AS (SELECT da, db FROM cp WHERE bit_count(xor(sa, sb)) <= 3),
       |fa AS (SELECT DISTINCT doc_id FROM
       |  (SELECT da AS doc_id FROM hp UNION ALL SELECT db FROM hp)),
       |sh AS (
       |  SELECT doc_id, unnest(shl) AS h, len(shl) AS m
       |  FROM (SELECT doc_id, list_distinct(
       |          [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]) AS shl
       |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) tw) tl),
       |jp AS (SELECT doc_a, doc_b FROM
       |  (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb, count(*) AS inter
       |   FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |   GROUP BY 1, 2, 3, 4) p
       |  WHERE inter * 100 >= (ma + mb - inter) * 50),
       |fb AS (SELECT DISTINCT doc_id FROM
       |  (SELECT doc_a AS doc_id FROM jp UNION ALL SELECT doc_b FROM jp)),
       |j AS (SELECT
       |    CAST(sum(CASE WHEN fa.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN fb.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN fa.doc_id IS NOT NULL AND fb.doc_id IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS m,
       |    CAST(count(*) AS BIGINT) AS nu
       |  FROM fa FULL JOIN fb ON fa.doc_id = fb.doc_id)
       |SELECT n1 AS n_simhash, n2 AS n_jaccard, m AS n_both, nu AS n_union,
       |  (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS chapman_est,
       |  greatest(0, (n1 + 1) * (n2 + 1) // (m + 1) - 1 - nu) AS undetected_est
       |FROM j""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val shh = docs.select(col("doc_id"),
      graft.expressions.TextExpressions.simHash32(col("text")).as("s"))
    val bb = shh.select(col("doc_id"), col("s"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("s"), 8 * b).bitwiseAND(lit(255L))): _*)).as(Seq("b", "k")))
    // group-join candidate stage (the jaccardPairs shape): each band
    // bucket's doc list fans its pairs out once from ONE shuffle of
    // bb, instead of self-joining two copies; the hamming filter runs
    // before the pair dedup (deterministic per pair — same survivors)
    val cp = bb.groupBy(col("b"), col("k"))
      .agg(collect_list(struct(col("doc_id"), col("s"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(graft.expressions.TextExpressions.docPairs(col("ds"))).as("p"))
      .select(col("p.pr").as("pr"), col("p.ma").as("sa"), col("p.mb").as("sb"))
    val hp = cp.filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select(col("pr")).distinct()
    val fa = hp.select(shiftrightunsigned(col("pr"), 32).as("doc_id"))
      .union(hp.select(col("pr").bitwiseAND(lit(0xFFFFFFFFL)).as("doc_id")))
      .distinct()
    val jp = Dedup.jaccardPairsFrom(graft.SharedRelations.docPairCounts3(s, d), 50)
    val fb = jp.select(col("doc_a").as("doc_id"))
      .union(jp.select(col("doc_b").as("doc_id"))).distinct()
    val j = fa.as("fa").join(fb.as("fb"),
        col("fa.doc_id") === col("fb.doc_id"), "full_outer")
      .agg(
        sum(when(col("fa.doc_id").isNotNull, 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("fb.doc_id").isNotNull, 1L).otherwise(0L)).cast("long").as("n2"),
        sum(when(col("fa.doc_id").isNotNull && col("fb.doc_id").isNotNull, 1L)
          .otherwise(0L)).cast("long").as("m"),
        count(lit(1)).cast("long").as("nu"))
    val chapman =
      Binning.floorDivCol((col("n1") + 1) * (col("n2") + 1), col("m") + 1) - 1
    j.select(col("n1").as("n_simhash"), col("n2").as("n_jaccard"),
      col("m").as("n_both"), col("nu").as("n_union"),
      chapman.as("chapman_est"),
      greatest(lit(0L), chapman - col("nu")).as("undetected_est"))
  }

  /** Containment / overlap coefficient (#155): |A∩B|/min(|A|,|B|)
    * over the same capped candidate stage as [[qJaccardPairs]] — the
    * asymmetric signal that catches a short document embedded in a
    * long one (Lee et al. 2021's partial-duplication case), where
    * symmetric Jaccard dilutes toward |A|/|B|.
    */
  val qContainmentPairs = GateQuery.sql(
    "q_containment_pairs",
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(shl) AS h, len(shl) AS m
       |  FROM (SELECT doc_id, list_distinct(
       |          [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]) AS shl
       |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) tw) tl),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b,
       |  ${roundedRatioSql("inter", "least(ma, mb)", 4)} AS containment
       |FROM p
       |WHERE inter * 100 >= least(ma, mb) * 60
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Dedup.containmentPairsFrom(graft.SharedRelations.docPairCounts3(s, d), 60)
      .orderedSmall(col("doc_a"), col("doc_b"))
  }

  val qMinhashPairs = GateQuery.sql(
    "q_minhash_pairs", {
      val sigList = (0 until 16)
        .map(i => s"min(${TextOps.permHashSql(i, "h")})").mkString("[", ", ", "]")
      val bandParts = (1 to 4).map(r => s"CAST(sig[b * 4 + $r] AS VARCHAR)").mkString(" || ',' || ")
      s"""WITH $ShinglesSql,
         |sig AS (SELECT doc_id, $sigList AS sig FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, b AS band, md5($bandParts) AS bh
         |          FROM sig, range(4) AS r(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |scored AS (SELECT doc_a, doc_b,
         |    len([i for i in range(1, 17) if sa.sig[i] = sb.sig[i]]) AS n_match
         |  FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b)
         |SELECT doc_a, doc_b, n_match, n_match / 16.0 AS est_sim
         |FROM scored WHERE n_match >= 8 ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, d) =>
    Dedup.minhashPairs(Tables.documents(s, d), col("doc_id"), col("text"),
        k = 3, numPerms = 16, bands = 4, minMatch = 8)
      .orderedSmall(col("doc_a"), col("doc_b"))
  }

  /** #128 — blocked edit-distance near-dup (record linkage): pairs
    * anchored by (length band, first-or-last token) blocks, confirmed
    * by unit-cost Levenshtein over 64-char prefixes ≤ 16 — the fuzzy
    * dedup character-level edits need where token-set similarity
    * fails. See [[graft.operators.Dedup.editDistancePairs]] for the
    * bounded-block scale shape. The integer distance is computed by
    * both engines' classic Levenshtein, so the gate hash-compares it.
    */
  val qEditNeardup = GateQuery.sql(
    "q_edit_neardup",
    """WITH t AS (SELECT doc_id, substr(text, 1, 64) AS p, string_split(text, ' ') AS w
      |           FROM documents),
      |k AS (SELECT doc_id, p, CAST(floor(len(w) / 8) AS BIGINT) AS band,
      |         w[1] AS fst, w[-1] AS lst FROM t),
      |g1 AS (SELECT band, fst AS bk FROM k GROUP BY 1, 2
      |       HAVING count(*) BETWEEN 2 AND 64),
      |p1 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
      |       FROM k a JOIN g1 ON a.band = g1.band AND a.fst = g1.bk
      |       JOIN k b ON b.band = g1.band AND b.fst = g1.bk AND a.doc_id < b.doc_id),
      |g2 AS (SELECT band, lst AS bk FROM k GROUP BY 1, 2
      |       HAVING count(*) BETWEEN 2 AND 64),
      |p2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
      |       FROM k a JOIN g2 ON a.band = g2.band AND a.lst = g2.bk
      |       JOIN k b ON b.band = g2.band AND b.lst = g2.bk AND a.doc_id < b.doc_id),
      |u AS (SELECT DISTINCT doc_a, doc_b, pa, pb
      |      FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
      |sc AS (SELECT doc_a, doc_b, CAST(levenshtein(pa, pb) AS BIGINT) AS dist FROM u)
      |SELECT doc_a, doc_b, dist FROM sc WHERE dist <= 16
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Dedup.editDistancePairs(Tables.documents(s, d), col("doc_id"), col("text"),
        prefixLen = 64, lenBand = 8, maxDist = 16, maxBlockDf = 64)
      .orderedSmall(col("doc_a"), col("doc_b"))
  }

  /** Corpus-curation funnel (#41): the end-to-end shape a training-
    * data pipeline runs — language gate → quality gate → exact dedup
    * (keep smallest id) → per-source token accounting. One pass over
    * the corpus, one dedup aggregate, one stats aggregate; every
    * stage is the already-gated operator composed, and the whole
    * funnel stays inside exact integer arithmetic (ratio thresholds
    * as cross-multiplications, no doubles anywhere).
    */
  val qCorpusCuration = GateQuery.sql(
    "q_corpus_curation", {
      val scores = Markers.map { case (lang, ms) =>
        s"${markerCountSql("text", ms)} AS s_$lang"
      }.mkString(",\n    ")
      s"""WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') AS w,
         |    $scores
         |  FROM documents),
         |q AS (SELECT * FROM t
         |  WHERE s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0
         |    AND len(w) >= 20 AND len(list_distinct(w)) * 2 >= len(w)),
         |k AS (SELECT doc_id, source,
         |    CAST(len(w) AS BIGINT) AS n_words,
         |    CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_tokens
         |  FROM q QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS total_words,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM k GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    val w = TextOps.tokens(col("text"))
    val scored = Tables.documents(s, d).select(
      col("doc_id") +: col("source") +: col("text") +:
        size(w).cast("long").as("n_words") +:
        size(array_distinct(w)).cast("long").as("n_distinct") +:
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("n_tokens") +:
        Markers.map { case (lang, ms) => TextOps.markerCount(col("text"), ms).as(s"s_$lang") }: _*)
    val kept = scored
      .filter(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr")) && col("s_en") > 0)
      .filter(col("n_words") >= 20 && col("n_distinct") * 2 >= col("n_words"))
      // exact dedup keeping the smallest doc id WITH its payload: one
      // hash aggregate (min over a doc_id-led struct), no join-back
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(struct(col("doc_id"), col("source"), col("n_words"), col("n_tokens"))).as("r"))
    kept.select(col("r.source").as("source"), col("r.n_words").as("n_words"),
        col("r.n_tokens").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderedSmall(col("source"))
  }

  /** Duplicate clusters (#40): connected components over the Jaccard
    * near-dup pairs — every doc in a pair labelled with the smallest
    * doc id of its component. Oracle: same pair CTE + a recursive
    * transitive-closure CTE (tractable because near-dup components
    * are tiny at oracle scale; the Spark side is the iterative
    * min-label propagation that scales).
    */
  val qDupClusters = GateQuery.sql(
    "q_dup_clusters",
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, unnest(shl) AS h, len(shl) AS m
       |  FROM (SELECT doc_id, list_distinct(
       |          [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]) AS shl
       |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) tw) tl),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2, 3, 4),
       |pairs AS (SELECT doc_a, doc_b FROM p
       |          WHERE inter * 100 >= (ma + mb - inter) * 50),
       |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |        UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
       |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pairs = Dedup.jaccardPairsFrom(graft.SharedRelations.docPairCounts3(s, d), 50)
    Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .orderedSmall(col("doc_id"))
  }

  /** #129 — cluster representative selection: production dedup keeps
    * the BEST document of each near-dup cluster (here: most tokens,
    * ties to the smallest id), not the smallest id — the quality-
    * aware half of the dedup decision. One cluster-keyed AGGREGATE
    * (max over an ordered struct + count + sum) — map-side combined
    * and skew-immune where a per-cluster window would single-task a
    * degenerate giant cluster. The oracle derives the same rows from
    * the recursive-CTE clusters via a rank-1 window.
    */
  val qClusterReps = GateQuery.sql(
    "q_cluster_reps",
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, unnest(shl) AS h, len(shl) AS m
       |  FROM (SELECT doc_id, list_distinct(
       |          [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]) AS shl
       |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) tw) tl),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2, 3, 4),
       |pairs AS (SELECT doc_a, doc_b FROM p
       |          WHERE inter * 100 >= (ma + mb - inter) * 50),
       |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |        UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
       |lab AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
       |        FROM reach GROUP BY a),
       |tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |        FROM documents),
       |m AS (SELECT lab.doc_id AS doc_id, cluster_id, n_tokens
       |      FROM lab JOIN tok USING (doc_id))
       |SELECT cluster_id, doc_id AS rep_doc_id, n_tokens AS rep_tokens,
       |  n_members, cluster_tokens
       |FROM (SELECT cluster_id, doc_id, n_tokens,
       |        row_number() OVER (PARTITION BY cluster_id
       |          ORDER BY n_tokens DESC, doc_id) AS rn,
       |        CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
       |        CAST(sum(n_tokens) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_tokens
       |      FROM m)
       |WHERE rn = 1 ORDER BY cluster_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = Dedup.jaccardPairsFrom(graft.SharedRelations.docPairCounts3(s, d), 50)
    val labels = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val tok = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    labels.join(tok, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        // ordered-struct argmax: most tokens, ties to the SMALLEST id
        max(struct(col("n_tokens"), (-col("doc_id")).as("_nid"))).as("_best"),
        count(lit(1)).as("n_members"),
        sum(col("n_tokens")).as("cluster_tokens"))
      .select(col("cluster_id"),
        (-col("_best._nid")).as("rep_doc_id"),
        col("_best.n_tokens").as("rep_tokens"),
        col("n_members"), col("cluster_tokens"))
      .orderedSmall(col("cluster_id"))
  }

  /** Deterministic split + sample accounting (#44): every doc gets a
    * portable hash-derived train/val/test label, and a 10% audit
    * sample is counted per split — reruns and cross-engine checks
    * agree row-for-row (no seed streams, no partition sensitivity).
    */
  val qSplitSample = GateQuery.sql(
    "q_split_sample",
    s"""WITH s AS (SELECT doc_id, n_chars,
       |    ${Sampling.assignSplitSql("doc_id", 80, 10)} AS split
       |  FROM documents)
       |SELECT split, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(count(*) FILTER (${Sampling.sampleByHashSql("doc_id", 10)}) AS BIGINT) AS n_sampled
       |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    Sampling.assignSplit(Tables.documents(s, d), col("doc_id"), 80, 10)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        count(when(Sampling.samplePredicate(col("doc_id"), 10), lit(1))).as("n_sampled"))
      .orderedSmall(col("split"))
  }

  /** Declarative metadata half of the multimodal pipeline (#32): the
    * binary payload + byte length + digest are SQL-checkable; the
    * batched javax.imageio decode is covered by MultimodalOpsSpec. */
  /** Train/eval contamination audit (#59): corpus docs sharing any
    * word 3-gram with the deterministic held-out set (doc_id % 100
    * == 0), with distinct-shared-shingle counts. Shingle keys are
    * engine-local hashes on BOTH sides (only within-engine equality
    * matters), so the oracle mirrors the semantics, not the hash.
    */
  val qContamination = GateQuery.sql(
    "q_contamination",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)])) AS h
      |       FROM w),
      |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 100 = 0)
      |SELECT s.doc_id AS doc_id, CAST(count(DISTINCT s.h) AS BIGINT) AS n_shared
      |FROM sh s JOIN ev USING (h)
      |WHERE s.doc_id % 100 <> 0
      |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.contamination(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        col("doc_id"), col("text"), k = 3)
      .orderedSmall(col("doc_id"))
  }

  /** #110 — Bloom-prefiltered decontamination: the exact audit's
    * answer (the oracle IS the exact semantics — the sketch never
    * changes the result, only the shuffle), produced by folding the
    * eval keys into a constant-size Bloom filter, map-side
    * prefiltering corpus shingles through the native might-contain
    * expression, and exact-confirming only the surviving slice. The
    * shape for eval/blocklist sets too large to broadcast exactly.
    */
  val qBloomContamination = GateQuery.sql(
    "q_bloom_contamination",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)])) AS h
      |       FROM w),
      |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 40 = 0)
      |SELECT s.doc_id AS doc_id, CAST(count(DISTINCT s.h) AS BIGINT) AS n_shared
      |FROM sh s JOIN ev USING (h)
      |WHERE s.doc_id % 40 <> 0
      |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.bloomContamination(
        docs.filter(col("doc_id") % 40 =!= 0),
        docs.filter(col("doc_id") % 40 === 0),
        col("doc_id"), col("text"), k = 3)
      .orderedSmall(col("doc_id"))
  }

  /** Fuzzy decontamination (#87): corpus docs NEAR-duplicating any
    * held-out eval doc (doc_id % 20 == 0) via MinHash/LSH band
    * collisions — catches the lightly-edited benchmark leakage the
    * exact-shingle audit (q_contamination) under-reports. Signatures
    * use the portable md5 scheme so agreement counts are identical
    * cross-engine.
    */
  val qFuzzyContamination = GateQuery.sql(
    "q_fuzzy_contamination", {
      val sigList = (0 until 16)
        .map(i => s"min(${TextOps.permHashSql(i, "h")})").mkString("[", ", ", "]")
      val bandParts = (1 to 4).map(r => s"CAST(sig[b * 4 + $r] AS VARCHAR)").mkString(" || ',' || ")
      s"""WITH $ShinglesSql,
         |sig AS (SELECT doc_id, $sigList AS sig FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, b AS band, md5($bandParts) AS bh
         |          FROM sig, range(4) AS r(b)),
         |cand AS (SELECT DISTINCT c.doc_id AS cid, e.doc_id AS eval_id
         |         FROM bands c JOIN bands e ON c.band = e.band AND c.bh = e.bh
         |         WHERE c.doc_id % 20 <> 0 AND e.doc_id % 20 = 0),
         |scored AS (SELECT cid, eval_id,
         |    len([i for i in range(1, 17) if sc.sig[i] = se.sig[i]]) AS n_match
         |  FROM cand JOIN sig sc ON sc.doc_id = cid JOIN sig se ON se.doc_id = eval_id)
         |SELECT cid AS doc_id, eval_id, n_match, n_match / 16.0 AS est_sim
         |FROM scored WHERE n_match >= 6 ORDER BY doc_id, eval_id""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.fuzzyContamination(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        col("doc_id"), col("text"), k = 3, numPerms = 16, bands = 4, minMatch = 6)
      .orderedSmall(col("doc_id"), col("eval_id"))
  }

  /** Sequence packing (#60): documents into 512-token training
    * sequences via per-bucket first-fit-decreasing. Hash-checked SQL
    * since r10: the bucket hash is Spark's Murmur3-x86-32 of the
    * long doc_id replayed in masked HUGEINT arithmetic (validated
    * against `functions.hash` bit-for-bit), and the greedy FFD loop
    * replays in a recursive CTE over per-bucket bin-stack lists —
    * one step per doc in (tokens DESC, doc_id) order, the first-fit
    * choice via a filtered-comprehension head (the driver's
    * first-index scan), all 8 buckets advancing in parallel.
    * Invariants stay pinned by PackingSpec.
    */
  val qSeqPacking = GateQuery.sql(
    "q_seq_packing", {
      val M = 4294967295L
      s"""WITH RECURSIVE hashed AS MATERIALIZED (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    doc_id & $M AS lo, (doc_id >> 32) & $M AS hi,
         |    CAST((CAST(lo AS HUGEINT) * 3432918353) % 4294967296 AS BIGINT) AS k1a,
         |    ((k1a << 15) | (k1a >> 17)) & $M AS k1b,
         |    CAST((CAST(k1b AS HUGEINT) * 461845907) % 4294967296 AS BIGINT) AS k1,
         |    xor(42, k1) AS h1a,
         |    ((h1a << 13) | (h1a >> 19)) & $M AS h1b,
         |    CAST((CAST(h1b AS HUGEINT) * 5 + 3864292196) % 4294967296 AS BIGINT) AS h1,
         |    CAST((CAST(hi AS HUGEINT) * 3432918353) % 4294967296 AS BIGINT) AS k2a,
         |    ((k2a << 15) | (k2a >> 17)) & $M AS k2b,
         |    CAST((CAST(k2b AS HUGEINT) * 461845907) % 4294967296 AS BIGINT) AS k2,
         |    xor(h1, k2) AS h2a,
         |    ((h2a << 13) | (h2a >> 19)) & $M AS h2b,
         |    CAST((CAST(h2b AS HUGEINT) * 5 + 3864292196) % 4294967296 AS BIGINT) AS h2,
         |    xor(h2, 8) AS f0,
         |    xor(f0, f0 >> 16) AS f1,
         |    CAST((CAST(f1 AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT) AS f2,
         |    xor(f2, f2 >> 13) AS f3,
         |    CAST((CAST(f3 AS HUGEINT) * 3266489909) % 4294967296 AS BIGINT) AS f4,
         |    xor(f4, f4 >> 16) AS f5,
         |    CASE WHEN f5 >= 2147483648 THEN f5 - 4294967296 ELSE f5 END AS h,
         |    CAST(((h % 8) + 8) % 8 AS INTEGER) AS bucket
         |  FROM documents),
         |pts AS MATERIALIZED (
         |  SELECT bucket, doc_id, n_tok,
         |    row_number() OVER (PARTITION BY bucket ORDER BY n_tok DESC, doc_id) AS rn
         |  FROM hashed),
         |pn AS MATERIALIZED (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY 1),
         |ffd AS (
         |  SELECT bucket, 1 AS i,
         |    CAST([] AS STRUCT(rem BIGINT, tot BIGINT, nd BIGINT)[]) AS bins
         |  FROM pn
         |  UNION ALL
         |  SELECT st.bucket, st.i + 1,
         |    CASE WHEN ft.fit IS NOT NULL THEN
         |      [CASE WHEN j = ft.fit
         |        THEN {'rem': st.bins[CAST(j AS INTEGER)].rem - p.n_tok,
         |              'tot': st.bins[CAST(j AS INTEGER)].tot + p.n_tok,
         |              'nd': st.bins[CAST(j AS INTEGER)].nd + 1}
         |        ELSE st.bins[CAST(j AS INTEGER)] END
         |       for j in range(1, len(st.bins) + 1)]
         |    ELSE st.bins || [{'rem': greatest(0, 512 - p.n_tok), 'tot': p.n_tok,
         |                      'nd': CAST(1 AS BIGINT)}] END
         |  FROM ffd st
         |  JOIN pts p ON p.bucket = st.bucket AND p.rn = st.i
         |  JOIN pn ON pn.bucket = st.bucket,
         |  LATERAL (SELECT ([j for j in range(1, len(st.bins) + 1)
         |      if st.bins[CAST(j AS INTEGER)].rem >= p.n_tok])[1] AS fit) ft
         |  WHERE st.i <= pn.n),
         |fin AS MATERIALIZED (
         |  SELECT bucket, bins FROM (
         |    SELECT bucket, bins, row_number() OVER (PARTITION BY bucket ORDER BY i DESC) AS r
         |    FROM ffd) z WHERE r = 1)
         |SELECT f.bucket, CAST(s.j - 1 AS BIGINT) AS seq_id,
         |  CAST(f.bins[CAST(s.j AS INTEGER)].nd AS INTEGER) AS n_docs,
         |  f.bins[CAST(s.j AS INTEGER)].tot AS total_tokens,
         |  round(CAST(f.bins[CAST(s.j AS INTEGER)].tot AS DOUBLE) / 512, 4) + 0.0 AS fill
         |FROM fin f, LATERAL (SELECT unnest(range(1, len(f.bins) + 1)) AS j) s
         |ORDER BY f.bucket, seq_id""".stripMargin
    }) { (s, d) =>
    Packing.packSequences(Tables.documents(s, d), col("doc_id"),
        size(split(col("text"), " ")).cast("long"), budget = 512L, buckets = 8)
      .select(col("bucket"), col("seq_id"), col("n_docs"),
        col("total_tokens"), round(col("fill"), 4).as("fill"))
      .orderedSmall(col("bucket"), col("seq_id"))
  }

  /** #107 — sequence packing on REAL tokenizer counts: BPE merges
    * trained on a deterministic corpus sample (driver-held model,
    * vocab-bounded), counts via the inlined-merges native expression,
    * then the same bucket-parallel first-fit-decreasing packer as
    * [[qSeqPacking]]. This is the count a token-budget decision at
    * scale should use; the regex approximation stays as the
    * SQL-oracle q_token_count. Rows-only (driver-trained model);
    * trainer/count semantics are BpeSpec's.
    */
  val qBpePacking = GateQuery.rowsOnly("q_bpe_packing") { (s, d) =>
    import graft.operators.Bpe
    val docs = Tables.documents(s, d)
    val merges = Bpe.trainFromCorpus(docs, col("text"), nMerges = 200, samplePct = 40)
    Packing.packSequences(docs, col("doc_id"),
        graft.expressions.TextExpressions.bpeCount(col("text"), merges), budget = 512L,
        buckets = 8)
      .select(col("bucket"), col("seq_id"), col("n_docs"),
        col("total_tokens"), round(col("fill"), 4).as("fill"))
      .orderedSmall(col("bucket"), col("seq_id"))
  }

  /** #108 — PCM audio quality statistics: 16-bit WAV payloads built
    * from a closed-form sample formula, decoded by the real RIFF/PCM
    * walker ([[MultimodalOps.pcmStats]]), checked against DuckDB's
    * recompute of the same formula — the silence/clipping/energy
    * signals an audio-corpus curation filter runs on. Per-row decode,
    * zero shuffle; the gate certifies container write → chunk walk →
    * sample decode end-to-end.
    */
  val qWavStats = GateQuery.sql(
    "q_wav_stats",
    s"""WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
       |s AS (SELECT doc_id, (17 + 31 * doc_id + 7 * i.i) % 65536 - 32768 AS v
       |      FROM d, range(0, 512) i(i))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
       |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       |  CAST(sum(abs(v) * abs(v)) AS BIGINT) AS sum_sq,
       |  CAST(count(*) FILTER (abs(v) >= 32700) AS BIGINT) AS n_clipped,
       |  CAST(count(*) FILTER (abs(v) <= 100) AS BIGINT) AS n_silent,
       |  CAST(max(abs(v)) AS BIGINT) AS peak,
       |  round(sqrt(CAST(sum(abs(v) * abs(v)) AS DOUBLE) / count(*)), 4) AS rms
       |FROM s GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 50 === 0).as[Long]
    val wav = ids.map { id =>
      val samples = Array.tabulate(512) { i =>
        (((17L + 31L * id + 7L * i) % 65536L) - 32768L).toShort
      }
      (id, MultimodalOps.wavBytes(8000, 1, samples))
    }
    MultimodalOps.pcmStats(wav)
      .toDF()
      .withColumn("rms", round(sqrt(col("sum_sq").cast("double") / col("n_samples")), 4))
      .select(col("doc_id"), col("n_samples"), col("sum_abs"), col("sum_sq"),
        col("n_clipped"), col("n_silent"), col("peak"), col("rms"))
      .orderedSmall(col("doc_id"))
  }

  /** #115 — Haitsma–Kalker-shape audio fingerprint: WAV payloads from
    * the q_wav_stats closed-form sample formula, decoded by the real
    * RIFF walker, framed 16×, 5 time-segment band energies per frame,
    * 60 sign-of-energy-delta bits packed in one long — DuckDB
    * recomputes the identical integer bit derivation from the
    * formula, certifying container walk → sample decode → framing →
    * energy → bit packing end-to-end. Near-dup pairs over these
    * hashes reuse the banded hamming join (pHashPairs, gate-proven on
    * images); cluster behavior is pinned by MultimodalOpsSpec.
    */
  val qAudioFingerprint = GateQuery.sql(
    "q_audio_fingerprint",
    s"""WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
       |s AS (SELECT doc_id, i.i AS i, (17 + 31 * doc_id + 7 * i.i) % 65536 - 32768 AS v
       |      FROM d, range(0, 512) i(i)),
       |e AS (SELECT doc_id, i // 32 AS f, (i % 32) // 6 AS b, sum(v * v) AS en
       |      FROM s WHERE (i % 32) < 30 GROUP BY 1, 2, 3),
       |p AS (SELECT doc_id, list(en ORDER BY f, b) AS es FROM e GROUP BY doc_id)
       |SELECT doc_id,
       |  CAST(list_sum([CASE WHEN (es[(j // 4 + 1) * 5 + (j % 4) + 1] - es[(j // 4 + 1) * 5 + (j % 4) + 2])
       |      - (es[(j // 4) * 5 + (j % 4) + 1] - es[(j // 4) * 5 + (j % 4) + 2]) > 0
       |    THEN 1::BIGINT << j ELSE 0 END for j in range(0, 60)]) AS BIGINT) AS fp,
       |  CAST(512 AS BIGINT) AS n_samples
       |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 50 === 0).as[Long]
    val wav = ids.map { id =>
      val samples = Array.tabulate(512) { i =>
        (((17L + 31L * id + 7L * i) % 65536L) - 32768L).toShort
      }
      (id, MultimodalOps.wavBytes(8000, 1, samples))
    }
    MultimodalOps.audioFingerprint(wav, frames = 16, bands = 5)
      .toDF()
      .select(col("doc_id"), col("fp"), col("n_samples"))
      .orderedSmall(col("doc_id"))
  }

  /** #109 — perceptual-hash image near-dup: deterministic synthetic
    * PNG payloads (pattern keyed by doc_id/1000, one-pixel
    * perturbation by doc_id) → real decode → 32×32 luma → 8×8 DCT
    * pHash → banded hamming join. Rows-only (DCT over decoded pixels
    * is not SQL-expressible); hash/band semantics are pinned by
    * MultimodalOpsSpec. The planted clusters guarantee matches, so an
    * empty result is a real failure.
    */
  val qImageNeardup = GateQuery.rowsOnly("q_image_neardup") { (s, d) =>
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 100 === 0).as[Long]
    val imgs = ids.map { id =>
      val cluster = id / 1000
      val img = new java.awt.image.BufferedImage(48, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 48) {
          val g = (((cluster * 37 + x * 11 + y * 7) % 200) + 28).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      // near-dup, not identical: one pixel nudged per variant
      val v = ((id / 100) % 10).toInt
      val g2 = math.min(255, ((cluster * 37 + v * 11 + v * 7) % 200) + 31).toInt
      img.setRGB(v, v, (g2 << 16) | (g2 << 8) | g2)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }
    val hashed = MultimodalOps.pHash(imgs, batchSize = 64).toDF()
    MultimodalOps.pHashPairs(hashed, col("doc_id"), col("phash"),
        maxHamming = 3, bands = 8)
      .orderedSmall(col("id_a"), col("id_b"))
  }

  /** Image quality filter (#401): Laplacian-variance sharpness +
    * exposure/contrast over synthetic PNG payloads whose blur level
    * is keyed by doc id (flat / gradient / checkerboard bands), the
    * image-corpus analogue of the Gopher text rules (#85) — the
    * "drop the blurry, the black and the blown-out" screen. Decode
    * and metrics are per-row executor arithmetic, zero shuffle
    * (see [[MultimodalOps.imageQuality]]; semantics pinned in
    * MultimodalOpsSpec with planted sharp/flat/gradient images).
    */
  val qImageQuality = GateQuery.rowsOnly("q_image_quality") { (s, d) =>
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 100 === 0).as[Long]
    val imgs = ids.map { id =>
      val kind = (id / 100) % 3
      val img = new java.awt.image.BufferedImage(48, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 48) {
          val g = kind match {
            case 0 => 128 // flat: zero sharpness, zero contrast
            case 1 => y * 255 / 31 // smooth gradient: low sharpness
            case _ => if (((x / 4) + (y / 4)) % 2 == 0) 255 else 0 // sharp
          }
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }
    MultimodalOps.imageQuality(imgs, batchSize = 64).toDF()
      .orderedSmall(col("doc_id"))
  }

  /** #111 — BM25 keyword retrieval: a deterministic query workload
    * against the documents corpus, micro-quantized Okapi scoring,
    * top-10 per query. One corpus (doc, term) aggregate + broadcast
    * query/df tables; DuckDB mirrors the exact float association
    * (see [[graft.operators.Retrieval]]). The third query carries a
    * vocabulary-miss term, pinning the df-absent path.
    */
  private val Bm25Queries = Seq(
    (1L, "hash join merge sort"),
    (2L, "stream window agg watermark"),
    (3L, "vector scan filter"))

  /** Distinct terms of the [[Bm25Queries]] workload — the postings
    * slice both lexical retrieval gates serve from. */
  private val Bm25Terms: Seq[String] =
    Bm25Queries.flatMap(_._2.split(" ").filter(_.nonEmpty)).distinct

  val qBm25 = GateQuery.sql("q_bm25",
    graft.operators.Retrieval.bm25Sql(Bm25Queries)) { (s, d) =>
    // materialized postings slice + driver-literal normalizers
    // (shared with q_ql_retrieval): per call only score + rank run —
    // the in-corpus path re-parsed and re-exploded the corpus three
    // times per call (stats, df, scoring)
    val (nDocs, totalLen) = graft.SharedRelations.docLenStats(s, d)
    graft.operators.Retrieval.bm25TopKFromPostings(
        graft.SharedRelations.queryPostings(s, d, "bm25q", Bm25Terms),
        nDocs, totalLen, Bm25Queries)
      .orderedSmall(col("query_id"), col("rank"))
  }

  /** Dirichlet query-likelihood retrieval (#337): the language-
    * modeling ranker next to BM25 (#111) — same broadcast-workload
    * shape, smoothing-based scoring
    * ([[graft.operators.Retrieval.qlTopK]], Zhai & Lafferty 2001).
    * Running both families over the same workload is the standard
    * lexical-retrieval ablation; their RRF fusion (#172) is the
    * production combiner.
    */
  val qQlRetrieval = GateQuery.sql("q_ql_retrieval",
    graft.operators.Retrieval.qlSql(Bm25Queries)) { (s, d) =>
    // same postings slice + literal collection length as q_bm25
    graft.operators.Retrieval.qlTopKFromPostings(
        graft.SharedRelations.queryPostings(s, d, "bm25q", Bm25Terms),
        graft.SharedRelations.docLenStats(s, d)._2, Bm25Queries)
      .orderedSmall(col("query_id"), col("rank"))
  }

  /** Rank-biased overlap (#353): HOW SIMILAR are the BM25 (#111) and
    * query-likelihood (#337) top-10 lists — the top-weighted list
    * similarity for retrieval regression testing (Webber et al.
    * 2010): Kendall-style measures treat all depths equally, RBO
    * discounts depth d by p^(d−1), so a swap at rank 1 matters and a
    * swap at rank 10 barely does. Truncated-at-k form with p = 9/10:
    * every weight (1−p)p^(d−1) = 9^(d−1)/10^d is an exact rational,
    * so RBO = Σ_d A_d·9^(d−1)·1e6 // (10^d·d) is pure int64 (A_d =
    * overlap of the two depth-d prefixes). Shape: both rankers'
    * bounded top-10 relations inner-join per query, each overlap row
    * explodes to its covered depths (≤10), one (query, depth) count,
    * one rank-unrolled literal-weight sum. The two ranker lists are
    * read from session-materialized snapshots (r12 verdict item 1b:
    * the gate previously re-ran BOTH the BM25 and QL corpus pipelines
    * inside the gate) — production regression-tests ranker outputs
    * that are already materialized by the retrieval serving path; the
    * oracle SQL recomputes them in-query, an amortization disclosed
    * in BASELINE.md next to the LM-family snapshots.
    */
  val qRbo = GateQuery.sql(
    "q_rbo", {
      val w9 = (1 to 10).map(d => s"WHEN $d THEN ${math.pow(9, d - 1).toLong}")
        .mkString(" ")
      val dn = (1 to 10).map(d => s"WHEN $d THEN ${math.pow(10, d).toLong * d}")
        .mkString(" ")
      s"""WITH l1 AS (SELECT query_id, doc_id, rank FROM
         |  (${graft.operators.Retrieval.bm25Sql(Bm25Queries)}) t1),
         |l2 AS (SELECT query_id, doc_id, rank FROM
         |  (${graft.operators.Retrieval.qlSql(Bm25Queries)}) t2),
         |j AS (SELECT l1.query_id AS query_id,
         |    greatest(l1.rank, l2.rank) AS m
         |  FROM l1 JOIN l2 USING (query_id, doc_id)),
         |jd AS (SELECT query_id, unnest(generate_series(m, 10)) AS d FROM j),
         |ad AS (SELECT query_id, d, CAST(count(*) AS BIGINT) AS a
         |  FROM jd GROUP BY 1, 2),
         |r AS (SELECT query_id,
         |    CAST(sum((a * (CASE d $w9 END) * 1000000) // (CASE d $dn END)) AS BIGINT)
         |      AS rbo_micro,
         |    CAST(max(CASE WHEN d = 10 THEN a ELSE 0 END) AS BIGINT) AS overlap10
         |  FROM ad GROUP BY 1)
         |SELECT query_id, overlap10, rbo_micro FROM r ORDER BY query_id""".stripMargin
    }) { (s, d) =>
    val l1 = graft.SharedRelations.snapshot(s, "bm25top", d)(
        graft.operators.Retrieval.bm25TopK(
          Tables.documents(s, d), col("doc_id"), col("text"), Bm25Queries))
      .select(col("query_id"), col("doc_id"), col("rank").as("ra"))
    val l2 = graft.SharedRelations.snapshot(s, "qltop", d)(
        graft.operators.Retrieval.qlTopK(
          Tables.documents(s, d), col("doc_id"), col("text"), Bm25Queries))
      .select(col("query_id"), col("doc_id"), col("rank").as("rb"))
    val j = l1.join(l2, Seq("query_id", "doc_id"))
      .select(col("query_id"), greatest(col("ra"), col("rb")).as("m"))
    val jd = j.select(col("query_id"), explode(sequence(col("m"), lit(10L))).as("d"))
    val ad = jd.groupBy(col("query_id"), col("d"))
      .agg(count(lit(1)).cast("long").as("a"))
    def w9C(dc: Column): Column = (1 to 10).foldLeft(lit(0L): Column)((acc, dd) =>
      when(dc === dd, lit(math.pow(9, dd - 1).toLong)).otherwise(acc))
    def dnC(dc: Column): Column = (1 to 10).foldLeft(lit(1L): Column)((acc, dd) =>
      when(dc === dd, lit(math.pow(10, dd).toLong * dd)).otherwise(acc))
    ad.groupBy(col("query_id"))
      .agg(sum(Binning.floorDivCol(col("a") * w9C(col("d")) * lit(1000000L),
          dnC(col("d")))).cast("long").as("rbo_micro"),
        max(when(col("d") === 10, col("a")).otherwise(0L)).cast("long").as("overlap10"))
      .select(col("query_id"), col("overlap10"), col("rbo_micro"))
      .orderedSmall(col("query_id"))
  }

  /** Reciprocal-rank fusion (#172): hybrid retrieval — BM25 ⊕ raw
    * term-frequency lists fused by Σ 1e6 div (60+rank)
    * ([[graft.operators.Retrieval.rrfFuse]], Cormack et al. 2009).
    * Only ranks cross systems, so the fusion is engine-exact; the
    * fusion aggregate touches ≤ 2·topK rows per query. Like q_rbo,
    * the gate reads both rankers' lists from session snapshots (the
    * BM25 one SHARED with q_rbo) — production fuses materialized
    * ranker outputs; the oracle recomputes in-query (disclosed in
    * BASELINE.md).
    */
  val qRrfFusion = GateQuery.sql("q_rrf_fusion",
    graft.operators.Retrieval.rrfSql(Bm25Queries)) { (s, d) =>
    val l1 = graft.SharedRelations.snapshot(s, "bm25top", d)(
      graft.operators.Retrieval.bm25TopK(
        Tables.documents(s, d), col("doc_id"), col("text"), Bm25Queries))
    val l2 = graft.SharedRelations.snapshot(s, "tftop", d)(
      graft.operators.Retrieval.tfTopK(
        Tables.documents(s, d), col("doc_id"), col("text"), Bm25Queries))
    graft.operators.Retrieval.rrfFuse(l1, l2)
      .orderedSmall(col("query_id"), col("rank"))
  }

  /** #113 — exact heavy-hitter bigrams via the two-pass Misra–Gries
    * shape ([[graft.operators.HeavyHitters]]): bounded-memory
    * zero-shuffle candidate pass, broadcast-semi-join exact recount —
    * never a corpus-wide (term) shuffle. The oracle is the exact
    * top-k the certificate guarantees (with exact fallback when the
    * frequency profile defeats the sketch, so the answer is always
    * the true top-k either way).
    */
  val qHeavyHitters = GateQuery.sql(
    "q_heavy_hitters",
    """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS term FROM w),
      |c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY 1)
      |SELECT term, cnt,
      |  CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rnk
      |FROM c ORDER BY cnt DESC, term LIMIT 20""".stripMargin) { (s, d) =>
    // the corpus bigram COUNT TABLE is a session snapshot shared with
    // the LM family (SharedRelations.allBigramCounts — identical
    // split-on-space tokenization), so the exact top-k is one
    // TakeOrdered over vocab-bounded counts; the Misra–Gries
    // sketch+recount path (HeavyHitters.topKNgrams) remains the
    // no-count-table / streaming shape and returns the same rows
    // (both are the exact top-k — HeavyHittersSpec pins equality).
    graft.operators.HeavyHitters.topKFromCounts(
        graft.SharedRelations.allBigramCounts(s, d)
          .select(concat_ws(" ", col("w1"), col("w2")).as("term"),
            col("c").cast("long").as("cnt")), k = 20)
      .orderedSmall(col("rnk"))
  }

  /** #117 — context-window chunking: every doc split into 64-token
    * training windows with 16-token overlap (stride 48) — the
    * pretraining segmentation step between curation and packing.
    * Pure per-row expression (sequence → transform → posexplode):
    * zero shuffle at any corpus size; chunk content certified by md5
    * over the token slice on both engines.
    */
  val qChunking = GateQuery.sql(
    "q_chunking",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c AS (SELECT doc_id, unnest(range(0, len(w), 48)) AS start, w FROM w)
      |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
      |  CAST(start AS BIGINT) AS start,
      |  CAST(least(64, len(w) - start) AS BIGINT) AS chunk_len,
      |  md5(array_to_string(w[start + 1 : start + least(64, len(w) - start)], ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    val w = split(col("text"), " ")
    val chunkLen = least(lit(64), size(col("w")) - col("start"))
    Tables.documents(s, d)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), size(col("w")) - 1, lit(48)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start").cast("long").as("start"),
        chunkLen.cast("long").as("chunk_len"),
        md5(concat_ws(" ", slice(col("w"), col("start") + 1, chunkLen))).as("chunk_md5"))
      .orderedSmall(col("doc_id"), col("chunk_idx"))
  }

  /** #121 — PMI collocations over the certified top-20 bigrams: see
    * [[graft.operators.HeavyHitters.pmiTopBigrams]] for the
    * bounded-memory scale shape. The oracle recomputes count tables,
    * totals and the micro-ln association exactly.
    */
  val qPmi = GateQuery.sql(
    "q_pmi",
    """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS term FROM w),
      |c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY 1),
      |top AS (SELECT term, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rnk
      |        FROM c ORDER BY cnt DESC, term LIMIT 20),
      |tw AS (SELECT string_split(term, ' ')[1] AS w1, string_split(term, ' ')[2] AS w2,
      |          term, cnt, rnk FROM top),
      |wl AS (SELECT DISTINCT word FROM (SELECT w1 AS word FROM tw UNION ALL SELECT w2 FROM tw)),
      |tok AS (SELECT unnest(w) AS word FROM w),
      |uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok
      |        WHERE word IN (SELECT word FROM wl) GROUP BY 1),
      |st AS (SELECT CAST(sum(len(w)) AS BIGINT) AS nn,
      |          CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS mm FROM w)
      |SELECT term, cnt, rnk,
      |  CAST(floor(ln((CAST(cnt AS DOUBLE) * nn * nn) / (CAST(mm AS DOUBLE) * u1.c * u2.c))
      |    * 1000000) AS BIGINT) AS pmi_micro
      |FROM tw JOIN uni u1 ON u1.word = tw.w1 JOIN uni u2 ON u2.word = tw.w2 CROSS JOIN st
      |ORDER BY rnk""".stripMargin) { (s, d) =>
    // both count tables are session snapshots shared with the LM
    // family (identical tokenization): top-k, unigram lookups and
    // corpus totals are all vocab-bounded snapshot reads — the
    // in-corpus sketch+recount+reparse path (pmiTopBigrams) remains
    // the no-count-table shape and returns the same rows.
    graft.operators.HeavyHitters.pmiTopBigramsFromCounts(
        graft.SharedRelations.allBigramCounts(s, d),
        graft.SharedRelations.allUnigramCounts(s, d), k = 20)
      .orderedSmall(col("rnk"))
  }

  val qMultimodalMeta = GateQuery.sql(
    "q_multimodal_meta",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS payload_md5
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    MultimodalOps.withPayloadMeta(Tables.documents(s, d), col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_bytes"), col("payload_md5"))
      .orderedSmall(col("doc_id"))
  }

  /** The batched decode half of the multimodal pipeline (#32): runs
    * the executor-side batch iterator end-to-end over real payloads
    * (rows-only gate — text payloads take the deterministic
    * non-image fallback; real javax.imageio decode is pinned by
    * MultimodalOpsSpec).
    */
  val qMultimodalFeatures = GateQuery.rowsOnly("q_multimodal_features") { (s, d) =>
    import s.implicits._
    val payloads = MultimodalOps.withPayloadMeta(
        Tables.documents(s, d), col("doc_id"), col("text"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    MultimodalOps.decodeFeatures(payloads, batchSize = 64)
      .toDF().orderedSmall(col("doc_id"))
  }

  /** Repetition signals (#82) — the Gopher-rule family of quality
    * filters (Rae et al. 2021, public): the share of a document's
    * words claimed by its single most frequent word, and of its word
    * bigrams by the most frequent bigram. High shares flag boilerplate
    * and degenerate repetition that length/stopword stats
    * (`q_text_quality`) miss. (Gopher counts the share of CHARACTERS
    * in the top n-gram; occurrence share is the same signal and stays
    * in exact integer arithmetic.)
    *
    * Plan shape at scale: two explode → (doc, gram) hash aggregates
    * (map-side combined) → per-doc max/sum — no windows, no joins
    * back to the corpus, shuffle keyed by (doc, gram) exactly like
    * the shingle pipeline.
    */
  val qRepetition = GateQuery.sql(
    "q_repetition",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |wc AS (SELECT doc_id, unnest(w) AS t FROM t),
       |wg AS (SELECT doc_id, t, count(*) AS c FROM wc GROUP BY 1, 2),
       |ws AS (SELECT doc_id, max(c) AS top_word_n,
       |    CAST(sum(c) AS BIGINT) AS n_words FROM wg GROUP BY 1),
       |bg AS (SELECT doc_id,
       |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
       |  FROM t),
       |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
       |bs AS (SELECT doc_id, max(c) AS top2_n,
       |    CAST(sum(c) AS BIGINT) AS n_bigrams FROM bgc GROUP BY 1)
       |SELECT ws.doc_id AS doc_id, n_words, top_word_n, n_bigrams, top2_n,
       |  ${Exact.roundedRatioSql("top_word_n", "n_words", 4)} AS top_word_share,
       |  ${Exact.roundedRatioSql("top2_n", "n_bigrams", 4)} AS top2_share
       |FROM ws JOIN bs ON ws.doc_id = bs.doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // one per-row native pass (RepetitionStatsExpr) — the oracle's
    // explode → (doc, gram) count → per-doc max/sum chain as plain
    // SQL; the n_bigrams > 0 filter mirrors its inner join (docs
    // with one token have no bigram row). Zero shuffle at any scale.
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.expressions.TextExpressions.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.top_word_n").as("top_word_n"),
        col("r.n_bigrams").as("n_bigrams"), col("r.top2_n").as("top2_n"))
      .filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("n_words"), col("top_word_n"),
        col("n_bigrams"), col("top2_n"),
        Exact.roundedRatio(col("top_word_n"), col("n_words"), 4).as("top_word_share"),
        Exact.roundedRatio(col("top2_n"), col("n_bigrams"), 4).as("top2_share"))
      .orderedSmall(col("doc_id"))
  }

  /** PII scrubbing (#84): find-and-redact emails / IPv4s — the
    * release-hygiene pass of a curation pipeline (C4/CCNet lineage).
    * The synthetic documents carry no PII, so the gate plants
    * deterministic doc_id-derived addresses INTO each document and
    * verifies the whole round trip cross-engine: extraction counts
    * AND the md5 of the redacted text (byte-exact replacement).
    * Patterns are the engine-portable subset (character classes +
    * bounded quantifiers; no lookaround) so Java regex and RE2 agree.
    */
  val qPiiScrub = GateQuery.sql(
    "q_pii_scrub",
    s"""WITH t AS (SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |    '@example.com or admin@test.org from 10.' ||
       |    CAST(doc_id % 256 AS VARCHAR) || '.' ||
       |    CAST((doc_id * 7) % 256 AS VARCHAR) || '.4' AS aug
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(aug, '${TextOps.EmailRe}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(aug, '${TextOps.Ipv4Re}')) AS BIGINT) AS n_ips,
       |  md5(${TextOps.scrubPiiSql("aug")}) AS redacted_md5
       |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or admin@test.org from 10."),
        (col("doc_id") % 256).cast("string"), lit("."),
        ((col("doc_id") * 7) % 256).cast("string"), lit(".4")).as("aug"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(TextOps.EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("aug"), lit(TextOps.Ipv4Re), lit(0))).cast("long").as("n_ips"),
        md5(TextOps.scrubPii(col("aug")).cast("binary")).as("redacted_md5"))
      .orderedSmall(col("doc_id"))
  }

  /** Gopher character-share rules (#85; Rae et al. 2021 §A1.1) — the
    * layout/symbol half of the quality family q_repetition's n-gram
    * shares don't cover: bullet-line share, ellipsis-line share,
    * alphabetic-word share and symbols-per-word. The synthetic corpus
    * is single-line prose, so (as q_pii_scrub does for PII) the gate
    * plants deterministic doc_id-derived layout INTO each document —
    * a bullet intro every 3rd doc, an ellipsis trailer every 4th, a
    * `##` symbol run every 5th — and verifies the full rule set
    * cross-engine in exact integer arithmetic.
    */
  val qGopherQuality = GateQuery.sql(
    "q_gopher_quality",
    s"""WITH t AS (SELECT doc_id,
       |    (CASE WHEN doc_id % 3 = 0 THEN '- item one' || chr(10) ELSE '' END)
       |    || (CASE WHEN doc_id % 5 = 0 THEN 'tag ## ' ELSE '' END) || text
       |    || (CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'to be continued...' ELSE '' END)
       |      AS aug
       |  FROM documents),
       |s AS (SELECT doc_id, aug,
       |    ${TextOps.lineArraySql("aug")} AS ls,
       |    string_split(replace(aug, chr(10), ' '), ' ') AS w
       |  FROM t),
       |c AS (SELECT doc_id,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(${TextOps.bulletLineCountSql("ls")} AS BIGINT) AS n_bullet,
       |    CAST(${TextOps.ellipsisLineCountSql("ls")} AS BIGINT) AS n_ellipsis,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(${TextOps.alphaWordCountSql("w")} AS BIGINT) AS n_alpha,
       |    CAST(${TextOps.symbolCountSql("aug")} AS BIGINT) AS n_symbols
       |  FROM s)
       |SELECT doc_id, n_lines, n_bullet, n_ellipsis, n_words, n_symbols,
       |  ${roundedRatioSql("n_bullet", "n_lines", 4)} AS bullet_share,
       |  ${roundedRatioSql("n_ellipsis", "n_lines", 4)} AS ellipsis_share,
       |  ${roundedRatioSql("n_alpha", "n_words", 4)} AS alpha_share,
       |  ${roundedRatioSql("n_symbols", "n_words", 4)} AS symbol_ratio
       |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    val aug = concat(
      when(col("doc_id") % 3 === 0, lit("- item one\n")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("tag ## ")).otherwise(lit("")),
      col("text"),
      when(col("doc_id") % 4 === 0, lit("\nto be continued...")).otherwise(lit("")))
    val stats = Tables.documents(s, d)
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"), col("aug"),
        TextOps.lineArray(col("aug")).as("ls"),
        TextOps.tokens(regexp_replace(col("aug"), "\n", " ")).as("w"))
      .select(col("doc_id"),
        size(col("ls")).cast("long").as("n_lines"),
        TextOps.bulletLineCount(col("ls")).as("n_bullet"),
        TextOps.ellipsisLineCount(col("ls")).as("n_ellipsis"),
        size(col("w")).cast("long").as("n_words"),
        TextOps.alphaWordCount(col("w")).as("n_alpha"),
        TextOps.symbolCount(col("aug")).as("n_symbols"))
    stats.select(col("doc_id"), col("n_lines"), col("n_bullet"),
        col("n_ellipsis"), col("n_words"), col("n_symbols"),
        Exact.roundedRatio(col("n_bullet"), col("n_lines"), 4).as("bullet_share"),
        Exact.roundedRatio(col("n_ellipsis"), col("n_lines"), 4).as("ellipsis_share"),
        Exact.roundedRatio(col("n_alpha"), col("n_words"), 4).as("alpha_share"),
        Exact.roundedRatio(col("n_symbols"), col("n_words"), 4).as("symbol_ratio"))
      .orderedSmall(col("doc_id"))
  }

  /** Stratified deterministic sampling (#86): per-language keep rates
    * — the corpus-rebalancing pass (downsample the dominant language,
    * keep all of the low-resource ones). Rates are per-stratum, the
    * bucket is per-id, so samples nest as rates grow and the whole
    * pass is one zero-shuffle filter; the gate audits kept counts and
    * characters per language cross-engine.
    */
  private val StratRates = Seq("en" -> 10, "de" -> 25, "es" -> 50, "fr" -> 75)

  val qStratifiedSample = GateQuery.sql(
    "q_stratified_sample",
    s"""SELECT lang, count(*) AS n_kept,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM documents
       |WHERE ${Sampling.stratifiedSampleSql("doc_id", "lang", StratRates, 100)}
       |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Sampling.stratifiedSample(Tables.documents(s, d), col("doc_id"), col("lang"),
        StratRates, defaultPct = 100)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("total_chars"))
      .orderedSmall(col("lang"))
  }

  /** #98 — incremental dedup: the incoming half of the corpus
    * (sources src10+) filtered against the existing half (src0–src9)
    * by exact content hash and MinHash band hits — the
    * continual-pretraining batch-admission check.
    */
  val qIncrementalDedup = GateQuery.sql(
    "q_incremental_dedup", {
      val sigList = (0 until 16)
        .map(i => s"min(${TextOps.permHashSql(i, "h")})").mkString("[", ", ", "]")
      val bandParts = (1 to 4).map(r => s"CAST(sig[b * 4 + $r] AS VARCHAR)").mkString(" || ',' || ")
      s"""WITH $ShinglesSql,
         |sig AS (SELECT doc_id, $sigList AS sig FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, b AS band, md5($bandParts) AS bh
         |          FROM sig, range(4) AS r(b)),
         |meta AS (SELECT doc_id, md5(text) AS cmd5,
         |           CAST(substr(source, 4) AS INT) >= 10 AS is_new FROM documents),
         |ex AS (SELECT * FROM meta WHERE NOT is_new),
         |nw AS (SELECT * FROM meta WHERE is_new),
         |exm AS (SELECT DISTINCT cmd5, TRUE AS ehit FROM ex),
         |exb AS (SELECT DISTINCT band, bh FROM bands JOIN ex USING (doc_id)),
         |nwb AS (SELECT bands.doc_id AS doc_id, band, bh FROM bands JOIN nw USING (doc_id)),
         |nearhit AS (SELECT DISTINCT doc_id, TRUE AS nhit FROM nwb JOIN exb USING (band, bh))
         |SELECT nw.doc_id AS doc_id,
         |  coalesce(ehit, FALSE) AS exact_dup,
         |  coalesce(nhit, FALSE) AS near_dup,
         |  NOT (coalesce(ehit, FALSE) OR coalesce(nhit, FALSE)) AS kept
         |FROM nw LEFT JOIN exm USING (cmd5) LEFT JOIN nearhit USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val isNew = substring(col("source"), 4, 10).cast("int") >= 10
    Dedup.incrementalDedup(
        docs.filter(!isNew), docs.filter(isNew),
        col("doc_id"), col("text"), k = 3, numPerms = 16, bands = 4)
      .orderedSmall(col("doc_id"))
  }

  /** #132 — soft deduplication (SoftDeDup, He et al. ACL 2024):
    * instead of DROPPING near-duplicates, every document gets a
    * training sampling weight inversely proportional to its near-dup
    * cluster size — duplicates are down-weighted, singletons keep
    * weight 1. Composes the jaccard candidate pairs + connected
    * components with one cluster-keyed count and one key-partitioned
    * join back; per cluster the weights sum to ~1e6 (floor division),
    * so corpus-level expected token mass matches hard dedup while no
    * text is discarded. The weight is exact integer micro-units
    * (1e6 DIV size) — engine-stable, no float division.
    */
  val qSoftDedup = GateQuery.sql(
    "q_soft_dedup",
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, unnest(shl) AS h, len(shl) AS m
       |  FROM (SELECT doc_id, list_distinct(
       |          [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]) AS shl
       |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) tw) tl),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2, 3, 4),
       |pairs AS (SELECT doc_a, doc_b FROM p
       |          WHERE inter * 100 >= (ma + mb - inter) * 50),
       |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |        UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
       |lab AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
       |        FROM reach GROUP BY a),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS csz FROM lab GROUP BY 1),
       |w AS (SELECT lab.doc_id AS doc_id, csz FROM lab JOIN sz USING (cluster_id))
       |SELECT d.doc_id AS doc_id,
       |  coalesce(csz, 1) AS cluster_size,
       |  1000000 // coalesce(csz, 1) AS weight_micro
       |FROM documents d LEFT JOIN w USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = Dedup.jaccardPairsFrom(graft.SharedRelations.docPairCounts3(s, d), 50)
    val labels = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("csz"))
    val weights = labels.join(sizes, "cluster_id").select(col("doc_id"), col("csz"))
    val csz = coalesce(col("csz"), lit(1L))
    docs.select(col("doc_id")).join(weights, Seq("doc_id"), "left")
      .select(col("doc_id"), csz.as("cluster_size"),
        graft.operators.Binning.floorDivCol(lit(1000000L), csz).as("weight_micro"))
      .orderedSmall(col("doc_id"))
  }

  /** #143 — dedup threshold survival curve: every candidate pair
    * histogrammed by Jaccard decile in ONE pass over the same capped
    * pair stage as `q_jaccard_pairs` — the sweep that answers "how
    * many pairs does each threshold kill" for every threshold at
    * once, run before committing to a similarity cutoff. Buckets are
    * exact integer floor-division, so the histogram hash-matches.
    */
  val qJaccardSurvival = GateQuery.sql(
    "q_jaccard_survival",
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(shl) AS h, len(shl) AS m
       |  FROM (SELECT doc_id, list_distinct(
       |          [hash(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]) AS shl
       |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) tw) tl),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2, 3, 4)
       |SELECT (inter * 10) // (ma + mb - inter) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM p GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
    Dedup.jaccardSurvivalFrom(graft.SharedRelations.docPairCounts3(s, d))
      .orderedSmall(col("bucket"))
  }

  /** Wasserstein-1 drift distance (#169): earth-mover's distance
    * between each source's n_chars distribution and the corpus
    * distribution — the distribution-shift audit a mixing pipeline
    * runs per ingest batch. EXACT integers throughout: on the shared
    * value grid, W1 ∝ Σ |cum_s·n_c − cum_c·n_s|·gap (cdfs
    * cross-scaled instead of divided). The windows run over the
    * VALUE-COLLAPSED grid (distinct n_chars), never per-doc rows —
    * the weightedPerGroup scale discipline; the source list rides a
    * bounded broadcast.
    */
  val qW1Drift = GateQuery.sql(
    "q_w1_drift",
    """WITH v AS (SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
      |g AS (SELECT v, sum(c) AS cc FROM v GROUP BY v),
      |cg AS (SELECT v, CAST(sum(cc) OVER (ORDER BY v) AS BIGINT) AS cumc,
      |       CAST(lead(v) OVER (ORDER BY v) - v AS BIGINT) AS gap FROM g),
      |tot AS (SELECT CAST(sum(cc) AS BIGINT) AS nc FROM g),
      |sv AS (SELECT s.source, cg.v, cg.gap, cg.cumc,
      |    CAST(sum(coalesce(x.c, 0)) OVER (PARTITION BY s.source ORDER BY cg.v) AS BIGINT) AS cums
      |  FROM (SELECT DISTINCT source FROM documents) s
      |  CROSS JOIN cg
      |  LEFT JOIN v x ON x.source = s.source AND x.v = cg.v),
      |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY 1)
      |SELECT sv.source,
      |  CAST(sum(CASE WHEN gap IS NULL THEN 0
      |    ELSE abs(cums * nc - cumc * n_s) * gap END) AS BIGINT) AS w1_scaled,
      |  max(n_s) AS n_docs
      |FROM sv, tot JOIN ns ON ns.source = sv.source
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val v = docs.groupBy(col("source"), col("n_chars").as("v")).agg(count(lit(1)).as("c"))
    val g = v.groupBy(col("v")).agg(sum(col("c")).as("cc"))
    // global windows over the VALUE GRID (distinct n_chars) — bounded
    // by the value domain, not the corpus
    val wOrd = Window.orderBy(col("v"))
    val cg = g
      .withColumn("cumc", sum(col("cc")).over(wOrd).cast("long"))
      .withColumn("gap", (lead(col("v"), 1).over(wOrd) - col("v")).cast("long"))
      .select(col("v"), col("cumc"), col("gap"))
    val tot = g.agg(sum(col("cc")).cast("long").as("nc"))
    val sources = docs.select(col("source")).distinct()
    val sv = cg.crossJoin(broadcast(sources))
      .join(v.select(col("source"), col("v"), col("c")), Seq("source", "v"), "left")
      .withColumn("cums",
        sum(coalesce(col("c"), lit(0L)))
          .over(Window.partitionBy(col("source")).orderBy(col("v"))).cast("long"))
    val ns = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    graft.operators.Curation.withStats(sv, tot)
      .join(broadcast(ns), "source")
      .groupBy(col("source"))
      .agg(sum(when(col("gap").isNull, lit(0L))
          .otherwise(abs(col("cums") * col("nc") - col("cumc") * col("n_s")) * col("gap")))
        .cast("long").as("w1_scaled"),
        max(col("n_s")).as("n_docs"))
      .orderedSmall(col("source"))
  }

  /** Cross-source overlap matrix (#170): pairwise shared-shingle
    * containment between sources ([[Dedup.sourceOverlap]]) — the
    * "which feeds duplicate each other" audit before mixing weights
    * are trusted. sources²-row output at any corpus size. The source
    * CATALOG (the distinct feed list — metadata, not data) caches
    * per session, so the gate runs ONE job: the h-keyed bitmask
    * aggregate (r12 verdict item 2 — the distinct-sources probe was
    * the gate's second job).
    */
  val qSourceOverlap = GateQuery.sql(
    "q_source_overlap",
    """WITH sh AS (SELECT DISTINCT source, h FROM (
      |    SELECT source, unnest([hash(array_to_string(w[i:i+2], ' '))
      |        for i in range(1, len(w) - 1)]) AS h
      |    FROM (SELECT source, string_split(text, ' ') AS w FROM documents) t) u),
      |m AS (SELECT source, count(*) AS m FROM sh GROUP BY 1),
      |p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2)
      |SELECT src_a, src_b, inter, ma.m AS m_a, mb.m AS m_b,
      |  (inter * 1000000) // least(ma.m, mb.m) AS containment_ppm
      |FROM p JOIN m ma ON ma.source = src_a JOIN m mb ON mb.source = src_b
      |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val catalog = graft.SharedRelations.cachedValue("srcs", d)(
      Tables.documents(s, d).select(col("source")).distinct()
        .collect().map(_.getString(0)).toSeq)
    Dedup.sourceOverlap(Tables.documents(s, d), col("source"), col("text"), 3,
        catalog = Some(catalog))
      .orderedSmall(col("src_a"), col("src_b"))
  }

  /** Exact AUC (#175): Mann–Whitney rank-sum AUC of a score column
    * against a binary label, ENTIRELY on the VALUE-COLLAPSED score
    * relation — per distinct score the doubled midrank is
    * 2·cum − c + 1 (integer), so tied scores get exact midranks with
    * no per-row global sort anywhere (the window runs over distinct
    * scores). The classifier-evaluation primitive every quality
    * filter needs before its threshold is trusted.
    */
  val qAuc = GateQuery.sql(
    "q_auc",
    """WITH d AS (SELECT n_chars AS s,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
      |v AS (SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
      |  FROM d GROUP BY s),
      |w AS (SELECT s, c, p, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum FROM v),
      |a AS (SELECT CAST(sum(p * (2 * cum - c + 1)) AS BIGINT) AS sp2,
      |   CAST(sum(p) AS BIGINT) AS np, CAST(sum(c - p) AS BIGINT) AS nn FROM w)
      |SELECT np, nn, sp2,
      |  ((sp2 - np * (np + 1)) * 1000000) // (2 * np * nn) AS auc_ppm
      |FROM a""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("n_chars").as("s"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))
    val v = docs.groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).cast("long").as("p"))
    val w = v.withColumn("cum", sum(col("c")).over(Window.orderBy(col("s"))).cast("long"))
    w.agg(sum(col("p") * (lit(2L) * col("cum") - col("c") + 1)).cast("long").as("sp2"),
        sum(col("p")).cast("long").as("np"),
        sum(col("c") - col("p")).cast("long").as("nn"))
      .select(col("np"), col("nn"), col("sp2"),
        Binning.floorDivCol(
          (col("sp2") - col("np") * (col("np") + 1)) * lit(1000000L),
          lit(2L) * col("np") * col("nn")).as("auc_ppm"))
  }

  /** Precision-recall curve (#356): the operating-point sweep behind
    * #182's single-number average precision — precision and recall at
    * EVERY distinct score threshold of the length-ranked en-classifier
    * (same score/label derivation as #175's AUC, so all three gates
    * audit the SAME ranker: threshold sweep here, rank integral
    * there). On imbalanced labels this curve, not ROC, shows where
    * the ranker actually operates (Davis & Goadrich 2006). All exact:
    * the VALUE-COLLAPSED score grid carries cumulative (predicted ≥
    * threshold, true-positive) counts through one descending window;
    * precision/recall are ppm floor divisions per grid row — bounded
    * by distinct scores, never docs.
    */
  val qPrCurve = GateQuery.sql(
    "q_pr_curve",
    """WITH d AS (SELECT n_chars AS s,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
      |v AS (SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
      |  FROM d GROUP BY s),
      |w AS (SELECT s, CAST(sum(c) OVER (ORDER BY s DESC) AS BIGINT) AS cum_n,
      |    CAST(sum(p) OVER (ORDER BY s DESC) AS BIGINT) AS cum_tp,
      |    CAST(sum(p) OVER () AS BIGINT) AS np
      |  FROM v)
      |SELECT s AS threshold, cum_n, cum_tp,
      |  (cum_tp * 1000000) // cum_n AS precision_ppm,
      |  CASE WHEN np = 0 THEN NULL ELSE (cum_tp * 1000000) // np END AS recall_ppm
      |FROM w ORDER BY threshold DESC""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("n_chars").as("s"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))
    val v = docs.groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).cast("long").as("p"))
    val w = v
      .withColumn("cum_n", sum(col("c")).over(Window.orderBy(col("s").desc)).cast("long"))
      .withColumn("cum_tp", sum(col("p")).over(Window.orderBy(col("s").desc)).cast("long"))
      .withColumn("np", sum(col("p")).over(Window.partitionBy()).cast("long"))
    w.select(col("s").as("threshold"), col("cum_n"), col("cum_tp"),
        Binning.floorDivCol(col("cum_tp") * lit(1000000L), col("cum_n")).as("precision_ppm"),
        when(col("np") === 0, lit(null).cast("long"))
          .otherwise(Binning.floorDivCol(col("cum_tp") * lit(1000000L), col("np")))
          .as("recall_ppm"))
      .orderedSmall(col("threshold").desc)
  }

  /** Youden's J / KS-separation optimal cutpoint (#372): the
    * threshold maximizing TPR − FPR over the en-classifier score —
    * Youden 1950's clinical-cutpoint standard, and numerically THE
    * "KS statistic" credit scoring reports (max vertical gap between
    * the two class score CDFs; the decision-oriented companion of
    * the hypothesis-testing KS #206). Completes the operating-point
    * family: #357 picks the impurity-optimal split, this picks the
    * sensitivity+specificity-optimal one — they differ whenever
    * classes are imbalanced. Exact: cross-scaled gap
    * d = tp·neg − fp·pos per VALUE-COLLAPSED threshold (the #206
    * integer-deviation trick — no per-threshold division at all),
    * argmax via the min-struct idiom, ppm rates only in the output
    * row.
    */
  val qYouden = GateQuery.sql(
    "q_youden",
    """WITH d AS (SELECT n_chars AS s,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
      |v AS (SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
      |  FROM d GROUP BY s),
      |w AS (SELECT s,
      |    CAST(sum(c) OVER (ORDER BY s DESC) AS BIGINT) AS cum_n,
      |    CAST(sum(p) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
      |    CAST(sum(p) OVER () AS BIGINT) AS pos,
      |    CAST(sum(c - p) OVER () AS BIGINT) AS neg
      |  FROM v),
      |g AS (SELECT s, tp, cum_n - tp AS fp, pos, neg,
      |    CAST(tp AS HUGEINT) * neg - CAST(cum_n - tp AS HUGEINT) * pos AS d
      |  FROM w WHERE pos > 0 AND neg > 0),
      |mx AS (SELECT max(d) AS m FROM g)
      |SELECT CAST(b[1] AS BIGINT) AS threshold, CAST(b[2] AS BIGINT) AS tp,
      |  CAST(b[3] AS BIGINT) AS fp, pos AS n_pos, neg AS n_neg,
      |  (CAST(b[2] AS BIGINT) * 1000000) // pos AS tpr_ppm,
      |  (CAST(b[3] AS BIGINT) * 1000000) // neg AS fpr_ppm,
      |  (CAST(b[2] AS BIGINT) * 1000000) // pos
      |    - (CAST(b[3] AS BIGINT) * 1000000) // neg AS youden_j_ppm
      |FROM (SELECT min((s, tp, fp)) FILTER (d = m) AS b,
      |    any_value(pos) AS pos, any_value(neg) AS neg
      |  FROM g, mx) q""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("n_chars").as("s"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))
    val v = docs.groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).cast("long").as("p"))
    val w = v
      .withColumn("cum_n", sum(col("c")).over(Window.orderBy(col("s").desc)).cast("long"))
      .withColumn("tp", sum(col("p")).over(Window.orderBy(col("s").desc)).cast("long"))
      .withColumn("pos", sum(col("p")).over(Window.partitionBy()).cast("long"))
      .withColumn("neg", sum(col("c") - col("p")).over(Window.partitionBy()).cast("long"))
    def dec(x: Column) = x.cast("decimal(38,0)")
    val g = w.filter(col("pos") > 0 && col("neg") > 0)
      .select(col("s"), col("tp"), (col("cum_n") - col("tp")).as("fp"),
        col("pos"), col("neg"),
        (dec(col("tp")) * col("neg") - dec(col("cum_n") - col("tp")) * col("pos")).as("d"))
    val mx = g.agg(max(col("d")).as("m"))
    val best = graft.operators.Curation.withStats(g, mx)
      .agg(min(when(col("d") === col("m"),
        struct(col("s"), col("tp"), col("fp")))).as("b"),
        first(col("pos")).as("pos"), first(col("neg")).as("neg"))
    best.select(col("b.s").cast("long").as("threshold"),
      col("b.tp").cast("long").as("tp"), col("b.fp").cast("long").as("fp"),
      col("pos").as("n_pos"), col("neg").as("n_neg"),
      Binning.floorDivCol(col("b.tp") * lit(1000000L), col("pos")).as("tpr_ppm"),
      Binning.floorDivCol(col("b.fp") * lit(1000000L), col("neg")).as("fpr_ppm"),
      (Binning.floorDivCol(col("b.tp") * lit(1000000L), col("pos")) -
        Binning.floorDivCol(col("b.fp") * lit(1000000L), col("neg"))).as("youden_j_ppm"))
  }

  /** Gini-impurity best split (#357): the single most informative
    * threshold on a quality signal — CART's split criterion (Breiman
    * et al. 1984) run once over the length→lang='en' pair: for every
    * candidate threshold on the VALUE-COLLAPSED grid, the
    * size-weighted binary Gini of the two sides, minimized. This is
    * the "where should the quality-filter cutoff actually sit"
    * primitive behind every hand-tuned threshold in the curation
    * funnel (#41/#101). Exact: side impurities 2x(n−x)/n are
    * micro-floored integer divisions of cumulative counts; the argmin
    * is the min-struct idiom on (impurity, threshold); baseline Gini
    * and the gain close the row out — no doubles anywhere.
    */
  val qGiniSplit = GateQuery.sql(
    "q_gini_split",
    """WITH d AS (SELECT n_chars AS s,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
      |v AS (SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
      |  FROM d GROUP BY s),
      |w AS (SELECT s,
      |    CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS nl,
      |    CAST(sum(p) OVER (ORDER BY s) AS BIGINT) AS xl,
      |    CAST(sum(c) OVER () AS BIGINT) AS n,
      |    CAST(sum(p) OVER () AS BIGINT) AS x
      |  FROM v),
      |g AS (SELECT s, nl, xl, n - nl AS nr, x - xl AS xr, n, x,
      |    CAST(((2 * CAST(xl AS HUGEINT) * (nl - xl) * 1000000) // nl
      |      + (2 * CAST(x - xl AS HUGEINT) * ((n - nl) - (x - xl)) * 1000000) // (n - nl))
      |      // n AS BIGINT) AS imp_micro
      |  FROM w WHERE nl < n),
      |mx AS (SELECT min(imp_micro) AS m FROM g),
      |best AS (SELECT min((s, nl, xl, nr, xr)) FILTER (imp_micro = m) AS b,
      |    max(m) AS imp, any_value(n) AS n, any_value(x) AS x
      |  FROM g, mx)
      |SELECT CAST(b[1] AS BIGINT) AS threshold, CAST(b[2] AS BIGINT) AS n_left,
      |  CAST(b[3] AS BIGINT) AS x_left, CAST(b[4] AS BIGINT) AS n_right,
      |  CAST(b[5] AS BIGINT) AS x_right, imp AS impurity_micro,
      |  CAST((2 * CAST(x AS HUGEINT) * (n - x) * 1000000) // n // n AS BIGINT)
      |    AS base_impurity_micro,
      |  CAST((2 * CAST(x AS HUGEINT) * (n - x) * 1000000) // n // n - imp AS BIGINT)
      |    AS gain_micro
      |FROM best""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("n_chars").as("s"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))
    val v = docs.groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).cast("long").as("p"))
    val w = v
      .withColumn("nl", sum(col("c")).over(Window.orderBy(col("s"))).cast("long"))
      .withColumn("xl", sum(col("p")).over(Window.orderBy(col("s"))).cast("long"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()).cast("long"))
      .withColumn("x", sum(col("p")).over(Window.partitionBy()).cast("long"))
    val nr = col("n") - col("nl")
    val xr = col("x") - col("xl")
    def dec(c0: Column) = c0.cast("decimal(38,0)")
    val g = w.filter(col("nl") < col("n"))
      .select(col("s"), col("nl"), col("xl"), nr.as("nr"), xr.as("xr"),
        col("n"), col("x"),
        Exact.floorDivBig(
          Exact.floorDivBig(lit(2L) * dec(col("xl")) * (col("nl") - col("xl")) *
            lit(1000000L), col("nl")) +
          Exact.floorDivBig(lit(2L) * dec(xr) * (nr - xr) * lit(1000000L), nr),
          col("n")).cast("long").as("imp_micro"))
    val mx = g.agg(min(col("imp_micro")).as("m"))
    val best = graft.operators.Curation.withStats(g, mx)
      .agg(min(when(col("imp_micro") === col("m"),
        struct(col("s"), col("nl"), col("xl"), col("nr"), col("xr")))).as("b"),
        max(col("m")).as("imp"), first(col("n")).as("n"), first(col("x")).as("x"))
    val base = Exact.floorDivBig(
      Exact.floorDivBig(lit(2L) * dec(col("x")) * (col("n") - col("x")) * lit(1000000L),
        col("n")), col("n")).cast("long")
    best.select(col("b.s").cast("long").as("threshold"),
      col("b.nl").cast("long").as("n_left"), col("b.xl").cast("long").as("x_left"),
      col("b.nr").cast("long").as("n_right"), col("b.xr").cast("long").as("x_right"),
      col("imp").as("impurity_micro"),
      base.as("base_impurity_micro"),
      (base - col("imp")).as("gain_micro"))
  }

  /** Reliability diagram (#176): predicted-score deciles vs observed
    * positive share in exact ppm — the calibration audit read next to
    * #174's isotonic fit. The bucket bound rides a 1-row broadcast;
    * one hash aggregate.
    */
  val qReliability = GateQuery.sql(
    "q_reliability",
    """WITH d AS (SELECT (n_chars * 10) // (1 + (SELECT max(n_chars) FROM documents)) AS bucket,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents)
      |SELECT bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
      |  (CAST(sum(y) AS BIGINT) * 1000000) // count(*) AS obs_ppm
      |FROM d GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val mx = docs.agg(max(col("n_chars")).as("mx"))
    graft.operators.Curation.withStats(
        docs.select(col("n_chars"),
          when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y")), mx)
      .select(Binning.floorDivCol(col("n_chars") * lit(10L), lit(1L) + col("mx")).as("bucket"),
        col("y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n_pos"))
      .select(col("bucket"), col("n"), col("n_pos"),
        Binning.floorDivCol(col("n_pos") * lit(1000000L), col("n")).as("obs_ppm"))
      .orderedSmall(col("bucket"))
  }

  /** Spearman rank correlation (#177): exact per-source ρ between
    * document length and token count — the metric-agreement audit
    * (does the cheap signal rank like the expensive one?). Integer
    * ranks with (value, doc_id) tie pinning; ρ in exact ppm via the
    * closed form 1 − 6Σd²/(n(n²−1)).
    */
  val qSpearman = GateQuery.sql(
    "q_spearman",
    """WITH d AS (SELECT source, doc_id, n_chars,
      |    len(string_split(text, ' ')) AS ntok FROM documents),
      |r AS (SELECT source,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS ra,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY ntok, doc_id) AS BIGINT) AS rb
      |  FROM d),
      |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sd2 FROM r GROUP BY 1)
      |SELECT source, n, sd2,
      |  1000000 - (6000000 * sd2) // (n * (n * n - 1)) AS rho_ppm
      |FROM a WHERE n >= 2 ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
    val wa = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val wb = Window.partitionBy(col("source")).orderBy(col("ntok"), col("doc_id"))
    val r = docs
      .withColumn("ra", row_number().over(wa).cast("long"))
      .withColumn("rb", row_number().over(wb).cast("long"))
    r.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum((col("ra") - col("rb")) * (col("ra") - col("rb"))).cast("long").as("sd2"))
      .filter(col("n") >= 2)
      .select(col("source"), col("n"), col("sd2"),
        (lit(1000000L) - Binning.floorDivCol(lit(6000000L) * col("sd2"),
          col("n") * (col("n") * col("n") - 1))).as("rho_ppm"))
      .orderedSmall(col("source"))
  }

  /** K-fold cross-validation assignment (#232): every document lands
    * in exactly one of 5 folds by portable hash — the leak-free split
    * machinery behind classifier training (#96) and eval (#175–#183).
    * A stateless per-row expression (zero shuffle, pushes past any
    * join); the gate certifies fold balance and that folds PARTITION
    * the corpus (Σ fold counts = corpus count, enforced by the
    * oracle hash over all folds).
    */
  val qKfold = GateQuery.sql(
    "q_kfold",
    s"""WITH f AS (SELECT doc_id, n_chars,
       |    ${graft.operators.TextOps.baseHashSql("'fold:' || CAST(doc_id AS VARCHAR)")} % 5 AS fold
       |  FROM documents)
       |SELECT fold, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  (count(*) * 1000000) // (SELECT count(*) FROM documents) AS share_ppm
       |FROM f GROUP BY fold ORDER BY fold""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val f = docs.select(col("doc_id"), col("n_chars"),
      pmod(graft.operators.TextOps.baseHash(
        concat(lit("fold:"), col("doc_id").cast("string"))), lit(5L)).as("fold"))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    graft.operators.Curation.withStats(
        f.groupBy(col("fold"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars")),
        tot)
      .select(col("fold"), col("n_docs"), col("total_chars"),
        Binning.floorDivCol(col("n_docs") * lit(1000000L), col("n_total")).as("share_ppm"))
      .orderedSmall(col("fold"))
  }

  /** Nested learning-curve subsets (#233): deterministic 10% ⊂ 25% ⊂
    * 50% ⊂ 100% corpus subsets from ONE hash bucket per document
    * (bucket < p ⟹ bucket < p′ for p < p′ — nesting is structural,
    * not sampled twice) — the data-scaling-law measurement every
    * "how much data do we need" study runs. ONE corpus pass computes
    * all four points via conditional aggregates; the curve unfolds
    * from the single stats row. Monotone counts pinned in spec.
    */
  val qLearningCurve = GateQuery.sql(
    "q_learning_curve", {
      val bucket = s"${graft.operators.TextOps.baseHashSql("'sample:' || CAST(doc_id AS VARCHAR)")} % 100"
      val pcts = Seq(10, 25, 50, 100)
      val aggs = pcts.map(p =>
        s"count(*) FILTER ($bucket < $p) AS n_$p, " +
          s"CAST(sum(n_chars) FILTER ($bucket < $p) AS BIGINT) AS c_$p").mkString(", ")
      val arms = pcts.map(p =>
        s"SELECT $p AS pct, CAST(n_$p AS BIGINT) AS n_docs, c_$p AS total_chars FROM a")
        .mkString("\nUNION ALL ")
      s"""WITH a AS (SELECT $aggs FROM documents)
         |$arms
         |ORDER BY pct""".stripMargin
    }) { (s, d) =>
    val pcts = Seq(10, 25, 50, 100)
    val docs = Tables.documents(s, d)
    val pred = (p: Int) => Sampling.samplePredicate(col("doc_id"), p)
    val aggCols = pcts.flatMap(p => Seq(
      count(when(pred(p), 1)).as(s"n_$p"),
      sum(when(pred(p), col("n_chars"))).cast("long").as(s"c_$p")))
    val a = docs.agg(aggCols.head, aggCols.tail: _*)
    pcts.map(p => a.select(lit(p.toLong).as("pct"),
        col(s"n_$p").cast("long").as("n_docs"), col(s"c_$p").as("total_chars")))
      .reduce(_.unionAll(_))
      .orderedSmall(col("pct"))
  }

  /** Count-Min sketch (#240, Cormode & Muthukrishnan 2005): the
    * mergeable bounded-memory frequency sketch that completes the
    * sketch family (HLL #196, GK #189, Bloom #110, Misra–Gries
    * #113, MinHash #23) — d=4 × w=256 counters from portable
    * md5-derived row hashes, built in ONE map-side-combined
    * aggregate over a ×4 bounded explode (sketch = 1024 rows at ANY
    * corpus size; the point of the operator). Point queries take
    * min over the 4 row counters — NEVER below the true count
    * (structural one-sided error, asserted per row by the gate's
    * overcount ≥ 0 column); the top-20 exact counts ride alongside
    * so the oracle certifies estimate AND error together.
    */
  val qCountMin = GateQuery.sql(
    "q_countmin", {
      val bkt = (rExpr: String, wExpr: String) =>
        s"(${graft.operators.TextOps.baseHashSql(s"'cm' || CAST($rExpr AS VARCHAR) || ':' || $wExpr")} % 256)"
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         |ex AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         |sk AS (SELECT r, bucket, CAST(sum(c) AS BIGINT) AS c FROM (
         |    SELECT rr.r AS r, ${bkt("rr.r", "word")} AS bucket, c
         |    FROM ex, range(0, 4) rr(r)) t GROUP BY 1, 2),
         |top AS (SELECT word, c FROM ex ORDER BY c DESC, word LIMIT 20),
         |q AS (SELECT t.word AS word, any_value(t.c) AS exact_c,
         |    CAST(min(sk.c) AS BIGINT) AS est_c
         |  FROM (SELECT word, c, unnest(range(0, 4)) AS r FROM top) t
         |  JOIN sk ON sk.r = t.r AND sk.bucket = ${bkt("t.r", "t.word")}
         |  GROUP BY t.word)
         |SELECT word, exact_c, est_c, est_c - exact_c AS overcount
         |FROM q ORDER BY exact_c DESC, word""".stripMargin
    }) { (s, d) =>
    def bkt(r: org.apache.spark.sql.Column,
            w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      pmod(graft.operators.TextOps.baseHash(
        concat(lit("cm"), r.cast("string"), lit(":"), w)), lit(256L))
    val toks = Tables.documents(s, d)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("word"))
    // sketch built from the VOCAB-COLLAPSED count relation — counter
    // values are identical (sums of per-token increments = counts
    // weighted by c) but the ×4 md5 fan-out runs over the vocabulary,
    // not the token stream (~100× fewer hashes); persisted because the
    // sketch AND the exact top-20 both read it
    val ex = toks.groupBy(col("word")).agg(count(lit(1)).cast("long").as("c")).persist()
    val rows = ex.select(col("word"), col("c"),
      explode(array((0 until 4).map(i => lit(i.toLong)): _*)).as("r"))
    val sk = rows.select(col("r"), bkt(col("r"), col("word")).as("bucket"), col("c"))
      .groupBy(col("r"), col("bucket")).agg(sum(col("c")).cast("long").as("c"))
    val top = ex.orderBy(col("c").desc, col("word")).limit(20)
    val qy = top.select(col("word"), col("c"),
        explode(array((0 until 4).map(i => lit(i.toLong)): _*)).as("r"))
      .withColumn("bucket", bkt(col("r"), col("word")))
      .join(sk.withColumnRenamed("c", "skc"), Seq("r", "bucket"))
      .groupBy(col("word"))
      .agg(first(col("c")).as("exact_c"), min(col("skc")).cast("long").as("est_c"))
    qy.select(col("word"), col("exact_c"), col("est_c"),
        (col("est_c") - col("exact_c")).as("overcount"))
      .orderedSmall(col("exact_c").desc, col("word"))
  }

  /** TextRank keyword extraction (#397, Mihalcea & Tarau 2004):
    * PageRank over the word co-occurrence graph (adjacent words,
    * symmetric, distinct) — the graph-centrality keyword scorer
    * next to RAKE's degree/frequency ratio (#396): RAKE rewards
    * words that live in long phrases, TextRank words that BRIDGE
    * contexts. Same exact pico-rank integer iteration as #184 (5
    * unrolled rounds, teleport + damped in-sums, floor divisions
    * mirrored verbatim); the word graph is VOCAB-bounded, so every
    * iteration joins a vocab-sized rank relation against a
    * vocab²-bounded edge set — at corpus scale the edge build is
    * the only data-sized pass. Top-20 by final rank.
    */
  val qTextrank = GateQuery.sql(
    "q_textrank", {
      val unit = 1000000000000L
      val iterCtes = (1 to 5).map { i =>
        s"""r$i AS (SELECT n.node,
           |    (15 * $unit) // (100 * (SELECT n FROM cnt))
           |      + (85 * coalesce(c.in_sum, 0)) // 100 AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum(r.r // e.outdeg) AS BIGINT) AS in_sum
           |    FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY 1) c
           |  ON n.node = c.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH tw AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |bi AS (SELECT unnest([ws[i] for i in range(1, len(ws))]) AS w1,
         |    unnest([ws[i+1] for i in range(1, len(ws))]) AS w2
         |  FROM tw WHERE len(ws) >= 2),
         |e0 AS (SELECT DISTINCT w1 AS src, w2 AS dst FROM bi WHERE w1 <> w2
         |  UNION SELECT DISTINCT w2, w1 FROM bi WHERE w1 <> w2),
         |deg AS (SELECT src AS node, count(*) AS outdeg FROM e0 GROUP BY 1),
         |nodes AS (SELECT node FROM deg),
         |cnt AS (SELECT count(*) AS n FROM nodes),
         |edges AS (SELECT e0.src, e0.dst, d.outdeg FROM e0
         |  JOIN deg d ON e0.src = d.node),
         |r0 AS (SELECT node, $unit // (SELECT n FROM cnt) AS r FROM nodes),
         |$iterCtes
         |SELECT node AS word, CAST(r AS BIGINT) AS rank_pico FROM r5
         |ORDER BY r DESC, node LIMIT 20""".stripMargin
    }) { (s, d) =>
    val unit = 1000000000000L
    val tw = Tables.documents(s, d).select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val bi = tw
      .select(col("ws"), posexplode(slice(col("ws"), lit(1), size(col("ws")) - 1))
        .as(Seq("p", "w1")))
      .select(col("w1"), element_at(col("ws"), col("p") + 2).as("w2"))
      .filter(col("w1") =!= col("w2"))
    val e0 = bi.select(col("w1").as("src"), col("w2").as("dst"))
      .union(bi.select(col("w2").as("src"), col("w1").as("dst"))).distinct()
    // shared exact-integer PageRank operator (driver fast path under
    // the edge bound, distributed 2-shuffle loop past it — see
    // Graphs.pageRankPico); the word graph is vocab-bounded
    graft.operators.Graphs.pageRankPico(e0, iters = 5, unit = unit, dampNum = 85L)
      .select(col("node").as("word"), col("r").cast("long").as("rank_pico"))
      .orderBy(col("rank_pico").desc, col("word"))
      .limit(20)
  }

  /** RAKE keyphrase extraction (#396, Rose et al. 2010): split each
    * doc into candidate phrases at stopword boundaries, score words
    * by degree/frequency over phrase co-occurrence, score phrases as
    * the sum of their word scores — the classic unsupervised
    * keyphrase baseline, the PHRASE-level complement of the unigram
    * signals (keyness #302, burstiness #380, PMI #121 which stops at
    * pairs). The stop set is the data's own top-5 words (the C4
    * "most frequent = function word" heuristic, deterministic
    * tie-break) on a 5-row broadcast; phrase segmentation is one
    * gaps-and-islands window per doc (seg = pos − rank-among-kept);
    * phrases capped at 4 words (RAKE's convention AND the fan-out
    * bound); deg/freq ratios are exact micro floors; phrase score is
    * an exact integer sum, so ranking mirrors. Top-20 TakeOrdered.
    */
  val qRake = GateQuery.sql(
    "q_rake",
    """WITH tw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |tok AS (SELECT doc_id, unnest(ws) AS word,
      |    generate_subscripts(ws, 1) AS i FROM tw),
      |sw AS (SELECT word FROM (SELECT word, count(*) AS c FROM tok GROUP BY 1)
      |  ORDER BY c DESC, word LIMIT 5),
      |ns AS (SELECT doc_id, i, word,
      |    CAST(i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS seg
      |  FROM tok WHERE word NOT IN (SELECT word FROM sw)),
      |pl AS (SELECT doc_id, seg, word, i,
      |    count(*) OVER (PARTITION BY doc_id, seg) AS plen FROM ns),
      |pw AS (SELECT doc_id, seg, word, i, plen FROM pl WHERE plen <= 4),
      |wsC AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(plen) AS BIGINT) AS deg FROM pw GROUP BY 1),
      |sc AS (SELECT pw.doc_id, pw.seg,
      |    string_agg(pw.word, ' ' ORDER BY pw.i) AS phrase,
      |    CAST(sum((w.deg * 1000000) // w.freq) AS BIGINT) AS score
      |  FROM pw JOIN wsC w ON pw.word = w.word GROUP BY 1, 2),
      |ag AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n,
      |    CAST(max(score) AS BIGINT) AS score_micro FROM sc GROUP BY 1)
      |SELECT phrase, n, score_micro FROM ag
      |ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin) { (s, d) =>
    // the r8 plan ran TWO windows (gaps-and-islands + phrase length)
    // over the full exploded token relation plus a token-level
    // anti-join — but once the 5-word stop set is known, phrase
    // segmentation is per-DOC: one kernel expression emits each doc's
    // capped phrases directly, and only phrase-level rows shuffle
    val docs = Tables.documents(s, d)
    val sw = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(5)
      .collect().map(_.getString(0)).toSeq
    val phr = docs.select(col("doc_id"),
        posexplode(graft.expressions.CurationExpressions.rakePhrases(
          col("text"), sw, maxLen = 4)).as(Seq("pi", "phrase")))
      .withColumn("ws", split(col("phrase"), " "))
      .withColumn("plen", size(col("ws")).cast("long"))
    val pw = phr.select(col("doc_id"), col("pi"), col("phrase"), col("plen"),
      explode(col("ws")).as("word"))
    val wsC = pw.groupBy(col("word")).agg(
      count(lit(1)).cast("long").as("freq"),
      sum(col("plen")).cast("long").as("deg"))
    val sc = pw.join(wsC, "word")
      .groupBy(col("doc_id"), col("pi"), col("phrase"))
      .agg(sum(Binning.floorDivCol(col("deg") * lit(1000000L), col("freq")))
        .cast("long").as("score"))
    sc.groupBy(col("phrase")).agg(count(lit(1)).cast("long").as("n"),
        max(col("score")).cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(20)
  }

  /** HTML→text extraction (#440, r11): the upstream step the corpus
    * arrives AFTER in the driver testdata — exercised by wrapping
    * every document in a deterministic realistic HTML shell (heading,
    * per-doc paragraph, an entity-escaped ampersand where ' the '
    * appeared, a void tag) IDENTICALLY on both engines, then
    * extracting with [[graft.operators.TextOps.htmlToText]] (tag
    * strip → entity decode with &amp; last → whitespace collapse).
    * The gate hash-checks the extracted text's md5 + code-point
    * length per doc, so tag boundaries, entity order and whitespace
    * semantics are all pinned cross-engine. Zero shuffle — a pure
    * codegen projection.
    */
  val qHtmlExtract = GateQuery.sql(
    "q_html_extract", {
      val html = "'<html><body><h1>doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || " +
        "replace(text, ' the ', ' &amp; ') || '</p><br/></body></html>'"
      s"""SELECT doc_id,
         |  CAST(length(${graft.operators.TextOps.htmlToTextSql(html)}) AS BIGINT) AS n_chars,
         |  md5(${graft.operators.TextOps.htmlToTextSql(html)}) AS extract_md5
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    import graft.operators.TextOps
    val html = concat(lit("<html><body><h1>doc "), col("doc_id").cast("string"),
      lit("</h1><p>"), replace(col("text"), lit(" the "), lit(" &amp; ")),
      lit("</p><br/></body></html>"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(TextOps.htmlToText(html)).cast("long").as("n_chars"),
        md5(TextOps.htmlToText(html).cast("binary")).as("extract_md5"))
      .orderedSmall(col("doc_id"))
  }

  /** Encoding (mojibake) repair (#441, r11): UTF-8 text mis-decoded
    * as Latin-1 — the classic double-encoding corruption of web
    * corpora — rewritten back via the longest-first sequence table
    * ([[graft.operators.TextOps.repairEncoding]]). The gate corrupts
    * every document deterministically (e→Ã©, o→Ã¶ — the actual byte
    * pattern the bug produces) identically on both engines, repairs,
    * and hash-checks the repaired md5 + the code-point counts before
    * and after (each repair collapses 2 code points to 1, so
    * n_repaired is an exact derived count). Zero shuffle.
    */
  val qEncodingRepair = GateQuery.sql(
    "q_encoding_repair", {
      val corr = "replace(replace(text, 'e', 'Ã©'), 'o', 'Ã¶')"
      val rep = graft.operators.TextOps.repairEncodingSql(corr)
      s"""SELECT doc_id,
         |  CAST(length($corr) AS BIGINT) AS n_chars_bad,
         |  CAST(length($rep) AS BIGINT) AS n_chars_fixed,
         |  CAST(length($corr) - length($rep) AS BIGINT) AS n_repaired,
         |  md5($rep) AS repaired_md5
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    import graft.operators.TextOps
    val corr = replace(replace(col("text"), lit("e"), lit("Ã©")), lit("o"), lit("Ã¶"))
    val rep = TextOps.repairEncoding(corr)
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(corr).cast("long").as("n_chars_bad"),
        length(rep).cast("long").as("n_chars_fixed"),
        (length(corr) - length(rep)).cast("long").as("n_repaired"),
        md5(rep.cast("binary")).as("repaired_md5"))
      .orderedSmall(col("doc_id"))
  }

  val all: Seq[GateQuery] = Seq(
    qHtmlExtract, qEncodingRepair,
    qRake, qTextrank,
    qKfold, qLearningCurve, qCountMin,
    qAuc, qPrCurve, qGiniSplit, qYouden, qReliability, qSpearman,
    qDedupExact, qTokenCount, qTextQuality, qLangId, qKrippendorff, qFingerprint,
    qSimHash, qJaccardPairs, qMinhashPairs, qDupClusters, qCorpusCuration, qCaptureRecapture, qFleissKappa, qIndexCoincidence,
    qSplitSample, qContamination, qFuzzyContamination, qSeqPacking, qMultimodalMeta,
    qMultimodalFeatures, qRepetition, qPiiScrub, qGopherQuality,
    qStratifiedSample, qIncrementalDedup, qLangIdFt, qBpePacking, qWavStats,
    qImageNeardup, qImageQuality, qBloomContamination, qBm25, qQlRetrieval, qRbo, qHeavyHitters, qAudioFingerprint,
    qChunking, qPmi, qEditNeardup, qClusterReps, qSoftDedup, qJaccardSurvival,
    qContainmentPairs, qW1Drift, qSourceOverlap, qRrfFusion)
}
