package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — BM25 (Robertson et al.,
  * the Okapi formulation; the scoring Lucene/Elasticsearch run), used
  * in data pipelines for boilerplate discovery, targeted corpus
  * slicing and query-anchored quality audits.
  *
  * Cross-engine determinism discipline (SURVEY.md §4): k1/b default to
  * EXACTLY-representable doubles (1.25 / 0.75), every float operation
  * is explicitly associated the same way in the DuckDB mirror, and the
  * per-(term, doc) score is floor-quantized to integer micro-units so
  * the per-(query, doc) sum is order-independent exact arithmetic.
  *
  * Plan shape at scale: the tiny query-term set broadcast-semi-joins
  * the exploded token stream BEFORE any aggregate, so only matching
  * tokens — a vanishing fraction of the corpus — ever shuffle; the
  * doc length rides each exploded token (`size(w)` computed in the
  * same projection), so no corpus-keyed doc-length join exists at
  * all; corpus totals are one expression aggregate over the
  * un-exploded relation; per-term document frequencies aggregate from
  * the matched slice (query-terms-sized, broadcast back); top-k per
  * query is a window over query-id partitions. Never corpus × queries,
  * never a corpus-wide shuffle.
  */
object Retrieval {

  /** BM25 top-k per query. `queries` is the (query_id, text) set —
    * driver-side by definition (a query workload, not a table).
    *
    * @return (query_id, rank, doc_id, score_micro, n_terms), rank
    *         1..topK by descending micro-quantized score, doc_id
    *         ascending on ties
    */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               queries: Seq[(Long, String)], topK: Int = 10,
               k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "empty query workload")

    val base = docs.select(id.as("doc_id"), TextOps.tokens(text).as("w"))
    // dl = sum of per-doc term frequencies = token count; split always
    // yields >= 1 element, so every doc counts in n_docs — value-equal
    // to the oracle's dl/st derived from the tf relation
    val st = base.agg(count(lit(1)).as("n_docs"),
      sum(size(col("w"))).cast("long").as("total_len"))

    val qterms = queries
      .flatMap { case (qid, qt) => qt.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val tf = base
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf is already distinct per (doc, term), so df is a plain count
    val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfRel), Seq("term"))
      .crossJoin(broadcast(st)) // single scalar-stats row
    // association mirrored term-for-term by bm25Sql — do not refactor
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val num = col("tf") * lit(k1 + 1.0)
    val den = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * ((col("dl") * col("n_docs")) / col("total_len")))
    val sMicro = floor((idf * (num / den)) * lit(1000000)).cast("long")

    val agg = scored
      .select(col("query_id"), col("doc_id"), sMicro.as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("score_micro"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    agg
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }

  /** [[bm25TopK]] over a materialized (doc_id, dl, term, tf)
    * postings slice plus the corpus normalizers as driver literals —
    * the inverted-index serving shape
    * ([[graft.SharedRelations.queryPostings]] /
    * [[graft.SharedRelations.docLenStats]]): per call only the
    * score + rank stages run, never the corpus parse. The scoring
    * association is the same expression over the same integers as
    * the in-corpus path, so rows are identical.
    */
  def bm25TopKFromPostings(postings: DataFrame, nDocs: Long, totalLen: Long,
                           queries: Seq[(Long, String)], topK: Int = 10,
                           k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "empty query workload")
    val qterms = queries
      .flatMap { case (qid, qt) => qt.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .toDF("query_id", "term")
    // tf is distinct per (doc, term), so df is a plain count
    val dfRel = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfRel), Seq("term"))
    // association mirrored term-for-term by bm25Sql — do not refactor
    val idf = log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val num = col("tf") * lit(k1 + 1.0)
    val den = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * ((col("dl") * lit(nDocs)) / lit(totalLen)))
    val sMicro = floor((idf * (num / den)) * lit(1000000)).cast("long")
    val agg = scored
      .select(col("query_id"), col("doc_id"), sMicro.as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("score_micro"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    agg
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }

  /** [[qlTopK]] over the same materialized postings slice + literal
    * collection-length normalizer — see [[bm25TopKFromPostings]]. */
  def qlTopKFromPostings(postings: DataFrame, ct: Long,
                         queries: Seq[(Long, String)], topK: Int = 10,
                         mu: Double = 2000.0): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "empty query workload")
    val qterms = queries
      .flatMap { case (qid, qt) => qt.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val qn = qterms.groupBy(col("query_id")).agg(count(lit(1)).cast("long").as("nq"))
    val cfRel = postings.groupBy(col("term")).agg(sum(col("tf")).cast("long").as("cf"))
    // association mirrored term-for-term by qlSql — do not refactor
    val termS = floor(log(lit(1.0) +
      col("tf").cast("double") * lit(ct) / (lit(mu) * col("cf"))) * lit(1000000))
      .cast("long")
    val sc = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(cfRel), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"), col("dl"))
      .agg(sum(termS).cast("long").as("sm"), count(lit(1)).cast("long").as("n_terms"))
    val agg = sc.join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        (col("sm") + floor(col("nq") * log(lit(mu) / (col("dl") + lit(mu))) * lit(1000000))
          .cast("long")).as("score_micro"),
        col("n_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    agg
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009 — the standard
    * hybrid-retrieval combiner): fuse the BM25 top-K list with a raw
    * query-term-frequency top-K list, score = Σ_systems
    * 1e6 div (kRrf + rank) in EXACT integers, re-rank. RRF is how
    * production search fuses lexical and secondary rankings without
    * score calibration — only ranks cross systems, so the fusion is
    * engine-exact by construction. Both lists derive from the same
    * broadcast query workload; the fusion aggregate touches ≤
    * 2·topK rows per query at any corpus size.
    */
  def rrfFusion(docs: DataFrame, id: Column, text: Column,
                queries: Seq[(Long, String)], topK: Int = 10,
                kRrf: Int = 60): DataFrame =
    rrfFuse(
      bm25TopK(docs, id, text, queries, topK)
        .select(col("query_id"), col("doc_id"), col("rank")),
      tfTopK(docs, id, text, queries, topK), topK, kRrf)

  /** The raw query-term-frequency ranker (RRF's second system): per
    * query, docs ranked by how often its terms appear, (query_id,
    * doc_id, rank) top-K. Split out of [[rrfFusion]] (r13) so the
    * fusion gate can consume both rankers' session-materialized
    * lists — fusion only ever reads RANKS, never scores, so the
    * split is value-neutral.
    */
  def tfTopK(docs: DataFrame, id: Column, text: Column,
             queries: Seq[(Long, String)], topK: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(id.as("doc_id"), TextOps.tokens(text).as("w"))
    val qterms = queries
      .flatMap { case (qid, qt) => qt.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val wb = Window.partitionBy(col("query_id")).orderBy(col("tfq").desc, col("doc_id"))
    base
      .select(col("doc_id"), explode(col("w")).as("term"))
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("query_id"), col("doc_id")).agg(count(lit(1)).as("tfq"))
      .withColumn("rank", row_number().over(wb).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rank"))
  }

  /** Pure rank fusion over two (query_id, doc_id, rank) lists:
    * Σ 1e6 div (kRrf + rank), re-ranked. Bounded input (2·topK rows
    * per query), exact integers.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, topK: Int = 10,
              kRrf: Int = 60): DataFrame = {
    val contrib = a.select(col("query_id"), col("doc_id"), col("rank").as("r"))
      .unionAll(b.select(col("query_id"), col("doc_id"), col("rank").as("r")))
      .select(col("query_id"), col("doc_id"),
        Binning.floorDivCol(lit(1000000L), lit(kRrf.toLong) + col("r")).as("c"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).cast("long").as("rrf_micro"), count(lit(1)).as("n_systems"))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_micro"), col("n_systems"))
  }

  /** DuckDB mirror of [[rrfFusion]] — shares [[bm25Sql]]'s CTE chain
    * and extends it with the TF list and the exact-integer fusion. */
  def rrfSql(queries: Seq[(Long, String)], topK: Int = 10,
             kRrf: Int = 60, k1: Double = 1.25, b: Double = 0.75): String = {
    val vals = queries
      .flatMap { case (qid, qt) => qt.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .map { case (qid, t) => s"($qid, '${t.replace("'", "''")}')" }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
       |q(query_id, term) AS (VALUES $vals),
       |dfr AS (SELECT term, count(*) AS df FROM tf
       |        WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |sc AS (SELECT q.query_id, tf.doc_id,
       |    CAST(floor((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |      * ((tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b} + $b * ((dl * n_docs) / total_len)))))
       |      * 1000000) AS BIGINT) AS s
       |  FROM tf JOIN q USING (term) JOIN dfr USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN st),
       |bagg AS (SELECT query_id, doc_id, CAST(sum(s) AS BIGINT) AS score_micro
       |  FROM sc GROUP BY 1, 2),
       |la AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS BIGINT) AS r
       |  FROM bagg QUALIFY r <= $topK),
       |tfq AS (SELECT q.query_id, tf.doc_id, CAST(sum(tf) AS BIGINT) AS tfq
       |  FROM tf JOIN q USING (term) GROUP BY 1, 2),
       |lb AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY tfq DESC, doc_id) AS BIGINT) AS r
       |  FROM tfq QUALIFY r <= $topK),
       |u AS (SELECT query_id, doc_id, (1000000 // ($kRrf + r)) AS c FROM la
       |  UNION ALL SELECT query_id, doc_id, (1000000 // ($kRrf + r)) AS c FROM lb),
       |f AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
       |    CAST(count(*) AS BIGINT) AS n_systems FROM u GROUP BY 1, 2)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, rrf_micro, n_systems
       |FROM f
       |QUALIFY rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of [[bm25TopK]] over the `documents` view — same
    * association, same exact constants, same floor quantization.
    */
  def bm25Sql(queries: Seq[(Long, String)], topK: Int = 10,
              k1: Double = 1.25, b: Double = 0.75): String = {
    val vals = queries
      .flatMap { case (qid, qt) => qt.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .map { case (qid, t) => s"($qid, '${t.replace("'", "''")}')" }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
       |q(query_id, term) AS (VALUES $vals),
       |dfr AS (SELECT term, count(*) AS df FROM tf
       |        WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |sc AS (SELECT q.query_id, tf.doc_id,
       |    CAST(floor((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |      * ((tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b} + $b * ((dl * n_docs) / total_len)))))
       |      * 1000000) AS BIGINT) AS s
       |  FROM tf JOIN q USING (term) JOIN dfr USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN st),
       |agg AS (SELECT query_id, doc_id, CAST(sum(s) AS BIGINT) AS score_micro,
       |    CAST(count(*) AS BIGINT) AS n_terms FROM sc GROUP BY 1, 2)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, score_micro, n_terms
       |FROM agg
       |QUALIFY rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Dirichlet-smoothed query-likelihood top-k (Zhai & Lafferty 2001
    * — the language-modeling retrieval family next to BM25's
    * probabilistic one; the smoothing the LM-scoring gates #90/#94
    * already use, turned into a ranker). The standard sum-over-all-
    * query-terms score decomposes so only MATCHED terms need the
    * posting join:
    *
    *   score(q,d) = Σ_{t∈q∩d} ln(1 + tf·|C|/(μ·cf_t)) + |q|·ln(μ/(dl+μ))
    *
    * — the second term depends on the doc only through its length, so
    * the candidate set stays "docs matching ≥1 term" (how every
    * production QL engine bounds it). Same scale shape as
    * [[bm25TopK]]: broadcast query-term semi-join BEFORE any
    * aggregate, dl rides the exploded token, collection totals a
    * 1-row cross, per-term scores micro-floored so sums are exact.
    */
  def qlTopK(docs: DataFrame, id: Column, text: Column,
             queries: Seq[(Long, String)], topK: Int = 10,
             mu: Double = 2000.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "empty query workload")

    val base = docs.select(id.as("doc_id"), TextOps.tokens(text).as("w"))
    val st = base.agg(sum(size(col("w"))).cast("long").as("ct"))

    val qterms = queries
      .flatMap { case (qid, qt) => qt.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val qn = qterms.groupBy(col("query_id")).agg(count(lit(1)).cast("long").as("nq"))
    val tf = base
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val cfRel = tf.groupBy(col("term")).agg(sum(col("tf")).cast("long").as("cf"))

    // association mirrored term-for-term by qlSql — do not refactor
    val termS = floor(log(lit(1.0) +
      col("tf").cast("double") * col("ct") / (lit(mu) * col("cf"))) * lit(1000000))
      .cast("long")
    val sc = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(cfRel), Seq("term"))
      .crossJoin(broadcast(st))
      .groupBy(col("query_id"), col("doc_id"), col("dl"))
      .agg(sum(termS).cast("long").as("sm"), count(lit(1)).cast("long").as("n_terms"))
    val agg = sc.join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        (col("sm") + floor(col("nq") * log(lit(mu) / (col("dl") + lit(mu))) * lit(1000000))
          .cast("long")).as("score_micro"),
        col("n_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    agg
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }

  /** DuckDB oracle mirror of [[qlTopK]]. */
  def qlSql(queries: Seq[(Long, String)], topK: Int = 10,
            mu: Double = 2000.0): String = {
    val vals = queries
      .flatMap { case (qid, qt) => qt.split(" ").filter(_.nonEmpty).distinct.map((qid, _)) }
      .map { case (qid, t) => s"($qid, '${t.replace("'", "''")}')" }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tfa AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dla AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tfa GROUP BY 1),
       |st AS (SELECT CAST(sum(tf) AS BIGINT) AS ct FROM tfa),
       |q(query_id, term) AS (VALUES $vals),
       |qn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nq FROM q GROUP BY 1),
       |cfr AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tfa
       |        WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |sc AS (SELECT q.query_id, tfa.doc_id, dla.dl,
       |    CAST(sum(CAST(floor(ln(1.0 + CAST(tf AS DOUBLE) * ct / ($mu * cf))
       |      * 1000000) AS BIGINT)) AS BIGINT) AS sm,
       |    CAST(count(*) AS BIGINT) AS n_terms
       |  FROM tfa JOIN q USING (term) JOIN cfr USING (term)
       |       JOIN dla USING (doc_id) CROSS JOIN st
       |  GROUP BY 1, 2, 3),
       |agg AS (SELECT query_id, doc_id,
       |    sm + CAST(floor(nq * ln($mu / (dl + $mu)) * 1000000) AS BIGINT) AS score_micro,
       |    n_terms
       |  FROM sc JOIN qn USING (query_id))
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, score_micro, n_terms
       |FROM agg
       |QUALIFY rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — the diversity-aware top-k: after the best candidate,
    * each next pick maximizes
    *
    *   λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
    *
    * so near-duplicates of an already-selected result are pushed
    * down. The greedy loop runs per query over its BOUNDED candidate
    * pool (`poolK` from the ANN/brute-force stage — the standard
    * retrieve-then-rerank shape), as one `mapGroups` pass: one
    * shuffle on query_id, O(poolK²) integer dot products per query,
    * parallel across queries. At λ = 1 the output is exactly the
    * relevance order (pinned in spec); duplicated vectors in the pool
    * collapse to rank-distant positions (pinned).
    *
    * @param cands (query_id long, vec_id long, q array<long>
    *              quantized vector, n long exact squared norm,
    *              rel double relevance) — pool rows per query
    * @return (query_id, rnk 1-based, vec_id, mmr round-6 score;
    *         rnk 1 carries its relevance as the score)
    */
  def mmr(cands: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    require(lambda >= 0 && lambda <= 1, s"lambda out of [0,1]: $lambda")
    val spark = cands.sparkSession
    import spark.implicits._
    cands.select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("q"), col("n").cast("long"), col("rel").cast("double"))
      .as[(Long, Long, Seq[Long], Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // deterministic pool order: relevance desc, vec_id asc
        val pool = it.toArray.sortBy(c => (-c._5, c._2))
        val vecs = pool.map(_._3.toArray)
        val norms = pool.map(c => math.sqrt(c._4.toDouble))
        def sim(i: Int, j: Int): Double = {
          val a = vecs(i); val b = vecs(j)
          var s = 0L; var d = 0
          while (d < a.length) { s += a(d) * b(d); d += 1 }
          s.toDouble / (norms(i) * norms(j))
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val maxSim = Array.fill(pool.length)(0.0)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
        var rank = 1
        while (rank <= math.min(k, pool.length)) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < pool.length) {
            if (!selected.contains(i)) {
              val score =
                if (selected.isEmpty) pool(i)._5
                else lambda * pool(i)._5 - (1 - lambda) * maxSim(i)
              // tie → pool order (relevance desc, vec_id asc)
              if (score > bestScore) { bestScore = score; best = i }
            }
            i += 1
          }
          selected += best
          out += ((qid, rank, pool(best)._2,
            math.floor(bestScore * 1e6) / 1e6))
          var j = 0
          while (j < pool.length) {
            if (!selected.contains(j)) {
              val s = sim(j, best)
              if (s > maxSim(j)) maxSim(j) = s
            }
            j += 1
          }
          rank += 1
        }
        out.iterator
      }
      .toDF("query_id", "rnk", "vec_id", "mmr")
  }
}
