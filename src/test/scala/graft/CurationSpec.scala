package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Semantics of the corpus-curation operators (C4 line dedup, CCNet
  * LM scoring, DSIR weights, mix rebalancing) on hand-built corpora
  * where the expected outcome is known by construction. Gate-level
  * value parity vs DuckDB is the driver's oracle; plan-shape guards
  * (no cartesian / nested-loop) are GateQueriesSmokeSpec's.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("segments: K-word split with short tail") {
    val out = docs((1L, "a b c d e f g h i j", "en", "s"))
      .select(Curation.segments(col("text"), 4).as("segs"))
      .as[Seq[String]].head()
    assert(out === Seq("a b c d", "e f g h", "i j"))
  }

  test("lineDedup: later occurrences of a segment are dropped corpus-wide") {
    // doc 1 and doc 2 share their first 4-word segment; doc 2's copy
    // (higher doc_id) must be dropped, its unique tail kept.
    val d = docs(
      (1L, "x y z w p q r s", "en", "s"),
      (2L, "x y z w u v a b", "en", "s"))
    val out = Curation.lineDedup(d, 4).orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 2L, 2L, out(0).getString(3)))
    assert(out(1).getLong(1) === 2L && out(1).getLong(2) === 1L)
    // doc 2's surviving text is exactly its second segment
    val expectMd5 = d.sparkSession.range(1)
      .select(md5(lit("u v a b"))).as[String].head()
    assert(out(1).getString(3) === expectMd5)
  }

  test("lineDedup: exact-duplicate document dedups to nothing") {
    val d = docs(
      (1L, "m n o p q r s t", "en", "s"),
      (2L, "m n o p q r s t", "en", "s"))
    val out = Curation.lineDedup(d, 4).orderBy("doc_id").collect()
    assert(out(1).getLong(2) === 0L)
    val emptyMd5 = d.sparkSession.range(1).select(md5(lit(""))).as[String].head()
    assert(out(1).getString(3) === emptyMd5)
  }

  test("lineDedup: within-doc repeated segment keeps only the first") {
    val d = docs((7L, "a b c d a b c d e f g h", "en", "s"))
    val out = Curation.lineDedup(d, 4).collect()(0)
    assert(out.getLong(1) === 3L && out.getLong(2) === 2L)
  }

  test("substrDedup: later copy of an L-token span is excised, rest kept") {
    // doc 2 embeds doc 1's 6-token span inside unique context.
    val d = docs(
      (1L, "p q r s t u v w", "en", "s"),
      (2L, "x1 x2 p q r s t u y1 y2", "en", "s"))
    val out = Curation.substrDedup(d, 6).orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 8L) // doc 1 untouched
    // doc 2: spans at pos 3..8 and 4..9 (p q r s t u / q r s t u y1?) —
    // only the 6-gram "p q r s t u" repeats; tokens 3..8 deleted.
    assert(out(1).getLong(1) === 10L && out(1).getLong(2) === 4L)
    val expect = d.sparkSession.range(1)
      .select(md5(lit("x1 x2 y1 y2"))).as[String].head()
    assert(out(1).getString(3) === expect)
  }

  test("substrDedupStats agrees with the full dedup's counts") {
    val d = docs(
      (1L, "p q r s t u v w", "en", "s"),
      (2L, "x1 x2 p q r s t u y1 y2", "en", "s"),
      (3L, "p q r s t u v w", "en", "s"))
    val full = Curation.substrDedup(d, 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stats = Curation.substrDedupStats(d, 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats === full)
  }

  test("substrDedup: corpus with no repeats is unchanged") {
    val d = docs(
      (1L, "a1 a2 a3 a4 a5 a6 a7", "en", "s"),
      (2L, "b1 b2 b3 b4 b5 b6 b7", "en", "s"))
    val out = Curation.substrDedup(d, 6).orderBy("doc_id").collect()
    val m1 = d.sparkSession.range(1).select(md5(lit("a1 a2 a3 a4 a5 a6 a7"))).as[String].head()
    assert(out(0).getLong(2) === 7L && out(0).getString(3) === m1)
  }

  test("substrDedup: overlapping repeat longer than L removed whole; short docs skip") {
    // 8-token repeat → 3 overlapping dup windows at L=6 union to the
    // whole 8-token span in the later doc.
    val span = "r1 r2 r3 r4 r5 r6 r7 r8"
    val d = docs(
      (1L, s"$span tail1", "en", "s"),
      (2L, s"head1 $span", "en", "s"),
      (3L, "tiny doc", "en", "s")) // < L tokens: no windows, kept whole
    val out = Curation.substrDedup(d, 6).orderBy("doc_id").collect()
    assert(out(1).getLong(2) === 1L)
    val m2 = d.sparkSession.range(1).select(md5(lit("head1"))).as[String].head()
    assert(out(1).getString(3) === m2)
    assert(out(2).getLong(1) === 2L && out(2).getLong(2) === 2L)
  }

  test("unigram LM: OOV-heavy doc scores a higher avg NLL") {
    val d = docs(
      (1L, "the cat sat on the mat", "en", "s"),
      (2L, "the cat sat on the mat", "en", "s"),
      (3L, "zq xv qqq zzz yyy www", "fr", "s"))
    val toks = d.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("word"))
    val ref = toks.filter(col("lang") === "en")
    val lp = Curation.unigramLogProbs(ref)
    val scored = Curation.withStats(toks, Curation.oovLogProb(ref))
      .join(broadcast(lp), Seq("word"), "left")
      .groupBy("doc_id")
      .agg((-sum(coalesce(col("q"), col("oovq")))).as("nll"), count(lit(1)).as("n"))
      .select(col("doc_id"), (col("nll") / col("n")).as("avg"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(3L) > scored(1L))
    assert(scored(1L) === scored(2L))
  }

  test("bigram stupid-backoff: seen-bigram doc beats unseen-bigram doc") {
    // Reference slice is all "the cat"/"cat sat" bigrams; doc 3 uses
    // the same WORDS in an unseen order (every bigram backs off),
    // doc 4 follows the reference order (every bigram seen).
    val d = docs(
      (1L, "the cat sat the cat sat", "en", "s"),
      (2L, "the cat sat the cat sat", "en", "s"),
      (3L, "sat the sat cat the sat", "de", "s"),
      (4L, "the cat sat the cat", "de", "s"))
    val tw = d.select(col("doc_id"), col("lang"),
      split(col("text"), " ").as("w"))
    val bi = tw.select(col("doc_id"), col("lang"), col("w"),
        posexplode(slice(col("w"), lit(1), size(col("w")) - 1)).as(Seq("p", "w1")))
      .select(col("doc_id"), col("lang"), col("w1"),
        element_at(col("w"), col("p") + 2).as("w2"))
    val qb = Curation.bigramLogProbs(
      bi.filter(col("lang") === "en").select(col("w1"), col("w2")))
    val refToks = tw.filter(col("lang") === "en")
      .select(explode(col("w")).as("word"))
    val qu = Curation.unigramLogProbs(refToks, scale = 0.4)
    val nll = Curation.withStats(bi, Curation.oovLogProb(refToks, scale = 0.4))
      .join(qb, Seq("w1", "w2"), "left")
      .join(qu.withColumnRenamed("word", "w2").withColumnRenamed("q", "qu"), Seq("w2"), "left")
      .groupBy("doc_id")
      .agg((-sum(coalesce(col("qb"), col("qu"), col("oovq"))) / count(lit(1))).as("avg"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(nll(4L) < nll(3L))
    // "the cat" is the only successor of "the" → conditional = ln(1) = 0
    val qbMap = qb.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(qbMap(("the", "cat")) === 0L)
  }

  test("unigram LM topV cap bounds the model table; capped words go OOV") {
    val d = docs((1L, "a a a b b c", "en", "s"))
    val toks = d.select(explode(split(col("text"), " ")).as("word"))
    val full = Curation.unigramLogProbs(toks)
    val capped = Curation.unigramLogProbs(toks, topV = Some(2))
    assert(full.count() === 3L && capped.count() === 2L)
    val words = capped.collect().map(_.getString(0)).toSet
    assert(words === Set("a", "b")) // count-desc, word-asc tie break
    // surviving entries score identically to the uncapped model
    val fm = full.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    capped.collect().foreach(r => assert(r.getLong(1) === fm(r.getString(0))))
  }

  test("withStats broadcasts the one-row side (never shuffles the big side)") {
    val d = docs((1L, "a b", "en", "s"))
    val st = d.agg(count(lit(1)).as("n"))
    val out = Curation.withStats(d, st)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(out.count() === 1L)
    assert(out.columns.toSeq === Seq("doc_id", "text", "lang", "source", "n_chars", "n"))
  }

  test("DSIR: target-like doc gets a higher importance weight") {
    // 'en' target slice dominated by "good data" bigrams; the raw
    // corpus adds an off-target doc full of other bigrams.
    val d = docs(
      (1L, "good data good data good data", "en", "s"),
      (2L, "good data good data good data", "en", "s"),
      (3L, "junk text junk text junk text", "de", "s"),
      (4L, "good data good data", "de", "s"), // target-like, not in slice
      (5L, "junk text junk text", "fr", "s")) // off-target
    val bg = d.select(col("doc_id"), col("lang"),
      explode(Curation.bigramBuckets(col("text"), 64)).as("b"))
    val cb = bg.groupBy("b").agg(count(lit(1)).as("cr"),
      count(when(col("lang") === "en", lit(1))).as("ct"))
    val st = cb.agg(sum("cr").cast("long").as("nr"), sum("ct").cast("long").as("nt"))
    val lr = Curation.withStats(cb, st).select(col("b"),
      (log((col("ct") + lit(1.0)) / (col("nt") + lit(64)))
        - log((col("cr") + lit(1.0)) / (col("nr") + lit(64)))).as("q"))
    val w = bg.join(lr, "b").groupBy("doc_id")
      .agg((sum("q") / count(lit(1))).as("avg"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(4L) > w(5L))
  }

  test("incremental dedup flags exact and band-hit dups of the existing corpus only") {
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val existing = docs(
      (1L, base, "en", "old"),
      (2L, "completely different existing content here for the corpus", "en", "old"))
    val incoming = docs(
      (10L, base, "en", "new"),                                   // exact dup of 1
      (11L, base + " extra", "en", "new"),                        // near dup of 1
      (12L, "fresh unrelated novel words entirely unseen before now", "en", "new"))
    val out = Dedup.incrementalDedup(existing, incoming,
        col("doc_id"), col("text"), k = 3, numPerms = 16, bands = 4)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out.keySet === Set(10L, 11L, 12L)) // one row per INCOMING doc only
    assert(out(10L)._1, "exact dup flagged")
    assert(out(11L)._2 && !out(11L)._1, "near dup flagged, not exact")
    assert(out(12L) === ((false, false, true)), "novel doc kept")
  }

  test("incremental dedup: empty existing corpus keeps everything") {
    import graft.operators.Dedup
    val existing = docs()
    val incoming = docs((1L, "some words here for a document", "en", "new"))
    val out = Dedup.incrementalDedup(existing, incoming,
        col("doc_id"), col("text"), k = 3, numPerms = 16, bands = 4)
      .collect()
    assert(out.length === 1 && out(0).getBoolean(3))
  }

  test("gumbel top-k selection is deterministic and weight-biased") {
    // Two weight tiers 2e6 micro-nats apart: the high tier should
    // dominate the selection but the Gumbel noise keeps it a sample,
    // not a cutoff. Same inputs → identical selection on rerun.
    val w = spark.range(400).select(col("id").as("doc_id"),
      when(col("id") < 200, lit(2000000L)).otherwise(lit(0L)).as("w_micro"))
    def pick() = w
      .select(col("doc_id"), Curation.gumbelScore(col("doc_id"), col("w_micro")).as("s"))
      .orderBy(col("s").desc, col("doc_id")).limit(100)
      .collect().map(_.getLong(0)).toSet
    val sel = pick()
    val highShare = sel.count(_ < 200)
    assert(highShare > 80 && highShare <= 100, s"high-tier share $highShare")
    assert(pick() === sel)
  }

  test("quality classifier separates constructed corpora and trains deterministically") {
    import graft.operators.QualityClassifier
    // Reference docs draw bigrams from one phrase family, raw docs
    // from another; a linear model must separate them. Labels are
    // en = reference. Held-out docs (not in training) score by family.
    val ref = (1L to 30L).map(i => (i, "good clean data " * 4 + s"u$i", "en", "s"))
    val raw = (31L to 60L).map(i => (i, "junk noisy text " * 4 + s"u$i", "de", "s"))
    val hold = Seq((101L, "good clean data good clean data", "fr", "s"),
      (102L, "junk noisy text junk noisy text", "fr", "s"))
    val d = docs((ref ++ raw ++ hold): _*)
    val feat = QualityClassifier.features(d, col("lang") === "en", 64)
    // packed features and scoring are zero-shuffle projections
    assert(!feat.queryExecution.executedPlan.toString.contains("Exchange"))
    val w1 = QualityClassifier.train(feat, 64, iters = 6, lr = 0.5)
    val w2 = QualityClassifier.train(feat, 64, iters = 6, lr = 0.5)
    assert(w1.toSeq === w2.toSeq)
    val scored = QualityClassifier.score(feat, w1)
    assert(!scored.queryExecution.executedPlan.toString.contains("Exchange"))
    val scores = scored.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(101L) > 0L, s"held-out reference-like doc: ${scores(101L)}")
    assert(scores(102L) < 0L, s"held-out raw-like doc: ${scores(102L)}")
    val trainAcc = (ref.map(_._1).count(id => scores(id) > 0) +
      raw.map(_._1).count(id => scores(id) < 0)).toDouble / 60
    assert(trainAcc > 0.95, s"training accuracy $trainAcc")
    // scoreExpr (the streaming deployment) agrees with packed scoring
    val byExpr = d.select(col("doc_id"),
        QualityClassifier.scoreExpr(col("text"), w1, 64).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (ref ++ raw ++ hold).map(_._1).foreach(id => assert(byExpr(id) === scores(id)))
  }

  test("quality classifier: driver fast path matches the distributed loop exactly") {
    import graft.operators.QualityClassifier
    val ref = (1L to 25L).map(i => (i, "good clean data " * 3 + s"u$i", "en", "s"))
    val raw = (26L to 50L).map(i => (i, "junk noisy text " * 3 + s"u$i", "de", "s"))
    val feat = QualityClassifier.features(docs((ref ++ raw): _*), col("lang") === "en", 64)
    val fast = QualityClassifier.train(feat, 64, iters = 6, lr = 0.5)
    val dist = QualityClassifier.train(feat, 64, iters = 6, lr = 0.5, driverMaxDocs = 0)
    assert(fast.toSeq === dist.toSeq)
  }

  test("quality classifier: deterministic subsample training still separates") {
    import graft.operators.QualityClassifier
    val ref = (1L to 40L).map(i => (i, "good clean data " * 4 + s"u$i", "en", "s"))
    val raw = (41L to 80L).map(i => (i, "junk noisy text " * 4 + s"u$i", "de", "s"))
    val d = docs((ref ++ raw): _*)
    val feat = QualityClassifier.features(d, col("lang") === "en", 64)
    val w1 = QualityClassifier.train(feat, 64, iters = 6, lr = 0.5, samplePct = 60)
    val w2 = QualityClassifier.train(feat, 64, iters = 6, lr = 0.5, samplePct = 60)
    assert(w1.toSeq === w2.toSeq)
    val scores = QualityClassifier.score(feat, w1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val acc = (ref.map(_._1).count(id => scores(id) > 0) +
      raw.map(_._1).count(id => scores(id) < 0)).toDouble / 80
    assert(acc > 0.9, s"subsample-trained accuracy $acc")
  }

  test("fimSplit: parts partition the document at hash-derived points") {
    def bh(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    def m5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val words = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val d = docs((42L, words.mkString(" "), "en", "s"))
    val r = Curation.fimSplit(d).collect()(0)
    val n = words.length
    val c1 = bh("fim1:42") % (n - 1) + 1
    val c2 = bh("fim2:42") % (n - 1) + 1
    val (p1, p2) = (math.min(c1, c2), math.max(c1, c2))
    assert(r.getLong(2) === p1 && r.getLong(3) === p2)
    assert(r.getString(5) === m5(words.take(p1.toInt).mkString(" ")))
    assert(r.getString(6) === m5(words.slice(p1.toInt, p2.toInt).mkString(" ")))
    assert(r.getString(7) === m5(words.drop(p2.toInt).mkString(" ")))
    // sub-minimal docs are dropped
    assert(Curation.fimSplit(docs((1L, "x y", "en", "s"))).count() === 0)
  }

  test("mixRates: over-represented sources downsample, small ones cap at 100%") {
    val counts = Seq(("big", 900L), ("small", 100L)).toDF("source", "n_docs")
    val rates = Curation.mixRates(counts, budgetPct = 100)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // budget 1000, quota 500/source: big keeps 500/900, small capped
    assert(rates("small") === 10000L)
    assert(rates("big") === 500L * 10000L / 900L)
  }

  test("mixKeep predicate is deterministic and rate-monotone") {
    val ids = spark.range(1000).select(col("id"))
    val k50 = ids.filter(Curation.mixKeep(col("id"), lit(5000L))).count()
    val k100 = ids.filter(Curation.mixKeep(col("id"), lit(10000L))).count()
    assert(k100 === 1000L)
    assert(k50 > 350L && k50 < 650L)
    val again = ids.filter(Curation.mixKeep(col("id"), lit(5000L))).count()
    assert(again === k50)
  }

  test("PosBase packing bound violations fail loudly instead of mis-deduplicating") {
    // an id at 2^63/PosBase would fold into another document's range
    val big = Long.MaxValue / Curation.PosBase
    val d = docs((big, "a b c d e f g h", "en", "s"), (1L, "a b c d x y z w", "en", "s"))
    val e = intercept[Exception](Curation.lineDedup(d, 4).collect())
    assert(e.getMessage != null && e.getMessage.contains("PosBase"))
    val e2 = intercept[Exception](Curation.substrDedup(d, 6).collect())
    assert(e2.getMessage != null && e2.getMessage.contains("PosBase"))
    // in-contract ids are untouched
    assert(Curation.lineDedup(docs((1L, "a b c d e f g h", "en", "s")), 4).count() === 1)
  }

  test("LM count pruning: rare n-grams leave the table, normalizers keep full mass") {
    val bi = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("a", "c")).toDF("w1", "w2")
    assert(Curation.bigramLogProbs(bi).count() === 2)
    val pruned = Curation.bigramLogProbs(bi, minCount = 2).collect()
    assert(pruned.length === 1)
    // The surviving conditional is still ln(3/4): pruning shrinks the
    // broadcastable table, it never re-normalizes the survivors — the
    // pruned (a,c) probe falls to the backoff rung instead.
    assert(pruned(0).getLong(2) === math.floor(math.log(3.0 / 4.0) * 1e6).toLong)
    val tri = Seq(("a", "b", "c"), ("a", "b", "c"), ("a", "b", "d")).toDF("w1", "w2", "w3")
    assert(Curation.trigramLogProbs(tri).count() === 2)
    val tp = Curation.trigramLogProbs(tri, minCount = 2).collect()
    assert(tp.length === 1 &&
      tp(0).getLong(3) === math.floor(math.log(2.0 / 3.0) * 1e6).toLong)
  }

  test("modelJoin shuffle regime: q_lm_bigram plans a join past the threshold, same rows") {
    val dir = "/root/testdata/sf0.001"
    val gate = graft.queries.CurationQueries.qLmBigram
    val base = gate.run(spark, dir).collect().toSeq
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key, "10MB")
    try {
      spark.conf.set(key, "-1")
      val df = gate.run(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "past the threshold the model tables must shuffle-join, not broadcast")
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(df.collect().toSeq === base)
    } finally spark.conf.set(key, prev)
  }

  test("native weightSum margin matches the HOF reference") {
    import graft.operators.QualityClassifier
    val w: Array[Long] = Array(5L, -3L, 1000000L, 0L, -999L)
    val rows = Seq(Seq(0L, 1L, 2L), Seq(4L, 4L, 4L), Seq.empty[Long], Seq(3L))
      .toDF("bs")
    val native = rows.select(QualityClassifier.marginExpr(col("bs"), w))
      .collect().map(_.getLong(0)).toSeq
    val hof = rows.select(QualityClassifier.marginExprHof(col("bs"), w))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
    assert(native == Seq(1000002L, -2997L, 0L, 0L))
  }

  test("Kneser-Ney tables: interpolated probability mass sums to 1 per seen predecessor") {
    val bi = Seq(
      ("the", "cat"), ("the", "cat"), ("the", "dog"), ("a", "cat"),
      ("a", "bird"), ("dog", "ran"), ("cat", "ran"), ("the", "end")
    ).toDF("w1", "w2")
    val (kb, kw, kc, kt) = Curation.knBigramTables(bi)
    val cMap = kb.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val wMap = kw.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val contMap = kc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n1pp = kt.collect()(0).getLong(0)
    assert(n1pp == cMap.size.toLong)
    // continuation distribution itself is a distribution
    assert(contMap.values.sum == n1pp)
    val vocab = contMap.keySet
    for ((w1, (cw1, n1p)) <- wMap) {
      val mass = vocab.toSeq.map { w2 =>
        val c = cMap.getOrElse((w1, w2), 0L)
        (math.max(c - 0.75, 0.0) + 0.75 * n1p * (contMap(w2).toDouble / n1pp)) / cw1
      }.sum
      assert(math.abs(mass - 1.0) < 1e-12, s"mass for '$w1' = $mass")
    }
    // minCount prunes ONLY the per-bigram table; normalizers keep full mass
    val (kbP, kwP, _, _) = Curation.knBigramTables(bi, minCount = 2)
    assert(kbP.count() == 1) // only ("the","cat") has c >= 2
    assert(kwP.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == 
      wMap.view.mapValues(_._1).toMap)
  }
}
