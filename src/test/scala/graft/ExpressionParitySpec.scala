package graft

import org.apache.spark.sql.functions._
import graft.expressions.{TextExpressions, VectorExpressions}
import graft.operators.{TextOps, VectorOps}

/** The native Catalyst expressions must be VALUE-IDENTICAL to their
  * higher-order-function reference formulations — that identity is
  * what keeps the DuckDB oracle green after swapping them into the
  * query plans. Checked over the real sf0.001 tables plus synthetic
  * edge cases.
  */
class ExpressionParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("SimHash32Expr == HOF simhash on real documents") {
    val diff = docs.select(
        TextExpressions.simHash32(col("text")).as("a"),
        TextOps.simHashFromHashes(TextOps.tokenHashes(col("text"))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("FingerprintExpr == HOF fingerprint on real documents") {
    val diff = docs.select(
        TextExpressions.fingerprint(col("text")).as("a"),
        TextOps.fingerprint(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("MinHashSigExpr == explode+min over portable shingles") {
    // reference: min over TextOps.permHash(i, shingle-key) per doc
    val sh = docs.select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("h"))
    val ref = sh.groupBy("doc_id")
      .agg((0 until 16).map(i => min(TextOps.permHash(i, col("h"))).as(s"s$i")).head,
        (0 until 16).map(i => min(TextOps.permHash(i, col("h"))).as(s"s$i")).tail: _*)
      .select(col("doc_id"), array((0 until 16).map(i => col(s"s$i")): _*).as("sig"))
    val fast = docs.select(col("doc_id"),
      TextExpressions.minHashSig(col("text"), 3, 16).as("sig"))
    val joined = ref.join(fast.withColumnRenamed("sig", "sig2"), "doc_id")
    assert(joined.filter(not(col("sig") === col("sig2"))).count() == 0)
    assert(ref.count() == fast.count())
  }

  test("RepetitionStatsExpr == explode+count aggregate chain, incl. edge docs") {
    val edge = Seq("one", "a a a", "x y x y x", "").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id() + lit(1000000L))
    val rel = docs.select(col("doc_id"), col("text")).unionByName(edge)
    val w = TextOps.tokens(col("text"))
    val words = rel.select(col("doc_id"), explode(w).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_word_n"), sum(col("c")).as("n_words"))
    val bigrams = rel.select(col("doc_id"),
        explode(zip_with(
          slice(w, lit(1), size(w) - 1),
          slice(w, lit(2), size(w) - 1),
          (a, b) => concat_ws(" ", a, b))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top2_n"), sum(col("c")).as("n_bigrams"))
    val ref = words.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"), col("top_word_n"), col("n_words"),
        coalesce(col("top2_n"), lit(0L)).as("top2_n"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
    val fast = rel.select(col("doc_id"),
        TextExpressions.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.top_word_n"), col("r.n_words"),
        col("r.top2_n"), col("r.n_bigrams"))
    assert(ref.count() == fast.count())
    assert(ref.exceptAll(fast).count() == 0 && fast.exceptAll(ref).count() == 0)
  }

  test("ShingleKeysFastExpr matches HOF distinct count and set") {
    val cmp = docs.select(
        TextExpressions.shingleKeysFast(col("text"), 3).as("a"),
        TextOps.shinglesFast(col("text"), 3).as("b"))
      .select(size(col("a")).as("na"), size(col("b")).as("nb"),
        size(array_except(col("a"), col("b"))).as("extra"))
    assert(cmp.filter(col("na") =!= col("nb") || col("extra") =!= 0).count() == 0)
  }

  test("QuantizeVec/NormQ/DotQ expressions == HOF vector math") {
    val both = embs.select(
        VectorExpressions.quantizeVec(col("embedding")).as("qe"),
        VectorOps.quantize(col("embedding")).as("qh"))
    assert(both.filter(not(col("qe") === col("qh"))).count() == 0)
    val norms = both.select(
      VectorExpressions.normQ(col("qe")).as("ne"),
      VectorOps.normQ(col("qh")).as("nh"),
      VectorExpressions.dotQ(col("qe"), col("qh")).as("de"),
      VectorOps.dotQ(col("qe"), col("qh")).as("dh"))
    assert(norms.filter(col("ne") =!= col("nh") || col("de") =!= col("dh")).count() == 0)
  }

  test("LshBucketsExpr == per-table HOF lshBucket") {
    val q = embs.select(VectorExpressions.quantizeVec(col("embedding")).as("q"))
    val cmp = q.select(
      VectorExpressions.lshBuckets(col("q"), 4, 4, 64).as("be"),
      array((0 until 4).map(t => VectorOps.lshBucket(col("q"), t, 4, 64)): _*).as("bh"))
    assert(cmp.filter(not(col("be") === col("bh"))).count() == 0)
  }

  test("DocPairsExpr == HOF sorted pair expansion") {
    val ds = Seq(
      Seq((7L, 3L), (2L, 5L), (9L, 1L)),
      Seq((4L, 2L), (1L, 8L)),
      Seq((5L, 5L))
    ).toDF("ds")
    val sorted = array_sort(col("ds"))
    val hof = flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), y =>
        struct(
          ((x.getField("_1") * lit(1L << 32)) + y.getField("_1")).as("pr"),
          x.getField("_2").as("ma"), y.getField("_2").as("mb")))))
    val rows = ds.select(
        TextExpressions.docPairs(col("ds")).as("a"), hof.as("b"))
      .collect()
    rows.foreach(r => assert(r.get(0) == r.get(1)))
  }

  test("DocPairsExpr rejects ids outside the packable range") {
    val bad = Seq(Seq(((1L << 31), 1L), (1L, 1L))).toDF("ds")
    val e = intercept[Exception] {
      bad.select(TextExpressions.docPairs(col("ds"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("NearestCellsExpr orders cells by exact distance, ties by id") {
    val cents = Array(Array(0L, 0L), Array(10L, 0L), Array(0L, 10L))
    val v = Seq(Seq(1L, 1L)).toDF("q")
    val cells = v.select(VectorExpressions.nearestCells(col("q"), cents, 3))
      .head.getSeq[Long](0)
    // distances (dropping ‖x‖²): c0: 0-0=0... full: |v-c0|²=2, |v-c1|²=82, |v-c2|²=82 → ties on 1,2 by id
    assert(cells == Seq(0L, 1L, 2L))
  }

  test("BigramBucketsExpr == HOF bigram buckets on real documents and edges") {
    import graft.operators.Curation
    val diff = docs.select(
        TextExpressions.bigramBuckets(col("text"), 256).as("a"),
        Curation.bigramBucketsOfWords(split(col("text"), " "), 256).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
    // edges: empty string, single word, trailing space (empty token)
    val edges = Seq("", "one", "a b", "a b ", " a").toDF("text")
    val ediff = edges.select(
        TextExpressions.bigramBuckets(col("text"), 64).as("a"),
        Curation.bigramBucketsOfWords(split(col("text"), " "), 64).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(ediff == 0)
  }

  test("WindowKeysExpr == HOF window keys on real documents and edges") {
    import graft.operators.Curation
    val diff = docs.select(
        TextExpressions.windowKeys(col("text"), 6).as("a"),
        Curation.windowKeysOfWords(split(col("text"), " "), 6).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
    val edges = Seq("", "a b c d e", "a b c d e f", "a b c d e f g", "x x x x x x x x")
      .toDF("text")
    val ediff = edges.select(
        TextExpressions.windowKeys(col("text"), 6).as("a"),
        Curation.windowKeysOfWords(split(col("text"), " "), 6).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(ediff == 0)
  }

  test("edge cases: short docs yield empty shingle/sig arrays") {
    val df = Seq("one two", "a b c").toDF("text")
    val out = df.select(
      size(TextExpressions.minHashSig(col("text"), 3, 16)).as("ns"),
      size(TextExpressions.shingleKeysFast(col("text"), 3)).as("nf")).collect()
    assert(out(0).getInt(0) == 0 && out(0).getInt(1) == 0)
    assert(out(1).getInt(0) == 16 && out(1).getInt(1) == 1)
  }

  test("MkPairStatsExpr == brute-force pair counts, incl. ties and edges") {
    import graft.expressions.SeriesExpressions
    def brute(xs: Seq[Long]): Seq[Long] = {
      val pairs = for (i <- xs.indices; j <- i + 1 until xs.length) yield (xs(i), xs(j))
      Seq(pairs.length.toLong,
        pairs.count { case (a, b) => b > a }.toLong,
        pairs.count { case (a, b) => b < a }.toLong)
    }
    val rng = new scala.util.Random(42)
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty[Long], Seq(7L), Seq(1L, 1L), Seq(3L, 2L, 1L), Seq(1L, 2L, 3L),
      Seq(5L, 5L, 5L, 5L), Seq(2L, 1L, 2L, 1L, 2L)) ++
      (1 to 20).map(n => Seq.fill(n * 7)(rng.nextInt(10).toLong))
    val df = cases.zipWithIndex.map { case (xs, i) => (i.toLong, xs) }.toDF("id", "xs")
    val got = df.select(col("id"), SeriesExpressions.mkPairStats(col("xs")).as("mk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.zipWithIndex.foreach { case (xs, i) =>
      assert(got(i.toLong) == brute(xs), s"case $i: $xs")
    }
  }
}
