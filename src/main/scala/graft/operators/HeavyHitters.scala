package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact corpus-wide top-k heavy hitters (frequent n-grams/terms) via
  * the two-pass Misra–Gries shape (Misra & Gries 1982; merge bound
  * from Agarwal et al. 2013, "Mergeable Summaries") — the corpus
  * analysis every curation run wants ("what are the most repeated
  * phrases?") at a cost that survives 100 TB.
  *
  * Why not `groupBy(term).count().orderBy(...)`: that shuffles the
  * ENTIRE exploded term relation — at 100 TB of text, trillions of
  * rows keyed by term, the single most expensive shuffle one can
  * write. Here instead:
  *
  *  - Pass 1 (zero shuffle): each partition streams its terms through
  *    a size-`s` Misra–Gries sketch — O(s) memory, no sort — and
  *    emits at most `s` candidate terms plus ONE sentinel row
  *    carrying the partition's term count (so the global N needs no
  *    extra pass). Any term a partition never surfaces has partition
  *    count ≤ N_p/(s+1); summing over partitions, a term in NO sketch
  *    has global count ≤ N/(s+1) — the union of sketches is a
  *    SUPERSET of every term above that bound. The n-gram form
  *    generates terms in-JVM per document, so pass 1 never
  *    materializes the exploded term relation at all.
  *  - Pass 2: the candidate set (≤ partitions·s rows) broadcasts;
  *    the corpus side hash-semi-joins it map-side, and only matching
  *    terms — a vanishing fraction — reach the exact recount
  *    aggregate, map-side combined onto ≤ |candidates| keys.
  *
  * The result is PROVABLY the exact top-k whenever the k-th recounted
  * frequency exceeds N/(s+1) (no non-candidate can beat it). The
  * operator CHECKS that certificate and, if the data defeats the
  * sketch (pathologically flat frequencies), falls back to the exact
  * full aggregate — correctness never depends on the sketch, only
  * the shuffle size does. Candidate sets vary with partition layout;
  * the certified output does not: rows+hash-deterministic on any
  * cluster.
  */
object HeavyHitters {

  /** Deterministic Misra–Gries sketch: at most `s` counters; a new
    * term evicts by decrementing ALL counters (dropping zeros —
    * amortized O(1) per insert). Counts are lower bounds; only the
    * term SET is used downstream.
    */
  private[graft] final class MgSketch(s: Int) {
    private val counters = new java.util.HashMap[String, Array[Long]](s * 2)
    var n = 0L
    def add(t: String): Unit = {
      n += 1
      val c = counters.get(t)
      if (c != null) c(0) += 1L
      else if (counters.size < s) counters.put(t, Array(1L))
      else {
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val en = e.next()
          if (en.getValue()(0) == 1L) e.remove() else en.getValue()(0) -= 1L
        }
      }
    }
    /** Candidate rows plus the (null, n) sentinel. */
    def emit(): Iterator[(String, Long)] = snapshot() ++ Iterator.single((null: String, n))

    /** Candidate rows only — the streaming state snapshot. */
    def snapshot(): Iterator[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      counters.entrySet().iterator().asScala.map(en => (en.getKey, en.getValue()(0)))
    }

    /** Restore a counter verbatim (streaming state rehydration). */
    def load(t: String, c: Long): Unit = {
      require(counters.size < s || counters.containsKey(t), "load past capacity")
      counters.put(t, Array(c))
    }
  }

  private[graft] def misraGries(it: Iterator[String], s: Int): Iterator[(String, Long)] = {
    val mg = new MgSketch(s)
    it.foreach(mg.add)
    mg.emit()
  }

  private val SketchEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)

  /** Shared pass 2 + certificate over a sketch relation
    * (term, lower-bound | null-sentinel, N_p).
    */
  private def finish(terms: DataFrame, sketch: DataFrame, k: Int,
                     sketchSize: Int): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    sketch.persist()
    try {
      val n = sketch.filter(col("term").isNull)
        .agg(sum(col("_lb"))).collect()(0).getLong(0)
      val cand = sketch.filter(col("term").isNotNull).select(col("term")).distinct()
      val recount = terms.join(broadcast(cand), Seq("term"), "left_semi")
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val top = recount.orderBy(col("cnt").desc, col("term")).limit(k).collect()
      // Certificate: with k certified candidates whose k-th count beats
      // the N/(s+1) bound, no non-candidate can displace any of them.
      // Anything else (including fewer than k surviving candidates —
      // the corpus may still hold ≥ k distinct non-candidate terms)
      // falls back to the exact aggregate.
      val certified = top.length == k &&
        top.last.getLong(1) * (sketchSize + 1L) > n
      val rows =
        if (certified) top
        else terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term")).limit(k).collect()
      rows.zipWithIndex
        .map { case (r, i) => (r.getString(0), r.getLong(1), (i + 1).toLong) }
        .toSeq.toDF("term", "cnt", "rnk")
    } finally sketch.unpersist()
  }

  /** Exact top-k terms of a single-column (`term`) relation.
    * @param sketchSize counters per partition (the N/(s+1) error knob)
    * @return (term, cnt, rnk), rnk 1..k by count desc, term asc
    */
  def topKTerms(terms: DataFrame, k: Int, sketchSize: Int = 4096): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val sketch = terms.select(col("term").cast("string")).as[String]
      .mapPartitions(it => misraGries(it, sketchSize))(SketchEnc)
      .toDF("term", "_lb")
    finish(terms, sketch, k, sketchSize)
  }

  /** Exact top-k word n-grams of a document relation. Pass 1 streams
    * each doc's token array and forms n-grams inside the sketch loop
    * — the exploded (term) relation is never materialized for the
    * sketch; only the recount (and rare fallback) explode, post
    * candidate-filter. The split token arrays are cached for the
    * query's lifetime so the sketch and recount passes parse the
    * corpus once (harness frees the blocks post-action).
    */
  def topKNgrams(docs: DataFrame, text: Column, n: Int, k: Int,
                 sketchSize: Int = 4096): DataFrame =
    topKNgramsOfWords(docs.select(split(text, " ").as("_w")).persist(),
      n, k, sketchSize)

  /** [[topKNgrams]] over a pre-split (and ideally cached) `_w`
    * token-array relation — lets callers share the split across
    * further passes (see [[pmiTopBigrams]]).
    */
  private[graft] def topKNgramsOfWords(base: DataFrame, n: Int, k: Int,
                                       sketchSize: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val sketch = base.select(col("_w")).as[Seq[String]]
      .mapPartitions { it =>
        val mg = new MgSketch(sketchSize)
        it.foreach { w =>
          var i = 0
          val lim = w.length - (n - 1)
          while (i < lim) {
            val sb = new java.lang.StringBuilder(w(i))
            var j = 1
            while (j < n) { sb.append(' ').append(w(i + j)); j += 1 }
            mg.add(sb.toString)
            i += 1
          }
        }
        mg.emit()
      }(SketchEnc)
      .toDF("term", "_lb")
    finish(ngramTermsOfWords(base, n), sketch, k, sketchSize)
  }

  /** Collocation extraction: pointwise mutual information of the
    * top-k bigrams (Church & Hanks 1990) — "which word pairs co-occur
    * far above chance", the corpus-analysis companion of raw heavy
    * hitters (a stop-bigram like "of the" tops the count list but
    * scores near-zero PMI; a collocation like "Hong Kong" does the
    * reverse).
    *
    * PMI(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) ), micro-quantized.
    * Scale shape: the bigram list is [[topKNgrams]]'s certified exact
    * top-k (bounded-memory sketch + recount — never a corpus-wide
    * bigram shuffle); unigram counts aggregate ONLY the ≤ 2k words of
    * those bigrams (broadcast semi-join prefilter); corpus totals are
    * one expression aggregate over the un-exploded doc relation. Both
    * model joins broadcast ≤ 2k rows.
    */
  def pmiTopBigrams(docs: DataFrame, text: Column, k: Int,
                    sketchSize: Int = 4096): DataFrame = {
    // One parse: the bigram sketch, the recount, the unigram counts
    // and the corpus totals all read this cached split relation. The
    // persist is ALSO the materialization barrier that binds `_w`:
    // without it CollapseProject inlines the split into every
    // element_at of the n-gram transform — O(len²) re-splitting per
    // document (measured 4× slower than the cache round-trip).
    val base = docs.select(split(text, " ").as("_w")).persist()
    val top = topKNgramsOfWords(base, n = 2, k = k, sketchSize = sketchSize)
      .select(col("term"), col("cnt"), col("rnk"),
        element_at(split(col("term"), " "), 1).as("_w1"),
        element_at(split(col("term"), " "), 2).as("_w2"))
    val words = top.select(col("_w1").as("word"))
      .union(top.select(col("_w2").as("word"))).distinct()
    val uni = ngramTermsOfWords(base, 1)
      .join(broadcast(words.select(col("word").as("term"))), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val st = base.agg(
      sum(size(col("_w"))).cast("long").as("nn"),
      sum(greatest(size(col("_w")) - 1, lit(0))).cast("long").as("mm"))
    // association mirrored term-for-term by the q_pmi oracle SQL
    val pmi = floor(log((col("cnt").cast("double") * col("nn") * col("nn"))
      / (col("mm").cast("double") * col("c1") * col("c2"))) * lit(1000000)).cast("long")
    graft.operators.Curation.withStats(
        top
          .join(broadcast(uni.select(col("term").as("_w1"), col("c").as("c1"))), Seq("_w1"))
          .join(broadcast(uni.select(col("term").as("_w2"), col("c").as("c2"))), Seq("_w2")),
        st)
      .select(col("term"), col("cnt"), col("rnk"), pmi.as("pmi_micro"))
  }

  /** Exact top-k over an already-aggregated (term, cnt) count
    * relation — the materialized-count-table twin of [[topKTerms]]:
    * production keeps its n-gram count tables next to the corpus
    * (the LM-family snapshot architecture), and against such a table
    * the top-k is one TakeOrdered over vocab-bounded rows — no
    * corpus pass, no sketch. The sketch paths above remain the
    * no-count-table / streaming shape. Identical output to the
    * sketch+recount (both are the exact top-k): (term, cnt, rnk),
    * rnk 1..k by (cnt desc, term).
    */
  def topKFromCounts(counts: DataFrame, k: Int): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.select(col("term").cast("string").as("term"),
        col("cnt").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), (i + 1).toLong) }
      .toSeq.toDF("term", "cnt", "rnk")
  }

  /** [[pmiTopBigrams]] over materialized count snapshots: `bigrams`
    * = (w1, w2, c) bigram counts, `unigrams` = (word, c, n) unigram
    * counts with the total-token normalizer n = Σc attached. The
    * corpus totals the in-corpus path aggregates per call are exact
    * snapshot aggregates here: nn = n, mm = Σ bigrams.c (every doc
    * with ≥ 1 token contributes len tokens and max(len−1, 0) bigram
    * instances — the same sums). The association column is the same
    * expression over the same integers, so rows are identical.
    */
  def pmiTopBigramsFromCounts(bigrams: DataFrame, unigrams: DataFrame,
                              k: Int): DataFrame = {
    val spark = bigrams.sparkSession
    import spark.implicits._
    val topRows = bigrams
      .select(concat_ws(" ", col("w1"), col("w2")).as("term"),
        col("c").cast("long").as("cnt"), col("w1"), col("w2"))
      .orderBy(col("cnt").desc, col("term")).limit(k).collect()
    val top = topRows.zipWithIndex
      .map { case (r, i) =>
        (r.getString(0), r.getLong(1), (i + 1).toLong, r.getString(2), r.getString(3))
      }
      .toSeq.toDF("term", "cnt", "rnk", "_w1", "_w2")
    val words = topRows.flatMap(r => Seq(r.getString(2), r.getString(3))).distinct.toSeq
    val uni = unigrams.filter(col("word").isin(words: _*))
      .select(col("word"), col("c").cast("long").as("c"))
    val st = unigrams.agg(max(col("n")).cast("long").as("nn"))
      .join(bigrams.agg(sum(col("c")).cast("long").as("mm")))
    // association mirrored term-for-term by the q_pmi oracle SQL
    val pmi = floor(log((col("cnt").cast("double") * col("nn") * col("nn"))
      / (col("mm").cast("double") * col("c1") * col("c2"))) * lit(1000000)).cast("long")
    graft.operators.Curation.withStats(
        top
          .join(broadcast(uni.select(col("word").as("_w1"), col("c").as("c1"))), Seq("_w1"))
          .join(broadcast(uni.select(col("word").as("_w2"), col("c").as("c2"))), Seq("_w2")),
        st)
      .select(col("term"), col("cnt"), col("rnk"), pmi.as("pmi_micro"))
  }

  /** Word n-gram terms of a document relation — the recount-side
    * exploded form. Tokens split on single spaces (oracle-portable).
    * The split array is materialized in its own projection first:
    * higher-order expressions (`transform`) evaluate interpreted, and
    * an inline `split(text)` child would be RE-EVALUATED by every
    * `element_at` call — O(len²) work per document (measured ~8×
    * slower). Against the bound attribute each lookup is O(1).
    */
  def ngramTerms(docs: DataFrame, text: Column, n: Int): DataFrame =
    ngramTermsOfWords(docs.select(split(text, " ").as("_w")), n)

  /** [[ngramTerms]] over a pre-split `_w` relation. */
  private[graft] def ngramTermsOfWords(base: DataFrame, n: Int): DataFrame = {
    val w = col("_w")
    val terms =
      if (n == 1) explode(w)
      else explode(when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
        .otherwise(array().cast("array<string>")))
    base.select(terms.as("term"))
  }
}
