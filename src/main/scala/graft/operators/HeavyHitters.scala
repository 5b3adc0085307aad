package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
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
  *    emits at most `s` candidate terms. Any term a partition never
  *    surfaces has partition count ≤ N_p/(s+1), so summing over
  *    partitions: a term in NO sketch has global count ≤ N/(s+1) —
  *    the union of sketches is a SUPERSET of every term with
  *    frequency above N/(s+1).
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

  /** Deterministic Misra–Gries pass over one partition's terms:
    * at most `s` counters; a new term evicts by decrementing ALL
    * counters (dropping zeros). Emitted counts are lower bounds;
    * only the term SET is used downstream.
    */
  private[graft] def misraGries(it: Iterator[String], s: Int): Iterator[(String, Long)] = {
    val counters = new java.util.HashMap[String, Long](s * 2)
    while (it.hasNext) {
      val t = it.next()
      val c = counters.get(t)
      if (c != 0L || counters.containsKey(t)) counters.put(t, c + 1L)
      else if (counters.size < s) counters.put(t, 1L)
      else {
        // decrement-all; remove exhausted counters
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val en = e.next()
          if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.entrySet().iterator().asScala.map(en => (en.getKey, en.getValue))
  }

  /** Exact top-k terms of a single-column (`term`) relation.
    * @param sketchSize counters per partition (the N/(s+1) error knob)
    * @return (term, cnt, rnk), rnk 1..k by count desc, term asc
    */
  def topKTerms(terms: DataFrame, k: Int, sketchSize: Int = 4096): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val termDs = terms.select(col("term").cast("string")).as[String]
    val cand = termDs
      .mapPartitions(it => misraGries(it, sketchSize))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("term", "_lb")
      .select(col("term")).distinct()
    val recount = terms.join(broadcast(cand), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val top = recount.orderBy(col("cnt").desc, col("term")).limit(k).collect()
    val n = terms.count()
    // Certificate: with k certified candidates whose k-th count beats
    // the N/(s+1) bound, no non-candidate can displace any of them.
    // Anything else (including fewer than k surviving candidates —
    // the corpus may still hold ≥ k distinct non-candidate terms)
    // falls back to the exact aggregate.
    val certified = top.length == k &&
      top.last.getLong(1) * (sketchSize + 1L) > n
    val rows =
      if (certified) top
      else {
        // certificate failed: kth ≤ N/(s+1) — a non-candidate could
        // tie in. Fall back to the exact full aggregate (the shape we
        // were avoiding, paid only when the data defeats the sketch).
        terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term")).limit(k).collect()
      }
    rows.zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), (i + 1).toLong) }
      .toSeq.toDF("term", "cnt", "rnk")
  }

  /** Word n-gram terms of a document relation — the standard input to
    * [[topKTerms]]. Tokens split on single spaces (oracle-portable).
    */
  def ngramTerms(docs: DataFrame, text: org.apache.spark.sql.Column, n: Int): DataFrame = {
    val w = split(text, " ")
    val terms =
      if (n == 1) explode(w)
      else explode(when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
        .otherwise(array().cast("array<string>")))
    docs.select(terms.as("term"))
  }
}
