package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Discriminative quality filtering, the GPT-3 / LLaMA playbook step
  * (Brown et al. 2020 Appendix A; Touvron et al. 2023): train a
  * linear classifier to separate a trusted reference slice from the
  * raw corpus, then keep documents the classifier scores as
  * reference-like. The classic implementation is a fastText-style
  * linear model over hashed n-gram bag features — here logistic
  * regression over [[Curation.bigramBucketsOfWords]] features,
  * trained by gradient descent with the weight vector on the driver
  * (same model-on-driver shape as [[IvfIndex]]: B doubles is model
  * state, not data).
  *
  * Determinism: distributed float sums depend on reduction order, so
  * every aggregated quantity is quantized to micro-unit integers
  * FIRST — margins are exact integer sums of micro-quantized weights,
  * per-doc residuals are micro-quantized before the gradient sum, and
  * the weight update itself is driver arithmetic. Training is
  * bit-reproducible under any partitioning, like everything else in
  * this library.
  *
  * Scale: features are PACKED per document once ([[features]] — a
  * zero-shuffle projection), and each training iteration inlines the
  * current weights as a literal array into a per-row margin/residual
  * expression, then aggregates the gradient by bucket. The per-bucket
  * hash aggregate map-side-combines to at most B rows per task, so an
  * iteration moves O(B · tasks) bytes — the treeAggregate cost
  * profile, with NO per-iteration shuffle of any corpus-sized
  * relation (the round-5 shape joined the exploded feature relation
  * twice per iteration). The playbook also trains on a SAMPLE of the
  * corpus, not all of it — `samplePct` is the deterministic
  * ([[Sampling]]) subsample knob; scoring the full corpus stays a
  * zero-join projection either way.
  */
object QualityClassifier {

  /** Micro-quantized logistic weights, index = feature bucket. */
  type Weights = Array[Long]

  /** Packed feature relation: ONE row per document,
    * (doc_id, label, bs) with label 1 = reference slice and bs the
    * hashed-bigram bucket ids (one per bigram instance). Documents
    * with no features (< 2 tokens) drop out, exactly as they did from
    * the exploded relation. Zero shuffle — a projection of `docs`.
    */
  def features(docs: DataFrame, isRef: Column, buckets: Int): DataFrame =
    docs
      .select(col("doc_id"), isRef.cast("int").as("label"),
        graft.expressions.TextExpressions.bigramBuckets(col("text"), buckets).as("bs"))
      .filter(size(col("bs")) > 0)

  /** Integer margin of a packed feature row under literal weights —
    * the same exact sum the broadcast join produced, as a zero-join
    * per-row expression. Shared with [[LangClassifier]]. */
  /** Σ w[b] margin — native tight loop; [[marginExprHof]] is the
    * parity-tested reference formulation. */
  private[graft] def marginExpr(bs: Column, w: Weights): Column =
    graft.expressions.TextExpressions.weightSum(bs, w)

  /** Interpreted HOF reference of [[marginExpr]]. */
  private[graft] def marginExprHof(bs: Column, w: Weights): Column =
    aggregate(bs, lit(0L), (acc, b) => acc + element_at(lit(w), b.cast("int") + 1))

  /** Micro-quantized logistic residual sigmoid(m) − label. */
  private[operators] def residExpr(bs: Column, label: Column, w: Weights): Column =
    floor((lit(1.0) / (lit(1.0) + exp(-marginExpr(bs, w) / lit(1e6)))
      - label) * lit(1000000)).cast("long")

  /** Logistic GD over the packed feature relation (cache it if it is
    * expensive to recompute). `samplePct` < 100 trains on a
    * deterministic hash subsample of the documents (the playbook
    * move for corpora where even one pass per iteration is too much);
    * scoring is unaffected. Returns micro-quantized weights —
    * bit-identical across partitionings and reruns.
    */
  def train(packed: DataFrame, buckets: Int, iters: Int, lr: Double,
            samplePct: Int = 100): Weights = {
    val rel =
      if (samplePct >= 100) packed
      else packed.filter(Sampling.samplePredicate(col("doc_id"), samplePct, "qctrain"))
    val nDocs = rel.count()
    val w: Weights = Array.fill(buckets)(0L)
    var it = 0
    while (it < iters) {
      // Residual once per doc (weights inlined as a literal), then the
      // bucket-keyed gradient aggregate: partial aggregation bounds the
      // shuffle at B rows per task — no corpus-sized exchange.
      val grad = rel
        .select(col("bs"), residExpr(col("bs"), col("label"), w).as("r_micro"))
        .select(explode(col("bs")).as("b"), col("r_micro"))
        .groupBy(col("b")).agg(sum(col("r_micro")).as("g_micro"))
        .collect()
      grad.foreach { r =>
        val b = r.getLong(0).toInt
        val g = r.getLong(1) / 1e6 / nDocs
        w(b) = w(b) - math.round(lr * g * 1e6)
      }
      it += 1
    }
    w
  }

  /** The trained model as a PURE COLUMN EXPRESSION: margin in
    * micro-units of a text column, the weight vector inlined as an
    * array literal and summed with the `aggregate` higher-order
    * function. Zero join, zero shuffle, zero state — usable
    * identically in batch selects and Structured Streaming
    * micro-batches (stateless map), the deployment shape of a
    * trained quality filter. Bounded B keeps the literal small
    * (16 KiB at B = 2048).
    */
  def scoreExpr(text: Column, w: Weights, buckets: Int): Column = {
    require(w.length == buckets, s"weights ${w.length} != buckets $buckets")
    graft.expressions.TextExpressions.weightSum(
      graft.expressions.TextExpressions.bigramBuckets(text, buckets), w)
  }

  /** Score every packed doc with a trained model: the margin in
    * micro-units (positive = reference-like). Zero join, zero
    * shuffle — a projection with the weights inlined.
    */
  def score(packed: DataFrame, w: Weights): DataFrame =
    packed.select(col("doc_id"),
      size(col("bs")).cast("long").as("n_feat"),
      marginExpr(col("bs"), w).as("score_micro"))
}
