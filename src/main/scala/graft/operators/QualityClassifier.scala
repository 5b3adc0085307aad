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
  * trained by full-batch gradient descent with the weight vector on
  * the driver (same model-on-driver shape as [[IvfIndex]]: B doubles
  * is model state, not data).
  *
  * Determinism: distributed float sums depend on reduction order, so
  * every aggregated quantity is quantized to micro-unit integers
  * FIRST — margins are exact integer sums of micro-quantized weights,
  * per-doc residuals are micro-quantized before the gradient sum, and
  * the weight update itself is driver arithmetic. Training is
  * bit-reproducible under any partitioning, like everything else in
  * this library.
  *
  * Scale: per iteration one broadcast of the B-weight table, one
  * doc-keyed shuffle to attach residuals, one bucket-keyed gradient
  * aggregation (map-side combined). The feature relation is cached
  * across iterations. Iterations are few (logistic GD on bag
  * features converges in tens of steps); this is the CC-loop cost
  * profile, not a per-row iteration.
  */
object QualityClassifier {

  /** Micro-quantized logistic weights, index = feature bucket. */
  type Weights = Array[Long]

  /** Feature relation: one row per bigram instance,
    * (doc_id, label, b) with label 1 = reference slice. */
  def features(docs: DataFrame, isRef: Column, buckets: Int): DataFrame =
    docs
      .select(col("doc_id"), isRef.cast("int").as("label"),
        explode(graft.expressions.TextExpressions.bigramBuckets(col("text"), buckets)).as("b"))

  /** Full-batch logistic GD. `feat` should be cached by the caller if
    * it is expensive to recompute. Returns micro-quantized weights.
    */
  def train(feat: DataFrame, buckets: Int, iters: Int, lr: Double): Weights = {
    val spark = feat.sparkSession
    import spark.implicits._
    val nDocs = feat.select(col("doc_id")).distinct().count()
    val w: Weights = Array.fill(buckets)(0L)
    var it = 0
    while (it < iters) {
      val wDf = w.zipWithIndex
        .map { case (wq, b) => (b.toLong, wq) }.toSeq.toDF("b", "wq")
      // Margin = exact integer sum of micro-weights; residual
      // micro-quantized per doc BEFORE the gradient sum.
      val resid = feat.join(broadcast(wDf), "b")
        .groupBy(col("doc_id"), col("label"))
        .agg(sum(col("wq")).as("m_micro"))
        .select(col("doc_id"),
          floor((lit(1.0) / (lit(1.0) + exp(-col("m_micro") / lit(1e6)))
            - col("label")) * lit(1000000)).cast("long").as("r_micro"))
      val grad = feat.join(resid, "doc_id")
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
    aggregate(
      graft.expressions.TextExpressions.bigramBuckets(text, buckets),
      lit(0L),
      (acc, b) => acc + element_at(lit(w), b.cast("int") + 1))
  }

  /** Score every doc with a trained model: the margin in micro-units
    * (positive = reference-like). Zero shuffle beyond one groupBy:
    * the model rides along as a broadcast table.
    */
  def score(feat: DataFrame, w: Weights): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    val wDf = w.zipWithIndex
      .map { case (wq, b) => (b.toLong, wq) }.toSeq.toDF("b", "wq")
    feat.join(broadcast(wDf), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"), sum(col("wq")).as("score_micro"))
  }
}
