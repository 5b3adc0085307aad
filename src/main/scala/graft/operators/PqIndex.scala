package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.{PqExpressions, VectorExpressions}

/** Product-quantization ANN (Jégou et al. 2011; the FAISS
  * IndexPQ / IndexIVFPQ shape) — the memory-bound scale path for
  * embedding search, complementing LSH (`q_knn_lsh`) and the IVF
  * coarse quantizer ([[IvfIndex]]).
  *
  * Why this exists at 100 TB: a 64-dim float corpus is 256 B/vector;
  * the packed PQ code is 8 B/vector (M=8, K=16 → 32 bits used). The
  * coded relation — the only thing the search scans — is 32× smaller
  * than the corpus, and each candidate costs M table lookups instead
  * of a D-multiply dot product. Codebooks are DRIVER state
  * (M·K·subDim longs), exactly like [[IvfIndex]]'s centroids: the
  * corpus never shuffles for training — each iteration is one
  * map-side-combined aggregate of M·K rows.
  *
  * Determinism (rows-only gate contract): subspace k-means seeds are
  * the subvectors of the K smallest vec_ids, assignment/encode argmin
  * exact integer distances with ties to the smaller code, centroid
  * updates are floored integer means — bit-identical reruns anywhere.
  *
  * Search modes:
  *  - [[adcTopK]] — exhaustive ADC scan (Jégou §IV: "ADC"): every
  *    code scored via the query's lookup table. The right mode when
  *    the coded relation fits a scan budget the raw corpus doesn't.
  *  - [[ivfPqTopK]] — IVF-PQ composition: probe the `nprobe` nearest
  *    coarse cells, ADC-score only their members (codes built on raw
  *    vectors, FAISS's `by_residual=false` layout — one codebook
  *    serves every cell; the residual refinement is a documented
  *    non-goal here).
  */
object PqIndex {

  /** Trained PQ model: codebooks(m)(j) is centroid j of subspace m. */
  final case class PqModel(codebooks: Array[Array[Array[Long]]]) {
    val m: Int = codebooks.length
    val k: Int = codebooks(0).length
    val subDim: Int = codebooks(0)(0).length
    require(m * PqExpressions.codeBits(k) <= 64,
      s"PQ codes must pack into one long (M=$m, K=$k)")
  }

  /** Deterministic per-subspace k-means over (vec_id, q) rows.
    * All M subspaces advance in ONE aggregate per iteration: encode →
    * explode (sub, code, subvector) → groupBy(sub, code) with
    * elementwise sums — M·K result rows to the driver, corpus never
    * shuffled on a data key.
    */
  def train(e: DataFrame, m: Int, k: Int, iters: Int, dims: Int): PqModel = {
    require(dims % m == 0, s"dims $dims not divisible by M=$m")
    val sd = dims / m
    // Seeds: subvectors of the K smallest vec_ids (cheap, deterministic).
    val seedRows = e.orderBy(col("vec_id")).limit(k)
      .select(col("q")).collect().map(_.getSeq[Long](0).toArray)
    require(seedRows.length == k, s"corpus smaller than K=$k")
    var cb: Array[Array[Array[Long]]] = Array.tabulate(m, k) { (mm, j) =>
      java.util.Arrays.copyOfRange(seedRows(j), mm * sd, (mm + 1) * sd)
    }
    var it = 0
    while (it < iters) {
      val sumCols = (0 until sd).map(i => sum(element_at(col("sq"), i + 1)).as(s"_s$i"))
      val stats = e
        .select(posexplode(PqExpressions.pqEncodeArray(col("q"), cb)).as(Seq("sub", "code")),
          col("q"))
        .select(col("sub"), col("code"),
          slice(col("q"), col("sub") * sd + 1, lit(sd)).as("sq"))
        .groupBy(col("sub"), col("code"))
        .agg(count(lit(1)).as("cnt"), sumCols: _*)
        .collect()
      val next = cb.map(_.map(_.clone()))
      stats.foreach { r =>
        val sub = r.getInt(0)
        val code = r.getLong(1).toInt
        val cnt = r.getLong(2)
        var i = 0
        while (i < sd) { next(sub)(code)(i) = Math.floorDiv(r.getLong(3 + i), cnt); i += 1 }
      }
      cb = next
      it += 1
    }
    PqModel(cb)
  }

  /** Encode: one packed int64 code per vector — per-row expression,
    * zero shuffle. `(vec_id, pq)` is the persisted search index; at
    * scale the raw vector column is dropped after this projection.
    */
  def encode(e: DataFrame, model: PqModel): DataFrame =
    e.withColumn("pq", PqExpressions.pqEncode(col("q"), model.codebooks))

  /** Shared scorer: approximate cosine from the exact integer ADC dot
    * and the exact reconstructed norm.
    */
  private def adcCos(model: PqModel) =
    VectorOps.cosineQ(
      PqExpressions.pqAdcDot(col("pq"), col("lut"), model.m, model.k),
      col("nq"),
      PqExpressions.pqReconNorm(col("pq"), model.codebooks))

  /** Exhaustive ADC top-k: the broadcast query set carries its
    * precomputed M·K lookup table; every packed code is scored with M
    * lookups. `queries` needs (query_id, qq, nq); `coded` is
    * [[encode]]'s output.
    */
  def adcTopK(queries: DataFrame, coded: DataFrame, model: PqModel,
              topK: Int): DataFrame = {
    val qlut = queries.select(col("query_id"), col("nq"),
      PqExpressions.pqLut(col("qq"), model.codebooks).as("lut"))
    val scored = coded.crossJoin(broadcast(qlut))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adcCos(model).as("_c"))
    Relational.topKPerGroupSalted(scored, Seq(col("query_id")),
        Seq(col("_c").desc, col("vec_id")), topK, col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (round(col("_c"), 6) + lit(0.0)).as("cos"), col("rnk"))
  }

  /** Residual relation of an IVF assignment: (vec_id, cell,
    * q → x − c_cell). A `by_residual` index trains/encodes PQ on
    * THESE rows — residuals are small, so the same code budget
    * quantizes far more finely (the FAISS IndexIVFPQ default).
    */
  def residuals(assigned: DataFrame, cents: Array[Array[Long]]): DataFrame =
    assigned.withColumn("q",
      graft.expressions.PqExpressions.residual(col("q"), col("cell"), cents))

  /** Driver-precomputed cross table for the residual norm
    * decomposition: cross(cell)(m·K + j) = dot(c_cell restricted to
    * subspace m, codebook(m)(j)). C·M·K longs — model state.
    */
  def crossTable(cents: Array[Array[Long]], model: PqModel): Array[Array[Long]] =
    cents.map { cent =>
      val t = new Array[Long](model.m * model.k)
      var mm = 0
      while (mm < model.m) {
        var j = 0
        while (j < model.k) {
          val cb = model.codebooks(mm)(j)
          var s = 0L
          var i = 0
          val off = mm * model.subDim
          val lim = math.min(model.subDim, math.max(0, cent.length - off))
          while (i < lim) { s += cent(off + i) * cb(i); i += 1 }
          t(mm * model.k + j) = s
          j += 1
        }
        mm += 1
      }
      t
    }

  /** Residual IVF-PQ top-k (`by_residual = true`): probe cells, score
    * via the exact decomposition
    * dot(q, x̂) = dot(q, c_cell) + adcDot(residual codes, lut(q)),
    * ‖x̂‖² = ‖c_cell‖² + 2·(c_cell·r̂) + ‖r̂‖² — every term an exact
    * integer from driver-held model tables (centroid dot per probe,
    * cross table per (cell, code), recon norms per code).
    * `assignedCoded` = [[residuals]] ∘ [[encode]] with
    * (vec_id, cell, pq).
    */
  def ivfPqResidualTopK(queries: DataFrame, assignedCoded: DataFrame,
                        cents: Array[Array[Long]], model: PqModel,
                        nprobe: Int, topK: Int): DataFrame = {
    import graft.expressions.PqExpressions
    val centNorms = cents.map(c => c.map(x => x * x).sum)
    val cross = crossTable(cents, model)
    val probes = queries.select(col("query_id"), col("nq"),
      PqExpressions.pqLut(col("qq"), model.codebooks).as("lut"),
      col("qq"),
      explode(graft.expressions.VectorExpressions.nearestCells(col("qq"), cents, nprobe)).as("cell"))
      .select(col("query_id"), col("nq"), col("lut"), col("cell"),
        PqExpressions.centDot(col("qq"), col("cell"), cents).as("cdot"))
    val centNormCol = element_at(lit(centNorms), col("cell").cast("int") + 1)
    val reconNorm = centNormCol +
      lit(2L) * PqExpressions.pqCellCross(col("pq"), col("cell"), cross, model.m, model.k) +
      PqExpressions.pqReconNorm(col("pq"), model.codebooks)
    val adc = col("cdot") + PqExpressions.pqAdcDot(col("pq"), col("lut"), model.m, model.k)
    val scored = assignedCoded.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineQ(adc, col("nq"), reconNorm).as("_c"))
    Relational.topKPerGroupSalted(scored, Seq(col("query_id")),
        Seq(col("_c").desc, col("vec_id")), topK, col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (round(col("_c"), 6) + lit(0.0)).as("cos"), col("rnk"))
  }

  /** IVF-PQ top-k: probe the `nprobe` nearest coarse cells per query
    * (exact integer centroid distances), meet the coded corpus
    * through one broadcast hash join on cell id, ADC-score the cell
    * members. `assignedCoded` = [[IvfIndex.assign]] ∘ [[encode]]
    * output with (vec_id, cell, pq).
    */
  def ivfPqTopK(queries: DataFrame, assignedCoded: DataFrame,
                cents: Array[Array[Long]], model: PqModel,
                nprobe: Int, topK: Int): DataFrame = {
    val probes = queries.select(col("query_id"), col("nq"),
      PqExpressions.pqLut(col("qq"), model.codebooks).as("lut"),
      explode(VectorExpressions.nearestCells(col("qq"), cents, nprobe)).as("cell"))
    val scored = assignedCoded.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adcCos(model).as("_c"))
    // a vector lives in exactly one cell — no pair can surface twice
    Relational.topKPerGroupSalted(scored, Seq(col("query_id")),
        Seq(col("_c").desc, col("vec_id")), topK, col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (round(col("_c"), 6) + lit(0.0)).as("cos"), col("rnk"))
  }
}
