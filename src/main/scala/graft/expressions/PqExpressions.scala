package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for product quantization (Jégou,
  * Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
  * Search" — the FAISS IndexPQ / IndexIVFPQ memory layout).
  *
  * A 64-dim float vector (256 bytes) compresses to ONE int64: M
  * subspace codes of ⌈log₂K⌉ bits packed into a single long. At
  * 100 TB of embeddings that is the difference between "the index
  * fits in cluster memory" and "it does not" (32× for M=8, K=16),
  * and ADC scoring replaces a D-mult dot product with M table
  * lookups per candidate.
  *
  * Everything is exact integer arithmetic over the fixed-point
  * vectors (same determinism contract as [[VectorExpressions]]):
  * encode argmins exact integer distances with ties to the smaller
  * code, the LUT holds exact integer partial dots, and the ADC dot /
  * reconstructed norm are exact integer sums — so
  * `adcDot(pq, lut(q)) == dotQ(decode(pq), q)` EXACTLY (asserted by
  * PqIndexSpec), and reruns are bit-identical on any cluster layout.
  */
object PqExpressions {

  /** Bits per code: ⌈log₂K⌉, minimum 1. */
  def codeBits(k: Int): Int = math.max(1, 32 - Integer.numberOfLeadingZeros(k - 1))

  def pqEncode(q: Column, cb: Array[Array[Array[Long]]]): Column =
    GraftColumnBridge.column(PqEncodeExpr(GraftColumnBridge.expression(q), cb))
  def pqEncodeArray(q: Column, cb: Array[Array[Array[Long]]]): Column =
    GraftColumnBridge.column(PqEncodeArrayExpr(GraftColumnBridge.expression(q), cb))
  def pqLut(q: Column, cb: Array[Array[Array[Long]]]): Column =
    GraftColumnBridge.column(PqLutExpr(GraftColumnBridge.expression(q), cb))
  def pqAdcDot(code: Column, lut: Column, m: Int, k: Int): Column =
    GraftColumnBridge.column(PqAdcDotExpr(
      GraftColumnBridge.expression(code), GraftColumnBridge.expression(lut), m, k))
  def pqReconNorm(code: Column, cb: Array[Array[Array[Long]]]): Column =
    GraftColumnBridge.column(PqReconNormExpr(GraftColumnBridge.expression(code), cb))
  def pqDecode(code: Column, cb: Array[Array[Array[Long]]]): Column =
    GraftColumnBridge.column(PqDecodeExpr(GraftColumnBridge.expression(code), cb))

  def residual(q: Column, cell: Column, cents: Array[Array[Long]]): Column =
    GraftColumnBridge.column(ResidualExpr(
      GraftColumnBridge.expression(q), GraftColumnBridge.expression(cell), cents))
  def centDot(q: Column, cell: Column, cents: Array[Array[Long]]): Column =
    GraftColumnBridge.column(CentDotExpr(
      GraftColumnBridge.expression(q), GraftColumnBridge.expression(cell), cents))
  def pqCellCross(code: Column, cell: Column, cross: Array[Array[Long]],
                  m: Int, k: Int): Column =
    GraftColumnBridge.column(PqCellCrossExpr(
      GraftColumnBridge.expression(code), GraftColumnBridge.expression(cell), cross, m, k))

  private[expressions] def checkCodebooks(cb: Array[Array[Array[Long]]]): Unit = {
    require(cb.nonEmpty && cb.forall(_.length == cb(0).length),
      "PQ codebooks must be a non-empty M x K x subDim array")
    val bits = codeBits(cb(0).length)
    require(cb.length * bits <= 64,
      s"PQ codes do not fit one long: M=${cb.length} x $bits bits")
  }

  /** Shared encode kernel: per subspace, argmin_j of the exact integer
    * distance ‖sub − c_j‖² (the row-constant ‖sub‖² dropped), ties to
    * the smaller code.
    */
  private[expressions] def encodeCodes(q: ArrayData, cb: Array[Array[Array[Long]]],
                                       norms: Array[Array[Long]]): Array[Int] = {
    val m = cb.length
    val sd = cb(0)(0).length
    val n = q.numElements()
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val off = mm * sd
      val book = cb(mm)
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var dot = 0L
        var i = 0
        val lim = math.min(sd, n - off)
        while (i < lim) { dot += q.getLong(off + i) * c(i); i += 1 }
        val d = norms(mm)(j) - 2L * dot
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(mm) = best
      mm += 1
    }
    out
  }

  private[expressions] def subNorms(cb: Array[Array[Array[Long]]]): Array[Array[Long]] =
    cb.map(_.map(c => c.map(x => x * x).sum))
}

/** Packed PQ code word of a quantized vector: M codes of ⌈log₂K⌉
  * bits each, code of subspace m in bits [m·b, (m+1)·b). The
  * codebooks ride in the task closure (M·K·subDim longs — model
  * state, not data).
  */
case class PqEncodeExpr(child: Expression, cb: Array[Array[Array[Long]]])
    extends UnaryExpression with KernelCodegen {
  PqExpressions.checkCodebooks(cb)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  @transient private lazy val norms = PqExpressions.subNorms(cb)
  private val bits = PqExpressions.codeBits(cb(0).length)
  protected override def nullSafeEval(input: Any): Any = {
    val codes = PqExpressions.encodeCodes(input.asInstanceOf[ArrayData], cb, norms)
    var packed = 0L
    var mm = 0
    while (mm < codes.length) { packed |= codes(mm).toLong << (mm * bits); mm += 1 }
    packed
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Unpacked form of [[PqEncodeExpr]] — array<long> of M codes; the
  * training loop explodes this to aggregate per (subspace, code).
  */
case class PqEncodeArrayExpr(child: Expression, cb: Array[Array[Array[Long]]])
    extends UnaryExpression with KernelCodegen {
  PqExpressions.checkCodebooks(cb)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val norms = PqExpressions.subNorms(cb)
  protected override def nullSafeEval(input: Any): Any = {
    val codes = PqExpressions.encodeCodes(input.asInstanceOf[ArrayData], cb, norms)
    new GenericArrayData(codes.map(_.toLong: Any))
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeArrayExpr =
    copy(child = newChild)
}

/** ADC lookup table of a query vector: array<long> of length M·K,
  * lut[m·K + j] = exact integer dot of the query's m-th subvector
  * with codebook entry (m, j). Computed ONCE per query; every
  * candidate then costs M lookups instead of a D-mult dot.
  */
case class PqLutExpr(child: Expression, cb: Array[Array[Array[Long]]])
    extends UnaryExpression with KernelCodegen {
  PqExpressions.checkCodebooks(cb)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val m = cb.length
    val k = cb(0).length
    val sd = cb(0)(0).length
    val n = q.numElements()
    val out = new Array[Any](m * k)
    var mm = 0
    while (mm < m) {
      val off = mm * sd
      val lim = math.min(sd, math.max(0, n - off))
      var j = 0
      while (j < k) {
        val c = cb(mm)(j)
        var dot = 0L
        var i = 0
        while (i < lim) { dot += q.getLong(off + i) * c(i); i += 1 }
        out(mm * k + j) = dot
        j += 1
      }
      mm += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** ADC dot: Σ_m lut[m·K + code_m] — the candidate-scoring hot path,
  * fully code-generated (M shifts + M array reads per row).
  */
case class PqAdcDotExpr(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  private val bits = PqExpressions.codeBits(k)
  private val mask = (1L << bits) - 1L
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(code: Any, lut: Any): Any = {
    val c = code.asInstanceOf[Long]
    val l = lut.asInstanceOf[ArrayData]
    var s = 0L
    var mm = 0
    while (mm < m) {
      s += l.getLong(mm * k + ((c >>> (mm * bits)) & mask).toInt)
      mm += 1
    }
    s
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val s = ctx.freshName("s")
      val mm = ctx.freshName("m")
      s"""
         |long $s = 0L;
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  $s += $l.getLong($mm * $k + (int) (($c >>> ($mm * $bits)) & ${mask}L));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDotExpr =
    copy(left = l, right = r)
}

/** Exact squared norm of the RECONSTRUCTED vector: subspaces are
  * orthogonal coordinate blocks, so ‖x̂‖² = Σ_m ‖c_{m,code_m}‖²
  * exactly — M lookups into a baked M·K norm table, full codegen.
  */
case class PqReconNormExpr(child: Expression, cb: Array[Array[Array[Long]]])
    extends UnaryExpression {
  PqExpressions.checkCodebooks(cb)
  private val m = cb.length
  private val k = cb(0).length
  private val bits = PqExpressions.codeBits(k)
  private val mask = (1L << bits) - 1L
  // flattened so codegen indexes one long[]
  @transient private lazy val flat: Array[Long] =
    PqExpressions.subNorms(cb).flatten
  def flatNorms: Array[Long] = flat
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any = {
    val c = input.asInstanceOf[Long]
    var s = 0L
    var mm = 0
    while (mm < m) {
      s += flat(mm * k + ((c >>> (mm * bits)) & mask).toInt)
      mm += 1
    }
    s
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqNorms", this,
        classOf[PqReconNormExpr].getName)
      val n = ctx.freshName("norms")
      val s = ctx.freshName("s")
      val mm = ctx.freshName("m")
      s"""
         |long[] $n = $ref.flatNorms();
         |long $s = 0L;
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  $s += $n[$mm * $k + (int) (($c >>> ($mm * $bits)) & ${mask}L)];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): PqReconNormExpr =
    copy(child = newChild)
}

/** Reconstruction x̂ (concatenated codebook entries) — the spec's
  * ground truth for the exactness assertions; not a hot path.
  */
case class PqDecodeExpr(child: Expression, cb: Array[Array[Array[Long]]])
    extends UnaryExpression with KernelCodegen {
  PqExpressions.checkCodebooks(cb)
  private val bits = PqExpressions.codeBits(cb(0).length)
  private val mask = (1L << bits) - 1L
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any = {
    val c = input.asInstanceOf[Long]
    val sd = cb(0)(0).length
    val out = new Array[Any](cb.length * sd)
    var mm = 0
    while (mm < cb.length) {
      val cent = cb(mm)(((c >>> (mm * bits)) & mask).toInt)
      var i = 0
      while (i < sd) { out(mm * sd + i) = cent(i); i += 1 }
      mm += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqDecodeExpr =
    copy(child = newChild)
}

/** x − c_cell elementwise (exact integer) — the residual a
  * `by_residual` IVF-PQ encodes instead of the raw vector (FAISS
  * IndexIVFPQ default: residuals are small, so the same code budget
  * quantizes them far more finely).
  */
case class ResidualExpr(left: Expression, right: Expression, cents: Array[Array[Long]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(q: Any, cell: Any): Any = {
    val x = q.asInstanceOf[ArrayData]
    val c = cents(cell.asInstanceOf[Long].toInt)
    val n = math.min(x.numElements(), c.length)
    val out = new Array[Any](x.numElements())
    var i = 0
    while (i < n) { out(i) = x.getLong(i) - c(i); i += 1 }
    while (i < x.numElements()) { out(i) = x.getLong(i); i += 1 }
    new GenericArrayData(out)
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cell) => {
      val ref = ctx.addReferenceObj("resCents", this, classOf[ResidualExpr].getName)
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long[] $c = $ref.centRow((int) $cell);
         |int $n = $q.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $q.getLong($i) - ($i < $c.length ? $c[$i] : 0L);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  def centRow(cell: Int): Array[Long] = cents(cell)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResidualExpr =
    copy(left = l, right = r)
}

/** dot(q, c_cell) — the per-(query, cell) coarse term of the residual
  * IVF-PQ score decomposition dot(q, x̂) = dot(q, c) + adcDot.
  */
case class CentDotExpr(left: Expression, right: Expression, cents: Array[Array[Long]])
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(q: Any, cell: Any): Any = {
    val x = q.asInstanceOf[ArrayData]
    val c = cents(cell.asInstanceOf[Long].toInt)
    val n = math.min(x.numElements(), c.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * c(i); i += 1 }
    s
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cell) => {
      val ref = ctx.addReferenceObj("cdCents", this, classOf[CentDotExpr].getName)
      val c = ctx.freshName("c")
      val st = ctx.freshName("s")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long[] $c = $ref.centRow((int) $cell);
         |int $n = java.lang.Math.min($q.numElements(), $c.length);
         |long $st = 0L;
         |for (int $i = 0; $i < $n; $i++) { $st += $q.getLong($i) * $c[$i]; }
         |${ev.value} = $st;
       """.stripMargin
    })
  def centRow(cell: Int): Array[Long] = cents(cell)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CentDotExpr =
    copy(left = l, right = r)
}

/** Σ_m cross[cell][m·K + code_m] — the centroid×residual cross term
  * of ‖x̂‖² = ‖c‖² + 2·c·r̂ + ‖r̂‖², from a driver-precomputed
  * C×(M·K) table.
  */
case class PqCellCrossExpr(left: Expression, right: Expression,
                           cross: Array[Array[Long]], m: Int, k: Int)
    extends BinaryExpression {
  private val bits = PqExpressions.codeBits(k)
  private val mask = (1L << bits) - 1L
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(code: Any, cell: Any): Any = {
    val c = code.asInstanceOf[Long]
    val t = cross(cell.asInstanceOf[Long].toInt)
    var s = 0L
    var mm = 0
    while (mm < m) {
      s += t(mm * k + ((c >>> (mm * bits)) & mask).toInt)
      mm += 1
    }
    s
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, cell) => {
      val ref = ctx.addReferenceObj("pqCross", this, classOf[PqCellCrossExpr].getName)
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val mm = ctx.freshName("m")
      s"""
         |long[] $t = $ref.crossRow((int) $cell);
         |long $s = 0L;
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  $s += $t[$mm * $k + (int) (($code >>> ($mm * $bits)) & ${mask}L)];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  def crossRow(cell: Int): Array[Long] = cross(cell)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqCellCrossExpr =
    copy(left = l, right = r)
}
