package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.operators.VectorOps

/** Native Catalyst expressions for the fixed-point vector hot paths —
  * value-identical to the VectorOps higher-order formulations
  * (asserted by ExpressionParitySpec) but with primitive loops
  * instead of interpreted lambdas. The candidate-pair cosine scoring
  * in near-dup/KNN runs one of these per pair, so closure dispatch
  * there is the dominant cost at scale.
  */
object VectorExpressions {
  def quantizeVec(v: Column): Column = GraftColumnBridge.column(
    QuantizeVecExpr(GraftColumnBridge.expression(v)))
  def dotQ(a: Column, b: Column): Column = GraftColumnBridge.column(
    DotQExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def normQ(a: Column): Column = GraftColumnBridge.column(
    NormQExpr(GraftColumnBridge.expression(a)))
  def lshBuckets(q: Column, tables: Int, planes: Int, dims: Int): Column =
    GraftColumnBridge.column(
      LshBucketsExpr(GraftColumnBridge.expression(q), tables, planes, dims))
  def nearestCells(q: Column, cents: Array[Array[Long]], k: Int): Column =
    GraftColumnBridge.column(
      NearestCellsExpr(GraftColumnBridge.expression(q), cents, k))
  def nearestCell(q: Column, cents: Array[Array[Long]]): Column =
    org.apache.spark.sql.functions.element_at(nearestCells(q, cents, 1), 1)
  def nearestCellScore(q: Column, cents: Array[Array[Long]]): Column =
    GraftColumnBridge.column(
      NearestCellScoreExpr(GraftColumnBridge.expression(q), cents))
  def centroidAB(q: Column, label: Column,
                 cents: Array[Array[Long]], labels: Array[Long]): Column =
    GraftColumnBridge.column(CentroidABExpr(
      GraftColumnBridge.expression(q), GraftColumnBridge.expression(label),
      cents, labels))
}

/** `[a, b]` of the simplified silhouette per row: a = exact integer
  * squared distance ‖x−μ_own‖² to the row's OWN label centroid, b =
  * the min over OTHER label centroids — one pass over the k·dims
  * driver-state codebook (labels aligned with cents), so the whole
  * ×k fan-out + per-vector min collapses into a single zero-shuffle
  * projection. A row whose label has no other centroid (k = 1)
  * returns b = a (s = 0, the same value the NULL-b SQL branch pins).
  */
case class CentroidABExpr(left: Expression, right: Expression,
                          cents: Array[Array[Long]], labels: Array[Long])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val norms: Array[Long] =
    cents.map(c => c.map(x => x * x).sum)
  /** Public bridge for the generated code (KernelCodegen convention). */
  def kernelEval(a: Any, b: Any): Any = nullSafeEval(a, b)
  protected override def nullSafeEval(qIn: Any, labelIn: Any): Any = {
    val q = qIn.asInstanceOf[ArrayData]
    val label = labelIn.asInstanceOf[Long]
    val ne = q.numElements()
    var qq = 0L
    var i = 0
    while (i < ne) { val x = q.getLong(i); qq += x * x; i += 1 }
    var a = 0L
    var b = -1L
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(cent.length, ne)
      var dot = 0L
      var j = 0
      while (j < m) { dot += q.getLong(j) * cent(j); j += 1 }
      val d = qq + norms(c) - 2L * dot
      if (labels(c) == label) a = d
      else if (b < 0L || d < b) b = d
      c += 1
    }
    if (b < 0L) b = a
    new GenericArrayData(Array[Any](a, b))
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("kernel", this)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.kernelEval($a, java.lang.Long.valueOf($b));"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidABExpr =
    copy(left = l, right = r)
}

/** `[cell, ‖x−c‖²]` of the nearest centroid in ONE pass — the cell
  * choice is value-identical to [[NearestCellsExpr]] (same dropped-
  * ‖x‖² ranking, same lowest-index tie-break), and the returned
  * distance is the FULL exact integer `‖x‖² + ‖c‖² − 2·x·c`, so
  * intra-cell far-point ranking off it matches ranking by
  * `‖x‖² − 2·x·c` (the ‖c‖² term is cell-constant). Lets
  * [[graft.operators.IvfIndex.rebalance]] fuse its count + far-point
  * passes into one aggregate.
  */
case class NearestCellScoreExpr(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val norms: Array[Long] =
    cents.map(c => c.map(x => x * x).sum)
  protected override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = cents.length
    var best = -1
    var bestD = 0L
    var qq = 0L
    var i = 0
    val ne = q.numElements()
    while (i < ne) { val x = q.getLong(i); qq += x * x; i += 1 }
    var c = 0
    while (c < n) {
      val cent = cents(c)
      val m = math.min(cent.length, ne)
      var dot = 0L
      var j = 0
      while (j < m) { dot += q.getLong(j) * cent(j); j += 1 }
      val d = norms(c) - 2L * dot
      if (best < 0 || d < bestD) { best = c; bestD = d }
      c += 1
    }
    new GenericArrayData(Array[Any](best.toLong, qq + bestD))
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellScoreExpr =
    copy(child = newChild)
}

/** Cell ids of the `k` nearest IVF centroids by exact integer
  * distance (`‖x‖² + ‖c‖² − 2·x·c`; the row-constant `‖x‖²` term is
  * dropped — it never changes the ordering), ties broken by cell id.
  * The centroid matrix rides in the task closure (C·dims longs —
  * model state, not data).
  */
case class NearestCellsExpr(child: Expression, cents: Array[Array[Long]], k: Int)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val norms: Array[Long] =
    cents.map(c => c.map(x => x * x).sum)
  protected override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = cents.length
    val d = new Array[Long](n)
    var c = 0
    while (c < n) {
      val cent = cents(c)
      val m = math.min(cent.length, q.numElements())
      var dot = 0L
      var i = 0
      while (i < m) { dot += q.getLong(i) * cent(i); i += 1 }
      d(c) = norms(c) - 2L * dot
      c += 1
    }
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    val used = new Array[Boolean](n)
    var filled = 0
    while (filled < kk) {
      var best = -1
      var j = 0
      while (j < n) {
        if (!used(j) && (best < 0 || d(j) < d(best))) best = j
        j += 1
      }
      used(best) = true
      out(filled) = best.toLong
      filled += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

/** All LSH table bucket ids of a quantized vector in one pass —
  * value-identical to VectorOps.lshBucket per table. Returns
  * array<long> of length `tables`.
  */
case class LshBucketsExpr(child: Expression, tables: Int, planes: Int, dims: Int)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // weights[t][p][i], precomputed once per executor
  @transient private lazy val weights: Array[Array[Array[Long]]] =
    Array.tabulate(tables, planes, dims)(VectorOps.planeWeight)
  protected override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = math.min(dims, q.numElements())
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val w = weights(t)(p)
        var s = 0L
        var i = 0
        while (i < n) { s += q.getLong(i) * w(i); i += 1 }
        if (s >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

/** floor(x * 1e6) fixed-point quantization of a float/double array.
  * Full codegen (stays inside whole-stage spans). */
case class QuantizeVecExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val x = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = math.floor(x * VectorOps.QScale.toDouble).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (long) java.lang.Math.floor($get * ${VectorOps.QScale}.0D);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): QuantizeVecExpr =
    copy(child = newChild)
}

/** Exact integer dot product of two long arrays. Full codegen. */
case class DotQExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) { $s += $a.getLong($i) * $b.getLong($i); }
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotQExpr =
    copy(left = l, right = r)
}

/** Exact integer squared norm of a long array. Full codegen. */
case class NormQExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var s = 0L
    var i = 0
    while (i < x.numElements()) { s += x.getLong(i) * x.getLong(i); i += 1 }
    s
  }
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) { long v = $a.getLong($i); $s += v * v; }
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): NormQExpr =
    copy(child = newChild)
}
