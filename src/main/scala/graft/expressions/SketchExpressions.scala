package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Sketch-backed native expressions (probabilistic membership). */
object SketchExpressions {

  /** Map-side membership test of a LONG key against a serialized
    * spark-sketch Bloom filter. The sketch rides the expression (one
    * copy per stage via the task-binary broadcast, like the centroid
    * tables in [[NearestCellsExpr]]); the filter itself deserializes
    * lazily once per executor plan instance.
    */
  def bloomMightContain(key: Column, bloomBytes: Array[Byte]): Column =
    GraftColumnBridge.column(
      BloomMightContainExpr(GraftColumnBridge.expression(key), bloomBytes))
}

/** `mightContainLong` over a broadcast-by-plan serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] — the fpp-sized
  * (~1.2 bytes/key at fpp 0.01 — LINEAR in keys, which is why
  * builders must size-guard it; see Dedup.MaxBloomSketchBytes)
  * stand-in for a too-big-to-broadcast exact key set. False positives
  * only (never false negatives), so a downstream exact confirm join
  * restores exact semantics while shuffling just the sketch-surviving
  * slice.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = BooleanType

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  protected override def nullSafeEval(h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
