package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal (the SlimPajama/Gopher-family
  * "too repetitive / too random" screen): deflate the UTF-8 text at a
  * FIXED level and report `compressed_bytes · 1e6 div raw_bytes`.
  * Highly repetitive boilerplate compresses far below natural prose
  * (< ~300k ppm), while base64/binary junk refuses to compress
  * (> ~900k ppm) — both tails are curation drop candidates.
  *
  * A native expression (not a UDF): the per-row kernel runs one
  * virtual call via [[KernelCodegen]], keeping the surrounding
  * operators in one whole-stage-codegen span. Zero shuffle, embarras-
  * singly parallel at any corpus size. Deterministic: fixed deflate
  * level, no dictionary, single-shot `Deflater` per call (allocation
  * is dwarfed by the deflate itself; rows-only gate, so no SQL mirror
  * is required — DuckDB has no zlib surface).
  */
case class DeflateRatioExpr(child: Expression)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_ratio_ppm"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) 1000000L
    else {
      val d = new java.util.zip.Deflater(6, false)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](1024)
        var out = 0L
        while (!d.finished()) out += d.deflate(buf)
        out * 1000000L / bytes.length
      } finally d.end()
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

object CompressExpressions {
  /** deflate_ratio_ppm(text): compressed/raw size in ppm (long). */
  def deflateRatioPpm(text: Column): Column =
    GraftColumnBridge.column(DeflateRatioExpr(GraftColumnBridge.expression(text)))
}
