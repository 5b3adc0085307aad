package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout locality: Z-order (Morton) clustering — the
  * `OPTIMIZE ZORDER BY` of Delta/Iceberg, as an operator. Writing a
  * 100 TB table clustered by the interleaved bits of two (or more)
  * filter columns makes every output file cover a COMPACT rectangle
  * in (x, y) space, so parquet footer min/max prune files for
  * predicates on EITHER column — a linearly-sorted layout only ever
  * prunes its leading sort key.
  *
  * The z-value is a pure per-row expression (statically unrolled
  * shift/mask tree — whole-stage codegen, no HOF, no shuffle);
  * [[clusterByZ]] then does exactly one range-shuffle, which is the
  * one-off cost any clustering rewrite pays.
  */
object Locality {

  /** Morton interleave of the low `bits` of two non-negative integer
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Requires 2·bits ≤ 63.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 63, s"bits out of range: $bits")
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** DuckDB SQL mirror of [[zValue]]. */
  def zValueSql(x: String, y: String, bits: Int): String =
    s"CAST(list_sum([((($x >> i) & 1) << (2 * i)) + ((($y >> i) & 1) << (2 * i + 1)) " +
      s"for i in range(0, $bits)]) AS BIGINT)"

  /** Scale a numeric column with [lo, hi] bounds onto the 2^bits-cell
    * grid: floor((c − lo)·2^bits / (hi − lo + 1)). Bounds may be
    * data-driven scalar columns (histogram-gate pattern). Double
    * division over exact integer inputs — engine-identical IEEE ops;
    * exact while (hi − lo + 1)·2^bits < 2^53.
    */
  def gridCell(c: Column, lo: Column, hi: Column, bits: Int): Column =
    floor((c - lo).cast("double") * lit((1L << bits).toDouble)
      / (hi - lo + lit(1)).cast("double")).cast("long")

  /** DuckDB SQL mirror of [[gridCell]]. */
  def gridCellSql(c: String, lo: String, hi: String, bits: Int): String =
    s"CAST(floor(CAST($c - $lo AS DOUBLE) * ${1L << bits}.0 " +
      s"/ CAST($hi - $lo + 1 AS DOUBLE)) AS BIGINT)"

  /** Cluster a relation by z-value: one range shuffle + in-partition
    * sort, so each output partition (→ parquet file) covers a compact
    * z-interval and therefore a compact (x, y) rectangle.
    */
  def clusterByZ(df: DataFrame, z: Column, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, z).sortWithinPartitions(z)
}
