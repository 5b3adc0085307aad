package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding / array-column operators (SURVEY.md §2 #18–#20, #25–#27)
  * — fixed-point vector math that is bit-identical on every engine.
  *
  * Strategy: vectors are quantized ONCE to exact int64
  * (`floor(x * 1e6)` — floor, not round, because IEEE floor is
  * bit-portable while decimal rounding of doubles is not). Dot
  * products, norms, hyperplane projections and matrix transforms are
  * then exact integer arithmetic; doubles appear only in final
  * cosine/scaling expressions whose inputs are exact ints and whose
  * expression trees match the SQL oracle — so both engines produce
  * identical bits. 1e-6 quantization error is far below any
  * similarity threshold of interest.
  *
  * Scale: quantization/dot/norm are per-row higher-order functions
  * (no shuffle, no UDFs); the LSH tables turn near-dup search into a
  * bucket-keyed equi-join (never an all-pairs product).
  */
object VectorOps {

  /** Quantization scale: 1e-6 resolution. */
  val QScale = 1000000L

  /** float vector → exact int64 fixed-point vector. The explicit
    * double cast matters: in DuckDB a bare `x * 1000000.0` multiplies
    * FLOAT by DECIMAL in float32 and floors a different value.
    */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(QScale.toDouble)))

  /** DuckDB SQL mirror of [[quantize]]. */
  def quantizeSql(v: String): String =
    s"[CAST(floor(CAST(x AS DOUBLE) * CAST($QScale AS DOUBLE)) AS BIGINT) for x in $v]"

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, v) => s + v)

  /** DuckDB SQL mirror of [[dotQ]]. */
  def dotQSql(a: String, b: String): String =
    s"CAST(list_sum([$a[i+1] * $b[i+1] for i in range(len($a))]) AS BIGINT)"

  /** Exact integer squared norm of a quantized vector. */
  def normQ(a: Column): Column =
    aggregate(a, lit(0L), (s, x) => s + x * x)

  /** DuckDB SQL mirror of [[normQ]]. */
  def normQSql(a: String): String =
    s"CAST(list_sum([x * x for x in $a]) AS BIGINT)"

  /** Array rebin (pyspec `ccd` image binning, 1-D form): collapse a
    * quantized vector by `factor`, each output bin the EXACT integer
    * sum of its `factor` inputs — the detector-pixel binning step of
    * an image stack, expressed per row with zero shuffle. `bins` =
    * output length (input length must be ≥ bins·factor; extra tail
    * elements are ignored, as CCD binning crops the ragged edge).
    */
  def rebinQ(v: Column, factor: Int, bins: Int): Column =
    transform(sequence(lit(0), lit(bins - 1)), i =>
      (0 until factor).map(j => element_at(v, i * factor + lit(j + 1)))
        .reduce(_ + _))

  /** DuckDB SQL mirror of [[rebinQ]]. */
  def rebinQSql(v: String, factor: Int, bins: Int): String = {
    val terms = (0 until factor).map(j => s"$v[$factor*i + ${j + 1}]").mkString(" + ")
    s"[$terms for i in range(0, $bins)]"
  }

  /** Cosine from exact ints — deterministic double expression. */
  def cosineQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** DuckDB SQL mirror of [[cosineQ]]. */
  def cosineQSql(dot: String, na: String, nb: String): String =
    s"(CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))))"

  /** Deterministic integer hyperplane weight for (table, plane, dim):
    * base_hash of a fixed string, mapped to [-1000, 1000]. Plain
    * literals in the generated plans/SQL — engine-independent.
    */
  def planeWeight(table: Int, plane: Int, dim: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"w:$table:$plane:$dim".getBytes("UTF-8"))
    (java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % 2001L) - 1000L
  }

  /** Integer LSH bucket id of a quantized vector for one table:
    * bit p = sign of the exact integer projection onto plane p.
    */
  def lshBucket(q: Column, table: Int, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      val w = array((0 until dims).map(i => lit(planeWeight(table, p, i))): _*)
      val proj = aggregate(zip_with(q, w, (x, y) => x * y), lit(0L), (s, v) => s + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Scale knob: hyperplane count sized to the corpus so expected
    * bucket occupancy stays near `targetBucketSize` (buckets ≈ 2^p
    * under the random-projection sign model). Too few planes → huge
    * buckets → the bucket join degenerates toward all-pairs; too many
    * → recall collapses. Capped at 20 so bucket ids stay well inside
    * a long and per-table fan-out stays bounded.
    */
  def suggestedPlanes(corpusSize: Long, targetBucketSize: Long = 1024L): Int = {
    require(corpusSize > 0 && targetBucketSize > 0)
    val p = math.ceil(math.log(corpusSize.toDouble / targetBucketSize) / math.log(2)).toInt
    math.min(20, math.max(4, p))
  }

  /** DuckDB SQL mirror of [[lshBucket]] over a quantized-list column. */
  def lshBucketSql(q: String, table: Int, planes: Int, dims: Int): String =
    (0 until planes).map { p =>
      val w = (0 until dims).map(planeWeight(table, p, _)).mkString("[", ",", "]")
      s"(CASE WHEN list_sum([$q[i+1] * $w[i+1] for i in range(len($q))]) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
