package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles (order statistics).
  *
  * Built from explicit ranks instead of the engines' `percentile` /
  * `quantile_cont` internals: rank every row once, pick the two
  * bracketing order statistics of each requested quantile with
  * conditional aggregates, and interpolate with an expression tree
  * the SQL oracle repeats verbatim — so the doubles are bit-identical
  * across engines by construction (the NIST linear rule,
  * `h = p·(n−1)`, matches NumPy's default `percentile`).
  *
  * Plan: one window shuffle (rank + group size in the same sort) and
  * one map-side-combined aggregate. No per-group collection; a
  * billion groups rank in parallel.
  */
object Percentiles {

  /** @param ps   quantiles in [0, 1]; output columns `p50`, `p90`, …
    * @param tie  unique tiebreak column making the rank total
    */
  def perGroup(df: DataFrame, keys: Seq[String], v: Column, tie: Column,
               ps: Seq[Double]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(v, tie)
    val ranked = df
      .withColumn("_v", v.cast("double"))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(kc: _*)))
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val h = lit(p) * (col("_n") - 1).cast("double")
      val lo = floor(h).cast("long") + 1
      val hi = ceil(h).cast("long") + 1
      Seq(max(when(col("_rn") === lo, col("_v"))).as(s"_lo$i"),
        max(when(col("_rn") === hi, col("_v"))).as(s"_hi$i"))
    } :+ max(col("_n")).as("_n")
    val outs = ps.zipWithIndex.map { case (p, i) =>
      val h = lit(p) * (col("_n") - 1).cast("double")
      val frac = h - floor(h)
      val name = "p" + math.round(p * 100)
      ((col(s"_lo$i") + (col(s"_hi$i") - col(s"_lo$i")) * frac) + lit(0.0)).as(name)
    }
    ranked.groupBy(kc: _*).agg(aggs.head, aggs.tail: _*)
      .select(kc ++ outs: _*)
  }

  /** Exact weighted percentile per group: the smallest `v` whose
    * cumulative weight reaches `pPct`% of the group's total weight —
    * the weighted-median/quantile a curation pipeline uses to pick
    * thresholds by mass (bytes, tokens) instead of document count.
    *
    * Weights must be exact integers (e.g. cents via [[Exact.cents]]):
    * the threshold test `100·cumw >= pPct·totw` is pure integer
    * arithmetic, so the crossing point is identical on every engine —
    * no float accumulation order anywhere.
    *
    * Scale: the raw rows are FIRST collapsed to one row per distinct
    * (group, v) — a map-side-combined hash aggregate — and the
    * running-sum window only ever sees that collapsed relation. A
    * group with a billion rows but bounded value cardinality (the
    * typical case for quantities, scores, bucketed sizes) costs the
    * window sort |values| rows, not |rows|; without the collapse a
    * low-cardinality group key serializes the whole table through a
    * handful of window tasks.
    */
  def weightedPerGroup(df: DataFrame, keys: Seq[String], v: Column, wInt: Column,
                       pPct: Int, out: String = "wp"): DataFrame = {
    val kc = keys.map(col)
    val perValue = df.groupBy(kc :+ v.as("_v"): _*).agg(sum(wInt).as("_w"))
    val ordered = Window.partitionBy(kc: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(kc: _*)
    perValue
      .withColumn("_cumw", sum(col("_w")).over(ordered))
      .withColumn("_totw", sum(col("_w")).over(whole))
      .filter(col("_cumw") * 100 >= col("_totw") * pPct)
      .groupBy(kc: _*)
      .agg(min(col("_v")).as(out))
  }

  /** Exact `ntile(k)` bucket statistics — (bucket, count, min, max)
    * per group — without ever ranking individual rows.
    *
    * The trick: the aggregated output is invariant to WHICH of several
    * tied rows lands in which bucket (they share the same value), so
    * per-row rank is unnecessary. Collapse to one row per distinct
    * (group, value) with a map-side-combined hash aggregate, compute
    * each value's rank interval [cum−c+1, cum] with a running sum over
    * that collapsed relation, and intersect it arithmetically with
    * ntile's bucket rank ranges (bucket b covers
    * `(b−1)·⌊n/k⌋ + min(b−1, n mod k) + 1 .. +size_b`, the first
    * `n mod k` buckets one longer). Identical output to window-ntile +
    * groupBy for every input, by construction.
    *
    * Scale: the only per-group sort is the running-sum window over the
    * COLLAPSED relation — |distinct values| rows per group, not |rows|
    * (same shape as [[weightedPerGroup]]). A source with 10⁹ documents
    * but ~10⁵ distinct lengths costs the window 10⁵ rows. When the
    * per-ROW bucket label is required (exact tie placement), use
    * [[ntileRows]] instead and accept its single-task-per-group sort.
    *
    * Output columns: keys…, `bucket` (1..k, long), `n`, `lo`, `hi`.
    */
  def ntileBucketStats(df: DataFrame, keys: Seq[String], v: Column,
                       k: Int): DataFrame = {
    require(k >= 1, s"ntileBucketStats: k must be >= 1, got $k")
    val kc = keys.map(col)
    val perValue = df.groupBy(kc :+ v.as("_v"): _*).agg(count(lit(1)).as("_c"))
    val ordered = Window.partitionBy(kc: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(kc: _*)
    val q = expr(s"_n div $k")
    val r = col("_n") % k
    val b = col("_bucket").cast("long")
    val start = (b - 1) * q + least(b - 1, r) + 1
    val size = q + when(b <= r, 1).otherwise(0)
    val end = start + size - 1
    val loRn = col("_cum") - col("_c") + 1
    val hiRn = col("_cum")
    val overlap = least(hiRn, end) - greatest(loRn, start) + 1
    perValue
      .withColumn("_cum", sum(col("_c")).over(ordered))
      .withColumn("_n", sum(col("_c")).over(whole))
      .withColumn("_bucket", explode(sequence(lit(1), lit(k))))
      .withColumn("_ov", overlap)
      .filter(col("_ov") > 0)
      .groupBy(kc :+ b.as("bucket"): _*)
      .agg(sum(col("_ov")).as("n"), min(col("_v")).as("lo"), max(col("_v")).as("hi"))
  }

  /** Per-row `ntile(k)` labels — the exact-tie variant of
    * [[ntileBucketStats]]: returns the input plus a `bucket` column,
    * ties placed deterministically by `tie`. Inherently sorts each
    * group in one task (exact rank semantics); prefer
    * [[ntileBucketStats]] whenever only per-bucket aggregates are
    * needed.
    */
  def ntileRows(df: DataFrame, keys: Seq[String], v: Column, tie: Column,
                k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(v, tie)
    df.withColumn("bucket", ntile(k).over(w).cast("long"))
  }

  /** DuckDB SQL mirror of [[weightedPerGroup]] over `tbl`. */
  def weightedPerGroupSql(tbl: String, key: String, vSql: String, wSql: String,
                          pPct: Int, out: String = "wp"): String =
    s"""WITH pv AS (SELECT $key, $vSql AS _v, sum($wSql) AS _w
       |  FROM $tbl GROUP BY 1, 2),
       |cw AS (SELECT $key, _v,
       |    sum(_w) OVER (PARTITION BY $key ORDER BY _v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cumw,
       |    sum(_w) OVER (PARTITION BY $key) AS _totw
       |  FROM pv)
       |SELECT $key, min(_v) AS $out
       |FROM cw WHERE _cumw * 100 >= _totw * $pPct
       |GROUP BY $key""".stripMargin

  /** DuckDB SQL mirror of [[perGroup]] over `tbl`. */
  def perGroupSql(tbl: String, key: String, vSql: String, tieSql: String,
                  ps: Seq[Double]): String = {
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(s"max(CASE WHEN _rn = CAST(floor($p * CAST(_n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN _v END) AS _lo$i",
        s"max(CASE WHEN _rn = CAST(ceil($p * CAST(_n - 1 AS DOUBLE)) AS BIGINT) + 1 THEN _v END) AS _hi$i")
    }.mkString(",\n    ") + ",\n    max(_n) AS _n"
    val outs = ps.zipWithIndex.map { case (p, i) =>
      val h = s"($p * CAST(_n - 1 AS DOUBLE))"
      s"((_lo$i + (_hi$i - _lo$i) * ($h - floor($h))) + 0.0) AS p${math.round(p * 100)}"
    }.mkString(",\n  ")
    s"""WITH rk AS (SELECT $key, CAST($vSql AS DOUBLE) AS _v,
       |    CAST(row_number() OVER (PARTITION BY $key ORDER BY $vSql, $tieSql) AS BIGINT) AS _rn,
       |    count(*) OVER (PARTITION BY $key) AS _n
       |  FROM $tbl),
       |ag AS (SELECT $key,
       |    $aggs
       |  FROM rk GROUP BY $key)
       |SELECT $key,
       |  $outs
       |FROM ag""".stripMargin
  }
}
