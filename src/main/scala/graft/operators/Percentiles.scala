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
