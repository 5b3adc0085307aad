package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Binning, Exact, ScanCorrect, VectorOps}
import graft.operators.Exact.{centsSql, roundedRatioSql}

/** Round-6 analysis extensions (SURVEY.md §2 #144–#148): detector
  * deadtime correction, relational set operations, int8 scalar
  * quantization of embeddings, inverse-variance multi-scan merge,
  * and SNIP iterative background estimation — each SQL-gated with
  * the exact-integer discipline of SURVEY.md §4 (cents / micro /
  * pico quantization BEFORE any aggregate, floor-division instead
  * of double division everywhere a ratio crosses the oracle).
  */
object AnalysisQueries {

  /** Shared DuckDB prep over events (mirror of [[ev]]). */
  private val E: String =
    """(SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |   (epoch_us(ts) // 1000000) - 1704067200 AS xs,
      |   CAST(value AS DECIMAL(18,2)) AS vd, event_type
      | FROM events)""".stripMargin

  /** Shared Spark prep — mirror of [[E]]. */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("ts_us"),
      (expr("ts_us div 1000000") - lit(1704067200L)).as("xs"),
      col("value").cast("decimal(18,2)").as("vd"),
      col("event_type"))

  private val TauE7 = 10L // deadtime τ = 1 µs per unit rate

  /** Deadtime correction (#144): nonparalyzable correction of every
    * 'view' counter reading, rolled up per scan — observed vs
    * corrected totals and the worst per-point dead fraction. Pure
    * per-row integer math + one scan-keyed aggregate: map-side
    * combined, no skew surface, unchanged at 100 TB.
    */
  val qDeadtime = GateQuery.sql(
    "q_deadtime",
    s"""WITH e AS (SELECT user_id, ${centsSql("vd")} AS c FROM $E t
       |  WHERE event_type = 'view')
       |SELECT user_id, count(*) AS n_points,
       |  CAST(sum(c) AS BIGINT) AS obs_cents,
       |  CAST(sum(${ScanCorrect.deadtimeMicroSql("c", 10L)}) AS BIGINT) AS corr_micro,
       |  max(${ScanCorrect.deadFracPpmSql("c", 10L)}) AS max_dead_ppm
       |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type") === "view")
      .select(col("user_id"), Exact.cents(col("vd")).as("c"))
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        Exact.sumUnits(col("c")).cast("long").as("obs_cents"),
        Exact.sumUnits(ScanCorrect.deadtimeMicro(col("c"), TauE7)).cast("long")
          .as("corr_micro"),
        max(ScanCorrect.deadFracPpm(col("c"), TauE7)).as("max_dead_ppm"))
      .orderedSmall(col("user_id"))
  }

  /** Relational set operations (#145): INTERSECT / EXCEPT over the
    * click vs purchase user populations, summarized as segment
    * counts. Spark plans these as distinct-aggregate + semi/anti
    * hash joins on the key — the scalable shape (never a sort-based
    * set difference).
    */
  val qSetOps = GateQuery.sql(
    "q_set_ops",
    """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT 'both' AS segment,
      |  count(*) AS n_users FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
      |UNION ALL SELECT 'click_only', count(*)
      |  FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
      |UNION ALL SELECT 'purchase_only', count(*)
      |  FROM (SELECT * FROM p EXCEPT SELECT * FROM c)
      |ORDER BY segment""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    def users(t: String) =
      e.filter(col("event_type") === t).select(col("user_id")).distinct()
    val c = users("click")
    val p = users("purchase")
    def seg(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("segment"), col("n_users"))
    seg("both", c.intersect(p))
      .unionAll(seg("click_only", c.except(p)))
      .unionAll(seg("purchase_only", p.except(c)))
      .orderedSmall(col("segment"))
  }

  /** Int8 scalar quantization (#146): the FAISS-SQ8 storage path —
    * per-dimension [min,max] trained on the corpus, each component
    * rounded to a 0–255 code, with EXACT integer reconstruction-error
    * accounting. On the 1e-6-quantized integer vectors every step is
    * integer arithmetic: code = (a·510 + s) div (2s) (HALF_UP),
    * residual r = 255·a − code·s in (micro/255) units, error = Σ r²
    * — bit-identical on both engines with no doubles anywhere.
    * Shape: one dim-keyed aggregate (64 rows) re-attached as a 1-row
    * broadcast, then per-row expressions + one label-keyed aggregate.
    */
  val qEmbedInt8 = GateQuery.sql(
    "q_embed_int8",
    s"""WITH e AS (SELECT vec_id, label, ${VectorOps.quantizeSql("embedding")} AS q
       |  FROM embeddings),
       |d AS (SELECT t.i AS dim, min(q[t.i]) AS mn, max(q[t.i]) AS mx
       |  FROM e, unnest(generate_series(1, len(q))) AS t(i) GROUP BY 1),
       |st AS (SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs FROM d),
       |r AS (SELECT vec_id, label,
       |  CAST(list_sum([CASE WHEN mxs[i] = mns[i] THEN 0 ELSE
       |      ((q[i] - mns[i]) * 255 - (((q[i] - mns[i]) * 510 + (mxs[i] - mns[i]))
       |         // ((mxs[i] - mns[i]) * 2)) * (mxs[i] - mns[i]))
       |    * ((q[i] - mns[i]) * 255 - (((q[i] - mns[i]) * 510 + (mxs[i] - mns[i]))
       |         // ((mxs[i] - mns[i]) * 2)) * (mxs[i] - mns[i])) END
       |    for i in range(1, len(q) + 1)]) AS BIGINT) AS r2
       |  FROM e, st)
       |SELECT label, count(*) AS n_vecs,
       |  CAST(sum(r2) AS BIGINT) AS sum_r2, max(r2) AS max_r2
       |FROM r GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), VectorOps.quantize(col("embedding")).as("q"))
    val dims = e.select(posexplode(col("q")).as(Seq("p", "v")))
      .groupBy((col("p") + 1).as("dim"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val st = dims.groupBy()
      .agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx")))).as("dl"))
      .select(transform(col("dl"), x => x("mn")).as("mns"),
        transform(col("dl"), x => x("mx")).as("mxs"))
    val withSt = e.withColumn("jk", lit(1))
      .join(broadcast(st.withColumn("jk", lit(1))), "jk").drop("jk")
    val r2 = aggregate(sequence(lit(1), size(col("q"))), lit(0L), (acc, i) => {
      val a = element_at(col("q"), i) - element_at(col("mns"), i)
      val sc = element_at(col("mxs"), i) - element_at(col("mns"), i)
      val code = Binning.floorDivCol(a * lit(510L) + sc, sc * lit(2L))
      val rr = a * lit(255L) - code * sc
      acc + when(sc === 0, lit(0L)).otherwise(rr * rr)
    })
    withSt.select(col("vec_id"), col("label"), r2.as("r2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        Exact.sumUnits(col("r2")).cast("long").as("sum_r2"),
        max(col("r2")).as("max_r2"))
      .orderedSmall(col("label"))
  }

  /** Inverse-variance multi-scan merge (#147): repeated scans of the
    * same signal (all scans' 'view' points) merged onto a shared
    * hour grid with 1/σ² weights (Poisson: σ² ≈ counts, so
    * w = 1e6 div max(c,1)) and the propagated uncertainty
    * σ²_merged = 1/Σw — the pyspec "average scans with error bars"
    * operation. Integer weights make every sum exact; the merged
    * value and its variance leave via exact floor-division /
    * HALF_UP ratio only. One bucket-keyed aggregate, map-side
    * combined.
    */
  val qScanMerge = GateQuery.sql(
    "q_scan_merge",
    s"""WITH e AS (SELECT xs // 3600 AS grid, ${centsSql("vd")} AS c FROM $E t
       |  WHERE event_type = 'view'),
       |w AS (SELECT grid, c, 1000000 // greatest(c, 1) AS w FROM e),
       |a AS (SELECT grid, count(*) AS n_points,
       |    CAST(sum(w) AS BIGINT) AS sw, CAST(sum(w * c) AS BIGINT) AS swc
       |  FROM w GROUP BY grid)
       |SELECT grid, n_points, sw,
       |  ${roundedRatioSql("swc", "sw", 2)} AS merged_cents,
       |  (1000000000000 // sw) AS var_pico
       |FROM a ORDER BY grid""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type") === "view")
      .select(Binning.floorDiv(col("xs"), 3600L).as("grid"), Exact.cents(col("vd")).as("c"))
    val w = e.withColumn("w", Binning.floorDivCol(lit(1000000L), greatest(col("c"), lit(1L))))
    w.groupBy(col("grid"))
      .agg(count(lit(1)).as("n_points"),
        Exact.sumUnits(col("w")).cast("long").as("sw"),
        Exact.sumUnits(col("w") * col("c")).cast("long").as("swc"))
      .select(col("grid"), col("n_points"), col("sw"),
        Exact.roundedRatio(col("swc"), col("sw"), 2).as("merged_cents"),
        Binning.floorDivCol(lit(1000000000000L), col("sw")).as("var_pico"))
      .orderedSmall(col("grid"))
  }

  private val SnipWidths = Seq(8, 4, 2, 1)

  /** SNIP background estimation (#148): the XRF/powder iterative
    * background peeler over each scan's 'error' series, rolled up to
    * per-scan raw / background / net totals. The 4-pass clipping
    * pyramid shares one scan-keyed ordered window — a single
    * shuffle at any corpus size ([[ScanCorrect.snip]]).
    */
  val qSnipBackground = GateQuery.sql(
    "q_snip_background",
    s"""WITH ${ScanCorrect.snipSqlCtes(
          s"""SELECT user_id, ts_us, event_id, ${centsSql("vd")} AS y0
             |  FROM $E t WHERE event_type = 'error'""".stripMargin,
          "user_id", "ts_us, event_id", SnipWidths)}
       |SELECT user_id, count(*) AS n_points,
       |  CAST(sum(y0) AS BIGINT) AS raw_cents,
       |  CAST(sum(y${SnipWidths.size}) AS BIGINT) AS bg_cents,
       |  CAST(sum(y0 - y${SnipWidths.size}) AS BIGINT) AS net_cents
       |FROM s${SnipWidths.size} GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val base = ev(s, d).filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), col("event_id"), Exact.cents(col("vd")).as("y0"))
    val bg = ScanCorrect.snip(base, col("y0"), Seq(col("user_id")),
      Seq(col("ts_us"), col("event_id")), SnipWidths, "bg")
    bg.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        Exact.sumUnits(col("y0")).cast("long").as("raw_cents"),
        Exact.sumUnits(col("bg")).cast("long").as("bg_cents"),
        Exact.sumUnits(col("y0") - col("bg")).cast("long").as("net_cents"))
      .orderedSmall(col("user_id"))
  }

  val all: Seq[GateQuery] = Seq(
    qDeadtime, qSetOps, qEmbedInt8, qScanMerge, qSnipBackground)
}
