package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Exact, Relational}
import graft.operators.Exact.roundedRatioSql

/** Core relational gate queries (SURVEY.md §2 #1–#6).
  *
  * TPC-H-shaped plans: selective filters are applied before joins (so
  * parquet pushdown sees them), dimension sides are broadcast, fact
  * joins shuffle only on their keys after column pruning.
  *
  * Numerics (SURVEY.md §4 + round-1 ADVICE): every money aggregate is
  * exact and order-independent on BOTH engines. Per-row values become
  * integer cents via the IEEE floor-cents derivation
  * ([[graft.operators.Exact.centsOfDouble]] — no per-row BigDecimal in
  * the codegen hot loop), products like `pc*(100-dc)` stay in long
  * units, and distributed sums run through [[Exact.sumUnits]]'
  * decimal(38) buffer so nothing wraps at 100 TB. Doubles appear only
  * after the final HALF_UP integer rounding.
  */
object CoreQueries {

  // Shared exact-cents lineitem money math: per-row products in pure
  // long arithmetic (the IEEE floor-cents derivation is proven equal
  // to the decimal cast on this data, see Exact.centsOfDouble), sums
  // overflow-safe via Exact.sumUnits' decimal(38) buffer.
  /** Discounted price pc*(100-dc) in 1e-4-dollar integer units. */
  private def dpE4 =
    Exact.centsOfDouble(col("l_extendedprice")) *
      (lit(100L) - Exact.centsOfDouble(col("l_discount")))

  /** SQL fragment mirroring [[dpE4]]. */
  private val DpE4Sql =
    s"(${Exact.centsOfDoubleSql("l_extendedprice")} * (100 - ${Exact.centsOfDoubleSql("l_discount")}))"

  /** round(sum(dpE4)/1e4, 2) as DOUBLE — the `revenue` aggregate. */
  private def revenueAgg =
    Exact.unitsToCents(Exact.sumUnits(dpE4), 100L).cast("double") / 100.0

  /** SQL fragment mirroring [[revenueAgg]]. */
  private val RevenueAggSql =
    s"CAST(${Exact.unitsToCentsSql(s"sum($DpE4Sql)", 100L)} AS DOUBLE) / 100.0"

  val q01 = GateQuery.sql(
    "q01_pricing_summary",
    s"""WITH li AS (SELECT l_returnflag, l_linestatus,
       |    ${Exact.centsOfDoubleSql("l_quantity")} AS qc,
       |    ${Exact.centsOfDoubleSql("l_extendedprice")} AS pc,
       |    ${Exact.centsOfDoubleSql("l_discount")} AS dc,
       |    ${Exact.centsOfDoubleSql("l_tax")} AS tc
       |  FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'),
       |ag AS (SELECT l_returnflag, l_linestatus,
       |    sum(qc) AS sqc, sum(pc) AS spc, sum(dc) AS sdc,
       |    sum(pc * (100 - dc)) AS sdp,
       |    sum(pc * (100 - dc) * (100 + tc)) AS sch,
       |    count(*) AS count_order
       |  FROM li GROUP BY l_returnflag, l_linestatus)
       |SELECT l_returnflag, l_linestatus,
       |  CAST(sqc AS DOUBLE) / 100.0 AS sum_qty,
       |  CAST(spc AS DOUBLE) / 100.0 AS sum_base_price,
       |  CAST(${Exact.unitsToCentsSql("sdp", 100L)} AS DOUBLE) / 100.0 AS sum_disc_price,
       |  CAST(${Exact.unitsToCentsSql("sch", 10000L)} AS DOUBLE) / 100.0 AS sum_charge,
       |  ${roundedRatioSql("sqc", "count_order * 100", 4)} AS avg_qty,
       |  ${roundedRatioSql("spc", "count_order * 100", 4)} AS avg_price,
       |  ${roundedRatioSql("sdc", "count_order * 100", 4)} AS avg_disc,
       |  count_order
       |FROM ag ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val qc = Exact.centsOfDouble(col("l_quantity"))
    val pc = Exact.centsOfDouble(col("l_extendedprice"))
    val dc = Exact.centsOfDouble(col("l_discount"))
    val tc = Exact.centsOfDouble(col("l_tax"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast("date") <= lit("2000-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.sumUnits(qc).as("sqc"),
        Exact.sumUnits(pc).as("spc"),
        Exact.sumUnits(dc).as("sdc"),
        Exact.sumUnits(pc * (lit(100L) - dc)).as("sdp"),
        Exact.sumUnits(pc * (lit(100L) - dc) * (lit(100L) + tc)).as("sch"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("sqc").cast("double") / 100.0).as("sum_qty"),
        (col("spc").cast("double") / 100.0).as("sum_base_price"),
        (Exact.unitsToCents(col("sdp"), 100L).cast("double") / 100.0).as("sum_disc_price"),
        (Exact.unitsToCents(col("sch"), 10000L).cast("double") / 100.0).as("sum_charge"),
        Exact.roundedRatio(col("sqc"), col("count_order") * lit(100L), 4).as("avg_qty"),
        Exact.roundedRatio(col("spc"), col("count_order") * lit(100L), 4).as("avg_price"),
        Exact.roundedRatio(col("sdc"), col("count_order") * lit(100L), 4).as("avg_disc"),
        col("count_order"))
      .orderedSmall(col("l_returnflag"), col("l_linestatus"))
  }

  val q03 = GateQuery.sql(
    "q03_shipping_priority",
    s"""SELECT l.l_orderkey AS l_orderkey,
       |  CAST(o.o_orderdate AS DATE) AS o_odate,
       |  o.o_orderpriority AS o_orderpriority,
       |  $RevenueAggSql AS revenue
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |WHERE c.c_mktsegment = 'BUILDING'
       |  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
       |  AND CAST(l.l_shipdate AS DATE) > DATE '1997-01-01'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 20""".stripMargin) { (s, d) =>
    val c = broadcast(
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast("date") > lit("1997-01-01").cast("date"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    o.join(c, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_odate"), col("o_orderpriority"))
      .agg(revenueAgg.as("revenue"))
      .orderedSmall(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  val q04 = GateQuery.sql(
    "q04_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderedSmall(col("o_orderpriority"))
  }

  val q05 = GateQuery.sql(
    "q05_local_supplier",
    s"""SELECT n_name, $RevenueAggSql AS revenue
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = 'ASIA'
       |  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, d)
    val supplier = Tables.supplier(s, d)
    // nation ⋈ region ⋈ supplier is tiny → broadcast the combined dim.
    val dims = broadcast(
      supplier.join(nation, col("s_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate").cast("date") < lit("1998-01-01").cast("date"))
      .select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(dims, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenueAgg.as("revenue"))
      .orderedSmall(col("revenue").desc, col("n_name"))
  }

  val qTopkCustomers = GateQuery.sql(
    "q_topk_customers",
    s"""WITH rev AS (
      |  SELECT o_custkey, CAST(sum(${Exact.centsOfDoubleSql("o_totalprice")}) AS DOUBLE) / 100.0 AS revenue
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT n_name, c_name, revenue,
      |  CAST(row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rnk
      |FROM rev
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |QUALIFY rnk <= 3
      |ORDER BY n_name, rnk""".stripMargin) { (s, d) =>
    val rev = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg((Exact.sumUnits(Exact.centsOfDouble(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
    val joined = rev
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
    Relational.topKPerGroupSalted(joined, Seq(col("n_name")),
        Seq(col("revenue").desc, col("c_custkey")), 3, col("c_custkey"))
      .select("n_name", "c_name", "revenue", "rnk")
      .orderedSmall(col("n_name"), col("rnk"))
  }

  val qPivotEvents = GateQuery.sql(
    "q_pivot_events",
    s"""SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
      |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
      |  CAST(sum(${Exact.centsOfDoubleSql("value")}) AS DOUBLE) / 100.0 AS total_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    def n(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(n("click"), n("view"), n("purchase"), n("signup"), n("error"),
        (Exact.sumUnits(Exact.centsOfDouble(col("value"))).cast("double") / 100.0).as("total_value"))
      .orderedSmall(col("user_id"))
  }

  /** Anti-join (NOT EXISTS) — the complement of q04's semi-join:
    * customers with no RECENT order (lapsed customers), counted per
    * nation. The date filter pushes into the orders scan BEFORE the
    * anti-join, so `left_anti` shuffles only the surviving key
    * column; the nation dimension broadcasts.
    */
  val qAntiJoin = GateQuery.sql(
    "q_anti_join",
    """SELECT n.n_name AS n_name, count(*) AS n_lapsed
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND CAST(o.o_orderdate AS DATE) >= DATE '2001-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate").cast("date") >= lit("2001-01-01").cast("date"))
      .select(col("o_custkey"))
    Tables.customer(s, d)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_lapsed"))
      .orderedSmall(col("n_name"))
  }

  /** Rollup aggregation — multi-level totals in one pass (per
    * (returnflag, linestatus), per returnflag, grand total), the
    * GROUPING SETS shape of report queries. Decimal sums keep the
    * hash exact at every level.
    */
  val qRollup = GateQuery.sql(
    "q_rollup",
    s"""SELECT
      |  CASE WHEN l_returnflag IS NULL THEN 'ALL' ELSE l_returnflag END AS rflag,
      |  CASE WHEN l_linestatus IS NULL THEN 'ALL' ELSE l_linestatus END AS lstatus,
      |  CAST(sum(${Exact.centsOfDoubleSql("l_quantity")}) AS DOUBLE) / 100.0 AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin) { (s, d) =>
    // collapse to leaf cells before the grouping-set expand (sums and
    // counts re-aggregate exactly) — the expand multiplies 6 partial
    // rows instead of the whole fact table, same as q_cube
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(Exact.sumUnits(Exact.centsOfDouble(col("l_quantity"))).as("_q"),
        count(lit(1)).as("_n"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(col("_q")).cast("double") / 100.0).as("sum_qty"),
        sum(col("_n")).as("n_rows"))
      .select(
        when(col("l_returnflag").isNull, "ALL").otherwise(col("l_returnflag")).as("rflag"),
        when(col("l_linestatus").isNull, "ALL").otherwise(col("l_linestatus")).as("lstatus"),
        col("sum_qty"), col("n_rows"))
      .orderedSmall(col("rflag"), col("lstatus"))
  }

  /** #119 — data profiling (ANALYZE/SUMMARIZE surface): per-column
    * count/null/distinct/min/max in one pass
    * ([[graft.operators.Profile]]). The gate runs the exact mode
    * (oracle-able); the Expand-free `approx_count_distinct` scale
    * mode is spec-pinned with an error bound.
    */
  val qProfile = {
    val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
    val unions = cols.map { c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    GateQuery.sql("q_profile", s"""$unions\nORDER BY "column"""") { (s, d) =>
      graft.operators.Profile.profile(Tables.lineitem(s, d), cols)
        .orderedSmall(col("column"))
    }
  }

  /** #120 — Z-order (Morton) clustering key: the `OPTIMIZE ZORDER`
    * layout value over (l_partkey, l_suppkey), grid bounds data-driven
    * (histogram-gate pattern, single-row broadcast). The z-value is a
    * statically-unrolled shift/mask expression — zero shuffle; the
    * layout rewrite itself ([[graft.operators.Locality.clusterByZ]])
    * is one range shuffle, rectangle-compactness spec-pinned.
    */
  val qZorder = {
    import graft.operators.Locality
    val bits = 10
    GateQuery.sql(
      "q_zorder",
      s"""WITH st AS (SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
         |    min(l_suppkey) AS slo, max(l_suppkey) AS shi FROM lineitem),
         |g AS (SELECT l_orderkey, l_linenumber,
         |    ${Locality.gridCellSql("l_partkey", "plo", "phi", bits)} AS gx,
         |    ${Locality.gridCellSql("l_suppkey", "slo", "shi", bits)} AS gy
         |  FROM lineitem, st)
         |SELECT l_orderkey, l_linenumber, ${Locality.zValueSql("gx", "gy", bits)} AS z
         |FROM g ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val st = li.agg(min(col("l_partkey")).as("plo"), max(col("l_partkey")).as("phi"),
        min(col("l_suppkey")).as("slo"), max(col("l_suppkey")).as("shi"))
      graft.operators.Curation.withStats(li, st)
        .select(col("l_orderkey"), col("l_linenumber"),
          Locality.zValue(
            Locality.gridCell(col("l_partkey"), col("plo"), col("phi"), bits),
            Locality.gridCell(col("l_suppkey"), col("slo"), col("shi"), bits),
            bits).as("z"))
        .orderedSmall(col("l_orderkey"), col("l_linenumber"))
    }
  }

  /** #127 — full outer join, summarized to presence-flag counts so
    * the gate exercises the FullOuter physical path (sort-merge with
    * both-side null generation) without a row-explosion output.
    */
  val qFullOuter = GateQuery.sql(
    "q_full_outer",
    """WITH cs AS (SELECT c_custkey AS ck FROM customer WHERE c_custkey % 2 = 0),
      |os AS (SELECT o_orderkey AS ok, o_custkey FROM orders WHERE o_custkey % 3 = 0),
      |j AS (SELECT ck, ok FROM cs FULL OUTER JOIN os ON ck = o_custkey)
      |SELECT CASE WHEN ck IS NULL THEN 0 ELSE 1 END AS has_cust,
      |  CASE WHEN ok IS NULL THEN 0 ELSE 1 END AS has_order,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM j GROUP BY 1, 2 ORDER BY has_cust, has_order""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("ck"))
      .join(Tables.orders(s, d).filter(col("o_custkey") % 3 === 0)
          .select(col("o_orderkey").as("ok"), col("o_custkey")),
        col("ck") === col("o_custkey"), "full_outer")
      .select(when(col("ck").isNull, 0).otherwise(1).as("has_cust"),
        when(col("ok").isNull, 0).otherwise(1).as("has_order"))
      .groupBy(col("has_cust"), col("has_order"))
      .agg(count(lit(1)).as("n"))
      .orderedSmall(col("has_cust"), col("has_order"))
  }

  /** #436 — bucketed-layout co-located join (r11): write BOTH fact
    * sides bucketed + per-bucket-sorted on the join key
    * ([[graft.operators.Layout.writeBucketed]]), then join the
    * bucketed TABLES — planned with ZERO Exchange (LayoutSpec pins
    * the shuffle-free plan; this gate puts the layout twin's VALUES
    * under the DuckDB oracle, which computes the same aggregate off
    * the raw parquet). The 100 TB rationale: pay the bucketed write
    * once, and every following same-key fact⋈fact join is co-located
    * — the nightly-join shape bucketing exists for. The gate bills
    * write + join, the honest cost of adopting the layout.
    */
  val qBucketedJoin = GateQuery.sql(
    "q_bucketed_join",
    s"""SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_orders,
       |  CAST(sum(${Exact.centsOfDoubleSql("o.o_totalprice")}) AS BIGINT) AS total_cents
       |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |GROUP BY 1 ORDER BY segment""".stripMargin) { (s, d) =>
    import graft.operators.Layout
    Layout.writeBucketed(Tables.orders(s, d)
        .select(col("o_custkey").as("custkey"),
          Exact.centsOfDouble(col("o_totalprice")).as("pc")),
      "g_orders_bkt", "custkey", 8)
    Layout.writeBucketed(Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment")),
      "g_cust_bkt", "custkey", 8)
    Layout.bucketedJoin(s, "g_orders_bkt", "g_cust_bkt", "custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("pc")).cast("long").as("total_cents"))
      .select(col("c_mktsegment").as("segment"), col("n_orders"), col("total_cents"))
      .orderedSmall(col("segment"))
  }

  val all: Seq[GateQuery] = Seq(q01, q03, q04, q05, qTopkCustomers, qPivotEvents,
    qAntiJoin, qRollup, qProfile, qZorder, qFullOuter, qBucketedJoin)
}
