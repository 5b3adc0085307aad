package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational building blocks.
  *
  * Scale notes: `topKPerGroup` is one shuffle on the group keys with
  * map-side partial sort; no driver collection. `dedupExact` is a
  * single hash aggregate (map-side combine) — at 100 TB it shuffles
  * only the digest+key columns, not payloads.
  */
object Relational {

  /** Top-k rows per group (window row_number; ordering must be total
    * for determinism — callers append a unique tiebreak column).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
                   k: Int, rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Scale-safe top-k per group: two-phase salted ranking. Phase 1
    * ranks within (group, salt) sub-partitions — each task sorts only
    * ~1/`buckets` of a group, so a hot group (or a low group count,
    * e.g. 25 nations at 100 TB) never serializes into one task.
    * Phase 2 re-ranks the surviving ≤ groups·buckets·k rows, which is
    * tiny by construction. Equivalent to a direct window when `order`
    * is a total order within each group (callers append a unique
    * tiebreak column).
    */
  def topKPerGroupSalted(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
                         k: Int, saltSrc: Column, buckets: Int = 32,
                         rankCol: String = "rnk"): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(saltSrc), lit(buckets)))
    val w1 = Window.partitionBy(groupCols :+ col("_salt"): _*).orderBy(order: _*)
    val partial = salted.withColumn("_rnk1", row_number().over(w1))
      .filter(col("_rnk1") <= k)
      .drop("_rnk1", "_salt")
    val w2 = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    partial.withColumn(rankCol, row_number().over(w2).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Exact deduplication: group rows whose `textCol` digests match and
    * keep the smallest `idCol`. Returns (keep_id, n_dups) per distinct
    * content — shuffles only (digest, id).
    */
  def dedupExact(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("content_md5"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact per-group mode (most frequent value) without a window:
    * two shuffle aggregates — count per (key, value), then
    * `max_by(value, (n, value))` per key. No per-group sort, no hot
    * window partition: a key with a billion rows still reduces
    * map-side, and ties break deterministically toward the LARGER
    * value (the struct comparison's second field).
    * Returns keys + `mode_value` + `n_mode`.
    */
  def modePerGroup(df: DataFrame, keys: Seq[Column], value: Column): DataFrame = {
    val counted = df.groupBy(keys :+ value.as("_v"): _*)
      .agg(count(lit(1)).as("_n"))
    val keyNames = counted.columns.dropRight(2).map(col(_))
    counted.groupBy(keyNames: _*)
      .agg(max(struct(col("_n"), col("_v"))).as("_m"))
      .select(keyNames :+ col("_m._v").as("mode_value") :+ col("_m._n").as("n_mode"): _*)
  }

  /** One-pass multi-level aggregate over ALL dimension subsets
    * (CUBE): each string dim is returned COALESCE'd to `totalLabel`
    * on its rolled-up levels, so downstream consumers (and the SQL
    * oracle) need no engine-specific GROUPING() bitmask. Same
    * single-shuffle expansion as `rollup` — Spark expands grouping
    * sets map-side, partial-aggregates, then shuffles once.
    */
  def cubeAgg(df: DataFrame, dims: Seq[Column], aggs: Seq[Column],
              totalLabel: String = "ALL"): DataFrame = {
    val cubed = df.cube(dims: _*).agg(aggs.head, aggs.tail: _*)
    val dimNames = cubed.columns.take(dims.length)
    val coalesced = dimNames.map(n => coalesce(col(n), lit(totalLabel)).as(n)) ++
      cubed.columns.drop(dims.length).map(col(_))
    cubed.select(coalesced: _*)
  }
}
