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
}
