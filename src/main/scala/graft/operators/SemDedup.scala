package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions

/** Semantic near-duplicate removal over an embedding column —
  * SemDeDup (Abbas et al. 2023, public): two documents are semantic
  * duplicates when their embeddings' cosine exceeds a threshold, and
  * the corpus keeps ONE representative per duplicate group.
  *
  * Scale design: pairs are only formed WITHIN a coarse k-means cell
  * ([[IvfIndex]] assignment — the paper's clustering step), never
  * corpus². A cell of M members forms ≤ M·(M−1)/2 pairs, so the
  * production bound MUST be a row count: `maxCellDf` drops cells
  * beyond a hard membership cap before any pair forms (boilerplate-
  * embedding mass, same rationale as [[Dedup.suggestedBandDfCap]]).
  * [[IvfIndex.rebalance]]'s `maxCellFrac` complements it by SPLITTING
  * oversized cells — but a fraction alone is not a bound: 25% of a
  * 100 TB corpus is still quadratic death, so always pass a concrete
  * `maxCellDf` in production (the gate uses 100k). The only shuffles
  * are the cell-keyed join and the pair-list connected components.
  *
  * The trade against [[Dedup]]'s MinHash and the LSH near-dup: this
  * catches PARAPHRASES (same meaning, different surface form), which
  * no shingle or hyperplane-bucket method sees.
  */
object SemDedup {

  /** Within-cell candidate pairs with cosine >= tau.
    * @param assigned (vec_id, q, n, cell) rows — [[IvfIndex.assign]]
    *                 output with the quantized vector and its norm
    * @param maxCellDf 0 = off; otherwise cells with more members are
    *                  dropped BEFORE any pair is formed
    */
  def pairs(assigned: DataFrame, tau: Double, maxCellDf: Int = 0): DataFrame = {
    val base =
      if (maxCellDf <= 0) assigned
      else {
        val small = assigned.groupBy(col("cell"))
          .agg(count(lit(1)).as("_cnt")).filter(col("_cnt") <= maxCellDf)
          .select(col("cell"))
        assigned.join(small, Seq("cell"), "left_semi")
      }
    val a = base.select(col("cell"), col("vec_id").as("vec_a"),
      col("q").as("qa"), col("n").as("na"))
    val b = base.select(col("cell"), col("vec_id").as("vec_b"),
      col("q").as("qb"), col("n").as("nb"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        VectorOps.cosineQ(VectorExpressions.dotQ(col("qa"), col("qb")),
          col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Full pass: every vector labelled with its duplicate group (the
    * smallest vec_id reachable through within-cell cosine>=tau pairs,
    * via [[Dedup.connectedComponents]]) and a keep flag — true for
    * the group representative and for singletons.
    *
    * @return (vec_id, group_id, keep)
    */
  def dedup(assigned: DataFrame, tau: Double, maxCellDf: Int = 0): DataFrame = {
    val p = pairs(assigned, tau, maxCellDf)
    val labels = Dedup.connectedComponents(p, "vec_a", "vec_b")
      .withColumnRenamed("doc_id", "vec_id")
    assigned.select(col("vec_id"))
      .join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("group_id"))
      .withColumn("keep", col("group_id") === col("vec_id"))
  }
}
