package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * reproducibility primitives of a training-data pipeline. A row's
  * fate depends only on its id (portable md5 `base_hash`, SURVEY §4),
  * never on partitioning, row order, executor count or a seed stream,
  * so reruns, backfills and cross-engine audits all agree row-for-row
  * (unlike `df.sample`, whose outcome depends on partition layout).
  *
  * Both are stateless per-row expressions: zero shuffle, fully
  * codegen-compatible, trivially pushed past joins.
  */
object Sampling {

  /** The sampling bucket of an id: base_hash(prefix:id) mod 100. */
  private def bucket(id: Column, prefix: String): Column =
    pmod(TextOps.baseHash(concat(lit(prefix + ":"), id.cast("string"))), lit(100L))

  private def bucketSql(idSql: String, prefix: String): String =
    s"(${TextOps.baseHashSql(s"'$prefix:' || CAST($idSql AS VARCHAR)")} % 100)"

  /** The membership predicate of a ~pct% deterministic sample. */
  def samplePredicate(id: Column, pct: Int,
                      prefix: String = "sample"): Column =
    bucket(id, prefix) < pct

  /** Keep ~pct% of rows, deterministically by id. */
  def sampleByHash(df: DataFrame, id: Column, pct: Int,
                   prefix: String = "sample"): DataFrame =
    df.filter(samplePredicate(id, pct, prefix))

  /** DuckDB mirror of [[sampleByHash]]'s predicate. */
  def sampleByHashSql(idSql: String, pct: Int,
                      prefix: String = "sample"): String =
    s"${bucketSql(idSql, prefix)} < $pct"

  /** Assign each row a split label by hash bucket:
    * [0, trainPct) → train, [trainPct, trainPct+valPct) → val,
    * rest → test. */
  def assignSplit(df: DataFrame, id: Column, trainPct: Int, valPct: Int,
                  prefix: String = "split"): DataFrame = {
    val b = bucket(id, prefix)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** DuckDB mirror of [[assignSplit]]'s label expression. */
  def assignSplitSql(idSql: String, trainPct: Int, valPct: Int,
                     prefix: String = "split"): String =
    s"""CASE WHEN ${bucketSql(idSql, prefix)} < $trainPct THEN 'train'
       |     WHEN ${bucketSql(idSql, prefix)} < ${trainPct + valPct} THEN 'val'
       |     ELSE 'test' END""".stripMargin

  /** Stratified deterministic sampling: each stratum keeps its own
    * rate (the corpus-rebalancing move — e.g. keep 10% of English but
    * all of a low-resource language). A row's bucket still depends
    * ONLY on its id, so raising a stratum's pct grows that stratum's
    * sample as a superset of the smaller one (nested samples), and
    * re-labelling a row's stratum never reshuffles which bucket it
    * occupies. Per-row expression — zero shuffle at any scale.
    *
    * @param rates stratum value → keep-percent; strata not listed
    *              fall back to `defaultPct`
    */
  def stratifiedPredicate(id: Column, stratum: Column, rates: Seq[(String, Int)],
                          defaultPct: Int, prefix: String = "strat"): Column = {
    val pct = rates.foldRight(lit(defaultPct)) { case ((v, p), acc) =>
      when(stratum === v, lit(p)).otherwise(acc)
    }
    bucket(id, prefix) < pct
  }

  /** Keep each stratum at its own rate, deterministically by id. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Seq[(String, Int)], defaultPct: Int,
                       prefix: String = "strat"): DataFrame =
    df.filter(stratifiedPredicate(id, stratum, rates, defaultPct, prefix))

  /** DuckDB mirror of [[stratifiedPredicate]]. */
  def stratifiedSampleSql(idSql: String, stratumSql: String,
                          rates: Seq[(String, Int)], defaultPct: Int,
                          prefix: String = "strat"): String = {
    val cases = rates.map { case (v, p) => s"WHEN $stratumSql = '$v' THEN $p" }
      .mkString(" ")
    s"${bucketSql(idSql, prefix)} < (CASE $cases ELSE $defaultPct END)"
  }
}
