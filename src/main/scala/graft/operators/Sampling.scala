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

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement
    * (2006): each row scores key = ln(u)/w with u a portable md5
    * draw in (0, 1] and w its positive integer weight; the k
    * LARGEST keys per stratum are a weighted sample without
    * replacement. Deterministic (fate is a pure function of the id),
    * stateless per-row scoring + one rank window per stratum — the
    * same two-stage shape as every top-k in the engine. Rows with
    * w ≤ 0 are excluded (zero mass cannot be drawn).
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     strata: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"sample size out of range: $k")
    // 20-bit md5 slice -> u in (0, 1]: (draw + 1) / 2^20
    val draw = conv(substring(md5(concat(lit("es:"), id.cast("string"))), 1, 5), 16, 10)
      .cast("long")
    val key = log((draw + 1).cast("double") / lit((1L << 20).toDouble)) /
      weight.cast("double")
    val pre = df.filter(weight > 0)
      .withColumn("_es_key", key)
      .withColumn("_es_id", id)
    val strataNames = strata.zipWithIndex.map { case (c, i) => c.as(s"_st$i") }
    val withStrata = pre.select(col("*") +: strataNames: _*)
    val w = Window.partitionBy(strata.indices.map(i => col(s"_st$i")): _*)
      .orderBy(col("_es_key").desc, col("_es_id"))
    val filtered = withStrata.withColumn("_es_rn", row_number().over(w))
      .filter(col("_es_rn") <= k)
      .drop("_es_key", "_es_id", "_es_rn")
    strata.indices.foldLeft(filtered) { (acc, i) =>
      acc.withColumnRenamed(s"_st$i",
        if (strata.size == 1) "stratum" else s"stratum_$i")
    }
  }

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
