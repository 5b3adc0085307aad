package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the cluster-scale cases Catalyst cannot fix
  * alone: repeated co-located joins (bucketing) and heavy key skew
  * (salting — complementing AQE's runtime skew splitting, which only
  * applies to sort-merge joins it can observe).
  */
object ScaleJoins {

  /** Persist `df` as a parquet table bucketed AND sorted by
    * `bucketCol` (hive-compatible bucket metadata via the session
    * catalog). Two tables bucketed the same way join with ZERO
    * shuffle and zero sort — the classic layout for a fact table
    * joined repeatedly on the same key (e.g. a document store joined
    * by doc_id by every pipeline stage).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Skew-safe inner equi-join on `key`: the (small-ish but above
    * broadcast threshold) `build` side is replicated `salts` times;
    * each `probe` row picks one replica, so a hot key's rows spread
    * over `salts` tasks instead of one straggler. Row-to-salt
    * assignment does not affect the RESULT (every replica carries the
    * full build side for its key), only the distribution.
    *
    * The salt is `xxhash64` over the probe row's own columns — a pure
    * function of row CONTENT, so two runs (or a stage retry) assign
    * identical salts regardless of partition layout, unlike
    * `monotonically_increasing_id`-based salting whose distribution
    * depends on how the input happened to be split. (Caveat: rows that
    * are byte-identical across ALL columns share a salt — a corpus of
    * literal duplicate rows should be exact-deduped first, which a
    * pipeline wants anyway.)
    *
    * Output columns = probe ++ build-minus-key, like a plain
    * `probe.join(build, key)`.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltCols = probe.columns.map(col).toSeq
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(saltCols: _*), lit(salts.toLong)))
    val replicatedBuild = build.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedProbe.join(replicatedBuild, Seq(key, "_salt")).drop("_salt")
  }
}
