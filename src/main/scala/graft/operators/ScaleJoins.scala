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
    * The salt is `xxhash64` over the probe row's HASHABLE columns — a
    * pure function of row content, so two runs (or a stage retry)
    * assign identical salts regardless of partition layout, unlike
    * `monotonically_increasing_id`-based salting whose distribution
    * depends on how the input happened to be split. MapType columns
    * (e.g. spec `motors`/`data`) are excluded — Spark disallows
    * hashing maps (their entry order is undefined). When no hashable
    * column exists, or the hashable columns are all part of the join
    * key (so every row of a hot key would collide onto ONE salt), a
    * `rand(seed)`-based salt is used instead: still deterministic for
    * a fixed seed AND task re-execution (rand reseeds per partition),
    * and it spreads byte-identical duplicate rows, which the
    * content-hash cannot. (Content-hash keeps the edge for the common
    * case: identical salting across DIFFERENT partition layouts of
    * the same data.)
    *
    * Output columns = probe ++ build-minus-key, like a plain
    * `probe.join(build, key)`.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = probe.schema.fields.collect {
      case f if !hasMap(f.dataType) => f.name
    }.toSeq
    val salt =
      if (hashable.isEmpty || hashable.forall(_ == key))
        floor(rand(salts.toLong) * salts).cast("long")
      else pmod(xxhash64(hashable.map(col): _*), lit(salts.toLong))
    val saltedProbe = probe.withColumn("_salt", salt)
    val replicatedBuild = build.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedProbe.join(replicatedBuild, Seq(key, "_salt")).drop("_salt")
  }
}
