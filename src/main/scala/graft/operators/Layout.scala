package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data-layout operators — the write-side half of the 100 TB
  * story. Shuffles are avoided at READ time by paying once at WRITE
  * time:
  *
  *  - [[writeBucketed]] — hash-bucketed, per-bucket-sorted persistent
  *    tables (Spark's native bucketing, the Hive-compatible layout).
  *    Two tables bucketed on the same key with the same bucket count
  *    join WITHOUT any Exchange: every executor reads matching
  *    buckets side by side (asserted by LayoutSpec). At 100 TB this
  *    converts the nightly fact⋈fact join from a full corpus shuffle
  *    into a zero-shuffle sort-merge.
  *
  *  - [[writePartitioned]] — directory-partitioned parquet
  *    (`partitionBy`), the coarse pruning axis: an equality/IN filter
  *    on the partition column prunes entire directories at PLANNING
  *    time (PartitionFilters in the scan, asserted by LayoutSpec) —
  *    the batch analogue of the SPEC/SPE/EDF sources' frame pruning.
  *
  * Both compose with [[Binning]]'s Z-order clustering (#120) for
  * min/max pruning WITHIN a partition or bucket.
  */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table
    * registered as `table` (path = warehouse default). Bucket count
    * must match across relations that want co-located joins.
    *
    * Idempotent across JVMs: a managed-table location left by a
    * PREVIOUS session isn't in this session's catalog, so a bare
    * `mode(overwrite).saveAsTable` refuses with
    * LOCATION_ALREADY_EXISTS — the table is dropped from the catalog
    * AND its stale warehouse directory removed first. The cleanup
    * goes through the Hadoop FileSystem resolved from the warehouse
    * URI, so it works for hdfs:// and s3a:// warehouses, not just
    * local file:// (a java.io.File delete silently no-ops there and
    * leaves LOCATION_ALREADY_EXISTS unfixed). The table name is
    * validated before any path is built from it — a name carrying a
    * path separator or `..` must never become a recursive delete
    * target.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(table.nonEmpty && table.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_'),
      s"writeBucketed: table name must be [A-Za-z0-9_]+, got '$table' — " +
        "it is concatenated into the warehouse path that gets deleted")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath)
    val loc = new org.apache.hadoop.fs.Path(warehouse, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "snappy")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two same-key same-count bucketed tables — planned WITHOUT a
    * shuffle (LayoutSpec asserts zero Exchange). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Write `df` directory-partitioned by `partCol` under `path`. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.format("parquet")
      .partitionBy(partCol)
      .mode("overwrite")
      .save(path)
}
