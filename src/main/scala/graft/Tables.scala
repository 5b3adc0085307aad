package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst keeps full
  * filter/column pushdown and partition pruning; at cluster scale the
  * same code reads a partitioned table directory unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Footer-derived schema per table path, what a metastore catalog
  // would hold: repeated loads of the same immutable table skip the
  // per-query footer schema-inference round (pure metadata — the scan,
  // pushdown and results are identical). Keyed by path only, so it is
  // session-independent and bounded by the table count.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.putIfAbsent(path, df.schema)
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read
    * natively; read it as raw epoch-nanos long (runtime-settable legacy
    * conf) and expose `ts_ns` (long), `ts_us` (long, µs-truncated —
    * EXACTLY what DuckDB's `epoch_us(ts)` yields after its ns→µs
    * parquet truncation, so every cross-engine time comparison uses
    * `ts_us`, never raw ns) and `ts_sec` (double seconds).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts_ns div 1000"))
      .withColumn("ts_sec", org.apache.spark.sql.functions.col("ts_ns") / 1e9)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
