package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** All gate queries from every module (SURVEY.md §2 inventory). */
  def gateQueries: Seq[GateQuery] =
    CoreQueries.all ++ ScanQueries.all ++ TextQueries.all ++ EmbeddingQueries.all ++
      ExtendedQueries.all ++ CcdQueries.all ++ CurationQueries.all ++
      AnalysisQueries.all ++ StatsQueries.all ++ EvalQueries.all ++ AuditQueries.all ++
      OpsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    gateQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    gateQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
