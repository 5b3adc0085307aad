package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gate query: a Spark implementation plus (optionally) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Conventions (see SURVEY.md §4):
  *  - every computed column is aliased identically on both sides;
  *  - every query ends in a deterministic total ORDER BY;
  *  - floating outputs are `round(x, k)` so cross-engine float-sum
  *    ordering differences are absorbed;
  *  - timestamps never returned raw (epoch seconds / DATE instead).
  */
final case class GateQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GateQuery {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, run, None)
}
