package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions hook: `--conf spark.sql.extensions=
  * graft.GraftExtensions` (or `builder.withExtensions`) injects every
  * `graft_*` SQL function at session build — the config-only path for
  * SQL-first users and JDBC/Thrift front-ends.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.expressions.GraftFunctions.all.foreach(ext.injectFunction)
}
