package graft

/** Every gate query runs end-to-end at sf0.001 and returns rows.
  * (Value-level correctness is the driver's DuckDB oracle gate —
  * replayed locally via tools/verify_local.py.)
  */
class GateQueriesSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every SQL-oracle query key has matching column aliases contract") {
    // oracleSql keys must be a subset of queries keys
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
