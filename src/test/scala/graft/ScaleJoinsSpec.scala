package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.ScaleJoins

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero shuffle") {
    val dir = Files.createTempDirectory("buckets").toString
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i")).toDF("k", "payload")
    val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "attr")
    ScaleJoins.writeBucketed(facts, "t_facts", "k", 4, s"$dir/facts")
    ScaleJoins.writeBucketed(dims, "t_dims", "k", 4, s"$dir/dims")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("t_facts").join(spark.table("t_dims"), "k")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, "bucketed join must not shuffle")
      assert(joined.count() == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_facts")
      spark.sql("DROP TABLE IF EXISTS t_dims")
    }
  }

  test("saltedJoin equals plain join on skewed keys") {
    // 90% of probe rows share one hot key
    val probe = ((1L to 900L).map(i => (7L, s"p$i")) ++
      (1L to 100L).map(i => (i % 20, s"q$i"))).toDF("k", "pv")
    val build = (0L until 20L).map(i => (i, s"b$i")).toDF("k", "bv")
    val plain = probe.join(build, "k")
      .select("k", "pv", "bv").collect().map(_.toSeq).toSet
    val salted = ScaleJoins.saltedJoin(probe, build, "k", salts = 8)
      .select("k", "pv", "bv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("saltedJoin handles MapType probes and all-duplicate rows") {
    // map-typed payload (spec motors/data shape): xxhash64 over a map
    // throws, so the salt must skip it and still spread the hot key
    val probeDf = (1L to 300L).map(i => (7L, i % 5, s"p$i")).toDF("k", "mv", "pv")
      .withColumn("motors", map(lit("m"), col("mv"))).drop("mv")
    val build = (0L until 20L).map(i => (i, s"b$i")).toDF("k", "bv")
    val plain = probeDf.drop("motors").join(build, "k")
      .select("k", "pv", "bv").collect().map(_.toSeq).toSet
    val salted = ScaleJoins.saltedJoin(probeDf, build, "k", salts = 8)
      .select("k", "pv", "bv").collect().map(_.toSeq).toSet
    assert(salted == plain)

    // byte-identical duplicate probe rows (only k + a constant, and k
    // IS the join key): content-hash would collapse onto one salt, so
    // the id-based fallback must spread them
    val dups = (1L to 400L).map(_ => Tuple1(7L)).toDF("k")
    val out = ScaleJoins.saltedJoin(dups, build, "k", salts = 8)
    assert(out.count() == 400L)
    val spread = dups
      .withColumn("_salt", floor(rand(8L) * 8).cast("long"))
      .select("_salt").distinct().count()
    assert(spread > 4, "duplicate rows must spread across salts")
  }

  test("salt assignment is deterministic across runs and partitionings") {
    val rows = (1L to 500L).map(i => (7L, s"p$i")).toDF("k", "pv")
    def salts(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("_salt", pmod(xxhash64(col("k"), col("pv")), lit(8L)))
      .select("pv", "_salt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = salts(rows.repartition(2))
    val b = salts(rows.repartition(13))
    assert(a == b, "salt must be a pure function of row content, not layout")
    // and the hot key genuinely spreads over several salt buckets
    assert(a.values.toSet.size > 4)
  }
}
