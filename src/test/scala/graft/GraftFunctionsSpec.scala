package graft

import org.apache.spark.sql.functions._
import graft.expressions.{GraftFunctions, TextExpressions, VectorExpressions}

/** The SQL function surface must be value-identical to the Column
  * API — same expressions, two front doors.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_simhash / graft_fingerprint match the Column API") {
    val df = Seq("alpha beta gamma", "delta epsilon").toDF("text")
    df.createOrReplaceTempView("t_fn")
    val sql = spark.sql(
      "SELECT graft_simhash(text) AS s, graft_fingerprint(text) AS f FROM t_fn ORDER BY text")
      .collect()
    val col_ = df.select(TextExpressions.simHash32(col("text")).as("s"),
        TextExpressions.fingerprint(col("text")).as("f"))
      .orderBy("text").collect()
    assert(sql.map(_.toString).toSeq == col_.map(_.toString).toSeq)
  }

  test("graft_minhash_sig and graft_shingle_keys take literal params") {
    val df = Seq("a b c d e f g").toDF("text")
    df.createOrReplaceTempView("t_fn2")
    val sig = spark.sql("SELECT graft_minhash_sig(text, 3, 16) AS sig FROM t_fn2")
      .collect().head.getSeq[Long](0)
    val want = df.select(TextExpressions.minHashSig(col("text"), 3, 16))
      .collect().head.getSeq[Long](0)
    assert(sig == want && sig.length == 16)
    assert(spark.sql("SELECT size(graft_shingle_keys(text, 3)) FROM t_fn2")
      .collect().head.getInt(0) == 5)
  }

  test("vector kernels compose in pure SQL (cosine via dotq/normq)") {
    Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.6f, 0.8f)))
      .toDF("id", "v").createOrReplaceTempView("t_vec")
    val c = spark.sql(
      """WITH q AS (SELECT id, graft_quantize(v) AS q FROM t_vec)
        |SELECT CAST(graft_dotq(a.q, b.q) AS DOUBLE) /
        |       (sqrt(CAST(graft_normq(a.q) AS DOUBLE)) * sqrt(CAST(graft_normq(b.q) AS DOUBLE)))
        |FROM q a JOIN q b ON a.id = 1 AND b.id = 2""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(c - 0.6) < 1e-5)
    // lsh buckets work from SQL too, same values as the Column API
    val b = spark.sql("SELECT graft_lsh_buckets(graft_quantize(v), 2, 4, 2) FROM t_vec WHERE id = 1")
      .collect().head.getSeq[Long](0)
    val want = spark.table("t_vec").filter(col("id") === 1)
      .select(VectorExpressions.lshBuckets(VectorExpressions.quantizeVec(col("v")), 2, 4, 2))
      .collect().head.getSeq[Long](0)
    assert(b == want && b.length == 2)
  }

  test("graft_bigram_buckets / graft_window_keys match the Column API") {
    Seq(("the quick brown fox jumps over", 1L)).toDF("text", "id")
      .createOrReplaceTempView("t_fn4")
    val bb = spark.sql("SELECT graft_bigram_buckets(text, 64) AS b FROM t_fn4")
      .collect().head.getSeq[Long](0)
    val bbWant = spark.table("t_fn4")
      .select(graft.operators.Curation.bigramBuckets(col("text"), 64))
      .collect().head.getSeq[Long](0)
    assert(bb == bbWant && bb.length == 5)
    val wk = spark.sql("SELECT graft_window_keys(text, 3) AS k FROM t_fn4")
      .collect().head.getSeq[Long](0)
    val wkWant = spark.table("t_fn4")
      .select(graft.operators.Curation.windowKeysOfWords(split(col("text"), " "), 3))
      .collect().head.getSeq[Long](0)
    assert(wk == wkWant && wk.length == 4)
  }

  test("non-literal integer params are rejected with a clear error") {
    Seq(("x y z", 3)).toDF("text", "k").createOrReplaceTempView("t_fn3")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_keys(text, k) FROM t_fn3").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("GraftExtensions injects the same functions at session build") {
    // cloned sessions inherit the registry; assert the extensions
    // class wires every registered name
    val ext = new GraftExtensions
    val names = graft.expressions.GraftFunctions.all.map(_._1.funcName).toSet
    assert(names.contains("graft_simhash") && names.size >= 8)
    // smoke: applying to a fresh extensions object doesn't throw
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
