package graft

import org.apache.spark.sql.functions._
import graft.expressions.CompressExpressions

class CompressSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: String*): Seq[Long] =
    texts.toSeq.toDF("t")
      .select(CompressExpressions.deflateRatioPpm(col("t")).as("r"))
      .collect().map(_.getLong(0)).toSeq

  test("repetitive text compresses far below natural prose; junk refuses") {
    val repetitive = ("spam " * 400).trim
    val prose = ("the quick brown fox jumps over the lazy dog and then wanders " +
      "through seventeen distinct meadows describing each flower it encounters " +
      "in exhaustive and never repeating botanical detail ") * 8
    val rnd = new scala.util.Random(42)
    val junk = Array.fill(2000)((rnd.nextInt(94) + 33).toChar).mkString
    val Seq(r1, r2, r3) = ratios(repetitive, prose, junk)
    assert(r1 < 100000, s"repetitive ratio $r1")
    assert(r2 > r1 && r2 < 900000, s"prose ratio $r2")
    assert(r3 > 500000, s"junk ratio $r3")
    assert(r1 < r2 && r2 < r3)
  }

  test("deterministic across partitionings and empty input is 1e6") {
    val docs = (1 to 50).map(i => s"document $i " * (i % 7 + 1)).toDF("t")
    val a = docs.select(CompressExpressions.deflateRatioPpm(col("t")).as("r"))
      .collect().map(_.getLong(0)).toSeq
    val b = docs.repartition(7)
      .select(CompressExpressions.deflateRatioPpm(col("t")).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(a.sorted === b.sorted)
    assert(ratios("") === Seq(1000000L))
  }

  test("stays inside a whole-stage-codegen span (no CodegenFallback row)") {
    // non-literal input so the projection can't constant-fold away
    val df = spark.range(100)
      .select(CompressExpressions.deflateRatioPpm(
        concat(lit("doc "), col("id").cast("string"))).as("r"))
      .filter(col("r") >= 0)
    // "*(1)" prefixes = operators inside a whole-stage-codegen stage;
    // a CodegenFallback expression would strip the star from Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
