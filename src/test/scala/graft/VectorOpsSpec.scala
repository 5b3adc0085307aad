package graft

import org.apache.spark.sql.functions._
import graft.operators._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quantize floors to exact 1e-6 fixed point") {
    val df = Seq(Seq(0.5f, -0.25f, 1.0f)).toDF("v")
    val q = df.select(VectorOps.quantize(col("v"))).as[Seq[Long]].head()
    assert(q == Seq(500000L, -250000L, 1000000L))
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((Seq(0.3f, -0.7f, 0.2f), Seq(0.3f, -0.7f, 0.2f))).toDF("a", "b")
    val c = df.select(
      VectorOps.cosineQ(
        VectorOps.dotQ(VectorOps.quantize(col("a")), VectorOps.quantize(col("b"))),
        VectorOps.normQ(VectorOps.quantize(col("a"))),
        VectorOps.normQ(VectorOps.quantize(col("b"))))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("orthogonal vectors have cosine 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    val c = df.select(
      VectorOps.cosineQ(
        VectorOps.dotQ(VectorOps.quantize(col("a")), VectorOps.quantize(col("b"))),
        VectorOps.normQ(VectorOps.quantize(col("a"))),
        VectorOps.normQ(VectorOps.quantize(col("b"))))).as[Double].head()
    assert(c == 0.0)
  }

  test("lshBucket is deterministic and within range") {
    val df = Seq(Seq.fill(64)(0.1f), Seq.fill(64)(-0.1f)).toDF("v")
    val b = df.select(VectorOps.lshBucket(VectorOps.quantize(col("v")), 0, 4, 64))
      .as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 16))
    // opposite vectors land in complementary buckets
    assert(b(0) == 15L - b(1))
  }

  test("LSH ANN hits overlap the brute-force neighbours at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sfDir)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs("q_knn_bruteforce")
    val lsh = pairs("q_knn_lsh")
    assert(lsh.nonEmpty)
    // every LSH result set should recover a meaningful share of the
    // exact neighbours (bucketed candidates, not random vectors)
    val hitRate = (lsh & truth).size.toDouble / lsh.size
    assert(hitRate >= 0.3, s"LSH precision-vs-exact $hitRate too low")
  }

  test("hkl inverse round-trips: UB·(UB⁻¹·q) recovers q at sf0.001") {
    // forward real-valued UB (the fixed-point literals / 100)
    val ub = Seq(Seq(0.90, -0.10, 0.20), Seq(0.10, 1.10, -0.30), Seq(-0.20, 0.05, 0.95))
    val inv = graft.SparkEntry.queries("q_hkl_inverse")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val qs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        graft.expressions.VectorExpressions.quantizeVec(
          org.apache.spark.sql.functions.col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).take(3)).toMap
    assert(inv.nonEmpty && inv.keySet == qs.keySet)
    inv.foreach { case (id, hkl) =>
      val q = qs(id)
      (0 until 3).foreach { i =>
        val back = ub(i)(0) * hkl(0) + ub(i)(1) * hkl(1) + ub(i)(2) * hkl(2)
        val want = q(i).toDouble / 1000000L
        assert(math.abs(back - want) < 1e-5, s"vec $id row $i: $back vs $want")
      }
    }
  }

  test("rebinQ sums exact integer bins and crops the ragged tail") {
    val df = Seq(Tuple1(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))).toDF("q")
    val out = df.select(graft.operators.VectorOps.rebinQ(col("q"), 4, 2))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(10L, 26L)) // 1+2+3+4, 5+6+7+8; the 9 tail is cropped
  }

  test("planeWeight constants are stable") {
    assert(VectorOps.planeWeight(0, 0, 0) == VectorOps.planeWeight(0, 0, 0))
    assert((0 until 20).map(VectorOps.planeWeight(1, 2, _)).forall(w => w >= -1000 && w <= 1000))
  }
}
