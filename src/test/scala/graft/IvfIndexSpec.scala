package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions
import graft.operators.{IvfIndex, VectorOps}

class IvfIndexSpec extends SparkSpec {

  private val Dims = 64

  private lazy val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), VectorExpressions.quantizeVec(col("embedding")).as("q"))
    .select(col("vec_id"), col("q"), VectorExpressions.normQ(col("q")).as("n"))

  test("every vector lands in exactly one cell; all cells in range") {
    val cents = IvfIndex.train(e, c = 8, iters = 2, dims = Dims)
    val assigned = IvfIndex.assign(e, cents)
    assert(assigned.count() == e.count())
    assert(assigned.select("vec_id").distinct().count() == e.count())
    val cells = assigned.select("cell").distinct().collect().map(_.getLong(0))
    assert(cells.forall(c => c >= 0 && c < 8))
  }

  test("k-means iterations are deterministic") {
    val a = IvfIndex.train(e, c = 8, iters = 2, dims = Dims)
    val b = IvfIndex.train(e, c = 8, iters = 2, dims = Dims)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("training moves centroids off their seeds") {
    val seeds = IvfIndex.train(e, c = 8, iters = 0, dims = Dims)
    val trained = IvfIndex.train(e, c = 8, iters = 2, dims = Dims)
    assert(seeds.map(_.toSeq).toSeq != trained.map(_.toSeq).toSeq)
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val cents = IvfIndex.train(e, c = 8, iters = 2, dims = Dims)
    val assigned = IvfIndex.assign(e, cents)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n").as("nq"))
    val ivf = IvfIndex.knn(qs, assigned, cents, nprobe = 4, k = 3)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force ground truth
    val brute = e.crossJoin(qs).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineQ(VectorExpressions.dotQ(col("qq"), col("q")),
          col("nq"), col("n")).as("c"))
    val truth = graft.operators.Relational.topKPerGroup(
        brute, Seq(col("query_id")), Seq(col("c").desc, col("vec_id")), 3)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & truth).size.toDouble / truth.size
    assert(ivf.nonEmpty)
    // 4 of 8 cells probed -> expect to find a good share of true top-3
    assert(recall >= 0.4, s"recall $recall too low")
  }
}
