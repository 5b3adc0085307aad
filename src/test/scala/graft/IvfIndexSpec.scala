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

  test("rebalance bounds the largest cell on a skewed corpus, deterministically") {
    import spark.implicits._
    val dims = 4
    // 95 vectors spread along a line + 5 in a tight far cluster: with
    // both seeds in the line, k-means converges to cluster-per-cell —
    // one cell holding 95% of the corpus (the skew IVF probes hate).
    val rows =
      (0L until 95L).map(i => (i, Seq(i * 100L + 100L, 7L, 0L, 0L))) ++
        (95L until 100L).map(i => (i, Seq(10000000L + (i - 95L), 7L, 0L, 0L)))
    val df = rows.toDF("vec_id", "q")
    def fracs(cents: Array[Array[Long]]): Seq[Double] = {
      val counts = IvfIndex.assign(df, cents).groupBy("cell").count()
        .collect().map(_.getLong(1).toDouble)
      counts.map(_ / counts.sum).toSeq
    }
    val cents = IvfIndex.train(df, c = 2, iters = 3, dims = dims)
    val beforeMax = fracs(cents).max
    assert(beforeMax >= 0.9, s"fixture should be skewed, got $beforeMax")
    val reb = IvfIndex.rebalance(df, cents, dims, maxCellFrac = 0.4,
      maxRounds = 4, settleIters = 1)
    val afterMax = fracs(reb).max
    assert(reb.length > cents.length)
    assert(afterMax <= 0.4 + 1e-9, s"largest cell still $afterMax after rebalance")
    // deterministic: identical codebook on a re-run
    val reb2 = IvfIndex.rebalance(df, cents, dims, maxCellFrac = 0.4,
      maxRounds = 4, settleIters = 1)
    assert(reb.map(_.toSeq).toSeq == reb2.map(_.toSeq).toSeq)
    // the expanded codebook still serves queries (k hits per query)
    val e2 = df.select(col("vec_id"), col("q"),
      VectorExpressions.normQ(col("q")).as("n"))
    val qs = e2.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n").as("nq"))
    val assigned = IvfIndex.assign(e2, reb)
    val out = IvfIndex.knn(qs, assigned, reb, nprobe = 2, k = 3)
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) == 3L))
  }

  test("rebalance is a no-op when no cell exceeds the cap") {
    import spark.implicits._
    val dims = 4
    val rows = (0L until 40L).map(i => (i, Seq(i * 1000L, 0L, 0L, 0L)))
    val df = rows.toDF("vec_id", "q")
    val cents = IvfIndex.train(df, c = 8, iters = 3, dims = dims)
    val reb = IvfIndex.rebalance(df, cents, dims, maxCellFrac = 0.9)
    assert(reb.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
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

  test("train: driver fast path matches the distributed Lloyd loop exactly") {
    val fast = IvfIndex.train(e, c = 8, iters = 3, dims = Dims)
    val dist = IvfIndex.train(e, c = 8, iters = 3, dims = Dims, driverMaxVectors = 0)
    assert(fast.map(_.toSeq).toSeq === dist.map(_.toSeq).toSeq)
  }
}
