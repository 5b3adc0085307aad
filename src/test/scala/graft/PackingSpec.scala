package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(sizes: Seq[Long]) =
    sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "n_tok")

  test("every doc lands in exactly one sequence; budget respected") {
    val rnd = new scala.util.Random(11)
    val sizes = (1 to 500).map(_ => 10L + rnd.nextInt(200))
    val docs = mkDocs(sizes)
    val packed = Packing.packSequences(docs, col("doc_id"), col("n_tok"),
      budget = 512L, buckets = 4)
    val coverage = packed.select(explode(col("doc_ids")).as("doc_id"))
      .groupBy(col("doc_id")).count().collect()
    assert(coverage.length == 500)
    assert(coverage.forall(_.getLong(1) == 1L), "a doc appeared in two sequences")
    val over = packed.filter(col("total_tokens") > 512 && col("n_docs") > 1).count()
    assert(over == 0, "multi-doc sequence exceeded the budget")
  }

  test("oversize docs become singleton sequences with fill > 1") {
    val docs = mkDocs(Seq(600L, 100L, 100L))
    val packed = Packing.packSequences(docs, col("doc_id"), col("n_tok"),
      budget = 512L, buckets = 1).collect()
    val singleton = packed.filter(r => r.getDouble(r.fieldIndex("fill")) > 1.0)
    assert(singleton.length == 1)
    assert(singleton.head.getInt(singleton.head.fieldIndex("n_docs")) == 1)
  }

  test("packing is deterministic across runs and parallelism") {
    val rnd = new scala.util.Random(7)
    val sizes = (1 to 300).map(_ => 5L + rnd.nextInt(100))
    def run(parts: Int) = Packing.packSequences(
        mkDocs(sizes).repartition(parts), col("doc_id"), col("n_tok"),
        budget = 256L, buckets = 8)
      .select(col("bucket"), col("seq_id"), col("doc_ids"))
      .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
  }

  test("first-fit-decreasing fills well on uniform docs") {
    val docs = mkDocs((1 to 400).map(_ => 56L))
    val packed = Packing.packSequences(docs, col("doc_id"), col("n_tok"),
      budget = 512L, buckets = 2)
    // 9 docs of 56 = 504 of 512; all but the ragged last bin per
    // bucket should be full
    val fills = packed.select(col("fill")).as[Double].collect()
    val full = fills.count(f => f > 0.98)
    assert(full >= fills.length - 2, s"too many under-filled bins: ${fills.toSeq}")
  }
}
