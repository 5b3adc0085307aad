package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("payload metadata matches content bytes") {
    val df = Seq((1L, "hello"), (2L, "wörld")).toDF("id", "text")
    val out = MultimodalOps.withPayloadMeta(df, col("id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(out(0).fieldIndex("n_bytes")) == 5L)
    assert(out(1).getLong(out(1).fieldIndex("n_bytes")) == 6L) // ö is 2 bytes
    assert(out(0).getString(out(0).fieldIndex("payload_md5")) ==
      "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(new String(out(0).getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
  }

  test("stub decode batches deterministically and respects batch size") {
    val docs = (1L to 10L).map(i => (i, s"payload-$i".getBytes("UTF-8")))
    val ds = spark.createDataset(docs)
    val out = MultimodalOps.decodeFeaturesStub(ds.repartition(1), batchSize = 4)
      .collect().sortBy(_.doc_id)
    assert(out.length == 10)
    assert(out.map(_.batch_size).sum == 4 * 4 + 4 * 4 + 2 * 2) // each row carries its batch's size
    val again = MultimodalOps.decodeFeaturesStub(ds.repartition(1), batchSize = 4)
      .collect().sortBy(_.doc_id)
    assert(out.toSeq == again.toSeq) // deterministic
    assert(out.forall(f => f.width >= 64 && f.height >= 64))
  }
}
