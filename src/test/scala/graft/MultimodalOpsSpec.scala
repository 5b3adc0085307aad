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

  test("non-image decode batches deterministically and respects batch size") {
    val docs = (1L to 10L).map(i => (i, s"payload-$i".getBytes("UTF-8")))
    val ds = spark.createDataset(docs)
    val out = MultimodalOps.decodeFeatures(ds.repartition(1), batchSize = 4)
      .collect().sortBy(_.doc_id)
    assert(out.length == 10)
    assert(out.map(_.batch_size).sum == 4 * 4 + 4 * 4 + 2 * 2) // each row carries its batch's size
    val again = MultimodalOps.decodeFeatures(ds.repartition(1), batchSize = 4)
      .collect().sortBy(_.doc_id)
    assert(out.toSeq == again.toSeq) // deterministic
    assert(out.forall(f => f.width >= 64 && f.height >= 64))
    assert(out.forall(!_.decoded)) // text bytes are not images
  }

  private def pngBytes(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads decode to true dimensions and Rec.601 mean luma") {
    // 2x2: white, black / pure red, pure blue
    val png = pngBytes(Array(
      Array(0xffffff, 0x000000),
      Array(0xff0000, 0x0000ff)))
    // bigger image mixed in to prove per-payload dimensions
    val png2 = pngBytes(Array.fill(3)(Array.fill(5)(0x808080)))
    val ds = spark.createDataset(Seq(
      (1L, png), (2L, png2), (3L, "not an image".getBytes("UTF-8"))))
    val out = MultimodalOps.decodeFeatures(ds, batchSize = 8)
      .collect().sortBy(_.doc_id)
    assert(out(0).decoded && out(0).width == 2 && out(0).height == 2)
    val expected = (255.0 + 0.0 + 0.299 * 255 + 0.114 * 255) / 4
    assert(math.abs(out(0).mean_luma - expected) < 1e-9)
    assert(out(1).decoded && out(1).width == 5 && out(1).height == 3)
    assert(math.abs(out(1).mean_luma - 128.0) < 1e-9) // 0x80 grey
    assert(!out(2).decoded)
  }

  test("BMP decodes too (second javax.imageio codec)") {
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val ds = spark.createDataset(Seq((1L, bos.toByteArray)))
    val f = MultimodalOps.decodeFeatures(ds, batchSize = 1).collect().head
    assert(f.decoded && f.width == 4 && f.height == 2 && math.abs(f.mean_luma - 255.0) < 1e-9)
  }
}
