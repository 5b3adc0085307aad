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

  test("resize: nearest-neighbour downsample produces the exact pixels") {
    // 4x4 quadrant image: TL white, TR red, BL blue, BR black
    val px = Array(
      Array(0xffffff, 0xffffff, 0xff0000, 0xff0000),
      Array(0xffffff, 0xffffff, 0xff0000, 0xff0000),
      Array(0x0000ff, 0x0000ff, 0x000000, 0x000000),
      Array(0x0000ff, 0x0000ff, 0x000000, 0x000000))
    val ds = spark.createDataset(Seq((1L, pngBytes(px)), (2L, "text".getBytes("UTF-8"))))
    val out = MultimodalOps.resizeImages(ds, 2, 2, batchSize = 4)
      .collect().sortBy(_.doc_id)
    assert(out(0).decoded && out(0).width == 2 && out(0).height == 2)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(0).png))
    assert((back.getRGB(0, 0) & 0xffffff) == 0xffffff)
    assert((back.getRGB(1, 0) & 0xffffff) == 0xff0000)
    assert((back.getRGB(0, 1) & 0xffffff) == 0x0000ff)
    assert((back.getRGB(1, 1) & 0xffffff) == 0x000000)
    assert(!out(1).decoded && out(1).png == null)
    // determinism: identical bytes on a second run
    val again = MultimodalOps.resizeImages(ds, 2, 2, batchSize = 4)
      .collect().sortBy(_.doc_id)
    assert(java.util.Arrays.equals(out(0).png, again(0).png))
  }

  test("frame sampling: every k-th frame of a packed container, no shuffle") {
    val frames = (0 until 10).map(i => Array(i.toByte, (i * 2).toByte))
    val packed = MultimodalOps.packFrames(frames)
    val ds = spark.createDataset(Seq(
      (7L, packed), (8L, "not a container".getBytes("UTF-8"))))
    val out = MultimodalOps.sampleFrames(ds, every = 3, batchSize = 2)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(out.map(f => (f.doc_id, f.frame_idx)).toSeq ==
      Seq((7L, 0), (7L, 3), (7L, 6), (7L, 9)))
    assert(out.head.payload.toSeq == Seq(0.toByte, 0.toByte))
    assert(out(1).payload.toSeq == Seq(3.toByte, 6.toByte))
  }

  test("audio metadata parses WAV RIFF headers without a codec") {
    // hand-build a 44-byte PCM WAV header + 4 samples of silence
    def wav(rate: Int, ch: Int, bits: Int, nSamples: Int): Array[Byte] = {
      val dataLen = nSamples * ch * bits / 8
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      def le32(v: Int) = o.write(Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte))
      def le16(v: Int) = o.write(Array[Byte](v.toByte, (v >> 8).toByte))
      o.writeBytes("RIFF"); le32(36 + dataLen); o.writeBytes("WAVE")
      o.writeBytes("fmt "); le32(16); le16(1); le16(ch); le32(rate)
      le32(rate * ch * bits / 8); le16(ch * bits / 8); le16(bits)
      o.writeBytes("data"); le32(dataLen); o.write(new Array[Byte](dataLen))
      bos.toByteArray
    }
    val ds = spark.createDataset(Seq(
      (1L, wav(44100, 2, 16, 22050)), (2L, "nope".getBytes("UTF-8"))))
    val out = MultimodalOps.audioMeta(ds).collect().sortBy(_.doc_id)
    assert(out(0).valid && out(0).sample_rate == 44100 && out(0).channels == 2 &&
      out(0).bits_per_sample == 16 && out(0).n_samples == 22050L)
    assert(math.abs(out(0).duration_s - 0.5) < 1e-9)
    assert(!out(1).valid)
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
