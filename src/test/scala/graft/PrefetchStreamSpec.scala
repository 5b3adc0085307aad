package graft.sources

import java.io.{ByteArrayInputStream, IOException, InputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Direct tests of the read-ahead stream used for large spec scan
  * blocks — concurrency code earns its own unit coverage.
  */
class PrefetchStreamSpec extends AnyFunSuite {

  test("byte-exact parity with the plain stream across sizes and read patterns") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 100, 4096, 300000, 1 << 20)) {
      val data = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val pf = new PrefetchInputStream(new ByteArrayInputStream(data), chunkSize = 4096, depth = 3)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](777)
      var r = pf.read(buf, 0, buf.length)
      while (r >= 0) {
        out.write(buf, 0, r)
        // mix in single-byte reads to cross chunk boundaries oddly
        val b = pf.read()
        if (b >= 0) out.write(b)
        r = pf.read(buf, 0, buf.length)
      }
      pf.close()
      assert(java.util.Arrays.equals(out.toByteArray, data), s"n=$n")
    }
  }

  test("an IO error in the pump surfaces to the reader, not a silent truncation") {
    val failing = new InputStream {
      private var served = 0
      override def read(): Int = read(new Array[Byte](1), 0, 1)
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (served >= 10000) throw new IOException("disk on fire")
        val n = math.min(len, 10000 - served)
        java.util.Arrays.fill(b, off, off + n, 42.toByte)
        served += n
        n
      }
    }
    val pf = new PrefetchInputStream(failing, chunkSize = 1024, depth = 2)
    val ex = intercept[IOException] {
      val buf = new Array[Byte](4096)
      var total = 0L
      var r = pf.read(buf, 0, buf.length)
      while (r >= 0) { total += r; r = pf.read(buf, 0, buf.length) }
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("disk on fire")))
    pf.close()
  }

  test("early close stops the pump and does not hang") {
    // a slow infinite stream: close() must return promptly even with
    // the pump mid-read and the queue full
    val endless = new InputStream {
      override def read(): Int = { Thread.sleep(1); 7 }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        Thread.sleep(1); b(off) = 7; 1
      }
    }
    val pf = new PrefetchInputStream(endless, chunkSize = 64, depth = 2)
    assert(pf.read() == 7) // stream works
    val t0 = System.nanoTime()
    pf.close()
    assert((System.nanoTime() - t0) / 1e6 < 1000, "close took too long")
  }
}
