package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Curation, Dedup, Interpolate, Percentiles}

/** Property-based checks: the distributed operators must agree with
  * straightforward single-machine reference computations on random
  * inputs, not just on the hand-picked fixtures. Cases are drawn
  * from scalacheck generators under FIXED seeds so every run (and
  * every engine) sees the same inputs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** 5 deterministic samples per generator (each case runs Spark jobs). */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (0 until 5).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  test("percentiles match the in-memory NIST rule on random groups") {
    val values = Gen.nonEmptyListOf(Gen.choose(-1000, 1000).map(_ / 10.0))
    forAll(values) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
        .toDF("g", "id", "v")
      val got = Percentiles.perGroup(df, Seq("g"), col("v"), col("id"), Seq(0.5))
        .collect().head.getDouble(1)
      val sorted = vs.sorted
      val h = 0.5 * (sorted.size - 1)
      val expected = sorted(h.floor.toInt) +
        (sorted(h.ceil.toInt) - sorted(h.floor.toInt)) * (h - h.floor)
      assert(math.abs(got - expected) < 1e-9, s"$got vs $expected for $vs")
    }
  }

  test("weighted percentile matches the in-memory mass-crossing rule") {
    val rows = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 20L), Gen.choose(1L, 100L)))
    val pcts = Seq(10, 50, 90)
    forAll(rows) { vw =>
      val df = vw.map { case (v, w) => ("g", v, w) }.toDF("k", "v", "w")
      pcts.foreach { p =>
        val got = Percentiles.weightedPerGroup(df, Seq("k"), col("v"), col("w"), p)
          .collect().head.getLong(1)
        // reference: smallest v whose cumulative weight (by ascending
        // v) reaches p% of total, in exact integer arithmetic
        val byV = vw.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
        val tot = byV.map(_._2).sum
        var cum = 0L
        val expected = byV.collectFirst {
          case (v, w) if { cum += w; cum * 100 >= tot * p } => v
        }.get
        assert(got == expected, s"p$p: $got vs $expected for $vw")
      }
    }
  }

  test("interpolation exactly recovers a linear function") {
    // samples on a line -> every interpolable grid point lies on it
    val params = for {
      slope <- Gen.choose(-50, 50)
      icept <- Gen.choose(-100, 100)
      xs <- Gen.nonEmptyListOf(Gen.choose(0L, 100L)).map(_.distinct)
        .suchThat(_.size >= 2)
    } yield (slope, icept, xs)
    forAll(params) { case (slope, icept, xs) =>
      val df = xs.map(x => (1L, x, slope.toDouble * x + icept)).toDF("g", "x", "y")
      val out = Interpolate.onGrid(df, Seq("g"), col("x"), col("y"),
          x0 = 0L, dx = 7L, n = 15)
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
      out.foreach { case (gx, y) =>
        assert(math.abs(y - (slope.toDouble * gx + icept)) < 1e-9,
          s"grid $gx: $y != ${slope.toDouble * gx + icept}")
      }
    }
  }

  test("connected components: every member maps to its true component min") {
    val edges = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
    } yield (a, b))
    forAll(edges) { es =>
      val got = Dedup.connectedComponents(es.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val refRoots = parent.keys.map(n => n -> find(n)).toMap
      // group by root, min member = expected cluster id
      val minOfRoot = refRoots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
      refRoots.foreach { case (n, r) =>
        assert(got(n) == minOfRoot(r), s"node $n: got ${got(n)}, want ${minOfRoot(r)}")
      }
    }
  }

  /** In-memory reference for [[Curation.substrDedup]]: delete every
    * token covered by a non-first occurrence of an L-window. */
  private def refSubstrDedup(corpus: List[(Long, List[String])], l: Int) = {
    val wins = for {
      (id, ws) <- corpus; if ws.size >= l
      i <- 1 to (ws.size - l + 1)
    } yield (id, i, ws.slice(i - 1, i - 1 + l).mkString(" "))
    val firstPos = wins.groupBy(_._3).map { case (k, os) =>
      k -> os.map(o => o._1 * Curation.PosBase + o._2).min
    }
    val del = wins
      .filter(o => o._1 * Curation.PosBase + o._2 != firstPos(o._3))
      .flatMap(o => (o._2 until o._2 + l).map(idx => (o._1, idx))).toSet
    corpus.map { case (id, ws) =>
      id -> ws.zipWithIndex.collect { case (w, i) if !del((id, i + 1)) => w }
    }.toMap
  }

  test("substring dedup matches the in-memory reference on random corpora") {
    // Small vocabulary forces genuine window collisions.
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, word))
    val corpus = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (ws, i) => ((i + 1).toLong, ws) })
    val L = 3
    forAll(corpus) { cs =>
      val df = cs.map { case (id, ws) => (id, ws.mkString(" "), "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      val got = Curation.substrDedup(df, L)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      val ref = refSubstrDedup(cs, L)
      cs.foreach { case (id, _) =>
        val kept = ref(id)
        assert(got(id)._1 === kept.size.toLong, s"doc $id kept-count for $cs")
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        assert(got(id)._2 === md5hex, s"doc $id text for $cs")
      }
    }
  }

  test("line dedup conserves segments and is idempotent on the kept text") {
    val word = Gen.oneOf("x", "y", "z")
    val doc = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
    val corpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (ws, i) => ((i + 1).toLong, ws.mkString(" ")) })
    forAll(corpus) { cs =>
      val df = cs.map { case (id, t) => (id, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      val out = Curation.lineDedup(df, 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // every doc appears; kept <= total; total = ceil(words/4)
      cs.foreach { case (id, t) =>
        val (nSegs, nKept) = out(id)
        assert(nSegs === (t.split(" ").length + 3) / 4)
        assert(nKept >= 0 && nKept <= nSegs)
      }
      // corpus-wide: each distinct segment string survives exactly once
      val totalKept = out.values.map(_._2).sum
      val distinctSegs = cs.flatMap { case (_, t) =>
        t.split(" ").grouped(4).map(_.mkString(" "))
      }.distinct.size
      assert(totalKept === distinctSegs.toLong)
    }
  }
}
