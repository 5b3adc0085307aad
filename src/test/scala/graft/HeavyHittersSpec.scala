package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exactTopK(terms: org.apache.spark.sql.DataFrame, k: Int) =
    terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("misraGries: surviving counts are lower bounds; superset guarantee holds") {
    val data = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 40).map(i => s"x$i") // 40 singletons
    val out = HeavyHitters.misraGries(data.iterator, s = 4).toSeq
    val sketch = out.filter(_._1 != null).toMap
    // every term with count > N/(s+1) = 120/5 = 24 must survive
    assert(sketch.contains("a") && sketch.contains("b"))
    assert(sketch.size <= 4)
    // lower bounds never exceed true counts
    assert(sketch("a") <= 50 && sketch("b") <= 30)
    // the sentinel row carries the partition's term count
    assert(out.filter(_._1 == null).map(_._2) == Seq(120L))
  }

  test("topKTerms matches the exact aggregate on a skewed corpus") {
    val terms = (
      Seq.fill(100)("alpha") ++ Seq.fill(60)("beta") ++ Seq.fill(30)("gamma") ++
        (1 to 200).map(i => s"noise$i")
    ).toDF("term").repartition(7)
    val got = HeavyHitters.topKTerms(terms, k = 3, sketchSize = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("alpha", 100L, 1L), ("beta", 60L, 2L), ("gamma", 30L, 3L)))
    assert(got.map(_._2).toSeq == exactTopK(terms, 3).map(_._2).toSeq)
  }

  test("flat frequencies defeat the certificate; exact fallback still answers correctly") {
    // 50 distinct terms x 4 copies each, tiny sketch: kth * (s+1) <= N
    val terms = (1 to 50).flatMap(i => Seq.fill(4)(f"t$i%02d")).toDF("term")
      .repartition(5)
    val got = HeavyHitters.topKTerms(terms, k = 5, sketchSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTopK(terms, 5))
    // all counts 4, so top-5 is the 5 lexicographically smallest terms
    assert(got.map(_._1) == Seq("t01", "t02", "t03", "t04", "t05"))
  }

  test("result is independent of partition layout") {
    val base = Seq.fill(40)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 120).map(i => s"cold$i")
    val a = HeavyHitters.topKTerms(base.toDF("term").repartition(3), 2, 8)
      .collect().map(_.toSeq).toSeq
    val b = HeavyHitters.topKTerms(base.toDF("term").repartition(13), 2, 8)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("ngramTerms: bigrams match the sliding window; short docs yield none") {
    val docs = Seq((1L, "a b c d"), (2L, "solo"), (3L, "x y")).toDF("doc_id", "text")
    val got = HeavyHitters.ngramTerms(docs, col("text"), 2)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("a b", "b c", "c d", "x y"))
    val uni = HeavyHitters.ngramTerms(docs, col("text"), 1).count()
    assert(uni == 7)
  }

  test("topKNgrams (doc-streaming sketch) matches topKTerms on the same corpus") {
    val docs = (
      Seq.fill(40)("the cat sat") ++ Seq.fill(25)("a dog ran") ++
        (1 to 60).map(i => s"unique$i text$i")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val a = HeavyHitters.topKNgrams(docs, col("text"), n = 2, k = 3, sketchSize = 16)
      .collect().map(_.toSeq).toSeq
    val b = HeavyHitters.topKTerms(
        HeavyHitters.ngramTerms(docs, col("text"), 2), k = 3, sketchSize = 16)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.map(r => (r(0), r(1))) ==
      Seq(("cat sat", 40L), ("the cat", 40L), ("a dog", 25L)).map(t => (t._1, t._2)))
  }

  test("recount plan never shuffles the full term relation") {
    val terms = (1 to 100).map(i => s"t${i % 10}").toDF("term")
    // the candidate join must be a broadcast semi join (map-side
    // prefilter), not a shuffled join of the corpus side
    val cand = terms.limit(5).select(col("term")).distinct()
    val plan = terms.join(broadcast(cand), Seq("term"), "left_semi")
      .groupBy("term").count().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
