package graft

import org.apache.spark.sql.functions._
import graft.operators.LangClassifier

/** The fastText-style hashed character-trigram language classifier:
  * separation on a synthetic multilingual fixture (held-out docs
  * included), bit-deterministic training, zero-shuffle feature/score
  * plans, tie determinism.
  */
class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  // Tiny synthetic "languages" with disjoint orthography — enough
  // signal that a linear char-trigram model must nail them.
  private val phrases = Map(
    "en" -> Seq("the quick brown fox jumps over the lazy dog",
      "water runs through the green valley"),
    "de" -> Seq("der schnelle braune fuchs springt ueber den faulen hund",
      "wasser fliesst durch das gruene tal"),
    "es" -> Seq("el rapido zorro marron salta sobre el perro perezoso",
      "el agua corre por el valle verde"),
    "fr" -> Seq("le rapide renard brun saute par dessus le chien paresseux",
      "l eau coule dans la vallee verte"))

  private def corpus(perLang: Int, idBase: Long): Seq[(Long, String, String)] = {
    val langs = phrases.keys.toSeq.sorted
    (0 until perLang).flatMap { i =>
      langs.zipWithIndex.map { case (l, li) =>
        val p = phrases(l)(i % p2(l))
        (idBase + i.toLong * langs.size + li, s"$p v$i", l)
      }
    }
  }
  private def p2(l: String): Int = phrases(l).size

  test("separates a multilingual fixture with held-out docs (accuracy floor)") {
    val train = corpus(20, 0L)
    val hold = corpus(5, 1000L)
    val d = docs(train: _*)
    val packed = LangClassifier.features(d, buckets = 512)
    assert(!packed.queryExecution.executedPlan.toString.contains("Exchange"))
    val langs = phrases.keys.toSeq.sorted
    val m = LangClassifier.train(packed, langs, buckets = 512, iters = 8, lr = 0.5)
    val holdPacked = LangClassifier.features(docs(hold: _*), buckets = 512)
    val pred = LangClassifier.predict(holdPacked, m)
    assert(!pred.queryExecution.executedPlan.toString.contains("Exchange"))
    val byId = pred.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val truth = hold.map(h => h._1 -> h._3).toMap
    val acc = truth.count { case (id, l) => byId(id) == l }.toDouble / truth.size
    assert(acc >= 0.95, s"held-out accuracy $acc")
  }

  test("training is bit-deterministic across reruns") {
    val d = docs(corpus(10, 0L): _*)
    val packed = LangClassifier.features(d, buckets = 256)
    val langs = phrases.keys.toSeq.sorted
    val m1 = LangClassifier.train(packed, langs, buckets = 256, iters = 4, lr = 0.5)
    val m2 = LangClassifier.train(packed, langs, buckets = 256, iters = 4, lr = 0.5)
    assert(m1.langs === m2.langs)
    m1.w.zip(m2.w).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("train: driver fast path matches the distributed loop exactly") {
    val d = docs(corpus(10, 0L): _*)
    val packed = LangClassifier.features(d, buckets = 256)
    val langs = phrases.keys.toSeq.sorted
    val fast = LangClassifier.train(packed, langs, buckets = 256, iters = 4, lr = 0.5)
    val dist = LangClassifier.train(packed, langs, buckets = 256, iters = 4, lr = 0.5,
      driverMaxDocs = 0)
    assert(fast.langs === dist.langs)
    fast.w.zip(dist.w).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("all-zero model ties resolve deterministically (lexicographically last label)") {
    val m = LangClassifier.Model(Seq("aa", "bb"), Array(Array.fill(8)(0L), Array.fill(8)(0L)))
    val d = docs((1L, "xyzw", "aa"))
    val out = LangClassifier.predict(LangClassifier.features(d, buckets = 8), m).collect()(0)
    assert(out.getString(2) === "bb")
    assert(out.getLong(3) === 0L)
  }

  test("texts shorter than n yield no features and drop out") {
    val d = docs((1L, "ab", "en"), (2L, "abcdef", "en"))
    assert(LangClassifier.features(d, buckets = 16, n = 3)
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("native charNgramBuckets matches the HOF reference, incl. multibyte") {
    import org.apache.spark.sql.functions.col
    val texts = Seq("hello world", "héllo wörld", "中文的字符串测试", "ab", "a",
      "", "mixé 中en text", "ßẞ𝄞x𝄞yz").toDF("text")
    val native = texts.select(LangClassifier.charNgramBuckets(col("text"), 3, 1024))
      .collect().map(_.getSeq[Long](0)).toSeq
    val hof = texts.select(LangClassifier.charNgramBucketsHof(col("text"), 3, 1024))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(native == hof)
    assert(native.exists(_.nonEmpty))
  }
}
