package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, d)
    println("docs: " + docs.count())
    val sh = docs.select(col("doc_id"),
        graft.expressions.TextExpressions.shingleKeysFast(col("text"), 3).as("shl"))
      .select(col("doc_id"), explode(col("shl")).as("h"),
        size(col("shl")).cast("long").as("m"))
    time("shingles+explode count") { sh.write.format("noop").mode("overwrite").save() }
    val grouped = sh.groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("m"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    time("groupBy collect_list") { grouped.write.format("noop").mode("overwrite").save() }
    val sorted = array_sort(col("ds"))
    val pairCombos = flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), y =>
        struct(x.getField("doc_id").as("doc_a"), x.getField("m").as("ma"),
          y.getField("doc_id").as("doc_b"), y.getField("m").as("mb")))))
    val exploded = grouped.select(explode(pairCombos).as("p"))
    time("pair expansion") { exploded.write.format("noop").mode("overwrite").save() }
    val inter = exploded
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.ma").as("ma"), col("p.mb").as("mb"))
      .groupBy(col("doc_a"), col("doc_b"), col("ma"), col("mb"))
      .agg(count(lit(1)).as("inter"))
    time("full to pair agg") { inter.write.format("noop").mode("overwrite").save() }
    println("exploded shingle rows: " + sh.count())
    println("groups>=2: " + grouped.count())
    println("pair rows: " + exploded.count())
    spark.stop()
  }
}
