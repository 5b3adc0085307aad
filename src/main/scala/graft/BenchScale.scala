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
  * With the optional 4th arg `perturb`, each copy i > 0 suffixes a
  * per-copy token to `documents.text` — the near-dup gates then see
  * NEAR duplicates (shared shingle mass, different fingerprints)
  * instead of C(k,2) verbatim clones, so their output stays
  * realistic-sized at the scaled point (r9 verdict item 5).
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
            case Some(tc) if perturb && i > 0 =>
              shifted.withColumn(tc, concat(col(tc), lit(s" graftcopy$i")))
            case _ => shifted
          }
        }
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name x$k done")
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
    rep("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
