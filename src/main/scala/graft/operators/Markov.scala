package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain (removal-effect) attribution — the data-driven
  * upgrade of last-touch attribution (#215): model user journeys as
  * a first-order Markov chain over channels with absorbing CONV /
  * NULL states, and credit each channel by its REMOVAL EFFECT
  * (Anderl et al. 2016, "Mapping the customer journey"): how much
  * the start→conversion probability drops when every transition into
  * the channel is redirected to NULL.
  *
  * Scale shape: the corpus reduces to a (src, dst) transition-count
  * relation — bounded by (channels + 2)², NEVER user- or
  * event-scaled — via ONE per-user ordered window pass + one
  * map-side-combined aggregate. Only that bounded matrix crosses to
  * the driver (the [[IvfIndex]] model-state discipline), where the
  * absorbing-chain linear systems (one per removed channel, each
  * ~channels×channels) solve by deterministic Gaussian elimination.
  * No iteration touches the cluster.
  */
object Markov {

  val Start = "START"
  val Conv = "CONV"
  val Null = "NULL"

  /** Per-user journey transitions: users ordered by (t, tie), path
    * truncated at the FIRST `convType` event (which maps to the
    * absorbing CONV state); journeys that never convert get a
    * terminal → NULL transition after their last event. Returns the
    * bounded (src, dst, n) count relation.
    */
  def transitions(events: DataFrame, user: Column, t: Column, tie: Column,
                  etype: Column, convType: String): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("t"), col("tie"))
    val pre = events.select(user.as("u"), t.as("t"), tie.as("tie"),
      etype.as("ty"))
      // conversions BEFORE this row (exclusive prefix): 0 = row is on
      // the live path (everything up to and including first conv)
      .withColumn("prior_conv",
        count(when(col("ty") === convType, 1))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("prior_conv") === 0)
    val mapped = pre
      .withColumn("dst", when(col("ty") === convType, lit(Conv)).otherwise(col("ty")))
      .withColumn("src", coalesce(lag(col("dst"), 1).over(w), lit(Start)))
    val steps = mapped.select(col("u"), col("src"), col("dst"))
    // terminal NULL rows for users whose path never reached CONV:
    // one row per user, dst of the LAST path row ≠ CONV
    val terminals = mapped
      .groupBy(col("u"))
      .agg(max_by(col("dst"), struct(col("t"), col("tie"))).as("src"))
      .filter(col("src") =!= Conv)
      .select(col("u"), col("src"), lit(Null).as("dst"))
    steps.unionByName(terminals)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
  }

  /** P(absorb in CONV | start) for the chain given by `probs`
    * (src -> (dst -> p)), with transitions into `removed` redirected
    * to NULL. Solves (I − Q)x = b by Gaussian elimination with
    * partial pivoting over the transient states in sorted order —
    * deterministic driver arithmetic.
    */
  private def convProb(states: Seq[String], probs: Map[String, Map[String, Double]],
                       removed: Option[String]): Double = {
    val transient = (Start +: states.filterNot(removed.contains(_))).distinct
    val idx = transient.zipWithIndex.toMap
    val m = transient.length
    // A = I − Q, rhs = P(s → CONV directly)
    val a = Array.tabulate(m, m + 1) { (i, j) =>
      val row = probs.getOrElse(transient(i), Map.empty)
      if (j == m) row.getOrElse(Conv, 0.0)
      else {
        val q = row.getOrElse(transient(j), 0.0)
        // mass into a removed channel is redirected to NULL: simply
        // absent from Q and from the CONV rhs
        (if (i == j) 1.0 else 0.0) - (if (removed.contains(transient(j))) 0.0 else q)
      }
    }
    var col0 = 0
    while (col0 < m) {
      var piv = col0
      var i = col0 + 1
      while (i < m) { if (math.abs(a(i)(col0)) > math.abs(a(piv)(col0))) piv = i; i += 1 }
      val tmp = a(col0); a(col0) = a(piv); a(piv) = tmp
      if (math.abs(a(col0)(col0)) > 1e-12) {
        i = 0
        while (i < m) {
          if (i != col0) {
            val f = a(i)(col0) / a(col0)(col0)
            var j = col0
            while (j <= m) { a(i)(j) -= f * a(col0)(j); j += 1 }
          }
          i += 1
        }
      }
      col0 += 1
    }
    if (math.abs(a(idx(Start))(idx(Start))) <= 1e-12) 0.0
    else a(idx(Start))(m) / a(idx(Start))(idx(Start))
  }

  /** Per-journey channel coalitions: one row per user with the
    * SORTED DISTINCT set of non-conversion channels touched before
    * the first `convType` event (same truncation as [[transitions]])
    * and whether the journey converted. Aggregated to
    * (set_key, n_journeys, n_conv) — bounded by 2^channels rows,
    * never user count.
    */
  def coalitions(events: DataFrame, user: Column, t: Column, tie: Column,
                 etype: Column, convType: String): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("t"), col("tie"))
    val pre = events.select(user.as("u"), t.as("t"), tie.as("tie"), etype.as("ty"))
      .withColumn("prior_conv",
        count(when(col("ty") === convType, 1))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("prior_conv") === 0)
    pre.groupBy(col("u")).agg(
        concat_ws(",", array_sort(collect_set(
          when(col("ty") =!= convType, col("ty"))))).as("set_key"),
        max(when(col("ty") === convType, 1).otherwise(0)).as("conv"))
      .groupBy(col("set_key"))
      .agg(count(lit(1)).as("n_journeys"),
        sum(col("conv")).cast("long").as("n_conv"))
  }

  /** Shapley-value attribution (Shapley 1953; the simplified
    * journey-coalition form of Zhao et al. 2018, "Shapley Value
    * Methods for Attribution Modeling") — the OTHER industry-standard
    * multi-touch model next to the Markov removal effect. The
    * characteristic function v(S) = conversion rate over journeys
    * whose touched-channel set ⊆ S (v(∅) = 0 when unobserved), and
    *
    *   φ_c = Σ_{S ⊆ C∖{c}} |S|!·(|C|−|S|−1)!/|C|! · (v(S∪{c}) − v(S))
    *
    * computed exactly on the driver over the BOUNDED coalition table
    * (2^channels rows — model state, the [[removalEffects]]
    * discipline). Efficiency (Σφ = v(C)) is structural and
    * spec-pinned. Returns (channel, phi_micro, share_ppm) with
    * share over the positive credits.
    */
  def shapley(coal: DataFrame): DataFrame = {
    val spark = coal.sparkSession
    import spark.implicits._
    val rows = coal.select(col("set_key"), col("n_journeys").cast("long"),
        col("n_conv").cast("long"))
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse(""), r.getLong(1), r.getLong(2)))
    val channels = rows.flatMap(_._1.split(",")).filter(_.nonEmpty).distinct.sorted
    val byKey = rows.map { case (k, n, c) =>
      k.split(",").filter(_.nonEmpty).toSet -> ((n, c))
    }.toMap
    val nC = channels.length
    require(nC <= 20, s"Shapley over $nC channels needs 2^$nC coalitions — " +
      "bucket the channel vocabulary first")
    def v(s: Set[String]): Double = {
      val (n, c) = byKey.foldLeft((0L, 0L)) { case ((an, ac), (k, (n0, c0))) =>
        if (k.subsetOf(s)) (an + n0, ac + c0) else (an, ac)
      }
      if (n == 0) 0.0 else c.toDouble / n
    }
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    // size-major, lexicographic-within-size enumeration of the sorted
    // channel vector: an EXPLICIT deterministic order (Set.subsets()
    // iterates in collection-internal order, which changes shape at
    // 5+ elements) — the double credit fold below is order-sensitive,
    // and the SQL oracle replays exactly this order
    val allSubsets: Seq[Set[String]] =
      (0 to nC).flatMap(k => channels.combinations(k).map(_.toSet))
    val phi = channels.map { c =>
      val others = allSubsets.filter(!_.contains(c))
      val credit = others.map { s =>
        val wgt = fact(s.size) * fact(nC - s.size - 1) / fact(nC)
        wgt * (v(s + c) - v(s))
      }.sum
      (c, credit)
    }
    val posSum = phi.map(p => math.max(0.0, p._2)).sum
    phi.map { case (c, p) =>
      (c, math.floor(p * 1e6).toLong,
        if (posSum > 0) math.floor(math.max(0.0, p) / posSum * 1e6).toLong else 0L)
    }.toSeq.toDF("channel", "phi_micro", "share_ppm")
  }

  /** Removal-effect attribution from a transition-count relation.
    * Collects the BOUNDED matrix, solves the base chain and one
    * removed-channel chain per channel on the driver, and returns a
    * small DataFrame: (channel, base_ppm — identical on every row,
    * removal_ppm = floor(1e6·(base − p_removed)/base), share_ppm =
    * floor(1e6·RE_c / ΣRE)). Channels with zero removal effect keep
    * share 0; if ALL effects are zero, shares are all 0.
    */
  def removalEffects(trans: DataFrame): DataFrame = {
    val spark = trans.sparkSession
    import spark.implicits._
    val rows = trans.select(col("src"), col("dst"), col("n").cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = rows.groupBy(_._1)
    val probs: Map[String, Map[String, Double]] = bySrc.map { case (src, rs) =>
      val tot = rs.map(_._3).sum.toDouble
      src -> rs.map { case (_, dst, n) => dst -> n / tot }.toMap
    }
    val channels = rows.flatMap(r => Seq(r._1, r._2))
      .filterNot(Set(Start, Conv, Null)).distinct.sorted
    val base = convProb(channels, probs, None)
    val effects = channels.map { c =>
      val p = convProb(channels, probs, Some(c))
      val re = if (base > 0) math.max(0.0, (base - p) / base) else 0.0
      (c, re)
    }
    val reSum = effects.map(_._2).sum
    val out = effects.map { case (c, re) =>
      (c, math.floor(base * 1e6).toLong, math.floor(re * 1e6).toLong,
        if (reSum > 0) math.floor(re / reSum * 1e6).toLong else 0L)
    }
    out.toSeq.toDF("channel", "base_ppm", "removal_ppm", "share_ppm")
  }
}
