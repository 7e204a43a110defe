package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring: per-group two-sample Kolmogorov–
  * Smirnov statistics against the pooled distribution — the "did this
  * source/cohort/day drift?" gate a training-data pipeline runs before
  * admitting a new batch.
  *
  * KS_t = sup_v |F_t(v) − F_all(v)| evaluated at every distinct observed
  * value (the sup of a pair of step functions is attained at a jump).
  * The textbook formulation is a global-order window (`SUM ... OVER
  * (ORDER BY value)`) — which Spark executes in ONE task (the q18
  * anti-pattern). Here instead:
  *   1. one combine-shuffle to per-(value, group) counts;
  *   2. range-repartition by value (equal values stay together, so
  *      partition boundaries never split a jump);
  *   3. two passes à la [[Temporal.runningSum]], generalized to a VECTOR
  *      of per-group counters: pass 1 collects per-partition per-group
  *      totals (P·T longs on the driver), pass 2 scans each partition
  *      with offset-initialized counters and keeps only each group's
  *      local (max diff, argmin value) — T rows per partition out.
  * Every partition works in parallel; nothing global-ordered ever
  * funnels through one task. Cost is O(D·T) counter evaluations
  * (D = distinct values) — T is a group count (event types, sources),
  * small by construction (`maxGroups` guards the driver pull).
  *
  * All counters are exact longs; the F ratios divide the same integers
  * in any engine, so the statistic carries a DuckDB hash oracle. */
object Drift {

  /** Welch's unequal-variance two-sample t-test of each group against
    * the REST of the corpus on `valueCol` — "is this source's length
    * (or quality score) distribution off" as a per-source scalar, the
    * experimentation-analytics complement to the KS/PSI drift tests in
    * this file. Closed form from raw moments (n, Σx, Σx²): one
    * aggregation over the group key plus a broadcast totals join; the
    * rest-of-corpus moments are totals − group, so no second pass.
    * Both the Spark side and the oracle compute variance from the SAME
    * two-pass moment formula, keeping the floating-point cancellation
    * identical across engines. Output: (grp, n, mean, t, df) with
    * Welch–Satterthwaite degrees of freedom, ROUND(·,4). */
  def welchVsRest(df: DataFrame, groupCol: String = "source",
      valueCol: String = "n_chars"): DataFrame = {
    val x = col(valueCol).cast("double")
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n1"), sum(x).as("s1"), sum(x * x).as("q1"))
    val tot = df.agg(count(lit(1)).as("nt"), sum(x).as("st"), sum(x * x).as("qt"))
    g.crossJoin(broadcast(tot))
      .select(col("grp"), col("n1"),
        (col("s1") / col("n1")).as("m1"),
        ((col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)).as("v1"),
        (col("nt") - col("n1")).as("n2"),
        ((col("st") - col("s1")) / (col("nt") - col("n1"))).as("m2"),
        (((col("qt") - col("q1")) -
          (col("st") - col("s1")) * (col("st") - col("s1")) / (col("nt") - col("n1"))) /
          (col("nt") - col("n1") - 1)).as("v2"))
      .select(col("grp"), col("n1").as("n"), round(col("m1"), 4).as("mean"),
        round((col("m1") - col("m2")) /
          sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 4).as("t"),
        round(pow(col("v1") / col("n1") + col("v2") / col("n2"), 2) /
          (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
           pow(col("v2") / col("n2"), 2) / (col("n2") - 1)), 4).as("df"))
      .orderBy("grp")
  }

  /** → (groupCol, ks, at_value): the KS statistic per group vs the
    * pooled sample, and the smallest value attaining it. */
  def ksDrift(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value", maxGroups: Int = 10000): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = events.sparkSession
    val e = events
      .select(col(groupCol).cast("string").as("t"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && col("t").isNotNull)
    val types: Array[(String, Long)] = e.groupBy("t")
      .agg(count(lit(1)).as("n")).orderBy("t")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(types.length <= maxGroups,
      s"${types.length} groups exceed maxGroups=$maxGroups — KS-vs-pool " +
        "needs a counter per group; raise the bound only with the memory to match")
    if (types.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField(groupCol, StringType),
          StructField("ks", DoubleType), StructField("at_value", DoubleType))))
    }
    val tIdx = types.map(_._1).zipWithIndex.toMap
    val nT = types.map(_._2)
    val nAll = nT.sum
    val T = types.length
    val np = spark.sparkContext.defaultParallelism
    val vc = e.groupBy("v", "t").agg(count(lit(1)).as("c"))
      .repartitionByRange(np, col("v"))
      .sortWithinPartitions("v", "t")
    vc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bcIdx = spark.sparkContext.broadcast(tIdx)
      // pass 1: per-partition per-group totals (P·T longs to the driver)
      val partTotals = vc.rdd.mapPartitionsWithIndex { (pid, it) =>
        val idx = bcIdx.value
        val a = new Array[Long](idx.size)
        it.foreach(r => a(idx(r.getString(1))) += r.getLong(2))
        Iterator.single(pid -> a)
      }.collect().sortBy(_._1).map(_._2)
      val offsets: Array[Array[Long]] =
        partTotals.scanLeft(new Array[Long](T)) { (acc, cur) =>
          Array.tabulate(T)(k => acc(k) + cur(k))
        }
      val bcOff = spark.sparkContext.broadcast(offsets)
      val bcTypes = spark.sparkContext.broadcast(types)
      // pass 2: offset-initialized scan; emit each group's local best
      val perPart = vc.rdd.mapPartitionsWithIndex { (pid, it) =>
        val idx = bcIdx.value
        val tys = bcTypes.value
        val n = tys.map(_._2)
        val total = n.sum
        val cum = bcOff.value(pid).clone()
        var cumAll = cum.sum
        val bestD = Array.fill(tys.length)(-1.0)
        val bestV = new Array[Double](tys.length)
        var curV = 0.0
        var started = false
        def closeValue(): Unit = {
          var k = 0
          while (k < tys.length) {
            val d = math.abs(cum(k).toDouble / n(k) - cumAll.toDouble / total)
            if (d > bestD(k)) { bestD(k) = d; bestV(k) = curV }
            k += 1
          }
        }
        it.foreach { r =>
          val v = r.getDouble(0)
          if (started && v != curV) closeValue()
          curV = v; started = true
          val c = r.getLong(2)
          cum(idx(r.getString(1))) += c
          cumAll += c
        }
        if (started) closeValue()
        if (!started) Iterator.empty
        else Iterator.tabulate(tys.length)(k => Row(tys(k)._1, bestD(k), bestV(k)))
      }
      // materialize the P·T local bests NOW (bounded by partitions ×
      // maxGroups) so the cached frame can be released before returning
      val localBests = perPart.collect().toIndexedSeq
      val pp = spark.createDataFrame(
        spark.sparkContext.parallelize(localBests, 1),
        StructType(Seq(
          StructField("t", StringType), StructField("d", DoubleType),
          StructField("av", DoubleType))))
      // global best per group: max diff, ties to the smallest value
      val w = Window.partitionBy("t").orderBy(col("d").desc, col("av").asc)
      pp.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("t").as(groupCol), round(col("d"), 4).as("ks"),
          col("av").as("at_value"))
    } finally vc.unpersist(false)
  }

  /** Wasserstein-1 (earth-mover) distance between each group's
    * distribution of an integer-valued column and the POOLED
    * distribution — the drift-family completion: KS is the sup of the
    * CDF gap, PSI its binned form, W1 its AREA (magnitude-aware, in
    * value units). For discrete values W1 = Σ_sorted |F_g(v) − F(v)|·Δv:
    * cumulative counts are exact integers over the (group × distinct
    * value) grid, each term is one division pair times an exact integer
    * gap, and the sum folds in value order (engine-identical
    * association). Shape: one (group, value) count shuffle, a
    * grid-bounded window, a per-group fold. */
  def wassersteinVsPool(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val e = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val gv = e.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val vs = e.groupBy("v").agg(count(lit(1)).as("ca"))
    val grid = gv.select("g").distinct().crossJoin(vs.select("v"))
      .join(gv, Seq("g", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wg = Window.partitionBy("g").orderBy("v")
    val cum = grid
      .withColumn("cum_g", sum("c").over(
        wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(vs.withColumn("cum_a", sum("ca").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow))),
        "v")
      .withColumn("dv", lead(col("v"), 1).over(wg) - col("v"))
      .where(col("dv").isNotNull)
    val ng = e.groupBy("g").agg(count(lit(1)).as("n_g"))
    val nn = e.agg(count(lit(1)).as("n"))
    cum.join(broadcast(ng), "g").crossJoin(broadcast(nn))
      .withColumn("term",
        abs(col("cum_g").cast("double") / col("n_g").cast("double")
          - col("cum_a").cast("double") / col("n").cast("double"))
          * col("dv").cast("double"))
      .groupBy("g")
      .agg(first(col("n_g")).as("n_g"),
        aggregate(sort_array(collect_list(struct(col("v"), col("term")))),
          lit(0.0), (a, x) => a + x.getField("term")).as("w1raw"))
      .select(col("g").as(groupCol), col("n_g"),
        graft.functions.StableRound.col4(col("w1raw")).as("w1"))
      .orderBy(groupCol)
  }

  /** One-way ANOVA F across groups on an integer-valued column — the
    * k-group generalization of [[welchVsRest]] (equal-variance form):
    * does the group factor explain the variance at all. With exact
    * integer values, every sum of squares comes from integer moments
    * (SSB = Σnᵢ·m̄ᵢ² − N·m̄² computed as Σ(Sᵢ²/nᵢ) − S²/N over exact
    * Sᵢ = Σx), so both engines divide identical numerators: the one
    * float stage is the final ratio. Per-group means ride along.
    * Shape: one group aggregate; the F assembly is G-row math. */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("s2"))
    val tot = g.agg(sum("n").as("nn"), sum("s").as("ss"), sum("s2").as("ss2"),
      count(lit(1)).as("k"))
    // Σ Sᵢ²/nᵢ folded in group order (double association engine-identical)
    val sb = g.agg(aggregate(
      sort_array(collect_list(struct(col("g"),
        (col("s").cast("double") * col("s").cast("double")
          / col("n").cast("double")).as("t")))),
      lit(0.0), (a, x) => a + x.getField("t")).as("sbs"))
    val f = tot.crossJoin(broadcast(sb))
      .withColumn("ssb", col("sbs")
        - col("ss").cast("double") * col("ss").cast("double") / col("nn").cast("double"))
      .withColumn("ssw", col("ss2").cast("double") - col("sbs"))
      .withColumn("f_stat",
        when(col("k") > 1 && col("nn") > col("k") && col("ssw") > 0.0,
          (col("ssb") / (col("k") - 1).cast("double"))
            / (col("ssw") / (col("nn") - col("k")).cast("double"))))
    g.crossJoin(broadcast(f.select(col("k"), col("nn"), col("f_stat"))))
      .select(col("g").as(groupCol), col("n"),
        round(col("s").cast("double") / col("n").cast("double"), 4).as("mean"),
        col("k").as("n_groups"), col("nn").as("n_total"),
        round(col("f_stat"), 4).as("f_stat"))
      .orderBy(groupCol)
  }

  /** Cohen's d + Hedges' g standardized effect sizes between every
    * group pair — the "is the difference big enough to CARE" companion
    * to [[welchVsRest]]'s "is it significant" (at 100k rows everything
    * is significant; d says whether it matters). Means and pooled SD
    * come from exact 2-decimal integer moments (one group aggregate,
    * G-row pair assembly), the one float stage per pair being the
    * final ratio; g applies the small-sample correction
    * (1 − 3/(4N−9)) as exact integer arithmetic inside the double. */
  def effectSizes(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val g = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("t"),
        round(col(valueCol) * 100).cast("long").as("v"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("q"))
    val pair = g.toDF("ta", "na", "sa", "qa")
      .join(broadcast(g.toDF("tb", "nb", "sb", "qb")), col("ta") < col("tb"))
    // (n−1)·s² held n×-SCALED: ss = n·Σv² − (Σv)² = n·(n−1)·s²
    val ssa = (col("na") * col("qa") - col("sa") * col("sa")).cast("double")
    val ssb = (col("nb") * col("qb") - col("sb") * col("sb")).cast("double")
    val md = col("sa").cast("double") / col("na").cast("double") -
      col("sb").cast("double") / col("nb").cast("double")
    val sp = sqrt((ssa / col("na").cast("double")
      + ssb / col("nb").cast("double"))
      / (col("na") + col("nb") - 2).cast("double"))
    val d = md / sp // the 1e-2 scale cancels in the ratio
    val corr = lit(1.0) -
      lit(3.0) / ((col("na") + col("nb")) * 4 - 9).cast("double")
    pair.select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("na"), col("nb"),
        round(md / 100.0, 4).as("mean_diff"),
        when(ssa + ssb > 0.0 && col("na") + col("nb") > 2,
          round(d, 4)).as("cohens_d"),
        when(ssa + ssb > 0.0 && col("na") + col("nb") > 2,
          round(d * corr, 4)).as("hedges_g"))
      .orderBy("type_a", "type_b")
  }

  /** Two-sample ENERGY DISTANCE between cohorts X and Y of a 2-decimal
    * value column — the distribution-distance that needs no binning
    * (metrizes weak convergence; 0 iff the distributions match):
    * ED² = 2·E|X−Y| − E|X−X′| − E|Y−Y′|. Each pairwise-|Δ| expectation
    * is computed EXACTLY without materializing pairs, via the
    * adjacent-gap identity on the distinct-value cumulative: Σ|x−y| =
    * Σ_k gap_k · [A_k·(n_B−B_k) + B_k·(n_A−A_k)] — all integers, so all
    * three sums are exact longs (bounded by value-range × n_A·n_B, not
    * by pair count) and only the final three divisions are floats.
    *
    * Scale shape: one distinct-value rollup; the cumulative window is
    * VALUE-DOMAIN-bounded (≤ 100·max_value rows for 2-decimal data),
    * never row-bounded — the vocabCoverage count-histogram shape. */
  def energyDistance(df: DataFrame, isY: Column,
      valueCol: String = "value"): DataFrame = {
    val v = df.where(col(valueCol).isNotNull)
      .select(round(col(valueCol) * 100).cast("long").as("v"),
        isY.cast("int").as("y"))
    val dv = v.groupBy("v").agg(
      sum(when(col("y") === 0, 1L).otherwise(0L)).as("a"),
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("b"))
    val w = Window.orderBy("v")
    val cum = dv
      .withColumn("ca", sum("a").over(w))
      .withColumn("cb", sum("b").over(w))
      .withColumn("gap", lead(col("v"), 1).over(w) - col("v"))
      .where(col("gap").isNotNull)
    val tot = dv.agg(sum("a").as("na"), sum("b").as("nb"))
    val s = cum.crossJoin(broadcast(tot)).agg(
      first("na").as("na"), first("nb").as("nb"),
      sum(col("gap") * (col("ca") * (col("nb") - col("cb"))
        + col("cb") * (col("na") - col("ca")))).as("sxy"),
      sum(col("gap") * col("ca") * (col("na") - col("ca")) * 2).as("sxx"),
      sum(col("gap") * col("cb") * (col("nb") - col("cb")) * 2).as("syy"))
    // expectations in original value units (the 1e-2 scale divides out)
    val exy = col("sxy").cast("double") / (col("na") * col("nb")).cast("double") / 100.0
    val exx = col("sxx").cast("double") / (col("na") * col("na")).cast("double") / 100.0
    val eyy = col("syy").cast("double") / (col("nb") * col("nb")).cast("double") / 100.0
    s.select(col("na"), col("nb"),
        round(exy, 4).as("e_xy"), round(exx, 4).as("e_xx"),
        round(eyy, 4).as("e_yy"),
        round(sqrt(greatest(lit(2.0) * exy - exx - eyy, lit(0.0))), 4)
          .as("energy_distance"))
  }

  /** Two-sample Cramér–von Mises statistic between cohorts X and Y —
    * the INTEGRATED squared ECDF gap (KS is its sup, W1 its area,
    * energy distance its binning-free cousin; CvM weights the whole
    * curve, so it sees broad mid-distribution shifts KS's single sup
    * point can miss): T = n·m/N² · Σ_pooled (F_n − G_m)². Exact form:
    * U = Σ_k (a_k+b_k)·(A_k·n_B − B_k·n_A)² over the distinct-value
    * cumulative, carried in DECIMAL(38,0) (N⁴·counts scale), then
    * T = U/(N²·n_A·n_B) is one float division. Same value-domain-
    * bounded shape as [[energyDistance]]. */
  def cramerVonMises(df: DataFrame, isY: Column,
      valueCol: String = "value"): DataFrame = {
    val D = "decimal(38,0)"
    val v = df.where(col(valueCol).isNotNull)
      .select(round(col(valueCol) * 100).cast("long").as("v"),
        isY.cast("int").as("y"))
    val dv = v.groupBy("v").agg(
      sum(when(col("y") === 0, 1L).otherwise(0L)).as("a"),
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("b"))
    val w = Window.orderBy("v")
    val cum = dv
      .withColumn("ca", sum("a").over(w))
      .withColumn("cb", sum("b").over(w))
    val tot = dv.agg(sum("a").as("na"), sum("b").as("nb"))
    cum.crossJoin(broadcast(tot))
      .withColumn("dd",
        (col("ca") * col("nb") - col("cb") * col("na")).cast(D))
      .agg(first("na").as("na"), first("nb").as("nb"),
        sum((col("a") + col("b")).cast(D) * col("dd") * col("dd")).as("u"))
      .select(col("na"), col("nb"),
        round(col("u").cast("double")
          / ((col("na") + col("nb")) * (col("na") + col("nb"))).cast("double")
          / (col("na") * col("nb")).cast("double"), 4).as("cvm_t"))
  }

  /** Jarque–Bera normality test per group over INTEGER-ROUNDED values —
    * the distribution-shape monitor (are the per-event values even
    * plausibly normal, or should the drift gates use rank tests).
    * Rounding to integer units keeps every raw-moment sum Σx⁴ below
    * 2⁵³ at fixture value ranges (x ≤ ~10³, n ≤ ~10⁷), so all four
    * sums are EXACT longs, their double casts are exact, and both
    * engines evaluate the identical central-moment expression:
    * m_k from raw moments, skew = m₃/(m₂√m₂), excess kurtosis
    * = m₄/m₂² − 3, JB = n(skew²/6 + kurt²/24).
    * Shape: one group aggregate; the assembly is G-row math. */
  def jarqueBera(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        round(col(valueCol)).cast("long").as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
    val n = col("n").cast("double")
    val mu = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n - mu * mu
    val m3 = (col("s3").cast("double") / n
      - lit(3.0) * mu * col("s2").cast("double") / n
      + lit(2.0) * mu * mu * mu)
    val m4 = (col("s4").cast("double") / n
      - lit(4.0) * mu * col("s3").cast("double") / n
      + lit(6.0) * mu * mu * col("s2").cast("double") / n
      - lit(3.0) * mu * mu * mu * mu)
    g.withColumn("skw", when(m2 > 0.0, m3 / (m2 * sqrt(m2))))
      .withColumn("krt", when(m2 > 0.0, m4 / (m2 * m2) - lit(3.0)))
      .select(col("g").as(groupCol), col("n"), round(mu, 4).as("mean"),
        round(col("skw"), 4).as("skewness"),
        round(col("krt"), 4).as("kurtosis_excess"),
        round(n * (col("skw") * col("skw") / lit(6.0)
          + col("krt") * col("krt") / lit(24.0)), 4).as("jb"))
      .orderBy("g")
  }

  /** Brown–Forsythe test (the robust Levene variant) of variance
    * homogeneity across groups: one-way ANOVA on z = |x − median_group|
    * — the check that should gate any equal-variance assumption
    * [[anovaF]] makes. Medians are interpolating percentiles over
    * 2-decimal-scaled longs, so 2·median is an exact integer and every
    * z is an exact long in half-cent units; from there it is exactly
    * [[anovaF]]'s machinery (S_i²/n_i as double products of exact
    * sums, group-ordered folds, one float ratio at the end).
    * Shape: one percentile aggregate + one moment aggregate. */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        round(col(valueCol) * 100).cast("long").as("v"))
    val med = v.groupBy("g")
      .agg(round(expr("percentile(v, 0.5)") * 2).cast("long").as("m2x"))
    val z = v.join(broadcast(med), "g")
      .select(col("g"), abs(col("v") * 2 - col("m2x")).as("z"))
    val g = z.groupBy("g").agg(count(lit(1)).as("n"), sum("z").as("s"),
      sum(col("z") * col("z")).as("q"))
    val tot = g.agg(sum("n").as("nn"), sum("s").as("ss"), count(lit(1)).as("k"))
    val sb = g.agg(aggregate(
      sort_array(collect_list(struct(col("g"),
        (col("s").cast("double") * col("s").cast("double")
          / col("n").cast("double")).as("t")))),
      lit(0.0), (a, x) => a + x.getField("t")).as("sbs"),
      aggregate(
        sort_array(collect_list(struct(col("g"),
          (col("q").cast("double")
            - col("s").cast("double") * col("s").cast("double")
              / col("n").cast("double")).as("t")))),
        lit(0.0), (a, x) => a + x.getField("t")).as("sws"))
    val w = tot.crossJoin(broadcast(sb))
      .withColumn("ssb", col("sbs")
        - col("ss").cast("double") * col("ss").cast("double")
          / col("nn").cast("double"))
      .withColumn("w_stat",
        when(col("k") > 1 && col("nn") > col("k") && col("sws") > 0.0,
          (col("ssb") / (col("k") - 1).cast("double"))
            / (col("sws") / (col("nn") - col("k")).cast("double"))))
    g.crossJoin(broadcast(w.select(col("k"), col("nn"), col("w_stat"))))
      .select(col("g").as(groupCol), col("n"),
        round(col("s").cast("double") / (col("n") * 200).cast("double"), 4)
          .as("mean_abs_dev"),
        col("k").as("n_groups"), col("nn").as("n_total"),
        round(col("w_stat"), 4).as("w_stat"))
      .orderBy(groupCol)
  }

  /** Mutual information between two categorical columns (the
    * token-label-MI pattern on a bounded grid): every log argument is a
    * ratio of exact integer products ≤ N² < 2⁵³, the grid keeps zero
    * cells out of the sum (0·ln0 = 0), and the total folds its cells in
    * (x, y) order. Output: one row per observed cell with its PMI
    * contribution and the MI + normalized-MI riders. */
  def categoricalMi(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val c = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val cx = c.groupBy("x").agg(sum("c").as("cx"))
    val cy = c.groupBy("y").agg(sum("c").as("cy"))
    val nn = c.agg(sum("c").as("n"))
    val k = c.join(broadcast(cx), "x").join(broadcast(cy), "y")
      .crossJoin(broadcast(nn))
      .withColumn("contrib", (col("c").cast("double") / col("n").cast("double"))
        * log((col("c") * col("n")).cast("double") / (col("cx") * col("cy")).cast("double")))
    val mi = k.agg(aggregate(
      sort_array(collect_list(struct(col("x"), col("y"), col("contrib")))),
      lit(0.0), (a, v) => a + v.getField("contrib")).as("mi"))
    k.crossJoin(broadcast(mi))
      .select(col("x").as(xCol), col("y").as(yCol), col("c"),
        round(col("contrib"), 4).as("contrib"), round(col("mi"), 4).as("mi"))
      .orderBy(xCol, yCol)
  }

  /** Chi-square HOMOGENEITY test of the event-type mix between the two
    * user-id-parity variants — the categorical complement of the
    * two-proportion z ([[graft.ext.Temporal.abTest]]): did the
    * treatment change WHAT users do, not just how much. The full
    * variant×type grid keeps zero cells; expected counts are single
    * divisions of exact integer products (rowΣ·colΣ/N ≪ 2⁵³), and the
    * χ² total folds its cells in (variant, type) order — the
    * engine-identical double association. Output: one row per cell
    * with observed/expected/contribution and the χ²+dof riders. */
  /** Cramér's V (plus the Bergsma bias-corrected variant) of the
    * association between two bounded categorical columns — the
    * normalized 0..1 effect size the raw χ² ([[chi2Homogeneity]],
    * hod-χ²) lacks: comparable across tables of different size and
    * shape. Full r×c grid with zero cells; expected counts are single
    * divisions of exact integer products; the χ² fold runs in (x, y)
    * cell order. V = √(φ²/min(r−1, c−1)); the corrected form subtracts
    * the φ² bias (r−1)(c−1)/(N−1) and shrinks r, c the same way.
    * Output (one row): n, r, c, chi2, v, v_corrected. */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val g = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    val grid = g.select("x").distinct().crossJoin(g.select("y").distinct())
      .join(g, Seq("x", "y"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val rt = grid.groupBy("x").agg(sum("c").as("rt"))
    val ct = grid.groupBy("y").agg(sum("c").as("ct"))
    val nn = grid.agg(sum("c").as("n"),
      countDistinct("x").as("r"), countDistinct("y").as("cc"))
    val k = grid.join(broadcast(rt), "x").join(broadcast(ct), "y")
      .crossJoin(broadcast(nn))
      .withColumn("e", (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
      .withColumn("contrib",
        (col("c").cast("double") - col("e")) * (col("c").cast("double") - col("e"))
          / col("e"))
    val chi2 = k.agg(
      aggregate(sort_array(collect_list(struct(col("x"), col("y"), col("contrib")))),
        lit(0.0), (a, x) => a + x.getField("contrib")).as("chi2"))
    val nd = col("n").cast("double"); val rd = col("r").cast("double")
    val cd = col("cc").cast("double")
    val phi2 = col("chi2") / nd
    val phi2c = greatest(lit(0.0),
      phi2 - (rd - 1.0) * (cd - 1.0) / (nd - 1.0))
    val rc = rd - (rd - 1.0) * (rd - 1.0) / (nd - 1.0)
    val cc2 = cd - (cd - 1.0) * (cd - 1.0) / (nd - 1.0)
    nn.crossJoin(broadcast(chi2))
      .select(col("n"), col("r"), col("cc").as("c"),
        round(col("chi2"), 4).as("chi2"),
        round(sqrt(phi2 / least(rd - 1.0, cd - 1.0)), 4).as("v"),
        round(sqrt(phi2c / least(rc - 1.0, cc2 - 1.0)), 4).as("v_corrected"))
  }

  def chi2Homogeneity(events: DataFrame): DataFrame = {
    val g = events
      .select((col("user_id") % 2).cast("int").as("variant"), col("event_type"))
      .groupBy("variant", "event_type").agg(count(lit(1)).as("c"))
    val grid = g.select("variant").distinct()
      .crossJoin(g.select("event_type").distinct())
      .join(g, Seq("variant", "event_type"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val rt = grid.groupBy("variant").agg(sum("c").as("rt"))
    val ct = grid.groupBy("event_type").agg(sum("c").as("ct"))
    val nn = grid.agg(sum("c").as("n"))
    val k = grid.join(broadcast(rt), "variant").join(broadcast(ct), "event_type")
      .crossJoin(broadcast(nn))
      .withColumn("e", (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
      .withColumn("contrib",
        (col("c").cast("double") - col("e")) * (col("c").cast("double") - col("e"))
          / col("e"))
    val tot = k.agg(
      aggregate(sort_array(collect_list(struct(col("variant"), col("event_type"),
          col("contrib")))),
        lit(0.0), (a, x) => a + x.getField("contrib")).as("chi2"),
      ((countDistinct("variant") - 1) * (countDistinct("event_type") - 1)).as("dof"))
    k.crossJoin(broadcast(tot))
      .select(col("variant"), col("event_type"), col("c"),
        round(col("e"), 4).as("expected"), round(col("contrib"), 4).as("contrib"),
        round(col("chi2"), 4).as("chi2"), col("dof"))
      .orderBy("variant", "event_type")
  }
}
