package graft.ext

import org.apache.spark.sql.DataFrame
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

  /** Chi-square HOMOGENEITY test of the event-type mix between the two
    * user-id-parity variants — the categorical complement of the
    * two-proportion z ([[graft.ext.Temporal.abTest]]): did the
    * treatment change WHAT users do, not just how much. The full
    * variant×type grid keeps zero cells; expected counts are single
    * divisions of exact integer products (rowΣ·colΣ/N ≪ 2⁵³), and the
    * χ² total folds its cells in (variant, type) order — the
    * engine-identical double association. Output: one row per cell
    * with observed/expected/contribution and the χ²+dof riders. */
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
