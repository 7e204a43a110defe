package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible distributed training for linear probes — the fasttext-
  * style "cheap model over engineered features" stage of a data
  * pipeline (quality gates, domain routing, filter distillation).
  *
  * The distributed-training determinism problem: a full-batch gradient
  * is a SUM of per-row doubles, and float addition is not associative,
  * so the same data on a different partitioning yields a different
  * model — unreproducible at 1000 executors. The fix here: each row's
  * per-feature gradient contribution is quantized to a fixed-point grid
  * (`floor(c · 2^gridBits + 0.5)`) and accumulated as a LONG. Integer
  * addition IS associative, so the gradient — and hence the entire
  * training trajectory — is bit-identical under ANY partitioning,
  * shuffle order, or executor count (and replays exactly in the SQL
  * oracle). Quantization error is ≤ 2^-gridBits per row per feature
  * (≈1e-9 at the default 30 bits) — far below the gradient noise any
  * SGD run tolerates.
  *
  * Scale shape: one map-side-combined aggregate per iteration (k sums +
  * a count shuffle O(partitions · k) longs — never the rows); weights
  * ride into the next iteration's expressions as literals. Cache the
  * feature frame for multi-iteration reuse. Overflow bound: choose
  * gridBits with n · max|contrib| · 2^gridBits < 2^63 (defaults hold to
  * ~3e7 rows at |contrib| ≤ 100; drop to 20 bits for 3e10 rows). */
object LinearModel {

  /** Σ_k w_k·x_k as a left-fold in `featureCols` order (the association
    * order is part of the determinism contract — the oracle mirrors it). */
  def score(featureCols: Seq[String], w: Seq[Double]): Column =
    featureCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }.reduce(_ + _)

  /** Exact grouped ROC-AUC (Mann–Whitney U with midrank tie handling):
    * AUC_g = (U2_g − n⁺(n⁺+1)) / (2·n⁺·n⁻) where U2_g = Σ over distinct
    * scores s of p_s·(2·before_s + t_s + 1) — before_s = group rows with
    * smaller score, t_s/p_s = total/positive rows AT s. Everything up to
    * the final division is exact LONG arithmetic, so the result is
    * deterministic under any partitioning and oracle-replayable.
    *
    * Scale shape: ties collapse in ONE combine-shuffle to (group, score)
    * count rows; the per-group cumulative runs as the same two-pass
    * offset scan as [[Drift.ksDrift]] — range-partition by score (ties
    * never split), P·G offset longs via the driver, per-partition
    * partial (U2, n⁺, n) longs out, one tiny final merge. No global-
    * order window, no per-group single-task timeline. */
  def auc(scored: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String, maxGroups: Int = 10000): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = scored.sparkSession
    val sg = scored
      .select(col(groupCol).cast("string").as("g"),
        col(scoreCol).cast("double").as("s"),
        when(col(labelCol) === 1.0, 1L).otherwise(0L).as("y"))
      .where(col("s").isNotNull && col("g").isNotNull)
      .groupBy("g", "s")
      .agg(count(lit(1)).as("t"), sum(col("y")).as("p"))
    val groups = sg.select("g").distinct().orderBy("g")
      .collect().map(_.getString(0))
    require(groups.length <= maxGroups,
      s"${groups.length} groups exceed maxGroups=$maxGroups")
    if (groups.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField(groupCol, StringType),
          StructField("auc", DoubleType))))
    val gIdx = groups.zipWithIndex.toMap
    val G = groups.length
    val np = spark.sparkContext.defaultParallelism
    val vc = sg.repartitionByRange(np, col("s"))
      .sortWithinPartitions("s", "g")
    vc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bcIdx = spark.sparkContext.broadcast(gIdx)
      val partTotals = vc.rdd.mapPartitionsWithIndex { (pid, it) =>
        val idx = bcIdx.value
        val a = new Array[Long](idx.size)
        it.foreach(r => a(idx(r.getString(0))) += r.getLong(2))
        Iterator.single(pid -> a)
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partTotals.scanLeft(new Array[Long](G)) { (acc, cur) =>
        Array.tabulate(G)(k => acc(k) + cur(k))
      }
      val bcOff = spark.sparkContext.broadcast(offsets)
      val partials = vc.rdd.mapPartitionsWithIndex { (pid, it) =>
        val idx = bcIdx.value
        val cumT = bcOff.value(pid).clone()
        val u2 = new Array[Long](idx.size)
        val nPos = new Array[Long](idx.size)
        val nTot = new Array[Long](idx.size)
        it.foreach { r =>
          val k = idx(r.getString(0))
          val t = r.getLong(2); val p = r.getLong(3)
          u2(k) += p * (2L * cumT(k) + t + 1L)
          nPos(k) += p; nTot(k) += t
          cumT(k) += t
        }
        Iterator.range(0, idx.size).filter(nTot(_) > 0)
          .map(k => Row(k, u2(k), nPos(k), nTot(k)))
      }.collect() // P·G bounded partials
      val acc = Array.fill(G)((0L, 0L, 0L))
      partials.foreach { r =>
        val k = r.getInt(0)
        val (a, b, c) = acc(k)
        acc(k) = (a + r.getLong(1), b + r.getLong(2), c + r.getLong(3))
      }
      val rows = groups.indices.flatMap { k =>
        val (u2, p, n) = acc(k)
        val neg = n - p
        if (p == 0L || neg == 0L) Some(Row(groups(k), null)) // undefined
        else Some(Row(groups(k),
          java.lang.Double.valueOf(
            (u2 - p * (p + 1)).toDouble / (2.0 * p * neg))))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField(groupCol, StringType),
          StructField("auc", DoubleType))))
    } finally vc.unpersist(false)
  }

  /** Full-batch gradient descent for least-squares regression of
    * `labelCol` on `featureCols`, starting from w = 0. Returns the
    * trained weights. Deterministic per the fixed-point contract above. */
  def trainLinearProbe(feats: DataFrame, featureCols: Seq[String],
      labelCol: String, lr: Double, iters: Int, gridBits: Int = 30): Array[Double] = {
    require(gridBits >= 1 && gridBits <= 40, "gridBits in [1, 40]")
    val grid = (1L << gridBits).toDouble
    val n = feats.count()
    require(n > 0, "empty training frame")
    var w = Array.fill(featureCols.size)(0.0)
    for (_ <- 0 until iters) {
      val resid = score(featureCols, w.toSeq) - col(labelCol)
      val aggs = featureCols.map(c =>
        sum(floor(resid * col(c) * lit(grid) + lit(0.5)).cast("long")))
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, i) =>
        wi - lr * ((row.getLong(i).toDouble / grid) / n)
      }
    }
    w
  }
}
