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
