package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral embedding primitives: the PPMI co-occurrence matrix and its
  * dominant eigendirection by distributed power iteration — "embedding
  * training as declarative dataflow". PPMI factorization is the classic
  * count-based word embedding (Levy & Goldberg 2014: skip-gram with
  * negative sampling implicitly factorizes shifted PMI); the top
  * direction is its rank-1 core and the building block (iterate +
  * deflate) for a k-dim spectral embedding.
  *
  * Scale shape: the MATRIX is the corpus-scale object and stays
  * distributed — (w1, w2, ppmi) rows, one broadcast-join + map-side-
  * combined aggregate per mat-vec. The VECTOR is vocab-bounded and
  * rides on the driver (V doubles — the same bound every broadcast
  * dictionary in this engine already accepts). Determinism: mat-vec
  * products quantize to a fixed-point grid and sum as longs (the
  * [[LinearModel]] trick — any partitioning, same trajectory), and the
  * norm folds in sorted-word order; the only cross-engine wobble is
  * ln()'s last ulp inside the PPMI weights, filtered on the EXACT
  * integer predicate c·N > cw1·cw2 so entry membership never differs. */
object Spectral {

  /** PPMI entries from symmetric skip-gram pair counts (w1, w2, c):
    * ppmi = ln(c·N / (cw1·cw2)) kept only where positive — membership
    * decided by the exact integer cross-product predicate, not the
    * float log. */
  def ppmiMatrix(pairCounts: DataFrame): DataFrame = {
    val c1 = pairCounts.groupBy("w1").agg(sum("c").as("cw"))
    val nRow = pairCounts.agg(sum(col("c")).as("n"))
    pairCounts
      .join(broadcast(c1.toDF("a1", "ca")), col("w1") === col("a1"))
      .join(broadcast(c1.toDF("a2", "cb")), col("w2") === col("a2"))
      .crossJoin(broadcast(nRow))
      .where(col("c") * col("n") > col("ca") * col("cb"))
      .select(col("w1"), col("w2"),
        log(col("c").cast("double") * col("n")
          / (col("ca").cast("double") * col("cb"))).as("m"))
  }

  /** Dominant eigendirection of the PPMI matrix: `iters` power steps
    * from the uniform positive start (PPMI ≥ 0, so by Perron–Frobenius
    * the iterate stays positive — no sign ambiguity). Output: (word,
    * weight) — the corpus's principal semantic axis. */
  def ppmiTopDirection(pairCounts: DataFrame, iters: Int = 5,
      gridBits: Int = 30): Seq[(String, Double)] = {
    val spark = pairCounts.sparkSession
    import spark.implicits._
    val grid = (1L << gridBits).toDouble
    val m = ppmiMatrix(pairCounts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val words = m.select(col("w1").as("w")).distinct()
        .orderBy("w").as[String].collect()
      if (words.isEmpty) return Seq.empty
      var x: Map[String, Double] =
        words.map(_ -> 1.0 / math.sqrt(words.length.toDouble)).toMap
      for (_ <- 0 until iters) {
        val xDf = words.map(w => (w, x(w))).toSeq.toDF("xw", "xv")
        val y = m.join(broadcast(xDf), col("w2") === col("xw"))
          .groupBy("w1")
          .agg(sum(floor(col("m") * col("xv") * lit(grid) + lit(0.5))
            .cast("long")).as("q"))
          .as[(String, Long)].collect().toMap // V-bounded pull
        val yv = words.map(w => w -> (y.getOrElse(w, 0L).toDouble / grid)).toMap
        val norm = math.sqrt(
          words.foldLeft(0.0)((acc, w) => { val v = yv(w); acc + v * v }))
        x = words.map(w => w -> yv(w) / norm).toMap
      }
      words.map(w => w -> x(w)).toSeq
    } finally m.unpersist(false)
  }
}
