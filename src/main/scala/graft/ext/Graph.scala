package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over pair tables — the natural continuation of
  * [[Dedup.dupClusters]]' connected components: once a candidate-pair
  * graph exists (near-dup edges, citation links, co-occurrence), rank
  * its nodes. */
object Graph {

  /** PageRank over an undirected edge list (doc_a, doc_b), `iters` exact
    * synchronous iterations with damping `d`:
    *   r_0(n)    = 1/N
    *   r_{i+1}(n) = (1−d)/N + d · Σ_{(m,n)∈E} r_i(m)/deg(m)
    * N = nodes appearing in ≥1 edge. Symmetric edges mean every node has
    * in-edges, so no dangling-mass term is needed. Deterministic: fixed
    * iteration count, no convergence test, no RNG.
    *
    * Scale shape: the classic Pregel-lite loop — per iteration ONE join
    * of the edge list with the rank table (both partitioned by node id;
    * the rank side is |V| rows, edge side |E|) and one groupBy(dst) sum
    * with map-side combine. Ranks persist per generation and the
    * superseded generation unpersists; no driver-side collect at any
    * point. Output: (doc_id, pr) with pr ROUND(·,4). */
  def pageRank(pairs: DataFrame, iters: Int = 5, d: Double = 0.85): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = deg.count()
    var ranks = deg.select(col("src").as("id"), lit(1.0 / n).as("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deged = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (0 until iters).foreach { _ =>
      val next = deged.join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("r") / col("deg")).as("m"))
        .select(col("id"), (lit((1 - d) / n) + lit(d) * col("m")).as("r"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent generation
      ranks.unpersist(blocking = false)
      ranks = next
    }
    edges.unpersist(blocking = false)
    deged.unpersist(blocking = false)
    val out = ranks.select(col("id").as("doc_id"), round(col("r"), 4).as("pr"))
      .localCheckpoint(true)
    ranks.unpersist(blocking = false)
    out
  }
}
