package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the sublinear-memory path for
  * cardinality and frequency at 100 TB, where exact distinct counts and
  * per-key tallies stop fitting. Thin, typed wrappers over Spark's
  * built-in HLL++ and Count-Min implementations (both codegen'd
  * aggregates with partial+final merge, so they shuffle O(sketch) bytes
  * per group instead of O(values)).
  *
  * Sketch bytes are engine-specific, so these carry NO DuckDB oracle;
  * correctness is spec-bounded instead (SketchesSpec): HLL++ relative
  * error vs the exact count, CMS one-sided overestimation within
  * eps·N at confidence. */
object Sketches {

  /** Approximate distinct tokens per group (HLL++). `rsd` is the target
    * relative standard deviation (Spark default 0.05). */
  def approxVocabSize(docs: DataFrame, groupCol: String, rsd: Double = 0.05): DataFrame =
    docs.select(col(groupCol), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy(groupCol)
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_vocab"))

  /** Build a Count-Min sketch (binary) over a column; eps = additive
    * error fraction of total count, confidence = probability the bound
    * holds. Mergeable across partitions/batches by construction. */
  def cmsOf(df: DataFrame, c: Column, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): Array[Byte] =
    df.select(count_min_sketch(c, lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)

  /** Point-estimate lookups against a serialized CMS. Guarantees (w.p.
    * `confidence`): estimate ≥ true count, estimate ≤ true + eps·N. */
  def cmsEstimate(sketch: Array[Byte], item: Any): Long =
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))
      .estimateCount(item)

  /** Misra–Gries heavy-hitters summary over a column: a MERGEABLE,
    * bounded-memory frequency sketch — each partition keeps ≤ `capacity`
    * (item, count) entries, and summaries combine associatively
    * (Agarwal et al., "Mergeable Summaries"), so the whole pass is one
    * `treeAggregate` shuffling O(capacity) entries per partition instead
    * of a full groupBy of the key space. The 100 TB contract: every item
    * with true count > N/(capacity+1) survives, and each reported count
    * undercounts by at most N/(capacity+1) (spec-bounded). When
    * `capacity` ≥ the number of distinct items no decrement ever fires
    * and counts are EXACT — which is what gives the fixture-scale query
    * its DuckDB oracle.
    *
    * Returns the top `k` surviving items as (item, count), ordered
    * (count DESC, item ASC). */
  def heavyHitters(df: DataFrame, c: Column, capacity: Int, k: Int): DataFrame = {
    require(capacity >= 1 && k >= 1, "capacity and k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.MisraGries
    // add/merge kernel shared with the SQL UDAF form (graft_heavy_hitters,
    // registered by GraftExtensions) — one implementation, two surfaces
    val summary = df.select(c.cast("string").as("item")).as[String]
      .rdd.treeAggregate(new MisraGries.MG)(
        (m, t) => MisraGries.add(m, t, capacity),
        (a, b) => MisraGries.merge(a, b, capacity))
    summary.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
      .toDF("item", "c")
  }
}
