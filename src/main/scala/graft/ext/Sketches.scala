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
}
