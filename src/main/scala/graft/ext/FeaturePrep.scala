package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised feature-preparation operators — the encodings a tabular
  * modeling pipeline derives from (category, binary label) pairs before
  * training: leave-one-out target encoding and weight-of-evidence /
  * information-value binning. Both are single-aggregation pipelines
  * whose outputs are ratios of exact integers (plus one ln of an
  * integer-product ratio), so they carry DuckDB hash oracles.
  */
object FeaturePrep {

  /** Leave-one-out target encoding of a categorical column against a
    * binary label. For a row in category c the encoded value excludes
    * the row itself: positives see (pos−1)/(n−1), negatives pos/(n−1) —
    * the leakage-safe mean encoding (plain mean encoding leaks the
    * row's own label, which a tree model will happily memorize).
    *
    * Since the label is binary, each category has at most TWO distinct
    * encoded values, so the compact per-category form IS the full
    * encoding: (cat, n, pos, te_pos, te_neg), NULL where the variant
    * doesn't exist (no positive/negative row, or a singleton category).
    * One groupBy; joins back to rows for free downstream. */
  def targetEncodingLoo(df: DataFrame, catCol: String, labelCol: String): DataFrame =
    df.groupBy(col(catCol).as("cat"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("pos"))
      .select(col("cat"), col("n"), col("pos"),
        round(when(col("n") > 1 && col("pos") >= 1,
          (col("pos") - 1).cast("double") / (col("n") - 1).cast("double")), 4)
          .as("te_pos"),
        round(when(col("n") > 1 && col("n") - col("pos") >= 1,
          col("pos").cast("double") / (col("n") - 1).cast("double")), 4)
          .as("te_neg"))
      .orderBy("cat")

  /** Weight of evidence + information value of a binned feature against
    * a binary label: per bin, WoE = ln(share_good/share_bad) with
    * add-one smoothing (g+1 over G+K, K = #bins — zero cells stay
    * finite), IV = Σ (share_good − share_bad)·WoE folded in bin order.
    * The credit-scoring / feature-screening standard: |IV| ranks how
    * much signal the binning carries.
    *
    * Determinism: ln sees only a ratio of exact integer products; the
    * shares divide the same integers in both engines; the IV fold is
    * bin-ordered. Output: (bin, n, pos, woe, iv) with the scalar IV
    * replicated per row ([[Drift.anovaF]] presentation). */
  def woeIv(df: DataFrame, binCol: String, labelCol: String): DataFrame = {
    val g = df.groupBy(col(binCol).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("g"))
      .withColumn("b", col("n") - col("g"))
    val tot = g.agg(sum("g").as("gt"), sum("b").as("bt"),
      count(lit(1)).as("k"))
    val sm = g.crossJoin(broadcast(tot))
      .withColumn("g1", col("g") + 1).withColumn("b1", col("b") + 1)
      .withColumn("gd", col("gt") + col("k")).withColumn("bd", col("bt") + col("k"))
      .withColumn("woe", log((col("g1") * col("bd")).cast("double")
        / (col("b1") * col("gd")).cast("double")))
      .withColumn("contrib",
        (col("g1").cast("double") / col("gd").cast("double")
          - col("b1").cast("double") / col("bd").cast("double")) * col("woe"))
    val iv = sm.agg(
      aggregate(sort_array(collect_list(struct(col("bin"), col("contrib")))),
        lit(0.0), (a, x) => a + x.getField("contrib")).as("iv"))
    sm.crossJoin(broadcast(iv))
      .select(col("bin"), col("n"), col("g").as("pos"),
        (round(col("woe"), 4) + lit(0.0)).as("woe"),
        (round(col("iv"), 4) + lit(0.0)).as("iv"))
      .orderBy("bin")
  }
}
