package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Best decision-stump split of a binned feature against a binary
    * label by Gini impurity — the single-feature screen a tree
    * ensemble's first split would make, and the standard "does this
    * feature carry signal at all" check before training anything.
    *
    * EXACT argmin: for split t, the weighted child impurity is
    * W(t)/(n_L·n_R·n) with W(t) = (n_L²−ΣcL²)·n_R + (n_R²−ΣcR²)·n_L —
    * all DECIMAL integers from one bin rollup + a bins-bounded
    * cumulative. The argmin compares candidates by CROSS-MULTIPLIED
    * decimal products (W_a·d_b vs W_b·d_a), never by a floating
    * division, via a bins²-bounded anti-join — bin tie-breaks low.
    * Output (one row): split_bin (left = bin ≤ split), n_left/right,
    * pos_left/right, gini_parent, gini_children, gain. */
  def giniStump(df: DataFrame, binCol: String, labelCol: String): DataFrame = {
    val g = df.select(col(binCol).as("bin"), col(labelCol).cast("long").as("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("y").as("pos"))
    // cumulative over the bins-bounded rollup (never rows)
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = g.agg(sum("n").as("nt"), sum("pos").as("pt"))
    val cand = g.withColumn("nl", sum("n").over(w))
      .withColumn("pl", sum("pos").over(w))
      .crossJoin(broadcast(tot))
      .where(col("nl") < col("nt")) // the all-left "split" is no split
      .select(col("bin"), col("nl"), col("pl"),
        (col("nt") - col("nl")).as("nr"), (col("pt") - col("pl")).as("pr"),
        col("nt"), col("pt"))
    val D = "decimal(38,0)"
    def sq(c: Column) = c.cast(D) * c.cast(D)
    val scored = cand
      .withColumn("wnum",
        (sq(col("nl")) - sq(col("pl")) - sq(col("nl") - col("pl"))) * col("nr").cast(D)
          + (sq(col("nr")) - sq(col("pr")) - sq(col("nr") - col("pr"))) * col("nl").cast(D))
      .withColumn("den", col("nl").cast(D) * col("nr").cast(D))
    val other = scored.select(col("bin").as("b2"), col("wnum").as("w2"),
      col("den").as("d2"))
    val best = scored.join(broadcast(other),
        other("w2") * scored("den") < scored("wnum") * other("d2") ||
          (other("w2") * scored("den") === scored("wnum") * other("d2") &&
            other("b2") < scored("bin")),
        "left_anti")
    best.select(col("bin").as("split_bin"), col("nl").as("n_left"),
      col("nr").as("n_right"), col("pl").as("pos_left"), col("pr").as("pos_right"),
      round(lit(1.0) - (sq(col("pt")) + sq(col("nt") - col("pt"))).cast("double")
        / sq(col("nt")).cast("double"), 4).as("gini_parent"),
      round(col("wnum").cast("double")
        / (col("nl").cast("double") * col("nr").cast("double")
          * col("nt").cast("double")), 4).as("gini_children"),
      round((lit(1.0) - (sq(col("pt")) + sq(col("nt") - col("pt"))).cast("double")
        / sq(col("nt")).cast("double"))
        - col("wnum").cast("double")
          / (col("nl").cast("double") * col("nr").cast("double")
            * col("nt").cast("double")), 4).as("gain"))
  }

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
