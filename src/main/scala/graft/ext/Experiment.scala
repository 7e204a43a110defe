package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Experimentation analytics beyond the basic two-proportion z
  * ([[Temporal.abTest]]): sample-ratio-mismatch guardrail, CUPED
  * variance reduction, and difference-in-differences — the trio an A/B
  * platform computes for every experiment readout.
  *
  * Determinism contract: per-user metrics are exact 2-decimal integer
  * sums; every variance/covariance assembles from integer raw moments
  * (DECIMAL(38,0) accumulators) with doubles only in the final
  * statistics, expression-mirrored in the DuckDB oracles. The variant
  * assignment is user-id parity — the fixture's deterministic split. */
object Experiment {

  private val Dec = "decimal(38,0)"

  /** Sample-ratio mismatch χ² (1 df) of the unit split against 50/50 —
    * the first guardrail on any experiment: if the split itself is off,
    * every downstream readout is suspect. Counts DISTINCT units per
    * variant; χ² = (nA−E)²/E + (nB−E)²/E with E = N/2, z = √χ² signed
    * by the A-excess. Output: (n_a, n_b, chi2, z). */
  def sampleRatioCheck(df: DataFrame, unitCol: String = "user_id"): DataFrame = {
    val u = df.select(col(unitCol).as("u"), (col(unitCol) % 2).cast("int").as("v"))
      .distinct()
    val c = u.agg(
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val e = (na + nb) / 2.0
    val chi2 = (na - e) * (na - e) / e + (nb - e) * (nb - e) / e
    c.select(col("n_a"), col("n_b"),
      round(chi2, 4).as("chi2"),
      (round(signum(na - e) * sqrt(chi2), 4) + lit(0.0)).as("z"))
  }

  /** CUPED (Deng et al. 2013): adjust each unit's experiment-period
    * metric by its PRE-period baseline, y' = y − θ(x − x̄),
    * θ = cov(x,y)/var(x) pooled — the industry-standard variance
    * reduction that turns week-long experiments into day-long ones.
    *
    * `perUser` must be (u, v, x, y) with x/y exact integer unit sums
    * (pre/post). All second moments accumulate in DECIMAL; θ and the
    * closed-form var(y') = var(y) − 2θcov + θ²var(x) divide the same
    * integers in both engines. Output per variant (plus the pooled θ
    * and variance-reduction riders): (variant, n, mean_y, mean_y_adj,
    * theta, var_reduction). */
  def cuped(perUser: DataFrame): DataFrame = {
    val m = perUser.agg(
      count(lit(1)).cast(Dec).as("n"),
      sum(col("x").cast(Dec)).as("sx"), sum(col("y").cast(Dec)).as("sy"),
      sum(col("x").cast(Dec) * col("x").cast(Dec)).as("sxx"),
      sum(col("x").cast(Dec) * col("y").cast(Dec)).as("sxy"),
      sum(col("y").cast(Dec) * col("y").cast(Dec)).as("syy"))
    val pool = m.select(
      col("n").cast("double").as("nd"),
      col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("double").as("covn"),
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("varxn"),
      (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("varyn"))
      .select(col("nd"), (col("sxd") / col("nd")).as("xbar"),
        (col("covn") / col("varxn")).as("theta"),
        // var(y') = var(y) − cov²/var(x)  (θ substituted) — n-scale cancels
        (lit(1.0) - (col("varyn") - col("covn") * col("covn") / col("varxn"))
          / col("varyn")).as("var_reduction"))
    val g = perUser.groupBy(col("v").as("variant")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(Dec)).as("gx"), sum(col("y").cast(Dec)).as("gy"))
    g.crossJoin(broadcast(pool))
      .select(col("variant"), col("n"),
        round(col("gy").cast("double") / col("n").cast("double") / 100.0, 4)
          .as("mean_y"),
        round((col("gy").cast("double") / col("n").cast("double")
          - col("theta") * (col("gx").cast("double") / col("n").cast("double")
            - col("xbar"))) / 100.0, 4).as("mean_y_adj"),
        round(col("theta"), 4).as("theta"),
        round(col("var_reduction"), 4).as("var_reduction"))
      .orderBy("variant")
  }

  /** Difference-in-differences over (variant × period) cell means:
    * DiD = (ȳ_B,post − ȳ_B,pre) − (ȳ_A,post − ȳ_A,pre), with the
    * unpooled SE √(Σ s²_g/n_g) over the four cells (s² from integer
    * raw moments). `cells` must be (v, p, val) with val exact integer
    * units and p ∈ {0 = pre, 1 = post}. Output (one row): the four
    * cell means, did, se, t. */
  def diffInDiff(cells: DataFrame): DataFrame = {
    val g = cells.groupBy(col("v"), col("p")).agg(
      count(lit(1)).as("n"),
      sum(col("val").cast(Dec)).as("s"),
      sum(col("val").cast(Dec) * col("val").cast(Dec)).as("ss"))
    val wide = g.select(col("v"), col("p"), col("n"),
        (col("s").cast("double") / col("n").cast("double")).as("m"),
        ((col("n") * col("ss") - col("s") * col("s")).cast("double")
          / (col("n").cast("double") * (col("n").cast("double") - 1.0))).as("s2"))
      .groupBy()
      .pivot(concat(col("v"), lit("_"), col("p")), Seq("0_0", "0_1", "1_0", "1_1"))
      .agg(first("m").as("m"), first("s2").as("s2"), first("n").as("n"))
    val did = (col("1_1_m") - col("1_0_m")) - (col("0_1_m") - col("0_0_m"))
    val se = sqrt(
      col("0_0_s2") / col("0_0_n") + col("0_1_s2") / col("0_1_n") +
        col("1_0_s2") / col("1_0_n") + col("1_1_s2") / col("1_1_n"))
    wide.select(
      round(col("0_0_m") / 100.0, 4).as("ctrl_pre"),
      round(col("0_1_m") / 100.0, 4).as("ctrl_post"),
      round(col("1_0_m") / 100.0, 4).as("treat_pre"),
      round(col("1_1_m") / 100.0, 4).as("treat_post"),
      (round(did / 100.0, 4) + lit(0.0)).as("did"),
      round(se / 100.0, 4).as("se"),
      (round(when(se > 0.0, did / se), 4) + lit(0.0)).as("t"))
  }
}
