package graft.ext

import graft.SparkSpec

/** Hand-computed fixtures for the experimentation trio. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("SRM chi-square matches the hand computation") {
    // users 0..9 → 5/5 exact split → chi2 0, z 0
    val even = (0L until 10L).map(u => (u, "x")).toDF("user_id", "pad")
    val a = Experiment.sampleRatioCheck(even)
      .as[(Long, Long, Double, Double)].collect().head
    assert(a == ((5L, 5L, 0.0, 0.0)), a.toString)
    // 6 even vs 2 odd: E = 4, chi2 = (2²/4)·2 = 2, z = +√2
    val skew = Seq(0L, 2L, 4L, 6L, 8L, 10L, 1L, 3L).map(u => (u, "x"))
      .toDF("user_id", "pad")
    val b = Experiment.sampleRatioCheck(skew)
      .as[(Long, Long, Double, Double)].collect().head
    assert(b == ((6L, 2L, 2.0, 1.4142)), b.toString)
  }

  test("CUPED: perfectly correlated covariate removes all variance") {
    // y = 2x exactly → theta 2, var_reduction 1, adjusted means equal
    val pu = Seq((1L, 0, 100L, 200L), (2L, 1, 200L, 400L),
      (3L, 0, 300L, 600L), (4L, 1, 400L, 800L)).toDF("u", "v", "x", "y")
    val got = Experiment.cuped(pu)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.forall(r => r._5 == 2.0 && r._6 == 1.0), got.toString)
    // adjusted means: ȳ_v − θ(x̄_v − x̄); x̄ = 250: v0: 4 − 2·(2−2.5) = 5;
    // v1: 6 − 2·(3−2.5) = 5 → both 5.0 (the whole split difference was
    // explained by the covariate)
    assert(got.forall(_._4 == 5.0), got.toString)
  }

  test("DiD matches the hand computation") {
    // ctrl: pre 100, post 200 (Δ=1); treat: pre 100, post 400 (Δ=3)
    // → DiD = 2.0 (descaled), cells exact
    val cells = Seq(
      (0, 0, 100L), (0, 0, 100L), (0, 1, 200L), (0, 1, 200L),
      (1, 0, 100L), (1, 0, 100L), (1, 1, 400L), (1, 1, 400L))
      .toDF("v", "p", "val")
    val got = Experiment.diffInDiff(cells).collect().head
    assert(got.getDouble(0) == 1.0 && got.getDouble(1) == 2.0 &&
      got.getDouble(2) == 1.0 && got.getDouble(3) == 4.0, got.toString)
    assert(got.getDouble(4) == 2.0, got.toString) // did
    assert(got.getDouble(5) == 0.0, got.toString) // zero within-cell variance
    assert(got.isNullAt(6), got.toString) // t undefined at se = 0
  }
}
