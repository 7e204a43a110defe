package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the rank-statistics family — each value
  * verified against the textbook formula (and scipy's conventions:
  * average ranks for ties, tie-corrected variances). */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("spearman with ties matches the hand computation") {
    // x = [1,2,2,3] → avg ranks 1, 2.5, 2.5, 4; y = [1,2,3,4] → 1,2,3,4
    // rho = 72 / sqrt(72·80) = 0.9487 (scipy spearmanr = 0.94868…)
    val d = Seq(("g", 1, 1), ("g", 2, 2), ("g", 2, 3), ("g", 3, 4))
      .toDF("grp", "x", "y")
    val got = RankStats.spearman(d, "grp", col("x"), col("y"))
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", 4L, 0.9487)), got.toString)
  }

  test("spearman is NULL for a constant metric, ±1 for monotone") {
    val d = Seq(("c", 1, 7), ("c", 2, 7), ("m", 1, 5), ("m", 2, 9),
      ("r", 1, 9), ("r", 2, 5)).toDF("grp", "x", "y")
    val got = RankStats.spearman(d, "grp", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got("c").isNaN, got.toString)
    assert(got("m") == 1.0 && got("r") == -1.0, got.toString)
  }

  test("mann-whitney U and tie-corrected z match the hand computation") {
    // A = {1,2,3}, B = {2,3,4}; win-count convention U_A = #{a>b} + ½ties
    // (= R_A − n_A(n_A+1)/2): U_A = 1 + ½·2 = 2 (u2 = 4)
    // T = 12, Var = 9/12·(7 − 12/30) = 4.95, z = −2.5/√4.95 = −1.1237
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("t", "v")
    val got = RankStats.mannWhitney(d, "t", "v", "a", "b")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got == ((3L, 3L, 4L, 2.0, -1.1237)), got.toString)
  }

  test("kruskal-wallis matches the hand computation (no ties)") {
    // a = {1,2}, b = {3,4}: ranks 1..4, H = 12/20·29 − 15 = 2.4 = Hc
    val d = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("t", "v")
    val got = RankStats.kruskalWallis(d, "t", "v")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 1.5, 2.4, 2.4), ("b", 2L, 3.5, 2.4, 2.4)),
      got.toString)
  }

  test("kendall tau-b: perfect agreement → 1, perfect reversal → −1") {
    val up = Seq((1, 1), (2, 2), (3, 3)).toDF("x", "y")
    val down = Seq((1, 3), (2, 2), (3, 1)).toDF("x", "y")
    val a = RankStats.kendallTauBinned(up, col("x"), col("y"))
      .as[(Long, Long, Long, Double)].collect().head
    val b = RankStats.kendallTauBinned(down, col("x"), col("y"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(a == ((3L, 3L, 0L, 1.0)), a.toString)
    assert(b == ((3L, 0L, 3L, -1.0)), b.toString)
  }

  test("kendall tau-b with ties matches the hand computation") {
    // cells (1,1),(1,2),(2,1),(2,2) each ×1: nc = 1, nd = 1,
    // n0 = 6, n1 = n2 = 2 → tau = 0
    val d = Seq((1, 1), (1, 2), (2, 1), (2, 2)).toDF("x", "y")
    val got = RankStats.kendallTauBinned(d, col("x"), col("y"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((4L, 1L, 1L, 0.0)), got.toString)
  }

  test("global rank machinery is partition-invariant (MW over fixture)") {
    val e = graft.Tables.events(spark, sf())
    val a = RankStats.mannWhitney(e, "event_type", "value", "click", "view")
      .as[(Long, Long, Long, Double, Double)].collect().head
    val b = RankStats.mannWhitney(e.repartition(17), "event_type", "value",
        "click", "view")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(a == b, s"$a vs $b")
  }
}
