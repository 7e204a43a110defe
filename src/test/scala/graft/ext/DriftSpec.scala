package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("KS vs pool matches a hand computation (sup at a jump, argmin value)") {
    // A = {1,2}, B = {3,4}; pooled = {1,2,3,4}
    // F_A: 1→.5, 2→1, 3→1, 4→1; F_pool: .25, .5, .75, 1
    // sup|F_A−F| = .5 at v=2 (first attaining); F_B: 0,0,.5,1 → sup .5 at v=2
    val d = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v")
    val got = Drift.ksDrift(d, "g", "v")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("A", 0.5, 2.0), ("B", 0.5, 2.0)), got.toSeq.toString)
  }

  test("identical distributions → KS 0 for every group at the first value") {
    val d = Seq("A", "B").flatMap(g => (1 to 5).map(i => (g, i.toDouble))).toDF("g", "v")
    val got = Drift.ksDrift(d, "g", "v").as[(String, Double, Double)].collect()
    assert(got.forall(_._2 == 0.0), got.toSeq.toString)
  }

  test("exactly partition-invariant (integer counters, range repartition)") {
    val e = graft.Tables.events(spark, sf())
    val a = Drift.ksDrift(e).as[(String, Double, Double)].collect().sortBy(_._1)
    val b = Drift.ksDrift(e.repartition(17)).as[(String, Double, Double)]
      .collect().sortBy(_._1)
    assert(a.sameElements(b), s"${a.toSeq} vs ${b.toSeq}")
  }

  test("a planted location shift dominates the drift ranking") {
    val e = graft.Tables.events(spark, sf())
      .select(col("event_type"), col("value"))
    val shifted = e.withColumn("value",
      when(col("event_type") === "click", col("value") + 1000.0)
        .otherwise(col("value")))
    val ks = Drift.ksDrift(shifted).as[(String, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(ks("click") > 0.5, ks.toString) // far from the pool
    assert(ks.filter(_._1 != "click").values.forall(_ < ks("click")), ks.toString)
  }

  test("PSI query: shares sum to ~1 per type, pool shares ~0.1, PSI ≥ 0 and small") {
    val rows = graft.queries.ExtQueries.psiDriftQ(spark, sf())
      .as[(String, Int, Long, Double, Double, Double, Double)].collect()
    assert(rows.length % 10 == 0 && rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.length == 10, s"$t has ${rs.length} bins")
      val shareSum = rs.map(_._4).sum
      assert(math.abs(shareSum - 1.0) < 0.01, s"$t shares sum $shareSum")
      // PSI identical on every row of the type and non-negative
      assert(rs.map(_._7).distinct.length == 1)
      assert(rs.head._7 >= 0.0 && rs.head._7 < 0.1, s"$t psi ${rs.head._7}")
    }
    assert(rows.forall(r => math.abs(r._5 - 0.1) < 0.01)) // pooled deciles
  }

  test("maxGroups guards the per-group counter vector") {
    val many = spark.range(100)
      .select(concat(lit("g"), col("id")).as("g"), col("id").cast("double").as("v"))
    val e = intercept[IllegalArgumentException] {
      Drift.ksDrift(many, "g", "v", maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"), e.getMessage)
  }

  test("welchVsRest matches the textbook Welch t and Satterthwaite df") {
    val d = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 6L))
      .toDF("source", "n_chars")
    def welch(x: Seq[Double], y: Seq[Double]): (Double, Double) = {
      def mv(s: Seq[Double]) = {
        val m = s.sum / s.size
        (m, s.map(v => (v - m) * (v - m)).sum / (s.size - 1))
      }
      val ((m1, v1), (m2, v2)) = (mv(x), mv(y))
      val se = v1 / x.size + v2 / y.size
      ((m1 - m2) / math.sqrt(se),
        se * se / (math.pow(v1 / x.size, 2) / (x.size - 1) +
          math.pow(v2 / y.size, 2) / (y.size - 1)))
    }
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Drift.welchVsRest(d)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    val (ta, dfa) = welch(Seq(1, 2, 3), Seq(4, 6))
    val (tb, dfb) = welch(Seq(4, 6), Seq(1, 2, 3))
    assert(got("a") == ((3L, r4(ta), r4(dfa))))
    assert(got("b") == ((2L, r4(tb), r4(dfb))))
  }

  test("welchVsRest: a planted mean shift yields |t| far above the null groups") {
    val d = graft.Tables.documents(spark, sf())
      .withColumn("source",
        when(col("doc_id") % 7 === 0, "shifted").otherwise(col("source")))
      .withColumn("n_chars",
        when(col("source") === "shifted", col("n_chars") + 500).otherwise(col("n_chars")))
    val got = Drift.welchVsRest(d)
      .as[(String, Long, Double, Double, Double)].collect()
    val shifted = got.find(_._1 == "shifted").get
    assert(math.abs(shifted._4) > got.filter(_._1 != "shifted").map(r => math.abs(r._4)).max * 3)
  }

  test("wassersteinVsPool: a constant shift yields W1 = shift x pool-share complement") {
    // group a: values {0, 10}; group b: {100, 110} — each vs the pooled
    // {0,10,100,110}. By symmetry both W1s are equal; hand-compute:
    // pooled CDF at 0:.25 10:.5 100:.75; group a CDF at 0:.5 10:1 100:1
    // W1(a) = |.5-.25|*10 + |1-.5|*90 + |1-.75|*10 = 2.5+45+2.5 = 50
    val df = Seq(("a", 0L), ("a", 10L), ("b", 100L), ("b", 110L)).toDF("g", "v")
    val got = Drift.wassersteinVsPool(df, "g", "v")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got("a") == 50.0 && got("b") == 50.0)
    // identical distributions -> 0
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    assert(Drift.wassersteinVsPool(same, "g", "v")
      .as[(String, Long, Double)].collect().forall(_._3 == 0.0))
  }

  test("anovaF: identical group means give F = 0; separated means a large F") {
    val same = Seq(("a", 10L), ("a", 20L), ("b", 10L), ("b", 20L))
      .toDF("g", "v")
    val f0 = Drift.anovaF(same, "g", "v")
      .as[(String, Long, Double, Long, Long, Option[Double])].collect()
    assert(f0.forall(_._6.contains(0.0)))
    assert(f0.head._3 == 15.0)
    val sep = Seq(("a", 10L), ("a", 11L), ("b", 100L), ("b", 101L))
      .toDF("g", "v")
    val f1 = Drift.anovaF(sep, "g", "v")
      .as[(String, Long, Double, Long, Long, Option[Double])].collect()
    // SSB = 2*(45)^2*2... large vs SSW = 1 -> F huge
    assert(f1.head._6.exists(_ > 1000.0))
    // constant values in every group: ssw = 0 -> F null, not a crash
    val const = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    assert(Drift.anovaF(const, "g", "v")
      .as[(String, Long, Double, Long, Long, Option[Double])]
      .collect().forall(_._6.isEmpty))
  }

  test("categoricalMi: independent columns give MI ~ 0, a bijection gives ln k") {
    val indep = (0 until 100).map(i => (s"x${i % 2}", s"y${i % 5}"))
      .toDF("a", "b")
    val g0 = Drift.categoricalMi(indep, "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
    assert(math.abs(g0.head._5) < 1e-9)
    val bij = (0 until 100).map(i => (s"x${i % 4}", s"y${i % 4}")).toDF("a", "b")
    val g1 = Drift.categoricalMi(bij, "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
    assert(g1.head._5 == math.rint(math.log(4.0) * 10000) / 10000)
  }

  test("chi2Homogeneity: identical mixes give chi2 = 0; a planted shift doesn't") {
    import org.apache.spark.sql.functions.lit
    // users 1(odd) and 2(even), identical type mix -> expected == observed
    val same = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 2L, "a"), (4L, 2L, "b")
    ).toDF("event_id", "user_id", "event_type")
    val g0 = Drift.chi2Homogeneity(same)
      .as[(Int, String, Long, Double, Double, Double, Long)].collect()
    assert(g0.length == 4 && g0.forall(_._6 == 0.0))
    assert(g0.head._7 == 1L) // (2-1)*(2-1)
    // planted: odd users only do 'a', even only 'b' -> max dependence
    val skew = Seq(
      (1L, 1L, "a"), (2L, 3L, "a"), (3L, 2L, "b"), (4L, 4L, "b")
    ).toDF("event_id", "user_id", "event_type")
    val g1 = Drift.chi2Homogeneity(skew)
      .as[(Int, String, Long, Double, Double, Double, Long)].collect()
    assert(g1.head._6 == 4.0) // chi2 = N for a 2x2 perfect split
    // zero cells of the full grid are present
    assert(g1.count(_._3 == 0L) == 2)
  }
}
