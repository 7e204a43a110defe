package graft.ext

import graft.SparkSpec

/** Hand-computed fixtures for the supervised feature-prep encoders. */
class FeaturePrepSpec extends SparkSpec {
  import spark.implicits._

  test("LOO target encoding matches the hand computation, NULLs the gaps") {
    // A: y=[1,1,0] → te_pos = 1/2, te_neg = 2/2; B singleton → both NULL;
    // C: y=[1,1] → te_pos = 1, te_neg undefined (no negative row)
    val d = Seq(("A", 1L), ("A", 1L), ("A", 0L), ("B", 0L), ("C", 1L), ("C", 1L))
      .toDF("cat", "y")
    val got = FeaturePrep.targetEncodingLoo(d, "cat", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(got("A") == ((3L, 2L, 0.5, 1.0)), got.toString)
    assert(got("B") == ((1L, 0L, null, null)), got.toString)
    assert(got("C") == ((2L, 2L, 1.0, null)), got.toString)
  }

  test("WoE/IV matches the hand computation (add-one smoothing)") {
    // bin1 g=2 b=1, bin2 g=0 b=3; K=2 → gd=4, bd=6
    // woe1 = ln 18/8 = .8109, woe2 = ln 6/16 = −.9808, IV = .7466
    val d = Seq((1, 1L), (1, 1L), (1, 0L), (2, 0L), (2, 0L), (2, 0L))
      .toDF("bin", "y")
    val got = FeaturePrep.woeIv(d, "bin", "y")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1, 3L, 2L, 0.8109, 0.7466), (2, 3L, 0L, -0.9808, 0.7466)),
      got.toString)
  }

  test("gains table: last decile captures everything, lift 1, gains monotone") {
    val g = graft.SparkEntry.queries("ext_lift_gains")(spark, sf())
      .as[(Int, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(g.length == 10)
    assert(g.last._5 == 1.0 && g.last._6 == 1.0, g.last.toString)
    assert(g.map(_._5).sliding(2).forall(p => p(0) <= p(1)), g.toSeq.toString)
    // decile 1 (top scores) must capture at least its share: lift >= 1
    assert(g.head._6 >= 1.0, g.head.toString)
  }

  test("gini stump finds the perfect split") {
    import spark.implicits._
    val d = (Seq.fill(4)((1, 1L)) ++ Seq.fill(4)((2, 0L))).toDF("bin", "y")
    val got = FeaturePrep.giniStump(d, "bin", "y")
      .as[(Int, Long, Long, Long, Long, Double, Double, Double)].collect().head
    assert(got == ((1, 4L, 4L, 4L, 0L, 0.5, 0.0, 0.5)), got.toString)
  }

  test("gini stump: uninformative feature has zero gain, ties break low") {
    import spark.implicits._
    // every bin 50/50 -> every split leaves impurity at .5; argmin ties
    // on the cross-multiplied compare and the LOWEST bin must win
    val d = (1 to 3).flatMap(b => Seq((b, 1L), (b, 0L))).toDF("bin", "y")
    val got = FeaturePrep.giniStump(d, "bin", "y")
      .as[(Int, Long, Long, Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 1 && got._8 == 0.0, got.toString)
  }

}
