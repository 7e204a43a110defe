package graft.ext

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("l-diversity census matches the hand computation") {
    // class A: sens {x,x,y} → l=2, n=3; class B: {x,x} → l=1, n=2
    val d = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "x"), ("B", "x"))
      .toDF("qi", "sens")
    val got = Profile.lDiversity(d, Seq("qi"), "sens")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L, 0.4, 1.0), (2L, 1L, 3L, 0.4, 1.0)),
      got.toString)
  }

  test("dp counts: deterministic, bounded noise, salt-sensitive") {
    val d = Seq.fill(100)("a").union(Seq.fill(50)("b")).toDF("cat")
    val a = Profile.dpCounts(d, "cat").as[(String, Double, Double)]
      .collect().sortBy(_._1)
    val b = Profile.dpCounts(d, "cat").as[(String, Double, Double)]
      .collect().sortBy(_._1)
    assert(a.sameElements(b)) // same hash → same release
    val m = a.map(r => r._1 -> r._2).toMap
    // Laplace(1) noise beyond ±25 has probability ~1e-11
    assert(math.abs(m("a") - 100.0) < 25.0 && math.abs(m("b") - 50.0) < 25.0,
      a.toSeq.toString)
    assert(m("a") != 100.0 && m("b") != 50.0, "noise must actually perturb")
    val c = Profile.dpCounts(d, "cat", salt = "dp2")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(c("a") != m("a"), "salt change must redraw the noise")
  }

  test("tCloseness: two pure classes against a 50/50 global give t = 0.5") {
    import spark.implicits._
    // class A all cohort 0, class B all cohort 1; m=2, per class
    // acum=4, den=(m−1)·2·4=8 → t=0.5 exactly: counted by >0.2, not >0.5
    val df = Seq(("A", 0), ("A", 0), ("B", 1), ("B", 1)).toDF("qi", "sens")
    val got = Profile.tCloseness(df, Seq("qi"), "sens")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got == ((2L, 4L, 0.5, 1.0, 0.0)), got.toString)
  }
}
