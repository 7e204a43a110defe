package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  private def feats = {
    val toks = Dedup.tokens(col("text"))
    graft.Tables.documents(spark, sf())
      .select(col("doc_id"), col("n_chars"), toks.as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("doc_id"),
        lit(1.0).as("x1"),
        (size(col("ts")) / lit(100.0)).as("x2"),
        (size(array_distinct(col("ts"))) / size(col("ts"))).as("x3"),
        when(col("n_chars") > 300, 1.0).otherwise(0.0).as("y"))
  }

  test("one hand-checked GD step") {
    // two rows, one feature: x=[1,2], y=[1,0], w0=0
    // resid = -y; g = (−1·1 + 0·2)/2 = −0.5; w1 = 0 − 1.0·(−0.5) = 0.5
    val d = Seq((1.0, 1.0), (2.0, 0.0)).toDF("x", "y")
    val w = LinearModel.trainLinearProbe(d, Seq("x"), "y", lr = 1.0, iters = 1)
    assert(w.length == 1 && math.abs(w(0) - 0.5) < 1e-9, w.mkString(","))
  }

  test("fixed-point gradients make training EXACTLY partition-invariant") {
    val f = feats
    val cols = Seq("x1", "x2", "x3")
    val w1 = LinearModel.trainLinearProbe(f.repartition(1), cols, "y", 0.8, 8)
    val w13 = LinearModel.trainLinearProbe(f.repartition(13), cols, "y", 0.8, 8)
    val wC = LinearModel.trainLinearProbe(f.coalesce(2), cols, "y", 0.8, 8)
    // bit-identical, not approximately equal — integer sums are associative
    assert(w1.sameElements(w13) && w1.sameElements(wC),
      s"${w1.toSeq} vs ${w13.toSeq} vs ${wC.toSeq}")
  }

  test("probe learns the separable length class (loss down, accuracy high)") {
    val f = feats.persist()
    try {
      val cols = Seq("x1", "x2", "x3")
      def mse(w: Array[Double]): Double =
        f.select(avg(pow(LinearModel.score(cols, w.toSeq) - col("y"), 2)))
          .head().getDouble(0)
      val w4 = LinearModel.trainLinearProbe(f, cols, "y", 0.8, 4)
      val w16 = LinearModel.trainLinearProbe(f, cols, "y", 0.8, 16)
      assert(mse(w16) < mse(w4), s"${mse(w4)} -> ${mse(w16)} not decreasing")
      val acc = f.select(avg(when(
          (LinearModel.score(cols, w16.toSeq) >= 0.5) === (col("y") === 1.0), 1.0)
          .otherwise(0.0))).head().getDouble(0)
      assert(acc > 0.9, s"accuracy $acc")
    } finally f.unpersist()
  }

  test("auc: hand case with ties uses midranks") {
    // scores: pos {0.9, 0.5}, neg {0.5, 0.1} → pairs: (0.9 beats both)=2,
    // (0.5 vs 0.5)=0.5, (0.5 vs 0.1)=1 → U=3.5 / 4 = 0.875
    val d = Seq(("g", 0.9, 1.0), ("g", 0.5, 1.0), ("g", 0.5, 0.0), ("g", 0.1, 0.0))
      .toDF("grp", "s", "y")
    val got = LinearModel.auc(d, "s", "y", "grp")
      .as[(String, Option[Double])].collect()
    assert(got.toSeq == Seq(("g", Some(0.875))), got.toSeq.toString)
  }

  test("auc: perfect=1, inverted=0, single-class=null, groups independent") {
    val d = Seq(
      ("perf", 0.9, 1.0), ("perf", 0.1, 0.0),
      ("inv", 0.1, 1.0), ("inv", 0.9, 0.0),
      ("one", 0.5, 1.0), ("one", 0.6, 1.0)).toDF("grp", "s", "y")
    val got = LinearModel.auc(d, "s", "y", "grp")
      .as[(String, Option[Double])].collect().map(r => r._1 -> r._2).toMap
    assert(got("perf").contains(1.0) && got("inv").contains(0.0) && got("one").isEmpty,
      got.toString)
  }

  test("auc is exactly partition-invariant (integer U statistic)") {
    val f = feats
    val scored = f.select(lit("g").as("grp"), col("x2").as("s"), col("y"))
    val a = LinearModel.auc(scored, "s", "y", "grp")
      .as[(String, Double)].collect()
    val b = LinearModel.auc(scored.repartition(17), "s", "y", "grp")
      .as[(String, Double)].collect()
    assert(a.sameElements(b), s"${a.toSeq} vs ${b.toSeq}")
    assert(a.head._2 > 0.95) // token count separates the length class
  }

  test("quantization grid is below the signal: 30-bit vs 40-bit weights agree") {
    val f = feats
    val cols = Seq("x1", "x2", "x3")
    val w30 = LinearModel.trainLinearProbe(f, cols, "y", 0.8, 8, gridBits = 30)
    val w40 = LinearModel.trainLinearProbe(f, cols, "y", 0.8, 8, gridBits = 40)
    w30.zip(w40).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
  }
}
