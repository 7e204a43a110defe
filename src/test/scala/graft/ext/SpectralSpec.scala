package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("ppmiMatrix matches hand math and drops non-positive entries by the integer rule") {
    // counts: (a,b)=4, (b,a)=4, (a,c)=1, (c,a)=1 → N=10
    // cw: a=5, b=4, c=1
    // ppmi(a,b) = ln(4·10/(5·4)) = ln 2 > 0  → kept
    // ppmi(a,c) = ln(1·10/(5·1)) = ln 2 > 0  → kept
    // ppmi(b,a) = ln(4·10/(4·5)) = ln 2; (c,a) = ln(10/5) = ln 2
    val pc = Seq(("a", "b", 4L), ("b", "a", 4L), ("a", "c", 1L), ("c", "a", 1L))
      .toDF("w1", "w2", "c")
    val got = Spectral.ppmiMatrix(pc)
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == 4)
    got.values.foreach(v => assert(math.abs(v - math.log(2.0)) < 1e-12, v.toString))
    // equality case c·N == cw1·cw2 (ln = 0) is excluded by the integer rule
    val eq = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("w1", "w2", "c")
    // N=2, cw(a)=cw(b)=1 → c·N = 2 > 1 → kept (ln 2); now force equality:
    val eq2 = Seq(("a", "a", 2L), ("a", "b", 1L), ("b", "a", 1L)).toDF("w1", "w2", "c")
    // N=4, cw(a)=3, cw(b)=1; (a,b): 1·4 > 3·1 → kept; (a,a): 2·4 < 9 → dropped
    val kept = Spectral.ppmiMatrix(eq2).select("w1", "w2")
      .as[(String, String)].collect().toSet
    assert(!kept.contains(("a", "a")), kept.toString)
    assert(Spectral.ppmiMatrix(eq).count() == 2)
  }

  test("power iteration converges to the dense dominant eigenvector") {
    val docs = graft.Tables.documents(spark, sf())
    val pc = TextAnalysis.skipgramPairs(docs)
    val got = Spectral.ppmiTopDirection(pc, iters = 12).toMap
    // dense reference: collect the (tiny at fixture) PPMI matrix and
    // power-iterate locally to convergence
    val entries = Spectral.ppmiMatrix(pc)
      .as[(String, String, Double)].collect()
    val words = got.keys.toArray.sorted
    val idx = words.zipWithIndex.toMap
    val n = words.length
    val m = Array.ofDim[Double](n, n)
    entries.foreach { case (a, b, v) =>
      for (i <- idx.get(a); j <- idx.get(b)) m(i)(j) = v
    }
    var x = Array.fill(n)(1.0 / math.sqrt(n.toDouble))
    for (_ <- 0 until 200) {
      val y = Array.tabulate(n)(i => (0 until n).map(j => m(i)(j) * x(j)).sum)
      val nn = math.sqrt(y.map(v => v * v).sum)
      x = y.map(_ / nn)
    }
    val maxDiff = words.zipWithIndex.map { case (w, i) =>
      math.abs(got(w) - x(i))
    }.max
    assert(maxDiff < 1e-3, s"maxDiff $maxDiff") // 12 quantized steps vs dense limit
    // unit norm
    val norm = math.sqrt(got.values.map(v => v * v).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    assert(got.values.forall(_ >= 0.0)) // Perron–Frobenius positivity
  }

  test("trajectory is exactly partition-invariant") {
    val pc = TextAnalysis.skipgramPairs(graft.Tables.documents(spark, sf()))
    val a = Spectral.ppmiTopDirection(pc, iters = 4)
    val b = Spectral.ppmiTopDirection(pc.repartition(13), iters = 4)
    assert(a == b)
  }

  test("empty pair table yields an empty direction") {
    val none = Seq.empty[(String, String, Long)].toDF("w1", "w2", "c")
    assert(Spectral.ppmiTopDirection(none).isEmpty)
  }
}
