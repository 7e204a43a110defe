package graft.ext

import graft.ext.Sketches.QuantileSketch._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the KLL-style quantile summary (no SparkSession —
  * the kernel is plain Scala, so these run the add/merge/quantile
  * contract over arbitrary data shapes, merge orders, and capacities):
  *  - exactness when capacity ≥ n (the oracle-checkability condition);
  *  - the deterministic rank-error bound n·max(1,⌈log₂(n/c)⌉)/c under
  *    compaction, for ANY way the input is chunked into merged summaries;
  *  - n conservation through merges.
  */
object SketchProps extends Properties("ext.quantileSketch") {

  private val values: Gen[List[Double]] =
    Gen.choose(1, 400).flatMap(n => Gen.listOfN(n, Gen.choose(-1e6, 1e6)))

  /** Build one summary from `xs` split into `chunks` merged pieces. */
  private def build(xs: List[Double], chunks: Int, cap: Int): QS = {
    val groups = xs.grouped(math.max(1, xs.length / chunks)).toList
    groups.map(g => g.foldLeft(new QS())((s, x) => add(s, x, cap)))
      .reduceOption((a, b) => merge(a, b, cap))
      .getOrElse(new QS())
  }

  private def exactRank(sorted: Vector[Double], q: Double): Double = {
    val target = math.max(1L, math.ceil(q * sorted.length).toLong)
    sorted((target - 1).toInt)
  }

  property("exact at capacity >= n (incl. the cap == n boundary), any chunking") =
    forAll(values, Gen.choose(1, 7), Gen.oneOf(0.01, 0.25, 0.5, 0.75, 0.99),
      Gen.oneOf(0, 1)) { (xs, chunks, q, slack) =>
        val s = build(xs, chunks, cap = xs.length + slack)
        val sorted = xs.sorted.toVector
        s.n == xs.length && quantile(s, q) == exactRank(sorted, q)
    }

  property("rank error bounded under compaction, any chunking") =
    forAll(
      Gen.choose(500, 3000).flatMap(n => Gen.const((0 until n).map(_.toDouble).toList)),
      Gen.choose(1, 9), Gen.choose(16, 64), Gen.oneOf(0.1, 0.5, 0.9)) {
      (xs, chunks, cap, q) =>
        val shuffled = new scala.util.Random(xs.length * 31 + chunks).shuffle(xs)
        val s = build(shuffled, chunks, cap)
        val n = xs.length
        val bound = n * math.max(1.0,
          math.ceil(math.log(n.toDouble / cap) / math.log(2))) / cap
        val est = quantile(s, q)
        val rank = est + 1 // values are 0..n-1, so rank(v) = v+1
        val target = math.max(1L, math.ceil(q * n).toLong)
        s.n == n && math.abs(rank - target) <= bound
    }

  property("merge conserves n") =
    forAll(values, values, Gen.choose(8, 128)) { (a, b, cap) =>
      val sa = a.foldLeft(new QS())((s, x) => add(s, x, cap))
      val sb = b.foldLeft(new QS())((s, x) => add(s, x, cap))
      merge(sa, sb, cap).n == a.length + b.length
    }
}
