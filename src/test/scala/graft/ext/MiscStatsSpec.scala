package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the concentration / association /
  * keyness scalar ops. */
class MiscStatsSpec extends SparkSpec {
  import spark.implicits._

  test("hourly HHI matches the hand computation") {
    import java.sql.Timestamp
    val base = 1700000000000L // ms, aligned to an hour? irrelevant: one hour used
    val ev = (Seq.fill(3)("a") ++ Seq.fill(1)("b")).map(t =>
      (new Timestamp(base), t)).toDF("ts", "event_type")
    val got = Profile.hourlyHhi(ev)
      .as[(Int, Long, Long, Double, Double)].collect().head
    // shares 3/4, 1/4 → HHI = 10/16 = .625, n_eff = 1.6
    assert((got._2, got._3, got._4, got._5) == ((4L, 2L, 0.625, 1.6)),
      got.toString)
  }

  test("cramers V is 1 for a perfect 2x2 association (and bias-corrected stays 1)") {
    val d = (Seq.fill(10)(("a", 1)) ++ Seq.fill(10)(("b", 2))).toDF("x", "y")
    val got = Drift.cramersV(d, "x", "y")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got == ((20L, 2L, 2L, 20.0, 1.0, 1.0)), got.toString)
  }

  test("token odds ratio matches the hand computation (Haldane correction)") {
    val docs = Seq((1L, "x y", "en"), (2L, "y z", "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.tokenOddsRatio(docs, col("lang") === "en")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(got("x") == 2.1972 && got("y") == 0.0 && got("z") == -2.1972,
      got.toString)
  }

  test("lorenz deciles: shares monotone, last share 1, total preserved") {
    val g = graft.SparkEntry.queries("ext_lorenz")(spark, sf())
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(g.length == 10)
    assert(g.last._4 == 1.0, g.last.toString)
    assert(g.map(_._4).sliding(2).forall(p => p(0) <= p(1)), g.toSeq.toString)
    // ascending deciles: the PER-KEY mean must not decrease head→tail
    // (bucket totals can, when the remainder lands in the first buckets)
    assert(g.head._3 / g.head._2 <= g.last._3 / g.last._2, g.toSeq.toString)
  }

  test("chao1 matches the hand computation") {
    import spark.implicits._
    // "a a b c": D=3, f1=2, f2=1 -> 3 + 2·1/(2·2) = 3.5
    val d = Seq((1L, "a a b c", "s")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.chao1(d)
      .as[(String, Long, Long, Long, Double)].collect().head
    assert(got == (("s", 3L, 2L, 1L, 3.5)), got.toString)
  }

  test("distributionDistances: hand TV/BC/Hellinger on a 2-token corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x x y", "A"), (2L, "y y y", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.distributionDistances(docs)
      .as[(String, Double, Double, Double)].collect().toSeq
    // A: TV=12/36, BC=(√4+√4)/√18; B: TV=12/36, BC=√12/√18
    assert(got == Seq(("A", 0.3333, 0.9428, 0.2391),
      ("B", 0.3333, 0.8165, 0.4284)), got.toString)
  }

  private def hts(h: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

  test("durbinWatson: alternating hourly counts give DW = 3 exactly") {
    import spark.implicits._
    // counts per hour = [1,2,1,2]: Σd²=3, n·Σc²−S² = 40−36=4 → 12/4
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 1, 3 -> 2).flatMap { case (h, k) =>
      (1 to k).map(i => (h.toLong * 10 + i, hts(h), "a"))
    }
    val got = Temporal.durbinWatson(
        rows.toDF("event_id", "ts", "event_type"))
      .as[(String, Long, Double)].head()
    assert(got == (("a", 4L, 3.0)), got.toString)
  }

  test("mannKendall: strictly increasing counts, S = 6, sen slope 1") {
    import spark.implicits._
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 3, 3 -> 4).flatMap { case (h, k) =>
      (1 to k).map(i => (h.toLong * 10 + i, hts(h), "a"))
    }
    val got = Temporal.mannKendall(
        rows.toDF("event_id", "ts", "event_type"))
      .as[(String, Long, Long, Double, Double, Double)].head()
    // v18 = 4·3·13 = 156 → var 8.6667; z = 5/sqrt(156/18) = 1.6984
    assert(got._1 == "a" && got._2 == 4L && got._3 == 6L, got.toString)
    assert(got._4 == 8.6667 && got._5 == 1.6984 && got._6 == 1.0, got.toString)
  }

  test("profileCosine: proportional hourly profiles give cosine 1") {
    import spark.implicits._
    val rows = Seq.fill(1)(("a", hts(0))) ++ Seq.fill(2)(("a", hts(1))) ++
      Seq.fill(2)(("b", hts(0))) ++ Seq.fill(4)(("b", hts(1)))
    val got = Temporal.profileCosine(rows.toDF("event_type", "ts"))
      .as[(String, String, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 1.0)), got.toString)
  }

  test("corrMatrix: perfect linear pair r=1, zero-variance column null") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0))
      .toDF("x", "y", "w")
    val got = Profile.corrMatrix(df, Seq("x", "y", "w"))
      .as[(String, String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("x", "w", 3L, None), ("x", "y", 3L, Some(1.0)),
      ("y", "w", 3L, None)), got.toString)
  }

  test("rougePairEval: hand multiset overlaps, exact F1 ratios") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a b c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val got = TextAnalysis.rougePairEval(docs, pairs)
      .as[(Long, Long, Long, Long, Double, Double, Double,
        Double, Double, Double)].head()
    // ov1 = min(2,1)+min(1,1) = 2 over l=3/3; ov2 = 1 ("a b") over 2/2
    assert(got == ((1L, 2L, 2L, 1L, 0.6667, 0.6667, 0.6667, 0.5, 0.5, 0.5)),
      got.toString)
  }

  test("holtWinters: period-2 alternating series is learned exactly") {
    import spark.implicits._
    // counts [1,3,1,3,1,3]: l=2, b=0, seasons (-1, 1) -> forecast 1, 3
    val rows = Seq(0 -> 1, 1 -> 3, 2 -> 1, 3 -> 3, 4 -> 1, 5 -> 3)
      .flatMap { case (h, k) => (1 to k).map(i => (h.toLong * 10 + i, hts(h), "a")) }
    val got = Temporal.holtWintersForecast(
        rows.toDF("event_id", "ts", "event_type"), period = 2, horizon = 2)
      .as[(String, Int, Double, Double, Double, Double)].head()
    assert(got == (("a", 6, 2.0, 0.0, 1.0, 3.0)), got.toString)
  }

  test("energyDistance: hand pairwise expectations via the gap identity") {
    import spark.implicits._
    // X = {0, 1}, Y = {1}: E|X−Y| = .5, E|X−X'| = .5, E|Y−Y'| = 0
    val df = Seq((0.0, 0), (1.0, 0), (1.0, 1)).toDF("value", "y")
    val got = Drift.energyDistance(df, col("y") === 1)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(got == ((2L, 1L, 0.5, 0.5, 0.0, 0.7071)), got.toString)
  }

  test("cramerVonMises: hand U over the pooled ECDF gap") {
    import spark.implicits._
    // X = {0,1}, Y = {1}: U = 1·1² + 2·0² = 1 → T = 1/(3²·2) = 0.0556
    val df = Seq((0.0, 0), (1.0, 0), (1.0, 1)).toDF("value", "y")
    val got = Drift.cramerVonMises(df, col("y") === 1)
      .as[(Long, Long, Double)].head()
    assert(got == ((2L, 1L, 0.0556)), got.toString)
  }

  test("tokenDispersion: concentrated tokens DP=.5, spread token DP=0") {
    import spark.implicits._
    val docs = Seq((1L, "x x z", "A"), (2L, "y y z", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.tokenDispersion(docs)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("x", 2L, 0.5), ("y", 2L, 0.5), ("z", 2L, 0.0)),
      got.toString)
  }

  test("keynessG2: fully-separated tokens score 8·ln2, signed by side") {
    import spark.implicits._
    val docs = Seq((1L, "a a", "es"), (2L, "b b", "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.keynessG2(docs, col("lang") === "es")
      .as[(String, Long, Long, Int, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 0L, 1, 5.5452), ("b", 0L, 2L, -1, 5.5452)),
      got.toString)
  }

  test("bootstrapCi: constant values collapse the CI; CI ordered and deterministic") {
    import spark.implicits._
    val const = (1L to 100L).map(i => (i, 2.5)).toDF("event_id", "value")
    val c = Temporal.bootstrapCi(const)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(c == ((50L, 100L, 2.5, 2.5, 2.5, 2.5)), c.toString)
    val mixed = (1L to 40L).map(i => (i, if (i % 2 == 0) 10.0 else 0.0))
      .toDF("event_id", "value")
    val m1 = Temporal.bootstrapCi(mixed)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    val m2 = Temporal.bootstrapCi(mixed)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(m1 == m2, s"$m1 vs $m2") // same hash → same resample
    assert(m1._4 <= m1._5 && m1._5 <= m1._6 && m1._4 < m1._6, m1.toString)
  }

  test("markovAttribution: converting channel gets full removal credit") {
    import spark.implicits._
    // user 1: click -> purchase; user 2: view -> nothing
    val ev = Seq(
      (1L, hts(0), 10L, "click"), (1L, hts(1), 11L, "purchase"),
      (2L, hts(0), 20L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.markovAttribution(ev)
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    // p_full = .5; removing click kills all conversion, view none
    assert(got == Seq(("click", 0.5, 0.0, 1.0, 1.0),
      ("view", 0.5, 0.5, 0.0, 0.0)), got.toString)
  }

  test("effectSizes: hand Cohen's d with the Hedges small-sample shrink") {
    import spark.implicits._
    // a = {0,2}, b = {10,12}: md = −10, pooled sd = √2 → d = −7.0711
    val df = Seq(("a", 0.0), ("a", 2.0), ("b", 10.0), ("b", 12.0))
      .toDF("t", "value")
    val got = Drift.effectSizes(df, "t", "value")
      .as[(String, String, Long, Long, Double, Double, Double)].head()
    assert((got._1, got._2, got._5, got._6) == (("a", "b", -10.0, -7.0711)),
      got.toString)
    // g = d·(1 − 3/7) = d·4/7 = −4.0406
    assert(got._7 == -4.0406, got.toString)
  }

  test("jarqueBera: symmetric trio has zero skew, excess kurtosis -1.5") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("t", "value")
    val got = Drift.jarqueBera(df, "t", "value")
      .as[(String, Long, Double, Double, Double, Double)].head()
    // jb = 3·(0 + 2.25/24) = 0.28125 → 0.2813 (half-up)
    assert(got == (("a", 3L, 2.0, 0.0, -1.5, 0.2813)), got.toString)
  }

  test("brownForsythe: identical spreads across groups give W = 0") {
    import spark.implicits._
    // both groups' |x − median| sets are {20, 0, 20} → SSB = 0 → W = 0
    val df = Seq(("a", 0.0), ("a", 10.0), ("a", 20.0),
      ("b", 100.0), ("b", 110.0), ("b", 120.0)).toDF("t", "value")
    val got = Drift.brownForsythe(df, "t", "value")
      .as[(String, Long, Double, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 3L, 6.6667, 2L, 6L, 0.0),
      ("b", 3L, 6.6667, 2L, 6L, 0.0)), got.toString)
  }

}
