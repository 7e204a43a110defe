package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest prior-or-equal right row; null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 11:00:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")), // before every right row
      (4L, 20L, ts("2024-01-01 12:00:00"))  // user with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 1.0),
      (101L, 10L, ts("2024-01-01 11:00:00"), 2.0) // equal ts IS eligible
    ).toDF("pid", "user_id", "ts", "value")
      .select("user_id", "ts", "pid", "value")

    val got = Temporal.asofJoin(left, right, "user_id", "ts", Seq("pid", "value"))
      .select("event_id", "matched_pid", "matched_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(got(1L) == (Some(100L), Some(1.0)))
    assert(got(2L) == (Some(101L), Some(2.0))) // equal-ts right row wins
    assert(got(3L) == (None, None))
    assert(got(4L) == (None, None))
  }

  test("asofJoin on the events fixture equals the naive argmax formulation") {
    val e = graft.Tables.events(spark, sf())
    val views = e.where(col("event_type") === "view").select("event_id", "user_id", "ts")
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))

    val fast = Temporal.asofJoin(views, purchases, "user_id", "ts", Seq("pid"))
      .select("event_id", "matched_pid")

    // naive: non-equi join + keep max (r.ts, pid) per left row — quadratic,
    // but an independent derivation of the same semantics
    val naive = views.join(purchases.toDF("p_user_id", "pts", "pid"),
        views("user_id") === col("p_user_id") && col("pts") <= views("ts"), "left")
      .groupBy(views("event_id"))
      .agg(max(struct(col("pts"), col("pid"))).getField("pid").as("matched_pid"))

    val a = fast.as[(Long, Option[Long])].collect().toMap
    val b = naive.as[(Long, Option[Long])].collect().toMap
    assert(a.size == b.size)
    // ties on (user, ts) don't exist in the fixture, so pid matching is exact
    assert(a == b)
  }

  test("asofJoin result is invariant to input partitioning") {
    val e = graft.Tables.events(spark, sf())
    val views = e.where(col("event_type") === "view").select("event_id", "user_id", "ts")
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    def run(np: Int) = Temporal.asofJoin(
      views.repartition(np), purchases.repartition(np), "user_id", "ts", Seq("pid"))
      .select("event_id", "matched_pid").as[(Long, Option[Long])].collect().toSet
    assert(run(1) == run(7))
  }

  test("sessionize splits on gaps > threshold and numbers sessions 1-based") {
    val e = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 10L, ts("2024-01-01 10:10:00"), 2.0),
      (3L, 10L, ts("2024-01-01 11:30:00"), 3.0), // 80 min gap → new session
      (4L, 10L, ts("2024-01-01 12:00:00"), 4.0), // 30 min exactly → SAME session
      (5L, 20L, ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val idx = Temporal.sessionize(e).select("event_id", "session_idx")
      .as[(Long, Long)].collect().toMap
    assert(idx(1L) == 1 && idx(2L) == 1)
    assert(idx(3L) == 2 && idx(4L) == 2) // gap == threshold is not >
    assert(idx(5L) == 1)

    val agg = Temporal.sessionAgg(e).orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect()
    assert(agg.toSeq == Seq((10L, 1L, 2L, 3.0), (10L, 2L, 2L, 7.0), (20L, 1L, 1L, 5.0)))
  }

  test("rollingMean: per-key frame of last n+1 rows, unaffected by other keys") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
      (2L, 1L, 100.0), (2L, 2L, 200.0)
    ).toDF("user_id", "ts", "value")
    val got = Temporal.rollingMean(df, "user_id", Seq("ts"), "value", 1)
      .select("user_id", "ts", "rolling_mean")
      .as[(Long, Long, Double)].collect().sorted
    assert(got.toSeq == Seq(
      (1L, 1L, 10.0), (1L, 2L, 15.0), (1L, 3L, 25.0),
      (2L, 1L, 100.0), (2L, 2L, 150.0)))
  }

  test("compactLatest keeps exactly the newest row per key with tie-breaks") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5L, "a"), // same ts as next — higher id wins
      (1L, 11L, 5L, "b"),
      (1L, 9L, 9L, "c"),  // latest ts wins over higher id
      (2L, 1L, 1L, "d")
    ).toDF("user_id", "event_id", "ts", "payload")
    val got = Temporal.compactLatest(df, "user_id", Seq("ts", "event_id"))
      .select("user_id", "event_id", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 9L, "c"), (2L, 1L, "d")))
  }

  test("hashSplit is content-keyed, in-range, and roughly proportioned") {
    val d = graft.Tables.documents(spark, sf())
    val s = TextAnalysis.hashSplit(d).cache()
    val buckets = s.select("bucket").as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < 100))
    val frac = s.where(col("split") === "train").count().toDouble / s.count()
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac")
    // identical text ⇒ identical split, independent of doc_id
    val dup = Seq((1L, "same text"), (999L, "same text")).toDF("doc_id", "text")
    val splits = TextAnalysis.hashSplit(dup).select("split").as[String].collect()
    assert(splits.distinct.length == 1)
    s.unpersist()
  }

  test("keepCanonical keeps the lowest doc_id per exact-content group") {
    val d = Seq((5L, "x y"), (1L, "x y"), (3L, "a b"), (2L, "x y"))
      .toDF("doc_id", "text")
    val kept = Dedup.keepCanonical(d).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("repetitionMetrics matches a hand computation incl. short-doc null") {
    val d = Seq((1L, "a a a b"), (2L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(d)
      .select("doc_id", "n_toks", "distinct_frac", "top_bigram_frac")
      .as[(Long, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // bigrams of doc1: "a a","a a","a b" → top 2/3; distinct 2/4
    assert(got(1L) == ((4L, 0.5, Some(0.6667))))
    assert(got(2L) == ((1L, 1.0, None))) // <2 tokens → no bigram row
  }

  test("stratifiedSample takes exactly ceil(pct·n/100) docs per stratum") {
    val d = graft.Tables.documents(spark, sf())
    val perLang = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = TextAnalysis.stratifiedSample(d, "lang", 10)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, n) =>
      assert(sampled(lang) == math.ceil(n * 10 / 100.0).toLong, s"lang=$lang")
    }
    // deterministic: same sample on re-run
    val again = TextAnalysis.stratifiedSample(d, "lang", 10)
      .select("doc_id").as[Long].collect().sorted
    val first = TextAnalysis.stratifiedSample(d, "lang", 10)
      .select("doc_id").as[Long].collect().sorted
    assert(again.sameElements(first))
  }

  test("ngramCounts counts contiguous bigrams") {
    val d = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramCounts(d, 2).as[(String, Long)].collect().toMap
    assert(got == Map("a b" -> 3L, "b a" -> 1L))
  }

  test("funnel counts only strictly-ordered stage progressions") {
    val e = Seq(
      // user 1: full ordered funnel
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 10L, ts("2024-01-01 11:00:00"), "click"),
      (3L, 10L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 20: purchase BEFORE click → stalls at view; the later
      // purchase must NOT count (no click ever follows the view)
      (4L, 20L, ts("2024-01-01 10:00:00"), "view"),
      (5L, 20L, ts("2024-01-01 09:00:00"), "purchase"),
      // user 30: view then purchase, no click → stages_reached = 1
      (6L, 30L, ts("2024-01-01 10:00:00"), "view"),
      (7L, 30L, ts("2024-01-01 11:00:00"), "purchase"),
      // user 40: click only, never viewed → absent from the funnel
      (8L, 40L, ts("2024-01-01 10:00:00"), "click"),
      // user 50: view and click at the SAME ts → strict > rejects it
      (9L, 50L, ts("2024-01-01 10:00:00"), "view"),
      (10L, 50L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.funnel(e, Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(10L -> 3, 20L -> 1, 30L -> 1, 50L -> 1), got.toString)
  }

  test("runningSum equals the single-partition window form, any partitioning") {
    val d = graft.Tables.documents(spark, sf()).select("doc_id", "n_chars")
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.select(col("doc_id"), sum(col("n_chars")).over(w).as("s"))
      .as[(Long, Long)].collect().toMap
    for (np <- Seq(1, 7)) {
      val got = Temporal.runningSum(d, "doc_id", "n_chars", np)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"np=$np") // exact: integer addition associates
    }
  }

  test("runningSum handles double values and timestamp order keys") {
    val e = graft.Tables.events(spark, sf()).select("ts", "value").limit(500)
      .dropDuplicates("ts") // total order for a well-defined running sum
    val w = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = e.select(col("ts"), sum(col("value")).over(w).as("s"))
      .as[(java.sql.Timestamp, Double)].collect().toMap
    val got = Temporal.runningSum(e, "ts", "value", 5)
      .as[(java.sql.Timestamp, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-6 * math.max(1.0, math.abs(want(k))), s"$k")
    }
  }

  test("runningSum null semantics match the window form: null prefix, nulls skipped") {
    val d = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, null), (3L, 10L), (4L, null), (5L, 5L), (6L, null)
    ).toDF("k", "v")
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.select(col("k"), sum(col("v")).over(w).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    for (np <- Seq(1, 3)) {
      val got = Temporal.runningSum(d, "k", "v", np)
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got == want, s"np=$np: $got vs $want")
    }
  }

  test("cleanCorpus gates, dedups, and splits") {
    val good = "the a is of and to in the a is of and to in words here padding tokens more" // 20 toks, stopword-rich
    val repetitive = ("spam ham " * 10).trim // top bigram dominates
    val short = "tiny doc"
    val noStop = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = Seq(
      (1L, good), (2L, good), // exact dups — only doc 1 survives
      (3L, repetitive), (4L, short), (5L, noStop)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cleanCorpus(d)
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(out.map(_._1).toSet == Set(1L), out.toSeq.toString)
    assert(Set("train", "val", "test").contains(out.head._2))
  }

  test("tfIdf matches a hand computation") {
    val d = Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "c c")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdf(d)
      .select("doc_id", "tok", "tf", "tfidf")
      .as[(Long, String, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    // Spark's log() codegens to StrictMath.log, which can differ from
    // math.log by 1 ulp — compare with a tight tolerance, not equality
    def check(k: (Long, String), tf: Long, want: Double): Unit = {
      val (gotTf, gotScore) = got(k)
      assert(gotTf == tf, s"$k tf")
      assert(math.abs(gotScore - want) < 1e-12, s"$k score $gotScore vs $want")
    }
    val ln = (x: Double) => math.log(x)
    check((1L, "a"), 2L, 2 * ln(3.0 / 2))
    check((1L, "b"), 1L, ln(3.0 / 1))
    check((2L, "c"), 1L, ln(3.0 / 2))
    check((3L, "c"), 2L, 2 * ln(3.0 / 2))
  }

  test("resampleHourlyFfill fills gaps with the latest prior value") {
    val d = Seq(
      (1L, 10L, ts("2024-01-01 10:15:00"), 1.0),
      (2L, 10L, ts("2024-01-01 10:45:00"), 2.0),  // later in same hour wins
      (3L, 10L, ts("2024-01-01 13:05:00"), 9.0),  // 11:00,12:00 are gaps
      (4L, 20L, ts("2024-01-01 00:00:00"), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.resampleHourlyFfill(d)
      .as[(Long, java.sql.Timestamp, Double, Int)].collect()
      .map(r => (r._1, r._2.toString) -> ((r._3, r._4))).toMap
    assert(got((10L, "2024-01-01 10:00:00.0")) == ((2.0, 1)))
    assert(got((10L, "2024-01-01 11:00:00.0")) == ((2.0, 0))) // filled
    assert(got((10L, "2024-01-01 12:00:00.0")) == ((2.0, 0))) // filled
    assert(got((10L, "2024-01-01 13:00:00.0")) == ((9.0, 1)))
    assert(got((20L, "2024-01-01 00:00:00.0")) == ((5.0, 1)))
    assert(got.size == 5) // user 20 has a single-hour grid
  }

  test("ewma matches the hand recurrence and resets per key") {
    val d = Seq(
      (10L, 1L, 1.0), (10L, 2L, 2.0), (10L, 3L, 3.0),
      (20L, 4L, 100.0), (20L, 5L, 0.0))
      .toDF("user_id", "event_id", "value")
    val got = Temporal.ewma(d, alpha = 0.5)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    // key 10: 1.0; .5*2+.5*1=1.5; .5*3+.5*1.5=2.25
    assert(got(1L) == 1.0 && got(2L) == 1.5 && got(3L) == 2.25)
    // key 20 restarts: 100.0; .5*0+.5*100=50.0
    assert(got(4L) == 100.0 && got(5L) == 50.0)
  }

  test("ewma skips nulls (carries state) and emits null before first value") {
    val d = Seq[(Long, Long, Option[Double])](
      (1L, 1L, None), (1L, 2L, Some(4.0)), (1L, 3L, None), (1L, 4L, Some(8.0)))
      .toDF("user_id", "event_id", "value")
    val got = Temporal.ewma(d, alpha = 0.5)
      .as[(Long, Long, Option[Double])].collect().map(r => r._2 -> r._3).toMap
    assert(got(1L).isEmpty)          // before first non-null
    assert(got(2L).contains(4.0))
    assert(got(3L).contains(4.0))    // null row carries the state through
    assert(got(4L).contains(6.0))    // .5*8 + .5*4
  }

  test("ewma treats NaN/Inf like null: state carried, never reset") {
    val d = Seq(
      (1L, 1L, 5.0), (1L, 2L, Double.NaN), (1L, 3L, 7.0),
      (2L, 4L, Double.PositiveInfinity), (2L, 5L, 4.0))
      .toDF("user_id", "event_id", "value")
    val got = Temporal.ewma(d, alpha = 0.5)
      .as[(Long, Long, Option[Double])].collect().map(r => r._2 -> r._3).toMap
    assert(got(1L).contains(5.0))
    assert(got(2L).contains(5.0))  // NaN passes prior state through
    assert(got(3L).contains(6.0))  // .5*7 + .5*5 — history NOT reset by the NaN
    assert(got(4L).isEmpty)        // Inf before any finite value → null
    assert(got(5L).contains(4.0))
  }

  test("scd2 collapses runs to [from, to) intervals with counts") {
    val chg = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, 2L, ts("2024-01-02 00:00:00"), "A"),
      (1L, 3L, ts("2024-01-03 00:00:00"), "B"),
      (1L, 4L, ts("2024-01-04 00:00:00"), "A"),
      (2L, 5L, ts("2024-01-01 00:00:00"), "C")
    ).toDF("k", "id", "t", "st")
    val got = Temporal.scd2(chg, "k", "st", "t", "id")
      .as[(Long, Int, String, java.sql.Timestamp, Option[java.sql.Timestamp], Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.length == 4)
    val r1 = got(0)
    assert(r1._3 == "A" && r1._4 == ts("2024-01-01 00:00:00")
      && r1._5.contains(ts("2024-01-03 00:00:00")) && r1._6 == 2L)
    assert(got(1)._3 == "B" && got(1)._6 == 1L)
    assert(got(2)._3 == "A" && got(2)._5.isEmpty && got(2)._6 == 1L) // current
    assert(got(3)._1 == 2L && got(3)._2 == 1 && got(3)._5.isEmpty && got(3)._6 == 1L)
  }

  test("scd2: equal-ts changes order by the tiebreak; n_rows sums to the changelog") {
    val t0 = ts("2024-01-01 00:00:00")
    val chg = Seq((1L, 2L, t0, "B"), (1L, 1L, t0, "A"), (1L, 3L, t0, "B"))
      .toDF("k", "id", "t", "st")
    val got = Temporal.scd2(chg, "k", "st", "t", "id")
      .as[(Long, Int, String, java.sql.Timestamp, Option[java.sql.Timestamp], Long)]
      .collect().sortBy(_._2)
    assert(got.map(_._3).toSeq == Seq("A", "B")) // id order, runs merged
    assert(got.map(_._6).sum == 3L)
  }

  test("scd2 current rows (valid_to IS NULL) == compactLatest state") {
    val o = graft.Tables.orders(spark, sf())
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
    val current = Temporal.scd2(o, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
      .where(col("valid_to").isNull)
      .select("o_custkey", "o_orderstatus")
      .as[(Long, String)].collect().sorted
    val latest = Temporal.compactLatest(o, "o_custkey", Seq("o_orderdate", "o_orderkey"))
      .select("o_custkey", "o_orderstatus")
      .as[(Long, String)].collect().sorted
    assert(current.length == latest.length && current.sameElements(latest))
    // exactly one open interval per key
    assert(current.map(_._1).distinct.length == current.length)
  }

  test("ewma is invariant to input partitioning") {
    val e = graft.Tables.events(spark, sf())
    val a = Temporal.ewma(e).as[(Long, Long, Double)].collect().sortBy(_._2)
    val b = Temporal.ewma(e.repartition(13)).as[(Long, Long, Double)]
      .collect().sortBy(_._2)
    assert(a.sameElements(b))
  }

  test("nearestJoin: min |dt| either direction, ties backward, tolerance drops") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // nearest is FORWARD 10:00:30 (30s) vs back 09:59:00 (60s)
      (2L, 10L, ts("2024-01-01 12:00:00")), // equidistant 11:59:00/12:01:00 → backward
      (3L, 10L, ts("2024-01-01 20:00:00")), // nothing within 1h → dropped
      (4L, 20L, ts("2024-01-01 10:00:00"))  // key with no right rows → dropped
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:59:00"), 100L),
      (10L, ts("2024-01-01 10:00:30"), 101L),
      (10L, ts("2024-01-01 11:59:00"), 102L),
      (10L, ts("2024-01-01 12:01:00"), 103L)
    ).toDF("user_id", "ts", "pid")
    val got = Temporal.nearestJoin(left, right, "user_id", "ts",
        Seq("pid"), toleranceSec = 3600L)
      .select("event_id", "near_pid", "dt_us")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 101L, 30000000L), (2L, 102L, 60000000L)))
  }

  test("nearestJoin equals the naive argmin formulation on the fixture") {
    val e = graft.Tables.events(spark, sf())
    val views = e.where(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(min("event_id").as("pid"))
    val got = Temporal.nearestJoin(views, purchases, "user_id", "ts",
        Seq("pid"), toleranceSec = 3600L)
      .select("event_id", "near_pid", "dt_us")
      .as[(Long, Long, Long)].collect().toSet
    val naive = views.join(purchases.toDF("u2", "pts", "pid"),
        views("user_id") === col("u2") &&
          abs(unix_micros(views("ts")) - unix_micros(col("pts"))) <= 3600L * 1000000L)
      .select(col("event_id"),
        abs(unix_micros(views("ts")) - unix_micros(col("pts"))).as("dt_us"),
        when(unix_micros(col("pts")) <= unix_micros(views("ts")), 0).otherwise(1).as("dir"),
        col("pid"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("event_id").orderBy("dt_us", "dir", "pid")))
      .where(col("_rn") === 1)
      .select("event_id", "pid", "dt_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("cohortRetention: ISO-week cohorts, distinct-user cells, offsets in weeks") {
    val e = Seq(
      // user 10 first seen Tue of week 2024-01-01; active again in weeks +1, +1
      (1L, 10L, ts("2024-01-02 10:00:00")),
      (2L, 10L, ts("2024-01-10 10:00:00")),
      (3L, 10L, ts("2024-01-12 10:00:00")), // same week as event 2 — counted once
      // user 20 first seen week 2024-01-08
      (4L, 20L, ts("2024-01-09 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Temporal.cohortRetention(e)
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(got == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0L, 1L),
      (java.sql.Date.valueOf("2024-01-01"), 1L, 1L),
      (java.sql.Date.valueOf("2024-01-08"), 0L, 1L)))
  }

  test("cohortRetention: offset-0 cell of the earliest week counts every user seen then") {
    val e = graft.Tables.events(spark, sf())
    val ret = Temporal.cohortRetention(e)
      .as[(java.sql.Date, Long, Long)].collect()
    // every (cohort, 0) cell exists (a user is always active in their own
    // first week) and cohort sizes sum to the distinct-user count
    val byCohort = ret.groupBy(_._1)
    assert(byCohort.values.forall(_.exists(_._2 == 0L)))
    val users = e.select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == users)
    // invariant to partitioning
    val b = Temporal.cohortRetention(e.repartition(13))
      .as[(java.sql.Date, Long, Long)].collect()
    assert(ret.sameElements(b))
  }

  test("eventTransitions counts adjacent pairs per user and row-normalizes") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 11:00:00"), "b"),
      (3L, 1L, ts("2024-01-01 12:00:00"), "a"),
      (4L, 2L, ts("2024-01-01 10:00:00"), "a"),
      (5L, 2L, ts("2024-01-01 11:00:00"), "a")
    ).toDF("event_id", "user_id", "ts", "event_type")
      .select("event_id", "user_id", "ts", "event_type")
    val got = Temporal.eventTransitions(e)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "a", 1L, 0.5), ("a", "b", 1L, 0.5), ("b", "a", 1L, 1.0)))
  }

  test("eventTransitions: equal-ts rows order by the event_id tiebreak") {
    val t0 = ts("2024-01-01 10:00:00")
    val e = Seq(
      (2L, 1L, t0, "b"), (1L, 1L, t0, "a"), (3L, 1L, t0, "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.eventTransitions(e)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 1L, 1.0), ("b", "c", 1L, 1.0)))
    // total transitions = Σ per-user (n_events - 1)
    val ev = graft.Tables.events(spark, sf())
    val perUser = ev.groupBy("user_id").agg((count(lit(1)) - 1).as("m"))
      .agg(sum("m")).as[Long].head()
    val total = Temporal.eventTransitions(ev).agg(sum("n")).as[Long].head()
    assert(total == perUser)
  }

  test("rfmSegments: buckets by exact quintile thresholds, anchor user at r=0") {
    // 5 users, strictly separated on every metric → buckets 1..5
    val e = (1 to 5).flatMap { u =>
      (1 to u).map { i =>
        (u * 100L + i, u.toLong, ts(f"2024-01-0$u 10:00:00"), 10.0 * u)
      }
    }.toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.rfmSegments(e)
      .as[(Long, Long, Long, Double, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // user 5: latest (r_us 0 → r_q 1), most events (f_q 5), highest m
    assert(got(5L)._2 == 0L && got(5L)._5 == 1L && got(5L)._6 == 5L && got(5L)._7 == 5L)
    // user 1: oldest, fewest, least
    assert(got(1L)._5 == 5L && got(1L)._6 == 1L && got(1L)._7 == 1L)
    assert(got.values.map(_._6).toSeq.sorted == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("rfmSegments is invariant to input partitioning") {
    val e = graft.Tables.events(spark, sf())
    val a = Temporal.rfmSegments(e)
      .as[(Long, Long, Long, Double, Long, Long, Long)].collect().sortBy(_._1)
    val b = Temporal.rfmSegments(e.repartition(13))
      .as[(Long, Long, Long, Double, Long, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // quintile buckets cover 1..5 and each holds ~a fifth of users
    val byQ = a.groupBy(_._6).view.mapValues(_.length).toMap
    assert(byQ.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
  }

  test("transitionEntropy: per-from entropies and the weighted __all__ rate") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 11:00:00"), "b"),
      (3L, 1L, ts("2024-01-01 12:00:00"), "a"),
      (4L, 1L, ts("2024-01-01 13:00:00"), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    // transitions: a→b, b→a, a→c. H(a)=ln2 over {b,c}; H(b)=0;
    // __all__ = (2·ln2 + 1·0)/3
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Temporal.transitionEntropy(e)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("__all__", 3L, r4(2 * math.log(2) / 3)),
      ("a", 2L, r4(math.log(2))), ("b", 1L, 0.0)))
  }

  test("valueHistogram: equi-width bins, max clamped into the last bin") {
    val e = Seq(("g", 0.0), ("g", 5.0), ("g", 10.0), ("h", 3.0))
      .toDF("event_type", "value")
    val got = Temporal.valueHistogram(e)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("g", 0L, 1L, 0.0, 1.0), ("g", 5L, 1L, 5.0, 6.0),
      ("g", 9L, 1L, 9.0, 10.0), ("h", 0L, 1L, 3.0, 3.0)))
  }

  test("giniByGroup: 0 for equal values, (n-1)/n for total concentration") {
    val e = Seq(
      (1L, "eq", 1.0), (2L, "eq", 1.0), (3L, "eq", 1.0), (4L, "eq", 1.0),
      (5L, "cc", 0.0), (6L, "cc", 0.0), (7L, "cc", 0.0), (8L, "cc", 4.0)
    ).toDF("event_id", "event_type", "value")
    val got = Temporal.giniByGroup(e)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("cc", 4L, 0.75), ("eq", 4L, 0.0)))
  }

  test("fanoHourly: 0 for constant hourly counts, var/mean otherwise") {
    val e = Seq(
      (1L, "g", ts("2024-01-01 10:00:00")), (2L, "g", ts("2024-01-01 10:30:00")),
      (3L, "g", ts("2024-01-01 11:00:00")), (4L, "g", ts("2024-01-01 11:30:00")),
      (5L, "h", ts("2024-01-01 10:00:00")),
      (6L, "h", ts("2024-01-01 11:00:00")), (7L, "h", ts("2024-01-01 11:10:00")),
      (8L, "h", ts("2024-01-01 11:20:00"))
    ).toDF("event_id", "event_type", "ts")
    // g: counts [2,2] → fano 0; h: [1,3] → var_pop 1 / mean 2 = 0.5
    val got = Temporal.fanoHourly(e)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", 2L, 0.0), ("h", 2L, 0.5)))
  }

  test("decayedValue: half-life weighting anchored at the key's last event") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 8.0),  // 24h before anchor → ×1/2
      (2L, 1L, ts("2024-01-02 10:00:00"), 4.0),  // anchor → ×1
      (3L, 2L, ts("2024-01-01 10:00:00"), 5.0)   // lone event → ×1
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.decayedValue(e)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 8.0), (2L, 1L, 5.0))) // 8·0.5 + 4 = 8
  }

  test("hourOfDayChi2: uniform profile scores 0; empty hours count") {
    val uniform = (0 until 24).map(h =>
      (h.toLong, "u", ts(f"2024-01-01 $h%02d:00:00")))
    val spike = Seq((100L, "s", ts("2024-01-01 12:00:00")),
      (101L, "s", ts("2024-01-01 12:30:00")))
    val e = (uniform ++ spike).toDF("event_id", "event_type", "ts")
    val got = Temporal.hourOfDayChi2(e)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("u")._3 == 0.0)
    // s: one hour holds n=2, e = 2/24: chi2 = (2-1/12)²/(1/12) + 23·(1/12)
    val ex = 2.0 / 24
    val want = BigDecimal(math.pow(2 - ex, 2) / ex + 23 * ex)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("s") == (("s", 2L, want)))
  }

  test("topEventPaths counts sliding trigrams per user, ranked by count") {
    val mk = (id: Long, u: Long, h: Int, t: String) =>
      (id, u, ts(f"2024-01-01 $h%02d:00:00"), t)
    val e = Seq(
      mk(1, 1, 10, "a"), mk(2, 1, 11, "b"), mk(3, 1, 12, "c"),
      mk(4, 1, 13, "b"), mk(5, 1, 14, "c"),
      mk(6, 2, 10, "a"), mk(7, 2, 11, "b"), mk(8, 2, 12, "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.topEventPaths(e)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a->b->c", 2L), ("b->c->b", 1L), ("c->b->c", 1L)))
  }

  test("madOutliers: hand-computed median/MAD and robust-z outlier count") {
    val e = Seq(
      ("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 100.0),
      ("h", 5.0), ("h", 5.0), ("h", 5.0)
    ).toDF("event_type", "value")
    val got = Temporal.madOutliers(e)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // g: med 3, MAD 1, threshold 3·1.4826 = 4.4478 → only 100 is out
    // h: MAD 0 → no deviation exceeds 0, nothing flagged
    assert(got == Seq(("g", 5L, 1L, 3.0, 1.0), ("h", 3L, 0L, 5.0, 0.0)))
  }

  test("holt smoothing matches the hand recurrence; linear series is exact") {
    import spark.implicits._
    import java.sql.Timestamp
    // hour h gets h+1 events -> series [1,2,3,4]: perfectly linear, so
    // level=4, trend=1, forecasts 5,6,7
    val base = 1700000000000000L // us
    val ev = (0 until 4).flatMap(h => (0 to h).map(i =>
      ("a", new Timestamp((base + h * 3600000000L + i * 60000000L) / 1000))))
      .toDF("event_type", "ts")
    val got = Temporal.holtForecast(ev)
      .as[(String, Int, Double, Double, Double, Double, Double)].collect().head
    assert(got == (("a", 4, 4.0, 1.0, 5.0, 6.0, 7.0)), got.toString)
    // two-point series: init only + one update -> l=3, t=2
    val ev2 = Seq(("b", new Timestamp(base / 1000)),
      ("b", new Timestamp((base + 3600000000L) / 1000)),
      ("b", new Timestamp((base + 3600000000L + 1000000L) / 1000)),
      ("b", new Timestamp((base + 3600000000L + 2000000L) / 1000)))
      .toDF("event_type", "ts")
    val g2 = Temporal.holtForecast(ev2)
      .as[(String, Int, Double, Double, Double, Double, Double)].collect().head
    assert(g2 == (("b", 2, 3.0, 2.0, 5.0, 7.0, 9.0)), g2.toString)
  }

  test("runs test matches the hand computation (alternating series)") {
    import spark.implicits._
    import java.sql.Timestamp
    // one event per day, values 1,5,1,5,1,5 -> 6 runs, z = 2/sqrt(1.2)
    val base = 1700000000000000L
    val ev = (0 until 6).map(d =>
      (new Timestamp((base + d * 86400000000L) / 1000),
        if (d % 2 == 0) 1.0 else 5.0)).toDF("ts", "value")
    val got = Temporal.runsTest(ev)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((6L, 3L, 3L, 6L, 1.8257)), got.toString)
  }


  test("last-touch attribution credits the latest touch within the window") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1700000000000L
    def t(min: Long) = new Timestamp(base + min * 60000L)
    val ev = Seq(
      (1L, 1L, "click", t(0)), (1L, 2L, "view", t(5)),
      (1L, 3L, "purchase", t(10)),                      // credited to view
      (2L, 4L, "purchase", t(100)),                     // no touch -> none
      (3L, 5L, "view", t(0)), (3L, 6L, "purchase", t(60 * 25))) // stale
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Temporal.lastTouchAttribution(ev)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("(none)", 2L, 0.6667), ("view", 1L, 0.3333)),
      got.toString)
  }

  test("ties on touch timestamp break by event_id (larger id wins)") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1700000000000L
    val ev = Seq(
      (1L, 1L, "click", new Timestamp(base)),
      (1L, 2L, "view", new Timestamp(base)),
      (1L, 3L, "purchase", new Timestamp(base + 1000L)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Temporal.lastTouchAttribution(ev)
      .as[(String, Long, Double)].collect().map(_._1)
    assert(got.toSet == Set("(none)", "view"))
  }


  test("weighted quantiles: mass concentrates the median on the heavy value") {
    import spark.implicits._
    val d = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 8L),
      ("h", 1.0, 1L), ("h", 2.0, 1L), ("h", 3.0, 1L), ("h", 4.0, 1L))
      .toDF("t", "v", "w")
    val got = Temporal.weightedQuantiles(d, "t", "v", "w")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("g") == ((10L, 3.0, 3.0)), got.toString)
    assert(got("h") == ((4L, 2.0, 4.0)), got.toString)
  }

  test("seasonal decomposition: flat series is all-zero, planted diurnal peak surfaces") {
    import spark.implicits._
    import java.sql.Timestamp
    val baseS = 1700006400L // divisible by 86400 -> hod 0 at offset 0
    def at(h: Int, i: Int) = new Timestamp((baseS + h * 3600L) * 1000L + i)
    val flat = (0 until 72).map(h => ("a", at(h, 0))).toDF("event_type", "ts")
    val f = Temporal.seasonalDecompose(flat)
      .as[(String, Long, Long, Double)].collect()
    assert(f.forall(_._4 == 0.0), f.toSeq.toString)
    // doubled count at hod 0: seasonal(0) = 24/25; hod 12's windows
    // straddle TWO peaks (eh 12 sees eh 0 and 24) -> -2/25; rest -1/25
    val diurnal = (0 until 72).flatMap(h =>
      (0 until (if (h % 24 == 0) 2 else 1)).map(i => ("a", at(h, i))))
      .toDF("event_type", "ts")
    val g = Temporal.seasonalDecompose(diurnal)
      .as[(String, Long, Long, Double)].collect().map(r => r._2 -> r._4).toMap
    assert(g(0L) == 0.96 && g(12L) == -0.08 && g(1L) == -0.04, g.toString)
  }


  test("cohort LTV: cumulative per-user value by week age") {
    import spark.implicits._
    import java.sql.Timestamp
    val w0 = 1700438400000L // 2023-11-20, a Monday
    val wk = 7L * 86400000L
    val ev = Seq((1L, new Timestamp(w0), 1.0), (1L, new Timestamp(w0 + wk), 2.0),
      (2L, new Timestamp(w0 + 1000L), 3.0)).toDF("user_id", "ts", "value")
    val got = Temporal.cohortLtv(ev)
      .as[(java.sql.Date, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(r => (r._2, r._3, r._4, r._5)) ==
      Seq((0L, 2L, 4.0, 2.0), (1L, 1L, 2.0, 3.0)), got.toString)
  }


  test("nelson-aalen: hazard increments are d/n in duration order") {
    import spark.implicits._
    import java.sql.Timestamp
    // users with lifetimes 0,0,1,2 days; global max at day 3 so all four
    // are censored-eligible (gap > 12h) -> observed, except the day-2
    // user whose end IS near the max... construct a far-future sentinel
    val base = 1700000000000L
    def t(d: Long) = new Timestamp(base + d * 86400000L)
    val ev = Seq((1L, t(0)), (1L, t(0)), (2L, t(0)), (2L, t(0)),
      (3L, t(0)), (3L, t(1)), (4L, t(0)), (4L, t(2)), (9L, t(10)))
      .toDF("user_id", "ts")
    // lifetimes: u1=0, u2=0, u3=1, u4=2, u9=0 (ends AT the global max ->
    // censored); observed events: dur0 d=2 (u1,u2), dur1 d=1, dur2 d=1
    // risk suffix over dur counts {0:3, 1:1, 2:1}: n(0)=5, n(1)=2, n(2)=1
    // H: .4; .4+1/2 = .9; .9+1/1 = 1.9; varH: .08; .33; 1.33
    val got = Temporal.nelsonAalen(ev)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((0L, 5L, 2L, 0.4, 0.08), (1L, 2L, 1L, 0.9, 0.33),
      (2L, 1L, 1L, 1.9, 1.33)), got.toString)
  }


  test("log-rank: identical cohorts give chi2 ~ 0, planted shift fires") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1700000000000L
    def t(d: Long) = new Timestamp(base + d * 86400000L)
    // even users (grp 0) live 1 day, odd (grp 1) live 5 days; sentinel
    // far out so all are observed
    val ev = (0L until 20L).flatMap(u =>
      Seq((u, t(0)), (u, t(if (u % 2 == 0) 1 else 5)))) ++ Seq((99L, t(30)))
    val got = Temporal.logRank(ev.toDF("user_id", "ts"))
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    // grp1 deaths all happen LATE: O1 >> E1 at late times → big chi2
    assert(got._5 > 10.0, got.toString)
    // both PARITY groups get the same lifetime mix (1 or 5 days by u/2
    // parity) → O1 = E1 at every time → chi2 exactly 0
    val same = (0L until 20L).flatMap(u =>
      Seq((u, t(0)), (u, t(if ((u / 2) % 2 == 0) 1 else 5)))) ++
      Seq((99L, t(30)))
    val g2 = Temporal.logRank(same.toDF("user_id", "ts"))
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(g2._5 == 0.0, g2.toString)
  }

}
