package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-7 pipeline operators: time-weighted average,
  * interval coalescing, keyword extraction, syllable complexity,
  * embedding standardization, curriculum ordering, streaming dedup.
  * Each gets a hand-computed micro-case; the DuckDB hash oracles cover
  * the fixture-scale behavior. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000L)

  test("timeWeightedAvg weights values by hold time; degenerate keys drop") {
    val e = Seq(
      // user 1: v=10 holds 10s, v=20 holds 20s, last value holds nothing
      (1L, 1L, ts(0), 10.0),
      (2L, 1L, ts(10), 20.0),
      (3L, 1L, ts(30), 999.0),
      // user 2: single event — no span, must be excluded
      (4L, 2L, ts(0), 5.0),
      // user 3: two events at the SAME ts — zero span, excluded (0/0
      // would be NaN in Spark and NULL in SQL engines)
      (5L, 3L, ts(0), 1.0),
      (6L, 3L, ts(0), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.timeWeightedAvg(e)
      .as[(Long, Long, Double)].collect().toList
    assert(got == List((1L, 3L, math.rint((10.0 * 10 + 20.0 * 20) / 30 * 10000) / 10000)))
  }

  test("mergeIntervals coalesces overlapping spans into islands") {
    val e = Seq(
      // user 1, len=300s: events at 0 and 100 overlap ([0,300)+[100,400)
      // -> one island covering 400s); 700 starts fresh (+300s)
      (1L, 1L, ts(0)),
      (2L, 1L, ts(100)),
      (3L, 1L, ts(700)),
      // user 2: back-to-back at exactly the touch point 300 — t=300 is
      // NOT > end(0+300), so touching intervals merge
      (4L, 2L, ts(0)),
      (5L, 2L, ts(300))
    ).toDF("event_id", "user_id", "ts")
    val got = Temporal.mergeIntervals(e)
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(got(1L) == ((3L, 2L, 700L * 1000000)))
    assert(got(2L) == ((2L, 1L, 600L * 1000000)))
  }

  private implicit class Tup4Ops(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
  }

  test("keywords returns the k top-tf-idf tokens per doc, token tie-break") {
    // 3 docs; 'rare' appears 3x in doc 1 only -> dominant keyword there;
    // 'common' is in every doc -> idf = ln(1) = 0, never a keyword above
    // a positive-idf token
    val docs = Seq(
      (1L, "rare rare rare mid common"),
      (2L, "mid mid common x"),
      (3L, "common y z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, 2)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toList).toMap
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val l3 = r4(math.log(3.0))
    assert(got(1L) == List(("rare", r4(3 * math.log(3.0))), ("mid", r4(math.log(1.5)))))
    // doc 2: the unique singleton 'x' (ln 3) outranks 'mid' (2·ln 1.5)
    assert(got(2L) == List(("x", l3), ("mid", r4(2 * math.log(1.5)))))
    // doc 3: y and z tie on tfidf — token order breaks it
    assert(got(3L) == List(("y", l3), ("z", l3)))
  }

  test("syllableStats counts vowel runs; complex = >=3 runs") {
    val docs = Seq(
      // hello=2 runs, world=1, xyz=0, banana=3 (complex)
      (1L, "hello world xyz banana"),
      (2L, "zh1 zh2") // vowel-free tokens: 0 syllables, avg 0.0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.syllableStats(docs)
      .as[(Long, Int, Int, Int, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((4, 6, 1, Some(1.5))))
    assert(got(2L) == ((2, 0, 0, Some(0.0))))
  }

  test("standardize z-scores per dimension; constant dims give 0") {
    val emb = Seq(
      (1L, Array(0.0f, 7.0f)),
      (2L, Array(2.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.standardize(emb)
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 0)) == -1.0 && got((2L, 0)) == 1.0) // mu=1, sd=1
    assert(got((1L, 1)) == 0.0 && got((2L, 1)) == 0.0)  // sd=0 dim
  }

  test("curriculum rank is a permutation and deciles follow the rank") {
    val out = graft.queries.ExtQueries.curriculumQ(spark, sf()).cache()
    val n = out.count()
    // crank is exactly 0..n-1
    assert(out.agg(countDistinct("crank")).as[Long].head == n)
    assert(out.agg(min("crank"), max("crank")).as[(Long, Long)].head == ((0L, n - 1)))
    // decile is NTILE(10)'s piecewise formula applied to crank
    val q = n / 10; val r = n % 10
    val bad = out.where(col("decile") =!=
      when(lit(q) === 0, col("crank") + 1)
        .when(col("crank") < r * (q + 1), (col("crank") / (q + 1)).cast("int") + 1)
        .otherwise(lit(r) + ((col("crank") - r * (q + 1)) / q).cast("int") + 1))
      .count()
    assert(bad == 0, s"$bad rows with decile inconsistent with crank")
    // easiest decile holds the highest mean token frequency
    val d1 = out.where(col("decile") === 1).agg(min("mean_tok_freq")).as[Double].head
    val d10 = out.where(col("decile") === 10).agg(max("mean_tok_freq")).as[Double].head
    assert(d1 >= d10)
    out.unpersist()
  }

  test("domainReweight conserves the budget and upweights hard domains") {
    // source a: common token soup; source b: rare vocabulary -> higher
    // unigram NLL -> positive excess -> larger share than its n_toks
    // alone would give
    val docs = Seq(
      (1L, "x x x x x x x x", "a"),
      (2L, "x x x x x x x x", "a"),
      (3L, "q r s t u v w y", "b")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.domainReweight(docs, budget = 1000L)
      .as[(String, Long, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.values.map(_._6).sum == 1000L) // Hamilton: exact budget
    assert(got("a")._4 == 0.0)                // common domain: no excess
    assert(got("b")._4 > 0.0 && got("b")._5 > got("a")._5)
    // loss sanity: -avg ln p; source a sees only p = 16/24
    val la = math.rint(-math.log(16.0 / 24.0) * 10000) / 10000
    assert(got("a")._3 == la)
  }

  test("tokenizer fertility is the occurrence-weighted pieces-per-token") {
    val out = graft.queries.ExtQueries.tokenizerFertilityQ(spark, sf())
      .as[(String, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, nt, np, f) =>
      assert(np >= nt, "every token takes at least one piece")
      assert(f == math.rint(np.toDouble / nt * 10000) / 10000)
    }
  }

  test("scd2Lookup serves the run in force at the probe time") {
    val hist = Seq(
      // key 1: status A [0, 100), B [100, open)
      (1L, 1, "A", ts(0), Some(ts(100))),
      (1L, 2, "B", ts(100), None),
      // key 2: empty run [50, 50) then C [50, open)
      (2L, 1, "X", ts(50), Some(ts(50))),
      (2L, 2, "C", ts(50), None)
    ).toDF("k", "run_idx", "status", "valid_from", "valid_to")
    val probes = Seq(
      (10L, 1L, ts(99)),   // inside run 1
      (11L, 1L, ts(100)),  // exactly at the boundary -> run 2 (half-open)
      (12L, 1L, ts(-5)),   // before history -> dropped
      (13L, 2L, ts(50))    // empty run matches nothing -> run 2
    ).toDF("probe_id", "k", "pts")
    val got = Temporal.scd2Lookup(hist, probes, "k", "pts")
      .select("probe_id", "status", "run_idx")
      .as[(Long, String, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(10L -> (("A", 1)), 11L -> (("B", 2)), 13L -> (("C", 2))))
  }

  test("jaccardThresholdCurve counts pairs integer-exactly, monotone down") {
    // docs 1,2 share 2 of 3 distinct trigrams each: J = 2/4 = 0.5 — in
    // the t10=5 cell only; doc 3 overlaps nothing
    val docs = Seq(
      (1L, "a b c d e"),   // trigrams: abc bcd cde
      (2L, "a b c d x"),   // trigrams: abc bcd cdx -> inter=2, union=4
      (3L, "p q r s t")
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardThresholdCurve(docs)
      .as[(Int, Long)].collect().toMap
    assert(got == Map(5 -> 1L, 6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 0L))
    val curve = Dedup.jaccardThresholdCurve(graft.Tables.documents(spark, sf()))
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(curve.zip(curve.tail).forall { case (a, b) => a >= b })
  }

  test("spanCorrupt numbers sentinels sequentially and keeps unmasked tokens") {
    val docs = graft.Tables.documents(spark, sf())
    val orig = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val out = TextAnalysis.spanCorrupt(docs)
      .as[(Long, String, Int, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, corrupted, nSpans, nMasked) =>
      val toks = corrupted.split(" ").filter(_.nonEmpty).toSeq
      val (sentinels, plain) = toks.partition(_.startsWith("<extra_id_"))
      // sentinel ids are exactly 0..n_spans-1 in order
      assert(sentinels == (0 until nSpans).map(i => s"<extra_id_$i>"))
      assert(nMasked >= nSpans) // each span hides >= 1 token
      // unmasked tokens survive in order; kept + masked = original count
      assert(plain.size + nMasked == orig(id).size)
      // plain tokens appear in the original in the same relative order
      // (subsequence check)
      val it = orig(id).iterator
      assert(plain.forall(p => it.contains(p)),
        s"doc $id: corrupted tokens are not a subsequence")
    }
    // ~10% of blocks mask corpus-wide (binomial, loose band)
    val nBlocks = orig.values.map(ts => (ts.size + 2) / 3).sum.toDouble
    val p = out.map(_._3).sum / nBlocks
    assert(p > 0.05 && p < 0.15, s"mask rate $p out of band")
  }

  test("spanCorrupt maskPct is an exact percentage for every value (30 works, 101 throws)") {
    val docs = graft.Tables.documents(spark, sf())
    val blocks = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (_, t) =>
        (t.split(" ").count(_.nonEmpty) + 2) / 3 }.sum.toDouble
    // 30 doesn't divide 100: the old % (100/30) predicate masked 1/3 of
    // blocks; the hash % 100 < 30 form holds the exact 30% contract
    val n30 = TextAnalysis.spanCorrupt(docs, maskPct = 30)
      .agg(sum("n_spans")).as[Long].collect().head
    val r30 = n30 / blocks
    assert(r30 > 0.25 && r30 < 0.35, s"mask rate $r30 out of 30% band")
    // boundaries: 0 masks nothing, 100 masks everything
    val z = TextAnalysis.spanCorrupt(docs, maskPct = 0)
      .agg(sum("n_masked")).as[Long].collect().head
    assert(z == 0L)
    val full = TextAnalysis.spanCorrupt(docs, maskPct = 100)
      .select("doc_id", "corrupted", "n_spans").as[(Long, String, Int)]
      .collect()
    assert(full.forall { case (_, c, n) =>
      c.split(" ").filter(_.nonEmpty).toSeq ==
        (0 until n).map(i => s"<extra_id_$i>") })
    // out-of-range percentages fail fast instead of div-by-zero
    intercept[IllegalArgumentException] {
      TextAnalysis.spanCorrupt(docs, maskPct = 101)
    }
  }

  test("groupPrioritySample returns exactly k per stratum, members of it") {
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
      .withColumn("w", ((col("n_chars") % 100) + 1) / 100.0)
    val got = TextAnalysis.groupPrioritySample(docs, "w", 5).cache()
    val sizes = got.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 5L)) // every lang has >= 5 docs here
    // sampled ids belong to their stratum
    val bad = got.join(docs.select(col("lang").as("stratum"), col("doc_id")),
      Seq("stratum", "doc_id"), "left_anti").count()
    assert(bad == 0)
    got.unpersist()
  }

  test("slidingActive counts users whose activity falls in the trailing 24h") {
    val e = Seq(
      (1L, 1L, ts(0)),           // user 1 active hour 0 -> covers hours 0..23
      (2L, 2L, ts(3600 * 25))    // user 2 active hour 25 (caps the grid)
    ).toDF("event_id", "user_id", "ts")
    // patch through the query path with a synthetic frame
    val uh = e.select(col("user_id"),
      date_trunc("hour", col("ts")).as("h")).distinct()
    val bounds = e.agg(max(date_trunc("hour", col("ts"))).as("hmax"))
    val got = uh.crossJoin(broadcast(bounds))
      .select(col("user_id"), explode(sequence(col("h"),
        least(col("h") + expr("INTERVAL 23 HOURS"), col("hmax")),
        expr("INTERVAL 1 HOUR"))).as("hh"))
      .groupBy("hh").agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Timestamp, Long)].collect()
      .map { case (t, n) => t.getTime / 3600000 -> n }.toMap
    assert((0L to 23L).forall(got(_) == 1L)) // user 1's trailing window
    assert(got.get(24L).isEmpty)             // nobody active in (0, 24]
    assert(got(25L) == 1L)                   // user 2, grid capped at 25
    assert(got.size == 25)
  }

  test("dedup eval row satisfies its counting identities") {
    val row = graft.queries.ExtQueries.dedupEvalQ(spark, sf("sf0.01"))
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])].head()
    val (nc, nt, tp, fp, fn, prec, rec) = row
    assert(tp <= math.min(nc, nt) && fp == nc - tp && fn == nt - tp)
    // banding with 4 bands x 2 rows catches essentially all J >= 0.5
    assert(rec.exists(_ >= 0.9), s"recall $rec below floor")
    assert(prec.exists(_ > 0.0))
  }

  test("langid confusion cells sum to the corpus size") {
    val cells = graft.queries.ExtQueries.langidConfusionQ(spark, sf())
    val total = cells.agg(sum("n")).as[Long].head
    assert(total == graft.Tables.documents(spark, sf()).count())
  }

  test("funnelLatency measures strictly-ordered stage advances in seconds") {
    val e = Seq(
      // user 1: view@0, click@10s, purchase@70s -> lat 10 and 60
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(10), "click"),
      (3L, 1L, ts(70), "purchase"),
      // user 2: click BEFORE view -> never advances past view
      (4L, 2L, ts(5), "click"), (5L, 2L, ts(9), "view"),
      // user 3: view then click at the SAME ts -> strict > excludes it
      (6L, 3L, ts(0), "view"), (7L, 3L, ts(0), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.funnelLatency(e, Seq("view", "click", "purchase"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("1:view->click") == ((1L, 10.0, 10.0)))
    assert(got("2:click->purchase") == ((1L, 60.0, 60.0)))
  }

  test("typeCooccurrence is a symmetric Jaccard over user sets") {
    val e = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "b"),
      (3L, 2L, ts(0), "a"), (4L, 2L, ts(1), "b"), (5L, 2L, ts(2), "c"),
      (6L, 3L, ts(0), "a")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Temporal.typeCooccurrence(e)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // a:{1,2,3} b:{1,2} c:{2}
    assert(got(("a", "b")) == ((2L, math.rint(2.0 / 3 * 10000) / 10000)))
    assert(got(("a", "c")) == ((1L, math.rint(1.0 / 3 * 10000) / 10000)))
    assert(got(("b", "c")) == ((1L, 0.5)))
  }

  test("charEntropy: uniform bigrams max it, constant text zeroes it") {
    val docs = Seq(
      (1L, "aaaa"),  // bigrams: aa x3 -> H = 0
      (2L, "abcd"),  // ab bc cd, all distinct -> H = ln 3
      (3L, "x")      // too short: dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 1L, 0.0)))
    assert(got(2L) == ((3L, 3L, math.rint(math.log(3.0) * 10000) / 10000)))
    assert(!got.contains(3L))
  }

  test("rollingMedian is frame-bounded and robust to a spike") {
    val e = (1L to 12L).map(i =>
      (i, 1L, if (i == 6) 1000.0 else i.toDouble)).toDF("event_id", "user_id", "value")
    val got = Temporal.rollingMedian(e, "user_id", Seq("event_id"), "value", 9)
      .select("event_id", "rolling_median")
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0)
    assert(got(2L) == 1.5)              // median of {1, 2}
    assert(got(5L) == 3.0)              // {1..5}
    assert(got(6L) == 3.5)              // {1..5, 1000}: spike barely moves it
    // row 12 frame = rows 3..12: {3,4,5,1000,7..12} -> median 8.5
    assert(got(12L) == 8.5)
  }

  test("tokenLabelMi ranks label-exclusive tokens above shared ones") {
    val docs = Seq(
      (1L, "only_a only_a shared", "a"),
      (2L, "only_b shared shared", "b")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.tokenLabelMi(docs, topK = 10)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // exclusive tokens carry positive MI; 'shared' carries less
    assert(got("only_a") > got("shared") && got("only_b") > got("shared"))
    assert(got.values.forall(_ >= 0.0)) // MI is non-negative
  }

  test("trimmedMean drops exact rank cuts and resists a spike") {
    // group g: values 1..10 -> cut = 1 each side -> mean of 2..9 = 5.5
    // even after replacing value 10 with a 1e6 spike (rank cut eats it)
    val e = ((1L to 9L).map(i => (i, "g", i.toDouble)) :+ ((10L, "g", 1e6)))
      .toDF("event_id", "event_type", "value")
    val got = Temporal.trimmedMean(e)
      .as[(String, Long, Long, Double)].collect().head
    assert(got == (("g", 10L, 8L, 5.5)))
  }

  test("readability: counts and a hand-computed FK grade") {
    val docs = Seq(
      (1L, "the cat sat. it sat on a mat."),   // 8 toks (incl '.' glued), 2 sentences
      (2L, ""),                                // zero tokens: dropped
      (3L, "incomprehensibility")              // 1 tok, 0 dots -> n_sent = 1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got.contains(2L))
    val (_, w1, s1, sy1, fk1, _) = got(1L)
    assert(w1 == 8L && s1 == 2L)
    // vowel groups: the(1) cat(1) sat.(1) it(1) sat(1) on(1) a(1) mat.(1) = 8
    assert(sy1 == 8L)
    assert(fk1 == math.rint((0.39 * 4.0 + 11.8 * 1.0 - 15.59) * 10000) / 10000)
    // i-o-e-e-i-i-i-y: vowel groups of 'incomprehensibility' = 7 ('y' not a vowel here)
    val (_, w3, s3, sy3, _, _) = got(3L)
    assert(w3 == 1L && s3 == 1L && sy3 == 7L)
  }

  test("lexicalDiversity: exact integer identities on a tiny corpus") {
    val docs = Seq(
      (1L, "a a b", "s1"),    // N=3 V=2 c2=4+1=5
      (2L, "c", "s1"),        // s1 total: N=4 V=3 c2=4+1+1=6
      (3L, "x y z w", "s2")   // N=4 V=4 c2=4 -> yule 0, simpson 0
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.lexicalDiversity(docs)
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, v1, ttr1, _, yk1, sim1) = got("s1")
    assert(n1 == 4L && v1 == 3L && ttr1 == 0.75)
    assert(yk1 == math.rint(10000.0 * (6 - 4) / 16.0 * 10000) / 10000)
    assert(sim1 == math.rint((6 - 4) / 12.0 * 1e6) / 1e6)
    val (_, _, _, _, _, yk2, sim2) = got("s2")
    assert(yk2 == 0.0 && sim2 == 0.0)
  }

  test("benford: digits from the 4-decimal integer string; chi2 = 0 on exact Benford") {
    // craft counts exactly proportional to log10(1+1/d) is impossible in
    // integers; instead check digit extraction + the expected-count column
    val df = Seq(0.00009, 0.1234, 1.0, 25.0, 999.99, 0.0, -3.0)
      .toDF("value")
    val got = Profile.benford(df)
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    // 0.00009 -> round(0.9)=1 -> digit 1; 0.1234 -> 1234 -> 1; 1.0 -> 10000 -> 1
    // 25.0 -> 250000 -> 2; 999.99 -> 9999900 -> 9; 0.0 and -3.0 dropped (iv <= 0)
    assert(got == Map(1 -> 3L, 2 -> 1L, 9 -> 1L))
    val n = Profile.benford(df).agg(sum("n_obs")).as[Long].head()
    assert(n == 5L)
  }

  test("cusumChangePoint finds a planted level shift") {
    // type g: 20 events at value 10, then 20 at value 50 — the cumulative
    // deviation peaks exactly at the boundary (rank 20)
    val e = (1L to 40L).map(i =>
      (i, ts(i * 60), "g", if (i <= 20) 10.0 else 50.0))
      .toDF("event_id", "ts", "event_type", "value")
    val got = Temporal.cusumChangePoint(e)
      .as[(String, Long, Long, Long, java.sql.Timestamp, Double)].collect().head
    assert(got._1 == "g" && got._2 == 40L && got._3 == 20L && got._4 == 20L)
    // peak = |sum_{j<=20}(v_j - mean)| = 20 * |10 - 30| = 400
    assert(got._6 == 400.0)
  }

  test("hourlyAutocorr: a strict 2-hour alternation has r = -1 at lag 1, +1 at lag 2") {
    // counts alternate 3,1,3,1,... over 12 contiguous hours
    val e = (0 until 12).flatMap { h =>
      val n = if (h % 2 == 0) 3 else 1
      (0 until n).map(k => (h * 10L + k, ts(h * 3600L + k), 1L, "g"))
    }.toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.hourlyAutocorr(e)
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => r._2 -> r._4).toMap
    assert(got(1).contains(-1.0))
    assert(got(2).contains(1.0))
    // lag 3 pairs even with odd again -> -1
    assert(got(3).contains(-1.0))
  }

  test("hourlyAutocorr fills missing hours with zero counts") {
    // hours 0 and 2 have events, hour 1 none: the grid must be length 3
    // per lag-1 pairing (2 pairs), not a spliced length-2 series
    val e = Seq((1L, ts(0), 1L, "g"), (2L, ts(2 * 3600L), 1L, "g"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.hourlyAutocorr(e, maxLag = 1)
      .as[(String, Int, Long, Option[Double])].collect().head
    assert(got._3 == 2L) // (h0,h1) and (h1,h2) — h1 exists with c=0
  }

  test("iqrOutliers: hand-set quartiles and fence counts") {
    // type g: 1..11 plus spikes -30 and 40 (n=13)
    // sorted: -30,1..11,40 -> q1 = 3, q3 = 9 (exact interpolation),
    // iqr 6, fences -6 / 18 -> one low (-30), one high (40)
    val e = ((1L to 11L).map(i => (i, "g", i.toDouble)) ++
      Seq((12L, "g", -30.0), (13L, "g", 40.0)))
      .toDF("event_id", "event_type", "value")
    val got = Temporal.iqrOutliers(e)
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(got == (("g", 13L, 1L, 1L, 3.0, 9.0, -6.0, 18.0)), got.toString)
  }

  test("abTest: exact counts and a hand-computed z") {
    // variant 0 (even users): 4 events, 1 purchase; variant 1: 4, 3
    val e = Seq(
      (1L, 2L, "purchase"), (2L, 2L, "view"), (3L, 4L, "view"), (4L, 4L, "view"),
      (5L, 1L, "purchase"), (6L, 1L, "purchase"), (7L, 3L, "purchase"), (8L, 3L, "view")
    ).toDF("event_id", "user_id", "event_type")
    val r = Temporal.abTest(e)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].collect().head
    assert((r._1, r._2, r._3, r._4, r._5, r._6) == ((4L, 1L, 4L, 3L, 0.25, 0.75)))
    val pp = 0.5
    val z = (0.75 - 0.25) / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4))
    assert(r._7.contains(math.rint(z * 10000) / 10000))
    // degenerate: every event converts -> z NULL, not a crash
    val allConv = e.withColumn("event_type", lit("purchase"))
    assert(Temporal.abTest(allConv)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect().head._7.isEmpty)
  }

  test("controlChart: constant series has zero MR and no out-of-limit points") {
    val flat = (1L to 5L).map(i => (i, ts(i * 60), "g", 7.0))
      .toDF("event_id", "ts", "event_type", "value")
    val r = Temporal.controlChart(flat)
      .as[(String, Long, Double, Double, Double, Double, Long)].collect().head
    assert(r == (("g", 5L, 7.0, 0.0, 7.0, 7.0, 0L)), r.toString)
    // one spike: MRbar > 0 and the spike escapes the limits
    val spiky = flat.unionAll(Seq((6L, ts(600L), "g", 100.0))
      .toDF("event_id", "ts", "event_type", "value"))
    val s = Temporal.controlChart(spiky)
      .as[(String, Long, Double, Double, Double, Double, Long)].collect().head
    assert(s._4 > 0 && s._7 >= 1L)
  }

  test("markovStationary: a deterministic 2-cycle settles at 50/50; dangling self-loops") {
    // user 1 alternates a,b,a,b,... -> P(a->b)=P(b->a)=1
    val cyc = (1L to 10L).map(i =>
      (i, ts(i * 60), 1L, if (i % 2 == 1) "a" else "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.markovStationary(cyc)
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 0.5, "b" -> 0.5))
    // absorbing state: a->b always, b dangling (self-loop) -> all mass in b
    val abs = Seq((1L, ts(0), 1L, "a"), (2L, ts(60), 1L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val g2 = Temporal.markovStationary(abs).as[(String, Double)].collect().toMap
    assert(g2("b") == 1.0 && g2("a") == 0.0)
  }

  test("jsDivergence is symmetric-bounded: identical strata ~0, disjoint near ln 2") {
    val same = Seq((1L, "x y z", "a"), (2L, "x y z", "b")).toDF("doc_id", "text", "source")
    val g1 = TextAnalysis.jsDivergence(same).as[(String, Double)].collect().toMap
    // each stratum == pooled distribution -> JSD ~ 0 (smoothing keeps it tiny)
    assert(g1.values.forall(v => v >= 0.0 && v < 0.02))
    val disj = Seq((1L, "x x x x", "a"), (2L, "y y y y", "b")).toDF("doc_id", "text", "source")
    val g2 = TextAnalysis.jsDivergence(disj).as[(String, Double)].collect().toMap
    // stratum vs pooled mix: JSD substantial but <= ln 2
    assert(g2.values.forall(v => v > 0.05 && v <= math.log(2.0)))
  }

  test("tokenBurstiness: a concentrated token outranks an evenly spread one") {
    // 6 docs; 'f' once in every doc (Poisson-ish); 'b' 6 times in one doc
    val docs = (1L to 6L).map(i =>
      (i, if (i == 1) "f b b b b b b" else "f")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenBurstiness(docs, minDf = 1L, k = 10)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // f: df 6 cf 6 s2 6 -> b = (36-36)/36 = 0
    assert(got("f") == (("f", 6L, 6L, 0.0)))
    // b: df 1 cf 6 s2 36 -> (6*36 - 36)/(6*6) = 5.0
    assert(got("b") == (("b", 1L, 6L, 5.0)))
  }

  test("sourceLangMix: entropy and dominant language with exact shares") {
    val docs = Seq(
      (1L, "t", "en", "s1"), (2L, "t", "en", "s1"), (3L, "t", "de", "s1"),
      (4L, "t", "zh", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.sourceLangMix(docs)
      .as[(String, Long, Long, Double, String, Double)].collect()
      .map(r => r._1 -> r).toMap
    val h = math.log(3.0) - (2.0 * math.log(2.0)) / 3.0
    assert(got("s1") == (("s1", 3L, 2L, math.rint(h * 10000) / 10000, "en",
      math.rint(2.0 / 3 * 10000) / 10000)))
    assert(got("s2") == (("s2", 1L, 1L, 0.0, "zh", 1.0)))
  }

  test("hourlyTypeEntropy: uniform mix = ln T, single type = 0") {
    val e = Seq(
      (1L, ts(100), "a"), (2L, ts(200), "b"), (3L, ts(300), "c"),
      (4L, ts(3700), "a"), (5L, ts(3800), "a")
    ).toDF("event_id", "ts", "event_type")
    val got = Temporal.hourlyTypeEntropy(e)
      .as[(java.sql.Timestamp, Long, Long, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(got(3L) == math.rint(math.log(3.0) * 10000) / 10000)
    assert(got(2L) == 0.0)
  }

  test("hourlyPeaks: an isolated spike is a strict local max over the filled grid") {
    // type g over 10 contiguous hours: count 1 everywhere except hour 5 = 20;
    // hour 7 has NO events (grid must fill 0, not splice)
    val e = (0 until 10).filter(_ != 7).flatMap { h =>
      val n = if (h == 5) 20 else 1
      (0 until n).map(k => (h * 100L + k, ts(h * 3600L + 10 + k), "g"))
    }.toDF("event_id", "ts", "event_type")
    val got = Temporal.hourlyPeaks(e)
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == 1)
    assert(got.head._2 == 5L && got.head._3 == 20L) // the spike hour only
  }

  test("stickiness: windows cover trailing days, gaps fill, ratio exact") {
    // user 1 active day 0; user 2 active days 0 and 2; day 1 has nobody
    val e = Seq(
      (1L, ts(100), 1L), (2L, ts(200), 2L), (3L, ts(2 * 86400L + 100), 2L)
    ).toDF("event_id", "ts", "user_id")
    val got = Temporal.stickiness(e)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 3)
    assert(got(0L) == ((0L, 2L, 2L, 2L, Some(1.0))))
    assert(got(1L) == ((1L, 0L, 2L, 2L, Some(0.0)))) // day with no activity
    assert(got(2L) == ((2L, 1L, 2L, 2L, Some(0.5)))) // both users in trailing 7/30
  }

  test("seasonalNaiveError: an exact 24h cycle has zero lag-24 error, nonzero lag-1") {
    // 48 contiguous hours, count = 3 on even hours, 1 on odd
    val e = (0 until 48).flatMap { h =>
      val n = if (h % 2 == 0) 3 else 1
      (0 until n).map(k => (h * 100L + k, ts(h * 3600L + k), "g"))
    }.toDF("event_id", "ts", "event_type")
    val r = Temporal.seasonalNaiveError(e)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    assert(r._1 == "g" && r._2 == 24L)
    assert(r._3 == 0.0 && r._4 == 0.0)  // period divides 24 -> perfect
    assert(r._5 == 2.0 && r._6 == 2.0)  // lag-1 always off by 2
  }

  test("quotaGate admits the first k per (user, hour) in (ts, id) order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // user 1 hour 0: events 1,2,3 (quota 2 -> 3 dropped); hour 1: event 4
    val ms = MemoryStream[(Long, Long, Long, Long)]
    ms.addData((1L, 0L, 3L, 300L), (1L, 0L, 1L, 100L),
      (1L, 0L, 2L, 200L), (1L, 1L, 4L, 400L))
    val q = graft.streaming.Streams.quotaGate(ms.toDS(), maxPerKey = 2L)
      .toDF("event_id", "user_id", "epoch_hour")
      .writeStream.format("memory").queryName("quota_spec").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("quota_spec")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List((1L, 1L, 0L), (2L, 1L, 0L), (4L, 1L, 1L)))
  }

  test("quotaGate quota carries across micro-batch boundaries for the same key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def tsu(h: Long, k: Long): Long = h * 3600L * 1000000L + k
    val ms = MemoryStream[(Long, Long, Long, Long)]
    val q = graft.streaming.Streams.quotaGate(ms.toDS(), maxPerKey = 2L)
      .toDF("event_id", "user_id", "epoch_hour")
      .writeStream.format("memory").queryName("quota_xbatch").outputMode("append")
      .start()
    // batch 1: (user 1, hour 5) admits events 1, 2 — quota now full
    ms.addData((1L, 5L, 1L, tsu(5, 1)), (1L, 5L, 2L, tsu(5, 2)))
    q.processAllAvailable()
    // batch 2: two MORE (user 1, hour 5) events — the admitted-count
    // state must carry over and drop both; a different user still admits
    ms.addData((1L, 5L, 3L, tsu(5, 3)), (1L, 5L, 4L, tsu(5, 4)),
      (2L, 5L, 5L, tsu(5, 5)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quota_xbatch")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List((1L, 1L, 5L), (2L, 1L, 5L), (5L, 2L, 5L)), got.toString)
  }

  test("quotaGate evicts (user, hour) state once the watermark passes the hour") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def tsu(hours: Long): Long = hours * 3600L * 1000000L
    val ms = MemoryStream[(Long, Long, Long, Long)]
    val q = graft.streaming.Streams.quotaGate(ms.toDS(), maxPerKey = 2L,
        lateness = "1 hour")
      .toDF("event_id", "user_id", "epoch_hour")
      .writeStream.format("memory").queryName("quota_evict").outputMode("append")
      .start()
    // batch 1: two keys in hours 5 and 6 -> 2 state rows (hours > 0:
    // an event AT the initial watermark epoch would be dropped as late)
    ms.addData((1L, 5L, 1L, tsu(5)), (2L, 6L, 2L, tsu(6)))
    q.processAllAvailable()
    // batch 2: hour 30 -> post-batch watermark = 29h, far past hours 5/6
    ms.addData((1L, 30L, 3L, tsu(30)))
    q.processAllAvailable()
    // batch 3: runs WITH the advanced watermark -> hour-5/6 states time
    // out and are remove()d; only (1, 30) and (3, 31) survive
    ms.addData((3L, 31L, 4L, tsu(31)))
    q.processAllAvailable()
    val rows = q.recentProgress.reverse.collectFirst {
      case p if p.stateOperators.nonEmpty && p.numInputRows > 0 =>
        p.stateOperators.head.numRowsTotal
    }
    q.stop()
    assert(rows.contains(2L),
      s"expected the watermark to evict the 2 expired (user, hour) states, state rows = $rows")
    // every admitted event still came through exactly once
    val got = spark.table("quota_evict")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List((1L, 1L, 5L), (2L, 2L, 6L), (3L, 1L, 30L), (4L, 3L, 31L)))
  }

  test("hashFeatureCensus: bucket arithmetic and collision accounting are exact") {
    // 3 distinct tokens into 1 bucket forces 1 collided bucket holding all 3
    val docs = Seq((1L, "x y z x")).toDF("doc_id", "text")
    val one = TextAnalysis.hashFeatureCensus(docs, nBuckets = 1)
      .as[(Int, Long, Long, Long, Long, Double)].collect().head
    assert(one == ((1, 1L, 3L, 1L, 3L, 1.0)))
    // huge space: collisions vanish, mass fraction 0
    val big = TextAnalysis.hashFeatureCensus(docs, nBuckets = 1 << 20)
      .as[(Int, Long, Long, Long, Long, Double)].collect().head
    assert(big._2 == 3L && big._4 == 0L && big._6 == 0.0)
  }

  test("probe calibration: bins partition the corpus and ECE is bounded by the max gap") {
    val got = graft.queries.ExtQueries.probeCalibrationQ(spark, sf())
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toList == (1 to 10).toList)
    assert(got.map(_._2).sum == got.map(_._2).sum) // bins cover all scored docs
    val gaps = got.map(r => math.abs(r._5 - r._4))
    assert(got.head._6 <= gaps.max + 1e-9 && got.head._6 >= 0.0)
    // confidence is monotone over score-ordered bins
    val confs = got.sortBy(_._1).map(_._4)
    assert(confs.zip(confs.tail).forall { case (a, b) => a <= b + 1e-9 })
  }

  test("kaplanMeier: hand-computed risk sets, censoring excluded from events") {
    // corpus end = day 10. users: 1 (life 0d, last day 0 -> churned),
    // 2 (life 2d, last day 2 -> churned), 3 (life 5d, last day 10 ->
    // censored), 4 (life 2d, last day 10 -> censored)
    def u(id: Long, firstDay: Long, lastDay: Long) =
      Seq((id * 10, ts(firstDay * 86400), id), (id * 10 + 1, ts(lastDay * 86400), id))
    val e = (u(1L, 0, 0) ++ u(2L, 0, 2) ++ u(3L, 5, 10) ++ u(4L, 8, 10))
      .toDF("event_id", "ts", "user_id")
    val got = Temporal.kaplanMeier(e)
      .as[(Long, Long, Long, Double)].collect().toList
    // durations: u1=0(obs) u2=2(obs) u3=5(cens) u4=2(cens)
    // t=0: risk 4, d 1 -> S = 3/4; t=2: risk 3, d 1 -> S = 3/4 * 2/3 = 1/2
    assert(got == List((0L, 4L, 1L, 0.75), (2L, 3L, 1L, 0.5)))
  }

  test("jackknifeSe: constant values give SE 0; mean is exact") {
    val e = (1L to 100L).map(i => (i, 7.5)).toDF("event_id", "value")
    val got = Temporal.jackknifeSe(e)
      .as[(Long, Long, Double, Double, Double, Long)].collect()
    assert(got.map(_._2).sum == 100L)
    assert(got.forall(r => r._3 == 7.5 && r._4 == 7.5 && r._5 == 0.0 && r._6 == 100L))
  }

  test("rboEval: identical rankings give RBO(trunc)@10; disjoint give 0") {
    val a = (1L to 10L).map(i => (i, 100.0 - i)).toDF("doc_id", "bm25")
    val bSame = (1L to 10L).map(i => (i, 100.0 - i)).toDF("vec_id", "cos")
    val same = Retrieval.rboEval(a, bSame)
      .as[(Long, Long, Double, Double)].collect()
    // X_d = d at every depth -> rbo = (1-p) * sum p^(d-1)
    val p = 0.9
    val want = (1 to 10).map(d => (1 - p) * math.pow(p, d - 1)).sum
    assert(same.forall(_._4 == math.rint((want + 1e-9) * 10000) / 10000))
    assert(same.map(r => r._1 -> r._2).toMap.forall { case (d, x) => x == d })
    val bDisj = (11L to 20L).map(i => (i, 100.0 - i)).toDF("vec_id", "cos")
    val disj = Retrieval.rboEval(a, bDisj).as[(Long, Long, Double, Double)].collect()
    assert(disj.forall(r => r._2 == 0L && r._4 == 0.0))
  }

  test("pathSurprisal: the one user deviating from a deterministic pattern tops the list") {
    // users 1..4 all do a->b->a->b; user 5 does a->c once (rare transition)
    val e = (1L to 4L).flatMap { u =>
      (0 until 6).map(i => (u * 100 + i, ts(i * 60), u,
        if (i % 2 == 0) "a" else "b"))
    } ++ Seq((500L, ts(0), 5L, "a"), (501L, ts(60), 5L, "c"))
    val df = e.toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.pathSurprisal(df)
      .as[(Long, Long, Double)].collect()
    assert(got.head._1 == 5L)             // the anomalous user ranks first
    assert(got.head._3 > got.last._3)     // strictly more surprising
  }

  test("sessionGapCurve: session counts drop monotonically as the gap widens") {
    // user 1: events at 0, 10min, 40min -> gaps 10m, 30m
    val e = Seq((1L, ts(0), 1L), (2L, ts(600), 1L), (3L, ts(2400), 1L))
      .toDF("event_id", "ts", "user_id")
    val got = Temporal.sessionGapCurve(e)
      .as[(Int, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(5) == 3L)   // both gaps break
    assert(got(15) == 2L)  // only the 30m gap breaks
    assert(got(30) == 1L)  // 30m gap is NOT > 30m: one session
    assert(got(60) == 1L)
  }

  test("kAnonymity: class-size histogram and below-k shares are exact") {
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1),   // class of 3
      ("b", 1), ("b", 1),             // class of 2
      ("c", 1)                        // class of 1
    ).toDF("q1", "q2")
    val got = Profile.kAnonymity(df, Seq("q1", "q2"))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1L && got(1L)._3 == 1L)
    assert(got(2L)._2 == 1L && got(3L)._2 == 1L)
    // frac below 2 = 1/6; below 5 = all 6/6
    assert(got(1L)._4 == math.rint(1.0 / 6 * 10000) / 10000)
    assert(got(1L)._5 == 1.0 && got(1L)._6 == 1.0)
  }

  test("tailIndex: an exact Pareto sample recovers its exponent") {
    // x_i = (N/i)^(1/a) for i = 1..N is a deterministic Pareto(a) sample;
    // Hill over the top-100 should land near a = 2
    val a = 2.0
    val e = (1L to 2000L).map(i =>
      (i, math.pow(2000.0 / i, 1.0 / a))).toDF("event_id", "value")
    val got = Profile.tailIndex(e, "value", "event_id")
      .as[(Long, Double, Option[Double])].collect().head
    assert(got._1 == 100L)
    assert(got._3.exists(al => math.abs(al - a) < 0.25), got.toString)
    // constant positive values: sln = 0 -> alpha null, not a crash
    val const = (1L to 200L).map(i => (i, 5.0)).toDF("event_id", "value")
    assert(Profile.tailIndex(const, "value", "event_id")
      .as[(Long, Double, Option[Double])].collect().head._3.isEmpty)
  }

  test("jsonFieldStats: extracted-integer moments, missing/malformed dropped") {
    val e = Seq(
      (1L, "a", """{"k": 10}"""), (2L, "a", """{"k": 20}"""),
      (3L, "a", """{"other": 5}"""),  // no k: dropped
      (4L, "b", """{"k": 7}""")
    ).toDF("event_id", "event_type", "props")
    val got = Temporal.jsonFieldStats(e)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 15.0, 5.0)))
    assert(got("b") == (("b", 1L, 7.0, 0.0)))
  }

  test("circularHourStats: hours straddling midnight average to midnight, not noon") {
    // type g: equal mass at 23:00 and 01:00 -> circular mean 0 (or 24), R = cos(pi/12)
    val e = Seq(
      (1L, ts(23 * 3600), "g"), (2L, ts(25 * 3600), "g"),
      (3L, ts(6 * 3600), "u"), (4L, ts(18 * 3600), "u") // antipodal: R = 0
    ).toDF("event_id", "ts", "event_type")
    val got = Temporal.circularHourStats(e)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val (_, _, mh, r) = got("g")
    assert(mh < 0.01 || mh > 23.99, got("g").toString) // midnight, not 12
    assert(math.abs(r - math.cos(math.Pi / 12)) < 1e-3)
    assert(got("u")._4 < 1e-9) // antipodal hours cancel
  }

  test("bm25 k1 sweep: three complete top-10 lists, rank 1 stable here") {
    val got = graft.queries.ExtQueries.bm25SweepQ(spark, sf())
      .as[(Int, Int, Long, Double)].collect()
    assert(got.length == 30)
    assert(got.map(_._1).distinct.sorted.toList == List(9, 12, 15))
    got.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toList == (1 to 10).toList)
      // scores non-increasing down each list
      val sc = g.sortBy(_._2).map(_._4)
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
  }

  test("charClassCensus: fractions partition the char mass exactly") {
    val docs = Seq((1L, "ab 12!", "s")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.charClassCensus(docs)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    // 6 chars: 2 alpha, 2 digit, 1 space, 1 other
    assert(got == (("s", 6L,
      math.rint(2.0 / 6 * 10000) / 10000, math.rint(2.0 / 6 * 10000) / 10000,
      math.rint(1.0 / 6 * 10000) / 10000, math.rint(1.0 / 6 * 10000) / 10000)))
  }

  test("boilerplateTokens surfaces a planted header above organic tokens") {
    val docs = (1L to 20L).map(i => (i, s"HEADER body$i tail$i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateTokens(docs)
      .as[(String, Int, String, Long, Double)].collect()
    val first = got.filter(_._1 == "first")
    assert(first.head._3 == "HEADER" && first.head._4 == 20L && first.head._5 == 1.0)
    val last = got.filter(_._1 == "last")
    assert(last.forall(_._4 == 1L)) // tails are all distinct
  }

  test("userTypeEntropy: single-type bot at 0, uniform user at ln k") {
    val e = Seq(
      (1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "a"),        // bot
      (4L, 2L, "a"), (5L, 2L, "b"), (6L, 2L, "c")         // diverse
    ).toDF("event_id", "user_id", "event_type")
    val got = Temporal.userTypeEntropy(e)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(got(1L) == 0.0)
    assert(got(2L) == math.rint(math.log(3.0) * 10000) / 10000)
  }

  test("weeklyShareDrift: shares sum to 1 per week; planted shift shows in max_swing") {
    // week 0: a=3 b=1; week 1: a=1 b=3 -> a share swings .75 -> .25
    val e = Seq(
      (1L, ts(0), "a"), (2L, ts(10), "a"), (3L, ts(20), "a"), (4L, ts(30), "b"),
      (5L, ts(604800), "a"), (6L, ts(604810), "b"), (7L, ts(604820), "b"),
      (8L, ts(604830), "b")
    ).toDF("event_id", "ts", "event_type")
    val got = Temporal.weeklyShareDrift(e)
      .as[(Long, String, Long, Double, Double)].collect()
    assert(got.groupBy(_._1).values.forall(w => math.abs(w.map(_._4).sum - 1.0) < 1e-9))
    assert(got.forall(_._5 == 0.5)) // both types swing .75 <-> .25
  }

  test("newVsReturning: first day all new, later days split exactly") {
    val e = Seq(
      (1L, ts(0), 1L), (2L, ts(10), 2L),                  // day 0: both new
      (3L, ts(86400), 1L), (4L, ts(86410), 3L)            // day 1: 1 returns, 3 new
    ).toDF("event_id", "ts", "user_id")
    val got = Temporal.newVsReturning(e)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 2L, 2L, 0L, 1.0)))
    assert(got(1L) == ((1L, 2L, 1L, 1L, 0.5)))
  }

  test("streaming dedup of a doubled feed reproduces the events table") {
    val got = graft.queries.ExtQueries.streamDedupQ(spark, sf())
    val want = graft.Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 4).as("value"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }
}
