package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: every operator must return an empty (or
  * well-defined) result on empty/minimal input, never throw — the
  * property that keeps a 100 TB pipeline from dying on one empty
  * partition, source, or filtered-out stratum. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val oneDoc = Seq((1L, "solo")).toDF("doc_id", "text")
  private val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
    .toDF("event_id", "ts", "user_id", "value")

  test("text/dedup operators return empty on empty docs") {
    assert(Dedup.exactDupGroups(noDocs).count() == 0)
    assert(Dedup.keepCanonical(noDocs).count() == 0)
    assert(Dedup.minhashCandidates(noDocs).count() == 0)
    assert(Dedup.simhashes(noDocs).count() == 0)
    assert(TextAnalysis.tfIdf(noDocs).count() == 0)
    assert(TextAnalysis.ngramCounts(noDocs).count() == 0)
    assert(TextAnalysis.repetitionMetrics(noDocs).count() == 0)
    assert(TextAnalysis.hashSplit(noDocs).count() == 0)
    assert(TextAnalysis.stratifiedSample(noDocs.withColumn("lang", lit("en")), "lang", 10).count() == 0)
    assert(TextAnalysis.cleanCorpus(noDocs).count() == 0)
  }

  test("single-doc corpus flows through every text operator") {
    assert(Dedup.keepCanonical(oneDoc).count() == 1)
    assert(TextAnalysis.tfIdf(oneDoc).count() == 1) // tf=1, idf=ln(1)=0
    assert(TextAnalysis.ngramCounts(oneDoc).count() == 0) // <2 tokens
    val rep = TextAnalysis.repetitionMetrics(oneDoc).collect()(0)
    assert(rep.getLong(1) == 1 && rep.isNullAt(3)) // n_toks=1, no bigram
    assert(TextAnalysis.cleanCorpus(oneDoc).count() == 0) // fails min-token gate
  }

  test("temporal operators handle empty sides") {
    val oneEvent = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    // empty right: every left row survives with null payload
    val a = Temporal.asofJoin(oneEvent, noEvents.select("user_id", "ts", "event_id"),
      "user_id", "ts", Seq("event_id"))
    assert(a.count() == 1 && a.where(col("matched_event_id").isNull).count() == 1)
    // empty left: empty result
    assert(Temporal.asofJoin(noEvents, oneEvent.select("user_id", "ts", "event_id"),
      "user_id", "ts", Seq("event_id")).count() == 0)
    assert(Temporal.sessionize(noEvents).count() == 0)
    assert(Temporal.sessionAgg(oneEvent).count() == 1)
    assert(Temporal.intervalJoin(oneEvent,
      noEvents.toDF("eid2", "ts2", "user_id", "v2"), "user_id", "ts", "ts2", 60L).count() == 0)
  }

  test("similarity operators handle empty and single-vector inputs") {
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val oneVec = Seq((0L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.cosinePairsTopK(noVecs, 5).count() == 0)
    assert(Similarity.cosinePairsTopK(oneVec, 5).count() == 0) // no pairs
    assert(Similarity.lshCandidatePairs(oneVec, 4, 2, 8, 1L).count() == 0)
    assert(Similarity.annTopK(oneVec, oneVec, 3).count() == 0) // self excluded
    assert(Similarity.ivfTopK(oneVec, oneVec, 3, nlist = 1, nprobe = 1).count() == 0)
  }

  test("brute-pairwise eval harnesses fail fast above the bounded-eval ceiling") {
    // the n² evals broadcast the full table; above the bound the right
    // outcome is an immediate named error, not an executor OOM
    val big = spark.range(65537)
      .select(col("id").as("vec_id"), (col("id") % 10).as("label"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    for (op <- Seq[org.apache.spark.sql.DataFrame => Any](
        df => Similarity.knnLabelEval(df),
        df => Similarity.silhouette(df),
        df => Similarity.dunnIndex(df))) {
      val e = intercept[IllegalArgumentException](op(big))
      assert(e.getMessage.contains("bounded at"), e.getMessage)
    }
    // at-bound inputs are accepted (the require is <=, not <):
    // a tiny labeled set flows through and scores
    val small = spark.range(6)
      .select(col("id").as("vec_id"), (col("id") % 2).as("label"),
        array((col("id") % 2).cast("float"), lit(1.0f)).as("embedding"))
    assert(Similarity.knnLabelEval(small, k = 2).count() == 2)
  }

  test("round-3 operators handle empty and degenerate inputs") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val noEvents = Seq.empty[(Long, Long, Double)].toDF("user_id", "event_id", "value")
    assert(Graph.pageRank(noPairs).count() == 0)
    assert(Graph.pageRankDistributed(noPairs, 2, 0.85).count() == 0)
    assert(TextAnalysis.importanceWeights(noDocs,
      org.apache.spark.sql.functions.col("doc_id") > 0).count() == 0)
    assert(TextAnalysis.negativeSample(noDocs).count() == 0)
    assert(TextAnalysis.negativeSample(Seq((1L, "only")).toDF("doc_id", "text"))
      .count() == 0) // singleton ring emits nothing
    assert(TextAnalysis.tokenEntropy(noDocs).count() == 0)
    assert(TextAnalysis.skipgramPairs(Seq((1L, "one")).toDF("doc_id", "text"))
      .count() == 0) // no pair within window
    assert(TextAnalysis.bpePairCounts(Seq((1L, "a")).toDF("doc_id", "text"))
      .count() == 0) // single-char word has no pair
    assert(Temporal.ewma(noEvents).count() == 0)
    assert(Sketches.quantilesOf(noEvents,
      org.apache.spark.sql.functions.col("value"), 64, Seq(0.5)).count() == 0)
    assert(Dedup.keepNearDupCanonical(noDocs, noPairs).count() == 0)
  }

  test("round-6 operators handle empty and degenerate inputs") {
    val noDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextAnalysis.nbClassify(noDocs).count() == 0)
    // single class: every doc classifies to it, prior ln(1) = 0 rides along
    val one = TextAnalysis.nbClassify(
      Seq((1L, "x y", "only"), (2L, "", "only")).toDF("doc_id", "text", "source"))
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(one == Map(1L -> "only", 2L -> "only"))
    // profile of an empty frame: no rows reach the aggregate → empty report
    assert(Profile.profile(noDocs, Seq("doc_id", "text")).count() == 0)
    // all-null column: n_null = n, zero distincts, NULL range
    val allNull = Seq((1L, None: Option[String]), (2L, None)).toDF("id", "s")
    val p = Profile.profile(allNull, Seq("s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(p == ("s", 2L, 2L, 0L, None, None))
  }

  test("session-3 operators handle empty and degenerate inputs") {
    // scd2 on empty / single-row changelogs
    val noChg = Seq.empty[(Long, Long, java.sql.Timestamp, String)]
      .toDF("k", "id", "t", "st")
    assert(Temporal.scd2(noChg, "k", "st", "t", "id").count() == 0)
    val one = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "A"))
      .toDF("k", "id", "t", "st")
    val r = Temporal.scd2(one, "k", "st", "t", "id")
      .as[(Long, Int, String, java.sql.Timestamp, Option[java.sql.Timestamp], Long)]
      .head()
    assert(r._2 == 1 && r._5.isEmpty && r._6 == 1L)
    // blocklist: empty phrase list is a hard error; empty docs flow through
    intercept[IllegalArgumentException] { Blocklist.filterReport(noDocs, Seq.empty) }
    assert(Blocklist.filterReport(noDocs, Seq("x")).count() == 0)
    assert(Blocklist.filterReport(noDocs, Seq("x"), acThreshold = 0).count() == 0)
    // ks drift: empty input → empty typed frame; single group still works
    val noEv = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Drift.ksDrift(noEv, "g", "v").count() == 0)
    val oneG = Drift.ksDrift(Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v"), "g", "v")
      .as[(String, Double, Double)].head()
    assert(oneG._2 == 0.0) // a group IS the pool → zero drift
    // table diff: both sides empty / one side empty
    val noKv = Seq.empty[(Long, String)].toDF("k", "s")
    assert(Incremental.tableDiff(noKv, noKv, "k", Seq("s")).count() == 0)
    val oneKv = Seq((1L, "x")).toDF("k", "s")
    assert(Incremental.tableDiff(noKv, oneKv, "k", Seq("s"))
      .as[(Long, String)].head() == ((1L, "added")))
    // hll: empty occurrence stream → no registers, no estimates
    assert(Sketches.hllRegisters(noDocs.withColumnRenamed("text", "sh"),
      "doc_id", col("sh")).count() == 0)
    // linear probe: empty frame is a hard error (n = 0)
    intercept[IllegalArgumentException] {
      LinearModel.trainLinearProbe(Seq.empty[(Double, Double)].toDF("x", "y"),
        Seq("x"), "y", 0.5, 1)
    }
    // auc: empty input → empty frame
    assert(LinearModel.auc(Seq.empty[(String, Double, Double)].toDF("g", "s", "y"),
      "s", "y", "g").count() == 0)
    // jaro-winkler pairs: empty and single-doc corpora produce no pairs
    assert(Dedup.jaroWinklerPairs(noDocs).count() == 0)
    assert(Dedup.jaroWinklerPairs(oneDoc).count() == 0)
  }

  test("session-2 operators handle empty and degenerate inputs") {
    val noSrc = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(Dedup.containmentJoin(noDocs).count() == 0)
    assert(Dedup.containmentJoin(oneDoc).count() == 0) // "solo" < 3 tokens: no shingles
    assert(Dedup.sourceOverlap(noSrc).count() == 0)
    assert(Dedup.sourceOverlapKMV(noSrc).count() == 0)
    // one source: no pairs, not a crash
    val single = Seq((1L, "a b c d e", "s0"), (2L, "a b c q r", "s0"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.sourceOverlap(single).count() == 0)
    assert(Dedup.sourceOverlapKMV(single).count() == 0)
    // canonical form of whitespace/punct-only text is empty, not a throw;
    // the two degenerate docs COLLIDE into one normalized group
    val junk = Seq((1L, "  !!!  "), (2L, "...")).toDF("doc_id", "text")
    val norm = TextAnalysis.normalizeText(junk)
      .as[(Long, String, Int)].collect().toSeq.sortBy(_._1)
    assert(norm == Seq((1L, "", 0), (2L, "", 0)), norm.toString)
    assert(TextAnalysis.dedupNormalized(junk)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
    assert(TextAnalysis.dedupNormalized(noDocs).count() == 0)
    // unigram: empty corpus trains nothing and encodes nothing
    assert(Unigram.train(noDocs, vocabSize = 8, iters = 1, seedSize = 16).count() == 0)
    val v = Unigram.train(oneDoc, vocabSize = 8, iters = 2, seedSize = 16)
    assert(Unigram.encode(noDocs, v).count() == 0)
    // empty-embedding frame projects to nothing
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.randomProjection(noVecs).count() == 0)
  }

  test("session-4 event analytics return empty on empty events") {
    val ev = noEvents.withColumn("event_type", lit("view"))
      .where(lit(false)) // keep schema, zero rows
    assert(Temporal.cohortRetention(ev).count() == 0)
    assert(Temporal.eventTransitions(ev).count() == 0)
    assert(Temporal.madOutliers(ev).count() == 0)
    assert(Temporal.rfmSegments(ev).count() == 0)
    assert(Temporal.valueHistogram(ev).count() == 0)
    // transitionEntropy's __all__ row aggregates zero groups → stays empty
    assert(Temporal.transitionEntropy(ev).where(col("n").isNotNull).count() == 0)
    val right = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("user_id", "ts", "pid")
    assert(Temporal.nearestJoin(ev.select("event_id", "user_id", "ts"), right,
      "user_id", "ts", Seq("pid"), 3600L).count() == 0)
  }

  test("session-4 text analytics survive empty and single-doc corpora") {
    assert(SuffixArray.suffixRanks(noDocs).count() == 0)
    assert(SuffixArray.longestRepeats(noDocs).count() == 0)
    assert(Dedup.sortedNeighborhoodPairs(noDocs).count() == 0)
    assert(Dedup.sortedNeighborhoodPairs(oneDoc).count() == 0)
    val withMeta = noDocs.withColumn("source", lit("a"))
      .withColumn("n_chars", lit(1L))
    assert(TextAnalysis.umassCoherence(withMeta).count() == 0)
    assert(Drift.welchVsRest(withMeta).count() == 0)
    // zipf on an empty corpus: one all-aggregate row, null-safe fields
    val z = TextAnalysis.zipfFit(noDocs).collect()
    assert(z.length == 1 && z.head.getLong(0) == 0L)
    // single doc still ranks its own suffixes
    assert(SuffixArray.suffixRanks(oneDoc).count() == 4)
  }
}
