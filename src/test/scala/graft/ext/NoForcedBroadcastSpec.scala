package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safety plan pins for the operators that used to FORCE a
  * `broadcast()` hint on a table whose cardinality grows with the corpus
  * (shingle-frequency table, bigram/trigram LM type tables, near-dup
  * non-rep set). A forced
  * broadcast is a guaranteed driver OOM at 100 TB and disables AQE's
  * runtime choice; these specs prove the shuffle path exists by planning
  * under `autoBroadcastJoinThreshold = -1` and asserting NO
  * BroadcastExchange appears — if someone re-adds a hint, the hint
  * overrides the threshold and the spec goes red. (AQE may still elect a
  * broadcast at fixture scale when the threshold is at its default —
  * that's the desired behavior, not a violation.) */
class NoForcedBroadcastSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val corpus = docs(
    (1L, "a b c d e f g h"),
    (2L, "a b c d e f g z"),
    (3L, "p q r s t u v w"),
    (4L, "p q r s t u v y"),
    (5L, "m n o a b c d e"))

  /** Plan (and run, so AQE's final plan is decided) with broadcast joins
    * disabled; return every plan string the run produced. */
  private def plansWithoutBroadcast(mk: => DataFrame): String = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = mk
      df.collect() // force AQE to finalize
      df.queryExecution.executedPlan.toString
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  private def assertNoBroadcast(tag: String)(mk: => DataFrame): Unit = {
    val plan = plansWithoutBroadcast(mk)
    assert(!plan.contains("BroadcastExchange"),
      s"$tag still forces a broadcast:\n$plan")
  }

  test("orderedShingleSets frequency join takes the shuffle path (no hint)") {
    assertNoBroadcast("orderedShingleSets") {
      Dedup.orderedShingleSetsPlan(corpus, 3)
    }
  }

  test("setSimilarityJoin end-to-end plans without BroadcastExchange") {
    assertNoBroadcast("setSimilarityJoin") {
      Dedup.setSimilarityJoin(corpus, t = 0.5)
    }
  }

  test("containmentJoin end-to-end plans without BroadcastExchange") {
    assertNoBroadcast("containmentJoin") {
      Dedup.containmentJoin(corpus, t = 0.8)
    }
  }

  test("keepNearDupCanonical anti-join takes the shuffle path (no hint)") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    assertNoBroadcast("keepNearDupCanonical") {
      Dedup.keepNearDupCanonical(corpus, pairs)
    }
    // semantics unchanged by the plan: reps 1 and 3 survive, 2 and 4 drop
    val kept = Dedup.keepNearDupCanonical(corpus, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("lmScore bigram-LM join takes the shuffle path (no hint)") {
    // lmScore legitimately KEEPS the broadcast hint on the V-bounded
    // unigram-context totals (joined on w1); what must not broadcast is
    // the bigram LM (joined on sh — bigram types grow with the corpus).
    val plan = plansWithoutBroadcast(TextAnalysis.lmScore(corpus))
    val shBroadcastJoin = "Broadcast\\w*Join \\[sh#".r
    assert(shBroadcastJoin.findFirstIn(plan).isEmpty,
      s"lmScore still forces the bigram-LM broadcast:\n$plan")
  }

  test("stupidBackoff n-gram-type joins take the shuffle path (no hint)") {
    // the unigram tables (c1 ×2, totals) keep their hints — vocab-bounded
    // by construction; the trigram (g3) and bigram (g12/g23) TYPE tables
    // grow with the corpus and must not carry one
    val plan = plansWithoutBroadcast(
      TextAnalysis.stupidBackoff(corpus, col("doc_id") <= 3))
    for (key <- Seq("sh", "w12", "w23")) {
      val r = ("Broadcast\\w*Join \\[" + key + "#").r
      assert(r.findFirstIn(plan).isEmpty,
        s"stupidBackoff still forces the $key n-gram-table broadcast:\n$plan")
    }
  }

  test("knBigramNll bigram-type join takes the shuffle path (no hint)") {
    // c1/cont (unigram-keyed regroups) keep their hints; the bigram TYPE
    // table c12 (joined on ew1, ew2) must not
    val plan = plansWithoutBroadcast(
      TextAnalysis.knBigramNll(corpus, col("doc_id") <= 3))
    // the c12 join is the only TWO-key (ew1, ew2) join; the single-key
    // ew1/ew2 joins are the legitimately-hinted unigram regroups
    val r = "Broadcast\\w*Join \\[ew1#\\d+, ew2#".r
    assert(r.findFirstIn(plan).isEmpty,
      s"knBigramNll still forces the bigram-type-table broadcast:\n$plan")
  }
}
