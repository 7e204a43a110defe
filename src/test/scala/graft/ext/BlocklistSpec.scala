package graft.ext

import graft.SparkSpec

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat "),
    (2L, "a thecat sat "),
    (3L, "clean text here "),
    (4L, "cat sat cat sat ")).toDF("doc_id", "text")

  test("matches are token-aligned: substrings inside a token never match") {
    val got = Blocklist.filterReport(docs, Seq("cat sat", "the"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2, 0)))  // both phrases, token-aligned
    assert(got(2L) == ((0, 1)))  // neither: "thecat" hides both boundaries
    assert(got(3L) == ((0, 1)))  // clean → kept
    assert(got(4L) == ((1, 0)))  // distinct phrases, not occurrences
  }

  test("phrase ending at the document's LAST token matches (no trailing ws)") {
    // texts deliberately carry NO trailing space — matching must not
    // depend on fixture formatting (both physical paths)
    val d = Seq((1L, "we hate spam"), (2L, "we hate spamX"),
      (3L, "hate spam is bad")).toDF("doc_id", "text")
    for (thr <- Seq(1000, 0)) {
      val got = Blocklist.filterReport(d, Seq("hate spam"), acThreshold = thr)
        .as[(Long, Int, Int)].collect().map(r => r._1 -> r._2).toMap
      assert(got == Map(1L -> 1, 2L -> 0, 3L -> 1), s"thr=$thr: $got")
    }
  }

  test("AC path == HOF path on the fixture corpus (forced thresholds)") {
    val d = graft.Tables.documents(spark, sf())
    val phrases = Blocklist.minedBigrams(d, 20)
    val hof = Blocklist.filterReport(d, phrases, acThreshold = 1000)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    val ac = Blocklist.filterReport(d, phrases, acThreshold = 0)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(hof.sameElements(ac))
    assert(hof.exists(_._2 > 0)) // the mined top bigrams DO occur
  }

  test("automaton: overlapping + suffix patterns all surface (fail-chain outputs)") {
    // " b c " is a suffix of " a b c " — only the fail/output chain finds both
    val ac = AhoCorasick.build(Seq(" a b c ", " b c ", " x "))
    assert(ac.countDistinctMatches(" a b c ") == 2)
    assert(ac.countDistinctMatches(" b c ") == 1)
    assert(ac.countDistinctMatches(" x a b c x ") == 3)
    assert(ac.countDistinctMatches(" q ") == 0)
    // distinct count: many occurrences of one pattern count once
    assert(ac.countDistinctMatches(" x x x ") == 1)
  }

  test("automaton: depth-1 self-loop guard and duplicate patterns") {
    val ac = AhoCorasick.build(Seq("aa", "aa", "ab"))
    assert(ac.nPatterns == 2)
    assert(ac.countDistinctMatches("aaab") == 2)
    assert(ac.countDistinctMatches("ba") == 0)
  }

  test("mined bigrams are (count desc, ngram asc) deterministic") {
    val d = graft.Tables.documents(spark, sf())
    val a = Blocklist.minedBigrams(d, 8)
    val b = Blocklist.minedBigrams(d.repartition(7), 8)
    assert(a == b)
    assert(a.size == 8)
  }
}
