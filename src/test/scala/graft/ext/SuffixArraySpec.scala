package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  test("banana: the textbook suffix array") {
    val docs = Seq((1L, "banana")).toDF("doc_id", "text")
    val got = SuffixArray.suffixRanks(docs).as[(Long, Int, Long)]
      .collect().sortBy(_._2).map(_._3).toSeq
    // suffixes by pos: banana anana nana ana na a → ranks 3 2 5 1 4 0
    assert(got == Seq(3L, 2L, 5L, 1L, 4L, 0L))
  }

  test("identical suffixes across docs share a dense rank; empty docs drop") {
    val docs = Seq((1L, "ab"), (2L, "b"), (3L, "")).toDF("doc_id", "text")
    val got = SuffixArray.suffixRanks(docs).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 1, 0L), (1L, 2, 1L), (2L, 1, 1L)))
  }

  test("a shorter suffix sorts before every extension of it") {
    // "ba" suffixes: "ba"(1), "a"(2); "bab": "bab"(1), "ab"(2), "b"(3)
    // sorted: a < ab < b < ba < bab → dense 0..4
    val docs = Seq((1L, "ba"), (2L, "bab")).toDF("doc_id", "text")
    val got = SuffixArray.suffixRanks(docs).as[(Long, Int, Long)]
      .collect().map { case (d, p, r) => (d, p) -> r }.toMap
    assert(got == Map((1L, 1) -> 3L, (1L, 2) -> 0L,
      (2L, 1) -> 4L, (2L, 2) -> 1L, (2L, 3) -> 2L))
  }

  test("matches the brute-force dense rank over materialized suffixes") {
    val docs = graft.Tables.documents(spark, sf())
      .where(col("doc_id") % 5 === 0)
    val got = SuffixArray.suffixRanks(docs)
      .as[(Long, Int, Long)].collect().toSet
    // O(n²) reference: every suffix as a string, single-partition window
    // (test-scale only — exactly the form the operator exists to avoid)
    val brute = docs.where(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("pos"), col("text"))
      .select(col("doc_id"), col("pos"), expr("substring(text, pos)").as("sfx"))
      .withColumn("srank", (dense_rank().over(Window.orderBy("sfx")) - 1).cast("long"))
      .select(col("doc_id"), col("pos"), col("srank"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got.size == brute.size)
    assert(got == brute)
  }

  test("longestRepeats finds a planted cross-doc repeated substring") {
    // M occurs once in each doc; every other char is unique, so the top
    // repeat is exactly M. Rank-adjacent reps: doc 1's M-suffix ("...kl")
    // sorts below doc 2's ("...qr") — k < q — so the hit reports doc 1.
    val M = "zzqxvwzzqxvwzzqxvwzz" // 20 chars
    val docs = Seq((1L, "abcdefghij" + M + "kl"),
      (2L, "mnop" + M + "qr")).toDF("doc_id", "text")
    val top = SuffixArray.longestRepeats(docs, topK = 1)
      .as[(Long, Int, Long)].collect().head
    assert(top == ((1L, 11, 20L)))
  }

  test("longestRepeats: verbatim duplicate docs surface as whole-suffix ties") {
    val docs = Seq((1L, "abcabc"), (2L, "abcabc")).toDF("doc_id", "text")
    val top = SuffixArray.longestRepeats(docs, topK = 1)
      .as[(Long, Int, Long)].collect().head
    // the full text is duplicated: rank class of (1,1)/(2,1) has size 2
    assert(top == ((1L, 1, 6L)))
  }

  test("longestRepeats: top length matches brute force; every hit really repeats") {
    val docs = graft.Tables.documents(spark, sf())
      .where(col("doc_id") % 25 === 0)
    val got = SuffixArray.longestRepeats(docs, topK = 10)
      .as[(Long, Int, Long)].collect()
    // brute force: materialize + sort all suffixes, max adjacent LCP
    val texts = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    val sorted = texts.toSeq
      .flatMap { case (_, t) => (0 until t.length).map(i => t.substring(i)) }
      .sorted
    def lcp(a: String, b: String): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val bruteMax = sorted.sliding(2)
      .map { case Seq(a, b) => lcp(a, b) }.max
    assert(got.head._3 == bruteMax.toLong)
    // soundness: each reported substring occurs at ≥2 distinct positions
    val all = texts.values.toSeq
    got.foreach { case (d, p, len) =>
      val sub = texts(d).substring(p - 1, p - 1 + len.toInt)
      val occ = all.map { t =>
        Iterator.iterate(t.indexOf(sub))(i => t.indexOf(sub, i + 1))
          .takeWhile(_ >= 0).size
      }.sum
      assert(occ >= 2, s"($d,$p,$len) '$sub' occurs $occ time(s)")
    }
  }

  test("local tie resolution and the distributed doubling loop agree") {
    // budget 0 forces the at-scale distributed path; the default budget
    // takes the bounded local path on this corpus — both must produce
    // the same dense ranks (the planted dupes guarantee real ties)
    val docs = graft.Tables.documents(spark, sf())
      .where(col("doc_id") % 3 === 0)
    val local = SuffixArray.suffixRanks(docs)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val dist = SuffixArray.suffixRanks(docs, localTieBudgetBytes = 0L)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(local == dist)
  }

  test("suffix ranks are invariant to input partitioning") {
    val docs = graft.Tables.documents(spark, sf()).limit(60)
    val a = SuffixArray.suffixRanks(docs)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = SuffixArray.suffixRanks(docs.repartition(13))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
  }
}
