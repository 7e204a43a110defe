package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phrase-blocklist filtering — the C4/Gopher "bad phrase / boilerplate
  * list" pipeline stage: flag (and drop) documents containing any phrase
  * from a list. Matches are token-aligned (a phrase matches only at word
  * boundaries), so the single-token case degenerates to a dictionary
  * membership test and multi-token phrases behave like n-gram hits.
  *
  * Two physical paths with identical semantics:
  *  - small lists (≤ `acThreshold`): the phrases become a LITERAL array
  *    and matching is an in-row codegen'd higher-order `filter` +
  *    `contains` — zero shuffles, zero joins, the filter fuses into the
  *    scan's WholeStageCodegen span;
  *  - large lists: a broadcast Aho–Corasick automaton scanned once per
  *    document in `mapPartitions` — O(|text| + matches) per doc
  *    regardless of list size, where the contains-HOF would be
  *    O(|text| · |phrases|). The automaton is built once on the driver
  *    (list size is bounded by the blocklist file, not the corpus) and
  *    shipped read-only to every task.
  *
  * Either way the corpus is never shuffled: this is a projection, and at
  * 100 TB it runs scan-speed with the phrase list riding along as a
  * broadcast. */
object Blocklist {

  /** Token-boundary guard: the haystack gets a space on BOTH ends and
    * each needle is padded " p " — so "b c" matches in "a b c" but not
    * "ab c", and a phrase ending at the document's LAST token still
    * matches regardless of whether the text carries trailing
    * whitespace (matching must not depend on fixture formatting). */
  private def textPad(text: Column): Column =
    concat(lit(" "), text, lit(" "))
  private def phrasePad(p: String): String = " " + p + " "

  /** Per-doc blocklist report: `n_matched` (distinct phrases present) and
    * `kept` (1 iff no phrase matched). Output = `idCol`, n_matched, kept. */
  def filterReport(docs: DataFrame, phrases: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      acThreshold: Int = 64): DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    if (phrases.size <= acThreshold) {
      val arr = array(phrases.map(lit): _*)
      docs.select(col(idCol),
          size(filter(arr, p =>
            contains(textPad(col(textCol)), concat(lit(" "), p, lit(" ")))))
            .as("n_matched"))
        .withColumn("kept", when(col("n_matched") === 0, 1).otherwise(0))
    } else {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ac = AhoCorasick.build(phrases.map(phrasePad))
      val bc = docs.sparkSession.sparkContext.broadcast(ac)
      val prepared = docs.select(col(idCol), col(textCol))
      val idField = prepared.schema.head
      val out = prepared.rdd.mapPartitions { it =>
        val a = bc.value
        it.map { r =>
          val n = a.countDistinctMatches(" " + r.getString(1) + " ")
          Row(r.get(0), n, if (n == 0) 1 else 0)
        }
      }
      docs.sparkSession.createDataFrame(out, StructType(Seq(idField,
        StructField("n_matched", IntegerType, nullable = false),
        StructField("kept", IntegerType, nullable = false))))
    }
  }

  /** Corpus-mined boilerplate list: the `n` most frequent word bigrams
    * (ties broken lexicographically) — the "top repeated phrases ARE the
    * boilerplate" heuristic. TakeOrdered top-n (no global sort), then a
    * bounded driver pull of n strings. */
  def minedBigrams(docs: DataFrame, n: Int): Seq[String] =
    TextAnalysis.ngramCounts(docs, 2)
      .orderBy(col("c").desc, col("ngram"))
      .limit(n)
      .collect()
      .map(_.getString(0))
      .toSeq
}

/** Classic Aho–Corasick multi-pattern matcher over chars: goto/fail links
  * built breadth-first, outputs merged along fail chains. Built once,
  * immutable, serializable (broadcast to executors). */
final class AhoCorasick private (
    next: Array[scala.collection.immutable.Map[Char, Int]],
    fail: Array[Int],
    outCount: Array[Int],
    outHead: Array[Int], // first pattern id ending at this node, -1 if none
    outLink: Array[Int], // next node up the fail chain with output, -1 at end
    val nPatterns: Int) extends Serializable {

  /** Number of DISTINCT patterns occurring in `s` (each counted once no
    * matter how many positions it matches at). */
  def countDistinctMatches(s: String): Int = {
    if (nPatterns == 0) return 0
    val seen = new Array[Boolean](nPatterns)
    var found = 0
    var state = 0
    var i = 0
    while (i < s.length && found < nPatterns) {
      val c = s.charAt(i)
      while (state != 0 && !next(state).contains(c)) state = fail(state)
      state = next(state).getOrElse(c, 0)
      // walk the output chain: every pattern ending at this position
      var o = state
      while (o != -1 && found < nPatterns) {
        if (outCount(o) > 0) {
          val pid = outHead(o)
          if (!seen(pid)) { seen(pid) = true; found += 1 }
        }
        o = outLink(o)
      }
      i += 1
    }
    found
  }
}

object AhoCorasick {
  /** Build the automaton from literal patterns (duplicates collapse to
    * one id). BFS over the trie sets fail links and output chains. */
  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.distinct.toArray
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(-1) // pattern id per node
    pats.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        node = next(node).getOrElseUpdate(c, {
          next += scala.collection.mutable.Map.empty[Char, Int]
          ends += -1
          next.size - 1
        })
      }
      ends(node) = pid
    }
    val n = next.size
    val fail = new Array[Int](n)
    val outHead = Array.tabulate(n)(ends)
    val outCount = outHead.map(e => if (e >= 0) 1 else 0)
    val outLink = Array.fill(n)(-1)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      // output chain: nearest ancestor-via-fail that is itself an output
      outLink(u) = if (outCount(fail(u)) > 0) fail(u) else outLink(fail(u))
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        val cand = next(f).getOrElse(c, 0)
        fail(v) = if (cand != v) cand else 0 // depth-1 child would self-loop
        queue += v
      }
    }
    new AhoCorasick(next.map(_.toMap).toArray, fail, outCount, outHead,
      outLink, pats.length)
  }
}
