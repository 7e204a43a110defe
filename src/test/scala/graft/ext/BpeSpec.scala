package graft.ext

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("train: hand-computed merge sequence on a tiny corpus") {
    // corpus: "low low low lower" → wf: low×3, lower×1
    // pairs: (l,o)=4, (o,w)=4 → argmax tie → (l,o) wins on pair order
    // after merge1: 'lo w'×3, 'lo w e r'×1 → (lo,w)=4 wins
    // after merge2: 'low'×3, 'low e r' → (low,e)=1, (e,r)=1 → (e,r) wins
    //   on pair order ((e,r) < (low,e)), count tied at 1
    val (m, _) = Bpe.train(docs("low low low lower"), 3)
    assert(m == Seq((1, "l", "o", 4L), (2, "lo", "w", 4L), (3, "e", "r", 1L)))
  }

  test("train: left-to-right non-overlapping merge application (aaa case)") {
    // "aaa" with merge (a,a): greedy BPE yields (aa)(a), so the pair
    // (aa, a) must exist next round — (a, aa) must NOT
    val (m, v) = Bpe.train(docs("aaa aaa"), 2)
    assert(m(0) == ((1, "a", "a", 4L)))
    assert(m(1) == ((2, "aa", "a", 2L)))
    val words = v.select("w").as[String].collect().toSet
    assert(words == Set(" aaa "))
  }

  test("train: throws when the vocabulary exhausts pairs before numMerges") {
    intercept[IllegalArgumentException] {
      Bpe.train(docs("ab ab"), 5) // only 1 possible merge
    }
  }

  test("encode applies frozen merges; pieceCounts weights by frequency") {
    val (m, trained) = Bpe.train(docs("low low low lower"), 2)
    val enc = Bpe.encode(Bpe.wordFreq(docs("low low low lower")),
      m.map(t => (t._2, t._3)))
    assert(enc.orderBy("w").collect().toSeq ==
      trained.orderBy("w").collect().toSeq)
    val pieces = Bpe.pieceCounts(trained).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'low'×3 → low; 'lower'×1 → low e r
    assert(pieces == Map("low" -> 4L, "e" -> 1L, "r" -> 1L))
  }

  test("train is partition-invariant") {
    val d = (0L until 50L).map(i => (i, s"tok${i % 9} tok${i % 4} xy"))
      .toDF("doc_id", "text")
    val (a, _) = Bpe.train(d, 5)
    val (b, _) = Bpe.train(d.repartition(11), 5)
    assert(a == b)
  }
}
