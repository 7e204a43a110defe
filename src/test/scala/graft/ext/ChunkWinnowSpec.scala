package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 text-pipeline operators: chunk windows, winnowing
  * fingerprints, edit-distance blocking. */
class ChunkWinnowSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("chunkWindows: hand-checked windows, stride overlap, short tail") {
    // 6 tokens, window 3, stride 2 -> chunks [a b c], [c d e], [e f]
    val d = docs((1L, "a b c d e f"))
    val got = TextAnalysis.chunkWindows(d, window = 3, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_toks", "h").as[(Int, Int, String)].collect()
    assert(got.map(c => (c._1, c._2)).toSeq == Seq((0, 3), (1, 3), (2, 2)))
    def h(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(got.map(_._3).toSeq == Seq(h("a b c"), h("c d e"), h("e f")))
  }

  test("chunkWindows: doc shorter than window yields one full-doc chunk; empty doc none") {
    val d = docs((1L, "x y"), (2L, " "))
    val got = TextAnalysis.chunkWindows(d, window = 64, stride = 32)
      .select("doc_id", "chunk_idx", "n_toks").as[(Long, Int, Int)].collect()
    assert(got.toSeq == Seq((1L, 0, 2)))
  }

  test("chunkWindows covers every token: union of chunk spans == doc tokens") {
    val text = (1 to 157).map(i => s"t$i").mkString(" ")
    val d = docs((1L, text))
    val n = TextAnalysis.chunkWindows(d, window = 64, stride = 32)
      .agg(max(col("chunk_idx")), sum(col("n_toks"))).as[(Int, Long)].head()
    // ceil((157-64)/32)+1 = 4 chunks at positions 0,32,64,96: 64+64+64+61
    assert(n._1 == 3 && n._2 == 64 + 64 + 64 + 61)
  }

  test("winnowing guarantee: docs sharing a run of >= k+w-1 tokens share a fingerprint") {
    val shared = "q w e r t y u i" // 8 tokens = k+w-1 for k=4, w=5
    val d = docs(
      (1L, s"one two three $shared alpha beta gamma delta epsilon"),
      (2L, s"nine eight seven $shared zeta eta theta iota kappa"),
      (3L, "no overlap here at all just other words padded further on"))
    val fp = TextAnalysis.winnowFingerprints(d, k = 4, w = 5)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fp(1L) & fp(2L)).nonEmpty)
    assert((fp(1L) & fp(3L)).isEmpty)
  }

  test("winnowing: docs shorter than k+w-1 tokens emit nothing; dedup within doc") {
    val d = docs((1L, "a b c d e f g"), // 7 tokens < 8
      (2L, ("a b c d " * 10).trim))    // heavy repetition -> few distinct fps
    val got = TextAnalysis.winnowFingerprints(d, k = 4, w = 5)
      .as[(Long, String)].collect()
    assert(!got.exists(_._1 == 1L))
    val fps = got.filter(_._1 == 2L).map(_._2)
    assert(fps.nonEmpty && fps.distinct.length == fps.length)
  }

  test("shuffleOrder is a permutation, seed-sensitive, and partitioning-invariant") {
    val d = graft.Tables.documents(spark, sf()).select("doc_id", "text")
    val a = TextAnalysis.shuffleOrder(d, seed = 7L, numPartitions = 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = TextAnalysis.shuffleOrder(d.repartition(11), seed = 7L, numPartitions = 5)
      .as[(Long, Long)].collect().sortBy(_._1)
    val c = TextAnalysis.shuffleOrder(d, seed = 8L, numPartitions = 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    val n = d.count()
    assert(a.map(_._2).sorted.toSeq == (0L until n).toSeq) // bijection onto 0..n-1
    assert(a.toSeq == b.toSeq)   // same seed: layout-independent
    assert(a.toSeq != c.toSeq)   // different seed: different permutation
  }

  test("sharedFingerprintPairs surfaces docs with a long common token run") {
    // docs 1 and 2 share a 16-token run (≥ k+w−1 = 8 tokens guarantees
    // ≥1 shared fingerprint; 16 tokens comfortably yields ≥2); doc 3 is
    // disjoint and must pair with nothing
    val boiler = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"
    val d = docs(
      (1L, "alpha beta gamma " + boiler),
      (2L, boiler + " delta epsilon zeta"),
      (3L, "totally different words with no overlap at all whatsoever in any fragment here"))
    val got = TextAnalysis.sharedFingerprintPairs(d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)), got.toString)
    assert(got.head._3 >= 2)
  }

  test("sortedNeighborhoodPairs links across block boundaries, within window only") {
    // docs 1/2 differ in the FIRST character — prefix blocking would
    // never pair them, but they sort adjacent; doc 3 is unrelated text
    // that separates from both; doc 4 is beyond the window of nothing
    val d = docs(
      (1L, "athe quick brown fox jumps over the lazy dog again and again"),
      (2L, "bthe quick brown fox jumps over the lazy dog again and again"),
      (3L, "zz completely unrelated content with other words entirely here"),
      (4L, "mm middling text that matches nothing else in this tiny corpus"))
    val got = Dedup.sortedNeighborhoodPairs(d, keyLen = 24, window = 3,
      prefixLen = 64, minSim = 0.9).as[(Long, Long, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)), got.mkString(","))
    assert(got.head._3 > 0.95)
  }

  test("sortedNeighborhoodPairs equals the naive rank-distance join") {
    val d = graft.Tables.documents(spark, sf()).select("doc_id", "text")
    val w = 5
    val got = Dedup.sortedNeighborhoodPairs(d, window = w, minSim = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    // naive: single-partition rank window + non-equi self-join — the
    // formulation the bucketed join must reproduce exactly
    import org.apache.spark.sql.expressions.Window
    val rk = d.select(col("doc_id"), substring(col("text"), 1, 24).as("k"),
        substring(col("text"), 1, 64).as("pre"))
      .withColumn("rk", row_number().over(Window.orderBy("k", "doc_id")))
    val a = rk.select(col("doc_id").as("doc_a"), col("pre").as("pre_a"), col("rk").as("ra"))
    val b = rk.select(col("doc_id").as("doc_b"), col("pre").as("pre_b"), col("rk").as("rb"))
    val naive = a.join(b, col("rb") > col("ra") && col("rb") <= col("ra") + (w - 1))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.JaroWinkler.jaroWinkler(col("pre_a"), col("pre_b")).as("raw"))
      .where(col("raw") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("raw"), 4).as("jw"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty) // the fixture's near-dup structure must surface
  }

  test("editDistancePairs finds planted same-prefix near-dups, ranked by distance") {
    val p = "PREFIX__" // 8-char blocking key
    val d = docs(
      (1L, p + "the quick brown fox jumps over the lazy dog"),
      (2L, p + "the quick brown fox jumps over the hazy dog"), // 1 edit
      (3L, p + "the quick brown cat sleeps under a warm tree"), // more edits
      (4L, "OTHER___ the quick brown fox jumps over the lazy dog")) // other block
    val got = Dedup.editDistancePairs(d, blockLen = 8, prefixLen = 64, topK = 10)
      .as[(Long, Long, Int)].collect()
    assert(got.head == ((1L, 2L, 1)))
    assert(got.forall(r => r._1 != 4L && r._2 != 4L)) // blocking excludes block-mismatched docs
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
