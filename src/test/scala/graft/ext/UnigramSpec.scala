package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("planted repeated word becomes a single piece; mixed words still segment") {
    // "ababab" (6 chars = MaxPieceLen) recurs 20x: the whole-word piece
    // dominates and Viterbi encodes each occurrence as ONE piece
    val d = docs((1L, ("ababab " * 20).trim), (2L, "xy xy zq"))
    val vocab = Unigram.train(d, vocabSize = 64, iters = 3, seedSize = 256)
    val pieces = vocab.as[(String, Double)].collect().toMap
    assert(pieces.contains("ababab"), pieces.keys.toSeq.sorted.toString)
    val enc = Unigram.encode(d, vocab).orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_pieces").as[(Long, Long, Long)].collect()
    assert(enc(0) == ((1L, 20L, 20L)), enc.toSeq.toString) // 1 piece/word
  }

  test("encode round-trips: pieces concatenate back to the original text") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the the the quick quick fox"))
    val vocab = Unigram.train(d, vocabSize = 32, iters = 2, seedSize = 128)
    val got = Unigram.encode(d, vocab)
      .select(col("doc_id"), regexp_replace(col("encoded"), " ", "").as("flat"))
      .as[(Long, String)].collect().toMap
    val want = Map(1L -> "thequickbrownfoxjumpsoverthelazydog",
      2L -> "packmyboxwithfivedozenliquorjugs",
      3L -> "thethethequickquickfox")
    assert(got == want, got.toString)
  }

  test("training is deterministic across runs") {
    val d = docs((1L, "alpha beta gamma alpha beta alpha"),
      (2L, "gamma gamma beta delta epsilon"))
    def run() = Unigram.train(d, vocabSize = 32, iters = 3, seedSize = 128)
      .as[(String, Double)].collect().toSeq.sortBy(_._1)
    assert(run() == run())
  }

  test("pruning shrinks the multi-char vocab; alphabet chars always survive") {
    val d = docs((1L, "abcde fghij klmno pqrst uvwxy abcde abcde fghij"))
    val seed = Unigram.seedVocab(Bpe.wordFreq(d), seedSize = 512)
    val vocab = Unigram.train(d, vocabSize = 8, iters = 5, seedSize = 512)
      .as[(String, Double)].collect()
    assert(vocab.length < seed.count(), s"no pruning: ${vocab.length}")
    val chars = "abcdefghijklmnopqrstuvwxy".map(_.toString).toSet
    assert(chars.subsetOf(vocab.map(_._1).toSet))
  }

  test("unknown characters at encode fall back to per-char UNK, never fail") {
    val d = docs((1L, "ab ab"))
    val vocab = Unigram.train(d, vocabSize = 8, iters = 2, seedSize = 32)
    val enc = Unigram.encode(docs((9L, "qq ab")), vocab)
      .select("doc_id", "n_pieces", "encoded").as[(Long, Long, String)]
      .collect().head
    assert(enc._1 == 9L && enc._3.endsWith("ab"), enc.toString)
    assert(enc._3.startsWith("q q"), enc.toString) // 'q' unseen → char fallback
  }

  test("training is partition-count invariant (mapPartitions sweep is per-word)") {
    val d = docs((1L, "alpha beta gamma alpha beta alpha"),
      (2L, "gamma gamma beta delta epsilon"), (3L, "beta beta alpha"))
    def run(parts: Int) = Unigram.train(d.repartition(parts),
        vocabSize = 32, iters = 3, seedSize = 128)
      .as[(String, Double)].collect().toSeq.sortBy(_._1)
    assert(run(1) == run(7))
  }

  test("compression: trained model uses fewer pieces than the char baseline") {
    val d = docs((1L, "alpha beta gamma alpha beta alpha gamma beta " * 3))
    val vocab = Unigram.train(d, vocabSize = 64, iters = 3, seedSize = 256)
    val enc = Unigram.encode(d, vocab)
      .select("n_tokens", "n_pieces").as[(Long, Long)].collect().head
    val nChars = d.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .head().getLong(0)
    assert(enc._2 < nChars, s"pieces ${enc._2} !< chars $nChars")
  }
}
