package graft.lda

import java.nio.file.{Files, Paths}
import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("readPldaText parses the README worked example and skips comments") {
    // canonical example from /root/reference/README.md:53-58
    val dir = Files.createTempDirectory("corpus")
    val path = dir.resolve("t.txt")
    Files.write(path, "# header\na 2 is 1 character 1\n\na 2 is 1 b 1 character 1 after 1\n".getBytes)
    val bow = Corpus.readPldaText(spark, path.toString)
      .orderBy("doc_id", "tok")
      .as[(Long, String, Int)].collect()
    // doc ids are line numbers (comment+empty lines keep their number but emit nothing)
    assert(bow.toSet == Set(
      (1L, "a", 2), (1L, "character", 1), (1L, "is", 1),
      (3L, "a", 2), (3L, "after", 1), (3L, "b", 1), (3L, "character", 1), (3L, "is", 1)))
  }

  test("sortedVocab assigns lexicographic dense ids (V2)") {
    val toks = Seq((0L, "pear"), (0L, "apple"), (1L, "pear"), (1L, "zed")).toDF("doc_id", "tok")
    val v = Corpus.sortedVocab(toks).orderBy("word_id").as[(String, Int)].collect()
    assert(v.sameElements(Array(("apple", 0), ("pear", 1), ("zed", 2))))
  }

  test("default sortedVocab (zipWithIndex path) equals the windowed parity form on real data") {
    val toks = graft.Tables.docsTokenized(spark, sf())
    val a = Corpus.sortedVocabWindowed(toks).as[(String, Int)].collect().toSet
    val b = Corpus.sortedVocab(toks.repartition(7)).as[(String, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("default sortedVocab matches Spark SQL collation for supplementary-plane tokens") {
    // U+1F600 (surrogate pair, sorts low in UTF-16 code units) vs U+FFFD:
    // UTF-8/code-point order puts the emoji ABOVE U+FFFD; a Java natural
    // String sort would swap them
    val toks = Seq((0L, "😀"), (0L, "�"), (1L, "plain"))
      .toDF("doc_id", "tok")
    val a = Corpus.sortedVocabWindowed(toks).as[(String, Int)].collect().toMap
    val b = Corpus.sortedVocab(toks).as[(String, Int)].collect().toMap
    assert(a == b, s"window=$a zip=$b")
    assert(a("plain") == 0 && a("�") == 1 && a("😀") == 2)
  }

  test("firstSeenVocab assigns ids in first-appearance order (V1)") {
    val toks = Seq((0L, 0, "pear"), (0L, 1, "apple"), (1L, 0, "apple"), (1L, 1, "zed"))
      .toDF("doc_id", "pos", "tok")
    val v = Corpus.firstSeenVocab(toks).orderBy("word_id").as[(String, Int)].collect()
    assert(v.sameElements(Array(("pear", 0), ("apple", 1), ("zed", 2))))
  }

  test("bagOfWords drops OOV tokens (semi-join semantics of infer.cc:77-80)") {
    val toks = Seq((0L, "a"), (0L, "oov"), (0L, "a")).toDF("doc_id", "tok")
    val vocab = Seq(("a", 0)).toDF("tok", "word_id")
    val bow = Corpus.bagOfWords(toks, vocab).as[(Long, Int, Long)].collect()
    assert(bow.sameElements(Array((0L, 0, 2L))))
  }

  test("fromDocuments end-to-end builds a partition-independent corpus") {
    val docs = Seq((0L, "b a a "), (1L, "c b ")).toDF("doc_id", "text")
    val (corpus, vocab) = Corpus.fromDocuments(docs, numTopics = 3, seed = 5L)
    assert(vocab.count() == 3)
    val states = corpus.collect().sortBy(_.docId)
    assert(states(0).wordIds.sameElements(Array(0, 1))) // a, b sorted
    assert(states(0).offsets.sameElements(Array(0, 2, 3)))
    val again = Corpus.fromDocuments(docs.repartition(3), 3, 5L)._1.collect().sortBy(_.docId)
    for ((x, y) <- states.zip(again)) {
      assert(x.wordIds.sameElements(y.wordIds))
      assert(x.topics.sameElements(y.topics)) // per-doc seeding
    }
  }

  test("readUci joins docword triples with 1-based vocab") {
    val dir = Files.createTempDirectory("uci")
    Files.write(dir.resolve("docword.txt"), "2\n3\n4\n1 1 2\n1 3 1\n2 2 5\n2 1 1\n".getBytes)
    Files.write(dir.resolve("vocab.txt"), "alpha\nbeta\ngamma\n".getBytes)
    val bow = Corpus.readUci(spark, dir.resolve("docword.txt").toString,
      dir.resolve("vocab.txt").toString).as[(Long, String, Int)].collect().toSet
    assert(bow == Set((1L, "alpha", 2), (1L, "gamma", 1), (2L, "beta", 5), (2L, "alpha", 1)))
  }
}
