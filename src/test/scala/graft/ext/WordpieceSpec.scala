package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("encode is greedy longest-match-first with ## continuations") {
    // topK=3 keeps prefixes ab/abc/abcd (weight 4) and drops abcdx
    // (weight 1), so 'abcdx' must greedily take 'abcd' then '##x'
    val docs = docsOf("abcd abcd abcd abcdx")
    val v = Wordpiece.vocab(docs, topK = 3)
    val got = Wordpiece.encode(docs, v)
      .as[(String, Long, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("abcd") == ((3L, 1, "abcd")))
    // greedy takes 'abcd' then the single-char continuation 'x'
    assert(got("abcdx") == ((1L, 2, "abcd ##x")))
  }

  test("words with uncoverable positions collapse to [UNK]") {
    val docs = docsOf("ab ab")
    val v = Wordpiece.vocab(docs, topK = 50)
    // encode a corpus containing a char the vocab never saw
    val foreign = docsOf("ab zq")
    val got = Wordpiece.encode(foreign, v)
      .as[(String, Long, Int, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got("ab") == "ab")
    assert(got("zq") == "[UNK]")
  }

  test("vocab keeps every single char of each form — corpus words never UNK") {
    val docs = graft.Tables.documents(spark, sf())
    val enc = Wordpiece.encode(docs, Wordpiece.vocab(docs))
    assert(enc.where(col("pieces") === "[UNK]").count() == 0)
    // reassembling the pieces (## stripped) reproduces every word
    val bad = enc.where(
      regexp_replace(col("pieces"), " ##| ", "") =!= col("tok")).count()
    assert(bad == 0, s"$bad words do not reassemble from their pieces")
  }

  test("multi-char pools are capped at topK; char floor always present") {
    val docs = graft.Tables.documents(spark, sf())
    val v = Wordpiece.vocab(docs, topK = 5).cache()
    assert(v.where(length(col("piece")) >= 2 && col("cont") === 0).count() <= 5)
    assert(v.where(length(col("piece")) >= 2 && col("cont") === 1).count() <= 5)
    // every distinct first char of the corpus vocabulary is an initial piece
    val firsts = Wordpiece.wordFreq(docs)
      .select(substring(col("tok"), 1, 1).as("piece")).distinct()
    val missing = firsts.join(
      v.where(col("cont") === 0 && length(col("piece")) === 1), Seq("piece"),
      "left_anti").count()
    assert(missing == 0)
    v.unpersist()
  }
}
