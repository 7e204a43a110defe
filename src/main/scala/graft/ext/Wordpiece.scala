package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece-style tokenizer (the greedy longest-match-first family of
  * Schuster & Nakajima 2012 / Wu et al. 2016 — BERT's tokenizer),
  * completing this engine's tokenizer triple next to [[Bpe]] (merge-list
  * greedy) and [[Unigram]] (max-likelihood segmentation): a word is
  * consumed left to right, each step taking the LONGEST vocabulary piece
  * that matches the remaining prefix, continuation pieces rendered with
  * the `##` marker; a word with an uncoverable position collapses to
  * `[UNK]` whole (the BERT convention).
  *
  * The vocabulary here is frequency-mined rather than likelihood-trained
  * (the classic WordPiece trainer is a BPE-like merge loop; [[Bpe.train]]
  * already covers that family): word-INITIAL candidates are the corpus
  * words' prefixes (len 2..6), CONTINUATION candidates their interior
  * substrings (start ≥ 2, len 2..6), each weighted by corpus word
  * frequency, top-K per form by (weight desc, piece); all single
  * characters of each form are always kept, so any word of the training
  * corpus segments without UNK. Entirely deterministic — no RNG, integer
  * weights, total tie orders — so the build AND the greedy encode replay
  * exactly in SQL (the encode oracle is a recursive CTE whose
  * longest-match step is a NOT-EXISTS-longer-match join).
  *
  * Scale shape, same doctrine as [[Bpe]]/[[Unigram]]: every step runs on
  * the V-row word histogram — the corpus is touched once by the word
  * count; candidate generation is an in-row HOF explosion bounded by
  * 5·maxlen substrings per DISTINCT word; the piece table is ≤ 2K+Σ|Σ|
  * rows, broadcast; the greedy matcher is the one deliberate
  * mapPartitions (imperative per-word loop, SURVEY §2.1 preference (d)).
  */
object Wordpiece {

  val MaxPieceLen = 6
  private val MinFragLen = 2

  /** Corpus word histogram (tok, c) — the only corpus-sized job. */
  def wordFreq(docs: DataFrame): DataFrame = Bpe.wordFreq(docs)

  /** Frequency-mined piece table: (piece, cont 0|1, w). Top-`topK`
    * multi-char pieces per form plus every single character of each form
    * (coverage floor). Multi-char and single-char pools are disjoint by
    * length, so the union never double-counts. */
  def vocab(docs: DataFrame, topK: Int = 50): DataFrame = {
    val wf = wordFreq(docs).select(col("tok"), col("c"))
    // NB every sequence() below needs its length guard: Spark generates
    // DESCENDING sequences when start > stop (DuckDB's range is empty)
    // word-initial multi-char candidates: prefixes len 2..6
    val pref = wf.where(length(col("tok")) >= MinFragLen)
      .select(explode(transform(
        sequence(lit(MinFragLen), least(lit(MaxPieceLen), length(col("tok")))),
        l => col("tok").substr(lit(1), l))).as("piece"),
      col("c"))
    // interior multi-char candidates: substr(start >= 2, len 2..6);
    // start <= len-1 keeps the inner length bound >= 2
    val subs = wf.where(length(col("tok")) >= MinFragLen + 1)
      .select(col("tok"), col("c"),
        explode(sequence(lit(2), length(col("tok")) - 1)).as("s"))
      .select(col("c"), explode(transform(
          sequence(lit(MinFragLen),
            least(lit(MaxPieceLen), length(col("tok")) - col("s") + 1)),
          l => col("tok").substr(col("s"), l))).as("piece"))
    def top(cands: DataFrame, cont: Int): DataFrame =
      cands.groupBy("piece").agg(sum(col("c")).as("w"))
        .orderBy(col("w").desc, col("piece"))
        .limit(topK)
        .select(col("piece"), lit(cont).as("cont"), col("w"))
    // single-char coverage floor, weighted like the candidates
    val chi = wf.select(substring(col("tok"), 1, 1).as("piece"), col("c"))
      .groupBy("piece").agg(sum(col("c")).as("w"))
      .select(col("piece"), lit(0).as("cont"), col("w"))
    val chc = wf.where(length(col("tok")) >= 2)
      .select(col("c"), explode(sequence(lit(2), length(col("tok")))).as("s"),
        col("tok"))
      .select(col("tok").substr(col("s"), lit(1)).as("piece"), col("c"))
      .groupBy("piece").agg(sum(col("c")).as("w"))
      .select(col("piece"), lit(1).as("cont"), col("w"))
    top(pref, 0).unionAll(top(subs, 1)).unionAll(chi).unionAll(chc)
  }

  /** Greedy longest-match-first segmentation of every DISTINCT corpus
    * word under `vocabDf`: (tok, c, n_pieces, pieces) with continuation
    * pieces `##`-marked and space-joined; uncoverable words collapse to
    * the single piece `[UNK]`. The piece table broadcasts (vocab-bounded);
    * the match loop is per-word imperative — the one deliberate
    * mapPartitions, exactly [[Unigram]]'s justification. */
  def encode(docs: DataFrame, vocabDf: DataFrame): DataFrame = {
    val s = docs.sparkSession
    // (cont -> pieces) as length-descending match sets
    val pieces: Map[Int, Set[String]] = vocabDf.select("piece", "cont")
      .collect().groupBy(_.getInt(1)).view
      .mapValues(_.map(_.getString(0)).toSet).toMap
    val maxLen = pieces.values.flatten.map(_.length).maxOption.getOrElse(1)
    val bc = s.sparkContext.broadcast((pieces, maxLen))
    val wf = wordFreq(docs)
    val out = wf.select(col("tok"), col("c")).rdd.mapPartitions { it =>
      val (vs, ml) = bc.value
      val init = vs.getOrElse(0, Set.empty[String])
      val contSet = vs.getOrElse(1, Set.empty[String])
      it.map { r =>
        val tok = r.getString(0)
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        var dead = false
        while (pos < tok.length && !dead) {
          val set = if (pos == 0) init else contSet
          var l = math.min(ml, tok.length - pos)
          var hit: String = null
          while (l >= 1 && hit == null) {
            val cand = tok.substring(pos, pos + l)
            if (set.contains(cand)) hit = cand
            l -= 1
          }
          if (hit == null) dead = true
          else {
            acc += (if (pos == 0) hit else "##" + hit)
            pos += hit.length
          }
        }
        val ps = if (dead) Seq("[UNK]") else acc.toSeq
        Row(tok, r.getLong(1), ps.length, ps.mkString(" "))
      }
    }
    s.createDataFrame(out, StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("c", LongType, nullable = false),
      StructField("n_pieces", IntegerType, nullable = false),
      StructField("pieces", StringType, nullable = false))))
  }
}
