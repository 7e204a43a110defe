package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training and application (the SentencePiece
  * family — Kudo 2018 — complementing [[Bpe]]'s merge-list family):
  * pieces carry probabilities, a word's tokenization is the max-likelihood
  * segmentation under those probabilities, and training alternates
  * Viterbi re-segmentation (hard EM) with count renormalization while
  * pruning the lowest-probability pieces toward a target vocabulary.
  *
  * Scale shape, same doctrine as [[Bpe]]: every expensive step runs over
  * the V-row WORD HISTOGRAM, never the token stream — the corpus is
  * touched exactly once (the word-count shuffle). Per EM iteration: one
  * mapPartitions sweep over the histogram (each word's Viterbi is a tiny
  * O(len·maxPieceLen) DP against a broadcast piece table) and one
  * piece-keyed count aggregation, both partial-aggregated. The piece
  * table is ≤ seedSize rows — megabytes — so broadcast is the right
  * plan at any corpus size. mapPartitions is used deliberately here:
  * per-word Viterbi is genuine imperative per-row logic with no
  * declarative form that wouldn't be a recursive-CTE contortion
  * (SURVEY §2.1 preference (d)); everything corpus-sized stays
  * declarative around it.
  *
  * Determinism: no RNG anywhere. Seed ranking ties break on piece string;
  * Viterbi ties prefer the LONGER last piece (fewest-pieces bias), then
  * the lexicographically smaller piece; hard-EM counts are integral
  * (word-frequency-weighted), so M-step probabilities are exact rationals
  * evaluated identically on every run — two trains on the same corpus are
  * byte-equal, which UnigramSpec asserts.
  */
object Unigram {

  /** Trained model: (piece, logp), single-char pieces never pruned so any
    * in-vocabulary-alphabet word always segments. */
  final case class Model(pieces: Map[String, Double]) {
    /** Max-likelihood segmentation; characters outside the alphabet fall
      * back to a per-char UNK penalty so encode totalizes over any input. */
    def segment(word: String, maxLen: Int = Unigram.MaxPieceLen): Seq[String] = {
      val n = word.length
      if (n == 0) return Seq.empty
      // dp(i): best (score, pieceLenEndingHere) for prefix of length i
      val score = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = new Array[Int](n + 1)
      score(0) = 0.0
      var i = 1
      while (i <= n) {
        var l = 1
        val lmax = math.min(maxLen, i)
        while (l <= lmax) {
          val p = word.substring(i - l, i)
          val lp = pieces.getOrElse(p, if (l == 1) UnkLogProb else Double.NegativeInfinity)
          val cand = score(i - l) + lp
          // strictly-greater keeps the SMALLEST l on ties scanned first?
          // No: scan l ascending, replace on >=, so the LONGEST feasible
          // piece wins ties — the fewest-pieces bias, deterministically.
          if (cand >= score(i)) { score(i) = cand; back(i) = l }
          l += 1
        }
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var j = n
      while (j > 0) { out += word.substring(j - back(j), j); j -= back(j) }
      out.reverse.toSeq
    }
  }

  val MaxPieceLen = 6
  val UnkLogProb: Double = -1e3 // per unknown char; dominates any real piece

  /** Seed vocabulary over the word histogram: every substring of length
    * ≤ maxLen of every distinct word, frequency-weighted by the word's
    * corpus count (one count per occurrence position), ranked
    * (weight desc, piece asc). ALL single characters are kept
    * unconditionally (coverage floor); multi-char pieces fill the
    * remaining seedSize slots. In-row substring fan-out + one piece-keyed
    * aggregation — bounded by the histogram, not the corpus. */
  def seedVocab(words: DataFrame, seedSize: Int, maxLen: Int = MaxPieceLen): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val subs = words.select(col("c"), explode(expr(
      s"""flatten(transform(sequence(0, length(tok) - 1), i ->
         |  transform(sequence(1, least($maxLen, length(tok) - i)), l ->
         |    substring(tok, i + 1, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("c")).as("n"))
    val chars = subs.where(length(col("piece")) === 1)
    val multi = subs.where(length(col("piece")) > 1)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n").desc, col("piece"))))
      .where(col("rk") <= seedSize).drop("rk")
    chars.unionByName(multi)
  }

  /** One hard-EM iteration: Viterbi-resegment every histogram word under
    * the broadcast model, emit frequency-weighted piece counts. Unused
    * single-char pieces keep a floor count of 1 (alphabet coverage);
    * unused multi-char pieces die (count 0 → dropped by the caller's
    * renormalization). */
  private def viterbiCounts(spark: SparkSession, words: DataFrame,
      model: Model, maxLen: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    words.select(col("tok"), col("c")).as[(String, Long)]
      .mapPartitions { it =>
        it.flatMap { case (w, c) =>
          bc.value.segment(w, maxLen).iterator.map(p => (p, c))
        }
      }
      .toDF("piece", "cnt")
      .groupBy("piece").agg(sum(col("cnt")).as("n"))
  }

  /** Train: seed → iters × (Viterbi E-step, renormalize M-step, prune
    * multi-char tail toward vocabSize by keep = max(vocabSize·charSlackᶜ…)
    * — concretely keep the top max(vocabSize, ⌈0.75·current⌉) pieces each
    * round, single chars exempt). Returns (piece, logp) with natural-log
    * probabilities normalized over the surviving vocabulary. */
  def train(docs: DataFrame, vocabSize: Int = 512, iters: Int = 4,
      seedSize: Int = 4096, maxLen: Int = MaxPieceLen): DataFrame = {
    require(vocabSize >= 1 && iters >= 1)
    val spark = docs.sparkSession
    val words = Bpe.wordFreq(docs).localCheckpoint(true)
    var vocab = seedVocab(words, seedSize, maxLen).localCheckpoint(true)
    // empty corpus → empty model (SUM over zero rows is NULL, and there
    // is nothing to segment) — same schema, no EM
    if (vocab.isEmpty) return vocab.select(col("piece"), lit(0.0).as("logp"))
    var it = 0
    while (it < iters) {
      // ONE driver pull per round: the collected rows give the model,
      // the normalizer AND the prune budget (this loop previously ran a
      // separate agg(sum) and count() job per round on top of the
      // collect — 4 driver actions where 1 suffices; the vocab is
      // seedSize-bounded so the pull is small by construction)
      val rows = vocab.collect()
      val total = rows.map(_.getLong(1)).sum.toDouble
      val model = Model(rows
        .map(r => r.getString(0) -> math.log(r.getLong(1) / total)).toMap)
      val counts = viterbiCounts(spark, words, model, maxLen)
      // coverage floor: alphabet chars survive with count 1 even if the
      // Viterbi never chose them stand-alone this round
      val floored = vocab.where(length(col("piece")) === 1)
        .select(col("piece"), lit(1L).as("n"))
        .unionByName(counts)
        .groupBy("piece").agg(max(col("n")).as("n"))
      // prune multi-char tail toward vocabSize (chars exempt)
      val keep = math.max(vocabSize,
        math.ceil(rows.length * 0.75).toInt)
      import org.apache.spark.sql.expressions.Window
      val pruned = floored.where(length(col("piece")) === 1)
        .unionByName(floored.where(length(col("piece")) > 1)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n").desc, col("piece"))))
          .where(col("rk") <= keep).drop("rk"))
      vocab = pruned.localCheckpoint(true)
      it += 1
    }
    val total = vocab.agg(sum("n")).head().getLong(0).toDouble
    vocab.select(col("piece"), log(col("n") / total).as("logp"))
  }

  /** Materialize a trained (piece, logp) table as a broadcastable model. */
  def toModel(vocab: DataFrame): Model =
    Model(vocab.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)

  /** Encode a corpus under a frozen model: each DISTINCT word segments
    * once (histogram-level Viterbi, same mapPartitions shape as
    * training), then the per-word encoding joins back to the token
    * stream broadcast-side and reassembles per doc in token order.
    * Output: (doc_id, n_tokens, n_pieces, encoded) — `encoded` the
    * space-joined piece stream with `▁`-style word boundaries kept as
    * plain spaces (pieces never contain spaces, so the doc-level join
    * with " " is lossless). */
  def encode(docs: DataFrame, vocab: DataFrame, maxLen: Int = MaxPieceLen): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val model = toModel(vocab)
    val bc = spark.sparkContext.broadcast(model)
    val words = Bpe.wordFreq(docs).select(col("tok")).as[String]
    val wordEnc = words.mapPartitions { it =>
      val m = bc.value
      it.map { w =>
        val ps = m.segment(w, maxLen)
        (w, ps.mkString(" "), ps.length)
      }
    }.toDF("tok", "enc", "np")
    Dedup.spreadForCompute(docs)
      .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
      .join(broadcast(wordEnc), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("np")).as("n_pieces"),
        array_join(transform(array_sort(collect_list(
          struct(col("pos"), col("enc")))), s => s.getField("enc")), " ").as("encoded"))
  }
}
