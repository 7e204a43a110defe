package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application over the corpus
  * word-frequency table — the full merge loop past
  * [[TextAnalysis.bpePairCounts]]' first-iteration statistics
  * (Sennrich et al. 2016).
  *
  * Representation: each distinct word rides as a space-delimited symbol
  * string with sentinel spaces (`" a b c "`), so applying merge (a, b) is
  * ONE literal `replace(w, " a b ", " ab ")` — single-pass left-to-right
  * non-overlapping, which is exactly BPE's greedy merge application
  * semantics (`" a a a "` merges to `" aa a "`, not `" a aa "`), and
  * identical in Spark and DuckDB, which is what makes the merge loop
  * fully hash-oracle-checkable (the classic implementations are
  * imperative; this form is engine-portable).
  *
  * Scale shape: everything runs over the V-row VOCABULARY, not the token
  * stream — corpus volume only ever feeds the one word-count shuffle.
  * Per merge: one V-row scan for weighted adjacent-pair counts (partial-
  * aggregated), a 1-row argmax collect, and a pure-map replace. The
  * working set is localCheckpointed once; `numMerges` stays in the
  * hundreds in practice, each step a tiny vocab-level job.
  */
object Bpe {

  /** Corpus word-frequency table: (tok, c). */
  def wordFreq(docs: DataFrame): DataFrame =
    Dedup.spreadForCompute(docs)
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))

  /** (tok, c) → (w, c) with w = " t o k " (one space-delimited symbol per
    * character, sentinel spaces both ends). */
  private def symbolized(words: DataFrame): DataFrame =
    words.select(
      concat(lit(" "), regexp_replace(col("tok"), "(.)", "$1 ")).as("w"),
      col("c"))

  /** Frequency-weighted adjacent-symbol pair counts of a working set. */
  private def pairCounts(v: DataFrame): DataFrame =
    v.select(col("c"), split(trim(col("w")), " ").as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("c"), explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("c")).as("n"))

  /** `numMerges` BPE merges over the corpus vocabulary. Returns the merge
    * table (step, a, b, n) — n the weighted pair count that won step —
    * and the final symbolized working set (w, c) with all merges applied.
    * Argmax tie order: count desc, then (a, b) in binary string order —
    * deterministic and engine-portable. Throws if the vocabulary runs out
    * of adjacent pairs before `numMerges` (the oracle unrolls exactly
    * `numMerges` CTEs, so a silent short train would diverge). */
  def train(docs: DataFrame, numMerges: Int = 10): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges >= 1, "numMerges must be positive")
    val base = symbolized(wordFreq(docs)).localCheckpoint(true)
    var v = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    while (step <= numMerges) {
      val top = pairCounts(v).orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      require(top.nonEmpty,
        s"vocabulary exhausted adjacent pairs at merge $step of $numMerges")
      val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((step, a, b, n))
      v = v.select(applyMerge(a, b), col("c"))
      step += 1
    }
    (merges.toSeq, v)
  }

  private def applyMerge(a: String, b: String) =
    replace(col("w"), lit(s" $a $b "), lit(s" $a$b ")).as("w")

  /** Apply an already-trained merge list to a word table (tok, c) —
    * tokenizer application decoupled from training (e.g. frozen merges,
    * new corpus slice). Pure map: the merge list folds into one nested
    * replace projection. */
  def encode(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(symbolized(words)) { case (v, (a, b)) =>
      v.select(applyMerge(a, b), col("c"))
    }

  /** Corpus piece table after training: (piece, n) = every BPE piece with
    * its frequency-weighted corpus count — the trained tokenizer's
    * effective vocabulary. */
  def pieceCounts(encoded: DataFrame): DataFrame =
    encoded.select(col("c"), explode(split(trim(col("w")), " ")).as("piece"))
      .groupBy("piece").agg(sum(col("c")).as("n"))
}
