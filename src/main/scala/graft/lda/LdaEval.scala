package graft.lda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-quality metrics — the measurable replacement for the reference's
  * validation practice (likelihood trend watching, `lda.cc:128-136`, and
  * eyeballing `view_model.py` output, reference README.md:140-225).
  *
  * All corpus-side work is distributed; only O(K·N²) pair statistics ever
  * reach the driver. */
object LdaEval {

  /** Perplexity from a corpus log-likelihood: exp(−LL / tokens). Lower is
    * better; the standard held-out report derived from L1. */
  def perplexity(logLikelihood: Double, numTokens: Long): Double =
    math.exp(-logLikelihood / numTokens)

  /** UMass topic coherence (Mimno et al. 2011): for each topic's top-N
    * word list (rank order), mean of log((D(wi,wj) + 1) / D(wj)) over
    * ordered pairs i < j, where D(w) = docs containing w and D(wi,wj) =
    * docs containing both. Higher (less negative) = more coherent.
    *
    * Distributed shape: docs' DISTINCT tokens are semi-joined to the
    * (tiny, broadcast) top-word set first, so the per-doc self-join that
    * counts co-occurrence runs over ≤ K·N tokens per doc — never the full
    * vocabulary. Returns (topic, coherence).
    *
    * @param docs     (doc_id, text)
    * @param topWords (topic, word, cnt) rank-ordered per topic, e.g.
    *                 [[LdaModel.topWords]] output
    */
  def umassCoherence(docs: DataFrame, topWords: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = topWords.select("word").distinct()
    val docTok = docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), "\\s+"), t => t =!= "")).as("word"))
      .distinct()
      .join(broadcast(words), "word")
      .persist()
    val dw = docTok.groupBy("word").agg(count(lit(1)).as("d")).as[(String, Long)]
      .collect().toMap
    val pairCounts = docTok.toDF("wa", "doc_id")
      .join(docTok.toDF("wb", "doc_id"), "doc_id")
      .where(col("wa") < col("wb"))
      .groupBy("wa", "wb").agg(count(lit(1)).as("d"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    docTok.unpersist()
    def coDocs(a: String, b: String): Long =
      if (a < b) pairCounts.getOrElse((a, b), 0L) else pairCounts.getOrElse((b, a), 0L)
    val byTopic = topWords.select("topic", "word").as[(Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val rows = byTopic.toSeq.sortBy(_._1).map { case (t, ws) =>
      val scores = for {
        i <- ws.indices; j <- 0 until i
        if dw.getOrElse(ws(j), 0L) > 0
      } yield math.log((coDocs(ws(i), ws(j)) + 1.0) / dw(ws(j)))
      (t, if (scores.isEmpty) 0.0 else scores.sum / scores.length)
    }
    rows.toDF("topic", "coherence")
  }
}
