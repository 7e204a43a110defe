package graft.apps

import graft.SparkSpec
import graft.ext.{Dedup, TextAnalysis}
import graft.lda.ModelIO
import org.apache.spark.sql.functions._

/** End-to-end "real user" pipeline smoke at sf0.1 — the path a training
  * run actually takes, as ONE flow instead of the per-operator specs:
  *
  *   train (TrainApp on the parquet corpus → model file)
  *     → quality gate (qualityMetrics filter)
  *     → dedup (exact canonical, then MinHash near-dup canonical)
  *     → split (content-hash train/val/test)
  *     → pack (token-budget sequence packing)
  *
  * The invariant checked at EVERY stage boundary is token conservation:
  * tokens never appear or vanish unaccounted — kept + dropped = previous
  * stage, and the final packed bins partition the surviving tokens
  * exactly. That is the property that makes a 100 TB run auditable (a
  * stage that silently loses documents passes per-op specs but fails
  * here). */
class TrainPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tokenCount(df: org.apache.spark.sql.DataFrame): Long =
    df.select(sum(size(Dedup.tokens(col("text"))))).as[Long].collect().head

  test("train → quality gate → dedup → split → pack conserves tokens at every boundary") {
    val dir = sf("sf0.1")
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val nDocs = docs.count()
    val t0 = tokenCount(docs)
    assert(nDocs == 5000L && t0 > 0L)

    // -- stage 1: train a topic model through the CLI surface ----------
    // final_counts mode: every token occurrence carries exactly one topic
    // assignment, so the written model's total mass must equal the
    // corpus token count — conservation THROUGH the Gibbs sampler and
    // the model file format (write → read round-trip included).
    val modelFile = java.nio.file.Files.createTempFile("graft_e2e_model", ".txt")
    try {
      TrainApp.run(spark, Flags(numTopics = 4, alpha = 0.1, beta = 0.01,
        trainingDataFile = dir + "/documents.parquet",
        modelFile = modelFile.toString, totalIterations = 3,
        burnInIterations = 1, outputMode = "final_counts"))
      val (counts, words) = ModelIO.readModel(modelFile.toString)
      val v = words.length
      // model rows are (V+1)×K with the global row = column sums
      val wordMass = counts.take(v * 4).sum
      assert(wordMass == t0,
        s"model mass $wordMass != corpus tokens $t0 — the sampler lost tokens")
      assert(counts.drop(v * 4).sum == wordMass) // global row consistent
      // vocabulary is exactly the corpus's distinct tokens
      val corpusVocab = docs
        .select(explode(Dedup.tokens(col("text"))).as("t"))
        .distinct().as[String].collect().toSet
      assert(words.toSet == corpusVocab)
    } finally java.nio.file.Files.deleteIfExists(modelFile)

    // -- stage 2: quality gate ------------------------------------------
    val q = TextAnalysis.qualityMetrics(docs)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality_score"))
    // gate at the corpus median so the test can't go degenerate if the
    // fixture's score distribution shifts
    val gate = q.agg(expr("percentile(quality_score, 0.5)"))
      .as[Double].collect().head
    val keptIds = q.where(col("quality_score") >= gate)
    val dropIds = q.where(col("quality_score") < gate)
    val (keptN, keptT) = keptIds.agg(count(lit(1)), sum("n_tokens"))
      .as[(Long, Long)].collect().head
    val (dropN, dropT) = dropIds.agg(count(lit(1)),
        coalesce(sum("n_tokens"), lit(0L)))
      .as[(Long, Long)].collect().head
    assert(keptN + dropN == nDocs, "quality gate lost documents")
    assert(keptT + dropT == t0, "quality gate lost tokens")
    assert(keptN > 0 && dropN > 0, s"gate $gate is degenerate: $keptN/$dropN")
    val gated = docs.join(keptIds.select("doc_id"), "doc_id")

    // -- stage 3: dedup (exact, then near-dup) --------------------------
    val exact = Dedup.keepCanonical(gated)
    val tExact = tokenCount(exact)
    // every doc removed by exact dedup has a surviving doc with the SAME
    // text (tokens dropped are accounted for by their canonical copy)
    val removedExact = gated.join(exact.select("doc_id"), Seq("doc_id"), "left_anti")
    val unaccounted = removedExact
      .join(exact.select(col("text")).distinct(), Seq("text"), "left_anti").count()
    assert(unaccounted == 0L, "exact dedup removed a doc with no surviving twin")
    assert(tExact + tokenCount(removedExact) == keptT, "exact dedup lost tokens")

    val near = Dedup.keepNearDupCanonical(exact, Dedup.minhashCandidates(exact))
    val tNear = tokenCount(near)
    val removedNear = exact.join(near.select("doc_id"), Seq("doc_id"), "left_anti")
    assert(tNear + tokenCount(removedNear) == tExact, "near dedup lost tokens")
    val nNear = near.count()
    assert(nNear > 0L && nNear <= exact.count())

    // -- stage 4: content-hash split ------------------------------------
    val split = TextAnalysis.hashSplit(near)
    val byLabel = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(byLabel.values.sum == nNear, "split lost documents")
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    // 80/10/10 within a loose binomial band
    val trainFrac = byLabel.getOrElse("train", 0L).toDouble / nNear
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    // content-keyed: one doc_id → one label, and the bucket column is a
    // pure function of text (re-splitting gives identical labels)
    assert(split.select("doc_id").distinct().count() == nNear)
    val relabeled = TextAnalysis.hashSplit(near).withColumnRenamed("split", "s2")
    assert(split.join(relabeled, "doc_id")
      .where(col("split") =!= col("s2")).count() == 0L)

    // -- stage 5: pack the train slice into token-budget bins -----------
    val trainDocs = near.join(
      split.where(col("split") === "train").select("doc_id"), "doc_id")
    val budget = 2048L
    val packed = TextAnalysis.packSequences(trainDocs, budget)
    val (packT, nBins, maxBin) = packed
      .agg(sum("n_toks"), countDistinct("bin"), max("bin"))
      .as[(Long, Long, Long)].collect().head
    assert(packT == tokenCount(trainDocs), "packing lost tokens")
    // a doc lands in the bin where its span BEGINS, so a bin holds at
    // most budget-1 tokens of starts plus one straddling doc
    val maxDocLen = trainDocs
      .select(max(size(Dedup.tokens(col("text"))))).as[Int].collect().head
    val overfull = packed.groupBy("bin").agg(sum("n_toks").as("s"))
      .where(col("s") >= budget + maxDocLen).count()
    assert(overfull == 0L, "a packed bin exceeds budget + one straddling doc")
    // bins span the corpus: the last doc STARTS at packT - lastLen, so
    // maxBin sits between floor((packT - maxDocLen)/budget) and the
    // index of the final token — real two-sided bounds, not a tautology
    assert(maxBin <= (packT - 1) / budget, s"maxBin $maxBin past corpus end")
    assert(maxBin >= (packT - maxDocLen) / budget,
      s"maxBin $maxBin leaves a tail gap (packT=$packT maxDocLen=$maxDocLen)")
    assert(nBins <= maxBin + 1, "more distinct bins than bin ids")
  }
}
