package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (test scope, not shipped): times sub-stages of
  * the slowest bench queries at a given sf dir to locate overhead.
  * Run: sbt "Test/runMain graft.ProfileMain /root/testdata/sf0.1" */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    val docs = Tables.documents(spark, dir)
    docs.count() // warm parquet
    val emb = Tables.embeddings(spark, dir)
    emb.count()

    time("tokenize+posexplode")(
      docs.select(col("doc_id"), posexplode(ext.Dedup.tokens(col("text"))).as(Seq("pos", "t"))).count())
    time("explodedShingles(3)")(ext.Dedup.explodedShingles(docs, 3).count())
    time("explodedDistinctShingles(3)")(ext.Dedup.explodedDistinctShingles(docs, 3).count())
    time("minhashBands")(ext.Dedup.minhashBands(docs).count())
    time("minhashCandidates")(ext.Dedup.minhashCandidates(docs).count())
    time("jaccardTopPairs")(ext.Dedup.jaccardTopPairs(docs, 10).count())
    time("ngramCounts(2)")(ext.TextAnalysis.ngramCounts(docs, 2).count())
    time("contamination")(ext.TextAnalysis.contamination(docs).count())
    time("cleanCorpus")(ext.TextAnalysis.cleanCorpus(docs).count())
    time("annTopK")(ext.Similarity.annTopK(emb, emb.where(col("vec_id") < 5), 5).count())
    time("ivfTopK")(ext.Similarity.ivfTopK(emb, emb.where(col("vec_id") < 5), 5).count())
    time("lshPairsTopK")(ext.Similarity.lshPairsTopK(emb, 10, 8, 64, 42L).count())

    // B1 protocol: flat-trainer throughput, K=10, 30 iterations, after a
    // 3-iteration warm fit (JIT + codegen). token-samples/s = tokens×30/t.
    val (corpus0, vocabDf) = lda.Corpus.fromDocuments(docs.select("doc_id", "text"), 10, 42L)
    val v = vocabDf.count().toInt
    val corpus = corpus0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTok = corpus.rdd.map(_.topics.length.toLong).reduce(_ + _)
    val warm = lda.LdaTrainer.train(corpus, v,
      lda.LdaConfig(10, 0.1, 0.01, totalIterations = 3, seed = 1L))
    warm.release()
    val t0 = System.nanoTime()
    val b1 = lda.LdaTrainer.train(corpus, v,
      lda.LdaConfig(10, 0.1, 0.01, totalIterations = 30, seed = 42L))
    b1.release()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"PROF B1 train 30it K=10                  $secs%8.3f s  (${nTok * 30 / secs / 1e6}%.2f M token-samples/s, $nTok tokens, V=$v)")
    spark.stop()
  }
}
