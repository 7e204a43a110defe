package graft
import org.apache.spark.sql.SparkSession
object PartCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
    docs.count()
    import lda._
    val cfg = LdaConfig(numTopics = 4, alpha = 0.1, beta = 0.01,
      totalIterations = 10, burnInIterations = 5, computeLikelihood = true, seed = 42L)
    val model = t("Lda.fit (cold, = bench)")(Lda(cfg).fit(docs))
    val out = t("transform (infer 15)")(
      model.transform(docs, cfg.copy(totalIterations = 15, burnInIterations = 10)).count())
    val model2 = t("Lda.fit warm")(Lda(cfg).fit(docs))
    t("fit noLL warm")(Lda(cfg.copy(computeLikelihood = false)).fit(docs))
    println("LL " + model.likelihoods.map(l => f"$l%.2f").mkString(","))
    spark.stop()
  }
}
