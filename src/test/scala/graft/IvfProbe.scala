package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity}

/** Dev-only cost split of the IVF-routed knn eval (test scope, not
  * shipped): times each sub-stage of knnLabelEvalIvf on the eval slice
  * to locate where the sf10 110 s goes (vs 36.7 s for the brute twin
  * over the SAME 16,384-row slice).
  * Run: sbt "Test/runMain graft.IvfProbe /tmp/sf10" */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val emb = Tables.embeddings(spark, dir)
    println(s"embeddings: ${emb.count()} rows, dim=" +
      emb.select(size(col("embedding"))).head().getInt(0))

    val sliced = Similarity.evalSlice(emb)
    val e = Dedup.spreadForCompute(
        sliced.select(col("vec_id"), col("label"),
          Similarity.asDouble(col("embedding")).as("e")))
      .withColumn("nrm", Similarity.norm(col("e")))
      .persist()
    time("slice+persist")(e.count())

    val k = Similarity.KnnEvalK
    val nlist = Similarity.KnnIvfNlist
    val nprobe = Similarity.KnnIvfNprobe

    // centroids exactly as knnLabelEvalIvf builds them
    val cent: Array[(Long, Array[Double], Double)] = e
      .select(col("vec_id").cast("long"), col("e"), col("nrm"))
      .orderBy("vec_id").limit(nlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def scoreStructs(ec: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      cent.map { case (cid, cv, cn) =>
        struct((Similarity.dot(ec, array(cv.map(lit): _*)) / (n * lit(cn))).as("s"),
          lit(-cid).as("negcid"))
      }

    val assigned = e.select(col("vec_id").as("b"), col("label").as("lb"),
      col("e").as("eb"), col("nrm").as("nb"),
      (-array_max(array(scoreStructs(col("e"), col("nrm")): _*))
        .getField("negcid")).as("cid"))
    time("assign (literal-array dots)")(assigned.count())

    val probes2 = e.select(col("vec_id").as("a"), col("label").as("la"),
        col("e").as("ea"), col("nrm").as("na"),
        explode(slice(reverse(array_sort(
          array(scoreStructs(col("e"), col("nrm")): _*))), 1, nprobe)).as("p"))
      .select(col("a"), col("la"), col("ea"), col("na"),
        (-col("p.negcid")).as("cid"))
    time("probes (literal-array dots)")(probes2.count())

    def topK(pairs: DataFrame) = pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy("a").orderBy(col("cos").desc, col("b"))))
      .where(col("rk") <= k)

    val annPairs = probes2.join(broadcast(assigned), "cid")
      .where(col("a") =!= col("b"))
      .select(col("a"), col("la"), col("b"), col("lb"),
        round(Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4).as("cos"))
    time("ann candidate join (count only)")(annPairs.count())
    val annTop = topK(annPairs)
    time("ann topK window")(annTop.count())

    val exactPairs = e.toDF("qa", "qla", "qea", "qna")
      .join(broadcast(e.toDF("cb", "clb", "ceb", "cnb")), col("qa") =!= col("cb"))
      .select(col("qa").as("a"), col("qla").as("la"), col("cb").as("b"),
        round(Similarity.dot(col("qea"), col("ceb")) / (col("qna") * col("cnb")), 4).as("cos"))
    val exactTop = topK(exactPairs)
    time("exact topK (full brute)")(exactTop.count())

    time("FULL knnLabelEvalIvf")(Similarity.knnLabelEvalIvf(sliced).count())
    time("FULL knnLabelEval (brute twin)")(Similarity.knnLabelEval(sliced).count())

    e.unpersist()
    spark.stop()
  }
}
