package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session entry point for the library: the configuration a
  * graft workload wants everywhere —
  *  - AQE on (runtime broadcast-downgrade, skew-split, partition
  *    coalescing: the knobs the 100 TB plans rely on);
  *  - shuffle partitions sized to the cluster (`defaultParallelism`
  *    after start, or the explicit override) instead of the legacy 200;
  *  - UTC session timezone (the FIXTURES.md §D oracle comparison contract);
  *  - graft's native SQL functions registered (`graft_dot`).
  *
  * `Lda`, `ext.*`, and `streaming.*` work with ANY session; this just
  * bundles the defaults so users don't rediscover them. */
object GraftSession {

  def builder(appName: String = "graft",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    shufflePartitions.foreach(n => b.config("spark.sql.shuffle.partitions", n))
    b
  }

  /** Build (or reuse) the session and register graft's SQL functions.
    * When no explicit shuffle-partition count is given and the session is
    * fresh, shuffle partitions follow the cluster's default parallelism. */
  def getOrCreate(appName: String = "graft",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val reused = SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
    val spark = builder(appName, shufflePartitions).getOrCreate()
    val isFresh = !reused.exists(_ eq spark)
    if (shufflePartitions.isEmpty && isFresh)
      spark.conf.set("spark.sql.shuffle.partitions",
        spark.sparkContext.defaultParallelism.toString)
    graft.functions.GraftExtensions.register(spark)
    spark
  }
}
