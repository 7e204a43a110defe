package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session entry point for the library: the configuration a
  * graft workload wants everywhere —
  *  - AQE on (runtime broadcast-downgrade, skew-split, partition
  *    coalescing: the knobs the 100 TB plans rely on);
  *  - shuffle partitions sized to the cluster (`defaultParallelism`
  *    after start, or the explicit override) instead of the legacy 200;
  *  - zstd shuffle/spill compression (see [[DefaultIoCodec]]);
  *  - UTC session timezone (the FIXTURES.md §D oracle comparison contract);
  *  - graft's native SQL functions registered (`graft_dot`).
  *
  * `Lda`, `ext.*`, and `streaming.*` work with ANY session; this just
  * bundles the defaults so users don't rediscover them. */
object GraftSession {

  /** zstd, not Spark's lz4 default, for `spark.io.compression.codec`
    * (shuffle blocks, sort/agg spill files, broadcasts): the r10 ×100
    * suffix-array leg measured zstd cutting transient spill ~35% vs
    * lz4 — the difference between exhausting this box's disk mid-sort
    * and completing — and at a 100 TB shuffle the same ratio is
    * terabytes of shuffle disk and network per stage. The CPU cost at
    * level 1 is a few percent on shuffle-light work (the r11 ×30 leg
    * re-measured within noise of its lz4 baseline) and is bought back
    * as soon as a stage is I/O-bound, which is exactly when the heavy
    * pipelines (suffix arrays, set-sim joins, global sorts) stress the
    * engine. Override per session with `ioCodec = "lz4"` for purely
    * CPU-bound small-shuffle deployments. */
  val DefaultIoCodec = "zstd"

  def builder(appName: String = "graft",
      shufflePartitions: Option[Int] = None,
      ioCodec: String = DefaultIoCodec): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.io.compression.codec", ioCodec)
    shufflePartitions.foreach(n => b.config("spark.sql.shuffle.partitions", n))
    b
  }

  /** [[builder]] hardened for LARGE streaming state: the default
    * (HDFS-backed) state store holds every key's state on the executor
    * HEAP — fine for fixture-scale gates, an OOM once state is the
    * product (the near-dup gate's dedup index: billions of buckets at
    * 100 TB). RocksDB keeps state on local disk with bounded memory,
    * and changelog checkpointing commits per-batch DELTAS instead of
    * re-uploading full snapshots. State values are byte-identical
    * across providers (StreamsSpec pins gate-output parity), so this is
    * a deployment choice, not a semantics one. */
  def streamingBuilder(appName: String = "graft",
      shufflePartitions: Option[Int] = None): SparkSession.Builder =
    builder(appName, shufflePartitions)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")

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
