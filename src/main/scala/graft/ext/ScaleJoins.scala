package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB regime (SURVEY §2.3 "Joins" row; the
  * scale checklist: broadcast small dims, bucketing for co-located joins,
  * salting for skew, AQE for runtime re-plan).
  *
  * - Broadcast: use `broadcast(dim)` (exercised by Q10/Q20 and
  *   `Corpus.bagOfWords`).
  * - AQE: `spark.sql.adaptive.enabled=true` (Bench/Verify sessions) gives
  *   runtime broadcast-downgrade and automatic skew-split of sort-merge
  *   partitions — prefer it when stats exist at runtime.
  * - Salting (here): for the case AQE can't save — a hot key whose rows
  *   must meet a NON-broadcastable build side. Spreads each hot key over
  *   `saltFactor` reducers at the cost of replicating the small side
  *   `saltFactor`×.
  * - Bucketing (here): co-locate repeated large⋈large joins on a stable
  *   key by pre-hashing at write time — every subsequent join on that key
  *   is exchange-free.
  */
object ScaleJoins {

  /** Salted inner equi-join `large ⋈ small` on `key`. Each large row gets
    * a uniform salt in [0, saltFactor); the small side is replicated once
    * per salt value, so every (key, salt) cell joins exactly as the
    * unsalted (key) would — the result multiset is identical to
    * `large.join(small, key)` for any salt assignment (duplicate keys on
    * either side included). Salt is seeded `rand` (uniform spread is the
    * point; values need not be reproducible for correctness). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, seed: Long = 42L): DataFrame = {
    require(saltFactor >= 1, "saltFactor >= 1")
    val salted = large.withColumn("_salt",
      floor(rand(seed) * saltFactor).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Join-key skew diagnostic: the top `k` hottest keys of a column with
    * their share of all rows and their skew factor (key count / mean
    * count over distinct keys) — the one-pass report that decides
    * BEFORE a 100 TB join whether [[saltedJoin]]/AQE skew handling is
    * needed and how big `saltFactor` must be (a key at skew factor s
    * makes the straggler task s× the average; salt ≥ s flattens it).
    * One key-count aggregation + a 1-row global broadcast back — no
    * window over the full key space, no second shuffle of the data. */
  def skewReport(df: DataFrame, key: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col(key), col("n"),
        round(col("n") / col("total"), 4).as("share"),
        round(col("n") * col("n_keys") / col("total"), 4).as("skew"))
      .orderBy(col("n").desc, col(key))
      .limit(k)
  }

  /** Bloom-filter pre-filtered semi-join: `fact` rows whose long `factKey`
    * appears in `keys.keyCol`. A Bloom filter of the key side is built
    * with one aggregate pass and broadcast; the fact side drops
    * non-matching rows BEFORE the exact `left_semi` join, so at 100 TB
    * the shuffle carries only (matches + fpp·misses) instead of the whole
    * fact table. The trailing semi-join removes Bloom false positives —
    * the result is exactly `fact ⋉ keys` for any fpp. (Spark's runtime
    * row-level filtering does the same rewrite automatically when
    * `spark.sql.optimizer.runtime.bloomFilter.enabled` is on and stats
    * qualify; this is the explicit, always-on form.) */
  def bloomSemiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
      keyCol: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    // no distinct() on the key side: left_semi already emits each fact
    // row at most once for duplicate keys, and a dedup would add a full
    // extra shuffle of the key table
    fact.where(mightContain(col(factKey)))
      .join(keys.select(col(keyCol).as(factKey)), Seq(factKey), "left_semi")
  }

  /** Write `df` as a bucketed+sorted table: `n` hash buckets on `key`,
    * rows sorted by `key` within each bucket. Joins and aggregations on
    * `key` between tables bucketed with the same `n` then plan with NO
    * shuffle exchange (asserted in ScaleJoinsSpec). At 100 TB this is the
    * difference between re-shuffling the fact table per query and never
    * shuffling it again. Repartitions on `key` first so the write runs
    * `n`-way parallel (one task = one bucket = one sorted file) instead
    * of at scan-split parallelism — see [[Layout.writeBucketed]]. */
  def writeBucketed(df: DataFrame, table: String, key: String, n: Int): Unit =
    df.repartition(n, col(key))
      .write.mode("overwrite").bucketBy(n, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
