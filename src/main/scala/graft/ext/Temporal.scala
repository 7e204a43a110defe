package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators the reference lacks entirely (its data model has no
  * time — SURVEY §1.1) but a large-scale event/training-data pipeline
  * needs: as-of (point-in-time) join and batch sessionization.
  *
  * Both are built the merge-scan way — ONE shuffle on the partition key,
  * then a sorted window pass — never a non-equi join. A naive
  * `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + argmax is quadratic in
  * rows-per-key and re-shuffles twice; the union+window form below is
  * linear and holds at 100 TB (each user's timeline streams through one
  * task in ts order, state is O(1) per key).
  */
object Temporal {

  /** Default trailing analysis window (hours) for the hourly-GRID family
    * ([[resampleHourlyFfill]], [[hourlyAutocorr]], [[durbinWatson]],
    * [[holtForecast]], [[holtWintersForecast]], [[seasonalDecompose]]):
    * these ops materialize a contiguous hour grid whose size is the TIME
    * SPAN, not the row count, so an unbounded grid grows with retention
    * (the r12 sf1 twin's decade-shifted span was 790k hours). One year of
    * hourly resolution by default; for longer trend horizons run the op
    * on the daily rollup instead. Battery oracles interpolate THIS
    * constant, so engine and oracle cannot drift (TemporalSpanSpec pins
    * the value). */
  val GridMaxSpanHours = 8760

  /** Default trailing window for [[mannKendall]] — much tighter than
    * [[GridMaxSpanHours]] because its pair table is SPAN²-bounded.
    * The ext_mann_kendall oracle interpolates this constant. */
  val MannKendallSpanHours = 2048

  /** Point-in-time (as-of) join: for each left row, attach `payloadCols`
    * of the LATEST right row with the same `key` and `r.ts <= l.ts`
    * (nulls when no prior right row exists — left-outer semantics).
    *
    * Implementation: tag both sides, union on (key, ts, side), window
    * `last(payload, ignoreNulls)` over rows unbounded-preceding..current
    * ordered by (ts, side) with right rows first at equal ts — so a right
    * row at exactly l.ts IS eligible, matching `ASOF JOIN ... ON l.ts >=
    * r.ts`. Deterministic when the right side is unique per (key, ts);
    * pre-aggregate it otherwise.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String], prefix: String = "matched_"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val payT = StructType(payloadCols.map(c => StructField(c, right.schema(c).dataType)))
    val lrowT = StructType(left.schema.fields)
    val r = right.select(col(key), col(ts), lit(0).as("_side"),
      struct(payloadCols.map(col): _*).as("_pay"),
      lit(null).cast(lrowT).as("_lrow"))
    val l = left.select(col(key), col(ts), lit(1).as("_side"),
      lit(null).cast(payT).as("_pay"),
      struct(left.columns.map(col): _*).as("_lrow"))
    val w = Window.partitionBy(key).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.union(l)
      .withColumn("_m", last(col("_pay"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_lrow.*") +: payloadCols.map(c => col(s"_m.$c").as(s"$prefix$c")): _*)
  }

  /** Nearest-in-time join — the ML feature-attachment variant of
    * [[asofJoin]]: for each left row, the right row with the same `key`
    * minimizing |r.ts − l.ts| within `toleranceSec`, ties (equidistant
    * before/after) resolved BACKWARD (the leak-safe side). Left rows
    * with no candidate in tolerance are dropped (matched-only output).
    *
    * Same merge-scan shape as [[asofJoin]] — one union, ONE shuffle +
    * sort on (key, ts, side): the backward candidate is
    * `last(payload, ignoreNulls)` over the preceding frame and the
    * forward candidate `first(...)` over the following frame; both
    * window specs share the sort, so Spark evaluates them in a single
    * WindowExec. Never a non-equi join. Right side must be unique per
    * (key, ts) — pre-aggregate otherwise (the [[asofJoin]] contract).
    * Output: left columns + prefixed payload + `dt_us` (µs distance,
    * exact integer). */
  def nearestJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String], toleranceSec: Long,
      prefix: String = "near_"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val payT = StructType(StructField("_rts", right.schema(ts).dataType) +:
      payloadCols.map(c => StructField(c, right.schema(c).dataType)))
    val lrowT = StructType(left.schema.fields)
    val r = right.select(col(key), col(ts), lit(0).as("_side"),
      struct(col(ts).as("_rts") +: payloadCols.map(col): _*).as("_pay"),
      lit(null).cast(lrowT).as("_lrow"))
    val l = left.select(col(key), col(ts), lit(1).as("_side"),
      lit(null).cast(payT).as("_pay"),
      struct(left.columns.map(col): _*).as("_lrow"))
    val wb = Window.partitionBy(key).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tol = toleranceSec * 1000000L
    val dtb = unix_micros(col(ts)) - unix_micros(col("_b._rts"))
    val dtf = unix_micros(col("_f._rts")) - unix_micros(col(ts))
    val bOk = col("_b").isNotNull && dtb <= lit(tol)
    val fOk = col("_f").isNotNull && dtf <= lit(tol)
    val useB = bOk && (!fOk || dtb <= dtf)
    r.union(l)
      .withColumn("_b", last(col("_pay"), ignoreNulls = true).over(wb))
      .withColumn("_f", first(col("_pay"), ignoreNulls = true).over(wf))
      .where(col("_side") === 1)
      .withColumn("_m", when(useB, col("_b")).when(fOk, col("_f")))
      .where(col("_m").isNotNull)
      .withColumn("dt_us", when(useB, dtb).otherwise(dtf))
      .select(col("_lrow.*") +:
        payloadCols.map(c => col(s"_m.$c").as(s"$prefix$c")) :+
        col("dt_us"): _*)
  }

  /** Batch sessionization: assign each row a per-`key` session index that
    * increments whenever the gap to the previous row (ordered by ts, with
    * `tieBreak` making the order total) exceeds `gapSeconds`. 1-based.
    * One shuffle on `key`; the running sum is a sorted in-partition scan. */
  def sessionize(events: DataFrame, key: String = "user_id", ts: String = "ts",
      tieBreak: String = "event_id", gapSeconds: Long = 1800L): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val prev = lag(col(ts), 1).over(order)
    val isNew = when(prev.isNull ||
      unix_micros(col(ts)) - unix_micros(prev) > gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("_new", isNew)
      .withColumn("session_idx",
        sum(col("_new")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }

  /** Batch interval (range) join: left rows paired with every right row
    * of the same `key` whose time falls in [l.ts − windowSeconds, l.ts].
    * The equality key makes this a plain equi-join with the range as a
    * post-join filter — Spark plans a sort-merge (or broadcast) hash
    * join on `key`, never a nested-loop: per-key timelines meet in one
    * task and the filter prunes there. The streaming twin is
    * [[graft.streaming.Streams.viewPurchaseIntervalJoin]]. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowSeconds: Long): DataFrame =
    left.join(right, left(key) === right(key) &&
      right(rightTs) >= left(leftTs) - expr(s"INTERVAL $windowSeconds SECONDS") &&
      right(rightTs) <= left(leftTs))
      .drop(right(key))

  /** Ordered funnel: for each `key`, how many of the `stages` event types
    * occurred in sequence — stage i counts only if it happens strictly
    * AFTER the (first valid occurrence of) stage i−1. Classic conversion
    * analysis. One aggregate per stage, each a key-partitioned
    * shuffle of a rapidly-shrinking keyset (only keys that reached the
    * previous stage carry forward). Output: (key, stages_reached ≥ 1). */
  def funnel(events: DataFrame, stages: Seq[String], key: String = "user_id",
      ts: String = "ts", typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(key).agg(min(col(ts)).as("_t"))
      .withColumn("stages_reached", lit(1))
    stages.drop(1).zipWithIndex.foldLeft(first) { case (acc, (stage, i)) =>
      // only keys that completed EXACTLY the previous stage may advance —
      // a key that stalled earlier must not match later stages out of order
      val eligible = acc.where(col("stages_reached") === i + 1)
      val stalled = acc.where(col("stages_reached") =!= i + 1)
      val nxt = events.where(col(typeCol) === stage)
        .join(eligible.select(col(key), col("_t")), key)
        .where(col(ts) > col("_t"))
        .groupBy(key).agg(min(col(ts)).as("_nt"))
      eligible.join(nxt, Seq(key), "left")
        .select(col(key),
          coalesce(col("_nt"), col("_t")).as("_t"),
          (col("stages_reached") + when(col("_nt").isNotNull, 1).otherwise(0)).as("stages_reached"))
        .union(stalled)
    }.select(col(key), col("stages_reached"))
  }

  /** Stage-to-stage funnel LATENCY: for the strictly-ordered funnel of
    * [[funnel]], how long do users take to advance? Per adjacent stage
    * pair: users who advanced, exact interpolating p50/p90 of the
    * advance latency in SECONDS (µs-magnitude values would put the
    * 4-decimal rendering at double-ULP scale, where the two engines'
    * percentile interpolations legitimately disagree in the last bit —
    * DuckDB `quantile_cont` parity, the ext_percentiles pairing). Same
    * sequential min-ts semantics as [[funnel]]: stage i+1 counts only
    * strictly after the user's stage-i time. Output:
    * (pair, n, p50, p90). */
  def funnelLatency(events: DataFrame, stages: Seq[String],
      key: String = "user_id", ts: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.size >= 2, "need at least two stages")
    val stageTimes: Seq[DataFrame] = stages.zipWithIndex.scanLeft(null: DataFrame) {
      case (prev, (stage, i)) =>
        val ofStage = events.where(col(typeCol) === stage)
        if (i == 0) ofStage.groupBy(key).agg(min(col(ts)).as("_t"))
        else ofStage.join(prev.select(col(key), col("_t").as("_pt")), key)
          .where(col(ts) > col("_pt"))
          .groupBy(key).agg(min(col(ts)).as("_t"))
    }.drop(1)
    val lats = stages.sliding(2).zipWithIndex.zip(stageTimes.sliding(2).toSeq).map {
      case ((Seq(a, b), i), Seq(ta, tb)) =>
        tb.join(ta.select(col(key), col("_t").as("_pt")), key)
          .select(lit(s"${i + 1}:$a->$b").as("pair"),
            ((unix_micros(col("_t")) - unix_micros(col("_pt"))) / lit(1e6))
              .as("lat"))
      case _ => sys.error("unreachable")
    }.reduce(_ unionAll _)
    lats.groupBy("pair")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(lat, 0.5D)"), 4).as("p50"),
        round(expr("percentile(lat, 0.9D)"), 4).as("p90"))
      .orderBy("pair")
  }

  /** Event-type co-occurrence affinity: which behaviors share users —
    * the item-item collaborative-filtering primitive over the (user,
    * type) bipartite graph. Distinct (user, type) once, one user-keyed
    * self-join (fan-out |types|² per user, types-bounded), Jaccard
    * affinity from integer counts only. Output:
    * (type_a, type_b, n_users, affinity ROUND·,4). */
  def typeCooccurrence(events: DataFrame, key: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    val ut = events.select(col(key).as("u"), col(typeCol).as("t")).distinct()
    val sizes = ut.groupBy("t").agg(count(lit(1)).as("n"))
    val both = ut.toDF("u", "type_a").join(ut.toDF("u", "type_b"), "u")
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_users"))
    both
      .join(broadcast(sizes.toDF("type_a", "na")), "type_a")
      .join(broadcast(sizes.toDF("type_b", "nb")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_users"),
        round(col("n_users").cast("double") /
          (col("na") + col("nb") - col("n_users")), 4).as("affinity"))
      .orderBy("type_a", "type_b")
  }

  /** Distributed global running sum over a total order — the scalable
    * form of `SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`, which
    * Spark's WindowExec executes in ONE partition (the q18 warning).
    * Two passes instead: range-repartition by the order key, compute
    * in-partition prefix sums, then add each partition's offset (the sum
    * of all earlier partitions' totals — collected as one tiny array).
    * Every partition works in parallel; the only global state is
    * numPartitions longs on the driver.
    *
    * For integer values the result is EXACTLY the window form (integer
    * addition is associative); for doubles the two-pass re-association
    * can differ in ULPs. Null handling matches WindowExec too: null
    * values are skipped, and the output is NULL until the first non-null
    * value in the total order. */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    // integral values sum in Long (exact, == the window form); everything
    // else sums in Double. The order key keeps its own type (timestamps,
    // strings — anything range-partitionable).
    val integral = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val prepared = df.repartitionByRange(np, col(orderCol))
      .sortWithinPartitions(orderCol)
      .select(col(orderCol), col(valueCol))
    val rdd = prepared.rdd
    val schema = StructType(Seq(prepared.schema.head,
      StructField("running_sum", if (integral) LongType else DoubleType)))
    def num(r: Row): Double =
      if (r.isNullAt(1)) 0.0 else r.get(1).asInstanceOf[Number].doubleValue()
    def numL(r: Row): Long =
      if (r.isNullAt(1)) 0L else r.get(1).asInstanceOf[Number].longValue()
    val out =
      if (integral) {
        // pass 1: per-partition totals + has-any-non-null (tiny — one
        // (long, bool) per partition)
        val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
          var s = 0L; var any = false
          it.foreach { r => if (!r.isNullAt(1)) { any = true; s += numL(r) } }
          Iterator.single((pid, s, any))
        }.collect().sortBy(_._1)
        val offsets = partTotals.map(_._2).scanLeft(0L)(_ + _)
        val seenBefore = partTotals.map(_._3).scanLeft(false)(_ || _)
        val bc = spark.sparkContext.broadcast((offsets, seenBefore))
        rdd.mapPartitionsWithIndex { (pid, it) =>
          var acc = bc.value._1(pid); var seen = bc.value._2(pid)
          it.map { r =>
            if (!r.isNullAt(1)) { seen = true; acc += numL(r) }
            Row(r.get(0), if (seen) acc else null)
          }
        }
      } else {
        val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
          var s = 0.0; var any = false
          it.foreach { r => if (!r.isNullAt(1)) { any = true; s += num(r) } }
          Iterator.single((pid, s, any))
        }.collect().sortBy(_._1)
        val offsets = partTotals.map(_._2).scanLeft(0.0)(_ + _)
        val seenBefore = partTotals.map(_._3).scanLeft(false)(_ || _)
        val bc = spark.sparkContext.broadcast((offsets, seenBefore))
        rdd.mapPartitionsWithIndex { (pid, it) =>
          var acc = bc.value._1(pid); var seen = bc.value._2(pid)
          it.map { r =>
            if (!r.isNullAt(1)) { seen = true; acc += num(r) }
            Row(r.get(0), if (seen) acc else null)
          }
        }
      }
    spark.createDataFrame(out, schema)
  }

  /** Per-session rollup: start/end/count/value-total per (key, session). */
  def sessionAgg(events: DataFrame, key: String = "user_id", ts: String = "ts",
      valueCol: String = "value", gapSeconds: Long = 1800L): DataFrame =
    sessionize(events, key, ts, gapSeconds = gapSeconds)
      .groupBy(col(key), col("session_idx"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("total_value"))

  /** Per-key rolling-window feature: mean of `valueCol` over the last
    * `nPreceding`+1 rows of the SAME key in `orderCols` order — the
    * feature-engineering workhorse (per-entity trailing aggregates).
    * One shuffle on `key`, then a sorted frame scan with O(frame) state;
    * because the window is keyed, no timeline ever funnels through a
    * single task (the global-order variant is [[runningSum]]'s two-pass
    * problem). `orderCols` must totally order rows within a key for a
    * deterministic result. */
  def rollingMean(df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, nPreceding: Int): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-nPreceding, Window.currentRow)
    df.withColumn("rolling_mean", round(avg(col(valueCol)).over(w), 4))
  }

  /** Rolling MEDIAN over the trailing `nPreceding+1` rows per key — the
    * robust sibling of [[rollingMean]] (one outlier poisons a mean; the
    * median feature survives it). Exact interpolating percentile as a
    * frame-bounded window aggregate on the same single key shuffle; the
    * frame holds ≤ n+1 values, so the per-row cost is a constant-size
    * sort, not a running sketch. */
  def rollingMedian(df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, nPreceding: Int): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-nPreceding, Window.currentRow)
    df.withColumn("rolling_median",
      round(expr(s"percentile($valueCol, 0.5D)").over(w), 4))
  }

  /** CDC-style compaction: keep each key's LATEST row under `orderCols`
    * (descending, later columns as tie-breakers) — the "upsert merge"
    * that turns an append-only change log into current state. One
    * shuffle on `key`; at 100 TB this is the nightly compaction job, and
    * the same window shape incrementalizes (new batch ∪ old state →
    * keep-latest again). `orderCols` must totally order a key's rows
    * (include a unique id as the last tie-breaker). */
  def compactLatest(df: DataFrame, key: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Changelog → type-2 slowly-changing-dimension history (gaps-and-
    * islands): collapse each `key`'s consecutive runs of equal `attr`
    * (ordered by `ts`, ties broken by `tieBreak`) into validity
    * intervals. Output per run: the key and attr columns (original
    * names), `run_idx` (1-based per key), `valid_from` (run's first ts),
    * `valid_to` (next run's first ts; NULL for the current run — the
    * half-open [from, to) convention), and `n_rows` (changelog rows in
    * the run). This is the warehouse "dimension history" build and its
    * inverse is [[compactLatest]] (current state = valid_to IS NULL).
    *
    * Scale shape: ONE shuffle on `key`. Run detection (lag), the per-key
    * row count, and the post-filter lead/row_number all window over the
    * same `key` partitioning, so Catalyst reuses the single exchange;
    * the second window pass only re-sorts in-partition. No per-key data
    * ever leaves its task and state is O(1) per row — at 100 TB each
    * key's changelog streams through one task in ts order. */
  def scd2(changes: DataFrame, key: String, attr: String, ts: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val runs = changes
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(key)))
      .where(col("_prev").isNull || col("_prev") =!= col(attr))
    val byRun = Window.partitionBy(key).orderBy(col("_rn"))
    runs.select(
      col(key),
      row_number().over(byRun).as("run_idx"),
      col(attr),
      col(ts).as("valid_from"),
      lead(col(ts), 1).over(byRun).as("valid_to"),
      (coalesce(lead(col("_rn"), 1).over(byRun), col("_n") + 1) - col("_rn"))
        .as("n_rows"))
  }

  /** Point-in-time lookup against an [[scd2]] interval history — the
    * "what was this key's attribute AS OF time t" probe (time-travel
    * dimension serving, the read side of the SCD2 story): each probe row
    * matches the history run with valid_from ≤ t < valid_to (open tail
    * = NULL valid_to). Implemented as the equi-key join + range filter
    * (the [[intervalJoin]] doctrine: a sort-merge join on the key, never
    * a nested-loop over time); per-key history is runs-bounded, so the
    * fan-out is the run count, and empty runs ([from, from)) match
    * nothing by construction. Probes before the key's first run drop
    * (inner join — there IS no state to serve). Output: probe columns +
    * the run's attribute, run_idx. */
  def scd2Lookup(hist: DataFrame, probes: DataFrame, key: String,
      probeTs: String): DataFrame = {
    probes.join(hist, Seq(key))
      .where(col("valid_from") <= col(probeTs) &&
        (col("valid_to").isNull || col(probeTs) < col("valid_to")))
  }

  /** Hourly resample + forward fill per key — the time-series
    * regularization step (metrics pipelines, feature stores): keep each
    * key's LAST observation per hour (latest (ts, tiebreak) wins),
    * expand the key's full hour grid from its first to last observed
    * hour, and forward-fill unobserved hours with the most recent
    * value. Output: (key, h, v, observed∈{0,1}).
    *
    * Scale shape: one grouped keep-latest on (key, hour), a per-key
    * bounds aggregate whose `sequence` explode generates the grid
    * IN-ROW (grid size = key's hour span — never a global calendar
    * cross join), a left join back on (key, hour), and one keyed window
    * for the fill. No timeline ever funnels through a single task.
    *
    * The grid is EXPLICITLY span-bounded: each key's output covers the
    * trailing `maxSpanHours` hours up to its last observed hour (a no-op
    * when the key's retention fits — every driver fixture spans ≤ 719 h).
    * Observations BEFORE the window still seed the forward fill: the
    * key's latest pre-window value carries into the window's unobserved
    * head hours (observed = 0), so truncation never fabricates nulls the
    * unbounded form would have filled. */
  def resampleHourlyFfill(events: DataFrame, key: String = "user_id",
      ts: String = "ts", valueCol: String = "value",
      tiebreak: String = "event_id",
      maxSpanHours: Int = GridMaxSpanHours): DataFrame = {
    require(maxSpanHours >= 1, s"maxSpanHours must be positive, got $maxSpanHours")
    val hb = events.select(col(key), date_trunc("hour", col(ts)).as("h"),
      col(ts), col(tiebreak), col(valueCol))
    val lastv = hb
      .groupBy(col(key), col("h"))
      .agg(max(struct(col(ts), col(tiebreak), col(valueCol))).getField(valueCol).as("v"))
    val bounds = lastv.groupBy(col(key))
      .agg(min(col("h")).as("hmin"), max(col("h")).as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = bounds.select(col(key),
      explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    // latest pre-window observation per key: the fill seed at the window
    // head (empty whenever the span fits maxSpanHours — the common case)
    val seed = lastv.join(bounds.select(col(key), col("h0")), Seq(key))
      .where(col("h") < col("h0"))
      .groupBy(col(key))
      .agg(max(struct(col("h"), col("v"))).getField("v").as("_seedv"))
    val w = Window.partitionBy(key).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastv, Seq(key, "h"), "left")
      .join(seed, Seq(key), "left")
      .select(col(key), col("h"),
        round(coalesce(last(col("v"), ignoreNulls = true).over(w),
          col("_seedv")), 4).as("v"),
        when(col("v").isNotNull, 1).otherwise(0).as("observed"))
  }

  /** Per-key exponentially weighted moving average:
    * y_1 = x_1; y_i = alpha·x_i + (1−alpha)·y_{i−1} in `orderCol` order
    * within each key — the recursive smoother window frames can't express
    * (every frame aggregate is over a FIXED set of rows; EWMA's weights
    * depend on the distance to the current row).
    *
    * Implementation: one shuffle (repartition by key), sort within
    * partitions by (key, order), then a sequential per-partition scan
    * that resets state at each key boundary — O(1) state per task, no
    * per-key collect, nothing ever funnels through one task. Rows with a
    * NULL or non-finite (NaN/±Inf) value pass the previous smoothed
    * value through unchanged (and emit NULL until the key's first
    * usable value) — an explicit has-state flag, NOT a NaN sentinel, so
    * a NaN input can never silently reset the smoother.
    *
    * Output: input key + order columns + `ewma` (ROUND ·,4). */
  def ewma(df: DataFrame, key: String = "user_id", orderCol: String = "event_id",
      valueCol: String = "value", alpha: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val np = spark.sparkContext.defaultParallelism
    val prepared = df.select(col(key), col(orderCol), col(valueCol))
      .repartition(np, col(key))
      .sortWithinPartitions(col(key), col(orderCol))
    val out = prepared.rdd.mapPartitions { it =>
      var curKey: Any = null
      var haveKey = false
      var haveY = false
      var y = 0.0
      it.map { r =>
        val k = r.get(0)
        if (!haveKey || k != curKey) { curKey = k; haveKey = true; haveY = false }
        if (!r.isNullAt(2)) {
          val x = r.get(2).asInstanceOf[Number].doubleValue()
          if (java.lang.Double.isFinite(x)) {
            y = if (!haveY) x else alpha * x + (1 - alpha) * y
            haveY = true
          }
        }
        Row(k, r.get(1), if (!haveY) null
          else graft.functions.StableRound.dbl4(y))
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      prepared.schema(0), prepared.schema(1), StructField("ewma", DoubleType))))
  }

  /** Weekly cohort retention matrix — the product-analytics staple: users
    * are cohorted by the ISO week (Monday-truncated) of their FIRST event;
    * for each (cohort_week, week_offset) the output counts distinct users
    * of that cohort active in the offset-th week after it.
    *
    * Shape for 100 TB: first-seen is one user_id aggregation; attaching
    * the cohort back to the activity stream is an equi-join on user_id
    * (same key as the agg — AQE reuses the partitioning, and the
    * first-seen side is |users| rows, not |events|); the (user, week)
    * de-dup and the final cohort-cell count are map-side-combined
    * aggregations. No window function, nothing per-event on the driver,
    * skew bounded by weeks-per-user. Output: (cohort_week date,
    * week_offset bigint, n_users bigint). */
  def cohortRetention(events: DataFrame, key: String = "user_id",
      ts: String = "ts"): DataFrame = {
    val weeks = events.select(col(key),
      date_trunc("week", col(ts)).cast("date").as("_wk"))
    val cohort = weeks.groupBy(key).agg(min(col("_wk")).as("cohort_week"))
    weeks.join(cohort, key)
      .select(col(key), col("cohort_week"),
        (datediff(col("_wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Cohort LTV curve — [[cohortRetention]]'s revenue companion: per
    * (first-seen week, week age), total value and the CUMULATIVE value
    * per cohort user — "how much is a week-N cohort worth by age k",
    * the payback-period readout. Value held as exact 2-decimal
    * integers; the cumulative window runs per cohort over its ≤span
    * week offsets (span-bounded rollup, not rows). Cohort size =
    * week-0 distinct users (every user appears at offset 0 by
    * construction). Output: (cohort_week, week_offset, n_active, rev,
    * cum_ltv). */
  def cohortLtv(events: DataFrame, key: String = "user_id",
      ts: String = "ts", valueCol: String = "value"): DataFrame = {
    val base = events.select(col(key).as("u"),
      date_trunc("week", col(ts)).cast("date").as("_wk"),
      expr(s"CAST(ROUND($valueCol * 100) AS BIGINT)").as("vc"))
    val cohort = base.groupBy("u").agg(min(col("_wk")).as("cohort_week"))
    val tagged = base.join(cohort, "u")
      .select(col("u"), col("cohort_week"),
        (datediff(col("_wk"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"), col("vc"))
    val cells = tagged.groupBy("cohort_week", "week_offset")
      .agg(countDistinct("u").as("n_active"), sum("vc").as("rev"))
    val sizes = cells.where(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("n_cohort"))
    val w = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.withColumn("cum", sum("rev").over(w))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        round(col("rev").cast("double") / 100.0, 4).as("rev"),
        round(col("cum").cast("double") / 100.0
          / col("n_cohort").cast("double"), 4).as("cum_ltv"))
      .orderBy("cohort_week", "week_offset")
  }

  /** First-order Markov transition statistics of the per-user event-type
    * sequence: count of each (from_type, to_type) adjacent pair in
    * (ts, event_id) order, with the row-normalized transition probability
    * (count / Σ count over the from-state).
    *
    * One shuffle on user_id feeds the lag window (each user's timeline
    * streams through one task in order — never a global sort); the pair
    * count and the from-state total are two map-side-combined
    * aggregations over the tiny |types|² key space, the totals joined
    * back broadcast. Output: (from_type, to_type, n, p ROUND·,4). */
  def eventTransitions(events: DataFrame, key: String = "user_id",
      ts: String = "ts", typeCol: String = "event_type",
      tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val pairs = events
      .select(col(key), col(ts), col(tieBreak), col(typeCol))
      .withColumn("from_type", lag(col(typeCol), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("_tot"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("_tot"), 4).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Conditional entropy of the per-user event-type process: per from-
    * state, H(to|from=f) = −Σ p(t|f) ln p(t|f) over the empirical
    * transition counts of [[eventTransitions]] (recomputed unrounded),
    * plus the overall rate H(to|from) = Σ p(f)·H(f) as an `__all__`
    * row — "how predictable is the next event", the sequence-level
    * complement of the per-token entropy metrics. Same shape as the
    * transition count: one lag-window shuffle, then |types|²-key aggs
    * with broadcast totals. Output: (from_type, n, h ROUND·,4). */
  def transitionEntropy(events: DataFrame, key: String = "user_id",
      ts: String = "ts", typeCol: String = "event_type",
      tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val pairs = events
      .select(col(key), col(ts), col(tieBreak), col(typeCol))
      .withColumn("from_type", lag(col(typeCol), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = pairs.groupBy("from_type").agg(sum("n").as("tf"))
    val perFrom = pairs.join(broadcast(tot), "from_type")
      .groupBy("from_type")
      .agg(first("tf").as("n"),
        (-sum((col("n") / col("tf")) * log(col("n") / col("tf")))).as("h"))
    val overall = perFrom
      .agg(sum("n").as("n"), (sum(col("n") * col("h")) / sum("n")).as("h"))
      .select(lit("__all__").as("from_type"), col("n"), col("h"))
    perFrom.select(col("from_type"), col("n"), col("h"))
      .union(overall)
      .select(col("from_type"), col("n"), round(col("h"), 4).as("h"))
      .orderBy("from_type")
  }

  /** Equi-width histogram of `valueCol` per group: `bins` buckets over
    * the group's [min, max], bin = floor((v−min)/width) clamped into
    * range (the max lands in the last bin; a zero-width group collapses
    * to bin 0). Two aggregations — per-group bounds broadcast back, then
    * the bucket count; both engines compute the identical float
    * bucketing expression. Output: (grp, bin, n, lo, hi ROUND·,4). */
  def valueHistogram(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value", bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins >= 1")
    val bounds = events.groupBy(groupCol)
      .agg(min(col(valueCol)).as("_lo"), max(col(valueCol)).as("_hi"))
    val width = (col("_hi") - col("_lo")) / bins
    events.select(col(groupCol), col(valueCol))
      .join(broadcast(bounds), groupCol)
      .select(col(groupCol),
        when(col("_hi") === col("_lo"), 0L)
          .otherwise(least(lit(bins - 1).cast("long"),
            floor((col(valueCol) - col("_lo")) / width))).as("bin"),
        col("_lo"), width.as("_w"))
      .groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("n"),
        round(first(col("_lo")) + first(col("_w")) * col("bin"), 4).as("lo"),
        round(first(col("_lo")) + first(col("_w")) * (col("bin") + 1), 4).as("hi"))
      .orderBy(groupCol, "bin")
  }

  /** Exponentially time-decayed value per key — the streaming-feature
    * staple ("recent activity counts more"): Σ vᵢ·exp(−λ·(T_key − tᵢ))
    * with T_key the key's LAST event time and λ = ln2 / half-life, so a
    * contribution halves every `halfLifeHours`. The per-key anchor is a
    * frameless max-over-partition window — the same single shuffle the
    * weighted sum then reuses; no join, no second pass. Output:
    * (key, n, decayed ROUND·,4). */
  def decayedValue(events: DataFrame, key: String = "user_id",
      ts: String = "ts", valueCol: String = "value",
      halfLifeHours: Double = 24.0): DataFrame = {
    val lambda = math.log(2.0) / (halfLifeHours * 3600.0 * 1e6) // per µs
    val w = Window.partitionBy(key)
    events.select(col(key), col(ts), col(valueCol))
      .withColumn("_anchor", max(col(ts)).over(w))
      .groupBy(key)
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol) *
          exp(lit(-lambda) *
            (unix_micros(col("_anchor")) - unix_micros(col(ts))))), 4)
          .as("decayed"))
      .orderBy(key)
  }

  /** Hour-of-day seasonality per group: the 24-cell observed profile's
    * chi-square against uniformity, INCLUDING empty hours (a left join
    * against the tiny group×24 grid — zero-observation cells contribute
    * their full expected mass, which per-cell aggregation alone would
    * silently drop). Output: (grp, n, chi2 ROUND·,4); ~Poisson traffic
    * scores low, strongly diurnal traffic high. */
  def hourOfDayChi2(events: DataFrame, groupCol: String = "event_type",
      ts: String = "ts"): DataFrame = {
    val obs = events
      .groupBy(col(groupCol), hour(col(ts)).as("_hod"))
      .agg(count(lit(1)).as("o"))
    val grid = events.select(col(groupCol)).distinct()
      .crossJoin(events.sparkSession.range(24).toDF("_hod"))
    val full = grid.join(obs, Seq(groupCol, "_hod"), "left")
      .na.fill(0L, Seq("o"))
    val tot = full.groupBy(groupCol).agg(sum("o").as("_n"))
    full.join(broadcast(tot), groupCol)
      .groupBy(groupCol)
      .agg(first("_n").as("n"),
        round(sum(pow(col("o") - col("_n") / 24.0, 2) / (col("_n") / 24.0)), 4)
          .as("chi2"))
      .orderBy(groupCol)
  }

  /** Top-k most common length-3 event-type paths across user timelines
    * — the "what do users actually do" journey-mining staple. Two lags
    * on the same per-user window (one shuffle), a |types|³-bounded
    * count aggregation, global top-k as a TakeOrdered on
    * (count desc, path). Output: (path "a->b->c", n). */
  def topEventPaths(events: DataFrame, key: String = "user_id",
      ts: String = "ts", typeCol: String = "event_type",
      tieBreak: String = "event_id", topK: Int = 10): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    events.select(col(key), col(ts), col(tieBreak), col(typeCol))
      .withColumn("_p1", lag(col(typeCol), 1).over(w))
      .withColumn("_p2", lag(col(typeCol), 2).over(w))
      .where(col("_p2").isNotNull)
      .select(concat_ws("->", col("_p2"), col("_p1"), col(typeCol)).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)
  }

  /** Gini coefficient of `valueCol` per group — the concentration
    * diagnostic ("do 1% of events carry 90% of the value"): with the
    * group's values sorted ascending and 1-indexed by i,
    * G = 2·Σ(i·vᵢ) / (n·Σv) − (n+1)/n. One per-group window for the
    * rank (partitioned — never a global sort) and one aggregation.
    * Ties on value break by `tieBreak` for a total, engine-identical
    * order; the formula is rank-weighted so tie order doesn't change
    * the sum, but determinism keeps the plan replayable. */
  def giniByGroup(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value", tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(tieBreak))
    events.select(col(groupCol), col(valueCol), col(tieBreak))
      .withColumn("_i", row_number().over(w))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(lit(2) * sum(col("_i") * col(valueCol)) /
            (count(lit(1)) * sum(col(valueCol))) -
          (count(lit(1)) + 1).cast("double") / count(lit(1)), 4).as("gini"))
      .orderBy(groupCol)
  }

  /** Hourly Fano factor (burstiness index) per group: variance/mean of
    * the per-hour event counts — 1 for a Poisson arrival process, ≫1
    * for bursty traffic. Counts via one (group, hour) aggregation; the
    * dispersion from raw moments (n, Σc, Σc² — integer-exact in both
    * engines, so the float path matches bit-for-bit). Only hours with
    * ≥1 event count (the observed-support convention — document when
    * comparing to a zero-inflated definition). */
  def fanoHourly(events: DataFrame, groupCol: String = "event_type",
      ts: String = "ts"): DataFrame = {
    val hourly = events
      .groupBy(col(groupCol), date_trunc("hour", col(ts)).as("_h"))
      .agg(count(lit(1)).as("c"))
    hourly.groupBy(groupCol)
      .agg(count(lit(1)).as("n_hours"),
        sum(col("c")).as("_s"), sum(col("c") * col("c")).as("_q"))
      .select(col(groupCol), col("n_hours"),
        round(((col("_q") - col("_s") * col("_s") / col("n_hours")) / col("n_hours")) /
          (col("_s") / col("n_hours")), 4).as("fano"))
      .orderBy(groupCol)
  }

  /** Robust outlier census per group: median + MAD (median absolute
    * deviation) of `valueCol`, and the count of rows beyond
    * `k` × 1.4826 × MAD from the median (1.4826 scales MAD to σ under
    * normality — the standard robust z-score).
    *
    * Two aggregation rounds on the SAME small group key (median, then
    * median-of-deviations with the medians joined back broadcast), then
    * one flag-and-count pass — never a per-group sort materialized to one
    * task. Exact interpolating `percentile` keeps DuckDB
    * `quantile_cont` parity for the oracle; its agg buffer is a
    * per-(group,partition) distinct-value map merged on the reducer, so
    * at extreme cardinality swap in `approx_percentile` (same code
    * path, documented tolerance). Output: (group, n, n_outliers,
    * med ROUND·,4, mad ROUND·,4). */
  def madOutliers(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value", k: Double = 3.0): DataFrame = {
    val stats = robustStats(events, groupCol, valueCol)
    events.select(col(groupCol), col(valueCol))
      .join(broadcast(stats), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col(valueCol) - col("_med")) > lit(k * 1.4826) * col("_mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(first(col("_med")), 4).as("med"),
        round(first(col("_mad")), 4).as("mad"))
      .orderBy(groupCol)
  }

  /** RFM segmentation — the product-analytics user triage: per user,
    * Recency (µs since their last event, measured from the corpus max
    * ts — an exact integer), Frequency (event count) and Monetary
    * (value sum, ROUND·,4 BEFORE bucketing so both engines bucket the
    * identical number), each bucketed into quintiles 1–5 by exact
    * corpus-wide 20/40/60/80% thresholds (`bucket = 1 + Σ v > qᵢ`,
    * pure comparisons — no ntile, whose global-order window would
    * single-partition). Bucket 1 = most recent / fewest / least.
    * Shape: one user aggregation; thresholds are ONE scalar row
    * (exact interpolating percentile) broadcast back; bucketing is a
    * projection. Output: (user, r_us, f, m, r_q, f_q, m_q). */
  def rfmSegments(events: DataFrame, key: String = "user_id",
      ts: String = "ts", valueCol: String = "value"): DataFrame = {
    val per = events.groupBy(key)
      .agg(max(col(ts)).as("_last"), count(lit(1)).as("f"),
        round(sum(col(valueCol)), 4).as("m"))
    val anchored = per
      .crossJoin(broadcast(per.agg(max(col("_last")).as("_anchor"))))
      .select(col(key),
        (unix_micros(col("_anchor")) - unix_micros(col("_last"))).as("r_us"),
        col("f"), col("m"))
    val qs = anchored.agg(
      expr("percentile(r_us, array(0.2D, 0.4D, 0.6D, 0.8D))").as("qr"),
      expr("percentile(f, array(0.2D, 0.4D, 0.6D, 0.8D))").as("qf"),
      expr("percentile(m, array(0.2D, 0.4D, 0.6D, 0.8D))").as("qm"))
    def bucket(v: Column, q: Column): Column =
      (lit(1) + (0 until 4).map(i => when(v > q.getItem(i), 1).otherwise(0))
        .reduce(_ + _)).cast("long")
    anchored.crossJoin(broadcast(qs))
      .select(col(key), col("r_us"), col("f"), col("m"),
        bucket(col("r_us"), col("qr")).as("r_q"),
        bucket(col("f"), col("qf")).as("f_q"),
        bucket(col("m"), col("qm")).as("m_q"))
      .orderBy(key)
  }

  /** Time-weighted average per key — the step-function mean of a sampled
    * signal ("what was the average price/load, weighted by how LONG each
    * observation held"): Σ vᵢ·Δtᵢ / Σ Δtᵢ where Δtᵢ spans observation i
    * to the next one, last observation spanning nothing. The plain AVG
    * over-weights bursts of samples; TWA is the estimator billing/SLO
    * pipelines actually need. Δt stays in exact integer µs (lead() on the
    * one per-key window), so only the final ratio is floating-point. Keys
    * whose observations all share one timestamp have no span and are
    * dropped (an AVG there is a different, unweighted question). Output:
    * (key, n, twa ROUND·,4). */
  def timeWeightedAvg(events: DataFrame, key: String = "user_id",
      ts: String = "ts", valueCol: String = "value",
      tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    events.select(col(key), col(ts), col(valueCol), col(tieBreak))
      .withColumn("_dt",
        unix_micros(lead(col(ts), 1).over(w)) - unix_micros(col(ts)))
      .groupBy(key)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol) * col("_dt")).as("_num"),
        sum(col("_dt")).as("_den"))
      // an explicit span>0 guard, NOT a post-hoc null filter: 0/0 is NaN
      // in Spark but NULL in most SQL engines — the degenerate key must
      // be excluded before the division so both agree
      .where(col("_den").isNotNull && col("_den") > 0)
      .select(col(key), col("n"), round(col("_num") / col("_den"), 4).as("twa"))
      .orderBy(key)
  }

  /** Merge overlapping per-key intervals (gaps-and-islands): each event
    * opens the interval [ts, ts + lenSec); touching/overlapping intervals
    * coalesce into islands. The classic sibling of [[sessionize]] — a
    * session closes after a QUIET GAP of any length, an island closes
    * exactly when coverage stops — and the primitive behind "total
    * covered time" billing, availability windows, and span-coalescing.
    * One per-key window: an island opens where ts exceeds the running
    * max end over all PRIOR intervals (frame `UNBOUNDED PRECEDING, -1`),
    * island id is the running count of opens. Everything stays exact
    * integer µs end-to-end — coverage sums (max end − min start) longs,
    * so the hash compare never meets a float. Output:
    * (key, n_events, n_islands, coverage_us). */
  def mergeIntervals(events: DataFrame, key: String = "user_id",
      ts: String = "ts", lenSec: Long = 300L,
      tieBreak: String = "event_id"): DataFrame = {
    val lenUs = lenSec * 1000000L
    val w = Window.partitionBy(key).orderBy(col("_t"), col(tieBreak))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    events.select(col(key), unix_micros(col(ts)).as("_t"), col(tieBreak))
      // sentinel for the key's first row (empty prior frame): t-1 < t,
      // so the first interval always opens an island
      .withColumn("_open",
        when(col("_t") > coalesce(max(col("_t") + lenUs).over(prior),
          col("_t") - 1), 1L).otherwise(0L))
      .withColumn("_island", sum(col("_open")).over(w))
      .groupBy(col(key), col("_island"))
      .agg(count(lit(1)).as("_n"),
        (max(col("_t")) + lenUs - min(col("_t"))).as("_cov"))
      .groupBy(key)
      .agg(sum(col("_n")).as("n_events"),
        count(lit(1)).as("n_islands"),
        sum(col("_cov")).as("coverage_us"))
      .orderBy(key)
  }

  /** Per-group TRIMMED mean: drop the lowest and highest `pct`% of rows
    * by exact integer rank (cut = (n·pct) div 100 — never a float
    * boundary) and average the middle — the robust location estimate
    * between the mean (outlier-poisoned) and the median (throws away
    * 98% of the data). One key shuffle carries both ranking windows and
    * the final aggregate. Output: (grp, n, n_kept, tmean ROUND·,4). */
  def trimmedMean(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value", tieBreak: String = "event_id",
      pct: Int = 10): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(tieBreak))
    events.select(col(groupCol), col(valueCol), col(tieBreak))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .withColumn("_cut", expr(s"(_n * $pct) div 100"))
      .where(col("_rn") > col("_cut") && col("_rn") <= col("_n") - col("_cut"))
      .groupBy(groupCol)
      .agg(first(col("_n")).as("n"), count(lit(1)).as("n_kept"),
        round(avg(col(valueCol)), 4).as("tmean"))
      .orderBy(groupCol)
  }

  /** The frozen robust-stats table behind [[madOutliers]]: per group,
    * exact median `_med` and MAD `_mad`. Exposed separately so the
    * STREAMING anomaly gate ([[graft.streaming.Streams.robustAnomalyGate]])
    * can serve the batch-fit model against live events — the same
    * frozen-model pattern as the streaming topic scorer. */
  def robustStats(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val meds = events.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("_med"))
    val mads = events.select(col(groupCol), col(valueCol))
      .join(broadcast(meds), groupCol)
      .groupBy(groupCol)
      .agg(expr(s"percentile(abs($valueCol - _med), 0.5)").as("_mad"))
    meds.join(mads, groupCol)
  }

  /** CUSUM change-point detection per event type: the point where the
    * cumulative deviation from the series mean peaks — the standard
    * "when did the level shift" screen on a metric stream. Everything
    * is exact integer arithmetic: values quantize to 2-decimal longs
    * v = round(100·x), and the mean never materializes as a double —
    * the cumulative deviation is held n×-scaled as
    * Cᵢ = n·Σ_{j≤i} vⱼ − i·Σv, so the argmax is a deterministic
    * integer comparison with the row number as tie-break. |Cᵢ| ≤
    * n²·max v, which stays under 2⁵³ up to ~4·10⁵ rows per key at
    * 3-digit values; beyond that, quantize coarser (or pre-aggregate
    * to a bounded grid, as the hourly ops do) before this pass — the
    * n×-scaling trades headroom for exactness deliberately. The reported
    * `cusum_peak` de-scales to value units only at the end. Shape: one
    * type-keyed window cumsum + one per-type max — a single shuffle on
    * event_type. */
  def cusumChangePoint(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val v = events.select(col("event_type"), col("ts"), col("event_id"),
      round(col("value") * lit(100)).cast("long").as("v"))
    val cum = v
      .withColumn("rn", row_number().over(w))
      .withColumn("p", sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = v.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    cum.join(broadcast(tot), "event_type")
      .withColumn("c", col("n") * col("p") - col("rn") * col("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(abs(col("c")).desc, col("rn"))))
      .where(col("rk") === 1)
      .select(col("event_type"), col("n"), col("rn").cast("long").as("cp_rank"),
        col("event_id").as("cp_event_id"), col("ts").as("cp_ts"),
        round(abs(col("c")).cast("double") / (col("n") * lit(100)).cast("double"), 4)
          .as("cusum_peak"))
      .orderBy("event_type")
  }

  /** Per-group stats of an integer field EXTRACTED FROM the JSON props
    * column — the semi-structured → numeric pipeline every event schema
    * with a payload blob needs: n, mean, sd from exact integer moments
    * (sd² = (n·Σx² − (Σx)²)/n², one sqrt). One extraction projection +
    * one group aggregate. */
  def jsonFieldStats(events: DataFrame, path: String = "$.k",
      groupCol: String = "event_type"): DataFrame = {
    val x = events
      .select(col(groupCol), get_json_object(col("props"), path).cast("long").as("x"))
      .where(col("x").isNotNull)
    x.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("s2"))
      .select(col(groupCol), col("n"),
        round(col("s").cast("double") / col("n").cast("double"), 4).as("mean"),
        round(sqrt((col("n") * col("s2") - col("s") * col("s")).cast("double")
          / (col("n") * col("n")).cast("double")), 4).as("sd"))
      .orderBy(groupCol)
  }

  /** Weekly event-type share drift: each type's share of traffic per
    * ISO-ish week (epoch-week integers) and its max weekly swing
    * (max − min share) — the "did the mix shift week over week"
    * ops-dashboard row. Counts exact integers off one (week, type)
    * aggregate; shares single divisions; the swing is an order statistic
    * over identical doubles. */
  def weeklyShareDrift(events: DataFrame): DataFrame = {
    val wk = expr("unix_micros(ts) div 604800000000").as("week")
    val c = events.select(col("event_type"), wk)
      .groupBy("week", "event_type").agg(count(lit(1)).as("c"))
    val tot = c.groupBy("week").agg(sum("c").as("n"))
    val shares = c.join(broadcast(tot), "week")
      .withColumn("share", col("c").cast("double") / col("n").cast("double"))
    val swing = shares.groupBy("event_type")
      .agg(round(max(col("share")) - min(col("share")), 4).as("max_swing"))
    shares.join(broadcast(swing), "event_type")
      .select(col("week"), col("event_type"), col("c"),
        round(col("share"), 4).as("share"), col("max_swing"))
      .orderBy("week", "event_type")
  }

  /** New-vs-returning daily split: per epoch day, active users, the
    * users whose FIRST-ever event lands that day, the returning
    * remainder, and the new-user fraction — the growth-dashboard row
    * distinguishing acquisition from retention. One user-keyed min +
    * one day rollup; all exact integers, one division. */
  def newVsReturning(events: DataFrame): DataFrame = {
    val ed = expr("unix_micros(date_trunc('DAY', ts)) div 86400000000")
    val ud = events.select(col("user_id"), ed.as("d")).distinct()
    val firstDay = ud.groupBy("user_id").agg(min("d").as("d0"))
    val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
    val news = firstDay.groupBy(col("d0").as("d")).agg(count(lit(1)).as("new_users"))
    dau.join(news, Seq("d"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .select(col("d").as("epoch_day"), col("dau"), col("new_users"),
        (col("dau") - col("new_users")).as("returning"),
        round(col("new_users").cast("double") / col("dau").cast("double"), 4)
          .as("new_frac"))
      .orderBy("epoch_day")
  }

  /** Per-user behavioral-diversity entropy: Shannon entropy of each
    * user's event-type mix (the exact-integer ln form) — bots and
    * single-purpose scripts sit near 0 while organic users spread
    * across types; the per-entity sibling of [[hourlyTypeEntropy]].
    * One (user, type) count shuffle collapsing to a per-user rollup. */
  def userTypeEntropy(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type"))
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(sum("c").as("n"), count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
      .select(col("user_id"), col("n"), col("n_types"),
        round(log(col("n").cast("double"))
          - col("clnc") / col("n").cast("double"), 4).as("entropy"))
      .orderBy("user_id")

  /** Circular (directional) statistics of the hour-of-day per event
    * type: the mean hour as a DIRECTION (23:00 and 01:00 average to
    * midnight, not noon — the bug every linear mean-of-hours has) and
    * the resultant length R (1 = perfectly peaked, 0 = uniform). Hours
    * collapse to 24 exact integer counts; S = Σc·sin(2πh/24) and C
    * likewise fold their 24 terms in hour order (sin/cos of the same 24
    * doubles in both engines), and the one atan2/sqrt goes through
    * StableRound. One (type, hour) count shuffle. */
  def circularHourStats(events: DataFrame): DataFrame = {
    val hc = events.select(col("event_type"), hour(col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val twoPi = 2.0 * math.Pi
    val ang = col("h").cast("double") * lit(twoPi / 24.0)
    val folded = hc
      .select(col("event_type"), col("h"), col("c"),
        (col("c").cast("double") * sin(ang)).as("sv"),
        (col("c").cast("double") * cos(ang)).as("cv"))
      .groupBy("event_type")
      .agg(sum("c").as("n"),
        aggregate(sort_array(collect_list(struct(col("h"), col("sv")))),
          lit(0.0), (a, x) => a + x.getField("sv")).as("ss"),
        aggregate(sort_array(collect_list(struct(col("h"), col("cv")))),
          lit(0.0), (a, x) => a + x.getField("cv")).as("cc"))
    folded.select(col("event_type"), col("n"),
        graft.functions.StableRound.col4(
          (atan2(col("ss"), col("cc")) / lit(twoPi) * lit(24.0) + lit(24.0)) % lit(24.0))
          .as("mean_hour"),
        graft.functions.StableRound.col4(
          sqrt(col("ss") * col("ss") + col("cc") * col("cc")) / col("n").cast("double"))
          .as("r"))
      .orderBy("event_type")
  }

  /** Behavioral anomaly score: mean SURPRISAL of each user's event-type
    * path under the corpus's own first-order Markov model — the event
    * twin of the bigram-LM doc score ([[graft.ext.TextAnalysis.lmScore]]):
    * users whose transition patterns are atypical (bots, fraud,
    * instrumentation bugs) surface at the top. Transition probabilities
    * are exact count ratios; the per-user mean is the lmScore-class
    * AVG-of-ln (schedule-order drift ≪ the 1e-4 grid); ranking on the
    * ROUNDED score with user-id tie-break. Two passes over one
    * user-keyed lag window (model + scoring), model joined back on the
    * (from, to) key. */
  def pathSurprisal(events: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tr = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("f"))
      .withColumn("t", lead(col("f"), 1).over(w))
      .where(col("t").isNotNull)
    val counts = tr.groupBy("f", "t").agg(count(lit(1)).as("c"))
    val tot = counts.groupBy("f").agg(sum("c").as("n"))
    val lm = counts.join(broadcast(tot), "f")
      .select(col("f"), col("t"), (col("c").cast("double") / col("n")).as("p"))
    tr.join(broadcast(lm), Seq("f", "t"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_trans"), round(-avg(log(col("p"))), 4).as("nll"))
      .orderBy(col("nll").desc, col("user_id")).limit(k)
  }

  /** Session-count sensitivity to the gap parameter — the
    * banding-quality-eval sibling for sessionization: for each candidate
    * gap, #sessions = #users + #(Δt > gap) over ONE lag pass (every new
    * session after the first opens at a gap exceedance), plus the
    * continuation share. All exact integer µs comparisons; the Δt pass
    * is computed once and each gap is a conditional count over it. */
  def sessionGapCurve(events: DataFrame,
      gapsMinutes: Seq[Int] = Seq(5, 15, 30, 60)): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val dt = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("dt", unix_micros(col("ts"))
        - lag(unix_micros(col("ts")), 1).over(w))
    val base = dt.agg(countDistinct("user_id").as("n_users"),
      count(col("dt")).as("n_gaps"))
    val counts = gapsMinutes.map { g =>
      dt.agg(sum(when(col("dt") > g * 60000000L, 1L).otherwise(0L)).as("n_breaks"))
        .withColumn("gap_minutes", lit(g))
    }.reduce(_.unionAll(_))
    counts.crossJoin(broadcast(base))
      .select(col("gap_minutes"), col("n_users"),
        (col("n_users") + col("n_breaks")).as("n_sessions"),
        round(lit(1.0) - col("n_breaks").cast("double") / col("n_gaps").cast("double"), 4)
          .as("continuation_rate"))
      .orderBy("gap_minutes")
  }

  /** Kaplan–Meier survival curve of user LIFETIME (days between first
    * and last event), with right-censoring: users still active near the
    * corpus end (last event within `censorDays` of the global max) are
    * censored, not churned — the estimator every retention analysis
    * should use instead of naive survival (which treats the censored
    * tail as churn). The horizon is in HOURS: the fixture's users stay
    * active to within ~a day of the corpus end, so a day-scale horizon
    * censors everyone (an empty curve); 12h splits the population.
    * Durations are exact epoch-day integers; risk/death
    * counts are exact integers per distinct duration (bounded by the
    * TIME SPAN, not the user count), and S(t) = Π(1 − dⱼ/nⱼ) is an
    * ordered cumulative over those few rows via exp(Σ ln(·)) with
    * StableRound absorbing the ≤1-ulp libm drift (the EWMA-class
    * contract). One user-keyed aggregate + one span-bounded rollup. */
  def kaplanMeier(events: DataFrame, censorHours: Int = 12): DataFrame = {
    val u = events.groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t0"), max(unix_micros(col("ts"))).as("t1"))
    val gmax = u.agg(max("t1").as("gm"))
    val users = u.crossJoin(broadcast(gmax))
      .select(expr("(t1 - t0) div 86400000000").as("dur"),
        (col("gm") - col("t1") > lit(censorHours) * lit(3600000000L))
          .cast("long").as("observed"))
    val times = users.where(col("observed") === 1)
      .groupBy("dur").agg(count(lit(1)).as("d"))
    // n_risk(t) = users with dur >= t: a suffix cumulative over the
    // span-bounded distinct-duration rows — no user-count theta join
    val durCounts = users.groupBy("dur").agg(count(lit(1)).as("cnt"))
    val risk = durCounts.withColumn("n_risk",
      sum("cnt").over(Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("dur"), col("n_risk"))
    val w = Window.orderBy("dur") // span-bounded rows (distinct durations)
    times.join(risk, "dur")
      .withColumn("s", exp(sum(log(
        (col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double")))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .select(col("dur").as("t"), col("n_risk"), col("d").as("d_events"),
        graft.functions.StableRound.col4(col("s")).as("survival"))
      .orderBy("t")
  }

  /** Nelson–Aalen cumulative hazard — [[kaplanMeier]]'s additive twin
    * (H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, preferred for hazard-rate reading and
    * small samples; S ≈ e^{−H} links the two). Same censoring
    * convention, same span-bounded distinct-duration rollup + suffix
    * risk cumulative; the hazard increments are exact integer ratios
    * and both the H and variance (Σ dᵢ/nᵢ²) cumulatives fold in
    * duration order. Output: (t, n_risk, d_events, hazard, var_h). */
  def nelsonAalen(events: DataFrame, censorHours: Int = 12): DataFrame = {
    val u = events.groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t0"), max(unix_micros(col("ts"))).as("t1"))
    val gmax = u.agg(max("t1").as("gm"))
    val users = u.crossJoin(broadcast(gmax))
      .select(expr("(t1 - t0) div 86400000000").as("dur"),
        (col("gm") - col("t1") > lit(censorHours) * lit(3600000000L))
          .cast("long").as("observed"))
    val times = users.where(col("observed") === 1)
      .groupBy("dur").agg(count(lit(1)).as("d"))
    val durCounts = users.groupBy("dur").agg(count(lit(1)).as("cnt"))
    val risk = durCounts.withColumn("n_risk",
      sum("cnt").over(Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("dur"), col("n_risk"))
    val w = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    times.join(risk, "dur")
      .withColumn("h", sum(col("d").cast("double") / col("n_risk").cast("double"))
        .over(w))
      .withColumn("vh", sum(col("d").cast("double")
        / (col("n_risk") * col("n_risk")).cast("double")).over(w))
      .select(col("dur").as("t"), col("n_risk"), col("d").as("d_events"),
        graft.functions.StableRound.col4(col("h")).as("hazard"),
        graft.functions.StableRound.col4(col("vh")).as("var_h"))
      .orderBy("t")
  }

  /** Log-rank test comparing the survival of two user cohorts (user-id
    * parity — the fixture's deterministic split): did variant B's users
    * churn on a different clock? The survival-family completion next to
    * [[kaplanMeier]] / [[nelsonAalen]]. At each observed event time
    *   E₁ += d·n₁/n,  V += d·(n₁/n)(1−n₁/n)(n−d)/(n−1)
    * with all d/n counts exact integers off the same censoring + suffix
    * risk machinery (per-group risk via two cumulative columns on the
    * span-bounded distinct-duration rollup); the E/V accumulations fold
    * in duration order. χ² = (O₁−E₁)²/V (1 df), z signed by O₁−E₁.
    * Output (one row): n_times, o1, e1, v, chi2, z. */
  def logRank(events: DataFrame, censorHours: Int = 12): DataFrame = {
    val u = events.groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t0"), max(unix_micros(col("ts"))).as("t1"))
      .withColumn("grp", (col("user_id") % 2).cast("int"))
    val gmax = u.agg(max("t1").as("gm"))
    val users = u.crossJoin(broadcast(gmax))
      .select(col("grp"), expr("(t1 - t0) div 86400000000").as("dur"),
        (col("gm") - col("t1") > lit(censorHours) * lit(3600000000L))
          .cast("long").as("observed"))
    val dc = users.groupBy("dur").agg(
      count(lit(1)).as("cnt"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("cnt1"),
      sum(col("observed")).as("d"),
      sum(when(col("grp") === 1, col("observed")).otherwise(0L)).as("d1"))
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = dc
      .withColumn("n", sum("cnt").over(wDesc))
      .withColumn("n1", sum("cnt1").over(wDesc))
      .where(col("d") > 0)
    val terms = risk.select(col("dur"), col("d"), col("d1"),
      (col("d").cast("double") * col("n1").cast("double") / col("n").cast("double"))
        .as("e1"),
      when(col("n") > 1,
        col("d").cast("double") * (col("n1").cast("double") / col("n").cast("double"))
          * (lit(1.0) - col("n1").cast("double") / col("n").cast("double"))
          * (col("n") - col("d")).cast("double") / (col("n") - 1).cast("double"))
        .otherwise(lit(0.0)).as("v"))
    val agg = terms.agg(
      count(lit(1)).as("n_times"), sum("d1").as("o1"),
      aggregate(sort_array(collect_list(struct(col("dur"), col("e1")))),
        lit(0.0), (a, x) => a + x.getField("e1")).as("e1"),
      aggregate(sort_array(collect_list(struct(col("dur"), col("v")))),
        lit(0.0), (a, x) => a + x.getField("v")).as("v"))
    agg.select(col("n_times"), col("o1"),
      round(col("e1"), 4).as("e1"), round(col("v"), 4).as("v"),
      (round(when(col("v") > 0.0,
        (col("o1").cast("double") - col("e1")) * (col("o1").cast("double") - col("e1"))
          / col("v")), 4) + lit(0.0)).as("chi2"),
      (round(when(col("v") > 0.0,
        signum(col("o1").cast("double") - col("e1")) *
          sqrt((col("o1").cast("double") - col("e1"))
            * (col("o1").cast("double") - col("e1")) / col("v"))), 4) + lit(0.0))
        .as("z"))
  }

  /** Delete-one-group JACKKNIFE standard error of the mean event value —
    * the distributed-friendly uncertainty estimate (resampling without
    * replication): events hash into B deterministic buckets, each
    * leave-one-bucket-out mean is a ratio of exact integer sums (values
    * in 1e-4 units), and the SE folds the B pseudo-value deviations in
    * bucket order. One bucket-keyed aggregate; B-row driver-free math.
    * Output: one row per bucket (n_b, loo_mean) with the overall mean,
    * jackknife SE, and n riders. */
  def jackknifeSe(events: DataFrame, buckets: Int = 10): DataFrame = {
    val b = events.where(col("value").isNotNull)
      .select(round(col("value") * lit(10000)).cast("long").as("v"),
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("nb"), sum("v").as("sb"))
    val tot = b.agg(sum("nb").as("n"), sum("sb").as("s"),
      count(lit(1)).as("nbuck"))
    val loo = b.crossJoin(broadcast(tot))
      .withColumn("loo_mean", (col("s") - col("sb")).cast("double")
        / ((col("n") - col("nb")) * lit(10000)).cast("double"))
    val mbar = loo.agg(
      aggregate(sort_array(collect_list(struct(col("bucket"), col("loo_mean")))),
        lit(0.0), (a, x) => a + x.getField("loo_mean")).as("msum"),
      first(col("nbuck")).as("nb2"))
      .select((col("msum") / col("nb2").cast("double")).as("mbar"))
    val se = loo.crossJoin(broadcast(mbar)).agg(
      aggregate(sort_array(collect_list(struct(col("bucket"),
          ((col("loo_mean") - col("mbar")) * (col("loo_mean") - col("mbar")))
            .as("dev2")))),
        lit(0.0), (a, x) => a + x.getField("dev2")).as("ss"),
      first(col("nbuck")).as("bk"))
      .select(sqrt((col("bk") - 1).cast("double") / col("bk").cast("double")
        * col("ss")).as("se"))
    loo.crossJoin(broadcast(se))
      .select(col("bucket"), col("nb").as("n_b"),
        round(col("loo_mean"), 4).as("loo_mean"),
        round(col("s").cast("double") / (col("n") * lit(10000)).cast("double"), 4)
          .as("mean"),
        round(col("se"), 6).as("jack_se"), col("n"))
      .orderBy("bucket")
  }

  /** DAU/WAU/MAU + stickiness — the engagement dashboard row: per day,
    * distinct active users that day, over the trailing 7 days, over the
    * trailing 30 days, and DAU/MAU. Computed WITHOUT per-day rescans:
    * each (user, active-day) row covers the next 7 (resp. 30) result
    * days via an in-row integer sequence explode — a constant-factor
    * fan-out (the sliding-distinct-actives scheme), then one distinct
    * count per day. Days ride as exact epoch-day integers; stickiness
    * is one division of exact longs. */
  def stickiness(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"),
        expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("ed"))
      .distinct()
    val bounds = ud.agg(min("ed").as("ed0"), max("ed").as("ed1"))
    def cover(win: Int) = ud.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("ed"), least(col("ed") + lit(win - 1), col("ed1"))))
          .as("d"))
      .groupBy("d").agg(countDistinct(col("user_id")).as(s"au$win"))
    val dau = ud.groupBy(col("ed").as("d")).agg(countDistinct("user_id").as("dau"))
    val grid = bounds.select(explode(sequence(col("ed0"), col("ed1"))).as("d"))
    grid
      .join(dau, Seq("d"), "left")
      .join(cover(7), Seq("d"), "left")
      .join(cover(30), Seq("d"), "left")
      .select(col("d").as("epoch_day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("au7"), lit(0L)).as("wau"),
        coalesce(col("au30"), lit(0L)).as("mau"))
      .withColumn("stickiness",
        when(col("mau") > 0,
          round(col("dau").cast("double") / col("mau").cast("double"), 4)))
      .orderBy("epoch_day")
  }

  /** Seasonal-naive forecast error per type — the baseline every real
    * forecaster must beat, and the cheapest seasonality detector (if
    * lag-24 MAE ≪ lag-1 MAE the series has a daily cycle): forecast
    * ĉ(h) = c(h−24) (and the lag-1 naive twin) over the CONTIGUOUS
    * hourly grid, scored by MAE and RMSE on the hours where both lags
    * exist. Counts and error sums are exact integers; the divisions and
    * sqrt are single engine-identical ops. One (type, hour) count
    * shuffle + one window, over the trailing `maxSpanHours` grid
    * (default [[GridMaxSpanHours]]). */
  def seasonalNaiveError(events: DataFrame,
      maxSpanHours: Int = GridMaxSpanHours): DataFrame = {
    require(maxSpanHours >= 25, s"maxSpanHours must be >= 25, got $maxSpanHours")
    val hc = events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = hc.groupBy("event_type").agg(min("h").as("hmin"), max("h").as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = span.select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("h")
    grid
      .withColumn("l24", lag(col("c"), 24).over(w))
      .withColumn("l1", lag(col("c"), 1).over(w))
      .where(col("l24").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(abs(col("c") - col("l24"))).as("ae24"),
        sum((col("c") - col("l24")) * (col("c") - col("l24"))).as("se24"),
        sum(abs(col("c") - col("l1"))).as("ae1"),
        sum((col("c") - col("l1")) * (col("c") - col("l1"))).as("se1"))
      .select(col("event_type"), col("n"),
        round(col("ae24").cast("double") / col("n").cast("double"), 4).as("mae24"),
        round(sqrt(col("se24").cast("double") / col("n").cast("double")), 4).as("rmse24"),
        round(col("ae1").cast("double") / col("n").cast("double"), 4).as("mae1"),
        round(sqrt(col("se1").cast("double") / col("n").cast("double")), 4).as("rmse1"))
      .orderBy("event_type")
  }

  /** Per-hour Shannon entropy of the event-type mix — the traffic-
    * diversity monitor (a collapse to one type = an incident or a bot
    * flood even when volume looks normal): H = ln n − (Σc·ln c)/n with
    * every ln over exact integer counts (the proven cross-engine
    * entropy form). One (hour, type) count aggregate collapsing to an
    * H×T grid, then an H-row rollup. */
  def hourlyTypeEntropy(events: DataFrame): DataFrame =
    events.select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .groupBy("h", "event_type").agg(count(lit(1)).as("c"))
      .groupBy("h")
      .agg(sum("c").as("n"), count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
      .select(col("h"), col("n"), col("n_types"),
        round(log(col("n").cast("double"))
          - col("clnc") / col("n").cast("double"), 4).as("entropy"))
      .orderBy("h")

  /** Peak detection on the hourly count series per type: a peak is a
    * STRICT local maximum over the contiguous hour grid (missing hours
    * = 0, so a spike after a quiet gap still has real neighbors) that
    * also clears mean + 2σ, with mean/σ from exact integer moments
    * (σ² = (H·Σc² − (Σc)²)/H²) — the alerting primitive behind "which
    * hours actually spiked". Comparisons pit exact integer counts
    * against engine-identical threshold doubles. Shape: one (type,
    * hour) count shuffle, trailing-`maxSpanHours`-bounded grid explode
    * (default [[GridMaxSpanHours]]), one window. */
  def hourlyPeaks(events: DataFrame,
      maxSpanHours: Int = GridMaxSpanHours): DataFrame = {
    require(maxSpanHours >= 3, s"maxSpanHours must be >= 3, got $maxSpanHours")
    val hc = events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = hc.groupBy("event_type").agg(min("h").as("hmin"), max("h").as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = span.select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val m = grid.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("nh").cast("double"))
      .withColumn("sd", sqrt(
        (col("nh") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("nh") * col("nh")).cast("double")))
    val w = Window.partitionBy("event_type").orderBy("h")
    grid
      .withColumn("prev", coalesce(lag(col("c"), 1).over(w), lit(-1L)))
      .withColumn("next", coalesce(lead(col("c"), 1).over(w), lit(-1L)))
      .join(broadcast(m.select(col("event_type"), col("mean"), col("sd"))), "event_type")
      .where(col("c") > col("prev") && col("c") > col("next") &&
        col("c").cast("double") > col("mean") + lit(2.0) * col("sd"))
      .select(col("event_type"),
        expr("unix_micros(h) div 3600000000").as("epoch_hour"), col("c"),
        round(col("mean") + lit(2.0) * col("sd"), 4).as("threshold"))
      .orderBy("event_type", "epoch_hour")
  }

  /** Tukey IQR-fence outlier census per group — the boxplot complement
    * of [[madOutliers]] (IQR fences are what BI dashboards draw; MAD is
    * the robust-z screen): exact interpolating quartiles (Spark
    * `percentile` ≡ DuckDB `quantile_cont` — the proven pairing), fences
    * at q1 − 1.5·IQR / q3 + 1.5·IQR, and low/high outlier counts. The
    * fences are computed from identical doubles in both engines, so the
    * strict comparisons count identically. Two same-key aggregation
    * rounds with the quartiles broadcast back — one shuffle twice, never
    * a global sort. */
  def iqrOutliers(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val q = events.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.25)").as("_q1"),
        expr(s"percentile($valueCol, 0.75)").as("_q3"))
      .withColumn("_lo", col("_q1") - lit(1.5) * (col("_q3") - col("_q1")))
      .withColumn("_hi", col("_q3") + lit(1.5) * (col("_q3") - col("_q1")))
    events.select(col(groupCol), col(valueCol))
      .join(broadcast(q), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(when(col(valueCol) < col("_lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col(valueCol) > col("_hi"), 1L).otherwise(0L)).as("n_high"),
        round(first(col("_q1")), 4).as("q1"), round(first(col("_q3")), 4).as("q3"),
        round(first(col("_lo")), 4).as("fence_lo"),
        round(first(col("_hi")), 4).as("fence_hi"))
      .orderBy(groupCol)
  }

  /** Two-proportion z-test on the `convEvent` share of traffic between
    * two deterministic variants (user_id parity — the hash-bucket
    * assignment an experimentation platform uses): n = events in the
    * variant, c = its `convEvent` events. All counts are exact integers
    * off ONE aggregate; the z statistic is a closed form over four longs
    * (pooled-variance form), so both engines divide the same exact
    * numerators. Degenerate pooled rates (0 or 1 — zero variance) yield
    * NULL z rather than an ANSI divide-by-zero. Output: one row with
    * per-variant n/conversions/rates and z. */
  def abTest(events: DataFrame, convEvent: String = "purchase"): DataFrame = {
    val v = events
      .withColumn("variant", (col("user_id") % 2).cast("int"))
      .groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === convEvent, 1L).otherwise(0L)).as("c"))
    val wide = v.where(col("variant") === 0)
      .select(col("n").as("n0"), col("c").as("c0"))
      .crossJoin(v.where(col("variant") === 1)
        .select(col("n").as("n1"), col("c").as("c1")))
    val p0 = col("c0").cast("double") / col("n0")
    val p1 = col("c1").cast("double") / col("n1")
    val pp = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    wide.select(col("n0"), col("c0"), col("n1"), col("c1"),
      round(p0, 4).as("rate0"), round(p1, 4).as("rate1"),
      when(pp > 0.0 && pp < 1.0,
        round((p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 4)).as("z"))
  }

  /** XmR (individuals + moving-range) control chart summary per group —
    * the SPC screen behind "is this metric stream in statistical
    * control": mean of the 2-decimal-quantized values, mean moving range
    * MR̄ = Σ|vᵢ−vᵢ₋₁|/(n−1), control limits mean ± 2.66·MR̄, and the
    * count of points outside them. Sums are over exact integer
    * 2-decimal units (one lag window + one aggregate on the same key
    * shuffle), so the limit doubles and the strict comparisons are
    * engine-identical. Groups need n ≥ 2 (no moving range otherwise). */
  def controlChart(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val v = events.select(col("event_type"), col("ts"), col("event_id"),
        round(col("value") * lit(100)).cast("long").as("v"))
      .withColumn("mr", abs(col("v") - lag(col("v"), 1).over(w)))
    val agg = v.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), sum("mr").as("smr"))
      .where(col("n") >= 2)
      .withColumn("mean", col("sv").cast("double") / (col("n") * lit(100)).cast("double"))
      .withColumn("mrbar",
        col("smr").cast("double") / ((col("n") - 1) * lit(100)).cast("double"))
      .withColumn("ucl", col("mean") + lit(2.66) * col("mrbar"))
      .withColumn("lcl", col("mean") - lit(2.66) * col("mrbar"))
    v.join(broadcast(agg), "event_type")
      .groupBy("event_type")
      .agg(first(col("n")).as("n"),
        round(first(col("mean")), 4).as("mean"),
        round(first(col("mrbar")), 4).as("mrbar"),
        round(first(col("ucl")), 4).as("ucl"),
        round(first(col("lcl")), 4).as("lcl"),
        sum(when(col("v").cast("double") / lit(100.0) > col("ucl"), 1L)
          .when(col("v").cast("double") / lit(100.0) < col("lcl"), 1L)
          .otherwise(0L)).as("n_out"))
      .orderBy("event_type")
  }

  /** Stationary distribution of the per-user event-type Markov chain
    * (where does the process spend its time in the long run) by power
    * iteration from uniform. The transition-count table is built
    * DISTRIBUTED (one user-keyed lag window — the same shuffle as
    * [[eventTransitions]]); only the S×S probability matrix is
    * collected, guarded by `maxStates` (S = event-type cardinality — a
    * handful in any real schema; the iteration is O(S²) driver work on
    * exact count ratios). Rows with no outgoing transitions would leak
    * mass, so states absent as a `from` keep their mass (self-loop) —
    * the standard dangling fix. Folds run in ascending state order so
    * the double association is engine-identical. */
  def markovStationary(events: DataFrame, iters: Int = 25,
      maxStates: Int = 1000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("f"))
      .withColumn("t", lead(col("f"), 1).over(w))
      .where(col("t").isNotNull)
      .groupBy("f", "t").agg(count(lit(1)).as("c"))
    val mat = trans.as[(String, String, Long)].collect()
    val states = events.select(col("event_type")).distinct()
      .as[String].collect().sorted
    require(states.length <= maxStates,
      s"markovStationary: ${states.length} states exceeds maxStates=$maxStates")
    val idx = states.zipWithIndex.toMap
    val n = states.length
    val outTot = new Array[Long](n)
    mat.foreach { case (f, _, c) => outTot(idx(f)) += c }
    // p(i)(j): exact count ratios; dangling states self-loop
    val p = Array.tabulate(n, n) { (i, j) =>
      if (outTot(i) == 0L) { if (i == j) 1.0 else 0.0 } else 0.0
    }
    mat.foreach { case (f, t, c) => p(idx(f))(idx(t)) = c.toDouble / outTot(idx(f)) }
    var pi = Array.fill(n)(1.0 / n)
    (0 until iters).foreach { _ =>
      val next = Array.tabulate(n) { j =>
        var acc = 0.0
        var i = 0
        while (i < n) { acc += pi(i) * p(i)(j); i += 1 } // ascending-i fold
        acc
      }
      pi = next
    }
    spark.createDataset(states.indices.map(i => (states(i), pi(i))))
      .toDF("event_type", "pi")
      .select(col("event_type"), graft.functions.StableRound.col4(col("pi")).as("pi"))
      .orderBy("event_type")
  }

  /** Lag-k autocorrelation of the hourly event-count series per type —
    * the seasonality/self-similarity probe behind "is this stream
    * periodic or memoryless" (white noise ⇒ r≈0 at every lag; a daily
    * cycle ⇒ a positive bump at lag 24). The hour grid is made
    * CONTIGUOUS first (missing hours count 0 — skipping them would
    * silently splice non-adjacent hours into 'adjacent' pairs), then
    * each lag pairs the series with its lead and Pearson r comes out of
    * integer moment sums (counts are exact ints, so nΣxy, ΣxΣy,… are
    * exact and both engines divide the same numerators) — the
    * Heaps/Zipf deterministic-moment pattern. Shape: one (type, hour)
    * count aggregate, a per-type hour-sequence explode (bounded by the
    * TRAILING `maxSpanHours` analysis window, not the event count —
    * the [[mannKendall]] bound treatment; a no-op at fixture spans),
    * and one window lead per lag. */
  def hourlyAutocorr(events: DataFrame, maxLag: Int = 3,
      maxSpanHours: Int = GridMaxSpanHours): DataFrame = {
    require(maxSpanHours > maxLag, s"maxSpanHours must exceed maxLag")
    val hc = events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = hc.groupBy("event_type").agg(min("h").as("hmin"), max("h").as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = span.select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("h")
    val lags = (1 to maxLag).map { lag =>
      grid.withColumn("y", lead(col("c"), lag).over(w))
        .where(col("y").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("m"), sum("c").as("sx"), sum("y").as("sy"),
          sum(col("c") * col("y")).as("sxy"),
          sum(col("c") * col("c")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("lag", lit(lag))
    }
    val num = (col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (col("m") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("m") * col("syy") - col("sy") * col("sy")).cast("double")
    lags.reduce(_.unionAll(_))
      .select(col("event_type"), col("lag"), col("m").as("n_pairs"),
        when(col("m") > 1 && dx > 0 && dy > 0,
          round(num / (sqrt(dx) * sqrt(dy)), 4)).as("r"))
      .orderBy("event_type", "lag")
  }

  /** Markov REMOVAL-EFFECT attribution (Anderl et al. 2014) — the
    * data-driven multi-touch model next to [[lastTouchAttribution]]'s
    * heuristic one: build the first-order Markov chain over per-user
    * touch journeys ((start) → touches → (conv) at the first
    * conversion event, else (null)), compute the 25-step truncated
    * absorption probability P(conv | start), and credit each channel
    * by how much that probability drops when the channel is removed
    * (removal = pin the channel's absorption value to 0 — exactly
    * redirecting its inbound mass to (null)). Transition probabilities
    * are exact count ratios; each iteration folds targets in ascending
    * state order (the [[markovStationary]] double-association
    * contract), so all six truncated chains replay bit-for-bit in the
    * unrolled MATERIALIZED-CTE oracle.
    *
    * Scale shape: journeys are two windows on one user shuffle; only
    * the S×S count matrix is collected (maxStates-guarded) — the
    * (1+channels) chain evaluations are driver-side S²-flop loops.
    * Output per channel: p_full, p_removed, removal_effect,
    * share (= RE/ΣRE, channel-ordered fold). */
  def markovAttribution(events: DataFrame, convType: String = "purchase",
      iters: Int = 25, maxStates: Int = 50): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seq0 = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
    val firstp = seq0.where(col("event_type") === convType)
      .groupBy("user_id").agg(min("rn").as("pr"))
    val touch = seq0.join(firstp, Seq("user_id"), "left")
      .where(col("pr").isNull || col("rn") < col("pr"))
    val lagW = Window.partitionBy("user_id").orderBy("rn")
    val tr1 = touch.withColumn("prev", lag(col("event_type"), 1).over(lagW))
      .select(coalesce(col("prev"), lit("(start)")).as("f"),
        col("event_type").as("t"))
    val lastT = touch
      .withColumn("r", row_number().over(
        Window.partitionBy("user_id").orderBy(col("rn").desc)))
      .where(col("r") === 1)
      .select(col("event_type").as("f"),
        when(col("pr").isNotNull, "(conv)").otherwise("(null)").as("t"))
    val startConv = firstp.where(col("pr") === 1)
      .select(lit("(start)").as("f"), lit("(conv)").as("t"))
    val mat = tr1.unionAll(lastT).unionAll(startConv)
      .groupBy("f", "t").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val states = (mat.map(_._1) ++ mat.map(_._2)).distinct.sorted
    require(states.length <= maxStates,
      s"markovAttribution: ${states.length} states exceeds maxStates=$maxStates")
    val idx = states.zipWithIndex.toMap
    val n = states.length
    val outTot = new Array[Long](n)
    mat.foreach { case (f, _, c) => outTot(idx(f)) += c }
    val p = Array.fill(n, n)(0.0)
    mat.foreach { case (f, t, c) =>
      p(idx(f))(idx(t)) = c.toDouble / outTot(idx(f)) }
    val conv = idx.get("(conv)"); val nul = idx.get("(null)")
    val start = idx.get("(start)")
    def absorb(removed: Option[Int]): Double = {
      var x = Array.tabulate(n)(i => if (conv.contains(i)) 1.0 else 0.0)
      (0 until iters).foreach { _ =>
        val next = Array.tabulate(n) { i =>
          if (conv.contains(i)) 1.0
          else if (nul.contains(i) || removed.contains(i)) 0.0
          else {
            var acc = 0.0; var j = 0
            while (j < n) { acc += p(i)(j) * x(j); j += 1 } // ascending-j fold
            acc
          }
        }
        x = next
      }
      start.map(x).getOrElse(0.0)
    }
    val pFull = absorb(None)
    val channels = states
      .filterNot(s => s == "(start)" || s == "(conv)" || s == "(null)")
    val res = channels.map { c => (c, absorb(Some(idx(c)))) }
    val reSum = res.map { case (_, pr) =>
      if (pFull > 0.0) 1.0 - pr / pFull else 0.0 }.sum // channel-ordered
    spark.createDataset(res.toSeq).toDF("channel", "p_removed")
      .select(col("channel"), lit(pFull).as("p_full"), col("p_removed"),
        when(lit(pFull) > 0.0,
          round(lit(1.0) - col("p_removed") / lit(pFull), 4)).as("removal_effect"),
        when(lit(reSum) > 0.0 && lit(pFull) > 0.0,
          round((lit(1.0) - col("p_removed") / lit(pFull)) / lit(reSum), 4))
          .as("share"))
      .select(col("channel"), round(col("p_full"), 4).as("p_full"),
        round(col("p_removed"), 4).as("p_removed"), col("removal_effect"),
        col("share"))
      .orderBy("channel")
  }

  /** Poisson-BOOTSTRAP confidence interval for the mean value — the
    * uncertainty number [[jackknifeSe]]'s normal approximation can't
    * give when the distribution is skewed (percentile CI needs no
    * normality). Classic distributed bootstrap (Poisson(1) weights ≈
    * multinomial resampling without coordination): each row draws a
    * DETERMINISTIC per-replicate weight from the md5-uniform inverse
    * Poisson CDF (the [[Profile.dpCounts]] RNG substitute — same hash,
    * same resample, replayable in SQL), each replicate's mean is a
    * ratio of exact integer sums, and the CI is the interpolating
    * percentile over the B replicate means (the proven
    * percentile/quantile_cont pairing).
    *
    * Scale shape: a B× in-row fan-out into ONE map-side-combined
    * aggregate of B rows — no data is ever materialized resampled. The
    * per-replicate uniform comes from an 8-hex-char SLICE of a shared
    * digest (md5(salt:event:⌊bi/4⌋), four independent 32-bit uniforms
    * per digest — the [[graft.ext.Dedup.minhashFamily]] economy), so
    * the md5 count is B/4 per row, not B: the digest dominates the
    * fan-out cost (measured 6.1 s → 3.7 s warm at sf0.1, B = 50). */
  def bootstrapCi(events: DataFrame, b: Int = 50,
      salt: String = "boot1"): DataFrame = {
    require(b >= 10, "need at least 10 replicates")
    // Poisson(1) inverse-CDF thresholds c_k = Σ_{j≤k} e⁻¹/j!, capped at 6
    val thresholds = {
      var fact = 1.0; var s = 0.0
      (0 to 5).map { k =>
        if (k > 0) fact *= k
        s += math.exp(-1.0) / fact
        s
      }
    }
    // spreadForCompute: the ×B md5 fan-out below is pure per-row CPU over
    // a scan whose file count bounds its task count — the whole digest
    // stage ran as ONE 3.8 s task on the single-file fixture table.
    // Repartitioning the two-column projection is bytes-cheap at any
    // scale and lets the fan-out use the cluster.
    val v = Dedup.spreadForCompute(events.where(col("value").isNotNull)
      .select(col("event_id"), round(col("value") * 100).cast("long").as("vc")))
    val nd = (b + 3) / 4
    val rep = v.select(col("event_id"), col("vc"),
        explode(sequence(lit(0), lit(nd - 1))).as("di"))
      .withColumn("dg", md5(concat(lit(salt + ":"),
        col("event_id").cast("string"), lit(":"), col("di").cast("string"))))
      .select(col("vc"),
        posexplode(array((0 until 4).map(t =>
          substring(col("dg"), t * 8 + 1, 8)): _*)).as(Seq("slot", "u8")),
        (col("di") * 4 + lit(1)).as("bi0"))
      .select(col("vc"), (col("bi0") + col("slot")).as("bi"), col("u8"))
      .where(col("bi") <= b)
    val u = (conv(col("u8"), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val k = thresholds.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (acc, (c, i)) =>
        acc.when(col("u") < lit(c), i)
      }.otherwise(6)
    val means = rep.withColumn("u", u)
      .withColumn("k", k)
      .groupBy("bi")
      .agg(sum(col("k") * col("vc")).as("skv"), sum("k").as("sk"))
      .where(col("sk") > 0)
      .select(col("bi"),
        (col("skv").cast("double") / (col("sk") * 100).cast("double")).as("m"))
    val tot = v.agg(count(lit(1)).as("n"), sum("vc").as("s"))
    means.agg(count(lit(1)).as("b"),
        expr("percentile(m, 0.025)").as("lo"),
        expr("percentile(m, 0.5)").as("med"),
        expr("percentile(m, 0.975)").as("hi"))
      .crossJoin(broadcast(tot))
      .select(col("b"), col("n"),
        round(col("s").cast("double") / (col("n") * 100).cast("double"), 4)
          .as("mean"),
        round(col("lo"), 4).as("ci_lo"), round(col("med"), 4).as("ci_med"),
        round(col("hi"), 4).as("ci_hi"))
  }

  /** Pairwise cosine similarity of the event types' HOUR-OF-DAY count
    * profiles — which behaviors share a daily shape (the "is `error`
    * traffic-shaped or batch-shaped" readout, and the feature the
    * hourly-seasonality ops summarize one type at a time). Dot products
    * and norms are exact integer sums over the 24-cell profiles (absent
    * hours contribute 0 to both, so the inner join IS the full-grid
    * computation); one sqrt each at the end. Shape: one (type, hod)
    * rollup + a |types|²-bounded hod equi-join. */
  def profileCosine(events: DataFrame): DataFrame = {
    val c = events
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("c"))
    val n = c.groupBy("event_type").agg(sum(col("c") * col("c")).as("n2"))
    val dp = c.toDF("type_a", "hod", "ca")
      .join(c.toDF("type_b", "hod", "cb"), "hod")
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(sum(col("ca") * col("cb")).as("dp"))
    dp.join(broadcast(n.toDF("type_a", "na")), "type_a")
      .join(broadcast(n.toDF("type_b", "nb")), "type_b")
      .select(col("type_a"), col("type_b"),
        round(col("dp").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
          4).as("cosine"))
      .orderBy("type_a", "type_b")
  }

  /** Durbin–Watson statistic of the hourly count series per event type
    * (contiguous grid, missing hours = 0, the [[hourlyAutocorr]]
    * series): DW = Σ(c_t − c_{t−1})² / Σ(c_t − c̄)² ≈ 2(1 − ρ₁) — the
    * residual-autocorrelation check a seasonal/trend model readout
    * should quote. The mean cancels in the differences, so both sums
    * are exact integers (Σd² and n·Σc² − S² over count longs) and the
    * one float stage is the final ratio. Shape: one rollup + one
    * key-windowed lag on the same shuffle, over the trailing
    * `maxSpanHours` grid (the [[GridMaxSpanHours]] bound). */
  def durbinWatson(events: DataFrame,
      maxSpanHours: Int = GridMaxSpanHours): DataFrame = {
    require(maxSpanHours >= 2, s"maxSpanHours must be >= 2, got $maxSpanHours")
    val hc = events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = hc.groupBy("event_type").agg(min("h").as("hmin"), max("h").as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = span.select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("h")
    grid.withColumn("p", lag(col("c"), 1).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum("c").as("s"),
        sum(col("c") * col("c")).as("s2"),
        sum(when(col("p").isNotNull,
          (col("c") - col("p")) * (col("c") - col("p")))).as("sd2"))
      .select(col("event_type"), col("n_hours"),
        when(col("n_hours") * col("s2") - col("s") * col("s") > 0,
          round((col("n_hours") * col("sd2")).cast("double")
            / (col("n_hours") * col("s2") - col("s") * col("s")).cast("double"),
            4)).as("dw"))
      .orderBy("event_type")
  }

  /** Mann–Kendall trend test + Theil–Sen slope of the hourly count
    * series per event type — the nonparametric "is traffic trending"
    * readout (no normality assumption, robust to spikes). S = Σ_{i<j}
    * sign(c_j − c_i) and the tie-corrected 18·Var(S) = n(n−1)(2n+5) −
    * Σ_t t(t−1)(2t+5) are exact integers; z applies the ±1 continuity
    * correction; the Theil–Sen slope is the interpolating median of
    * the pairwise slopes QUANTIZED to exact 1e-4 longs (integer ÷
    * integer is IEEE-identical in both engines, and percentile /
    * quantile_cont agree on longs).
    *
    * Scale shape: the pair table is SPAN²-bounded (time grid, never
    * row count), so the analysis window is EXPLICITLY bounded: each
    * type's series is the trailing `maxSpanHours` hours up to its last
    * observed hour (a no-op when the retention fits — every driver
    * fixture spans ≤ 719 h — and a hard cap when it doesn't). Unbounded,
    * a 10-year retention is 87k hours → 3.8e9 sign-pairs per type; the
    * r12 sf1 twin (decade-shifted replicas, 790k-hour span) measured the
    * unbounded form degenerating into a ~10¹¹-pair single task. For
    * longer trend horizons run it on the daily rollup instead (the same
    * window then covers 85 years). */
  def mannKendall(events: DataFrame,
      maxSpanHours: Int = MannKendallSpanHours): DataFrame = {
    require(maxSpanHours >= 2 && maxSpanHours <= 16384,
      s"2 <= maxSpanHours <= 16384 (pair table is span^2-bounded), got $maxSpanHours")
    val hc = events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = hc.groupBy("event_type").agg(min("h").as("hmin"), max("h").as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = span.select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        (unix_timestamp(col("h")) / 3600).cast("long").as("i"),
        coalesce(col("c"), lit(0L)).as("c"))
    val pairs = grid.toDF("event_type", "i", "ca")
      .join(grid.toDF("event_type", "j", "cb"), "event_type")
      .where(col("i") < col("j"))
      .select(col("event_type"),
        signum((col("cb") - col("ca")).cast("double")).cast("long").as("sg"),
        round((col("cb") - col("ca")).cast("double") * 10000.0
          / (col("j") - col("i")).cast("double")).cast("long").as("sl4"))
    val sAgg = pairs.groupBy("event_type")
      .agg(sum("sg").as("s"), expr("percentile(sl4, 0.5)").as("med4"))
    val ties = grid.groupBy("event_type", "c").agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum("t").as("n"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tsum"))
      .withColumn("v18",
        col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tsum"))
    sAgg.join(ties, "event_type")
      .select(col("event_type"), col("n").as("n_hours"), col("s"),
        round(col("v18").cast("double") / 18.0, 4).as("var_s"),
        when(col("v18") > 0, round(
          when(col("s") > 0, (col("s") - 1).cast("double"))
            .when(col("s") < 0, (col("s") + 1).cast("double"))
            .otherwise(lit(0.0))
          / sqrt(col("v18").cast("double") / 18.0), 4)).as("z"),
        round(col("med4") / 10000.0, 4).as("sen_slope"))
      .orderBy("event_type")
  }

  /** Holt double-exponential smoothing (level + trend) of the hourly
    * count series per event type, with an h-step-ahead linear forecast
    * — the first trend-aware baseline after [[seasonalNaiveError]]'s
    * naive ones. Defaults α = 0.5, β = 0.25 are EXACT binary fractions,
    * so 1−α / 1−β are too and the recurrence's double sequence is
    * bit-identical in any engine that folds in time order.
    *
    * The recurrence (l ← αx + (1−α)(l+t); t ← β(l−l_prev) + (1−β)t)
    * is inherently sequential, so it folds IN-ROW over the per-type
    * hourly array — bounded by the trailing `maxSpanHours` analysis
    * window (default [[GridMaxSpanHours]]: a year is 8.8k doubles),
    * never by the row count; the heavy lifting (the hourly rollup) is
    * one combine-shuffle. Init l = x₀, t = x₁ − x₀; updates
    * fold x₁..x_{n−1} in order. Output per type: n_hours, level,
    * trend, fc1..fc3. */
  def holtForecast(events: DataFrame, alpha: Double = 0.5, beta: Double = 0.25,
      horizon: Int = 3, maxSpanHours: Int = GridMaxSpanHours): DataFrame = {
    require(horizon >= 1 && horizon <= 24, "horizon out of range")
    require(maxSpanHours >= 2, s"maxSpanHours must be >= 2, got $maxSpanHours")
    val hc = events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = hc.groupBy("event_type").agg(min("h").as("hmin"), max("h").as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = span.select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val arr = grid.groupBy("event_type").agg(
      transform(sort_array(collect_list(struct(col("h"), col("c")))),
        x => x.getField("c").cast("double")).as("vs"))
      .where(size(col("vs")) >= 2)
    val a = lit(alpha); val oma = lit(1.0) - lit(alpha)
    val b = lit(beta); val omb = lit(1.0) - lit(beta)
    // acc and elements share type array<double>: acc = [l, t], e = [x]
    val lt = arr.withColumn("lt",
      aggregate(
        slice(col("vs"), lit(2), greatest(size(col("vs")) - 1, lit(0))),
        array(element_at(col("vs"), 1),
          element_at(col("vs"), 2) - element_at(col("vs"), 1)),
        (acc, x) => {
          val l = element_at(acc, 1); val t = element_at(acc, 2)
          val nl = a * x + oma * (l + t)
          array(nl, b * (nl - l) + omb * t)
        }))
    val outCols = Seq(col("event_type"), size(col("vs")).as("n_hours"),
      round(element_at(col("lt"), 1), 4).as("level"),
      round(element_at(col("lt"), 2), 4).as("trend")) ++
      (1 to horizon).map(h =>
        round(element_at(col("lt"), 1) + lit(h.toDouble) * element_at(col("lt"), 2), 4)
          .as(s"fc$h"))
    lt.select(outCols: _*).orderBy("event_type")
  }

  /** Holt–Winters ADDITIVE seasonal smoothing of the hourly count
    * series per event type + h-step forecast — the daily-cycle-aware
    * upgrade of [[holtForecast]] (which a 24h-seasonal series defeats).
    * Recurrence per step: l ← α(x − s_old) + (1−α)(l + b);
    * b ← β(l − l_prev) + (1−β)b; s ← γ(x − l) + (1−γ)s_old, with the
    * (period+2)-element state [l, b, s_next..] folded IN-ROW over the
    * per-type hourly array (bounded by the TIME SPAN, never row count).
    * α=½, β=γ=¼ are exact binary fractions and the fold structure is
    * spelled identically in the DuckDB twin (LIST accumulator,
    * repeated-subexpression l′), so the double sequence is
    * engine-identical. Init: l = mean of the first period, b = 0,
    * s_i = x_i − l. Forecast: fc_h = l + h·b + s_{+h}. */
  def holtWintersForecast(events: DataFrame, alpha: Double = 0.5,
      beta: Double = 0.25, gamma: Double = 0.25, period: Int = 24,
      horizon: Int = 3, maxSpanHours: Int = GridMaxSpanHours): DataFrame = {
    require(horizon >= 1 && horizon <= period, "horizon out of range")
    require(maxSpanHours >= 2 * period,
      s"maxSpanHours must cover 2 periods, got $maxSpanHours")
    val hc = events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = hc.groupBy("event_type").agg(min("h").as("hmin"), max("h").as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = span.select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val arr = grid.groupBy("event_type").agg(
      transform(sort_array(collect_list(struct(col("h"), col("c")))),
        x => x.getField("c").cast("double")).as("vs"))
      .where(size(col("vs")) >= 2 * period)
      .withColumn("m0",
        aggregate(slice(col("vs"), lit(1), lit(period)), lit(0.0), _ + _)
          / lit(period.toDouble))
    val a = lit(alpha); val oma = lit(1.0 - alpha)
    val bb = lit(beta); val omb = lit(1.0 - beta)
    val g = lit(gamma); val omg = lit(1.0 - gamma)
    val init = concat(array(col("m0"), lit(0.0)),
      transform(slice(col("vs"), lit(1), lit(period)), x => x - col("m0")))
    val st = arr.withColumn("st",
      aggregate(
        slice(col("vs"), lit(period + 1),
          greatest(size(col("vs")) - period, lit(0))),
        init,
        (acc, x) => {
          val l = element_at(acc, 1); val b = element_at(acc, 2)
          val sOld = element_at(acc, 3)
          val nl = a * (x - sOld) + oma * (l + b)
          val nb = bb * (nl - l) + omb * b
          val ns = g * (x - nl) + omg * sOld
          concat(array(nl, nb), slice(acc, 4, period - 1), array(ns))
        }))
    val outCols = Seq(col("event_type"), size(col("vs")).as("n_hours"),
      round(element_at(col("st"), 1), 4).as("level"),
      round(element_at(col("st"), 2), 4).as("trend")) ++
      (1 to horizon).map(h =>
        round(element_at(col("st"), 1)
          + lit(h.toDouble) * element_at(col("st"), 2)
          + element_at(col("st"), 2 + h), 4).as(s"fc$h"))
    st.select(outCols: _*).orderBy("event_type")
  }

  /** Directed association rules over per-user event-type baskets —
    * the market-basket readout [[typeCooccurrence]]'s symmetric Jaccard
    * can't give: confidence(a→b) = n_ab/n_a is directional, and
    * lift = n_ab·N/(n_a·n_b) says whether b is genuinely more likely
    * GIVEN a. One distinct-(user, type) rollup + one user-keyed
    * self-join (|types|²-bounded fan-out); every metric a ratio of
    * exact integers. Output per ordered pair: (ante, cons, n_ante,
    * n_both, confidence, lift). */
  def associationRules(events: DataFrame, key: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    val ut = events.select(col(key).as("u"), col(typeCol).as("t")).distinct()
    val sizes = ut.groupBy("t").agg(count(lit(1)).as("n"))
    val nn = ut.select("u").distinct().agg(count(lit(1)).as("nu"))
    val both = ut.toDF("u", "ante").join(ut.toDF("u", "cons"), "u")
      .where(col("ante") =!= col("cons"))
      .groupBy("ante", "cons").agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(sizes.toDF("ante", "na")), "ante")
      .join(broadcast(sizes.toDF("cons", "nc")), "cons")
      .crossJoin(broadcast(nn))
      .select(col("ante"), col("cons"), col("na").as("n_ante"), col("n_both"),
        round(col("n_both").cast("double") / col("na").cast("double"), 4)
          .as("confidence"),
        round((col("n_both") * col("nu")).cast("double")
          / (col("na") * col("nc")).cast("double"), 4).as("lift"))
      .orderBy("ante", "cons")
  }

  /** WEIGHTED quantiles per group — "the median request weighted by
    * bytes served", the percentile that matters when rows carry very
    * different mass. Type-7-style lower weighted quantile: the smallest
    * value whose cumulative weight reaches q·W. Every decision is an
    * integer comparison (100·cumw ≥ q100·W over exact integer weights);
    * the cumulative runs over the per-group DISTINCT-value table (the
    * [[RankStats]] grouped-ranks shape — bounded by the value domain,
    * never a per-row window). Output per group: (grp, w_total, one
    * column per requested q100). */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, q100s: Seq[Int] = Seq(50, 90)): DataFrame = {
    require(q100s.nonEmpty && q100s.forall(q => q > 0 && q <= 100), "bad q100s")
    val vw = df.select(col(groupCol).as("grp"), col(valueCol).as("v"),
        col(weightCol).cast("long").as("w"))
      .where(col("w").isNotNull && col("w") > 0)
      .groupBy("grp", "v").agg(sum("w").as("wv"))
    val win = Window.partitionBy("grp").orderBy("v")
    val cum = vw.withColumn("cw", sum("wv").over(win))
    val tot = vw.groupBy("grp").agg(sum("wv").as("wt"))
    val j = cum.join(tot, "grp")
    val qCols = q100s.map { q =>
      min(when(col("cw") * 100 >= lit(q.toLong) * col("wt"), col("v")))
        .as(s"wp$q")
    }
    j.groupBy("grp")
      .agg(first(col("wt")).as("w_total"), qCols: _*)
      .select(col("grp") +: col("w_total") +: q100s.map(q => col(s"wp$q")): _*)
      .orderBy("grp")
  }

  /** Additive seasonal decomposition of the hourly count series per
    * type: trend = centered 25-hour moving sum (full windows only),
    * seasonal = hour-of-day mean of the detrended series. All
    * engine-visible numbers stay exact until one final division by
    * holding the series 25×-SCALED: trend25 = Σ±12 c (integer),
    * detr25 = 25c − trend25 (integer), seasonal = Σdetr25/(25·n_h).
    * The windows run over the trailing-`maxSpanHours` hour grid
    * (default [[GridMaxSpanHours]]), partitioned per type.
    * Output: (event_type, hod, n_h, seasonal). */
  def seasonalDecompose(events: DataFrame,
      maxSpanHours: Int = GridMaxSpanHours): DataFrame = {
    require(maxSpanHours >= 25, s"maxSpanHours must be >= 25, got $maxSpanHours")
    val hc = events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = hc.groupBy("event_type").agg(min("h").as("hmin"), max("h").as("h1"))
      .withColumn("h0",
        expr(s"greatest(hmin, h1 - INTERVAL ${maxSpanHours - 1} HOURS)"))
    val grid = span.select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        expr("unix_micros(h) div 3600000000").as("eh"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("eh").rowsBetween(-12, 12)
    val tr = grid
      .withColumn("t25", sum("c").over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .where(col("nw") === 25)
      .withColumn("d25", lit(25L) * col("c") - col("t25"))
    tr.groupBy(col("event_type"), (((col("eh") % 24) + 24) % 24).as("hod"))
      .agg(count(lit(1)).as("n_h"), sum("d25").as("sd25"))
      .select(col("event_type"), col("hod"), col("n_h"),
        (round(col("sd25").cast("double")
          / (lit(25.0) * col("n_h").cast("double")), 4) + lit(0.0)).as("seasonal"))
      .orderBy("event_type", "hod")
  }

  /** Last-touch attribution: each conversion event credits the LATEST
    * touch event (of the given touch types) by the same user within the
    * lookback window — the marketing-analytics sibling of the as-of
    * join (as-of returns the row; attribution aggregates the credit).
    * One user-keyed equi-join with a range predicate (sort-merge, never
    * a time nested-loop; fan-out bounded by a user's touches inside the
    * window), argmax per conversion via max(struct(ts, id, type)) —
    * deterministic under the (ts, event_id) total order. Unattributed
    * conversions report as channel '(none)'. Output:
    * (channel, n_conversions, share). */
  def lastTouchAttribution(events: DataFrame, conversionType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      lookbackHours: Int = 24): DataFrame = {
    val p = events.where(col("event_type") === conversionType)
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"))
    val t = events.where(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("ts").as("tts"), col("event_id").as("tid"),
        col("event_type").as("ttype"))
    val lb = expr(s"INTERVAL $lookbackHours HOURS")
    val last = p.join(t, Seq("user_id"))
      .where(col("tts") <= col("pts") && col("tts") >= col("pts") - lb)
      .groupBy("pid")
      .agg(max(struct(col("tts"), col("tid"), col("ttype"))).as("w"))
      .select(col("pid"), col("w").getField("ttype").as("channel"))
    val byChannel = last.groupBy("channel").agg(count(lit(1)).as("n"))
    val total = p.agg(count(lit(1)).as("np"))
    val attributed = byChannel.agg(coalesce(sum("n"), lit(0L)).as("na"))
    val withNone = byChannel.unionAll(
      total.crossJoin(broadcast(attributed))
        .select(lit("(none)").as("channel"), (col("np") - col("na")).as("n")))
    withNone.crossJoin(broadcast(total))
      .select(col("channel"), col("n").as("n_conversions"),
        round(col("n").cast("double") / col("np").cast("double"), 4).as("share"))
      .orderBy("channel")
  }

  /** Wald–Wolfowitz runs test of the DAILY total value series against
    * its median — "is the day-to-day metric a random scatter around its
    * level, or trending/cyclic?" (too few runs = trend, too many =
    * alternation). Day totals are exact 2-decimal integer sums; the
    * median is the proven interpolating-percentile pairing; runs count
    * from one lag over the day-grid rollup (bounded by the time span,
    * never row count). z from the exact-integer closed form:
    *   μ = 2n₁n₂/n + 1,  σ² = 2n₁n₂(2n₁n₂−n)/(n²(n−1)),  n = n₁+n₂.
    * Days exactly AT the median are excluded (the standard treatment).
    * Output (one row): n_days, n_above, n_below, runs, z. */
  def runsTest(events: DataFrame, valueCol: String = "value"): DataFrame = {
    val day = events
      .select(expr("unix_micros(ts) div 86400000000").as("d"),
        expr(s"CAST(ROUND($valueCol * 100) AS BIGINT)").as("v"))
      .groupBy("d").agg(sum("v").as("s"))
    val med = day.agg(expr("percentile(s, 0.5)").as("m"))
    val signed = day.crossJoin(broadcast(med))
      .where(col("s").cast("double") =!= col("m"))
      .withColumn("above", (col("s").cast("double") > col("m")).cast("int"))
    // the lag window ranks the day-grid rollup (span-bounded), not rows
    val w = Window.orderBy("d")
    val runs = signed
      .withColumn("prev", lag("above", 1).over(w))
      .agg(count(lit(1)).as("n_days"),
        sum("above").cast("long").as("n_above"),
        sum(lit(1) - col("above")).cast("long").as("n_below"),
        (sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
          .otherwise(0L))).as("runs"))
    val n1 = col("n_above").cast("double"); val n2 = col("n_below").cast("double")
    val nn = n1 + n2
    val mu = lit(2.0) * n1 * n2 / nn + lit(1.0)
    val v2 = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
    runs.select(col("n_days"), col("n_above"), col("n_below"), col("runs"),
      (round(when(col("n_above") > 0 && col("n_below") > 0 && v2 > 0.0,
        (col("runs").cast("double") - mu) / sqrt(v2)), 4) + lit(0.0)).as("z"))
  }
}
