package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Per-user session emission from [[Streams.userSessions]]. Top-level:
  * encoder codegen requires state/output classes be directly instantiable. */
final case class SessionUpdate(user_id: Long, n_events: Long, total_value: Double, closed: Boolean)

/** Keyed session state for [[Streams.userSessions]] (top-level for codegen). */
final case class SessionState(n: Long, total: Double)

/** Structured Streaming surface (SURVEY §2.3 row "Streaming"): the events
  * fixture as a stream — tumbling/sliding windowed aggregation with
  * watermarks, late-data handling, streaming dedup, and custom session
  * state via flatMapGroupsWithState.
  *
  * The reference is batch-iterative (no streaming); this is north-star
  * extension surface. Design notes for scale: state is keyed and bounded
  * by watermark eviction; all aggregations are partial+final over the
  * shuffle on (window, key); `maxFilesPerTrigger` paces backfill.
  */
object Streams {

  /** Events-stream schema with `ts` typed per the footer of the actual
    * fixture (see [[graft.Tables.events]]'s dual-type contract): LongType
    * when the file is int64-nanos read raw via `nanosAsLong`, the native
    * timestamp type when the file is `timestamp[us]`. */
  def eventSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stream the events parquet path (file or directory) as a file source.
    *
    * A streaming source needs its schema declared up front, so the parquet
    * footer is peeked with a one-off batch read (metadata-only, no row IO)
    * and `ts` is declared as whatever the file truly holds — int64-nanos or
    * native timestamp — then normalized to TimestampType exactly like the
    * batch path ([[graft.Tables.normalizeTs]]). Hard-coding either encoding
    * would be silently wrong on the other: declaring LongType over a µs file
    * reads micros-as-long and the ns→µs division compresses time 1000×.
    *
    * Single-file paths (the fixtures ship one parquet file per table) need
    * two adjustments: FileStreamSource force-sets `basePath` to the literal
    * path unless the path is a glob — and a file basePath is rejected — so
    * the first character of the filename is bracket-wrapped (`[e]vents…`),
    * an equivalent glob; `basePath` is then pinned to the parent dir. */
  def eventStream(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(path).schema("ts").dataType
    graft.Tables.normalizeTs(
      parquetStream(spark, path, eventSchema(tsType), maxFilesPerTrigger))
  }

  /** Stream any parquet path — a directory, or a SINGLE FILE via the
    * bracket-glob + pinned-basePath adjustment documented above (the
    * fixtures ship one file per table). Schema must be declared up
    * front (FileStreamSource contract).
    *
    * `maxFilesPerTrigger` ≤ 0 means UNPACED — Spark's own file-source
    * default: each trigger takes everything available, so an
    * AvailableNow backfill is one batch regardless of how many part
    * files the dataset arrives as. That is the right default at scale
    * twice over: (a) per-batch cost (state-store snapshot, shuffle,
    * checkpoint) is paid per trigger, and a 1-file pace turns an
    * N-file backlog into N stateful batches — the r15 ×100 sweep
    * measured ext_stream_mad at 171×/decade from exactly this; (b) a
    * multi-file backlog is written in no particular time order, so
    * paced watermarks can drop rows that a batch run (and the SQL
    * oracle) would keep — batch-boundary-dependent results. Pacing
    * stays opt-in for callers that want bounded-latency backfill. */
  def parquetStream(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val (globPath, base) = if (path.endsWith(".parquet")) {
      val slash = path.lastIndexOf('/')
      val dir = path.substring(0, slash)
      val name = path.substring(slash + 1)
      (s"$dir/[${name.head}]${name.tail}", dir)
    } else (path, path)
    val r = spark.readStream.schema(schema)
    if (maxFilesPerTrigger > 0)
      r.option("maxFilesPerTrigger", maxFilesPerTrigger)
    r.option("basePath", base).parquet(globPath)
  }

  /** Tumbling-window count/sum per event type with a watermark: the
    * streaming form of Q17. Late rows beyond the watermark are dropped;
    * window state is evicted once the watermark passes. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("value")).as("s"))
      .select(col("window.start").as("h"), col("event_type"), col("c"), col("s"))

  /** Event-time sessionization via `session_window`: per-user sessions
    * that close after `gap` of event-time silence — the streaming twin of
    * [[graft.ext.Temporal.sessionAgg]]. Output rows are session rollups
    * (start/end/count/value-total) identical to the batch operator's.
    *
    * Gap-edge semantics: `session_window` merges an event into the
    * current session iff its ts is strictly inside the previous window
    * (diff < gap), while the batch operator splits on diff > gap — the
    * two differ only when a consecutive-event gap equals `gap` EXACTLY,
    * which µs-resolution event time makes a measure-zero case (asserted
    * absent from the fixtures; StreamsSpec pins batch parity).
    *
    * Scale: state is one (user, open-session) aggregate per key, merged
    * by Spark's session-merging state store operator and evicted when
    * the watermark passes the session close. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))

  /** Sliding-window average value per user. */
  def slidingUserValue(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("user_id"))
      .agg(avg(col("value")).as("avg_value"))
      .select(col("window.start").as("w"), col("user_id"), col("avg_value"))

  /** Streaming exact dedup on event_id alone, with state bounded by the
    * watermark: a replayed event_id is dropped even when it arrives with a
    * different event time (dropDuplicates("event_id","ts") would keep it);
    * state for an id is evicted once the watermark passes its first ts. */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT dedup on the CCNet canonical hash (the live-ingest
    * twin of [[graft.ext.TextAnalysis.dedupNormalized]]): a document whose
    * canonical form already arrived — in ANY earlier micro-batch — is
    * dropped, so case/digit/punctuation re-crawls never enter the corpus.
    * First arrival wins, which is the online policy by construction.
    * State is one hash per distinct canonical form: this overload carries
    * no event-time column and suits bounded backfills (AvailableNow);
    * continuous feeds with an ingest timestamp should instead watermark
    * and `dropDuplicatesWithinWatermark("h")` to bound state exactly like
    * [[dedupEvents]]. */
  def canonicalDedupStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
        md5(graft.ext.TextAnalysis.canonicalText(col("text"))).as("h"))
      .dropDuplicates("h")

  /** Streaming first-wins NEAR-dup gate — the live-ingest twin of
    * [[graft.ext.Dedup.firstWinsNearDup]] (the online crawl-dedup
    * policy): each arriving doc computes its MinHash LSH band keys
    * IN-ROW via [[graft.ext.Dedup.minhashSignature]] (no stream-side
    * shuffle for the signature — the batch explode+groupBy idiom would
    * be a streaming aggregation), then keyed state per (band, key)
    * bucket remembers the EARLIEST doc_id seen and the gate emits one
    * (doc_id, band, owner) decision per bucket touch; owner < doc_id ⇔
    * an earlier arrival owns the bucket, so rolling the decisions up
    * per doc (min owner) reproduces the batch dup/dup_of marking
    * exactly. Rows within a batch process in doc_id order, making the
    * gate deterministic and batch-equal on any micro-batch slicing.
    *
    * State: ONE long per occupied bucket — the minimum any dedup index
    * can hold; it grows with distinct CONTENT, not with traffic (every
    * re-crawl lands in an existing bucket). That index IS the product
    * of an ingest dedup: forgetting a bucket forgets its duplicates, so
    * there is no watermark to evict by. For deployments with a bounded
    * retention promise ("dedup within N days"), pass `idleRetention` >
    * 0 ms and idle buckets are dropped on a processing-time timeout —
    * the same trade `dropDuplicatesWithinWatermark` makes, chosen
    * explicitly rather than silently. */
  def nearDupGate(docs: DataFrame, numHashes: Int = 8, bands: Int = 4,
      shingleLen: Int = 3, idleRetentionMs: Long = 0L): Dataset[(Long, Int, Long)] = {
    import docs.sparkSession.implicits._
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val timeout =
      if (idleRetentionMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val banded = docs
      .select(col("doc_id"), graft.ext.Dedup.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= shingleLen)
      .select(col("doc_id"),
        graft.ext.Dedup.minhashSignature(
          graft.ext.Dedup.shingles(col("ts"), shingleLen), numHashes).as("sig"))
      .select(col("doc_id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|",
            (0 until r).map(j => col("sig").getItem(b * r + j)): _*)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .as[(Long, Int, String)]
    banded.groupByKey(t => (t._2, t._3))
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append, timeout) {
        (key: (Int, String), rows: Iterator[(Long, Int, String)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var owner = state.getOption.getOrElse(Long.MaxValue)
            val out = rows.toSeq.sortBy(_._1).map { t =>
              if (t._1 < owner) owner = t._1
              (t._1, t._2, owner)
            }
            state.update(owner)
            if (idleRetentionMs > 0L) state.setTimeoutDuration(idleRetentionMs)
            out.iterator
          }
      }
  }

  /** Stream-static enrichment join: every micro-batch of the stream
    * joins the (bounded) dimension frame — stateless, no watermark
    * needed, and with `broadcast` the stream side never shuffles: the
    * standard "attach user/document features to a live event feed"
    * pattern. The static side is re-planned per micro-batch, so a
    * dimension backed by a table picks up updates between batches. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: each 'view' joins the same user's
    * 'purchase' events within [view_ts − horizon, view_ts]. Both sides
    * carry watermarks, so the join state for a purchase is dropped once
    * the view-side watermark passes its horizon — bounded state, the
    * streaming analog of [[graft.ext.Temporal.asofJoin]]'s time window.
    * Append-mode output: rows emit when the watermark closes them. */
  def viewPurchaseIntervalJoin(events: DataFrame, watermark: String = "2 hours",
      horizonSql: String = "INTERVAL 1 HOUR"): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("vts"))
      .withWatermark("vts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"), col("value").as("purchase_value"))
      .withWatermark("pts", watermark)
    views.join(purchases,
      expr(s"v_user = p_user AND pts BETWEEN vts - $horizonSql AND vts"))
      .select(col("view_id"), col("purchase_id"), col("v_user").as("user_id"),
        col("vts"), col("pts"), col("purchase_value"))
  }

  /** Fault-tolerant parquet sink: append-only with a write-ahead
    * checkpoint. Restarting with the same checkpointLocation resumes from
    * the committed source offsets — already-processed input produces no
    * duplicate output (exactly-once to the file sink via the offset log +
    * file-manifest commit protocol). */
  def parquetSink(df: DataFrame, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming topic inference (model serving): a documents stream flows
    * through a frozen broadcast LDA model — per row: tokenize, dictionary-
    * map against the broadcast vocab (OOV dropped, the semi-join of
    * infer.cc:77-80 done map-side), seeded CSR build, full per-doc Gibbs
    * chain. Entirely NARROW (no streaming aggregation), so it runs in
    * append mode with no watermark, and results are byte-equal to the
    * batch `LdaModel.transform` for the same seed (identical per-doc RNG
    * streams keyed on docId). */
  def streamingInferTopics(docs: DataFrame, model: Array[Long],
      vocabMap: Map[String, Int], cfg: graft.lda.LdaConfig): DataFrame = {
    import docs.sparkSession.implicits._
    val sc = docs.sparkSession.sparkContext
    val bcModel = sc.broadcast(model)
    val bcVocab = sc.broadcast(vocabMap)
    val numWords = vocabMap.size
    val k = cfg.numTopics
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { it =>
      val m = bcModel.value
      val vm = bcVocab.value
      val dist = new Array[Double](k)
      it.map { case (docId, text) =>
        // row-wise bag-of-words, sorted by word id — the same (ws, cs)
        // shape Corpus.fromBow builds, so DocState.init seeds identically
        val counts = scala.collection.mutable.TreeMap.empty[Int, Int]
        text.split("\\s+").foreach { t =>
          if (t.nonEmpty) vm.get(t).foreach { w =>
            counts.update(w, counts.getOrElse(w, 0) + 1)
          }
        }
        val ws = counts.keysIterator.toArray
        val cs = ws.map(counts)
        val doc = graft.lda.DocState.init(docId, ws, cs, k, cfg.seed)
        (docId, graft.lda.LdaInfer.inferDoc(doc, m, numWords, cfg, dist))
      }
    }.toDF("doc_id", "topics")
  }

  /** Streaming per-key EWMA — the incremental form of
    * [[graft.ext.Temporal.ewma]]: keyed state is ONE double (the last
    * smoothed value), each micro-batch folds its rows in `orderId` order
    * into it, and the emitted rows carry the same y_i the batch operator
    * produces. Because EWMA is a left fold, state size is O(1) per key
    * and any batch boundary placement yields the identical result as
    * long as rows arrive in order (StreamsSpec asserts equality with the
    * batch form). Keyed state schema: (hasState: Boolean, y: Double) —
    * bump the checkpoint location if this ever changes, Structured
    * Streaming cannot migrate state encodings in place. Non-finite
    * values (NaN/±Inf) are pass-through like the
    * batch operator's nulls: state is kept, the row emits the previous
    * smoothed value (rows before the key's first finite value emit
    * nothing — a tuple stream has no null slot to carry).
    *
    * State grows with the KEY POPULATION (one (Boolean, Double) per
    * entity ever seen) — the inherent working set of a per-entity
    * running statistic, not a time-growing key space. Deployments that
    * can forget dormant entities (a returning key restarts its
    * smoothing from its next value — the retention trade) pass
    * `idleRetentionMs` > 0 and idle keys drop on a processing-time
    * timeout, the [[nearDupGate]] convention.
    * Input: (key, orderId, value); output: (key, orderId, ewma ROUND 4). */
  def streamingEwma(events: Dataset[(Long, Long, Double)],
      alpha: Double = 0.2,
      idleRetentionMs: Long = 0L): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    val timeout =
      if (idleRetentionMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Boolean, Double), (Long, Long, Double)](
        OutputMode.Append, timeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)],
            state: GroupState[(Boolean, Double)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (haveY, y) = state.getOption.getOrElse((false, 0.0))
            val out = rows.toSeq.sortBy(_._2).flatMap { case (_, id, x) =>
              if (java.lang.Double.isFinite(x)) {
                y = if (!haveY) x else alpha * x + (1 - alpha) * y
                haveY = true
              }
              if (!haveY) None
              else Some((key, id, graft.functions.StableRound.dbl4(y)))
            }
            state.update((haveY, y))
            if (idleRetentionMs > 0L) state.setTimeoutDuration(idleRetentionMs)
            out.iterator
          }
      }
  }

  /** Live-ingest robust-z anomaly gate: flag streamed events whose value
    * sits beyond k·1.4826·MAD of the batch-fit per-group median — the
    * frozen-model serving pattern ([[streamingInferTopics]],
    * the blocklist gate) applied to [[graft.ext.Temporal.robustStats]].
    * Stateless per micro-batch: one broadcast stream-static join + an
    * in-row predicate, so the gate adds no keyed state and scales with
    * ingest rate alone. Emits exactly the rows the batch filter would
    * (parity hash-checked by the ext_stream_mad oracle). */
  def robustAnomalyGate(stream: DataFrame, stats: DataFrame,
      groupCol: String = "event_type", valueCol: String = "value",
      k: Double = 3.0): DataFrame =
    stream.join(broadcast(stats), groupCol)
      .where(abs(col(valueCol) - col("_med")) > lit(k * 1.4826) * col("_mad"))
      .select(col("event_id"), col(groupCol),
        round(col(valueCol), 4).as("value"))

  /** Custom keyed state: per-user session aggregation with processing-time
    * timeout — the `flatMapGroupsWithState` surface. Emits a running
    * update per batch and a closing record when the session times out. */
  def userSessions(events: Dataset[(Long, Double)], timeoutMs: Long = 30000): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(user, s.n, s.total, closed = true))
          } else {
            val old = state.getOption.getOrElse(SessionState(0L, 0.0))
            var n = old.n
            var total = old.total
            rows.foreach { case (_, v) => n += 1; total += v }
            state.update(SessionState(n, total))
            state.setTimeoutDuration(timeoutMs)
            Iterator.single(SessionUpdate(user, n, total, closed = false))
          }
      }
  }

  /** Streaming QUOTA gate (ingest rate limiter): admit at most
    * `maxPerKey` events per (user, event-time hour), drop the rest — the
    * per-tenant throttle every multi-tenant ingest front door needs.
    * Keyed O(1) state: one admitted-count long per (user, hour); rows
    * within a batch are processed in (ts, event_id) order so admission
    * is deterministic and exactly matches the batch row_number() twin
    * (the oracle).
    *
    * State is BOUNDED: the (user, hour) key space grows strictly with
    * stream lifetime, so each key arms an event-time timeout at its
    * hour's end and the state is `remove()`d once the watermark
    * (event time minus `lateness`) passes it — live state is only the
    * keys inside the watermark horizon, not the stream's full history.
    *
    * LATE-ROW CONTRACT: the same watermark that evicts state also
    * FILTERS INPUT — a row whose event time is older than
    * (max event time seen − `lateness`) is dropped by Spark before it
    * reaches the state function, so it is neither admitted nor counted
    * against the quota; it simply vanishes from the output. Batch
    * parity with the row_number() twin therefore holds only for
    * replays whose event-time disorder stays within `lateness`. If a
    * replay can be arbitrarily out of order, pass a `lateness` at
    * least as large as its maximum disorder (the cost is that much
    * more retained state — still one long per (user, hour) inside the
    * horizon); there is no "no watermark" mode because EventTimeTimeout
    * eviction requires one.
    *
    * Input tuples: (user_id, epoch_hour, event_id, ts_micros). Emits
    * admitted (event_id, user_id, epoch_hour). */
  def quotaGate(events: Dataset[(Long, Long, Long, Long)],
      maxPerKey: Long = 10L,
      lateness: String = "1 hour"): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "eh", "event_id", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))
      .withWatermark("ts", lateness)
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), rows: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var admitted = state.getOption.getOrElse(0L)
            val out = rows.toSeq.sortBy(r => (r._4, r._3)).flatMap { r =>
              if (admitted < maxPerKey) { admitted += 1; Some((r._3, key._1, key._2)) }
              else None
            }
            state.update(admitted)
            // evict once the watermark passes this key's hour end; the
            // max() keeps the timestamp legal when a late row lands in an
            // hour the watermark already crossed (evict next batch)
            state.setTimeoutTimestamp(
              math.max((key._2 + 1L) * 3600000L, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }
}
