package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders and the shared derived views (FIXTURES.md §C).
  *
  * Derived-view semantics mirror the reference's corpus pipeline:
  *   - `tokens(text)`: whitespace tokenization per `/root/reference/lda.cc:65`
  *     (istringstream >> word), i.e. split on single spaces, drop empties.
  *   - `vocab`: the sorted-vocabulary build of
  *     `/root/reference/mpi_lda.cc:197-207` — distinct tokens, lexicographic
  *     rank as dense word id.
  *   - `bow`: the (doc, word, count) bag-of-words shape of the plda input
  *     line format (`/root/reference/README.md:44-58`).
  *
  * Scale notes (100 TB design):
  *   - `docsTokenized` is a narrow map+generate — no shuffle; the token
  *     explosion stays pipelined inside whole-stage codegen.
  *   - `vocab` ranks the distinct token set with the distributed
  *     sortBy+zipWithIndex scheme ([[graft.lda.Corpus.sortedVocab]]) — no
  *     single-partition window anywhere in the default path, so the build
  *     survives V far beyond the reference's NYTimes V=102,660.
  *   - dictionary joins against `vocab` should broadcast (V small); Spark's
  *     AQE does this automatically once distinct-count stats are known, and
  *     Q10 asserts it explicitly with a hint.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
  /** events.ts ingestion contract (dual-type): fixture generations have
    * shipped `ts` both as TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects unless read as raw int64 via `nanosAsLong` — and as plain
    * `timestamp[us]`. Branch on what the footer actually holds instead of
    * assuming either encoding:
    *   - int64-nanos (reads as LongType under `nanosAsLong`): truncate
    *     ns→µs, matching DuckDB's ns→µs truncation of the same file;
    *   - timestamp[us] (reads as TIMESTAMP/TIMESTAMP_NTZ): native read, normalized to
    *     session-timezone TimestampType (identity on the wall clock under
    *     the UTC session this library pins everywhere).
    * Either way callers see one schema: `ts: TimestampType`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to TimestampType per the contract
    * above (shared with [[graft.streaming.Streams.eventStream]]). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => // int64-nanos read raw via nanosAsLong
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")

  /** tokens(text): split on single space, drop empty strings (the fixture
    * text carries a trailing space). */
  def tokensOf(text: Column): Column =
    graft.ext.Dedup.tokens(text)

  /** docs_tokenized(doc_id, tok) — one row per token occurrence. */
  def docsTokenized(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(tokensOf(col("text"))).as("tok"))

  /** vocab(tok, word_id) — sorted distinct tokens, dense 0-based id
    * (the V2 sorted-vocab semantics of mpi_lda.cc:197-207). */
  def vocab(s: SparkSession, d: String): DataFrame =
    graft.lda.Corpus.sortedVocab(docsTokenized(s, d).select("tok"))

  /** bow(doc_id, tok, c). */
  def bow(s: SparkSession, d: String): DataFrame =
    docsTokenized(s, d).groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))

  /** lang_tokens(lang, tok) — token occurrences tagged with doc language. */
  def langTokens(s: SparkSession, d: String): DataFrame = {
    // lang rides along from the same scan — no join needed (the FIXTURES
    // definition via join by doc_id is semantically identical; skipping the
    // self-join removes a shuffle that would dominate at scale).
    documents(s, d)
      .select(col("lang"), explode(tokensOf(col("text"))).as("tok"))
  }

  /** Distinct tokens of documents with the given language. */
  def langVocab(s: SparkSession, d: String, lang: String): DataFrame =
    documents(s, d)
      .where(col("lang") === lang)
      .select(explode(tokensOf(col("text"))).as("tok"))
      .distinct()

  /** Distinct tokens of documents with the given source. */
  def sourceVocab(s: SparkSession, d: String, src: String): DataFrame =
    documents(s, d)
      .where(col("source") === src)
      .select(explode(tokensOf(col("text"))).as("tok"))
      .distinct()
}
