package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (materialized-view-style) aggregation — the pattern that
  * keeps 100 TB rollups affordable: aggregate each ingest batch/partition
  * once into small ALGEBRAIC partials (count, sum — anything with an
  * associative merge), persist the partials, and answer queries by
  * merging partials instead of rescanning raw events. A day's reprocess
  * touches one partial; the full-history query reads |days|·|groups|
  * rows, not the event log.
  *
  * The merge step is provably equivalent to the direct aggregate:
  * COUNT = Σ partial counts, SUM = Σ partial sums (exercised by the
  * ext_partial_agg_merge oracle, which checks the two-level form against
  * DuckDB's single-level GROUP BY). AVG and friends derive from
  * (count, sum) at merge time; non-algebraic aggregates (exact
  * percentiles) need the sketch path ([[Sketches]]) instead. */
object Incremental {

  /** One partial row per (event_type, day): the persisted rollup unit.
    * Map-side partial aggregation (partial+final HashAggregate) means the
    * shuffle already carries group-level rows, not events. */
  def dailyPartials(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))

  /** Merge partials to per-type totals — the query-time step. Reads only
    * the partial table; never the raw events. */
  def mergePartials(partials: DataFrame): DataFrame =
    partials.groupBy("event_type")
      .agg(sum(col("cnt")).as("n"), round(sum(col("sv")), 4).as("s"))

  /** Snapshot diff: classify every key of two table versions as
    * `added` (new only), `removed` (old only), or `changed` (present in
    * both, any `compareCols` value differs — NULL-safe). Unchanged keys
    * are dropped — the diff of a 100 TB table is its churn, not its
    * size. This is the audit/repair primitive behind CDC validation,
    * backfill verification, and "what did yesterday's run change?".
    *
    * Scale shape: ONE full-outer sort-merge join on `key` (both sides
    * shuffle once, co-partitioned); the row comparison is an in-row
    * md5 over the canonicalized compare columns, so wide rows compare
    * without materializing both sides' payloads downstream. `key` must
    * be unique per side (it's a snapshot key, not a log). */
  def tableDiff(old: DataFrame, nu: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    // NULL-safe canonical row fingerprint, INJECTIVE on the row: each
    // value renders as "v<len>:<value>" (length-prefixed, so fields are
    // self-delimiting — no separator char inside a value can shift bytes
    // across a field boundary) and NULL as the lone "n" (no v-field can
    // equal it). This matches the oracle's per-column IS DISTINCT FROM
    // on every input, including NULL-vs-empty and boundary-shifting
    // values like ("ab","") vs ("a","b").
    def fp(df: DataFrame) = md5(concat_ws("",
      compareCols.map { c =>
        val s = col(c).cast("string")
        coalesce(concat(lit("v"), length(s), lit(":"), s), lit("n"))
      }: _*))
    val o = old.select(col(key).as("k"), fp(old).as("oh"))
    val n = nu.select(col(key).as("k"), fp(nu).as("nh"))
    o.join(n, Seq("k"), "full_outer")
      .select(col("k").as(key),
        when(col("oh").isNull, "added")
          .when(col("nh").isNull, "removed")
          .when(col("oh") =!= col("nh"), "changed")
          .otherwise("unchanged").as("status"))
      .where(col("status") =!= "unchanged")
  }
}
