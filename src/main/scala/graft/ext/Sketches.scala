package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the sublinear-memory path for
  * cardinality and frequency at 100 TB, where exact distinct counts and
  * per-key tallies stop fitting. Thin, typed wrappers over Spark's
  * built-in HLL++ and Count-Min implementations (both codegen'd
  * aggregates with partial+final merge, so they shuffle O(sketch) bytes
  * per group instead of O(values)).
  *
  * Sketch bytes are engine-specific, so these carry NO DuckDB oracle;
  * correctness is spec-bounded instead (SketchesSpec): HLL++ relative
  * error vs the exact count, CMS one-sided overestimation within
  * eps·N at confidence. */
object Sketches {

  /** Approximate distinct tokens per group (HLL++). `rsd` is the target
    * relative standard deviation (Spark default 0.05). */
  def approxVocabSize(docs: DataFrame, groupCol: String, rsd: Double = 0.05): DataFrame =
    docs.select(col(groupCol), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy(groupCol)
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_vocab"))

  /** Build a Count-Min sketch (binary) over a column; eps = additive
    * error fraction of total count, confidence = probability the bound
    * holds. Mergeable across partitions/batches by construction. */
  def cmsOf(df: DataFrame, c: Column, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): Array[Byte] =
    df.select(count_min_sketch(c, lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)

  /** Point-estimate lookups against a serialized CMS. Guarantees (w.p.
    * `confidence`): estimate ≥ true count, estimate ≤ true + eps·N. */
  def cmsEstimate(sketch: Array[Byte], item: Any): Long =
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))
      .estimateCount(item)

  /** Deterministic HyperLogLog registers over an md5 hash: per `group`,
    * the classic (bucket, max-rho) table with 2^p buckets. Unlike
    * [[approxVocabSize]]'s engine-private HLL++, the hash here is
    * md5-derived, so BOTH the registers and the estimate replay
    * bit-for-bit in any engine (the DuckDB oracle checks them) — and
    * the registers are the sketch's MERGE form: max is associative, so
    * unioning groups = re-max over bucket, never a rescan (see
    * [[hllMerge]]).
    *
    * Scale shape: occurrences flow through ONE groupBy(group, bucket)
    * max-aggregate with map-side combine — O(groups · 2^p) rows shuffle,
    * never the value stream. No distinct is needed first: duplicates
    * can't change a max. Layout: bucket = first 2 hex chars (p=8),
    * rho = 1 + leading zero bits of the next 13 hex chars (52 bits),
    * computed by integer/string ops only (no floating log), so the
    * registers are exact in any engine. */
  def hllRegisters(occ: DataFrame, groupCol: String, value: Column): DataFrame = {
    val h = md5(value)
    val suffix = substring(h, 3, 13)
    val lz = length(regexp_extract(suffix, "^0*", 0))
    val nib = conv(suffix.substr(lz + 1, lit(1)), 16, 10).cast("int")
    val extra = when(nib >= 8, 0).when(nib >= 4, 1).when(nib >= 2, 2).otherwise(3)
    val rho = when(lz === 13, 53).otherwise(lz * 4 + extra + 1)
    occ.select(col(groupCol),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("bucket"),
        rho.as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("m"))
  }

  /** Merge register tables (sketch union): re-max per bucket under a new
    * group label — the "combine per-source sketches into the global
    * count" step, O(groups · 2^p) work with no data rescan. */
  def hllMerge(regs: DataFrame, groupCol: String, label: String): DataFrame =
    regs.groupBy(col("bucket")).agg(max(col("m")).as("m"))
      .select(lit(label).as(groupCol), col("bucket"), col("m"))

  /** HLL estimate from a register table: alpha·m²/Σ2^(−M_j) with the
    * standard small-range linear-counting correction (E ≤ 2.5·2^p and
    * empty buckets exist → 2^p·ln(2^p/V)). The Σ folds over the
    * bucket-SORTED register list with missing buckets contributed as a
    * count up front — a fixed association order, so the double
    * arithmetic replays identically in the oracle engine (2^(−M) terms
    * are exact powers of two via integer shift, no libm pow). */
  def hllEstimate(regs: DataFrame, groupCol: String, p: Int = 8): DataFrame = {
    val m = 1 << p
    val alphaM2 =
      (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) * lit((m.toLong * m).toDouble)
    regs.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("bucket"), col("m")))).as("rs"))
      .select(col(groupCol), (lit(m) - size(col("rs"))).as("zeros"),
        aggregate(col("rs"), lit(0.0), (acc, r) =>
          // exact 2^-M via a literal reciprocal table (no runtime libm)
          acc + element_at(
            array((0 to 53).map(k => lit(1.0 / math.pow(2.0, k))): _*),
            r.getField("m") + 1))
          .as("fold"))
      .select(col(groupCol), col("zeros"),
        (alphaM2 / (col("zeros").cast("double") + col("fold"))).as("raw"))
      .select(col(groupCol),
        when(col("raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw")).as("hll_est"))
  }

  /** Misra–Gries heavy-hitters summary over a column: a MERGEABLE,
    * bounded-memory frequency sketch — each partition keeps ≤ `capacity`
    * (item, count) entries, and summaries combine associatively
    * (Agarwal et al., "Mergeable Summaries"), so the whole pass is one
    * `treeAggregate` shuffling O(capacity) entries per partition instead
    * of a full groupBy of the key space. The 100 TB contract: every item
    * with true count > N/(capacity+1) survives, and each reported count
    * undercounts by at most N/(capacity+1) (spec-bounded). When
    * `capacity` ≥ the number of distinct items no decrement ever fires
    * and counts are EXACT — which is what gives the fixture-scale query
    * its DuckDB oracle.
    *
    * Returns the top `k` surviving items as (item, count), ordered
    * (count DESC, item ASC). */
  def heavyHitters(df: DataFrame, c: Column, capacity: Int, k: Int): DataFrame = {
    require(capacity >= 1 && k >= 1, "capacity and k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.MisraGries
    // add/merge kernel shared with the SQL UDAF form (graft_heavy_hitters,
    // registered by GraftExtensions) — one implementation, two surfaces
    val summary = df.select(c.cast("string").as("item")).as[String]
      .rdd.treeAggregate(new MisraGries.MG)(
        (m, t) => MisraGries.add(m, t, capacity),
        (a, b) => MisraGries.merge(a, b, capacity))
    summary.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
      .toDF("item", "c")
  }

  /** Mergeable quantile summary: a deterministic KLL-style compactor
    * stack (Karnin–Lang–Liberty's structure with the deterministic
    * keep-every-other compaction). Level h holds values of weight 2^h;
    * when a level exceeds `capacity` it sorts and promotes every second
    * value to level h+1 — so memory is O(capacity · log(n/capacity)) and
    * summaries from different partitions MERGE level-wise (the
    * `treeAggregate` combOp), shuffling O(capacity) doubles per
    * partition instead of the full column.
    *
    * Error contract (spec-bounded, QuantileSketchSpec): the rank of the
    * reported quantile is within n·⌈log₂(n/capacity)⌉/capacity of the
    * target for ANY partitioning/merge order. When `capacity` ≥ n no
    * compaction ever fires, the summary is the full multiset, and
    * estimates are EXACT — which gives the fixture-scale query its
    * DuckDB oracle (the same exact-at-capacity trick as
    * [[heavyHitters]]). */
  object QuantileSketch {
    import scala.collection.mutable.ArrayBuffer
    /** levels(h) = unsorted buffer of values with weight 2^h; n = count. */
    final class QS(val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer()),
        var n: Long = 0L) extends Serializable

    private def compact(s: QS, capacity: Int): Unit = {
      var h = 0
      while (h < s.levels.length) {
        val buf = s.levels(h)
        if (buf.length > capacity) {
          if (s.levels.length == h + 1) s.levels += ArrayBuffer()
          val sorted = buf.sortInPlace()
          val promoted = s.levels(h + 1)
          // deterministic compaction: promote odd indices of each sorted
          // pair; an unpaired trailing element stays at this level
          var i = 1
          while (i < sorted.length) { promoted += sorted(i); i += 2 }
          val keepLast = sorted.length % 2 == 1
          val last = if (keepLast) sorted.last else 0.0
          buf.clear()
          if (keepLast) buf += last
        }
        h += 1
      }
    }

    def add(s: QS, x: Double, capacity: Int): QS = {
      s.levels(0) += x; s.n += 1
      if (s.levels(0).length > capacity) compact(s, capacity)
      s
    }

    def merge(a: QS, b: QS, capacity: Int): QS = {
      while (a.levels.length < b.levels.length) a.levels += ArrayBuffer()
      b.levels.zipWithIndex.foreach { case (buf, h) => a.levels(h) ++= buf }
      a.n += b.n
      compact(a, capacity)
      a
    }

    /** est(q) = smallest value whose cumulative weight ≥ max(1, ⌈q·n⌉)
      * over the weighted sorted summary (PERCENTILE_DISC semantics when
      * exact). */
    def quantile(s: QS, q: Double): Double = {
      require(s.n > 0, "empty summary")
      val weighted = s.levels.zipWithIndex
        .flatMap { case (buf, h) => buf.map(v => (v, 1L << h)) }
        .sortBy(_._1)
      val target = math.max(1L, math.ceil(q * s.n).toLong)
      var cum = 0L
      val it = weighted.iterator
      var last = weighted.head._1
      while (cum < target && it.hasNext) { val (v, w) = it.next(); cum += w; last = v }
      last
    }
  }

  /** Approximate quantiles of a numeric column via [[QuantileSketch]]:
    * one treeAggregate pass, O(capacity·log) driver state, never a sort
    * of the data. NULL, NaN, and ±Inf values are skipped (SQL-aggregate
    * convention; NaN/Inf have no meaningful rank and would poison every
    * probe above/below them). Returns (q, value) per requested quantile.
    *
    * `requireExact = true` turns the "exact while n ≤ capacity" contract
    * from an assumption into a runtime check: if any compaction fired
    * (the summary holds level-1+ weighted items), the call fails loudly
    * instead of silently returning an approximation. Callers whose
    * consumers compare against an exact-rank oracle set this. */
  def quantilesOf(df: DataFrame, c: Column, capacity: Int,
      qs: Seq[Double], requireExact: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import QuantileSketch._
    val summary = df.select(c.cast("double").as("v")).na.drop().as[Double]
      .rdd.treeAggregate(new QS())(
        (s, x) => if (java.lang.Double.isFinite(x)) add(s, x, capacity) else s,
        (a, b) => merge(a, b, capacity))
    if (requireExact) require(summary.levels.length <= 1,
      s"quantile sketch compacted (n=${summary.n} > capacity=$capacity): " +
        "result would be approximate but the caller required exactness")
    if (summary.n == 0) Seq.empty[(Double, Double)].toDF("q", "value")
    else qs.map(q => (q, BigDecimal(quantile(summary, q))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("q", "value")
  }
}
