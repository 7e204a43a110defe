package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (extension surface,
  * SURVEY.md §2.4): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * All hashing is md5-based and therefore engine-portable: every operator
  * here is deterministic and has a DuckDB-expressible oracle. Everything is
  * built from codegen'd `org.apache.spark.sql.functions` higher-order
  * functions — no UDFs anywhere, so the whole pipeline stays inside
  * whole-stage codegen.
  *
  * Scale design:
  *  - exact dedup: hash-groupBy — one shuffle on the 32-hex digest.
  *  - MinHash+LSH: per-doc signature (narrow), explode to (band, key) and
  *    shuffle on band key — candidate pairs are generated per bucket, never
  *    all-pairs. This is the 100 TB path.
  *  - n-gram Jaccard: exact pairwise similarity via a shared-shingle join —
  *    quadratic in bucket size; use AFTER LSH banding at scale (here also
  *    exposed standalone as the small-data oracle).
  *  - SimHash: 60-bit signature (BIGINT-safe in both engines); near-dup =
  *    hamming distance via xor+bit_count, banded by prefix for scale.
  */
object Dedup {

  /** Single-space tokens, empties dropped (FIXTURES tokenization rule —
    * exactly DuckDB's `list_filter(string_split(text, ' '), t -> t <> '')`).
    * `array_remove` instead of the `filter` HOF: the HOF lambda is
    * interpreted per element (measured 5× slower on the tokenize stage);
    * array_remove stays in whole-stage codegen. */
  def tokens(text: Column): Column = array_remove(split(text, " "), "")

  /** Repartition a compute-heavy input to full parallelism. Small parquet
    * files arrive as ONE split (partitioning is byte-based), which serializes
    * hash-dense per-row work onto a single core; the tiny shuffle is
    * negligible next to the compute it parallelizes. No-op effect at real
    * scale where inputs already have many splits. */
  def spreadForCompute(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Hash-repartition by `cols` PINNED to the cluster's parallelism —
    * the CPU-dense-exchange guard. AQE coalesces post-shuffle partitions
    * by BYTES, which misprices stages whose cost is compute per row, not
    * row width: a candidate-pair table is two longs per row, so at
    * bench/fixture volumes the whole array_intersect verification stage
    * collapses to ONE task (measured: ext_containment_join ran its
    * verify as a single 12.7 s task, >80% of the entry). A
    * REPARTITION_BY_NUM exchange is exempt from AQE coalescing, and the
    * count tracks defaultParallelism — cluster-adaptive, not a local
    * constant; at volumes where bytes alone already buy enough
    * partitions the extra exchange of narrow key rows is noise. */
  def pinnedByKey(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, cols: _*)

  /** n-token shingles (contiguous, space-joined). Empty array if the doc
    * has fewer than n tokens. Native codegen'd expression
    * ([[graft.functions.Shingles]]) — one array walk per row; see its
    * scaladoc for why the HOF and window-lead forms both lose. */
  def shingles(toks: Column, n: Int): Column =
    graft.functions.Shingles.shinglesNative(toks, n)

  /** docs(doc_id, text) → (doc_id, sh): one row per shingle occurrence.
    * Shuffle-free: tokens and shingles are computed in-row by native
    * expressions and fed straight into `explode`, so the first exchange
    * any consumer pays is its own (groupBy/join) shuffle. */
  def explodedShingles(docs: DataFrame, n: Int): DataFrame =
    spreadForCompute(docs).select(col("doc_id"),
      explode(shingles(tokens(col("text")), n)).as("sh"))

  /** [[explodedShingles]] with per-doc dedup done in-row
    * (`array_distinct` before the explode) — the set form Jaccard and
    * decontamination consume, without a (doc_id, sh) distinct shuffle. */
  def explodedDistinctShingles(docs: DataFrame, n: Int): DataFrame =
    spreadForCompute(docs).select(col("doc_id"),
      explode(array_distinct(shingles(tokens(col("text")), n))).as("sh"))

  /** MinHash hash family i over a shingle column: an 8-hex-char (32-bit)
    * slice of one of two md5 digests — md5("0:"+s) carries families 0–3,
    * md5("1:"+s) families 4–7. Slicing one digest into independent
    * fixed-width pieces is the standard way to buy k hash families for the
    * price of 2 digests (md5 dominates the signature cost — this is 4×
    * fewer digest computations than one md5 per family); lexicographic min
    * over fixed-width lowercase hex equals numeric min over the 32-bit
    * value. Engine-portable: plain `substr(md5(...))` on the DuckDB side. */
  def minhashFamily(s: Column, i: Int): Column =
    substring(md5(concat(lit(s"${i / 4}:"), s)), (i % 4) * 8 + 1, 8)

  /** MinHash signature: numHashes sliced-md5-min strings (see
    * [[minhashFamily]]). */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => minhashFamily(s, i)))
    }: _*)

  /** docs(doc_id, text) → (doc_id, h0..h{numHashes-1}): one MinHash
    * signature row per doc, components as columns. */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 8, shingleLen: Int = 3): DataFrame = {
    // explode + per-hash min aggregates instead of array lambdas: the md5s
    // run in whole-stage codegen row-wise (array HOF lambdas are
    // interpreted per element — ~10× slower measured), and the groupBy is
    // a cheap partial+final min of 8 small strings per doc (map-side
    // combine collapses each partition to one row per doc before the
    // exchange).
    // materialize the ⌈numHashes/4⌉ digests as columns BEFORE the agg: the
    // min() inputs then slice an attribute; inlining minhashFamily into
    // each agg would recompute the same md5 once per family (CollapseProject
    // keeps the projection because the alias is non-cheap and multiply
    // referenced)
    val nDigests = (numHashes + 3) / 4
    val exploded = explodedShingles(docs, shingleLen)
      .select(col("doc_id") +:
        (0 until nDigests).map(d => md5(concat(lit(s"$d:"), col("sh"))).as(s"m$d")): _*)
    val aggs = (0 until numHashes).map(i =>
      min(substring(col(s"m${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"h$i"))
    exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** docs(doc_id, text) → (doc_id, band, key): LSH banding of the MinHash
    * signature, `bands` bands of rows-per-band = numHashes/bands. Docs
    * sharing a (band, key) are candidate near-duplicates. */
  def minhashBands(docs: DataFrame, numHashes: Int = 8, bands: Int = 4, shingleLen: Int = 3): DataFrame = {
    val r = numHashes / bands
    val sig = minhashSignatures(docs, numHashes, shingleLen)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until r).map(j => col(s"h${b * r + j}")): _*)).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
  }

  /** MinHash Jaccard ESTIMATES for the LSH candidate pairs: the fraction
    * of agreeing signature components — the classic unbiased estimator
    * E[agree/k] = J(a,b). This is the cheap similarity a production
    * pipeline thresholds on BEFORE computing any exact Jaccard: the
    * signature row is O(k) per doc regardless of doc length, so the pair
    * scoring never touches shingle sets again. One signature build
    * (localCheckpointed — banding and both join sides read the SAME
    * materialized rows, not three recomputes of the shingle pipeline),
    * bucket-local candidate generation, two broadcast-friendly joins. */
  def minhashEstimates(docs: DataFrame, numHashes: Int = 8, bands: Int = 4, shingleLen: Int = 3): DataFrame = {
    val r = numHashes / bands
    val sig = minhashSignatures(docs, numHashes, shingleLen).localCheckpoint(true)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until r).map(j => col(s"h${b * r + j}")): _*)).as("key"))
    }
    val cands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
      .groupBy("band", "key").agg(collect_list(col("doc_id")).as("ds"))
      .where(size(col("ds")) > 1)
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .distinct()
    val agree = (0 until numHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cands
      .join(sig.toDF("doc_a" +: (0 until numHashes).map(i => s"a$i"): _*), "doc_a")
      .join(sig.toDF("doc_b" +: (0 until numHashes).map(i => s"b$i"): _*), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(agree / lit(numHashes.toDouble), 4).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Candidate near-dup pairs (doc_a < doc_b) from LSH band collisions.
    * The join is per-bucket — never all-pairs. */
  def minhashCandidates(docs: DataFrame, numHashes: Int = 8, bands: Int = 4, shingleLen: Int = 3): DataFrame = {
    // Bucket-local pair generation by a flat SELF-join on (band, key):
    // the (tiny: bands rows/doc) band table is checkpointed once so the
    // signature pipeline isn't recomputed per side, the join pipeline
    // stays in whole-stage codegen (the collect_list-bucket form it
    // replaces ran ObjectHashAggregate + array expansion — measured 2.5×
    // slower cold, ~20% warm), and AQE skew-splits a hot bucket. LSH
    // bucket size is bounded by design (docs in one bucket ARE
    // near-dups; a pathological hot bucket means the banding parameters
    // are wrong, not the plan). The trailing distinct dedups pairs
    // colliding in >1 band.
    val b = minhashBands(docs, numHashes, bands, shingleLen).localCheckpoint()
    val l = b.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val r = b.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact n-gram Jaccard top-k most-similar pairs, via a shared-shingle
    * join (pairs with zero overlap never materialize). Ordering is on
    * ROUND(jaccard, 4) — a single IEEE division is bit-identical across
    * engines, but the round keeps near-tie order stable — then ids. */
  def jaccardTopPairs(docs: DataFrame, k: Int, shingleLen: Int = 3): DataFrame = {
    // Per-doc shingle dedup AND set size computed in-row (array_distinct +
    // size before the explode) — the size rides along as a column, so no
    // per-doc count aggregation and no size joins exist at all. Pair
    // counts come from a flat SELF-join on the shingle: the exchange is
    // computed once and reused for both sides (ReusedExchange), the whole
    // pipeline stays in whole-stage codegen, and AQE can skew-split a hot
    // shingle — measured 2× faster cold and ~25% warm vs the
    // collect_list-bucket form (ObjectHashAggregate + array expansion)
    // it replaces. A shingle shared by m docs emits m² in-flight rows
    // either way; at 100 TB this exact operator runs AFTER LSH banding
    // bounds m.
    val docSh = spreadForCompute(docs)
      .select(col("doc_id"),
        array_distinct(shingles(tokens(col("text")), shingleLen)).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    val l = docSh.select(col("sh"), col("doc_id").as("doc_a"), col("n").as("na"))
    val r = docSh.select(col("sh"), col("doc_id").as("doc_b"), col("n").as("nb"))
    l.join(r, Seq("sh"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4).as("jac"))
      .orderBy(col("jac").desc, col("doc_a"), col("doc_b"))
      .limit(k)
  }

  /** Dedup-rate-vs-threshold governance curve: how many near-dup pairs
    * would each Jaccard threshold declare? The number every dedup rollout
    * wants BEFORE picking its t — a threshold choice is a corpus-size
    * decision, and this one report shows the whole tradeoff. Same
    * shared-shingle chain as [[jaccardTopPairs]] (zero-overlap pairs
    * never materialize); the threshold test is INTEGER-exact
    * (10·inter ≥ t10·union — no float ever decides membership), each
    * pair folded into all |thresholds| cells by one tiny cross join.
    * Output: (t10, n_pairs) — pairs with Jaccard ≥ t10/10. */
  def jaccardThresholdCurve(docs: DataFrame, tenths: Seq[Int] = Seq(5, 6, 7, 8, 9),
      shingleLen: Int = 3): DataFrame = {
    val docSh = spreadForCompute(docs)
      .select(col("doc_id"),
        array_distinct(shingles(tokens(col("text")), shingleLen)).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    val l = docSh.select(col("sh"), col("doc_id").as("doc_a"), col("n").as("na"))
    val r = docSh.select(col("sh"), col("doc_id").as("doc_b"), col("n").as("nb"))
    val pairs = l.join(r, Seq("sh"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .select(col("inter"), (col("na") + col("nb") - col("inter")).as("u"))
    val th = docs.sparkSession.range(1)
      .select(explode(array(tenths.map(lit): _*)).as("t10"))
    th.join(pairs, lit(true), "left")
      .groupBy("t10")
      .agg(coalesce(sum(when(col("inter") * 10 >= col("t10") * col("u"), 1L)
        .otherwise(0L)), lit(0L)).as("n_pairs"))
      .orderBy("t10")
  }

  /** Exact Jaccard-≥-threshold pair list on the shared-shingle chain
    * (threshold as integer tenths; 10·inter ≥ t10·union decides — no
    * float membership). The ground-truth side of banding-quality evals;
    * [[setSimilarityJoin]] is the prefix-filtered production form. */
  def jaccardPairsAtLeast(docs: DataFrame, t10: Int, shingleLen: Int = 3): DataFrame = {
    val docSh = spreadForCompute(docs)
      .select(col("doc_id"),
        array_distinct(shingles(tokens(col("text")), shingleLen)).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    val l = docSh.select(col("sh"), col("doc_id").as("doc_a"), col("n").as("na"))
    val r = docSh.select(col("sh"), col("doc_id").as("doc_b"), col("n").as("nb"))
    l.join(r, Seq("sh"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .where(col("inter") * 10 >= lit(t10) * (col("na") + col("nb") - col("inter")))
      .select("doc_a", "doc_b")
  }

  /** Exact threshold set-similarity self-join with PREFIX FILTERING (the
    * AllPairs/ppjoin scheme): token sets ordered by ascending global
    * document frequency (rarest first, ties by token), each doc exposes
    * only its first |x| − ⌈t·|x|⌉ + 1 tokens as join keys — any pair with
    * Jaccard ≥ t MUST collide inside those prefixes, so candidates come
    * from shared RARE tokens only (a stop-word never fans out m² pairs
    * the way the plain shared-token join does), then exact verification
    * by array intersection. Output: (doc_a, doc_b, jac ROUND 4) for every
    * pair with Jaccard ≥ t over distinct-token sets.
    *
    * The ≥ t test is the integer form (1+t)·ov ≥ t·(na+nb) — for t=0.5:
    * 3·ov ≥ na+nb — so the threshold decision is exact on any engine; the
    * division happens only in the reported rounded value.
    *
    * Scale shape: the shingle-frequency join, the prefix-token join, the
    * pair dedup, and two hash joins back to the (doc → sorted set) table —
    * all key-partitioned shuffles; nothing is forced resident. */
  def setSimilarityJoin(docs: DataFrame, t: Double = 0.5, shingleLen: Int = 3): DataFrame =
    setSimilarityJoinOn(orderedShingleSets(docs, shingleLen), t)

  /** (doc_id, ts, n): each document's distinct-shingle set in
    * rarest-global-frequency-first total order (f, tok) with its size —
    * the shared input both [[setSimilarityJoinOn]] and
    * [[containmentJoinOn]] verify against, factored out so a pipeline
    * running both (as the battery does) builds it ONCE.
    *
    * Sets are n-gram SHINGLES, not raw tokens: a small vocabulary makes
    * token sets degenerate (every doc resembles every doc), while the
    * shingle space keeps sets discriminative and prefix candidates sparse.
    *
    * The frequency join carries NO broadcast hint: the distinct-shingle
    * table grows with the corpus (billions of types at web scale), so the
    * scale-safe plan is a shuffle hash join on the already-exploded `tok`
    * stream — AQE still elects a broadcast at runtime when the table is
    * genuinely small, without pinning it to the driver when it isn't.
    *
    * localCheckpoint: prefix generation AND both verification joins read
    * this table — without it the scan+explode+sort chain recomputes three
    * times (measured ~2× slower); blocks die with the caller's reference
    * (the repo cache-lifetime convention). */
  def orderedShingleSets(docs: DataFrame, shingleLen: Int = 3): DataFrame =
    orderedShingleSetsPlan(docs, shingleLen).localCheckpoint()

  /** The [[orderedShingleSets]] plan BEFORE checkpoint materialization —
    * package-visible so the plan spec can assert the frequency join's
    * physical shape (checkpointing collapses lineage to a LogicalRDD,
    * hiding the join from the caller's executedPlan). */
  private[graft] def orderedShingleSetsPlan(docs: DataFrame, shingleLen: Int): DataFrame = {
    val dt = spreadForCompute(docs)
      .select(col("doc_id"),
        explode(array_distinct(shingles(tokens(col("text")), shingleLen))).as("tok"))
    val freq = dt.groupBy("tok").agg(count(lit(1)).as("f"))
    dt.join(freq, "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("f"), col("tok")))).as("st"))
      .select(col("doc_id"), col("st.tok").as("ts"), size(col("st")).as("n"))
  }

  /** [[setSimilarityJoin]] over a prebuilt [[orderedShingleSets]] table. */
  def setSimilarityJoinOn(ordered: DataFrame, t: Double = 0.5): DataFrame = {
    require(t > 0.0 && t <= 1.0, "threshold in (0, 1]")
    // prefix rows carry set size AND prefix position so the candidate
    // join can apply the two ppjoin prunes exactly where pairs are born:
    //  - length filter: J(x,y) ≥ t forces t·|x| ≤ |y| ≤ |x|/t
    //  - positional filter: a pair first met at prefix positions
    //    (pa, pb) can overlap at most min(|x|−pa, |y|−pb), which must
    //    reach α = ⌈t/(1+t)·(|x|+|y|)⌉
    // Both carry −1e-9 slack so a float boundary can only ADMIT an extra
    // candidate, never drop a true pair — the exact verification below
    // (and the unfiltered ground-truth oracle) keep completeness.
    val prefix = ordered.select(col("doc_id"), col("n"),
      posexplode(slice(col("ts"), lit(1),
        (col("n") - ceil(col("n") * lit(t)) + 1).cast("int"))).as(Seq("p", "tok")))
    val cand = prefix.select(col("tok"), col("doc_id").as("doc_a"),
        col("n").as("na"), col("p").as("pa"))
      .join(prefix.select(col("tok"), col("doc_id").as("doc_b"),
        col("n").as("nb"), col("p").as("pb")), "tok")
      .where(col("doc_a") < col("doc_b"))
      .where(col("nb") >= col("na") * lit(t) - lit(1e-9) &&
             col("na") >= col("nb") * lit(t) - lit(1e-9))
      .where(least(col("na") - col("pa"), col("nb") - col("pb")) >=
             ceil((col("na") + col("nb")) * lit(t / (1 + t)) - lit(1e-9)))
      .select("doc_a", "doc_b").distinct()
    val ov = size(array_intersect(col("ta"), col("tb")))
    // pinnedByKey: the verification below is O(|set|) per pair over rows
    // of two longs — exactly the byte-cheap/CPU-dense shape AQE coalesces
    // to one task; pin its parallelism to the cluster
    pinnedByKey(cand, col("doc_a"))
      .join(ordered.select(col("doc_id").as("doc_a"), col("ts").as("ta"), col("n").as("na")), "doc_a")
      .join(ordered.select(col("doc_id").as("doc_b"), col("ts").as("tb"), col("n").as("nb")), "doc_b")
      .where(ov * (1 + t) >= (col("na") + col("nb")) * t)
      .select(col("doc_a"), col("doc_b"),
        round(ov / (col("na") + col("nb") - ov), 4).as("jac"))
  }

  /** Exact threshold CONTAINMENT self-join: every ordered pair (a, b),
    * a ≠ b, with C(a→b) = |A∩B| / |A| ≥ t over distinct-shingle sets —
    * "document a is substantially included in document b". Unlike Jaccard
    * this is ASYMMETRIC: a short quote/boilerplate block nested inside a
    * long page scores high even though their Jaccard is tiny, which is
    * exactly the crawl-dedup case (syndicated snippets, quoted posts,
    * templated wrappers) that a symmetric threshold join misses.
    *
    * Prefix filtering is one-sided, because only the contained side has a
    * prefix bound: with sets ordered rarest-global-frequency-first, any
    * pair with |A∩B| ≥ ⌈t·|A|⌉ must collide inside A's first
    * |A| − ⌈t·|A|⌉ + 1 tokens, but NO symmetric bound exists for the
    * container (B may share only its rarest tail with A). So the
    * candidate join probes A-prefix tokens against ALL of B's tokens —
    * asymmetric fan-out, pruned by the size filter |B| ≥ t·|A| (overlap
    * cannot exceed |B|) applied where pairs are born. Thresholds carry
    * −1e-9 slack so a float boundary can only ADMIT a candidate; the
    * exact integer verification below decides membership (for the
    * default t = 0.8: 5·ov ≥ 4·na, the oracle's form — the slack gap
    * (t·na − 1e-9, t·na) contains no integer for na < ~1e7, far above
    * any per-doc shingle-set size).
    *
    * Scale shape: same skeleton as [[setSimilarityJoin]] — the shared
    * [[orderedShingleSets]] table (shuffle-joined frequency order, no
    * forced broadcast), then the prefix⋈all token join, pair dedup, and
    * two hash joins back to the sorted-set table. The all-tokens probe
    * side is the price of asymmetry; at 100 TB this runs AFTER banding
    * bounds the candidate universe, like the other exact verifiers in
    * this file. */
  def containmentJoin(docs: DataFrame, t: Double = 0.8, shingleLen: Int = 3): DataFrame =
    containmentJoinOn(orderedShingleSets(docs, shingleLen), t)

  /** [[containmentJoin]] over a prebuilt [[orderedShingleSets]] table. */
  def containmentJoinOn(ordered: DataFrame, t: Double = 0.8): DataFrame = {
    require(t > 0.0 && t <= 1.0, "threshold in (0, 1]")
    val prefixA = ordered.select(col("doc_id").as("doc_a"), col("n").as("na"),
      posexplode(slice(col("ts"), lit(1),
        (col("n") - ceil(col("n") * lit(t)) + 1).cast("int"))).as(Seq("pa", "tok")))
    val allB = ordered.select(col("doc_id").as("doc_b"), col("n").as("nb"),
      posexplode(col("ts")).as(Seq("pb", "tok")))
    // Positional filter at pair birth (both sets share the global
    // frequency order, positions 0-based): matches strictly before a
    // collision at (pa, pb) number ≤ min(pa, pb), matches at-or-after ≤
    // min(na−pa, nb−pb), so EVERY collision of a true pair (ov ≥ t·na)
    // satisfies min(pa,pb) + min(na−pa, nb−pb) ≥ ⌈t·na⌉ — filtering
    // collision rows by it can never drop a true pair. What it kills is
    // the asymmetric join's fan-out engine: a FREQUENT token sits at the
    // tail of B's order (nb−pb small) while pa ≤ (1−t)·na, so its
    // collisions bound at ~(1−t)·na + small < t·na and die before the
    // pair-dedup exchange (the r14 sf10 sweep measured the unfiltered
    // form at 25×/decade; the −1e-9 slack admits-only, as above).
    val cand = prefixA.join(allB, "tok")
      .where(col("doc_a") =!= col("doc_b"))
      .where(col("nb") >= col("na") * lit(t) - lit(1e-9))
      .where(least(col("pa"), col("pb")) +
             least(col("na") - col("pa"), col("nb") - col("pb")) >=
             ceil(col("na") * lit(t) - lit(1e-9)))
      .select("doc_a", "doc_b").distinct()
    val ov = size(array_intersect(col("ta"), col("tb")))
    // pinnedByKey: same CPU-dense verification guard as
    // [[setSimilarityJoinOn]] (measured there as a single 12.7 s task)
    pinnedByKey(cand, col("doc_a"))
      .join(ordered.select(col("doc_id").as("doc_a"), col("ts").as("ta"), col("n").as("na")), "doc_a")
      .join(ordered.select(col("doc_id").as("doc_b"), col("ts").as("tb")), "doc_b")
      .where(ov >= col("na") * lit(t) - lit(1e-9))
      .select(col("doc_a"), col("doc_b"),
        round(ov / col("na"), 4).as("containment"))
  }

  /** Corpus-governance overlap matrix: exact shingle-set Jaccard between
    * every pair of SOURCES (src_a < src_b, zero-overlap pairs absent) —
    * "which of my data sources are re-crawls / mirrors of each other",
    * the corpus-level question the per-document joins in this file don't
    * answer. Shape: distinct (source, shingle) — one aggregation whose
    * key count is bounded by S·V, not corpus size — then a shared-shingle
    * self-join whose fan-out is #sources-sharing-the-gram per gram (S²
    * worst case per gram, with S = #sources, typically tens). At 100 TB
    * the same matrix comes from per-source k-min-value signatures
    * (bounded state per source, no shingle self-join); the exact form
    * here is the oracle-checkable ground truth that estimator would be
    * validated against. */
  def sourceOverlap(docs: DataFrame, shingleLen: Int = 3): DataFrame = {
    val ds = spreadForCompute(docs)
      .select(col("source"),
        explode(array_distinct(shingles(tokens(col("text")), shingleLen))).as("sh"))
      .distinct()
    val sz = ds.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = ds.select(col("sh"), col("source").as("src_a"))
      .join(ds.select(col("sh"), col("source").as("src_b")), "sh")
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("i"))
    inter
      .join(broadcast(sz.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(sz.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .select(col("src_a"), col("src_b"),
        round(col("i") / (col("na") + col("nb") - col("i")), 4).as("jac"))
  }

  /** The 100 TB path for [[sourceOverlap]]: k-min-value (KMV) sketch
    * estimate of the same matrix. Per source keep only the k smallest
    * md5(shingle) values — bounded state S·k regardless of corpus size —
    * then estimate J(A,B) = |X ∩ A ∩ B| / |X| where X is the k smallest
    * of A ∪ B (the classic KMV Jaccard estimator; std err ≈ √(J(1−J)/k),
    * ~0.03 at k=256). Fully deterministic (md5 order, no RNG), so the
    * DuckDB oracle replays it EXACTLY rather than bounding it; the
    * agreement-with-exact bound is ExtSpec's job.
    *
    * The per-source k-min is the bounded-heap [[graft.functions.KMinAgg]]
    * typed aggregate: each task reduces its rows into one ≤k-entry
    * buffer BEFORE the exchange, so the shuffle carries O(k) per
    * (task, source) and no per-source sort of the value universe ever
    * runs (the r12 row_number form ranked ALL distinct hashes to keep
    * 256 — PlanSpec now pins the sort-free plan). Pair scoring is
    * a broadcast self-join over the S-row signature table: in-row array
    * arithmetic, no gram-level join at all (the whole point vs the exact
    * form's shared-shingle join). */
  def sourceOverlapKMV(docs: DataFrame, k: Int = 256, shingleLen: Int = 3): DataFrame = {
    // No (source, sh) distinct: KMinAgg rejects duplicate values itself
    // (in-heap dup → O(k) membership scan; already-evicted dup → ≥ max,
    // O(1) reject), so a pre-dedup would only trade map-side O(1) rejects
    // for a full shuffle of the shingle UNIVERSE — the one exchange left
    // is the partial→final agg at O(k · tasks · sources) records
    // (KmvShuffleSpec pins the flat-in-input-size write metric).
    val ds = spreadForCompute(docs)
      .select(col("source"),
        explode(array_distinct(shingles(tokens(col("text")), shingleLen))).as("sh"))
    val kmin = org.apache.spark.sql.functions.udaf(
      new graft.functions.KMinAgg(k))
    val sig = ds.select(col("source"), md5(col("sh")).as("h"))
      .groupBy("source").agg(kmin(col("h")).as("sig"))
    val a = sig.select(col("source").as("src_a"), col("sig").as("sa"))
    val b = sig.select(col("source").as("src_b"), col("sig").as("sb"))
    val unionK = slice(array_sort(array_union(col("sa"), col("sb"))), 1, k)
    val both = array_intersect(col("sa"), col("sb"))
    a.crossJoin(broadcast(b)).where(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(size(array_intersect(unionK, both)) /
          least(lit(k), size(array_union(col("sa"), col("sb")))).cast("double"),
          4).as("jac_est"))
      .where(col("jac_est") > 0)
  }

  /** 60-bit SimHash from md5 nibble arithmetic (BIGINT-safe in Spark and
    * DuckDB; 64-bit would overflow signed on bit 63). Each token occurrence
    * votes ±1 per bit; bit j of the result is set iff the vote sum is
    * positive. Pure integer arithmetic — engine-portable.
    *
    * This HOF form is the SPECIFICATION (it is what the DuckDB oracle
    * mirrors); [[simhashes]] computes the same function via explode +
    * codegen'd aggregation, which is the execution path. Kept runnable
    * (`expr(simhash60Sql)` over an `hs` md5-array column) so the
    * equivalence stays testable. */
  val simhash60Sql: String =
    """aggregate(
      |  transform(sequence(0, 59), j ->
      |    CASE WHEN aggregate(hs, CAST(0 AS BIGINT), (acc, h) ->
      |      acc + 2 * (((instr('0123456789abcdef', substring(h, CAST(j DIV 4 AS INT) + 1, 1)) - 1)
      |                 DIV CAST(pow(2, 3 - j % 4) AS INT)) % 2) - 1) > 0
      |    THEN CAST(pow(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
      |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin

  /** docs(doc_id, text) → (doc_id, simhash) with the 60-bit signature.
    *
    * Formulation: the md5's first 15 hex chars are one 60-bit integer
    * (`conv(hex, 16, 10)`); bit j of the signature reads bit 59−j of
    * that value (hex char j/4, nibble bit 3−j%4 — exactly
    * [[simhash60Sql]]'s mapping). Explode + 60 codegen'd SUM aggregates
    * replaces the interpreted higher-order-function form: partial
    * aggregation tallies the per-bit votes map-side, and vote_j > 0 ⟺
    * 2·Σbit_j > n. Result is bit-identical to the HOF form (same DuckDB
    * oracle); `explode_outer` keeps token-less docs (signature 0, as an
    * empty vote list yields). */
  def simhashes(docs: DataFrame): DataFrame = {
    val toks = spreadForCompute(docs).select(col("doc_id"),
      explode_outer(tokens(col("text"))).as("t"))
    val v = conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long")
    val votes = toks.select(col("doc_id"), v.as("v"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        (0 until 60).map(j =>
          sum(shiftright(col("v"), 59 - j).bitwiseAND(lit(1L))).as(s"b$j")): _*)
    val sig = (0 until 60).map(j =>
      when(col(s"b$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist, via block
    * banding — the scale form of [[simhashNearPairs]]. Pigeonhole: two
    * signatures within `maxDist` differing bits agree on at least one of
    * maxDist+1 disjoint bit blocks, so candidates are generated
    * bucket-locally (group by (block, block-value), in-row pair
    * expansion — same shape as [[minhashCandidates]]) and only candidates
    * pay the exact xor+bit_count check. Result is EXACTLY the all-pairs
    * filter's — banding changes the plan, not the answer — so it shares
    * the all-pairs DuckDB oracle. All integer ops; engine-portable. */
  def simhashBandedPairs(sims: DataFrame, maxDist: Int, bits: Int = 60): DataFrame = {
    val nBlocks = maxDist + 1
    val widths = Array.tabulate(nBlocks)(b => bits / nBlocks + (if (b < bits % nBlocks) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    val blockCols = (0 until nBlocks).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("simhash"), starts(b)).bitwiseAND(lit((1L << widths(b)) - 1)).as("v"))
    }
    // Materialize the (tiny: one row per doc) signature table once — the
    // candidate step is a SELF-join, and without the checkpoint both
    // sides would recompute the per-token-md5 signature pipeline. The
    // checkpoint's blocks are freed by the ContextCleaner when the
    // returned frame becomes unreachable (no explicit unpersist needed;
    // state is one long per doc, bounded).
    val sigs = sims.localCheckpoint()
    val banded = sigs.select(col("doc_id"), col("simhash"),
        explode(array(blockCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.blk").as("blk"), col("bk.v").as("v"))
    // flat shuffle join on (block, value): stays inside whole-stage
    // codegen (a collect_list bucket expansion would not), the xor+
    // bit_count filter pipelines right behind the join, and AQE
    // skew-splits an oversized bucket instead of one task eating it
    val l = banded.select(col("blk"), col("v"),
      col("doc_id").as("doc_a"), col("simhash").as("ha"))
    val r = banded.select(col("blk"), col("v"),
      col("doc_id").as("doc_b"), col("simhash").as("hb"))
    // emit-once dedup WITHOUT a distinct shuffle: a candidate pair joins
    // once per agreeing block, but only the row whose blk is the FIRST
    // agreeing block survives — decidable locally from (ha, hb) bits
    val firstAgree = (0 until nBlocks).map { b =>
      val earlierDiffer = (0 until b).map { bp =>
        shiftright(col("ha"), starts(bp)).bitwiseAND(lit((1L << widths(bp)) - 1)) =!=
          shiftright(col("hb"), starts(bp)).bitwiseAND(lit((1L << widths(bp)) - 1))
      }.foldLeft(lit(true))(_ && _)
      col("blk") === b && earlierDiffer
    }.reduce(_ || _)
    l.join(r, Seq("blk", "v"))
      .where(col("doc_a") < col("doc_b") && firstAgree)
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("dist"))
      .where(col("dist") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  /** Snapshot-incremental dedup — the production "new crawl vs existing
    * corpus" step: every NEW doc flagged exact-dup (content hash seen in
    * the old corpus) and/or near-dup (shares a MinHash LSH band key with
    * any old doc). Old-side state is exactly what an incremental pipeline
    * persists between runs: the distinct content-hash set and the distinct
    * (band, key) set — both far smaller than the corpus, both
    * semi-join-able (no old text ever re-read at scale). */
  def incrementalDedup(newDocs: DataFrame, oldDocs: DataFrame,
      numHashes: Int = 8, bands: Int = 4, shingleLen: Int = 3): DataFrame = {
    val newH = newDocs.select(col("doc_id"), md5(col("text")).as("h"))
    val oldH = oldDocs.select(md5(col("text")).as("h")).distinct()
    val exact = newH.join(oldH, Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("exact_dup", lit(1))
    val newB = minhashBands(newDocs, numHashes, bands, shingleLen)
    val oldB = minhashBands(oldDocs, numHashes, bands, shingleLen)
      .select("band", "key").distinct()
    val near = newB.join(oldB, Seq("band", "key"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("near_dup", lit(1))
    newDocs.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(0)).as("exact_dup"),
        coalesce(col("near_dup"), lit(0)).as("near_dup"))
  }

  /** Arrival-order (first-wins) near-dup marking: a document is a
    * duplicate iff ANY of its LSH band buckets already holds an earlier
    * document (smaller doc_id = earlier arrival) — the online crawl-dedup
    * policy, where the first crawl of a page wins and every later
    * near-copy is dropped on sight.
    *
    * Scale shape vs the pairwise path: ONE (band,key) shuffle, no pair
    * materialization, no union-find — a bucket holding B near-identical
    * docs costs O(B), not O(B²), so the giant boilerplate cluster every
    * crawl contains cannot blow up the plan the way candidate-pair
    * generation can. The trade: no similarity estimate and a
    * transitive-chain keep/drop (exactly what the online policy does).
    *
    * Returns every input doc: (doc_id, dup ∈ {0,1}, dup_of = earliest
    * doc sharing a bucket, NULL when kept). Shingle-free docs (< shingleLen
    * tokens) have no buckets and are always kept. */
  def firstWinsNearDup(docs: DataFrame, numHashes: Int = 8, bands: Int = 4,
      shingleLen: Int = 3): DataFrame = {
    val b = minhashBands(docs, numHashes, bands, shingleLen)
    val owners = b.groupBy("band", "key").agg(min(col("doc_id")).as("owner"))
    val marked = b.join(owners, Seq("band", "key"))
      .groupBy("doc_id").agg(min(col("owner")).as("dup_of0"))
    docs.select("doc_id").join(marked, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of0") < col("doc_id"), 1).otherwise(0).as("dup"),
        when(col("dup_of0") < col("doc_id"), col("dup_of0")).as("dup_of"))
  }

  /** Content-defined chunking + cross-doc duplicate-chunk report — the
    * sub-document dedup that catches shared boilerplate at ARBITRARY
    * offsets (sentence/paragraph splits miss a shifted copy; a rolling
    * content-derived boundary re-synchronizes). Boundary rule: a chunk
    * ends after token i when md5 of the `window`-token shingle ending at
    * i falls in bucket 0 of `avgChunk` (so chunks average ~avgChunk
    * tokens and the SAME text always chunks the SAME way, wherever it
    * appears). Chunking runs entirely in-row via the native
    * [[graft.functions.CdcChunks]] expression (one token-array walk per
    * doc — no posexplode, no per-doc window prefix-sum shuffle, no
    * collect_list reassembly); the dup report's only exchange is the
    * final hash-groupBy — same scale shape as [[exactDupGroups]]. */
  def cdcChunkDups(docs: DataFrame, window: Int = 3, avgChunk: Int = 8): DataFrame = {
    val chunks = spreadForCompute(docs)
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("doc_id"), explode(
        graft.functions.CdcChunks.cdcChunksNative(col("ts"), window, avgChunk))
        .as("chunk_text"))
    chunks.groupBy(md5(col("chunk_text")).as("h"))
      .agg(count(lit(1)).as("c"), countDistinct(col("doc_id")).as("n_docs"))
      .where(col("c") > 1)
      .orderBy("h")
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist. All-pairs form
    * (small data / post-banding); at scale use [[simhashBandedPairs]]. */
  def simhashNearPairs(sims: DataFrame, maxDist: Int): DataFrame = {
    val l = sims.toDF("doc_a", "ha")
    val r = sims.toDF("doc_b", "hb")
    l.join(r, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("dist"))
      .where(col("dist") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact repeated-substring spans — the "ExactSubstr" dedup shape of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), re-expressed relationally: a character position is
    * duplicated when the length-`l` gram starting there also occurs in at
    * least one OTHER document; runs of duplicated positions merge into
    * maximal spans (two grams whose starts are ≤ l apart cover overlapping
    * or adjacent characters, so a new span opens only on a gap > l).
    *
    * Plan: explode each doc into its stride-1 (position, gram) slide —
    * exactness is the point; the reference scheme's suffix array becomes a
    * gram-keyed shuffle, in TWO passes that together move a fraction of
    * the one-pass form's bytes (guide §8: shuffle a lightweight proxy,
    * reattach the payload):
    *   1. the full slide shuffles only (xxhash64(gram), doc_id, p) —
    *      fixed-width 8-byte keys instead of l-char strings (~2.5×
    *      fewer bytes, 8-byte instead of l-byte group compares). The
    *      occurrence list rides through the hash-agg
    *      (`collect_list(doc_id, p)` per hash — list size = hash
    *      frequency, overwhelmingly 1–3) and "occurs in ≥2 distinct
    *      docs" filters as `min(doc_id) ≠ max(doc_id)`. Equal grams
    *      always share a hash, so surviving positions are a SUPERSET of
    *      the duplicated ones (a 64-bit collision can only add
    *      candidates, never hide one);
    *   2. the survivors — a few % of positions at natural dup rates —
    *      re-derive their raw grams via a doc-keyed join back to the
    *      text and re-group EXACTLY on the gram, so the output is
    *      identical to one-pass raw-gram grouping (and to the oracle,
    *      which still groups raw grams) even under hash collisions.
    * The one-pass raw-gram form measured 4× over the
    * countDistinct-groupBy + join-back form at 10× (two pos shuffles)
    * and strictly better than a gram-partitioned window (whose
    * per-partition sort spills at 100×); the hashed phase-1 then cut it
    * 202 → 118 s at the ×100 sweep. A pathologically hot gram (one
    * 40-char string in millions of docs) would fatten its one list row —
    * the standard heavy-key caveat; at that density the span is the whole
    * corpus and pre-capping list length would be the production guard.
    * A per-doc (keyed, never global) window then merges positions into
    * spans.
    *
    * Output: (doc_id, span_start, span_end) — 1-based inclusive character
    * offsets of every maximal cross-doc-duplicated span. */
  def repeatedSpans(docs: DataFrame, l: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = spreadForCompute(docs.select(col("doc_id"), col("text")))
      .where(length(col("text")) >= l)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - lit(l - 1))).as("p"))
      .select(col("doc_id"), col("p"),
        col("text").substr(col("p"), lit(l)).as("gram"))
    def crossDocOcc(df: DataFrame, key: Column): DataFrame = df
      .groupBy(key.as("k"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
        collect_list(struct(col("doc_id"), col("p"))).as("occ"))
      .where(col("mn") =!= col("mx"))
      .select(explode(col("occ")).as("o"))
      .select(col("o.doc_id").as("doc_id"), col("o.p").as("p"))
    val cand = crossDocOcc(pos.select(col("doc_id"), col("p"),
      xxhash64(col("gram")).as("h")), col("h"))
    val surv = cand.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("p"),
        col("text").substr(col("p"), lit(l)).as("gram"))
    val w = Window.partitionBy("doc_id").orderBy("p")
    crossDocOcc(surv, col("gram"))
      .withColumn("prev", lag(col("p"), 1).over(w))
      .withColumn("fresh",
        when(col("prev").isNull || col("p") - col("prev") > l, 1).otherwise(0))
      .withColumn("grp", sum(col("fresh")).over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("p")).as("span_start"), (max(col("p")) + lit(l - 1)).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** ExactSubstr REMOVAL: cut every [[repeatedSpans]] span out of the
    * text — the conservative remove-all-copies variant Lee et al. 2022
    * also ship (keep-one-copy needs a global owner election per span —
    * a different op, deliberately not conflated here). Docs without
    * duplicated spans pass through byte-identical.
    *
    * Plan: spans collapse to one tiny per-doc sorted array (collect_list
    * over the handful of merged spans), left-join back to the corpus on
    * doc_id, then a per-row in-row fold (codegen'd `aggregate` HOF over
    * the span array: emit the segment before each span, jump the cursor
    * past it, append the tail). Adds exactly one keyed shuffle + one
    * keyed join on top of [[repeatedSpans]]; the text itself never
    * shuffles beyond the join. */
  def removeRepeatedSpans(docs: DataFrame, l: Int = 40): DataFrame = {
    val spans = repeatedSpans(docs, l)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
        .as("sp"))
    docs.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("sp").isNull, col("text")).otherwise(
          aggregate(col("sp"),
            struct(lit(1).as("cur"), lit("").as("acc")),
            (st, s) => struct(
              (s.getField("span_end") + 1).as("cur"),
              concat(st.getField("acc"),
                col("text").substr(st.getField("cur"),
                  s.getField("span_start") - st.getField("cur"))).as("acc")),
            st => concat(st.getField("acc"),
              col("text").substr(st.getField("cur"),
                length(col("text")) - st.getField("cur") + 1))))
          .as("clean_text"))
  }

  /** Exact duplicate groups by content hash (hash-groupBy; one shuffle). */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"), sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      .where(col("c") > 1)
      .orderBy("h")

  /** Connected components over candidate near-dup pairs: every doc in the
    * pair graph gets labeled with the smallest doc_id reachable from it —
    * the cluster representative (= which copy to keep). Deterministic.
    * Input: (doc_a, doc_b); output: (doc_id, cluster) for every doc
    * appearing in ≥1 pair.
    *
    * The pair graph is orders of magnitude smaller than the corpus (only
    * near-dups pair up), so when it fits on the driver
    * (≤ localThreshold edges — the 1M default stays well under ~100 MB
    * of boxed driver state) a path-compressed union-find runs in
    * O(E α(E)) with zero extra Spark jobs; beyond that the distributed
    * min-label-propagation loop ([[dupClustersDistributed]]) takes over. */
  def dupClusters(pairs0: DataFrame, localThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs0.sparkSession
    import spark.implicits._
    val pairs = pairs0
      .select(col("doc_a").cast("long").as("doc_a"), col("doc_b").cast("long").as("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val out =
      if (nPairs <= localThreshold) {
        val es = pairs.as[(Long, Long)].collect()
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // min-root invariant: cluster id = smallest member
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct.sorted
        spark.createDataset(nodes.toSeq.map(n => (n, find(n)))).toDF("doc_id", "cluster")
      } else dupClustersDistributed(pairs)
    pairs.unpersist(blocking = false)
    out
  }

  /** Distributed components by iterative min-label propagation with
    * pointer jumping (path halving): one join+aggregate per round,
    * converging in O(log diameter) rounds; each round's `labels` is
    * V_pairs rows, never the corpus. */
  def dupClustersDistributed(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.toDF("b", "nc"), "b")
        .groupBy(col("a").as("doc_id")).agg(min(col("nc")).as("nmin"))
      val relaxed = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
      // pointer jump (path halving): cluster := cluster's cluster, so a
      // length-d chain resolves in O(log d) rounds instead of O(d)
      val next = relaxed.toDF("doc_id", "c1")
        .join(relaxed.toDF("c1", "c2"), Seq("c1"), "left")
        .select(col("doc_id"), coalesce(col("c2"), col("c1")).as("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one tiny driver-side count per round (also materializes `next`)
      changed = next.toDF("doc_id", "nc2").join(labels, "doc_id")
        .where(col("nc2") =!= col("cluster")).count()
      labels.unpersist(blocking = false)
      // no per-round localCheckpoint: its RDD-level blocks are invisible
      // to Dataset.unpersist and would linger until GC. Pointer jumping
      // bounds rounds at O(log diameter), so the plan growing by a few
      // joins per round stays shallow; each round reads the previous
      // round's CACHED result, never recomputing the chain.
      labels = next
    }
    edges.unpersist(blocking = false)
    // Hand back a localCheckpoint of the converged labels and drop the
    // loop's cache generation: the result is materialized (no recompute of
    // the unpersisted chain) and its blocks die with the caller's reference
    // (ContextCleaner on GC), instead of one CacheManager entry leaking per
    // call in a long-running session.
    val out = labels.localCheckpoint(eager = true)
    labels.unpersist(blocking = false)
    out
  }

  /** The near-dup pipeline's final act: drop every clustered doc except
    * its cluster representative (= the smallest doc_id, the
    * [[dupClusters]] label), keep all unclustered docs — the distributed
    * "keep one copy of each near-dup family" a pretraining corpus build
    * ends with. One left-anti join of the corpus against the non-rep set.
    * No broadcast hint: on a real web crawl 30–50% of docs are near-dups,
    * so `nonReps` is O(corpus) — a shuffled anti-join is the scale-safe
    * plan, and AQE still broadcasts when the set is genuinely small. */
  def keepNearDupCanonical(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val nonReps = dupClusters(pairs)
      .where(col("doc_id") =!= col("cluster"))
      .select("doc_id")
    docs.join(nonReps, Seq("doc_id"), "left_anti")
  }

  /** Edit-distance near-dup pairs with prefix blocking: candidate pairs
    * share an exact `blockLen`-char prefix (the blocking key — the classic
    * record-linkage trick that turns an O(n²) all-pairs Levenshtein into
    * per-block joins), scored by Levenshtein distance over the first
    * `prefixLen` chars, lowest-distance `topK` pairs reported.
    *
    * Scale shape: one flat self-join on the block key (codegen'd hash
    * join; AQE skew-split handles an oversized block), never a cartesian
    * product — the same bucket-local pattern as the LSH/minhash candidate
    * joins. Levenshtein is O(prefixLen²) per pair, so `prefixLen` caps
    * per-pair cost independent of document length; the global top-k is a
    * TakeOrdered (no full sort shuffle). */
  def editDistancePairs(docs: DataFrame, blockLen: Int = 8, prefixLen: Int = 128,
      topK: Int = 10): DataFrame = {
    val b = spreadForCompute(docs).select(col("doc_id"),
      substring(col("text"), 1, blockLen).as("bk"),
      substring(col("text"), 1, prefixLen).as("pre"))
    val l = b.toDF("doc_a", "bk", "pre_a")
    val r = b.toDF("doc_b", "bk", "pre_b")
    l.join(r, "bk").where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pre_a"), col("pre_b")).as("dist"))
      .orderBy(col("dist"), col("doc_a"), col("doc_b"))
      .limit(topK)
  }

  /** Record-linkage top-k by native Jaro–Winkler under the same prefix
    * blocking as [[editDistancePairs]] — the name/entity-matching
    * similarity (prefix-weighted, transposition-tolerant) where edit
    * distance over-penalizes swaps. The per-pair kernel is the
    * codegen'd [[graft.functions.JaroWinklerSim]] expression
    * (byte-parity with DuckDB's `jaro_winkler_similarity`, so the query
    * is hash-checked); ranking happens on the RAW double, rounding only
    * in the output. Same scale shape: block-key equi-join, TakeOrdered
    * top-k, never a cartesian. */
  def jaroWinklerPairs(docs: DataFrame, blockLen: Int = 8, prefixLen: Int = 128,
      topK: Int = 10): DataFrame = {
    val b = spreadForCompute(docs).select(col("doc_id"),
      substring(col("text"), 1, blockLen).as("bk"),
      substring(col("text"), 1, prefixLen).as("pre"))
    // Block sizes follow the first-token distribution, so a hot block's
    // quadratic pair expansion — and the ~20 µs/pair JW kernel evaluated
    // inside the join's project — lands in ONE task (AQE's skew split
    // can't see it: the skew is in pair COMPUTE, not input bytes). Salt
    // the block join itself ([[graft.ext.ScaleJoins.saltedJoin]] scheme,
    // deterministic hash salt): the hot block's cells spread across
    // `salt` tasks while the expanded pair stream — prefix pairs are
    // ~30× the input — is never re-shuffled. Measured on the skewed
    // 4.2M-pair leg: 46 s → 7 s; on the 42M-pair leg the pair-stream
    // round-robin alternative REGRESSED 58 → 73 s, salting does not.
    val salt = docs.sparkSession.sparkContext.defaultParallelism
    val l = b.toDF("doc_a", "bk", "pre_a")
      .withColumn("_s", pmod(hash(col("doc_a")), lit(salt)))
    val r = b.toDF("doc_b", "bk", "pre_b")
      .withColumn("_s", explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq("bk", "_s")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.JaroWinkler.jaroWinkler(col("pre_a"), col("pre_b")).as("raw"))
      .orderBy(col("raw").desc, col("doc_a"), col("doc_b"))
      .limit(topK)
      // floor-form 4dp quantization — see sortedNeighborhoodPairs for
      // why round(x, 4) is not cross-engine-safe at .5 boundaries
      .select(col("doc_a"), col("doc_b"),
        (floor(col("raw") * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("jw"))
  }

  /** Sorted-neighborhood record linkage (Hernández & Stolfo 1995): rank
    * every record by a derived sort key, then score only pairs within a
    * sliding window of `window` ranks — the linkage blocking scheme that
    * catches near-misses PREFIX blocking drops (two records whose keys
    * differ in the first character never share a block, but usually land
    * adjacent in sort order). Pairs at rank distance 1..window-1 scored
    * by the native Jaro–Winkler kernel over `prefixLen`-char prefixes;
    * pairs at or above `minSim` survive (threshold on the RAW double,
    * rounding only in the output).
    *
    * Distribution: the global rank is the repo's sortBy+zipWithIndex
    * two-job scheme on (key bytes, doc_id) — no single-partition window;
    * the sliding window becomes a bucket equi-join (bucket = rank /
    * window, right side replicated into its own and the preceding
    * bucket, so every qualifying pair matches exactly once) — never a
    * non-equi range join. Output (doc_a, doc_b) is rank-ordered:
    * doc_a precedes doc_b in sort order. */
  def sortedNeighborhoodPairs(docs: DataFrame, keyLen: Int = 24,
      window: Int = 5, prefixLen: Int = 64, minSim: Double = 0.9): DataFrame = {
    require(window >= 2, "window >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = spreadForCompute(docs).select(col("doc_id"),
      substring(col("text"), 1, keyLen).as("k"),
      substring(col("text"), 1, prefixLen).as("pre"))
    val byKeyThenId: Ordering[(Array[Byte], Long)] =
      Ordering.Tuple2(graft.lda.Corpus.unsignedBytes, Ordering.Long)
    val ranked = keyed.select("k", "doc_id").as[(String, Long)].rdd
      .sortBy(x => (x._1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        x._2))(byKeyThenId, implicitly)
      .zipWithIndex()
      .map { case ((_, id), rk) => (id, rk) }.toDF("doc_id", "rk")
    val base = keyed.join(ranked, "doc_id")
      .select(col("doc_id"), col("pre"), col("rk"),
        (col("rk") / window).cast("long").as("b"))
    val l = base.select(col("doc_id").as("doc_a"), col("pre").as("pre_a"),
      col("rk").as("ra"), col("b"))
    val r = base.select(col("doc_id").as("doc_b"), col("pre").as("pre_b"),
      col("rk").as("rb"),
      explode(array(col("b"), col("b") - 1)).as("b"))
    l.join(r, "b")
      .where(col("rb") > col("ra") && col("rb") <= col("ra") + (window - 1))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.JaroWinkler.jaroWinkler(col("pre_a"), col("pre_b")).as("raw"))
      .where(col("raw") >= minSim)
      // floor(x·1e4 + 0.5)/1e4, NOT round(x, 4): Spark's round is
      // decimal-string HALF_UP while DuckDB's is a double multiply —
      // they disagree when raw·1e4 lands within one multiplication ulp
      // of a .5 boundary (first hit at sf1: raw = 0.9037499999999999,
      // whose ·1e4 product rounds to exactly 9037.5). The floor form is
      // the same IEEE ops on bit-equal doubles in both engines.
      .select(col("doc_a"), col("doc_b"),
        (floor(col("raw") * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("jw"))
      .orderBy(col("jw").desc, col("doc_a"), col("doc_b"))
  }

  /** Materialize the deduplicated corpus: keep ONE canonical doc (lowest
    * doc_id) per exact content group — the "write the cleaned dataset"
    * step after [[exactDupGroups]] reports. One shuffle on the digest;
    * deterministic (min-id canon, not dropDuplicates' arbitrary row). */
  def keepCanonical(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    docs.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
