package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY §2.4): language
  * ID, quality scoring, token counting, document fingerprinting. All
  * deterministic, UDF-free, engine-portable (DuckDB oracles). */
object TextAnalysis {

  /** Tiny per-language stopword profiles (public, standard lists). The
    * n-gram-free heuristic: score = stopword hits per language, argmax;
    * 'und' (undetermined) when every score is zero. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "is", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"),
  )

  private def hits(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** docs(doc_id, text) → (doc_id, lang_pred). Ties broken by language
    * code ascending (the scores array is lang-ordered and the fold keeps
    * the first maximum); all-zero → 'und'. */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    docs
      .select(col("doc_id"),
        array(stopwords.map { case (lang, ws) =>
          struct(hits(toks, ws).as("s"), lit(lang).as("lang"))
        }: _*).as("scores"))
      .select(col("doc_id"),
        aggregate(col("scores"),
          struct(lit(-1).as("s"), lit("und").as("lang")),
          (best, x) => when(x("s") > best("s"), x).otherwise(best)).as("best"))
      .select(col("doc_id"),
        when(col("best.s") === 0, "und").otherwise(col("best.lang")).as("lang_pred"))
  }

  /** Quality metrics + composite score. Pure arithmetic (no
    * transcendentals — keeps the DuckDB oracle bit-exact):
    * score = 0.3·min(n_tokens/100, 1) + 0.4·stopword_ratio
    *       + 0.3·min(avg_tok_len/10, 1). */
  def qualityMetrics(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    val en = stopwords.toMap.apply("en")
    docs.select(col("doc_id"), toks.as("ts"), col("text"))
      .select(
        col("doc_id"),
        size(col("ts")).as("n_tokens"),
        round(aggregate(col("ts"), lit(0), (acc, t) => acc + length(t)).cast("double")
          / size(col("ts")), 4).as("avg_tok_len"),
        round(hits(col("ts"), en).cast("double") / size(col("ts")), 4).as("stopword_ratio"),
        round((length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("double") / length(col("text")), 4).as("digit_ratio"))
      // no final ROUND: the weighted sum can land exactly on a .00005
      // boundary where Spark (decimal HALF_UP) and DuckDB (binary) round
      // differently; the doubles themselves are bit-identical, so the
      // driver's %.4f rendering normalizes them
      .withColumn("quality_score",
        lit(0.3) * least(col("n_tokens") / 100.0, lit(1.0))
          + lit(0.4) * col("stopword_ratio")
          + lit(0.3) * least(col("avg_tok_len") / 10.0, lit(1.0)))
  }

  /** Gopher-style rule filter (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Table A1 document
    * heuristics) — the hard-threshold sibling of [[qualityMetrics]]'s
    * scored ranking. Five rules re-expressed over the fixture tokenization
    * (single-space tokens): word count in [50, 100000]; mean word length
    * in [3, 10]; fraction of words containing an alphabetic character ≥
    * 0.8; symbol-to-word ratio ('#' or '…') ≤ 0.1; ≥ 2 distinct stopwords
    * present (this repo's `en` list stands in for Gopher's 8-word set —
    * the fixture vocabulary contains too few of the originals to
    * discriminate). Line-shape rules (bullet/ellipsis line ratios) are
    * omitted: the fixture corpus is single-line. Pure per-row arithmetic —
    * one projection, no shuffle, no UDF. */
  def gopherQuality(docs: DataFrame): DataFrame = {
    val en = array(stopwords.toMap.apply("en").map(lit): _*)
    def countChar(c: String) =
      length(col("text")) - length(regexp_replace(col("text"), c, ""))
    // ratio metrics are NULL (not NaN/÷0) on token-free docs — such docs
    // still fail r_words, so gopher_pass stays a clean 0 (FALSE AND NULL
    // = FALSE in both engines)
    def ratio(num: Column) =
      when(size(col("ts")) === 0, lit(null))
        .otherwise(round(num.cast("double") / size(col("ts")), 4))
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("ts"), col("text"))
      .select(
        col("doc_id"),
        size(col("ts")).as("n_words"),
        ratio(aggregate(col("ts"), lit(0), (a, t) => a + length(t)))
          .as("mean_word_len"),
        ratio(size(filter(col("ts"), t => t.rlike("[a-zA-Z]")))).as("alpha_frac"),
        ratio(countChar("#") + countChar("…")).as("symbol_ratio"),
        size(array_intersect(col("ts"), en)).as("n_stop"))
      .withColumn("r_words",
        (col("n_words") >= 50 && col("n_words") <= 100000).cast("int"))
      .withColumn("r_word_len",
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).cast("int"))
      .withColumn("r_alpha", (col("alpha_frac") >= 0.8).cast("int"))
      .withColumn("r_symbol", (col("symbol_ratio") <= 0.1).cast("int"))
      .withColumn("r_stop", (col("n_stop") >= 2).cast("int"))
      .withColumn("gopher_pass",
        (col("r_words") === 1 && col("r_word_len") === 1 && col("r_alpha") === 1
          && col("r_symbol") === 1 && col("r_stop") === 1).cast("int"))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex pass
    * (alnum runs vs single non-space symbols — a cheap proxy for subword
    * token counts). */
  def tokenStats(docs: DataFrame): DataFrame = {
    docs.select(
      col("doc_id"),
      size(Dedup.tokens(col("text"))).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z0-9]+|[^a-z0-9\\s]")).as("re_tokens"))
  }

  /** Winnowing-style document fingerprint: min md5 over 5-token shingles
    * (falls back to md5(text) for very short docs). Portable analogue of a
    * Karp–Rabin rolling-hash fingerprint — the true rolling hash is
    * [[rollingFingerprint]] below for library use. */
  def fingerprints(docs: DataFrame, shingleLen: Int = 5): DataFrame = {
    val sh = Dedup.shingles(Dedup.tokens(col("text")), shingleLen)
    docs.select(col("doc_id"),
      when(size(sh) > 0, array_min(transform(sh, s => md5(s))))
        .otherwise(md5(col("text"))).as("fp"))
  }

  /** TF-IDF per (doc, token): tf = in-doc count, idf = ln(N / df) with
    * N = docs containing ≥1 token, df = docs containing the token. The
    * df side is a token-level aggregate (V rows — broadcast back onto the
    * bow); N is a scalar. Two shuffles total (bow group-by + df group-by),
    * both map-side-combined; no shuffle for the join (broadcast). */
  def tfIdf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val bow = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val n = toks.select(countDistinct(col("doc_id")).as("n"))
    bow.join(broadcast(df), "tok")
      .crossJoin(broadcast(n))
      // no final ROUND (quality_score rationale). Caveat: log() here is
      // StrictMath.log while DuckDB's ln is platform libm — a 1-ulp
      // divergence is possible; it only becomes visible if the value then
      // sits exactly on a %.4f rendering boundary. Oracle parity verified
      // empirically at sf0.01 AND sf0.1 (all idf values hash-match); a
      // ROUND would carry the same boundary risk, so raw is kept.
      .select(col("doc_id"), col("tok"), col("tf"),
        (col("tf") * log(col("n").cast("double") / col("df"))).as("tfidf"))
  }

  /** Top-k keyword extraction per document: the k highest-tf-idf tokens
    * — the "what is this document about" tagging primitive (and the
    * classic cheap summarizer for corpus browsing / topic labeling).
    * Ranking happens on ROUND(tfidf, 4): the raw double's last ulp can
    * differ across engines when two (tf, df) pairs are mathematically
    * tied (tf₁·ln(n/df₁) = tf₂·ln(n/df₂) has integer solutions), and a
    * rank must not hinge on which libm rounded last; ties then break on
    * the token itself, making the order total. The per-doc top-k is a
    * row_number over the doc-keyed window [[tfIdf]] already shuffled by
    * — no new exchange, never a global sort. Output:
    * (doc_id, rk 1..k, tok, tfidf ROUND·,4). */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("tok"))
    tfIdf(docs)
      .select(col("doc_id"), col("tok"), round(col("tfidf"), 4).as("tfidf"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("doc_id", "rk", "tok", "tfidf")
  }

  /** Word-complexity profile per document — the word-level half of the
    * classic readability indices (Flesch / Gunning-Fog), the half that
    * survives a corpus without sentence punctuation: syllables
    * approximated as maximal vowel runs per token, "complex" = ≥ 3
    * runs (Fog's polysyllable rule). Everything is an in-row HOF over
    * the token array (regexp count per token, one fold) — a pure
    * projection, no shuffle, scan-speed at any corpus size. Tokens
    * without vowels (digits, CJK) count 0 runs, matching the indices'
    * blindness outside alphabetic scripts. Output: (doc_id, n_toks,
    * n_syllables, n_complex, avg_syllables ROUND·,4). */
  def syllableStats(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("ts"))
      .select(col("doc_id"), size(col("ts")).as("n_toks"),
        aggregate(col("ts"),
          lit(0), (a, t) => a + size(regexp_extract_all(t, lit("[aeiou]+"), lit(0))))
          .as("n_syllables"),
        size(filter(col("ts"),
          t => size(regexp_extract_all(t, lit("[aeiou]+"), lit(0))) >= 3))
          .as("n_complex"))
      .withColumn("avg_syllables",
        when(col("n_toks") === 0, lit(null))
          .otherwise(round(col("n_syllables").cast("double") / col("n_toks"), 4)))
  }

  /** Deterministic train/val/test split by content hash: bucket =
    * md5(text)[0,4) as int mod 100 → <80 train, <90 val, else test.
    * Content-keyed (not doc-id-keyed) so re-ingested duplicates land in
    * the same split — the property that prevents train/test leakage in
    * dedup'd training pipelines. Pure map, no shuffle. */
  /** Content-hash split bucket in [0, 100) and its train/val/test label
    * — pure column expressions (no shuffle), shared by [[hashSplit]] and
    * [[cleanCorpus]]. */
  def splitBucket(text: Column): Column =
    conv(substring(md5(text), 1, 4), 16, 10).cast("int") % 100
  def splitLabel(text: Column, trainPct: Int = 80, valPct: Int = 10): Column =
    when(splitBucket(text) < trainPct, "train")
      .when(splitBucket(text) < trainPct + valPct, "val")
      .otherwise("test")

  def hashSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs.select(col("doc_id"), splitBucket(col("text")).as("bucket"),
      splitLabel(col("text"), trainPct, valPct).as("split"))

  /** Corpus n-gram counts (contiguous token n-grams): the language-model
    * counting primitive. Shingle expansion is the codegen'd
    * [[Dedup.explodedShingles]] path; the count is one partial+final
    * hash aggregate on the n-gram string. */
  def ngramCounts(docs: DataFrame, n: Int = 2): DataFrame =
    Dedup.explodedShingles(docs, n)
      .groupBy(col("sh").as("ngram")).agg(count(lit(1)).as("c"))
      .select("ngram", "c")

  /** Repetition metrics per doc (Gopher-style quality rules): fraction of
    * tokens covered by the single most frequent bigram, and the distinct/
    * total token ratio. High top-bigram fraction or low distinct ratio
    * flags boilerplate/degenerate text. Shuffles on doc_id only. */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val bi = Dedup.explodedShingles(docs, 2)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bi"))
      .select(col("doc_id"),
        round(col("top_c") / col("n_bi"), 4).as("top_bigram_frac"))
    val tok = docs
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), countDistinct(col("tok")).as("n_distinct"))
      .select(col("doc_id"), col("n_toks"),
        round(col("n_distinct") / col("n_toks"), 4).as("distinct_frac"))
    tok.join(bi, Seq("doc_id"), "left")
  }

  /** Exact stratified sample: the first ceil(pct·|stratum|)/100 docs of
    * each stratum, ordered by content hash (deterministic, uniform,
    * content-keyed like [[hashSplit]]). One shuffle on the stratum key;
    * the per-stratum rank is a sorted window scan. */
  def stratifiedSample(docs: DataFrame, stratum: String, pct: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum).orderBy(md5(col("text")), col("doc_id"))
    val n = Window.partitionBy(stratum)
    docs.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(n))
      .where(col("_rn") <= ceil(col("_n") * pct / 100.0))
      .drop("_rn", "_n")
  }

  /** Composed corpus-cleaning pipeline — the end-to-end "raw crawl →
    * training corpus" shape: (1) drop docs failing quality gates (token
    * count, stopword ratio, repetition); (2) keep one canonical doc per
    * exact content group; (3) assign content-hash splits. Stages are the
    * individually-oracle-checked operators composed. Every metric is
    * computed IN-ROW (token/stopword counts from the token array; the
    * top-bigram fraction via the native
    * [[graft.functions.MaxDupFrac]] — the in-row form of the
    * two-aggregation groupBy it replaces, bit-identical division), and
    * the split bucket is content-derived, so the whole pipeline's ONLY
    * shuffle is the canonical-dedup digest window — no joins at all. */
  def cleanCorpus(docs: DataFrame, minTokens: Int = 10,
      minStopwordRatio: Double = 0.05, maxTopBigramFrac: Double = 0.2): DataFrame = {
    // gates compare RAW (unrounded) ratios: the raw doubles are
    // bit-identical across engines, whereas rounded values could differ
    // at a decimal boundary (Spark HALF_UP vs DuckDB binary rounding) and
    // flip a filter decision
    val en = stopwords.toMap.apply("en")
    val ts = Dedup.tokens(col("text"))
    val nToks = size(ts)
    val swRatio = hits(ts, en).cast("double") / nToks
    val topBiFrac = graft.functions.MaxDupFrac.maxDupFrac(Dedup.shingles(ts, 2))
    val passing = docs
      .where(nToks >= minTokens &&
        swRatio >= minStopwordRatio &&
        (topBiFrac.isNull || topBiFrac <= maxTopBigramFrac))
    Dedup.keepCanonical(passing)
      .withColumn("split", splitLabel(col("text")))
  }

  /** Train/test decontamination report: test-split docs sharing ≥
    * `minShared` distinct n-grams with ANY train-split doc (the
    * benchmark-leakage check run before training). Splits come from
    * [[hashSplit]]; overlap is a shingle equi-join (distinct per doc —
    * done in-row, so a repeated n-gram counts once without a distinct
    * shuffle), aggregated per test doc. Shuffles: only the join on the
    * n-gram string. */
  def contamination(docs: DataFrame, n: Int = 3, minShared: Int = 2): DataFrame = {
    val split = hashSplit(docs).select("doc_id", "split")
    val sh = Dedup.explodedDistinctShingles(docs, n)
      .join(split, "doc_id")
    val train = sh.where(col("split") === "train")
      .select(col("sh")).distinct()
    sh.where(col("split") === "test")
      .join(train, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  /** Deterministic weighted downsampling: keep a doc iff its content-hash
    * bucket (md5 hex [5,9) mod 10000, uniform) falls under
    * `weight × 10000` — i.e. keep-probability = the per-doc weight column
    * in [0,1], with the SAME doc always making the same decision
    * (reproducible pipelines, no RNG state). Pure map. */
  def weightedSample(docs: DataFrame, weightCol: String): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long") % 10000
    docs.where(bucket < col(weightCol) * 10000)
  }

  /** Exact-size-k weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006 priority sampling): per doc a uniform u ∈ (0,1) from
    * its md5 (8 hex chars, +0.5 to dodge the endpoints), priority key
    * u^(1/w), and the k LARGEST keys are the sample — inclusion
    * probability proportional to weight, size exactly k, no replacement,
    * no RNG state (the same corpus always selects the same docs — the
    * reproducible "fixed doc budget, quality-weighted" corpus cut that
    * [[weightedSample]]'s Bernoulli keep can't give). Distributed as
    * TakeOrdered: per-partition top-k then a k·P driver merge — never a
    * global sort. `weightCol` must be strictly positive. */
  def prioritySample(docs: DataFrame, weightCol: String, k: Int): DataFrame = {
    val u = (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val key = pow(u, lit(1.0) / col(weightCol))
    docs.select(col("doc_id"), key.as("k0"))
      .orderBy(col("k0").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("k0"), 4).as("es_key"))
  }

  /** PII redaction patterns — simple, engine-portable regexes (no
    * lookaround/backrefs, so they run identically under Java regex and
    * RE2/DuckDB). Public-knowledge patterns, intentionally conservative:
    * production pipelines tune recall; the operator shape (regex scrub as
    * a pure codegen'd map, counts alongside) is what scales. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrub: redact emails → `<EMAIL>`, IPv4s → `<IP>`, then
    * phone-shaped digit runs → `<PHONE>` (that order — an IPv4 octet run
    * must not be half-eaten by the looser phone pattern), with per-class
    * match counts. Pure per-row map: no shuffle, scales linearly, and the
    * counts let a pipeline gate on PII density before training. */
  def piiRedact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_email"),
      regexp_count(col("text"), lit(ipv4Re)).cast("long").as("n_ip"),
      regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phone"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), emailRe, "<EMAIL>"),
          ipv4Re, "<IP>"),
        phoneRe, "<PHONE>").as("redacted"))

  /** Salted-hash pseudonymization: deterministic keyed rename of an id
    * column — equal ids map to equal pseudonyms (joins, sessionization
    * and per-entity aggregates keep working on the pseudonymized data)
    * while linkability to the raw key requires the salt. The privacy
    * complement of [[piiRedact]]: redaction destroys the value,
    * pseudonymization preserves its GRAPH. Pure per-row map (md5 prefix
    * — 16 hex chars = 64 bits, collision-safe far past any entity
    * count); rotate the salt to break linkage across releases. */
  def pseudonymize(df: DataFrame, idCol: String, salt: String,
      prefixLen: Int = 16): DataFrame =
    df.withColumn(s"${idCol}_pseud",
      substring(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
        1, prefixLen))
      .drop(idCol)

  /** Markup scrub — the boilerplate-removal pass a crawl corpus runs
    * before any text analysis: strip HTML tags, decode the common
    * entities, unwrap markdown links (keep the anchor text), drop
    * asterisk emphasis runs, collapse whitespace, trim. A pure
    * regexp_replace chain — per-row map, no shuffle, codegen'd — and
    * every pattern is RE2-compatible so the DuckDB oracle replays the
    * identical chain. (The synthetic fixture text is already plain, so
    * there the op reduces to whitespace normalization — the chain is
    * still executed and oracle-checked end to end.) */
  def stripMarkup(docs: DataFrame): DataFrame = {
    val noTags = regexp_replace(col("text"), "<[^>]*>", " ")
    // &amp; decodes LAST: decoding it first would turn the literal text
    // "&amp;lt;" (an escaped "&lt;") into "&lt;" and then into "<" —
    // double-decoding. With &amp; last, each entity decodes exactly once.
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    val noLinks = regexp_replace(decoded, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noEmph = regexp_replace(noLinks, "\\*+", "")
    val squeezed = trim(regexp_replace(noEmph, "\\s+", " "))
    docs.select(col("doc_id"), squeezed.as("clean"),
      length(squeezed).as("n_clean_chars"))
  }

  /** CCNet-style canonical form for dedup hashing: lowercase, every digit
    * → '0', ASCII punctuation stripped (the four ASCII ranges !-/, :-@,
    * [-`, {-~ — explicit ranges, not \p{Punct}, so non-ASCII letters are
    * untouched and DuckDB's RE2 replays the identical class), whitespace
    * collapsed, trimmed. This is the canonicalization MinHash/exact dedup
    * hash over in CCNet-lineage pipelines: "Page 2" and "page 7" collide,
    * formatting noise doesn't split dup groups. Pure projection — no
    * shuffle, codegen'd regexes. */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
      "[0-9]", "0"), "[!-/:-@\\[-`{-~]", ""), "\\s+", " "))

  /** docs(doc_id, text) → (doc_id, norm, n_norm_chars): the canonical
    * form as data, for auditing what the dedup key actually hashes. */
  def normalizeText(docs: DataFrame): DataFrame = {
    val n = canonicalText(col("text"))
    docs.select(col("doc_id"), n.as("norm"), length(n).as("n_norm_chars"))
  }

  /** Exact dedup over the CANONICAL form: first-wins survivors of
    * grouping by md5([[canonicalText]]) — one row per surviving doc
    * (min id in its group) with the group size it absorbed. Same
    * single-shuffle shape as the raw-text exact dedup; the normalization
    * widens each group to case/digit/punctuation variants that raw
    * hashing treats as distinct. */
  def dedupNormalized(docs: DataFrame): DataFrame =
    Dedup.spreadForCompute(docs)
      .groupBy(md5(canonicalText(col("text"))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .select("doc_id", "n_dups")

  /** Per-doc DEFLATE compressibility (the gzip-ratio quality signal of
    * Dolma/RefinedWeb-lineage pipelines): ratio = deflated bytes / UTF-8
    * bytes. Near-zero means templated/repetitive text a token-level
    * repetition metric can miss (long-range structure); near-1 means
    * high-entropy noise — both tails are filter candidates. DEFLATE is
    * inherently imperative, so this is a deliberate mapPartitions (the
    * SURVEY §2.1 last resort): pure map, zero exchanges, one native
    * Deflater REUSED per partition via reset() and released on task
    * completion. Deterministic for a fixed JDK zlib (level 6), which is
    * what the cross-run spec pins; no SQL engine exposes DEFLATE, so the
    * battery entry is t2 rows-only. */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.spreadForCompute(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => deflater.end())
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val in = Option(text).getOrElse("").getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          (id, in.length.toLong, out)
        }
      }.toDF("doc_id", "n_bytes", "n_deflated")
      .select(col("doc_id"), col("n_bytes"), col("n_deflated"),
        round(when(col("n_bytes") === 0, lit(1.0))
          .otherwise(col("n_deflated") / col("n_bytes")), 4).as("ratio"))
  }

  /** Sentence-level exact dedup report: split docs into sentences on
    * `". "`, hash each, and report sentences occurring more than once
    * across the corpus (boilerplate detection below document granularity —
    * the sub-doc analog of [[Dedup.exactDupGroups]]). One shuffle (the
    * digest groupBy, map-side combined). */
  def sentenceDedup(docs: DataFrame): DataFrame =
    Dedup.spreadForCompute(docs)
      .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("sent"))
      .where(length(trim(col("sent"))) > 0)
      .groupBy(md5(trim(col("sent"))).as("h"))
      .agg(count(lit(1)).as("c"), countDistinct(col("doc_id")).as("n_docs"))
      .where(col("c") > 1)

  /** Cross-document n-gram novelty: per doc, the fraction of its distinct
    * n-grams NOT already present in any LOWER-id document (novelty under
    * the corpus's natural order — the metric behind "how much of this
    * shard is new text"). First-occurrence ids come from one groupBy(min)
    * over the exploded distinct shingles; docs with fewer than n tokens
    * are absent (no shingles). */
  def ngramNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val dsh = Dedup.explodedDistinctShingles(docs, n)
    val first = dsh.groupBy("sh").agg(min(col("doc_id")).as("d0"))
    dsh.join(first, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        round(sum(when(col("d0") < col("doc_id"), 0).otherwise(1)).cast("double")
          / count(lit(1)), 4).as("novel_frac"))
  }

  /** One-row corpus summary: doc/token/vocab counts, type-token ratio,
    * and the token-mass share of the 100 most frequent words (a Zipf
    * head-coverage check — high coverage flags degenerate corpora). Two
    * aggregations over one wordcount pass; every input is map-side
    * combined. */
  def corpusStats(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val wc = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = wc.agg(count(lit(1)).as("vocab_size"), sum(col("c")).as("n_tokens"))
    val top = wc.orderBy(col("c").desc, col("tok")).limit(100)
      .agg(sum(col("c")).as("top100"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    nd.crossJoin(totals).crossJoin(top)
      .select(col("n_docs"), col("n_tokens"), col("vocab_size"),
        round(col("vocab_size").cast("double") / col("n_tokens"), 4).as("type_token_ratio"),
        round(col("top100").cast("double") / col("n_tokens"), 4).as("top100_coverage"))
  }

  /** Sequence packing for pretraining: assign docs (in doc_id order) to
    * fixed-token-budget bins — bin = ⌊exclusive-prefix-tokens / budget⌋,
    * i.e. a doc lands in the bin where its span begins when the corpus is
    * concatenated in order. The global prefix sum is
    * [[Temporal.runningSum]]'s two-pass form (range-partitioned, parallel
    * — never WindowExec's single partition). */
  def packSequences(docs: DataFrame, budgetTokens: Long = 2048L): DataFrame = {
    val withLen = docs.select(col("doc_id"),
      size(Dedup.tokens(col("text"))).cast("long").as("n_toks"))
    Temporal.runningSum(withLen, "doc_id", "n_toks")
      .join(withLen, "doc_id")
      .select(col("doc_id"), col("n_toks"),
        ((col("running_sum") - col("n_toks")) / budgetTokens).cast("long").as("bin"))
  }

  /** Domain-mixture sampling: per-stratum keep probability (e.g. lang →
    * target weight), decided by the doc's content hash — the deterministic
    * "rebalance sources to a target mixture" step. Strata absent from
    * `weights` are dropped (weight 0). Pure map (the weights ride a
    * when-chain, no join). */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
      keyCol: String = "lang"): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long") % 10000
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(keyCol) === k, lit(v)).otherwise(acc)
    }
    docs.where(bucket < w * 10000)
  }

  /** Deterministic MLM-style token masking: token at (doc, pos) is
    * replaced by `<MASK>` iff its md5((doc_id):(pos):(tok)) bucket falls
    * under `rate` — reproducible corruption, no RNG state, ~rate of
    * tokens masked. Explode → codegen'd md5 → per-doc ordered reassembly
    * (one shuffle; the in-row HOF form would interpret the md5 per
    * element). */
  def maskTokens(docs: DataFrame, rate: Double = 0.15): DataFrame = {
    val toks = Dedup.spreadForCompute(docs).select(col("doc_id"),
      posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
    val bucket = conv(substring(
      md5(concat_ws(":", col("doc_id"), col("pos"), col("tok"))), 1, 4), 16, 10)
      .cast("long") % 10000
    toks
      .select(col("doc_id"), col("pos"),
        when(bucket < rate * 10000, lit("<MASK>")).otherwise(col("tok")).as("tok"))
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        sort_array(collect_list(struct(col("pos"), col("tok")))).getField("tok"))
        .as("masked"))
  }

  /** True Karp–Rabin rolling hash over the token stream: polynomial hash
    * with base B and modulus M, O(n) via Horner. Driver/library utility
    * (sequential by definition); the distributed fingerprint surface is
    * [[fingerprints]]. */
  def rollingFingerprint(tokens: Seq[String], base: Long = 1000003L, mod: Long = (1L << 61) - 1): Long = {
    var h = 0L
    for (t <- tokens) {
      val th = t.foldLeft(0L)((a, c) => (a * 131 + c) % mod)
      h = (mulMod(h, base, mod) + th) % mod
    }
    h
  }

  private def mulMod(a: Long, b: Long, m: Long): Long =
    java.math.BigInteger.valueOf(a).multiply(java.math.BigInteger.valueOf(b))
      .mod(java.math.BigInteger.valueOf(m)).longValueExact()

  /** BM25 relevance of every document against a fixed bag of query terms
    * — the retrieval-side ranking primitive of a data pipeline (e.g.
    * scoring a corpus against a quality probe set). Standard Robertson
    * idf = ln(1 + (N − df + ½)/(df + ½)).
    *
    * Scale shape: ONE per-doc aggregate carries doc length and one tf
    * column per query term (terms are few by construction), and the
    * corpus stats (N, Σdl, per-term df) come from one single-row
    * aggregate over the same token stream (count-distincts — partial-
    * aggregated, no doc-level intermediate), broadcast back. The score
    * sums per-term contributions in FIXED left-to-right term order — a
    * float sum over a GROUP would have engine-dependent accumulation
    * order; per-term columns keep it bit-reproducible and
    * oracle-matchable. Only docs containing ≥1 query term are returned.
    * N and avgdl come from integer aggregates (exact in both engines). */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.toSet.size == terms.size, "terms must be distinct")
    val toks = Dedup.spreadForCompute(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      count(when(col("tok") === t, 1)).as(s"tf$i")
    }
    val docAggs = count(lit(1)).as("dl") +: tfCols
    val perDoc = toks.groupBy("doc_id")
      .agg(docAggs.head, docAggs.tail: _*)
    val statCols = countDistinct(col("doc_id")).as("n") +:
      count(lit(1)).as("sdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        countDistinct(when(col("tok") === t, col("doc_id"))).as(s"df$i")
      }
    val stats = toks.agg(statCols.head, statCols.tail: _*)
    perDoc.crossJoin(broadcast(stats))
      .where(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col("doc_id"), round(bm25ScoreExpr(terms, k1, b), 4).as("bm25"))
  }

  /** The BM25 score expression over columns (dl, n, sdl, tf$i, df$i) —
    * per-term contributions summed in fixed left-to-right term order,
    * shared by [[bm25]] and [[Retrieval.bm25FromIndex]] so both access
    * paths produce bit-identical scores. */
  private[ext] def bm25ScoreExpr(terms: Seq[String], k1: Double, b: Double): Column =
    terms.indices.map { i =>
      val tf = col(s"tf$i")
      val df = col(s"df$i")
      when(tf > 0,
        log(lit(1.0) + (col("n") - df + lit(0.5)) / (df + lit(0.5))) *
          (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl") / (col("sdl").cast("double") / col("n")))))
        .otherwise(lit(0.0))
    }.reduceLeft[Column](_ + _) // fixed term order

  /** Per-document mean negative log-likelihood under the corpus's own
    * bigram LM (p(w₂|w₁) = c(w₁w₂)/c(w₁·)) — the classic LM-based quality
    * filter: high NLL ⇒ the doc's word transitions are atypical for the
    * corpus (perplexity = e^nll). Docs with <2 tokens have no bigrams and
    * are excluded.
    *
    * Scale shape: the LM joins back onto the per-doc bigram stream on the
    * bigram key; one groupBy(doc) mean. The bigram-LM table carries NO
    * broadcast hint — bigram TYPES grow with the corpus (billions at web
    * scale), so the scale-safe plan is a shuffle join (AQE still
    * broadcasts when small). The unigram-context `totals` table IS
    * broadcast: it is V-bounded by construction. The mean is a float sum
    * in schedule order — drift is ~1e-13 against the 1e-4 rounding grid,
    * the same accepted risk profile as [[tfIdf]]'s ln. */
  def lmScore(docs: DataFrame): DataFrame = {
    val bi = Dedup.explodedShingles(docs, 2)
    val counts = bi.groupBy("sh").agg(count(lit(1)).as("c"))
    val w1 = expr("split(sh, ' ')[0]")
    val totals = counts.groupBy(w1.as("w1")).agg(sum(col("c")).as("n1"))
    val lm = counts.select(w1.as("w1"), col("sh"), col("c"))
      .join(broadcast(totals), "w1")
      .select(col("sh"), (col("c").cast("double") / col("n1")).as("p"))
    bi.join(lm, "sh")
      .groupBy("doc_id").agg(round(-avg(log(col("p"))), 4).as("nll"))
  }

  /** Top-k token pairs by pointwise mutual information over document
    * co-occurrence: pmi(a,b) = ln(c_ab·N / (c_a·c_b)) with doc-level
    * distinct counts — the collocation/phrase-mining primitive (what a
    * tokenizer-vocab or phrase-merge pass ranks). Pairs come from an
    * in-row double explode of each doc's sorted distinct-token array
    * (never a corpus self-join); unary counts broadcast back. All counts
    * are exact integers, so c_ab·N / (c_a·c_b) is ONE IEEE division —
    * engine-portable — and ordering is on the rounded value.
    *
    * Scale: pair rows are Σ_docs (distinct-tokens choose 2) — bounded in
    * practice by a per-doc distinct-token cap upstream; the groupBy is
    * partial-aggregated. `minCount` prunes the long noise tail before the
    * final rank. */
  def pmiPairs(docs: DataFrame, minCount: Long = 5L, k: Int = 20): DataFrame = {
    val dts = Dedup.spreadForCompute(docs)
      .select(col("doc_id"), array_sort(array_distinct(Dedup.tokens(col("text")))).as("ts"))
    val nDocs = dts.agg(count(when(size(col("ts")) > 0, 1)).as("nd"))
    val dt = dts.select(col("doc_id"), explode(col("ts")).as("tok"))
    val unary = dt.groupBy("tok").agg(count(lit(1)).as("c"))
    val pairs = dts.select(col("doc_id"), explode(col("ts")).as("ta"), col("ts"))
      .select(col("ta"), explode(col("ts")).as("tb"))
      .where(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    pairs
      .join(broadcast(unary.toDF("ta", "ca")), "ta")
      .join(broadcast(unary.toDF("tb", "cb")), "tb")
      .crossJoin(broadcast(nDocs))
      .select(col("ta"), col("tb"), col("c_ab"),
        round(log((col("c_ab") * col("nd")) / (col("ca") * col("cb"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("ta"), col("tb"))
      .limit(k)
  }

  /** Fixed-size token windows with stride — the pretraining chunking
    * stage that turns variable-length documents into model-ready
    * sequences. Chunk i covers tokens [i·stride, i·stride + window); the
    * last chunk may be short; a doc shorter than `window` yields one
    * chunk. Output: (doc_id, chunk_idx, n_toks, h) with h = md5 of the
    * space-joined chunk (the compare-friendly content digest).
    *
    * Scale shape: pure in-row compute + generate — NO exchange anywhere;
    * a 100 TB corpus chunks with one task per input split, and the chunk
    * table inherits the scan's partitioning. The per-doc chunk count is
    * ⌈max(n−window,0)/stride⌉+1, so output size is predictable
    * (~n/stride rows per doc). */
  def chunkWindows(docs: DataFrame, window: Int = 64, stride: Int = 32): DataFrame = {
    val nChunksMinus1 = ceil(
      greatest(size(col("_ts")) - window, lit(0)) / lit(stride.toDouble)).cast("int")
    Dedup.spreadForCompute(docs)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("_ts"))
      .where(size(col("_ts")) > 0)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunksMinus1),
          i => slice(col("_ts"), i * stride + 1, lit(window)))).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_toks"),
        md5(concat_ws(" ", col("chunk"))).as("h"))
  }

  /** Deterministic global training-order shuffle: position = rank of
    * md5(seed ":" doc_id) — the seeded permutation every pretraining run
    * applies before packing/sharding, reproducible across engines and
    * cluster layouts (the hash is content-independent, so re-partitioning
    * the input never changes the order).
    *
    * Scale shape: the rank is computed WITHOUT a single-partition window
    * (the q18 anti-pattern): range-partition by the hash, sort within
    * partitions, then add per-partition offsets (one tiny driver-side
    * count array) — every partition ranks in parallel, the same two-pass
    * scheme as [[Temporal.runningSum]]. */
  def shuffleOrder(docs: DataFrame, seed: Long = 42L, numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = docs.sparkSession
    val np = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val prepared = docs
      .select(col("doc_id"), md5(concat_ws(":", lit(seed), col("doc_id"))).as("h"))
      .repartitionByRange(np, col("h"), col("doc_id"))
      .sortWithinPartitions("h", "doc_id")
    val rdd = prepared.rdd
    val counts = rdd.mapPartitionsWithIndex((pid, it) =>
        Iterator.single((pid, { var n = 0L; it.foreach(_ => n += 1); n })))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var pos = bc.value(pid)
      it.map { r => val row = Row(r.get(0), pos); pos += 1; row }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", prepared.schema.head.dataType),
      StructField("shuffle_pos", LongType))))
  }

  /** Winnowing fingerprints (the MOSS / local-minimum scheme): hash every
    * k-token shingle (8-hex md5 prefix), slide a window of `w` hashes,
    * select each window's minimum, emit the distinct selected hashes per
    * doc. Guarantee: any shared run of ≥ k+w−1 tokens between two docs
    * yields ≥ 1 shared fingerprint — the contamination/plagiarism
    * detector whose index is O(n/w) per doc instead of O(n). Docs with
    * fewer than k+w−1 tokens (< w shingle hashes) emit nothing.
    *
    * Scale shape: shingling ([[graft.functions.Shingles]], codegen'd) and
    * window-min selection are in-row — no exchange; the only shuffle any
    * consumer pays is its own join/groupBy on the fingerprint. The `_hs`
    * projection is kept out of the window lambda (multiply referenced →
    * CollapseProject keeps it), so each shingle is hashed exactly once,
    * not once per window. */
  def winnowFingerprints(docs: DataFrame, k: Int = 4, w: Int = 5): DataFrame = {
    val sh = graft.functions.Shingles.shinglesNative(Dedup.tokens(col("text")), k)
    Dedup.spreadForCompute(docs)
      .select(col("doc_id"), transform(sh, s => substring(md5(s), 1, 8)).as("_hs"))
      .where(size(col("_hs")) >= w)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("_hs")) - (w - 1)),
          i => array_min(slice(col("_hs"), i, lit(w)))))).as("fp"))
  }

  /** Cross-document shared-fingerprint pairs — the join stage on top of
    * [[winnowFingerprints]]: doc pairs sharing ≥ `minShared` winnow
    * fingerprints, with the shared count. The winnowing guarantee makes
    * this substring-level dup detection: any pair sharing a token run of
    * ≥ k+w−1 tokens shares ≥ 1 fingerprint, so boilerplate/plagiarism
    * candidates surface from a fingerprint-keyed equi-join.
    *
    * Scale shape: the same shared-key self-join as the n-gram Jaccard
    * pairs — zero-overlap pairs never materialize, the only shuffles are
    * the join on fp and the pair groupBy; never all-pairs. A pathological
    * boilerplate fingerprint shared by everything would skew one key —
    * AQE skew-split handles it, or pre-filter fps by document frequency. */
  def sharedFingerprintPairs(docs: DataFrame, k: Int = 4, w: Int = 5,
      minShared: Long = 2L): DataFrame = {
    val fps = winnowFingerprints(docs, k, w)
    fps.toDF("doc_a", "fp").join(fps.toDF("doc_b", "fp"), "fp")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Trigram "stupid backoff" LM scoring (Brants et al. 2007, the
    * web-scale LM that skips normalization): score held-out docs against
    * counts from a TRAINING slice —
    *   s(w3|w1w2) = c(w1w2w3)/c(w1w2)                 if the trigram was seen,
    *              = alpha · c(w2w3)/c(w2)             else if the bigram was,
    *              = alpha² · (c(w3)+1)/(N+V)          else (add-one unigram).
    * Per-doc output: nll = mean of −ln s over trigram positions — the
    * cross-domain fluency filter (score web text against a curated LM,
    * keep the low-NLL tail).
    *
    * Scale shape: three grouped counts over the training slice (each
    * partial+final) join onto ONE pass over the eval trigrams, then a
    * per-doc mean. Only the UNIGRAM tables (c1, vocab-bounded) carry a
    * broadcast hint; the trigram/bigram TYPE tables grow with the corpus
    * (billions of rows at web scale), so they take the scale-safe
    * shuffle-join path — AQE still broadcasts them when they measure
    * small at runtime. Seen-trigram ⇒ seen-prefix-bigram (same corpus),
    * so the CASE never divides by null. */
  def stupidBackoff(docs: DataFrame, isTrain: Column,
      alpha: Double = 0.4): DataFrame = {
    val train = docs.where(isTrain)
    val eval = docs.where(!isTrain)
    val c3 = Dedup.explodedShingles(train, 3)
      .groupBy(col("sh").as("g3")).agg(count(lit(1)).as("c3"))
    val c2 = Dedup.explodedShingles(train, 2)
      .groupBy(col("sh").as("g2")).agg(count(lit(1)).as("c2"))
    val c1 = train.select(explode(Dedup.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val totals = c1.agg(sum(col("c1")).as("n1"), count(lit(1)).as("v"))
    val p = split(col("sh"), " ")
    val ev = Dedup.explodedShingles(eval, 3)
      .select(col("doc_id"), col("sh"),
        concat_ws(" ", p.getItem(0), p.getItem(1)).as("w12"),
        concat_ws(" ", p.getItem(1), p.getItem(2)).as("w23"),
        p.getItem(1).as("w2"), p.getItem(2).as("w3"))
    val score =
      when(col("c3").isNotNull, col("c3") / col("c12"))
        .otherwise(lit(alpha) *
          when(col("c23").isNotNull, col("c23") / col("c1_2"))
            .otherwise(lit(alpha) *
              (coalesce(col("c1_3"), lit(0L)) + 1.0) / (col("n1") + col("v"))))
    ev.join(c3, col("sh") === col("g3"), "left")
      .join(c2.toDF("g12", "c12"), col("w12") === col("g12"), "left")
      .join(c2.toDF("g23", "c23"), col("w23") === col("g23"), "left")
      .join(broadcast(c1.toDF("u2", "c1_2")), col("w2") === col("u2"), "left")
      .join(broadcast(c1.toDF("u3", "c1_3")), col("w3") === col("u3"), "left")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(round(avg(-log(score)), 4).as("nll"))
  }

  /** Interpolated Kneser–Ney bigram LM scoring (Kneser & Ney 1995; the
    * smoothing BPE-era n-gram stacks standardized on, where stupid
    * backoff is the unnormalized web-scale shortcut):
    *   p(w2|w1) = (max(c(w1w2) − D, 0) + D·N1+(w1·)·pc(w2)) / c(w1)
    * with absolute discount D, N1+(w1·) = distinct continuations of w1,
    * and the CONTINUATION distribution pc(w2) ∝ how many distinct
    * contexts w2 follows (not how often) — add-one-floored over the
    * bigram-type count so unseen events stay finite:
    *   pc(w2) = (N1+(·w2) + 1) / (B + V + 1).
    * Unseen prefix (c(w1) = 0) falls back to pc(w2) directly.
    * Per-doc output: (doc_id, n_bigrams, nll = mean −ln p) over the
    * eval slice — same fluency-filter shape as [[stupidBackoff]].
    *
    * Scale shape: ONE bigram count table feeds everything — c(w1) and
    * N1+(w1·) are a regroup of it, N1+(·w2) another, B/V two scalars —
    * then one pass over the eval bigrams with left joins. The bigram
    * TYPE table c12 grows with the corpus, so it takes the scale-safe
    * shuffle-join path (AQE broadcasts it when it measures small); only
    * the unigram-keyed regroups (c1, cont — vocab-bounded by
    * construction) carry broadcast hints. */
  def knBigramNll(docs: DataFrame, isTrain: Column,
      discount: Double = 0.75): DataFrame = {
    val train = docs.where(isTrain)
    val eval = docs.where(!isTrain)
    val c12 = Dedup.explodedShingles(train, 2)
      .select(split(col("sh"), " ").getItem(0).as("w1"),
        split(col("sh"), " ").getItem(1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fw"))
    val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1pw"))
    val scalars = c12.agg(count(lit(1)).as("b")).crossJoin(
      train.select(explode(Dedup.tokens(col("text"))).as("w"))
        .agg(countDistinct(col("w")).as("v")))
    val p = split(col("sh"), " ")
    val ev = Dedup.explodedShingles(eval, 2)
      .select(col("doc_id"), p.getItem(0).as("ew1"), p.getItem(1).as("ew2"))
    val pc = (coalesce(col("n1pw"), lit(0L)) + lit(1L)) /
      (col("b") + col("v") + lit(1L))
    // coalesce BEFORE greatest: GREATEST-with-NULL semantics differ
    // across engines; with the 0-fill both sides compute on plain doubles
    val seen = (greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(discount), lit(0.0))
      + lit(discount) * col("n1fw").cast("double") * pc) / col("c1").cast("double")
    val prob = when(col("c1").isNotNull, seen).otherwise(pc)
    ev.join(c12, col("ew1") === col("w1") && col("ew2") === col("w2"), "left")
      .join(broadcast(c1.toDF("p1", "c1", "n1fw")), col("ew1") === col("p1"), "left")
      .join(broadcast(cont.toDF("s2", "n1pw")), col("ew2") === col("s2"), "left")
      .crossJoin(broadcast(scalars))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg(-log(prob)), 4).as("nll"))
  }

  /** Per-stratum winsorization: clip `valueCol` to the stratum's
    * [lo, hi] percentile values (PERCENTILE_DISC semantics — the value
    * at rank ⌈q·n⌉, same rule as [[Sketches.quantilesOf]]) — the outlier
    * clamp run before computing corpus statistics that a single
    * doc-length outlier would skew. One rank window per stratum + a
    * broadcast threshold join; all-integer when `valueCol` is integral
    * (no float rounding anywhere). */
  def winsorize(docs: DataFrame, stratum: String = "lang",
      valueCol: String = "n_chars", tiebreak: String = "doc_id",
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = Window.partitionBy(stratum).orderBy(col(valueCol), col(tiebreak))
    val all = Window.partitionBy(stratum)
    val ranked = docs
      .withColumn("_rn", row_number().over(byV))
      .withColumn("_n", count(lit(1)).over(all))
    def at(q: Double) = min(when(
      col("_rn") === greatest(lit(1L), ceil(lit(q) * col("_n"))), col(valueCol)))
    val th = ranked.groupBy(col(stratum))
      .agg(at(lo).as("_lo"), at(hi).as("_hi"))
    docs.join(broadcast(th), stratum)
      .withColumn("clipped", least(greatest(col(valueCol), col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }

  /** Rebalance strata to the SMALLEST stratum's size: keep each
    * stratum's first n_min docs in content-hash order (deterministic,
    * uniform within stratum) — the "equalize domains" downsampling that
    * turns a skewed source mix into a balanced one, complementing
    * [[mixtureSample]] (target weights) and [[stratifiedSample]] (fixed
    * per-stratum percentage). One shuffle for the per-stratum rank
    * window; n_min is a two-level aggregate broadcast back. */
  def rebalanceStrata(docs: DataFrame, stratum: String = "lang",
      hashCol: String = "text", tiebreak: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(col(hashCol)), col(tiebreak))
    val ranked = docs.withColumn("_rk", row_number().over(w))
    val minN = ranked.groupBy(col(stratum)).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("_n_min"))
    ranked.crossJoin(broadcast(minN))
      .where(col("_rk") <= col("_n_min"))
      .drop("_rk", "_n_min")
  }

  /** Per-doc lexical-diversity metrics: token count, type-token ratio,
    * and unigram Shannon entropy H = ln n − Σ c·ln c / n — the
    * quality-filter signals that catch keyword-stuffed or
    * single-phrase-repeated docs that length/punctuation heuristics
    * miss. One (doc, tok) grouped count, one per-doc aggregate, both
    * map-side combined. */
  def tokenEntropy(docs: DataFrame): DataFrame =
    Dedup.spreadForCompute(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_toks"),
        round(count(lit(1)) * lit(1.0) / sum(col("c")), 4).as("ttr"),
        round(log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")), 4)
          .as("entropy"))

  /** Skip-gram co-occurrence pairs — the word2vec/GloVe training-data
    * extractor: every (center, context) token pair within ±`window`
    * positions, counted over the corpus. Pair generation is IN-ROW
    * (offset-d array zips, flattened), so the only exchange is the final
    * count groupBy; never a positional self-join of the token stream.
    * Output: (w1, w2, c) — both directions counted. */
  def skipgramPairs(docs: DataFrame, window: Int = 2): DataFrame = {
    val ts = Dedup.tokens(col("text"))
    // for each offset d ∈ 1..window: zip(ts, ts drop d) → ordered pairs
    // at distance d; emit both directions
    val pairs = flatten(transform(
      filter(sequence(lit(1), lit(window)), d => d < size(ts)),
      d => flatten(zip_with(
        slice(ts, lit(1), greatest(size(ts) - d, lit(0))),
        slice(ts, d + 1, greatest(size(ts) - d, lit(0))),
        (a, b) => array(struct(a.as("w1"), b.as("w2")),
          struct(b.as("w1"), a.as("w2")))))))
    Dedup.spreadForCompute(docs)
      .select(explode(pairs).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
  }

  /** First-iteration BPE pair statistics — the tokenizer-training
    * primitive: count adjacent CHARACTER pairs across the corpus,
    * weighted by word frequency (the argmax pair is the first BPE
    * merge). The char expansion runs over the V-row vocabulary, not the
    * token stream — corpus volume only ever feeds the word count. */
  def bpePairCounts(docs: DataFrame): DataFrame =
    Dedup.spreadForCompute(docs)
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .where(length(col("tok")) >= 2)
      .select(col("c"), explode(sequence(lit(1), length(col("tok")) - 1)).as("i"),
        col("tok"))
      .select(expr("substring(tok, i, 1)").as("c1"),
        expr("substring(tok, i + 1, 1)").as("c2"), col("c"))
      .groupBy("c1", "c2").agg(sum(col("c")).as("n"))

  /** Deterministic negative sampling for contrastive training: each doc
    * gets `k` pseudo-random partner docs, reproducibly, with no RNG and
    * no join blow-up. Docs are bucketed by an md5 prefix (`buckets`
    * buckets ≈ uniform), each bucket's members are ring-ordered by their
    * full md5, and doc i's negatives are the next 1..k docs around the
    * ring (cyclic). Within-bucket hashing makes the pairing
    * content-independent — exactly what "random negatives" means in a
    * deterministic pipeline.
    *
    * Scale shape: ONE shuffle (the bucket groupBy); each bucket is
    * n/buckets rows, ring assembly is an in-row sorted-array transform,
    * and the cyclic pairing explodes k rows per doc. No global sort, no
    * window over the whole corpus, no self-join. Buckets with ≤ 1 doc
    * emit nothing (no partner exists); callers size `buckets` ≈
    * n/1000 so rings stay comfortable. Output: (doc_id, neg_id, j) with
    * j ∈ 1..k. */
  def negativeSample(docs: DataFrame, k: Int = 3, buckets: Int = 16): DataFrame = {
    require(k >= 1 && buckets >= 1 && buckets <= (1 << 24),
      "buckets must be in [1, 2^24]") // 6 hex chars of bucket entropy
    val h = md5(concat(lit("neg:"), col("doc_id").cast("string")))
    val ring = Dedup.spreadForCompute(docs)
      .select(substring(h, 1, 6).as("bkt"), struct(h.as("h"), col("doc_id")).as("e"))
      .withColumn("bkt", pmod(conv(col("bkt"), 16, 10).cast("int"), lit(buckets)))
      .groupBy("bkt").agg(array_sort(collect_list(col("e"))).as("ring"))
      .where(size(col("ring")) > 1)
    ring.select(explode(transform(col("ring"), (e, i) =>
        struct(e.getField("doc_id").as("doc_id"), i.as("i")))).as("a"), col("ring"))
      .select(col("a.doc_id"), col("a.i"), col("ring"))
      .select(col("doc_id"), explode(transform(sequence(lit(1), lit(k)), j =>
        struct(j.as("j"),
          element_at(col("ring"),
            pmod(col("i") + j, size(col("ring"))) + 1).getField("doc_id").as("neg_id"))))
        .as("p"))
      .select(col("doc_id"), col("p.neg_id"), col("p.j"))
      .where(col("neg_id") =!= col("doc_id"))
  }

  /** DSIR-style importance weights for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling" —
    * the hashed-n-gram variant collapsed to unigrams): score every doc by
    * how much more likely its tokens are under a TARGET distribution than
    * under the overall corpus distribution. Both distributions are
    * add-one-smoothed unigram models over the shared vocabulary;
    * w(doc) = mean over token occurrences of
    * ln( p_target(tok) / p_corpus(tok) ). Rank by `w` and keep the top
    * fraction to shift a pretraining mixture toward the target domain.
    *
    * `isTarget` marks the target-domain rows (e.g. `col("lang") === "es"`).
    * Output: (doc_id, w) — w ROUND(·,4), one row per doc.
    *
    * Scale shape: the corpus is tokenized ONCE into a per-doc BOW
    * (doc_id, tok, c) that is materialized (localCheckpoint — the
    * [[graft.ext.Dedup.minhashEstimates]] compute-once pattern) and
    * read by both consumers: the token-level count that yields both
    * distributions (the target count rides along as a conditional sum —
    * no second corpus pass) and the scoring join, whose probe side is
    * now V' rows per doc instead of every occurrence. The V-row weight
    * dictionary broadcasts; the per-doc mean is the c-weighted partial+
    * final aggregate Σc·lw / Σc. Lifecycle note (the
    * dupClustersDistributed convention): the checkpointed BOW's blocks
    * are owned by the returned DataFrame's plan and are reclaimed by
    * ContextCleaner when the caller drops the result — constructing the
    * result runs the tokenize+count jobs eagerly. */
  /** Per-token log odds ratio of document presence between a target
    * slice and the rest (Haldane–Anscombe +½ correction, so zero cells
    * stay finite) — the keyness/marker-term screen: which tokens mark
    * the slice. With the ½s cleared, OR = (2a+1)(2d+1)/((2b+1)(2c+1))
    * is a ratio of EXACT INTEGER products, so ln sees the same argument
    * in both engines; (a,b,c,d) come from one distinct-(doc,token)
    * rollup + a broadcast doc-count row. Output per token:
    * (tok, in_target, in_rest, lnor). */
  def tokenOddsRatio(docs: DataFrame, isTarget: Column): DataFrame = {
    val dt = docs.select(col("doc_id"), isTarget.cast("int").as("tgt"),
        explode(Dedup.tokens(col("text"))).as("tok"))
      .distinct()
    val counts = dt.groupBy("tok").agg(
      sum("tgt").cast("long").as("a"),
      sum(lit(1) - col("tgt")).cast("long").as("b"))
    val tot = docs.agg(
      sum(isTarget.cast("long")).as("nt"),
      sum(lit(1L) - isTarget.cast("long")).as("nr"))
    counts.crossJoin(broadcast(tot))
      .select(col("tok"), col("a").as("in_target"), col("b").as("in_rest"),
        round(log(
          ((lit(2) * col("a") + 1) * (lit(2) * (col("nr") - col("b")) + 1)).cast("double") /
          ((lit(2) * col("b") + 1) * (lit(2) * (col("nt") - col("a")) + 1)).cast("double")),
          4).as("lnor"))
      .orderBy("tok")
  }

  def importanceWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    val bow = Dedup.spreadForCompute(docs)
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "is_t", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // per-token: corpus count + target count in one aggregation
    val wc = bow.groupBy("tok").agg(
      sum(col("c")).as("c_all"),
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("c_t"))
    // corpus totals: V distinct tokens, N_all / N_t occurrences (one row)
    val totals = wc.agg(
      sum(col("c_all")).as("n_all"), sum(col("c_t")).as("n_t"),
      count(lit(1)).as("v"))
    val weights = wc.crossJoin(broadcast(totals))
      .select(col("tok"),
        log(((col("c_t") + 1.0) / (col("n_t") + col("v"))) /
            ((col("c_all") + 1.0) / (col("n_all") + col("v")))).as("lw"))
    bow.join(broadcast(weights), "tok")
      .groupBy("doc_id")
      .agg(graft.functions.StableRound.col4(
        sum(col("c") * col("lw")) / sum(col("c"))).as("w"))
  }

  /** Per-stratum unigram KL divergence from the corpus distribution —
    * the domain-drift / mixture-weighting diagnostic (which sources'
    * token distributions sit furthest from the blend they feed).
    * KL(P_s ‖ Q) = Σ_{t∈V} p_s(t)·ln(p_s(t)/q(t)) with add-one smoothing
    * on the shared corpus vocabulary V, so zero-count tokens contribute
    * their smoothed mass rather than ±∞.
    *
    * Scale shape: one (stratum, tok) count shuffle + one V-row corpus
    * count (both map-side combined), then the full V×S term grid — S
    * strata is small by construction, so the grid is O(V·S) rows feeding
    * one final groupBy(stratum). Nothing is collected. Each term is
    * evaluated in the exact association the DuckDB oracle spells, and the
    * per-stratum sum rounds through [[graft.functions.StableRound]]
    * (cross-engine accumulation order differs). */
  def domainKl(docs: DataFrame, stratumCol: String = "source"): DataFrame = {
    val occ = Dedup.spreadForCompute(docs)
      .select(col(stratumCol).as("stratum"), explode(Dedup.tokens(col("text"))).as("tok"))
    val sc = occ.groupBy("stratum", "tok").agg(count(lit(1)).as("c_s"))
      .localCheckpoint(true)
    val cc = sc.groupBy("tok").agg(sum(col("c_s")).as("c_a"))
    val totals = cc.agg(sum(col("c_a")).as("n_a"), count(lit(1)).as("v"))
    val sTotals = sc.groupBy("stratum").agg(sum(col("c_s")).as("n_s"))
    // full V×S grid: every (stratum, vocab token) pair — the V-row vocab
    // side stays distributed, the S-row stratum totals broadcast onto it;
    // zero-count (stratum, tok) cells fill in via the left join
    val grid = cc.crossJoin(broadcast(sTotals.crossJoin(totals)))
      .join(sc, Seq("stratum", "tok"), "left")
      .na.fill(0L, Seq("c_s"))
    val p = (col("c_s") + lit(1.0)) / (col("n_s") + col("v"))
    val q = (col("c_a") + lit(1.0)) / (col("n_a") + col("v"))
    grid.select(col("stratum"), (p * log(p / q)).as("term"))
      .groupBy("stratum")
      .agg(graft.functions.StableRound.col4(sum(col("term"))).as("kl"))
  }

  /** Temperature-based mixture allocation (the multilingual /
    * low-resource upsampling scheme: sampling share p_s ∝ n_s^α with
    * α < 1 flattening the distribution toward small strata), turned into
    * EXACT integer token budgets by largest-remainder (Hamilton)
    * apportionment: every stratum gets ⌊B·p_s⌋, and the B − Σ⌊·⌋
    * leftover tokens go to the largest remainders (ties to the lower
    * stratum name). Σ alloc = B exactly.
    *
    * Scale shape: one stratum-count shuffle; everything after runs on
    * the S-row stratum table (S small by construction — the ranking
    * window is over S rows, never the corpus). floor() reads B·p
    * through a +1e-9 shift mirrored in the oracle SQL, so a product
    * landing within 1 ulp of an integer can't floor apart across
    * engines ([[graft.functions.StableRound]]'s scheme, applied to
    * floor). */
  def temperatureAllocation(docs: DataFrame, budget: Long = 100000L,
      alpha: Double = 0.5, stratumCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ns = Dedup.spreadForCompute(docs)
      .select(col(stratumCol).as("stratum"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("stratum").agg(count(lit(1)).as("n_toks"))
    val tot = ns.agg(sum(pow(col("n_toks"), alpha)).as("z"))
    val scaled = ns.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_toks"),
        (lit(budget) * (pow(col("n_toks"), alpha) / col("z")) + lit(1e-9)).as("bp"))
    val fl = scaled.select(col("stratum"), col("n_toks"),
      floor(col("bp")).cast("long").as("base"),
      (col("bp") - floor(col("bp"))).as("rem"))
    val sb = fl.agg(sum(col("base")).as("sb"))
    // S-row ranking window (constant by construction; see scaladoc)
    fl.withColumn("r", row_number().over(Window.orderBy(col("rem").desc, col("stratum"))))
      .crossJoin(broadcast(sb))
      .select(col("stratum"), col("n_toks"),
        (col("base") + when(col("r") <= lit(budget) - col("sb"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Per-doc character-bigram entropy — the gibberish/binary-noise
    * detector (natural text has low char-bigram entropy vs its size;
    * random bytes max it out): H = ln n − (Σ c·ln c)/n over the doc's
    * char-bigram counts, the same exact-integer-ln form as
    * [[domainReweight]] so ln never sees a float. One (doc, bigram)
    * count shuffle — rows = total chars, the narrowest shape an n-gram
    * distribution allows. Docs shorter than 2 chars are dropped (no
    * bigram distribution exists). Output: (doc_id, n_bigrams,
    * n_distinct, entropy ROUND·,4). */
  def charEntropy(docs: DataFrame): DataFrame = {
    val bg = Dedup.spreadForCompute(docs)
      .where(length(col("text")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2)))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    bg.groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        round(log(sum(col("c"))) -
          sum(col("c") * log(col("c"))) / sum(col("c")), 4).as("entropy"))
  }

  /** Token↔label mutual information — the classic feature-selection
    * ranking (which tokens carry signal about a label; the filter run
    * before training a BoW classifier like [[nbClassify]]): over token
    * OCCURRENCES, MI(tok) = Σ_{label} p(t,l)·ln(N·c_tl/(c_t·c_l)) with
    * every log argument a ratio of exact integer products (≤ N² < 2⁵³ —
    * ln never meets an accumulated float), plus the marginal-absent
    * cells contributing their own terms via p(t̄,l). Everything past the
    * one (tok, label) count shuffle is V·L-bounded. Output: top-k by
    * (mi ROUND·,4 desc, tok) — (tok, n, mi). */
  def tokenLabelMi(docs: DataFrame, labelCol: String = "lang",
      topK: Int = 20): DataFrame = {
    val occ = Dedup.spreadForCompute(docs)
      .select(col(labelCol).as("l"), explode(Dedup.tokens(col("text"))).as("tok"))
    val ctl = occ.groupBy("tok", "l").agg(count(lit(1)).as("ctl"))
      .localCheckpoint(true) // V·L rows; corpus touched once
    val ct = ctl.groupBy("tok").agg(sum(col("ctl")).as("ct"))
    val cl = ctl.groupBy("l").agg(sum(col("ctl")).as("cl"))
    val n = ctl.agg(sum(col("ctl")).as("nn"))
    // full (tok × label) grid: absent cells carry ctl = 0 and contribute
    // only through the complement term (t̄, l)
    val grid = ct.crossJoin(broadcast(cl))
      .join(ctl, Seq("tok", "l"), "left").na.fill(0L, Seq("ctl"))
      .crossJoin(broadcast(n))
    // two cells per (tok, label): (t, l) and (t-absent, l); the other two
    // of the 2x2 table belong to other tokens' rows and must not repeat
    val present = when(col("ctl") > 0,
      (col("ctl") / col("nn")) *
        log(col("ctl") * col("nn") / (col("ct") * col("cl"))))
      .otherwise(lit(0.0))
    val absent = when(col("cl") - col("ctl") > 0,
      ((col("cl") - col("ctl")) / col("nn")) *
        log((col("cl") - col("ctl")) * col("nn") /
          ((col("nn") - col("ct")) * col("cl"))))
      .otherwise(lit(0.0))
    grid.groupBy("tok")
      .agg(first(col("ct")).as("n"), round(sum(present + absent), 4).as("mi"))
      .orderBy(col("mi").desc, col("tok"))
      .limit(topK)
  }

  /** T5-style span corruption (Raffel et al. 2020's denoising objective,
    * the span sibling of [[maskTokens]]' MLM masking): tokens are tiled
    * into fixed blocks of `spanLen`, each block masks with probability
    * maskPct% by content hash (md5(doc_id:block) — deterministic, so
    * the oracle replays every decision), and a masked block collapses to
    * ONE numbered sentinel `<extra_id_N>` (N = 0-based masked-block
    * ordinal within the doc, exactly the T5 input encoding). Pure in-row
    * fold over the token array — no shuffle, no window; the sentinel
    * numbering rides in the fold state. Output: (doc_id, corrupted,
    * n_spans, n_masked). */
  def spanCorrupt(docs: DataFrame, spanLen: Int = 3, maskPct: Int = 10): DataFrame = {
    require(maskPct >= 0 && maskPct <= 100,
      s"maskPct is a percentage in [0, 100], got $maskPct")
    // hash % 100 < maskPct: exact maskPct% rate for EVERY maskPct (the
    // previous % (100/maskPct) == 0 form shifted the rate for maskPct
    // not dividing 100 and div-by-zero'd above 100)
    def masked(block: Column): Column =
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        block.cast("string"))), 1, 4), 16, 10).cast("int") % 100 < maskPct
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("ts"))
      .select(col("doc_id"),
        aggregate(
          sequence(lit(0), size(col("ts")) - 1),
          struct(lit("").as("acc"), lit(0).as("nsp"), lit(0).as("nm")),
          (st, i) => {
            val blk = (i / spanLen).cast("int")
            val isMasked = masked(blk)
            val firstOfBlock = (i % spanLen) === 0
            val tok = element_at(col("ts"), i + 1)
            when(!isMasked, struct(
                when(st.getField("acc") === "", tok)
                  .otherwise(concat(st.getField("acc"), lit(" "), tok)).as("acc"),
                st.getField("nsp").as("nsp"), st.getField("nm").as("nm")))
              .when(firstOfBlock, struct(
                when(st.getField("acc") === "",
                    concat(lit("<extra_id_"), st.getField("nsp").cast("string"), lit(">")))
                  .otherwise(concat(st.getField("acc"), lit(" <extra_id_"),
                    st.getField("nsp").cast("string"), lit(">"))).as("acc"),
                (st.getField("nsp") + 1).as("nsp"),
                (st.getField("nm") + 1).as("nm")))
              .otherwise(struct(st.getField("acc").as("acc"),
                st.getField("nsp").as("nsp"),
                (st.getField("nm") + 1).as("nm")))
          }).as("st"))
      .select(col("doc_id"), col("st.acc").as("corrupted"),
        col("st.nsp").as("n_spans"), col("st.nm").as("n_masked"))
  }

  /** Per-stratum exact-size-k Efraimidis–Spirakis weighted sampling —
    * [[prioritySample]]'s grouped form (a fixed PER-DOMAIN budget, the
    * shape mixture plans actually need): same md5-uniform priorities
    * u^(1/w), top-k per stratum by one stratum-keyed ranking window
    * (never a global sort; the per-group k is a row_number cutoff on the
    * SAME shuffle). Output: (stratum, doc_id, es_key ROUND·,4). */
  def groupPrioritySample(docs: DataFrame, weightCol: String, k: Int,
      stratumCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val key = pow(u, lit(1.0) / col(weightCol))
    docs.select(col(stratumCol).as("stratum"), col("doc_id"), key.as("k0"))
      .withColumn("r", row_number().over(Window.partitionBy("stratum")
        .orderBy(col("k0").desc, col("doc_id"))))
      .where(col("r") <= k)
      .select(col("stratum"), col("doc_id"), round(col("k0"), 4).as("es_key"))
  }

  /** DoReMi-flavor domain reweighting (Xie et al. 2023's
    * excess-loss-driven mixture, the static-reference declarative form):
    * each domain's difficulty is its average per-token NLL under the
    * corpus unigram LM, its EXCESS is the clipped gap above the blend's
    * average, and the new mixture exponentially upweights excess —
    * w_s ∝ exp(η·excess_s) — then apportions an integer token budget by
    * the same Hamilton scheme as [[temperatureAllocation]]. (Full DoReMi
    * re-estimates losses against a training proxy each round; with a
    * static reference the multiplicative-weights loop telescopes to this
    * one exponential tilt, so the loop is not pretended.)
    *
    * Determinism: losses are computed from the V·S-bounded
    * (stratum, token) COUNT table — ln only ever sees exact integers,
    * and the weighted fold runs over ≤ V·S terms, never the token
    * stream — loss_s = ln N − (Σ_t c_{t,s}·ln c_t)/n_s. Corpus volume
    * touches one count shuffle; everything after is vocab-bounded.
    * Output: (stratum, n_toks, loss, excess, share ROUND·,4, alloc). */
  def domainReweight(docs: DataFrame, budget: Long = 100000L,
      eta: Double = 2.0, stratumCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val occ = Dedup.spreadForCompute(docs)
      .select(col(stratumCol).as("stratum"), explode(Dedup.tokens(col("text"))).as("tok"))
    val bow = occ.groupBy("stratum", "tok").agg(count(lit(1)).as("cs"))
      .localCheckpoint(true) // V·S rows; corpus touched exactly once
    val cnt = bow.groupBy("tok").agg(sum(col("cs")).as("c"))
    val n = cnt.agg(sum(col("c")).as("nn"))
    val dom = bow.join(broadcast(cnt), "tok").crossJoin(broadcast(n))
      .groupBy("stratum")
      .agg(sum(col("cs")).as("n_toks"),
        (log(first(col("nn"))) -
          sum(col("cs") * log(col("c"))) / sum(col("cs"))).as("loss"))
    val blend = bow.join(broadcast(cnt), "tok").crossJoin(broadcast(n))
      .agg((log(first(col("nn"))) -
        sum(col("cs") * log(col("c"))) / first(col("nn"))).as("l0"))
    val ex = dom.crossJoin(broadcast(blend))
      .select(col("stratum"), col("n_toks"), col("loss"),
        greatest(col("loss") - col("l0"), lit(0.0)).as("excess"))
    val z = ex.agg(sum(exp(lit(eta) * col("excess"))).as("z"))
    val scaled = ex.crossJoin(broadcast(z))
      .select(col("stratum"), col("n_toks"), col("loss"), col("excess"),
        (exp(lit(eta) * col("excess")) / col("z")).as("share"))
      .withColumn("bp", lit(budget) * col("share") + lit(1e-9))
    val fl = scaled
      .withColumn("base", floor(col("bp")).cast("long"))
      .withColumn("rem", col("bp") - floor(col("bp")))
    val sb = fl.agg(sum(col("base")).as("sb"))
    fl.withColumn("r",
        row_number().over(Window.orderBy(col("rem").desc, col("stratum"))))
      .crossJoin(broadcast(sb))
      .select(col("stratum"), col("n_toks"),
        round(col("loss"), 4).as("loss"),
        round(col("excess"), 4).as("excess"),
        round(col("share"), 4).as("share"),
        (col("base") + when(col("r") <= lit(budget) - col("sb"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Out-of-vocabulary rate per stratum against a frozen vocabulary —
    * the tokenizer/vocab coverage report (which domains a fixed vocab
    * serves worst). `vocab` is one column of tokens; rate =
    * n_oov / n_tokens from exact integer counts (single division —
    * bit-identical across engines).
    *
    * Scale shape: broadcast dictionary join (V ≪ corpus) + one
    * stratum-count shuffle. */
  def oovRate(docs: DataFrame, vocab: DataFrame, stratumCol: String = "source"): DataFrame = {
    val dict = vocab.toDF("tok").distinct().withColumn("in_v", lit(1))
    Dedup.spreadForCompute(docs)
      .select(col(stratumCol).as("stratum"), explode(Dedup.tokens(col("text"))).as("tok"))
      .join(broadcast(dict), Seq("tok"), "left")
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_toks"),
        count(when(col("in_v").isNull, 1)).as("n_oov"))
      .select(col("stratum"), col("n_toks"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_toks"), 4).as("oov_rate"))
  }

  /** Tokenizer-design coverage curve: for each threshold t, the SMALLEST
    * vocabulary size whose top-k-by-frequency tokens cover ≥ t of all
    * token occurrences, plus the coverage actually achieved — the
    * standard "how big must the vocab be" analysis run before fixing a
    * tokenizer.
    *
    * Scale shape: a naive top-k scan needs a global rank over V tokens
    * (single-partition window — the anti-pattern). Instead the token
    * counts are collapsed to their COUNT HISTOGRAM — (count value c,
    * tokens with that count f) — whose row count is bounded by the
    * number of distinct count values (≈ O(√N) under Zipf, thousands at
    * any corpus size), and the cumulative window runs over that tiny
    * frame. Within a count-group tokens are interchangeable, so the
    * minimal vocab reaching a target is exact integer arithmetic:
    * whole groups while they fit, then ⌈remaining/c⌉ tokens of the
    * first group that crosses the target. All-integer up to the final
    * reported fraction → cross-engine hash-exact.
    *
    * Thresholds are exact rationals (num, den); targets use integer
    * ceil((total·num)/den), so no floating-point threshold ever decides
    * a boundary. Output: (pct, vocab_size, coverage ROUND 4). */
  def vocabCoverage(docs: DataFrame,
      thresholds: Seq[(Int, Int)] = Seq((1, 2), (9, 10), (19, 20), (99, 100))): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = Dedup.spreadForCompute(docs)
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val hist = counts.groupBy("c").agg(count(lit(1)).as("f"))
    // cumulative over the histogram, densest count first — tiny frame,
    // see scaladoc for the boundedness argument
    val w = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum_mass", sum(col("c") * col("f")).over(w))
      .withColumn("cum_toks", sum(col("f")).over(w))
      .withColumn("prev_mass", col("cum_mass") - col("c") * col("f"))
      .withColumn("prev_toks", col("cum_toks") - col("f"))
    val tot = counts.agg(sum(col("c")).as("total"))
    val th = thresholds.toDF("num", "den")
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(th)) // scalar + T-row
      .withColumn("target",
        expr("(total * num + den - 1) DIV den")) // integer ceil
      .where(col("cum_mass") >= col("target")) // groups at/after the crossing
      .groupBy("num", "den") // first crossing group = smallest cum_mass
      .agg(min(struct(col("cum_mass"), col("c"), col("prev_mass"),
        col("prev_toks"), col("target"), col("total"))).as("g"))
      .select(round(col("num").cast("double") / col("den"), 4).as("pct"),
        (col("g.prev_toks") +
          expr("(g.target - g.prev_mass + g.c - 1) DIV g.c")).as("vocab_size"),
        round((col("g.prev_mass") +
          expr("(g.target - g.prev_mass + g.c - 1) DIV g.c") * col("g.c"))
          .cast("double") / col("g.total"), 4).as("coverage"))
  }

  /** Multinomial Naive Bayes document classifier with add-one smoothing:
    * train on the corpus's own `labelCol` and score every document back —
    * the linear bag-of-words classifier shape of fastText-style
    * quality/domain filters (train on curated-vs-crawl labels, keep what
    * scores curated), here with the fixture's own labels so the output is
    * exactly oracle-checkable.
    *
    * Model: P(c) = docs_c / docs;  P(t|c) = (n_tc + 1) / (N_c + V);
    * score(d,c) = ln P(c) + Σ_t n_td · ln P(t|c) over d's OWN tokens
    * (multinomial NB — absent tokens contribute nothing, so scoring never
    * scans V per doc); pred = argmax_c, ties to the lexicographically
    * smallest class.
    *
    * Scale shape: the corpus is exploded and shuffled exactly ONCE — the
    * (doc, class, tok) bag-of-words aggregate — and every model statistic
    * (per-class token counts, class totals, vocabulary, V) derives from
    * that bow, which is ≤ token volume and usually ≪ it. The learned
    * model is the (V×C) log-likelihood grid with a vocab×classes fill-in
    * for the smoothed zero counts. Scoring is bow ⋈ grid on tok (plain
    * shuffle join; the grid is model-sized, ≪ corpus), one (doc,class)
    * sum, and a per-doc argmax window keyed by doc_id. Token-free
    * documents still classify (prior-only score) via the docs×C left
    * join. No driver-side state at any V. */
  def nbClassify(docs: DataFrame, labelCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Dedup.spreadForCompute(docs)
      .select(col("doc_id"), col(labelCol).as("cls"),
        explode(Dedup.tokens(col("text"))).as("tok"))
    val classes = docs.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val prior = classes.crossJoin(broadcast(nDocs)) // one-row scalar join
      .select(col("cls"),
        log(col("n_docs").cast("double") / col("n_total")).as("logprior"))
    // the ONE corpus-wide explode+shuffle; all model stats derive from it
    val bow = toks.groupBy("doc_id", "cls", "tok")
      .agg(count(lit(1)).as("n_td"))
    val tokCls = bow.groupBy("tok", "cls").agg(sum(col("n_td")).as("n_tc"))
    val clsTotals = tokCls.groupBy("cls").agg(sum(col("n_tc")).as("n_c"))
    val vocab = tokCls.select("tok").distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val grid = vocab.crossJoin(broadcast(classes.select("cls")))
      .join(tokCls, Seq("tok", "cls"), "left")
      .join(broadcast(clsTotals), Seq("cls"))
      .crossJoin(broadcast(vSize)) // one-row scalar join
      .select(col("tok"), col("cls"),
        log((coalesce(col("n_tc"), lit(0L)) + 1).cast("double") /
          (col("n_c") + col("v")).cast("double")).as("logp"))
    val ll = bow.select("doc_id", "tok", "n_td").join(grid, Seq("tok"))
      .groupBy("doc_id", "cls").agg(sum(col("n_td") * col("logp")).as("ll"))
    val scored = docs.select("doc_id").crossJoin(broadcast(prior))
      .join(ll, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("cls"),
        (coalesce(col("ll"), lit(0.0)) + col("logprior")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cls"))
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("doc_id"), col("cls").as("pred"),
        round(col("score"), 4).as("nb_score"))
  }

  /** UMass topic coherence (Mimno et al. 2011) of each group's top-k
    * document-frequency tokens — the standard "are these word sets
    * semantically tight" eval, model-free here (word sets = per-group
    * top-k by doc frequency, rank ties broken by token) so the whole
    * computation is engine-portable and hash-checkable; pointing it at
    * a trained LDA model's top words instead is the same code path.
    *
    * C(t) = Σ_{i<j} ln( (D(w_i, w_j) + 1) / D(w_j) ) over rank-ordered
    * pairs, D(·) counting docs IN the group. Shape: distinct (doc, tok)
    * once; per-group top-k via a window over the (group × V) count table
    * (never corpus rows); co-occurrence via a self-join of the top-token
    * postings on (group, doc) — fan-out bounded by k per doc — and one
    * k²-key aggregation. Output: (grp, n_pairs, coherence ROUND·,4). */
  def umassCoherence(docs: DataFrame, groupCol: String = "source",
      topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dt = docs
      .select(col("doc_id"), col(groupCol).as("grp"),
        explode(Dedup.tokens(col("text"))).as("tok"))
      .distinct()
    val dfTab = dt.groupBy("grp", "tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("grp").orderBy(col("df").desc, col("tok"))
    val top = dfTab.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
    val posts = dt.join(broadcast(top), Seq("grp", "tok"))
      .select(col("grp"), col("doc_id"), col("tok"), col("rk"), col("df"))
    val co = posts.toDF("grp", "doc_id", "wi", "ri", "dfi")
      .join(posts.toDF("grp", "doc_id", "wj", "rj", "dfj"), Seq("grp", "doc_id"))
      .where(col("ri") < col("rj"))
      .groupBy("grp", "wi", "wj")
      .agg(count(lit(1)).as("c"))
    // pairs that never co-occur still contribute ln(1/D(wj)) — build the
    // full rank-ordered pair grid from the tiny top table and left-join
    val grid = top.select(col("grp"), col("tok").as("wi"), col("rk").as("ri"))
      .join(top.select(col("grp"), col("tok").as("wj"), col("rk").as("rj"),
        col("df").as("dfj")), "grp")
      .where(col("ri") < col("rj"))
    grid.join(co.select("grp", "wi", "wj", "c"), Seq("grp", "wi", "wj"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(log((col("c") + 1).cast("double") / col("dfj"))), 4)
          .as("coherence"))
      .orderBy("grp")
  }

  /** Chao1 richness estimate of the UNSEEN vocabulary per source — the
    * ecology species estimator on tokens: how many types exist beyond
    * what this sample showed (the "how much new vocab will more
    * crawling buy" projection next to the Heaps fit). Bias-corrected
    * form Chao1 = D + f1(f1−1)/(2(f2+1)) from the singleton/doubleton
    * counts of one (source, token) rollup — every number a ratio of
    * exact integers. Output: (source, n_types, f1, f2, chao1). */
  def chao1(docs: DataFrame, groupCol: String = "source"): DataFrame = {
    val tc = docs.select(col(groupCol).as("grp"),
        explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("c"))
    tc.groupBy("grp").agg(
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("grp"), col("n_types"), col("f1"), col("f2"),
        round(col("n_types").cast("double")
          + (col("f1") * (col("f1") - 1)).cast("double")
            / (lit(2L) * (col("f2") + 1)).cast("double"), 4).as("chao1"))
      .orderBy("grp")
  }

  /** Heaps' law fit — vocabulary growth V(n) ≈ K·n^β, the companion
    * diagnostic to [[zipfFit]] (natural text: β ≈ 0.4–0.6; templated or
    * looping corpora flatten early). The growth curve is measured at
    * `checkpoints` evenly spaced token counts in doc_id order:
    *   - global token positions from per-doc offsets via the
    *     distributed two-pass [[Temporal.runningSum]] (never a global
    *     window over corpus rows);
    *   - V at checkpoint c = tokens whose FIRST position ≤ c, counted
    *     against a broadcast `checkpoints`-row grid (V-bounded fan-out);
    *   - β and K from closed-form OLS of ln V ~ ln c over the curve.
    * Output: one row (n_tokens, v_types, beta, k ROUND·,4). */
  def heapsFit(docs: DataFrame, checkpoints: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(checkpoints >= 2, "checkpoints >= 2")
    val toks = docs.select(col("doc_id"),
      posexplode(Dedup.tokens(col("text")))).toDF("doc_id", "idx", "tok")
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val offs = Temporal.runningSum(lens, "doc_id", "len")
      .join(lens, "doc_id")
      .select(col("doc_id"), (col("running_sum") - col("len")).as("off"))
    val firstSeen = toks.join(offs, "doc_id")
      .select(col("tok"), (col("off") + col("idx") + 1).as("pos"))
      .groupBy("tok").agg(min("pos").as("fp"))
    val n = lens.agg(coalesce(sum("len"), lit(0L))).as[Long].head()
    val grid = spark.range(1, checkpoints + 1).toDF("i")
      .select(col("i"), floor(lit(n) * col("i") / (1.0 * checkpoints))
        .cast("long").as("c"))
    val curve = firstSeen.crossJoin(broadcast(grid))
      .where(col("fp") <= col("c"))
      .groupBy("i", "c").agg(count(lit(1)).as("v"))
    // The OLS moments are sums of IRRATIONAL logs, so parallel
    // accumulation order (schedule-dependent on Spark, thread-dependent
    // in DuckDB — observed flipping ext_heaps' 4th decimal once) is not
    // reproducible. The curve is ≤ `checkpoints` points: collect it into
    // ONE ordered array and fold the moments left-to-right in-row — a
    // fixed-order chain the oracle mirrors with list_reduce over
    // list(· ORDER BY i), bit-identical on any schedule/thread count.
    def fold(arr: String) =
      s"aggregate($arr, CAST(0 AS DOUBLE), (a, x) -> a + x)"
    curve
      .agg(sort_array(collect_list(struct(col("i"), col("v"), col("c")))).as("ps"),
        max("v").as("v_types"))
      .select(col("v_types"),
        expr(fold("transform(ps, p -> ln(CAST(p.c AS DOUBLE)))")).as("sx"),
        expr(fold("transform(ps, p -> ln(CAST(p.v AS DOUBLE)))")).as("sy"),
        expr(fold("transform(ps, p -> ln(CAST(p.v AS DOUBLE)) * ln(CAST(p.c AS DOUBLE)))")).as("sxy"),
        expr(fold("transform(ps, p -> ln(CAST(p.c AS DOUBLE)) * ln(CAST(p.c AS DOUBLE)))")).as("sxx"),
        size(col("ps")).cast("double").as("m"))
      // NULL (not ANSI divide-by-zero) on a degenerate grid — empty
      // corpus or a single point has no slope, like var_pop's NULL
      .withColumn("d", col("m") * col("sxx") - col("sx") * col("sx"))
      .withColumn("b", when(col("d") =!= 0.0,
        (col("m") * col("sxy") - col("sx") * col("sy")) / col("d")))
      .select(lit(n).as("n_tokens"), col("v_types"),
        round(col("b"), 4).as("beta"),
        round(when(col("b").isNotNull,
          exp(col("sy") / col("m") - col("b") * (col("sx") / col("m")))), 4).as("k"))
  }

  /** Zipf log-log fit of the corpus token distribution: OLS slope and
    * intercept of ln(freq) ~ ln(rank) — the one-glance "is this corpus
    * natural text or templated sludge" diagnostic (natural language sits
    * near slope −1; boilerplate flattens the head, OCR noise fattens the
    * tail). Frequency ranks come from the two-job sortBy+zipWithIndex
    * scheme on (−count, tok) — V-bounded, no single-partition window —
    * and the fit is closed-form from population moments (covar_pop /
    * var_pop), one aggregation over V rows. Output: one row
    * (n_types, slope, intercept), ROUND(·,4). */
  def zipfFit(docs: DataFrame, maxRanks: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val ranked = counts.as[(String, Long)].rdd
      .sortBy({ case (tok, c) => (-c, tok) })
      .zipWithIndex()
      .map { case ((_, c), i) => (c, i + 1) }.toDF("c", "rk")
      .localCheckpoint() // read twice (count + fit) past the RDD sort
    // Fit over the top `maxRanks` ranks only (the head is where Zipf
    // lives; the tail is hapax noise every practical fit drops), folded
    // left-to-right over ONE rank-ordered in-row array — same
    // deterministic-moment rationale as [[heapsFit]]: parallel
    // covar_pop over irrational logs is schedule/thread-dependent in
    // the 4th decimal on both engines. The cap bounds the collected
    // array independent of corpus vocabulary.
    def fold(arr: String) =
      s"aggregate($arr, CAST(0 AS DOUBLE), (a, x) -> a + x)"
    val nTypes = ranked.count()
    ranked.where(col("rk") <= maxRanks)
      .agg(sort_array(collect_list(struct(col("rk"), col("c")))).as("ps"))
      .select(
        expr(fold("transform(ps, p -> ln(CAST(p.rk AS DOUBLE)))")).as("sx"),
        expr(fold("transform(ps, p -> ln(CAST(p.c AS DOUBLE)))")).as("sy"),
        expr(fold("transform(ps, p -> ln(CAST(p.c AS DOUBLE)) * ln(CAST(p.rk AS DOUBLE)))")).as("sxy"),
        expr(fold("transform(ps, p -> ln(CAST(p.rk AS DOUBLE)) * ln(CAST(p.rk AS DOUBLE)))")).as("sxx"),
        size(col("ps")).cast("double").as("m"))
      // NULL (not ANSI divide-by-zero) when the fit is degenerate
      .withColumn("d", col("m") * col("sxx") - col("sx") * col("sx"))
      .withColumn("s", when(col("d") =!= 0.0,
        (col("m") * col("sxy") - col("sx") * col("sy")) / col("d")))
      .select(lit(nTypes).as("n_types"), round(col("s"), 4).as("slope"),
        round(when(col("s").isNotNull,
          col("sy") / col("m") - col("s") * (col("sx") / col("m"))), 4).as("intercept"))
  }

  /** Per-doc readability scores (Flesch–Kincaid grade + Flesch reading
    * ease) over the [[syllableStats]] vowel-group syllable heuristic.
    * Sentence count is `max(1, '.' occurrences)` — a pure character
    * count, so both engines agree exactly (no sentence-splitter
    * semantics to match). Words-per-sentence and syllables-per-word are
    * ratios of exact integers; the score is a fixed left-to-right
    * affine combination of the two, so the doubles are engine-identical
    * before ROUND(·,4). Pure per-row map: no shuffle, scan-speed at any
    * scale. Docs with zero tokens are excluded (score undefined). */
  def readability(docs: DataFrame): DataFrame = {
    val dots = length(col("text")) - length(regexp_replace(col("text"), "\\.", ""))
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("ts"),
        greatest(lit(1L), dots.cast("long")).as("n_sent"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("n_toks"), col("n_sent"),
        aggregate(col("ts"), lit(0),
          (a, t) => a + size(regexp_extract_all(t, lit("[aeiou]+"), lit(0))))
          .cast("long").as("n_syll"))
      .where(col("n_toks") > 0)
      .withColumn("wps", col("n_toks").cast("double") / col("n_sent"))
      .withColumn("spw", col("n_syll").cast("double") / col("n_toks"))
      .select(col("doc_id"), col("n_toks"), col("n_sent"), col("n_syll"),
        round(lit(0.39) * col("wps") + lit(11.8) * col("spw") - lit(15.59), 4)
          .as("fk_grade"),
        round(lit(206.835) - lit(1.015) * col("wps") - lit(84.6) * col("spw"), 4)
          .as("ease"))
  }

  /** Lexical-diversity measures per source — the corpus-health numbers a
    * data-mixing dashboard tracks (a source whose diversity collapses is
    * template spam): type–token ratio, Herdan's C = ln V / ln N (the
    * length-robust TTR), Yule's K = 10⁴·(Σc² − N)/N², and Simpson's
    * repeat-rate Σc(c−1)/(N(N−1)). Everything up to the final division
    * is exact 64-bit integer arithmetic (Σc² ≤ N·max(c) ≪ 2⁵³ at any
    * per-source shard this runs on), and the lns see only exact
    * integers, so both engines produce bit-identical doubles. Shape:
    * one (source, token) count shuffle + one per-source fold — the
    * token count table is the same one tf-idf builds. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("c2"))
      .where(col("n_tokens") > 1)
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 4).as("ttr"),
        round(log(col("n_types").cast("double")) / log(col("n_tokens").cast("double")), 4)
          .as("herdan_c"),
        round(lit(10000.0) * (col("c2") - col("n_tokens")).cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double"), 4).as("yule_k"),
        round((col("c2") - col("n_tokens")).cast("double")
          / (col("n_tokens") * (col("n_tokens") - 1)).cast("double"), 6)
          .as("simpson"))
      .orderBy("source")

  /** Token BURSTINESS census (Church & Gale 1995): variance-to-mean
    * ratio of a token's per-doc count across the WHOLE corpus (absent
    * docs count 0) — function words are ~Poisson (b ≈ 1−p), topical
    * content words are bursty (b ≫ 1): the statistical "is this token a
    * keyword anywhere" screen that needs no labels. With integer moments
    * s1 = Σc, s2 = Σc² over the df docs containing the token and N total
    * docs, b = var/mean = (N·s2 − s1²)/(N·s1) — ONE division of exact
    * 64-bit products, so ranking on the raw double is engine-safe.
    * Shape: one (doc, token) count shuffle + one per-token aggregate;
    * `minDf` floors away hapax noise; top-k via TakeOrdered. */
  def tokenBurstiness(docs: DataFrame, minDf: Long = 5L, k: Int = 20): DataFrame = {
    val withToks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("ts"))
      .where(size(col("ts")) > 0)
    val nDocs = withToks.agg(count(lit(1)).as("nd"))
    val tc = withToks.select(explode(col("ts")).as("tok"), col("doc_id"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    tc.groupBy("tok")
      .agg(count(lit(1)).as("df"), sum("c").as("cf"),
        sum(col("c") * col("c")).as("s2"))
      .where(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .withColumn("burstiness",
        (col("nd") * col("s2") - col("cf") * col("cf")).cast("double")
          / (col("nd") * col("cf")).cast("double"))
      .orderBy(col("burstiness").desc, col("tok")).limit(k)
      .select(col("tok"), col("df"), col("cf"),
        round(col("burstiness"), 4).as("burstiness"))
  }

  /** Character-class census per source — the ingest QC that catches a
    * feed gone binary/markup/numeric before any tokenizer runs: letter /
    * digit / whitespace / punctuation fractions of the raw text. Counts
    * come from regexp strip-lengths (exact integers, one projection +
    * one group aggregate); fractions are single divisions. */
  def charClassCensus(docs: DataFrame): DataFrame = {
    def countClass(re: String) =
      length(col("text")) - length(regexp_replace(col("text"), re, ""))
    docs.select(col("source"),
        length(col("text")).cast("long").as("n"),
        countClass("[a-zA-Z]").cast("long").as("alpha"),
        countClass("[0-9]").cast("long").as("digit"),
        countClass("\\s").cast("long").as("space"))
      .groupBy("source")
      .agg(sum("n").as("n_chars"), sum("alpha").as("a"),
        sum("digit").as("d"), sum("space").as("sp"))
      .where(col("n_chars") > 0)
      .select(col("source"), col("n_chars"),
        round(col("a").cast("double") / col("n_chars").cast("double"), 4)
          .as("alpha_frac"),
        round(col("d").cast("double") / col("n_chars").cast("double"), 4)
          .as("digit_frac"),
        round(col("sp").cast("double") / col("n_chars").cast("double"), 4)
          .as("space_frac"),
        round((col("n_chars") - col("a") - col("d") - col("sp")).cast("double")
          / col("n_chars").cast("double"), 4).as("other_frac"))
      .orderBy("source")
  }

  /** Boilerplate BOUNDARY-token census: the most frequent doc-INITIAL
    * and doc-FINAL tokens — headers and footers show up as boundary
    * tokens whose boundary share dwarfs their corpus share (the signal a
    * header/footer stripper keys on). Exact integer counts, one in-row
    * boundary projection + one count aggregate, top-k per position by
    * (count desc, token). */
  def boilerplateTokens(docs: DataFrame, k: Int = 10): DataFrame = {
    val ts = docs.select(Dedup.tokens(col("text")).as("ts"))
      .where(size(col("ts")) > 0)
    val nd = ts.agg(count(lit(1)).as("n_docs"))
    val bounds = ts.select(explode(array(
        struct(lit("first").as("position"), col("ts").getItem(0).as("tok")),
        struct(lit("last").as("position"),
          element_at(col("ts"), -1).as("tok")))).as("b"))
      .select(col("b.position"), col("b.tok"))
      .groupBy("position", "tok").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("position").orderBy(col("c").desc, col("tok"))
    bounds.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .crossJoin(broadcast(nd))
      .select(col("position"), col("rank"), col("tok"), col("c"),
        round(col("c").cast("double") / col("n_docs").cast("double"), 4)
          .as("doc_share"))
      .orderBy("position", "rank")
  }

  /** Feature-hashing (hashing-trick) collision census at `nBuckets`:
    * before shipping a V-dimensional BoW into a fixed 2^k hashed space,
    * measure what the hash destroys — buckets used, tokens sharing a
    * bucket, and the count mass riding on collided buckets. Bucket =
    * md5(tok) mod nBuckets (the deterministic cross-engine hash this
    * engine standardizes on). All integer counts: one V-row aggregate
    * after the token count shuffle. Output: one row
    * (n_buckets, n_used, n_tokens, collided_buckets, collided_tokens,
    * collided_mass_frac ROUND·,4). */
  def hashFeatureCensus(docs: DataFrame, nBuckets: Int = 1024): DataFrame = {
    val tc = docs.select(explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % nBuckets)
    val b = tc.groupBy("bucket")
      .agg(count(lit(1)).as("nt"), sum("c").as("mass"))
    b.agg(lit(nBuckets).as("n_buckets"), count(lit(1)).as("n_used"),
        sum("nt").as("n_tokens"),
        sum(when(col("nt") >= 2, 1L).otherwise(0L)).as("collided_buckets"),
        sum(when(col("nt") >= 2, col("nt")).otherwise(0L)).as("collided_tokens"),
        sum(when(col("nt") >= 2, col("mass")).otherwise(0L)).as("cm"),
        sum("mass").as("tm"))
      .select(col("n_buckets"), col("n_used"), col("n_tokens"),
        col("collided_buckets"), col("collided_tokens"),
        round(col("cm").cast("double") / col("tm").cast("double"), 4)
          .as("collided_mass_frac"))
  }

  /** Language-mix profile per source — the "is this source actually
    * monolingual" ingest check: doc counts, distinct languages, Shannon
    * entropy of the language mix (H = ln n − (Σc·ln c)/n, lns over exact
    * integers only), and the dominant language with its share (rank on
    * (count desc, lang) — a total order). One (source, lang) count
    * aggregate; everything downstream is S·L rows. */
  def sourceLangMix(docs: DataFrame): DataFrame = {
    val slc = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val ent = slc.groupBy("source")
      .agg(sum("c").as("n_docs"), count(lit(1)).as("n_langs"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        round(log(col("n_docs").cast("double"))
          - col("clnc") / col("n_docs").cast("double"), 4).as("entropy"))
    val w = Window.partitionBy("source").orderBy(col("c").desc, col("lang"))
    val top = slc.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c").as("top_c"))
    ent.join(top, "source")
      .select(col("source"), col("n_docs"), col("n_langs"), col("entropy"),
        col("top_lang"),
        round(col("top_c").cast("double") / col("n_docs").cast("double"), 4)
          .as("top_share"))
      .orderBy("source")
  }

  /** Jensen–Shannon divergence of each stratum's unigram distribution vs
    * the pooled corpus — the SYMMETRIC, bounded (≤ ln 2) complement of
    * [[domainKl]] (JSD is what mixture-design papers report, because a
    * stratum missing pooled mass and the pool missing stratum mass count
    * alike). Same V×S smoothed grid and scale shape as domainKl — one
    * (stratum, token) count shuffle, V-row vocab side distributed,
    * S-row totals broadcast; the two ln terms share one midpoint. The
    * per-stratum sum is a shuffle-order float fold, stabilized by
    * [[graft.functions.StableRound]] exactly as domainKl's. */
  def jsDivergence(docs: DataFrame, stratumCol: String = "source"): DataFrame = {
    val occ = Dedup.spreadForCompute(docs)
      .select(col(stratumCol).as("stratum"), explode(Dedup.tokens(col("text"))).as("tok"))
    val sc = occ.groupBy("stratum", "tok").agg(count(lit(1)).as("c_s"))
      .localCheckpoint(true)
    val cc = sc.groupBy("tok").agg(sum(col("c_s")).as("c_a"))
    val totals = cc.agg(sum(col("c_a")).as("n_a"), count(lit(1)).as("v"))
    val sTotals = sc.groupBy("stratum").agg(sum(col("c_s")).as("n_s"))
    val grid = cc.crossJoin(broadcast(sTotals.crossJoin(totals)))
      .join(sc, Seq("stratum", "tok"), "left")
      .na.fill(0L, Seq("c_s"))
    val p = (col("c_s") + lit(1.0)) / (col("n_s") + col("v"))
    val q = (col("c_a") + lit(1.0)) / (col("n_a") + col("v"))
    val m = (p + q) / lit(2.0)
    grid.select(col("stratum"),
        (p * log(p / m) * lit(0.5) + q * log(q / m) * lit(0.5)).as("term"))
      .groupBy("stratum")
      .agg(graft.functions.StableRound.col4(sum(col("term"))).as("jsd"))
      .orderBy("stratum")
  }

  /** Gries' DP token dispersion across strata — "is this token's mass
    * spread like the corpus, or parked in one source" (a high-frequency
    * token concentrated in one crawl is boilerplate/template, not
    * vocabulary; the complement of [[tokenBurstiness]]'s per-doc view).
    * DP = ½ Σ_s |v_s/f − n_s/N| ∈ [0, 1): in common-denominator form
    * Σ_s |v_s·N − n_s·f| / (2·f·N) — the numerator an exact integer sum,
    * one division per token. Top-k ranked on ROUND(dp,4) with token
    * tie-breaks (the engine's rank contract). Shape: one (stratum,
    * token) count shuffle + the V×S grid + TakeOrdered. */
  def tokenDispersion(docs: DataFrame, stratumCol: String = "source",
      topK: Int = 20): DataFrame = {
    val occ = Dedup.spreadForCompute(docs)
      .select(col(stratumCol).as("stratum"),
        explode(Dedup.tokens(col("text"))).as("tok"))
    val sc = occ.groupBy("stratum", "tok").agg(count(lit(1)).as("c_s"))
      .localCheckpoint(true)
    val cc = sc.groupBy("tok").agg(sum(col("c_s")).as("f"))
    val tot = cc.agg(sum(col("f")).as("n"))
    val st = sc.groupBy("stratum").agg(sum(col("c_s")).as("n_s"))
    val grid = cc.crossJoin(broadcast(st.crossJoin(tot)))
      .join(sc, Seq("stratum", "tok"), "left")
      .na.fill(0L, Seq("c_s"))
    grid.groupBy("tok", "f", "n")
      .agg(sum(abs(col("c_s") * col("n") - col("n_s") * col("f"))).as("num"))
      .select(col("tok"), col("f"),
        round(col("num").cast("double")
          / (col("f") * col("n") * 2).cast("double"), 4).as("dp"))
      .orderBy(col("dp").desc, col("tok")).limit(topK)
  }

  /** Dunning log-likelihood keyness G² per token between a TARGET
    * stratum and the rest — the corpus-linguistics standard for "what
    * words characterize this source" (more robust than [[tokenOddsRatio]]
    * at small counts). For each token's 2×2 table, G² = 2·(Σ O·ln O −
    * Σ R·ln R − Σ C·ln C + N·ln N) with 0·ln 0 = 0 — every ln argument
    * an exact integer, so G² is the identical double in both engines;
    * the sign (enriched vs depleted in the target) is the
    * cross-multiplied integer comparison a·N_r vs b·N_t. Top-k on
    * ROUND(g2,4) with token tie-breaks. Shape: one token count shuffle
    * + a broadcast scalar row. */
  def keynessG2(docs: DataFrame, isTarget: Column, topK: Int = 20): DataFrame = {
    val occ = Dedup.spreadForCompute(docs)
      .select(isTarget.cast("int").as("t"),
        explode(Dedup.tokens(col("text"))).as("tok"))
    val tc = occ.groupBy("tok").agg(
      sum(when(col("t") === 1, 1L).otherwise(0L)).as("a"),
      sum(when(col("t") === 0, 1L).otherwise(0L)).as("b"))
    val tot = tc.agg(sum("a").as("nt"), sum("b").as("nr"))
    def xlx(c: Column) = when(c > 0, c.cast("double") * log(c)).otherwise(lit(0.0))
    val g = tc.crossJoin(broadcast(tot))
      .withColumn("n", col("nt") + col("nr"))
      .withColumn("f", col("a") + col("b"))
      .withColumn("g2", lit(2.0) * (xlx(col("a")) + xlx(col("b"))
        + xlx(col("nt") - col("a")) + xlx(col("nr") - col("b"))
        - xlx(col("f")) - xlx(col("n") - col("f"))
        - xlx(col("nt")) - xlx(col("nr")) + xlx(col("n"))))
    g.select(col("tok"), col("a"), col("b"),
        when(col("a") * col("nr") >= col("b") * col("nt"), lit(1))
          .otherwise(lit(-1)).as("direction"),
        round(col("g2"), 4).as("g2"))
      .orderBy(col("g2").desc, col("tok")).limit(topK)
  }

  /** ROUGE-1/ROUGE-2 overlap scores for CANDIDATE near-dup pairs — the
    * content-overlap eval that grades what the banding stage surfaced
    * (summarization's standard metric repurposed as a dedup-quality
    * readout; ROUGE-L's LCS adds little for bag-similar web dups at
    * many times the cost). Multiset n-gram overlap Σ min(c_a, c_b),
    * recall vs doc_a, precision vs doc_b, F1 — every number a ratio of
    * exact integer counts, no floats until the final divisions.
    *
    * Scale shape: n-gram counts are one tokenize rollup; each pair's
    * overlap is two equi-joins on (doc, gram) — work ∝ candidate
    * pairs × doc length, never corpus². */
  def rougePairEval(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val toks = Dedup.spreadForCompute(docs)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("ts"))
      .where(size(col("ts")) > 0)
    val g1 = toks.select(col("doc_id"), explode(col("ts")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val g2 = toks.where(size(col("ts")) > 1)
      .select(col("doc_id"), explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val lens = toks.select(col("doc_id"), size(col("ts")).cast("long").as("l1"),
      greatest(size(col("ts")) - 1, lit(0)).cast("long").as("l2"))
    def overlap(g: DataFrame, name: String) = pairs
      .join(g.toDF("doc_a", "g", "ca"), "doc_a")
      .join(g.toDF("doc_b", "g", "cb"), Seq("doc_b", "g"))
      .groupBy("doc_a", "doc_b").agg(sum(least(col("ca"), col("cb"))).as(name))
    // F1 = 2PR/(P+R) collapses to the exact integer ratio 2·ov/(la+lb)
    def prf(ov: Column, la: Column, lb: Column, p: String, r: String, f: String) =
      Seq(round(when(lb > 0, ov.cast("double") / lb.cast("double"))
            .otherwise(lit(0.0)), 4).as(p),
        round(when(la > 0, ov.cast("double") / la.cast("double"))
            .otherwise(lit(0.0)), 4).as(r),
        round(when(la + lb > 0, (ov * 2).cast("double")
            / (la + lb).cast("double")).otherwise(lit(0.0)), 4).as(f))
    val base = pairs
      .join(overlap(g1, "ov1"), Seq("doc_a", "doc_b"), "left")
      .join(overlap(g2, "ov2"), Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("ov1", "ov2"))
      .join(lens.toDF("doc_a", "l1a", "l2a"), "doc_a")
      .join(lens.toDF("doc_b", "l1b", "l2b"), "doc_b")
    base.select(Seq(col("doc_a"), col("doc_b"), col("ov1"), col("ov2")) ++
        prf(col("ov1"), col("l1a"), col("l1b"), "r1_p", "r1_r", "r1_f") ++
        prf(col("ov2"), col("l2a"), col("l2b"), "r2_p", "r2_r", "r2_f"): _*)
      .orderBy("doc_a", "doc_b")
  }

  /** Distribution-distance suite per stratum vs the pooled corpus —
    * TOTAL VARIATION, BHATTACHARYYA coefficient, and HELLINGER distance
    * of the unigram distributions. Completes the drift family's
    * geometry: KS = sup of the CDF gap, W1 = its area, JS = the
    * smoothed f-divergence, TV = the L1 gap (the tightest bound on how
    * differently any event can be scored), Hellinger = the metric the
    * affinity BC induces. TV's numerator Σ|c_s·n_a − c_a·n_s| is an
    * EXACT integer in common-denominator form (one division at the
    * end); BC folds √(c_s·c_a) of exact integer products in token
    * order, normalized by one √(n_s·n_a). Unsmoothed by design —
    * absent tokens contribute their full mass to TV and 0 to BC.
    * Shape: one (stratum, token) count shuffle + a V×S grid. */
  def distributionDistances(docs: DataFrame,
      stratumCol: String = "source"): DataFrame = {
    val occ = Dedup.spreadForCompute(docs)
      .select(col(stratumCol).as("stratum"),
        explode(Dedup.tokens(col("text"))).as("tok"))
    val sc = occ.groupBy("stratum", "tok").agg(count(lit(1)).as("c_s"))
      .localCheckpoint(true)
    val cc = sc.groupBy("tok").agg(sum(col("c_s")).as("c_a"))
    val tot = cc.agg(sum(col("c_a")).as("n_a"))
    val st = sc.groupBy("stratum").agg(sum(col("c_s")).as("n_s"))
    val grid = cc.crossJoin(broadcast(st.crossJoin(tot)))
      .join(sc, Seq("stratum", "tok"), "left")
      .na.fill(0L, Seq("c_s"))
    val agg = grid.groupBy("stratum", "n_s", "n_a").agg(
      sum(abs(col("c_s") * col("n_a") - col("c_a") * col("n_s"))).as("tvnum"),
      aggregate(sort_array(collect_list(struct(col("tok"),
          sqrt((col("c_s") * col("c_a")).cast("double")).as("t")))), lit(0.0),
        (a, x) => a + x.getField("t")).as("sbc"))
    val bc = col("sbc") / sqrt((col("n_s") * col("n_a")).cast("double"))
    agg.select(col("stratum"),
        round(col("tvnum").cast("double")
          / (col("n_s") * col("n_a") * 2).cast("double"), 4).as("tv"),
        round(bc, 4).as("bhattacharyya"),
        round(sqrt(greatest(lit(1.0) - bc, lit(0.0))), 4).as("hellinger"))
      .orderBy("stratum")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * doc under the corpus bigram LM ([[lmScore]]) and split each SOURCE
    * into head/middle/tail tertiles of NLL — the quality-stratified
    * sampling table a pretraining mix draws from ("head" = most fluent
    * third). Bucket cuts are EXACT integer ranks (rn·3 vs n, never a
    * float quantile boundary) over (round(nll,4), doc_id) — rank
    * decisions on rounded values per the cross-engine contract. The
    * per-bucket mean NLL goes through exact integer µ-units
    * (round(nll·10⁴) summed as longs, one final division) so no float
    * accumulation order enters the output. Shape: lmScore's joins + one
    * source-keyed rank window + one 3·S-row aggregate. */
  def pplBuckets(docs: DataFrame): DataFrame = {
    val nll = lmScore(docs).join(docs.select("doc_id", "source"), "doc_id")
    val w = Window.partitionBy("source").orderBy(col("nll"), col("doc_id"))
    nll
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n"), "head")
          .when(col("rn") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .withColumn("inll", round(col("nll") * lit(10000)).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("nll")), 4).as("nll_min"),
        round(max(col("nll")), 4).as("nll_max"),
        round(sum(col("inll")).cast("double")
          / (count(lit(1)) * lit(10000)).cast("double"), 4).as("nll_mean"))
      .orderBy("source", "bucket")
  }
}
