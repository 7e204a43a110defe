package graft.queries

import graft.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extension-operator queries (SURVEY §2.4 / north-star LLM-pipeline
  * surface) with DuckDB oracles wherever the computation is
  * SQL-expressible. MinHash/SimHash/fingerprints use md5-based hashing
  * precisely so the oracle can replicate them bit-for-bit; only the
  * LSH-hyperplane ANN and the multimodal stubs fall back to the weaker
  * rows-only check (seeded-deterministic, spec-verified instead). */
object ExtQueries {

  def minhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minhashCandidates(Tables.documents(s, d)).orderBy("doc_a", "doc_b")

  def jaccardTop(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardTopPairs(Tables.documents(s, d), 10)

  def simhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashes(Tables.documents(s, d)).orderBy("doc_id")

  def cosinePairs(s: SparkSession, d: String): DataFrame =
    Similarity.cosinePairsTopK(Tables.embeddings(s, d), 10)

  def nearDup(s: SparkSession, d: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(s, d), threshold = 0.45)

  def annTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.annTopK(e, e.where(col("vec_id") < 5), 5)
  }

  def langId(s: SparkSession, d: String): DataFrame =
    TextAnalysis.languageId(Tables.documents(s, d)).orderBy("doc_id")

  def quality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityMetrics(Tables.documents(s, d)).orderBy("doc_id")

  def tokenStats(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenStats(Tables.documents(s, d)).orderBy("doc_id")

  def fingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprints(Tables.documents(s, d)).orderBy("doc_id")

  // ---- rows-only (not SQL-expressible; spec-verified) ----

  def lshPairs(s: SparkSession, d: String): DataFrame =
    Similarity.lshPairsTopK(Tables.embeddings(s, d), 10, nBits = 8, dim = 64, seed = 42L)

  def imageFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.imageFeatures(
      Multimodal.syntheticMedia(s, Tables.documents(s, d))).toDF().orderBy("media_id")

  def frameSamples(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.syntheticMedia(s, Tables.documents(s, d)), stride = 4)
      .toDF().orderBy("media_id", "frame_index")

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ext_minhash_pairs" -> minhashPairs _,
    "ext_jaccard_top10" -> jaccardTop _,
    "ext_simhash" -> simhash _,
    "ext_cosine_pairs_top10" -> cosinePairs _,
    "ext_embedding_neardup" -> nearDup _,
    "ext_ann_topk" -> annTopK _,
    "ext_langid" -> langId _,
    "ext_quality" -> quality _,
    "ext_token_stats" -> tokenStats _,
    "ext_fingerprint" -> fingerprint _,
    "ext_lsh_pairs_top10" -> lshPairs _,
    "ext_multimodal_image_features" -> imageFeatures _,
    "ext_multimodal_frames" -> frameSamples _,
  )

  // ---------------- DuckDB oracle SQL ----------------

  private val toksCte =
    """toks AS (
      |  SELECT doc_id, text, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      |  FROM documents
      |)""".stripMargin

  private val sh3Cte =
    """sh AS (
      |  SELECT doc_id, list_transform(range(1, len(ts) - 1),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS sh
      |  FROM toks WHERE len(ts) >= 3
      |)""".stripMargin

  private val embCte =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"

  private def cosSql(a: String, b: String) =
    s"ROUND(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 4)"

  private def stopList(lang: String) =
    TextAnalysis.stopwords.toMap.apply(lang).map(w => s"'$w'").mkString("[", ",", "]")

  val oracles: Map[String, String] = Map(
    "ext_minhash_pairs" ->
      s"""WITH $toksCte, $sh3Cte,
         |sig AS (
         |  SELECT doc_id, list_transform(range(0, 8),
         |    i -> list_min(list_transform(sh, s -> md5(i::VARCHAR || ':' || s)))) AS sig
         |  FROM sh WHERE len(sh) > 0
         |),
         |bands AS (
         |  SELECT doc_id, b.band AS band,
         |         md5(sig[2*b.band + 1] || '|' || sig[2*b.band + 2]) AS key
         |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b
         |)
         |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "ext_jaccard_top10" ->
      s"""WITH $toksCte, $sh3Cte,
         |dsh AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jac
         |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY jac DESC, doc_a, doc_b LIMIT 10""".stripMargin,

    "ext_simhash" ->
      s"""WITH $toksCte,
         |hashed AS (SELECT doc_id, list_transform(ts, t -> md5(t)) AS hs FROM toks)
         |SELECT doc_id, list_sum(list_transform(range(0, 60), j ->
         |  CASE WHEN list_sum(list_transform(hs, h ->
         |    2 * (((strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
         |          // CAST(pow(2, 3 - j % 4) AS BIGINT)) % 2) - 1)) > 0
         |  THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END))::BIGINT AS simhash
         |FROM hashed ORDER BY doc_id""".stripMargin,

    "ext_cosine_pairs_top10" ->
      s"""WITH $embCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${cosSql("a.e", "b.e")} AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |ORDER BY cos DESC, vec_a, vec_b LIMIT 10""".stripMargin,

    "ext_embedding_neardup" ->
      s"""WITH $embCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${cosSql("a.e", "b.e")} AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.e", "b.e")} >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,

    "ext_ann_topk" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS query_id, e AS qe FROM e WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, c.vec_id, ${cosSql("c.e", "q.qe")} AS cos
         |  FROM e c, q WHERE c.vec_id <> q.query_id
         |),
         |ranked AS (
         |  SELECT query_id, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored
         |)
         |SELECT query_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    "ext_langid" ->
      s"""WITH $toksCte,
         |s AS (SELECT doc_id,
         |  len(list_filter(ts, t -> list_contains(${stopList("de")}, t))) AS s_de,
         |  len(list_filter(ts, t -> list_contains(${stopList("en")}, t))) AS s_en,
         |  len(list_filter(ts, t -> list_contains(${stopList("es")}, t))) AS s_es,
         |  len(list_filter(ts, t -> list_contains(${stopList("fr")}, t))) AS s_fr,
         |  len(list_filter(ts, t -> list_contains(${stopList("zh")}, t))) AS s_zh
         |  FROM toks)
         |SELECT doc_id, CASE
         |  WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_zh = 0 THEN 'und'
         |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |  WHEN s_fr >= s_zh THEN 'fr'
         |  ELSE 'zh' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,

    "ext_quality" ->
      s"""WITH $toksCte,
         |m AS (SELECT doc_id,
         |  len(ts) AS n_tokens,
         |  ROUND(list_sum(list_transform(ts, t -> length(t))) * 1.0 / len(ts), 4) AS avg_tok_len,
         |  ROUND(len(list_filter(ts, t -> list_contains(${stopList("en")}, t))) * 1.0 / len(ts), 4) AS stopword_ratio,
         |  ROUND((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / length(text), 4) AS digit_ratio
         |  FROM toks)
         |SELECT doc_id, n_tokens, avg_tok_len, stopword_ratio, digit_ratio,
         |  0.3 * least(n_tokens / 100.0, 1.0) + 0.4 * stopword_ratio
         |      + 0.3 * least(avg_tok_len / 10.0, 1.0) AS quality_score
         |FROM m ORDER BY doc_id""".stripMargin,

    "ext_token_stats" ->
      s"""WITH $toksCte
         |SELECT doc_id, len(ts) AS ws_tokens,
         |  len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')) AS re_tokens
         |FROM toks ORDER BY doc_id""".stripMargin,

    "ext_fingerprint" ->
      s"""WITH $toksCte
         |SELECT doc_id, CASE WHEN len(ts) >= 5 THEN
         |  list_min(list_transform(list_transform(range(1, len(ts) - 3),
         |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4]),
         |    s -> md5(s)))
         |  ELSE md5(text) END AS fp
         |FROM toks ORDER BY doc_id""".stripMargin,
  )
}
