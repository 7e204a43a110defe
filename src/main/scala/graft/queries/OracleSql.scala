package graft.queries

/** DuckDB-runnable ANSI SQL equivalents of [[Relational]]'s queries.
  *
  * Each statement is self-contained: the derived views of FIXTURES.md §C are
  * inlined as CTEs so the driver only needs the base parquet tables
  * registered. Column aliases match the Spark side exactly.
  */
object OracleSql {

  private val docsTok =
    """docs_tokenized AS (
      |  SELECT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |  ) WHERE tok <> ''
      |)""".stripMargin

  private val vocabCte =
    """vocab AS (
      |  SELECT tok, ROW_NUMBER() OVER (ORDER BY tok) - 1 AS word_id
      |  FROM (SELECT DISTINCT tok FROM docs_tokenized)
      |)""".stripMargin

  private val bowCte =
    """bow AS (
      |  SELECT doc_id, tok, COUNT(*) AS c FROM docs_tokenized GROUP BY doc_id, tok
      |)""".stripMargin

  private val langTok =
    """lang_tokens AS (
      |  SELECT lang, tok FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
      |  ) WHERE tok <> ''
      |)""".stripMargin

  private def langVocab(name: String, lang: String) =
    s"""$name AS (
       |  SELECT DISTINCT tok FROM (
       |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents WHERE lang = '$lang'
       |  ) WHERE tok <> ''
       |)""".stripMargin

  private def srcVocab(name: String, src: String) =
    s"""$name AS (
       |  SELECT DISTINCT tok FROM (
       |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents WHERE source = '$src'
       |  ) WHERE tok <> ''
       |)""".stripMargin

  val entries: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT doc_id, lang, source FROM documents ORDER BY doc_id",

    "q02_filter" ->
      "SELECT doc_id, n_chars FROM documents WHERE lang = 'es' AND n_chars > 200 ORDER BY doc_id",

    "q03_tokenize" ->
      s"WITH $docsTok SELECT doc_id, tok FROM docs_tokenized ORDER BY doc_id, tok",

    "q04_vocab" ->
      s"WITH $docsTok, $vocabCte SELECT tok, word_id FROM vocab ORDER BY tok",

    "q05_wordcount" ->
      s"WITH $docsTok SELECT tok, COUNT(*) AS c FROM docs_tokenized GROUP BY tok ORDER BY tok",

    "q06_bow" ->
      s"WITH $docsTok, $bowCte SELECT doc_id, tok, c FROM bow ORDER BY doc_id, tok",

    "q07_dict_join" ->
      s"""WITH $docsTok, $vocabCte, $bowCte
         |SELECT b.doc_id, v.word_id, b.c FROM bow b JOIN vocab v ON b.tok = v.tok
         |ORDER BY b.doc_id, v.word_id""".stripMargin,

    "q08_anti_join" ->
      s"""WITH ${langVocab("zh_toks", "zh")}, ${langVocab("es_toks", "es")}
         |SELECT tok FROM zh_toks z
         |WHERE NOT EXISTS (SELECT 1 FROM es_toks e WHERE e.tok = z.tok)
         |ORDER BY tok""".stripMargin,

    "q09_semi_join" ->
      s"""WITH $docsTok, ${langVocab("vocab_es", "es")}
         |SELECT doc_id, tok FROM docs_tokenized t
         |WHERE EXISTS (SELECT 1 FROM vocab_es v WHERE v.tok = t.tok)
         |ORDER BY doc_id, tok""".stripMargin,

    "q10_broadcast_join" ->
      s"""WITH $docsTok, $vocabCte, $bowCte
         |SELECT b.doc_id, v.word_id, b.c FROM bow b JOIN vocab v ON b.tok = v.tok
         |ORDER BY b.doc_id, v.word_id""".stripMargin,

    "q11_topk_window" ->
      s"""WITH $langTok,
         |counts AS (SELECT lang, tok, COUNT(*) AS c FROM lang_tokens GROUP BY lang, tok),
         |ranked AS (SELECT lang, tok, c,
         |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok ASC) AS r FROM counts)
         |SELECT lang, tok, c FROM ranked WHERE r <= 5
         |ORDER BY lang, c DESC, tok""".stripMargin,

    "q12_global_agg" ->
      s"WITH $docsTok SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab_size FROM docs_tokenized",

    // CAST to BIGINT: DuckDB SUM(int) yields HUGEINT, which pandas (the
    // driver's compare layer) widens to float64 → "5.0000" vs Spark's "5"
    "q13_pivot" ->
      s"""WITH $langTok
         |SELECT tok,
         |  CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
         |  CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh,
         |  CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de
         |FROM lang_tokens GROUP BY tok ORDER BY tok""".stripMargin,

    "q14_union_distinct" ->
      s"""WITH ${srcVocab("toks_src0", "src0")}, ${srcVocab("toks_src1", "src1")}
         |SELECT tok FROM (SELECT tok FROM toks_src0 UNION SELECT tok FROM toks_src1)
         |ORDER BY tok""".stripMargin,

    "q15_sort_limit" ->
      "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 20",

    "q16_string_fns" ->
      """SELECT doc_id, LOWER(source) AS src, LENGTH(text) AS len,
        |SUBSTRING(lang, 1, 1) AS l1 FROM documents ORDER BY doc_id""".stripMargin,

    "q17_time_agg" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS c,
        |ROUND(SUM(value), 4) AS s FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q18_window_frame" ->
      """SELECT event_id, ROUND(SUM(value) OVER (
        |ORDER BY event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS s
        |FROM events ORDER BY event_id""".stripMargin,

    "q19_json" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k FROM events ORDER BY event_id",

    "q20_multijoin_revenue" ->
      """SELECT n.n_name,
        |  ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
        |    / 10000.0, 4) AS rev
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q21_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS c, ROUND(SUM(l_quantity), 4) AS q
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q22_intersect" ->
      """SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,

    "q22_except" ->
      """SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,

    "q23_cosine_topk" ->
      """WITH a AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id <> 0)
        |SELECT b.vec_id, ROUND(list_dot_product(b.e, a.qe) /
        |  (sqrt(list_dot_product(a.qe, a.qe)) * sqrt(list_dot_product(b.e, b.e))), 4) AS cos
        |FROM b, a ORDER BY cos DESC, b.vec_id LIMIT 10""".stripMargin,

    "q24_dedup_exact" ->
      """SELECT md5(text) AS h, COUNT(*) AS c FROM documents
        |GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY h""".stripMargin,

    // the sharded trainer conserves per-word totals through every topic
    // flip, so its word totals must equal plain corpus word frequencies —
    // a deterministic oracle over a stochastic training path
    "lda_sharded_word_totals" ->
      s"WITH $docsTok SELECT tok, COUNT(*) AS total FROM docs_tokenized GROUP BY tok ORDER BY tok",

    "q25_scan_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |ROUND(SUM(l_quantity), 4) AS sum_qty,
        |ROUND(SUM(l_extendedprice), 4) AS sum_price,
        |ROUND(AVG(l_discount), 4) AS avg_disc,
        |COUNT(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // V1 first-seen vocabulary: id = rank of (first doc, first position)
    "q26_vocab_first_seen" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents
        |),
        |dt AS (
        |  SELECT doc_id, i - 1 AS pos, ts[CAST(i AS INT)] AS tok
        |  FROM toks, unnest(range(1, len(ts) + 1)) AS u(i)
        |),
        |f1 AS (SELECT tok, MIN(doc_id) AS d0 FROM dt GROUP BY tok),
        |f2 AS (
        |  SELECT dt.tok, f1.d0, MIN(dt.pos) AS p0
        |  FROM dt JOIN f1 ON dt.tok = f1.tok AND dt.doc_id = f1.d0
        |  GROUP BY 1, 2
        |)
        |SELECT tok, ROW_NUMBER() OVER (ORDER BY d0, p0) - 1 AS word_id
        |FROM f2 ORDER BY word_id""".stripMargin,

    "q27_full_outer" ->
      """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        |FROM (SELECT * FROM customer WHERE c_nationkey < 10) c
        |FULL OUTER JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey
        |ORDER BY c.c_custkey NULLS FIRST""".stripMargin,

    "q28_exists_subquery" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin,

    "q29_scalar_subquery" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 4) AS price FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q30_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
        |  ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0, 4) AS p
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q44_union_by_name" ->
      """SELECT k, ROUND(bal, 4) AS bal FROM (
        |  SELECT c_custkey AS k, c_acctbal AS bal FROM customer WHERE c_nationkey < 5
        |  UNION ALL BY NAME
        |  SELECT c_acctbal AS bal, c_custkey AS k FROM customer WHERE c_nationkey >= 20
        |) ORDER BY k""".stripMargin,

    "q45_string_fns2" ->
      """SELECT doc_id,
        |  lpad(lang, 5, '_') AS padded,
        |  translate(source, 'src', 'SRC') AS xlated,
        |  string_split(text, ' ')[1] AS first_tok,
        |  repeat(lang, 2) AS twice
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q43_range_frame" ->
      """SELECT event_id, user_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW), 4) AS s
        |FROM events ORDER BY event_id""".stripMargin,

    "q42_pivot_api" ->
      """SELECT user_id,
        |  ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 4) AS view,
        |  ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
        |  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q37_except_all" ->
      """SELECT l_orderkey FROM lineitem
        |EXCEPT ALL SELECT o_orderkey FROM orders
        |ORDER BY l_orderkey""".stripMargin,

    "q38_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS gf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS gs,
        |  COUNT(*) AS c
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q39_rank_family" ->
      """SELECT event_id, user_id,
        |  CAST(RANK() OVER w AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        |  ROUND(PERCENT_RANK() OVER w, 4) AS prnk,
        |  ROUND(CUME_DIST() OVER w, 4) AS cdist
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,

    "q40_datetime" ->
      """SELECT event_id,
        |  CAST(EXTRACT(year FROM ts) AS INT) AS y,
        |  CAST(EXTRACT(month FROM ts) AS INT) AS m,
        |  CAST(EXTRACT(day FROM ts) AS INT) AS dom,
        |  CAST(EXTRACT(hour FROM ts) AS INT) AS h,
        |  CAST(ts AS DATE) + 7 AS d7,
        |  CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS dd
        |FROM events ORDER BY event_id""".stripMargin,

    "q41_conditional" ->
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS st,
        |  ROUND(LEAST(o_totalprice, 150000.0), 4) AS capped,
        |  ROUND(GREATEST(o_totalprice - 100000.0, 0.0), 4) AS over,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 2
        |       WHEN o_orderpriority = '2-HIGH' THEN 1
        |       ELSE 0 END AS prio
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q32_window_nav" ->
      """SELECT event_id, user_id,
        |  ROUND(LAG(value) OVER w, 4) AS prev_v,
        |  ROUND(LEAD(value) OVER w, 4) AS next_v,
        |  ROUND(FIRST_VALUE(value) OVER w, 4) AS first_v,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin,

    "q33_array_hof" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT vec_id,
        |  ROUND(list_sum(list_transform(e, x -> x * x)), 4) AS sumsq,
        |  CAST(len(list_filter(e, x -> x > 0)) AS INT) AS n_pos,
        |  ROUND(list_max(list_transform(e, x -> abs(x))), 4) AS max_abs
        |FROM e ORDER BY vec_id""".stripMargin,

    "q34_regexp" ->
      """SELECT doc_id,
        |  regexp_extract(text, 'qu[a-z]+') AS first_qu,
        |  CAST(len(regexp_extract_all(text, 'scan')) AS INT) AS n_scan,
        |  CASE WHEN text LIKE '%join%' THEN 1 ELSE 0 END AS has_join
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q35_string_agg" ->
      s"""WITH $langTok
         |SELECT lang, string_agg(DISTINCT tok, ' ' ORDER BY tok) AS toks
         |FROM lang_tokens GROUP BY lang ORDER BY lang""".stripMargin,

    "q36_lateral_topk" ->
      """SELECT n.n_name, c.c_name, ROUND(c.c_acctbal, 4) AS bal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n_name, bal DESC, c_name""".stripMargin,

    "q31_filtered_agg" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  ROUND(AVG(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4) AS avg_urgent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
