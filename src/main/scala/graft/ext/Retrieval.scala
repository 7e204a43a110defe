package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-side operators over the corpus: the inverted index a search
  * stack builds from cleaned training data, and hybrid lexical+vector
  * rank fusion (the RAG retrieval pattern: BM25 candidates ∪ embedding
  * candidates → reciprocal-rank fusion).
  *
  * Scale shapes: the index build is ONE (tok, segment) shuffle with
  * in-row delta encoding — segment sharding bounds every posting list by
  * the segment's doc count (the Lucene-segment scheme), so a stopword's
  * postings never concentrate in one task. Fusion ranks only constant-size
  * top-N candidate lists (TakeOrdered — distributed — produces them), so
  * its ranking windows run over N rows by construction, never the corpus.
  */
object Retrieval {

  /** Segment-sharded inverted index with delta-encoded postings.
    *
    * documents(doc_id, text) → one row per (tok, segment):
    * `df` = in-segment document frequency, `gaps` = delta-encoded sorted
    * doc ids (first entry is the doc id itself, later entries the gap to
    * the previous id — the classic posting compression layout), `tfs` =
    * per-posting term frequency, aligned with `gaps`.
    *
    * `segmentDocs` fixes the segment width (doc_id div segmentDocs).
    * Postings sort and delta-encode IN ROW (sort_array + transform on the
    * grouped list): the only exchange is the (tok, segment) groupBy, and
    * each list is ≤ the segment's doc count regardless of how common the
    * token is — the property that lets a 100 TB corpus index in bounded
    * task memory. */
  def invertedIndex(docs: DataFrame, segmentDocs: Long = 256L): DataFrame = {
    val occ = Dedup.spreadForCompute(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"), expr(s"doc_id DIV $segmentDocs").as("segment"),
        col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    occ.groupBy("tok", "segment")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ps"))
      .select(col("tok"), col("segment"),
        size(col("ps")).as("df"),
        transform(col("ps"), (p, i) =>
          p.getField("doc_id") - when(i === 0, lit(0L))
            .otherwise(element_at(col("ps"), i).getField("doc_id"))).as("gaps"),
        col("ps.tf").as("tfs"))
  }

  /** The index flattened to scalar rows (tok, segment, df, pos, gap, tf) —
    * the oracle-comparable dump of [[invertedIndex]] (array columns can't
    * ride the hash compare). `pos` is the 0-based position in the posting
    * list. */
  def invertedIndexFlat(docs: DataFrame, segmentDocs: Long = 256L): DataFrame =
    invertedIndex(docs, segmentDocs)
      .select(col("tok"), col("segment"), col("df"),
        posexplode(arrays_zip(col("gaps"), col("tfs"))).as(Seq("pos", "z")))
      .select(col("tok"), col("segment"), col("df"), col("pos"),
        col("z.gaps").as("gap"), col("z.tfs").as("tf"))

  /** Per-document token counts — the doc-length sidecar a real index
    * stores next to its postings (norms file). One count shuffle. */
  def docLengths(docs: DataFrame): DataFrame =
    Dedup.spreadForCompute(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** BM25 served FROM the inverted index + doc-length sidecar instead of
    * a corpus scan — the query-time path that makes [[invertedIndex]] an
    * index rather than a report. Produces bit-identical scores to
    * [[TextAnalysis.bm25]] (same [[TextAnalysis.bm25ScoreExpr]], df from
    * summing per-segment dfs, N/Σdl from the sidecar), which is exactly
    * what its oracle asserts.
    *
    * Scale shape: the term filter prunes the index to the query terms'
    * posting rows BEFORE anything moves (at 100 TB: an index lookup, not
    * a scan); gap-decode runs in-row; the only shuffles are the per-doc
    * tf pivot of those postings and the sidecar join on doc_id. */
  def bm25FromIndex(index: DataFrame, lengths: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.toSet.size == terms.size, "terms must be distinct")
    val pt = index.where(col("tok").isin(terms: _*))
    // decode absolute doc ids from the delta-encoded gaps, in-row
    val ids = aggregate(col("gaps"),
      struct(lit(0L).as("s"), array().cast("array<bigint>").as("ids")),
      (acc, g) => struct((acc.getField("s") + g).as("s"),
        concat(acc.getField("ids"), array(acc.getField("s") + g)).as("ids")),
      acc => acc.getField("ids"))
    val posts = pt.select(col("tok"),
        explode(zip_with(ids, col("tfs"),
          (id, tf) => struct(id.as("doc_id"), tf.as("tf")))).as("p"))
      .select(col("tok"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("tok") === t, col("tf")).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = posts.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
    // per-term df = Σ of in-segment dfs; N and Σdl from the sidecar
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("tok") === t, col("df")).otherwise(0L)).as(s"df$i")
    }
    val dfs = pt.agg(dfCols.head, dfCols.tail: _*)
    val stats = lengths.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    perDoc.join(lengths, "doc_id")
      .crossJoin(broadcast(stats.crossJoin(dfs)))
      .select(col("doc_id"),
        round(TextAnalysis.bm25ScoreExpr(terms, k1, b), 4).as("bm25"))
  }

  /** Query-likelihood retrieval scoring with Dirichlet smoothing (Zhai
    * & Lafferty 2001) — the language-modeling alternative to BM25:
    * score(d) = Σ_t ln((tf + μ·p(t|C)) / (dl + μ)) with the collection
    * model p(t|C) = ctf/|C|. Multiplying through by |C| makes every ln
    * argument an EXACT integer — term = ln(tf·|C| + μ·ctf) −
    * ln(|C|·(dl+μ)) — and the per-term contributions sum in fixed
    * left-to-right term order, so the score is engine-identical.
    * Missing query terms contribute their smoothed mass automatically
    * (tf = 0 keeps the first ln finite via μ·ctf).
    *
    * Scale shape: one tokenize scan → per-doc tf pivot + one broadcast
    * scalar row (|C|, ctf per term) — the [[TextAnalysis.bm25]] plan
    * with ctf totals instead of dfs; only docs matching ≥1 term are
    * emitted. */
  def queryLikelihood(docs: DataFrame, terms: Seq[String],
      mu: Long = 2000L): DataFrame = {
    require(terms.nonEmpty && terms.toSet.size == terms.size,
      "terms must be distinct")
    require(mu > 0L, "mu must be positive")
    val toks = Dedup.spreadForCompute(docs)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      count(when(col("tok") === t, 1)).as(s"tf$i")
    }
    val perDoc = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val ctfCols = terms.zipWithIndex.map { case (t, i) =>
      count(when(col("tok") === t, 1)).as(s"ctf$i")
    }
    val stats = toks.agg(count(lit(1)).as("cl"), ctfCols: _*)
    val score = terms.indices.map { i =>
      log((col(s"tf$i") * col("cl") + lit(mu) * col(s"ctf$i")).cast("double"))
    }.reduceLeft[Column](_ + _) -
      lit(terms.size.toDouble) *
        log((col("cl") * (col("dl") + lit(mu))).cast("double"))
    perDoc.crossJoin(broadcast(stats))
      .where(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col("doc_id"), round(score, 4).as("qld"))
  }

  /** Reciprocal-rank fusion of a lexical (BM25) and a vector (cosine)
    * ranking — hybrid retrieval's standard combiner (Cormack et al. 2009:
    * score = Σ 1/(rrfK + rank)).
    *
    * Both input rankings carry ROUND(·,4) scores that are themselves
    * oracle-verified identical across engines (ext_bm25, Q23's cosine), so
    * ranking on (rounded score desc, id asc) is deterministic and
    * cross-engine stable — no raw-double rank flip can occur. The fused
    * score is a fixed-order sum of two exact rationals 1/(k+r), identical
    * bits in both engines.
    *
    * Scale shape: each side reduces to its top-`n` via orderBy+limit
    * (TakeOrdered: per-partition heaps + driver merge of n·P rows), and
    * only those ≤n-row lists see a ranking window. The fusion join is a
    * broadcast of two n-row sides. Output: top `k` of
    * (doc_id, lex_rank, vec_rank, rrf) by fused score. */
  def rrfFusion(lexical: DataFrame, vector: DataFrame, n: Int = 50, k: Int = 20,
      rrfK: Int = 60): DataFrame = {
    def topRanked(df: DataFrame, score: String, id: String, rank: String) = {
      val top = df.orderBy(col(score).desc, col(id)).limit(n)
      // window over ≤n rows (constant by construction) — see scaladoc
      top.select(col(id).as("doc_id"),
        row_number().over(Window.orderBy(col(score).desc, col(id))).as(rank))
    }
    val lex = topRanked(lexical, "bm25", "doc_id", "lex_rank")
    val vec = topRanked(vector, "cos", "vec_id", "vec_rank")
    val fused = lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0))).as("rrf"))
    fused.orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        round(col("rrf"), 4).as("rrf"))
  }

  /** The fixture-shaped hybrid query: BM25 over the probe terms fused
    * with cosine ranking against query vector `queryId` (self-match
    * excluded on the vector side; doc ids and vec ids coincide in the
    * fixtures). */
  def hybridSearch(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
      queryId: Long = 0L, n: Int = 50, k: Int = 20): DataFrame = {
    val lex = TextAnalysis.bm25(docs, terms)
    val e = Dedup.spreadForCompute(
        embeddings.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("e")))
      .withColumn("n", Similarity.norm(col("e")))
    val q = e.where(col("vec_id") === queryId)
      .select(col("e").as("qe"), col("n").as("qn"))
    val vec = e.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(Similarity.dot(col("e"), col("qe")) / (col("n") * col("qn")), 4).as("cos"))
    rrfFusion(lex, vec, n, k)
  }

  /** Exact-phrase search served from a POSITIONAL posting list — the
    * index structure behind quoted-phrase queries (and n-gram
    * decontamination lookups): postings carry (doc, position), and an
    * m-token phrase resolves as m−1 equi-joins on (doc, pos+offset) —
    * never a substring scan over the corpus. Each join is keyed on the
    * token's postings (pruned to the phrase's terms first, so the work is
    * proportional to the RAREST term's posting list, not the corpus).
    * Positions are 1-based. Returns (doc_id, pos) of every occurrence.
    *
    * At 100 TB the postings table is the persisted nightly artifact
    * ([[invertedIndex]] with positions); this builds it inline because
    * the fixture query is self-contained. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val dt = docs
      .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))).as(Seq("i", "tok")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"), col("tok"))
    val first = dt.where(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, off)) =>
      val nxt = dt.where(col("tok") === w)
        .select(col("doc_id"), (col("pos") - off).as("pos"))
      acc.join(nxt, Seq("doc_id", "pos"), "left_semi")
    }
  }

  /** Sparse tf-idf "MORE LIKE THIS" through the postings — the sparse
    * twin of the dense-embedding top-k: score every doc against ONE
    * probe document's tf-idf vector by joining the probe's (V-bounded,
    * broadcast) term weights onto the postings, so the work is
    * Σ_{t ∈ query} df(t) — the query terms' posting lists, never an
    * all-pairs or full-matrix pass. Norms are full-vector, so scores
    * are true cosines. Ranking happens on the boundary-stabilized
    * ROUND(cos, 4) with doc-id tie-breaks (the keywords rationale: a
    * rank must not hinge on which libm rounded last). One (doc, tok)
    * shuffle + one broadcast join + one doc-keyed aggregate. */
  def sparseMoreLikeThis(docs: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val w = TextAnalysis.tfIdf(docs)
    val wq = w.where(col("doc_id") === queryId)
      .select(col("tok"), col("tfidf").as("qw"))
    val norms = w.groupBy("doc_id")
      .agg(sqrt(sum(col("tfidf") * col("tfidf"))).as("nrm"))
    val qn = norms.where(col("doc_id") === queryId).select(col("nrm").as("qn"))
    w.where(col("doc_id") =!= queryId)
      .join(broadcast(wq), "tok")
      .groupBy("doc_id").agg(sum(col("tfidf") * col("qw")).as("dot"))
      .join(norms, "doc_id")
      .crossJoin(broadcast(qn))
      .select(col("doc_id"),
        graft.functions.StableRound.col4(col("dot") / (col("nrm") * col("qn")))
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(k)
  }

  /** Rank-biased overlap (Webber et al. 2010) between two top-`depth`
    * rankings — the IR-standard answer to "how much do these two
    * retrieval systems agree", weighting agreement at the TOP of the
    * lists geometrically (persistence `p`): RBO@D = Σ_{d≤D}
    * (1−p)·p^{d−1}·|A_d ∩ B_d|/d. Overlap counts are exact integers
    * over the two ≤D-row rank lists (everything after the two top-k
    * cuts is constant-size work); the geometric weights are the one
    * float path, folded in depth order under StableRound. Inputs are
    * scored frames as [[rrfFusion]] takes them. */
  def rboEval(lexical: DataFrame, vector: DataFrame, depth: Int = 10,
      p: Double = 0.9): DataFrame = {
    def top(df: DataFrame, score: String, id: String, rank: String) = {
      val t = df.orderBy(col(score).desc, col(id)).limit(depth)
      t.select(col(id).as("doc_id"),
        row_number().over(Window.orderBy(col(score).desc, col(id))).as(rank))
    }
    val j = top(lexical, "bm25", "doc_id", "ra")
      .join(top(vector, "cos", "vec_id", "rb"), Seq("doc_id"), "full_outer")
    val spark = lexical.sparkSession
    val grid = spark.range(1, depth + 1).toDF("d")
    val xd = grid.crossJoin(broadcast(j))
      .where(col("ra") <= col("d") && col("rb") <= col("d"))
      .groupBy("d").agg(count(lit(1)).as("overlap"))
    val full = grid.join(xd, Seq("d"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("term", lit(1 - p) * pow(lit(p), col("d") - 1)
        * col("overlap").cast("double") / col("d").cast("double"))
    val rbo = full.agg(
      aggregate(sort_array(collect_list(struct(col("d"), col("term")))),
        lit(0.0), (a, x) => a + x.getField("term")).as("rbo"))
    full.crossJoin(broadcast(rbo))
      .select(col("d"), col("overlap"),
        graft.functions.StableRound.col4(col("term")).as("term"),
        graft.functions.StableRound.col4(col("rbo")).as("rbo"))
      .orderBy("d")
  }

  /** Ranking-quality metrics — NDCG@depth, MRR@depth, AP@depth — of a
    * scored ranking against graded pseudo-relevance labels (rel = how
    * many distinct query terms the doc contains, 0..|terms|; "relevant"
    * for the binary metrics means rel ≥ relThreshold). The offline eval
    * a retrieval stack runs after every scorer change.
    *
    * Determinism: ranks come from the ROUNDED score with doc-id
    * tie-breaks (the verified [[rboEval]]/bm25 ordering); every
    * precision/recall ratio is a ratio of exact integers; the only
    * transcendental is log2(r+1) of small integer ranks, written as
    * ln(r+1)/ln 2 in BOTH engines and folded in rank order. The ideal
    * DCG comes from the corpus-wide relevance-level counts (a ≤(L+1)-row
    * table joined to the depth positions), never a global sort of docs.
    *
    * Scale shape: one orderBy().limit(depth) (TakeOrdered — no global
    * sort materialized), one broadcast join of the depth rows against
    * per-doc labels, and a relevance-level rollup; everything after the
    * top-k is O(depth·levels). Output (one row): n_rel, dcg, idcg,
    * ndcg, mrr, ap. */
  def rankingEval(scored: DataFrame, docs: DataFrame, terms: Seq[String],
      depth: Int = 10, relThreshold: Int = 2): DataFrame = {
    val spark = scored.sparkSession
    val toks = docs.select(col("doc_id"),
      filter(split(col("text"), " "), t => t =!= "").as("ts"))
      .where(size(col("ts")) > 0)
    val rel = toks.select(col("doc_id"),
      terms.map(t => when(array_contains(col("ts"), lit(t)), 1).otherwise(0))
        .reduce(_ + _).cast("long").as("rel"))
    // top-depth by (rounded score, doc_id); the window ranks ≤depth rows
    val top = scored.orderBy(col("bm25").desc, col("doc_id")).limit(depth)
      .select(row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
        .as("r"), col("doc_id"))
      .join(rel, "doc_id")
    val log2 = log(lit(2.0))
    def gain(relCol: Column, rankCol: Column): Column =
      (pow(lit(2.0), relCol) - 1.0) / (log(rankCol.cast("double") + 1.0) / log2)
    // DCG + the binary-relevance metrics, all folded in rank order
    val hits = top.withColumn("isrel",
        when(col("rel") >= relThreshold, 1L).otherwise(0L))
      .withColumn("cumrel", sum("isrel")
        .over(Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)))
    val dcg = hits.agg(
      aggregate(sort_array(collect_list(struct(col("r"), gain(col("rel"), col("r")).as("g")))),
        lit(0.0), (a, x) => a + x.getField("g")).as("dcg"),
      min(when(col("isrel") === 1L, col("r"))).as("first_rel"),
      aggregate(sort_array(collect_list(struct(col("r"),
          when(col("isrel") === 1L,
            col("cumrel").cast("double") / col("r").cast("double"))
            .otherwise(lit(0.0)).as("p")))),
        lit(0.0), (a, x) => a + x.getField("p")).as("ap_num"))
    // ideal DCG from corpus-wide relevance-level counts: position p's
    // ideal grade = max level with ≥p docs at-or-above it
    val lv = rel.groupBy("rel").agg(count(lit(1)).as("c"))
    val cum = lv.select(col("rel"), col("c"),
      sum("c").over(Window.orderBy(col("rel").desc)
        .rowsBetween(Window.unboundedPreceding, 0)).as("cum_ge"))
    val pos = spark.range(1, depth + 1).toDF("p")
    val ideal = pos.join(broadcast(cum.where(col("rel") > 0)),
        col("cum_ge") >= col("p"), "left")
      .groupBy("p").agg(coalesce(max("rel"), lit(0L)).as("irel"))
    val idcg = ideal.agg(
      aggregate(sort_array(collect_list(struct(col("p"), gain(col("irel"), col("p")).as("g")))),
        lit(0.0), (a, x) => a + x.getField("g")).as("idcg"))
    val rtot = rel.agg(sum(when(col("rel") >= relThreshold, 1L).otherwise(0L))
      .as("n_rel"))
    dcg.crossJoin(broadcast(idcg)).crossJoin(broadcast(rtot))
      .select(col("n_rel"),
        graft.functions.StableRound.col4(col("dcg")).as("dcg"),
        graft.functions.StableRound.col4(col("idcg")).as("idcg"),
        // degenerate probe sets (no relevant docs anywhere → idcg/n_rel
        // = 0) score 0, not NaN — same convention as the mrr coalesce
        when(col("idcg") > 0.0,
          graft.functions.StableRound.col4(col("dcg") / col("idcg")))
          .otherwise(lit(0.0)).as("ndcg"),
        round(coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0)), 4)
          .as("mrr"),
        when(col("n_rel") > 0L,
          round(col("ap_num") / least(col("n_rel"), lit(depth.toLong)).cast("double"), 4))
          .otherwise(lit(0.0)).as("ap"))
  }

  /** Expected Reciprocal Rank @depth (Chapelle et al. 2009) of the BM25
    * ranking against the [[rankingEval]] graded term-overlap labels —
    * the cascade-model metric (user scans down, stops with probability
    * R_r = (2^rel − 1)/2^gmax): ERR = Σ_r (R_r/r)·Π_{i<r}(1 − R_i).
    * The product makes it inherently SEQUENTIAL, so it folds in-row
    * over the rank-ordered top list with a (err, p-continue) accumulator
    * — the Holt recurrence trick; ranks come from the verified rounded
    * score, R_r from exact small-integer powers of 2, so the double
    * sequence is engine-identical. Same TakeOrdered scale shape as
    * [[rankingEval]]. */
  def errEval(scored: DataFrame, docs: DataFrame, terms: Seq[String],
      depth: Int = 10): DataFrame = {
    val gmax = math.pow(2.0, terms.size).toLong
    val toks = docs.select(col("doc_id"),
      filter(split(col("text"), " "), t => t =!= "").as("ts"))
      .where(size(col("ts")) > 0)
    val rel = toks.select(col("doc_id"),
      terms.map(t => when(array_contains(col("ts"), lit(t)), 1).otherwise(0))
        .reduce(_ + _).cast("long").as("rel"))
    val top = scored.orderBy(col("bm25").desc, col("doc_id")).limit(depth)
      .select(row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
        .as("r"), col("doc_id"))
      .join(rel, "doc_id")
      .withColumn("rr",
        (pow(lit(2.0), col("rel")) - 1.0) / lit(gmax.toDouble))
    top.agg(count(lit(1)).as("n"),
        aggregate(sort_array(collect_list(struct(col("r"), col("rr")))),
          struct(lit(0.0).as("err"), lit(1.0).as("p")),
          (acc, x) => struct(
            (acc.getField("err") + acc.getField("p") * x.getField("rr")
              / x.getField("r")).as("err"),
            (acc.getField("p") * (lit(1.0) - x.getField("rr"))).as("p")),
          acc => acc.getField("err")).as("e"))
      .select(col("n"), lit(depth).as("depth"), round(col("e"), 4).as("err"))
  }

  /** The battery-shaped phrase query: find the corpus's most frequent
    * bigram (count desc, then lexicographic — a total order), then
    * locate every occurrence through the positional index. Output:
    * (doc_id, pos, phrase). */
  def topBigramOccurrences(docs: DataFrame): DataFrame = {
    val top = Dedup.explodedShingles(docs, 2)
      .groupBy("sh").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("sh")).limit(1)
      .select(col("sh").as("phrase"))
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = top.as[String].collect().headOption.getOrElse("")
    val ws = ph.split(" ").toSeq
    phraseSearch(docs, ws)
      .select(col("doc_id"), col("pos"), lit(ph).as("phrase"))
      .orderBy("doc_id", "pos")
  }
}
