package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 retrieval/selection operators: inverted index, RRF fusion,
  * domain KL, OOV rate, PQ-ADC top-k. The oracle entries check the
  * fixture outputs against DuckDB; these specs check the semantic
  * invariants on hand-built inputs. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // ---- inverted index ----

  test("invertedIndex: gaps reconstruct the sorted posting list, df and tf exact") {
    val d = docs(
      0L -> "a b a",
      1L -> "b c",
      5L -> "a a a",
      300L -> "a b")
    val flat = Retrieval.invertedIndexFlat(d, segmentDocs = 256L)
      .orderBy("tok", "segment", "pos")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))
    // token a: segment 0 postings [0(tf2), 5(tf3)] → gaps [0, 5]; segment 1 posting [300]
    val a0 = flat.filter(t => t._1 == "a" && t._2 == 0L)
    assert(a0.map(t => (t._4, t._5, t._6)).toSeq == Seq((0, 0L, 2L), (1, 5L, 3L)))
    assert(a0.forall(_._3 == 2)) // df = 2 in segment 0
    val a1 = flat.filter(t => t._1 == "a" && t._2 == 1L)
    assert(a1.map(t => (t._4, t._5, t._6)).toSeq == Seq((0, 300L, 1L)))
    // reconstruct doc ids from gaps for every (tok, segment): prefix sums
    flat.groupBy(t => (t._1, t._2)).foreach { case ((_, _), ps) =>
      val ordered = ps.sortBy(_._4)
      val ids = ordered.scanLeft(0L)((acc, t) => acc + t._5).tail.toSeq
      assert(ids == ids.sorted && ids.distinct == ids, "gaps must encode a strictly sorted id list")
      assert(ordered.head._3 == ordered.length, "df = posting count")
    }
  }

  test("invertedIndex: partition-invariant and covers every (doc, tok) pair") {
    val d = docs((0L until 40L).map(i => i -> s"t${i % 7} t${i % 3} common"): _*)
    val a = Retrieval.invertedIndexFlat(d, 16L).orderBy("tok", "segment", "pos").collect()
    val b = Retrieval.invertedIndexFlat(d.repartition(7), 16L)
      .orderBy("tok", "segment", "pos").collect()
    assert(a.toSeq == b.toSeq)
    val nPairs = d.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .distinct().count()
    assert(a.length.toLong == nPairs)
  }

  test("bm25FromIndex reproduces the corpus-scan BM25 bit-for-bit") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val terms = Seq("join", "hash", "scan")
    val scan = TextAnalysis.bm25(d, terms).orderBy("doc_id").collect().toSeq
    val idx = Retrieval.bm25FromIndex(
      Retrieval.invertedIndex(d, 64L), Retrieval.docLengths(d), terms)
      .orderBy("doc_id").collect().toSeq
    assert(idx == scan)
    assert(scan.nonEmpty)
  }

  // ---- RRF fusion ----

  test("rrfFusion: hand-computed fused scores, full-outer semantics") {
    // lexical ranks: d1=1, d2=2 ; vector ranks: d2=1, d3=2
    val lex = Seq((1L, 9.0), (2L, 5.0)).toDF("doc_id", "bm25")
    val vec = Seq((2L, 0.9), (3L, 0.8)).toDF("vec_id", "cos")
    val got = Retrieval.rrfFusion(lex, vec, n = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    def rrf(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble // = Spark round()
    assert(got(2L) == rrf(2, 1)) // in both lists
    assert(got(1L) == rrf(1))
    assert(got(3L) == rrf(2))
    assert(got(2L) > got(1L) && got(1L) > got(3L))
  }

  test("rrfFusion: candidate cut respects n before fusing") {
    val lex = (1L to 5L).map(i => (i, 10.0 - i)).toDF("doc_id", "bm25")
    val vec = Seq.empty[(Long, Double)].toDF("vec_id", "cos")
    val got = Retrieval.rrfFusion(lex, vec, n = 3, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L)) // ranks 4,5 never enter the candidate set
  }

  // ---- domain KL ----

  test("domainKl: identical strata diverge ~0; a skewed stratum diverges more") {
    val d = Seq(
      (0L, "a b c d", "s1"), (1L, "a b c d", "s2"),
      (2L, "a b c d", "s1"), (3L, "a b c d", "s2"),
      (4L, "e e e e", "s3"))
      .toDF("doc_id", "text", "source")
    val kl = TextAnalysis.domainKl(d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kl.keySet == Set("s1", "s2", "s3"))
    assert(kl("s1") == kl("s2")) // identical token distributions
    assert(kl("s3") > kl("s1"))
    assert(kl.values.forall(_ >= -1e-9), "KL is non-negative")
  }

  test("domainKl: partition-invariant") {
    val d = (0L until 60L).map(i => (i, s"w${i % 11} w${i % 5} x", s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    val a = TextAnalysis.domainKl(d).orderBy("stratum").collect().toSeq
    val b = TextAnalysis.domainKl(d.repartition(13)).orderBy("stratum").collect().toSeq
    assert(a == b)
  }

  // ---- OOV rate ----

  test("oovRate: exact counts against a hand vocab") {
    val d = Seq(
      (0L, "a b x", "s1"),   // 1 oov of 3
      (1L, "x y", "s1"),     // 2 oov of 2
      (2L, "a a", "s2"))     // 0 oov of 2
      .toDF("doc_id", "text", "source")
    val vocab = Seq("a", "b").toDF("tok")
    val got = TextAnalysis.oovRate(d, vocab).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("s1") == ((5L, 3L, 0.6)))
    assert(got("s2") == ((2L, 0L, 0.0)))
  }

  // ---- temperature mixture allocation ----

  test("temperatureAllocation: hand case + exact budget conservation") {
    // counts 1 and 4 at α=0.5 → weights 1:2 → B=10 gives bp 3.33/6.67,
    // bases 3/6, one leftover → larger remainder (s2) takes it
    val d = Seq((0L, "a", "s1"), (1L, "b b b b", "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.temperatureAllocation(d, budget = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("s1" -> ((1L, 3L)), "s2" -> ((4L, 7L))))
  }

  test("temperatureAllocation: sums to the budget on the fixture") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val rows = TextAnalysis.temperatureAllocation(d, budget = 12345L).collect()
    assert(rows.map(_.getLong(2)).sum == 12345L)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  // ---- PQ top-k ----

  test("pqTopK: hand-verifiable ADC scores on a 2-subspace toy set") {
    // dim 4, m 2, k 2, iters 0 → codebooks are exactly vecs 0 and 1's
    // subvectors; ADC ip for each vec = q0·c(code0) + q1·c(code1)
    val e = Seq(
      (0L, Array(1.0f, 0f, 1f, 0f)),   // query
      (1L, Array(0f, 1f, 0f, 1f)),
      (2L, Array(1f, 0f, 0f, 1f)),     // sub0 near vec0, sub1 near vec1
      (3L, Array(0f, 1f, 1f, 0f)))     // sub0 near vec1, sub1 near vec0
      .toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(e, dim = 4, queryId = 0L, m = 2, k = 2, iters = 0, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // codes: vec2 → (c0 of vec0: [1,0], c1 of vec1: [0,1]) → ip = 1·1 + 0 = 1 + 0 = 1?
    // q sub0 = [1,0], q sub1 = [1,0]; table0 = {0: 1.0, 1: 0.0}; table1 = {0: 1.0, 1: 0.0}
    assert(got(2L) == 1.0 + 0.0)
    assert(got(3L) == 0.0 + 1.0)
    assert(got(1L) == 0.0)
  }

  test("ivfPqTopK: probing ALL coarse lists equals plain PQ (same codebooks)") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    val pq = Similarity.pqTopK(e, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivfAll = Similarity.ivfPqTopK(e, nprobe = 8, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll == pq)
  }

  test("ivfPqTopK: deterministic, query-free, candidates from probed lists only") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    val a = Similarity.ivfPqTopK(e).collect().toSeq
    val b = Similarity.ivfPqTopK(e.repartition(9)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(_.getLong(0) != 0L))
    // nprobe=2 of kc=8 lists: a strict subset of the corpus is scored,
    // so results can differ from exhaustive PQ — but never exceed topK
    assert(a.size <= 10)
  }

  test("pqTopK: deterministic, query-free, sorted by approx ip") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    val a = Similarity.pqTopK(e).collect().toSeq
    val b = Similarity.pqTopK(e.repartition(9)).collect().toSeq
    assert(a == b)
    assert(a.forall(_.getLong(0) != 0L))
    val ips = a.map(_.getDouble(1))
    assert(ips == ips.sortBy(-(_: Double)))
  }

  test("phraseSearch finds every occurrence at 1-based positions, adjacency strict") {
    val docs = Seq(
      (1L, "a b c a b"),     // "a b" at pos 1 and 4
      (2L, "b a"),           // reversed: no match
      (3L, "a x b"),         // non-adjacent: no match
      (4L, "a b a b a b")    // overlapping occurrences at 1, 3, 5
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, Seq("a", "b"))
      .as[(Long, Long)].collect().sorted.toList
    assert(got == List((1L, 1L), (1L, 4L), (4L, 1L), (4L, 3L), (4L, 5L)))
    // 3-token phrase chains two position joins
    val tri = Retrieval.phraseSearch(docs, Seq("a", "b", "a"))
      .as[(Long, Long)].collect().sorted.toList
    assert(tri == List((4L, 1L), (4L, 3L)))
  }

  test("sparseMoreLikeThis ranks shared-vocab docs above disjoint ones") {
    val docs = Seq(
      (0L, "alpha beta gamma"),         // the probe
      (1L, "alpha beta gamma"),         // identical -> cos 1.0
      (2L, "alpha beta zeta"),          // partial overlap
      (3L, "epsilon zeta eta"),         // shares only zeta-free terms: no overlap with probe
      (4L, "theta iota kappa")          // disjoint -> absent (no shared posting)
    ).toDF("doc_id", "text")
    val got = Retrieval.sparseMoreLikeThis(docs, queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toList
    assert(got.head._1 == 1L && got.head._2 == 1.0)
    assert(got.map(_._1).contains(2L))
    assert(!got.map(_._1).contains(4L) && !got.map(_._1).contains(3L))
    assert(!got.map(_._1).contains(0L)) // probe excluded
  }

  test("isotropyProbe: orthonormal basis vectors pair to cosine 0, norms 1") {
    // 8 standard-basis vectors in R^8: any stride pairing is orthogonal
    val e = (0L until 8L).map(i =>
      (i, Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.isotropyProbe(e, stride = 3L)
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    assert(r == ((8L, 0.0, 0.0, 0.0, 0.0, 1.0)), r.toString)
    // identical vectors: every pair cosine 1
    val same = (0L until 4L).map(i => (i, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val s = Similarity.isotropyProbe(same, stride = 1L)
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    assert(s._2 == 1.0 && s._4 == 1.0 && s._5 == 1.0)
  }

  test("pplBuckets: tertile ranks are exact and bucket stats are order-free") {
    // 6 docs in one source with strictly increasing NLL -> 2/2/2 split;
    // craft texts whose bigram perplexities separate cleanly: doc text
    // repeated common bigrams score low, rare transitions score high
    val docs = Seq(
      (1L, "x x x x x x", "s"),   // all bigrams "x x" (very common)
      (2L, "x x x x x y", "s"),
      (3L, "x x x y x x", "s"),
      (4L, "x y x y x x", "s"),
      (5L, "y x y y x x", "s"),
      (6L, "y y q r s t", "s")    // rare transitions
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.pplBuckets(docs)
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(got.map(_._3).sum == 6L)
    val byBucket = got.map(r => r._2 -> r._3).toMap
    assert(byBucket == Map("head" -> 2L, "middle" -> 2L, "tail" -> 2L))
    // bucket boundaries respect NLL order: head max <= middle min, etc.
    val m = got.map(r => r._2 -> ((r._4, r._5))).toMap
    assert(m("head")._2 <= m("middle")._1 && m("middle")._2 <= m("tail")._1)
  }

  test("rankingEval matches the hand-computed NDCG/MRR/AP") {
    import spark.implicits._
    // ranking d3(rel1), d1(rel3), d2(rel2); d4 irrelevant, unranked
    // DCG = 1/1 + 7/log2(3) + 3/2 = 6.9165; IDCG = 7 + 3/log2(3) + 1/2
    //     = 9.3928; NDCG = .7364; first rel>=2 at r2 -> MRR .5;
    // AP = (1/2 + 2/3)/2 = .5833
    val docs = Seq((1L, "join hash scan"), (2L, "join hash x"),
      (3L, "join x y"), (4L, "z z z")).toDF("doc_id", "text")
    val scored = Seq((3L, 3.0), (1L, 2.0), (2L, 1.0)).toDF("doc_id", "bm25")
    val got = Retrieval.rankingEval(scored, docs, Seq("join", "hash", "scan"))
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    assert(got == ((2L, 6.9165, 9.3928, 0.7364, 0.5, 0.5833)), got.toString)
  }

  test("rankingEval: a probe set with no relevant docs scores 0, never NaN") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val scored = Seq((1L, 2.0), (2L, 1.0)).toDF("doc_id", "bm25")
    // no doc contains the probe term -> rel = 0 everywhere -> idcg = 0,
    // n_rel = 0: the ratios are guarded to the 0 convention (like mrr)
    val got = Retrieval.rankingEval(scored, docs, Seq("absent"))
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    assert(got == ((0L, 0.0, 0.0, 0.0, 0.0, 0.0)), got.toString)
    assert(!got.productIterator.exists {
      case d: Double => d.isNaN
      case _ => false
    })
  }

  test("errEval: cascade fold matches the hand computation") {
    import spark.implicits._
    val docs = Seq((1L, "a x"), (2L, "y z"), (3L, "a y")).toDF("doc_id", "text")
    val scored = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("doc_id", "bm25")
    val got = Retrieval.errEval(scored, docs, Seq("a"), depth = 3)
      .as[(Long, Int, Double)].head()
    // R = (.5, 0, .5): ERR = .5/1 + .5·0/2 + .5·.5/3 = 0.5833
    assert(got == ((3L, 3, 0.5833)), got.toString)
  }

  test("queryLikelihood: hand-computed Dirichlet scores, smoothing favors tf") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a a")).toDF("doc_id", "text")
    val got = Retrieval.queryLikelihood(docs, Seq("a"), mu = 2L)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    // cl=4, ctf=3: ln(tf·4 + 2·3) − ln(4·(dl+2))
    assert(got == Seq((1L, -0.47), (2L, -0.1335)), got.toString)
  }

}
