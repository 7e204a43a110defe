package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("minhashCandidates surfaces planted near-duplicates, not unrelated docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val nearDup = base.replace("theta", "thetaX") // one token changed
    val unrelated = "one two three four five six seven eight nine ten " * 3
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated))
    val pairs = Dedup.minhashCandidates(d).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("jaccardTopPairs ranks the planted near-dup first with jac close to 1") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val d = docs((1L, base), (2L, base.replace("kappa", "kappaX")),
      (3L, "completely different tokens here nothing shared at all padded words"))
    val top = Dedup.jaccardTopPairs(d, 3).as[(Long, Long, Double)].collect()
    assert(top.head._1 == 1L && top.head._2 == 2L)
    assert(top.head._3 > 0.5)
  }

  test("setSimilarityJoin includes the exact-threshold boundary and excludes below") {
    // doc1/doc2: 5-token texts sharing exactly 2 of 3 shingles → Jaccard
    // 2/(3+3−2) = 0.5, the INCLUSIVE boundary; doc3 shares one shingle
    // with doc1 (1/5 = 0.2, excluded); doc4 disjoint (never a candidate)
    val d = docs(
      (1L, "a b c d e"),
      (2L, "z b c d e"),
      (3L, "a b c x y"),
      (4L, "p q r s t"))
    val got = Dedup.setSimilarityJoin(d, t = 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)), got.toString)
    assert(got.head._3 == 0.5)
  }

  test("containmentJoin is asymmetric, catches nesting, includes the 0.8 boundary") {
    // shingle sets: S1={abc,bcd,cde,def,efg} (n=5); doc2 embeds doc1's
    // text inside a longer page (S2 ⊇ S1, n=11); S3 shares only {abc}
    // with doc1 (0.2, excluded); S4={abc,bcd,cde,def,efq} overlaps S1,
    // S2, and itself-to-S1 by exactly 4/5 = 0.8 — the INCLUSIVE boundary
    val d = docs(
      (1L, "a b c d e f g"),
      (2L, "x y z a b c d e f g h i j"),
      (3L, "a b c q r s t"),
      (4L, "a b c d e f q"))
    val got = Dedup.containmentJoin(d, t = 0.8)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(got == Seq((1L, 2L, 1.0), (1L, 4L, 0.8), (4L, 1L, 0.8), (4L, 2L, 0.8)),
      got.toString)
  }

  test("prioritySample selects exactly the top-k priority keys (plain-Scala replay)") {
    val rows = (0L until 40L).map(i => (i, s"doc number $i body", 0.05 + (i % 7) * 0.14))
    val d = rows.toDF("doc_id", "text", "w")
    val got = TextAnalysis.prioritySample(d, "w", 10)
      .as[(Long, Double)].collect().toSeq
    // replay the exact formula driver-side: u from the first 8 md5 hex
    // chars, key = u^(1/w), top-10 by (key desc, doc_id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = rows.map { case (id, text, w) =>
      val u = (java.lang.Long.parseLong(hex(text).take(8), 16) + 0.5) / 4294967296.0
      (id, math.pow(u, 1.0 / w))
    }.sortBy { case (id, k) => (-k, id) }.take(10)
      .map { case (id, k) => (id, math.rint(k * 10000) / 10000) }
    assert(got == want, s"\ngot  $got\nwant $want")
    // exact size, no replacement
    assert(got.map(_._1).distinct.size == 10)
  }

  test("compressionRatio: repetitive text compresses far below varied text") {
    val rng = new graft.lda.SplitMix64(11L)
    val varied = (0 until 200).map(_ => rng.nextLong().toHexString).mkString(" ")
    val d = docs(
      (1L, "boiler plate " * 200),   // long-range repetition
      (2L, varied),                  // high-entropy
      (3L, ""))                      // empty: defined, not a crash
    def run() = TextAnalysis.compressionRatio(d)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val r = run()
    assert(r == run()) // fixed JDK zlib: deterministic
    val byId = r.map(x => x._1 -> x._4).toMap
    assert(byId(1L) < 0.1, s"repetitive ratio ${byId(1L)}")
    assert(byId(2L) > 0.5, s"varied ratio ${byId(2L)}")
    assert(byId(3L) == 1.0) // 0-byte doc: ratio pinned to 1
  }

  test("canonicalText lowers, zeroes digits, strips ASCII punct, squeezes space") {
    val d = docs((1L, "Ab C1 - d!  [e]  F2g & ~h"))
    val got = TextAnalysis.normalizeText(d).as[(Long, String, Int)].collect().head
    assert(got == ((1L, "ab c0 d e f0g h", 15)), got.toString)
  }

  test("dedupNormalized collapses case/digit/punct variants; raw md5 would not") {
    val d = docs(
      (1L, "Page 3: the quick brown fox"),
      (2L, "page 7 the quick brown fox!"),
      (3L, "a completely different document"))
    val got = TextAnalysis.dedupNormalized(d)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 2L), (3L, 1L)), got.toString)
  }

  test("sourceOverlap computes exact pairwise shingle Jaccard between sources") {
    import org.apache.spark.sql.functions.lit
    // srcA/srcB share their only doc text (Jaccard 1.0); srcC disjoint
    // (pair absent); srcD half-overlaps srcA: sets {abc,bcd,cde} vs
    // {abc,bcd,cdq} → 2/4 = 0.5
    val d = Seq(
      (1L, "a b c d e", "sA"), (2L, "a b c d e", "sB"),
      (3L, "x y z w v", "sC"), (4L, "a b c d q", "sD"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(d)
      .as[(String, String, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(got == Seq(("sA", "sB", 1.0), ("sA", "sD", 0.5), ("sB", "sD", 0.5)),
      got.toString)
  }

  test("sourceOverlapKMV: exact below sketch capacity, close above it") {
    // below capacity (|A ∪ B| ≤ k): X is the whole union, so the
    // estimator degenerates to the exact Jaccard — equality, not a bound
    val small = Seq((1L, "a b c d e f", "sA"), (2L, "a b c d q r", "sB"))
      .toDF("doc_id", "text", "source")
    val ex = Dedup.sourceOverlap(small).as[(String, String, Double)].collect().head
    val km = Dedup.sourceOverlapKMV(small).as[(String, String, Double)].collect().head
    assert(ex == km, s"$ex vs $km")
    // above capacity: two 600-token sources sharing a 300-token block
    // (~600 vs ~300 distinct shingles each side of the union); k=256
    // std err ≈ √(J(1−J)/k) ≈ 0.03 — assert a loose 0.1 band
    def txt(lo: Int, hi: Int) = (lo until hi).map(i => s"w$i").mkString(" ")
    val big = Seq((1L, txt(0, 600), "sA"), (2L, txt(300, 900), "sB"))
      .toDF("doc_id", "text", "source")
    val exB = Dedup.sourceOverlap(big).as[(String, String, Double)].collect().head._3
    val kmB = Dedup.sourceOverlapKMV(big).as[(String, String, Double)].collect().head._3
    assert(math.abs(exB - kmB) < 0.1, s"exact $exB vs kmv $kmB")
  }

  test("simhash of identical docs is identical; near-dup docs are hamming-close") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val d = docs((1L, base), (2L, base), (3L, base.replace("zeta", "zetaX")),
      (4L, "unrelated totally different words everywhere padded out to length " * 5))
    val sims = Dedup.simhashes(d).as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(4L)))
    // near-pairs finds the exact-dup pair at distance 0
    val near = Dedup.simhashNearPairs(Dedup.simhashes(d), maxDist = 3)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(near.contains((1L, 2L)))
  }

  test("stripMarkup removes tags/entities/links/emphasis and normalizes space") {
    val d = docs(
      (1L, "<p>Hello &amp; <b>world</b></p>   see [docs](http://x.y/z) **now**"),
      (2L, "plain  text \t already"),
      (3L, "escaped &amp;lt; stays, real &lt; decodes")) // &amp; decodes LAST
    val got = TextAnalysis.stripMarkup(d)
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got(0)._2 == "Hello & world see docs now")
    assert(got(1)._2 == "plain text already")
    assert(got(2)._2 == "escaped &lt; stays, real < decodes")
    assert(got(0)._3 == got(0)._2.length)
  }

  test("simhashes (codegen'd aggregation) equals the HOF specification form") {
    import org.apache.spark.sql.functions.{col, expr, transform => sqlTransform, md5}
    val d = graft.Tables.documents(spark, sf())
    val spec = d.select(col("doc_id"), graft.ext.Dedup.tokens(col("text")).as("ts"))
      .select(col("doc_id"), sqlTransform(col("ts"), t => md5(t)).as("hs"))
      .select(col("doc_id"), expr(Dedup.simhash60Sql).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val fast = Dedup.simhashes(d).as[(Long, Long)].collect().toMap
    assert(fast == spec)
  }

  test("dupClusters labels each component with its smallest doc id (both paths)") {
    // components: {1,2,9} (chain 1-2, 2-9), {5,7}
    val pairs = Seq((1L, 2L), (2L, 9L), (5L, 7L)).toDF("doc_a", "doc_b")
    val want = Map(1L -> 1L, 2L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L)
    assert(Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap == want)
    assert(Dedup.dupClustersDistributed(pairs).as[(Long, Long)].collect().toMap == want)
    // a longer chain exercises multi-round convergence on both paths
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .toDF("doc_a", "doc_b")
    for (df <- Seq(Dedup.dupClusters(chain, localThreshold = 0), // force distributed
        Dedup.dupClusters(chain))) {
      val got = df.as[(Long, Long)].collect().toMap
      assert(got.values.toSet == Set(10L) && got.size == 5)
    }
  }

  test("exactDupGroups groups identical texts with sorted member ids") {
    val d = docs((5L, "x y z"), (1L, "x y z"), (2L, "a b c"))
    val g = Dedup.exactDupGroups(d).select("c", "doc_ids").as[(Long, Seq[Long])].collect()
    assert(g.length == 1 && g.head._1 == 2 && g.head._2 == Seq(1L, 5L))
  }

  test("ivfTopK achieves useful recall of the exact top-k (nprobe=4 of 16 lists)") {
    val e = graft.Tables.embeddings(spark, sf())
    val q = e.where(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.annTopK(e, q, 5))
    val approx = pairs(Similarity.ivfTopK(e, q, 5))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 $recall vs brute force") // probing 1/4 of lists
  }

  test("randomProjection: deterministic, JL-preserves pairwise distances loosely") {
    val e = graft.Tables.embeddings(spark, sf())
    def proj() = Similarity.randomProjection(e, k = 16)
      .as[(Long, Int, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    val a = proj()
    assert(a == proj()) // md5-derived matrix: byte-equal across runs
    // JL check on a handful of vector pairs: projected squared distance
    // within a loose (1 ± 0.75) band of the original (k=16 is small; the
    // bound is coarse by design — this guards sign/scale bugs, where the
    // ratio would be ~k, ~1/k, or unbounded, not tightness)
    val orig = e.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val pr = a.groupBy(_._1).map { case (id, rs) => id -> rs.map(_._3).toArray }
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val ids = orig.keys.toSeq.sorted.take(8)
    val ratios = for (i <- ids; j <- ids if i < j)
      yield d2(pr(i).toSeq, pr(j).toSeq) / d2(orig(i), orig(j))
    // per-pair variance at k=16 is large (std ≈ √(2/k) ≈ 0.35), so the
    // individual guard is wide; the MEDIAN over 28 pairs concentrates
    ratios.foreach(r => assert(r > 0.15 && r < 4.0, s"distortion $r"))
    val med = ratios.sorted.apply(ratios.size / 2)
    assert(med > 0.6 && med < 1.6, s"median distortion $med")
  }

  test("lshPairsTopK achieves high recall of the true top pairs (multi-table)") {
    val emb = Tables.embeddingsFixture(spark)
    val exact = Similarity.cosinePairsTopK(emb, 10).as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2)).toSet
    val approx = Similarity.lshPairsTopK(emb, 10, nBits = 4, dim = 64, seed = 42L, tables = 16)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    // random fixture vectors: top pair cos ≈0.46 (θ≈62°) → per-table
    // collision (1-θ/π)^4 ≈ 0.19; 16 tables → ≈0.97 per pair
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("lsh candidates catch planted near-identical vectors with few tables") {
    val rng = new graft.lda.SplitMix64(3L)
    def vec() = Array.fill(16)(rng.nextDouble().toFloat * 2 - 1)
    val base = (0 until 20).map(i => (i.toLong, vec()))
    val planted = base.take(3).map { case (id, v) =>
      (id + 100L, v.map(x => x + (rng.nextDouble().toFloat - 0.5f) * 0.01f))
    }
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val cand = Similarity.lshCandidatePairs(emb, nBits = 8, tables = 4, dim = 16, seed = 1L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    for (i <- 0 until 3) assert(cand.contains((i.toLong, i + 100L)), s"missing planted pair $i")
  }

  test("ivfTopK finds planted cluster neighbors and returns k rows per query") {
    // 4 tight clusters of 10 vectors each around orthogonal-ish anchors;
    // vec_ids 0..3 (one per cluster) double as centroids (nlist=4)
    val rng = new graft.lda.SplitMix64(9L)
    def anchor(c: Int) = Array.tabulate(16)(j => if (j % 4 == c) 1.0f else 0.05f)
    val rows = for (c <- 0 until 4; i <- 0 until 10) yield {
      val a = anchor(c)
      (c + 4L * i, a.map(x => x + (rng.nextDouble().toFloat - 0.5f) * 0.05f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 4)
    val got = Similarity.ivfTopK(emb, queries, 5, nlist = 4, nprobe = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    got.foreach { case (q, neighbors) =>
      assert(neighbors.size == 5, s"query $q")
      // with nprobe=1 every neighbor comes from the query's own cluster
      neighbors.foreach(n => assert(n % 4 == q, s"query $q got cross-cluster $n"))
    }
  }

  test("lsh buckets are deterministic for a fixed seed") {
    val emb = Tables.embeddingsFixture(spark)
    val a = Similarity.lshBuckets(emb, 8, 64, 7L).select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    val b = Similarity.lshBuckets(emb, 8, 64, 7L).select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(a == b)
    val c = Similarity.lshBuckets(emb, 8, 64, 8L).select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(a != c) // different planes
  }

  test("languageId picks the profile language and falls back to 'und'") {
    val d = docs(
      (1L, "the cat is of the hill and the dog"),
      (2L, "el perro de la casa y el gato"),
      (3L, "zzz qqq www unknown tokens only"))
    val got = TextAnalysis.languageId(d).as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "und")
  }

  test("qualityMetrics computes ratios on a hand-checked doc") {
    val d = docs((1L, "the aaa bb1 c ")) // 4 tokens, lens 3,3,3,1; 1 en-stopword; 1 digit of 14 chars
    val r = TextAnalysis.qualityMetrics(d).collect().head
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(math.abs(r.getAs[Double]("avg_tok_len") - 2.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("digit_ratio") - 1.0 / 14) < 1e-4)
  }

  test("tokenStats: regex tokens split punctuation that whitespace tokens keep") {
    val d = docs((1L, "abc de2f g,h "))
    val r = TextAnalysis.tokenStats(d).as[(Long, Int, Int)].collect().head
    assert(r._2 == 3) // ws: abc, de2f, "g,h"
    assert(r._3 == 5) // re: abc, de2f, g, ",", h
  }

  test("fingerprints stable across runs; rollingFingerprint order-sensitive") {
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
    val fp = TextAnalysis.fingerprints(d).as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    val h1 = TextAnalysis.rollingFingerprint(Seq("a", "b", "c"))
    val h2 = TextAnalysis.rollingFingerprint(Seq("c", "b", "a"))
    assert(h1 != h2)
    assert(h1 == TextAnalysis.rollingFingerprint(Seq("a", "b", "c")))
  }

  test("multimodal pipeline: schema, determinism, frame sampling stride") {
    val media = Multimodal.syntheticMedia(spark, docs((0L, "image doc"), (1L, "audio doc"), (2L, "video doc"))
      .withColumn("n_chars", length(col("text"))))
    val feats = Multimodal.imageFeatures(media).collect()
    assert(feats.length == 1 && feats.head.media_id == 0L)
    assert(feats.head.width > 0 && feats.head.channels >= 1)
    val again = Multimodal.imageFeatures(media).collect()
    assert(feats.head == again.head) // deterministic stub
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(frames.nonEmpty && frames.forall(_.media_id == 2L))
    assert(frames.forall(_.frame_index % 4 == 0))
    // resize clamps the max dimension, preserves aspect
    val sized = Multimodal.resize(media.map(_.copy(width = 2000, height = 1000)), 512).collect()
    assert(sized.forall(m => m.width == 512 && m.height == 256))
  }

  test("piiRedact scrubs emails, IPv4s, and phone shapes with counts") {
    val d = docs(
      (1L, "contact bob@example.com or alice@corp.io today"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 responded"),
      (3L, "call 555-123-4567 or 555 987 6543 now"),
      (4L, "nothing sensitive here at all"))
    val r = TextAnalysis.piiRedact(d)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 2L, 0L, 0L, "contact <EMAIL> or <EMAIL> today")))
    assert(r(1) == ((2L, 0L, 2L, 0L, "server at <IP> and <IP> responded")))
    assert(r(2) == ((3L, 0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(r(3) == ((4L, 0L, 0L, 0L, "nothing sensitive here at all")))
  }

  test("sentenceDedup reports repeated sentences across docs, once-off absent") {
    val d = docs(
      (1L, "shared boilerplate line. unique one here"),
      (2L, "shared boilerplate line. another unique"),
      (3L, "totally original sentence"))
    val rows = TextAnalysis.sentenceDedup(d).as[(String, Long, Long)].collect()
    assert(rows.length == 1)
    assert(rows.head._2 == 2 && rows.head._3 == 2) // c=2 across n_docs=2
  }

  test("ngramNovelty: first doc fully novel, exact repeat fully stale") {
    val a = "alpha beta gamma delta epsilon"
    val d = docs((1L, a), (2L, a), (3L, "zeta eta theta iota kappa"))
    val m = TextAnalysis.ngramNovelty(d, 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) == ((3L, 1.0)))
    assert(m(2L) == ((3L, 0.0)))
    assert(m(3L) == ((3L, 1.0)))
  }

  test("corpusStats matches a hand computation") {
    val d = docs((1L, "a b a"), (2L, "a c"))
    val r = TextAnalysis.corpusStats(d)
      .as[(Long, Long, Long, Double, Double)].collect().head
    // 2 docs, 5 tokens, vocab {a,b,c}=3, ttr=0.6, top100 covers everything
    assert(r == ((2L, 5L, 3L, 0.6, 1.0)))
  }

  test("packSequences bins docs by exclusive token prefix sum") {
    val d = docs((1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"))
    // budget 4: prefixes 0,3,5,9 -> bins 0,0,1,2
    val m = TextAnalysis.packSequences(d, 4L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(m == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("mixtureSample keeps weight-1 strata whole, drops unlisted strata") {
    val rows = (1L to 40L).map(i =>
      (i, s"text number $i", if (i % 2 == 0) "es" else "xx"))
      .toDF("doc_id", "text", "lang")
    val kept = TextAnalysis.mixtureSample(rows, Map("es" -> 1.0))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (2L to 40L by 2).toSet) // every es doc, no xx doc
  }

  test("maskTokens is deterministic, preserves token count, masks ~rate") {
    val d = docs((1L to 50L).map(i => (i, s"alpha bravo charlie delta echo foxtrot golf hotel india juliet id$i")): _*)
    val a = TextAnalysis.maskTokens(d, 0.15).as[(Long, String)].collect().sortBy(_._1)
    val b = TextAnalysis.maskTokens(d, 0.15).as[(Long, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    val toks = a.flatMap(_._2.split(" "))
    assert(toks.length == 50 * 11) // token positions preserved
    val frac = toks.count(_ == "<MASK>").toDouble / toks.length
    assert(frac > 0.08 && frac < 0.25, s"masked frac $frac")
  }

  test("kmeans separates two planted blobs and assigns every vector") {
    // two tight blobs around (10,0,...) and (0,10,...); ids 0/1 seed the
    // centroids, one per blob, so k=2 Lloyd's must split them exactly
    val dim = 8
    def v(center: Int, jitter: Double) = {
      val a = Array.fill(dim)(0.0f)
      a(center) = (10.0 + jitter).toFloat
      a(1 - center) = jitter.toFloat
      a
    }
    val rows = (0L until 40L).map { i =>
      val blob = (i % 2).toInt // ids 0,1 land in different blobs
      (i, v(blob, (i % 7) * 0.1))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.kmeans(emb, k = 2, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(out.size == 40)
    (0L until 40L).foreach { i =>
      assert(out(i) == out(i % 2), s"vec $i in wrong cluster")
    }
    assert(out(0L) != out(1L))
  }

  test("kmeans is deterministic across runs") {
    val emb = Tables.embeddingsFixture(spark)
    val a = Similarity.kmeans(emb, k = 4, iters = 2).as[(Long, Int)].collect().sortBy(_._1)
    val b = Similarity.kmeans(emb, k = 4, iters = 2).as[(Long, Int)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("semDedup keeps exactly the lowest id per near-identical cluster") {
    // the kmeans blob fixture: two tight blobs (even ids around axis 0,
    // odd ids around axis 1); within a blob every cosine is ≈1, so at
    // tau=0.9 only the lowest id of each cluster survives
    val dim = 8
    def v(center: Int, jitter: Double) = {
      val a = Array.fill(dim)(0.0f)
      a(center) = (10.0 + jitter).toFloat
      a(1 - center) = jitter.toFloat
      a
    }
    val emb = (0L until 40L).map(i => (i, v((i % 2).toInt, (i % 7) * 0.1)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, k = 2, iters = 2, tau = 0.9)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(out.length == 40) // every vector present, flagged not filtered
    assert(out.filter(_._3 == 1).map(_._1).toSeq == Seq(0L, 1L))
    // cluster column is exactly the kmeans assignment it composes
    val km = Similarity.kmeans(emb, k = 2, iters = 2).as[(Long, Int)].collect().toMap
    out.foreach { case (id, c, _) => assert(c == km(id)) }
  }

  test("assignClustersJoin is row-identical to the literal fan-out form") {
    val dim = 8
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(j => ((i * 13 + j * 7) % 11).toDouble / 3.0))
    }
    val e = vecs.toDF("vec_id", "e")
      .withColumn("n2", Similarity.dot(col("e"), col("e")))
    val cent = vecs.take(5).map { case (id, v) =>
      (id.toInt, v, v.map(x => x * x).sum)
    }
    val a = Similarity.assignClustersLiteral(e, cent)
      .select("vec_id", "cluster").as[(Long, Int)].collect().sortBy(_._1)
    val b = Similarity.assignClustersJoin(e, cent)
      .select("vec_id", "cluster").as[(Long, Int)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("semDedup keeps dissimilar vectors sharing a cluster") {
    // 3 mutually orthogonal vectors all seed-clustered together (k=1):
    // same cluster, cosine 0 — nothing may be dropped
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, k = 1, iters = 1, tau = 0.5)
      .as[(Long, Int, Int)].collect()
    assert(out.forall(_._3 == 1))
  }

  test("gopherQuality rules on hand-checked docs") {
    val d = docs(
      // 55 words, stopwords {the, a} → every rule passes
      (1L, "the a " + ("table " * 53).trim),
      // 2 words, no stopwords → r_words and r_stop fail
      (2L, "table scan"),
      // 60 words, 10 of them '#': symbol_ratio 10/60 > 0.1 fails; alpha
      // 50/60 ≥ 0.8 and the other rules still pass
      (3L, ("word " * 48).trim + " the a " + ("# " * 10).trim))
    val out = TextAnalysis.gopherQuality(d).orderBy("doc_id")
      .select("doc_id", "r_words", "r_word_len", "r_alpha", "r_symbol",
        "r_stop", "gopher_pass")
      .as[(Long, Int, Int, Int, Int, Int, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 1, 1, 1, 1, 1, 1),
      (2L, 0, 1, 1, 1, 0, 0),
      (3L, 1, 1, 1, 0, 1, 0)))
    // token-free doc: NULL ratio metrics (not NaN), still a clean fail
    val edge = TextAnalysis.gopherQuality(docs((9L, " ")))
      .select("n_words", "mean_word_len", "gopher_pass").collect()(0)
    assert(edge.getInt(0) == 0 && edge.isNullAt(1) && edge.getInt(2) == 0)
  }

  test("repeatedSpans merges cross-doc duplicated grams; ignores within-doc repeats") {
    // S: 60 distinct chars shared by docs 1 and 2 at different offsets;
    // doc 3 repeats its own 50-char block — within-doc only, no span
    val s = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).mkString.take(60)
    val t = ("zyx" * 20).take(50)
    val d = docs(
      (1L, "!!!!!?????" + s), // dup 40-grams at p=11..31 → span [11, 70]
      (2L, s + "##########"), // dup 40-grams at p=1..21  → span [1, 60]
      (3L, t + t))
    val got = Dedup.repeatedSpans(d, l = 40).orderBy("doc_id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((1L, 11, 70), (2L, 1, 60)))

    // removal cuts exactly the spans; untouched docs pass through
    val clean = Dedup.removeRepeatedSpans(d, l = 40).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(clean == Seq((1L, "!!!!!?????"), (2L, "##########"), (3L, t + t)))
  }

  test("quantizeInt8 bounds q to [-127,127] and reconstructs within half a step") {
    val emb = Tables.embeddingsFixture(spark)
    val e = emb.select(col("vec_id"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
    val ma = e.groupBy("vec_id").agg(max(abs(col("v"))).as("ma"))
    val q = Similarity.quantizeInt8(emb)
    val joined = q.join(e, Seq("vec_id", "pos")).join(ma, "vec_id")
      .select(col("q"), col("v"), (col("ma") / 127.0).as("step"))
      .as[(Int, Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (qv, v, step) =>
      assert(math.abs(qv) <= 127)
      assert(math.abs(qv * step - v) <= step / 2 + 1e-12, s"q=$qv v=$v step=$step")
    }
  }

  test("bm25 ranks higher term frequency above lower at equal length") {
    val d = docs(
      (1L, "join join join pad pad pad pad pad"),
      (2L, "join pad pad pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad pad pad"))
    val s = TextAnalysis.bm25(d, Seq("join")).as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L) && s(2L) > 0.0)
    assert(!s.contains(3L)) // no probe term -> excluded
  }

  test("lmScore gives the majority transition lower NLL than the rare one") {
    // all three docs continue 'a' somewhere: a->b happens 10 times in the
    // corpus, a->c only 5, so p(b|a)=2/3 vs p(c|a)=1/3 and doc 3 (all
    // a->c) must score a higher mean NLL than docs 1-2 (all a->b)
    val d = docs(
      (1L, "a b a b a b a b a b"),
      (2L, "a b a b a b a b a b"),
      (3L, "a c a c a c a c a c"))
    val s = TextAnalysis.lmScore(d).as[(Long, Double)].collect().toMap
    assert(s.size == 3)
    assert(s(1L) < s(3L))
    assert(s(1L) == s(2L))
  }

  test("minhashEstimates: identical docs estimate 1.0; estimates stay in [0,1]") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val d = docs((1L, base), (2L, base), (3L, base.replace("zeta", "zetaX")))
    val est = Dedup.minhashEstimates(d).as[(Long, Long, Double)].collect()
    val m = est.map(r => (r._1, r._2) -> r._3).toMap
    assert(m((1L, 2L)) == 1.0)
    assert(est.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("simhashBandedPairs equals the all-pairs hamming filter") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val d = docs((1L, base), (2L, base), (3L, base.replace("zeta", "zetaX")),
      (4L, base.replace("eta", "etaY")),
      (5L, "unrelated totally different words everywhere padded out " * 5))
    val sims = Dedup.simhashes(d)
    for (dist <- Seq(0, 3, 8)) {
      val banded = Dedup.simhashBandedPairs(sims, dist).as[(Long, Long, Int)].collect().toSet
      val allp = Dedup.simhashNearPairs(sims, dist).as[(Long, Long, Int)].collect().toSet
      assert(banded == allp, s"maxDist=$dist")
    }
  }

  test("incrementalDedup flags exact and near dups of new docs against old") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val old = docs((1L, base), (2L, "one two three four five six seven eight nine ten " * 3))
    val nw = docs((10L, base),                              // exact copy of old 1
      (11L, base.replace("kappa", "kappaX")),               // near-dup of old 1
      (12L, "fresh unseen content nothing like the others padded words here " * 3))
    val r = Dedup.incrementalDedup(nw, old).as[(Long, Int, Int)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(10L) == ((1, 1)))
    assert(r(11L) == ((0, 1)))
    assert(r(12L) == ((0, 0)))
  }

  test("cdcChunkDups finds shared boilerplate at shifted offsets") {
    // doc 2 has the same long run as doc 1 but shifted by a prefix —
    // content-defined boundaries re-synchronize inside the shared run
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val d = docs((1L, shared), (2L, s"prefix words here $shared"),
      (3L, "entirely different content with no shared runs at all"))
    val dups = Dedup.cdcChunkDups(d).as[(String, Long, Long)].collect()
    assert(dups.nonEmpty, "expected at least one shared chunk across docs 1 and 2")
    assert(dups.exists(_._3 == 2L)) // a chunk seen in two distinct docs
    // and chunking is deterministic
    val again = Dedup.cdcChunkDups(d).as[(String, Long, Long)].collect()
    assert(dups.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("labelCentroids averages per class and covers every (label, pos)") {
    val e = Seq(
      (1L, Array(1.0f, 3.0f), 0),
      (2L, Array(3.0f, 5.0f), 0),
      (3L, Array(10.0f, 20.0f), 1)).toDF("vec_id", "embedding", "label")
    val c = Similarity.labelCentroids(e).as[(Int, Int, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(c == Map((0, 0) -> 2.0, (0, 1) -> 4.0, (1, 0) -> 10.0, (1, 1) -> 20.0))
  }

  test("pmiPairs ranks the always-together pair above independent pairs") {
    // 'left right' co-occur in every one of their docs; 'common' appears
    // everywhere so its pairs have pmi ~ 0
    val d = docs(
      (1L, "left right common filler1"), (2L, "left right common filler2"),
      (3L, "left right common filler3"), (4L, "left right common filler4"),
      (5L, "left right common filler5"), (6L, "solo common other filler6"),
      (7L, "solo common other filler7"), (8L, "solo common other filler8"),
      (9L, "solo common other filler9"), (10L, "solo common other filler10"))
    val top = TextAnalysis.pmiPairs(d, minCount = 5L, k = 5)
      .as[(String, String, Long, Double)].collect()
    assert(top.nonEmpty)
    val best = top.head
    assert(Set(best._1, best._2) != Set("common", "left"))
    val pmi = top.map(t => Set(t._1, t._2) -> t._4).toMap
    assert(pmi(Set("left", "right")) > pmi.getOrElse(Set("common", "left"), -10.0))
  }

  test("stupidBackoff hits all three backoff levels with hand math") {
    val d = Seq(
      (1L, "a b c", 1), (2L, "a b c", 1),   // train: c3(abc)=2, c2(ab)=c2(bc)=2, all c1=2
      (3L, "a b c", 0),                     // seen trigram: s = 2/2 = 1
      (4L, "x b c", 0),                     // backoff to bigram: 0.4 · c(bc)/c(b) = 0.4
      (5L, "a b x", 0))                     // base: 0.16 · (c(x)+1)/(N+V) = 0.16/9
      .toDF("doc_id", "text", "train")
    val got = TextAnalysis.stupidBackoff(d, col("train") === 1)
      .as[(Long, Double)].collect().toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(3L) == 0.0)
    assert(got(4L) == r4(-math.log(0.4)))
    assert(got(5L) == r4(-math.log(0.16 / 9)))
  }

  test("pseudonymize: injective rename, raw id gone, salt changes the mapping") {
    val e = graft.Tables.events(spark, sf()).select("user_id", "event_id")
    val p = TextAnalysis.pseudonymize(e, "user_id", "s1")
    assert(!p.columns.contains("user_id"))
    val nUsers = e.select("user_id").distinct().count()
    assert(p.select("user_id_pseud").distinct().count() == nUsers)
    // per-entity event counts survive the rename exactly
    val byPseud = p.groupBy("user_id_pseud").count()
      .select("count").as[Long].collect().sorted
    val byUser = e.groupBy("user_id").count()
      .select("count").as[Long].collect().sorted
    assert(byPseud.sameElements(byUser))
    // a different salt yields a disjoint pseudonym space
    val p2 = TextAnalysis.pseudonymize(e, "user_id", "s2")
      .select("user_id_pseud").distinct().as[String].collect().toSet
    val p1 = p.select("user_id_pseud").distinct().as[String].collect().toSet
    assert(p1.intersect(p2).isEmpty)
  }

  test("knBigramNll: interpolated KN hand math incl. unseen prefix and OOV") {
    // train: "a b", "a c" → c12(a,b)=c12(a,c)=1; c1(a)=2, N1+(a·)=2;
    // N1+(·b)=N1+(·c)=1; B=2 bigram types; V=3 unigram types (a,b,c)
    // pc(w) = (N1+(·w)+1)/(B+V+1) = 2/6 seen, 1/6 unseen
    val d = Seq(
      (1L, "a b", 1), (2L, "a c", 1),
      (3L, "a b", 0),  // seen: (max(1−.75,0) + .75·2·(2/6))/2 = 0.375
      (4L, "z b", 0),  // unseen prefix → pc(b) = 2/6
      (5L, "z q", 0))  // fully OOV → pc(q) = 1/6 — finite, no -inf
      .toDF("doc_id", "text", "train")
    val got = TextAnalysis.knBigramNll(d, col("train") === 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(3L) == ((1L, r4(-math.log(0.375)))), got.toString)
    assert(got(4L) == ((1L, r4(-math.log(2.0 / 6)))), got.toString)
    assert(got(5L) == ((1L, r4(-math.log(1.0 / 6)))), got.toString)
  }

  test("knBigramNll: the discount moves mass to the continuation term") {
    // same eval under D=0 (pure MLE + interpolation weight 0) vs D=0.75:
    // a SEEN bigram scores better (lower nll) with less discounting
    val d = Seq((1L, "a b", 1), (2L, "a c", 1), (3L, "a b", 0))
      .toDF("doc_id", "text", "train")
    val nllD0 = TextAnalysis.knBigramNll(d, col("train") === 1, discount = 0.0)
      .as[(Long, Long, Double)].head()._3
    val nllD75 = TextAnalysis.knBigramNll(d, col("train") === 1)
      .as[(Long, Long, Double)].head()._3
    assert(nllD0 < nllD75, s"$nllD0 vs $nllD75")
  }

  test("winsorize clips to the stratum's rank-based percentile values") {
    // 20 docs, values 1..20, one stratum: p05 = value at rank 1 = 1,
    // p95 = value at rank 19 = 19 → only the max gets clipped (20 → 19)
    val d = (1L to 20L).map(i => (i, s"t$i", "en", i * 1L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = TextAnalysis.winsorize(d)
      .select("doc_id", "clipped").as[(Long, Long)].collect().toMap
    assert(got(20L) == 19L)
    assert(got(19L) == 19L && got(1L) == 1L && got(10L) == 10L)
  }

  test("rebalanceStrata equalizes every stratum to the smallest") {
    val d = Seq(
      (1L, "a", "en"), (2L, "b", "en"), (3L, "c", "en"), (4L, "d", "en"),
      (5L, "e", "de"), (6L, "f", "de"),
      (7L, "g", "fr"), (8L, "h", "fr"), (9L, "i", "fr"))
      .toDF("doc_id", "text", "lang")
    val kept = TextAnalysis.rebalanceStrata(d)
      .select("lang").as[String].collect()
    assert(kept.length == 6) // 3 langs × min(4,2,3)=2
    assert(kept.groupBy(identity).view.mapValues(_.length).toMap ==
      Map("en" -> 2, "de" -> 2, "fr" -> 2))
  }

  test("tokenEntropy: uniform doc maxes entropy, repeated doc zeroes it") {
    val d = docs((1L, "a b c d"), (2L, "a a a a"))
    val got = TextAnalysis.tokenEntropy(d)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._4 == math.rint(math.log(4) * 1e4) / 1e4) // ln 4
    assert(got(1L)._3 == 1.0)   // all types distinct
    assert(got(2L)._4 == 0.0)   // zero diversity
    assert(got(2L)._3 == 0.25)
  }

  test("skipgramPairs counts both directions within the window") {
    val d = docs((1L, "a b c"))
    val got = TextAnalysis.skipgramPairs(d, 2)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // d=1: (a,b),(b,c); d=2: (a,c) — each in both directions
    assert(got == Map(("a","b")->1L, ("b","a")->1L, ("b","c")->1L,
      ("c","b")->1L, ("a","c")->1L, ("c","a")->1L))
  }

  test("bpePairCounts weights char pairs by word frequency") {
    val d = docs((1L, "ab ab cd"))
    val got = TextAnalysis.bpePairCounts(d)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("a","b") -> 2L, ("c","d") -> 1L))
  }

  test("negativeSample: k partners per doc, never self, deterministic") {
    val d = docs((1L to 40L).map(i => i -> s"doc $i"): _*)
    val a = TextAnalysis.negativeSample(d, k = 3, buckets = 2)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val b = TextAnalysis.negativeSample(d.repartition(7), k = 3, buckets = 2)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(a.sameElements(b)) // partitioning-invariant
    assert(a.forall { case (id, neg, _) => id != neg })
    // with 40 docs in 2 buckets every ring is > k → exactly 3 per doc
    val perDoc = a.groupBy(_._1).view.mapValues(_.length)
    assert(perDoc.values.forall(_ == 3) && perDoc.size == 40)
    // negatives of one doc are distinct partners
    assert(a.groupBy(_._1).values.forall(g => g.map(_._2).distinct.length == 3))
  }

  test("keepNearDupCanonical keeps cluster minima and all singletons") {
    val d = docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("doc_a", "doc_b") // cluster {2,4,5}
    val kept = Dedup.keepNearDupCanonical(d, pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 2L, 3L))) // 4,5 dropped; rep 2 kept
  }

  test("importanceWeights favors target-domain docs and matches hand math") {
    // target = docs containing 'es' marker via the lang column
    val d = Seq(
      (1L, "alpha beta", "es"), (2L, "alpha beta", "es"),
      (3L, "gamma delta", "en"), (4L, "gamma delta", "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.importanceWeights(d, col("lang") === "es")
      .as[(Long, Double)].collect().toMap
    // vocab V=4; N_all=8, N_t=4. alpha/beta: c_all=2, c_t=2
    //   lw = ln(((2+1)/(4+4)) / ((2+1)/(8+4))) = ln(1.5)
    // gamma/delta: c_t=0 → lw = ln(((0+1)/8) / (3/12)) = ln(0.5)
    val up = math.rint(math.log(1.5) * 1e4) / 1e4
    val dn = math.rint(math.log(0.5) * 1e4) / 1e4
    assert(got(1L) == up && got(2L) == up)
    assert(got(3L) == dn && got(4L) == dn)
    // the target-domain docs score strictly higher
    assert(got(1L) > got(3L))
  }

  test("nbClassify matches hand-computed NB posteriors, incl. token-free doc") {
    val d = Seq(
      (1L, "x x y", "a"), (2L, "x y", "a"), (3L, "z z", "b"),
      (4L, "z y", "b"), (5L, "", "a")) // doc 5: prior-only score
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.nbClassify(d)
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // priors: a 3/5, b 2/5. V = {x,y,z} = 3.
    // class a tokens N=5 (x:3,y:2): P(x|a)=4/8, P(y|a)=3/8, P(z|a)=1/8
    // class b tokens N=4 (z:3,y:1): P(z|b)=4/7, P(y|b)=2/7, P(x|b)=1/7
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val ln = (x: Double) => math.log(x)
    val s1a = ln(0.6) + 2 * ln(4.0 / 8) + ln(3.0 / 8)
    val s3b = ln(0.4) + 2 * ln(4.0 / 7)
    assert(got(1L) == ("a", r4(s1a)))
    assert(got(3L) == ("b", r4(s3b)))
    assert(got(4L)._1 == "b") // z y: 4/7·2/7 side beats 1/8·3/8 side
    assert(got(5L) == ("a", r4(ln(0.6)))) // no tokens → argmax prior
    assert(got.size == 5) // every doc classifies
  }

  test("vocabCoverage matches hand-computed minimal vocab sizes") {
    // counts: a=4, b=2, c=1, d=1; total mass 8
    val d = Seq((1L, "a a a a b"), (2L, "b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(d)
      .as[(Double, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0.5) == ((1L, 0.5)))    // target 4: {a} covers exactly 4/8
    assert(got(0.9) == ((4L, 1.0)))    // target ceil(7.2)=8: all 4 tokens
    assert(got(0.95) == ((4L, 1.0)))
    assert(got(0.99) == ((4L, 1.0)))
  }

  test("firstWinsNearDup keeps the earliest doc per bucket family") {
    val d = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),  // exact copy of 1 → dup_of 1
      (3L, "completely different words entirely here"),
      (5L, "the quick brown fox jumps"),  // another copy → dup_of 1
      (9L, "tiny"))                       // < shingleLen tokens → no buckets, kept
      .toDF("doc_id", "text")
    val got = Dedup.firstWinsNearDup(d)
      .as[(Long, Int, Option[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((0, None)))     // first arrival wins
    assert(got(2L) == ((1, Some(1L))))
    assert(got(5L) == ((1, Some(1L))))
    assert(got(3L) == ((0, None)))
    assert(got(9L) == ((0, None)))
    // consistency with the pairwise path: any doc flagged dup must appear
    // as the right side of some candidate pair (and vice versa)
    val dupIds = got.filter(_._2._1 == 1).keySet
    val pairRights = Dedup.minhashCandidates(d)
      .as[(Long, Long)].collect().map(_._2).toSet
    assert(dupIds == pairRights)
  }

  test("profile reports rows/nulls/distincts/ranges per column") {
    val d = Seq(
      (1L, Some("a"), Some(2.5)), (2L, Some("a"), None),
      (3L, None, Some(-1.0)), (4L, Some("b"), Some(2.5)))
      .toDF("id", "s", "x")
    val got = Profile.profile(d, Seq("id", "s", "x"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 0L, 4L, Some(1.0), Some(4.0)))
    assert(got("s") == ("s", 4L, 1L, 2L, None, None)) // strings: no range
    assert(got("x") == ("x", 4L, 1L, 2L, Some(-1.0), Some(2.5)))
    // approx path returns the same shape (values sketch-approximate)
    val approx = Profile.profile(d, Seq("id"), exact = false).collect()
    assert(approx.length == 1 && approx.head.getLong(1) == 4L)
    // timestamps profile their range as exact epoch microseconds
    val t = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(100))),
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(200))))
      .toDF("id", "ts")
    val pt = Profile.profile(t, Seq("ts"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(pt == ("ts", 2L, 0L, 2L, Some(1e8), Some(2e8)))
  }

  test("zipfFit matches the closed-form OLS computed in the driver") {
    // counts: a×4 b×2 c×1 → ranks 1,2,3 (count desc, tok tiebreak)
    val d = Seq((1L, "a a b c "), (2L, "a a b ")).toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(d)
      .as[(Long, Double, Double)].collect().head
    val pts = Seq((4.0, 1.0), (2.0, 2.0), (1.0, 3.0))
      .map { case (c, rk) => (math.log(c), math.log(rk)) }
    val (my, mx) = (pts.map(_._1).sum / 3, pts.map(_._2).sum / 3)
    val slope = pts.map { case (y, x) => (y - my) * (x - mx) }.sum /
      pts.map { case (_, x) => (x - mx) * (x - mx) }.sum
    def r4(v: Double) = // Spark round() semantics: HALF_UP
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 == 3L)
    assert(got._2 == r4(slope) && got._3 == r4(my - slope * mx))
  }

  test("umassCoherence matches a hand computation incl. zero-co-occurrence pairs") {
    val d = Seq((1L, "a b ", "s"), (2L, "a c ", "s"), (3L, "a b ", "s"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.umassCoherence(d)
      .as[(String, Long, Double)].collect().toSeq
    // df: a=3 b=2 c=1 → ranks a,b,c. pairs: (a,b) D=2 → ln(3/2);
    // (a,c) D=1 → ln(2/1); (b,c) D=0 → ln(1/1) = 0
    val want = BigDecimal(math.log(1.5) + math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("s", 3L, want)))
  }

  test("umassCoherence: repeated tokens in a doc count once (doc frequency)") {
    val d = Seq((1L, "a a a b ", "s"), (2L, "b b ", "s"))
      .toDF("doc_id", "text", "source")
    // df: a=1, b=2 → ranks b(1), a(2); pair (b,a): D(b,a)=1 → ln(2/1)
    val got = TextAnalysis.umassCoherence(d)
      .as[(String, Long, Double)].collect().head
    val want = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == (("s", 1L, want)))
  }

  test("heapsFit matches a driver-side replication of the curve and OLS") {
    val docs = graft.Tables.documents(spark, sf()).where(col("doc_id") < 80)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // driver twin: global token stream in doc_id order, first-seen
    // positions, V at 10 checkpoints, ln-ln OLS
    val stream = docs.flatMap(_._2.split(" ").filter(_.nonEmpty))
    val n = stream.length.toLong
    val first = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    stream.zipWithIndex.foreach { case (t, i) =>
      if (!first.contains(t)) first(t) = i + 1L
    }
    val pts = (1 to 10).map { i =>
      val c = math.floor(n * i / 10.0).toLong
      (c, first.valuesIterator.count(_ <= c).toLong)
    }.filter(_._2 > 0)
    val xy = pts.map { case (c, v) => (math.log(v.toDouble), math.log(c.toDouble)) }
    val (my, mx) = (xy.map(_._1).sum / xy.size, xy.map(_._2).sum / xy.size)
    val beta = xy.map { case (y, x) => (y - my) * (x - mx) }.sum /
      xy.map { case (_, x) => (x - mx) * (x - mx) }.sum
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.heapsFit(
        graft.Tables.documents(spark, sf()).where(col("doc_id") < 80))
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 == n)
    assert(got._2 == first.size.toLong)
    assert(got._3 == r4(beta))
    assert(got._4 == r4(math.exp(my - beta * mx)))
    // the sf0.001 fixture's ~31-token vocab saturates within the first
    // checkpoint, so the curve is FLAT: beta = 0 is the correct fit here
    // (a growing-vocab corpus is exercised below)
    assert(got._3 == 0.0 && got._2 == 31L)
  }

  test("heapsFit: a growing vocabulary fits a positive beta") {
    // doc i contributes i fresh types plus filler — vocabulary keeps
    // growing, so the fitted exponent must be strictly positive (this
    // synthetic corpus grows types ~n², so beta may legitimately top 1;
    // the flat-vocab zero case is pinned above)
    val docs = (1L to 40L).map { i =>
      val fresh = (1L to i).map(j => s"w${i}_$j")
      (i, (fresh ++ Seq.fill(5)("the")).mkString(" ") + " ")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.heapsFit(docs)
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._3 > 0.5, got.toString)
    assert(got._4 > 0.0)
  }

  test("phashBandedPairs finds byte-identical media, never unrelated payloads") {
    val docs = Seq(
      (1L, "same payload"), (2L, "same payload"),  // dup pair
      (3L, "different one"), (4L, "yet another")
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")).cast("long"))
    val media = Multimodal.syntheticMedia(spark, docs)
    val pairs = Multimodal.phashBandedPairs(Multimodal.mediaPhashes(media))
      .as[(Long, Long, Int)].collect().toList
    assert(pairs == List((1L, 2L, 0)))
    // banding is partition-invariant
    val again = Multimodal.phashBandedPairs(
      Multimodal.mediaPhashes(media.repartition(7)))
      .as[(Long, Long, Int)].collect().toList
    assert(again == pairs)
  }

  test("phashBandedPairs: pigeonhole recall — a Hamming-6 pair spread across blocks is found") {
    // differing bits at 0, 15, 30, 45, 46, 47: under the old 4×15-bit
    // single-block banding EVERY band differs (bits 0 / 15 / 30 / 45-47
    // hit bands 0 / 1 / 2 / 3), so the pre-fix defaults silently dropped
    // this true near-pair; with 10 6-bit blocks the dirty blocks are
    // {0, 2, 5, 7}, leaving 6 clean blocks — some 2-combination is clean
    val near = (1L << 0) | (1L << 15) | (1L << 30) |
      (1L << 45) | (1L << 46) | (1L << 47)
    val phashes = Seq((1L, 0L), (2L, near), (3L, ~0L >>> 4))
      .toDF("media_id", "phash")
    val got = Multimodal.phashBandedPairs(phashes)
      .as[(Long, Long, Int)].collect().toList
    assert(got == List((1L, 2L, 6)))
    // a WORST-CASE pair: maxHamming dirty bits in maxHamming distinct
    // blocks still leaves blocks-maxHamming = comboSize clean blocks
    val worst = (0 until 8).map(b => 1L << (b * 6)).reduce(_ | _)
    val got8 = Multimodal.phashBandedPairs(
        Seq((1L, 0L), (2L, worst)).toDF("media_id", "phash"))
      .as[(Long, Long, Int)].collect().toList
    assert(got8 == List((1L, 2L, 8)))
    // the preconditions the defaults must satisfy are enforced, not
    // silently recall-breaking
    intercept[IllegalArgumentException] {
      Multimodal.phashBandedPairs(phashes, blocks = 4, blockBits = 15,
        maxHamming = 8, comboSize = 1) // the old recall-broken defaults
    }
    intercept[IllegalArgumentException] {
      Multimodal.phashBandedPairs(phashes, blocks = 10, blockBits = 6,
        maxHamming = 8, comboSize = 3) // only 2 clean blocks guaranteed
    }
    intercept[IllegalArgumentException] {
      Multimodal.phashBandedPairs(phashes, blocks = 9, blockBits = 6,
        maxHamming = 6, comboSize = 2) // 54 bits — doesn't cover 60
    }
  }

  test("recommendedComboSize follows the sizing rule and stays recall-safe") {
    // the scaladoc table: 10k uniform hashes → q=1 is 781 cands/row,
    // q=2 is 55/row, so a 64/row budget picks q=2
    assert(Multimodal.recommendedComboSize(10000L) == 2)
    // tiny N: q=1 already within budget (10·N/(2·64) ≤ 64 up to N≈820)
    assert(Multimodal.recommendedComboSize(500L) == 1)
    // huge N at maxHamming=8: NO recall-safe q meets the budget
    // (qMax = 2, 45·1e6/8192 ≈ 5493/row) → returns the best safe q, 2
    assert(Multimodal.recommendedComboSize(1000000L) == 2)
    // trading radius for keys: maxHamming=4 admits q up to 6; at N=1e6
    // q=3 (120 combos, 2^18 keys) gives 120·1e6/(2·262144) ≈ 229/row,
    // q=4 (210 combos, 2^24 keys) ≈ 6.3/row → budget 64 picks q=4
    assert(Multimodal.recommendedComboSize(1000000L, maxHamming = 4) == 4)
    // the recommendation always satisfies the pigeonhole precondition
    for (mh <- 1 to 9; n <- Seq(100L, 100000L, 10000000L)) {
      val q = Multimodal.recommendedComboSize(n, maxHamming = mh)
      assert(q >= 1 && q <= 10 - mh, s"mh=$mh n=$n q=$q")
    }
    // no recall-safe q at all → named error, not a recall-broken choice
    intercept[IllegalArgumentException] {
      Multimodal.recommendedComboSize(1000L, maxHamming = 10)
    }
  }

  test("zipfFit is invariant to input partitioning") {
    val d = graft.Tables.documents(spark, sf())
    val a = TextAnalysis.zipfFit(d).as[(Long, Double, Double)].collect().head
    val b = TextAnalysis.zipfFit(d.repartition(13))
      .as[(Long, Double, Double)].collect().head
    assert(a == b)
    assert(a._2 < 0.0) // frequency falls with rank
  }

  private object Tables {
    def embeddingsFixture(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  }
}
