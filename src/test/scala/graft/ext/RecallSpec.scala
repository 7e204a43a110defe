package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@k of the approximate ANN paths against the exact brute-force
  * oracle on the sf0.01 embedding fixture. The oracles already pin each
  * path's OUTPUT deterministically; these specs pin its QUALITY as a
  * number, so a parameter regression (fewer tables, lazier probing, a
  * broken codebook) that still produces deterministic-but-worse
  * neighbors goes red. Floors sit ~10 points under the measured value
  * (fixture vectors are random, the hard case for ANN — real embedding
  * clusters only raise recall). */
class RecallSpec extends SparkSpec {

  private lazy val emb =
    graft.Tables.embeddings(spark, sf("sf0.01")).select("vec_id", "embedding")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF recall@10 vs brute force stays above 0.60 (nprobe 4/16)") {
    val queries = emb.where(col("vec_id") < 8)
    val gt = Similarity.annTopK(emb, queries, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nlist = 16, nprobe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (gt intersect ivf).size.toDouble / gt.size
    info(f"ivf recall@10 = $recall%.3f (${gt.size} truths)")
    assert(recall >= 0.60, f"IVF recall collapsed: $recall%.3f")
  }

  test("LSH top-10 pair recall (battery params) stays above its floor") {
    // Random fixture vectors are the adversarial case for sign-LSH: the
    // best pairs peak near cosine 0.5, where an 8-bit signature collides
    // with probability (1−θ/π)⁸ ≈ 0.04 per table → ~27% across 8 tables
    // — so ~0.3 IS the theoretical recall of this configuration on this
    // fixture, and the pin guards the configured path (the battery's
    // ext_lsh_topk params) against parameter/bucketing regressions, not
    // an absolute quality bar. Real embedding clusters (cos ≥ 0.9,
    // per-bit ~0.86, ~65% per 8 tables) would score far higher.
    val exact = pairSet(Similarity.cosinePairsTopK(emb, 20))
    val lsh = pairSet(
      Similarity.lshPairsTopK(emb, 20, nBits = 8, dim = 64, seed = 42L))
    val recall = (exact intersect lsh).size.toDouble / exact.size
    info(f"lsh pair recall@20 = $recall%.3f")
    assert(recall >= 0.20, f"LSH pair recall collapsed: $recall%.3f")
  }

  test("IVF-PQ top-10 recall vs exact max-IP neighbors of query 0 above 0.35") {
    // ivfPqTopK approximates MAX-INNER-PRODUCT search, so the ground
    // truth is the exact IP top-10 (not cosine)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = e.where(col("vec_id") === 0L).select(col("e").as("qe"))
    val gt = e.crossJoin(q).where(col("vec_id") =!= 0L)
      .select(col("vec_id"), Similarity.dot(col("e"), col("qe")).as("ip"))
      .orderBy(col("ip").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfPqTopK(emb).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val recall = (gt intersect approx).size.toDouble / gt.size
    // measured 0.400 (1-iteration codebooks, nprobe 2/8, random
    // vectors); floor leaves margin for legitimate grid-rounding drift
    info(f"ivfpq recall@10 = $recall%.3f")
    assert(recall >= 0.35, f"IVF-PQ recall collapsed: $recall%.3f")
  }

  test("mmr: first pick is most relevant, second pick trades rel for diversity") {
    import spark.implicits._
    // unit vectors: rel(1)=.9, rel(2)=.89 but sim(2,1)≈.99 → score −.10;
    // rel(3)=.85 with sim(3,1)≈.54 → score +.31 → greedy takes 1 then 3
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.43589f)),
      (2L, Array(0.89f, 0.45602f)), (3L, Array(0.85f, -0.52678f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(e, queryId = 0L, topN = 3, k = 2)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L), got.toString)
    assert(got.head._3 == 0.9, got.toString) // step-1 score = its relevance
  }


  test("knn label eval: tight same-label neighborhoods score perfectly at k=1") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.99f, 0.14f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.14f, 0.99f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelEval(e, k = 1)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0, 2L, 2L, 1.0), (1, 2L, 2L, 1.0)), got.toString)
  }

  test("silhouette: separated clusters positive, singletons zero") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.99f, 0.14f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.14f, 0.99f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.silhouette(e)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.forall(_._3 > 0.5), got.toString)
    // all-distinct labels: every cluster a singleton -> s = 0 everywhere
    val single = Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val g2 = Similarity.silhouette(single).as[(Int, Long, Double)].collect()
    assert(g2.forall(_._3 == 0.0), g2.toSeq.toString)
  }

  test("bcubed: perfect clustering scores 1/1/1; one mega-cluster keeps R=1") {
    import spark.implicits._
    val truth = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1))
      .toDF("vec_id", "label")
    val perfect = Seq((0L, 10), (1L, 10), (2L, 20), (3L, 20))
      .toDF("vec_id", "cluster")
    val p = Similarity.bcubed(perfect, truth)
      .as[(Long, Double, Double, Double)].head()
    assert(p == ((4L, 1.0, 1.0, 1.0)), p.toString)
    // everything in one cluster: recall stays 1, precision = mean
    // same-label share = (2/4 + 2/4 + 2/4 + 2/4)/4 = 0.5
    val mega = Seq((0L, 7), (1L, 7), (2L, 7), (3L, 7)).toDF("vec_id", "cluster")
    val m = Similarity.bcubed(mega, truth)
      .as[(Long, Double, Double, Double)].head()
    assert(m._2 == 0.5 && m._3 == 1.0, m.toString)
    assert(math.abs(m._4 - 0.6667) < 1e-9, m.toString)
  }

  test("rand/ARI: perfect clustering 1/1; one mega-cluster ARI exactly 0") {
    import spark.implicits._
    val truth = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1))
      .toDF("vec_id", "label")
    val perfect = Seq((0L, 10), (1L, 10), (2L, 20), (3L, 20))
      .toDF("vec_id", "cluster")
    val p = Similarity.randIndex(perfect, truth)
      .as[(Long, Double, Double)].head()
    assert(p == ((4L, 1.0, 1.0)), p.toString)
    // one mega-cluster: RI = 2/6 pairs agree, ARI = chance level = 0
    val mega = Seq((0L, 7), (1L, 7), (2L, 7), (3L, 7)).toDF("vec_id", "cluster")
    val m = Similarity.randIndex(mega, truth)
      .as[(Long, Double, Double)].head()
    assert(m == ((4L, 0.3333, 0.0)), m.toString)
  }

  test("NMI: perfect clustering 1 with H = ln 2; mega-cluster 0") {
    import spark.implicits._
    val truth = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1))
      .toDF("vec_id", "label")
    val perfect = Seq((0L, 10), (1L, 10), (2L, 20), (3L, 20))
      .toDF("vec_id", "cluster")
    val p = Similarity.clusterNmi(perfect, truth)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(p._5 == 1.0 && p._2 == 0.6931 && p._3 == 0.6931, p.toString)
    val mega = Seq((0L, 7), (1L, 7), (2L, 7), (3L, 7)).toDF("vec_id", "cluster")
    val m = Similarity.clusterNmi(mega, truth)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(m._2 == 0.0 && m._3 == 0.0 && m._5 == 0.0, m.toString)
  }

  test("calinski/davies-bouldin: separated pairs give huge CH, tiny DB") {
    import spark.implicits._
    // two tight far-apart pairs; k=2 init (vec_id<2) splits them cleanly
    val e = Seq(
      (0L, Array(10.0f, 0.0f)), (1L, Array(0.0f, 10.0f)),
      (2L, Array(10.1f, 0.0f)), (3L, Array(0.0f, 10.1f)))
      .toDF("vec_id", "embedding")
    val ch = Similarity.chIndex(e, k = 2, iters = 1)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(ch._1 == 4L && ch._2 == 2L, ch.toString)
    assert(ch._4 == 0.01 && ch._5 > 10000.0, ch.toString) // ssw, ch
    val db = Similarity.dbIndex(e, k = 2, iters = 1)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    // scatter 0.05 each; R = (500+500)/round4(√2·10.05 · 1e4) = 0.007
    assert(db.map(_._3) == Seq(0.05, 0.05), db.toString)
    assert(db.forall(r => r._4 == 0.007 && r._5 == 0.007), db.toString)
  }

  test("vMeasure: perfect 1/1/1; mega-cluster complete but not homogeneous") {
    import spark.implicits._
    val truth = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1))
      .toDF("vec_id", "label")
    val perfect = Seq((0L, 10), (1L, 10), (2L, 20), (3L, 20))
      .toDF("vec_id", "cluster")
    val p = Similarity.vMeasure(perfect, truth)
      .as[(Long, Double, Double, Double)].head()
    assert(p == ((4L, 1.0, 1.0, 1.0)), p.toString)
    // one mega-cluster: every class inside one cluster (complete, c=1)
    // but the cluster is maximally impure (h=0) -> V=0
    val mega = Seq((0L, 7), (1L, 7), (2L, 7), (3L, 7)).toDF("vec_id", "cluster")
    val m = Similarity.vMeasure(mega, truth)
      .as[(Long, Double, Double, Double)].head()
    assert(m == ((4L, 0.0, 1.0, 0.0)), m.toString)
  }

  test("dunn: separated clusters > 1, inter-min exceeds intra-max") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.99f, 0.14f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.14f, 0.99f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.dunnIndex(e).as[(Long, Long, Double)].head()
    assert(got._1 > got._2 && got._3 > 1.0, got.toString)
  }

  test("phash combination banding: recall 1.0 on 50 seeded pairs at Hamming 1..8") {
    import spark.implicits._
    // the pigeonhole claim, exercised: plant 50 random 60-bit hashes,
    // each with a partner differing in d ∈ [1, 8] random bit positions
    // (d cycles so every distance occurs), plus 50 unrelated hashes.
    // EVERY planted pair must come back with its exact distance —
    // recall is a theorem here, so the floor is 1.0, not a ratio.
    val rnd = new scala.util.Random(42)
    val planted = (0 until 50).map { i =>
      val base = rnd.nextLong() & ((1L << 60) - 1)
      val d = i % 8 + 1
      val bits = rnd.shuffle((0 until 60).toList).take(d)
      val partner = bits.foldLeft(base)((h, b) => h ^ (1L << b))
      (i.toLong * 2, base, i.toLong * 2 + 1, partner, d)
    }
    val noise = (0 until 50).map(i =>
      (1000L + i, rnd.nextLong() & ((1L << 60) - 1)))
    val phashes = (planted.flatMap(p => Seq((p._1, p._2), (p._3, p._4)))
      ++ noise).toDF("media_id", "phash")
    val got = Multimodal.phashBandedPairs(phashes)
      .as[(Long, Long, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    planted.foreach { case (ida, _, idb, _, d) =>
      assert(got.get((ida, idb)).contains(d),
        s"planted Hamming-$d pair ($ida, $idb) missing or misdistanced: ${got.get((ida, idb))}")
    }
    // precision: nothing beyond maxHamming survives the exact verify
    assert(got.values.forall(_ <= 8))
  }

}
