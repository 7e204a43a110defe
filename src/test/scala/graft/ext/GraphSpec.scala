package graft.ext

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def pr(pairs: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] =
    Graph.pageRank(pairs.toDF("doc_a", "doc_b"), iters)
      .as[(Long, Double)].collect().toMap

  /** Driver-side reference: dense synchronous iteration, same recurrence. */
  private def naive(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val edges = pairs.flatMap(p => Seq(p, p.swap))
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (0 until iters).foreach { _ =>
      r = nodes.map { v =>
        val in = edges.filter(_._2 == v).map(_._1)
        v -> (0.15 / n + 0.85 * in.map(m => r(m) / deg(m)).sum)
      }.toMap
    }
    r.map { case (k, v) => k -> math.rint(v * 1e4) / 1e4 }
  }

  test("pageRank on a star: hub outranks leaves; ranks sum to ~1") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val got = pr(star)
    assert(got(1L) > got(2L))
    assert(Seq(2L, 3L, 4L, 5L).map(got).distinct.size == 1) // symmetry
    assert(math.abs(got.values.sum - 1.0) < 1e-2)
  }

  test("pageRank matches the dense reference iteration") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 1L))
    val got = pr(g)
    val want = naive(g, 5)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 2e-4, s"node $k") }
  }

  test("distributed path equals the driver-local path (within rounding ulps)") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 1L))
    val local = pr(g)
    val dist = Graph.pageRank(g.toDF("doc_a", "doc_b"), 5, localThreshold = 0L)
      .as[(Long, Double)].collect().toMap
    // the distributed groupBy sums in shuffle-fetch order — a value within
    // 1 ulp of a .00005 boundary may round differently, so compare with
    // tolerance, not equality
    assert(local.keySet == dist.keySet)
    local.foreach { case (k, v) => assert(math.abs(v - dist(k)) <= 2e-4, s"node $k") }
  }

  test("pageRank is invariant to edge-list partitioning") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
    val a = pr(g)
    val b = Graph.pageRank(g.toDF("doc_a", "doc_b").repartition(7), 5)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("triangleStats: hand-counted census; reversed/duplicate edges canonicalize") {
    // triangle 1-2-3 plus pendant 3-4: degrees 2,2,3,1 →
    // wedges = 1+1+3+0 = 5, triangles = 1, gcc = 3·1/5 = 0.6
    val g = Seq((1L, 2L), (3L, 2L), (1L, 3L), (3L, 4L), (2L, 1L), (1L, 2L))
      .toDF("doc_a", "doc_b") // includes a reversed and an exact duplicate
    val r = Graph.triangleStats(g)
      .as[(Long, Long, Long, Option[Double])].head()
    assert(r == ((4L, 5L, 1L, Some(0.6))), r.toString)
    // triangle-free graph: zero triangles, defined gcc 0
    val path = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val p = Graph.triangleStats(path).as[(Long, Long, Long, Option[Double])].head()
    assert(p == ((2L, 1L, 0L, Some(0.0))), p.toString)
    // single edge: no wedges → gcc undefined (null), not a crash
    val one = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val o = Graph.triangleStats(one).as[(Long, Long, Long, Option[Double])].head()
    assert(o == ((1L, 0L, 0L, None)), o.toString)
  }

  test("localClustering: clique corner = 1.0, hub of strangers = 0.0, pendant excluded") {
    // triangle 1-2-3; node 3 also bridges to 4 and 5 (4,5 unconnected)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (3L, 5L))
      .toDF("doc_a", "doc_b")
    val got = Graph.localClustering(g)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))          // both neighbors connected
    assert(got(2L) == ((2L, 1L, 1.0)))
    // node 3: degree 4, 6 neighbor pairs, 1 connected -> 1/6
    assert(got(3L) == ((4L, 1L, math.rint(1.0 / 6 * 10000) / 10000)))
    assert(!got.contains(4L) && !got.contains(5L)) // degree 1: undefined
  }

  test("degreeDistribution: histogram + Hill alpha; all-deg-1 yields null alpha") {
    // star 1-{2,3,4}: center degree 3, leaves degree 1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val got = Graph.degreeDistribution(star)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 3L && got(3L)._2 == 1L)
    // alpha = 1 + 4 / (3*ln1 + 1*ln3) = 1 + 4/ln3, same on every row
    val a = math.rint((1.0 + 4.0 / math.log(3.0)) * 10000) / 10000
    assert(got.values.forall(_._3.contains(a)))
    // single edge: both nodes degree 1, sum ln d = 0 -> alpha null
    val one = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val o = Graph.degreeDistribution(one).as[(Long, Long, Option[Double])].head()
    assert(o == ((1L, 2L, None)))
  }

  test("assortativity: a star is maximally disassortative, a cycle degenerate") {
    // star 1-{2,3,4}: every stub pairs degree 3 with degree 1 -> r = -1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val s = Graph.assortativity(star).as[(Long, Option[Double])].head()
    assert(s == ((3L, Some(-1.0))))
    // triangle: every degree 2 -> zero variance -> r null
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val t = Graph.assortativity(tri).as[(Long, Option[Double])].head()
    assert(t == ((3L, None)))
  }

  test("clusterConductance: sealed cluster phi 0, bridged cluster counts its cut") {
    // edges: 1-2 (cluster A internal), 3-4 (B internal), 2-3 (A-B bridge)
    val g = Seq((1L, 2L), (3L, 4L), (2L, 3L)).toDF("doc_a", "doc_b")
    val lab = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("doc_id", "cluster")
    val got = Graph.clusterConductance(g, lab)
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // A: nodes {1,2} deg 1+2=3, cut 1, volAll 6 -> min(3,3)=3 -> 1/3
    assert(got("A") == (("A", 2L, 3L, 1L, Some(math.rint(1.0 / 3 * 10000) / 10000))))
    assert(got("B") == (("B", 2L, 3L, 1L, Some(math.rint(1.0 / 3 * 10000) / 10000))))
    // sealed: two disjoint edges, same labels -> cut 0 both
    val g2 = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val s2 = Graph.clusterConductance(g2, lab)
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(s2.forall(r => r._4 == 0L && r._5.contains(0.0)))
  }

  test("adamic-adar: path opens one pair, star opens three") {
    import spark.implicits._
    // path 1-2-3: open pair (1,3) through center 2 (deg 2) -> 1/ln2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val a = Graph.adamicAdar(path).as[(Long, Long, Double)].collect().toSeq
    assert(a == Seq((1L, 3L, 1.4427)), a.toString)
    // star center 1 with leaves 2,3,4: three open pairs, each 1/ln3
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val b = Graph.adamicAdar(star).as[(Long, Long, Double)].collect().toSeq
    assert(b == Seq((2L, 3L, 0.9102), (2L, 4L, 0.9102), (3L, 4L, 0.9102)),
      b.toString)
    // triangle: every wedge closed -> empty
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    assert(Graph.adamicAdar(tri).count() == 0L)
  }

  test("adamic-adar: maxCenterDegree truncates super-hub centers before the wedge join") {
    import spark.implicits._
    // hub 0 touches 1..6 (deg 6), plus edges 1-2 and 2-7. Degrees:
    // 0:6, 2:3, 1:2, rest 1. Cap 5 excludes exactly the hub as a center.
    val hub = (1L to 6L).map(l => (0L, l)) ++ Seq((1L, 2L), (2L, 7L))
    val full = Graph.adamicAdar(hub.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Double)].collect().toSeq
    // uncapped: hub-mediated open pairs like (3,4) are present
    assert(full.exists(p => p._1 == 3L && p._2 == 4L))
    val capped = Graph.adamicAdar(hub.toDF("doc_a", "doc_b"),
        maxCenterDegree = 5L)
      .as[(Long, Long, Double)].collect().toSeq
    // capped: no hub-mediated pair survives...
    assert(!capped.exists(p => p._1 == 3L && p._2 == 4L))
    // ...and the non-hub wedges keep their exact scores: (0,7) and (1,7)
    // both open through center 2 (deg 3) -> 1/ln3
    assert(capped.toSet == Set((0L, 7L, 0.9102), (1L, 7L, 0.9102)))
  }


  test("k-core peeling: path dissolves, triangle is the 2-core, K4 the 3-core") {
    import spark.implicits._
    // path 1-2-3-4: no 2-core; triangle 5-6-7: 2-core, no 3-core
    val g = Seq((1L,2L),(2L,3L),(3L,4L),(5L,6L),(6L,7L),(5L,7L))
      .toDF("doc_a", "doc_b")
    val got = Graph.kCoreSummary(g, Seq(2, 3))
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((2, 3L, 3L), (3, 0L, 0L)), got.toString)
    // K4: 3-core is the whole graph
    val k4 = (for (a <- 1 to 4; b <- a + 1 to 4) yield (a.toLong, b.toLong))
      .toDF("doc_a", "doc_b")
    val g2 = Graph.kCoreSummary(k4, Seq(3)).as[(Int, Long, Long)].collect()
    assert(g2.toSeq == Seq((3, 4L, 6L)), g2.toSeq.toString)
  }


  test("bfs layers: path distances from min node, disconnected reports -1") {
    import spark.implicits._
    // path 1-2-3-4 plus island 9-10: from node 1, dists 0,1,2,3; island -1
    val g = Seq((1L,2L),(2L,3L),(3L,4L),(9L,10L)).toDF("doc_a", "doc_b")
    val got = Graph.bfsLayers(g).as[(Int, Long)].collect().toSeq
    assert(got == Seq((-1, 2L), (0, 1L), (1, 1L), (2, 1L), (3, 1L)),
      got.toString)
    // explicit source in the island
    val fromIsland = Graph.bfsLayers(g, source = Some(9L))
      .as[(Int, Long)].collect().toSeq
    assert(fromIsland == Seq((-1, 4L), (0, 1L), (1, 1L)), fromIsland.toString)
    // maxDepth too small for the path -> loud failure, not a wrong answer
    intercept[IllegalArgumentException] {
      Graph.bfsLayers(g, maxDepth = 2)
    }
  }

  test("closenessCentrality: path 1-2-3 + island pair, hand values") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (9L, 10L)).toDF("doc_a", "doc_b")
    val got = Graph.closenessCentrality(g)
      .as[(Long, Long, Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2, 3L, 0.6667, 1.5),   // 1: d(2)=1, d(3)=2
      (2L, 2L, 1, 2L, 1.0, 2.0),      // middle of the path
      (3L, 2L, 2, 3L, 0.6667, 1.5),
      (9L, 1L, 1, 1L, 1.0, 1.0),      // island pair sees only its twin
      (10L, 1L, 1, 1L, 1.0, 1.0)), got.toString)
    intercept[IllegalArgumentException] {
      Graph.closenessCentrality(g, maxDepth = 1)
    }
  }

  test("inducedSlice: no-op under budget, md5-deterministic keep set above it") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (2L, 5L))
      .toDF("doc_a", "doc_b")
    // budget covers the graph → identical edge set back
    val full = Graph.inducedSlice(g, maxNodes = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(full == Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (2L, 5L)))
    // binding budget: keep = the 3 md5('cslice'||id)-smallest ids, edges
    // require BOTH endpoints kept — recompute the sample independently
    val keep = Seq(1L, 2L, 3L, 4L, 5L)
      .sortBy(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(
        "cslice" + id.toString), id)).take(3).toSet
    val sliced = Graph.inducedSlice(g, maxNodes = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expect = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (2L, 5L))
      .filter { case (a, b) => keep(a) && keep(b) }
    assert(sliced == expect, s"keep=$keep got=$sliced want=$expect")
    // slice bound pinned: the oracle interpolates this constant, and it
    // must stay ABOVE the sf0.1 fixture's V (~1.4k) so driver-scale
    // hashes are slice-invariant
    assert(Graph.ClosenessSliceNodes == 2048)
  }

  test("approxCloseness: all-nodes-as-pivots gives the exact EW values") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (9L, 10L)).toDF("doc_a", "doc_b")
    // numPivots >= V ⇒ every node is a pivot ⇒ ĉ(v) = r(n−1)/(nS)
    // computed over ALL nodes — hand values with n = 5
    val got = Graph.approxCloseness(g, numPivots = 16)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 0.5333),  // r=2 (d=1,2), S=3: 2·4/(5·3)
      (2L, 2L, 2L, 0.8),     // middle of the path: 2·4/(5·2)
      (3L, 2L, 3L, 0.5333),
      (9L, 1L, 1L, 0.8),     // island: 1·4/(5·1)
      (10L, 1L, 1L, 0.8)), got.toString)
    intercept[IllegalArgumentException] {
      Graph.approxCloseness(g, maxDepth = 1)
    }
    intercept[IllegalArgumentException] {
      Graph.approxCloseness(g, numPivots = 0)
    }
  }

  test("approxCloseness ranking tracks exact closenessCentrality at 64/300 pivots") {
    import spark.implicits._
    // deterministic connected graph: a 300-node chain + skip links — a
    // spread of centralities (middle nodes central, ends peripheral)
    val n = 300
    val edges = ((0 until n - 1).map(i => (i.toLong, (i + 1).toLong)) ++
      (0 until n).map(i => (i.toLong, ((i * 7 + 3) % n).toLong)))
      .filter { case (a, b) => a != b }
    val g = edges.toDF("doc_a", "doc_b")
    val exact = Graph.closenessCentrality(g, maxDepth = 16)
      .select("user_id", "closeness").as[(Long, Double)].collect().toMap
    val approx = Graph.approxCloseness(g, numPivots = 64, maxDepth = 16)
      .select("user_id", "closeness_hat").as[(Long, Double)].collect().toMap
    assert(approx.keySet == exact.keySet)
    // the EW guarantee is per-node estimation error (Hoeffding, O(1/√k)
    // of the value scale), not rank stability among near-ties — check
    // the scale-corrected relative error: E[ĉ] = closeness·(n−1)/n on a
    // connected graph, so est = ĉ·n/(n−1) estimates closeness directly
    val rel = exact.keySet.toSeq.map { id =>
      val est = approx(id) * n / (n - 1.0)
      math.abs(est - exact(id)) / exact(id)
    }
    val meanRel = rel.sum / rel.length
    assert(meanRel < 0.10, s"mean relative error $meanRel at 64/300 pivots")
    assert(rel.max < 0.40, s"max relative error ${rel.max}")
    // rank overlap is a WEAK signal on this graph — the skip links make
    // it small-world, so the top decile is a band of near-ties that
    // O(1/√k) noise reshuffles freely; the pinned floor (deterministic:
    // fixed pivot hash) just guards against gross inversions, the real
    // contract is the relative-error bound above
    val topE = exact.toSeq.sortBy { case (id, v) => (-v, id) }.take(10).map(_._1).toSet
    val topA = approx.toSeq.sortBy { case (id, v) => (-v, id) }.take(10).map(_._1).toSet
    assert((topE & topA).size >= 3, s"top-10 overlap ${(topE & topA).size}")
  }

}
