package graft.lda

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the Gibbs kernel invariants (SURVEY §5.2(2)):
  * count conservation the reference maintains by construction
  * (model.cc:79-88, document.cc:58-67) must hold for every corpus shape,
  * seed, and train/infer mode.
  */
object InvariantProps extends Properties("lda.invariants") {

  private val smallK = Gen.choose(2, 8)

  /** A random doc over vocab [0, v): sorted distinct word ids + counts. */
  private def docGen(v: Int, k: Int): Gen[DocState] = for {
    nWords <- Gen.choose(1, math.min(v, 6))
    ids <- Gen.pick(nWords, 0 until v)
    counts <- Gen.listOfN(nWords, Gen.choose(1, 5))
    docId <- Gen.choose(0L, 1000L)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield DocState.init(docId, ids.toArray.sorted, counts.toArray, k, seed)

  private def modelFromDocs(docs: Seq[DocState], v: Int, k: Int): Array[Long] = {
    val m = new Array[Long]((v + 1) * k)
    docs.foreach { d =>
      for (i <- d.wordIds.indices; j <- d.offsets(i) until d.offsets(i + 1)) {
        m(d.wordIds(i) * k + d.topics(j)) += 1
        m(v * k + d.topics(j)) += 1
      }
    }
    m
  }

  property("DocState.init: CSR well-formed, topics in range, deterministic") =
    forAll(smallK, Gen.choose(2, 20), Gen.choose(0L, Long.MaxValue)) { (k, v, seed) =>
      forAll(docGen(v, k)) { d =>
        val monotone = d.offsets.sliding(2).forall(p => p(0) <= p(1))
        val inRange = d.topics.forall(t => t >= 0 && t < k)
        val total = d.offsets.last == d.topics.length
        monotone && inRange && total
      }
    }

  property("sweep conserves: doc histogram, model column sums, row sums") =
    forAll(smallK, Gen.choose(3, 15), Gen.oneOf(true, false),
      Gen.choose(0L, Long.MaxValue)) { (k, v, train, seed) =>
      forAll(Gen.listOfN(3, docGen(v, k))) { docs =>
        val model = modelFromDocs(docs, v, k)
        val totalOcc = docs.map(_.numOccurrences).sum
        val rng = new SplitMix64(seed)
        val dist = new Array[Double](k)
        val swept = docs.map { d =>
          val topics = d.topics.clone()
          val hist = d.topicHistogram(k)
          Gibbs.sweepDocument(d.wordIds, d.offsets, topics, hist, model, v,
            0.1, 0.01, train, rng, dist)
          (d.copy(topics = topics), hist)
        }
        // per-doc: histogram tracks assignments, length conserved
        val docOk = swept.forall { case (d, hist) =>
          val re = d.topicHistogram(k)
          hist.sameElements(re) && hist.sum == d.numOccurrences
        }
        // model: Σ_w n(w,t) == n(t); total count conserved; non-negative
        val colOk = (0 until k).forall { t =>
          (0 until v).map(w => model(w * k + t)).sum == model(v * k + t)
        }
        val totOk = (0 until k).map(t => model(v * k + t)).sum ==
          (if (train) totalOcc else totalOcc) // inference must not change it either
        val nonNeg = model.forall(_ >= 0)
        // inference mode: model untouched
        val frozenOk = train || model.sameElements(modelFromDocs(docs, v, k))
        docOk && colOk && totOk && nonNeg && frozenOk
      }
    }

  property("sampleFromCdf: index in range and respects zero-weight prefixes") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 10.0)), Gen.choose(1e-9, 0.999999)) {
      (ws, u) =>
      val dist = ws.toArray
      Prop.classify(dist.sum == 0, "degenerate") {
        if (dist.sum == 0) Prop.passed // reference LOG(FATAL)s; we clamp — skip
        else {
          val i = Gibbs.sampleFromCdf(dist, u)
          val inRange = i >= 0 && i < dist.length
          // chosen index has positive weight unless fp clamp hit the end
          val positive = dist(i) > 0 || i == dist.length - 1
          inRange && positive
        }
      }
    }

  property("sampleFromCdf is monotone in u") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.01, 10.0)),
      Gen.choose(0.0, 0.99), Gen.choose(0.0, 0.99)) { (ws, u1, u2) =>
      val dist = ws.toArray
      val (lo, hi) = if (u1 <= u2) (u1, u2) else (u2, u1)
      Gibbs.sampleFromCdf(dist, lo) <= Gibbs.sampleFromCdf(dist, hi)
    }

  property("topicDistribution weights are positive and normalizable (L2)") =
    forAll(smallK, Gen.choose(3, 15), Gen.oneOf(true, false)) { (k, v, train) =>
      forAll(docGen(v, k)) { d =>
        val model = modelFromDocs(Seq(d), v, k)
        val hist = d.topicHistogram(k)
        val dist = new Array[Double](k)
        // first occurrence of first word
        Gibbs.topicDistribution(model, v * k, v * 0.01, d.wordIds(0) * k,
          hist, d.topics(0), train, 0.1, 0.01, dist)
        dist.forall(_ > 0) && Prob.isValidDistribution(Prob.normalize(dist))
      }
    }

  property("Prob.isValidDistribution accepts normalized, rejects shifted") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.01, 10.0))) { ws =>
      val p = Prob.normalize(ws.toArray)
      Prob.isValidDistribution(p) &&
        !Prob.isValidDistribution(p.map(_ + 2e-5 / p.length * 2)) &&
        !Prob.isValidDistribution(p.updated(0, -p(0)))
    }

  property("SplitMix64.nextInt/nextDouble stay in bounds") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(1, 1000)) {
      (seed, bound) =>
      val rng = new SplitMix64(seed)
      (0 until 100).forall { _ =>
        val d = rng.nextDouble()
        val i = rng.nextInt(bound)
        d >= 0.0 && d < 1.0 && i >= 0 && i < bound
      }
    }

  property("Rng.mix derives distinct streams per (docId, iter)") =
    forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(0L, 10000L)) { (seed, a) =>
      Rng.mix(seed, a, 0) != Rng.mix(seed, a + 1, 0) &&
        Rng.mix(seed, a, 0) != Rng.mix(seed, a, 1)
    }
}
