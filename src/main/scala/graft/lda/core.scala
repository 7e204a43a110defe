package graft.lda

/** Core LDA data model (SURVEY.md §1).
  *
  * - [[DocState]] mirrors the reference's CSR document layout
  *   (`/root/reference/common.h:166-205`): unique word ids, per-word offset
  *   ranges into a flat per-occurrence topic array. The CSR shape is also
  *   the right sparse encoding for Tungsten `UnsafeArrayData`.
  * - The model n(w,k) is a flat `Array[Long]` of (V+1)×K — word rows first,
  *   global topic row n(k) last — mirroring the single contiguous
  *   allocation of `/root/reference/model.cc:51-67`. The flat layout makes
  *   the distributed aggregation's combOp a plain array add.
  * - [[SplitMix64]] replaces the reference's process-global `rand()`
  *   (`common.h:207-219`): runs are seeded and reproducible (SURVEY §7.4
  *   quirk #5 — our improvement over the reference), with independent
  *   streams derived per (seed, docId, iteration).
  */
final case class LdaConfig(
    numTopics: Int,
    alpha: Double,
    beta: Double,
    totalIterations: Int,
    burnInIterations: Int = 0,
    computeLikelihood: Boolean = false,
    seed: Long = 42L) {
  require(numTopics > 1, "num_topics must be >= 2")
  require(alpha > 0 && beta > 0, "alpha and beta must be > 0")
  require(totalIterations > 0, "total_iterations must be > 0")
  require(burnInIterations >= 0 && burnInIterations < totalIterations,
    "0 <= burn_in_iterations < total_iterations")
}

/** One document: CSR over unique words.
  *  - wordIds(i): dense vocab id of the i-th unique word
  *  - offsets(i) until offsets(i+1): this word's occurrence span in topics
  *  - topics(j): current topic assignment of occurrence j
  */
final case class DocState(
    docId: Long,
    wordIds: Array[Int],
    offsets: Array[Int],
    topics: Array[Int]) {

  def numOccurrences: Int = if (offsets.isEmpty) 0 else offsets(offsets.length - 1)

  /** n(d,·): recount from assignments (document.cc:84-91). */
  def topicHistogram(k: Int): Array[Long] = {
    val h = new Array[Long](k)
    var j = 0
    while (j < topics.length) { h(topics(j)) += 1; j += 1 }
    h
  }
}

object DocState {
  /** Build a doc with uniform-random initial topics (S1,
    * lda.cc:48-84 / infer.cc:68-81), seeded per docId so initialization is
    * independent of partitioning. wordIds must be sorted+distinct. */
  def init(docId: Long, wordIds: Array[Int], counts: Array[Int], numTopics: Int, seed: Long): DocState = {
    val n = wordIds.length
    val offsets = new Array[Int](n + 1)
    var total = 0
    var i = 0
    while (i < n) { offsets(i) = total; total += counts(i); i += 1 }
    offsets(n) = total
    val rng = new SplitMix64(Rng.mix(seed, docId, 0x1DA1L))
    val topics = new Array[Int](total)
    var j = 0
    while (j < total) { topics(j) = rng.nextInt(numTopics); j += 1 }
    DocState(docId, wordIds, offsets, topics)
  }
}

/** Fast, allocation-free, splittable PRNG (public SplitMix64 constants,
  * Steele et al., "Fast Splittable Pseudorandom Number Generators"). */
final class SplitMix64(private var state: Long) {
  def nextLong(): Long = {
    state += 0x9E3779B97F4A7C15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  /** Uniform in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  /** Uniform in [0, bound) — scaled-double form like the reference's
    * RandInt (common.h:215-218), which deliberately avoids `rand() % bound`. */
  def nextInt(bound: Int): Int = (nextDouble() * bound).toInt
}

object Prob {
  /** L2 (common.cc:21-29): a probability distribution sums to 1 ± eps. */
  def isValidDistribution(dist: Array[Double], eps: Double = 1e-5): Boolean = {
    var s = 0.0
    var i = 0
    while (i < dist.length) {
      if (dist(i) < 0) return false
      s += dist(i)
      i += 1
    }
    math.abs(s - 1.0) < eps
  }

  /** Normalize non-negative weights to a distribution (sum 1). */
  def normalize(weights: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < weights.length) { s += weights(i); i += 1 }
    require(s > 0, "degenerate weight vector")
    weights.map(_ / s)
  }
}

object Rng {
  /** Mix (seed, a, b) into an independent stream seed. */
  def mix(seed: Long, a: Long, b: Long): Long = {
    var z = seed ^ (a * 0xBF58476D1CE4E5B9L) ^ (b * 0x94D049BB133111EBL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
