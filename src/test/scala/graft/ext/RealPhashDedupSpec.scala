package graft.ext

import graft.SparkSpec

/** Row contract of the rows-only battery entry `ext_real_phash_dedup`
  * (the REAL javax.imageio decode path, timed in every battery sweep):
  * the planted ground truth must come back exactly — one pair per doc,
  * base ↔ noisy re-encode, no cross-pairs — and the md5 stub must find
  * NOTHING on the same media (proving the pairs came from decoded
  * pixels, not payload bytes). */
class RealPhashDedupSpec extends SparkSpec {
  import spark.implicits._

  test("ext_real_phash_dedup recovers exactly the 200 planted pairs") {
    val out = graft.queries.ExtQueries.realPhashDedupQ(spark, sf())
      .as[(Long, Long, Int)].collect().toList
    val off = Multimodal.PlantedNearDupOffset
    assert(out.size == 200, s"expected 200 planted pairs, got ${out.size}")
    assert(out.forall { case (a, b, h) => b == a + off && h <= 8 },
      "every pair must be (doc_id, doc_id + offset) within Hamming 8")
    assert(out.map(_._1).distinct.size == 200, "one pair per planted doc")
    // same media through the md5 stub: all byte streams distinct, so the
    // stub (payload hashing, no pixel decode) must find zero pairs
    val media = Multimodal.plantedPngMedia(
      graft.Tables.documents(spark, sf()), 10)
    val stub = Multimodal.phashBandedPairs(Multimodal.mediaPhashes(media))
    assert(stub.isEmpty, "stub hashing must not pair re-encoded PNGs")
  }
}
