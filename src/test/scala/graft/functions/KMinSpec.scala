package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMinSpec extends SparkSpec {
  import spark.implicits._

  private def ref(vs: Seq[String], k: Int): Seq[String] =
    vs.distinct.sorted.take(k)

  test("kernel equals sorted-distinct-take-k under any arrival order") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { trial =>
      val k = 1 + rnd.nextInt(12)
      val n = rnd.nextInt(200)
      // duplicates on purpose: the admit-path dedup must hold
      val vs = Seq.fill(n)(f"${rnd.nextInt(60)}%04x")
      val buf = vs.foldLeft(new KMin.Buf)((b, v) => KMin.add(b, v, k))
      assert(KMin.result(buf) == ref(vs, k), s"trial $trial k=$k")
    }
  }

  test("merge of split streams equals the unsplit result; nulls ignored") {
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(300)(f"${rnd.nextInt(80)}%05d")
    val k = 16
    val (l, r) = vs.splitAt(137)
    val a = l.foldLeft(new KMin.Buf)((b, v) => KMin.add(b, v, k))
    val b = r.foldLeft(new KMin.Buf)((b2, v) => KMin.add(b2, v, k))
    assert(KMin.result(KMin.merge(a, b, k)) == ref(vs, k))
    val withNull = KMin.add(a, null, k)
    assert(KMin.result(withNull).forall(_ != null))
  }

  test("SQL surface graft_kmin matches sort_array(collect_list) take-k on real data") {
    val docs = graft.Tables.documents(spark, sf())
    val hs = docs.select(col("lang"), md5(col("text")).as("h")).distinct()
    val got = hs.groupBy("lang")
      .agg(expr("graft_kmin(h)").as("sig"))
      .as[(String, Seq[String])].collect().toMap
    val want = hs.groupBy("lang")
      .agg(slice(sort_array(collect_list(col("h"))), 1, 256).as("sig"))
      .as[(String, Seq[String])].collect().toMap
    assert(got == want)
  }
}
