package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two-pass distributed NTILE must be bit-identical to WindowExec's
  * `ntile` for every (n, buckets) shape — including n < buckets, n not
  * divisible by buckets (the first n%b buckets take the extra row), and
  * duplicate order keys (rank order inside ties is completed by the
  * tiebreaker column, as both forms require for determinism). */
class ExactNtileSpec extends SparkSpec {
  import spark.implicits._

  private def compare(n: Int, buckets: Int, partitions: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    // duplicate-heavy keys force the (key, id) tiebreak path
    val df = (0 until n).map(i => ((i * 7919) % 13, i.toLong)).toDF("key", "id")
      .repartition(partitions)
    val want = df.select(col("key"), col("id"),
        ntile(buckets).over(Window.orderBy(col("key"), col("id"))).as("b"))
      .as[(Int, Long, Int)].collect().toSet
    val got = ExtQueries.exactNtile(df, Seq("key", "id"), buckets, "b")
      .as[(Int, Long, Int)].collect().toSet
    assert(got == want, s"n=$n buckets=$buckets parts=$partitions")
  }

  test("exactNtile equals window ntile across shapes") {
    for ((n, b) <- Seq((500, 10), (501, 10), (509, 8), (7, 10), (1, 3),
        (13, 13), (100, 7), (64, 64)))
      compare(n, b, partitions = 5)
  }

  test("exactNtile is partitioning-invariant") {
    for (p <- Seq(1, 3, 11)) compare(257, 6, p)
  }
}
