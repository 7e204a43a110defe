package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SuffixLcpSpec extends SparkSpec {
  import spark.implicits._

  /** The SQL form longestRepeats used before the native kernel — the
    * oracle-equivalent reference the expression must match. */
  private val sqlForm =
    """coalesce(
         array_min(filter(transform(sequence(1, least(
             length(ta) - pa + 1, length(tb) - pb + 1)),
           i -> IF(substring(ta, pa + i - 1, 1) <> substring(tb, pb + i - 1, 1),
                   i, CAST(NULL AS INT))),
           x -> x IS NOT NULL)),
         least(length(ta) - pa + 1, length(tb) - pb + 1) + 1) - 1"""

  private def check(rows: (String, Int, String, Int)*): Unit = {
    val df = rows.toDF("ta", "pa", "tb", "pb")
    val got = df.select(
        SuffixLcp.suffixLcp(col("ta"), col("pa"), col("tb"), col("pb")).as("native"),
        expr(sqlForm).cast("long").as("ref"))
      .collect()
    got.zip(rows).foreach { case (r, in) =>
      assert(r.getLong(0) == r.getLong(1),
        s"$in: native=${r.getLong(0)} ref=${r.getLong(1)}")
    }
  }

  test("matches the SQL reference on ASCII suffix pairs") {
    check(
      ("banana", 2, "banana", 4),   // "anana" vs "ana" -> 3
      ("banana", 1, "banana", 1),   // identical suffixes -> full length
      ("abcdef", 1, "abcxyz", 1),   // mismatch at 4th char -> 3
      ("abc", 1, "xyz", 1),         // immediate mismatch -> 0
      ("aaaa", 3, "aa", 1),         // "aa" vs "aa" -> 2 (shorter ends)
      ("hello", 5, "hello", 5),     // single-char tails -> 1
      ("a", 1, "a", 1))
  }

  test("matches the SQL reference on multi-byte codepoints") {
    check(
      ("héllo", 1, "héllo", 1),      // 2-byte é inside the prefix
      ("héllo", 2, "hello", 2),      // é vs e -> 0
      ("日本語abc", 1, "日本語xyz", 1), // 3-byte CJK prefix -> 3
      ("日本語", 2, "日本語", 2),      // aligned CJK suffixes -> 2
      ("aé", 1, "aè", 1))            // shared first byte of é/è -> 1
  }

  test("explicit values (independent of the reference formula)") {
    val vals = Seq(
      ("banana", 2, "banana", 4) -> 3L,
      ("日本語abc", 1, "日本語xyz", 1) -> 3L,
      ("abc", 4, "abc", 1) -> 0L) // pa past the end -> empty suffix
    vals.foreach { case ((ta, pa, tb, pb), want) =>
      val got = Seq((ta, pa, tb, pb)).toDF("ta", "pa", "tb", "pb")
        .select(SuffixLcp.suffixLcp(col("ta"), col("pa"), col("tb"), col("pb")))
        .head().getLong(0)
      assert(got == want, s"($ta,$pa,$tb,$pb): $got != $want")
    }
  }
}
