package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.jw(org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("kernel equals DuckDB jaro_winkler_similarity to the last ulp") {
    // expected values captured from duckdb 1.0 `jaro_winkler_similarity`
    val expected = Seq(
      ("", "", 0.0),
      ("a", "", 0.0),
      ("abc", "abc", 1.0),
      ("martha", "marhta", 0.9611111111111111),  // prefix 3, 1 transposition
      ("dixon", "dicksonx", 0.8133333333333332), // prefix 2
      ("jellyfish", "smellyfish", 0.8962962962962964), // prefix 0
      ("dwayne", "duane", 0.8400000000000001),
      ("abcdef", "badcfe", 0.8333333333333334),  // 3 transpositions, prefix 0
      ("aaaaaab", "aaaaaac", 0.9428571428571428), // prefix capped at 4
      ("ab", "ba", 0.0),                          // window 0: no matches
      ("abcd", "abce", 0.8833333333333334),
      ("crate", "trace", 0.7333333333333334),     // jaro > .7 but prefix 0
      ("aaxxxxxxxx", "aayyyyyyyy", 0.4666666666666666), // ≤ boost threshold:
      ("abcdefgh", "abcdxxxx", 0.6666666666666666))     // NO prefix bonus
    expected.foreach { case (a, b, e) =>
      assert(jw(a, b) == e, s"jw($a, $b) = ${jw(a, b)} != $e")
      assert(jw(b, a) == e, s"symmetric jw($b, $a)")
    }
  }

  test("column API + SQL registration plan the native expression") {
    val d = Seq(("martha", "marhta"), ("ab", "ba")).toDF("a", "b")
    val viaCol = d.select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("s"))
      .as[Double].collect().sorted
    d.createOrReplaceTempView("jw_t")
    val viaSql = spark.sql("SELECT graft_jaro_winkler(a, b) AS s FROM jw_t")
      .as[Double].collect().sorted
    assert(viaCol.toSeq == Seq(0.0, 0.9611111111111111))
    assert(viaCol.sameElements(viaSql))
  }

  test("null in, null out; type check rejects non-strings") {
    val d = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    val got = d.select(JaroWinkler.jaroWinkler(col("a"), col("b")))
      .collect().head
    assert(got.isNullAt(0))
    val e = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b")
        .select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }

  test("expression stays inside whole-stage codegen") {
    val d = spark.range(100).select(
      concat(lit("doc"), col("id")).as("a"), concat(lit("dc"), col("id")).as("b"))
    val q = d.select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("s"))
      .where(col("s") > 0.5)
    q.collect()
    val p = q.queryExecution.executedPlan.toString()
    assert(p.contains("*(1)"), p.take(2000)) // WSCG span covers the projection
  }
}
