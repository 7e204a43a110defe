package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {

  test("skewReport ranks the hot key first with exact share and skew factor") {
    import spark.implicits._
    // key 7: 6 rows; keys 1..3: 2 rows each → total 12, 4 keys, mean 3
    val d = (Seq.fill(6)(7L) ++ Seq(1L, 1L, 2L, 2L, 3L, 3L)).toDF("k")
    val got = ScaleJoins.skewReport(d, "k", 3)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.head == ((7L, 6L, 0.5, 2.0)), got.toString) // 6/12, 6/3
    assert(got.map(_._1) == Seq(7L, 1L, 2L)) // ties by key ascending
  }

  test("saltedJoin returns exactly the plain join result (incl. duplicate keys)") {
    import spark.implicits._
    // skewed large side: key 1 is hot; small side has a duplicate key
    val large = (Seq.fill(500)(1) ++ (2 to 50)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1, "a"), (1, "a2"), (2, "b"), (99, "z")).toDF("k", "v")
    val plain = large.join(small, Seq("k")).collect()
      .map(_.toString).sorted
    val salted = ScaleJoins.saltedJoin(large, small, "k", saltFactor = 8).collect()
      .map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("saltedJoin spreads a hot key over multiple partitions") {
    import spark.implicits._
    val large = Seq.fill(1000)(1).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1, "a")).toDF("k", "v")
    val joined = ScaleJoins.saltedJoin(large, small, "k", saltFactor = 4)
    val parts = joined
      .withColumn("p", spark_partition_id())
      .groupBy("p").count().collect()
    // without salting every row of key 1 lands in ONE reduce partition
    assert(parts.length > 1, s"hot key not spread: ${parts.mkString(",")}")
  }

  test("bloomSemiJoin equals the plain semi-join even when the filter is saturated") {
    import spark.implicits._
    val fact = (1L to 2000L).map(k => (k % 100, k)).toDF("k", "payload")
    val keys = (0L to 30L).map(k => (k * 3, s"v$k")).toDF("kk", "v")
    val plain = fact.join(keys.select(col("kk").as("k")).distinct(),
      Seq("k"), "left_semi").collect().map(_.toString).sorted
    // expectedItems=1 saturates the filter → many false positives; the
    // trailing exact semi-join must still remove every one of them
    val bloomed = ScaleJoins.bloomSemiJoin(fact, keys, "k", "kk",
      expectedItems = 1L, fpp = 0.5).collect().map(_.toString).sorted
    assert(bloomed.sameElements(plain))
  }

  test("bloom pre-filter drops non-matching fact rows before the join") {
    import spark.implicits._
    val fact = (1L to 10000L).toDF("k")
    val keys = Seq(5L, 10L).toDF("kk")
    val bf = keys.stat.bloomFilter("kk", 1000L, 0.01)
    val kept = fact.collect().count(r => bf.mightContainLong(r.getLong(0)))
    // ≥ 2 true keys, ≤ 2 + fpp·N false positives (generous 3× margin)
    assert(kept >= 2 && kept <= 2 + (0.03 * 10000).toInt, s"kept=$kept")
  }

  test("joins between co-bucketed tables plan without a shuffle exchange") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val li = graft.Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
      val ord = graft.Tables.orders(spark, sf()).select("o_orderkey", "o_custkey")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      ScaleJoins.writeBucketed(li, "li_b", "l_orderkey", 8)
      ScaleJoins.writeBucketed(ord, "ord_b", "l_orderkey", 8)
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and the result matches the plain join
      val expect = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
