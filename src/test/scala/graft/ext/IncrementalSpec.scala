package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("tableDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v")
    val nu = Seq((2L, "b", 2.0), (3L, "c", 99.0), (4L, "d", 4.0))
      .toDF("k", "s", "v")
    val got = Incremental.tableDiff(old, nu, "k", Seq("s", "v"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(1L -> "removed", 3L -> "changed", 4L -> "added"),
      got.toSeq.toString)
  }

  test("tableDiff is NULL-safe: NULL≠value, NULL=NULL, and ''≠NULL") {
    val old = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option("")), (4L, Option.empty[String])).toDF("k", "s")
    val nu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option.empty[String]), (4L, Option("y"))).toDF("k", "s")
    val got = Incremental.tableDiff(old, nu, "k", Seq("s"))
      .as[(Long, String)].collect().sortBy(_._1)
    // 2: NULL→NULL is unchanged (dropped); 3: ''→NULL IS a change
    assert(got.toSeq == Seq(1L -> "changed", 3L -> "changed", 4L -> "changed"),
      got.toSeq.toString)
  }

  test("tableDiff: adjacent-field shuffling is a change (separator in fp)") {
    val old = Seq((1L, "ab", "c")).toDF("k", "a", "b")
    val nu = Seq((1L, "a", "bc")).toDF("k", "a", "b")
    val got = Incremental.tableDiff(old, nu, "k", Seq("a", "b"))
      .as[(Long, String)].collect()
    assert(got.toSeq == Seq(1L -> "changed"), got.toSeq.toString)
  }

  test("tableDiff: values containing separator/marker chars never collide") {
    // length-prefixed fields are self-delimiting: a value embedding any
    // would-be separator cannot shift bytes across a field boundary
    val old = Seq((1L, "av", "b"), (2L, "n", "x")).toDF("k", "a", "b")
    val nu = Seq((1L, "a", "vb"), (2L, "n", "x")).toDF("k", "a", "b")
    val got = Incremental.tableDiff(old, nu, "k", Seq("a", "b"))
      .as[(Long, String)].collect()
    assert(got.toSeq == Seq(1L -> "changed"), got.toSeq.toString)
  }

  test("tableDiff of a snapshot against itself is empty") {
    val e = graft.Tables.events(spark, sf()).select("event_id", "event_type", "value")
    assert(Incremental.tableDiff(e, e, "event_id", Seq("event_type", "value")).isEmpty)
  }
}
