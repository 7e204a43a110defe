package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  test("native dot is bit-identical to the HOF formulation on fixture embeddings") {
    val e = graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .limit(200).cache()
    val l = e.toDF("a", "ea")
    val r = e.toDF("b", "eb")
    val both = l.crossJoin(r).limit(5000)
      .select(DotProduct.dotNative(col("ea"), col("eb")).as("native"),
        hofDot(col("ea"), col("eb")).as("hof"))
    // bit-identical, not approximately equal: same IEEE summation order
    assert(both.where(col("native") =!= col("hof")).count() == 0)
    assert(both.where(col("native").isNull).count() == 0)
  }

  test("null array gives null, hand vectors give exact values") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None)
    ).toDF("x", "y")
    val got = df.select(DotProduct.dotNative(col("x"), col("y"))).collect()
    assert(got(0).getDouble(0) == 32.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("graft_dot is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .createOrReplaceTempView("emb_sql")
    val got = spark.sql(
      "SELECT vec_id, graft_dot(e, e) AS d FROM emb_sql ORDER BY vec_id LIMIT 5")
      .collect()
    val want = spark.table("emb_sql")
      .select(col("vec_id"), DotProduct.dotNative(col("e"), col("e")).as("d"))
      .orderBy("vec_id").limit(5).collect()
    assert(got.map(_.toString).sameElements(want.map(_.toString)))
    // wrong arity through SQL gets a clean error
    val err = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0d))").collect())
    assert(err.getMessage.contains("2 arguments"))
  }

  test("graft_shingles and graft_cdc_chunks are callable from SQL") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT graft_shingles(array('a','b','c','d'), 2) AS sh,
        |       graft_cdc_chunks(array('a','b','c','d'), 3, 8) AS ch""".stripMargin)
      .collect().head
    assert(got.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(got.getSeq[String](1).mkString(" ") == "a b c d")
    // non-literal parameter rejected with a clean error
    val err = intercept[Exception](
      spark.sql("SELECT graft_shingles(array('a'), CAST(rand()*2 AS INT))").collect())
    assert(err.getMessage.contains("literal"))
  }

  test("two instances share one codegen stage without local-name collisions") {
    // ADVICE r1: with non-nullable children nullSafeCodeGen emits the body
    // unbraced at method scope, so fixed local names would collide when two
    // DotProducts land in one stage — Janino error, silent interpreted
    // fallback. CODEGEN_ONLY turns that silent fallback into a test failure.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0)))
        .toDF("a", "b", "c")
        // coalesce: make inputs provably non-nullable to the planner
        .select(coalesce(col("a"), array(lit(0.0))).as("a"),
          coalesce(col("b"), array(lit(0.0))).as("b"),
          coalesce(col("c"), array(lit(0.0))).as("c"))
      val got = df.select(
        DotProduct.dotNative(col("a"), col("b")).as("ab"),
        DotProduct.dotNative(col("a"), col("c")).as("ac"),
        (DotProduct.dotNative(col("b"), col("c")) +
          DotProduct.dotNative(col("c"), col("c"))).as("bc_cc")).collect()(0)
      assert(got.getDouble(0) == 11.0)  // 1*3 + 2*4
      assert(got.getDouble(1) == 17.0)  // 1*5 + 2*6
      assert(got.getDouble(2) == 39.0 + 61.0)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("the native dot participates in whole-stage codegen") {
    val e = graft.Tables.embeddings(spark, sf())
      .select(col("embedding").cast("array<double>").as("e"))
    val q = e.select(DotProduct.dotNative(col("e"), col("e")).as("d"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no WSCG stage in:\n$plan")
    // and the interpreted-HOF marker is absent
    assert(!plan.toLowerCase.contains("zip_with"))
  }
}
