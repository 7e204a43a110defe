package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL++ vocab estimate is within the rsd bound of the exact count") {
    val d = graft.Tables.documents(spark, sf())
    val exact = graft.Tables.docsTokenized(spark, sf())
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(countDistinct(col("tok")).as("v"))
      .as[(String, Long)].collect().toMap
    val approx = Sketches.approxVocabSize(d, "lang", rsd = 0.05)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (lang, v) =>
      val a = approx(lang).toDouble
      assert(math.abs(a - v) / v <= 0.15, s"$lang exact=$v approx=$a") // 3×rsd
    }
  }

  test("Misra-Gries is exact at capacity >= distinct count") {
    val toks = graft.Tables.docsTokenized(spark, sf())
    val truth = toks.groupBy("tok").count().as[(String, Long)].collect()
      .sortBy { case (t, n) => (-n, t) }.take(10)
    val mg = Sketches.heavyHitters(toks, col("tok"), capacity = 64, k = 10)
      .as[(String, Long)].collect()
    assert(mg.toSeq == truth.toSeq)
  }

  test("Misra-Gries at small capacity: undercount bounded by N/(capacity+1), heavy items survive") {
    val toks = graft.Tables.docsTokenized(spark, sf())
    val truth = toks.groupBy("tok").count().as[(String, Long)].collect().toMap
    val n = truth.values.sum
    val cap = 8
    val mg = Sketches.heavyHitters(toks, col("tok"), capacity = cap, k = cap)
      .as[(String, Long)].collect().toMap
    val bound = n / (cap + 1)
    mg.foreach { case (t, c) =>
      assert(c <= truth(t), s"$t overcounted: $c > ${truth(t)}")
      assert(c >= truth(t) - bound, s"$t undercut past bound: $c vs ${truth(t)}")
    }
    truth.filter(_._2 > bound).keys.foreach { t =>
      assert(mg.contains(t), s"heavy item $t missing (count=${truth(t)}, bound=$bound)")
    }
  }

  test("SQL UDAF graft_heavy_hitters matches the treeAggregate form (exact regime)") {
    graft.Tables.docsTokenized(spark, sf()).createOrReplaceTempView("graft_toks")
    val viaSql = spark.sql(
      """SELECT tok, c FROM (
        |  SELECT explode(graft_heavy_hitters(tok)) AS (tok, c) FROM graft_toks
        |) ORDER BY c DESC, tok LIMIT 20""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val viaRdd = Sketches.heavyHitters(
        graft.Tables.docsTokenized(spark, sf()), col("tok"), capacity = 64, k = 20)
      .as[(String, Long)].collect().toSeq
    // capacity 64 >= V=31 distinct tokens -> both EXACT, so they agree
    assert(viaSql == viaRdd)
  }

  test("SQL UDAF groups independently: per-lang heavy hitters are exact per group") {
    val d = graft.Tables.documents(spark, sf())
    d.select(col("lang"), explode(graft.Tables.tokensOf(col("text"))).as("tok"))
      .createOrReplaceTempView("graft_lang_toks")
    val got = spark.sql(
      """SELECT lang, hh FROM (
        |  SELECT lang, graft_heavy_hitters(tok) AS hh FROM graft_lang_toks GROUP BY lang
        |)""".stripMargin).collect()
    val exact = spark.sql(
      """SELECT lang, tok, COUNT(*) AS c FROM graft_lang_toks GROUP BY lang, tok""")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    got.foreach { r =>
      val lang = r.getString(0)
      val hh = r.getMap[String, Long](1).toMap
      assert(hh == exact(lang), s"lang=$lang") // capacity >= per-group V -> exact
    }
  }

  test("count-min estimates are one-sided and within eps*N") {
    val toks = graft.Tables.docsTokenized(spark, sf())
    val sketch = Sketches.cmsOf(toks, col("tok"), eps = 0.01, confidence = 0.99)
    val truth = toks.groupBy("tok").count().as[(String, Long)].collect()
    val n = truth.map(_._2).sum
    truth.foreach { case (tok, c) =>
      val est = Sketches.cmsEstimate(sketch, tok)
      assert(est >= c, s"$tok underestimated: $est < $c")
      assert(est <= c + (0.01 * n).toLong + 1, s"$tok over bound: $est vs $c (N=$n)")
    }
  }

  test("quantile sketch is exact when capacity >= n, at any partitioning") {
    // values 0..n-1 shuffled deterministically: rank of value v is v+1
    val n = 5000
    val vals = new scala.util.Random(7).shuffle((0 until n).toVector).map(_.toDouble)
    for (parts <- Seq(1, 4, 13)) {
      val df = spark.createDataset(vals).toDF("v").repartition(parts)
      val got = Sketches.quantilesOf(df, col("v"), capacity = n, Seq(0.1, 0.5, 0.99))
        .as[(Double, Double)].collect().toMap
      got.foreach { case (q, v) =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        assert(v == (target - 1).toDouble, s"q=$q parts=$parts")
      }
    }
  }

  test("quantile sketch rank error is within n*log2(n/c)/c below capacity") {
    val n = 20000
    val c = 256
    val vals = new scala.util.Random(11).shuffle((0 until n).toVector).map(_.toDouble)
    val bound = n * math.max(1.0, math.ceil(math.log(n.toDouble / c) / math.log(2))) / c
    for (parts <- Seq(1, 8)) {
      val df = spark.createDataset(vals).toDF("v").repartition(parts)
      val got = Sketches.quantilesOf(df, col("v"), c, Seq(0.01, 0.25, 0.5, 0.75, 0.99))
        .as[(Double, Double)].collect()
      got.foreach { case (q, v) =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        val rank = v.toLong + 1 // distinct 0..n-1 values
        assert(math.abs(rank - target) <= bound,
          s"q=$q parts=$parts rank=$rank target=$target bound=$bound")
      }
    }
  }

  test("SQL UDAF graft_quantiles is exact per group below capacity") {
    val d = graft.Tables.documents(spark, sf())
    d.createOrReplaceTempView("graft_docs_q")
    val got = spark.sql(
      "SELECT lang, graft_quantiles(CAST(n_chars AS DOUBLE)) AS qs FROM graft_docs_q GROUP BY lang")
      .as[(String, Seq[Double])].collect().toMap
    val groups = d.as[(Long, String, String, String, Long)].collect()
      .groupBy(_._3).view.mapValues(_.map(_._5.toDouble).sorted).toMap
    for ((lang, vals) <- groups; (q, i) <- Seq(0.25, 0.5, 0.75, 0.9, 0.99).zipWithIndex) {
      val want = vals(math.max(1, math.ceil(q * vals.length).toInt) - 1)
      assert(got(lang)(i) == want, s"lang=$lang q=$q")
    }
  }

  test("quantile surfaces skip NULL/NaN/Inf instead of crashing") {
    val d = Seq[Option[Double]](Some(1.0), None, Some(Double.NaN),
      Some(Double.PositiveInfinity), Some(2.0), Some(3.0)).toDF("v")
    val got = Sketches.quantilesOf(d, col("v"), 64, Seq(0.5, 1.0))
      .as[(Double, Double)].collect().toMap
    assert(got == Map(0.5 -> 2.0, 1.0 -> 3.0)) // over the 3 finite values
    d.createOrReplaceTempView("graft_qnull")
    val udaf = spark.sql("SELECT graft_quantiles(v) AS qs FROM graft_qnull")
      .as[Seq[Double]].head()
    // exact over the finite multiset {1,2,3} at probes .25/.5/.75/.9/.99 —
    // proves the junk was SKIPPED, not decoded as 0.0 or taken along
    assert(udaf == Seq(1.0, 2.0, 3.0, 3.0, 3.0), udaf)
  }

  test("quantile sketch merge is level-aware: summaries combine without n loss") {
    import Sketches.QuantileSketch._
    val a = (0 until 1000).foldLeft(new QS())((s, i) => add(s, i.toDouble, 64))
    val b = (1000 until 2000).foldLeft(new QS())((s, i) => add(s, i.toDouble, 64))
    val m = merge(a, b, 64)
    assert(m.n == 2000)
    // median of 0..1999 must land near 1000 within the deterministic bound
    val med = quantile(m, 0.5)
    assert(math.abs(med - 1000.0) <= 2000 * 5.0 / 64)
  }

  test("requireExact fails loudly when compaction fires, passes below capacity") {
    val small = spark.range(10).select(col("id").cast("double").as("v"))
    // below capacity: exact and quiet
    val ok = Sketches.quantilesOf(small, col("v"), 64, Seq(0.5), requireExact = true)
      .as[(Double, Double)].head()
    assert(ok == ((0.5, 4.0))) // PERCENTILE_DISC: rank ceil(.5*10)=5 → value 4.0
    // above capacity: the exactness precondition is violated → throws
    val big = spark.range(1000).select(col("id").cast("double").as("v"))
    val e = intercept[Exception] {
      Sketches.quantilesOf(big, col("v"), 64, Seq(0.5), requireExact = true).collect()
    }
    assert(e.getMessage.contains("compacted"), e.getMessage)
    // SQL surface: graft_quantiles_exact (capacity 8192) throws once a
    // group exceeds capacity and compacts
    spark.range(10000).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("graft_qexact")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_quantiles_exact(v) FROM graft_qexact").collect()
    }
    assert(e2.getMessage != null)
  }

  private def mdHllOcc = {
    val d = graft.Tables.documents(spark, sf())
    d.select(col("source"), explode(Dedup.shingles(Dedup.tokens(col("text")), 3)).as("sh"))
  }

  test("md5-HLL registers: valid ranges, duplicate- and partition-invariant") {
    val occ = mdHllOcc
    val regs = Sketches.hllRegisters(occ, "source", col("sh"))
      .as[(String, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(regs.forall(r => r._2 >= 0 && r._2 < 256))
    assert(regs.forall(r => r._3 >= 1 && r._3 <= 53))
    val dup = Sketches.hllRegisters(occ.union(occ).repartition(13), "source", col("sh"))
      .as[(String, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(regs.sameElements(dup)) // max-registers ignore multiplicity AND layout
  }

  test("md5-HLL merge (re-max) == sketching the union directly") {
    val occ = mdHllOcc
    val perSource = Sketches.hllRegisters(occ, "source", col("sh"))
    val merged = Sketches.hllMerge(perSource, "source", "all")
      .as[(String, Int, Int)].collect().sortBy(_._2)
    val direct = Sketches.hllRegisters(
        occ.withColumn("source", lit("all")), "source", col("sh"))
      .as[(String, Int, Int)].collect().sortBy(_._2)
    assert(merged.sameElements(direct))
  }

  test("md5-HLL estimate lands within 3 standard errors per source") {
    val occ = mdHllOcc
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(occ, "source", col("sh")), "source")
      .as[(String, Double)].collect().toMap
    val exact = occ.groupBy("source").agg(countDistinct("sh").as("n"))
      .as[(String, Long)].collect().toMap
    val se = 1.04 / math.sqrt(256.0) // ~6.5% at p=8
    exact.foreach { case (src, n) =>
      val rel = math.abs(est(src) - n) / n
      assert(rel < 3 * se, s"$src: est=${est(src)} exact=$n rel=$rel")
    }
  }
}
