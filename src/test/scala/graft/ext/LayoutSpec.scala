package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bits: x even positions, y odd") {
    // x=5 (101), y=3 (011) → z bits: x0→b0, y0→b1, x1→b2, y1→b3, x2→b4
    //   = 1 + 2 + 0 + 8 + 16 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y")).as("z"))
      .head().getLong(0)
    assert(z == 27L)
    // identity checks: y=0 spreads x bits to even positions
    val zx = Seq((7L, 0L)).toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y")).as("z")).head().getLong(0)
    assert(zx == (1L | (1L << 2) | (1L << 4)))
  }

  test("zorderKey is monotone-compatible with locality: neighbors share high bits") {
    // points in the same 4x4 quadrant share all but the low 4 z-bits
    val inQuad = for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)
    val zs = inQuad.toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(zs.forall(_ < 16), s"quadrant escaped its z-range: ${zs.mkString(",")}")
    assert(zs.distinct.length == 16) // bijective within the quadrant
  }

  test("writePlan computes exact byte volume and ceil-division file counts") {
    // partition "a": 2 rows, bytes = (3+1+10) + (5+1+10) = 30 → 2 files
    // at target 16; partition "b": 1 row, 4+1+10 = 15 → 1 file
    val d = Seq(("a", "xxx"), ("a", "yyyyy"), ("b", "zzzz"))
      .toDF("part", "text")
    val got = Layout.writePlan(d, "part", Seq("text", "part"),
        fixedWidth = 10, targetBytes = 16)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("a", 2L, 30L, 2L), ("b", 1L, 15L, 1L)), got.toString)
  }

  test("bucketCount sizes from projected volume: floor, ceil-div, pow2 round-up") {
    // 3 rows × (4 str bytes + 6 fixed) = 30 bytes
    val d = Seq("aaaa", "bbbb", "cccc").toDF("s")
    // tiny volume → the floor wins
    assert(Layout.bucketCount(d, Seq("s"), fixedWidth = 6) == 8)
    // 30 bytes at 4-byte target → ceil = 8 → already pow2
    assert(Layout.bucketCount(d, Seq("s"), fixedWidth = 6,
      targetBytes = 4, minBuckets = 1) == 8)
    // ceil(30/4)=8 with floor 2 → 8; ceil(30/9)=4 → 4; ceil(30/7)=5 → pow2 → 8
    assert(Layout.bucketCount(d, Seq("s"), fixedWidth = 6,
      targetBytes = 9, minBuckets = 2) == 4)
    assert(Layout.bucketCount(d, Seq("s"), fixedWidth = 6,
      targetBytes = 7, minBuckets = 2) == 8)
    // maxBuckets clamps before rounding
    assert(Layout.bucketCount(d, Seq("s"), fixedWidth = 6,
      targetBytes = 1, minBuckets = 2, maxBuckets = 16) == 16)
    // empty input → floor, no NPE (null sum coalesced)
    assert(Layout.bucketCount(d.limit(0), Seq("s"), fixedWidth = 6) == 8)
  }

  test("writeBucketed write runs one task per bucket, one sorted file each") {
    val l = graft.Tables.lineitem(spark, sf()).select("l_orderkey", "l_extendedprice")
    Layout.rebuildBucketed(l, "graft_test_bkt_files", "l_orderkey", 4)
    // exactly one data file per bucket: the repartition aligns the write
    // tasks with the bucket ids (same murmur3-pmod hash)
    val loc = spark.sessionState.catalog.defaultTablePath(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_test_bkt_files"))
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(loc.getPath))
      .toArray.map(_.toString).filter(f => f.endsWith(".parquet"))
    assert(files.length == 4, files.mkString("\n"))
    spark.sql("DROP TABLE IF EXISTS graft_test_bkt_files")
  }

  test("rebuildBucketed is idempotent and the bucketed join matches the plain join") {
    val o = graft.Tables.orders(spark, sf()).select("o_orderkey", "o_orderstatus")
    val l = graft.Tables.lineitem(spark, sf()).select("l_orderkey", "l_extendedprice")
    Layout.rebuildBucketed(o, "graft_test_bkt_o", "o_orderkey", 4)
    Layout.rebuildBucketed(o, "graft_test_bkt_o", "o_orderkey", 4) // twice: no stale-location failure
    Layout.rebuildBucketed(l, "graft_test_bkt_l", "l_orderkey", 4)
    val bo = spark.table("graft_test_bkt_o")
    val bl = spark.table("graft_test_bkt_l")
    val bucketed = bo.join(bl, bo("o_orderkey") === bl("l_orderkey"))
      .groupBy("o_orderkey").count()
      .as[(Long, Long)].collect().sortBy(_._1)
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy("o_orderkey").count()
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(bucketed.sameElements(plain))
    spark.sql("DROP TABLE IF EXISTS graft_test_bkt_o")
    spark.sql("DROP TABLE IF EXISTS graft_test_bkt_l")
  }

  test("clusterByZorder yields sorted-within-partition z-ranges") {
    val docs = graft.Tables.documents(spark, sf())
    val clustered = Layout.clusterByZorder(docs,
      col("n_chars"), col("doc_id") % 65536, nFiles = 4)
    val perPart = clustered
      .select(spark_partition_id().as("p"), col("zkey"))
      .as[(Int, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2))
    perPart.foreach { case (p, zs) =>
      assert(zs.sameElements(zs.sorted), s"partition $p not z-sorted")
    }
    // ranges of different partitions must not interleave (range partitioning)
    val ranges = perPart.values.map(zs => (zs.min, zs.max)).toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, maxA), (minB, _)) => assert(maxA <= minB)
      case _ =>
    }
  }
}
