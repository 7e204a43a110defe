package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Pins the CLAIM behind [[KMinAgg]] — that partial aggregation bounds
  * the exchange — with the actual shuffle-write METRICS, not just plan
  * shape. KMinSpec checks the kernel's values and PlanSpec pins the
  * ObjectHashAggregate plan, but neither would notice if partial
  * aggregation were silently disabled for the UDAF and the kryo buffers
  * started shipping whole partitions: the plan string and the results
  * would both still be right, only the wire volume would explode with
  * the value universe. These tests make that volume a number. */
class KmvShuffleSpec extends SparkSpec {
  import spark.implicits._

  /** All shuffle exchanges in an executed (possibly adaptive) plan,
    * recursing through query stages (QueryStageExec is a leaf to
    * `collect`, so a plain traversal misses nested stages). */
  private def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = {
    val here = p match {
      case s: ShuffleQueryStageExec => Seq(s.shuffle)
      case e: ShuffleExchangeLike   => Seq(e)
      case _                        => Seq.empty
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      // any query stage (shuffle OR broadcast) is a leaf to `children`
      // but hides a whole executed subtree behind `plan`
      case s: QueryStageExec        => Seq(s.plan)
      case _                        => p.children
    }
    (here ++ kids.flatMap(exchanges)).distinct
  }

  private def aggExchangeRecords(nRows: Long, nSources: Int): Long = {
    // one stage graph whose ONLY exchange is the partial→final agg:
    // range() is born parallel (no spreadForCompute repartition), values
    // are all-distinct md5s so the value universe IS nRows
    val kmin = udaf(new KMinAgg(256))
    val df = spark.range(nRows)
      .select((col("id") % nSources).as("source"),
        md5(col("id").cast("string")).as("h"))
      .groupBy("source").agg(kmin(col("h")).as("sig"))
    assert(df.count() == nSources)
    val ex = exchanges(df.queryExecution.executedPlan)
    assert(ex.size == 1, s"expected exactly the agg exchange, got ${ex.size}")
    ex.head.metrics("shuffleRecordsWritten").value
  }

  test("KMinAgg partial agg bounds the exchange: records flat in input size") {
    val small = aggExchangeRecords(20000L, 8)
    val big = aggExchangeRecords(200000L, 8)
    // partial aggregation reduces each task to ≤1 buffer per source, so
    // the exchange writes O(tasks × sources) records REGARDLESS of the
    // value universe (tasks = 4 in this suite). If partial agg were
    // disabled, `big` would be ~200k (every row crosses the wire).
    val tasks = spark.sparkContext.defaultParallelism
    assert(small <= tasks.toLong * 8,
      s"small input: $small records crossed the agg exchange (> tasks×sources)")
    assert(big <= tasks.toLong * 8,
      s"10× input: $big records crossed the agg exchange — partial " +
        "aggregation is not bounding the shuffle")
    assert(big <= small,
      s"agg exchange records grew with input size: $small -> $big")
  }

  test("sourceOverlapKMV: no exchange ships the shingle universe") {
    // synthetic docs with an all-distinct shingle universe that grows
    // linearly with the doc count; at 10× docs the universe is 10× but
    // the agg exchange must stay O(tasks × sources)
    def docs(n: Int) = spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        (col("id") % 4).cast("string").as("source"),
        concat_ws(" ", (0 until 8).map(j =>
          concat(lit(s"w${j}_"), col("id"))): _*).as("text"))
    def run(n: Int): (Long, Seq[Long]) = {
      val out = graft.ext.Dedup.sourceOverlapKMV(docs(n))
      out.collect() // 4 sources -> ≤6 pair rows
      (n.toLong, exchanges(out.queryExecution.executedPlan)
        .map(_.metrics("shuffleRecordsWritten").value).sorted)
    }
    val (n1, ex1) = run(3000)
    val (n2, ex2) = run(30000)
    // exactly two exchanges: the spreadForCompute repartition (writes
    // the doc rows — linear by design, cheap) and the KMV agg exchange
    assert(ex1.size == 2, s"exchange count changed: $ex1")
    assert(ex2.size == 2, s"exchange count changed: $ex2")
    val tasks = spark.sparkContext.defaultParallelism.toLong
    // per size: smallest exchange = the agg one; bounded and flat
    assert(ex1.head <= tasks * 4, s"agg exchange not bounded: $ex1")
    assert(ex2.head <= tasks * 4,
      s"agg exchange grew with the universe (10× docs): $ex2")
    // the repartition exchange is the doc-linear one, never the universe
    // (universe here = 6 shingles/doc; shipping it would be ~6n records)
    assert(ex1.last == n1 && ex2.last == n2,
      s"repartition exchange should write exactly the doc rows: $ex1 / $ex2")
  }

  test("stage-level shuffle write bytes stay flat as the universe grows 10x") {
    // listener-based cross-check that doesn't rely on plan internals:
    // sum shuffle WRITE bytes over all stages of each isolated agg job
    @volatile var bytes = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def measure(n: Long): Long = {
      bytes = 0L
      spark.sparkContext.addSparkListener(listener)
      try {
        val kmin = udaf(new KMinAgg(256))
        spark.range(n)
          .select((col("id") % 8).as("source"),
            md5(col("id").cast("string")).as("h"))
          .groupBy("source").agg(kmin(col("h")).as("sig"))
          .collect()
        // listener delivery is async and the bus is private[spark]:
        // poll until the byte count stabilizes (≤5 s)
        var last = -1L
        var spins = 0
        while (bytes != last && spins < 25) {
          last = bytes; spins += 1; Thread.sleep(200)
        }
        bytes
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val b1 = measure(20000L)
    val b2 = measure(200000L)
    assert(b1 > 0, "expected a shuffle to measure")
    // O(k · tasks · sources) buffers either way — byte volume must not
    // track the 10× universe (allow 2× for kryo/serialization jitter)
    assert(b2 <= b1 * 2,
      s"shuffle write bytes grew with the value universe: $b1 -> $b2")
  }
}
