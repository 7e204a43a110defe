package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at rest. A 100 TB table is only
  * as fast as the fraction of files a query can skip; Z-ordering clusters
  * rows so that min/max footer stats prune on BOTH of two dimensions at
  * once (the idea behind Delta/Iceberg `OPTIMIZE ... ZORDER BY`). */
object Layout {

  /** Z-order (Morton) key: interleaves the low `bits` bits of two
    * non-negative integer columns — x in even positions, y in odd. Rows
    * sorted by this key are clustered in both x and y, so per-file min/max
    * ranges stay tight on each dimension separately. Pure bit arithmetic
    * (shift/and/or), fully inside whole-stage codegen — no UDF. */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` into `nFiles` Z-ordered output files: compute the key,
    * range-partition on it, sort within partitions, and hand back the
    * frame ready for a parquet write where each file covers one compact
    * Z-range. `repartitionByRange` samples boundaries — the production
    * path; for a deterministic file id (fixture/oracle use) rank the key
    * explicitly instead (see ext_zorder). */
  def clusterByZorder(df: DataFrame, x: Column, y: Column,
      nFiles: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("zkey", zorderKey(x, y, bits))
    keyed.repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
  }
}
