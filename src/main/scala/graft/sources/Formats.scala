package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-oriented interchange formats (JSONL, CSV) as first-class
  * sources/sinks next to parquet. Both are splittable text formats, so a
  * 100 TB directory still reads with one task per HDFS block; an explicit
  * schema on read skips Spark's whole-file inference pass (which would
  * scan the data twice) and pins types independent of what the writer
  * emitted. Round-trip fidelity is oracle-checked (ext_jsonl_roundtrip /
  * ext_csv_roundtrip): doubles survive via shortest-representation
  * toString/parse, strings via JSON/quoted-CSV escaping. */
object Formats {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** `multiLine=true` so quoted values containing newlines parse as one
    * record (the writer quotes them; the default line-split reader would
    * shear the record in two). Cost: a multiLine file isn't block-split
    * — parallelism is per FILE, so keep many output files (the writer's
    * one-file-per-partition default already does). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("multiLine", "true").csv(path)

  /** ORC — the second columnar format next to parquet (stripe-level
    * predicate pushdown, per-stripe splits, vectorized read). Same
    * explicit-schema discipline as the text formats; fidelity is
    * oracle-checked incl. doubles and timestamps (ext_orc_roundtrip). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** XML — the enterprise-interchange format Spark 4 ships natively
    * (the former spark-xml package, merged into core). Row-per-`rowTag`
    * element; explicit schema on read skips inference exactly like the
    * text formats. Fidelity oracle-checked (ext_xml_roundtrip). */
  def writeXml(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("rowTag", "row").format("xml").save(path)

  def readXml(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("rowTag", "row").format("xml").load(path)
}
