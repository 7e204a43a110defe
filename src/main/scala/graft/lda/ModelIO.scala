package graft.lda

import java.io.{BufferedWriter, FileWriter}
import java.util.Locale
import scala.io.Source
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model (de)serialization with byte parity to the reference's text format
  * (A2 in FIXTURES.md): one word per line, `word<TAB>c1 c2 … cK\n`.
  *
  * Two writers, matching the reference's two output kinds (SURVEY quirk #1):
  *  - raw int64 counts — the mpi_lda path (model.cc:98-111);
  *  - burn-in-averaged doubles — the single-node lda path
  *    (accumulative_model.cc:80-94), doubles rendered with C++
  *    `ostream<<double` defaultfloat precision-6 semantics.
  *
  * The reader accepts both and truncates doubles to int64, reproducing
  * model.cc:126-127 (quirk #4). Word order in the file defines word ids on
  * reload (V3 vocabulary semantics).
  *
  * The text model file is a driver-side artifact (V×K longs — ~8 MB at the
  * reference's NYTimes scale). For the huge-V regime the parquet form
  * below keeps the model distributed.
  */
object ModelIO {

  /** C++ `ostream << double` (defaultfloat, precision 6): like %.6g with
    * trailing zeros (and a bare trailing '.') stripped. */
  def formatDouble(d: Double): String = {
    val s = String.format(Locale.ROOT, "%.6g", java.lang.Double.valueOf(d))
    val (mant, exp) = s.indexOf('e') match {
      case -1 => (s, "")
      case i  => (s.substring(0, i), s.substring(i))
    }
    val stripped =
      if (mant.contains('.')) {
        val m = mant.reverse.dropWhile(_ == '0').reverse
        if (m.endsWith(".")) m.dropRight(1) else m
      } else mant
    stripped + exp
  }

  /** Write raw counts (model.cc:98-111). `indexToWord(i)` = word with id i;
    * `model` is the flat (V+1)×K array (global row excluded from output). */
  def writeCounts(model: Array[Long], numTopics: Int, indexToWord: Array[String], path: String): Unit =
    writeLines(indexToWord, path) { (sb, w) =>
      val off = w * numTopics
      var k = 0
      while (k < numTopics) {
        sb.append(model(off + k))
        sb.append(if (k < numTopics - 1) ' ' else '\n')
        k += 1
      }
    }

  /** Write averaged doubles (accumulative_model.cc:80-94). */
  def writeAveraged(model: Array[Double], numTopics: Int, indexToWord: Array[String], path: String): Unit =
    writeLines(indexToWord, path) { (sb, w) =>
      val off = w * numTopics
      var k = 0
      while (k < numTopics) {
        sb.append(formatDouble(model(off + k)))
        sb.append(if (k < numTopics - 1) ' ' else '\n')
        k += 1
      }
    }

  private def writeLines(indexToWord: Array[String], path: String)(row: (StringBuilder, Int) => Unit): Unit = {
    val out = new BufferedWriter(new FileWriter(path))
    try {
      val sb = new StringBuilder
      var w = 0
      while (w < indexToWord.length) {
        sb.setLength(0)
        sb.append(indexToWord(w)).append('\t')
        row(sb, w)
        out.write(sb.toString)
        w += 1
      }
    } finally out.close()
  }

  /** Read a model file (model.cc:113-153): word order defines ids (V3);
    * double values truncated to long (quirk #4); global row rebuilt by
    * column sums (model.cc:147-151). Returns (flat (V+1)×K counts, words
    * in id order). */
  def readModel(path: String): (Array[Long], Array[String]) = {
    val src = Source.fromFile(path)
    try {
      val rows = scala.collection.mutable.ArrayBuffer[(String, Array[Long])]()
      for (line <- src.getLines()) {
        if (line.nonEmpty && line(0) != '#' && line(0) != '\r' && line(0) != '\n') {
          val parts = line.trim.split("\\s+")
          rows += ((parts(0), parts.drop(1).map(_.toDouble.toLong)))
        }
      }
      val v = rows.length
      val k = rows.head._2.length
      val model = new Array[Long]((v + 1) * k)
      val words = new Array[String](v)
      var w = 0
      while (w < v) {
        words(w) = rows(w)._1
        val cs = rows(w)._2
        var t = 0
        while (t < k) {
          model(w * k + t) = cs(t)
          model(v * k + t) += cs(t)
          t += 1
        }
        w += 1
      }
      (model, words)
    } finally src.close()
  }

  /** view_model.py-parity report lines (view_model.py:28-39): per topic a
    * blank line, `TOPIC:  <i> <mass>`, a blank line, then `word value`
    * rows filtered to value > 1 and sorted by (value, word) DESCENDING —
    * python2's `sorted(..., key=(v, k), reverse=True)`. Values are read
    * as raw doubles (NOT int64-truncated — the truncation quirk applies
    * to the inference reload path only) and rendered python-str-style
    * (integral doubles as `x.0`). */
  def viewModelLines(path: String): Seq[String] = {
    val src = Source.fromFile(path)
    try {
      val rows = src.getLines().filter(l =>
        l.nonEmpty && l(0) != '#' && l(0) != '\r' && l(0) != '\n').map { line =>
        val parts = line.trim.split("\\s+")
        (parts(0), parts.drop(1).map(_.toDouble))
      }.toVector
      if (rows.isEmpty) return Seq.empty
      val k = rows.head._2.length
      def pyFloat(v: Double): String =
        if (v == math.floor(v) && math.abs(v) < 1e16) s"${v.toLong}.0" else v.toString
      (0 until k).flatMap { t =>
        val entries = rows.collect { case (w, vs) if vs(t) > 1 => (w, vs(t)) }
        val mass = entries.map(_._2).sum
        val sorted = entries.sortBy { case (w, v) => (-v, w) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String.reverse))
        Seq("", s"TOPIC:  $t ${pyFloat(mass)}", "") ++
          sorted.map { case (w, v) => s"$w ${pyFloat(v)}" }
      }
    } finally src.close()
  }

  /** Distributed model form: DataFrame(word, word_id, counts array) —
    * the scale path (parquet at rest; never collected to the driver). */
  def toDataFrame(spark: SparkSession, model: Array[Long], numTopics: Int, indexToWord: Array[String]): DataFrame = {
    import spark.implicits._
    indexToWord.indices.map { w =>
      (indexToWord(w), w, (0 until numTopics).map(k => model(w * numTopics + k)).toArray)
    }.toDF("word", "word_id", "counts")
  }

  /** Long-form (word, topic, cnt) for relational reporting (R1 top-words). */
  def toLongForm(modelDf: DataFrame): DataFrame =
    modelDf.select(col("word"),
        posexplode(col("counts")).as(Seq("topic", "cnt")))

  /** Distributed plda-format text export for models too large to collect
    * (the [[ShardedLda]] path): formats each `word\tc1 … cK` line on the
    * executors and writes with a global sort on word_id — Spark's range
    * partitioning makes part-file lexicographic order equal global word
    * order, so `cat part-*` (or any in-order reader) reproduces the exact
    * byte stream [[writeCounts]] would emit. Every vocab word must have a
    * model row (true by construction — the vocabulary is built from the
    * corpus). Reload at scale via the parquet form; the text form is for
    * interop with the reference's tooling. */
  def writeCountsDistributed(modelRows: org.apache.spark.sql.Dataset[WordTopics],
      vocab: DataFrame, path: String): Unit = {
    modelRows.toDF("word_id", "counts")
      .join(vocab, "word_id")
      .orderBy("word_id")
      .select(concat(col("tok"), lit("\t"),
        array_join(col("counts"), " ")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
