package graft.queries

import graft.SparkSpec
import java.security.MessageDigest

/** Golden-output pins for the three DETERMINISTIC battery entries the
  * driver can only rows-only-check (no tractable DuckDB twin):
  * ext_compress_ratio (no SQL engine exposes DEFLATE), and
  * ext_unigram_vocab / ext_unigram_encode (EM probabilities). Each is
  * seeded/deterministic, so its full VALUE set can be regression-guarded
  * by a content hash at sf0.01 — the same render the driver's compare
  * uses (columns sorted by name, doubles %.4f, NULL as \N, rows in the
  * query's own total order), so a value drift here is exactly what a
  * hash-mismatch would look like if an oracle existed. If an intentional
  * algorithm change moves a hash, re-derive it from the Verify dump. */
class GoldenHashSpec extends SparkSpec {

  private def digest(name: String, sfTag: String = "sf0.01"): (Long, String) = {
    val df = ExtQueries.entries(name)(spark, sf(sfTag))
    val cols = df.schema.fieldNames
    val order = cols.indices.sortBy(cols)
    val rows = df.collect()
    val text = rows.map { r =>
      order.map { i =>
        r.get(i) match {
          case null => "\\N"
          case d: java.lang.Double =>
            "%.4f".formatLocal(java.util.Locale.ROOT, d.doubleValue())
          case v => v.toString
        }
      }.mkString("\t")
    }.mkString("\n")
    val h = MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (rows.length.toLong, h)
  }

  test("ext_compress_ratio output pinned at sf0.01") {
    assert(digest("ext_compress_ratio") == ((500L,
      "0b1e671bd0f33f93e977f5c2f5cb099e337ad382a1222a47fad1d4b3f4485d6a")))
  }

  test("ext_unigram_vocab output pinned at sf0.01") {
    assert(digest("ext_unigram_vocab") == ((55L,
      "628d5dbdeabd290ab7dbae301143575c48f723117b0dc57a4fc8441f67ff14ac")))
  }

  test("ext_unigram_encode output pinned at sf0.01") {
    assert(digest("ext_unigram_encode") == ((500L,
      "bcd7022631eee9545ab831c4ffb43d974da7bea3fb09cf3df046061fcba44f33")))
  }

  // sf0.1 pins for the same three entries: a 10× input catches
  // scale-dependent drift (accumulation-order, magnitude-sensitive
  // float paths) that the sf0.01 pin can't see.

  test("ext_compress_ratio output pinned at sf0.1") {
    assert(digest("ext_compress_ratio", "sf0.1") == ((5000L,
      "eda0ea8658be72e4b6e772380b44872cbc6ac3548bbde84e933ce18d90ee465f")))
  }

  test("ext_unigram_vocab output pinned at sf0.1") {
    assert(digest("ext_unigram_vocab", "sf0.1") == ((55L,
      "daa606ad8de72cfa5cd5d1954406c509163f02c25315545e573fe2de65ec5846")))
  }

  test("ext_unigram_encode output pinned at sf0.1") {
    assert(digest("ext_unigram_encode", "sf0.1") == ((5000L,
      "1863c15096f4740c39dcbfb084eba3dceeeeafc270e571f1b3f71f1875f2609f")))
  }
}
