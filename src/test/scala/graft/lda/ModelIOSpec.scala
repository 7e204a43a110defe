package graft.lda

import java.nio.file.{Files, Paths}
import graft.SparkSpec

class ModelIOSpec extends SparkSpec {

  test("formatDouble mirrors C++ ostream<<double defaultfloat precision 6") {
    assert(ModelIO.formatDouble(0.0) == "0")
    assert(ModelIO.formatDouble(150.0) == "150")
    assert(ModelIO.formatDouble(1.5) == "1.5")
    assert(ModelIO.formatDouble(123.456) == "123.456")
    assert(ModelIO.formatDouble(123.4567) == "123.457")   // 6 sig digits
    assert(ModelIO.formatDouble(0.0001) == "0.0001")      // exp = -4: fixed
    assert(ModelIO.formatDouble(0.00001) == "1e-05")      // exp < -4: sci
    assert(ModelIO.formatDouble(1234567.0) == "1.23457e+06")
    assert(ModelIO.formatDouble(-2.5) == "-2.5")
    assert(ModelIO.formatDouble(1.0 / 3.0) == "0.333333")
  }

  test("counts write → read round-trips, rebuilding the global row") {
    val k = 3
    val words = Array("apple", "pear", "quince")
    val model = Array[Long](5, 0, 2, 1, 1, 1, 0, 9, 3, /* global: */ 6, 10, 6)
    val path = Files.createTempDirectory("m").resolve("model.txt").toString
    ModelIO.writeCounts(model, k, words, path)
    val text = new String(Files.readAllBytes(Paths.get(path)))
    assert(text == "apple\t5 0 2\npear\t1 1 1\nquince\t0 9 3\n")
    val (back, wordsBack) = ModelIO.readModel(path)
    assert(wordsBack.sameElements(words))
    assert(back.sameElements(model)) // incl. recomputed global row
  }

  test("averaged write uses C++ double formatting; read truncates to int64 (model.cc:126-127)") {
    val k = 2
    val words = Array("a", "b")
    val avg = Array(2.6, 0.0, 150.0, 1.0 / 3.0, /* global */ 152.6, 1.0 / 3.0)
    val path = Files.createTempDirectory("m").resolve("avg.txt").toString
    ModelIO.writeAveraged(avg, k, words, path)
    val text = new String(Files.readAllBytes(Paths.get(path)))
    assert(text == "a\t2.6 0\nb\t150 0.333333\n")
    val (back, _) = ModelIO.readModel(path)
    // 2.6→2, 150→150, 0.333333→0; global row rebuilt from truncated values
    assert(back.sameElements(Array[Long](2, 0, 150, 0, 152, 0)))
  }

  test("readModel skips comment/empty lines like the reference parser") {
    val path = Files.createTempDirectory("m").resolve("c.txt").toString
    Files.write(Paths.get(path), "# comment\n\nw1\t3 4\nw2\t1 2\n".getBytes)
    val (model, words) = ModelIO.readModel(path)
    assert(words.sameElements(Array("w1", "w2")))
    assert(model.sameElements(Array[Long](3, 4, 1, 2, 4, 6)))
  }
}
