package graft.ext

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The REAL decode path behind the multimodal plumbing: actual PNG bytes
  * through javax.imageio into [[Multimodal.ImageIoCodec]]'s pixel aHash,
  * driven through the same [[Multimodal.mediaPhashes]] →
  * [[Multimodal.phashBandedPairs]] pipeline the md5-stub oracle entries
  * use — proving the seam takes a genuine decoder, not only the stub. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic blocky test image: 8×8 blocks of seeded gray levels —
    * structure at exactly the scale the 8×8 aHash grid reads. */
  private def blockyImage(seed: Long, size: Int = 64): BufferedImage = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val rng = new java.util.Random(seed)
    val levels = Array.fill(8, 8)(rng.nextInt(256))
    for (y <- 0 until size; x <- 0 until size) {
      val v = levels(y * 8 / size)(x * 8 / size)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** ±`amp` pixel noise on a copy — small enough that block means move
    * by ≪ the inter-block contrast, so few aHash cells cross the mean. */
  private def perturbed(img: BufferedImage, seed: Long, amp: Int = 6): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    val rng = new java.util.Random(seed)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v0 = img.getRGB(x, y) & 0xff
      val v = math.max(0, math.min(255, v0 + rng.nextInt(2 * amp + 1) - amp))
      out.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    out
  }

  test("ImageIoCodec decodes real PNG pixels: dims, channels, mean luma") {
    val img = blockyImage(1L)
    val Some((w, h, ch, mean)) = Multimodal.ImageIoCodec.decodeImage(png(img))
    assert(w == 64 && h == 64 && ch == 3)
    // gray image: mean luma = mean gray level, computable directly
    val exp = (for (y <- 0 until 64; x <- 0 until 64) yield (img.getRGB(x, y) & 0xff).toDouble)
      .sum / (64.0 * 64.0)
    assert(math.abs(mean - exp) < 1e-9, s"mean $mean vs $exp")
    // a non-image payload is refused, not garbage-decoded
    assert(Multimodal.ImageIoCodec.decode("not a png".getBytes).isEmpty)
  }

  test("aHash survives PNG re-encoding where the md5 stub cannot") {
    val img = blockyImage(2L)
    val bytesA = png(img)
    // decode → re-encode: different PNG byte stream, identical pixels
    val bytesB = png(ImageIO.read(new java.io.ByteArrayInputStream(bytesA)))
    val pa = Multimodal.ImageIoCodec.phash(bytesA).get
    val pb = Multimodal.ImageIoCodec.phash(bytesB).get
    assert(pa == pb, "same pixels must hash identically across encodes")
    assert(pa >= 0 && pa < (1L << 60), "60-bit non-negative banding contract")
    // the stub sees two unrelated payloads whenever the bytes differ
    if (!bytesA.sameElements(bytesB))
      assert(Multimodal.StubCodec.phash(bytesA) != Multimodal.StubCodec.phash(bytesB))
  }

  test("phashBandedPairs over real PNGs: planted noisy re-encodes found, distinct images not") {
    val n = 20
    val rows = (0 until n).flatMap { i =>
      val base = blockyImage(100L + i)
      val near = perturbed(base, 900L + i)
      Seq(
        Multimodal.MediaRow(i.toLong, "image", png(base), "image/png", 64, 64, 0L),
        Multimodal.MediaRow(1000L + i, "image", png(near), "image/png", 64, 64, 0L))
    }
    val media = spark.createDataset(rows)
    val hashes = Multimodal.mediaPhashes(media,
      p => Multimodal.ImageIoCodec.phash(p).get)
    val pairs = Multimodal.phashBandedPairs(hashes)
      .as[(Long, Long, Int)].collect().toList
    val planted = pairs.collect { case (a, b, _) if b == a + 1000L => a }.toSet
    val cross = pairs.filterNot { case (a, b, _) => b == a + 1000L }
    // ±6 gray-level noise moves 8×8-block means by ≪ block contrast:
    // every noisy copy must band with its base within Hamming 8
    assert(planted == (0 until n).map(_.toLong).toSet,
      s"planted pairs found: $planted")
    // independent random block patterns are ~30 bits apart — none collide
    assert(cross.isEmpty, s"unrelated images paired: $cross")
    // and the hashes really came from pixels: re-hashing the SAME rows
    // through the stub finds nothing (PNG bytes all distinct)
    val stubPairs = Multimodal.phashBandedPairs(Multimodal.mediaPhashes(media))
      .as[(Long, Long, Int)].collect()
    assert(stubPairs.isEmpty)
  }
}
