package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.4): image/audio/video as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`StubCodec`): it derives plausible
  * metadata/features from the bytes alone, so the Spark-side plumbing —
  * schema, batch shape, partitioning, the mapPartitions seam where a real
  * decoder (JNI/FFI or a Python worker via ArrowEvalPython in PySpark)
  * would slot in — is real and tested end-to-end.
  *
  * Scale notes: media bytes never pass through a shuffle — all transforms
  * below are narrow (mapPartitions). Feature vectors (small) are what
  * flows into joins/aggregations downstream. Batch size is bounded by rows
  * not bytes here; a production decoder would cap batches by byte size.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      mime: String,
      width: Int, // -1 when unknown/not applicable
      height: Int,
      duration_ms: Long)

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double,
      phash: Long)

  final case class FrameSample(media_id: Long, frame_index: Int, frame_hash: Long)

  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      rms: Double)

  /** ======== STUB ========
    * Deterministic fake decoder. A real implementation would call an image
    * library here; everything OUTSIDE this object is production plumbing.
    *
    * All values derive from the md5 hex digest of the payload, sliced into
    * non-negative sub-64-bit integers — deliberately replicable in plain
    * SQL (`CAST('0x' || substr(md5(text), a, n) AS BIGINT)`), which is what
    * lets the multimodal queries carry a DuckDB hash oracle instead of the
    * weaker rows-only check. */
  object StubCodec {
    private def md5Hex(b: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(b)
      val sb = new StringBuilder(32)
      var i = 0
      while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
      sb.toString
    }

    /** hex[from, from+len) as an unsigned long (len ≤ 15 → always ≥ 0). */
    private def slice(hex: String, from: Int, len: Int): Long =
      java.lang.Long.parseLong(hex.substring(from, from + len), 16)

    /** "Decode" image dims/channels/intensity from bytes, deterministically. */
    def decodeImage(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val h = md5Hex(payload)
      val width = (64 + slice(h, 0, 8) % 1024).toInt
      val height = (64 + slice(h, 8, 8) % 1024).toInt
      val channels = (1 + slice(h, 16, 2) % 4).toInt
      val mean = (slice(h, 18, 4) % 256).toDouble
      (width, height, channels, mean)
    }

    /** Perceptual-hash stand-in: top 60 bits of the digest (positive). */
    def phash(payload: Array[Byte]): Long = slice(md5Hex(payload), 0, 15)

    /** Number of "frames" a video payload decodes to. */
    def frameCount(payload: Array[Byte]): Int =
      (8 + slice(md5Hex(payload), 22, 4) % 56).toInt

    def frameHash(payload: Array[Byte], idx: Int): Long =
      slice(md5Hex(payload), 8, 15) + idx.toLong * 1000003L

    /** "Decode" audio stream properties: one of 4 standard rates, a
      * sample count, and an RMS-level stand-in in [0, 1). */
    def decodeAudio(payload: Array[Byte]): (Int, Long, Double) = {
      val h = md5Hex(payload)
      val rates = Array(8000, 16000, 22050, 44100)
      val rate = rates((slice(h, 26, 2) % 4).toInt)
      val nSamples = 1000L + slice(h, 4, 8) % 1000000L
      val rms = (slice(h, 12, 4) % 10000L) / 10000.0
      (rate, nSamples, rms)
    }
  }
  /** ======== END STUB ======== */

  /** REAL image decode path — javax.imageio, which ships with the JDK
    * (PNG/BMP/GIF/JPEG readers), so it needs no dependency this
    * container lacks: this is the genuine decoder that slots into the
    * same mapPartitions seam the stub marks. Produces a true 60-bit
    * AVERAGE-HASH (aHash) perceptual hash over decoded pixels: area-
    * averaged 8×8 luma grid, each cell thresholded at the grand mean —
    * robust to re-encoding (two different PNG byte streams of the same
    * pixels hash identically, where the md5 stub sees unrelated
    * payloads) and to small pixel noise (few cells cross the mean), so
    * [[phashBandedPairs]]'s Hamming banding does real near-dup work
    * over it. 60 bits (top 4 dropped) keeps the non-negative 10×6-bit
    * block layout the banding expects. The md5 stub remains the
    * default for the battery entries (DuckDB can mirror md5, not PNG
    * decoding — the oracle contract), spec'd on actual PNGs in
    * MultimodalSpec. */
  object ImageIoCodec {
    import java.awt.image.BufferedImage

    /** None when no JDK reader recognizes the payload. */
    def decode(payload: Array[Byte]): Option[BufferedImage] =
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))

    /** Rec. 601 luma ×1000 of an ARGB pixel — integer-exact. */
    private def luma1000(argb: Int): Long = {
      val r = (argb >> 16) & 0xff
      val g = (argb >> 8) & 0xff
      val b = argb & 0xff
      299L * r + 587L * g + 114L * b
    }

    /** 60-bit average hash: every source pixel contributes to exactly
      * one of 8×8 cells (area averaging — deterministic integer
      * bucketing, no interpolation ambiguity), cell means thresholded
      * at the mean of cell means. */
    def aHash60(img: BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = math.min(y * 8 / h, 7)
        var x = 0
        while (x < w) {
          val cx = math.min(x * 8 / w, 7)
          val c = cy * 8 + cx
          sums(c) += luma1000(img.getRGB(x, y))
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      val means = Array.tabulate(64)(c =>
        if (counts(c) == 0) 0.0 else sums(c).toDouble / counts(c))
      val grand = means.sum / 64.0
      var bits = 0L
      var c = 0
      while (c < 64) { if (means(c) > grand) bits |= (1L << c); c += 1 }
      // 60 non-negative bits (the banding layout's contract) by dropping
      // 4 SPATIALLY-SPREAD cells — (0,0), (2,5), (5,2), (7,7) along the
      // diagonals — not one contiguous corner, so the hash's blind spot
      // is scattered single cells rather than a systematic image region
      var out = 0L
      var k = 0
      c = 0
      while (c < 64) {
        if (c != 0 && c != 21 && c != 42 && c != 63) {
          if (((bits >>> c) & 1L) == 1L) out |= (1L << k)
          k += 1
        }
        c += 1
      }
      out
    }

    /** Real pixels → perceptual hash; None for undecodable payloads. */
    def phash(payload: Array[Byte]): Option[Long] = decode(payload).map(aHash60)

    /** Real (width, height, channels, mean luma 0–255). */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Double)] =
      decode(payload).map { img =>
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { sum += luma1000(img.getRGB(x, y)); x += 1 }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        (img.getWidth, img.getHeight, img.getColorModel.getNumComponents,
          sum.toDouble / (1000.0 * n))
      }
  }

  /** Deterministic planted-PNG media generator for the REAL-decode battery
    * leg: for each of the `n` smallest doc_ids in `documents`, emits TWO
    * genuine PNG payloads — a seeded 8×8-block grayscale base image
    * (media_id = doc_id) and a ±6-gray-level pixel-noised, independently
    * re-encoded copy (media_id = doc_id + [[PlantedNearDupOffset]]). The
    * two byte streams differ (so md5-stub hashing sees unrelated
    * payloads) while their PIXELS stay within aHash's noise floor — the
    * planted ground truth a real perceptual hasher must recover and the
    * stub provably cannot. Generation is a narrow mapPartitions over the
    * doc_id list (encode cost is distributed; bytes never shuffle), and
    * every byte is a pure function of doc_id, so the planted contract
    * (exactly one pair per doc, base↔noisy) holds at every scale factor. */
  val PlantedNearDupOffset = 1000000000L

  def plantedPngMedia(documents: DataFrame, n: Int): Dataset[MediaRow] = {
    import java.awt.image.BufferedImage
    val spark = documents.sparkSession
    import spark.implicits._
    def blocky(seed: Long, size: Int): BufferedImage = {
      val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
      val rng = new java.util.Random(seed)
      val levels = Array.fill(8, 8)(rng.nextInt(256))
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) {
          val v = levels(y * 8 / size)(x * 8 / size)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      img
    }
    def noised(img: BufferedImage, seed: Long, amp: Int): BufferedImage = {
      val out = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_RGB)
      val rng = new java.util.Random(seed)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val v0 = img.getRGB(x, y) & 0xff
          val v = math.max(0, math.min(255, v0 + rng.nextInt(2 * amp + 1) - amp))
          out.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      out
    }
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    documents.select(col("doc_id").cast("long")).orderBy("doc_id").limit(n)
      .repartition(documents.sparkSession.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions(_.flatMap { id =>
        val base = blocky(id, 64)
        // re-encode the noisy copy through a decode round-trip so even a
        // zero-noise pixel would yield a different byte stream
        val noisy = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png(noised(base, id + 7L, 6))))
        Iterator(
          MediaRow(id, "image", png(base), "image/png", 64, 64, 0L),
          MediaRow(id + PlantedNearDupOffset, "image", png(noisy),
            "image/png", 64, 64, 0L))
      })
  }

  /** Decode + feature-extract images: one narrow mapPartitions pass, rows
    * streamed in partition-local batches. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.filter(_.kind == "image").map { m =>
        val (w, h, c, mean) = StubCodec.decodeImage(m.payload)
        // prefer declared metadata when present, decode otherwise
        ImageFeatures(m.media_id,
          if (m.width > 0) m.width else w,
          if (m.height > 0) m.height else h,
          c, mean, StubCodec.phash(m.payload))
      }
    }
  }

  /** Decode + feature-extract audio rows — same narrow mapPartitions seam
    * as [[imageFeatures]]. */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.filter(_.kind == "audio").map { m =>
        val (rate, n, rms) = StubCodec.decodeAudio(m.payload)
        AudioFeatures(m.media_id, rate, n, rms)
      }
    }
  }

  /** Sample every `stride`-th frame of each video (flatMap — output can be
    * larger than input; still shuffle-free). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      if (m.kind != "video") Iterator.empty
      else {
        val n = StubCodec.frameCount(m.payload)
        (0 until n by stride).iterator.map(i => FrameSample(m.media_id, i, StubCodec.frameHash(m.payload, i)))
      }
    }
  }

  /** "Resize": re-emit metadata with new dims; payload untouched (a real
    * impl would transcode in the same mapPartitions seam). */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.width <= maxDim && m.height <= maxDim) m
      else {
        val scale = maxDim.toDouble / math.max(m.width, m.height)
        m.copy(width = (m.width * scale).toInt, height = (m.height * scale).toInt)
      }
    }
  }

  /** Build a synthetic media table from the documents fixture (payload =
    * UTF-8 of text): exercises the binary-column path with real data. */
  /** (media_id, phash) projection through the decode seam — the narrow
    * mapPartitions where a real perceptual hasher (pHash/dHash over
    * decoded pixels) would slot in; bytes never shuffle. */
  def mediaPhashes(media: Dataset[MediaRow]): DataFrame =
    mediaPhashes(media, StubCodec.phash(_))

  /** [[mediaPhashes]] with a pluggable hasher — pass
    * `p => ImageIoCodec.phash(p).getOrElse(fallback)` (or a JNI/FFI
    * hasher) to run REAL perceptual hashing through the identical
    * plumbing; the md5-stub default keeps the DuckDB-oracle battery
    * entries byte-stable. */
  def mediaPhashes(media: Dataset[MediaRow],
      hasher: Array[Byte] => Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(m => (m.media_id, hasher(m.payload))))
      .toDF("media_id", "phash")
  }

  /** Perceptual-hash media DEDUP via COMBINATION Hamming-band bucketing
    * (the multi-index scheme of Manku, Jain & Das Sarma, WWW 2007 §3):
    * the 60-bit phash splits into `blocks` fixed windows; a pair within
    * `maxHamming` bits has at most maxHamming dirty blocks, so at least
    * blocks − maxHamming are clean — whenever
    * blocks − maxHamming ≥ comboSize (`require`d, with full bit
    * coverage), SOME comboSize-subset of blocks is entirely clean and
    * the pair collides on that combination's key. Keying on every
    * C(blocks, comboSize) combination keeps recall = 1 by pigeonhole
    * while the key space grows to (2^blockBits)^comboSize — the lever
    * that controls candidate volume: on worst-case UNIFORM hashes
    * candidates are ~combos·N²/(2·keySpace), so 2-block 12-bit keys
    * (45·N²/8192) beat single-block 6-bit keys (10·N²/128) by 64× (the
    * r9 scaling leg measured the single-block form quadratic at 4×
    * replication); real pHash near-dups cluster, making the uniform
    * bound far pessimistic. Raise comboSize (more, longer keys) when
    * N²/keySpace dominates — every choice the pigeonhole `require`
    * admits is recall-safe. Candidates come from (combo, key) equi-joins —
    * never an all-pairs scan — and the exact `bit_count(xor)` distance
    * verifies each candidate, so precision is exact too.
    * Defaults: 10 blocks × 6 bits, comboSize 2 → 45 combos of 12-bit
    * keys, recall-complete for maxHamming ≤ 8. All integer arithmetic.
    *
    * SIZING RULE (worst-case uniform hashes, 10 blocks × 6 bits):
    * expected candidate pairs ≈ C(blocks,q) · N² / (2 · 2^(q·blockBits)).
    * {{{
    *   N        q=1 (10 combos, 2^6 keys)   q=2 (45 combos, 2^12 keys)
    *   10^4     ~7.8e6  (781/row)           ~5.5e5  (55/row)
    *   10^5     ~7.8e8                      ~5.5e7  (549/row)
    *   10^6     ~7.8e10                     ~5.5e9
    * }}}
    * q = comboSize is the recall-SAFE lever: any q ≤ blocks − maxHamming
    * keeps recall 1, so raise q until candidates/row is tolerable.
    * maxHamming = 8 admits q ≤ 2; to band more than ~10^5 uniform-ish
    * hashes, trade radius for keys (e.g. maxHamming 4 admits q ≤ 6 →
    * 210 combos of 2^36 keys: ~1.5e-5 expected candidates TOTAL at
    * N=10^6). [[recommendedComboSize]] computes this choice.
    *
    * With the md5 stub codec only byte-identical payloads collide
    * (avalanche), which is exactly the re-encoded-duplicate case the
    * fixture plants; a real pHash makes near-misses land in the same
    * clean blocks the same way. */
  /** The smallest recall-safe comboSize whose worst-case (uniform-hash)
    * expected candidate volume stays within `maxCandidatesPerRow`, or —
    * when no recall-safe q meets the budget — the largest recall-safe q
    * (the best banding can do at this (blocks, maxHamming); shrink
    * maxHamming or grow blocks for more headroom). Pure arithmetic on
    * the sizing rule above: candidates ≈ C(blocks,q)·n²/(2·2^(q·bits)).
    * Preconditions mirror [[phashBandedPairs]]'s `require`s. */
  def recommendedComboSize(n: Long, blocks: Int = 10, blockBits: Int = 6,
      maxHamming: Int = 8, maxCandidatesPerRow: Double = 64.0): Int = {
    require(n > 0 && blocks - maxHamming >= 1,
      s"no recall-safe comboSize exists for blocks=$blocks, maxHamming=$maxHamming")
    def choose(k: Int): Double =
      (0 until k).map(i => (blocks - i).toDouble / (i + 1)).product
    def perRow(q: Int): Double =
      choose(q) * n.toDouble / (2.0 * math.pow(2.0, q.toDouble * blockBits))
    val qMax = blocks - maxHamming
    (1 to qMax).find(q => perRow(q) <= maxCandidatesPerRow).getOrElse(qMax)
  }

  def phashBandedPairs(phashes: DataFrame, blocks: Int = 10,
      blockBits: Int = 6, maxHamming: Int = 8,
      comboSize: Int = 2): DataFrame = {
    require(comboSize >= 1 && comboSize <= blocks,
      s"comboSize must be in [1, blocks]; got $comboSize of $blocks")
    require(blocks - maxHamming >= comboSize,
      s"pigeonhole recall guarantee needs blocks - maxHamming >= comboSize; " +
        s"got blocks=$blocks, maxHamming=$maxHamming, comboSize=$comboSize")
    require(blocks * blockBits >= 60 && blocks * blockBits <= 63,
      s"blocks*blockBits must cover the 60-bit phash (and fit a long); " +
        s"got ${blocks * blockBits}")
    def block(b: Int): Column =
      expr(s"phash div ${1L << (b * blockBits)}") % lit(1L << blockBits)
    val combos = (0 until blocks).combinations(comboSize).toSeq
    val banded = phashes.select(col("media_id"), col("phash"),
      explode(array(combos.zipWithIndex.map { case (c, id) =>
        struct(lit(id).as("band"),
          c.zipWithIndex.map { case (b, t) =>
            block(b) * lit(1L << (t * blockBits))
          }.reduce(_ + _).as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.toDF("media_a", "pa", "band", "key")
    val r = banded.toDF("media_b", "pb", "band", "key")
    l.join(r, Seq("band", "key"))
      .where(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "pa", "pb").distinct()
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("media_a", "media_b", "hamming")
      .orderBy("media_a", "media_b")
  }

  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    // spreadForCompute: the downstream decode/phash mapPartitions runs at
    // the SCAN's parallelism (single-row-group fixture files scan as one
    // task); the narrow 3-column exchange unlocks the cluster and is
    // noise once the source has real file parallelism
    graft.ext.Dedup.spreadForCompute(
        documents.select(col("doc_id"), col("text"), col("n_chars")))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          s"application/x-fake-$kind", -1, -1, nChars * 10)
      }
  }
}
