package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import TestSpark._

class MultimodalSpec extends AnyFunSuite {
  private lazy val media =
    Multimodal.syntheticMedia(Tables.documents(spark, "/root/testdata/sf0.001"))

  test("decode is deterministic and partition-invariant") {
    val a = collectSorted(Multimodal.extractFeatures(media, parallelism = 1).toDF()
      .select(col("media_id"), col("n_bytes"), col("checksum"), col("features")))
    val b = collectSorted(Multimodal.extractFeatures(media, parallelism = 7).toDF()
      .select(col("media_id"), col("n_bytes"), col("checksum"), col("features")))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("decoded n_bytes equals the payload byte length") {
    val joined = Multimodal.extractFeatures(media).toDF()
      .join(media.select(col("media_id"), length(col("payload")).as("plen")), Seq("media_id"))
      .filter(col("n_bytes") =!= col("plen")).count()
    assert(joined == 0)
  }

  test("features have the declared shape and are vector-pipeline compatible") {
    val f = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    assert(f.select(size(col("embedding"))).distinct().head().getInt(0) == 16)
    // feeds straight into the ANN operators
    val top = graft.ops.VectorOps.annBruteForce(f, nQueries = 2, k = 3)
    assert(top.count() == 6)
  }

  test("resize honors the byte budget, never upsamples, and is partition-invariant") {
    val resized = Multimodal.resize(media, 320, 180).collect()
    val orig = media.select(col("media_id"), col("meta.width"), col("meta.height"),
      length(col("payload")).as("n")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong * r.getInt(2), r.getInt(3))).toMap
    resized.foreach { r =>
      val (origPixels, n) = orig(r.media_id)
      assert(r.meta.width == 320 && r.meta.height == 180)
      assert(r.payload.length <= n, "resize must never grow the payload")
      val budget = 320L * 180
      val expectM =
        if (n == 0) 0 else if (budget >= origPixels) n
        else math.max(1L, n.toLong * budget / origPixels).toInt
      assert(r.payload.length == expectM, s"media ${r.media_id}: ${r.payload.length} vs $expectM")
      // gather is a subsequence of the original (spot-check first byte)
      if (expectM > 0) {
        val origBytes = media.filter(col("media_id") === r.media_id)
          .select(col("payload")).head().getAs[Array[Byte]](0)
        assert(r.payload(0) == origBytes(0))
      }
    }
    // partition-invariance: a reshuffled input yields the identical result
    val shuffled = Multimodal.resize(media.repartition(7), 320, 180).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    assert(shuffled == resized.map(r => r.media_id -> r.payload.toSeq).toMap)
  }

  test("sampled frames are exact byte slices of the payload") {
    val frames = Multimodal.sampleFrames(media, frameSize = 16, stride = 2)
    val first = frames.filter(col("frame_index") === 0)
      .join(media, Seq("media_id"))
      .filter(col("frame") =!= substring(col("payload"), 1, 16))
      .count()
    assert(first == 0)
    assert(frames.count() > 0)
  }

  test("frame near-dup pairs a re-encode with one changed frame; exact dedup cannot") {
    val s = spark
    import s.implicits._
    // 8 frames of 32 bytes each; media 2 = media 1 with ONE frame
    // rewritten (a re-encode artifact) — payload hashes differ, frame
    // sets share 7/8 (jaccard 7/9 on the union... frame sets: 8 vs 8,
    // shared 7 -> 7/(8+8-7) = 0.78; use minJaccard 0.7); media 3 is
    // unrelated footage
    def block(c: Char) = c.toString * 32
    val f1 = "abcdefgh".map(block)
    val f2 = f1.updated(3, block('Z'))
    val f3 = "qrstuvwx".map(block)
    val docs = Seq(
      (1L, f1.mkString, "en", "web"),
      (2L, f2.mkString, "en", "web"),
      (3L, f3.mkString, "en", "web")).toDF("doc_id", "text", "lang", "source")
    val m = Multimodal.syntheticMedia(docs)
    val pairs = Multimodal.mediaNearDupFrames(m, minJaccard = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"expected only (1,2), got $pairs")
    assert(math.abs(pairs((1L, 2L)) - 0.777778) < 1e-6)
    // whole-payload dedup is blind to the re-encode
    assert(Multimodal.mediaDedup(m).count() == 0)
  }

  test("perceptual near-dup: a brightness-shifted re-encode pairs at 1.0; md5 frames and exact dedup stay blind") {
    val s = spark
    import s.implicits._
    // media 2 = media 1 through a uniform "brightness" re-encode: every
    // letter byte +1 (an order-preserving byte map, the codec analog of
    // an exposure/quantizer offset). EVERY byte of every frame differs,
    // so md5 frame sets share nothing and payload md5s differ — but no
    // adjacent-byte gradient changes sign, so the dHash frame sets are
    // identical. media 3 is unrelated footage.
    val t1 = ("the quick brown fox jumps over lazy dogs " * 12).trim
    val t2 = t1.map(c => if (c >= 'a' && c <= 'z') (c + 1).toChar else c)
    val t3 = ("packs my box with five dozen liquor jugs " * 12).trim
    val docs = Seq(
      (1L, t1, "en", "web"),
      (2L, t2, "en", "web"),
      (3L, t3, "en", "web")).toDF("doc_id", "text", "lang", "source")
    val m = Multimodal.syntheticMedia(docs)
    val pairs = Multimodal.mediaNearDupPerceptual(m)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"expected only (1,2), got $pairs")
    assert(pairs((1L, 2L)) == 1.0, s"gradient sets must be identical: $pairs")
    // the exact-key variants are blind to the same re-encode
    assert(Multimodal.mediaNearDupFrames(m).count() == 0)
    assert(Multimodal.mediaDedup(m).count() == 0)
  }

  test("hamming near-dup: per-byte noise pairs under banding; exact dHash keys lose it") {
    val s = spark
    import s.implicits._
    // media 2 = media 1 with ONE byte overwritten per 64 (the last char
    // of every 64-block -> 'z'): each 32-byte frame flips at most one
    // gradient bit, so hamming <= 1 per frame — banded matching pairs
    // every frame, while exact dHash KEY equality loses the frames
    // carrying the noisy byte and the jaccard arm drops under threshold.
    val t1 = ("the quick brown fox jumps over lazy dogs " * 12).trim
    val t2 = t1.replaceAll("(.{63}).", "$1z")
    val t3 = ("packs my box with five dozen liquor jugs " * 12).trim
    val docs = Seq(
      (1L, t1, "en", "web"),
      (2L, t2, "en", "web"),
      (3L, t3, "en", "web")).toDF("doc_id", "text", "lang", "source")
    val m = Multimodal.syntheticMedia(docs)
    val ham = Multimodal.mediaNearDupHamming(m)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(ham.keySet == Set((1L, 2L)), s"expected only (1,2), got $ham")
    assert(ham((1L, 2L)) == 1.0, s"every frame within hamming 1: $ham")
    // exact dHash keys: noisy frames differ -> jaccard falls below 0.8
    assert(Multimodal.mediaNearDupPerceptual(m).count() == 0,
      "exact-key dHash must lose the per-byte-noise re-encode")
    // and unrelated footage stays unpaired under banding
    assert(!ham.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("true binary payloads (full byte range, non-ASCII) drive the same plumbing") {
    // Every other media test rides syntheticMedia's UTF-8 text payloads
    // (ASCII makes char ≡ byte). A real codec hands the pipeline raw
    // bytes — negative JVM bytes, zero bytes, the full 0-255 range —
    // so this fixture builds payloads directly from a seeded LCG and
    // asserts the dedup tiers behave identically: exact frames on byte
    // identity, gradient dHash through an order-preserving "brightness"
    // offset, banded hamming through sparse byte noise. The dHash
    // kernel compares bytes UNSIGNED (& 0xff), which is exactly what
    // this pins against a signed-compare regression.
    val s = spark
    import s.implicits._
    def blob(seed: Long, n: Int, mask: Int): Array[Byte] = {
      var x = seed
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 33) & mask).toByte
      }
    }
    // base "image" stays in [0, 127] so the +64 offset is
    // order-preserving with no unsigned wraparound; the unrelated blob
    // spans the whole byte range (negative JVM bytes included)
    val img = blob(1, 2048, 0x7f)
    val shifted = img.map(b => (b + 64).toByte)
    val noisy = img.clone()
    (63 until noisy.length by 64).foreach(i => noisy(i) = (noisy(i) ^ 0x01).toByte)
    val media = Seq(
      (1L, img), (2L, img.clone()), (3L, blob(99, 2048, 0xff)),
      (4L, noisy), (5L, shifted))
      .toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("media_type"), lit(640).as("width"),
          lit(360).as("height"), lit(16000).as("sample_rate"),
          lit(64).as("n_frames")).as("meta"),
        col("payload"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("media_a", "media_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Multimodal.mediaNearDupFrames(media))
    assert(exact.contains((1L, 2L)), "exact arm pairs byte-identical binaries")
    assert(!exact.contains((1L, 5L)), "an offset re-encode changes every frame md5")
    assert(!exact.exists { case (a, b) => a == 3L || b == 3L })
    val dhash = pairs(Multimodal.mediaNearDupPerceptual(media))
    assert(dhash.contains((1L, 5L)),
      "gradient dHash sees through the order-preserving byte offset")
    assert(dhash.contains((1L, 2L)))
    assert(!dhash.exists { case (a, b) => a == 3L || b == 3L })
    val ham = pairs(Multimodal.mediaNearDupHamming(media))
    assert(ham.contains((1L, 4L)), "banded hamming pairs the sparse-noise copy")
    assert(!ham.exists { case (a, b) => a == 3L || b == 3L })
    // the stubbed decoder is byte-faithful on binary payloads too
    val feats = Multimodal.extractFeatures(media).toDF()
    assert(feats.filter(col("n_bytes") =!= 2048).count() == 0)
    assert(feats.count() == 5)
  }

  test("real-format tier: PGM payloads decode to true pixels; dHash is brightness-invariant on them") {
    val s = spark
    import s.implicits._
    val (w, h) = (24, 16)
    def raster(f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h)(i => f(i % w, i / w).toByte)
    val ramp = raster((x, _) => x * 8)              // horizontal ramp, max 184
    val brighter = raster((x, _) => x * 8 + 30)     // +30: no clipping
    val vramp = raster((_, y) => y * 12)            // different gradient structure
    // header round-trip, including the format's comment/whitespace grammar
    val withComment = ("P5\n# camera 7\n " + s"$w $h\n255\n").getBytes("US-ASCII") ++ ramp
    assert(Multimodal.Pgm.decode(Multimodal.Pgm.encode(w, h, ramp)).exists {
      case (dw, dh, px) => dw == w && dh == h && px.sameElements(ramp) })
    assert(Multimodal.Pgm.decode(withComment).exists {
      case (dw, dh, px) => dw == w && dh == h && px.sameElements(ramp) })
    assert(Multimodal.Pgm.decode("not a pgm".getBytes).isEmpty)
    assert(Multimodal.Pgm.decode("P5\n4 4\n255\nabc".getBytes).isEmpty, "short raster")

    def mediaOf(rows: (Long, Array[Byte])*) = rows.toSeq.toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("media_type"), lit(w).as("width"),
          lit(h).as("height"), lit(0).as("sample_rate"),
          lit(1).as("n_frames")).as("meta"),
        col("payload"))
    val fake = "fake-encoded blob".getBytes // non-PGM: stub-tier fallback
    val media = mediaOf(
      1L -> Multimodal.Pgm.encode(w, h, ramp),
      2L -> Multimodal.Pgm.encode(w, h, brighter),
      3L -> Multimodal.Pgm.encode(w, h, vramp),
      4L -> fake)
    val feats = Multimodal.extractFeatures(media, decoder = Multimodal.PgmDecoder())
      .collect().map(f => f.media_id -> f).toMap
    // perceptual hash over REAL pixels: brightness shift is invisible,
    // a different gradient structure is not
    assert(feats(1L).checksum == feats(2L).checksum,
      "pixel dHash must be invariant under a non-clipping brightness offset")
    assert(feats(1L).checksum != feats(3L).checksum,
      "different gradient structure must hash differently")
    // band features are real image statistics: a vertical ramp's
    // horizontal-band means increase monotonically top to bottom
    val bands = feats(3L).features
    assert(bands.zip(bands.tail).forall { case (a, b) => a <= b },
      s"vertical-ramp band means not monotone: ${bands.mkString(",")}")
    // a horizontal ramp is flat across horizontal bands
    val flat = feats(1L).features
    assert(math.abs(flat.max - flat.min) < 1e-6f)
    // the non-PGM payload fell back to the stub tier, bit-identically
    val stub = Multimodal.FakeDecoder().decodeBatch(Iterator(
      Multimodal.MediaRow(4L,
        Multimodal.MediaMeta("image", w, h, 0, 1), fake))).next()
    assert(feats(4L).checksum == stub.checksum)
    assert(feats(4L).features.toSeq == stub.features.toSeq)
    // same seam, same invariants: partition count never changes output
    val p1 = collectSorted(Multimodal.extractFeatures(media,
      decoder = Multimodal.PgmDecoder(), parallelism = 1).toDF()
      .select(col("media_id"), col("checksum"), col("features")))
    val p7 = collectSorted(Multimodal.extractFeatures(media,
      decoder = Multimodal.PgmDecoder(), parallelism = 7).toDF()
      .select(col("media_id"), col("checksum"), col("features")))
    assert(p1 == p7)
  }

  test("P6 tier: RGB rasters luma-reduce into the same dHash path; a mixed P5/P6/stub corpus tiers per payload") {
    val s = spark
    import s.implicits._
    val (w, h) = (24, 16)
    def gray(f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h)(i => f(i % w, i / w).toByte)
    def rgbOf(r: (Int, Int) => Int, g: (Int, Int) => Int, b: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(3 * w * h) { j =>
        val p = j / 3; val (x, y) = (p % w, p / w)
        (j % 3 match { case 0 => r(x, y); case 1 => g(x, y); case 2 => b(x, y) }).toByte
      }
    val ramp = gray((x, _) => x * 8)
    // a NEUTRAL (r=g=b) P6 of the same scene: luma reduction must make
    // it pixel-identical to its P5 twin — one dHash, either format
    val neutralP6 = Multimodal.Pgm.encodeP6(w, h,
      rgbOf((x, _) => x * 8, (x, _) => x * 8, (x, _) => x * 8))
    val decodedP6 = Multimodal.Pgm.decode(neutralP6)
    assert(decodedP6.exists { case (dw, dh, px) =>
      dw == w && dh == h && px.sameElements(ramp) },
      "neutral RGB must luma-reduce to its gray twin exactly")
    // ITU-R 601 spot check: pure red/green/blue pixels weigh 299/587/114
    val onePx = Multimodal.Pgm.decode(
      Multimodal.Pgm.encodeP6(1, 1, Array(255.toByte, 0, 0))).get._3(0) & 0xff
    assert(onePx == 255 * 299 / 1000, s"red luma $onePx")
    val onePxG = Multimodal.Pgm.decode(
      Multimodal.Pgm.encodeP6(1, 1, Array(0, 255.toByte, 0))).get._3(0) & 0xff
    assert(onePxG == 255 * 587 / 1000, s"green luma $onePxG")
    // chroma-only difference: same luma plane → same dHash as the P5
    def mediaOf(rows: (Long, Array[Byte])*) = rows.toSeq.toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("media_type"), lit(w).as("width"),
          lit(h).as("height"), lit(0).as("sample_rate"),
          lit(1).as("n_frames")).as("meta"),
        col("payload"))
    val fake = "fake-encoded blob".getBytes
    val media = mediaOf(
      1L -> Multimodal.Pgm.encode(w, h, ramp), // P5 tier
      2L -> neutralP6,                         // P6 tier, same scene
      3L -> fake)                              // stub tier
    val feats = Multimodal.extractFeatures(media, decoder = Multimodal.PgmDecoder())
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).checksum == feats(2L).checksum,
      "a P6 of the same scene must dHash identically to its P5 twin")
    assert(feats(1L).features.toSeq == feats(2L).features.toSeq)
    val stub = Multimodal.FakeDecoder().decodeBatch(Iterator(
      Multimodal.MediaRow(3L,
        Multimodal.MediaMeta("image", w, h, 0, 1), fake))).next()
    assert(feats(3L).checksum == stub.checksum, "non-raster payload must stub-tier")
  }

  test("hostile payloads: oversized/overflowing headers and truncated rasters reject to the stub tier, never throw") {
    val s = spark
    import s.implicits._
    val hostile: Seq[(Long, Array[Byte])] = Seq(
      // digit run past Long-safe accumulation (old parser: toInt throws)
      10L -> "P5\n99999999999999999999 5\n255\nxxxx".getBytes("US-ASCII"),
      // 65536×65536: Int product wraps to 0, old guard passed → dHash OOB
      11L -> ("P5\n65536 65536\n255\n" + "x" * 64).getBytes("US-ASCII"),
      // dims just past the sanity cap
      12L -> ("P6\n2000000 2\n255\n" + "x" * 64).getBytes("US-ASCII"),
      // truncated header (no raster separator byte)
      13L -> "P5\n4 4\n255".getBytes("US-ASCII"),
      // P6 with only a gray-sized raster (needs 3×)
      14L -> ("P6\n4 4\n255\n" + "x" * 16).getBytes("US-ASCII"),
      // maxval past 8-bit
      15L -> ("P5\n2 2\n65535\n" + "x" * 8).getBytes("US-ASCII"))
    hostile.foreach { case (id, p) =>
      assert(Multimodal.Pgm.decode(p).isEmpty, s"hostile payload $id must reject") }
    // through the Spark seam: every hostile row lands via the stub
    // tier with the task alive, bit-identical to FakeDecoder
    val media = hostile.toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("media_type"), lit(4).as("width"),
          lit(4).as("height"), lit(0).as("sample_rate"),
          lit(1).as("n_frames")).as("meta"),
        col("payload"))
    val feats = Multimodal.extractFeatures(media, decoder = Multimodal.PgmDecoder())
      .collect().map(f => f.media_id -> f.checksum).toMap
    hostile.foreach { case (id, p) =>
      val stub = Multimodal.FakeDecoder().decodeBatch(Iterator(
        Multimodal.MediaRow(id, Multimodal.MediaMeta("image", 4, 4, 0, 1), p))).next()
      assert(feats(id) == stub.checksum, s"payload $id did not stub-tier")
    }
  }

  test("BMP tier: 24-bit rasters (bottom-up and top-down) join the gray/dHash path; hostile BMPs reject") {
    val s = spark
    import s.implicits._
    val w = 16; val h = 12
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 7 + (i / 3) * 13) % 251).toByte)
    // container equivalence: the SAME rgb raster through the P6 arm and
    // the BMP arm must luma-reduce to the SAME gray pixels
    val Some((pw, ph, pGray)) = Multimodal.Pgm.decode(Multimodal.Pgm.encodeP6(w, h, rgb))
    val Some((bw, bh, bGray)) = Multimodal.Bmp.decode(Multimodal.Bmp.encodeRgb(w, h, rgb))
    assert((bw, bh) == ((pw, ph)))
    assert(java.util.Arrays.equals(bGray, pGray),
      "BMP (BGR bottom-up padded) and P6 (RGB top-down) must decode to one gray raster")
    // top-down variant: a vertically pre-flipped raster stored bottom-up
    // has its file rows in top-down image order; negating the height
    // field marks it so — decode must undo both orderings identically
    val flipped = Array.tabulate(3 * w * h) { i =>
      val row = i / (3 * w); rgb(3 * w * (h - 1 - row) + i % (3 * w))
    }
    val td = Multimodal.Bmp.encodeRgb(w, h, flipped)
    val neg = -h
    td(22) = (neg & 0xff).toByte; td(23) = ((neg >> 8) & 0xff).toByte
    td(24) = ((neg >> 16) & 0xff).toByte; td(25) = ((neg >> 24) & 0xff).toByte
    val Some((_, _, tdGray)) = Multimodal.Bmp.decode(td)
    assert(java.util.Arrays.equals(tdGray, bGray), "top-down BMP must match bottom-up")
    // one gray image in two containers shares its perceptual dHash
    // through the full Spark seam — the mixed corpus tiers per payload
    val gray = Array.tabulate(w * h)(i => (i % 251).toByte)
    val grayRgb = gray.flatMap(v => Array(v, v, v)) // r=g=b: luma is exact identity
    val media = Seq(
      1L -> Multimodal.Pgm.encode(w, h, gray),
      2L -> Multimodal.Bmp.encodeRgb(w, h, grayRgb),
      3L -> "neither format".getBytes("US-ASCII"))
      .toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("media_type"), lit(w).as("width"),
          lit(h).as("height"), lit(0).as("sample_rate"),
          lit(1).as("n_frames")).as("meta"),
        col("payload"))
    val feats = Multimodal.extractFeatures(media, decoder = Multimodal.PgmDecoder())
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(feats(1L) == feats(2L),
      "PGM and BMP containers of one image must share the perceptual dHash")
    assert(feats(1L) == Multimodal.Pgm.dHash(w, h, gray))
    assert(feats(3L) != feats(1L)) // the stub row took the fake tier
    // PADDED width: 16*3 = 48 is 4-byte aligned, so the cases above
    // never exercise row padding — a 5-wide raster (stride 16, 1 pad
    // byte per row) must still round-trip against its P6 twin
    val padW = 5; val padH = 4
    val prgb = Array.tabulate(3 * padW * padH)(i => ((i * 11 + 3) % 249).toByte)
    val Some((_, _, padP6)) = Multimodal.Pgm.decode(Multimodal.Pgm.encodeP6(padW, padH, prgb))
    val Some((_, _, padBmp)) = Multimodal.Bmp.decode(Multimodal.Bmp.encodeRgb(padW, padH, prgb))
    assert(java.util.Arrays.equals(padBmp, padP6),
      "row padding mis-stride: padded-width BMP diverged from its P6 twin")
    // hostile battery: every malformation returns None, never throws
    def patched(f: (Array[Byte]) => Unit): Array[Byte] = {
      val p = Multimodal.Bmp.encodeRgb(w, h, rgb).clone(); f(p); p
    }
    val hostile: Seq[(String, Array[Byte])] = Seq(
      "short header" -> "BM".getBytes("US-ASCII"),
      "wrong magic" -> patched(p => p(0) = 'X'),
      "8-bit depth" -> patched(p => p(28) = 8),
      "RLE compression" -> patched(p => p(30) = 1),
      "zero width" -> patched { p => p(18) = 0; p(19) = 0; p(20) = 0; p(21) = 0 },
      "width past cap" -> patched { p => p(18) = 0; p(19) = 0; p(20) = 0; p(21) = 0x7f },
      "height Int.MinValue (abs overflow)" -> patched { p =>
        p(22) = 0; p(23) = 0; p(24) = 0; p(25) = 0x80.toByte },
      "data offset past payload" -> patched { p => p(10) = 0xff.toByte; p(11) = 0xff.toByte },
      "truncated raster" -> Multimodal.Bmp.encodeRgb(w, h, rgb).take(54 + 7),
      "core-header DIB" -> patched(p => p(14) = 12))
    hostile.foreach { case (name, p) =>
      assert(Multimodal.Bmp.decode(p).isEmpty, s"hostile BMP '$name' must reject") }
  }

  test("PNG tier: gray and RGB rasters inflate + unfilter into the shared gray/dHash path; hostile PNGs reject") {
    val s = spark
    import s.implicits._
    val w = 16; val h = 12
    // gray round trip: encode (filter-0 rows, one zlib IDAT) → decode
    val gray = Array.tabulate(w * h)(i => ((i * 31 + 7) % 253).toByte)
    val Some((gw, gh, gOut)) = Multimodal.Png.decode(Multimodal.Png.encodeGray(w, h, gray))
    assert((gw, gh) == ((w, h)))
    assert(java.util.Arrays.equals(gOut, gray), "gray PNG must round-trip exactly")
    // container equivalence: one rgb raster through P6, BMP, and PNG
    // must luma-reduce to the SAME gray pixels (shared ITU-R 601 path)
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 7 + (i / 3) * 13) % 251).toByte)
    val Some((_, _, p6Gray)) = Multimodal.Pgm.decode(Multimodal.Pgm.encodeP6(w, h, rgb))
    val Some((_, _, pngGray)) = Multimodal.Png.decode(Multimodal.Png.encodeRgb(w, h, rgb))
    assert(java.util.Arrays.equals(pngGray, p6Gray),
      "PNG (zlib, filtered) and P6 (raw) must decode to one gray raster")
    // ALL FIVE reconstruction filters: hand-filter each row of the gray
    // raster with filter type (row % 5) and re-wrap the IDAT — decode
    // must invert Sub/Up/Average/Paeth back to the identical pixels
    val rb = w
    val filtered = new Array[Byte]((rb + 1) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      filtered(y * (rb + 1)) = f.toByte
      var x = 0
      while (x < rb) {
        val v = gray(y * rb + x) & 0xff
        val a = if (x >= 1) gray(y * rb + x - 1) & 0xff else 0
        val b = if (y >= 1) gray((y - 1) * rb + x) & 0xff else 0
        val c = if (x >= 1 && y >= 1) gray((y - 1) * rb + x - 1) & 0xff else 0
        val enc = f match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            v - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        filtered(y * (rb + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val mixed = {
      val base = Multimodal.Png.encodeGray(w, h, gray)
      // splice: reuse the encoder's container, replace the IDAT body by
      // deflating the hand-filtered scanlines
      val d = new java.util.zip.Deflater(); d.setInput(filtered); d.finish()
      val zo = new java.io.ByteArrayOutputStream(); val tmp = new Array[Byte](8192)
      while (!d.finished()) zo.write(tmp, 0, d.deflate(tmp)); d.end()
      val z = zo.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, 8 + 8 + 13 + 4) // signature + IHDR chunk
      def w32(v: Long): Unit = { out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
      w32(z.length.toLong); out.write("IDAT".getBytes("US-ASCII"), 0, 4); out.write(z, 0, z.length)
      val crc = new java.util.zip.CRC32(); crc.update("IDAT".getBytes("US-ASCII")); crc.update(z); w32(crc.getValue)
      w32(0L); out.write("IEND".getBytes("US-ASCII"), 0, 4)
      val ec = new java.util.zip.CRC32(); ec.update("IEND".getBytes("US-ASCII")); w32(ec.getValue)
      out.toByteArray
    }
    val Some((_, _, unf)) = Multimodal.Png.decode(mixed)
    assert(java.util.Arrays.equals(unf, gray),
      "Sub/Up/Average/Paeth reconstruction must invert the hand-filtered rows exactly")
    // QUAD-container dHash equality through the full Spark seam
    val grayRgb = gray.flatMap(v => Array(v, v, v)) // r=g=b: luma is identity
    val media = Seq(
      1L -> Multimodal.Pgm.encode(w, h, gray),
      2L -> Multimodal.Bmp.encodeRgb(w, h, grayRgb),
      3L -> Multimodal.Png.encodeGray(w, h, gray),
      4L -> Multimodal.Png.encodeRgb(w, h, grayRgb),
      5L -> "none of the four".getBytes("US-ASCII"))
      .toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("media_type"), lit(w).as("width"),
          lit(h).as("height"), lit(0).as("sample_rate"),
          lit(1).as("n_frames")).as("meta"),
        col("payload"))
    val feats = Multimodal.extractFeatures(media, decoder = Multimodal.PgmDecoder())
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(Set(feats(1L), feats(2L), feats(3L), feats(4L)).size == 1,
      "PGM, BMP, and both PNG containers of one image must share the perceptual dHash")
    assert(feats(5L) != feats(1L)) // the stub row took the fake tier
    // hostile battery: every malformation returns None, never throws
    val good = Multimodal.Png.encodeRgb(w, h, rgb)
    def patched(f: (Array[Byte]) => Unit): Array[Byte] = { val p = good.clone(); f(p); p }
    val hostile: Seq[(String, Array[Byte])] = Seq(
      "short payload" -> good.take(20),
      "wrong signature" -> patched(p => p(0) = 'X'),
      "16-bit depth" -> patched(p => p(24) = 16),
      "palette color type" -> patched(p => p(25) = 3),
      "Adam7 interlace" -> patched(p => p(28) = 1),
      "zero width" -> patched { p => p(16) = 0; p(17) = 0; p(18) = 0; p(19) = 0 },
      "width past cap" -> patched(p => p(16) = 0x7f),
      "truncated IDAT (zlib cut mid-stream)" -> good.take(good.length - 30),
      "chunk length past payload" -> patched { p => p(33) = 0x7f },
      "garbage IDAT bytes" -> patched { p =>
        var i = 41; while (i < math.min(p.length, 61)) { p(i) = 0x55; i += 1 } })
    hostile.foreach { case (name, p) =>
      assert(Multimodal.Png.decode(p).isEmpty, s"hostile PNG '$name' must reject") }
    // a bogus FILTER byte (inside a valid zlib stream) must also reject
    val badFilter = filtered.clone(); badFilter(0) = 9
    val bf = {
      val d = new java.util.zip.Deflater(); d.setInput(badFilter); d.finish()
      val zo = new java.io.ByteArrayOutputStream(); val tmp = new Array[Byte](8192)
      while (!d.finished()) zo.write(tmp, 0, d.deflate(tmp)); d.end()
      val z = zo.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write(Multimodal.Png.encodeGray(w, h, gray), 0, 8 + 8 + 13 + 4)
      def w32(v: Long): Unit = { out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
      w32(z.length.toLong); out.write("IDAT".getBytes("US-ASCII"), 0, 4); out.write(z, 0, z.length); w32(0L)
      w32(0L); out.write("IEND".getBytes("US-ASCII"), 0, 4); w32(0L)
      out.toByteArray
    }
    assert(Multimodal.Png.decode(bf).isEmpty, "bogus filter byte must reject, not mis-decode")
  }

  test("JPEG tier: lossy decode joins the gray/dHash path on smooth fixtures; hostile JPEGs reject") {
    val s = spark
    import s.implicits._
    val (w, h) = (64, 48)
    // strong horizontal gradient: dHash samples the 9×8 grid (steps of
    // ~7 px → ~21 luma per step), far above JPEG quantization error —
    // the "losslessly representable" regime where the perceptual hash
    // must survive the lossy codec
    val grad = Array.tabulate(w * h)(i => ((i % w) * 3).toByte)
    val jpeg = Multimodal.Jpeg.encodeGray(w, h, grad)
    val Some((dw, dh, px)) = Multimodal.Jpeg.decode(jpeg)
    assert((dw, dh) == ((w, h)))
    // lossy: pixels are NEAR, not equal — bound the worst-case error
    val maxErr = px.zip(grad).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 16, s"JPEG round-trip error $maxErr exceeds the smooth-fixture bound")
    assert(!java.util.Arrays.equals(px, grad) || maxErr == 0) // sanity: codec really ran
    // QUINT-container dHash equality through the full Spark seam:
    // the same gradient via PGM, BMP, PNG(gray), PNG(rgb), and JPEG
    val gradRgb = grad.flatMap(v => Array(v, v, v))
    val media = Seq(
      1L -> Multimodal.Pgm.encode(w, h, grad),
      2L -> Multimodal.Bmp.encodeRgb(w, h, gradRgb),
      3L -> Multimodal.Png.encodeGray(w, h, grad),
      4L -> Multimodal.Png.encodeRgb(w, h, gradRgb),
      5L -> jpeg,
      6L -> "not an image at all".getBytes("US-ASCII"))
      .toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("media_type"), lit(w).as("width"),
          lit(h).as("height"), lit(0).as("sample_rate"),
          lit(1).as("n_frames")).as("meta"),
        col("payload"))
    val feats = Multimodal.extractFeatures(media, decoder = Multimodal.PgmDecoder())
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(Set(feats(1L), feats(2L), feats(3L), feats(4L), feats(5L)).size == 1,
      "all five containers of one smooth image must share the perceptual dHash")
    assert(feats(6L) != feats(1L)) // the non-image row took the stub tier
    // brightness invariance survives the codec too (+20, no clipping)
    val bright = Multimodal.Jpeg.encodeGray(w, h, grad.map(v => ((v & 0xff) + 20).toByte))
    val Some((_, _, bp)) = Multimodal.Jpeg.decode(bright)
    assert(Multimodal.Pgm.dHash(w, h, bp) == Multimodal.Pgm.dHash(w, h, grad),
      "dHash must be brightness-invariant across the lossy codec")
    // hostile battery: None, never a throw — the 100 TB corrupt-payload contract
    val hostile: Seq[(String, Array[Byte])] = Seq(
      "SOI only" -> Array(0xff.toByte, 0xd8.toByte),
      "SOI + garbage" -> (Array(0xff.toByte, 0xd8.toByte) ++
        Array.tabulate(200)(i => (i * 37 % 251).toByte)),
      "truncated mid-entropy" -> jpeg.take(jpeg.length / 2),
      "no SOI (text)" -> "P7 not a jpeg".getBytes("US-ASCII"),
      "empty" -> Array.empty[Byte])
    hostile.foreach { case (name, p) =>
      assert(Multimodal.Jpeg.decode(p).isEmpty, s"hostile JPEG '$name' must reject") }
  }
}
