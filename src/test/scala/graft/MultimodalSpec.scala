package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Catalog

/** The multimodal path: image payloads are REAL PNGs decoded through
  * javax.imageio (content-checked); audio/video keep the deterministic
  * stub codec over the same batched partition-level plumbing.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("decodeImage recovers dimensions, channels, and exact pixel means") {
    // hand-built 2×2 with four distinct pixels — means are channel
    // averages over all pixels, not any single pixel
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = Multimodal.decodeImage(bos.toByteArray)
    assert((d.width, d.height, d.channels) == (2, 2, 3))
    assert(d.means.toSeq == Seq(63.75f, 63.75f, 63.75f)) // 255/4 per channel
  }

  test("syntheticPng roundtrips through the real decoder") {
    val (id, nChars) = (42L, 1234L)
    val d = Multimodal.decodeImage(Multimodal.syntheticPng(id, nChars))
    assert(d.width == Multimodal.imageWidth(id))
    assert(d.height == Multimodal.imageHeight(nChars))
    val (r, g, b) = Multimodal.imageRgb(id)
    assert(d.means.toSeq == Seq(r.toFloat, g.toFloat, b.toFloat)) // PNG is lossless
  }

  test("decodeImage fails loudly on undecodable bytes") {
    intercept[RuntimeException] {
      Multimodal.decodeImage("not an image".getBytes("UTF-8"))
    }
  }

  test("media table has the declared schema shape") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, SparkTestSession.sfDir))
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "kind", "bytes", "width", "height"))
    assert(media.schema("bytes").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeStub: fixed 16-dim shape, normalized, deterministic") {
    val b = "some fake media payload".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(b)
    val f2 = Multimodal.decodeStub(b)
    assert(f1.length == 16)
    assert(f1.toSeq == f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-5) // histogram normalized by length
    assert(Multimodal.decodeStub(Array.empty[Byte]).toSeq == Seq.fill(16)(0f))
  }

  test("extractFeatures preserves rows, drops bytes, routes codecs by kind") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, SparkTestSession.sfDir))
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    assert(!feats.schema.fieldNames.contains("bytes"))
    // image rows: real decode → 3 channel means + decoded dims matching
    // the metadata columns; stub kinds: 16 bins, null decoded fields
    val dims = feats.groupBy(col("kind"), size(col("features")).as("dim"))
      .count().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dims == Map("image" -> 3, "audio" -> 3, "video" -> 16))
    assert(feats.filter(col("kind") === "image" &&
      (col("decoded_width") =!= col("width") ||
       col("decoded_height") =!= col("height"))).count() == 0)
    assert(feats.filter(col("kind") === "video" && col("channels").isNotNull).count() == 0)
    // audio rows decode through the real WAV path: mono format
    assert(feats.filter(col("kind") === "audio" && col("channels") =!= 1).count() == 0)
    // deterministic across runs
    val a = feats.select("media_id", "features").orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(media).select("media_id", "features").orderBy("media_id").collect()
    assert(a.sameElements(b))
  }

  test("sampleFrames: every step-th index, count matches the frame formula") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, SparkTestSession.sfDir))
    val frames = Multimodal.sampleFrames(media, frameBytes = 100, step = 2)
    val perDoc = frames.groupBy("media_id", "n_frames").agg(count(lit(1)).as("n")).collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val expected = (r.getLong(1) + 1) / 2 // ceil(n_frames/2) sampled at step 2
      assert(r.getLong(2) == expected, s"media ${r.getLong(0)}")
    }
    val idx = frames.filter(col("media_id") === perDoc.head.getLong(0))
      .select("frame_idx").collect().map(_.getLong(0)).sorted
    assert(idx.zipWithIndex.forall { case (v, i) => v == 2L * i })
  }

  test("decodeWav round-trips syntheticWav with exact analytic features") {
    for (id <- Seq(1L, 7L, 100L); nChars <- Seq(40L, 999L)) {
      val d = Multimodal.decodeWav(Multimodal.syntheticWav(id, nChars))
      assert(d.sampleRate == Multimodal.audioSampleRate(id))
      assert(d.nSamples == Multimodal.audioNumSamples(nChars).toLong)
      assert(d.channels == 1)
      // square wave: RMS is EXACTLY the amplitude
      assert(math.abs(d.rms - Multimodal.audioAmplitude(id)) < 1e-9,
        s"id=$id rms=${d.rms} amp=${Multimodal.audioAmplitude(id)}")
    }
  }

  test("resizeImage: exact nearest-neighbor sampling, bit-deterministic") {
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, (y * 4 + x) << 16)
    val out = Multimodal.resizeImage(img, 2, 2)
    // sample positions floor(x*4/2) = {0, 2}: pixels (0,0) (2,0) (0,2) (2,2)
    // getRGB on TYPE_INT_RGB reports 0xFF alpha bits — mask to the RGB payload
    assert((out.getRGB(0, 0) & 0xffffff) == (0 << 16))
    assert((out.getRGB(1, 0) & 0xffffff) == (2 << 16))
    assert((out.getRGB(0, 1) & 0xffffff) == (8 << 16))
    assert((out.getRGB(1, 1) & 0xffffff) == (10 << 16))
  }

  test("aHash: solid image is degenerate zero; gradient is not; scale-invariant") {
    val solid = Multimodal.syntheticPng(3L, 40L)
    assert(Multimodal.aHash(solid) == 0L)
    val grad = Multimodal.syntheticGradientPng(3L, 40L)
    val h = Multimodal.aHash(grad)
    assert(h != 0L)
    // the hash of an 8×-upscaled copy of the same pattern is close: aHash
    // is a perceptual key, not a byte fingerprint
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(grad))
    val big = Multimodal.resizeImage(img, img.getWidth * 8, img.getHeight * 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", bos)
    val hBig = Multimodal.aHash(bos.toByteArray)
    assert(java.lang.Long.bitCount(h ^ hBig) <= 8,
      s"upscale moved the hash ${java.lang.Long.bitCount(h ^ hBig)} bits")
  }

  test("imageNearDupPairs finds a perturbed copy and skips unrelated images") {
    import spark.implicits._
    val base = Multimodal.syntheticGradientPng(3L, 40L)
    // perturb one corner cell of a copy: few aHash bits move
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    img.setRGB(0, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      (1L, "image", base),
      (2L, "image", bos.toByteArray),
      (3L, "image", Multimodal.syntheticGradientPng(40L, 123L)))
      .toDF("media_id", "kind", "bytes")
    val pairs = Multimodal.imageNearDupPairs(Multimodal.imageHashes(media), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  private def reEncode(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("pHash: deterministic, discriminative, and stable under upscaling") {
    val grad = Multimodal.syntheticGradientPng(3L, 40L)
    val h = Multimodal.pHash(grad)
    assert(h == Multimodal.pHash(grad)) // bit-deterministic
    // a different gradient pattern lands far away
    val other = Multimodal.pHash(Multimodal.syntheticGradientPng(40L, 123L))
    assert(java.lang.Long.bitCount(h ^ other) >= 12,
      s"unrelated images only ${java.lang.Long.bitCount(h ^ other)} bits apart")
    // perceptual, not a byte fingerprint: an 8×-upscaled copy stays close
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(grad))
    val hBig = Multimodal.pHash(
      reEncode(Multimodal.resizeImage(img, img.getWidth * 8, img.getHeight * 8)))
    assert(java.lang.Long.bitCount(h ^ hBig) <= 8,
      s"upscale moved the hash ${java.lang.Long.bitCount(h ^ hBig)} bits")
  }

  test("pHash shrugs off high-frequency noise that moves aHash") {
    // per-pixel alternating ±12 noise: pure high-frequency energy, which
    // the 8×8 LOW-frequency DCT block barely sees but per-pixel mean
    // thresholding feels on every near-threshold cell — the brittleness
    // pHash exists to fix. The clean/noisy pHash distance must be small
    // and no larger than aHash's on the identical image pair.
    val base = Multimodal.syntheticGradientPng(7L, 200L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val d = if ((x + y) % 2 == 0) 12 else -12
      val rgb = img.getRGB(x, y)
      def clip(v: Int) = math.max(0, math.min(255, v))
      img.setRGB(x, y, (clip(((rgb >> 16) & 0xff) + d) << 16) |
        (clip(((rgb >> 8) & 0xff) + d) << 8) | clip((rgb & 0xff) + d))
    }
    val noisy = reEncode(img)
    val pClean = Multimodal.pHash(base); val pNoisy = Multimodal.pHash(noisy)
    val aClean = Multimodal.aHash(base); val aNoisy = Multimodal.aHash(noisy)
    val pDist = java.lang.Long.bitCount(pClean ^ pNoisy)
    val aDist = java.lang.Long.bitCount(aClean ^ aNoisy)
    assert(pDist <= 4, s"pHash moved $pDist bits under pixel noise")
    assert(pDist <= aDist, s"pHash ($pDist) should be at most aHash ($aDist)")
  }

  test("imageNearDupPairs over phash: parity with the aHash pairs on clones") {
    import spark.implicits._
    val base = Multimodal.syntheticGradientPng(3L, 40L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    img.setRGB(0, 0, 0xffffff) // one-pixel perturbation of a copy
    val media = Seq(
      (1L, "image", base),
      (2L, "image", reEncode(img)),
      (3L, "image", Multimodal.syntheticGradientPng(40L, 123L)))
      .toDF("media_id", "kind", "bytes")
    val pPairs = Multimodal.imageNearDupPairs(Multimodal.imagePHashes(media),
        maxHamming = 6, hashCol = "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pPairs.toSeq == Seq((1L, 2L))) // same verdicts as the aHash test
    // and the distributed hash matches the local function exactly
    val got = Multimodal.imagePHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == Multimodal.pHash(base))
    assert(got(3L) == Multimodal.pHash(Multimodal.syntheticGradientPng(40L, 123L)))
  }

  test("audioFingerprint: analytic harmonic peaks, gain invariance, frame count") {
    // period-8 square wave at N=256 → harmonics at exactly bins 32 and 96
    // (fundamental f=sr/8 → bin N/8; 3rd harmonic 3N/8; 5N/8 > Nyquist).
    // Band layout: band 2 covers bins 32..47 (peak at within-band 0),
    // band 6 covers 96..111 (peak at within-band 0).
    // The Hann kernel smears each harmonic onto its ±1 neighbors
    // (coefficients 0.5 / 0.25), so REAL energy sits at bins
    // {31,32,33, 95,96,97}: band 1 peaks at 31 (within-band 15),
    // band 2 at 32 (0), band 5 at 95 (15), band 6 at 96 (0); bands
    // 0/3/4/7 hold only rounding noise and must emit the 0xff sentinel.
    val fps = Multimodal.audioFingerprint(Multimodal.syntheticWav(1L, 999L))
    val n = Multimodal.audioNumSamples(999L) // 400 + 999%800 = 599
    assert(fps.length == (n - 256) / 128 + 1)
    for (fp <- fps; (band, want) <- Seq(0 -> 0xffL, 1 -> 15L, 2 -> 0L,
        3 -> 0xffL, 4 -> 0xffL, 5 -> 15L, 6 -> 0L, 7 -> 0xffL)) {
      assert(((fp >> (8 * band)) & 0xff) == want,
        s"band $band of ${fp.toHexString}: want $want")
    }
    // stationary signal + hop divisible by the period: every frame equal
    assert(fps.distinct.length == 1)
    // gain invariance: different ids → different amplitudes, same wave
    // shape and (bin-relative) spectrum → identical fingerprints
    val other = Multimodal.audioFingerprint(Multimodal.syntheticWav(6L, 999L))
    assert(Multimodal.audioSampleRate(1L) != Multimodal.audioSampleRate(6L) ||
      Multimodal.audioAmplitude(1L) != Multimodal.audioAmplitude(6L))
    assert(other.head == fps.head)
    // too-short payload (sub-frame): no fingerprints, no error
    assert(Multimodal.audioFingerprint(
      Multimodal.syntheticWav(1L, 0L)).nonEmpty) // 400 samples ≥ 1 frame
  }

  test("audioFingerprints: distributed pass matches the local function") {
    import spark.implicits._
    val rows = Seq(1L -> 40L, 2L -> 999L).map { case (id, nc) =>
      (id, "audio", Multimodal.syntheticWav(id, nc))
    }.toDF("media_id", "kind", "bytes")
    val got = Multimodal.audioFingerprints(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Seq(1L -> 40L, 2L -> 999L).flatMap { case (id, nc) =>
      Multimodal.audioFingerprint(Multimodal.syntheticWav(id, nc))
        .zipWithIndex.map { case (fp, i) => (id, i.toLong) -> fp }
    }.toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("tone fixture: gain-variant group members fingerprint identically, groups differ") {
    // two ids in tone group 0 (1, 4: both /21 == 0) at different gains
    // and lengths, one id in group 1 (22)
    assert(Multimodal.toneGroup(1L) == Multimodal.toneGroup(4L))
    assert(Multimodal.toneGroup(22L) != Multimodal.toneGroup(1L))
    val a = Multimodal.audioFingerprint(Multimodal.syntheticToneWav(1L, 100L))
    val b = Multimodal.audioFingerprint(Multimodal.syntheticToneWav(4L, 900L))
    val c = Multimodal.audioFingerprint(Multimodal.syntheticToneWav(22L, 100L))
    assert(Multimodal.audioAmplitude(1L) != Multimodal.audioAmplitude(4L))
    // gain + length invariance: the shorter clip's fp set is contained
    // in (here: equal to) the longer's
    assert(a.toSet.subsetOf(b.toSet) || b.toSet.subsetOf(a.toSet))
    assert((a.toSet & c.toSet).isEmpty, "distinct tone groups shared a frame fp")
  }

  test("audioNearDupPairs + m9 flow: perturbed-copy recall, unrelated clips stay apart") {
    import spark.implicits._
    // clip 2 = clip 1's waveform at a different gain/length (group 0);
    // clip 22 = an unrelated tone group; clip 25 = 22's re-rip (group 1)
    val media = Seq(1L -> 100L, 4L -> 900L, 22L -> 300L, 25L -> 200L)
      .map { case (id, nc) => (id, "audio", Multimodal.syntheticToneWav(id, nc)) }
      .toDF("media_id", "kind", "bytes")
    val fps = Multimodal.audioFingerprints(media)
    val pairs = Multimodal.audioNearDupPairs(fps).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(pairs == Seq((1L, 4L), (22L, 25L)))
    // end-to-end components: {1,4} and {22,25}, canonical = min id
    val comps = graft.operators.Dedup
      .connectedComponents(Multimodal.audioNearDupPairs(fps)
        .select(col("id1").as("doc1"), col("id2").as("doc2")), pairsDistinct = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 4L -> 1L, 22L -> 22L, 25L -> 22L))
  }

  test("audioMatches: offset voting finds the source clip; silence never matches") {
    import spark.implicits._
    // index: one clip per tone group (ids 1 and 22 are different groups)
    val index = Multimodal.audioFingerprints(
      Seq(1L -> 900L, 22L -> 900L)
        .map { case (id, nc) => (id, "audio", Multimodal.syntheticToneWav(id, nc)) }
        .toDF("media_id", "kind", "bytes"))
    // query 100: two silent frames then group-1's waveform (a time-shifted
    // re-rip); query 200: pure silence (every frame the 0xff sentinel)
    def wavOf(pcm: Array[Int], sr: Int): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
      val out = new Array[Byte](pcm.length * 2)
      var i = 0
      while (i < pcm.length) {
        out(2 * i) = (pcm(i) & 0xff).toByte
        out(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(out),
        fmt, pcm.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val (sr22, pcm22) = Multimodal.decodePcmMono(Multimodal.syntheticToneWav(22L, 500L))
    val queries = Multimodal.audioFingerprints(Seq(
      (100L, "audio", wavOf(new Array[Int](256) ++ pcm22, sr22)),
      (200L, "audio", wavOf(new Array[Int](512), 8000)))
      .toDF("media_id", "kind", "bytes"))
    val got = Multimodal.audioMatches(queries, index).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // query 100 matches clip 22 on the shifted diagonal; the silent query
    // produces no row at all (sentinel fps are excluded, not mismatched)
    assert(got.keySet == Set(100L), got.toString)
    assert(got(100L)._1 == 22L)
    assert(got(100L)._2 >= 1L, s"expected a positive time offset, got ${got(100L)}")
  }

  test("audioNearDupPairs excludes the silence sentinel: silent clips never dedup against unrelated audio") {
    import spark.implicits._
    def wavOf(pcm: Array[Int], sr: Int): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
      val out = new Array[Byte](pcm.length * 2)
      var i = 0
      while (i < pcm.length) {
        out(2 * i) = (pcm(i) & 0xff).toByte
        out(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(out),
        fmt, pcm.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // clip 1: ALL silence (distinct fps = {-1} only); clips 2 and 30:
    // unrelated tone groups, each padded with trailing silence so they
    // also carry a -1 frame. Pre-sentinel-filter, clip 1 reached
    // containment 1.0 against BOTH (shared {-1} over min nfp 1) and
    // bridged them into one component; with the filter it pairs with
    // nothing, and the two tone clips stay apart (their non-silent fps
    // differ). Clip 23 is clip 2's group at another gain/length — real
    // recall must survive the filter, silence padding and all.
    val (sr2, pcm2) = Multimodal.decodePcmMono(Multimodal.syntheticToneWav(2L, 500L))
    val (_, pcm23) = Multimodal.decodePcmMono(Multimodal.syntheticToneWav(2L, 100L))
    val (_, pcm30) = Multimodal.decodePcmMono(Multimodal.syntheticToneWav(30L, 500L))
    val fps = Multimodal.audioFingerprints(Seq(
        (1L, "audio", wavOf(new Array[Int](512), sr2)),
        (2L, "audio", wavOf(pcm2 ++ new Array[Int](512), sr2)),
        (23L, "audio", wavOf(pcm23 ++ new Array[Int](512), sr2)),
        (30L, "audio", wavOf(pcm30 ++ new Array[Int](512), sr2)))
      .toDF("media_id", "kind", "bytes"))
    // the fixture really does put the sentinel in every clip's fp set
    assert(fps.filter(col("fp") === lit(-1L)).select("media_id").distinct().count() == 4)
    // 0.6: the tone→silence boundary frames fingerprint slightly apart at
    // the two lengths (2 of 3 non-silent fps shared); the unrelated pair
    // (2, 30) shares only 1 of 3 (a decay-frame artifact) and stays apart
    val pairs = Multimodal.audioNearDupPairs(fps, minContainment = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(pairs == Seq((2L, 23L)), s"got $pairs")
  }
}
