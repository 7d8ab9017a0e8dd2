package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.BinaryFunctions._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def bin(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  test("detectFormat recognizes real magic bytes") {
    val df = Seq(
      ("jpeg", bin(0xFF, 0xD8, 0xFF, 0xE0, 1, 2)),
      ("png", bin(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A)),
      ("gif", bin(0x47, 0x49, 0x46, 0x38, 0x39)),
      ("riff", bin(0x52, 0x49, 0x46, 0x46, 9, 9)),
      ("pdf", bin(0x25, 0x50, 0x44, 0x46, 0x2D)),
      ("unknown", bin(0x00, 0x01, 0x02))).toDF("expected", "content")
    val got = df.select(col("expected"), detectFormat(col("content")).as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("frameSample frames reassemble to the original bytes") {
    val payload = Array.tabulate(150)(i => (i % 251).toByte)
    val df = Seq((1L, payload)).toDF("id", "content")
    val frames = Multimodal.frameSample(df, "id", "content", frameBytes = 64)
      .orderBy("frame_idx").select("frame").as[Array[Byte]].collect()
    assert(frames.length == 3)
    assert(frames.map(_.length).toSeq == Seq(64, 64, 22))
    assert(frames.flatten.sameElements(payload))
  }

  test("metadata matches JDK digests") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val df = Seq((1L, payload)).toDF("id", "content")
    val row = Multimodal.withMetadata(df, "content").head()
    assert(row.getAs[Int]("byte_size") == payload.length)
    val jdk = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      .map("%02x".format(_)).mkString
    assert(row.getAs[String]("sha256") == jdk)
  }

  test("synthWav round-trips through the real WAV decoder") {
    val payload = Array.tabulate(200)(i => (i % 251).toByte)
    val wav = Multimodal.synthWav(payload)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((rate, channels, samples)) = Multimodal.decodeWav(wav)
    assert(rate == 8000 && channels == 1)
    assert(samples.length == payload.length)
    payload.zip(samples).foreach { case (b, s) =>
      assert(s == (((b & 0xFF) - 128) * 256).toShort)
    }
  }

  test("decodeWav skips unknown chunks and rejects malformed input") {
    val wav = Multimodal.synthWav(Array[Byte](1, 2, 3, 4))
    // splice a LIST chunk between fmt and data (offset 36 = end of fmt)
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 9, 9, 9, 9)
    val spliced = wav.slice(0, 36) ++ extra ++ wav.drop(36)
    val lenBuf = java.nio.ByteBuffer.wrap(spliced, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    lenBuf.putInt(spliced.length - 8)
    val Some((_, _, samples)) = Multimodal.decodeWav(spliced)
    assert(samples.length == 4)
    assert(Multimodal.decodeWav("not a wav at all".getBytes).isEmpty)
    assert(Multimodal.decodeWav(wav.take(20)).isEmpty)
    // final ODD-sized chunk with no padding byte: the word-align step
    // must clamp to the buffer end (return None), not throw
    val oddTail = "junk".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 7, 7, 7)
    assert(Multimodal.decodeWav(wav.slice(0, 36) ++ oddTail).isEmpty)
    // declared chunk size past the buffer end must fail, not crash
    val truncated = wav.take(50)
    assert(Multimodal.decodeWav(truncated).isEmpty)
  }

  test("wav energy features match a hand-computed windowed sum") {
    val payload = "Hello".getBytes("US-ASCII")
    val wav = Multimodal.synthWav(payload)
    val Some((_, _, samples)) = Multimodal.decodeWav(wav)
    val feats = Multimodal.wavEnergyFeatures(samples)
    assert(feats.length == 16)
    val amps = payload.map(b => ((b & 0xFF) - 128) * 256L)
    val expected = new Array[Double](16)
    amps.zipWithIndex.foreach { case (a, i) =>
      expected((i * 16 / amps.length).toInt) += (a * a).toDouble
    }
    assert(feats.toSeq == expected.toSeq)
    assert(feats.sum == amps.map(a => a * a).sum.toDouble)
  }

  test("decodeToFeatures uses the real decode for WAV content") {
    val df = spark.range(0, 50)
      .select(col("id"), concat(lit("doc "), col("id")).cast("binary").as("payload"))
      .repartition(4)
    val wavUdf = udf((b: Array[Byte]) => Multimodal.synthWav(b))
    val withWav = df.select(col("id"), wavUdf(col("payload")).as("content"))
    val rows = Multimodal.decodeToFeatures(withWav, "id", "content").collect()
    assert(rows.length == 50)
    // windowed energies are large non-negative integers — nothing like
    // the [-1,1] fake-embed range, proving the real path ran
    rows.foreach { r =>
      val f = r.getSeq[Double](r.fieldIndex("features"))
      assert(f.length == 16)
      assert(f.forall(v => v >= 0 && v == math.rint(v)))
      assert(f.sum > 1e6)
    }
  }

  test("decode stub: fixed dim, deterministic, distributed") {
    val df = spark.range(0, 100)
      .select(col("id"), concat(lit("doc"), col("id")).cast("binary").as("content"))
      .repartition(4)
    val feats = Multimodal.decodeToFeatures(df, "id", "content")
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.getAs[Seq[Double]]("features").length == 16))
    assert(rows.forall(_.getAs[Seq[Double]]("features").forall(v => v >= -1 && v <= 1)))
    val again = Multimodal.decodeToFeatures(df, "id", "content").collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("synthBmp round-trips through the real BMP decoder") {
    val payload = (0 until 20).map(i => (i * 11 + 3).toByte).toArray // 20 bytes → 7×3 canvas
    val Some((w, h, gray)) = Multimodal.decodeBmp(Multimodal.synthBmp(payload))
    assert(w == 7 && h == 3)
    // pixel k (row-major TOP-DOWN) must equal payload byte k — a
    // decoder that forgets the bottom-up storage reverses the rows
    assert(gray.take(20).toSeq == payload.map(_ & 0xFF).toSeq)
    assert(gray.drop(20).forall(_ == 0), "past-the-end pixels are zero padding")
  }

  test("decodeBmp handles top-down (negative height) and rejects non-BMP") {
    // hand-build a 2×2 top-down BMP: negative height means rows are
    // stored in display order, no flip
    val w = 2; val h = 2
    val stride = ((w * 3 + 3) / 4) * 4 // 8
    val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(-h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // row 0 (display top): pixels 10, 20; row 1: 30, 40
    buf.put(10.toByte).put(10.toByte).put(10.toByte)
      .put(20.toByte).put(20.toByte).put(20.toByte).put(0.toByte).put(0.toByte)
    buf.put(30.toByte).put(30.toByte).put(30.toByte)
      .put(40.toByte).put(40.toByte).put(40.toByte).put(0.toByte).put(0.toByte)
    val Some((dw, dh, gray)) = Multimodal.decodeBmp(buf.array())
    assert(dw == 2 && dh == 2 && gray.toSeq == Seq(10, 20, 30, 40))
    // rejects: wrong magic, 8-bpp, truncated pixel array
    assert(Multimodal.decodeBmp("not a bmp".getBytes).isEmpty)
    val bad = Multimodal.synthBmp(Array[Byte](1, 2, 3)).clone()
    bad(28) = 8 // bpp field
    assert(Multimodal.decodeBmp(bad).isEmpty)
    assert(Multimodal.decodeBmp(Multimodal.synthBmp(Array.fill(30)(7.toByte)).take(60)).isEmpty)
  }

  test("wav quality features: clipping, peak, and zero crossings hand-computed") {
    // payload bytes: 0 (clip low), 255 (clip high), 128 (zero), then a
    // sign-alternating run 100, 200, 100, 200 (amps -7168, +18432, ...)
    val payload = bin(0, 255, 128, 100, 200, 100, 200)
    val Some((_, _, samples)) = Multimodal.decodeWav(Multimodal.synthWav(payload))
    val (clipped, maxAbs, zc) = Multimodal.wavQualityFeatures(samples)
    assert(clipped == 2L, "bytes 0 and 255 sit at the PCM16 rails")
    assert(maxAbs == 32768, "peak is the low rail's magnitude")
    // sign sequence: -,+,0,-,+,-,+ → crossings at (0,1),(3,4),(4,5),(5,6)
    // (the 0 amp at index 2 breaks the (1,2),(2,3) products)
    assert(zc == 4L, s"zero crossings: $zc")

    // symmetric rails beyond the synthWav contract: the window is 255
    // below EACH rail, so -32513 clips like 32512 while -32512/32511
    // (256 inside) do not
    val (cSym, _, _) = Multimodal.wavQualityFeatures(
      Array[Short](-32513, -32512, 32511, 32512, -32768, 32767))
    assert(cSym == 4L, s"symmetric near-rail clipping: $cSym")
  }

  test("silence segments: runs, longest and total hand-computed; distributed twin agrees") {
    // |amp| < 2048 is silent: [0, 100] | 3000 | [-5, 2047] | -2048 | [0]
    val samples = Array[Short](0, 100, 3000, -5, 2047, -2048, 0)
    val (nSilent, nRuns, longest) = Multimodal.wavSilenceFeatures(samples)
    assert(nSilent == 5L && nRuns == 3L && longest == 2L,
      s"($nSilent, $nRuns, $longest)")
    // all-silent and all-loud edges
    assert(Multimodal.wavSilenceFeatures(Array[Short](0, 0, 0)) == ((3L, 1L, 3L)))
    assert(Multimodal.wavSilenceFeatures(Array[Short](9000, -9000)) == ((0L, 0L, 0L)))

    // distributed path over a synthWav payload: byte b → amp (b-128)*256,
    // so bytes 121..135 are the silent window
    import spark.implicits._
    val silPayload = bin(128, 121, 200, 135, 120, 128)
    // amps: 0, -1792, 18432, 1792, -2048, 0 → runs [0,-1792], [1792], [0]
    val sdf = Seq((1L, Multimodal.synthWav(silPayload))).toDF("id", "content")
    val row = Multimodal.decodeWavToSilence(sdf, "id", "content").collect().head
    assert(row.getLong(1) == 6L && row.getLong(2) == 4L &&
      row.getLong(3) == 3L && row.getLong(4) == 2L, row.toString)
  }

  test("wav quality distributed path: null row for non-WAV, exact row for WAV") {
    import spark.implicits._
    val payload = bin(0, 255, 128, 100, 200, 100, 200)
    val wavUdf = udf((b: Array[Byte]) => Multimodal.synthWav(b))
    val df = Seq((1L, payload), (2L, "not audio".getBytes))
      .toDF("id", "raw")
      .select(col("id"),
        when(col("id") === 1L, wavUdf(col("raw"))).otherwise(col("raw")).as("content"))
    val rows = Multimodal.decodeWavToQuality(df, "id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == payload.length.toLong)
    assert(rows(1L).getLong(2) == 2L && rows(1L).getInt(3) == 32768 &&
      rows(1L).getLong(4) == 4L)
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(4))
  }

  test("wav resample: factor 1 is identity, stride math hand-computed, short clip keeps one sample") {
    import spark.implicits._
    val wavUdf = udf((b: Array[Byte]) => Multimodal.synthWav(b))
    // bytes → amps: (b-128)*256; 6 samples, stride 4 reads indices 0, 4
    val payload = bin(128, 129, 130, 131, 132, 133) // amps 0,256,512,768,1024,1280
    val df = Seq((1L, payload), (2L, bin(130)), (3L, "nope".getBytes))
      .toDF("id", "raw")
      .select(col("id"),
        when(col("id") =!= 3L, wavUdf(col("raw"))).otherwise(col("raw")).as("content"))
    val r4 = Multimodal.decodeWavToResampled(df, "id", "content", factor = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    // id 1: out = [amp0=0, amp4=1024]; sum_abs 1024; chk = 1*0 + 2*1024
    assert(r4(1L).getLong(1) == 6L && r4(1L).getLong(2) == 2L, r4(1L))
    assert(r4(1L).getLong(3) == 1024L && r4(1L).getLong(4) == 2048L, r4(1L))
    assert(r4(1L).getInt(5) == 0 && r4(1L).getInt(6) == 1024, r4(1L))
    // id 2: clip shorter than the stride keeps exactly its first sample
    assert(r4(2L).getLong(2) == 1L && r4(2L).getInt(5) == 512 &&
      r4(2L).getInt(6) == 512, r4(2L))
    // non-WAV → null row
    assert(r4(3L).isNullAt(1) && r4(3L).isNullAt(6))
    // factor 1 is the identity resample
    val r1 = Multimodal.decodeWavToResampled(df.filter(col("id") === 1L),
      "id", "content", factor = 1).head()
    assert(r1.getLong(1) == 6L && r1.getLong(2) == 6L, r1)
    assert(r1.getLong(3) == 0 + 256 + 512 + 768 + 1024 + 1280, r1)
    assert(r1.getInt(5) == 0 && r1.getInt(6) == 1280, r1)
  }

  test("image entropy: flat fill yields zero terms; mixed histogram hand-computed") {
    // flat image: every payload byte 7 on a 7×2 canvas → one bin of 14
    val flat = Multimodal.decodeBmp(Multimodal.synthBmp(Array.fill(14)(7.toByte))).get
    val (nF, dF, accF) = Multimodal.bmpEntropyFeatures(flat._3)
    assert(nF == 14L && dF == 1L)
    assert(accF == 14L * math.floor(math.log(14.0) * 1000000).toLong,
      "a single occupied bin carries the whole mass (entropy 0 after the subtraction)")
    // mixed: bytes 1,1,2 + 4 canvas-padding zeros → bins {0:4, 1:2, 2:1}
    val mixed = Multimodal.decodeBmp(Multimodal.synthBmp(Array[Byte](1, 1, 2))).get
    val (nM, dM, accM) = Multimodal.bmpEntropyFeatures(mixed._3)
    assert(nM == 7L && dM == 3L)
    val expected = 4L * math.floor(math.log(4.0) * 1e6).toLong +
      2L * math.floor(math.log(2.0) * 1e6).toLong // ln(1) term is 0
    assert(accM == expected, s"$accM vs $expected")
  }

  test("scene changes: frame alignment, partial tail, and threshold hand-computed") {
    // 3 frames of 4 bytes: f0 = 10,10,10,10; f1 = 10,10,10,10 (delta 0);
    // f2 = 60,60 (partial tail, delta |60-10|*2 = 100)
    val payload = bin(10, 10, 10, 10, 10, 10, 10, 10, 60, 60)
    val (nf, cuts, maxD) = Multimodal.sceneChangeFeatures(payload, frameBytes = 4,
      threshold = 50L)
    assert(nf == 3)
    assert(maxD == 100L, s"partial tail compares only its own positions: $maxD")
    assert(cuts == 1L, "only the tail frame crosses the threshold")
    // single-frame clip: no comparisons at all
    assert(Multimodal.sceneChangeFeatures(bin(1, 2), 4, 1L) == ((1, 0L, 0L)))
    // distributed path over the documents fixture shape
    import spark.implicits._
    val df = Seq((7L, payload)).toDF("id", "content")
    val row = Multimodal.sceneChanges(df, "id", "content", 4, 50L).head()
    assert(row.getInt(1) == 3 && row.getLong(2) == 1L && row.getLong(3) == 100L)
  }

  test("aHash bands: hand-computed grid, crop and mean threshold") {
    // 7×9 image: pixel k = k*4 (0..255 range), so grid cell i samples
    // payload byte (i/8)*7 + (i%8)*7/8 and bits are exactly computable
    val payload = Array.tabulate(63)(k => (k * 4).toByte)
    val Some((w, h, gray)) = Multimodal.decodeBmp(Multimodal.synthBmp(payload))
    val bands = Multimodal.aHashBands(w, h, gray)
    val cells = Array.tabulate(64) { i =>
      val r = i / 8; val c = (i % 8) * 7 / 8; val k = r * 7 + c
      if (r < h && k < payload.length) payload(k) & 0xFF else 0
    }
    val mean = (cells.map(_.toLong).sum / 64).toInt
    val expected = new Array[Int](4)
    cells.zipWithIndex.foreach { case (v, i) =>
      if (v > mean) expected(i / 16) |= 1 << (i % 16)
    }
    assert(bands.toSeq == expected.toSeq)
    // short image: rows past the canvas sample as zero, no crash
    val tiny = Multimodal.decodeBmp(Multimodal.synthBmp(Array[Byte](100, 50))).get
    val tb = Multimodal.aHashBands(tiny._1, tiny._2, tiny._3)
    assert(tb.length == 4)
  }

  test("phash near-dup: banding finds exactly the brute-force pairs") {
    // three exact near-dup pairs (same first-56-byte prefix, different
    // tails) among unrelated documents
    def doc(seed: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(k => ((seed * 37 + k * 11) % 251).toByte)
    val docs = Seq(
      (0L, doc(1, 120)), (1L, doc(1, 120) ++ Array[Byte](1, 2, 3, 4)),
      (2L, doc(2, 200)), (3L, doc(2, 200) ++ "dup".getBytes),
      (4L, doc(3, 90)), (5L, doc(3, 90) ++ Array[Byte](9)),
      (6L, doc(4, 150)), (7L, doc(5, 150)), (8L, doc(6, 80)))
    val bmpUdf = udf((b: Array[Byte]) => Multimodal.synthBmp(b))
    val df = docs.toDF("id", "payload")
      .select(col("id"), bmpUdf(col("payload")).as("content"))
    val hashes = Multimodal.decodeBmpToAHash(df, "id", "content")
    val got = Multimodal.phashNearDupPairs(hashes, maxHamming = 3)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // brute force over the same hashes
    val hs = hashes.collect().map(r => (r.getLong(0),
      Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
    val brute = for {
      (ia, ba) <- hs; (ib, bb) <- hs if ia < ib
      d = (0 to 3).map(j => Integer.bitCount(ba(j) ^ bb(j))).sum if d <= 3
    } yield (ia, ib, d)
    assert(got.toSeq == brute.toSeq.sorted)
    // the three appended-tail pairs are all found at Hamming 0
    assert(got.count(_._3 == 0) >= 3)
    assert(Set((0L, 1L), (2L, 3L), (4L, 5L)).subsetOf(got.map(p => (p._1, p._2)).toSet))
    // a binding bucket cap drops the over-sized buckets entirely: every
    // candidate needs a shared bucket of size >= 2, so cap 1 yields none
    val capped = Multimodal.phashNearDupPairs(hashes, maxHamming = 3, maxBucket = 1)
    assert(capped.count() == 0)
  }

  test("bmp features certify fidelity, un-flip and stride walk") {
    val payload = Array.tabulate(10)(i => (i + 1).toByte) // 1..10 on a 7×2 canvas
    val Some((w, h, gray)) = Multimodal.decodeBmp(Multimodal.synthBmp(payload))
    val (total, topRow, evenCol) = Multimodal.bmpFeatures(w, h, gray)
    assert(total == (1 to 10).sum)
    assert(topRow == (1 to 7).sum, "top row must be payload bytes 0..6 after the un-flip")
    // columns 0,2,4,6 → k in {0,2,4,6,7,9} (second row k=7..9 → cols 0..2)
    assert(evenCol == 1 + 3 + 5 + 7 + 8 + 10)
  }

  test("resizeNearest: identity, downsample, and upsample index math") {
    // identity: same dims returns the same grid
    val g = Array(1, 2, 3, 4, 5, 6) // 3×2 (w=3, h=2)
    assert(Multimodal.resizeNearest(3, 2, g, 3, 2).toSeq == g.toSeq)
    // downsample 3×2 → 2×1: y=0→sy=0; x=0→sx=0, x=1→sx=3/2=1
    assert(Multimodal.resizeNearest(3, 2, g, 2, 1).toSeq == Seq(1, 2))
    // upsample 2×1 → 4×2: sx = x*2/4 = {0,0,1,1}; sy = y*1/2 = 0
    assert(Multimodal.resizeNearest(2, 1, Array(7, 9), 4, 2).toSeq ==
      Seq(7, 7, 9, 9, 7, 7, 9, 9))
    // corners always map to source corners (the m10 pin)
    val big = Array.tabulate(7 * 5)(identity)
    val rz = Multimodal.resizeNearest(7, 5, big, 4, 4)
    assert(rz(0) == big(0), "TL → TL")
    assert(rz(15) == big((3 * 5 / 4) * 7 + 3 * 7 / 4), "BR follows x·w div outW")
  }
}
