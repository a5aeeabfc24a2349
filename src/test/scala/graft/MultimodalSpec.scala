package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def media = Multimodal.ingestFromDocuments(
    Tables.documents(spark, TestSession.sf), "doc_id", "text")

  test("ingest: payload bytes equal UTF-8 text bytes; kinds round-robin") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSession.sf)
    val joined = media.join(docs, col("media_id") === col("doc_id"))
    val bad = joined.filter(length($"payload") =!= length(encode($"text", "UTF-8"))).count()
    assert(bad == 0)
    val kinds = media.select($"kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and entropy is sane") {
    import spark.implicits._
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "features must not depend on partitioning")
    f1.foreach { f =>
      assert(f.byte_entropy >= 0 && f.byte_entropy <= 8, s"entropy out of range: $f")
      assert(f.mean_byte > 0 && f.mean_byte < 256)
      f.kind match {
        case "image" => assert(f.width > 0 && f.height > 0 && f.sample_rate == 0)
        case "audio" => assert(f.sample_rate > 0 && f.width == 0)
        case "video" => assert(f.width > 0 && f.height > 0)
      }
    }
  }

  test("frame sampling keeps ceil(nFrames/stride) frames in order") {
    import spark.implicits._
    val sampled = Multimodal.frameSample(media, frameBytes = 16, stride = 4)
      .select($"media_id", $"payload", $"sampled", $"n_frames", $"n_kept").collect()
    sampled.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val kept = r.getAs[Array[Byte]]("sampled")
      val expected = payload.grouped(16).zipWithIndex
        .collect { case (f, i) if i % 4 == 0 => f }.flatten.toArray
      assert(kept.sameElements(expected), s"frame content mismatch for ${r.getLong(0)}")
      assert(r.getInt(3) == math.ceil(payload.length / 16.0).toInt)
      assert(r.getInt(4) == math.ceil(r.getInt(3) / 4.0).toInt)
    }
  }

  test("resize caps payload near the byte budget and is a no-op under it") {
    import spark.implicits._
    val resized = Multimodal.resizeToBudget(media, 64)
      .select($"media_id", length($"payload").as("n")).as[(Long, Int)].collect()
    resized.foreach { case (id, n) => assert(n <= 64 + 1, s"media $id still $n bytes") }
    val small = Multimodal.resizeToBudget(media, 1 << 20)
    val diff = small.join(media.withColumnRenamed("payload", "orig"), "media_id")
      .filter(md5($"payload") =!= md5($"orig")).count()
    assert(diff == 0, "under-budget payloads must be untouched")
  }

  test("aHash64: known 64-byte ramp sets exactly the above-mean bits") {
    // cells = bytes 0..63, mean 31.5 → bits 32..63 set
    val ramp = (0 until 64).map(_.toByte).toArray
    assert(Multimodal.aHash64(ramp) == 0xFFFFFFFF00000000L)
    assert(Multimodal.aHash64(Array.empty[Byte]) == 0L)
    assert(Multimodal.aHash64(null) == 0L)
    // constant payload: no cell exceeds the mean → all bits clear
    assert(Multimodal.aHash64(Array.fill(100)(7.toByte)) == 0L)
  }

  test("nearDupPairs equals brute force for hamming <= 3") {
    import spark.implicits._
    // payloads with controlled bit flips: swapping a below-mean cell with
    // an above-mean cell keeps the total (and so the threshold) EXACT
    // while flipping exactly those two bits — k swaps = hamming 2k
    val ramp = (0 until 64).map(_.toByte).toArray
    def swapped(k: Int): Array[Byte] = {
      val p = ramp.clone()
      (0 until k).foreach { j =>
        val t = p(j); p(j) = p(63 - j); p(63 - j) = t
      }
      p
    }
    val rows = Seq(
      (1L, ramp), (2L, swapped(1)), (3L, swapped(2)),
      (4L, swapped(5)), (5L, ramp.clone())) ++
      (6L to 40L).map(i =>
        i -> Array.tabulate(64)(j => ((i * 37 + j * j * 13) % 256).toByte))
    val media = rows.toDF("media_id", "payload")
    val got = Multimodal.nearDupPairs(media, "media_id", 3)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)]
      .collect().toSet
    val hashes = rows.map { case (id, p) => id -> Multimodal.aHash64(p) }
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L, 2)) && got.contains((1L, 5L, 0)))
    // hamming 4 (two swaps) and 10 (five) sit past the threshold
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) })
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 4L) })
  }

  test("keyframes: identical frames collapse to frame 0; a cut is kept") {
    import spark.implicits._
    val frame = "abcdefgh" * 8                 // 64 chars
    val cut = "ZZZZZZZZ" + "abcdefgh" * 7      // very different start
    val docs = Seq(
      (1L, frame + frame + frame),             // 3 identical frames
      (2L, frame + cut + frame)                // change at frame 1 and back
    ).toDF("doc_id", "text")
    val got = Multimodal.keyframes(docs, "doc_id", "text", 64, 10)
      .select("media_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 0L)) && !got.contains((1L, 1L)) &&
      !got.contains((1L, 2L)))
    assert(got.contains((2L, 0L)))
    // frame 1 differs from 0 AND frame 2 differs from 1 → both kept iff
    // the hash moves by > τ; verify via the hashes directly
    val h = Multimodal.aHash64(frame.getBytes)
    val hc = Multimodal.aHash64(cut.getBytes)
    if (java.lang.Long.bitCount(h ^ hc) > 10) {
      assert(got.contains((2L, 1L)) && got.contains((2L, 2L)))
    }
  }

  // ---- real-image decode (javax.imageio) ----

  /** Render a w×h image with a pixel function and encode it as PNG. */
  private def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("decodeImage: real PNG dimensions/channels; text payloads refuse") {
    val p = png(40, 25)((x, y) => (x * 6) << 16 | (y * 9) << 8 | 40)
    val Some((w, h, c, gray)) = Multimodal.decodeImage(p)
    assert(w == 40 && h == 25 && c == 3 && gray.length == 40 * 25)
    // luminance of pixel (0,0): r=0,g=0,b=40 → (114*40)/1000 = 4
    assert((gray(0) & 0xFF) == 4)
    assert(Multimodal.decodeImage("just some text".getBytes).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("real aHash: half-bright image hashes by luminance, not bytes") {
    // left half dark, right half bright → exactly the 4 right-hand cell
    // columns set (32 bits), at ANY resolution — a structural property
    // the byte-resampled fallback cannot reproduce from PNG bytes
    val p = png(160, 96)((x, _) => if (x < 80) 0x101010 else 0xE0E0E0)
    val h = Multimodal.aHash64Auto(p)
    assert(java.lang.Long.bitCount(h) == 32, f"got ${java.lang.Long.bitCount(h)} bits in $h%016x")
    // one-pixel perturbation: perceptual hash unchanged (tiny blocks mean)
    val p2 = png(160, 96)((x, y) =>
      if (x == 3 && y == 3) 0x202020 else if (x < 80) 0x101010 else 0xE0E0E0)
    assert(java.lang.Long.bitCount(h ^ Multimodal.aHash64Auto(p2)) <= 1,
      "near-identical images must be near-dup under the real aHash")
    // the raw PNG BYTES of p and p2 differ substantially (deflate
    // cascade), so the decoded-hash agreement is evidence of real decode
    val byteHash1 = Multimodal.aHash64(p)
    val byteHash2 = Multimodal.aHash64(p2)
    assert(h != byteHash1 || byteHash1 != byteHash2,
      "decoded hash should not be the byte-fallback hash")
    // a structurally different image is far away
    val p3 = png(160, 96)((_, y) => if (y % 12 < 6) 0x000000 else 0xFFFFFF)
    assert(java.lang.Long.bitCount(h ^ Multimodal.aHash64Auto(p3)) > 10)
  }

  test("withAHash + nearDupPairs find the perturbed PNG pair; extractFeatures reads real dims") {
    import spark.implicits._
    val p = png(64, 64)((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0x202020 else 0xD0D0D0)
    val pNear = png(64, 64)((x, y) =>
      if (x == 0 && y == 0) 0x303030
      else if ((x / 8 + y / 8) % 2 == 0) 0x202020 else 0xD0D0D0)
    val pFar = png(64, 64)((x, _) => if (x < 32) 0x000000 else 0xFFFFFF)
    val media = Seq((1L, "image", p), (2L, "image", pNear), (3L, "image", pFar),
        (4L, "image", "not an image at all, just text".getBytes))
      .toDF("media_id", "kind", "payload")
    val pairs = Multimodal.nearDupPairs(media, "media_id", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"perturbed PNG pair not found: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 64 && feats(1L).height == 64 && feats(1L).channels == 3)
    // the text payload falls back to byte-derived stub dims — deterministic
    assert(feats(4L).width >= 64)
  }

  /** Minimal RIFF/WAVE writer: PCM16 mono. */
  private def wav16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeWav: true sample rate/duration/RMS for PCM16; text refuses") {
    // square wave at half amplitude: every sample ±16384 → RMS = 0.5 exact
    val sq = Array.tabulate(8000)(i => if (i % 2 == 0) 16384 else -16384)
      .map(_.toShort)
    val Some(w) = Multimodal.decodeWav(wav16(16000, sq))
    assert(w.sampleRate == 16000 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.nFrames == 8000 && w.durationMs == 500.0)
    assert(w.rms == 0.5, s"rms=${w.rms}")
    // silence
    val Some(z) = Multimodal.decodeWav(wav16(8000, Array.fill(100)(0.toShort)))
    assert(z.rms == 0.0 && z.nFrames == 100)
    // refusals: text, truncated header, null
    assert(Multimodal.decodeWav("definitely not audio".getBytes).isEmpty)
    assert(Multimodal.decodeWav(wav16(16000, sq).take(20)).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
    // hostile chunk sizes must terminate (no int-wraparound loop): a
    // RIFF/WAVE header whose first chunk claims size 0xFFFFFFF8
    val evil = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
      .array()
    assert(Multimodal.decodeWav(evil).isEmpty)
    // a valid fmt followed by a lying data size clamps to the real bytes
    val clipped = wav16(8000, Array.fill(10)(1000.toShort))
    clipped(43) = 0x7F // inflate the data chunk's size field high byte
    val Some(c) = Multimodal.decodeWav(clipped)
    assert(c.nFrames == 10, s"clamped frames ${c.nFrames}")
    // a fmt chunk whose declared size is < 16 must NOT be parsed (it
    // would read the next chunk's bytes as format fields) — stub fallback
    val tinyFmt = java.nio.ByteBuffer.allocate(60)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(52)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(4).putShort(1).putShort(1)
      .put("data".getBytes("US-ASCII")).putInt(4).putInt(0)
      .array()
    assert(Multimodal.decodeWav(tinyFmt).isEmpty)
    // a duplicate fmt chunk later in the file must not override the first
    val base = wav16(16000, Array.fill(4)(1000.toShort))
    val dup = java.nio.ByteBuffer.allocate(base.length + 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(base)
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100)
      .putInt(44100 * 4).putShort(4).putShort(16)
      .array()
    val Some(d) = Multimodal.decodeWav(dup)
    assert(d.sampleRate == 16000 && d.channels == 1,
      s"first fmt must govern: $d")
  }

  test("audioFeatures: WAV rows decode for real, text rows take the stub") {
    import spark.implicits._
    val sq = Array.tabulate(4410)(i => if (i % 2 == 0) 16384 else -16384)
      .map(_.toShort)
    val rows = Seq(
      (1L, "audio", wav16(44100, sq)),
      (2L, "audio", "utf-8 text fixture payload".getBytes))
      .toDF("media_id", "kind", "payload")
    val f = Multimodal.audioFeatures(rows).collect().map(a => a.media_id -> a).toMap
    assert(f(1L).decoded && f(1L).sample_rate == 44100 && f(1L).rms == 0.5 &&
      f(1L).n_frames == 4410 && f(1L).duration_ms == 100.0)
    assert(!f(2L).decoded && f(2L).sample_rate > 0 && f(2L).rms == 0.0)
    // the metadata ladder feeds extractFeatures the decoded rate too
    val ef = Multimodal.extractFeatures(rows).collect().map(a => a.media_id -> a).toMap
    assert(ef(1L).sample_rate == 44100 && ef(1L).channels == 1)
  }
}
