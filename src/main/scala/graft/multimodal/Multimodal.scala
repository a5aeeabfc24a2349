package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Policy for opaque media at 100 TB: carry the payload as a `binary`
  * column WITH typed metadata alongside (never re-probe the blob for
  * facts the pipeline already knows), keep every transform an
  * iterator-to-iterator `mapPartitions` (no per-partition materialization,
  * spill-safe), and never collect payloads to the driver.
  *
  * ==DECODE CONTRACT==
  * Image payloads that are REAL PNG/JPEG/GIF/BMP containers are decoded
  * with the JDK's built-in `javax.imageio` ([[decodeImage]]) — true
  * width/height/channels and a true 8×8 luminance-grid aHash, no
  * external dependency. Payloads ImageIO cannot parse (including this
  * repo's UTF-8 text fixtures) fall back to the deterministic
  * byte-derived path ([[decodeStub]], byte-resampled [[aHash64]]), so
  * every pipeline stays runnable in a codec-less test environment and
  * fixture outputs are unchanged. Audio payloads that are REAL RIFF/WAVE
  * PCM containers decode through the pure-JDK [[decodeWav]] parser (true
  * sample rate / channels / duration / RMS); compressed audio codecs and
  * video remain stubbed (no JDK codec) — their schema/batching/
  * partitioning plumbing is real.
  */
object Multimodal {

  // ImageIO's default file-backed stream cache would touch disk per
  // decode inside executor tasks — keep decodes purely in-memory
  javax.imageio.ImageIO.setUseCache(false)

  /** Real image decode via the JDK's ImageIO: `Some((width, height,
    * channels, gray))` where `gray` is the row-major 8-bit luminance
    * plane (ITU-R BT.601 integer weights, exact: `(299r+587g+114b)/1000`
    * truncated), or `None` when the payload is not a parseable image.
    * Deterministic: pixel access is through `getRGB` (sRGB ints), no
    * float filtering. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 8) return None
    // magic-byte fast path: skip ImageIO's reader probing entirely for
    // payloads that cannot be PNG/JPEG/GIF/BMP (e.g. text fixtures) —
    // keeps the fallback path free of per-row codec machinery
    val isImg = (payload(0) == 0x89.toByte && payload(1) == 'P') || // PNG
      (payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) ||   // JPEG
      (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F') ||
      (payload(0) == 'B' && payload(1) == 'M')
    if (!isImg) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val channels = if (img.getColorModel.hasAlpha) 4
          else if (img.getColorModel.getNumComponents == 1) 1 else 3
        val gray = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
            gray(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
            x += 1
          }
          y += 1
        }
        Some((w, h, channels, gray))
      }
    } catch { case _: Throwable => None }
  }

  /** True 64-bit average hash of a DECODED image: partition the
    * luminance plane into an 8×8 grid of blocks, exact integer mean per
    * block (`Σlum·64 ≥ blockPixels·total/64`-free form: cell sums are
    * compared as `cellMean·64 > Σ cellMeans` like the byte path), bit i
    * set when cell i is brighter than the grid mean. */
  def aHash64Gray(w: Int, h: Int, gray: Array[Byte]): Long = {
    if (w <= 0 || h <= 0) return 0L
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = math.min((y.toLong * 8 / h).toInt, 7)
      var x = 0
      while (x < w) {
        val cx = math.min((x.toLong * 8 / w).toInt, 7)
        val i = cy * 8 + cx
        cells(i) += (gray(y * w + x) & 0xFF)
        counts(i) += 1
        x += 1
      }
      y += 1
    }
    // exact integer threshold: cellMean_i > mean of cell means, scaled
    // through the common denominator Π counts is overkill — compare at
    // 20-bit fixed point (counts ≤ 2^31, sums ≤ 2^39; 2^20 scale keeps
    // everything inside a long)
    val means = new Array[Long](64)
    var i = 0
    while (i < 64) {
      means(i) = if (counts(i) > 0) (cells(i) << 20) / counts(i) else 0L
      i += 1
    }
    var total = 0L
    i = 0
    while (i < 64) { total += means(i); i += 1 }
    var hsh = 0L
    i = 0
    while (i < 64) { if (means(i) * 64L > total) hsh |= (1L << i); i += 1 }
    hsh
  }

  /** Decoded WAV audio: sample rate, channels, bits/sample, sample-frame
    * count and RMS amplitude (normalized to [-1, 1]). */
  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     nFrames: Long, rms: Double) {
    def durationMs: Double = if (sampleRate <= 0) 0.0
      else nFrames.toDouble * 1000.0 / sampleRate
  }

  /** Real audio decode for RIFF/WAVE payloads — a pure-JDK PCM parser
    * (no codec dependency): walks the chunk list, reads `fmt ` (PCM
    * integer 8/16/32-bit or IEEE-float 32-bit) and `data`, and computes
    * the true sample rate / channel count / frame count / RMS in one
    * deterministic byte-order pass. `None` for anything that isn't a
    * parseable PCM WAV (compressed codecs, text fixtures) — callers fall
    * back to the byte stub, so fixture outputs never change. */
  def decodeWav(payload: Array[Byte]): Option[WavInfo] = {
    if (payload == null || payload.length < 44) return None
    if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
          payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
          payload(10) == 'V' && payload(11) == 'E')) return None
    def le16(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def le32(o: Int): Long = (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
      ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
    // chunk offsets walk in LONG arithmetic: a size field is 4 unsigned
    // bytes (up to ~4.29e9), so int math could truncate to a negative or
    // non-advancing offset — a crafted header must end the walk (stub
    // fallback), never hang the executor or throw out of bounds
    var off = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= payload.length) {
      val o = off.toInt
      val cid = new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(o + 4) // unsigned 32-bit, 0..0xFFFFFFFF
      val body = off + 8
      // honor the chunk's own declared size (sz >= 16 — a shorter fmt
      // chunk must not read the next chunk's bytes as format fields) and
      // keep only the FIRST fmt chunk; a duplicate later in the file is
      // malformed and must not overwrite the governing format
      if (cid == "fmt " && fmt.isEmpty && sz >= 16 && body + 16 <= payload.length)
        fmt = Some((le16(o + 8), le16(o + 10), le32(o + 12).toInt, le16(o + 22)))
      else if (cid == "data" && dataOff < 0) {
        dataOff = body.toInt
        dataLen = math.min(sz, payload.length - body)
      }
      off = body + sz + (sz & 1L) // word-aligned; Long arith can't wrap here
    }
    fmt match {
      case Some((af, ch, sr, bits))
          if dataOff >= 0 && ch > 0 && sr > 0 &&
            ((af == 1 && (bits == 8 || bits == 16 || bits == 32)) ||
              (af == 3 && bits == 32)) =>
        val bytesPerSample = bits / 8
        val nSamples = dataLen / bytesPerSample
        if (nSamples <= 0) return Some(WavInfo(sr, ch, bits, 0L, 0.0))
        var sumSq = 0.0
        var i = 0L
        while (i < nSamples) {
          val o = dataOff + (i * bytesPerSample).toInt
          val s = (af, bits) match {
            case (1, 8) => ((payload(o) & 0xFF) - 128) / 128.0
            case (1, 16) => (le16(o).toShort).toDouble / 32768.0
            case (1, 32) => le32(o).toInt.toDouble / 2147483648.0
            case _ => java.lang.Float.intBitsToFloat(le32(o).toInt).toDouble
          }
          sumSq += s * s
          i += 1
        }
        Some(WavInfo(sr, ch, bits, nSamples / ch, math.sqrt(sumSq / nSamples)))
      case _ => None
    }
  }

  /** Decoded-media metadata (the typed half of the binary+metadata pair). */
  case class MediaMeta(kind: String, width: Int, height: Int, channels: Int,
                       sampleRate: Int, nBytes: Long)

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           mean_byte: Double, byte_entropy: Double,
                           width: Int, height: Int, channels: Int, sample_rate: Int)

  /** Build a binary media column deterministically from a text corpus —
    * the ingest surface (text → UTF-8 payload; `kind` round-robins over
    * modalities by id so every modality path is exercised). */
  def ingestFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Metadata decode ladder: real [[decodeImage]] for image payloads,
    * real [[decodeWav]] for audio payloads; anything unparseable falls
    * through to the deterministic byte-derived stub (video has no JDK
    * codec — stub only). */
  private def decodeMeta(kind: String, payload: Array[Byte]): MediaMeta =
    if (kind == "image")
      decodeImage(payload) match {
        case Some((w, h, c, _)) => MediaMeta(kind, w, h, c, 0, payload.length.toLong)
        case None => decodeStub(kind, payload)
      }
    else if (kind == "audio")
      decodeWav(payload) match {
        case Some(w) => MediaMeta(kind, 0, 0, w.channels, w.sampleRate,
          payload.length.toLong)
        case None => decodeStub(kind, payload)
      }
    else decodeStub(kind, payload)

  case class AudioFeatures(media_id: Long, decoded: Boolean, sample_rate: Int,
                           channels: Int, bits_per_sample: Int, n_frames: Long,
                           duration_ms: Double, rms: Double)

  /** Per-payload audio feature extraction (iterator-to-iterator, payloads
    * stay in their partition): true sample rate / duration / RMS for
    * PCM WAV payloads via [[decodeWav]], the deterministic byte stub's
    * metadata (and zeroed signal stats) otherwise — `decoded` says
    * which path a row took. Non-audio rows are filtered out — emitting
    * fabricated "audio" stats for image/video payloads would silently
    * pollute any aggregate over the result. */
  def audioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("kind"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          decodeWav(rec.payload) match {
            case Some(w) => AudioFeatures(rec.media_id, decoded = true,
              w.sampleRate, w.channels, w.bitsPerSample, w.nFrames,
              w.durationMs, w.rms)
            case None =>
              val m = decodeStub("audio",
                if (rec.payload == null) Array.emptyByteArray else rec.payload)
              AudioFeatures(rec.media_id, decoded = false, m.sampleRate,
                m.channels, 0, 0L, 0.0, 0.0)
          }
        }
      }
  }

  /** Byte-derived fallback metadata — deterministic fake dimensions from
    * the payload hash, for payloads no JDK codec can parse (and for the
    * audio/video kinds, which have none). */
  private def decodeStub(kind: String, payload: Array[Byte]): MediaMeta = {
    var h = 1469598103934665603L // FNV offset
    var i = 0
    while (i < math.min(payload.length, 64)) { h ^= payload(i); h *= 1099511628211L; i += 1 }
    val a = math.abs(h)
    kind match {
      case "image" => MediaMeta(kind, 64 + (a % 1024).toInt, 64 + ((a >> 10) % 1024).toInt,
        if (a % 5 == 0) 1 else 3, 0, payload.length.toLong)
      case "audio" => MediaMeta(kind, 0, 0, if (a % 2 == 0) 1 else 2,
        Array(8000, 16000, 22050, 44100)((a % 4).toInt), payload.length.toLong)
      case _ => MediaMeta(kind, 320 + (a % 640).toInt, 240 + ((a >> 8) % 480).toInt,
        3, 0, payload.length.toLong)
    }
  }

  /** Batch feature extraction: one pass per partition, iterator-to-iterator
    * (constant memory per task), emitting byte-level statistics + the
    * stub-decoded metadata. The Scala analog of a batched Pandas-UDF
    * (`mapInPandas`) pipeline stage. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val p = rec.payload
          val hist = new Array[Long](256)
          var sum = 0.0
          var i = 0
          while (i < p.length) { val b = p(i) & 0xFF; hist(b) += 1; sum += b; i += 1 }
          val n = math.max(p.length, 1)
          var entropy = 0.0
          var j = 0
          while (j < 256) {
            if (hist(j) > 0) { val q = hist(j).toDouble / n; entropy -= q * math.log(q) / math.log(2) }
            j += 1
          }
          val meta = decodeMeta(rec.kind, p)
          MediaFeatures(rec.media_id, rec.kind, p.length.toLong, sum / n, entropy,
            meta.width, meta.height, meta.channels, meta.sampleRate)
        }
      }
  }

  /** Video-style frame sampling on the raw payload: fixed-size frames,
    * keep every `stride`-th, preserving order. Pure per-row projection. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val sampler = udf { (payload: Array[Byte]) =>
      if (payload == null || payload.isEmpty) Array.empty[Byte]
      else {
        val out = new java.io.ByteArrayOutputStream()
        var f = 0
        var off = 0
        while (off < payload.length) {
          val len = math.min(frameBytes, payload.length - off)
          if (f % stride == 0) out.write(payload, off, len)
          off += frameBytes
          f += 1
        }
        out.toByteArray
      }
    }
    media.withColumn("sampled", sampler(col("payload")))
      .withColumn("n_frames", ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("int"))
      .withColumn("n_kept", ceil(col("n_frames") / lit(stride.toDouble)).cast("int"))
  }

  /** 64-bit AVERAGE HASH (aHash) of a media payload — the perceptual
    * fingerprint behind image near-dup detection (resize to an 8×8
    * grid, threshold each cell at the grid mean). Without codec libs the
    * "pixels" are the raw payload bytes resampled to 64 cells
    * (`cell_i = payload[⌊i·len/64⌋]`, unsigned); a real decoder would
    * replace only the sampling, not the thresholding or anything
    * downstream. The threshold compares `cell·64 > Σcells` in exact
    * integer arithmetic — no float mean to drift. Empty payloads hash
    * to 0. */
  def aHash64(payload: Array[Byte]): Long = {
    if (payload == null || payload.isEmpty) return 0L
    val cells = new Array[Int](64)
    var i = 0
    while (i < 64) {
      cells(i) = payload(((i.toLong * payload.length) / 64).toInt) & 0xFF
      i += 1
    }
    var total = 0L
    i = 0
    while (i < 64) { total += cells(i); i += 1 }
    var h = 0L
    i = 0
    while (i < 64) { if (cells(i) * 64L > total) h |= (1L << i); i += 1 }
    h
  }

  /** Perceptual hash with real decode when possible: a payload ImageIO
    * parses gets the true luminance-grid [[aHash64Gray]]; anything else
    * (text fixtures, audio, video) gets the byte-resampled [[aHash64]].
    * Deterministic either way. */
  def aHash64Auto(payload: Array[Byte]): Long =
    decodeImage(payload) match {
      case Some((w, h, _, gray)) => aHash64Gray(w, h, gray)
      case None => aHash64(payload)
    }

  /** The input plus an `ahash` column (iterator-to-iterator, payloads
    * never leave their partition). Real-image payloads hash through the
    * decoded luminance plane; others through the byte fallback. */
  def withAHash(media: DataFrame): DataFrame = {
    val hasher = udf((p: Array[Byte]) => aHash64Auto(p))
    media.withColumn("ahash", hasher(col("payload")))
  }

  /** Keyframe selection by frame difference — shot-boundary detection
    * under the same honest stub contract as the rest of this module: the
    * "video" is the payload text chunked into fixed `frameChars` frames,
    * each frame perceptually hashed ([[aHash64]] on its bytes), and a
    * frame is a KEYFRAME when its hash differs from the PREVIOUS frame's
    * by more than `tau` bits (frame 0 always is). A real codec would
    * replace the chunking+sampling only; the lag/threshold/selection
    * machinery is the production shape.
    *
    * Scale: frames explode per item (bounded by payload/frameChars), the
    * lag runs under a per-item window — one key shuffle, no cross-item
    * state. */
  def keyframes(docs: DataFrame, idCol: String, textCol: String,
                frameChars: Int, tau: Int): DataFrame = {
    require(frameChars >= 1 && tau >= 0, s"bad params $frameChars/$tau")
    val hashText = udf((s: String) =>
      aHash64(if (s == null) null else s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val frames = docs.select(col(idCol).as("media_id"),
        posexplode(expr(
          s"transform(sequence(0, int(ceil(length($textCol) / $frameChars.0)) - 1)," +
          s" i -> substring($textCol, i * $frameChars + 1, $frameChars))"))
          .as(Seq("frame_idx", "frame")))
      .withColumn("ahash", hashText(col("frame")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("prev", lag(col("ahash"), 1).over(w))
      .withColumn("hamming",
        when(col("prev").isNull, lit(64L))
          .otherwise(bit_count(col("ahash").bitwiseXOR(col("prev"))).cast("long")))
      .filter(col("prev").isNull || col("hamming") > tau)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("ahash"), col("hamming"))
  }

  /** Perceptual near-dup pairs: media whose aHashes differ in at most
    * `maxHamming` of 64 bits. EXACT for `maxHamming ≤ 3` via 4-band
    * LSH on 16-bit slices — pigeonhole: ≤ 3 flipped bits cannot touch
    * all 4 bands, so every qualifying pair collides on at least one
    * unchanged band (the same guarantee structure as the SimHash band
    * join, on the perceptual hash).
    *
    * Scale shape: payloads reduce to 8-byte hashes in the scan; the
    * band join shuffles (band, key16, id, hash) only — 4 rows of ~28
    * bytes per media item, never payloads; verification
    * (`bit_count(xor) ≤ h`) runs inside the join, and the pair dedup is
    * the only post-join exchange. */
  def nearDupPairs(media: DataFrame, idCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band recall guarantee holds for maxHamming <= 3, got $maxHamming")
    val hashed = withAHash(media).select(col(idCol).as("id"), col("ahash"))
    val keys = (0 until 4).map(b =>
      shiftrightunsigned(col("ahash"), b * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = hashed.select(col("id"), col("ahash"),
        posexplode(array(keys: _*)).as(Seq("band", "key")))
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** "Resize": deterministic payload down-sampling to a byte budget (every
    * k-th byte) with the metadata updated to match — the shape of a real
    * thumbnailing stage without the codec. */
  def resizeToBudget(media: DataFrame, maxBytes: Int): DataFrame = {
    val shrink = udf { (payload: Array[Byte]) =>
      if (payload == null || payload.length <= maxBytes) payload
      else {
        val step = math.ceil(payload.length.toDouble / maxBytes).toInt
        payload.indices.collect { case i if i % step == 0 => payload(i) }.toArray
      }
    }
    media.withColumn("payload", shrink(col("payload")))
  }
}
