package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media as opaque `binary` columns plus typed metadata, with
  * decode / feature-extraction as *batched* partition-local transforms.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, typed
  * Encoders — is shared by two codecs behind one boundary: IMAGES decode
  * for real ([[ImageIoCodec]], `javax.imageio` from the JRE — actual
  * PNG/BMP pixels, dims, luma hashes); audio/video stay STUBBED with a
  * deterministic fake ([[StubCodec]] — those codecs aren't in the JRE; a
  * real deployment swaps in JNI/FFI bindings without touching the
  * pipeline).
  *
  * Scale design:
  *  - media bytes never pass through a shuffle: decode/extract are
  *    `mapPartitions` (narrow) transforms; only small metadata/features
  *    flow downstream.
  *  - batching: records are decoded in groups of `batchSize` mirroring the
  *    vectorized-UDF batch shape (amortizes codec init per batch, exactly
  *    like Arrow batches in a Pandas UDF).
  *  - partition sizing: callers repartition upstream so one partition's
  *    media fits executor memory (`spark.sql.files.maxPartitionBytes`
  *    governs the scan; binary payloads make row size the binding
  *    constraint, not row count).
  */
object Multimodal {
  // r12 optimization: ImageIO's default useCache=true backs every
  // createImageInputStream over a non-file stream with a TEMP FILE
  // (create+write+delete per image decode/encode — syscalls per row for
  // in-memory byte payloads). Memory-cached streams are semantically
  // identical for these ≤KB payloads; set once per JVM, at the object that
  // encloses every ImageIO call site (ImageIoCodec AND the GIF helpers).
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: id + raw bytes + declared type ("image"|"audio"|"video"). */
  case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String)

  /** Decoded metadata + features for one media record. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      sha256: String,
      width: Long,
      height: Long,
      n_frames: Long)

  /** One sampled frame: parent doc, frame index, frame payload digest. */
  case class Frame(doc_id: Long, frame_idx: Long, frame_md5: String)

  /** The codec boundary. A real implementation decodes pixels/samples; the
    * stub derives deterministic fake dimensions from the payload bytes so
    * the pipeline is end-to-end testable (and oracle-checkable).
    */
  trait Codec extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaMeta]
  }

  /** Deterministic fake decode: width/height from the first two payload
    * bytes, one fake "frame" per 100 bytes. sha256 matches Spark's
    * `sha2(col, 256)` and DuckDB's `sha256(...)` (lowercase hex).
    */
  object StubCodec extends Codec {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaMeta] = batch.map { r =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(r.media).map("%02x".format(_)).mkString
      val b0 = if (r.media.nonEmpty) r.media(0) & 0x3f else 0
      val b1 = if (r.media.length > 1) r.media(1) & 0x3f else 0
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = r.media.length.toLong,
        sha256 = hex,
        width = b0 + 1L,
        height = b1 + 1L,
        n_frames = r.media.length / 100 + 1L)
    }
  }

  /** REAL image decode — `javax.imageio` ships in the JRE, so PNG/BMP/GIF
    * decoding needs zero dependencies: width/height come from actual
    * decoded pixels, n_frames = 1 (still image). Payloads ImageIO cannot
    * decode (no registered reader / corrupt container) degrade to
    * width = height = n_frames = 0 rather than failing the task — the
    * permissive-corrupt-row convention every graft source follows.
    * [[StubCodec]] remains the stand-in for audio/video, whose codecs
    * genuinely are not in the JRE.
    */
  object ImageIoCodec extends Codec {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaMeta] = batch.map { r =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(r.media).map("%02x".format(_)).mkString
      val img = decode(r.media)
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = r.media.length.toLong,
        sha256 = hex,
        width = if (img == null) 0L else img.getWidth.toLong,
        height = if (img == null) 0L else img.getHeight.toLong,
        n_frames = if (img == null) 0L else 1L)
    }

    private[graft] def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }

    /** Integer luma of one pixel: the raw sample for single-band
      * (grayscale) images — `getRGB` would round-trip through sRGB color
      * conversion and is NOT the identity on gray — and the classic
      * BT.601 integer weights `(299 r + 587 g + 114 b) / 1000` otherwise.
      */
    private[graft] def lumaAt(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
      if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
      else {
        val rgb = img.getRGB(x, y)
        (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
      }

    /** Perceptual AVERAGE HASH from REAL pixel luma — the image-decode
      * twin of [[frameAHashes]]' byte-level aHash, bit-compatible with its
      * convention: 60 bits over the first 60 pixels row-major, bit set iff
      * the pixel's luma exceeds the integer mean, MSB-first fold. None if
      * the payload does not decode or carries fewer than 60 pixels.
      */
    def aHash(bytes: Array[Byte]): Option[Long] = aHashOf(decode(bytes))

    /** REAL raster resize — nearest-neighbor with EXPLICIT integer
      * mapping `src(x·sw/dw, y·sh/dh)` (floor division), not Java2D's
      * AffineTransformOp (whose inverse-transform rounding is
      * implementation lore): every output pixel is a deterministic
      * integer formula of the input raster, so a SQL oracle can
      * recompute the resized image exactly. Output is GRAY (luma) PNG —
      * the perceptual pipeline's working space (aHash is luma-based);
      * color sources luma-convert with the same BT.601 weights as
      * [[lumaAt]]. Null in / undecodable in → null out.
      */
    private[graft] def resizeNearest(bytes: Array[Byte],
                                     dw: Int, dh: Int): Array[Byte] = {
      val img = decode(bytes)
      if (img == null || dw <= 0 || dh <= 0) null
      else {
        val (sw, sh) = (img.getWidth, img.getHeight)
        val out = new java.awt.image.BufferedImage(
          dw, dh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < dh) {
          var x = 0
          while (x < dw) {
            out.getRaster.setSample(x, y, 0, lumaAt(img, x * sw / dw, y * sh / dh))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }

    private[graft] def aHashOf(img: java.awt.image.BufferedImage): Option[Long] = {
      if (img == null || img.getWidth.toLong * img.getHeight < 60) None
      else {
        val w = img.getWidth
        val lumas = (0 until 60).map(i => lumaAt(img, i % w, i / w).toLong)
        val mean = lumas.sum / 60
        Some(lumas.foldLeft(0L)((acc, l) => acc * 2 + (if (l > mean) 1L else 0L)))
      }
    }
  }

  /** Deterministic grayscale PNG — the m08 TEST FIXTURE generator: pixel
    * (x, y) carries gray value `f(x, y)`, encoded through the JRE's real
    * PNG writer so [[ImageIoCodec]] decodes genuine compressed image
    * bytes, not a fabricated container.
    */
  def syntheticGrayPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL audio decode — `javax.sound.sampled` ships in the JRE, so
    * WAV/RIFF PCM containers decode with zero dependencies: sample rate,
    * channel count and frame count come from the actual container header,
    * and the fingerprint from actual decoded channel-0 PCM samples.
    * Payloads AudioSystem cannot read (no WAV header / unsupported
    * encoding / corrupt container) degrade to all-zero metadata rather
    * than failing the task — the permissive convention [[ImageIoCodec]]
    * set for images. Compressed codecs (MP3/AAC/Opus) genuinely are not
    * in the JRE and remain [[StubCodec]] territory.
    */
  /** The JRE's audio SPI providers, looked up ONCE per JVM (r12
    * optimization, opt guide §4.5 — heavyweight lookup once, not per row):
    * `AudioSystem.getAudioInputStream`/`write` route EVERY call through
    * `JDK13Services.getProviders`, a `synchronized` static that rebuilds
    * the provider list each time — 32 concurrent decode tasks serialize on
    * that lock (measured 13 ms/doc on m15's decode→encode→decode chain;
    * stage taskSum 66 s for 5 000 docs). The cached instances ARE the
    * JRE's real readers/writers (WaveFileReader/WaveFileWriter & co.), so
    * decode/encode semantics are bit-identical; only the per-call lookup
    * goes away. Probe order mirrors AudioSystem: mark, try each reader,
    * reset on miss.
    */
  private object JreAudio {
    import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
    import scala.jdk.CollectionConverters._
    // Probe order: WAVE first, SoftMidi LAST. Container magics are
    // mutually exclusive (RIFF/WAVE vs AIFF vs AU vs MIDI), so at most one
    // reader accepts a payload and reordering cannot change which result
    // is returned — but SoftMidiAudioFileReader's PROBE internally calls
    // MidiSystem.getProviders, i.e. re-enters the synchronized
    // JDK13Services lookup this cache exists to avoid (jstack: 32 decode
    // threads BLOCKED there when it probed before WaveFileReader).
    val readers: List[AudioFileReader] =
      java.util.ServiceLoader.load(classOf[AudioFileReader]).asScala.toList
        .sortBy { r =>
          val n = r.getClass.getSimpleName
          if (n.startsWith("Wave")) 0 else if (n.contains("Midi")) 2 else 1
        }
    val writers: List[AudioFileWriter] =
      java.util.ServiceLoader.load(classOf[AudioFileWriter]).asScala.toList

    def getAudioInputStream(in: java.io.InputStream): javax.sound.sampled.AudioInputStream = {
      in.mark(Int.MaxValue)
      val it = readers.iterator
      while (it.hasNext) {
        try return it.next().getAudioInputStream(in)
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => in.reset()
        }
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "Stream of unsupported format")
    }

    def write(ais: javax.sound.sampled.AudioInputStream,
              tpe: javax.sound.sampled.AudioFileFormat.Type,
              out: java.io.OutputStream): Unit = {
      writers.find(_.isFileTypeSupported(tpe, ais)) match {
        case Some(w) => w.write(ais, tpe, out)
        case None => throw new IllegalArgumentException(
          s"could not write audio file: file type not supported: $tpe")
      }
    }
  }

  object WavCodec {
    /** Channel-0 PCM of a decoded container. */
    private[graft] final case class Pcm(sampleRate: Long, channels: Int,
                                        nFrames: Long, ch0: Array[Int])

    /** Decode a RIFF/WAVE payload to channel-0 samples. Supports the PCM
      * encodings the WAV spec carries natively: 16-bit signed (either
      * endianness) and 8-bit (signed or unsigned, normalized to signed).
      * None on anything unreadable.
      */
    private[graft] def decode(bytes: Array[Byte]): Option[Pcm] =
      try {
        // JreAudio ≡ AudioSystem.getAudioInputStream minus the per-call
        // synchronized SPI lookup (see JreAudio)
        val in = JreAudio.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = fmt.getSampleSizeInBits
          if ((!signed && !unsigned) || (bits != 8 && bits != 16)) None
          else {
            val data = in.readAllBytes()
            val fs = fmt.getFrameSize
            val n = data.length / fs
            val ch0 = new Array[Int](n)
            var f = 0
            while (f < n) {
              val off = f * fs
              ch0(f) =
                if (bits == 16) {
                  // byte→int promotion sign-extends the high byte for free
                  if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
                  else (data(off + 1) << 8) | (data(off) & 0xff)
                } else if (unsigned) (data(off) & 0xff) - 128
                else data(off).toInt
              f += 1
            }
            Some(Pcm(fmt.getSampleRate.toLong, fmt.getChannels, n.toLong, ch0))
          }
        } finally in.close()
      } catch {
        // unsupported container or torn payload — permissive degrade
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

    /** Gain-invariant amplitude-delta fingerprint from REAL samples — the
      * audio twin of [[ImageIoCodec.aHash]], borrowing the public
      * Chromaprint idea (fingerprint = signs of successive feature
      * deltas) in the amplitude domain: 60 bits over channel-0 samples
      * 0..60, bit i set iff |s(i+1)| > |s(i)|, MSB-first fold. A gain
      * change scales both sides of every comparison, so re-levelled
      * copies keep their fingerprint; 60 bits (not 64) keeps the fold in
      * non-negative BIGINT range for the DuckDB oracle, same convention
      * as every other perceptual hash here. None if the payload does not
      * decode or carries fewer than 61 samples.
      */
    def fingerprint(bytes: Array[Byte]): Option[Long] =
      decode(bytes).flatMap(p => fingerprintOf(p.ch0))

    private[graft] def fingerprintOf(ch0: Array[Int]): Option[Long] =
      if (ch0.length < 61) None
      else Some((0 until 60).foldLeft(0L) { (acc, i) =>
        acc * 2 + (if (math.abs(ch0(i + 1)) > math.abs(ch0(i))) 1L else 0L)
      })
  }

  /** Deterministic 16-bit PCM WAV — the m09 TEST FIXTURE generator:
    * channel 0 carries the given samples (every channel carries the same
    * signal), encoded through the JRE's real WAV writer so [[WavCodec]]
    * decodes a genuine RIFF container, not a fabricated header.
    */
  def syntheticPcmWav(sampleRate: Int, channels: Int,
                      samples: Array[Int]): Array[Byte] = {
    val fs = 2 * channels
    val pcm = new Array[Byte](samples.length * fs)
    var i = 0
    while (i < samples.length) {
      var c = 0
      while (c < channels) {
        val off = i * fs + c * 2
        pcm(off) = (samples(i) & 0xff).toByte
        pcm(off + 1) = ((samples(i) >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    // JreAudio ≡ AudioSystem.write minus the per-call synchronized SPI
    // lookup (see JreAudio)
    JreAudio.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  case class AudioDecoded(doc_id: Long, sample_rate: Long, channels: Long,
                          n_samples: Long, fp: Option[Long])

  /** Batched REAL-sample decode + fingerprint over an audio media table —
    * the audio twin of [[decodeImages]]: same partition-local batch shape,
    * container bytes never shuffle, only (id, rate, channels, count,
    * 8-byte fingerprint) rows leave the scan.
    */
  def decodeAudio(media: DataFrame, batchSize: Int = 64): Dataset[AudioDecoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        WavCodec.decode(r.media) match {
          case Some(p) => AudioDecoded(r.doc_id, p.sampleRate, p.channels.toLong,
            p.nFrames, WavCodec.fingerprintOf(p.ch0))
          case None => AudioDecoded(r.doc_id, 0L, 0L, 0L, None)
        }
      }))
  }

  /** Audio near-dup pairs on the decoded fingerprint: documents whose
    * amplitude-delta fingerprints are within Hamming ≤ `maxHamming` —
    * re-levelled/re-containered copies of a recording land here even when
    * the byte payloads differ everywhere. Same pigeonhole equi-join core
    * as the image/text paths ([[graft.dedup.Dedup.hammingCandidatePairs]]);
    * one fingerprint per document, so candidate volume is bounded by
    * documents, not frames.
    */
  def audioDupPairs(media: DataFrame, maxHamming: Int = 3,
                    maxBucketFreq: Option[Long] = None): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val fps = media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .flatMap(r => WavCodec.fingerprint(r.media).map(fp => (r.doc_id, fp)))
      .toDF("doc_id", "fp")
    graft.dedup.Dedup.hammingCandidatePairs(
      fps, "fp", bits = 60, maxHamming, maxBucketFreq = maxBucketFreq)
  }

  /** Image near-dup pairs on the REAL-decode perceptual hash: documents
    * whose [[ImageIoCodec.aHash]] (luma average-hash over actually-decoded
    * rasters) lands within Hamming ≤ `maxHamming` — re-encoded,
    * re-compressed or lightly-retouched copies of an image pair here even
    * when the container bytes share nothing ([[sharedFrames]]' exact
    * digests can't see them, and [[perceptualDupPairs]] works on
    * StubCodec frame bytes, not decoded pixels). Same pigeonhole
    * equi-join core as the audio/text paths
    * ([[graft.dedup.Dedup.hammingCandidatePairs]]): maxHamming+1 hash
    * chunks, a pair within the budget must agree on ≥ 1 chunk, so
    * recall is exact — no missed pairs, candidates bounded by bucket
    * collisions. One hash per document; bytes never shuffle (the decode
    * is partition-local); undecodable or sub-60-pixel payloads emit
    * nothing. Output: (a, b, hamming), a < b, hamming ≤ maxHamming.
    */
  def imageDupPairs(media: DataFrame, maxHamming: Int = 2,
                    maxBucketFreq: Option[Long] = None): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .flatMap(r => ImageIoCodec.aHash(r.media).map(h => (r.doc_id, h)))
      .toDF("doc_id", "ahash")
    graft.dedup.Dedup.hammingCandidatePairs(
      hashes, "ahash", bits = 60, maxHamming, maxBucketFreq = maxBucketFreq)
  }

  case class AudioWindowEnergy(doc_id: Long, win_idx: Long, n_samples: Long,
                               energy: Long, silent: Boolean)

  /** Windowed RMS-energy profile + silence detection over REAL decoded
    * audio — the voice-activity-detection / speech-data-prep read that
    * precedes any ASR-corpus segmentation: channel-0 PCM splits into
    * fixed `windowSamples` windows (the last window keeps its true
    * partial length) and each window reports its exact integer energy
    * Σ s² plus a silence verdict `energy < silenceMeanSq · n` — i.e. the
    * window's mean square is below the threshold, the integer-exact form
    * of an RMS gate (strict `<`, so a boundary window is NOT silent,
    * provable on both engines with zero float ops).
    *
    * Scale shape: the same partition-local batched decode as
    * [[decodeAudio]] — container bytes never shuffle; only
    * (id, window, n, energy-long, flag) rows leave the scan, windows-per-
    * doc bounded by duration/windowSamples. Energy of a 16-bit sample is
    * ≤ 2³⁰, so a Long holds > 2³³ samples per window — hours of audio —
    * before overflow could matter. Undecodable payloads emit no rows
    * (permissive, the codec convention).
    */
  def audioEnergy(media: DataFrame, windowSamples: Int = 32,
                  silenceMeanSq: Long = 1000000L,
                  batchSize: Int = 64): Dataset[AudioWindowEnergy] = {
    require(windowSamples > 0, "windowSamples must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        WavCodec.decode(r.media) match {
          case Some(p) =>
            p.ch0.grouped(windowSamples).zipWithIndex.map { case (w, k) =>
              var e = 0L
              var i = 0
              while (i < w.length) { e += w(i).toLong * w(i); i += 1 }
              AudioWindowEnergy(r.doc_id, k.toLong, w.length.toLong, e,
                e < silenceMeanSq * w.length)
            }
          case None => Iterator.empty
        }
      }))
  }

  /** VOICE-ACTIVITY segments over [[audioEnergy]]'s window verdicts —
    * the classic energy-VAD smoothing step (Rabiner & Sambur 1975 is the
    * lineage; every speech-data pipeline ships some form of it): maximal
    * runs of NON-silent windows, with runs separated by at most
    * `hangover` silent windows merged into one segment (the "hangover"
    * that keeps a plosive gap from splitting an utterance). The
    * audio-domain twin of e05's gaps-and-islands sessionization, run in
    * two exact island passes:
    *
    *   1. voiced runs: `win_idx − row_number()` islands over the
    *      non-silent windows (consecutive indices collapse to one key);
    *   2. hangover merge: over the RUNS frame ordered by start, a new
    *      segment starts iff `start − prev_end − 1 > hangover`; the
    *      running sum of starts numbers segments 0-based per doc.
    *
    * Both passes are window functions over per-doc frames — windows are
    * (doc × duration/windowSamples)-bounded decode OUTPUT, never raw
    * audio bytes, and the runs frame is smaller still; nothing here
    * scales with corpus size beyond the docs axis. Silent windows
    * BETWEEN merged runs contribute neither `n_voiced_windows` nor
    * `energy` (they are absence, not signal — the value_min/value_max
    * NULL discipline applied to audio).
    *
    * Returns (doc_id, seg_idx, start_win, end_win, n_voiced_windows,
    * energy).
    */
  def vadSegments(windows: DataFrame, hangover: Int = 1): DataFrame = {
    require(hangover >= 0, "hangover must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("doc_id")).orderBy(col("win_idx"))
    val runs = windows.where(!col("silent"))
      .withColumn("__isl", col("win_idx") - row_number().over(w1))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("win_idx")).as("start_win"),
        max(col("win_idx")).as("end_win"),
        count(lit(1)).as("n_windows"), sum(col("energy")).as("energy"))
    val w2 = Window.partitionBy(col("doc_id")).orderBy(col("start_win"))
    runs
      .withColumn("__prev_end", lag(col("end_win"), 1).over(w2))
      .withColumn("__brk", (col("__prev_end").isNull ||
        col("start_win") - col("__prev_end") - 1 > hangover).cast("long"))
      .withColumn("__seg", sum(col("__brk")).over(w2))
      .groupBy(col("doc_id"), col("__seg"))
      .agg(min(col("start_win")).as("start_win"),
        max(col("end_win")).as("end_win"),
        sum(col("n_windows")).as("n_voiced_windows"),
        sum(col("energy")).as("energy"))
      .select(col("doc_id"), (col("__seg") - 1).as("seg_idx"),
        col("start_win"), col("end_win"), col("n_voiced_windows"),
        col("energy"))
  }

  case class AudioZcr(doc_id: Long, win_idx: Long, n_samples: Long,
                      crossings: Long, voiced: Boolean)

  /** Windowed ZERO-CROSSING RATE over REAL decoded audio — the classic
    * voiced/unvoiced discriminator beside [[audioEnergy]]'s silence gate
    * (voiced speech is low-ZCR high-energy, fricatives/noise high-ZCR):
    * per fixed window, the exact count of sign changes between adjacent
    * samples (sign class = `s < 0`, so zero rides with the positives —
    * a fixed convention both engines state identically; window-internal
    * adjacency only, so windows are independent) and a `voiced` verdict
    * `crossings · 10⁶ < voicedMaxZcrPpm · n` — strict, integer-exact.
    * Same partition-local batched decode as [[audioEnergy]]; undecodable
    * payloads emit no rows.
    */
  def audioZeroCrossings(media: DataFrame, windowSamples: Int = 32,
                         voicedMaxZcrPpm: Long = 300000L,
                         batchSize: Int = 64): Dataset[AudioZcr] = {
    require(windowSamples > 0, "windowSamples must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        WavCodec.decode(r.media) match {
          case Some(p) =>
            p.ch0.grouped(windowSamples).zipWithIndex.map { case (w, k) =>
              var c = 0L
              var i = 1
              while (i < w.length) {
                if ((w(i - 1) < 0) != (w(i) < 0)) c += 1
                i += 1
              }
              AudioZcr(r.doc_id, k.toLong, w.length.toLong, c,
                c * 1000000L < voicedMaxZcrPpm * w.length)
            }
          case None => Iterator.empty
        }
      }))
  }

  case class AudioPitch(doc_id: Long, n_samples: Long, energy: Long,
                        best_lag: Long, best_r: Long, periodic: Boolean)

  /** Dominant-lag AUTOCORRELATION over REAL decoded audio — the classic
    * pitch-period estimator (the autocorrelation method of Rabiner '77;
    * the first stage of YIN-family trackers) and the PERIODICITY read
    * beside [[audioZeroCrossings]]' voiced gate: per clip, the exact
    * integer lag products `R(L) = Σᵢ s(i)·s(i+L)` for `L ∈ [minLag,
    * min(maxLag, n−1)]`, the argmax lag under the (R desc, lag asc)
    * total order, and a clarity verdict `periodic = 2·R(best) > R(0)` —
    * normalized autocorrelation above ½, the conventional voicing
    * threshold, as one integer cross-multiplication. A buzzing spam clip
    * or a synthesized tone is high-clarity; speech/noise is not.
    *
    * All sums are exact longs (|s| ≤ 2¹⁵, so a 2³⁰ product per term
    * leaves 30+ bits of headroom at any real clip length), so every
    * column is engine-exact — no float FFT lore. Lags with no
    * overlapping pairs are not candidates (matching the oracle's join,
    * which produces no row for them); clips with n ≤ minLag emit
    * nothing, the permissive-codec convention. Same partition-local
    * batched decode as [[audioEnergy]]; per-doc cost O(n·maxLag), a
    * constant per row; container bytes never shuffle.
    */
  def audioPitch(media: DataFrame, minLag: Int = 2, maxLag: Int = 24,
                 batchSize: Int = 64): Dataset[AudioPitch] = {
    require(minLag >= 1 && minLag <= maxLag, "need 1 <= minLag <= maxLag")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        WavCodec.decode(r.media) match {
          case Some(p) if p.ch0.length > minLag =>
            val s = p.ch0
            val n = s.length
            var energy = 0L
            var i = 0
            while (i < n) { energy += s(i).toLong * s(i); i += 1 }
            var bestLag = 0L
            var bestR = Long.MinValue
            var lag = minLag
            val top = math.min(maxLag, n - 1)
            while (lag <= top) {
              var rr = 0L
              var j = 0
              while (j + lag < n) { rr += s(j).toLong * s(j + lag); j += 1 }
              if (rr > bestR) { bestR = rr; bestLag = lag.toLong }
              lag += 1
            }
            Iterator.single(AudioPitch(r.doc_id, n.toLong, energy,
              bestLag, bestR, 2L * bestR > energy))
          case _ => Iterator.empty
        }
      }))
  }

  case class AudioResampled(doc_id: Long, dst_rate: Long, n_samples: Long,
                            checksum: Long)

  /** REAL audio resample — the sample-rate-normalization step before any
    * ASR/audio-feature pipeline (every model wants one rate), the audio
    * twin of [[resizeImages]]: nearest-neighbor integer mapping
    * `out(i) = ch0((i·srcRate) div dstRate)` over ACTUALLY-decoded PCM,
    * with `nOut = (nFrames·dstRate) div srcRate` — an explicit formula a
    * SQL oracle recomputes, not resampler-library interpolation lore. The
    * resampled signal re-encodes through the JRE's real RIFF writer and
    * the output row is built from RE-DECODING those bytes (rate and frame
    * count from the new container header, checksum Σ (i+1)·s(i) from the
    * re-decoded samples — position-weighted, so a permutation cannot pass),
    * proving a real WAV round-tripped. Partition-local batches, bytes
    * never shuffle; undecodable payloads emit no rows (the permissive
    * codec convention).
    */
  def resampleAudio(media: DataFrame, dstRate: Int,
                    batchSize: Int = 64): Dataset[AudioResampled] = {
    require(dstRate > 0, "dstRate must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        WavCodec.decode(r.media).flatMap { p =>
          val nOut = (p.nFrames * dstRate / p.sampleRate).toInt
          val out = Array.tabulate(nOut)(i =>
            p.ch0(((i.toLong * p.sampleRate) / dstRate).toInt))
          WavCodec.decode(syntheticPcmWav(dstRate, 1, out)).map { q =>
            var cs = 0L
            var i = 0
            while (i < q.ch0.length) { cs += (i + 1L) * q.ch0(i); i += 1 }
            AudioResampled(r.doc_id, q.sampleRate, q.nFrames, cs)
          }
        }
      }))
  }

  case class ImageDecoded(doc_id: Long, width: Long, height: Long, ahash: Option[Long])

  case class ImageResized(doc_id: Long, media: Array[Byte],
                          width: Long, height: Long, luma_sum: Long)

  /** REAL image resize over a media table — the feature-extraction-sized
    * thumbnail step, on actually-decoded rasters ([[ImageIoCodec.resizeNearest]]:
    * explicit nearest-neighbor integer mapping, gray PNG out). The same
    * partition-local batch shape as [[decodeImages]] — bytes never
    * shuffle; the output row carries the resized PNG plus dims and the
    * pixel-sum checksum RE-DECODED from those bytes (so the checksum
    * proves a real image round-tripped, not that the mapping ran in
    * memory). Undecodable payloads degrade to (null, 0, 0, -1),
    * permissive like every codec here.
    */
  def resizeImages(media: DataFrame, dw: Int, dh: Int,
                   batchSize: Int = 64): Dataset[ImageResized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val rz = ImageIoCodec.resizeNearest(r.media, dw, dh)
        // the re-decode gets the same null guard as the resize input: if
        // ImageIO cannot read back our own PNG bytes the row degrades to
        // the documented (null, 0, 0, -1) instead of an NPE killing the task
        val img = if (rz == null) null else ImageIoCodec.decode(rz)
        if (img == null) ImageResized(r.doc_id, null, 0L, 0L, -1L)
        else {
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += ImageIoCodec.lumaAt(img, x, y); x += 1
            }
            y += 1
          }
          ImageResized(r.doc_id, rz, img.getWidth.toLong, img.getHeight.toLong, sum)
        }
      }))
  }

  /** Batched REAL-pixel decode + perceptual hash over an image media
    * table: the same partition-local batch shape as [[extractMeta]]
    * (bytes never shuffle; only (id, dims, 8-byte hash) rows leave the
    * scan), with [[ImageIoCodec]] doing actual PNG/BMP decoding.
    */
  def decodeImages(media: DataFrame, batchSize: Int = 64): Dataset[ImageDecoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val img = ImageIoCodec.decode(r.media) // decode ONCE: dims + hash
        ImageDecoded(r.doc_id,
          if (img == null) 0L else img.getWidth.toLong,
          if (img == null) 0L else img.getHeight.toLong,
          ImageIoCodec.aHashOf(img))
      }))
  }

  case class RasterDigest(doc_id: Long, width: Long, height: Long,
                          raster_md5: String)

  /** Decoded-raster content digest kernel: md5 over the canonical string
    * `"w:h:p0,p1,…"` of the luma raster — CONTENT-addressed, so the same
    * image re-encoded through a different container (PNG vs BMP, other
    * compression level) digests identically where byte-level dedup (d01
    * on media bytes) sees two distinct blobs. The canonical string is a
    * formula of the pixels, so an oracle can recompute the digest
    * analytically from a fixture's pixel formula. None for undecodable
    * payloads.
    */
  private[graft] def rasterDigestOf(bytes: Array[Byte]): Option[(Long, Long, String)] = {
    val img = ImageIoCodec.decode(bytes)
    if (img == null) None
    else {
      val sb = new StringBuilder
      sb.append(img.getWidth).append(':').append(img.getHeight).append(':')
      var y = 0
      var first = true
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          if (!first) sb.append(',')
          sb.append(ImageIoCodec.lumaAt(img, x, y))
          first = false
          x += 1
        }
        y += 1
      }
      Some((img.getWidth.toLong, img.getHeight.toLong,
        graft.functions.PortableHash.jvmMd5Hex(sb.toString)))
    }
  }

  /** Batch face of [[rasterDigestOf]] — (doc_id, width, height,
    * raster_md5) per decodable image, the content-addressed key for
    * exact media dedup across container formats. Partition-local batched
    * decode; bytes never shuffle.
    */
  def rasterDigest(media: DataFrame, batchSize: Int = 64): Dataset[RasterDigest] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        rasterDigestOf(r.media).map { case (w, h, m) =>
          RasterDigest(r.doc_id, w, h, m)
        }
      }))
  }

  case class ImageHistogram(doc_id: Long, n_pixels: Long, top_bin: Long,
                            top_count: Long, n_bins_used: Long, flat: Boolean)

  /** Luma HISTOGRAM + solid-image detector over REAL decoded rasters —
    * the cheap image-quality gate of a multimodal corpus build (the
    * image twin of the text quality battery): screenshots of blank
    * pages, tracking pixels and solid-color placeholders concentrate
    * their pixel mass in one brightness band, where genuine photos
    * spread. Per image: 16 luma bins (`luma >> 4` — exact integer
    * binning), the dominant bin under the (count desc, bin asc) total
    * order, the number of occupied bins, and the verdict
    * `flat = top_count·10⁶ > flatMaxPpm·n_pixels` — one integer
    * cross-multiplication, no float entropy lore.
    *
    * Same partition-local batched decode as [[decodeImages]]; bytes
    * never shuffle, one 6-field row per image leaves the scan;
    * undecodable payloads emit no rows (the permissive-codec
    * convention).
    */
  def imageHistogram(media: DataFrame, flatMaxPpm: Long = 500000L,
                     batchSize: Int = 64): Dataset[ImageHistogram] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        val img = ImageIoCodec.decode(r.media)
        if (img == null) Iterator.empty
        else {
          val counts = new Array[Long](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              counts(ImageIoCodec.lumaAt(img, x, y) >> 4) += 1
              x += 1
            }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight
          var topBin = 0
          var used = 0L
          var b = 0
          while (b < 16) {
            if (counts(b) > counts(topBin)) topBin = b // strict > keeps the smaller tie
            if (counts(b) > 0) used += 1
            b += 1
          }
          Iterator.single(ImageHistogram(r.doc_id, n, topBin.toLong,
            counts(topBin), used, counts(topBin) * 1000000L > flatMaxPpm * n))
        }
      }))
  }

  case class GifFrame(doc_id: Long, n_frames: Long, frame_idx: Long,
                      ahash: Option[Long])

  /** REAL multi-frame decode — animated GIF is the one MULTI-frame media
    * format the JRE decodes natively (ImageIO's gif reader), so the
    * video-shaped plumbing (frame count from the container, per-frame
    * perceptual hash) runs on actual decoded rasters here: frame count
    * from the reader's image index, per-frame luma aHash via the shared
    * [[ImageIoCodec.aHashOf]] kernel. Same partition-local batch shape as
    * [[decodeImages]] — bytes never shuffle; one (id, count, idx, hash)
    * row per decoded frame leaves the scan, `maxFrames`-bounded (the
    * frame-sampling cap, like [[sampleFrames]]' stride). Non-GIF/corrupt
    * payloads degrade to a single (n_frames=0, idx=-1, None) row —
    * permissive, like every codec here. Note: real-world GIFs may carry
    * DELTA frames (partial rasters); the hash is of the raw stored
    * raster, a per-frame dedup signal, not a composited render. MP4/WebM
    * genuinely have no JRE codec and stay [[StubCodec]] territory.
    */
  def decodeGifFrames(media: DataFrame, batchSize: Int = 64,
                      maxFrames: Int = 8): Dataset[GifFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
        gifFramesOf(r.doc_id, r.media, maxFrames)
      }))
  }

  private[graft] def gifFramesOf(docId: Long, bytes: Array[Byte],
                                 maxFrames: Int): Seq[GifFrame] = {
    val none = Seq(GifFrame(docId, 0L, -1L, None))
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) none
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            val n = rd.getNumImages(true)
            if (n <= 0) none
            else (0 until math.min(n, maxFrames)).map { i =>
              GifFrame(docId, n.toLong, i.toLong,
                ImageIoCodec.aHashOf(rd.read(i)))
            }
          } finally rd.dispose()
        }
      } finally iis.close()
    } catch { case _: java.io.IOException => none }
  }

  /** One consecutive-frame comparison: the later frame's index, the exact
    * L1 luma distance to its predecessor, and the cut verdict. */
  case class SceneCut(doc_id: Long, frame_idx: Long, l1_dist: Long, is_cut: Long)

  /** SHOT/SCENE-BOUNDARY detection over real multi-frame decode — the
    * video-curation primitive (frame-sample at one-per-shot instead of
    * one-per-N, segment-level dedup, highlight extraction all start from
    * the cut list): consecutive decoded frames compare by EXACT L1 luma
    * distance `Σ_pixels |luma_k − luma_{k−1}|` (over the overlapping
    * min-dims region if dimensions change mid-stream), and a cut is
    * declared when the distance exceeds `threshold` — within a shot,
    * motion moves few pixels a little; across a cut, most pixels jump.
    * Integer-exact end-to-end: the distance is a sum of |int − int|, so
    * the oracle replays it analytically from the fixture's pixel
    * formulas, and the threshold comparison is long-vs-long.
    *
    * Scale shape: the [[decodeGifFrames]] discipline — partition-local
    * batched decode, container bytes never shuffle, ONE sequential pass
    * per animation holding two frames at a time; only (id, idx, dist,
    * flag) rows leave the scan, frames-per-doc bounded by `maxFrames`.
    * Undecodable or single-frame payloads emit nothing (no pair, no row —
    * the permissive codec convention).
    */
  def sceneChanges(media: DataFrame, threshold: Long = 1000L,
                   batchSize: Int = 64, maxFrames: Int = 8): Dataset[SceneCut] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
        sceneCutsOf(r.doc_id, r.media, threshold, maxFrames)
      }))
  }

  private[graft] def sceneCutsOf(docId: Long, bytes: Array[Byte],
                                 threshold: Long, maxFrames: Int): Seq[SceneCut] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Nil
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            val n = rd.getNumImages(true)
            if (n <= 1) Nil
            else {
              var prev = rd.read(0)
              (1 until math.min(n, maxFrames)).map { i =>
                val cur = rd.read(i)
                val w = math.min(prev.getWidth, cur.getWidth)
                val h = math.min(prev.getHeight, cur.getHeight)
                var d = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    d += math.abs(
                      ImageIoCodec.lumaAt(prev, x, y) - ImageIoCodec.lumaAt(cur, x, y))
                    x += 1
                  }
                  y += 1
                }
                prev = cur
                SceneCut(docId, i.toLong, d, if (d > threshold) 1L else 0L)
              }
            }
          } finally rd.dispose()
        }
      } finally iis.close()
    } catch { case _: java.io.IOException => Nil }
  }

  /** Deterministic animated grayscale GIF — the m10 TEST FIXTURE
    * generator: frame `k`'s pixel (x, y) carries gray `f(k, x, y)`,
    * written through the JRE's real GIF sequence writer (a 256-entry
    * gray palette represents every 8-bit gray exactly, so the round-trip
    * is lossless).
    */
  def syntheticGrayGif(w: Int, h: Int, nFrames: Int,
                       f: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var k = 0
      while (k < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.getRaster.setSample(x, y, 0, f(k, x, y) & 0xff); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Lift the documents table into a media table — text bytes stand in for
    * an image payload (binary column + type tag); in production this is a
    * parquet/iceberg table with a real BinaryType column.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("image").as("media_type"))

  /** Batched decode / feature extraction: the mapInPandas-equivalent.
    * Typed `Dataset[MediaRecord] → Dataset[MediaMeta]`, decoding
    * `batchSize` records at a time inside each partition.
    */
  def extractMeta(media: DataFrame, codec: Codec = StubCodec,
                  batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(codec.decodeBatch))
  }

  /** Frame sampling: emit every `stride`-th 100-byte "frame" of the payload
    * (the video-keyframe-sampling shape: 1→N explode of a binary column,
    * emitting digests/features, never shipping frames through a shuffle).
    */
  def sampleFrames(media: DataFrame, stride: Int = 2): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .flatMap { r =>
        frameRanges(r.media.length, stride).map { case (i, from, until) =>
          val slice = java.util.Arrays.copyOfRange(r.media, from, until)
          val md = java.security.MessageDigest.getInstance("MD5")
          Frame(r.doc_id, i, md.digest(slice).map("%02x".format(_)).mkString)
        }
      }
  }

  /** The ONE definition of frame geometry — every frame-derived signal
    * (md5 digests above, aHash below) slices identically, so the
    * m04/m07 exact/perceptual complement can never drift. A frame exists
    * iff it has ≥1 byte: ceil(len/100), no empty tail frame when the
    * length is an exact multiple (an empty slice would hash identically
    * for EVERY such doc — downstream dedup would link unrelated
    * documents through it).
    */
  private def frameRanges(len: Int, stride: Int): Seq[(Long, Int, Int)] = {
    val n = (len + 99) / 100
    (0L until n.toLong by stride.toLong).map { i =>
      val from = (i * 100).toInt
      (i, from, math.min(from + 100, len))
    }
  }

  /** "Resize" stub: crop/pad the payload to `targetBytes` — the shape of an
    * image-resize (binary in, binary out, 1→1, partition-local) for media
    * types WITHOUT a JRE codec. For decodable images the REAL raster path
    * is [[resizeImages]] (actual nearest-neighbor pixels, oracle-exact).
    */
  def resize(media: DataFrame, targetBytes: Int = 256): DataFrame =
    media.withColumn("media",
      substring(col("media"), 1, targetBytes))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))

  /** Cross-document shared-frame detection — media-level near-dup signal
    * (re-encoded/trimmed copies of a video share keyframes even when the
    * container bytes differ): frames whose digest appears in more than one
    * document, with the member count and the min-doc keeper.
    *
    * Only 32-char digests cross the shuffle (via [[sampleFrames]] the
    * frame bytes are digested partition-locally); group count is bounded
    * by distinct frames. The output feeds the same clustering path as
    * text near-dup pairs ([[graft.dedup.Dedup.connectedComponents]]).
    */
  def sharedFrames(media: DataFrame, stride: Int = 2): DataFrame =
    sampleFrames(media, stride).toDF()
      .groupBy(col("frame_md5"))
      .agg(
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper_doc"))
      .where(col("n_docs") > 1)

  /** Media duplicate CLUSTERS: documents sharing ≥1 sampled frame collapse
    * into one component via the same [[graft.dedup.Dedup.connectedComponents]]
    * path as text near-dups. Edges are the STAR form — each frame
    * contributes (its min doc → other doc) edges, k-1 per k-doc frame,
    * which yields the same components as the full per-frame clique at 1/k
    * the edge volume (transitivity through the star center). Only digests
    * and doc ids cross the shuffle.
    */
  def mediaDupClusters(media: DataFrame, stride: Int = 2): DataFrame = {
    val fr = sampleFrames(media, stride).toDF()
    val centers = fr.groupBy(col("frame_md5")).agg(min(col("doc_id")).as("a"))
    val edges = fr.join(centers, "frame_md5")
      .where(col("doc_id") =!= col("a"))
      .select(col("a"), col("doc_id").as("b"))
      .distinct()
    graft.dedup.Dedup.connectedComponents(edges)
  }

  case class FrameHash(doc_id: Long, frame_idx: Long, ahash: Long)

  /** Per-frame perceptual AVERAGE HASH (aHash — the classic image
    * near-dup fingerprint: downsample, threshold against the mean, read
    * the bits): a 60-bit hash over the frame's first 60 bytes, bit j set
    * iff byte j exceeds the frame's integer-mean byte. Unlike
    * [[sampleFrames]]' md5 (EXACT frame identity), aHash is stable under
    * small payload perturbations — re-encoded/brightness-shifted copies
    * land within a few bits. 60 bits (not 64) keeps every fold step
    * inside a non-negative BIGINT so the DuckDB oracle's strict overflow
    * checking matches JVM arithmetic. Frames shorter than 60 bytes carry
    * too little signal and are skipped, deterministically.
    *
    * Partition-local (typed flatMap, like every media op): only (doc,
    * frame, 8-byte hash) rows ever leave the scan.
    */
  def frameAHashes(media: DataFrame, stride: Int = 2): Dataset[FrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
      .flatMap { r =>
        frameRanges(r.media.length, stride).flatMap { case (i, from, until) =>
          if (until - from >= 60) {
            val codes = (from until from + 60).map(j => (r.media(j) & 0xff).toLong)
            val mean = codes.sum / 60
            val h = codes.foldLeft(0L)((acc, c) => acc * 2 + (if (c > mean) 1L else 0L))
            Some(FrameHash(r.doc_id, i, h))
          } else None
        }
      }
  }

  /** Perceptual media near-dup pairs: documents with ≥1 frame pair within
    * Hamming(aHash) ≤ `maxHamming` — catches NEAR-duplicate frames where
    * [[sharedFrames]]' exact digests require identity. Same pigeonhole
    * blocking as text SimHash ([[graft.dedup.Dedup.simhashPairs]]): 60
    * bits split into maxHamming+1 chunks, a qualifying pair must agree
    * exactly on ≥1 chunk, so candidates come from an equi-join on
    * (chunk, value) — full recall, no frame×frame cross join. Output:
    * (a, b, n_frame_matches), a < b.
    *
    * Scale caveat: aHash chunks have LOWER entropy than text SimHash
    * chunks (flat frames hash to 0), so one hot (chunk, value) bucket can
    * go quadratic at corpus scale. `maxBucketFreq` drops buckets seen in
    * more than that many frames — the same non-discriminative-hot-key cap
    * as n-gram Jaccard's `maxDocFreq` ([[graft.dedup.Dedup
    * .ngramJaccardPairs]]); recall only drops for pairs agreeing SOLELY
    * on a bucket too common to mean anything. None (default) = exact.
    */
  def perceptualDupPairs(media: DataFrame, stride: Int = 2,
                         maxHamming: Int = 3,
                         maxBucketFreq: Option[Long] = None): DataFrame =
    graft.dedup.Dedup.hammingCandidatePairs(
        frameAHashes(media, stride).toDF(), "ahash", bits = 60, maxHamming,
        extraCols = Seq("frame_idx"), maxBucketFreq = maxBucketFreq)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_frame_matches"))

  /** Media dedup APPLIED — the multimodal mirror of
    * [[graft.dedup.Dedup.applyDedup]]: the surviving doc ids after
    * collapsing each shared-frame cluster to its keeper (the component
    * minimum). Same left-anti shape: docs in no cluster survive, keepers
    * survive, everything else drops; AQE sizes the anti-join from the
    * actual post-clustering drop-set.
    */
  def applyMediaDedup(media: DataFrame, stride: Int = 2): DataFrame =
    graft.dedup.Dedup.survivorsFromComponents(media, mediaDupClusters(media, stride))

  /** ANIMATION-level near-dup pairs — video dedup over REAL decoded
    * frames: each animation is its distinct set of per-frame perceptual
    * aHashes ([[decodeGifFrames]]'s output), and two animations pair when
    * the Jaccard of their hash sets reaches `tauPpm` — the re-encoded /
    * re-muxed copy case, where byte digests differ but the frame sequence
    * is substantially shared (a trailing watermark frame or intro card
    * changes only a minority of hashes). Frame-LEVEL near-identity is
    * [[perceptualDupPairs]]'s job; this aggregates exact hash overlap to
    * a sequence-level verdict — the same division of labor as text's
    * SimHash pairs vs n-gram Jaccard.
    *
    * Scale shape: the same inverted-index join as
    * [[graft.dedup.Dedup.ngramJaccardPairs]], with 60-bit frame hashes as
    * the index keys — candidates only from shared hashes, never
    * animation×animation; per-doc hash sets are `maxFrames`-bounded so
    * the size table is tiny per doc. Input: [[decodeGifFrames]] output.
    * Output: (a, b, jaccard_ppm), a < b.
    */
  /** TEMPORAL alignment between animations: maximal runs of CONSECUTIVE
    * shared frames, order-preserving — the sequence-aware companion of
    * [[animationDupPairs]]'s set-Jaccard. A trimmed or offset re-encode
    * shares a long frame RUN even when set overlap is modest, and a
    * shuffled frame collection (same set, different order) shares none —
    * the two cases set-Jaccard cannot tell apart. The
    * [[graft.dedup.Dedup.substringRuns]] shape on frame hashes:
    * positional frame 2-grams → gram equi-join (corpus-wide occurrence
    * cap against hot intros/logos) → per-(pair, diagonal)
    * gaps-and-islands → maximal runs ≥ `minRun` frames.
    *
    * Scale shape: only (doc, pos, two 60-bit hashes) rows reach the
    * join; per-doc grams are `maxFrames`-bounded; every window
    * partitions by (pair, diagonal). Input: [[decodeGifFrames]] output.
    * Output: (a, b, a_start, b_start, run_frames), a < b, one row per
    * maximal aligned run.
    */
  def animationRunPairs(frames: DataFrame, minRun: Int = 3,
                        maxGramFreq: Long = 50L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fh = frames.where(col("ahash").isNotNull)
      .select(col("doc_id"), col("frame_idx"), col("ahash"))
    val wSeq = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val grams = fh
      .withColumn("h2", lead(col("ahash"), 1).over(wSeq))
      .where(col("h2").isNotNull)
      .select(col("doc_id"), col("frame_idx").as("pos"),
        col("ahash").as("g1"), col("h2").as("g2"))
    // corpus-wide occurrence cap: a gram shared by every animation (a
    // standard intro card) would square the candidate join
    val hot = grams.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > maxGramFreq)
      .select(col("g1"), col("g2"))
    val capped = grams.join(broadcast(hot), Seq("g1", "g2"), "left_anti")
    val cand = capped.as("x").join(capped.as("y"),
        col("x.g1") === col("y.g1") && col("x.g2") === col("y.g2") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.pos").as("pa"), col("y.pos").as("pb"),
        (col("x.pos") - col("y.pos")).as("diag"))
    val wIsle = Window.partitionBy(col("a"), col("b"), col("diag")).orderBy(col("pa"))
    cand
      .withColumn("__isle", col("pa") - row_number().over(wIsle))
      .groupBy(col("a"), col("b"), col("diag"), col("__isle"))
      .agg(min(col("pa")).as("a_start"), min(col("pb")).as("b_start"),
        (count(lit(1)) + 1).as("run_frames")) // n 2-grams span n+1 frames
      .where(col("run_frames") >= minRun)
      .select(col("a"), col("b"), col("a_start"), col("b_start"), col("run_frames"))
  }

  def animationDupPairs(frames: DataFrame, tauPpm: Long = 400000L): DataFrame = {
    val fh = frames.where(col("ahash").isNotNull)
      .select(col("doc_id"), col("ahash")).distinct()
    val sizes = fh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = fh.as("x").join(fh.as("y"),
        col("x.ahash") === col("y.ahash") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(broadcast(sizes.as("na")), col("a") === col("na.doc_id"))
      .join(broadcast(sizes.as("nb")), col("b") === col("nb.doc_id"))
      .select(col("a"), col("b"),
        graft.textops.TextAnalysis.intDiv(col("c") * lit(1000000L),
          col("na.n") + col("nb.n") - col("c")).as("jaccard_ppm"))
      .where(col("jaccard_ppm") >= tauPpm)
  }
}
