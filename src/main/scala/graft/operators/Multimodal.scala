package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns with typed metadata extracted by a pluggable codec.
 * North-star extension (training-data pipelines over mixed media).
 *
 * Spark design: decode runs through `Dataset.mapPartitions` over typed
 * case-class records in fixed-size batches — the JVM analog of PySpark's
 * `mapInPandas` (iterator-of-batches in, iterator-of-batches out). This is
 * the designated escape hatch for per-record imperative work that Catalyst
 * expressions cannot express (real codecs call native libs); everything
 * around it stays declarative:
 *   - the input is pre-projected to exactly (id, type, content) so Parquet
 *     column pruning still applies upstream of the imperative region;
 *   - no shuffle: decode is partition-local and preserves partitioning;
 *   - output is a typed Dataset with a stable schema, so downstream
 *     operators re-enter codegen land immediately.
 *
 * Codec status: ALL THREE MODALITIES DECODE FOR REAL, pure JDK, zero
 * added dependencies — [[ImageIoCodec]] reads PNG/BMP/GIF/JPEG through
 * `javax.imageio.ImageIO` (oracle-gated in q261/q271: true pixel dims
 * AND per-channel pixel sums), [[AudioWavCodec]] reads WAV/AIFF/AU
 * through `javax.sound.sampled` (q270/q272: true header facts AND PCM
 * sample stats), and [[VideoRiffCodec]] parses the RIFF/AVI container
 * byte format directly (q274/q275: true avih header facts AND per-frame
 * byte sums from the movi chunks — the JDK ships no video LIBRARY, but
 * a RIFF chunk walk needs none). Compressed video FRAME decoding
 * (H.264 etc.) is where a native library would slot in; `StubCodec`
 * remains the deterministic-fake fallback face for undecodable rows.
 * The Spark-side contract — schema, batching, partition behavior — is
 * identical for all codecs, so swapping in a production decoder is
 * implementing `MediaCodec.decode`.
 */
object Multimodal {

  /** An opaque media payload: id, declared modality, raw bytes. */
  case class MediaRecord(media_id: Long, media_type: String, content: Array[Byte])

  /** Typed metadata extracted from a payload. For images width/height are
    * pixel dims and n_frames == 1; for audio/video, n_frames carries the
    * frame/sample-window count. */
  case class MediaMeta(media_id: Long, media_type: String, byte_len: Long,
      checksum: Long, width: Int, height: Int, n_frames: Int)

  /** Batch decoder SPI. Implementations must be deterministic per byte
    * payload and must not retain state across batches (executors may
    * re-run partitions on failure). */
  trait MediaCodec extends Serializable {
    def decode(rec: MediaRecord): MediaMeta
  }

  /**
   * STUB CODEC — deterministic fake. A real deployment replaces this with
   * a native decoder (libjpeg/ffmpeg/...). Fake fields are pure functions
   * of the bytes so tests and the SQL oracle can replay them:
   *   checksum = base-31 rolling hash of the bytes mod 1e9+7
   *   width    = 64 + checksum % 1856   (image-plausible dims)
   *   height   = 64 + (checksum / 1856) % 1016
   *   n_frames = 1 + byte_len % 30
   */
  /** Base-31 rolling checksum of a payload mod 1e9+7 — the shared
    * content identity every codec reports (pHash, provenance, and the
    * SQL oracle all replay it). */
  def byteChecksum(bytes: Array[Byte]): Long = {
    import graft.functions.TextFunctions.{HashBase, HashPrime}
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * HashBase + (bytes(i) & 0xff)) % HashPrime
      i += 1
    }
    h
  }

  object StubCodec extends MediaCodec {
    def decode(rec: MediaRecord): MediaMeta = {
      val h = byteChecksum(rec.content)
      MediaMeta(rec.media_id, rec.media_type, rec.content.length.toLong, h,
        64 + (h % 1856).toInt, 64 + ((h / 1856) % 1016).toInt,
        1 + (rec.content.length % 30))
    }
  }

  /**
   * REAL image decode through the pure-JDK `javax.imageio.ImageIO`
   * (PNG/BMP/GIF/JPEG — readers bundled with every JRE, zero added
   * dependencies): `media_type == "image"` payloads report their TRUE
   * pixel width/height (n_frames = 1; checksum stays the byte rolling
   * hash — content identity, not pixel identity). Non-image modalities
   * and undecodable/corrupt image payloads fall back to [[StubCodec]]
   * (a real pipeline would route those to a quarantine table; the
   * fallback keeps this operator total, and the spec pins it).
   *
   * ImageIO.read is partition-local imperative work — exactly what the
   * [[MediaCodec]] `mapPartitions` escape hatch exists for; per-record
   * cost is microseconds on thumbnail-scale fixtures and the decode
   * never shuffles.
   */
  object ImageIoCodec extends MediaCodec {
    // ImageIO wraps InputStreams in a DISK-backed cache by default — a
    // temp-file write per record on every executor. Payloads are already
    // in memory; keep the decode heap-only. (Per-JVM global, set once at
    // codec classload on each executor.)
    javax.imageio.ImageIO.setUseCache(false)
    def decode(rec: MediaRecord): MediaMeta = {
      if (rec.media_type == "image") {
        // NonFatal, not IOException: JDK image plugins throw unchecked
        // exceptions (IllegalArgumentException, CMMException, AIOOBE) on
        // malformed payloads — one corrupt record must not kill the task;
        // the fallback is what keeps this operator total.
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null)
          return MediaMeta(rec.media_id, rec.media_type,
            rec.content.length.toLong, byteChecksum(rec.content),
            img.getWidth, img.getHeight, 1)
      }
      StubCodec.decode(rec)
    }
  }

  /**
   * REAL audio decode through the pure-JDK `javax.sound.sampled`
   * (WAV/AIFF/AU readers bundled with every JRE — the same zero-added-
   * dependency argument as [[ImageIoCodec]]): `media_type == "audio"`
   * payloads report TRUE header facts read from the bytes, mapped onto
   * the [[MediaMeta]] shape as
   *   width    = sample rate (Hz)
   *   height   = channel count
   *   n_frames = PCM frame count
   * (checksum stays the byte rolling hash — content identity). Non-audio
   * modalities and undecodable payloads fall back to [[StubCodec]], same
   * totality contract as the image codec (spec-pinned). Video remains
   * honestly stubbed — no container/ffmpeg bindings ship with the JDK.
   */
  /** The JRE's audio file readers/writers, resolved ONCE per JVM via the
    * public SPI (`javax.sound.sampled.spi`). `AudioSystem.getAudioInput
    * Stream`/`write` consult a SYNCHRONIZED provider registry on every
    * call — at 500 K records × 32 threads that lock made the decode
    * super-linear (21× per data decade at the round-9 100× probe);
    * calling the resolved providers directly restores linear scaling
    * while staying on the same pure-JDK readers. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val rs = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toSeq
    // probe once with a 1-frame WAV and put the accepting reader FIRST:
    // every non-matching reader costs an exception (+ stack fill) per
    // record otherwise — pure per-record overhead on the hot path
    val probe = synthesizeWav(8000, 1, 1, 0L)
    val (wav, rest) = rs.partition { r =>
      try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)); true }
      catch { case _: Exception => false }
    }
    wav ++ rest
  }
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("JRE has no WAVE writer"))
  }

  /** Decode audio bytes through the first JRE reader that accepts them
    * (null if none do) — the lock-free face of
    * `AudioSystem.getAudioInputStream`. */
  private def readAudio(content: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    audioReaders.foreach { r =>
      try return r.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      catch {
        // NonFatal, not just the two declared exceptions: a malformed
        // header can throw unchecked (e.g. negative-size allocation)
        // inside a reader — corrupt rows quarantine, never kill the task
        case scala.util.control.NonFatal(_) => ()
      }
    }
    null
  }

  object AudioWavCodec extends MediaCodec {
    def decode(rec: MediaRecord): MediaMeta = {
      if (rec.media_type == "audio") {
        val ais = readAudio(rec.content)
        if (ais != null) {
          val f = ais.getFormat
          return MediaMeta(rec.media_id, rec.media_type,
            rec.content.length.toLong, byteChecksum(rec.content),
            f.getSampleRate.toInt, f.getChannels, ais.getFrameLength.toInt)
        }
      }
      StubCodec.decode(rec)
    }
  }

  /**
   * Deterministic WAV fixture synthesis (pure JDK): 16-bit PCM
   * little-endian, `nFrames` frames whose sample values are an integer
   * function of `seed` — real, decodable WAV bytes for q270 and the
   * specs, generated partition-local like [[synthesizePng]].
   */
  def synthesizeWav(sampleRate: Int, channels: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    val data = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames * channels) {
      val v = ((seed * 31 + i * 7) % 65536 - 32768).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    // resolved writer, not AudioSystem.write — see audioReaders
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /**
   * REAL video container decode — pure-JDK RIFF/AVI parsing (the JDK
   * ships no video codec LIBRARY, but the AVI CONTAINER is a plain
   * RIFF byte format: fourCC chunks with little-endian sizes, parseable
   * in ~50 lines with no dependencies): `media_type == "video"`
   * payloads report TRUE header facts read from the bytes —
   *   width    = avih.dwWidth
   *   height   = avih.dwHeight
   *   n_frames = avih.dwTotalFrames
   * (checksum stays the byte rolling hash — content identity). The
   * parser walks the chunk tree generically (RIFF → LIST hdrl → avih),
   * not fixed offsets, so any conformant uncompressed AVI decodes, not
   * just [[synthesizeAvi]]'s output. Non-video modalities and
   * undecodable payloads fall back to [[StubCodec]] — the same
   * totality contract as the image/audio codecs (spec-pinned). Frame
   * PIXEL decoding of compressed codecs is where a native library
   * would slot in; uncompressed DIB frame bytes are readable directly
   * ([[videoFrameStats]]).
   */
  object VideoRiffCodec extends MediaCodec {
    def decode(rec: MediaRecord): MediaMeta = {
      if (rec.media_type == "video") {
        val h = parseAviHeader(rec.content)
        if (h != null)
          return MediaMeta(rec.media_id, rec.media_type,
            rec.content.length.toLong, byteChecksum(rec.content),
            h(1), h(2), h(0))
      }
      StubCodec.decode(rec)
    }
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parse a RIFF/AVI main header: returns Array(totalFrames, width,
    * height) or null when the payload is not a conformant AVI. Walks
    * the chunk tree (chunks are [fourCC][le32 size][data], LIST chunks
    * nest with a 4-byte list type) — a real parser, not offset math. */
  private[operators] def parseAviHeader(b: Array[Byte]): Array[Int] = {
    if (b.length < 24 || fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "AVI ")
      return null
    // walk chunks inside [from, to) looking for LIST hdrl -> avih
    def walk(from: Int, to: Int): Array[Int] = {
      var p = from
      while (p + 8 <= to) {
        val cc = fourCC(b, p)
        val size = le32(b, p + 4)
        if (size < 0 || p + 8 + size > to) return null
        if (cc == "LIST" && size >= 4 && fourCC(b, p + 8) == "hdrl") {
          val r = walk(p + 12, p + 8 + size)
          if (r != null) return r
        } else if (cc == "avih" && size >= 40) {
          // dwMicroSecPerFrame dwMaxBytesPerSec dwPadding dwFlags
          // dwTotalFrames dwInitialFrames dwStreams dwSugBufSize
          // dwWidth dwHeight
          return Array(le32(b, p + 8 + 16), le32(b, p + 8 + 32),
            le32(b, p + 8 + 36))
        }
        p += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      null
    }
    walk(12, b.length)
  }

  /**
   * Deterministic AVI fixture synthesis (pure JDK): a minimal
   * conformant uncompressed RGB24 AVI — RIFF(AVI ) → LIST hdrl (avih +
   * LIST strl(strh vids/DIB + strf BITMAPINFOHEADER)) → LIST movi with
   * one `00db` chunk per frame. Frame byte i of frame f is
   * `(seed*31 + f*7 + i*13) % 251` — an integer function of the
   * parameters, so q-level oracles replay both the header facts AND
   * the frame data arithmetically ([[synthesizePng]]'s contract for
   * video). `width` must keep rows 4-byte aligned (w*3 % 4 == 0) so
   * the DIB stride needs no pad bytes and byte i maps 1:1 to pixels.
   */
  def synthesizeAvi(width: Int, height: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    require(width * 3 % 4 == 0, "width*3 must be 4-byte aligned (no stride pad)")
    val frameBytes = width * height * 3
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val strf = 40 // BITMAPINFOHEADER
    val strh = 56
    val strlSize = 4 + 8 + strh + 8 + strf
    val avih = 56
    val hdrlSize = 4 + 8 + avih + 8 + strlSize
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    cc("RIFF"); w32(riffSize); cc("AVI ")
    cc("LIST"); w32(hdrlSize); cc("hdrl")
    cc("avih"); w32(avih)
    w32(33333); w32(frameBytes * 30); w32(0); w32(0) // usec/frame, rate, pad, flags
    w32(nFrames); w32(0); w32(1); w32(frameBytes)    // totalFrames, initial, streams, bufsize
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(strlSize); cc("strl")
    cc("strh"); w32(strh)
    cc("vids"); cc("DIB "); w32(0); w32(0)           // type, handler, flags, prio+lang
    w32(0); w32(1); w32(30); w32(0)                  // initFrames, scale, rate, start
    w32(nFrames); w32(frameBytes); w32(0); w32(0)    // length, bufsize, quality, sampleSize
    w32(0); w32(width << 16 | height)                // rcFrame
    cc("strf"); w32(strf)
    w32(40); w32(width); w32(height); w32(1 << 16 | 3 * 8) // biSize, w, h, planes|bpp
    w32(0); w32(frameBytes); w32(0); w32(0); w32(0); w32(0) // BI_RGB, sizeImage, ...
    cc("LIST"); w32(moviSize); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); w32(frameBytes)
      var i = 0
      while (i < frameBytes) {
        bos.write(((seed * 31 + f * 7 + i * 13) % 251).toInt)
        i += 1
      }
      f += 1
    }
    bos.toByteArray
  }

  /** Exact per-frame byte statistics of an uncompressed AVI payload —
    * the q271/q272 "true fact read from the DATA, not the header"
    * proof for video: one row per movi `00db` frame with its byte sum
    * (integer-exact, SQL-replayable). */
  case class VideoFrameStats(media_id: Long, frame_id: Int,
      frame_bytes: Int, sum_bytes: Long)

  /**
   * REAL frame-data feature extraction: walk each `media_type ==
   * "video"` payload's RIFF movi list and report, per `00db` frame
   * chunk, the exact byte count and byte sum — matching sums require
   * reading every frame byte from the container, not just the header.
   * Undecodable / non-video rows emit nothing (the quarantine split;
   * [[decodeMeta]] with [[VideoRiffCodec]] is the total face).
   * Partition-local imperative work in the same `mapPartitions` escape
   * hatch as every codec; no shuffle; typed output re-enters codegen.
   */
  def videoFrameStats(df: DataFrame,
      idCol: String = "media_id", typeCol: String = "media_type",
      binCol: String = "content",
      batchSize: Int = DefaultBatchSize): Dataset[VideoFrameStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    val records = df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).as("media_type"),
      col(binCol).as("content")).as[MediaRecord]
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { rec =>
          val b = rec.content
          if (rec.media_type != "video" || b.length < 24 ||
              fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "AVI ")
            Iterator.empty
          else {
            // locate LIST movi, then iterate its 00db/00dc frame chunks
            val frames = scala.collection.mutable.ArrayBuffer.empty[VideoFrameStats]
            var p = 12
            var bad = false
            while (p + 8 <= b.length && !bad) {
              val ccs = fourCC(b, p); val size = le32(b, p + 4)
              if (size < 0 || p + 8 + size > b.length) bad = true
              else {
                if (ccs == "LIST" && size >= 4 && fourCC(b, p + 8) == "movi") {
                  var q = p + 12; val end = p + 8 + size
                  var fid = 0
                  while (q + 8 <= end && !bad) {
                    val fcc = fourCC(b, q); val fsz = le32(b, q + 4)
                    if (fsz < 0 || q + 8 + fsz > end) bad = true
                    else {
                      if (fcc.endsWith("db") || fcc.endsWith("dc")) {
                        var s = 0L; var i = q + 8
                        while (i < q + 8 + fsz) { s += b(i) & 0xff; i += 1 }
                        frames += VideoFrameStats(rec.media_id, fid, fsz, s)
                        fid += 1
                      }
                      q += 8 + fsz + (fsz & 1)
                    }
                  }
                }
                p += 8 + size + (size & 1)
              }
            }
            if (bad) Iterator.empty else frames.iterator
          }
        }
      }
    }
  }

  /**
   * Deterministic PNG fixture synthesis (pure JDK): a `width`×`height`
   * RGB image whose pixel at (x, y) is an integer function of `seed` —
   * real, decodable PNG bytes for q261 and the specs. Encoding runs
   * inside the same partition-local region that consumes it, so fixture
   * generation distributes like any other codec work.
   */
  def synthesizePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((seed * 31 + x * 7 + y * 13) & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Default decode batch size — sized like an Arrow record batch: large
    * enough to amortize per-batch overhead, small enough that a batch of
    * multi-MB payloads doesn't blow executor memory. */
  val DefaultBatchSize = 256

  /**
   * Decode media metadata. Input must carry (`idCol`: long, `typeCol`:
   * string, `binCol`: binary); output is the typed `MediaMeta` Dataset.
   * Partition-local; batch-iterated via the codec.
   */
  def decodeMeta(df: DataFrame, codec: MediaCodec = StubCodec,
      idCol: String = "media_id", typeCol: String = "media_type",
      binCol: String = "content", batchSize: Int = DefaultBatchSize): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    val records = df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).as("media_type"),
      col(binCol).as("content")).as[MediaRecord]
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => batch.iterator.map(codec.decode) }
    }
  }

  /** Exact per-channel pixel sums of a decoded image — integer-exact so
    * the SQL oracle can replay them (means would float-divide). */
  case class ImagePixelStats(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /**
   * REAL pixel-data feature extraction: decode each `media_type ==
   * "image"` payload through the pure-JDK ImageIO and report exact
   * per-channel pixel SUMS — the step past q261's header proof (correct
   * dims could in principle come from a header peek; matching channel
   * sums require decoding every pixel). Undecodable or non-image rows
   * emit NOTHING (a real pipeline's quarantine split — the metadata face
   * [[decodeMeta]] is the total one). Integer sums, not means: exact,
   * overflow-safe (≤ 255·wh ≪ 2⁶³), and SQL-replayable.
   *
   * Partition-local imperative work inside the same `mapPartitions`
   * escape hatch as every codec; no shuffle; typed output re-enters
   * codegen land.
   */
  def imagePixelStats(df: DataFrame,
      idCol: String = "media_id", typeCol: String = "media_type",
      binCol: String = "content",
      batchSize: Int = DefaultBatchSize): Dataset[ImagePixelStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    val records = df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).as("media_type"),
      col(binCol).as("content")).as[MediaRecord]
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { rec =>
          if (rec.media_type != "image") Iterator.empty
          else {
            // NonFatal (see ImageIoCodec.decode): plugin decode errors
            // are unchecked; corrupt rows quarantine, never kill the task
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(rec.content))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) Iterator.empty
            else {
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val v = img.getRGB(x, y) & 0xFFFFFF
                  sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
                  x += 1
                }
                y += 1
              }
              Iterator.single(ImagePixelStats(rec.media_id,
                img.getWidth, img.getHeight, sr, sg, sb))
            }
          }
        }
      }
    }
  }

  /** Exact PCM sample statistics of a decoded audio payload — integer
    * arithmetic throughout so the SQL oracle can replay them. */
  case class AudioSampleStats(media_id: Long, sample_rate: Int,
      channels: Int, n_frames: Int, sum_samples: Long,
      min_sample: Int, max_sample: Int)

  /**
   * REAL PCM-data feature extraction: decode each `media_type ==
   * "audio"` payload through the pure-JDK `javax.sound.sampled` and
   * report exact statistics over every 16-bit sample — the q271
   * pixel-sum proof applied to audio (true header fields could come
   * from a 44-byte peek; a matching sample sum requires decoding the
   * whole PCM stream). Only 16-bit PCM is summed (other encodings and
   * undecodable/non-audio rows emit nothing — the quarantine split;
   * [[decodeMeta]] with [[AudioWavCodec]] stays the total face).
   * Samples are read little/big-endian per the header.
   */
  def audioSampleStats(df: DataFrame,
      idCol: String = "media_id", typeCol: String = "media_type",
      binCol: String = "content",
      batchSize: Int = DefaultBatchSize): Dataset[AudioSampleStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    val records = df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).as("media_type"),
      col(binCol).as("content")).as[MediaRecord]
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { rec =>
          if (rec.media_type != "audio") Iterator.empty
          else {
            val ais = readAudio(rec.content)
            val f = if (ais == null) null else ais.getFormat
            if (ais == null || f.getSampleSizeInBits != 16 ||
                f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              Iterator.empty
            else {
              try {
                val bytes = ais.readAllBytes()
                // a valid zero-frame payload has no samples: min/max
                // sentinels would leak as garbage stats — route it to
                // the quarantine split like any other undecodable row
                if (bytes.length < 2) Iterator.empty
                else {
                  var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
                  var i = 0
                  while (i + 2 <= bytes.length) {
                    val v =
                      if (f.isBigEndian) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
                      else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
                    sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                    i += 2
                  }
                  Iterator.single(AudioSampleStats(rec.media_id,
                    f.getSampleRate.toInt, f.getChannels,
                    ais.getFrameLength.toInt, sum, mn, mx))
                }
              } catch {
                case scala.util.control.NonFatal(_) => Iterator.empty
              }
            }
          }
        }
      }
    }
  }

  /** One sampled frame of a media payload (video/audio window or the
    * single image frame). */
  case class MediaFrame(media_id: Long, frame_id: Int, frame_checksum: Long)

  /** A fixed-width feature vector extracted from a payload — the bridge
    * from opaque media into the similarity-search operators. */
  case class MediaFeatures(media_id: Long, features: Array[Float])

  /**
   * Frame sampling: one output row per (payload, frame) — the
   * row-expanding shape of a real video decoder (iterator-of-batches in,
   * flatMap out; partition-local, no shuffle). STUB frames: the stub
   * codec's frame count with a per-frame rolling checksum
   * `(checksum*31 + frame_id) % p`, replayable in SQL.
   */
  def sampleFrames(df: DataFrame, codec: MediaCodec = StubCodec,
      idCol: String = "media_id", typeCol: String = "media_type",
      binCol: String = "content", batchSize: Int = DefaultBatchSize): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TextFunctions.{HashBase, HashPrime}
    val records = df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).as("media_type"),
      col(binCol).as("content")).as[MediaRecord]
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap { rec =>
        val meta = codec.decode(rec)
        (0 until meta.n_frames).iterator.map(i =>
          MediaFrame(meta.media_id, i, (meta.checksum * HashBase + i) % HashPrime))
      })
    }
  }

  /**
   * Feature extraction: payload → fixed-width `array<float>` embedding.
   * STUB features (deterministic functions of the checksum standing in for
   * a real vision/audio encoder); the output schema and batch shape are
   * the real contract — the result feeds SimilaritySearch directly.
   *
   * Each component is `(checksum·(2j+1)+j) mod p mod 1000 / 1000`,
   * computed as a DOUBLE division then rounded to float — the same
   * two-step the SQL oracle's `(x / 1000.0)::FLOAT` performs, so the
   * bridge into the similarity operators is exactly cross-engine
   * replayable (a direct float division could double-round differently).
   */
  def extractFeatures(df: DataFrame, dim: Int = 8,
      codec: MediaCodec = StubCodec, idCol: String = "media_id",
      typeCol: String = "media_type", binCol: String = "content",
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TextFunctions.HashPrime
    val records = df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).as("media_type"),
      col(binCol).as("content")).as[MediaRecord]
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { rec =>
        val meta = codec.decode(rec)
        val fs = Array.tabulate(dim) { j =>
          ((((meta.checksum * (2 * j + 1) + j) % HashPrime) % 1000L) / 1000.0).toFloat
        }
        MediaFeatures(meta.media_id, fs)
      })
    }
  }

  /** A resize result: source dims, target dims, the scale factors a real
    * resampler would apply, and the checksum of the (stub) resized
    * payload. */
  case class MediaResized(media_id: Long, width: Int, height: Int,
      target_w: Int, target_h: Int, scale_x: Double, scale_y: Double,
      resized_checksum: Long)

  /**
   * Resize: payload → fixed target dimensions (the standard vision-model
   * preprocessing step). Partition-local batch transform like the other
   * codec ops. STUB resampling: a real implementation rewrites the pixel
   * buffer; the stub derives the resized payload's checksum
   * deterministically (`((checksum*31 + target_w)*31 + target_h) mod p`)
   * and reports the exact scale factors, so the full output is
   * SQL-replayable while the Spark contract (typed schema, batching, no
   * shuffle) is the real thing.
   */
  def resize(df: DataFrame, targetW: Int = 224, targetH: Int = 224,
      codec: MediaCodec = StubCodec, idCol: String = "media_id",
      typeCol: String = "media_type", binCol: String = "content",
      batchSize: Int = DefaultBatchSize): Dataset[MediaResized] = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TextFunctions.{HashBase, HashPrime}
    val records = df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).as("media_type"),
      col(binCol).as("content")).as[MediaRecord]
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { rec =>
        val meta = codec.decode(rec)
        MediaResized(meta.media_id, meta.width, meta.height, targetW, targetH,
          targetW.toDouble / meta.width, targetH.toDouble / meta.height,
          ((meta.checksum * HashBase + targetW) * HashBase + targetH) % HashPrime)
      })
    }
  }

  /** 32-bit perceptual-hash signature of a decoded payload: the sign
    * bits of the stub feature components — bit j is set iff
    * `(checksum·(2j+1)+j) mod p mod 1000 >= 500`, i.e. iff stub
    * feature_j >= 0.5 — an SRP-style binarized embedding, which is
    * exactly what a production pHash is (sign bits of a frequency-domain
    * projection). Pure integer arithmetic on the checksum: narrow,
    * codegen'd, SQL-replayable. */
  def perceptualHash(checksum: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.TextFunctions.HashPrime
    (0 until 32).map { j =>
      when((checksum * (2 * j + 1) + j) % HashPrime % 1000 >= 500,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /**
   * Perceptual-hash near-dup pairs over a media table — the multimodal
   * member of the dedup family: decode (partition-local codec batch) →
   * 32-bit pHash → byte-pigeonhole blocking → exact Hamming verify.
   * Identical candidate shape to Dedup.simhashPairs (4 blocks are
   * lossless for maxHamming <= 3): equi-join on (block_id, block_val),
   * never all-pairs, so the compare space at 100 TB is bounded by block
   * bucket sizes (256 values × 4 blocks over near-uniform sign bits),
   * not n².
   *
   * AT-SCALE GUARD: past `Dedup.LegacyWidthGuardCutoff` objects the
   * pair LIST itself is output-bound quadratic — the 32-bit pHash's
   * ~1.5 K-value space makes identical-hash clusters grow linearly with
   * the corpus, so listing their pairs is Σ cluster² by SEMANTICS, not
   * by plan (~10⁸ pair rows measured at the round-9 100× probe).
   * Components-feeding consumers must use [[phashComponentEdges]]
   * (~linear star edges, same components); a caller that genuinely
   * wants the quadratic list opts in with `allowPairList = true`.
   */
  def phashPairs(df: DataFrame, maxHamming: Int = 3,
      codec: MediaCodec = StubCodec, idCol: String = "media_id",
      typeCol: String = "media_type", binCol: String = "content",
      blockDepth: Int = -1, allowPairList: Boolean = false): DataFrame = {
    require(maxHamming <= 3,
      "pigeonhole blocking over 4 bytes is only lossless for maxHamming <= 3")
    // shared scale core + dispatcher with Dedup.simhashPairs; the raw
    // count never decodes, and only the at-scale path pays the
    // duplication probe (which materializes the cache the join reuses —
    // pHash corpora cluster heavily: n/d ≈ 41 at the 10× probe, the
    // dictionary branch's home turf)
    val n = df.count()
    graft.GuardRefusal.check(n <= Dedup.LegacyWidthGuardCutoff || allowPairList,
      s"phashPairs lists ~quadratic pair rows at n=$n objects " +
        s"(> ${Dedup.LegacyWidthGuardCutoff}): the 32-bit pHash's ~1.5 K-value space makes " +
        "identical-hash clusters grow with the corpus, so the pair list is Σ cluster² by " +
        "semantics. Use phashComponentEdges for components (same components, ~linear " +
        "edges), or pass allowPairList=true to knowingly materialize the full list.")
    val hashed = graft.SparkUtil.trackCache(
      decodeMeta(df, codec, idCol, typeCol, binCol).toDF()
        .select(col("media_id"), perceptualHash(col("checksum")).as("ph")))
    val (depth, dict) = Dedup.pairDispatch(hashed, "ph", n, blockDepth)
    Dedup.hammingPairs(hashed, "media_id", "ph", maxHamming, depth, dict)
      .select(col("id_a").as("media_id_a"), col("id_b").as("media_id_b"),
        col("hamming"))
  }

  /** `Dedup.hammingComponentEdges` over the pHash — the CC-feeding face
    * of [[phashPairs]] (same components, ~linear edges; the stub pHash's
    * ~1.2 K-value range makes the pair list data-quadratic, so q99-style
    * consumers must never materialize it). */
  def phashComponentEdges(df: DataFrame, maxHamming: Int = 3,
      codec: MediaCodec = StubCodec, idCol: String = "media_id",
      typeCol: String = "media_type", binCol: String = "content"): DataFrame = {
    require(maxHamming <= 3,
      "pigeonhole blocking over 4 bytes is only lossless for maxHamming <= 3")
    val hashed = graft.SparkUtil.trackCache(
      decodeMeta(df, codec, idCol, typeCol, binCol).toDF()
        .select(col("media_id"), perceptualHash(col("checksum")).as("ph")))
    Dedup.hammingComponentEdges(hashed, "media_id", "ph", maxHamming,
      nHint = df.count())
  }

  /** Test/demo adapter: derive an opaque media table from the `documents`
    * corpus (payload = UTF-8 text bytes, modality round-robined by id).
    * Real pipelines read payloads from object-store parquet/binaryFile. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /**
   * Media storage-budget sheet per type: object count, total bytes,
   * rank-exact lower-median byte size (the q159 deterministic-median
   * convention — an existing size, not an interpolation), and the
   * largest object's id and size (argmax by (bytes desc, id asc) via
   * the struct-max trick) — the numbers a storage/egress budget and a
   * "what do we transcode first" decision need.
   *
   * Spark shape: one rank window per type partition for the median,
   * then ONE aggregation per type (struct max is sort-based but
   * per-partition only, with map-side partials); output is the type
   * space.
   */
  def mediaBudgetReport(meta: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_type"))
      .orderBy(col("byte_len").asc, col("media_id").asc)
    meta.select(col("media_type"), col("media_id"), col("byte_len"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("media_type"))))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_objects"),
        sum(col("byte_len")).as("total_bytes"),
        min(when(col("__rn") * 2 === col("__n") + pmod(col("__n"), lit(2L)),
          col("byte_len"))).as("median_bytes"),
        max(struct(col("byte_len").as("b"), (-col("media_id")).as("negid")))
          .as("__mx"))
      .select(col("media_type"), col("n_objects"), col("total_bytes"),
        col("median_bytes"), (-col("__mx.negid")).as("largest_id"),
        col("__mx.b").as("largest_bytes"))
  }
}
