package graft.operators

import graft.SparkSpec

/**
 * Tests for the multimodal plumbing: typed schema contract, deterministic
 * stub decode, batch iteration, and agreement with the expression-level
 * rolling hash (the SQL-oracle bridge).
 */
class MultimodalSpec extends SparkSpec {

  test("decodeMeta: stub codec fields are deterministic functions of the bytes") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (1L, "image", "ab".getBytes("UTF-8")),
      (2L, "audio", "ba".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.decodeMeta(df).collect().map(m => m.media_id -> m).toMap
    // rolling hash "ab" = 97*31+98 = 3105 (bytes == chars for ASCII)
    assert(out(1L).checksum == 3105L)
    assert(out(2L).checksum == 3135L)
    assert(out(1L).byte_len == 2L)
    assert(out(1L).width == 64 + (3105 % 1856))
    assert(out(1L).height == 64 + ((3105 / 1856) % 1016).toInt)
    assert(out(1L).n_frames == 1 + (2 % 30))
    assert(out(1L).media_type == "image")
  }

  test("ImageIoCodec: true pixel dims from real PNG/BMP decode; stub " +
      "fallback for corrupt payloads and non-image modalities") {
    val spark0 = spark
    import spark0.implicits._
    val png = Multimodal.synthesizePng(17, 5, seed = 42L)
    // a second container format, also decoded by the pure-JDK readers
    val bmpImg = new java.awt.image.BufferedImage(9, 11,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bmpImg, "bmp", bos)
    val df = Seq(
      (1L, "image", png),
      (2L, "image", bos.toByteArray),
      (3L, "image", "not an image".getBytes("UTF-8")), // undecodable
      (4L, "audio", png)) // declared non-image: stub path by contract
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.decodeMeta(df, Multimodal.ImageIoCodec)
      .collect().map(m => m.media_id -> m).toMap
    assert((out(1L).width, out(1L).height, out(1L).n_frames) == ((17, 5, 1)))
    assert((out(2L).width, out(2L).height) == ((9, 11)))
    // checksum stays the byte rolling hash regardless of decode path
    assert(out(1L).checksum == Multimodal.byteChecksum(png))
    val stub3 = Multimodal.StubCodec.decode(
      Multimodal.MediaRecord(3L, "image", "not an image".getBytes("UTF-8")))
    assert((out(3L).width, out(3L).height) == ((stub3.width, stub3.height)))
    val stub4 = Multimodal.StubCodec.decode(
      Multimodal.MediaRecord(4L, "audio", png))
    assert((out(4L).width, out(4L).height) == ((stub4.width, stub4.height)))
  }

  test("AudioWavCodec: true sample rate / channels / frames from real WAV " +
      "decode; stub fallback for corrupt payloads and non-audio modalities") {
    val spark0 = spark
    import spark0.implicits._
    val wav = Multimodal.synthesizeWav(16000, 2, 123, seed = 42L)
    val df = Seq(
      (1L, "audio", wav),
      (2L, "audio", "not a wav".getBytes("UTF-8")), // undecodable
      (3L, "image", wav)) // declared non-audio: stub path by contract
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.decodeMeta(df, Multimodal.AudioWavCodec)
      .collect().map(m => m.media_id -> m).toMap
    // width = sample rate, height = channels, n_frames = PCM frames —
    // read from the WAV header, not the fixture arithmetic
    assert((out(1L).width, out(1L).height, out(1L).n_frames) == ((16000, 2, 123)))
    assert(out(1L).checksum == Multimodal.byteChecksum(wav))
    val stub2 = Multimodal.StubCodec.decode(
      Multimodal.MediaRecord(2L, "audio", "not a wav".getBytes("UTF-8")))
    assert((out(2L).width, out(2L).height) == ((stub2.width, stub2.height)))
    val stub3 = Multimodal.StubCodec.decode(
      Multimodal.MediaRecord(3L, "image", wav))
    assert((out(3L).width, out(3L).height) == ((stub3.width, stub3.height)))
  }

  test("imagePixelStats: channel sums match a per-pixel Scala replay; " +
      "non-image and corrupt rows emit nothing") {
    val spark0 = spark
    import spark0.implicits._
    val png = Multimodal.synthesizePng(6, 4, seed = 99L)
    val df = Seq(
      (1L, "image", png),
      (2L, "image", "garbage".getBytes("UTF-8")),
      (3L, "audio", png))
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.imagePixelStats(df).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L)) // quarantine split
    // replay the synthesis arithmetic pixel by pixel
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until 4; x <- 0 until 6) {
      val v = ((99L * 31 + x * 7 + y * 13) & 0xFFFFFFL).toInt
      sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
    }
    val s1 = out.head
    assert((s1.width, s1.height) == ((6, 4)))
    assert((s1.sum_r, s1.sum_g, s1.sum_b) == ((sr, sg, sb)))
  }

  test("audioSampleStats: PCM sum/min/max match a per-sample Scala " +
      "replay; non-audio and corrupt rows emit nothing") {
    val spark0 = spark
    import spark0.implicits._
    val wav = Multimodal.synthesizeWav(8000, 2, 31, seed = 17L)
    val df = Seq(
      (1L, "audio", wav),
      (2L, "audio", "garbage".getBytes("UTF-8")),
      (3L, "image", wav))
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.audioSampleStats(df).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L))
    var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
    for (i <- 0 until 31 * 2) {
      val v = ((17L * 31 + i * 7) % 65536 - 32768).toInt
      sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
    }
    val s1 = out.head
    assert((s1.sample_rate, s1.channels, s1.n_frames) == ((8000, 2, 31)))
    assert((s1.sum_samples, s1.min_sample, s1.max_sample) == ((sum, mn, mx)))
  }

  test("audioSampleStats: a VALID zero-frame PCM payload quarantines " +
      "(no sentinel min/max garbage); decodeMeta stays total on it") {
    val spark0 = spark
    import spark0.implicits._
    val empty = Multimodal.synthesizeWav(8000, 1, 0, seed = 3L)
    val df = Seq((1L, "audio", empty)).toDF("media_id", "media_type", "content")
    assert(Multimodal.audioSampleStats(df).collect().isEmpty)
    // the metadata face still reports the true (zero-frame) header facts
    val meta = Multimodal.decodeMeta(df, Multimodal.AudioWavCodec).collect()
    assert(meta.map(m => (m.media_id, m.width, m.height, m.n_frames)).toSeq ==
      Seq((1L, 8000, 1, 0)))
  }

  test("synthesizeAvi round-trips through VideoRiffCodec: true avih " +
      "facts from the bytes; non-video and corrupt rows fall back to stub") {
    val spark0 = spark
    import spark0.implicits._
    val avi = Multimodal.synthesizeAvi(8, 5, 7, seed = 11L)
    val garbage = "not a riff container at all".getBytes("UTF-8")
    val truncated = avi.take(30) // RIFF magic intact, chunk tree cut off
    val df = Seq(
      (1L, "video", avi),
      (2L, "video", garbage),
      (3L, "video", truncated),
      (4L, "image", avi)) // declared image: codec must not sniff video
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.decodeMeta(df, Multimodal.VideoRiffCodec).collect()
      .map(m => m.media_id -> ((m.width, m.height, m.n_frames))).toMap
    assert(out(1L) == ((8, 5, 7)))
    // rows 2-4 carry stub values: equal to StubCodec.decode on the bytes
    for ((id, bytes, tpe) <- Seq((2L, garbage, "video"),
        (3L, truncated, "video"), (4L, avi, "image"))) {
      val stub = Multimodal.StubCodec.decode(
        Multimodal.MediaRecord(id, tpe, bytes))
      assert(out(id) == ((stub.width, stub.height, stub.n_frames)), s"id=$id")
    }
  }

  test("parseAviHeader walks the chunk tree generically: an unknown " +
      "chunk before hdrl is skipped, not a parse failure") {
    val avi = Multimodal.synthesizeAvi(4, 3, 2, seed = 1L)
    // splice an unknown 6-byte chunk (odd size: exercises word-align
    // padding) between 'AVI ' and the LIST hdrl
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = avi.take(12) ++ junk ++ avi.drop(12)
    // fix the RIFF size field (little-endian at offset 4)
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xff).toByte; spliced(5) = ((sz >> 8) & 0xff).toByte
    spliced(6) = ((sz >> 16) & 0xff).toByte; spliced(7) = ((sz >> 24) & 0xff).toByte
    val h = Multimodal.parseAviHeader(spliced)
    assert(h != null && h.toSeq == Seq(2, 4, 3))
  }

  test("videoFrameStats: per-frame byte sums match a Scala replay of " +
      "the synthesis arithmetic; non-video rows emit nothing") {
    val spark0 = spark
    import spark0.implicits._
    val (w, hh, nf, seed) = (4, 3, 5, 9L)
    val avi = Multimodal.synthesizeAvi(w, hh, nf, seed)
    val df = Seq((1L, "video", avi), (2L, "audio", avi))
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.videoFrameStats(df).collect()
      .map(r => r.frame_id -> ((r.media_id, r.frame_bytes, r.sum_bytes))).toMap
    assert(out.size == nf)
    val fb = w * hh * 3
    for (f <- 0 until nf) {
      var s = 0L
      for (i <- 0 until fb) s += (seed * 31 + f * 7 + i * 13) % 251
      assert(out(f) == ((1L, fb, s)), s"frame $f")
    }
  }

  test("synthesizeWav round-trips its own parameters deterministically") {
    val a = Multimodal.synthesizeWav(8000, 1, 50, seed = 5L)
    val b = Multimodal.synthesizeWav(8000, 1, 50, seed = 5L)
    assert(a.sameElements(b)) // rerun-stable fixture
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(a))
    assert(ais.getFormat.getSampleRate.toInt == 8000)
    assert(ais.getFormat.getChannels == 1)
    assert(ais.getFrameLength == 50L)
  }

  test("synthesizePng round-trips its own dimensions deterministically") {
    val a = Multimodal.synthesizePng(13, 7, seed = 5L)
    val b = Multimodal.synthesizePng(13, 7, seed = 5L)
    assert(a.sameElements(b)) // same JRE, same bytes — rerun-stable fixture
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    assert(img.getWidth == 13 && img.getHeight == 7)
  }

  test("decodeMeta batches: results identical across batch sizes (incl. size 1)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(50)
    val media = Multimodal.mediaFromDocuments(docs)
    val a = Multimodal.decodeMeta(media, batchSize = 1).collect().sortBy(_.media_id).toSeq
    val b = Multimodal.decodeMeta(media, batchSize = 7).collect().sortBy(_.media_id).toSeq
    val c = Multimodal.decodeMeta(media).collect().sortBy(_.media_id).toSeq
    assert(a == b && b == c)
    assert(a.size == 50)
  }

  test("sampleFrames expands one row per frame with rolling per-frame checksums") {
    val spark0 = spark
    import spark0.implicits._
    // "ab": checksum 3105, byte_len 2 → n_frames = 1 + 2%30 = 3
    val df = Seq((1L, "video", "ab".getBytes("UTF-8"))).toDF("media_id", "media_type", "content")
    val frames = Multimodal.sampleFrames(df).collect().sortBy(_.frame_id)
    assert(frames.length == 3)
    assert(frames.map(_.frame_id).toSeq == Seq(0, 1, 2))
    assert(frames(0).frame_checksum == (3105L * 31 + 0) % 1000000007L)
    assert(frames(2).frame_checksum == (3105L * 31 + 2) % 1000000007L)
  }

  test("extractFeatures yields fixed-width vectors that feed similarity search") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(30)
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs), dim = 8)
      .toDF().withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    assert(feats.head().getSeq[Float](1).length == 8)
    val q = feats.limit(1)
    val top = SimilaritySearch.topKCosine(feats, q, k = 3, dim = 8).collect()
    assert(top.length == 3)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-12) // self-match first
  }

  test("resize reports stub dims, exact scale factors, and a derived checksum") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(10)
    val metas = Multimodal.decodeMeta(Multimodal.mediaFromDocuments(docs))
      .collect().map(m => m.media_id -> m).toMap
    val resized = Multimodal.resize(Multimodal.mediaFromDocuments(docs),
      targetW = 224, targetH = 128).collect()
    assert(resized.length == 10)
    resized.foreach { r =>
      val m = metas(r.media_id)
      assert(r.width == m.width && r.height == m.height)
      assert(r.target_w == 224 && r.target_h == 128)
      assert(r.scale_x == 224.0 / m.width && r.scale_y == 128.0 / m.height)
      assert(r.resized_checksum == ((m.checksum * 31 + 224) * 31 + 128) % 1000000007L)
    }
  }

  test("checksum agrees with the expression-level rolling hash over ASCII text") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(20).cache()
    val viaCodec = Multimodal.decodeMeta(Multimodal.mediaFromDocuments(docs))
      .collect().map(m => m.media_id -> m.checksum).toMap
    val viaExpr = docs.select(col("doc_id"),
      graft.functions.TextFunctions.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCodec == viaExpr)
  }

  test("phashPairs finds identical payloads at hamming 0, respects the cutoff") {
    val spark0 = spark
    import spark0.implicits._
    val payload = "the very same bytes in two different records".getBytes("UTF-8")
    val df = Seq(
      (1L, "image", payload),
      (2L, "image", payload),
      (3L, "audio", "completely different payload content here".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "content")
    val pairs = Multimodal.phashPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    pairs.foreach { case (a, b, h) => assert(a < b && h <= 3) }
  }

  test("perceptualHash is a 32-bit value derived only from the checksum") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(100)
    val phs = Multimodal.decodeMeta(Multimodal.mediaFromDocuments(docs)).toDF()
      .select(Multimodal.perceptualHash(col("checksum")).as("ph"))
      .collect().map(_.getLong(0))
    phs.foreach(ph => assert(ph >= 0L && ph < (1L << 32)))
    // sign bits should be roughly balanced, not degenerate
    assert(phs.distinct.length > 50)
  }
}
