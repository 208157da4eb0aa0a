package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Embedders

/** Binary-column plumbing: metadata decode (stubbed codec), frame sampling,
  * batched featurization.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def blobs = Seq(
    (1L, "abcdefgh".* (16)),            // 128 bytes
    (2L, "Z" * 40),                      // 40 bytes
    (3L, "")                             // empty
  ).toDF("doc_id", "text")
    .select(col("doc_id"), col("text").cast("binary").as("blob"))

  test("decodeMeta: typed metadata from binary, stub header parse") {
    val rows = Multimodal.decodeMeta(spark, blobs).orderBy("doc_id").collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getLong(1) == 128)                  // n_bytes
    assert(r1.getLong(2) == 'a'.toLong)           // width = first byte
    assert(r1.getLong(3) == 'b'.toLong)           // height = second byte
    assert(r1.getLong(4) == 2)                    // 128/64 frames
    val r3 = rows(2)
    assert(r3.getLong(1) == 0 && r3.getLong(2) == 0 && r3.getLong(3) == 0)
  }

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x336699) // non-trivial pixel so the encoder writes data
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("decodeMeta: real PNG/JPEG header dimensions via javax.imageio") {
    val png = imageBytes("png", 17, 9)
    val jpg = imageBytes("jpg", 33, 21)
    assert(Multimodal.isImage(png) && Multimodal.isImage(jpg))
    val df = Seq((1L, png), (2L, jpg)).toDF("doc_id", "blob")
    val rows = Multimodal.decodeMeta(spark, df).orderBy("doc_id").collect()
    assert(rows(0).getLong(2) == 17 && rows(0).getLong(3) == 9)   // PNG w×h
    assert(rows(1).getLong(2) == 33 && rows(1).getLong(3) == 21)  // JPEG w×h
    assert(rows.forall(_.getLong(4) == 1L))                       // stills: 1 frame
    assert(rows(0).getLong(1) == png.length.toLong)
  }

  /** Minimal valid RIFF/WAVE: fmt chunk (PCM, ch channels, rate Hz, 16-bit)
    * + data chunk of `dataBytes` zero samples. */
  private def wavBytes(rate: Int, ch: Int, dataBytes: Int): Array[Byte] = {
    val blockAlign = ch * 2
    val byteRate = rate * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(rate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  test("decodeMeta: real RIFF/WAVE header parse — rate, channels, duration, frames") {
    // 8000 Hz stereo 16-bit, 1600 bytes of samples = 400 frames = 50 ms
    val wav = wavBytes(rate = 8000, ch = 2, dataBytes = 1600)
    assert(Multimodal.isWav(wav) && !Multimodal.isImage(wav))
    val rows = Multimodal.decodeMeta(spark, Seq((1L, wav)).toDF("doc_id", "blob"))
      .collect()
    val r = rows.head
    assert(r.getLong(1) == wav.length.toLong)        // n_bytes
    assert(r.getLong(2) == 0 && r.getLong(3) == 0)   // no image dims
    assert(r.getLong(4) == 400)                      // PCM frames
    assert(r.getAs[Long]("sample_rate") == 8000)
    assert(r.getAs[Long]("channels") == 2)
    assert(r.getAs[Long]("duration_ms") == 50)
  }

  test("decodeMeta: truncated WAV data chunk clamps duration, never throws") {
    // header declares 1600 data bytes but only 800 are present
    val full = wavBytes(rate = 8000, ch = 2, dataBytes = 1600)
    val truncated = full.take(44 + 800)
    val r = Multimodal.decodeMeta(spark,
      Seq((1L, truncated)).toDF("doc_id", "blob")).collect().head
    assert(r.getAs[Long]("duration_ms") == 25)       // 800 / 32000 B/s
    assert(r.getLong(4) == 200)
    // RIFF magic with garbage chunk structure parses to zeros, no throw
    val corrupt = "RIFFxxxxWAVEgarbage".getBytes("US-ASCII")
    val c = Multimodal.decodeMeta(spark,
      Seq((2L, corrupt)).toDF("doc_id", "blob")).collect().head
    assert(c.getAs[Long]("sample_rate") == 0 && c.getAs[Long]("duration_ms") == 0)
  }

  /** Minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0)) + mdat.
    * Big-endian throughout; width/height are 16.16 fixed point. */
  private def mp4Bytes(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val mvhd = java.nio.ByteBuffer.allocate(100)
      .putInt(0)                 // version 0 + flags
      .putInt(0).putInt(0)       // ctime, mtime
      .putInt(timescale).putInt(duration)
      .array()                   // rest (rate, volume, matrix…) zeros
    val tkhd = java.nio.ByteBuffer.allocate(84)
      .putInt(0).putInt(0).putInt(0).putInt(1).putInt(0).putInt(0)
      .array()
    val tk = java.nio.ByteBuffer.wrap(tkhd)
    tk.putInt(84 - 8, w << 16).putInt(84 - 4, h << 16)
    val moov = box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    box("ftyp", "isom0000".getBytes("US-ASCII")) ++ moov ++
      box("mdat", Array.fill[Byte](32)(0x55))
  }

  test("decodeMeta: real MP4 box-walk — duration from mvhd, dims from tkhd") {
    // timescale 600, duration 9000 ticks = 15 s; 640x360 presentation
    val mp4 = mp4Bytes(timescale = 600, duration = 9000, w = 640, h = 360)
    assert(Multimodal.isMp4(mp4) && !Multimodal.isWav(mp4) && !Multimodal.isImage(mp4))
    val r = Multimodal.decodeMeta(spark, Seq((1L, mp4)).toDF("doc_id", "blob"))
      .collect().head
    assert(r.getAs[Long]("width") == 640 && r.getAs[Long]("height") == 360)
    assert(r.getAs[Long]("duration_ms") == 15000)
    assert(r.getAs[Long]("sample_rate") == 0 && r.getAs[Long]("channels") == 0)
    // ftyp magic with garbage box structure parses to zeros, no throw
    val corrupt = mp4.take(16)
    val c = Multimodal.decodeMeta(spark, Seq((2L, corrupt)).toDF("doc_id", "blob"))
      .collect().head
    assert(c.getAs[Long]("duration_ms") == 0 && c.getAs[Long]("width") == 0)
    // plain TEXT containing 'ftyp' at offset 4 stays in the fake arm: its
    // ASCII prefix parses as an implausible big-endian box size
    val texty = "and ftyp words continue here for a while".getBytes("US-ASCII")
    assert(!Multimodal.isMp4(texty))
    val t = Multimodal.decodeMeta(spark, Seq((3L, texty)).toDF("doc_id", "blob"))
      .collect().head
    assert(t.getAs[Long]("width") == 'a'.toLong) // fake arm: first byte
  }

  test("audioStats: PCM amplitude stats — clipping, silence, truncation, byte cap, non-PCM") {
    def wav(samples: Seq[Int], rate: Int = 8000, declaredLen: Option[Long] = None): Array[Byte] = {
      val data = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => data.putShort(s.toShort))
      Multimodal.pcmWavHeader(rate, 1, declaredLen.getOrElse(samples.length * 2L)) ++
        data.array()
    }
    // 4 leading silent samples (|v| <= 327), then a full-scale negative
    // clip, a positive clip, and two ordinary values
    val s1 = Seq(0, 100, -327, 327, -32768, 32767, 1000, -1000)
    val (rate, ch, n, peak, rms, clip, leadMs) = Multimodal.pcm16Stats(wav(s1), 1 << 20)
    assert((rate, ch, n) == ((8000L, 1L, 8L)))
    assert(peak == 32768L && clip == 0.25) // 2 of 8 at/over full scale
    val wantRms = BigDecimal(math.sqrt(s1.map(v => v.toDouble * v).sum / 8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rms == wantRms)
    assert(leadMs == 4L * 1000 / 8000) // 4 silent samples at 8 kHz = 0 ms
    // at 1 kHz the same 4 samples are 4 ms
    assert(Multimodal.pcm16Stats(wav(s1, rate = 1000), 1 << 20)._7 == 4L)
    // all-silent payload: leading silence spans the whole read
    assert(Multimodal.pcm16Stats(wav(Seq(0, 0, 0, 0), rate = 1000), 1 << 20)._7 == 4L)
    // over-declaring header clamps to the bytes present (truncated file)
    val (_, _, nTrunc, _, _, _, _) =
      Multimodal.pcm16Stats(wav(s1, declaredLen = Some(0x7FFFFFFFL)), 1 << 20)
    assert(nTrunc == 8L)
    // byte budget caps the read: 6 bytes -> first 3 samples only
    val (_, _, nCap, peakCap, _, _, _) = Multimodal.pcm16Stats(wav(s1), 6)
    assert(nCap == 3L && peakCap == 327L)
    // an odd trailing byte never yields a half-sample
    assert(Multimodal.pcm16Stats(wav(s1).dropRight(1), 1 << 20)._3 == 7L)
    // non-16-bit (or non-PCM) formats keep header fields, zero stats
    val w8 = wav(s1); w8(34) = 8 // bits-per-sample byte in the fmt chunk
    val z = Multimodal.pcm16Stats(w8, 1 << 20)
    assert(z._1 == 8000L && z._3 == 0L && z._5 == 0.0)
    // the Dataset wrapper filters non-WAV rows and keys by id
    import spark.implicits._
    val rows = Multimodal.audioStats(spark,
      Seq((1L, wav(s1)), (2L, "not audio at all".getBytes("US-ASCII")))
        .toDF("doc_id", "blob")).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L &&
      rows.head.getAs[Long]("peak") == 32768L)
  }

  test("audioEnvelope + audioNear: re-encodes pair up, different programme material does not") {
    def wav(samples: Seq[Int]): Array[Byte] = {
      val data = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => data.putShort(s.toShort))
      Multimodal.pcmWavHeader(8000, 1, samples.length * 2L) ++ data.array()
    }
    // deterministic "programme": a loud-soft-loud amplitude pattern
    def prog(seed: Int): Seq[Int] = (0 until 512).map { i =>
      val amp = if ((i / 64) % 2 == 0) 12000 else 300
      (if ((i + seed) % 2 == 0) amp else -amp) + (i % 7)
    }
    val a = wav(prog(0))
    val b = wav(prog(1) ++ Seq.fill(16)(5)) // same envelope, different phase + a trailing quiet window
    val c = wav((0 until 512).map(i => if (i % 97 == 0) 20000 else 10)) // different dynamics
    val lvA = Multimodal.envelopeLevels(a, 16, 1 << 20)
    val lvB = Multimodal.envelopeLevels(b, 16, 1 << 20)
    assert(lvA.length == 32 && lvA.toSeq.distinct.length > 1) // real dynamics
    assert(lvA.toSeq == lvB.toSeq.take(32)) // phase-insensitive: energy only
    import spark.implicits._
    val pairs = Dedup.audioNear(spark,
        Seq((1L, a), (2L, b), (3L, c), (4L, "not audio".getBytes("US-ASCII")))
          .toDF("doc_id", "blob"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // byte budget truncates the envelope deterministically
    assert(Multimodal.envelopeLevels(a, 16, 64).length == 2)
  }

  test("audioLandmarks + audioLandmarkNear: sub-window time shift pairs up where the aligned envelope cannot") {
    def wav(samples: Seq[Int]): Array[Byte] = {
      val data = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => data.putShort(s.toShort))
      Multimodal.pcmWavHeader(8000, 1, samples.length * 2L) ++ data.array()
    }
    // dense peaks (every ~3 blocks of 8 samples = ~6 hopped windows, inside
    // maxDt = 8) with a per-period amplitude drift so landmark keys stay
    // mostly unambiguous — the slow 64-sample square wave of the envelope
    // test has peaks ~32 windows apart and yields NO landmarks
    def prog(seed: Int): Seq[Int] = (0 until 512).map { i =>
      val blk = i / 8
      val amp = 200 * (1 + (blk * 7 + seed) % 23 + 2 * (blk / 23))
      (if (i % 2 == 0) amp else -amp) + (i % 7)
    }
    // hop = windowSamples degenerates to the aligned envelope exactly
    val a = wav(prog(0))
    assert(Multimodal.envelopeLevelsHopped(a, 16, 1 << 20, 16).toSeq ==
      Multimodal.envelopeLevels(a, 16, 1 << 20).toSeq)
    // hopped window count: (n - W)/hop + 1
    assert(Multimodal.envelopeLevelsHopped(a, 16, 1 << 20, 4).length ==
      (512 - 16) / 4 + 1)
    // a copy delayed by 12 samples = 3 hops, NOT a multiple of the
    // 16-sample window: interior hopped window w+3 of the copy covers
    // exactly content window w of the original
    val shifted = wav(Seq.fill(12)(0) ++ prog(0))
    val lvA = Multimodal.envelopeLevelsHopped(a, 16, 1 << 20, 4)
    val lvS = Multimodal.envelopeLevelsHopped(shifted, 16, 1 << 20, 4)
    assert(lvS.drop(3).toSeq == lvA.toSeq)
    val c = wav((0 until 512).map(i => if (i % 97 == 0) 20000 else 10))
    import spark.implicits._
    val docs = Seq((1L, a), (2L, shifted), (3L, c),
      (4L, "not audio".getBytes("US-ASCII"))).toDF("doc_id", "blob")
    // the aligned envelope (audioNear) misses the misaligned copy...
    val aligned = Dedup.audioNear(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!aligned.contains((1L, 2L)),
      "a 12-sample shift must defeat the ALIGNED envelope — else this fixture proves nothing")
    // ...while landmark voting recovers it, with votes concentrated on the
    // single true offset (3 windows) and no coincidental pairs
    val lm = Dedup.audioLandmarkNear(spark, docs).collect()
    assert(lm.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(lm.head.getLong(2) >= 10L, s"expected a decisive vote, got ${lm.head.getLong(2)}")
    // offset covariance pinned directly on the landmark rows: interior
    // keys match with ta(copy) - ta(orig) = 3 everywhere
    val rows = Multimodal.audioLandmarks(spark, docs).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
        r.getLong(6)))
    // pair keys carry lc = dt2 = 0 (the schema-stable contract)
    assert(rows.forall(r => r._2._3 == 0L && r._2._5 == 0L))
    val byKey1 = rows.filter(_._1 == 1L).groupBy(_._2)
    val byKey2 = rows.filter(_._1 == 2L).groupBy(_._2)
    val offsets = for {
      (k, v1) <- byKey1.toSeq; v2 <- byKey2.get(k).toSeq
      if v1.length == 1 && v2.length == 1 // unambiguous keys only
    } yield v2.head._3 - v1.head._3
    assert(offsets.nonEmpty && offsets.count(_ == 3L) >= offsets.length - 1)
    // non-WAV blob contributes no landmarks
    assert(!rows.exists(_._1 == 4L))
    // TRIPLE keys (the key-space dial): same shift-invariance — the
    // shifted twin still pairs decisively, and every emitted key uses all
    // three levels with both gaps bounded
    val lm3 = Multimodal.audioLandmarks(spark, docs, keyPeaks = 3).collect()
    assert(lm3.nonEmpty && lm3.forall(r => r.getLong(4) >= 1 && r.getLong(5) >= 1))
    val near3 = Dedup.audioLandmarkNear(spark, docs, keyPeaks = 3).collect()
    assert(near3.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(near3.head.getLong(2) >= 5L)
  }

  test("envelopeLevels: duplicated thresholds count ALL equal entries (ss in {2,3,4})") {
    // the threshold table has four 2s, two 3s, two 4s (small-k ceilings);
    // the level must equal #{t : t <= ss} — the oracle's
    // len(list_filter(ts, t -> ss >= t)) — regardless of which duplicate
    // binarySearch happens to land on
    def wav(samples: Seq[Int]): Array[Byte] = {
      val data = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => data.putShort(s.toShort))
      Multimodal.pcmWavHeader(8000, 1, samples.length * 2L) ++ data.array()
    }
    def levelOf(ss: Seq[Int]): Long = {
      val padded = ss ++ Seq.fill(16 - ss.length)(0)
      Multimodal.envelopeLevels(wav(padded), 16, 1 << 20).head
    }
    val want = Map[Long, Long](
      0L -> 0L, 1L -> 1L, 2L -> 5L, 3L -> 7L, 4L -> 9L, 5L -> 10L)
    for ((ssVal, lvl) <- want)
      assert(lvl == Multimodal.QuarterOctaveThresholds.count(_ <= ssVal).toLong,
        s"test-table self-check for ss=$ssVal")
    assert(levelOf(Seq()) == want(0L))                 // ss = 0
    assert(levelOf(Seq(1)) == want(1L))                // ss = 1
    assert(levelOf(Seq(1, -1)) == want(2L))            // ss = 2: four dup 2s
    assert(levelOf(Seq(1, 1, -1)) == want(3L))         // ss = 3: two dup 3s
    assert(levelOf(Seq(2)) == want(4L))                // ss = 4: two dup 4s
    assert(levelOf(Seq(2, 1)) == want(5L))             // ss = 5: non-dup hit
  }

  test("mp4FirstSample: real container round-trip, JPEG keyframe joins the image hash, clamp + corrupt arms") {
    import spark.implicits._
    // canonical wrapper round-trip: the single video sample IS the payload
    val payload = "the quick brown fox jumps over the lazy dog".getBytes("US-ASCII")
    val vid = Multimodal.mp4VideoHeader() ++ payload
    assert(Multimodal.isMp4(vid) && !Multimodal.isImage(vid))
    assert(Multimodal.mp4FirstSample(vid).get.toSeq == payload.toSeq)
    // the container's phash = the fake-arm hash of the SAMPLE bytes — the
    // multimodal_video oracle device (re-muxing can't change the phash)
    val viaVideo = Multimodal.imagePHash(spark, Seq((1L, vid)).toDF("doc_id", "blob"))
      .collect().head.getLong(1)
    assert(viaVideo == Multimodal.dhash56(Array.tabulate(64)(i =>
      if (i < payload.length) payload(i) & 0xff else 0)))
    // real tiny MP4 with a JPEG keyframe: video phash == the image's own
    // phash, so video blobs join imageDedup clusters with their stills
    val jpg = imageBytes("jpg", 33, 21)
    val mjpeg = Multimodal.mp4VideoHeader() ++ jpg
    val hashes = Multimodal.imagePHash(spark,
      Seq((1L, mjpeg), (2L, jpg)).toDF("doc_id", "blob"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L), "MJPEG keyframe must hash like its still")
    // frame count is real now: the wrapper declares 1 sample
    val meta = Multimodal.decodeMeta(spark, Seq((1L, vid)).toDF("doc_id", "blob"))
      .collect().head
    assert(meta.getAs[Long]("n_frames") == 1L)
    // truncated mdat: declared sample size past the present bytes clamps
    val cut = vid.take(vid.length - 20)
    assert(Multimodal.mp4FirstSample(cut).get.toSeq ==
      payload.take(payload.length - 20).toSeq)
    // byte budget caps the slice
    assert(Multimodal.mp4FirstSample(vid, maxBytes = 5).get.toSeq ==
      payload.take(5).toSeq)
    // a container with no sample table (the header-only fixture) yields no
    // sample; grayGrid falls back to the container-level fake arm
    val noStbl = mp4Bytes(timescale = 600, duration = 9000, w = 64, h = 64)
    assert(Multimodal.mp4FirstSample(noStbl).isEmpty)
    assert(Multimodal.grayGrid(noStbl).toSeq ==
      Array.tabulate(64)(i => if (i < noStbl.length) noStbl(i) & 0xff else 0).toSeq)
    // empty payload: structure parses, zero bytes exist — Some(empty), so
    // the hash is the all-zero grid's, not the container fake arm's
    val hollow = Multimodal.mp4VideoHeader()
    assert(Multimodal.mp4FirstSample(hollow).get.isEmpty)
  }

  test("mp4FirstSample: co64 64-bit chunk offsets resolve the same sample") {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    def u32s(vs: Long*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(v => bb.putInt(v.toInt)); bb.array()
    }
    val payload = "sixty-four bit offsets".getBytes("US-ASCII")
    val hdlr = u32s(0L, 0L) ++ "vide".getBytes("US-ASCII") ++ u32s(0L, 0L, 0L)
    val stsz = u32s(0L, payload.length.toLong, 1L)
    def moovOf(off: Long): Array[Byte] = {
      val co64 = u32s(0L, 1L) ++
        java.nio.ByteBuffer.allocate(8).putLong(off).array()
      val stbl = box("stbl", box("stsz", stsz) ++ box("co64", co64))
      box("moov", box("trak", box("mdia", box("hdlr", hdlr) ++
        box("minf", stbl))))
    }
    val ftyp = box("ftyp", "isomisom".getBytes("US-ASCII"))
    val mdatH = u32s(0L) ++ "mdat".getBytes("US-ASCII")
    val total = ftyp.length + moovOf(0L).length + mdatH.length
    val vid = ftyp ++ moovOf(total.toLong) ++ mdatH ++ payload
    assert(Multimodal.isMp4(vid))
    assert(Multimodal.mp4FirstSample(vid).get.toSeq == payload.toSeq)
  }

  test("mp4Samples: consecutive frames, short tail, absent-tail drop, frame cap") {
    val payload = (0 until 80).map(i => ('a' + i % 26).toChar).mkString
      .getBytes("US-ASCII")
    val vid = Multimodal.mp4VideoFramesHeader(frameBytes = 32) ++ payload
    val frames = Multimodal.mp4Samples(vid)
    // 80 bytes at 32/frame: two full frames + one 16-byte tail; the
    // declared-but-absent 4096-sample tail is dropped by the bounds clamp
    assert(frames.map(_._1) == Seq(0L, 1L, 2L))
    assert(frames(0)._2.toSeq == payload.slice(0, 32).toSeq)
    assert(frames(1)._2.toSeq == payload.slice(32, 64).toSeq)
    assert(frames(2)._2.toSeq == payload.slice(64, 80).toSeq)
    // maxFrames caps the walk
    assert(Multimodal.mp4Samples(vid, maxFrames = 2).map(_._1) == Seq(0L, 1L))
    // per-slice byte budget clamps each frame
    assert(Multimodal.mp4Samples(vid, maxBytes = 5).forall(_._2.length <= 5))
    // sample 0 must equal the first-sample walk
    assert(frames(0)._2.toSeq == Multimodal.mp4FirstSample(vid).get.toSeq)
  }

  test("mp4Samples: stsc multi-chunk layout with per-entry stsz sizes") {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    def u32s(vs: Long*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(v => bb.putInt(v.toInt)); bb.array()
    }
    // 5 samples, sizes 4,5,6,7,8; chunk 1 holds samples 0-2, chunk 2 the
    // rest (stsc runs (1,3),(2,2)); a junk gap between the chunks proves
    // the walk trusts stco, not adjacency
    val sizes = Seq(4, 5, 6, 7, 8)
    val samples = sizes.zipWithIndex.map { case (n, i) =>
      Array.fill[Byte](n)(('A' + i).toByte)
    }
    val hdlr = u32s(0L, 0L) ++ "vide".getBytes("US-ASCII") ++ u32s(0L, 0L, 0L)
    val stsz = u32s(Seq(0L, 0L, 5L) ++ sizes.map(_.toLong): _*)
    val stsc = u32s(0L, 2L, 1L, 3L, 1L, 2L, 2L, 1L)
    val gap = "JUNKJUNK".getBytes("US-ASCII")
    def moovOf(off1: Long, off2: Long): Array[Byte] = {
      val stco = u32s(0L, 2L, off1, off2)
      val stbl = box("stbl", box("stsz", stsz) ++ box("stsc", stsc) ++
        box("stco", stco))
      box("moov", box("trak", box("mdia", box("hdlr", hdlr) ++
        box("minf", stbl))))
    }
    val ftyp = box("ftyp", "isomisom".getBytes("US-ASCII"))
    val mdatH = u32s(0L) ++ "mdat".getBytes("US-ASCII")
    val base = ftyp.length + moovOf(0L, 0L).length + mdatH.length
    val chunk1 = samples.take(3).reduce(_ ++ _)
    val off1 = base.toLong
    val off2 = off1 + chunk1.length + gap.length
    val vid = ftyp ++ moovOf(off1, off2) ++ mdatH ++ chunk1 ++ gap ++
      samples.drop(3).reduce(_ ++ _)
    assert(Multimodal.isMp4(vid))
    val frames = Multimodal.mp4Samples(vid)
    assert(frames.map(_._1) == (0L until 5L))
    frames.zip(samples).foreach { case ((_, got), want) =>
      assert(got.toSeq == want.toSeq)
    }
    // and the gap bytes never leak into any frame
    assert(frames.forall(!_._2.sameElements(gap)))
  }

  test("videoNear recovers the re-introed twin that first-sample clustering provably misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val header = Multimodal.mp4VideoFramesHeader()
    // 160 varied payload bytes = 5 full frames
    val text = (0 until 160).map(i => ('a' + (i * 7) % 26).toChar).mkString
      .getBytes("US-ASCII")
    val junk = Array.fill[Byte](32)('z'.toByte)
    val docs = Seq(
      (1L, header ++ text),
      (2L, header ++ junk ++ text)
    ).toDF("doc_id", "blob")
    // frame vote: doc 2's frames 1..5 are doc 1's 0..4 — five votes at
    // offset -1
    val pairs = Dedup.videoNear(spark, docs).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getLong(2) == 5L)
    // the first-sample form misses: different first frames ⇒ different
    // container hashes ⇒ two singleton groups (the round-12 named residual
    // this operator exists to close)
    val groups = Dedup.imageDedup(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) != groups(2L))
  }

  test("videoNearHamming recovers the per-frame-drifted re-intro twin exact voting misses") {
    import spark.implicits._
    val header = Multimodal.mp4VideoFramesHeader()
    val text = (0 until 160).map(i => ('a' + (i * 7) % 26).toChar).mkString
      .getBytes("US-ASCII")
    // the re-encode device: flip ONE gradient bit per frame — byte 31 of a
    // 32-byte frame only participates in the row-3 c=6 gradient (bit 27),
    // so forcing that comparison to invert changes every frame hash by
    // EXACTLY one bit
    val drifted = text.clone()
    var i = 31
    while (i < drifted.length) {
      val prev = drifted(i - 1) & 0xff
      drifted(i) =
        (if ((drifted(i) & 0xff) > prev) math.max(prev - 1, 0)
         else math.min(prev + 1, 255)).toByte
      i += 32
    }
    val junk = Array.fill[Byte](32)('z'.toByte)
    val docs = Seq(
      (1L, header ++ text),
      (2L, header ++ junk ++ drifted)
    ).toDF("doc_id", "blob")
    // exact frame voting provably misses: every shared frame differs by
    // one bit, so no frame hash ever joins
    assert(Dedup.videoNear(spark, docs).collect().isEmpty)
    // the banded-Hamming widening (explicit t) recovers the twin at
    // offset -1 with all five full frames voting
    val pairs = Dedup.videoNearHamming(spark, docs, agreeBands = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getLong(2) == 5L)
    // maxHamming = 0 degenerates to the exact form's answer (empty here)
    assert(Dedup.videoNearHamming(spark, docs, maxHamming = 0, agreeBands = 2)
      .collect().isEmpty)
    // auto-t (the default) is lossless at every clamped setting — same
    // answer as the explicit dial
    val auto = Dedup.videoNearHamming(spark, docs).collect()
    assert(auto.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  // the saturation device for the auto family: frames alternate a CONSTANT
  // intro-card frame C with doc-specific content slices, so the unigram
  // fhash key has one corpus-hot bucket (every C frame hashes identically)
  // while consecutive BIGRAMS (C, t_i) / (t_i, C) stay doc-selective —
  // exactly the regime the fan-out audit exists to catch
  private def saturatedVideoCorpus = {
    val header = Multimodal.mp4VideoFramesHeader()
    val cFrame = Array.fill[Byte](32)('z'.toByte)
    def slice(d: Int, j: Int): Array[Byte] = {
      val rnd = new scala.util.Random(d * 1000 + j)
      Array.fill[Byte](32)((rnd.nextInt(96) + 32).toByte) // printable, random gradient
    }
    def payload(d: Int): Array[Byte] =
      (0 until 8).flatMap(j => cFrame ++ slice(d, j)).toArray
    def junk(d: Int): Array[Byte] = {
      val rnd = new scala.util.Random(d * 7 + 3)
      Array.fill[Byte](32)((rnd.nextInt(96) + 32).toByte)
    }
    (1 to 3).map(d => (d.toLong, header ++ payload(d))) ++
      (1 to 3).map(d => (d + 100L, header ++ junk(d) ++ payload(d)))
  }

  test("videoKeyAudit: one bounded row, the hot constant frame dominates Σ|bucket|²") {
    val docs = saturatedVideoCorpus.toDF("doc_id", "blob")
    val fr = Multimodal.videoFrameHashes(spark, docs)
    val a = Dedup.videoKeyAudit(fr).collect()
    assert(a.length == 1)
    val r = a.head
    assert(r.getLong(0) == 96L, s"n_frames: ${r.getLong(0)}") // 6 docs × 16 frames
    // the constant frame appears 8× per doc on both arms → one 48-bucket
    assert(r.getLong(2) >= 48L, s"max_bucket: ${r.getLong(2)}")
    assert(r.getAs[Double]("est_candidates") >= 48.0 * 48.0)
    // the decision quantity: expected fan-out per frame probe is quadratic-ish
    assert(r.getAs[Double]("est_candidates") / 96.0 > 16.0)
  }

  test("videoNearHammingAuto: saturated corpus escalates to the bigram vote (branches genuinely differ)") {
    val docs = saturatedVideoCorpus.toDF("doc_id", "blob")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val auto = rows(Dedup.videoNearHammingAuto(spark, docs))
    val bigram = rows(Dedup.videoNearBigram(spark, docs))
    val hamming = rows(Dedup.videoNearHamming(spark, docs))
    // auto ≡ the explicit escalated arm, exactly (pairs AND votes)
    assert(auto == bigram)
    // the twin pairs, recovered at 14 bigram votes each (15 shared frames
    // in the 16-frame window → 14 shared consecutive bigrams at offset -1)
    assert(auto == Seq((1L, 101L, 14L), (2L, 102L, 14L), (3L, 103L, 14L)), s"auto: $auto")
    // the unigram Hamming arm is GARBAGE here — every doc pair shares the
    // 8 constant frames at offset 0, so all 15 pairs "match": the branches
    // genuinely differ, and the auto pick is the semantic fix, not a tune
    assert(hamming.size == 15, s"hamming pairs: ${hamming.size}")
    assert(auto != hamming)
  }

  test("videoNearHammingAuto: unsaturated corpus IS the explicit Hamming form (drift recovery kept)") {
    import spark.implicits._
    val header = Multimodal.mp4VideoFramesHeader()
    val text = (0 until 160).map(i => ('a' + (i * 7) % 26).toChar).mkString
      .getBytes("US-ASCII")
    val drifted = text.clone()
    var i = 31
    while (i < drifted.length) {
      val prev = drifted(i - 1) & 0xff
      drifted(i) =
        (if ((drifted(i) & 0xff) > prev) math.max(prev - 1, 0)
         else math.min(prev + 1, 255)).toByte
      i += 32
    }
    val junk = Array.fill[Byte](32)('z'.toByte)
    val docs = Seq(
      (1L, header ++ text),
      (2L, header ++ junk ++ drifted)
    ).toDF("doc_id", "blob")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val auto = rows(Dedup.videoNearHammingAuto(spark, docs))
    val hamming = rows(Dedup.videoNearHamming(spark, docs))
    assert(auto == hamming && auto == Seq((1L, 2L, 5L)))
    // and the trade the auto pick protects: exact bigrams CANNOT recover a
    // drifted twin (every frame hash differs by one bit), so blindly
    // escalating would lose the widening — the audit gates it instead
    assert(Dedup.videoNearBigram(spark, docs).collect().isEmpty)
  }

  test("videoDedupAuto: saturated corpus escalates the REP MINE to bigrams; unsaturated IS videoDedup") {
    val docs = saturatedVideoCorpus.toDF("doc_id", "blob")
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val auto = verdicts(Dedup.videoDedupAuto(spark, docs))
    // the exact treatment form is GARBAGE here: every rep pair shares the
    // 8 constant intro frames at offset 0, so the unigram rep mine chains
    // the whole corpus into one component
    val exact = verdicts(Dedup.videoDedup(spark, docs))
    assert(exact.values.map(_._1).toSet.size == 1,
      s"device check: the exact mine should collapse everything, got ${exact.values.map(_._1).toSet}")
    // the auto form's bigram rep mine recovers exactly the twin structure:
    // each re-introed twin inherits its base's root, nothing else chains
    assert(auto == Map(
      1L -> (1L, true), 2L -> (2L, true), 3L -> (3L, true),
      101L -> (1L, false), 102L -> (2L, false), 103L -> (3L, false)), s"auto: $auto")
    // unsaturated side: the drifted-twin corpus fans out ~1, so auto IS
    // the explicit exact form (same plan through the shared tail)
    import spark.implicits._
    val header = Multimodal.mp4VideoFramesHeader()
    val text = (0 until 160).map(i => ('a' + (i * 7) % 26).toChar).mkString
      .getBytes("US-ASCII")
    val junk = Array.fill[Byte](32)('q'.toByte)
    val plain = Seq(
      (1L, header ++ text),
      (2L, header ++ junk ++ text),   // re-intro twin (vote arm)
      (3L, header ++ text)            // re-mux (collapse arm)
    ).toDF("doc_id", "blob")
    assert(verdicts(Dedup.videoDedupAuto(spark, plain)) ==
      verdicts(Dedup.videoDedup(spark, plain)))
  }

  test("videoDedup: re-mux copies collapse, the re-intro twin components, keeper = smallest id") {
    import spark.implicits._
    val header = Multimodal.mp4VideoFramesHeader()
    val text = (0 until 160).map(i => ('a' + (i * 7) % 26).toChar).mkString
      .getBytes("US-ASCII")
    val junk = Array.fill[Byte](32)('z'.toByte)
    val other = (0 until 160).map(i => ('A' + (i * 11) % 26).toChar).mkString
      .getBytes("US-ASCII")
    val docs = Seq(
      (1L, header ++ text),          // original
      (2L, header ++ junk ++ text),  // re-introed near twin (vote arm)
      (3L, header ++ text),          // identical frame sequence (collapse arm)
      (4L, header ++ other),         // unrelated video — its own singleton
      (5L, "not a video".getBytes("US-ASCII")) // non-MP4: no verdict row
    ).toDF("doc_id", "blob")
    val out = Dedup.videoDedup(spark, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), s"verdict rows: ${out.keySet}")
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)), "re-intro twin must inherit the component root")
    assert(out(3L) == ((1L, false)), "re-mux copy must collapse into the original")
    assert(out(4L) == ((4L, true)), "unrelated video stays its own keeper")
  }

  test("mp4Meta: corrupt box sizes terminate the walk immediately") {
    // a declared size in 2..7 (smaller than the 8-byte header) must stop
    // the walk, not degrade to a byte-granular scan
    val tiny = java.nio.ByteBuffer.allocate(1024)
    tiny.putInt(16).put("ftypisom0000".getBytes("US-ASCII"))
    tiny.putInt(3).put("free".getBytes("US-ASCII")) // sz0 = 3 < 8: corrupt
    assert(Multimodal.mp4Meta(tiny.array()) == ((0L, 0L, 0L, 0L)))
    // a truncated 64-bit largesize (sz0 == 1 with < 16 bytes left) likewise
    val trunc = java.nio.ByteBuffer.allocate(28)
    trunc.putInt(16).put("ftypisom0000".getBytes("US-ASCII"))
    trunc.putInt(1).put("moov".getBytes("US-ASCII")).putInt(0) // largesize cut off
    assert(Multimodal.mp4Meta(trunc.array()) == ((0L, 0L, 0L, 0L)))
  }

  test("decodeMeta: corrupt image magic yields 0x0, never throws") {
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      1, 2, 3, 4) // valid signature, garbage header
    val rows = Multimodal.decodeMeta(spark, Seq((1L, corrupt)).toDF("doc_id", "blob"))
      .collect()
    assert(rows.head.getLong(2) == 0 && rows.head.getLong(3) == 0)
    assert(rows.head.getLong(1) == 12)
  }

  test("frameSample: evenly spaced fixed-size byte windows, short blobs dropped") {
    val frames = Multimodal.frameSample(blobs, n = 4, frameBytes = 32)
      .orderBy("doc_id", "frame_no").collect()
    // doc 3 (empty) and doc 2 (40 >= 32 stays) — doc2 has 4 frames, doc1 has 4
    assert(frames.map(_.getLong(0)).distinct.toSeq == Seq(1L, 2L))
    assert(frames.count(_.getLong(0) == 1L) == 4)
    frames.foreach(r => assert(r.getAs[Array[Byte]]("frame").length == 32))
    // first frame starts at byte 0
    val f0 = frames.find(r => r.getLong(0) == 1L && r.getInt(1) == 0).get
    assert(new String(f0.getAs[Array[Byte]]("frame"), "UTF-8").startsWith("abcdefgh"))
  }

  test("featurize: partition-batched embedding over binary blobs") {
    val feats = Multimodal.featurize(spark, blobs, "local/hash-16")
      .orderBy("doc_id").collect()
    assert(feats.length == 3)
    val f = Embedders.hashProjection(16)
    val expected = f("abcdefgh".*(16).getBytes("UTF-8"))
    assert(feats.head.getSeq[Double](1) == expected.toSeq)
    assert(feats.forall(_.getSeq[Double](1).length == 16))
  }

  test("videoStillMatches: cross-modal verdicts — exact, 1-bit drift, replica restore, repeated frames") {
    import spark.implicits._
    val header = Multimodal.mp4VideoFramesHeader()
    def text(phase: Int, n: Int): Array[Byte] =
      (0 until n).map(i => ('a' + (i * 7 + phase) % 26).toChar).mkString
        .getBytes("US-ASCII")
    val t1 = text(0, 96)  // video 1: 3 frames
    val t2 = text(3, 96)  // video 2: 3 frames, distinct content
    val fX = text(11, 32) // the frame video 3 repeats
    // 1-bit drift of video 2's frame 0 (the videoNearHamming device:
    // byte 31 participates only in the row-3 c=6 gradient — bit 27)
    val near = java.util.Arrays.copyOfRange(t2, 0, 32)
    val prev = near(30) & 0xff
    near(31) = (if ((near(31) & 0xff) > prev) math.max(prev - 1, 0)
                else math.min(prev + 1, 255)).toByte
    val videos = Seq(
      (1L, header ++ t1),
      (2L, header ++ t2),
      (3L, header ++ fX ++ fX),            // same frame TWICE
      (4L, text(17, 64))                   // NOT an mp4 — must yield nothing
    ).toDF("doc_id", "blob")
    val images = Seq(
      (10L, java.util.Arrays.copyOfRange(t1, 32, 64)), // exact copy of v1 frame 1
      (11L, near),                                     // 1-bit drift of v2 frame 0
      (12L, text(23, 32)),                             // junk: matches nothing
      (13L, java.util.Arrays.copyOfRange(t1, 32, 64)), // REPLICA of image 10
      (14L, fX)                                        // v3's repeated frame
    ).toDF("doc_id", "blob")
    val out = Dedup.videoStillMatches(spark, videos, images)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // replica images BOTH restore through the distinct-hash collapse;
    // the repeated frame counts twice; the drift pair carries hamming 1
    assert(out.toSeq == Seq(
      (1L, 10L, 1L, 0L), (1L, 13L, 1L, 0L),
      (2L, 11L, 1L, 1L),
      (3L, 14L, 2L, 0L)))
    // minFrames filters on the restored frame count
    assert(Dedup.videoStillMatches(spark, videos, images, minFrames = 2)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // maxHamming = 0 degenerates to exact frame-copy detection
    assert(Dedup.videoStillMatches(spark, videos, images, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (1L, 13L), (3L, 14L)))
    // explicit agreeBands dial is lossless — same verdicts as auto-t
    assert(Dedup.videoStillMatches(spark, videos, images, agreeBands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == out.toSeq)
  }
}
