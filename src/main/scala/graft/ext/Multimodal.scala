package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed in batched per-partition passes.
  *
  * Codec honesty ledger (EMPTY as of round 8 — every modality rides a
  * genuine JDK codec, each gated by a formula oracle that never sees
  * the bytes and so passes iff the encode->decode round trip is
  * bit-perfect):
  *
  *  - IMAGE (round 7): [[synthesizeImages]] / [[imageStats]] — real
  *    PNG via `javax.imageio` (lossless). q_image_decode.
  *  - AUDIO (round 8): [[synthesizeWav]] / [[audioStats]] /
  *    [[audioEnergy]] — real RIFF/WAV 16-bit PCM via
  *    `javax.sound.sampled` (lossless). q_audio_decode, q_media_energy.
  *  - VIDEO (round 8): [[synthesizeGif]] / [[videoFrameStats]] /
  *    [[gifFrameDupPairs]] — real multi-frame animated GIF via the JDK
  *    GIF reader/writer (LZW container; lossless for palettized
  *    content, and 256-level grayscale fits the palette exactly).
  *    q_video_decode, q_gif_frame_dedup.
  *  - LOSSY IMAGE (round 9): [[synthesizeJpegs]] / [[jpegDecodeGate]]
  *    — real JPEG at explicit quality through the JDK writer/reader.
  *    Lossy, so the gate pins what compression preserves: dimensions
  *    bit-exact, mean luminance inside a measured tolerance band.
  *    q_jpeg_decode.
  *
  * The MM01 synthetic-header path ([[synthesize]] / [[decodeMeta]] /
  * [[frameDupPairs]] / [[sampleFrames]] / [[resize]]) is retained as
  * deliberately-labeled CONTAINER-AGNOSTIC PLUMBING: it demonstrates
  * the schema/batching/no-shuffle shape for codecs that genuinely are
  * not in this container (H.264 and friends), and its faces stay
  * oracle-checked against the synthetic format spec. Everything in
  * this module keeps the real Spark shape: typed schema,
  * partition-sized batching, pure-function kernels, no driver
  * collects, binary never shuffled except by explicit repartition.
  *
  * PROCESS-WIDE SIDE EFFECT (documented per ADVICE r12): every codec
  * entry point in this object disables javax.imageio's disk-backed
  * stream cache (`ImageIO.setUseCache(false)`, JVM-global) the first
  * time it runs on an executor — see [[imageIoMemoryOnly]] for the
  * measured rationale. Co-resident code in the same executor JVM that
  * decodes large images FROM DISK STREAMS and relies on file-backed
  * caching will buffer in memory instead, and a user's own
  * `setUseCache(true)` is re-flipped by the next codec task. If that
  * trade is wrong for your deployment, wrap your own streams in
  * `FileCacheImageInputStream` explicitly — per-stream construction
  * bypasses the global default either way.
  */
object Multimodal {

  /** media schema: bytes + typed metadata struct. */
  val mediaType: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType))), nullable = true)))

  /** Deterministic synthetic media: a 16-byte header (magic, width,
    * height, n_frames) followed by a pseudo-random payload derived from
    * the id — stands in for real files so the pipeline shape is testable
    * offline. */
  def synthesize(ids: DataFrame, idCol: String, kind: String,
      payloadBytes: Int = 256): DataFrame = {
    val id = col(idCol).cast(LongType)
    val width = (id % 64 + 8).cast(IntegerType)
    val height = (id % 48 + 6).cast(IntegerType)
    val frames = (id % 16 + 1).cast(IntegerType)
    // header rendered as fixed-width hex text (deterministic + portable),
    // payload from repeated sha2 of the id
    val header = concat(lit("MM01"),
      lpad(lower(hex(width)), 4, "0"), lpad(lower(hex(height)), 4, "0"),
      lpad(lower(hex(frames)), 4, "0"))
    val payload = substring(
      concat((0 until (payloadBytes / 32 + 1))
        .map(i => sha2(concat(id.cast(StringType), lit(s":$i")), 256)): _*),
      1, payloadBytes)
    ids.select(id.as("media_id"), lit(kind).as("kind"),
      concat(header, payload).cast(BinaryType).as("bytes"))
  }

  /** FAKE decode kernel — parses the synthetic header. A production build
    * swaps the body for a real codec call; signature and plan shape stay
    * identical (narrow projection, codegen'd, no shuffle). */
  def decodeMeta(bytes: Column): Column = {
    val txt = bytes.cast(StringType)
    val ok = substring(txt, 1, 4) === "MM01"
    when(ok && length(txt) >= 16, struct(
      conv(substring(txt, 5, 4), 16, 10).cast(IntegerType).as("width"),
      conv(substring(txt, 9, 4), 16, 10).cast(IntegerType).as("height"),
      conv(substring(txt, 13, 4), 16, 10).cast(IntegerType).as("n_frames"),
      lit("mm01").as("format")))
      .otherwise(lit(null).cast(mediaType("meta").dataType))
  }

  /** Feature extraction over the payload: byte-level statistics standing
    * in for a real embedding kernel. Pure column expressions — scales as
    * a narrow map. */
  def byteFeatures(bytes: Column): Column = {
    val payload = substring(bytes.cast(StringType), 17, 1000000)
    struct(
      octet_length(bytes).as("n_bytes"),
      length(payload).as("payload_len"),
      crc32(bytes).as("checksum"),
      substring(md5(bytes), 1, 8).as("digest8"))
  }

  // ------------------------------------------------------------------
  // REAL audio codec path (javax.sound.sampled — JDK-only, offline-
  // safe). Round 8: the audio half of the multimodal tier is no longer
  // a fake. RIFF/WAV PCM bytes are really encoded and really decoded;
  // the honesty ledger now holds video only.
  // ------------------------------------------------------------------

  /** Deterministic 16-bit PCM test signal: sample i of media `id` is
    * ((id*7919 + i*104729) mod 65536) - 32768 — a full-swing
    * quasi-uniform sequence (the additive step 104729 mod 65536 is odd,
    * so consecutive samples walk the whole 16-bit range). The formula
    * is the oracle contract: WAV PCM is lossless, so a SQL mirror of
    * this expression must reproduce [[audioStats]]/[[audioEnergy]]
    * EXACTLY over the real encode->decode round trip; any byte the
    * codec garbles breaks the gate. Sample count derives from the id
    * (n = floorMod(id, 1984) + 64) so every clip has its own length. */
  private def patternSample(id: Long, i: Int): Int =
    java.lang.Math.floorMod(id * 7919L + i * 104729L, 65536L).toInt - 32768

  private[graft] def patternSampleCount(id: Long): Int =
    java.lang.Math.floorMod(id, 1984L).toInt + 64

  /** Fixture writer: REAL WAV bytes per id — 16-bit signed PCM,
    * little-endian, mono, 8 kHz, full RIFF/WAVE container via
    * `AudioSystem.write`. One narrow UDF map; encoding runs where the
    * ids live, bytes never shuffle. A codec kernel is the legitimate
    * UDF case: opaque JVM work per row, nothing for Catalyst to push
    * into or through. */
  def synthesizeWav(ids: DataFrame, idCol: String,
      sampleRate: Float = 8000f): DataFrame = {
    val enc = udf((id: Long) => {
      val n = patternSampleCount(id)
      val raw = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = patternSample(id, i)
        raw(i * 2) = (s & 0xff).toByte
        raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate, 16, 1, 2, sampleRate, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    })
    ids.select(col(idCol).cast(LongType).as("media_id"),
      lit("audio").as("kind"), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** REHEARSAL-ONLY fixture writer (VERDICT r12 Next #7) — NOT oracle-
    * mirrored; the oracle faces keep [[synthesizeWav]]'s formula. That
    * formula's sample walk (step 104729 mod 65536) is id-INDEPENDENT,
    * so every clip is a phase slice of one global cycle and energy
    * fingerprints collide en masse — the 100x rehearsal's near-dup
    * stage then measures either everything (quadratic boilerplate) or,
    * after the frequency guard, nothing (the r12
    * "phase_collision_finding"). Real crawls do not share a global
    * cycle. Here each clip family gets an ID-DERIVED STEP (frequency):
    * base = id mod 1e10 (the rehearsal's replica shift is r*1e10, and
    * 1e10 ≡ 0 mod 1024, so replicas share `base mod 1024` and hence
    * the step), phase = base*7919, and replicas (rep = id div 1e10 > 0)
    * add a sparse replica-keyed perturbation (every 37th sample nudged
    * by (rep mod 7 + 1)*300) — so a replica family is a genuine
    * near-dup cluster (identical frequency, a few energy frames
    * nudged, Hamming-close fingerprints) while unrelated families ride
    * distinct cycles and stay apart. Clip length derives from `base`,
    * not `id`, so family members align sample-for-sample. */
  def synthesizeWavVaried(ids: DataFrame, idCol: String,
      sampleRate: Float = 8000f): DataFrame = {
    val enc = udf((id: Long) => {
      val base = java.lang.Math.floorMod(id, 10000000000L)
      val rep = java.lang.Math.floorMod(id, Long.MaxValue) / 10000000000L
      val step = 104729L + 2L * java.lang.Math.floorMod(base, 1024L)
      val n = java.lang.Math.floorMod(base, 1984L).toInt + 64
      val raw = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        var s = java.lang.Math.floorMod(base * 7919L + i * step, 65536L)
          .toInt - 32768
        if (rep != 0L && i % 37 == 0) {
          val d = (java.lang.Math.floorMod(rep, 7L).toInt + 1) * 300
          s = math.max(-32768, math.min(32767, s + d))
        }
        raw(i * 2) = (s & 0xff).toByte
        raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate, 16, 1, 2, sampleRate, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    })
    ids.select(col(idCol).cast(LongType).as("media_id"),
      lit("audio").as("kind"), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** Decode a WAV container to signed-int samples (all channels
    * interleaved). Supports what `javax.sound.sampled` parses offline:
    * PCM_SIGNED 16-bit (either endianness) and PCM_SIGNED/UNSIGNED
    * 8-bit. Returns null for undecodable or unsupported bytes — and
    * catches NonFatal ONLY, so an OOM/interrupt inside a task surfaces
    * as a task failure instead of masquerading as a decode failure. */
  private def decodeWav(bytes: Array[Byte])
      : (javax.sound.sampled.AudioFormat, Array[Int]) = {
    if (bytes == null) return null
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val unsigned8 =
        enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
      if (!((signed && (bits == 16 || bits == 8)) || unsigned8)) null
      else {
        val raw = ais.readAllBytes()
        val out =
          if (bits == 8) {
            val a = new Array[Int](raw.length)
            var i = 0
            while (i < raw.length) {
              a(i) = if (unsigned8) (raw(i) & 0xff) - 128 else raw(i).toInt
              i += 1
            }
            a
          } else {
            val n = raw.length / 2
            val a = new Array[Int](n)
            val big = fmt.isBigEndian
            var i = 0
            while (i < n) {
              val lo = raw(2 * i + (if (big) 1 else 0)) & 0xff
              val hi = raw(2 * i + (if (big) 0 else 1)).toInt
              a(i) = (hi << 8) | lo
              i += 1
            }
            a
          }
        (fmt, out)
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** REAL audio decode + feature extraction: parses the RIFF/WAV
    * container, reads the PCM samples, and reports exact INTEGER sample
    * statistics so the result is bit-stable across JVMs: (sample_rate,
    * n_channels, bits, n_samples, sum_abs, peak_abs, n_loud) with
    * `n_loud` = samples at |s| >= 16384 (upper half of 16-bit swing —
    * the clipping-risk screen). Undecodable bytes -> decode_ok = false
    * with null stats (the row survives; a curation pipeline filters on
    * decode_ok).
    *
    * Scale shape: one narrow UDF projection — decode runs data-parallel
    * on the partition holding the bytes, nothing shuffles. At 100 TB
    * the bytes column stays columnar-compressed in parquet; only the
    * (id, stats) frame moves downstream. */
  def audioStats(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val dec = udf((bytes: Array[Byte]) => {
      val decoded = decodeWav(bytes)
      if (decoded == null) None
      else {
        val (fmt, samples) = decoded
        var sumAbs = 0L
        var peak = 0
        var loud = 0L
        var i = 0
        while (i < samples.length) {
          val a = math.abs(samples(i))
          sumAbs += a
          if (a > peak) peak = a
          if (a >= 16384) loud += 1
          i += 1
        }
        Some((fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, samples.length.toLong, sumAbs,
          peak, loud))
      }
    })
    media.withColumn("__s", dec(col(bytesCol)))
      .select(col("media_id"),
        col("__s").isNotNull.as("decode_ok"),
        col("__s._1").as("sample_rate"), col("__s._2").as("n_channels"),
        col("__s._3").as("bits"), col("__s._4").as("n_samples"),
        col("__s._5").as("sum_abs"), col("__s._6").as("peak_abs"),
        col("__s._7").as("n_loud"))
  }

  /** Audio energy / silence profile over REAL WAV bytes: decode the
    * PCM samples, split into fixed `frameSamples`-sample frames (frame
    * energy = sum of |sample|, an exact integer; the trailing PARTIAL
    * frame is truncated — energies are comparable only across
    * equal-width frames), a frame is silent below `silenceBelow`.
    * Returns per input row: frames analyzed, silent count, silence
    * ratio, mean and peak energy — the trim-silence / clipping-screen
    * report. EVERY input row appears in the output (one report row per
    * input row — duplicate media_ids produce one report each): clips
    * shorter than one full frame, like undecodable bytes, report
    * n_frames = 0 / n_silent = 0 with null ratio/mean/peak.
    *
    * Scale shape: one narrow UDF projection per row — the whole
    * per-media frame fold runs inside the decode kernel where the
    * bytes already live, so nothing shuffles and no join is needed;
    * only the fixed-width (id, stats) report moves downstream. */
  def audioEnergy(media: DataFrame, frameSamples: Int = 16,
      silenceBelow: Long = 250000L): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be positive: $frameSamples")
    val dec = udf((bytes: Array[Byte]) => {
      val decoded = decodeWav(bytes)
      if (decoded == null) None
      else {
        val samples = decoded._2
        val nf = samples.length / frameSamples
        var silent = 0L
        var esum = 0L
        var peak = 0L
        var f = 0
        while (f < nf) {
          var e = 0L
          var j = 0
          while (j < frameSamples) {
            e += math.abs(samples(f * frameSamples + j))
            j += 1
          }
          if (e < silenceBelow) silent += 1
          esum += e
          if (e > peak) peak = e
          f += 1
        }
        Some((nf.toLong, silent, esum, peak))
      }
    })
    media.withColumn("__s", dec(col("bytes")))
      .select(col("media_id"),
        coalesce(col("__s._1"), lit(0L)).as("n_frames"),
        coalesce(col("__s._2"), lit(0L)).as("n_silent"),
        when(col("__s._1") > 0, round(col("__s._2").cast("double") /
          col("__s._1").cast("double"), 6)).as("silence_ratio"),
        when(col("__s._1") > 0, round(col("__s._3").cast("double") /
          col("__s._1").cast("double"), 6)).as("mean_energy"),
        when(col("__s._1") > 0, col("__s._4")).as("peak_energy"))
  }

  /** Haitsma-Kalker-style audio fingerprint (public: Haitsma & Kalker,
    * "A Highly Robust Audio Fingerprint Based On Spectral Energy
    * Differences", 2002 — here the single-band TIME-energy variant so
    * every quantity stays INTEGER-exact and oracle-mirrorable, where
    * the paper uses 33 spectral bands): split the decoded PCM into
    * `frameSamples`-sample frames (trailing partial frame truncated —
    * [[audioEnergy]]'s convention), frame energy E(f) = sum |s| (an
    * exact long), and fingerprint bit f = 1 iff E(f+1) > E(f) — the
    * energy-DELTA sign, the paper's core idea: comparisons survive any
    * monotone level transform (gain, mild compression/limiting), which
    * is what makes the bits a perceptual identity rather than a byte
    * hash. The first 64 bits pack little-endian into TWO 32-bit words
    * (fp_hi, fp_lo) — the [[SimSearch.binaryQuantize]] convention: every
    * word stays in [0, 2^32), representable and xor/bit_count-portable
    * in any engine without signed-bit-63 surprises. Clips with fewer
    * than 65 full frames report NULL words (too short to fingerprint —
    * callers filter, exactly like decode_ok); n_frames is always
    * reported. `clampAbs > 0` clamps |s| at that magnitude before the
    * energy sum — the deterministic level-compression perturbation the
    * near-dup fixture uses to prove the robustness claim.
    *
    * Scale shape: one narrow UDF projection — the whole fold runs in
    * the decode kernel where the bytes live; only the fixed-width
    * (id, words) frame moves downstream. */
  def audioFingerprint(media: DataFrame, frameSamples: Int = 16,
      clampAbs: Int = 0, bytesCol: String = "bytes"): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be positive: $frameSamples")
    val fpBits = 64
    val dec = udf((bytes: Array[Byte]) => {
      val decoded = decodeWav(bytes)
      if (decoded == null) None
      else {
        val samples = decoded._2
        val nf = samples.length / frameSamples
        val e = new Array[Long](nf)
        var f = 0
        while (f < nf) {
          var s = 0L
          var j = 0
          while (j < frameSamples) {
            var a = math.abs(samples(f * frameSamples + j))
            if (clampAbs > 0 && a > clampAbs) a = clampAbs
            s += a
            j += 1
          }
          e(f) = s
          f += 1
        }
        val fp: Option[(Long, Long)] =
          if (nf < fpBits + 1) None
          else {
            var lo = 0L
            var hi = 0L
            var b = 0
            while (b < fpBits) {
              if (e(b + 1) > e(b)) {
                if (b < 32) lo |= (1L << b) else hi |= (1L << (b - 32))
              }
              b += 1
            }
            Some((hi, lo))
          }
        Some((nf.toLong, fp.map(_._1), fp.map(_._2)))
      }
    })
    media.withColumn("__s", dec(col(bytesCol)))
      .select(col("media_id"), col("__s").isNotNull.as("decode_ok"),
        coalesce(col("__s._1"), lit(0L)).as("n_frames"),
        col("__s._2").as("fp_hi"), col("__s._3").as("fp_lo"))
  }

  /** Perceptual audio near-duplicate pairs from an [[audioFingerprint]]
    * frame — the audio twin of [[phashNearDups]], same Hamming-banded
    * LSH: the 64 fingerprint bits split into four 16-bit bands (two per
    * word); media sharing any (band_idx, band_val) become candidates,
    * verified by exact Hamming distance bit_count(hi^hi') +
    * bit_count(lo^lo') at or below `maxDist`. The 4-band pigeonhole
    * makes the join EXHAUSTIVE for maxDist <= 3 (enforced, as in the
    * image face). `maxBandFreq` drops band buckets shared by more media
    * (tone/boilerplate audio is the f^2/2-pairs regime), keeping the
    * candidate join linear. Fingerprint-less rows (decode failures,
    * sub-65-frame clips) are excluded up front.
    *
    * Scale shape: the shuffle carries (band, id, two words) rows, never
    * PCM — the capped-posting-list discipline of the dedup tier. */
  def audioNearDups(fps: DataFrame, maxDist: Int = 3,
      maxBandFreq: Int = 64): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"4x16-bit banding is only exhaustive for maxDist <= 3: $maxDist")
    val h = fps.filter(col("decode_ok") && col("fp_hi").isNotNull)
      .select(col("media_id"), col("fp_hi"), col("fp_lo"))
    val banded = h.select(col("media_id"), col("fp_hi"), col("fp_lo"),
        explode(array(
          struct(lit(0).as("band_idx"),
            col("fp_lo").bitwiseAND(lit(0xffffL)).as("band_val")),
          struct(lit(1).as("band_idx"),
            shiftright(col("fp_lo"), 16).bitwiseAND(lit(0xffffL))
              .as("band_val")),
          struct(lit(2).as("band_idx"),
            col("fp_hi").bitwiseAND(lit(0xffffL)).as("band_val")),
          struct(lit(3).as("band_idx"),
            shiftright(col("fp_hi"), 16).bitwiseAND(lit(0xffffL))
              .as("band_val")))).as("__b"))
      .select(col("media_id"), col("fp_hi"), col("fp_lo"),
        col("__b.band_idx").as("band_idx"),
        col("__b.band_val").as("band_val"))
    val capped = banded.join(
        banded.groupBy(col("band_idx"), col("band_val"))
          .agg(count(lit(1)).as("__bf")),
        Seq("band_idx", "band_val"))
      .filter(col("__bf") <= maxBandFreq)
      .select(col("band_idx"), col("band_val"), col("media_id"),
        col("fp_hi"), col("fp_lo"))
    val cand = capped
      .select(col("band_idx"), col("band_val"),
        col("media_id").as("id_a"), col("fp_hi").as("__ha"),
        col("fp_lo").as("__la"))
      .join(capped.select(col("band_idx"), col("band_val"),
        col("media_id").as("id_b"), col("fp_hi").as("__hb"),
        col("fp_lo").as("__lb")),
        Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__ha"), col("__la"),
        col("__hb"), col("__lb"))
      .distinct()
    cand
      .withColumn("dist",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))) +
          bit_count(col("__la").bitwiseXOR(col("__lb"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }

  /** Frame sampling for video-kind media: every `stride`-th frame index
    * up to n_frames — the explode side of a frame pipeline. Returns one
    * row per sampled frame. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    media
      .withColumn("meta", decodeMeta(col("bytes")))
      .filter(col("meta").isNotNull)
      .select(col("media_id"), col("kind"), col("meta"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Per-frame content digest — the FAKE sibling of a perceptual frame
    * hash (a production build decodes the frame and hashes pixels /
    * a pHash; the plan shape — narrow map per sampled frame — is
    * identical). Here frame i's "content" is the 16-char payload slice
    * at offset (i*16 mod payload), digested. */
  def frameDigest(bytes: Column, frameIdx: Column): Column = {
    val txt = bytes.cast(StringType)
    md5(txt.substr(lit(17) + (frameIdx * 16) % 256, lit(16))
      .cast(BinaryType))
  }

  /** Frame-level near-duplicate detection ACROSS media — the multimodal
    * face of the dedup tier (re-encoded/re-uploaded videos share frame
    * content even when file bytes differ): sample every `stride`-th
    * frame, digest each frame ([[frameDigest]]), and pair media by
    * frame-set Jaccard over a posting-list join on the digest.
    *
    * Scale shape: the [[graft.ext.Dedup.jaccardPairs]] shape exactly —
    * the shuffle carries (media_id, frame_digest) rows, never media
    * bytes; `maxFrameFreq` drops digests appearing in more media than
    * that (intro/logo/black frames are the boilerplate regime — a
    * frame in f media contributes f^2/2 pairs), keeping the pair join
    * linear. Returns (id_a, id_b, shared, jaccard) for pairs at or
    * above `threshold`; Jaccard is over DISTINCT sampled digests, so
    * it is exact for the sampled frame sets.
    *
    * Determinism: counts are exact integers; the Jaccard is one IEEE
    * divide. */
  def frameDupPairs(media: DataFrame, stride: Int = 4,
      threshold: Double = 0.5, maxFrameFreq: Int = 16): DataFrame = {
    val f = media.withColumn("meta", decodeMeta(col("bytes")))
      .filter(col("meta").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride)))
          .as("frame_idx"),
        col("bytes"))
      .select(col("media_id"),
        frameDigest(col("bytes"), col("frame_idx")).as("fh"))
      .distinct()
    digestJaccardPairs(f, threshold, maxFrameFreq)
  }

  /** Pair media by frame-set Jaccard over a posting-list join on a
    * per-frame digest column — the shared tail of [[frameDupPairs]]
    * (synthetic-header digests) and [[gifFrameDupPairs]] (REAL decoded
    * pixels). Input: a (media_id, fh) frame, one row per DISTINCT
    * digest per media. `maxFrameFreq` drops digests appearing in more
    * media than that (boilerplate frames are the f^2/2-pairs regime);
    * set sizes are computed over the SAME capped universe as the
    * intersection, so the ratio is a true Jaccard of the retained
    * digest sets. */
  private def digestJaccardPairs(f: DataFrame, threshold: Double,
      maxFrameFreq: Int): DataFrame = {
    val df = f.join(
      f.groupBy(col("fh")).agg(count(lit(1)).as("__df")), Seq("fh"))
      .filter(col("__df") <= maxFrameFreq)
      .select(col("fh"), col("media_id"))
    val shared = df.select(col("fh"), col("media_id").as("id_a"))
      .join(df.select(col("fh"), col("media_id").as("id_b")), Seq("fh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    val sizes = df.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    shared
      .join(sizes.select(col("media_id").as("id_a"), col("nf").as("na")),
        Seq("id_a"))
      .join(sizes.select(col("media_id").as("id_b"), col("nf").as("nb")),
        Seq("id_b"))
      .withColumn("jaccard", col("shared").cast("double")
        / (col("na") + col("nb") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"), col("jaccard"))
  }

  /** Frame-level near-duplicate detection over REAL video content:
    * decode every GIF frame ([[videoFrameStats]]), fingerprint each
    * frame by its exact pixel statistics (width:height:sum_lum:
    * n_bright — formula-mirrorable, unlike an opaque pixel hash), and
    * pair media by frame-set Jaccard through the same capped
    * posting-list join as [[frameDupPairs]]. Re-uploads (same bytes,
    * new id) share every fingerprint and pair at Jaccard 1. Undecoded
    * media contribute no frames and so never pair.
    *
    * Scale shape: decode is a narrow per-row kernel; the shuffle
    * carries (media_id, fingerprint) rows, never video bytes. */
  def gifFrameDupPairs(media: DataFrame, threshold: Double = 0.9,
      maxFrameFreq: Int = 16): DataFrame = {
    val f = videoFrameStats(media)
      .filter(col("decode_ok"))
      .select(col("media_id"),
        concat_ws(":", col("width"), col("height"), col("sum_lum"),
          col("n_bright")).as("fh"))
      .distinct()
    digestJaccardPairs(f, threshold, maxFrameFreq)
  }

  // ------------------------------------------------------------------
  // REAL video codec path (animated GIF via javax.imageio — JDK-only,
  // offline-safe). Round 8: the last fake falls. GIF is a genuine
  // multi-frame container with LZW-compressed frames, and it is
  // LOSSLESS for palettized content — a 256-level grayscale pattern
  // round-trips bit-perfectly, so the q_video_decode oracle can
  // recompute per-frame statistics from the pattern formula without
  // ever seeing the bytes, exactly like the PNG and WAV gates.
  // ------------------------------------------------------------------

  /** Deterministic grayscale video pattern: pixel (x, y) of frame f of
    * video `id` has gray level (id*31 + f*17 + x*7 + y*13) mod 256 —
    * the [[patternGray]] image formula extended with a per-frame term.
    * Dimensions and frame count derive from the id (w = id%48+8,
    * h = id%32+8, frames = id%12+2). The formula is the oracle
    * contract. */
  private def patternVideoGray(id: Long, f: Int, x: Int, y: Int): Int =
    java.lang.Math.floorMod(id * 31 + f * 17L + x * 7L + y * 13L, 256L).toInt

  private[graft] def patternFrameCount(id: Long): Int =
    java.lang.Math.floorMod(id, 12L).toInt + 2

  /** javax.imageio's DEFAULT stream cache backs every
    * ImageInputStream/ImageOutputStream with a TEMP FILE
    * (FileCacheImageInput/OutputStream) — pure disk overhead when, as
    * everywhere in this module, the source and sink are in-memory byte
    * arrays (memory caching buffers only what the reader actually
    * touches of an already-resident array). Measured on this host
    * (tools/ImageIoCacheProbe): decode 1.8x faster, encode 1.4x faster
    * with the cache off — and on hosts with slow tmp volumes the gap
    * is what confirmed the r12 opening bench's three imageio movers
    * (q_image_decode/q_image_resize/q_jpeg_decode, 2-6x over floor on
    * unchanged code, quiet sentinels). Flipped at the TOP OF EVERY
    * CODEC UDF, not in a static initializer: UDF bodies execute on
    * executors, where this object's construction-time side effects
    * may never run. Idempotent, JVM-global, thread-safe (a lone
    * volatile-free boolean write of a constant value). */
  @inline private[graft] def imageIoMemoryOnly(): Unit =
    if (javax.imageio.ImageIO.getUseCache)
      javax.imageio.ImageIO.setUseCache(false)

  /** Shared in-memory decode: cache flip + ImageIO.read over the byte
    * array; NonFatal only — an OOM/interrupt inside a task must surface
    * as a task failure, not masquerade as decode_ok=false. */
  private[graft] def decodeImage(bytes: Array[Byte])
      : java.awt.image.BufferedImage = {
    imageIoMemoryOnly()
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Fixture writer: REAL animated-GIF bytes per id — every frame
    * rendered as TYPE_BYTE_GRAY and appended with the JDK GIF writer's
    * `writeToSequence` (a true multi-image GIF stream; readers report
    * getNumImages = the frame count). One narrow UDF map; bytes never
    * shuffle. */
  /** Encode `nf` grayscale frames of `px(f, x, y)` levels as one real
    * animated GIF (shared by [[synthesizeGif]] and
    * [[synthesizeShotGif]] — one writer loop, two pattern formulas). */
  private def encodeGrayGif(w: Int, h: Int, nf: Int,
      px: (Int, Int, Int) => Int): Array[Byte] = {
    imageIoMemoryOnly()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nf) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, px(f, x, y))
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  def synthesizeGif(ids: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => {
      val w = java.lang.Math.floorMod(id, 48L).toInt + 8
      val h = java.lang.Math.floorMod(id, 32L).toInt + 8
      encodeGrayGif(w, h, patternFrameCount(id),
        (f, x, y) => patternVideoGray(id, f, x, y))
    })
    ids.select(col(idCol).cast(LongType).as("media_id"),
      lit("video").as("kind"), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  // ------------------------------------------------------------------
  // Shot-boundary detection (round 14): segment a video into SHOTS at
  // hard cuts — the first frame-TEMPORAL analysis over the real codec
  // path (q_video_decode proves decode; q_gif_frame_dedup compares
  // whole videos; this face reads the frame SEQUENCE). Threshold-on-
  // mean-luminance-delta is the classic pixel-domain cut detector
  // (Boreczky & Rowe 1996's pixel/histogram-difference family).
  // ------------------------------------------------------------------

  /** Scene length (frames per shot) of the shot fixture: 2-4. */
  private[graft] def shotSceneLen(id: Long): Int =
    java.lang.Math.floorMod(id, 3L).toInt + 2

  /** Frame count of the shot fixture: 6-15 (>= 2 scenes always). */
  private[graft] def shotFrameCount(id: Long): Int =
    java.lang.Math.floorMod(id, 10L).toInt + 6

  /** Shot-fixture gray level — scene-structured, mean-separable:
    *
    *   gray(id, f, x, y) = ((id*31 + x*7 + y*13) mod 120)
    *                     + 128 * (s mod 2) + (f*3 mod 8),  s = f / len
    *
    * Scenes alternate a dark band [0,127) and a bright band [128,255)
    * (every cut moves mean luminance by exactly 128), while the
    * (f*3 mod 8) term adds WITHIN-scene motion of mean |delta| <= 5 —
    * so a mean-delta threshold of 8 gray levels separates the two
    * regimes with margin on both sides, deterministically. A pure
    * mod-256 shift (the [[patternVideoGray]] shape) would NOT work as
    * a cut fixture: adding a constant mod 256 to a well-spread pattern
    * leaves the mean unchanged. Max level 119+128+7 = 254 < 256, so
    * the GIF round trip stays lossless and the formula IS the oracle. */
  private[graft] def shotPatternGray(id: Long, f: Int, x: Int, y: Int)
      : Int = {
    val s = f / shotSceneLen(id)
    (java.lang.Math.floorMod(id * 31 + x * 7L + y * 13L, 120L).toInt
      + 128 * (s % 2) + (f * 3) % 8)
  }

  /** Fixture writer: REAL animated-GIF bytes with scene structure —
    * [[shotPatternGray]] frames, id-derived dims (the synthesizeGif
    * cycle) and [[shotFrameCount]] frames of [[shotSceneLen]]-frame
    * scenes. */
  def synthesizeShotGif(ids: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => {
      val w = java.lang.Math.floorMod(id, 48L).toInt + 8
      val h = java.lang.Math.floorMod(id, 32L).toInt + 8
      encodeGrayGif(w, h, shotFrameCount(id),
        (f, x, y) => shotPatternGray(id, f, x, y))
    })
    ids.select(col(idCol).cast(LongType).as("media_id"),
      lit("video").as("kind"), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** Shot segmentation by hard-cut detection: decode every frame
    * ([[videoFrameStats]]), declare a CUT between consecutive frames
    * whose mean luminance moves by more than `meanDelta` gray levels,
    * and emit one row per shot: (media_id, shot_id, start_frame,
    * end_frame, n_frames). `shot_id` counts cuts before the frame, so
    * ids are 0-based and consecutive. The comparison is pure integer
    * arithmetic — |sum_lum(f) - sum_lum(f-1)| > meanDelta * w * h —
    * so the verdict is trivially bit-portable (no division, no
    * floats). Undecodable media contribute no shots (the curation
    * filter sees them via videoFrameStats' decode_ok face instead).
    *
    * Scale shape: decode is a narrow per-row kernel (bytes never
    * shuffle — only (media_id, frame stats) rows move); the lag/cumsum
    * windows partition BY MEDIA, so parallelism is per-video and a
    * shot row set is frames-bounded. A single pathologically long
    * video (10^7+ frames) would serialize inside its partition — at
    * that shape, pre-split the byte stream into overlapping segments
    * and offset frame indices (the segment seam re-joins on one lag
    * row), the standard long-media chunking. */
  def shotBoundaries(media: DataFrame, meanDelta: Int = 8,
      bytesCol: String = "bytes"): DataFrame = {
    require(meanDelta >= 1, s"meanDelta must be >= 1: $meanDelta")
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    videoFrameStats(media, bytesCol)
      .filter(col("decode_ok"))
      .withColumn("__prev", lag(col("sum_lum"), 1).over(w))
      .withColumn("__cut", (col("__prev").isNotNull &&
        abs(col("sum_lum") - col("__prev")) >
          lit(meanDelta.toLong) * col("width").cast(LongType)
            * col("height").cast(LongType)).cast("int"))
      .withColumn("shot_id", sum(col("__cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("media_id"), col("shot_id"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  /** REAL video decode + per-frame feature extraction: the JDK GIF
    * reader walks the frame sequence (`getNumImages(true)` then
    * `read(i)`) and the kernel reports exact INTEGER pixel statistics
    * per frame — (frame_idx, width, height, sum_lum, n_bright), with
    * luminance = the red channel of the palettized pixel (GIF stores a
    * palette; for grayscale content r = g = b = the original gray, so
    * the round trip is bit-perfect) and n_bright counting lum >= 128.
    * One output row per decoded frame; undecodable bytes yield a
    * single row with frame_idx = -1 and decode_ok = false (the media
    * survives for a curation filter). NonFatal-only catch, as
    * everywhere in the codec tier.
    *
    * Scale shape: one narrow UDF projection + explode of a
    * frames-bounded array — decode runs where the bytes live, only
    * (id, per-frame stats) rows move downstream. */
  def videoFrameStats(media: DataFrame, bytesCol: String = "bytes")
      : DataFrame = {
    val dec = udf((bytes: Array[Byte]) => {
      // iis/reader closed+disposed on ALL paths (success, unsupported,
      // NonFatal): with ImageIO.getUseCache() true (JDK default) each
      // ImageInputStream is a FileCacheImageInputStream backed by a temp
      // file whose cleanup otherwise waits on GC — a long run over many
      // rows would accumulate tmp files and file handles.
      val frames =
        try {
          if (bytes == null) null
          else {
            imageIoMemoryOnly()
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) null
              else {
                val reader = readers.next()
                try {
                  reader.setInput(iis, false, true)
                  val n = reader.getNumImages(true)
                  val out = new Array[(Int, Int, Int, Long, Long)](n)
                  var i = 0
                  while (i < n) {
                    val img = reader.read(i)
                    val w = img.getWidth
                    val h = img.getHeight
                    var sum = 0L
                    var bright = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        val lum = (img.getRGB(x, y) >> 16) & 0xff
                        sum += lum
                        if (lum >= 128) bright += 1
                        x += 1
                      }
                      y += 1
                    }
                    out(i) = (i, w, h, sum, bright)
                    i += 1
                  }
                  out.toSeq
                } finally reader.dispose()
              }
            } finally if (iis != null) iis.close()
          }
        } catch { case scala.util.control.NonFatal(_) => null }
      if (frames == null) Seq((-1, 0, 0, 0L, 0L)) else frames
    })
    media.withColumn("__f", explode(dec(col(bytesCol))))
      .select(col("media_id"),
        (col("__f._1") >= 0).as("decode_ok"),
        col("__f._1").as("frame_idx"), col("__f._2").as("width"),
        col("__f._3").as("height"), col("__f._4").as("sum_lum"),
        col("__f._5").as("n_bright"))
  }

  /** Resize stub over the SYNTHETIC container: recomputes metadata only
    * (the MM01 payload has no real pixels to remap); keeps the contract
    * `media -> media` with changed meta. The REAL kernel is
    * [[resizeImages]]. */
  def resize(media: DataFrame, newWidth: Int, newHeight: Int): DataFrame =
    media.withColumn("meta", decodeMeta(col("bytes")))
      .withColumn("meta", when(col("meta").isNotNull, struct(
        lit(newWidth).as("width"), lit(newHeight).as("height"),
        col("meta.n_frames").as("n_frames"), col("meta.format").as("format"))))

  /** REAL image resize: decode (any ImageIO-readable container),
    * nearest-neighbor remap to (newWidth, newHeight) — dst pixel (x, y)
    * = src(x*sw/dw, y*sh/dh), integer floor division, the one resize
    * kernel whose output is EXACTLY formula-mirrorable (no filter
    * kernel, no rounding mode ambiguity) — and re-encode as PNG
    * (lossless), band-preserving for grayscale. Undecodable bytes pass
    * through as null bytes (the row survives). `media -> media`
    * contract: same (media_id, kind, bytes) schema, so resize chains
    * with [[imageStats]] and the q_image_resize oracle can recompute
    * the resized statistics from the source pattern formula.
    *
    * Scale shape: one narrow UDF map, bytes stay on their partition. */
  def resizeImages(media: DataFrame, newWidth: Int, newHeight: Int,
      bytesCol: String = "bytes"): DataFrame = {
    require(newWidth > 0 && newHeight > 0,
      s"bad target dims: $newWidth x $newHeight")
    val rz = udf((bytes: Array[Byte]) => {
      if (bytes == null) None
      else {
        val src = decodeImage(bytes)
        if (src == null) None
        else {
          val sw = src.getWidth
          val sh = src.getHeight
          val gray =
            src.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          val dst = new java.awt.image.BufferedImage(newWidth, newHeight,
            if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < newHeight) {
            val sy = y * sh / newHeight
            var x = 0
            while (x < newWidth) {
              val sx = x * sw / newWidth
              if (gray)
                dst.getRaster.setSample(x, y, 0,
                  src.getRaster.getSample(sx, sy, 0))
              else dst.setRGB(x, y, src.getRGB(sx, sy))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Some(bos.toByteArray)
        }
      }
    })
    media.withColumn(bytesCol, rz(col(bytesCol)))
  }

  /** REAL audio resample by integer decimation: decode the WAV, keep
    * every `factor`-th sample (indices 0, factor, 2*factor, ... — the
    * one resampler whose output is EXACTLY formula-mirrorable; a
    * windowed-sinc kernel would be float-order-sensitive), re-encode as
    * 16-bit PCM WAV at sampleRate/factor. Mono input (the synthesized
    * fixture shape); undecodable or unsupported bytes pass through as
    * null bytes. `media -> media`, so it chains with [[audioStats]] /
    * [[audioEnergy]] and the q_audio_resample oracle recomputes the
    * decimated statistics from the source sample formula.
    *
    * Scale shape: one narrow UDF map, bytes stay on their partition. */
  def resampleWav(media: DataFrame, factor: Int,
      bytesCol: String = "bytes"): DataFrame = {
    require(factor >= 1, s"decimation factor must be >= 1: $factor")
    val rs = udf((bytes: Array[Byte]) => {
      val decoded = decodeWav(bytes)
      if (decoded == null) None
      else {
        val (fmt, samples) = decoded
        if (fmt.getChannels != 1) None
        else {
          val n = (samples.length + factor - 1) / factor
          val raw = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = samples(i * factor)
            raw(i * 2) = (s & 0xff).toByte
            raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val outRate = fmt.getSampleRate / factor
          val outFmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            outRate, 16, 1, 2, outRate, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), outFmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Some(bos.toByteArray)
        }
      }
    })
    media.withColumn(bytesCol, rs(col(bytesCol)))
  }

  // ------------------------------------------------------------------
  // REAL image codec path (javax.imageio — JDK-only, offline-safe).
  // The image half of the multimodal tier is no longer a fake: PNG
  // bytes are really encoded and really decoded. Audio/video keep the
  // labeled fake (no codec libs in this container).
  // ------------------------------------------------------------------

  /** Deterministic grayscale test pattern: pixel (x, y) of image `id`
    * has gray level (id*31 + x*7 + y*13) mod 256. The formula is the
    * oracle contract — PNG is lossless, so a SQL mirror of this
    * expression must reproduce [[imageStats]] EXACTLY over the real
    * encode->decode round trip; any byte the codec garbles breaks the
    * gate. Width/height derive from the id (w = id%48+8, h = id%32+8)
    * so every image has its own dimensions. */
  private def patternGray(id: Long, x: Int, y: Int): Int =
    (((id * 31 + x * 7L + y * 13L) % 256L).toInt + 256) % 256

  /** Fixture writer: REAL PNG bytes per id (BufferedImage
    * TYPE_BYTE_GRAY -> ImageIO "png"), one narrow UDF map — encoding
    * runs where the ids live, bytes never shuffle. A codec kernel is
    * the legitimate UDF case: opaque JVM work per row, nothing for
    * Catalyst to push into or through.
    *
    * `grayShift` adds a constant to every gray level (mod 256) — the
    * "re-encode with a brightness tweak" fixture the perceptual-hash
    * face pairs against the unshifted original. */
  def synthesizeImages(ids: DataFrame, idCol: String,
      grayShift: Int = 0): DataFrame = {
    val enc = udf((id: Long) => {
      imageIoMemoryOnly()
      // floorMod: a negative id must still yield positive dimensions —
      // Scala % is signed and a w <= 0 would throw inside the task
      val w = java.lang.Math.floorMod(id, 48L).toInt + 8
      val h = java.lang.Math.floorMod(id, 32L).toInt + 8
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0,
            java.lang.Math.floorMod(patternGray(id, x, y) + grayShift, 256))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    })
    ids.select(col(idCol).cast(LongType).as("media_id"),
      lit("image").as("kind"), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** Fixture writer: REAL JPEG bytes per id — the [[patternGray]]
    * pattern at the id-derived dimensions, encoded through the JDK's
    * genuine JPEG writer at an explicit `quality` (ImageWriteParam
    * MODE_EXPLICIT). Unlike PNG/WAV/GIF this codec is LOSSY, so no
    * formula oracle can pin the decoded bytes — the paired gate is
    * [[jpegDecodeGate]]'s tolerance band. One narrow UDF map; bytes
    * never shuffle. */
  def synthesizeJpegs(ids: DataFrame, idCol: String,
      quality: Float = 0.85f): DataFrame = {
    val enc = udf((id: Long) => {
      imageIoMemoryOnly()
      val w = java.lang.Math.floorMod(id, 48L).toInt + 8
      val h = java.lang.Math.floorMod(id, 32L).toInt + 8
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, patternGray(id, x, y))
          x += 1
        }
        y += 1
      }
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        wr.setOutput(ios)
        wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { ios.close(); wr.dispose() }
      bos.toByteArray
    })
    ids.select(col(idCol).cast(LongType).as("media_id"),
      lit("image").as("kind"), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** Lossy-codec round-trip gate (VERDICT r8 Next #6): encode the
    * pattern as REAL JPEG ([[synthesizeJpegs]]), REALLY decode it back
    * ([[imageStats]]), and gate what lossy compression PRESERVES —
    * dimensions and pixel count exactly (emitted raw, oracle-mirrored
    * bit-exact from the id formula), and the MEAN luminance within
    * `meanTol` gray levels of the pattern's exact mean (ok_mean; the
    * DCT quantization error is zero-mean, so per-image mean error
    * measured 0.41 worst-case at quality 0.85 across the full
    * dimension cycle — 1.5 is 3.6x that, tight enough that a wrong
    * colorspace, a double decode, or a broken quality setting all
    * blow the band). The formula mean comes from the same generator
    * expression the oracle mirrors, so a drifting generator can't
    * self-certify.
    *
    * JDK coupling (ADVICE r9 #2): unlike the PNG/WAV/GIF gates, which
    * are lossless and environment-free, the 0.41 worst case — and
    * therefore the 1.5 band — is calibrated against the JRE's own
    * `com.sun.imageio` JPEG encoder/decoder pair (measured on the
    * OpenJDK 17 line this repo builds on). A different JRE
    * vendor/version with different quantization tables or a different
    * chroma path can legitimately shift mean luminance past the band.
    * If this gate fails on a NEW JRE while the lossless gates stay
    * green, diagnose as RECALIBRATION (re-measure the worst case over
    * the dimension cycle and re-derive meanTol ~ 3-4x it), not as a
    * code regression. */
  def jpegDecodeGate(ids: DataFrame, idCol: String,
      quality: Float = 0.85f, meanTol: Double = 1.5): DataFrame = {
    val st = imageStats(synthesizeJpegs(ids, idCol, quality))
    val fsum = udf((id: Long) => {
      val w = java.lang.Math.floorMod(id, 48L).toInt + 8
      val h = java.lang.Math.floorMod(id, 32L).toInt + 8
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { s += patternGray(id, x, y); x += 1 }
        y += 1
      }
      s
    })
    st.withColumn("__fs", fsum(col("media_id")))
      .select(col("media_id"), col("decode_ok"), col("width"),
        col("height"), col("n_px"),
        (col("decode_ok") &&
          abs(col("sum_lum").cast("double") / col("n_px").cast("double") -
            col("__fs").cast("double") / col("n_px").cast("double"))
            <= lit(meanTol)).as("ok_mean"))
  }

  /** REAL image decode + feature extraction: ImageIO sniffs the
    * container (PNG/JPEG/GIF/BMP — whatever the JDK readers handle),
    * and the kernel reports exact INTEGER pixel statistics so the
    * result is bit-stable across JVMs: (width, height, n_px, sum_lum,
    * n_bright). Luminance = band 0 for single-band images, integer
    * ITU-R 601 ((299r + 587g + 114b) / 1000, truncating) for >= 3
    * bands. `n_bright` counts pixels with luminance >= 128. Undecodable
    * bytes -> null struct (the row survives; a curation pipeline
    * filters on decode_ok).
    *
    * Scale shape: one narrow UDF projection — decode runs
    * data-parallel on the partition holding the bytes, nothing
    * shuffles. At 100 TB the bytes column stays columnar-compressed in
    * parquet; only the (id, stats) frame moves downstream. */
  def imageStats(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val dec = udf((bytes: Array[Byte]) => {
      if (bytes == null) None
      else {
        val img = decodeImage(bytes)
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          val bands = raster.getNumBands
          // indexed-color images store PALETTE INDICES in the single
          // raster band — resolve through the color model (getRGB) so
          // luminance is pixel brightness, not palette order: the same
          // convention as videoFrameStats/imageDHash (r9 consistency
          // fix; identity grayscale palettes are unaffected since
          // palette[i] = (i,i,i) makes the ITU-601 mix reproduce i)
          val indexed = img.getColorModel
            .isInstanceOf[java.awt.image.IndexColorModel]
          var sum = 0L
          var bright = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val lum =
                if (indexed) {
                  val rgb = img.getRGB(x, y)
                  (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                    114 * (rgb & 0xff)) / 1000
                } else if (bands >= 3)
                  (299 * raster.getSample(x, y, 0) +
                    587 * raster.getSample(x, y, 1) +
                    114 * raster.getSample(x, y, 2)) / 1000
                else raster.getSample(x, y, 0)
              sum += lum
              if (lum >= 128) bright += 1
              x += 1
            }
            y += 1
          }
          Some((w, h, w.toLong * h, sum, bright))
        }
      }
    })
    media.withColumn("__s", dec(col(bytesCol)))
      .select(col("media_id"),
        col("__s").isNotNull.as("decode_ok"),
        col("__s._1").as("width"), col("__s._2").as("height"),
        col("__s._3").as("n_px"), col("__s._4").as("sum_lum"),
        col("__s._5").as("n_bright"))
  }

  /** 64-bit difference hash (dHash) over REAL decoded pixels: decode
    * (any ImageIO-readable container), nearest-neighbor downsample to a
    * 9-wide x 8-tall luminance grid with EXACTLY the [[resizeImages]]
    * mapping — sample (x, y) reads source pixel (x*w/9, y*h/8), integer
    * floor division, luminance per the [[imageStats]] convention — and
    * set bit (y*8 + x) iff the right neighbor is strictly brighter:
    * lum(x+1, y) > lum(x, y), x in 0..7, y in 0..7. The hash keys on
    * horizontal gradient SIGNS, so it is invariant to global brightness
    * shifts except where the shift wraps the 8-bit range — exact-byte
    * fingerprints (the [[gifFrameDupPairs]] regime) see a re-encoded
    * brightness-tweaked copy as 100% new, dHash sees it as near-identical.
    * Undecodable bytes -> decode_ok = false with a null hash.
    *
    * Scale shape: one narrow UDF projection — decode runs where the
    * bytes live; only the fixed-width (id, hash) frame moves
    * downstream. */
  def imageDHash(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val hsh = udf((bytes: Array[Byte]) => {
      if (bytes == null) None
      else {
        val img = decodeImage(bytes)
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          val bands = raster.getNumBands
          // indexed-color (palettized) images store a PALETTE INDEX in
          // the single raster band, not luminance — hashing those raw
          // samples would key on palette order, not pixel brightness.
          // Resolve through the color model via getRGB instead (the
          // videoFrameStats convention; for grayscale palettes r=g=b).
          val indexed = img.getColorModel
            .isInstanceOf[java.awt.image.IndexColorModel]
          def lum(x: Int, y: Int): Int =
            if (indexed) {
              val rgb = img.getRGB(x, y)
              (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
            } else if (bands >= 3)
              (299 * raster.getSample(x, y, 0) +
                587 * raster.getSample(x, y, 1) +
                114 * raster.getSample(x, y, 2)) / 1000
            else raster.getSample(x, y, 0)
          var hash = 0L
          var y = 0
          while (y < 8) {
            val sy = y * h / 8
            var x = 0
            while (x < 8) {
              if (lum((x + 1) * w / 9, sy) > lum(x * w / 9, sy))
                hash |= (1L << (y * 8 + x))
              x += 1
            }
            y += 1
          }
          Some(hash)
        }
      }
    })
    media.withColumn("__h", hsh(col(bytesCol)))
      .select(col("media_id"), col("__h").isNotNull.as("decode_ok"),
        col("__h").as("dhash"))
  }

  /** Perceptual near-duplicate pairs from an [[imageDHash]] frame via
    * Hamming-banded LSH: each 64-bit hash splits into four 16-bit bands;
    * media sharing any (band_idx, band_val) become candidates, verified
    * by exact Hamming distance (`bit_count(a XOR b)`) at or below
    * `maxDist`. With 4 bands the pigeonhole bound makes the band join
    * EXHAUSTIVE for maxDist <= 3 (3 flipped bits cannot touch all 4
    * bands), so the output equals the brute-force pair set — enforced by
    * the require, since a larger maxDist would silently drop pairs the
    * exact semantics include.
    *
    * Scale shape: the capped-posting-list discipline of the dedup tier —
    * the shuffle carries (band, id, hash) rows, never pixels;
    * `maxBandFreq` drops band buckets shared by more media than that
    * (flat/boilerplate imagery is the f^2/2-pairs regime), keeping the
    * candidate join linear in corpus size. */
  def phashNearDups(hashes: DataFrame, maxDist: Int = 3,
      maxBandFreq: Int = 64): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"4x16-bit banding is only exhaustive for maxDist <= 3: $maxDist")
    val h = hashes.filter(col("decode_ok"))
      .select(col("media_id"), col("dhash"))
    val banded = h.select(col("media_id"), col("dhash"),
        explode(array((0 until 4).map(b => struct(
          lit(b).as("band_idx"),
          shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xffffL))
            .as("band_val"))): _*)).as("__b"))
      .select(col("media_id"), col("dhash"),
        col("__b.band_idx").as("band_idx"), col("__b.band_val").as("band_val"))
    val capped = banded.join(
        banded.groupBy(col("band_idx"), col("band_val"))
          .agg(count(lit(1)).as("__bf")),
        Seq("band_idx", "band_val"))
      .filter(col("__bf") <= maxBandFreq)
      .select(col("band_idx"), col("band_val"), col("media_id"), col("dhash"))
    val cand = capped
      .select(col("band_idx"), col("band_val"),
        col("media_id").as("id_a"), col("dhash").as("__ha"))
      .join(capped.select(col("band_idx"), col("band_val"),
        col("media_id").as("id_b"), col("dhash").as("__hb")),
        Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__ha"), col("__hb"))
      .distinct()
    cand
      .withColumn("dist", bit_count(col("__ha").bitwiseXOR(col("__hb"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }

  /** Per-frame decode emitting BOTH the [[videoFrameStats]] statistics
    * and a per-frame 64-bit dHash in ONE pass over the bytes — the
    * fused kernel [[shotKeyframes]] needs (segmenting wants sum_lum,
    * keyframe dedup wants the hash; decoding twice would double the
    * dominant cost). Hash convention = [[imageDHash]]'s 9x8
    * nearest-neighbor grid with luminance = the red channel resolved
    * through getRGB — identical to the stats convention, and for the
    * grayscale-palette GIF fixtures r = g = b = the original gray, so
    * the formula oracle reproduces it exactly. */
  private def videoFrameDHash(media: DataFrame, bytesCol: String)
      : DataFrame = {
    val dec = udf((bytes: Array[Byte]) => {
      val frames =
        try {
          if (bytes == null) null
          else {
            imageIoMemoryOnly()
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) null
              else {
                val reader = readers.next()
                try {
                  reader.setInput(iis, false, true)
                  val n = reader.getNumImages(true)
                  val out = new Array[(Int, Int, Int, Long, Long)](n)
                  var i = 0
                  while (i < n) {
                    val img = reader.read(i)
                    val w = img.getWidth
                    val h = img.getHeight
                    def lum(x: Int, y: Int): Int =
                      (img.getRGB(x, y) >> 16) & 0xff
                    var sum = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) { sum += lum(x, y); x += 1 }
                      y += 1
                    }
                    var hash = 0L
                    var gy = 0
                    while (gy < 8) {
                      val sy = gy * h / 8
                      var gx = 0
                      while (gx < 8) {
                        if (lum((gx + 1) * w / 9, sy) > lum(gx * w / 9, sy))
                          hash |= (1L << (gy * 8 + gx))
                        gx += 1
                      }
                      gy += 1
                    }
                    out(i) = (i, w, h, sum, hash)
                    i += 1
                  }
                  out.toSeq
                } finally reader.dispose()
              }
            } finally if (iis != null) iis.close()
          }
        } catch { case scala.util.control.NonFatal(_) => null }
      if (frames == null) Seq((-1, 0, 0, 0L, 0L)) else frames
    })
    media.withColumn("__f", explode(dec(col(bytesCol))))
      .select(col("media_id"),
        (col("__f._1") >= 0).as("decode_ok"),
        col("__f._1").as("frame_idx"), col("__f._2").as("width"),
        col("__f._3").as("height"), col("__f._4").as("sum_lum"),
        col("__f._5").as("dhash"))
  }

  /** Per-shot keyframe selection + cross-video keyframe dedup
    * (VERDICT r14 Next #6) — the bridge the video tier lacked:
    * [[shotBoundaries]] segments, [[imageDHash]]'s grid hashes, and
    * the [[phashNearDups]] banding compose into "which shots across
    * the corpus show the same (near-)static content".
    *
    *  1. Segment: the shotBoundaries lag/cut/cumsum chain, windows
    *     partitioned per media id (no global window anywhere).
    *  2. Keyframe per shot: the most STATIC frame — minimum
    *     |sum_lum - prev| among frames with an in-shot predecessor
    *     (frame-index tie-break); a single-frame shot keys on its only
    *     frame. Hard-cut frames never qualify (their delta crosses the
    *     cut and is set null), so the pick is within-shot by
    *     construction.
    *  3. Dedup ACROSS videos: keyframe hashes enter the 4x16-bit
    *     Hamming banding (exhaustive for maxDist <= 3, hot buckets
    *     capped); dup_root = the least (media_id * 1000 + shot_id) key
    *     among a keyframe's matched partners and itself — exact star
    *     grouping on the banded pair set, deterministic without a
    *     connected-components pass.
    *
    * Scale shape: one narrow decode projection (bytes never shuffle),
    * per-media windows, then the capped band join over fixed-width
    * (key, hash) rows — the phashNearDups discipline; output is
    * shots-bounded, frames never leave their executor.
    *
    * Determinism: integer sums, integer deltas, total-ordered picks,
    * and a min-reduction over pairs — bit-portable end to end. */
  def shotKeyframes(media: DataFrame, meanDelta: Int = 8,
      maxDist: Int = 3, maxBandFreq: Int = 64,
      bytesCol: String = "bytes"): DataFrame = {
    require(meanDelta >= 1, s"meanDelta must be >= 1: $meanDelta")
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val framed = videoFrameDHash(media, bytesCol)
      .filter(col("decode_ok"))
      .withColumn("__prev", lag(col("sum_lum"), 1).over(w))
      .withColumn("__cut", (col("__prev").isNotNull &&
        abs(col("sum_lum") - col("__prev")) >
          lit(meanDelta.toLong) * col("width").cast(LongType)
            * col("height").cast(LongType)).cast("int"))
      .withColumn("shot_id", sum(col("__cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__is_start",
        col("__prev").isNull || col("__cut") === 1)
      .withColumn("__din", when(!col("__is_start"),
        abs(col("sum_lum") - col("__prev"))))
    val kw = Window.partitionBy(col("media_id"), col("shot_id"))
      .orderBy(col("__is_start").asc, col("__din").asc_nulls_last,
        col("frame_idx").asc)
    val keyframes = framed
      .withColumn("__rn", row_number().over(kw))
      .filter(col("__rn") === 1)
      .select(col("media_id"), col("shot_id"),
        col("frame_idx").as("keyframe"), col("dhash"))
    val hashed = keyframes.select(
      (col("media_id") * 1000 + col("shot_id")).as("media_id"),
      lit(true).as("decode_ok"), col("dhash"))
    val pairs = phashNearDups(hashed, maxDist, maxBandFreq)
    val sym = pairs.select(col("id_a").as("k"), col("id_b").as("p"))
      .unionByName(pairs.select(col("id_b").as("k"), col("id_a").as("p")))
      .groupBy(col("k")).agg(min(col("p")).as("__minp"))
    keyframes
      .withColumn("__k", col("media_id") * 1000 + col("shot_id"))
      .join(sym, col("__k") === col("k"), "left")
      .select(col("media_id"), col("shot_id"), col("keyframe"),
        least(coalesce(col("__minp"), col("__k")), col("__k"))
          .as("dup_root"))
  }
}
