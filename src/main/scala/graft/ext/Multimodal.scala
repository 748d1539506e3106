package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed in batched per-partition passes.
  *
  * Codec honesty ledger: the IMAGE path is REAL — [[synthesizeImages]]
  * encodes and [[imageStats]] decodes actual PNG bytes via
  * `javax.imageio` (JDK-only, works offline), oracle-checked through a
  * genuine encode->decode round trip. Audio resample and video
  * frame-split codecs are NOT in this offline container — those decode
  * kernels are clearly-marked deterministic FAKEs (parse our own
  * synthetic header). Everything around them is the real Spark shape:
  * schema, partition-sized batching, pure-function kernels, no driver
  * collects, binary never shuffled except by explicit repartition.
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

  /** Audio energy / silence profile — the FAKE sibling of a PCM energy
    * pass (a production build decodes real samples; the plan shape —
    * explode fixed-size frames, fold a per-frame energy, aggregate per
    * media — is identical). Here each payload hex char stands in for a
    * 4-bit sample: frame energy = sum of the char values over a
    * `frameChars` window, a frame is silent below `silenceBelow`.
    * Returns per media: frames analyzed, silent count, silence ratio,
    * mean and peak energy — the trim-silence / clipping-screen report.
    * EVERY input media id appears in the output: media whose payload
    * is shorter than one full frame report n_frames = 0 / n_silent = 0
    * with null ratio/mean/peak (a caller joining the report back never
    * sees missing rows). The trailing PARTIAL frame is truncated —
    * energies are comparable only across equal-width frames, so a
    * short tail would skew the silence threshold; callers needing
    * tail coverage should pad the payload to a frame multiple first.
    *
    * Scale shape: narrow explode (bounded by payload/frameChars per
    * media) + a codegen'd HOF fold per frame + one map-side-combined
    * groupBy on media_id + one id-keyed left join back to the input id
    * frame (bytes never ride into it); audio bytes never shuffle —
    * only (media_id, energy) rows do. */
  def audioEnergy(media: DataFrame, frameChars: Int = 16,
      silenceBelow: Int = 100): DataFrame = {
    require(frameChars > 0, s"frameChars must be positive: $frameChars")
    val payload = substring(col("bytes").cast(StringType), 17, 1000000)
    val frames = media
      .select(col("media_id"), payload.as("p"))
      .filter(length(col("p")) >= frameChars)
      .select(col("media_id"), col("p"),
        explode(sequence(lit(0),
          floor(length(col("p")) / lit(frameChars)).cast("int") - 1))
          .as("f"))
    val energy = aggregate(
      transform(sequence(lit(1), lit(frameChars)),
        j => conv(col("p").substr(col("f") * frameChars + j, lit(1)),
          16, 10).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val report = frames.withColumn("e", energy)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("e") < silenceBelow, 1L).otherwise(0L))
          .as("n_silent"),
        sum(col("e")).as("esum"),
        max(col("e")).as("peak_energy"))
      .select(col("media_id"), col("n_frames"), col("n_silent"),
        round(col("n_silent").cast("double") /
          col("n_frames").cast("double"), 6).as("silence_ratio"),
        round(col("esum").cast("double") /
          col("n_frames").cast("double"), 6).as("mean_energy"),
        col("peak_energy"))
    media.select(col("media_id"))
      .join(report, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("n_silent"), lit(0L)).as("n_silent"),
        col("silence_ratio"), col("mean_energy"), col("peak_energy"))
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
    val df = f.join(
      f.groupBy(col("fh")).agg(count(lit(1)).as("__df")), Seq("fh"))
      .filter(col("__df") <= maxFrameFreq)
      .select(col("fh"), col("media_id"))
    val shared = df.select(col("fh"), col("media_id").as("id_a"))
      .join(df.select(col("fh"), col("media_id").as("id_b")), Seq("fh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    // sizes over the SAME capped universe as the intersection, so the
    // ratio is a true Jaccard of the retained digest sets
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

  /** Resize stub: recomputes metadata only (a real kernel would remap
    * payload bytes); keeps the contract `media -> media` with changed
    * meta. */
  def resize(media: DataFrame, newWidth: Int, newHeight: Int): DataFrame =
    media.withColumn("meta", decodeMeta(col("bytes")))
      .withColumn("meta", when(col("meta").isNotNull, struct(
        lit(newWidth).as("width"), lit(newHeight).as("height"),
        col("meta.n_frames").as("n_frames"), col("meta.format").as("format"))))

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
    * Catalyst to push into or through. */
  def synthesizeImages(ids: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => {
      val w = (id % 48 + 8).toInt
      val h = (id % 32 + 8).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, patternGray(id, x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    })
    ids.select(col(idCol).cast(LongType).as("media_id"),
      lit("image").as("kind"), enc(col(idCol).cast(LongType)).as("bytes"))
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
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Throwable => null }
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          val bands = raster.getNumBands
          var sum = 0L
          var bright = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val lum =
                if (bands >= 3)
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
}
