package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ext.Multimodal

/** r12 stretch rehearsal (VERDICT r11 Next #7): the multimodal tier's
  * 100x scale story — the one extension family without a committed
  * slope file. The composed image-curation chain

  *   synthesize (encode PNGs) -> decode+stats -> dHash -> Hamming-band
  *   near-dup -> resize survivors
  *
  * runs at 1x/10x/100x of the sf0.1 document-id corpus with per-stage
  * wall and shuffle read/write bytes from a stage-metrics listener —
  * the evidence for the tier's standing claim that BYTES NEVER SHUFFLE
  * (every codec is a narrow map over the scan; only the fixed-width
  * (id, hash/stats) frames and the banded (band, id, hash) posting
  * rows ever cross an exchange, so the 100 TB shuffle bill is
  * independent of image size).
  *
  * Replica corpus: factor x id-shifted copies (id + r*1e10). The
  * synthetic generators derive dims and pixels from the id, so
  * replicas are distinct images in the same statistical family; the
  * near-dup stage keeps its own base-rate via the maxBandFreq cap
  * (flat/boilerplate buckets are dropped exactly as in production).
  *
  * Usage: SCALE_FACTOR=N runMain graft.tools.MultimodalScaleProbe
  * [sfDir] — one JSON line per stage. */
object MultimodalScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "1").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    object lsn extends SparkListener {
      @volatile var written = 0L
      @volatile var read = 0L
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          written += m.shuffleWriteMetrics.bytesWritten
          read += m.shuffleReadMetrics.totalBytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(lsn)

    val baseIds = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    val ids =
      if (factor <= 1) baseIds
      else baseIds
        .withColumn("r", explode(sequence(lit(0), lit(factor - 1))))
        .select((col("doc_id") + col("r") * lit(10000000000L)).as("doc_id"))
        // spread replicas across partitions so the 100x run is not a
        // 32-partition explode hotspot (production ids arrive spread)
        .repartition(cpus.toInt)

    def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0
    var cur: DataFrame = ids.persist(StorageLevel.MEMORY_AND_DISK)
    var rowsIn = cur.count()
    def stage(name: String)(f: DataFrame => DataFrame): Unit = {
      val w0 = lsn.written; val r0 = lsn.read
      val t0 = System.nanoTime()
      val out = f(cur).persist(StorageLevel.MEMORY_AND_DISK)
      val rowsOut = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stage":"$name","factor":$factor,"rows_in":$rowsIn,""" +
        f""""rows_out":$rowsOut,"sec":$sec%.2f,""" +
        f""""shuffle_write_mb":${mb(lsn.written - w0)}%.3f,""" +
        f""""shuffle_read_mb":${mb(lsn.read - r0)}%.3f}""")
      cur.unpersist(false)
      cur = out
      rowsIn = rowsOut
    }

    var media: DataFrame = null
    stage("synthesize_png") { df =>
      media = Multimodal.synthesizeImages(df, "doc_id")
      media
    }
    stage("decode_stats") { _ => Multimodal.imageStats(media) }
    var hashes: DataFrame = null
    stage("dhash") { _ =>
      hashes = Multimodal.imageDHash(media); hashes
    }
    // MAX_BAND_FREQ: the replica corpus is pathologically duplicate-
    // heavy (the id-derived image pattern cycles, so 100x piles ~100s
    // of copies onto each distinct image); at the production default 64
    // the frequency guard correctly EXCLUDES every bucket (boilerplate
    // regime) and the stage measures nothing — raise the cap to make
    // the 100x near-dup join do real work for the slope measurement.
    val maxBandFreq =
      sys.env.getOrElse("MAX_BAND_FREQ", "64").toInt
    var dupIds: DataFrame = null
    stage("neardup_band_join") { _ =>
      val pairs = Multimodal.phashNearDups(hashes,
        maxDist = 3, maxBandFreq = maxBandFreq)
      dupIds = pairs.select(col("id_b").as("media_id")).distinct()
      dupIds
    }
    stage("resize_survivors") { _ =>
      Multimodal.resizeImages(
        media.join(dupIds, Seq("media_id"), "left_anti"), 16, 16)
    }
    // r12 audio twin: synthesize WAVs for the same id corpus, H-K
    // fingerprint (4-sample frames so most clips qualify), band-join
    // near-dup — the same bytes-never-shuffle claim, audio edition.
    // r13 (VERDICT r12 Next #7): the VARIED generator — the oracle
    // fixture's global cycle made every clip a phase slice of one
    // sequence, so f100's guard excluded every bucket and the verify
    // stage measured nothing; id-derived frequencies + replica-keyed
    // perturbation make replica families genuine near-dup clusters.
    var wav: DataFrame = null
    stage("audio_synthesize_wav") { _ =>
      wav = Multimodal.synthesizeWavVaried(ids, "doc_id"); wav
    }
    var fps: DataFrame = null
    stage("audio_fingerprint") { _ =>
      fps = Multimodal.audioFingerprint(wav, frameSamples = 4); fps
    }
    stage("audio_neardup_band_join") { _ =>
      Multimodal.audioNearDups(fps, maxDist = 3,
        maxBandFreq = maxBandFreq)
    }
    spark.stop()
  }
}
