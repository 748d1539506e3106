package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ext.{Dedup, Packing, TextStats}

/** r11 stretch rehearsal (VERDICT r10 Next #7): the full curation
  * funnel — cheap quality/language filter, exact dedup, MinHash
  * near-dup removal, 13-gram Bloom decontamination, greedy sequence
  * packing — run as ONE COMPOSED pipeline (each stage consumes the
  * previous stage's survivors) at 1x/10x/100x of the sf0.1 document
  * corpus, with per-stage wall AND shuffle read/write bytes from a
  * stage-metrics listener. Per-operator decade slopes exist in SCALE.md
  * since r8; this is the COMPOSITION story — where the bytes actually
  * move when the stages chain, the closest local[32] gets to the 100 TB
  * deployment shape.
  *
  * Replica corpus: factor x id-shifted copies with the word sequence
  * PERMUTED per replica — each word keyed by xxhash64(word, replica)
  * and array_sorted, a deterministic shuffle. The word MULTISET is
  * unchanged (quality/langid verdicts match the base corpus) but the
  * 3-shingle set is destroyed, so replicas are NOT near-dups of each
  * other and the dup rate stays the corpus's own at every factor. (The
  * first cut of this probe ROTATED the words instead; rotation
  * preserves all but ~4 shingles, Jaccard ~ 1, and the near-dup stage
  * collapsed 43k docs to 5k at 10x — every downstream stage then saw
  * 1x work and the rehearsal measured nothing.) Replica 0 is the
  * identity, so benchmark overlap (decontamination) persists. */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "1").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // cumulative shuffle-byte counters; per-stage numbers are deltas
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

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus =
      if (factor <= 1) base
      else base
        .withColumn("r", explode(sequence(lit(0), lit(factor - 1))))
        .withColumn("w", split(col("text"), "\\s+"))
        .withColumn("p", array_sort(transform(col("w"), x =>
          struct(xxhash64(x, col("r")).as("k"), x.as("v")))))
        .select(
          (col("doc_id") + col("r") * lit(10000000000L)).as("doc_id"),
          when(col("r") === 0, col("text"))
            .otherwise(array_join(
              transform(col("p"), s => s.getField("v")), " "))
            .as("text"))
    // benchmark set fixed across factors: 50 verbatim base docs
    val bench = base.orderBy(col("doc_id")).limit(50)
      .persist(StorageLevel.MEMORY_AND_DISK)
    bench.count()

    var cur = corpus.persist(StorageLevel.MEMORY_AND_DISK)
    var rowsIn = cur.count() // materialize input OUTSIDE the first stage
    def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0
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

    stage("quality_lang_filter") { df =>
      // FUSED=0 runs the original two-op composition for A/B
      val scored =
        if (sys.env.get("FUSED").contains("0"))
          TextStats.withLangId(TextStats.qualityScore(df, "text"), "text")
        else TextStats.qualityLangScore(df, "text")
      scored
        .filter(col("quality_score") >= 0.6 && col("predicted") === "en")
        .select(col("doc_id"), col("text"))
    }
    stage("exact_dedup") { df =>
      val keep = Dedup.exactByFingerprint(df, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      df.join(keep, Seq("doc_id"), "left_semi")
    }
    stage("neardup_minhash") { df =>
      val drop = Dedup.nearDuplicates(df, "doc_id", "text",
        threshold = 0.5, shingleN = 3, k = 16, bands = 4, maxBucket = 64)
        .select(col("id_b").as("doc_id")).distinct()
      df.join(drop, Seq("doc_id"), "left_anti")
    }
    stage("decontaminate_bloom") { df =>
      val hits = Dedup.decontaminateBloom(df, "doc_id", "text",
        bench, "text", n = 13)
        .select(col("id").as("doc_id"))
      df.join(hits, Seq("doc_id"), "left_anti")
    }
    stage("pack_sequences") { df =>
      Packing.packSequences(df, "doc_id", "text",
        contextLen = 2048, buckets = 64)
    }
    spark.stop()
  }
}
