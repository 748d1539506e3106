package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** r13 slope rehearsal for the exact token-run substring family
  * (VERDICT r12 Next #6's "documented 100x shuffle shape"):
  * substringDedup (pairs + extents) and substringDupCoverage (per-doc
  * policy statistic) at 1x/10x/100x of the sf0.1 document corpus
  * (5k/50k/500k docs), per-stage wall + shuffle bytes from the
  * stage-metrics listener — the MultimodalScaleProbe methodology.
  *
  * Replica corpus: factor x id-shifted copies with a REPLICA-TAG token
  * appended to the text (`text || " repN"`), so replicas are
  * near-exact: every interior L-gram window is verbatim-shared across
  * the whole replica family. That makes the corpus deliberately
  * duplicate-heavy — at factor >= cap the frequency guard (maxBucket
  * 64) crops family buckets exactly as it crops boilerplate in
  * production (the image/audio rehearsals' standing finding; remedy =
  * exact-dedup first), so the f100 row is measured BOTH at the
  * production cap (guard behavior) and at a raised cap (full verify
  * work). Usage: SCALE_FACTOR=N [MAX_BUCKET=M] runMain. */
object SubstringScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "1").toInt
    val maxBucket = sys.env.getOrElse("MAX_BUCKET", "64").toInt
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

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs =
      if (factor <= 1) base
      else base
        .withColumn("r", explode(sequence(lit(0), lit(factor - 1))))
        .select((col("doc_id") + col("r") * lit(10000000000L)).as("doc_id"),
          concat(col("text"), lit(" rep"), col("r").cast("string"))
            .as("text"))
        .repartition(cpus.toInt)
    docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()

    def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0
    def stage(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val w0 = lsn.written; val r0 = lsn.read
      val t0 = System.nanoTime()
      val rows = f.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stage":"$name","factor":$factor,"max_bucket":$maxBucket,""" +
        f""""docs":$n,"rows_out":$rows,"sec":$sec%.2f,""" +
        f""""shuffle_write_mb":${mb(lsn.written - w0)}%.3f,""" +
        f""""shuffle_read_mb":${mb(lsn.read - r0)}%.3f}""")
    }

    stage("substring_runs") {
      Dedup.substringDedup(docs, "doc_id", "text",
        minRun = 20, maxBucket = maxBucket)
    }
    // r14: coverage now merges run ENDPOINTS (VERDICT r13 Next #5) —
    // the r13 form exploded one row per covered token (~1.4B rows at
    // cap 2048 f100, which forced SKIP_COVERAGE); the interval-merge
    // form is measurable at every cap
    if (!sys.env.get("SKIP_COVERAGE").contains("1"))
      stage("dup_coverage") {
        Dedup.substringDupCoverage(docs, "doc_id", "text",
          minRun = 20, maxBucket = maxBucket)
          .filter(col("verdict") =!= "keep")
      }
    // r14 (VERDICT r13 Next #4): the span-removal TRANSFORM — run
    // frame + endpoint interval merge + per-doc token-array filter
    if (!sys.env.get("SKIP_REMOVAL").contains("1"))
      stage("span_removal") {
        Dedup.removeDuplicatedSpans(docs, "doc_id", "text",
          minRun = 20, maxBucket = maxBucket)
          .filter(col("n_removed_tokens") > 0)
      }
    // r14 (VERDICT r13 Next #7): crawl-step incremental runs — a 2%
    // batch of shifted verbatim copies probes the indexed corpus's
    // postings; cost must scale with the BATCH, not the index
    if (!sys.env.get("SKIP_INCREMENTAL").contains("1"))
      stage("incremental_runs") {
        val batch = docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 77000000000L).as("doc_id"), col("text"))
        Dedup.incrementalSubstringRuns(docs, batch, "doc_id", "text",
          minRun = 20, maxBucket = maxBucket)
      }
    spark.stop()
  }
}
