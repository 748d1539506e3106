package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming state-store scale probe (VERDICT r3 "Next round" #7): runs
  * the sessionization face (the heaviest stateful operator — arbitrary
  * state via flatMapGroupsWithState) under the production-shape RocksDB
  * state store at 1x and FACTORx replayed event volume, and reports the
  * state operator's own metrics from `StreamingQueryProgress`.
  *
  * The claim under test: state rows track ACTIVE KEYS (open sessions),
  * not stream length. The FACTORx replay multiplies the event count for
  * the SAME user population inside the same time horizon (replica r
  * shifts event ids by r*10^10 and event time by r seconds), so if
  * state is truly keyed-and-evicted, `numRowsTotal` must stay ~flat
  * while input rows grow FACTORx. A state store that grew with stream
  * length would show up immediately here.
  *
  * RocksDB specifics: the provider is exercised for real (changelog
  * files, memtable/SST accounting); `memoryUsedBytes` under RocksDB
  * reports the native allocator's working set, and the custom metrics
  * carry SST sizes. Recorded in SCALE.md.
  *
  * Usage: runMain graft.tools.StateStoreProbe [baseDir]
  * Env: STATE_FACTOR (10), SPARK_GRAFT_CPUS (8).
  */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("STATE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // base events with real timestamps (ts normalized per fixture vintage)
    val base = graft.io.Sources.eventsTable(spark, baseDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val activeUsers = base.filter(col("user_id") % 50 === 0)
      .select(col("user_id")).distinct().count()

    def staged(f: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_stateprobe_${f}x").toString
      val replicas = (0 until f).map { r =>
        base.withColumn("event_id", col("event_id") + lit(r * 10000000000L))
          .withColumn("ts",
            col("ts") + expr(s"INTERVAL $r SECOND"))
      }
      replicas.reduce(_ unionByName _).write.mode("overwrite").parquet(dir)
      dir
    }

    def run(f: Int): Unit = {
      val dir = staged(f)
      val schema = spark.read.parquet(dir).schema
      val inputRows = spark.read.parquet(dir)
        .filter(col("user_id") % 50 === 0).count()
      val typed = spark.readStream.schema(schema).parquet(dir)
        .filter(col("user_id") % 50 === 0)
        .select(col("user_id"), col("ts"),
          coalesce(col("value"), lit(0.0)).as("value"))
        .withWatermark("ts", "2 hours")
        .as[graft.streaming.StreamProfile.UserEvent]
      val sess = graft.streaming.StreamProfile
        .streamingSessions(typed, gapMinutes = 30)
      val sink = s"stateprobe_${f}x"
      val q = sess.toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val ops = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      val maxRows = if (ops.isEmpty) -1L else ops.map(_.numRowsTotal).max
      val maxMem = if (ops.isEmpty) -1L else ops.map(_.memoryUsedBytes).max
      val emitted = spark.table(sink).count()
      println(s"""[stateprobe] {"factor":$f,"input_rows":$inputRows,""" +
        s""""active_users":$activeUsers,"max_state_rows":$maxRows,""" +
        s""""max_state_mem_bytes":$maxMem,"sessions_emitted":$emitted}""")
    }

    run(1)
    run(factor)
    spark.stop()
  }
}
