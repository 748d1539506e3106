package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamProfile

class StreamProfileSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class KV(k: String)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  test("streaming hourly profile: watermark finalizes windows, drops late data") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamProfile.hourlyProfile(input.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("hp")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:15:00"), 2, "click", 2.0))
      q.processAllAvailable()
      // advance event time far enough that the 10:00 window finalizes
      input.addData(Ev(3, ts("2024-01-01 13:00:00"), 1, "view", 5.0))
      q.processAllAvailable()
      // a late event behind the watermark must be dropped
      input.addData(Ev(4, ts("2024-01-01 10:30:00"), 3, "click", 100.0))
      q.processAllAvailable()
      input.addData(Ev(5, ts("2024-01-01 16:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hp").collect()
        .map(r => (r.getAs[Timestamp]("hour").toString, r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)),
        s"10:00 click window finalized without the late event: ${rows.mkString("; ")}")
      assert(!rows.exists(_._4 == 100.0), "late event must not appear")
    } finally q.stop()
  }

  test("stream-static enrichment: per-batch dim join, matches the batch equivalent") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val input = MemoryStream[Ev]
    val agg = StreamProfile.enrichEvents(input.toDF(), dim, "user_id", "cust_id")
      .groupBy($"tier")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
    val q = agg.writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 10.0),
        Ev(2, ts("2024-01-01 10:01:00"), 2, "click", 5.0),
        Ev(3, ts("2024-01-01 10:02:00"), 1, "view", 2.0),
        Ev(4, ts("2024-01-01 10:03:00"), 9, "view", 99.0)) // no dim row -> dropped
      q.processAllAvailable()
      val rows = spark.table("enrich")
        .as[(String, Long, Double)].collect()
        .map { case (k, n, t) => k -> ((n, t)) }.toMap
      assert(rows == Map("gold" -> ((2L, 12.0)), "basic" -> ((1L, 5.0))),
        s"got $rows")
    } finally q.stop()
  }

  test("stream-stream interval join: matches within the window, none outside") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val v = views.toDF().select($"user_id".as("v_user"), $"ts".as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val c = clicks.toDF().select($"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val q = StreamProfile.intervalJoin(v, c, "v_user", "c_user",
      "v_ts", "c_ts", withinMinutes = 30)
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0),
        Ev(2, ts("2024-01-01 10:00:00"), 2, "view", 0))
      clicks.addData(
        Ev(3, ts("2024-01-01 10:10:00"), 1, "click", 0), // in window
        Ev(4, ts("2024-01-01 10:45:00"), 1, "click", 0), // outside 30 min
        Ev(5, ts("2024-01-01 09:50:00"), 2, "click", 0), // before the view
        Ev(6, ts("2024-01-01 10:20:00"), 3, "click", 0)) // no such user
      q.processAllAvailable()
      val got = spark.table("ssj")
        .select($"v_user", $"c_ts".cast("string")).as[(Long, String)]
        .collect().toSet
      assert(got == Set((1L, "2024-01-01 10:10:00")),
        s"exactly the in-window same-user pair must match, got $got")
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicate ids, state evicts") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamProfile.dedupEvents(input.toDF(), Seq("event_id"),
      watermark = "1 hour")
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(1, ts("2024-01-01 10:00:30"), 1, "click", 1.0), // retransmission
        Ev(2, ts("2024-01-01 10:05:00"), 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(Ev(1, ts("2024-01-01 10:10:00"), 1, "click", 1.0)) // dup again
      q.processAllAvailable()
      // advance the watermark past the horizon, then the SAME id is new
      input.addData(Ev(3, ts("2024-01-01 14:00:00"), 1, "view", 3.0))
      q.processAllAvailable()
      input.addData(Ev(1, ts("2024-01-01 14:05:00"), 1, "click", 9.0))
      q.processAllAvailable()
      val ids = spark.table("dd").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      assert(ids.count(_._1 == 1L) == 2, // once per watermark horizon
        s"expected the duplicate id once per horizon: ${ids.mkString("; ")}")
      assert(ids.count(_._1 == 2L) == 1 && ids.count(_._1 == 3L) == 1)
    } finally q.stop()
  }

  test("streaming sessionization emits closed sessions via event-time timeout") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamProfile.UserEvent]
    val sessions = StreamProfile.streamingSessions(
      input.toDS().withWatermark("ts", "10 minutes")
        .as[StreamProfile.UserEvent], gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("ss")
      .outputMode(OutputMode.Append).start()
    try {
      // session 1: two events 5 min apart
      input.addData(
        StreamProfile.UserEvent(1, ts("2024-01-01 10:00:00"), 1.0),
        StreamProfile.UserEvent(1, ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("ss").count() == 0, "session still open")
      // an event 2 hours later closes session 1 immediately (gap rule)
      input.addData(StreamProfile.UserEvent(1, ts("2024-01-01 12:00:00"), 5.0))
      q.processAllAvailable()
      val afterGap = spark.table("ss").collect()
      assert(afterGap.length == 1)
      assert(afterGap(0).getAs[Long]("n_events") == 2)
      assert(afterGap(0).getAs[Double]("total_value") == 3.0)
      assert(afterGap(0).getAs[java.sql.Timestamp]("session_end")
        == ts("2024-01-01 10:05:00"))
      // push the watermark far past 12:00 + gap -> timeout closes session 2
      input.addData(StreamProfile.UserEvent(2, ts("2024-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(StreamProfile.UserEvent(2, ts("2024-01-01 16:00:00"), 0.0))
      q.processAllAvailable()
      val all = spark.table("ss").collect()
      assert(all.exists(r => r.getAs[Long]("user_id") == 1 &&
        r.getAs[Long]("n_events") == 1 &&
        r.getAs[Double]("total_value") == 5.0), s"timed-out session: ${all.mkString(";")}")
    } finally q.stop()
  }

  test("late in-watermark event extends the open session's START (no frankenstein bounds)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamProfile.UserEvent]
    val q = StreamProfile.streamingSessions(
      input.toDS().withWatermark("ts", "2 hours")
        .as[StreamProfile.UserEvent], gapMinutes = 30)
      .writeStream.format("memory").queryName("ss_late")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(StreamProfile.UserEvent(1, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // late event 10 min EARLIER, inside the watermark: must merge and
      // pull session_start back
      input.addData(StreamProfile.UserEvent(1, ts("2024-01-01 09:50:00"), 2.0))
      q.processAllAvailable()
      // far-future event closes the session via the gap rule
      input.addData(StreamProfile.UserEvent(1, ts("2024-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ss_late").collect()
      val s = rows.find(_.getAs[Long]("n_events") == 2)
      assert(s.isDefined, s"merged session expected: ${rows.mkString(";")}")
      assert(s.get.getAs[java.sql.Timestamp]("session_start") == ts("2024-01-01 09:50:00"))
      assert(s.get.getAs[java.sql.Timestamp]("session_end") == ts("2024-01-01 10:00:00"))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user stats") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamProfile.UserEvent]
    val q = StreamProfile.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("us")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        StreamProfile.UserEvent(1, ts("2024-01-01 10:00:00"), 2.0),
        StreamProfile.UserEvent(1, ts("2024-01-01 10:01:00"), 3.0),
        StreamProfile.UserEvent(2, ts("2024-01-01 10:02:00"), 7.0))
      q.processAllAvailable()
      input.addData(StreamProfile.UserEvent(1, ts("2024-01-01 10:05:00"), 5.0))
      q.processAllAvailable()
      val byUser = spark.table("us").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
        .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(byUser(1L) == ((1L, 3L, 10.0))) // state carried across batches
      assert(byUser(2L) == ((2L, 1L, 7.0)))
    } finally q.stop()
  }

  test("streaming drift monitor is bit-identical to the batch report") {
    // the contract: the stream maintains exact decimal sufficient stats,
    // so the live monitor and the nightly batch CANNOT disagree
    val dir = "/root/testdata/sf0.001"
    def rows(name: String) = SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val stream = rows("q_stream_drift")
    val batch = rows("q_embed_drift")
    assert(stream.nonEmpty && stream == batch)
  }

  test("crawlDedupStream: evolving index catches dups of earlier-batch SURVIVORS") {
    val sparkSession = spark
    import sparkSession.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_crawl_spec")
    val inDir = base.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    val tA = "alpha beta gamma delta epsilon zeta"
    val tB = "one two three four five six seven"
    val crawls = Seq(
      Seq((3L, tA)),                         // crawl 0 seeds the index
      Seq((4L, tA), (7L, tB)),               // 4 dups the index; 7 survives
      Seq((5L, tB), (8L, tA)))               // 5 dups SURVIVOR 7; 8 dups 3
    crawls.zipWithIndex.foreach { case (rows, c) =>
      val stage = base.resolve(s"stage_$c")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = inDir.resolve(s"crawl_$c.parquet")
      java.nio.file.Files.move(part, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + c * 60000L))
    }
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val pairsOut = base.resolve("pairs").toString
    StreamProfile.crawlDedupStream(stream, "doc_id", "text", pairsOut)
    val got = spark.read.parquet(pairsOut)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    // (5,7) is the load-bearing pair: 7 was never in crawl 0 — it can
    // only be found if crawl 1's survivors actually joined the index
    assert(got == Set((4L, 3L), (5L, 7L), (8L, 3L)))
  }

  test("heavyHitterCandidates: bounded state, decrement path exercised, " +
      "heavy keys guaranteed across micro-batches") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 1 shard, capacity 3, 20 distinct light keys + 2 heavy keys:
    // n = 20 + 30 + 25 = 75; guarantee threshold n/(cap+1) = 18.75 —
    // both heavy keys MUST survive no matter how the 20 lights churn
    // the counters; capacity < distinct forces constant decrements
    val input = MemoryStream[KV]
    val out = StreamProfile.heavyHitterCandidates(
      input.toDF(), "k", capacity = 3, shards = 1)
    val q = out.toDF().writeStream.format("memory").queryName("hhc")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: half the noise + heavy traffic
      input.addData((0 until 10).map(i => KV(s"light$i")) ++
        Seq.fill(15)(KV("heavyA")) ++ Seq.fill(12)(KV("heavyB")): _*)
      q.processAllAvailable()
      // batch 2: state must carry over; more noise + the rest
      input.addData((10 until 20).map(i => KV(s"light$i")) ++
        Seq.fill(15)(KV("heavyA")) ++ Seq.fill(13)(KV("heavyB")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hhc")
      .select("shard", "candidates").as[(Int, Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, cs) =>
      assert(cs.length <= 3, s"capacity bound violated: $cs")
    }
    // the LAST emitted row carries the final sketch
    val finalCands = rows.last._2.toSet
    assert(finalCands.contains("heavyA") && finalCands.contains("heavyB"),
      s"heavy keys must survive the sketch: $finalCands")
  }

  test("heavyHitterCandidates: keys spread across shards, nulls dropped, " +
      "exact regime when capacity covers the key space") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KV]
    val out = StreamProfile.heavyHitterCandidates(
      input.toDF(), "k", capacity = 100, shards = 4)
    val q = out.toDF().writeStream.format("memory").queryName("hhc2")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData((0 until 50).map(i => KV(s"k$i")) :+
        KV(null.asInstanceOf[String]): _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hhc2")
      .select("shard", "candidates").as[(Int, Seq[String])].collect()
    val all = rows.flatMap(_._2)
    assert(all.length == all.distinct.length, "one shard per key")
    assert(all.toSet == (0 until 50).map(i => s"k$i").toSet,
      "capacity >= keyspace keeps every key; null dropped")
    assert(rows.map(_._1).distinct.length > 1, "multiple shards active")
  }

  test("streamExpSmooth: 2-batch split is bit-identical to the batch " +
      "operator, state carries the window, in-batch disorder is sorted") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = (1 to 30).map { i =>
      Ev(i.toLong, ts(f"2024-01-01 10:${i}%02d:00"), (i % 2).toLong, "m",
        i * 1.25 + 0.0000004)
    }
    val input = MemoryStream[StreamProfile.SmoothEvent]
    val typed = input.toDS()
    val q = StreamProfile.streamExpSmooth(typed, span = 5)
      .writeStream.format("memory").queryName("sm_ewma")
      .outputMode(OutputMode.Append).start()
    def toSm(e: Ev) = StreamProfile.SmoothEvent(
      e.event_id, e.user_id, e.ts.getTime / 1000L, e.value)
    try {
      // batch 1: first 18 events, DELIBERATELY shuffled within the batch
      input.addData(events.take(18).reverse.map(toSm): _*)
      q.processAllAvailable()
      // batch 2: the rest — state must continue each user's window
      input.addData(events.drop(18).map(toSm): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sm_ewma")
      .select($"event_id", $"n_window", $"ewma")
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r).toMap

    val batch = graft.ext.EventsOps.expSmooth(
      events.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
        .toDF("event_id", "ts", "user_id", "event_type", "value"),
      span = 5)
      .select($"event_id", $"n_window", $"ewma")
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r).toMap

    assert(streamed.size == 30, s"one output row per event: ${streamed.size}")
    assert(streamed == batch, "stream == batch bit-identical across the split")
    // the split point itself proves cross-batch state: event 19 (user 1)
    // has a full 5-row window whose 4 older values crossed the boundary
    assert(streamed(19L)._2 == 5, "window spans the micro-batch boundary")
  }

  test("streamKmvDistinct: 2-batch union state equals the batch sketch " +
      "bit-exactly — a min-set is order-free") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    def md5h(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val k = 16
    // 400 distinct users in group "big", 5 in "small"; batches split so
    // batch 2 can displace batch-1 hashes from the bottom-k
    val all = (1 to 400).map(i => ("big", md5h((i + 1000).toString))) ++
      (1 to 5).map(i => ("small", md5h((i + 9000).toString)))
    val input = MemoryStream[(String, Long)]
    val q = StreamProfile.streamKmvDistinct(input.toDS(), k = k)
      .writeStream.format("memory").queryName("sm_kmv")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(all.take(200): _*)
      q.processAllAvailable()
      input.addData(all.drop(200): _*)
      q.processAllAvailable()
    } finally q.stop()
    // last update per group is the final sketch
    val streamed = spark.table("sm_kmv")
      .groupBy($"g").agg(last($"n_kept").as("n"), last($"kth_hash").as("kh"),
        last($"est_distinct").as("e"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap

    val batch = graft.profile.Profiler.kmvDistinct(
      (1 to 400).map(i => ("big", (i + 1000).toLong)).toDF("g", "v")
        .union((1 to 5).map(i => ("small", (i + 9000).toLong)).toDF("g", "v")),
      "g", "v", k = k)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap

    assert(streamed("small") == batch("small"), "exact path matches")
    assert(streamed("big") == batch("big"),
      s"sketch path matches bit-exactly: ${streamed("big")} vs ${batch("big")}")
    // the displacement actually happened: batch-2 hashes are in the sketch
    val finalBottom = (1 to 400).map(i => md5h((i + 1000).toString)).sorted.take(k)
    val batch1Bottom = (1 to 200).map(i => md5h((i + 1000).toString)).sorted.take(k)
    assert(finalBottom != batch1Bottom, "fixture must force a state merge")
  }

  test("streamWeightedSample: 2-batch split equals the batch A-ES sample " +
      "bit-exactly, with forced cross-batch displacement") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two groups, 60 weighted rows each; batch 2 carries heavy rows
    // that must displace batch-1 members from the top-k state
    val rows = (1 to 120).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val w = if (i > 60) 5000L + i else (i % 7 + 1).toLong
      (g, i.toLong, w)
    }
    val df = rows.toDF("g", "id", "w")
    val batchSample = graft.ext.Sampling.weightedSample(df, Seq("g"),
        "id", "w", k = 8)
      .select($"g", $"id").as[(String, Long)].collect().toSet
    def toRow(d: org.apache.spark.sql.DataFrame) = d
      .select($"g", $"id", $"w",
        graft.ext.Sampling.aesKey($"id", $"w").as("key"))
      .as[graft.streaming.StreamProfile.WSampleRow]
    val input = MemoryStream[(String, Long, Long)]
    val q = graft.streaming.StreamProfile.streamWeightedSample(
        toRow(input.toDS().toDF("g", "id", "w")), k = 8)
      .toDF().writeStream.format("memory").queryName("sm_ws")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(rows.take(60): _*)
      q.processAllAvailable()
      input.addData(rows.drop(60): _*)
      q.processAllAvailable()
    } finally q.stop()
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"n_seen".desc)
    val streamed = spark.table("sm_ws")
      .withColumn("__rn", row_number().over(W)).filter($"__rn" === 1)
      .select($"g", explode($"ids").as("id"))
      .as[(String, Long)].collect().toSet
    assert(streamed == batchSample,
      s"streamed sample must equal the batch sample: $streamed vs $batchSample")
    // displacement really happened: batch-1-only state differs
    val afterB1 = spark.table("sm_ws")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"n_seen".asc)))
      .filter($"__rn" === 1)
      .select($"g", explode($"ids").as("id"))
      .as[(String, Long)].collect().toSet
    assert(afterB1 != streamed, "heavy batch-2 rows must displace members")
    // heavy rows dominate: most final members are ids > 60
    assert(streamed.count(_._2 > 60) >= 12,
      s"weighting must favor the heavy rows: $streamed")
  }

  test("cmsSketch as a streaming aggregate: 2-batch complete-mode bucket " +
      "frame equals the batch sketch — counts are commutative state") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // key k appears k+1 times; split mid-key so batch 2 increments
    // buckets batch 1 already owns
    val keys = (0 until 40).flatMap(k => Seq.fill(k + 1)(k.toLong))
    val input = MemoryStream[Long]
    val q = graft.profile.Profiler.cmsSketch(
        input.toDS().toDF("k"), "k", w = 8, d = 4)
      .writeStream.format("memory").queryName("sm_cms")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(keys.take(300): _*)
      q.processAllAvailable()
      input.addData(keys.drop(300): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sm_cms")
      .as[(Int, Long, Long)].collect().sorted.toSeq
    val batch = graft.profile.Profiler.cmsSketch(
        keys.toDF("k"), "k", w = 8, d = 4)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(streamed == batch,
      "streamed bucket frame must equal the batch sketch bit-exactly")
    assert(streamed.size <= 8 * 4, "state bounded by d*w cells")
    // estimates through the SAME probe tail match the batch face
    val est = graft.profile.Profiler.cmsEstimate(spark.table("sm_cms"),
        keys.toDF("k"), "k", col("k") >= 0, w = 8, d = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val bEst = graft.profile.Profiler.cmsCounts(keys.toDF("k"), "k",
        col("k") >= 0, w = 8, d = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(est == bEst)
    est.foreach { case (k, (_, exact, e, _)) =>
      assert(exact == k + 1 && e >= exact) }
  }

  test("annRetrieveStream: per-batch multi-probe retrieval over a " +
      "static corpus is bit-identical to the batch lshMultiProbeTopK " +
      "however the query stream is chopped; empty stream reads back " +
      "typed-empty") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    val corpus = (0 until 60).map(i =>
        (i.toLong, unit(Array.fill(16)(rnd.nextGaussian()))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 7)
    val batch = graft.ext.SimSearch.lshMultiProbeTopK(corpus, queries,
        "vec_id", "embedding", dims = 16, k = 3, planes = 6, tProbes = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    // stream the 7 queries as 3 uneven chunks
    val base = java.nio.file.Files.createTempDirectory("graft_ann_spec")
    val inDir = base.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    Seq(Seq(0L, 1L), Seq(2L), Seq(3L, 4L, 5L, 6L)).zipWithIndex
      .foreach { case (ids, c) =>
        val stage = base.resolve(s"stage_$c")
        queries.filter($"vec_id".isin(ids: _*)).coalesce(1)
          .write.mode("overwrite").parquet(stage.toString)
        val part = java.nio.file.Files.list(stage).toArray
          .map(_.asInstanceOf[java.nio.file.Path])
          .find(_.getFileName.toString.endsWith(".parquet")).get
        val dst = inDir.resolve(s"chunk_$c.parquet")
        java.nio.file.Files.move(part, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime
            .fromMillis(1700000000000L + c * 60000L))
      }
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val out = base.resolve("ann").toString
    StreamProfile.annRetrieveStream(stream, corpus, "vec_id",
      "embedding", out, dims = 16, k = 3, planes = 6, tProbes = 4)
    val got = spark.read.parquet(out)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == batch,
      s"chunked retrieval diverged from batch: ${got.diff(batch)} / ${batch.diff(got)}")
    // queryless run: typed empty
    val emptyIn = base.resolve("empty_in")
    java.nio.file.Files.createDirectories(emptyIn)
    val emptyStream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", 1).parquet(emptyIn.toString)
    val out2 = base.resolve("ann_empty").toString
    StreamProfile.annRetrieveStream(emptyStream, corpus, "vec_id",
      "embedding", out2, dims = 16, k = 3, planes = 6, tProbes = 4)
    val e = spark.read.parquet(out2)
    assert(e.count() == 0 &&
      e.columns.toSeq == Seq("query_id", "neighbor_id", "rank", "cosine"))
  }
}
