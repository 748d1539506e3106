package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.{EventsOps, Multimodal}

class EventsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val ev = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, """{"k": 3}"""),
    (2L, ts("2024-01-01 10:10:00"), 7L, "view", 2.0, """{"k": 4}"""),
    (3L, ts("2024-01-01 11:05:00"), 7L, "click", 3.0, """{"k": 5}"""), // 55min gap -> new session
    (4L, ts("2024-01-01 10:20:00"), 9L, "click", 4.0, """{"k": 6}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("json props extraction") {
    val total = EventsOps.withProps(ev).agg(sum($"props_k")).head().getLong(0)
    assert(total == 18)
  }

  test("hourly profile groups by hour x type with exact sums") {
    val r = EventsOps.hourlyProfile(ev)
      .filter($"event_type" === "click" && hour($"hour") === 10)
      .head()
    assert(r.getAs[Long]("n_events") == 2) // users 7 and 9 at 10:xx
    assert(r.getAs[Double]("sum_value") == 5.0)
    assert(r.getAs[Long]("n_users") == 2)
  }

  test("resample + ffill: grid spans each user, gaps carry last value, in-bucket last wins") {
    val evr = Seq(
      // user 1: events in hours 10 and 13; 11 and 12 are gaps
      (1L, ts("2024-01-01 10:05:00"), 1L, "m", 1.0, "{}"),
      (2L, ts("2024-01-01 10:40:00"), 1L, "m", 2.0, "{}"), // later in-bucket: wins
      (3L, ts("2024-01-01 13:10:00"), 1L, "m", 9.0, "{}"),
      // user 2: single event -> single-bucket grid, no fill needed
      (4L, ts("2024-01-01 10:30:00"), 2L, "m", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventsOps.resampleFill(evr, bucketSec = 3600)
      .select("user_id", "bucket", "value_filled", "is_gap")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000 / 3600
    assert(out.keySet == Set((1L, h10), (1L, h10 + 1), (1L, h10 + 2),
      (1L, h10 + 3), (2L, h10)), "grid spans min..max bucket per user")
    assert(out((1L, h10)) == ((2.0, false)), "bucket takes its LAST event")
    assert(out((1L, h10 + 1)) == ((2.0, true)), "gap carries value forward")
    assert(out((1L, h10 + 2)) == ((2.0, true)))
    assert(out((1L, h10 + 3)) == ((9.0, false)))
    assert(out((2L, h10)) == ((5.0, false)))
  }

  test("resample + interpolate: interior gaps linear, trailing carries, known exact") {
    val evi = Seq(
      // user 1: known at hours 10 and 13 -> 11,12 interpolate at 1/3, 2/3
      (1L, ts("2024-01-01 10:30:00"), 1L, "m", 3.0, "{}"),
      (2L, ts("2024-01-01 13:10:00"), 1L, "m", 9.0, "{}"),
      // user 2: known at 10, gap at 11, known at 12, gaps have no right
      // anchor after 12 -> none here (max bucket = last known)
      (3L, ts("2024-01-01 10:00:00"), 2L, "m", 4.0, "{}"),
      (4L, ts("2024-01-01 12:00:00"), 2L, "m", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventsOps.resampleInterpolate(evi, bucketSec = 3600)
      .select("user_id", "bucket", "value_interp", "is_gap")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000 / 3600
    assert(out((1L, h10)) == ((3.0, false)))
    assert(out((1L, h10 + 1)) == ((5.0, true)), "1/3 of the way 3->9")
    assert(out((1L, h10 + 2)) == ((7.0, true)), "2/3 of the way 3->9")
    assert(out((1L, h10 + 3)) == ((9.0, false)))
    assert(out((2L, h10 + 1)) == ((6.0, true)), "midpoint 4->8")
  }

  test("moving z-score: spike flags, constant windows and singletons never do") {
    // a self-inclusive window bounds the reachable z at sqrt(n_baseline)
    // (the spike inflates its own variance), so the stable run must hold
    // >= 10 points for a z=3 flag to be possible at all
    val base = (1 to 12).map(i =>
      (i.toLong, ts(f"2024-01-01 10:${i min 59}%02d:00"), 1L, "m", 10.0, "{}"))
    val evz = (base :+
      (13L, ts("2024-01-01 10:30:00"), 1L, "m", 500.0, "{}")) ++ Seq( // spike
      // user 2: all-identical values -> variance rounds to ~0, no flags
      (21L, ts("2024-01-01 10:00:00"), 2L, "m", 3.3, "{}"),
      (22L, ts("2024-01-01 10:01:00"), 2L, "m", 3.3, "{}"),
      // user 3: singleton window
      (31L, ts("2024-01-01 10:00:00"), 3L, "m", 42.0, "{}"))
    val out = EventsOps.movingZScore(evz.toDF(
        "event_id", "ts", "user_id", "event_type", "value", "props"),
        windowSec = 3600, zThresh = 3.0)
      .select("event_id", "n_window", "is_anomaly")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(13L)._3, "the 500.0 spike must flag")
    (1 to 12).foreach(i =>
      assert(!out(i.toLong)._3, s"stable reading $i must not flag"))
    assert(!out(21L)._3 && !out(22L)._3, "constant window must not flag")
    assert(!out(31L)._3 && out(31L)._2 == 1L, "singleton must not flag")
  }

  test("sessionization: 30-min inactivity splits sessions") {
    val st = EventsOps.sessionStats(ev)
    val u7 = st.filter($"user_id" === 7).orderBy($"session_seq").collect()
    assert(u7.length == 2)
    assert(u7(0).getAs[Long]("n_events") == 2) // 10:00 + 10:10
    assert(u7(1).getAs[Long]("n_events") == 1) // 11:05
    assert(u7(0).getAs[Long]("duration_sec") == 600)
  }

  test("gap exactly at the boundary does NOT split (strict >)") {
    val e2 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(EventsOps.sessionStats(e2).count() == 1)
  }

  test("multimodal roundtrip: synthesize -> decode -> features -> frames") {
    val ids = Seq(10L, 21L).toDF("doc_id")
    val media = Multimodal.synthesize(ids, "doc_id", "video")
    val decoded = media.withColumn("meta", Multimodal.decodeMeta($"bytes"))
    val m10 = decoded.filter($"media_id" === 10).select("meta.*").head()
    assert(m10.getAs[Int]("width") == 18)   // 10 % 64 + 8
    assert(m10.getAs[Int]("height") == 16)  // 10 % 48 + 6
    assert(m10.getAs[Int]("n_frames") == 11) // 10 % 16 + 1
    val frames = Multimodal.sampleFrames(media, stride = 4)
      .filter($"media_id" === 10).count()
    assert(frames == 3) // frames 0,4,8 of 11
    val garbage = Seq(Tuple1("not-media".getBytes)).toDF("bytes")
      .select(Multimodal.decodeMeta($"bytes").as("meta"))
    assert(garbage.filter($"meta".isNull).count() == 1)
  }

  test("frameDupPairs: exact re-upload reads jaccard 1, crafted partial " +
      "overlap reads exactly 1/3, boilerplate frames are capped out") {
    // hand-built media: header MM01 + w=8 h=6 f=8 (hex, 4 chars each),
    // payload 256 chars; stride 4 samples frames 0 and 4 -> payload
    // slices [1..16] and [65..80]
    def media(id: Long, frame0: String, frame4: String): (Long, String, Array[Byte]) = {
      val payload = frame0 + "x" * 48 + frame4 + "y" * (256 - 80)
      (id, "video", ("MM01" + "0008" + "0006" + "0008" + payload)
        .getBytes("UTF-8"))
    }
    val rows = Seq(
      media(1L, "A" * 16, "B" * 16),
      media(2L, "A" * 16, "B" * 16), // exact frame-set copy of 1
      media(3L, "A" * 16, "C" * 16)  // shares frame 0 only with 1 and 2
    )
    val df = rows.toDF("media_id", "kind", "bytes")
    val pairs = Multimodal.frameDupPairs(df, stride = 4, threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> ((p._3, p._4))).toMap
    assert(pairs((1L, 2L)) == ((2L, 1.0)), s"exact copy: $pairs")
    assert(pairs((1L, 3L)) == ((1L, 1.0 / 3.0)),
      s"partial: 1 shared of 3 distinct: $pairs")
    assert(pairs((2L, 3L)) == ((1L, 1.0 / 3.0)))
    // raising the threshold drops the partial pairs
    val strict = Multimodal.frameDupPairs(df, stride = 4, threshold = 0.9)
      .as[(Long, Long, Long, Double)].collect()
    assert(strict.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    // boilerplate: 20 single-frame media sharing one slice -> the digest
    // df-cap (16) removes it and NO pairs emerge
    val boiler = (1 to 20).map { i =>
      ((100 + i).toLong, "video",
        ("MM01000800060001" + "Z" * 256).getBytes("UTF-8"))
    }.toDF("media_id", "kind", "bytes")
    assert(Multimodal.frameDupPairs(boiler, stride = 4, threshold = 0.1)
      .count() == 0L, "capped boilerplate frame must not pair")
  }

  test("funnel: stage order enforced, same-instant counts, dropouts excluded") {
    def ev(id: Long, u: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ)
    val events = Seq(
      // user 1: full ordered funnel
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 10:05:00", "click"),
      ev(3, 1, "2024-01-01 10:10:00", "purchase"),
      // user 2: purchase BEFORE any view -> stops at view stage
      ev(4, 2, "2024-01-01 09:00:00", "purchase"),
      ev(5, 2, "2024-01-01 10:00:00", "view"),
      // user 3: view+click same instant (>= counts), no purchase
      ev(6, 3, "2024-01-01 11:00:00", "view"),
      ev(7, 3, "2024-01-01 11:00:00", "click"),
      // user 4: click only, never viewed -> in no stage
      ev(8, 4, "2024-01-01 12:00:00", "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventsOps.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .select("stage", "n_users").as[(String, Long)].collect().toSeq
    assert(out == Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
  }

  test("cohort retention: day-0 is every user, later offsets only when active") {
    def ev(id: Long, u: Long, t: String) =
      (id, java.sql.Timestamp.valueOf(t), u, "click")
    val events = Seq(
      ev(1, 1, "2024-01-01 10:00:00"), // user 1 cohort 01-01
      ev(2, 1, "2024-01-02 10:00:00"), // back on day 1
      ev(3, 1, "2024-01-02 18:00:00"), // same day twice -> still 1 user
      ev(4, 2, "2024-01-01 11:00:00"), // user 2 cohort 01-01, never returns
      ev(5, 3, "2024-01-02 09:00:00"), // user 3 cohort 01-02
      ev(6, 3, "2024-01-12 09:00:00")) // beyond maxOffset -> dropped
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventsOps.cohortRetention(events, maxOffsetDays = 7)
      .select("cohort_day", "offset_days", "n_users")
      .as[(String, Int, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("moving average: event-time RANGE frame, bursts and gaps") {
    def ev(id: Long, u: Long, t: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(t), u, "click", v)
    val events = Seq(
      ev(1, 1, "2024-01-01 10:00:00", 10.0),
      ev(2, 1, "2024-01-01 10:30:00", 20.0), // within 1h of #1
      ev(3, 1, "2024-01-01 12:00:00", 30.0), // >1h after both -> alone
      ev(4, 1, "2024-01-01 12:00:00", 50.0), // same instant as #3:
      // RANGE includes BOTH same-second rows in BOTH windows (a ROWS
      // frame would depend on tie order — the semantics under test)
      ev(5, 2, "2024-01-01 10:15:00", 99.0)) // other user, own window
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventsOps.movingAverage(events, windowSec = 3600)
      .select("event_id", "n_window", "avg_window")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, 10.0), (2L, 2L, 15.0),
      (3L, 2L, 40.0), (4L, 2L, 40.0),
      (5L, 1L, 99.0)))
  }

  test("resize keeps frame count, updates dimensions") {
    val media = Multimodal.synthesize(Seq(10L).toDF("doc_id"), "doc_id", "img")
    val r = Multimodal.resize(media, 224, 224).select("meta.*").head()
    assert(r.getAs[Int]("width") == 224 && r.getAs[Int]("n_frames") == 11)
  }

  test("timeGaps reports exactly the empty interior buckets; empty input -> no rows") {
    // events at hours 10, 11, 14, 15 of one day -> gaps at 12, 13; the
    // spine is bounded by the occupied range (no phantom edge gaps)
    val e = Seq(
      (1L, ts("2024-03-01 10:05:00")), (2L, ts("2024-03-01 10:55:00")),
      (3L, ts("2024-03-01 11:30:00")), (4L, ts("2024-03-01 14:00:00")),
      (5L, ts("2024-03-01 15:59:59"))).toDF("id", "ts")
    val gaps = EventsOps.timeGaps(e, "ts")
      .select("gap_start").as[String].collect().toSeq.sorted
    assert(gaps == Seq("2024-03-01 12:00:00", "2024-03-01 13:00:00"))
    // sub-hour buckets see finer gaps
    val fine = EventsOps.timeGaps(e, "ts", bucketSeconds = 1800)
      .count()
    // occupied: 10:00,10:30,11:30,14:00,15:30 -> missing 11:00, 12:00,
    // 12:30, 13:00, 13:30, 14:30, 15:00
    assert(fine == 7)
    assert(EventsOps.timeGaps(e.filter($"id" < 0), "ts").count() == 0)
  }

  test("audioEnergy (real WAV codec): frame grid from decoded samples, " +
      "threshold extremes, peak bounds mean, deterministic") {
    val ids = (1L to 10L).map(Tuple1(_)).toDF("id")
    val media = Multimodal.synthesizeWav(ids, "id")
    val out = Multimodal.audioEnergy(media, frameSamples = 16,
        silenceBelow = 250000L)
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(out.length == 10)
    out.foreach { r =>
      // n = id%1984+64 samples -> n/16 full frames
      val n = Multimodal.patternSampleCount(r._1)
      assert(r._2 == (n / 16).toLong, s"frame count from sample count: $r")
      assert(r._3 >= 0L && r._3 <= r._2, s"silent count bounded: $r")
      assert(r._6 >= r._5.toLong, s"peak >= mean: $r")
      // a 16-sample frame's |s|-sum lies in [0, 16*32768]
      assert(r._6 <= 16L * 32768L && r._5 >= 0.0, s"energy range: $r")
    }
    // threshold extremes flip everything
    val none = Multimodal.audioEnergy(media, silenceBelow = 0L)
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(none.forall(_._4 == 0.0), "nothing below 0")
    val all = Multimodal.audioEnergy(media,
        silenceBelow = 17L * 32768L)
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(all.forall(_._4 == 1.0), "everything below max+1")
    // deterministic across partitionings
    val again = Multimodal.audioEnergy(media.repartition(3),
        frameSamples = 16, silenceBelow = 250000L)
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSet
    assert(again == out.toSet)
    // a clip shorter than one frame still yields a row: n_frames = 0,
    // null stats (id 0 -> 64 samples < one 128-sample frame)
    val short = Multimodal.synthesizeWav(Seq(Tuple1(0L)).toDF("id"), "id")
    val z = Multimodal.audioEnergy(short, frameSamples = 128).collect()
    assert(z.length == 1, "short media must not vanish from the report")
    assert(z.head.getLong(1) == 0L && z.head.getLong(2) == 0L)
    assert(z.head.isNullAt(3) && z.head.isNullAt(4) && z.head.isNullAt(5))
    // undecodable bytes degrade to the same n_frames = 0 row
    val junk = Seq((7L, "audio", "not a wav".getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes")
    val j = Multimodal.audioEnergy(junk).collect()
    assert(j.length == 1 && j.head.getLong(1) == 0L && j.head.isNullAt(3))
  }

  test("videoFrameStats: animated-GIF encode->decode round trip is " +
      "bit-perfect vs the frame formula; junk bytes survive flagged") {
    val ids = Seq(1L, 7L, 23L, 100L).map(Tuple1(_)).toDF("id")
    val rows = Multimodal.videoFrameStats(Multimodal.synthesizeGif(ids, "id"))
      .as[(Long, Boolean, Int, Int, Int, Long, Long)]
      .collect().groupBy(_._1)
    assert(rows.keySet == Set(1L, 7L, 23L, 100L))
    rows.foreach { case (id, frames) =>
      val w = java.lang.Math.floorMod(id, 48L).toInt + 8
      val h = java.lang.Math.floorMod(id, 32L).toInt + 8
      val nf = Multimodal.patternFrameCount(id)
      assert(frames.length == nf, s"frame count for $id: ${frames.length}")
      frames.sortBy(_._3).zipWithIndex.foreach { case (r, f) =>
        assert(r._2 && r._3 == f && r._4 == w && r._5 == h, s"meta: $r")
        // recompute the truth from the formula
        var sum = 0L; var bright = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val g = java.lang.Math
            .floorMod(id * 31 + f * 17L + x * 7L + y * 13L, 256L).toInt
          sum += g; if (g >= 128) bright += 1
        }
        assert(r._6 == sum && r._7 == bright,
          s"pixel stats for video $id frame $f: $r vs ($sum, $bright)")
      }
    }
    val junk = Seq((5L, "video", Array[Byte](9, 9, 9)),
        (6L, "video", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "bytes")
    val bad = Multimodal.videoFrameStats(junk).collect()
    assert(bad.length == 2 && bad.forall(r => !r.getBoolean(1)
      && r.getInt(2) == -1))
  }

  test("shotBoundaries: detected shots equal the planted scene structure " +
      "through a real GIF round trip; junk and static videos behave") {
    val ids = Seq(2L, 9L, 16L, 23L).map(Tuple1(_)).toDF("id")
    val shots = Multimodal.shotBoundaries(
        Multimodal.synthesizeShotGif(ids, "id"))
      .as[(Long, Long, Int, Int, Long)].collect().groupBy(_._1)
    assert(shots.keySet == Set(2L, 9L, 16L, 23L))
    shots.foreach { case (id, rows) =>
      val len = Multimodal.shotSceneLen(id)
      val nf = Multimodal.shotFrameCount(id)
      val nScenes = (nf + len - 1) / len
      val sorted = rows.sortBy(_._2)
      assert(sorted.length == nScenes,
        s"video $id: ${sorted.length} shots, expected $nScenes")
      sorted.zipWithIndex.foreach { case ((_, sid, start, end, n), i) =>
        assert(sid == i.toLong, s"shot ids consecutive from 0: $sid != $i")
        assert(start == i * len, s"video $id shot $i starts at $start")
        assert(end == math.min((i + 1) * len, nf) - 1 && n == end - start + 1,
          s"video $id shot $i extent ($start,$end,$n)")
      }
    }
    // a single-scene (static-pattern) video is ONE shot end to end:
    // plain synthesizeGif's within-video mean drift is the mod-256
    // shift, which moves the mean by < 8 gray levels between frames
    val one = Multimodal.shotBoundaries(Multimodal.synthesizeGif(
        Seq(Tuple1(23L)).toDF("id"), "id"))
      .as[(Long, Long, Int, Int, Long)].collect()
    assert(one.length == 1 && one.head._3 == 0 &&
      one.head._5 == Multimodal.patternFrameCount(23L),
      s"static video must be one shot: ${one.toSeq}")
    // undecodable bytes contribute no shots
    val junk = Seq((5L, "video", Array[Byte](9, 9, 9)))
      .toDF("media_id", "kind", "bytes")
    assert(Multimodal.shotBoundaries(junk).count() == 0L)
  }

  test("shotKeyframes: picks match a formula replay of the min-in-shot-" +
      "delta rule (single-frame shots included), and injected " +
      "re-uploads collapse onto their originals' dup_root") {
    // 21: len 2, nf 7 -> last shot is SINGLE-frame (keyframe = itself)
    val ids = Seq(2L, 9L, 21L).map(Tuple1(_)).toDF("id")
    val media = Multimodal.synthesizeShotGif(ids, "id")
    val withCopies = media.unionByName(media.filter($"media_id" === 2L)
      .select(($"media_id" + 3000000L).as("media_id"), $"kind", $"bytes"))
    val out = Multimodal.shotKeyframes(withCopies)
      .as[(Long, Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // expected keyframes: replay the rule on shotPatternGray sums
    def expectedKeyframes(id: Long): Map[Long, Int] = {
      val w = java.lang.Math.floorMod(id, 48L).toInt + 8
      val h = java.lang.Math.floorMod(id, 32L).toInt + 8
      val len = Multimodal.shotSceneLen(id)
      val nf = Multimodal.shotFrameCount(id)
      val sums = (0 until nf).map { f =>
        var s = 0L
        for (y <- 0 until h; x <- 0 until w)
          s += Multimodal.shotPatternGray(id, f, x, y)
        s
      }
      (0 until nf).groupBy(f => (f / len).toLong).map { case (sid, fs) =>
        val cands = fs.filter(f => f != fs.min)
        val kf = if (cands.isEmpty) fs.min
          else cands.minBy(f => (math.abs(sums(f) - sums(f - 1)), f))
        sid -> kf
      }
    }
    Seq(2L, 9L, 21L).foreach { id =>
      val exp = expectedKeyframes(id)
      exp.foreach { case (sid, kf) =>
        assert(out((id, sid))._1 == kf,
          s"video $id shot $sid: picked ${out((id, sid))._1}, expected $kf")
      }
      // exactly the planted shot count, no extra rows
      assert(out.keys.count(_._1 == id) == exp.size)
    }
    // the single-frame shot of video 21 keys on its only frame
    assert(out((21L, 3L))._1 == 6)
    // injected copy: identical keyframes, dup_root collapses onto the
    // ORIGINAL's root (copy keys are 3000002xxx > 2xxx)
    expectedKeyframes(2L).foreach { case (sid, kf) =>
      assert(out((3000002L, sid))._1 == kf)
      assert(out((3000002L, sid))._2 == out((2L, sid))._2,
        s"copy shot $sid must share its original's dup_root")
      assert(out((2L, sid))._2 <= 2L * 1000 + sid)
    }
    // undecodable bytes contribute nothing
    val junk = Seq((5L, "video", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "bytes")
    assert(Multimodal.shotKeyframes(junk).count() == 0L)
  }

  test("gifFrameDupPairs: byte-identical re-uploads pair at jaccard 1; " +
      "distinct videos and junk bytes never pair") {
    val ids = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id")
    val media = Multimodal.synthesizeGif(ids, "id")
    val withCopies = media.union(
      media.filter($"media_id" === 2L)
        .select(($"media_id" + 100L).as("media_id"), $"kind", $"bytes"))
      .union(Seq((50L, "video", Array[Byte](1, 2)))
        .toDF("media_id", "kind", "bytes"))
    val pairs = Multimodal.gifFrameDupPairs(withCopies, threshold = 0.9)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.toSeq.map(p => (p._1, p._2, p._4)) == Seq((2L, 102L, 1.0)),
      s"exactly the injected copy pair: ${pairs.toSeq}")
  }

  test("resizeImages: nearest-neighbor remap matches the formula through " +
      "two real PNG round trips; junk bytes -> null bytes, row survives") {
    val ids = Seq(3L, 11L).map(Tuple1(_)).toDF("id")
    val out = Multimodal.imageStats(Multimodal.resizeImages(
        Multimodal.synthesizeImages(ids, "id"), 16, 12))
      .as[(Long, Boolean, Int, Int, Long, Long, Long)].collect()
    out.foreach { r =>
      val (id, ok, w, h, npx, sum, bright) = r
      assert(ok && w == 16 && h == 12 && npx == 192L, s"dims: $r")
      val sw = java.lang.Math.floorMod(id, 48L).toInt + 8
      val sh = java.lang.Math.floorMod(id, 32L).toInt + 8
      var es = 0L; var eb = 0L
      for (y <- 0 until 12; x <- 0 until 16) {
        val g = java.lang.Math.floorMod(
          id * 31 + (x * sw / 16) * 7L + (y * sh / 12) * 13L, 256L).toInt
        es += g; if (g >= 128) eb += 1
      }
      assert(sum == es && bright == eb, s"resized stats: $r vs ($es, $eb)")
    }
    val junk = Seq((1L, "image", Array[Byte](0, 1)))
      .toDF("media_id", "kind", "bytes")
    val j = Multimodal.resizeImages(junk, 4, 4).collect()
    assert(j.length == 1 && j.head.isNullAt(2), "junk passes through null")
  }

  test("resampleWav: decimation by 2 matches the formula at indices 2i " +
      "through two real WAV round trips; output rate halves") {
    val ids = Seq(4L, 77L).map(Tuple1(_)).toDF("id")
    val out = Multimodal.audioStats(Multimodal.resampleWav(
        Multimodal.synthesizeWav(ids, "id"), 2))
      .as[(Long, Boolean, Int, Int, Int, Long, Long, Int, Long)].collect()
    out.foreach { r =>
      val (id, ok, rate, ch, bits, n, sumAbs, peak, loud) = r
      assert(ok && rate == 4000 && ch == 1 && bits == 16, s"format: $r")
      val n0 = Multimodal.patternSampleCount(id)
      val kept = (0 until n0 by 2).map(i => java.lang.Math
        .floorMod(id * 7919L + i * 104729L, 65536L).toInt - 32768)
      assert(n == kept.length.toLong, s"decimated count: $r")
      assert(sumAbs == kept.map(s => math.abs(s).toLong).sum, s"sum: $r")
      assert(peak == kept.map(math.abs).max, s"peak: $r")
      assert(loud == kept.count(s => math.abs(s) >= 16384).toLong, r)
    }
  }

  test("audioStats: WAV encode->decode round trip is bit-perfect vs the " +
      "sample formula; undecodable bytes survive with decode_ok=false") {
    val ids = Seq(1L, 5L, 42L, 1999L).map(Tuple1(_)).toDF("id")
    val rows = Multimodal.audioStats(Multimodal.synthesizeWav(ids, "id"))
      .as[(Long, Boolean, Int, Int, Int, Long, Long, Int, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 4)
    rows.foreach { r =>
      val (id, ok, rate, ch, bits, n, sumAbs, peak, loud) = r
      assert(ok && rate == 8000 && ch == 1 && bits == 16, s"format: $r")
      // recompute the truth directly from the formula
      val nExp = Multimodal.patternSampleCount(id)
      val samples = (0 until nExp).map(i =>
        java.lang.Math.floorMod(id * 7919L + i * 104729L, 65536L).toInt
          - 32768)
      assert(n == nExp.toLong, s"sample count: $r")
      assert(sumAbs == samples.map(s => math.abs(s).toLong).sum, s"sum: $r")
      assert(peak == samples.map(math.abs).max, s"peak: $r")
      assert(loud == samples.count(s => math.abs(s) >= 16384).toLong, r)
    }
    val junk = Seq((9L, "audio", Array[Byte](1, 2, 3)),
        (10L, "audio", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "bytes")
    val bad = Multimodal.audioStats(junk).collect()
    assert(bad.length == 2 && bad.forall(!_.getBoolean(1)))
    assert(bad.forall(_.isNullAt(5)), "null stats on decode failure")
  }

  test("imageDHash: 9x8 gradient-sign hash matches the formula through a " +
      "real PNG round trip; junk bytes -> decode_ok=false, null hash") {
    def gray(id: Long, x: Int, y: Int): Int =
      (((id * 31 + x * 7L + y * 13L) % 256L).toInt + 256) % 256
    def expected(id: Long): Long = {
      val w = (id % 48 + 8).toInt; val h = (id % 32 + 8).toInt
      var hv = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (gray(id, (x + 1) * w / 9, y * h / 8) >
            gray(id, x * w / 9, y * h / 8)) hv |= 1L << (y * 8 + x)
      hv
    }
    val ids = Seq(2L, 11L, 47L, 100L).map(Tuple1(_)).toDF("id")
    val out = Multimodal.imageDHash(Multimodal.synthesizeImages(ids, "id"))
      .as[(Long, Boolean, Option[Long])].collect().map(r => r._1 -> r).toMap
    ids.as[Tuple1[Long]].collect().foreach { case Tuple1(id) =>
      assert(out(id)._2 && out(id)._3.contains(expected(id)),
        s"dhash($id): ${out(id)} vs ${expected(id)}")
    }
    val junk = Seq((9L, "image", Array[Byte](1, 2)),
        (10L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "bytes")
    val bad = Multimodal.imageDHash(junk).collect()
    assert(bad.forall(r => !r.getBoolean(1) && r.isNullAt(2)))
  }

  test("phashNearDups: brightness-shifted re-encodes pair where exact " +
      "fingerprints cannot; band cap and maxDist bound are honored") {
    def gray(id: Long, x: Int, y: Int, s: Int): Int =
      java.lang.Math.floorMod(id * 31 + x * 7L + y * 13L + s, 256L).toInt
    def dh(id: Long, s: Int): Long = {
      val w = (id % 48 + 8).toInt; val h = (id % 32 + 8).toInt
      var hv = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (gray(id, (x + 1) * w / 9, y * h / 8, s) >
            gray(id, x * w / 9, y * h / 8, s)) hv |= 1L << (y * 8 + x)
      hv
    }
    // pick ids whose +8-shifted copy stays within Hamming 3 of the
    // original (the wraparound flips few gradient signs) and one whose
    // copy drifts beyond the radius — both branches exercised
    val cands = (1L to 400L).map(i =>
      i -> java.lang.Long.bitCount(dh(i, 0) ^ dh(i, 8)))
    val near = cands.filter(_._2 <= 3).map(_._1).take(2)
    val far = cands.filter(_._2 > 3).map(_._1).take(1)
    assert(near.size == 2 && far.size == 1, s"fixture ids: $cands")
    val baseIds = (near ++ far).map(Tuple1(_)).toDF("id")
    val orig = Multimodal.synthesizeImages(baseIds, "id")
    val shifted = Multimodal.synthesizeImages(baseIds, "id", grayShift = 8)
      .select(($"media_id" + 1000L).as("media_id"), $"kind", $"bytes")
    // shifted bytes are genuinely different files: exact-byte dedup
    // (md5 of bytes) sees zero duplicate pairs
    val byteDups = orig.select(md5($"bytes").as("d"))
      .intersect(shifted.select(md5($"bytes").as("d"))).count()
    assert(byteDups == 0L, "re-encodes must differ at the byte level")
    val pairs = Multimodal.phashNearDups(
        Multimodal.imageDHash(orig.unionByName(shifted)))
      .as[(Long, Long, Int)].collect().toSeq.sorted
    val nearPairs = pairs.filter(p => p._2 - p._1 == 1000L).map(_._1)
    assert(nearPairs.toSet == near.toSet,
      s"shift-survivors pair, the far id does not: $pairs")
    // band cap: 65 identical images share every band; the bucket
    // overflows maxBandFreq=64 and produces NO pairs
    val many = (0L until 65L).map(i => (i, 7L)).toDF("media_id", "h0")
      .select($"media_id", lit(true).as("decode_ok"), lit(42L).as("dhash"))
    assert(Multimodal.phashNearDups(many).count() == 0L, "cap drops bucket")
    assertThrows[IllegalArgumentException] {
      Multimodal.phashNearDups(many, maxDist = 4)
    }
  }

  test("imageStats: REAL PNG round trip reproduces the pattern formula, " +
      "RGB takes the ITU-601 path, garbage bytes survive as decode_ok=false") {
    def gray(id: Long, x: Int, y: Int): Int =
      (((id * 31 + x * 7L + y * 13L) % 256L).toInt + 256) % 256
    val ids = Seq(3L, 10L, 45L, 100L).map(Tuple1(_)).toDF("id")
    val media = Multimodal.synthesizeImages(ids, "id")
    // bytes are REAL PNGs: magic 0x89 'P' 'N' 'G'
    media.select("bytes").collect().foreach { r =>
      val b = r.getAs[Array[Byte]](0)
      assert((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
    }
    val out = Multimodal.imageStats(media)
      .as[(Long, Boolean, Int, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 4 && out.values.forall(_._2), "all decode")
    out.foreach { case (id, r) =>
      val w = (id % 48 + 8).toInt; val h = (id % 32 + 8).toInt
      val px = for { y <- 0 until h; x <- 0 until w } yield gray(id, x, y)
      assert(r._3 == w && r._4 == h && r._5 == w.toLong * h, s"dims: $r")
      assert(r._6 == px.map(_.toLong).sum, s"sum_lum mismatch for $id: $r")
      assert(r._7 == px.count(_ >= 128).toLong, s"n_bright for $id: $r")
    }
    // an RGB image goes through integer ITU-601 luminance
    val rgb = {
      val img = new java.awt.image.BufferedImage(2, 1,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff0000) // red: (299*255)/1000 = 76
      img.setRGB(1, 0, 0xffffff) // white: 255
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq((1L, "image", rgb),
      (2L, "image", "not a png at all".getBytes("UTF-8")),
      (3L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "bytes")
    val mixed = Multimodal.imageStats(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(mixed(1L).getBoolean(1) && mixed(1L).getLong(5) == 76L + 255L &&
      mixed(1L).getLong(6) == 1L, s"rgb: ${mixed(1L)}")
    assert(!mixed(2L).getBoolean(1) && mixed(2L).isNullAt(2),
      "garbage bytes -> decode_ok=false, null stats, row kept")
    assert(!mixed(3L).getBoolean(1), "null bytes -> decode_ok=false")
  }

  test("transitionMatrix: per-user ordering, cross-user isolation, " +
      "probabilities condition on the from state, tie-break total") {
    def ev(id: Long, u: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ)
    val events = Seq(
      // user 1: view -> click -> view -> click
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 10:01:00", "click"),
      ev(3, 1, "2024-01-01 10:02:00", "view"),
      ev(4, 1, "2024-01-01 10:03:00", "click"),
      // user 2: view -> buy; the user boundary must NOT produce a
      // click->view transition from user 1's tail
      ev(5, 2, "2024-01-01 10:00:00", "view"),
      ev(6, 2, "2024-01-01 10:05:00", "buy"),
      // user 3: two same-instant events -> event_id breaks the tie
      ev(7, 3, "2024-01-01 12:00:00", "a"),
      ev(8, 3, "2024-01-01 12:00:00", "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventsOps.transitionMatrix(events)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      ("view", "click") -> ((2L, 0.666667)), // 2 of view's 3 exits
      ("view", "buy") -> ((1L, 0.333333)),
      ("click", "view") -> ((1L, 1.0)), // user 1 interior only
      ("a", "b") -> ((1L, 1.0))))
    // singleton-user streams contribute nothing
    val solo = Seq(ev(9, 9, "2024-01-01 10:00:00", "x"))
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(EventsOps.transitionMatrix(solo).count() == 0)
  }

  test("abTestReport: hand-checked arms and conversions, z sign and " +
      "degenerate guards, assignment is user-stable") {
    def ev(id: Long, u: Long, typ: String) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u, typ)
    // recover the engine's own assignment, then build a fixture whose
    // conversion pattern we control exactly per arm
    val probe = (1L to 40L).map(u => ev(u, u, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val armOf = EventsOps.abTestReport(probe, "purchase") // no conv yet
      .as[(Long, Long, Long, Long, Double, Double, Double, Option[Double])]
      .head()
    val (na0, nb0) = (armOf._1, armOf._3)
    assert(na0 + nb0 == 40L && na0 > 0 && nb0 > 0, s"both arms drawn: $armOf")
    assert(armOf._2 == 0L && armOf._4 == 0L)
    assert(armOf._8.isEmpty, "pooled rate 0 -> z null, not NaN")
    // every user converts -> pooled rate 1 -> z null again
    val all = (1L to 40L).flatMap(u => Seq(ev(u, u, "view"),
      ev(100 + u, u, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val full = EventsOps.abTestReport(all, "purchase")
      .as[(Long, Long, Long, Long, Double, Double, Double, Option[Double])]
      .head()
    assert(full._2 == na0 && full._4 == nb0,
      "assignment stable across fixtures (same users, same salt)")
    assert(full._5 == 1.0 && full._6 == 1.0 && full._8.isEmpty)
    // mixed conversions: z computable, sign follows arm-1 minus arm-0
    val someIds = (1L to 40L).filter(_ % 3 == 0)
    val mixed = ((1L to 40L).map(u => ev(u, u, "view")) ++
      someIds.map(u => ev(200 + u, u, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val m = EventsOps.abTestReport(mixed, "purchase")
      .as[(Long, Long, Long, Long, Double, Double, Double, Option[Double])]
      .head()
    assert(m._1 == na0 && m._3 == nb0)
    assert(m._2 + m._4 == someIds.size.toLong)
    val z = m._8.getOrElse(fail(s"z must be defined: $m"))
    assert(math.signum(z) == math.signum(m._7), s"z sign = lift sign: $m")
    // hand-verify z from the report's own counts (textbook formula)
    val (pa, pb) = (m._2.toDouble / m._1, m._4.toDouble / m._3)
    val pool = (m._2 + m._4).toDouble / (m._1 + m._3)
    val se = math.sqrt(pool * (1 - pool) * (1.0 / m._1 + 1.0 / m._3))
    assert(math.abs(z - (pb - pa) / se) < 1e-5, s"z arithmetic: $m")
    // a fresh salt re-buckets: with the conversion pattern fixed, some
    // converter must land differently (40 users, 13 converters — a
    // bitwise-identical re-bucketing under an independent hash would
    // need all 40 assignments to coincide)
    val reassigned = EventsOps.abTestReport(mixed, "purchase", salt = "s2")
      .as[(Long, Long, Long, Long, Double, Double, Double, Option[Double])]
      .head()
    assert(reassigned._1 + reassigned._3 == 40L &&
      reassigned._2 + reassigned._4 == someIds.size.toLong)
    assert((reassigned._1, reassigned._2, reassigned._3, reassigned._4)
      != ((m._1, m._2, m._3, m._4)), "salt drives assignment")
  }

  test("expSmooth: adjusted EWMA at alpha=1/2 matches the closed form, " +
      "caps history at span, and is partitioning-invariant") {
    // 25 events for one user (exercises the 20-row span cap), 1 for another
    val rows = (1 to 25).map { i =>
      (i.toLong, ts(f"2024-01-01 10:${i}%02d:00"), 7L, "m", i * 1.5 + 0.000001, "{}")
    } :+ (99L, ts("2024-01-01 10:00:00"), 9L, "m", 42.25, "{}")
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventsOps.expSmooth(df, span = 20)
      .select($"event_id", $"n_window", $"ewma")
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r).toMap

    // reference: integer-weight form over the rounded-to-6dp grid
    def ref(xs: Seq[Double]): Double = {
      val window = xs.takeRight(20)
      val num = window.zipWithIndex.map { case (x, i) =>
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
          BigDecimal(BigInt(1) << i)
      }.sum
      (num / 1).toDouble / ((1L << window.size) - 1).toDouble
    }
    val vals = (1 to 25).map(i => i * 1.5 + 0.000001)
    (1 to 25).foreach { t =>
      val (_, n, e) = out(t.toLong)
      assert(n == math.min(t, 20), s"window size at t=$t")
      assert(e == ref(vals.take(t)), s"ewma at t=$t: $e vs ${ref(vals.take(t))}")
    }
    assert(out(99L) == ((99L, 1, 42.25)), "singleton window is the value itself")
    // equivalence to the classical adjusted-EWMA weights within float noise
    val t = 10
    val w = (0 until t).map(k => math.pow(0.5, k)) // k=0 = newest
    val classical = w.zip(vals.take(t).reverse).map { case (a, b) => a * b }.sum / w.sum
    assert(math.abs(out(t.toLong)._3 - classical) < 1e-9, "classical-form parity")
    // exactness: reshuffled input yields bit-identical smoothing
    val again = EventsOps.expSmooth(df.repartition(5), span = 20)
      .select($"event_id", $"n_window", $"ewma")
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(again == out, "partitioning-invariant")
  }

  test("jpegDecodeGate: REAL lossy round trip — exact dims, mean inside " +
      "the tolerance band, garbage bytes fail the gate") {
    val ids = Seq(5L, 13L, 45L, 101L).map(Tuple1(_)).toDF("id")
    // bytes are REAL JPEGs: SOI marker 0xFF 0xD8
    Multimodal.synthesizeJpegs(ids, "id").select("bytes").collect()
      .foreach { r =>
        val b = r.getAs[Array[Byte]](0)
        assert((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8, "JPEG SOI")
      }
    val out = Multimodal.jpegDecodeGate(ids, "id")
      .as[(Long, Boolean, Int, Int, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 4 && out.values.forall(_._2), "all decode")
    out.foreach { case (id, r) =>
      val w = (id % 48 + 8).toInt; val h = (id % 32 + 8).toInt
      assert(r._3 == w && r._4 == h && r._5 == w.toLong * h,
        s"lossy codec must still preserve dims exactly: $r")
      assert(r._6, s"mean luminance outside the 1.5-gray band for $id")
    }
    // a zero tolerance band must FAIL on genuinely lossy content (so the
    // band is live, not vacuous) while dims stay exact
    val strict = Multimodal.jpegDecodeGate(ids, "id", meanTol = 0.0)
      .as[(Long, Boolean, Int, Int, Long, Boolean)].collect()
    assert(strict.forall(_._2) && strict.exists(!_._6),
      "quality-0.85 DCT error is nonzero on at least one image")
  }

  test("imageDHash: indexed-color palettes hash by LUMINANCE, not " +
      "palette order") {
    import java.awt.image._
    // two-entry palette REVERSED (index 0 = white, 1 = black): a
    // raw-raster hash would key on indices (inverted gradient)
    val pal = new IndexColorModel(1, 2,
      Array[Byte](255.toByte, 0), Array[Byte](255.toByte, 0),
      Array[Byte](255.toByte, 0))
    val w = 18; val h = 8
    val idx = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY, pal)
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val dark = x < w / 2
      idx.getRaster.setSample(x, y, 0, if (dark) 1 else 0)
      gray.getRaster.setSample(x, y, 0, if (dark) 0 else 255)
    }
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq((1L, "image", png(idx)), (2L, "image", png(gray)))
      .toDF("media_id", "kind", "bytes")
    val hs = Multimodal.imageDHash(rows).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(hs(1L)._1 && hs(2L)._1)
    assert(hs(1L)._2 == hs(2L)._2,
      "palettized and grayscale renderings of the same picture must hash equal")
    // imageStats shares the convention (r9 consistency fix): the
    // reversed-palette rendering must report pixel BRIGHTNESS, equal
    // to the grayscale rendering — not palette indices
    val st = Multimodal.imageStats(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(5), r.getLong(6))).toMap
    assert(st(1L) == st(2L),
      s"indexed vs grayscale imageStats must agree: ${st(1L)} vs ${st(2L)}")
    assert(st(1L)._1 == (w / 2).toLong * h * 255,
      s"sum_lum must be brightness, not indices: ${st(1L)}")
  }

  test("audioFingerprint: 4-sample-frame energy-delta bits match the " +
      "formula through a REAL WAV round trip; short clips yield null; " +
      "a never-binding clamp is a no-op") {
    def sample(id: Long, i: Int): Int =
      java.lang.Math.floorMod(id * 7919L + i * 104729L, 65536L).toInt - 32768
    def nOf(id: Long): Int = java.lang.Math.floorMod(id, 1984L).toInt + 64
    def fpOf(id: Long, clamp: Int): Option[(Long, Long)] = {
      val n = nOf(id)
      val nf = n / 4
      if (nf < 65) None
      else {
        val e = (0 until nf).map(f => (0 until 4).map { j =>
          val a = math.abs(sample(id, f * 4 + j))
          if (clamp > 0 && a > clamp) clamp.toLong else a.toLong
        }.sum)
        var lo = 0L; var hi = 0L
        for (b <- 0 until 64 if e(b + 1) > e(b))
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        Some((hi, lo))
      }
    }
    // 300 -> n=364 -> 91 frames (fingerprint-able); 30 -> n=94 -> 23
    // frames (too short, null words but n_frames still reported)
    val ids = Seq(300L, 1900L, 30L).map(Tuple1(_)).toDF("id")
    val wav = Multimodal.synthesizeWav(ids, "id")
    val out = Multimodal.audioFingerprint(wav, frameSamples = 4)
      .as[(Long, Boolean, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    for (id <- Seq(300L, 1900L, 30L)) {
      val (_, ok, nf, hi, lo) = out(id)
      assert(ok, s"$id must decode")
      assert(nf == nOf(id) / 4, s"$id frame count")
      val exp = fpOf(id, 0)
      assert(hi == exp.map(_._1) && lo == exp.map(_._2),
        s"$id fp: got ($hi,$lo) want $exp")
    }
    assert(out(30L)._4.isEmpty, "23 frames < 65: no fingerprint")
    // a clamp above the max |sample| (32768) never binds: bit-identical
    val noop = Multimodal.audioFingerprint(wav, frameSamples = 4,
      clampAbs = 32768)
      .as[(Long, Boolean, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(noop == out, "non-binding clamp must be a no-op")
  }

  test("audioNearDups: level-compressed variants pair within Hamming 3 " +
      "where byte hashes cannot; band cap and maxDist bound honored") {
    def dist(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    def sample(id: Long, i: Int): Int =
      java.lang.Math.floorMod(id * 7919L + i * 104729L, 65536L).toInt - 32768
    def nOf(id: Long): Int = java.lang.Math.floorMod(id, 1984L).toInt + 64
    def fpOf(id: Long, clamp: Int): Option[(Long, Long)] = {
      val nf = nOf(id) / 4
      if (nf < 65) None
      else {
        val e = (0 until nf).map(f => (0 until 4).map { j =>
          val a = math.abs(sample(id, f * 4 + j))
          if (clamp > 0 && a > clamp) clamp.toLong else a.toLong
        }.sum)
        var lo = 0L; var hi = 0L
        for (b <- 0 until 64 if e(b + 1) > e(b))
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        Some((hi, lo))
      }
    }
    // pick two ids whose clamped variant stays within Hamming 3 and one
    // that drifts beyond — both branches of the verify exercised
    val cands = (260L to 1900L).flatMap { i =>
      for (a <- fpOf(i, 0); b <- fpOf(i, 16000)) yield i -> dist(a, b)
    }
    val near = cands.filter(_._2 <= 3).map(_._1).take(2)
    val far = cands.filter(_._2 > 3).map(_._1).take(1)
    assert(near.size == 2 && far.size == 1,
      s"fixture needs both branches: ${cands.take(20)}")
    val baseIds = (near ++ far).map(Tuple1(_)).toDF("id")
    val wav = Multimodal.synthesizeWav(baseIds, "id")
    val fpO = Multimodal.audioFingerprint(wav, frameSamples = 4)
    val fpV = Multimodal.audioFingerprint(wav, frameSamples = 4,
      clampAbs = 16000)
      .withColumn("media_id", $"media_id" + 100000L)
    val pairs = Multimodal.audioNearDups(fpO.unionByName(fpV))
      .as[(Long, Long, Int)].collect().toSeq.sorted
    val variantPairs = pairs.filter(p => p._2 - p._1 == 100000L).map(_._1)
    assert(variantPairs.toSet == near.toSet,
      s"clamp-survivors pair, the drifted id does not: $pairs")
    // band cap: 65 identical fingerprints overflow maxBandFreq=64
    val many = (0L until 65L).map(Tuple1(_)).toDF("media_id")
      .select($"media_id", lit(true).as("decode_ok"),
        lit(42L).as("fp_hi"), lit(7L).as("fp_lo"))
    assert(Multimodal.audioNearDups(many).count() == 0L, "cap drops bucket")
    assertThrows[IllegalArgumentException] {
      Multimodal.audioNearDups(many, maxDist = 4)
    }
  }
}
