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

  test("resize keeps frame count, updates dimensions") {
    val media = Multimodal.synthesize(Seq(10L).toDF("doc_id"), "doc_id", "img")
    val r = Multimodal.resize(media, 224, 224).select("meta.*").head()
    assert(r.getAs[Int]("width") == 224 && r.getAs[Int]("n_frames") == 11)
  }
}
