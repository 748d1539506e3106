package graft

import java.sql.Timestamp

import graft.ext.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof join picks the latest right row at-or-before each left row, per key") {
    val trades = Seq(
      (1L, 7L, ts("2024-01-01 10:00:05")),
      (2L, 7L, ts("2024-01-01 10:00:30")),
      (3L, 9L, ts("2024-01-01 10:00:10")))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      (101L, 7L, ts("2024-01-01 10:00:00")),
      (102L, 7L, ts("2024-01-01 10:00:05")), // exactly at trade 1 -> included
      (103L, 7L, ts("2024-01-01 10:00:20")),
      (104L, 8L, ts("2024-01-01 09:00:00"))) // wrong key
      .toDF("event_id", "sym", "ts")
    val out = Relational.asofJoin(trades, quotes, "sym", "ts", Seq("event_id"))
      .orderBy("trade_id")
      .select("trade_id", "asof_event_id").collect()
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 102L) // tie included
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 103L) // latest prior
    assert(out(2).getLong(0) == 3L && out(2).isNullAt(1))        // no quote for sym 9
  }

  test("range join matches rows to containing intervals across bucket edges") {
    val points = Seq(
      (1L, ts("2024-01-01 10:59:59")),
      (2L, ts("2024-01-01 11:00:01")),
      (3L, ts("2024-01-01 13:00:00")))
      .toDF("id", "ts")
    val intervals = Seq(
      (10L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00")))
      .toDF("iv_id", "start_ts", "end_ts")
    val out = Relational.rangeJoinByBucket(points, intervals,
      "ts", "start_ts", "end_ts", bucketSeconds = 3600)
      .select("id", "iv_id").as[(Long, Long)].collect().toSet
    // 1 and 2 fall inside the interval (straddling the hour boundary); 3 outside
    assert(out == Set((1L, 10L), (2L, 10L)))
  }
}
