package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamProfile
import graft.streaming.StreamProfile.UserEvent

/** Dev driver: exercises the streaming API end-to-end outside the test
  * harness (both timeout modes). */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(s: String) = Timestamp.valueOf(s)
    for ((mode, evict) <- Seq("NoTimeout" -> None, "ProcessingTime" -> Some("10 minutes"))) {
      val input = MemoryStream[UserEvent]
      val q = StreamProfile.runningUserStats(input.toDS(), evict)
        .writeStream.format("memory").queryName(s"drive_$mode")
        .outputMode(OutputMode.Update).start()
      input.addData(UserEvent(1, ts("2024-01-01 10:00:00"), 2.0),
        UserEvent(1, ts("2024-01-01 10:01:00"), 3.0))
      if (evict.isEmpty) q.processAllAvailable()
      else { q.awaitTermination(8000); () } // timeout mode: sweep batches keep the query "busy"
      input.addData(UserEvent(1, ts("2024-01-01 10:05:00"), 5.0))
      if (evict.isEmpty) q.processAllAvailable()
      else { q.awaitTermination(8000); () }
      val rows = spark.table(s"drive_$mode").collect().map(_.toString).mkString(" ")
      println(s"[drive] $mode -> $rows")
      q.stop()
    }
    // streaming sessionization drive
    val input3 = MemoryStream[UserEvent]
    val q3 = StreamProfile.streamingSessions(
      input3.toDS().withWatermark("ts", "2 hours").as[UserEvent], 30)
      .writeStream.format("memory").queryName("drive_sessions")
      .outputMode(OutputMode.Append).start()
    input3.addData(UserEvent(7, ts("2024-01-01 09:00:00"), 1.0),
      UserEvent(7, ts("2024-01-01 09:10:00"), 2.0))
    q3.processAllAvailable()
    // late in-watermark event BEFORE session start: must merge and pull start back
    input3.addData(UserEvent(7, ts("2024-01-01 08:55:00"), 0.5))
    q3.processAllAvailable()
    input3.addData(UserEvent(7, ts("2024-01-01 13:00:00"), 9.0))
    q3.processAllAvailable()
    println(s"[drive] sessions -> " + spark.table("drive_sessions").collect().mkString(" "))
    q3.stop()
    spark.stop()
  }
}
