package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Operations over the `events` table (event_id, ts, user_id, event_type,
  * value, props-JSON) — the batch faces of the streaming profile.
  */
object EventsOps {

  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** Parse the JSON `props` column into typed fields. */
  def withProps(events: DataFrame): DataFrame =
    events.withColumn("props_k",
      get_json_object(col("props"), "$.k").cast(LongType))

  /** Tumbling-window profile: per (hour, event_type) counts + exact value
    * sums. Partial aggregation is map-side; one shuffle on the composite
    * key. */
  def hourlyProfile(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Sessionization: a session breaks after `gapMinutes` of user
    * inactivity. One shuffle (partition by user, order by ts); session
    * ids are a running sum of break flags — the standard gaps-and-islands
    * plan, no state kept on the driver. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    // tie-break makes the per-user ordering total (deterministic across
    // engines/runs when two events share a timestamp)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts") +: tieBreak.map(col): _*)
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_ts", "new_session")
  }

  /** Per-session rollup: bounds, length, event count. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30,
      tieBreak: Seq[String] = Seq("event_id")): DataFrame =
    sessionize(events, gapMinutes, tieBreak)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .withColumn("duration_sec",
        unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")))
}
