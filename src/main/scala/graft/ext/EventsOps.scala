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

  /** First-order Markov transition matrix over each user's event
    * stream: (from_type, to_type, n, p) for every observed consecutive
    * pair, p conditioned on the from state — the behavioral summary a
    * next-event model trains on, and the quickest anomaly screen for
    * instrumentation bugs (impossible transitions appearing).
    *
    * Scale shape: ONE shuffle on user_id for the per-user lead window
    * (each user's stream sorts within its partition); the pair count is
    * map-side combined, and the from-state marginal runs as a window
    * over the PAIR frame, which is bounded by |types|^2 — so nothing
    * downstream of the first exchange scales with volume. */
  def transitionMatrix(events: DataFrame,
      tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts") +: tieBreak.map(col): _*)
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from").cast("double"), 6)
          .as("p"))
  }

  /** A/B experiment readout with deterministic hash assignment: each
    * user lands in arm 0/1 via hash64(user_id|salt) — the standard
    * stateless bucketing (no assignment table to join, re-derivable
    * anywhere) — conversion is "has >= 1 `convType` event", and the
    * report is the two-proportion pooled z statistic (Fleiss, public
    * textbook form). |z| >~ 1.96 is the usual 5% call; the sign is
    * arm1 minus arm0. z is null when either arm is empty or the pooled
    * rate is degenerate (0 or 1 — no variance to test against).
    *
    * Scale shape: one user-keyed conversion agg (map-side combined),
    * one 2-row arm agg, then scalar arithmetic on a 1-row frame. The
    * assignment hash is a narrow expression — no join, no broadcast,
    * nothing driver-side. */
  def abTestReport(events: DataFrame, convType: String,
      salt: String = "ab"): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("conv"))
    // coalesce BEFORE concat_ws: a null user_id must hash as the empty
    // string in both engines, not silently drop its separator
    val arm = graft.functions.Hashing.hash64(
      concat_ws("|", coalesce(col("user_id").cast("string"), lit("")),
        lit(salt))) % 2L
    val arms = users.withColumn("arm", arm)
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
    val one = arms.agg(
      sum(when(col("arm") === 0L, col("n_users"))).as("n_a"),
      sum(when(col("arm") === 0L, col("n_conv"))).as("conv_a"),
      sum(when(col("arm") === 1L, col("n_users"))).as("n_b"),
      sum(when(col("arm") === 1L, col("n_conv"))).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    one.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      round(pb - pa, 6).as("lift"),
      when(col("n_a") > 0 && col("n_b") > 0 && pool > 0 && pool < 1,
        round((pb - pa) / se, 6)).as("z"))
  }

  /** Ordered conversion funnel: stage i is reached when the user has an
    * event of `stages(i)` at-or-after their stage i-1 time (>=, so a
    * same-instant next stage counts; each stage time is the EARLIEST
    * qualifying event). Returns one row per stage: (stage_idx, stage,
    * n_users).
    *
    * Scale shape: one filtered min-agg per stage plus a user-keyed join
    * per stage transition — all shuffles are on user_id, so with k
    * stages this is k co-partitioned passes (AQE merges the exchanges),
    * never a window over the whole event stream. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_0"))
    val reached = stages.zipWithIndex.tail.scanLeft(first) {
      case (prev, (stage, i)) =>
        events.filter(col("event_type") === stage)
          .join(prev, Seq("user_id"))
          .filter(col("ts") >= col(s"t_${i - 1}"))
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"t_$i"))
    }
    reached.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(stage).as("stage"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Cohort retention: users are grouped by their first-activity DAY
    * (any event type); retention counts distinct users active again
    * `offset` days later, offset in [0, maxOffsetDays]. Returns
    * (cohort_day string, offset_days, n_users).
    *
    * The distinct runs BEFORE the count (project + distinct + narrow
    * count) — not countDistinct inside the agg, whose Expand multiplies
    * the event stream at 100 TB. */
  def cohortRetention(events: DataFrame, maxOffsetDays: Int = 7): DataFrame = {
    val cohorts = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    events.select(col("user_id"), to_date(col("ts")).as("event_day"))
      .join(cohorts, Seq("user_id"))
      .withColumn("offset_days", datediff(col("event_day"), col("cohort_day")))
      .filter(col("offset_days") >= 0 && col("offset_days") <= maxOffsetDays)
      .select(col("user_id"), col("cohort_day"), col("offset_days"))
      .distinct()
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days"), col("n_users"))
  }

  /** Trailing time-window moving aggregate (RANGE frame, not ROWS: the
    * window is [ts - windowSec, ts] in EVENT TIME, so bursts contribute
    * all their rows and quiet gaps contribute nothing — a rows-frame
    * would silently change meaning with event density). One shuffle on
    * user_id; exact decimal sum, single final division (cross-engine
    * bit-stable). */
  def movingAverage(events: DataFrame, windowSec: Long = 3600): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__epoch"))
      .rangeBetween(-windowSec, 0)
    events
      .withColumn("__epoch", unix_timestamp(col("ts")))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window",
        sum(col("value").cast("decimal(18,2)")).over(w))
      .withColumn("avg_window",
        col("sum_window").cast("double") / col("n_window").cast("double"))
      .drop("__epoch", "sum_window")
  }

  /** Trailing-window z-score anomaly flag per event — the streaming-ish
    * metric monitor: each event's `value` scored against the mean and
    * population variance of its user's trailing `windowSec` window
    * (self-inclusive, like [[movingAverage]]). An event is anomalous
    * when (v-mean)^2 > thresh^2 * variance — the squared form needs no
    * sqrt, so every op stays engine-portable correctly-rounded double
    * arithmetic over EXACT decimal window sums (count/sum/sum-of-squares
    * are order-free decimals; the window frame is the only shuffle; no
    * second pass). Singleton windows have variance 0 and never flag.
    *
    * At 100 TB the shape holds: one range-frame window per user
    * partition, three co-computed frame aggregates (Spark evaluates
    * them in one WindowExec pass), state bounded by windowSec. */
  def movingZScore(events: DataFrame, windowSec: Long = 3600,
      zThresh: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__epoch"))
      .rangeBetween(-windowSec, 0)
    val v = col("value").cast("decimal(18,2)")
    val mean = col("sum_w").cast("double") / col("n_window").cast("double")
    events
      .withColumn("__epoch", unix_timestamp(col("ts")))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_w", sum(v).over(w))
      .withColumn("sumsq_w", sum(v * v).over(w))
      .withColumn("mean_w", mean)
      // E[v^2] - mean^2: both terms one correctly-rounded op from exact
      // inputs; association mirrored verbatim in the oracle
      .withColumn("var_w",
        col("sumsq_w").cast("double") / col("n_window").cast("double")
          - col("mean_w") * col("mean_w"))
      // deviation measured on the same cents grid the moments use
      .withColumn("dev", v.cast("double") - col("mean_w"))
      // var>0 guard: an all-equal window's variance rounds to +-1 ULP
      // noise; requiring strict positivity keeps singletons and
      // constant windows unflagged in both engines
      .withColumn("is_anomaly",
        col("n_window") > 1 && col("var_w") > 0.0 &&
          col("dev") * col("dev") > lit(zThresh * zThresh) * col("var_w"))
      .drop("__epoch", "sum_w", "sumsq_w", "dev")
  }

  /** Per-user exponentially-weighted moving average (the monitoring
    * baseline a drift/anomaly pipeline smooths its metrics with) —
    * pandas-style ADJUSTED EWMA at alpha = 1/2 over a bounded trailing
    * history of `span` rows:
    *
    *   ewma_t = sum_{k=0..L-1} (1/2)^k x_{t-k} / sum_{k=0..L-1} (1/2)^k
    *
    * with L = min(t+1, span). alpha = 1/2 is the one smoothing constant
    * whose weights are POWERS OF TWO, which makes the whole computation
    * exact integer arithmetic: multiply the k-th-oldest value in the
    * window by 2^k (position in the frame list), sum as DECIMAL (exact,
    * order-free), divide once by 2^L - 1. No float power, no float
    * accumulation — one correctly-rounded double division at the end,
    * so the result is bit-identical across engines and partitionings.
    * The span cap bounds both state and the 2^k weight (span <= 62).
    *
    * Scale shape: one rows-frame window per user partition — the same
    * single exchange movingAverage uses; the frame list is at most
    * `span` decimals per row and never leaves the window operator.
    *
    * Precondition: `value` non-null (collect_list skips nulls, which
    * would silently shorten the window — coalesce upstream on nullable
    * metrics) and |value| < ~1e12 (the decimal(18,6) grid). */
  def expSmooth(events: DataFrame, span: Int = 20): DataFrame = {
    require(span >= 1 && span <= 62, s"span must be in [1, 62]: $span")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__epoch"), col("event_id"))
      .rowsBetween(-(span - 1), 0)
    // frame-ordered trailing values on a fixed decimal grid (oldest
    // first — collect_list follows the window's total order)
    val xs = collect_list(round(col("value"), 6).cast("decimal(18,6)"))
      .over(w)
    val len = size(col("__xs"))
    // fold oldest-first carrying (sum, weight): element i gets weight
    // 2^i — exact decimal*integer products, order-fixed exact adds
    val num = aggregate(
      col("__xs"),
      struct(lit(0).cast("decimal(38,6)").as("s"),
        lit(1L).as("w")),
      (acc, x) => struct(
        (acc.getField("s") + (x * acc.getField("w")).cast("decimal(38,6)"))
          .cast("decimal(38,6)").as("s"),
        (acc.getField("w") * lit(2L)).as("w")),
      acc => acc.getField("s"))
    // denominator 2^L - 1: L <= span <= 62 keeps the long shift exact;
    // pow(2.0, n) is IEEE-exact for n in this range
    val denom = pow(lit(2.0), len.cast("double")) - lit(1.0)
    events
      .withColumn("__epoch", unix_timestamp(col("ts")))
      .withColumn("__xs", xs)
      .withColumn("n_window", len.cast("int"))
      .withColumn("ewma", num.cast("double") / denom)
      .drop("__epoch", "__xs")
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

  /** Resample + forward-fill: each user's `value` series regularized to
    * a fixed `bucketSec` grid between that user's first and last event
    * — the pandas `resample().ffill()` staple, distributed. Buckets
    * with events take the bucket's LAST value (deterministic: latest
    * ts, event id as tie-break); empty buckets carry the previous
    * value forward and are marked `is_gap`. Values are carried, never
    * recomputed, so the output is bit-identical across engines.
    *
    * Scale shape: in-bucket last = one max-struct partial agg (no
    * window over raw events); the per-user spine explodes from one
    * bounds row per user (span-bounded, same argument as [[timeGaps]]);
    * the forward fill is a per-user window over BUCKET rows (hours,
    * not events). Nothing global, nothing single-partition. */
  def resampleFill(events: DataFrame, bucketSec: Long = 3600): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val bucketed = events.select(col("user_id"),
      expr(s"unix_timestamp(ts) div ${bucketSec}L").as("bucket"),
      unix_timestamp(col("ts")).as("__sec"), col("event_id"), col("value"))
    // last event of each occupied (user, bucket): max-struct keeps the
    // partial agg; (sec, event_id) is a total order
    val lastPer = bucketed.groupBy(col("user_id"), col("bucket"))
      .agg(max(struct(col("__sec"), col("event_id"), col("value")))
        .as("__last"))
      .select(col("user_id"), col("bucket"),
        col("__last.value").as("__v"))
    val spine = lastPer.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col("user_id"),
        explode(sequence(col("__mn"), col("__mx"))).as("bucket"))
    val wFill = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    spine.join(lastPer, Seq("user_id", "bucket"), "left")
      .withColumn("value_filled", last(col("__v"), ignoreNulls = true).over(wFill))
      .withColumn("is_gap", col("__v").isNull)
      .select(col("user_id"), col("bucket"),
        (col("bucket") * bucketSec).as("bucket_start_sec"),
        col("value_filled"), col("is_gap"))
  }

  /** Resample + LINEAR interpolation — the `interpolate()` sibling of
    * [[resampleFill]]: interior gaps take the straight line between the
    * surrounding known bucket values, leading gaps stay null (nothing
    * to anchor the left end), trailing gaps carry the last known value.
    * Interpolation arithmetic is three correctly-rounded double ops
    * from integer bucket distances, mirrored verbatim in the oracle.
    *
    * Scale shape: identical to resampleFill (same staged frames) plus
    * one forward-looking window per user over bucket rows. */
  def resampleInterpolate(events: DataFrame, bucketSec: Long = 3600)
      : DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val bucketed = events.select(col("user_id"),
      expr(s"unix_timestamp(ts) div ${bucketSec}L").as("bucket"),
      unix_timestamp(col("ts")).as("__sec"), col("event_id"), col("value"))
    val lastPer = bucketed.groupBy(col("user_id"), col("bucket"))
      .agg(max(struct(col("__sec"), col("event_id"), col("value")))
        .as("__last"))
      .select(col("user_id"), col("bucket"), col("__last.value").as("__v"))
    val spine = lastPer.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col("user_id"),
        explode(sequence(col("__mn"), col("__mx"))).as("bucket"))
    val W = org.apache.spark.sql.expressions.Window
    val back = W.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val fwd = W.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(W.currentRow, W.unboundedFollowing)
    val knownB = when(col("__v").isNotNull, col("bucket"))
    spine.join(lastPer, Seq("user_id", "bucket"), "left")
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pb", last(knownB, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nb", first(knownB, ignoreNulls = true).over(fwd))
      .withColumn("value_interp",
        when(col("__v").isNotNull, col("__v"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              ((col("bucket") - col("__pb")).cast("double") /
                (col("__nb") - col("__pb")).cast("double")))
          .when(col("__pv").isNotNull, col("__pv")) // trailing: carry last
          .otherwise(lit(null).cast("double")))     // leading: no anchor
      .withColumn("is_gap", col("__v").isNull)
      .select(col("user_id"), col("bucket"),
        (col("bucket") * bucketSec).as("bucket_start_sec"),
        col("value_interp"), col("is_gap"))
  }

  /** Coverage-gap detector: time buckets between the stream's first and
    * last event that contain ZERO events — the "did ingestion silently
    * stop for an hour" monitor every event pipeline wants on a
    * dashboard. Returns (bucket, gap_start) per missing bucket, where
    * bucket = floor(epoch / bucketSeconds).
    *
    * Scale shape: present buckets come from one partial-agg distinct
    * (the shuffle carries one row per OCCUPIED bucket — hours, not
    * events); the calendar spine explodes from a single bounds row
    * (span-bounded: a decade of hours is ~90k rows) and anti-joins the
    * present set broadcast-style. Event rows are scanned once,
    * narrowly. */
  def timeGaps(events: DataFrame, tsCol: String,
      bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val present = events
      .select(expr(s"unix_timestamp(`$tsCol`) div ${bucketSeconds}L")
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("__n"))
      .select(col("bucket"))
    val bounds = present.agg(min(col("bucket")).as("__mn"),
      max(col("bucket")).as("__mx"))
    val spine = bounds
      .filter(col("__mn").isNotNull) // empty input -> no spine, no gaps
      .select(explode(sequence(col("__mn"), col("__mx"))).as("bucket"))
    spine.join(present, Seq("bucket"), "left_anti")
      .select(col("bucket"),
        date_format(timestamp_seconds(col("bucket") * bucketSeconds),
          "yyyy-MM-dd HH:mm:ss").as("gap_start"))
  }
}
