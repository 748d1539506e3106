package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming faces of the profiling tier: the same
  * detect-missions aggregates expressed over an unbounded `events` stream.
  *
  * Watermarking bounds state: late rows beyond the watermark are dropped,
  * windows older than (watermark) are finalized and evicted — state size
  * is O(active windows x event types), independent of stream length.
  */
object StreamProfile {

  /** Event-time tumbling-window profile with late-data handling.
    * `readStream -> withWatermark -> window-agg`; append mode emits each
    * window once, when the watermark passes its end. */
  def hourlyProfile(events: DataFrame, watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact deduplication: drop events whose `idCols` tuple was
    * already seen — the streaming face of T9/exact-dedup, and the
    * standard at-least-once -> effectively-once repair for event
    * pipelines. State holds one entry per distinct id INSIDE the
    * watermark horizon: because `ts` is part of the dedup state's event
    * time, entries older than the watermark are evicted, so state is
    * bounded by id-arrival rate x watermark, not stream history.
    * Requires duplicates to land within `watermark` of the original —
    * the standard trade (plain dropDuplicates on ids alone never
    * evicts). */
  def dedupEvents(events: DataFrame, idCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming quality monitor: per-window null/total counts for `value` —
    * the streaming equivalent of the null-mission detector (P6). */
  /** Hourly data-quality monitor: event volume, null/NaN value counts,
    * user cardinality per event-time window. `exact = false` (the
    * 100 TB default) uses the HLL sketch for users — fixed-size state;
    * `exact = true` uses the exact distinct (oracle-checkable, the
    * q_profile exact/approx twin discipline) — state grows with
    * distinct users per window, bounded by the watermark. */
  def qualityMonitor(events: DataFrame, watermark: String = "2 hours",
      exact: Boolean = false): DataFrame = {
    val users =
      if (exact) countDistinct(col("user_id")).as("n_users")
      else approx_count_distinct(col("user_id")).as("n_users")
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("value").isNull || isnan(col("value")), 1)).as("n_null_value"),
        users)
      .select(col("w.start").as("hour"), col("n_events"),
        col("n_null_value"), col("n_users"))
  }

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Streaming sessionization: one output row per CLOSED session, via
    * flatMapGroupsWithState with event-time timeout.
    *
    * A session closes when (a) a later event arrives more than
    * `gapMinutes` after the session's end, or (b) the watermark passes
    * session_end + gap (timeout fires with no newer event). State per
    * user is one open session — O(active users), eviction guaranteed by
    * the timeout, late events beyond the watermark dropped upstream.
    * Requires `withWatermark("ts", ...)` on the input. */
  def streamingSessions(events: Dataset[UserEvent], gapMinutes: Int = 30)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[SessionState]) =>
          def toOut(s: SessionState): SessionOut = SessionOut(userId,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
            s.n, s.total)
          if (state.hasTimedOut) {
            val closed = state.getOption.map(toOut).toSeq
            state.remove()
            closed.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                // late event from before the open session minus the gap:
                // it cannot extend backwards into territory the watermark
                // already passed — emit it as its own closed session
                case Some(s) if t < s.start - gapMs =>
                  closed += SessionOut(userId, new java.sql.Timestamp(t),
                    new java.sql.Timestamp(t), 1L, e.value)
                // within the gap on either side: merge, extending BOTH
                // bounds (a late in-watermark event may precede start)
                case Some(s) if t <= s.end + gapMs =>
                  open = Some(SessionState(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += toOut(s)
                  open = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Stream-stream interval (inner) join: left rows matched to right
    * rows with the same key whose event time falls in
    * [leftTs, leftTs + withinMinutes]. The sixth stateful operator
    * class (after window aggs, watermark dedup, mapGroupsWithState,
    * flatMapGroupsWithState sessions, and append eviction): BOTH sides
    * buffer rows in the state store, and the combination of the two
    * watermarks with the time-range join condition lets Spark compute a
    * state watermark per side and EVICT buffered rows that can no
    * longer match (public semantics: the state-cleanup condition is
    * derived from the range predicate, so left state is held for
    * `withinMinutes` past the right watermark and vice versa). Without
    * the range condition an inner stream-stream join would buffer both
    * streams forever — the range IS the scale bound.
    *
    * Inner-join emission is not watermark-gated (matches emit in the
    * micro-batch where both sides are present), so the complete result
    * equals the batch join — which is exactly what the oracle runs.
    * Callers must `withWatermark` both inputs before calling. */
  /** Continuous-crawl near-dup screening — the production shape for
    * dedup in a training-data INGESTION pipeline: a micro-batched
    * document stream where each batch is checked against the
    * accumulated SURVIVOR INDEX (batch-vs-index banded minhash,
    * [[graft.ext.Dedup.incrementalNearDups]]) and only its survivors
    * join the index. Implemented with `foreachBatch`: the batch hook is
    * where streaming meets arbitrary batch operators — exactly what
    * Structured Streaming provides it for.
    *
    * Per micro-batch: O(batch) work against the capped index (never
    * index x index); near-dup pairs are APPENDED to `pairsOut` as
    * parquet (a real sink — no driver collects); the index evolves as
    * `index ∪ (batch \ matched)`, with a `localCheckpoint` per batch to
    * cut the union lineage (the dedup family's pin discipline). The
    * FIRST batch seeds the index by definition (nothing to compare
    * against); within-batch duplicates are the batch dedup family's
    * job, same contract as the batch incremental operator.
    *
    * Determinism contract: one source file per micro-batch
    * (`maxFilesPerTrigger=1`, mtime-ordered staging) makes the
    * batch sequence — and therefore the evolving index — reproducible,
    * which is what lets the face put a STREAMING dedup run under the
    * DuckDB oracle. */
  def crawlDedupStream(docStream: DataFrame, idCol: String,
      textCol: String, pairsOut: String, threshold: Double = 0.8,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      maxBucket: Int = 64): Unit = {
    val spark = docStream.sparkSession
    // seed the sink with a typed empty frame so a pairless run still
    // reads back with the right schema
    import org.apache.spark.sql.types._
    val pairSchema = StructType(Seq(
      StructField("batch_id", LongType), StructField("index_id", LongType),
      StructField("jaccard", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairSchema)
      .write.mode("overwrite").parquet(pairsOut)
    var index: Option[DataFrame] = None
    val q = docStream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.select(col(idCol), col(textCol)).localCheckpoint(true)
        index match {
          case None => index = Some(b)
          case Some(idx) =>
            val pairs = graft.ext.Dedup.incrementalNearDups(idx, b,
              idCol, textCol, threshold, shingleN, k, bands, maxBucket)
            pairs.write.mode("append").parquet(pairsOut)
            val surv = b.join(
              pairs.select(col("batch_id").as(idCol)).distinct(),
              Seq(idCol), "left_anti")
            index = Some(idx.unionByName(surv).localCheckpoint(true))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  def intervalJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      withinMinutes: Int): DataFrame =
    left.join(right, expr(
      s"$leftKey = $rightKey AND $rightTs >= $leftTs AND " +
        s"$rightTs <= $leftTs + INTERVAL $withinMinutes MINUTES"))

  /** Stream-static enrichment join — the dimension-lookup shape of
    * every production event pipeline (events arrive as a stream, the
    * user/product/geo dimension lives in a table). Stateless: no
    * watermark, no state store — Spark re-plans the join per
    * micro-batch, so the static side is re-read and (at dimension
    * size) BROADCAST each batch, which is also what picks up dimension
    * updates between batches at no extra machinery. At 100 TB-stream
    * scale the knobs are the usual batch-join ones (broadcast
    * threshold, bucketed dim) — nothing stream-specific accumulates. */
  def enrichEvents(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey))

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count + value total. Pass `evictAfter` (e.g. "1 hour") in production
    * so idle keys time out and state stays bounded; None disables the
    * timeout (and the extra timeout-sweep micro-batches it schedules —
    * keep None in tests that rely on processAllAvailable returning). */
  def runningUserStats(events: Dataset[UserEvent],
      evictAfter: Option[String] = None): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (evictAfter.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](timeoutConf) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserStats]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0))
            val buf = rows.foldLeft(prev)((s, e) =>
              UserStats(userId, s.n_events + 1, s.total_value + e.value))
            state.update(buf)
            evictAfter.foreach(state.setTimeoutDuration)
            buf
          }
      }
  }

  final case class ShardCandidates(shard: Int, candidates: Seq[String])

  /** Streaming heavy-hitter CANDIDATES: a sharded Misra-Gries sketch
    * over an unbounded key column (Misra & Gries 1982, public; the
    * streaming face of [[graft.ext.Relational.heavyHitters]]). Each
    * key hashes to one shard; each shard keeps at most `capacity`
    * counters in mapGroupsWithState (hit -> increment; miss with room
    * -> insert; miss at capacity -> decrement all, drop zeros). State
    * is O(shards x capacity) FOREVER, independent of stream length or
    * key cardinality — that bound is the whole point.
    *
    * Guarantee (per shard, any arrival order): every key whose total
    * count exceeds shardEvents/(capacity+1) survives in that shard's
    * counters; since a key's events all hash to one shard, any key
    * with GLOBAL count > totalEvents/(capacity+1) is in the union of
    * shard candidates. So with capacity >= 1/support, the candidate
    * union is a SUPERSET of the true support-heavy hitters — an exact
    * re-count + threshold downstream makes the final answer
    * sketch-independent and deterministic (the q_stream_topk face; the
    * same superset-refine contract as the batch freqItems path).
    * Candidate SETS between the guaranteed keys vary with arrival
    * order — consume them only through a re-count.
    *
    * Scale shape: `shards` spreads sketch work across tasks (one
    * group = one task's state row); raise it with input rate. Null
    * keys are dropped (a count of nulls is a different query). */
  def heavyHitterCandidates(events: DataFrame, keyCol: String,
      capacity: Int, shards: Int = 16): Dataset[ShardCandidates] = {
    import events.sparkSession.implicits._
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(shards > 0, s"shards must be positive: $shards")
    events
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("k"),
        pmod(xxhash64(col(keyCol).cast("string")), lit(shards))
          .cast("int").as("shard"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .mapGroupsWithState[Map[String, Long], ShardCandidates](
        GroupStateTimeout.NoTimeout) { (shard, rows, state) =>
        var m = state.getOption.getOrElse(Map.empty[String, Long])
        rows.foreach { case (k, _) =>
          m.get(k) match {
            case Some(v) => m = m.updated(k, v + 1L)
            case None if m.size < capacity => m = m.updated(k, 1L)
            case None =>
              m = m.flatMap { case (kk, v) =>
                if (v > 1L) Some(kk -> (v - 1L)) else None }
          }
        }
        state.update(m)
        ShardCandidates(shard, m.keys.toSeq.sorted)
      }
  }

  final case class KmvState(hashes: Seq[Long])
  final case class KmvOut(g: String, n_kept: Long, kth_hash: Long,
      est_distinct: Double)

  /** Streaming twin of [[graft.profile.Profiler.kmvDistinct]]: the KMV
    * distinct sketch AS KEYED STREAMING STATE. The bottom-k-distinct-
    * hashes set is exactly the mergeable summary the batch operator
    * computes, so the stream maintains it incrementally — each batch's
    * hashes union into the state and the k smallest survive — and the
    * emitted estimate is BIT-IDENTICAL to running the batch sketch
    * over everything seen so far, regardless of how the stream is
    * micro-batched or ordered (a min-set is order-free, unlike the
    * EWMA's sequence state). Input rows are (group, portable-hash)
    * pairs — hash upstream with `Hashing.hash64` so stream and batch
    * share the one hash definition. State per key is <= k longs. */
  def streamKmvDistinct(hashed: Dataset[(String, Long)], k: Int = 64)
      : Dataset[KmvOut] = {
    require(k >= 2, s"k must be >= 2: $k")
    import hashed.sparkSession.implicits._
    hashed.groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvOut](GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)], state: GroupState[KmvState]) =>
          val prev = state.getOption.map(_.hashes).getOrElse(Seq.empty)
          val merged = (prev.iterator ++ rows.map(_._2))
            .toVector.distinct.sorted.take(k)
          state.update(KmvState(merged))
          val n = merged.size.toLong
          val est =
            if (n < k) n.toDouble
            else (k - 1).toDouble * math.pow(2.0, 60) / merged.last.toDouble
          KmvOut(g, n, merged.last, est)
      }
  }

  final case class WSampleRow(g: String, id: Long, w: Long, key: Double)
  final case class WSampleState(rows: Seq[(Double, Long, Long)],
      nSeen: Long)
  final case class WSampleOut(g: String, n_seen: Long, ids: Seq[Long],
      ws: Seq[Long])

  /** Streaming twin of [[graft.ext.Sampling.weightedSample]]: the
    * Efraimidis-Spirakis competition keys AS KEYED STREAMING STATE.
    * The k LARGEST (key desc, id asc) pairs per group are an order-free
    * bounded MAX-SET — the dual of [[streamKmvDistinct]]'s min-set —
    * so the streamed sample is a pure function of the row set and
    * BIT-IDENTICAL to the batch sample however the stream is
    * micro-batched: a proper weighted sample without replacement,
    * maintained incrementally over an unbounded stream in k rows of
    * state per group. Input rows carry the key ALREADY computed by the
    * batch operator's expression (rounded@12 — the same cross-engine
    * discipline), so stream and batch share one key definition.
    * `n_seen` counts rows ever seen per group — monotone, so the
    * final state row per group is selectable deterministically from
    * an update-mode sink (max n_seen). */
  def streamWeightedSample(rows: Dataset[WSampleRow], k: Int)
      : Dataset[WSampleOut] = {
    require(k >= 1, s"k must be >= 1: $k")
    import rows.sparkSession.implicits._
    rows.groupByKey(_.g)
      .mapGroupsWithState[WSampleState, WSampleOut](
        GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[WSampleRow], state: GroupState[WSampleState]) =>
          val prev = state.getOption
          var n = prev.map(_.nSeen).getOrElse(0L)
          val fresh = it.map { r => n += 1; (r.key, r.id, r.w) }.toVector
          // NO distinct: the batch twin ranks duplicate input rows as
          // separate sample candidates (row_number), so a multiset
          // input must keep duplicates here too or the streamed sample
          // would come up short of the batch sample; each input row is
          // consumed exactly once, so state never self-duplicates
          val merged = (prev.map(_.rows.toVector).getOrElse(Vector.empty)
              ++ fresh)
            .sortBy { case (key, id, _) => (-key, id) }
            .take(k)
          state.update(WSampleState(merged, n))
          WSampleOut(g, n, merged.map(_._2), merged.map(_._3))
      }
  }

  final case class SmoothEvent(event_id: Long, user_id: Long, sec: Long,
      value: Double)
  final case class SmoothState(recentMicros: Seq[Long])
  final case class SmoothOut(event_id: Long, user_id: Long, n_window: Int,
      ewma: Double)

  /** Streaming twin of [[graft.ext.EventsOps.expSmooth]]: per-user
    * adjusted EWMA at alpha = 1/2 over a bounded trailing history,
    * maintained as keyed state across micro-batches. ORDER-DEPENDENT
    * state is the novelty vs the other stateful faces: a smoother's
    * value depends on the sequence, not a commutative summary — so
    * each batch's rows are sorted per key by (sec, event_id) before
    * folding, and the state carries the last `span` values (as exact
    * micro-unit longs on the same 6-dp grid the batch operator uses).
    * Cross-batch arrival order per key is the caller's transport
    * contract (Kafka-partition-per-key semantics); within-batch
    * disorder is repaired by the sort.
    *
    * The arithmetic is the batch operator's verbatim: round to 6 dp
    * (HALF_UP on the double's shortest decimal form — Spark's
    * `round`), weight element i of the window by 2^i as exact
    * integers, divide once as doubles. Streamed output is therefore
    * BIT-IDENTICAL to the batch face on in-order input, however the
    * stream is micro-batched — the spec pins a 2-batch split against
    * the batch operator and the face's oracle IS the batch SQL.
    *
    * State per key is `span` longs — bounded, watermark-free. Per-key
    * per-batch memory is the sort buffer (that batch's rows for the
    * key), the standard flatMapGroupsWithState envelope. */
  def streamExpSmooth(events: Dataset[SmoothEvent], span: Int = 20)
      : Dataset[SmoothOut] = {
    require(span >= 1 && span <= 62, s"span must be in [1, 62]: $span")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SmoothState, SmoothOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SmoothEvent], state: GroupState[SmoothState]) =>
          var hist = state.getOption.map(_.recentMicros.toVector)
            .getOrElse(Vector.empty[Long])
          val out = rows.toVector.sortBy(e => (e.sec, e.event_id)).map { e =>
            val micros = java.math.BigDecimal.valueOf(e.value)
              .setScale(6, java.math.RoundingMode.HALF_UP)
              .movePointRight(6).longValueExact()
            hist = (hist :+ micros).takeRight(span)
            val n = hist.size
            var num = BigInt(0)
            var i = 0
            while (i < n) { num += BigInt(hist(i)) << i; i += 1 }
            val numD = new java.math.BigDecimal(num.bigInteger)
              .movePointLeft(6).doubleValue()
            SmoothOut(e.event_id, uid, n, numD / ((1L << n) - 1).toDouble)
          }
          state.update(SmoothState(hist))
          out.iterator
      }
  }

  /** Streaming multi-probe ANN retrieval (VERDICT r14 Next #7) — the
    * crawl loop's missing retrieval face: query vectors arrive as a
    * micro-batch stream and each batch probes the STATIC corpus via
    * [[graft.ext.SimSearch.lshMultiProbeTopK]] (Lv et al. VLDB 2007).
    * The bounded probe frame (T+1 buckets per query) broadcasts INTO
    * the corpus hash join, so corpus vectors never shuffle and never
    * re-index per batch — the exact shape that serves "retrieve
    * neighbors for everything we just crawled" at 100 TB, where the
    * corpus side is the big one and the per-trigger query set is
    * small.
    *
    * Stateless by construction: per-query top-k depends only on the
    * query vector and the static corpus, so the union of per-batch
    * results is bit-identical to the batch face HOWEVER the stream is
    * chopped (chunking invariance is the gate: the oracle is the
    * batch multiprobe SQL verbatim). No watermark, no state store —
    * nothing accumulates across triggers. */
  def annRetrieveStream(queryStream: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, outDir: String, dims: Int, k: Int,
      planes: Int = 8, tProbes: Int = 8): Unit = {
    val spark = queryStream.sparkSession
    // typed empty seed so a queryless run still reads back with the
    // right schema (the crawlDedupStream discipline)
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("query_id", LongType), StructField("neighbor_id", LongType),
      StructField("rank", IntegerType), StructField("cosine", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
      .write.mode("overwrite").parquet(outDir)
    val q = queryStream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.localCheckpoint(true)
        graft.ext.SimSearch.lshMultiProbeTopK(corpus, b, idCol, vecCol,
            dims, k, planes, tProbes)
          .select(col("query_id").cast("long"),
            col("neighbor_id").cast("long"), col("rank").cast("int"),
            col("cosine").cast("double"))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }
}
