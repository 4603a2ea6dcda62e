package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interaction-log trajectory assembly over the events table — the
 * preprocessing an agent/RL training pipeline runs to turn a raw
 * clickstream into per-user episodes: gap-based sessionization and
 * ordered-funnel matching.
 *
 * Scale shape: everything here keys on `user_id`. Sessionization is
 * ONE shuffle (the partitioned window) followed by aggregations that
 * reuse the same hash partitioning; the funnel is a chain of per-user
 * aggregations, each a user-keyed shuffle of an already-filtered event
 * slice. No global windows, no cross-user joins — a 100 TB log with
 * billions of users spreads evenly unless one user is pathological,
 * which a per-user event cap upstream handles (same argument as
 * Multimodal.frameSample's maxFrames).
 */
object Trajectories {

  /** Gap-based sessionization: a new session starts when the gap to
    * the user's previous event exceeds `gapMs`. Ties break on
    * event_id, so the assignment is deterministic under duplicate
    * timestamps. Emits the input plus a 1-based per-user
    * `session_idx`. */
  def sessionize(ev: DataFrame, gapMs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts") - col("__prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(w))
      .drop("__prev", "__new")
  }

  /** Per-session episode summary: event count, span, value sum,
    * distinct event types. One more agg on the window's partitioning. */
  def sessionStats(ev: DataFrame, gapMs: Long): DataFrame =
    sessionize(ev, gapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        (max(col("ts")) - min(col("ts"))).as("dur_ms"),
        sum(col("value")).as("sum_v"),
        countDistinct(col("event_type")).as("n_types"))

  /** Streaming form of [[sessionStats]] on Structured Streaming's
    * native `session_window`: per-user sessions close when the
    * watermark passes last-event + gap, and the engine emits ONE final
    * row per closed session (append mode). State per open session is
    * the aggregate tuple, evicted at close — bounded by the number of
    * concurrently OPEN sessions, not by history, which is what lets
    * the assembly run on an unbounded 100 TB clickstream. Emits the
    * batch columns except `session_idx` (an order-of-arrival notion;
    * closed sessions are identified by (user_id, start_ts) instead). */
  def sessionStream(ev: DataFrame, gapMs: Long,
                    lateness: String = "10 minutes"): DataFrame =
    ev.withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", lateness)
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$gapMs milliseconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        (max(col("ts")) - min(col("ts"))).as("dur_ms"),
        sum(col("value")).as("sum_v"),
        size(collect_set(col("event_type"))).as("n_types"))
      .drop("w")

  case class FunnelEvent(userId: Long, ts: Long, eventType: String)
  /** Per-user funnel state: buffered stage-relevant (ts, stageIdx)
    * pairs still inside the candidate window, or — once the funnel has
    * closed and emitted — an empty `done` tombstone that dedups the
    * user until its event-time TTL expires. */
  case class FunnelBuf(ts: Seq[Long], stage: Seq[Int], done: Boolean,
                       closedAtW: Long = -1L)
  case class FunnelAdvance(userId: Long, stageIdx: Int, ts: Long)

  /** Streaming form of [[funnel]], correct under LATE / REORDERED
    * arrivals up to the event-time watermark: instead of greedily
    * advancing in arrival order (round-8 behavior, equivalent to batch
    * only for time-ordered feeds), each user's stage-relevant events
    * are buffered and the batch MIN-qualifying-ts chain is computed
    * ONCE, when the watermark passes `t0 + windowMs` — at which point
    * no event inside the funnel window can still arrive, so the
    * emitted advances are final (append-mode safe, nothing to
    * retract).
    *
    * State is bounded by construction, event-time evicted:
    *  - open users hold only events that can still join a chain —
    *    one stage-0 entry (the running min) plus stage>0 events with
    *    `ts <= t0 + windowMs` and (`ts >= t0` or `ts >= watermark`,
    *    since a future t0 can only land at or above the watermark);
    *    users with no stage-0 event keep nothing older than the
    *    watermark, so their buffer is capped by the lateness horizon;
    *  - closed users keep a ~3-field tombstone that expires
    *    `tombstoneTtlMs` past close via `EventTimeTimeout` (a user
    *    re-entering the funnel later than that is counted again —
    *    the documented divergence from batch, which models exactly
    *    one funnel per user over all history). */
  def funnelStream(ev: DataFrame, stages: Seq[String], windowMs: Long,
                   lateness: String = "10 minutes",
                   tombstoneTtlMs: Long = 7L * 24 * 3600 * 1000)
      : Dataset[FunnelAdvance] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = ev.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val nStages = stages.size
    // the batch chain over a final event set: t0 = min stage-0 ts,
    // t_i = min stage-i ts with ts >= t_{i-1} and ts - t0 <= windowMs.
    // A single pass over (ts, stage)-sorted events computes exactly
    // that (the first qualifying event in sort order IS the min).
    def runChain(evs: Array[(Long, Int)]): Array[Long] = {
      val times = Array.fill(nStages)(-1L)
      evs.sortBy(identity).foreach { case (ts, i) =>
        val ok =
          if (i == 0) times(0) < 0
          else times(i) < 0 && times(i - 1) >= 0 &&
            ts >= times(i - 1) && ts - times(0) <= windowMs
        if (ok) times(i) = ts
      }
      times
    }
    ev.select(col("user_id").as("userId"), col("ts"),
        col("event_type").as("eventType"),
        timestamp_millis(col("ts")).as("event_time"))
      .withWatermark("event_time", lateness)
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[FunnelEvent], st: GroupState[FunnelBuf]) => {
          val w = st.getCurrentWatermarkMs()
          val prev = st.getOption.getOrElse(FunnelBuf(Nil, Nil, done = false))
          if (prev.done) {
            if (st.hasTimedOut) { st.remove(); Iterator.empty }
            else {
              // drain arrivals but KEEP the timeout anchored at the
              // close watermark — the TTL measures time since close,
              // not idle time, so a user spamming stage events cannot
              // stay deduplicated forever
              st.update(prev)
              st.setTimeoutTimestamp(
                math.max(prev.closedAtW + tombstoneTtlMs, w + 1))
              Iterator.empty
            }
          } else {
            val fresh = it.filter(e => stageIdx.contains(e.eventType))
              .map(e => (e.ts, stageIdx(e.eventType))).toArray
            var evs = (prev.ts.zip(prev.stage) ++ fresh).toArray
            val t0 = evs.collect { case (ts, i) if i == 0 => ts }.minOption
            // prune events that can never join any final chain (the
            // future t0 is >= max(watermark, current t0) and the
            // window end only moves down with t0)
            evs = t0 match {
              case Some(t) => (t, 0) +: evs.filter { case (ts, i) =>
                i != 0 && ts <= t + windowMs && (ts >= t || ts >= w) }
              case None => evs.filter(_._1 >= w)
            }
            val closeAt = t0.map(_ + windowMs)
            if (closeAt.exists(_ < w)) {
              // watermark passed the window end: chain is final — emit
              // every completed stage, tombstone the user
              val times = runChain(evs)
              st.update(FunnelBuf(Nil, Nil, done = true, closedAtW = w))
              // w IS the close watermark just stored as closedAtW —
              // the drain branch re-derives the same expiry from it
              st.setTimeoutTimestamp(math.max(w + tombstoneTtlMs, w + 1))
              times.zipWithIndex.collect {
                case (t, i) if t >= 0 => FunnelAdvance(user, i, t)
              }.iterator
            } else if (evs.isEmpty) {
              st.remove(); Iterator.empty
            } else {
              st.update(FunnelBuf(evs.map(_._1).toSeq,
                evs.map(_._2).toSeq, done = false))
              // wake at window close (funnel open) or once the last
              // buffered event ages past the watermark (no stage-0 yet
              // → the buffer can then be dropped wholesale)
              val next = closeAt.getOrElse(evs.map(_._1).max)
              st.setTimeoutTimestamp(math.max(next, w + 1))
              Iterator.empty
            }
          }
        })
  }

  /** Ordered-funnel completion: stage i counts users with an event of
    * `stages(i)` at-or-after their stage-(i-1) completion time and
    * within `windowMs` of their stage-0 entry (earliest-entry
    * semantics — each stage takes the user's MIN qualifying ts).
    * Emits (stage_idx, stage, n_users). The per-stage state is one
    * row per surviving user, so each step is a filtered user-keyed
    * aggregation — no step ever joins events to events. */
  def funnel(ev: DataFrame, stages: Seq[String], windowMs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    var counts = Seq((0, stages.head, reached.count()))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      val prior = (0 until i).map(j => s"t$j")
      reached = ev.filter(col("event_type") === stage)
        .join(reached, Seq("user_id"))
        .filter(col("ts") >= col(s"t${i - 1}") &&
          col("ts") - col("t0") <= windowMs)
        .groupBy(col("user_id") +: prior.map(col): _*)
        .agg(min(col("ts")).as(s"t$i"))
      counts = counts :+ ((i, stage, reached.count()))
    }
    val spark = ev.sparkSession
    import spark.implicits._
    counts.toDF("stage_idx", "stage", "n_users")
  }
}
