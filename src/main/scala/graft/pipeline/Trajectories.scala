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
  case class FunnelState(times: Seq[Long])
  case class FunnelAdvance(userId: Long, stageIdx: Int, ts: Long)

  /** Streaming form of [[funnel]] via `flatMapGroupsWithState`: state
    * per user is ONE long per stage (the completion time, -1 unset) —
    * bounded by construction, no event retention. Emits an advance row
    * the moment a user completes a stage. Greedy in arrival order,
    * which equals the batch MIN-qualifying-ts semantics when arrivals
    * are time-ordered per user (the watermark-disciplined case);
    * within a micro-batch, events sort by ts before applying. */
  def funnelStream(ev: DataFrame, stages: Seq[String],
                   windowMs: Long): Dataset[FunnelAdvance] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = ev.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    ev.select(col("user_id").as("userId"), col("ts"),
        col("event_type").as("eventType"))
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[FunnelEvent], st: GroupState[FunnelState]) => {
          val times = st.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(stages.size)(-1L))
          val out = Seq.newBuilder[FunnelAdvance]
          it.toSeq.sortBy(_.ts).foreach { e =>
            stageIdx.get(e.eventType).foreach { i =>
              val qualifies =
                if (i == 0) times(0) < 0
                else times(i) < 0 && times(i - 1) >= 0 &&
                  e.ts >= times(i - 1) && e.ts - times(0) <= windowMs
              if (qualifies) {
                times(i) = e.ts
                out += FunnelAdvance(user, i, e.ts)
              }
            }
          }
          st.update(FunnelState(times.toSeq))
          out.result().iterator
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
