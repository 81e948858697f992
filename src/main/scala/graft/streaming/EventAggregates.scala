package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming operators over the events stream — the streaming
  * counterparts of the batch q05 bucket aggregation. The reference has no
  * streaming (SURVEY.md §2.9); these are part of the training-data-pipeline
  * surface: late-data-tolerant windowed rollups and custom per-key state.
  */
object EventAggregates {

  /** Watermarked tumbling-window rollup: counts and exact integer-scaled
    * sums per (5-min window, event_type); `append` mode emits a window
    * only once its watermark passes — late events beyond 10 minutes drop. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      // group on the full window struct — extracting .start before the agg
      // severs watermark propagation and append mode is rejected
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000000).cast("long")).as("value_e6"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("value_e6"))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionState(n: Long, total: Double, lastTs: Long)
  final case class UserSession(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user session
    * aggregates. With `idleTimeout = Some(d)` state for a user idle past d
    * processing time is dropped (a final snapshot is emitted), bounding
    * per-key state on a long-running stream; with None state is UNBOUNDED
    * (grows with distinct users) — fine for bounded key spaces and tests.
    * (Processing-time timeouts keep the micro-batch loop ticking, which
    * `processAllAvailable`-style test harnesses never see settle — hence
    * opt-in rather than default.) */
  def userSessions(
      events: Dataset[EventRow],
      idleTimeout: Option[String] = None): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(timeoutConf)(
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) => {
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          if (state.hasTimedOut) {
            state.remove() // idle: evict, emit the final session snapshot
            UserSession(userId, prev.n, prev.total)
          } else {
            var n = prev.n; var total = prev.total; var last = prev.lastTs
            rows.foreach { r =>
              n += 1; total += r.value; last = math.max(last, r.ts.getTime)
            }
            state.update(SessionState(n, total, last))
            idleTimeout.foreach(state.setTimeoutDuration)
            UserSession(userId, n, total)
          }
        })
  }
}
