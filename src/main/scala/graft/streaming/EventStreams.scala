package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the batch event analytics re-bound to
  * unbounded input. Spark's unified API means the tumbling-window and
  * per-type aggregations are the *same expressions* as the batch
  * queries in graft.queries.EventQueries — only the source
  * (`readStream`), a watermark, and the sink differ. Stateful
  * sessionization uses mapGroupsWithState with an event-time timeout,
  * the scale-correct shape for per-key state over millions of users
  * (state lives in the state store, partitioned by user, never on the
  * driver).
  *
  * The reference engine is batch-only (SURVEY.md §2.8), so this module
  * is extension surface; it is exercised by StreamingSpec via
  * MemoryStream rather than a declared oracle query (DuckDB cannot
  * replay a stream).
  */
object EventStreams {

  /** Tumbling 1-hour counts/sums with a 2-hour watermark — identical
    * aggregation expressions to the batch `events_hourly` query. */
  def hourlyAggregate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(col("w.start").as("hour_start"), col("n_events"), col("total_value"))

  /** Per-type running aggregate (complete-mode friendly). */
  def typeAggregate(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))

  case class EventIn(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(sessionCount: Long, lastSeenMs: Long, eventsInSession: Long)
  case class SessionUpdate(user_id: Long, n_sessions: Long, current_session_events: Long)

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Stateful sessionization: a >30-min silence starts a new session.
    * State is one compact record per user in the state store.
    *
    * Timeout contract: when the event-time timeout fires, the session
    * is closed by silence — the final SessionUpdate is re-emitted (a
    * downstream consumer in Update mode sees the last shape twice;
    * that is the "session closed" record) and the state is KEPT, shrunk
    * to {sessionCount, lastSeenMs, 0}. Keeping it is what makes
    * `n_sessions` cumulative across a user's lifetime — dropping state
    * here would silently restart the count at 1 when the user returns.
    * State size is therefore bounded by distinct-user cardinality (one
    * small record each), not by time; that matches the batch twin
    * (`events_user_sessions` counts sessions over all history). No new
    * timeout is armed for the closed session — the record is inert
    * until the user's next event. */
  def sessionize(events: Dataset[EventIn]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.EventTimeTimeout) {
        case (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            // shrink, don't remove: lastSeenMs survives so the gap test
            // (and the cumulative sessionCount) works on the next event
            state.update(SessionState(s.sessionCount, s.lastSeenMs, 0L))
            SessionUpdate(userId, s.sessionCount, s.eventsInSession)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            // events within one trigger arrive unordered: sort by event time
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var s = prev
            sorted.foreach { e =>
              val ms = e.ts.getTime
              s =
                if (s.lastSeenMs == Long.MinValue || ms - s.lastSeenMs > SessionGapMs)
                  SessionState(s.sessionCount + 1, ms, 1L)
                else
                  SessionState(s.sessionCount, ms, s.eventsInSession + 1L)
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastSeenMs + SessionGapMs)
            SessionUpdate(userId, s.sessionCount, s.eventsInSession)
          }
      }
  }

  /** Stream-stream interval join: purchases matched to the same user's
    * clicks within the preceding 30 minutes — the online twin of the
    * batch as-of/funnel pipeline (graft.operators.AsofJoin). Both sides
    * carry watermarks and the join condition bounds the time range in
    * BOTH directions, which is what lets Spark expire buffered rows on
    * each side instead of holding unbounded join state — the
    * stream-stream shape that survives at production scale. Emits every
    * qualifying (click, purchase) pair as soon as both sides arrive. */
  /** @param joinType "inner" emits only matched pairs; "left_outer"
    *   additionally emits every click that found NO purchase in its
    *   window, with null purchase columns — but only once the watermark
    *   passes the point where a match became impossible (that delayed
    *   null emission is exactly what the two-sided time bound buys). */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    c.join(p, expr(
      """user_id = p_user_id AND
        |click_ts < purchase_ts AND
        |click_ts >= purchase_ts - INTERVAL 30 MINUTES""".stripMargin), joinType)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("gap_ms"))
  }

  /** Wire any streaming DataFrame to an in-memory sink (tests/demos). */
  def toMemorySink(df: DataFrame, queryName: String, mode: OutputMode) =
    df.writeStream.format("memory").queryName(queryName).outputMode(mode).start()
}
