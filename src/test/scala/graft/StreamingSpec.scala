package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventIn

/** Streaming semantics pinned via MemoryStream: windowed aggregation
  * matches the batch expressions, sessionization matches the batch
  * lag-gap definition. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourly tumbling aggregate over a memory stream matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventIn]
    val q = EventStreams.toMemorySink(
      EventStreams.hourlyAggregate(in.toDF()), "hourly_test", OutputMode.Complete())
    try {
      in.addData(
        EventIn(1, ts(10), 1, "click", 1.5),
        EventIn(2, ts(20), 1, "view", 2.5),
        EventIn(3, ts(70), 2, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).sorted
      assert(rows.toSeq == Seq(
        ("2024-01-01 00:00:00.0", 2L, 4.0),
        ("2024-01-01 01:00:00.0", 1L, 3.0)))
    } finally q.stop()
  }

  test("stateful sessionization counts sessions across triggers with 30-min gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventIn]
    val q = EventStreams.toMemorySink(
      EventStreams.sessionize(in.toDS()).toDF(), "sessions_test", OutputMode.Update())
    try {
      // trigger 1: two events 10 min apart -> one session
      in.addData(EventIn(1, ts(0), 7, "click", 0), EventIn(2, ts(10), 7, "view", 0))
      q.processAllAvailable()
      // trigger 2: 50-min silence -> second session for same user
      in.addData(EventIn(3, ts(60), 7, "click", 0))
      q.processAllAvailable()
      val last = spark.table("sessions_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).last
      assert(last == ((7L, 2L, 1L)))
    } finally q.stop()
  }

  test("sessionize survives event-time timeouts and keeps counts cumulative") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventIn]
    val q = EventStreams.toMemorySink(
      EventStreams.sessionize(in.toDS()).toDF(), "sessions_timeout_test",
      OutputMode.Update())
    try {
      // user 7's session: events at t=0 and t=10min
      in.addData(EventIn(1, ts(0), 7, "click", 0), EventIn(2, ts(10), 7, "view", 0))
      q.processAllAvailable()
      // another user far in the future pushes the watermark (delay 2h)
      // past user 7's timeout (lastSeen + 30min)
      in.addData(EventIn(3, ts(300), 8, "click", 0))
      q.processAllAvailable()
      // the next trigger fires user 7's timeout: before the hasTimedOut
      // branch existed this threw (setTimeoutTimestamp below watermark)
      // and killed the query
      in.addData(EventIn(4, ts(310), 8, "view", 0))
      q.processAllAvailable()
      assert(q.isActive, q.exception.map(_.toString).getOrElse(""))
      val user7 = spark.table("sessions_timeout_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._1 == 7L)
      // timeout emission repeats the final session shape (1 session, 2 events)
      assert(user7.nonEmpty && user7.forall(_ == ((7L, 1L, 2L))))
      // user 7 RETURNS after the timeout: the compact kept state makes
      // the session count cumulative — 2 sessions, not a reset to 1
      in.addData(EventIn(5, ts(320), 7, "click", 0))
      q.processAllAvailable()
      val back = spark.table("sessions_timeout_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._1 == 7L).last
      assert(back == ((7L, 2L, 1L)))
    } finally q.stop()
  }

  test("watermark drops late events: a row behind the watermark never lands") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventIn]
    // Append mode: a window only emits once finalized by the watermark,
    // and late rows behind it are discarded
    val q = EventStreams.toMemorySink(
      EventStreams.hourlyAggregate(in.toDF()), "late_test", OutputMode.Append())
    try {
      in.addData(EventIn(1, ts(10), 1, "click", 1.0), EventIn(2, ts(20), 1, "view", 2.0))
      q.processAllAvailable()
      // advance event time to 05:00 -> watermark 03:00 -> hour-0 window final
      in.addData(EventIn(3, ts(300), 2, "click", 3.0))
      q.processAllAvailable()
      val afterFinal = spark.table("late_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
      assert(afterFinal == Seq(("2024-01-01 00:00:00.0", 2L)))
      // this event is in hour 0, far behind the 03:00 watermark -> dropped
      in.addData(EventIn(4, ts(30), 1, "late", 9.0))
      q.processAllAvailable()
      val afterLate = spark.table("late_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
      assert(afterLate == afterFinal) // unchanged: the late row was discarded
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventIn]
    val purchases = MemoryStream[EventIn]
    val q = EventStreams.toMemorySink(
      EventStreams.clickToPurchaseJoin(clicks.toDF(), purchases.toDF()),
      "ssjoin_test", OutputMode.Append())
    try {
      clicks.addData(EventIn(1, ts(0), 7, "click", 0))
      purchases.addData(
        EventIn(2, ts(10), 7, "purchase", 0), // 10 min after the click: pairs
        EventIn(3, ts(50), 7, "purchase", 0), // 50 min after: outside window
        EventIn(4, ts(10), 8, "purchase", 0)) // other user: no click at all
      q.processAllAvailable()
      val rows = spark.table("ssjoin_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(rows == Seq((7L, 2L, 1L, 600000L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unmatched clicks with nulls after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventIn]
    val purchases = MemoryStream[EventIn]
    val q = EventStreams.toMemorySink(
      EventStreams.clickToPurchaseJoin(clicks.toDF(), purchases.toDF(), "left_outer"),
      "ssleft_test", OutputMode.Append())
    try {
      clicks.addData(
        EventIn(1, ts(0), 7, "click", 0),   // will match
        EventIn(2, ts(0), 9, "click", 0))   // never matches
      purchases.addData(EventIn(3, ts(10), 7, "purchase", 0))
      q.processAllAvailable()
      // matched row may emit immediately; the unmatched click must NOT
      // have a null row yet (its window is still open)
      val early = spark.table("ssleft_test").collect()
        .map(r => (r.getLong(0), r.isNullAt(1)))
      assert(!early.exists { case (u, isNull) => u == 9L && isNull })
      // advance BOTH watermarks far past click+30min → the join state
      // for user 9's click expires and the null row flushes
      clicks.addData(EventIn(4, ts(600), 1, "click", 0))
      purchases.addData(EventIn(5, ts(600), 1, "purchase", 0))
      q.processAllAvailable()
      clicks.addData(EventIn(6, ts(610), 1, "click", 0))
      purchases.addData(EventIn(7, ts(610), 1, "purchase", 0))
      q.processAllAvailable()
      val rows = spark.table("ssleft_test").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(rows.contains((7L, 3L)), rows.mkString(",")) // matched pair
      assert(rows.contains((9L, -1L)), rows.mkString(",")) // unmatched → nulls
    } finally q.stop()
  }

  test("streaming type aggregate equals the batch groupBy on same data") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      EventIn(1, ts(1), 1, "click", 1.25), EventIn(2, ts(2), 2, "click", 2.25),
      EventIn(3, ts(3), 1, "view", 10.0))
    val in = MemoryStream[EventIn]
    val q = EventStreams.toMemorySink(
      EventStreams.typeAggregate(in.toDF()), "types_test", OutputMode.Complete())
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("types_test").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      val batch = EventStreams.typeAggregate(data.toDF()).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
