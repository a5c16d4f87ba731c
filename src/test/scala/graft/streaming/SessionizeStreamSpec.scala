package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Custom keyed state (flatMapGroupsWithState): the streaming sessionizer
  * must agree with the batch operator on every CLOSED session, with state
  * carried across micro-batches. */
class SessionizeStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val GAP = 30L * 60 * 1000 // 30 min

  private def ev(id: Long, uid: Long, minute: Long): SessionizeStream.Event =
    SessionizeStream.Event(id, new Timestamp(1700000000000L + minute * 60000L),
      uid, "click", 1.0, "")

  test("closed sessions match the batch sessionizer across micro-batches") {
    import spark.implicits._
    // user 1: two sessions in file one (gap at minute 120), continuation of
    // the second session + a third session in file two.
    // user 2: one long session spanning BOTH files (state must carry over).
    // user 3: session 1 closes via EVENT-TIME TIMEOUT in batch two — u3 has
    // NO events in file two (a timeout only fires for a key with no data in
    // the batch) and its deadline (min 35) is behind the post-file-one
    // watermark (min 130). The user then RETURNS in file three (min 500,
    // ahead of the min-415 watermark so it is not late-dropped) — the
    // reopened session must number 2, not 1 — and file four gap-closes it
    // so its ordinal is observable in the sink.
    val file1 = Seq(
      ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 20), // u1 session 1
      ev(4, 1, 120), ev(5, 1, 130),            // u1 session 2 begins
      ev(6, 2, 100), ev(7, 2, 125),            // u2 session 1 begins
      ev(13, 3, 0), ev(14, 3, 5))              // u3 session 1 (times out)
    val file2 = Seq(
      ev(8, 1, 140),                            // u1 session 2 continues
      ev(9, 1, 400), ev(10, 1, 410),            // u1 session 3 (gap closes s2)
      ev(11, 2, 150), ev(12, 2, 415))           // u2: 150 continues, 415 opens s2
    val file3 = Seq(
      ev(15, 3, 500))                           // u3 returns post-timeout: session 2
    val file4 = Seq(
      ev(16, 3, 800))                           // gap-closes u3 session 2

    val in = Files.createTempDirectory("graft-sess-in").toString
    file1.toDS().repartition(1).write.parquet(s"$in/f1")
    file2.toDS().repartition(1).write.parquet(s"$in/f2")
    file3.toDS().repartition(1).write.parquet(s"$in/f3")
    file4.toDS().repartition(1).write.parquet(s"$in/f4")

    val out = SessionizeStream.sessions(spark, s"$in/*", GAP,
        watermarkDelay = "0 seconds", maxFilesPerTrigger = Some(1))
      .writeStream
      .format("memory")
      .queryName("sess_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    out.awaitTermination(120000)

    val emitted = spark.table("sess_stream").as[SessionizeStream.Session]
      .collect().map(s => (s.user_id, s.session_idx) -> s).toMap

    // batch ground truth over the union of all files
    val batch = graft.ops.Sessionize.sessions(
        (file1 ++ file2 ++ file3 ++ file4).toDS().toDF(), GAP)
      .collect().map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Int]("session_idx")) ->
          (r.getAs[Long]("n_events"),
            r.getAs[Timestamp]("start_ts"), r.getAs[Timestamp]("end_ts"))
      }.toMap

    // every emitted session must equal its batch counterpart exactly
    emitted.foreach { case (k, s) =>
      val (n, st, en) = batch(k)
      assert((s.n_events, s.start_ts, s.end_ts) == ((n, st, en)), s"$k: $s vs ${batch(k)}")
    }
    // gap-closed sessions are always emitted; at most each user's final
    // (still-open) session may be withheld until its event-time timeout
    val lastPerUser = batch.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val mustEmit = batch.keys.filterNot { case (u, i) => lastPerUser(u) == i }.toSet
    assert(mustEmit.subsetOf(emitted.keySet),
      s"missing closed sessions: ${mustEmit -- emitted.keySet}")
    assert(mustEmit.nonEmpty)
    // the timeout-close-then-return path: u3's first session was closed by
    // the event-time timeout, and the post-idle session must carry the
    // ordinal forward (idx 2) — both with batch-exact bounds
    assert(emitted.contains((3L, 1)), "u3 session 1 not emitted via timeout")
    assert(emitted.contains((3L, 2)), "u3 post-timeout session renumbered")
    assert(emitted((3L, 1)).n_events == 2L && emitted((3L, 2)).n_events == 1L)
  }

  test("updateGroup reopens a closed-marker at the next ordinal") {
    // after a timeout close the state is SessionState(idx, _, _, 0); the
    // next event must open session idx+1 without emitting a marker row
    final class Stub extends org.apache.spark.sql.streaming.GroupState[SessionizeStream.SessionState] {
      var v: Option[SessionizeStream.SessionState] = None
      var timedOut = false
      override def exists: Boolean = v.isDefined
      override def get: SessionizeStream.SessionState = v.get
      override def getOption: Option[SessionizeStream.SessionState] = v
      override def update(s: SessionizeStream.SessionState): Unit = v = Some(s)
      override def remove(): Unit = v = None
      override def hasTimedOut: Boolean = timedOut
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit = ()
      override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = 0L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    val st = new Stub
    st.v = Some(SessionizeStream.SessionState(3, 1000L, 2000L, 5L))
    st.timedOut = true
    // timeout invocation: emits session 3, leaves the closed-marker
    val emitted = SessionizeStream.updateGroup(GAP)(9L, Iterator.empty, st).toList
    assert(emitted.map(s => (s.session_idx, s.n_events)) == List((3, 5L)))
    assert(st.v.exists(s => s.session_idx == 3 && s.n_events == 0L))
    // the user's next event reopens at ordinal 4, emitting nothing
    st.timedOut = false
    val emitted2 = SessionizeStream.updateGroup(GAP)(9L,
      Iterator(ev(99, 9, 500)), st).toList
    assert(emitted2.isEmpty)
    assert(st.v.exists(s => s.session_idx == 4 && s.n_events == 1L))
  }

  test("closed-marker TTL re-arms a timeout and evicts the marker when it fires") {
    final class Stub extends org.apache.spark.sql.streaming.GroupState[SessionizeStream.SessionState] {
      var v: Option[SessionizeStream.SessionState] = None
      var timedOut = false
      var lastTimeoutTs: Long = -1L
      override def exists: Boolean = v.isDefined
      override def get: SessionizeStream.SessionState = v.get
      override def getOption: Option[SessionizeStream.SessionState] = v
      override def update(s: SessionizeStream.SessionState): Unit = v = Some(s)
      override def remove(): Unit = v = None
      override def hasTimedOut: Boolean = timedOut
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit = lastTimeoutTs = t
      override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = 0L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    val ttl = 100000L
    val st = new Stub
    st.v = Some(SessionizeStream.SessionState(2, 1000L, 2000L, 4L))
    st.timedOut = true
    // session close: emits, leaves the marker ARMED at last + gap + ttl
    val e1 = SessionizeStream.updateGroup(GAP, Some(ttl))(9L, Iterator.empty, st).toList
    assert(e1.map(s => (s.session_idx, s.n_events)) == List((2, 4L)))
    assert(st.v.exists(s => s.session_idx == 2 && s.n_events == 0L))
    assert(st.lastTimeoutTs == 2000L + GAP + ttl)
    // the marker's own timeout fires: evicted, nothing emitted — state is
    // bounded by ttl of event time for users never seen again
    val e2 = SessionizeStream.updateGroup(GAP, Some(ttl))(9L, Iterator.empty, st).toList
    assert(e2.isEmpty && st.v.isEmpty)
    // default (no TTL): marker persists and arms NO timeout (r4 behavior)
    val st2 = new Stub
    st2.v = Some(SessionizeStream.SessionState(1, 1000L, 2000L, 3L))
    st2.timedOut = true
    SessionizeStream.updateGroup(GAP)(9L, Iterator.empty, st2).toList
    assert(st2.v.exists(_.n_events == 0L) && st2.lastTimeoutTs == -1L)
  }

  test("updateGroup fold is order-insensitive within an invocation") {
    val events = Seq(ev(1, 7, 0), ev(2, 7, 10), ev(3, 7, 120), ev(4, 7, 125))
    // a GroupState stub: enough for the pure fold
    final class Stub extends org.apache.spark.sql.streaming.GroupState[SessionizeStream.SessionState] {
      var v: Option[SessionizeStream.SessionState] = None
      override def exists: Boolean = v.isDefined
      override def get: SessionizeStream.SessionState = v.get
      override def getOption: Option[SessionizeStream.SessionState] = v
      override def update(s: SessionizeStream.SessionState): Unit = v = Some(s)
      override def remove(): Unit = v = None
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit = ()
      override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = 0L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    def run(order: Seq[SessionizeStream.Event]) = {
      val st = new Stub
      val closed = SessionizeStream.updateGroup(GAP)(7L, order.iterator, st).toList
      (closed, st.v)
    }
    val (c1, s1) = run(events)
    val (c2, s2) = run(events.reverse)
    assert(c1 == c2 && s1 == s2)
    assert(c1.map(_.n_events) == List(2L)) // first session closed with 2 events
    assert(s1.exists(_.n_events == 2L))    // second session open with 2 events
  }
}
