package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization with CUSTOM KEYED STATE
  * (`flatMapGroupsWithState`) — the stateful-streaming analog of
  * [[graft.ops.Sessionize]]: one `SessionState` per user survives across
  * micro-batches; a session row is emitted the moment a larger-than-gap
  * gap CLOSES it (by a later event, or by the event-time timeout when the
  * watermark passes the open session's deadline).
  *
  * Semantics notes (standard for this pattern):
  *  - events inside one invocation are sorted by (ts, event_id) before
  *    folding — Spark does not order the per-group iterator;
  *  - the watermark bounds how late an event may arrive; a late event
  *    within the watermark lands in the same group invocation and is
  *    sorted into place, one beyond it is dropped by the engine;
  *  - state is O(1) per user (no event buffering): the fold carries only
  *    (session_idx, start, last, count) — a hot user costs constant
  *    memory, which is what lets this run over 10^9 users;
  *  - a timeout close must NOT discard the per-user counter: the state is
  *    replaced by a closed-marker (`n_events == 0`) holding the last
  *    emitted session_idx, so the user's next post-idle session numbers
  *    `idx + 1` — identical to the batch sessionizer. (Removing state on
  *    timeout renumbers every post-idle session from 1 and emits
  *    duplicate (user_id, session_idx) keys.)
  *
  * MEMORY BOUND: by default the closed-marker never expires, so state-store
  * size is O(1) per user EVER SEEN — a few dozen bytes per user, fine for
  * 10^8 users, a deliberate trade for exact numbering beyond that. For
  * unbounded-cardinality key spaces set `markerTtlMs`: the marker re-arms
  * an event-time timeout at `last + gap + ttl` and is EVICTED when it
  * fires, accepting that a user returning after more than `ttl` of event
  * time restarts session numbering from 1 (every emitted
  * (user_id, session_idx, start_ts) row remains unique — only the ordinal
  * resets, exactly like any retention-windowed sessionizer).
  */
object SessionizeStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** `n_events == 0` is the closed-marker: no session is open, but
    * `session_idx` remembers the last emitted ordinal for this user. */
  final case class SessionState(session_idx: Int, start_ms: Long,
      last_ms: Long, n_events: Long)

  final case class Session(user_id: Long, session_idx: Int, n_events: Long,
      start_ts: Timestamp, end_ts: Timestamp)

  private def toSession(uid: Long, st: SessionState): Session =
    Session(uid, st.session_idx, st.n_events,
      new Timestamp(st.start_ms), new Timestamp(st.last_ms))

  /** The per-group fold — pure, shared by the stream and by tests.
    * `markerTtlMs = Some(ttl)` bounds state: closed-markers are evicted
    * once the watermark passes `last_ms + gapMs + ttl` (see scaladoc). */
  def updateGroup(gapMs: Long, markerTtlMs: Option[Long] = None)(
      uid: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (events.isEmpty && state.hasTimedOut) {
      state.getOption match {
        case Some(s) if s.n_events > 0L =>
          // watermark passed the open session's deadline: close and emit it,
          // but KEEP the counter — replace state with the closed-marker so
          // the user's next session numbers session_idx + 1 (batch parity).
          // Without a TTL no timeout is set on the marker, so it persists
          // without re-firing; with one, the marker itself times out below.
          state.update(s.copy(n_events = 0L))
          markerTtlMs.foreach(ttl => state.setTimeoutTimestamp(s.last_ms + gapMs + ttl))
          return Iterator.single(toSession(uid, s))
        case Some(_) =>
          // closed-marker TTL expired: evict (renumbering after the
          // retention window is the documented trade)
          state.remove()
          return Iterator.empty
        case None =>
          return Iterator.empty
      }
    }
    val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    val closed = Vector.newBuilder[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      val ms = e.ts.getTime
      cur match {
        case Some(s) if s.n_events == 0L =>
          // closed-marker: reopen at the next ordinal, nothing to emit
          // (a timeout already emitted session s.session_idx)
          cur = Some(SessionState(s.session_idx + 1, ms, ms, 1L))
        case Some(s) if ms - s.last_ms <= gapMs =>
          cur = Some(s.copy(last_ms = math.max(s.last_ms, ms),
            n_events = s.n_events + 1))
        case Some(s) => // gap exceeded: close the old session, open the next
          closed += toSession(uid, s)
          cur = Some(SessionState(s.session_idx + 1, ms, ms, 1L))
        case None =>
          cur = Some(SessionState(1, ms, ms, 1L))
      }
    }
    cur.filter(_.n_events > 0L).foreach { s =>
      state.update(s)
      // close via timeout once the WATERMARK (not wall clock) passes the
      // open session's gap deadline
      state.setTimeoutTimestamp(s.last_ms + gapMs)
    }
    closed.result().iterator
  }

  /** File-source stream over `inputDir` (parquet event rows) → appended
    * closed-session rows. `watermarkDelay` e.g. "10 minutes";
    * `markerTtlMs` bounds state for unbounded key spaces (see scaladoc). */
  def sessions(spark: SparkSession, inputDir: String, gapMs: Long,
      watermarkDelay: String = "10 minutes",
      maxFilesPerTrigger: Option[Int] = None,
      markerTtlMs: Option[Long] = None): Dataset[Session] = {
    import spark.implicits._
    val reader = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Event].schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputDir)
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateGroup(gapMs, markerTtlMs))
  }
}
