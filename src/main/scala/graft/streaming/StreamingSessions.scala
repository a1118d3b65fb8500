package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the stream twin of the batch
  * `evt_sessionize` and the canonical custom-session-window use of
  * `flatMapGroupsWithState`: per user the state is the OPEN session
  * (start ts, last ts, event count, first event id, session index); an
  * arriving event either extends it or — when the inactivity gap is
  * exceeded — FINALIZES it (the closed session is emitted, a new one
  * opens). Only closed sessions are emitted: an open session is not a
  * fact yet, so the append stream stays immutable, and the last session
  * of every user remains open by definition (spec-gated: emitted ≡
  * batch sessions minus each user's final one).
  *
  * State is five scalars per ACTIVE user — independent of stream
  * length; a production deployment would add a GroupStateTimeout to
  * flush idle users, which changes liveness, not the session algebra.
  * In-order delivery per user is assumed (the batch twin defines the
  * ground truth for out-of-order replay); events inside one micro-batch
  * are sorted by (ts, event_id) before folding.
  */
object StreamingSessions {

  final case class Event(event_id: Long, tsus: Long, user_id: Long)
  final case class OpenSession(sess: Long, startTs: Long, lastTs: Long,
      nEvents: Long, firstEvent: Long)
  final case class ClosedSession(user_id: Long, sess: Long, n_events: Long,
      duration_us: Long, first_event: Long)

  def sessionStream(events: Dataset[Event], gapUs: Long)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, evs: Iterator[Event], state: GroupState[OpenSession]) => {
          val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
          var open = state.getOption.orNull
          evs.toSeq.sortBy(e => (e.tsus, e.event_id)).foreach { e =>
            open match {
              case null =>
                open = OpenSession(1L, e.tsus, e.tsus, 1L, e.event_id)
              case o if e.tsus - o.lastTs > gapUs =>
                closed += ClosedSession(user, o.sess, o.nEvents, o.lastTs - o.startTs, o.firstEvent)
                open = OpenSession(o.sess + 1L, e.tsus, e.tsus, 1L, e.event_id)
              case o =>
                open = o.copy(lastTs = e.tsus, nEvents = o.nEvents + 1L,
                  firstEvent = math.min(o.firstEvent, e.event_id))
            }
          }
          if (open != null) state.update(open)
          closed.iterator
        })
  }
}
