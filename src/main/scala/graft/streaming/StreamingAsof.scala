package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stream twin of the batch
  * `evt_asof_join` and the canonical "enrich with the latest value"
  * pattern: one interleaved event stream per user, the state is the
  * most recent error (ts + the max event id at that ts, the batch tie
  * rule), and every click emits its match immediately. For the
  * in-order-per-user streams the batch twin defines truth on, the
  * carry-forward state IS the at-or-before match; events inside a
  * micro-batch are sorted by (ts, error-before-click, event id) so a
  * same-timestamp error still wins, exactly the batch sort order.
  * State is two scalars per user.
  */
object StreamingAsof {

  final case class Event(event_id: Long, tsus: Long, user_id: Long, event_type: String)
  final case class LastErr(ts: Long, id: Long)
  final case class Match(event_id: Long, user_id: Long, err_id: Option[Long], gap_us: Option[Long])

  def asofStream(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[Match] = {
    import spark.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "error")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, evs: Iterator[Event], state: GroupState[LastErr]) => {
          var last = state.getOption.orNull
          val out = scala.collection.mutable.ListBuffer.empty[Match]
          // errors before clicks at equal ts; among same-ts errors the
          // larger id arrives later and overwrites — the batch tie rule
          evs.toSeq.sortBy(e => (e.tsus, if (e.event_type == "error") 0 else 1, e.event_id))
            .foreach { e =>
              if (e.event_type == "error") {
                if (last == null || e.tsus > last.ts ||
                  (e.tsus == last.ts && e.event_id > last.id))
                  last = LastErr(e.tsus, e.event_id)
              } else {
                out += (if (last == null) Match(e.event_id, user, None, None)
                else Match(e.event_id, user, Some(last.id), Some(e.tsus - last.ts)))
              }
            }
          if (last != null) state.update(last)
          out.iterator
        })
  }
}
