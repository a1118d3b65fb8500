package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the stream twin of the batch
  * `evt_funnel` (view → click → purchase, each step within a deadline
  * of the previous). Per user the state is the funnel progress (the
  * first view's ts, then the first qualifying click's, then done); a
  * completed funnel emits ONE conversion row and the state freezes (a
  * user converts at most once, exactly the batch semantics where each
  * step is the user's earliest qualifying event). For the in-order
  * streams the batch twin defines truth on, first-seen ≡ earliest;
  * events inside a micro-batch are sorted by (ts, funnel step, event
  * id) — the step key makes a same-timestamp view fold before the
  * click it qualifies (and click before purchase), exactly the batch
  * `tsus >= t1` inclusivity. State is three scalars per user.
  */
object StreamingFunnel {

  final case class Event(event_id: Long, tsus: Long, user_id: Long, event_type: String)
  final case class Progress(t1: Long, t2: Long, done: Boolean)
  final case class Conversion(user_id: Long, view_ts: Long, click_ts: Long, purchase_ts: Long)

  private val None_ = Long.MinValue

  def funnelStream(events: Dataset[Event], windowUs: Long)(
      implicit spark: SparkSession): Dataset[Conversion] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, evs: Iterator[Event], state: GroupState[Progress]) => {
          var p = state.getOption.getOrElse(Progress(None_, None_, done = false))
          val out = scala.collection.mutable.ListBuffer.empty[Conversion]
          def step(t: String): Int = t match {
            case "view" => 0; case "click" => 1; case "purchase" => 2; case _ => 3
          }
          evs.toSeq.sortBy(e => (e.tsus, step(e.event_type), e.event_id)).foreach { e =>
            if (!p.done) e.event_type match {
              case "view" if p.t1 == None_ =>
                p = p.copy(t1 = e.tsus)
              case "click" if p.t1 != None_ && p.t2 == None_ &&
                  e.tsus >= p.t1 && e.tsus < p.t1 + windowUs =>
                p = p.copy(t2 = e.tsus)
              case "purchase" if p.t2 != None_ &&
                  e.tsus >= p.t2 && e.tsus < p.t2 + windowUs =>
                out += Conversion(user, p.t1, p.t2, e.tsus)
                p = p.copy(done = true)
              case _ => ()
            }
          }
          state.update(p)
          out.iterator
        })
  }
}
