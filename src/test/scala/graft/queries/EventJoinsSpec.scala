package graft.queries

import graft.SparkSpec

/** Planted-corpus gates for the temporal joins: at-or-before tie
  * semantics, the duplicate-ts error tie rule, the no-match null path,
  * and range-window boundary inclusion/exclusion — the edges the sf0.01
  * hash oracle exercises only by accident.
  */
class EventJoinsSpec extends SparkSpec {

  private def planted = {
    import spark.implicits._
    Seq(
      // user 1: click before any error → null match
      (10L, 100L, 1L, "click", 0.0),
      (11L, 200L, 1L, "error", 0.0),
      // click exactly AT an error's ts → matches it (at-or-before)
      (12L, 200L, 1L, "click", 0.0),
      // two errors at the same ts → the larger event_id wins the as-of
      (13L, 300L, 1L, "error", 0.0),
      (14L, 300L, 1L, "error", 0.0),
      (15L, 400L, 1L, "click", 0.0),
      // user 2: error then a click 6 hours + 1 µs later → as-of still
      // matches (unbounded), range join does NOT (window excluded)
      (20L, 0L, 2L, "error", 0.0),
      (21L, 21600000001L, 2L, "click", 0.0),
      // user 2: click exactly at the window edge - 1 µs → range-included
      (22L, 21599999999L, 2L, "click", 0.0),
      // other event types never join
      (30L, 50L, 1L, "view", 0.0)
    ).toDF("event_id", "tsus", "user_id", "event_type", "value")
  }

  test("as-of join: null before first error, same-ts match, duplicate-ts tie to max id") {
    val got = EventJoins.asofOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val expect = Array(
      (10L, 1L, -1L, -1L), // no error yet
      (12L, 1L, 11L, 0L), // at-or-before includes the same-ts error
      (15L, 1L, 14L, 100L), // duplicate-ts errors → max event_id
      (21L, 2L, 20L, 21600000001L), // as-of is unbounded
      (22L, 2L, 20L, 21599999999L))
    assert(got.toSeq == expect.toSeq)
  }

  test("sessionization: gap breaks, per-session rollup, one hash exchange") {
    import spark.implicits._
    // gaps of SessionGapUs exactly do NOT break (strict >); +1 does
    val g = 43200000000L
    val ev = Seq(
      (0L, 0L, 1L, "click", 0.0),
      (1L, g, 1L, "click", 0.0), // gap == g → same session
      (2L, 2 * g + 1L, 1L, "view", 0.0), // gap g+1 → new session
      (3L, 0L, 2L, "error", 0.0)
    ).toDF("event_id", "tsus", "user_id", "event_type", "value")
    val out = EventJoins.sessionizeOf(ev)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, g, 0L),
      (1L, 2L, 1L, 0L, 2L),
      (2L, 1L, 1L, 0L, 3L)))
    val plan = finalPlan(out)
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"sessionize should shuffle exactly once, saw $n:\n$plan")
  }

  // AQE's toString appends the initial plan — count exchanges in the
  // final section only
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("as-of join is one hash exchange on user_id (no pre-dedup shuffle)") {
    val plan = finalPlan(EventJoins.asofOf(planted))
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"as-of join should shuffle exactly once, saw $n:\n$plan")
  }

  test("range join: window is [0, 6h), boundary excluded, pairs complete") {
    val got = EventJoins.rangeOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = Array(
      (12L, 11L, 0L),
      (15L, 11L, 200L),
      (15L, 13L, 100L),
      (15L, 14L, 100L), // range join keeps BOTH duplicate-ts errors
      (22L, 20L, 21599999999L)) // inside; click 21 at exactly 6 h +1 µs is out
    assert(got.toSeq == expect.toSeq)
  }
}
