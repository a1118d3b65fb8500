package graft

/** Plan gates for the vocabulary-ranked queries: the n-gram vocabulary is
  * fact-proportional (it grows with the corpus), so no plan may sort it on
  * a single partition.
  *
  *  - o4/f9 (WeaselQ.chiRanked) rank-then-filter: Spark 4 must rewrite the
  *    row_number filter into WindowGroupLimit (Partial per input partition,
  *    Final after the shuffle) — each map task keeps only its local top-K.
  *  - f8 (MuseQ chi²-zeroing) keeps EVERY key, so no rank filter exists to
  *    rewrite; the plan must instead use the TakeOrdered boundary predicate
  *    and contain no window operator at all.
  */
class VocabRankPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("chiRanked (o4) gets WindowGroupLimit pushdown — vocab never sorts on one partition") {
    val plan = SparkEntry.queries("o4_feature_cap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"), "expected a map-side Partial group limit")
  }

  test("f8 chi²-zeroing plan is window-free (boundary predicate, no global sort)") {
    val df = SparkEntry.queries("f8_chi2_zeroing")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["), s"f8 must not contain a window operator:\n$plan")
    // semantics: exactly min(TopK, |vocab|) keys keep their counts
    val rows = df.collect()
    val kept = rows.count(_.getLong(2) > 0L)
    assert(kept == math.min(30, rows.length))
  }
}
