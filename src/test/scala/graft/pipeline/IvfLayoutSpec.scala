package graft.pipeline

import graft.{SparkEntry, SparkSpec}

/** Gates for the persisted cell-partitioned IVF layout:
  *
  *  1. the ANN scan over the layout actually PRUNES — the executed plan
  *     carries a non-empty PartitionFilters on the cell column (not a
  *     post-scan filter that reads every cell);
  *  2. results equal the in-memory `sim_ivf_ann` path row-for-row (the
  *     layout is a physical re-arrangement, not a semantic change).
  */
class IvfLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("layout ANN prunes partitions and equals the in-memory IVF path") {
    val layout = SparkEntry.queries("layout_ivf_ann")(spark, dir)
    val plan = layout.queryExecution.executedPlan.toString
    // NB: Spark truncates long INSET lists with "…" (no closing bracket),
    // so match the filter's head rather than a bracketed span.
    assert("PartitionFilters: \\[cell#\\d+L? (INSET|IN)".r.findFirstIn(plan).isDefined,
      s"expected a non-empty PartitionFilters on cell in:\n${plan.take(4000)}")

    val mem = SparkEntry.queries("sim_ivf_ann")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val lay = layout
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(lay.sameElements(mem), "layout ANN != in-memory IVF ANN")
  }
}
