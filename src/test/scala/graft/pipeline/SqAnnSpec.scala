package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantized-ANN (SQ8 + PQ-ADC) gates beyond the DuckDB hash oracle:
  * output-shape invariants and the measured recall floors of the
  * compressed scans (sq measured 1.0 and pq 0.53 at sf0.001 — floors
  * leave refactoring headroom but catch a broken quantizer).
  */
class SqAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def shapeCheck(name: String): Unit = {
    val out = graft.SparkEntry.queries(name)(spark, dir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L), s"query $q ranks")
      val cs = sorted.map(_.getDouble(3)).toSeq
      assert(cs == cs.sorted.reverse, s"query $q cosines not descending")
      rows.foreach(r => assert(r.getLong(2) >= 10L, s"query $q returned a query id"))
    }
  }

  test("sq ANN emits ranked top-3 per query from the corpus side only") {
    shapeCheck("sim_sq_ann")
  }

  test("pq ANN emits ranked top-3 per query from the corpus side only") {
    shapeCheck("sim_pq_ann")
  }

  test("sq and pq recall@3 vs the exact scan clear their floors") {
    val rec = graft.SparkEntry.queries("sim_ann_recall")(spark, dir)
      .groupBy("method").agg(avg("recall").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rec("sq") >= 0.75, s"sq mean recall@3 ${rec("sq")} under the 0.75 floor")
    assert(rec("pq") >= 0.30, s"pq mean recall@3 ${rec("pq")} under the 0.30 floor")
  }
}
