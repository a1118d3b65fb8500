package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Bounded-state gate for the stateful streaming twins, measured from
  * the engine's own telemetry (`StreamingQueryProgress.stateOperators`)
  * instead of trusted from a code comment: after the bench-scale drive
  * (100k events, 4 micro-batches), the state store must hold one row
  * per DISTINCT KEY — digests for the dedup twin, series keys for the
  * words twin — never one per event. This is the property that lets the
  * operators run unbounded ingest at a state cost proportional to key
  * cardinality (with watermark/timeout eviction as the documented lever
  * when even the key set is unbounded).
  */
class StreamingStateSizeSpec extends SparkSpec {

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
    val so = q.lastProgress.stateOperators
    assert(so.nonEmpty, "no state operator reported progress")
    so.map(_.numRowsTotal).sum
  }

  test("dedup state rows == distinct digests (70k), not events (100k), after 4 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the bench distribution: 100k events over 70k distinct texts
    val events = (0 until 100000).map(i =>
      StreamingDedup.DocEvent(i.toLong, s"document body number ${i % 70000}"))
    val input = MemoryStream[StreamingDedup.DocEvent]
    val q = StreamingDedup.dedupStream(input.toDS())(spark)
      .writeStream.format("noop").outputMode("append").start()
    try {
      events.grouped(25000).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val rows = stateRows(q)
      assert(rows == 70000L,
        s"state must be one row per distinct digest: got $rows, want 70000")
    } finally q.stop()
  }

  test("words state rows == series keys (200), not points (100k), after 4 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = {
      val walk = graft.ts.Loaders.randomWalk(500, 999L)
      graft.sfa.SFA.fitWindowing(Array((walk, 0.0)), 16, 8, 4,
        normMean = false, lowerBounding = true)
    }
    val walks = (0 until 200).map(u => graft.ts.Loaders.randomWalk(500, 1000L + u))
    // interleaved by seq so chunked feeding preserves per-key order
    val points = (0 until 500).flatMap(i => (0 until 200).map(u =>
      StreamingWords.PointEvent(u.toLong, i.toLong, walks(u)(i))))
    val input = MemoryStream[StreamingWords.PointEvent]
    val q = StreamingWords.wordStream(input.toDS(), model)(spark)
      .writeStream.format("noop").outputMode("append").start()
    try {
      points.grouped(25000).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val rows = stateRows(q)
      assert(rows == 200L,
        s"state must be one ring per series key: got $rows, want 200")
    } finally q.stop()
  }
}
