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
    // THE bench load, from the shared fixture — gate and bench cannot drift
    val events = StreamFixtures.dedupDocEvents
    val input = MemoryStream[StreamingDedup.DocEvent]
    val q = StreamingDedup.dedupStream(input.toDS())(spark)
      .writeStream.format("noop").outputMode("append").start()
    try {
      events.grouped(StreamFixtures.ChunkSize).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val rows = stateRows(q)
      assert(rows == StreamFixtures.DedupKeys.toLong,
        s"state must be one row per distinct digest: got $rows, want ${StreamFixtures.DedupKeys}")
    } finally q.stop()
  }

  test("words state rows == series keys (200), not points (100k), after 4 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamingWords.PointEvent]
    val q = StreamingWords.wordStream(input.toDS(), StreamFixtures.wordModel)(spark)
      .writeStream.format("noop").outputMode("append").start()
    try {
      StreamFixtures.wordPointEvents.grouped(StreamFixtures.ChunkSize).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val rows = stateRows(q)
      assert(rows == StreamFixtures.WordUsers.toLong,
        s"state must be one ring per series key: got $rows, want ${StreamFixtures.WordUsers}")
    } finally q.stop()
  }
}
