package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Gate: streamed conversions ≡ the batch funnel's step-3 survivors on
  * the same planted corpus (deadline violations, pre-view clicks, and
  * at-most-once conversion included), across micro-batch boundaries.
  */
class StreamingFunnelSpec extends SparkSpec {

  private val W = 100L

  // (event_id, tsus, user_id, type)
  private val evs = Seq(
    // user 1 converts: view@0 → click@50 (in [0,100)) → purchase@120 (in [50,150))
    StreamingFunnel.Event(0L, 0L, 1L, "view"),
    StreamingFunnel.Event(1L, 50L, 1L, "click"),
    StreamingFunnel.Event(2L, 120L, 1L, "purchase"),
    // a second full pass must NOT convert again
    StreamingFunnel.Event(3L, 200L, 1L, "view"),
    StreamingFunnel.Event(4L, 210L, 1L, "click"),
    StreamingFunnel.Event(5L, 220L, 1L, "purchase"),
    // user 2: click misses the deadline; the later view can't resurrect it
    StreamingFunnel.Event(10L, 0L, 2L, "view"),
    StreamingFunnel.Event(11L, 150L, 2L, "click"),
    StreamingFunnel.Event(12L, 200L, 2L, "view"),
    // user 3: pre-view click ignored, then converts at the window edges
    StreamingFunnel.Event(20L, 10L, 3L, "click"),
    StreamingFunnel.Event(21L, 20L, 3L, "view"),
    StreamingFunnel.Event(22L, 30L, 3L, "click"),
    StreamingFunnel.Event(23L, 129L, 3L, "purchase"),
    // user 4: purchase misses its deadline
    StreamingFunnel.Event(30L, 0L, 4L, "view"),
    StreamingFunnel.Event(31L, 50L, 4L, "click"),
    StreamingFunnel.Event(32L, 160L, 4L, "purchase"))

  test("streamed conversions equal the batch funnel's completions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[StreamingFunnel.Event]
    val query = StreamingFunnel.funnelStream(input.toDS(), W)
      .writeStream.format("memory").queryName("funnel_out").outputMode("append")
      .start()
    // boundary cuts through user 1's conversion and user 3's wedge
    input.addData(evs.take(2))
    query.processAllAvailable()
    input.addData(evs.slice(2, 11))
    query.processAllAvailable()
    input.addData(evs.drop(11))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("funnel_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 0L, 50L, 120L), (3L, 20L, 30L, 129L)))
  }
}
