package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Watermark semantics gate: finalized tumbling windows appear exactly
  * once, in-watermark late events are counted, beyond-watermark late
  * events are dropped (state for a closed window is gone, not
  * resurrected).
  */
class StreamingAggSpec extends SparkSpec {

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("tumbling event-time stats: watermark finalizes, bounds, and drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Timestamp, Double)]
    val agg = StreamingAgg.tumblingStats(
      input.toDS().toDF("user_id", "ts", "value"), "1 minute", "1 minute")
    val query = agg.writeStream
      .format("memory").queryName("agg_out").outputMode("append").start()

    // batch 1: two points in window [0,60); a point at 150s advances the
    // watermark to 90s, past that window's end -> it finalizes
    input.addData((1L, ts(10), 1.0), (1L, ts(20), 3.0), (1L, ts(150), 5.0))
    query.processAllAvailable()
    // batch 2: 40s is BEYOND the watermark (its window closed) -> dropped;
    // 170s is in-watermark late for the open window [120,180) -> counted;
    // 300s advances the watermark to 240s, finalizing [120,180)
    input.addData((1L, ts(40), 100.0), (1L, ts(170), 7.0), (1L, ts(300), 9.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark.sql(
      "select win_start, n, sum, mn, mx from agg_out order by win_start")
      .collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getDouble(2)))
    // [0,60): n=2 sum=4 (the 100.0 at 40s was dropped); [120,180): n=2 sum=12
    assert(rows.toSeq == Seq((0L, 2L, 4.0), (120L, 2L, 12.0)),
      s"got ${rows.toSeq}")
  }
}
