package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Gate: streamed as-of matches ≡ the batch `EventJoins.asofOf` rows on
  * the sf0.001 events table (every user, every click — nulls, same-ts
  * matches and duplicate-ts ties included), delivered per user in time
  * order across several micro-batches.
  */
class StreamingAsofSpec extends SparkSpec {

  test("streamed matches equal the batch as-of join on the fixture corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.util.Tables.load(spark, dir, "events")
      .withColumn("tsus", unix_micros(col("ts").cast("timestamp")))
    val batch = graft.queries.EventJoins.asofOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    // in-order delivery per user: sort the whole corpus by time (the
    // stream contract the batch twin defines truth on)
    val docs = ev.select(col("event_id"), col("tsus"), col("user_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .sortBy { case (id, t, _, _) => (t, id) }
      .map { case (id, t, u, ty) => StreamingAsof.Event(id, t, u, ty) }

    val input = MemoryStream[StreamingAsof.Event]
    val query = StreamingAsof.asofStream(input.toDS())
      .writeStream.format("memory").queryName("asof_out").outputMode("append")
      .start()
    docs.grouped(400).foreach { batchDocs =>
      input.addData(batchDocs)
      query.processAllAvailable()
    }
    query.stop()

    val got = spark.table("asof_out").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == batch, s"stream/batch diverge: ${(got diff batch).take(3)} / ${(batch diff got).take(3)}")
  }
}
