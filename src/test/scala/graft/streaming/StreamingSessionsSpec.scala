package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Gate: streamed closed sessions ≡ the batch `sessionizeOf` rows minus
  * each user's final (still-open) session, with micro-batch boundaries
  * cutting through sessions.
  */
class StreamingSessionsSpec extends SparkSpec {

  private val gapUs = 100L

  test("closed sessions equal the batch sessionization minus each user's open tail") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: sessions [e0 e1], [e2], [e3 e4]; user 2: [e5], [e6 e7]
    val evs = Seq(
      StreamingSessions.Event(0L, 0L, 1L),
      StreamingSessions.Event(1L, 50L, 1L),
      StreamingSessions.Event(2L, 400L, 1L),
      StreamingSessions.Event(3L, 900L, 1L),
      StreamingSessions.Event(4L, 950L, 1L),
      StreamingSessions.Event(5L, 10L, 2L),
      StreamingSessions.Event(6L, 500L, 2L),
      StreamingSessions.Event(7L, 560L, 2L))

    val batchDf = evs.map(e => (e.event_id, e.tsus, e.user_id, "click", 0.0))
      .toDF("event_id", "tsus", "user_id", "event_type", "value")
    // the batch twin at the spec's gap (sessionizeOf reads the package
    // constant, so recompute here with the same two-window shape)
    val batch = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val order = Window.partitionBy("user_id").orderBy(col("tsus"), col("event_id"))
      val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      batchDf
        .withColumn("gap", col("tsus") - lag("tsus", 1).over(order))
        .withColumn("brk", when(col("gap").isNull || col("gap") > gapUs, 1L).otherwise(0L))
        .withColumn("sess", sum("brk").over(run))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n"), (max("tsus") - min("tsus")).as("dur"),
          min("event_id").as("first"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    }
    val lastSess = batch.groupBy(_._1).map { case (u, ss) => u -> ss.map(_._2).max }
    val expect = batch.filterNot { case (u, s, _, _, _) => lastSess(u) == s }

    val input = MemoryStream[StreamingSessions.Event]
    val query = StreamingSessions.sessionStream(input.toDS(), gapUs)
      .writeStream.format("memory").queryName("sess_out").outputMode("append")
      .start()
    // batch boundary in the middle of user 1's first and third sessions
    input.addData(evs.take(1))
    query.processAllAvailable()
    input.addData(evs.slice(1, 4) ++ evs.slice(5, 7))
    query.processAllAvailable()
    input.addData(Seq(evs(4), evs(7)))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expect, s"got $got\nexpect $expect")
  }
}
