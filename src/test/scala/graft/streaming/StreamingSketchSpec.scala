package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Gates for the streaming KMV sketch:
  *
  *  1. the final streamed estimate per language ≡ the batch
  *     `sketch_distinct_grams` value on the same corpus (small-set
  *     exact rule included), docs split across micro-batches;
  *  2. re-delivery is idempotent (set-union state, no seen-bit).
  */
class StreamingSketchSpec extends SparkSpec {

  test("final stream estimates equal the batch sketch; re-delivery is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("sketch_distinct_grams")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

    val docs = graft.util.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, l, t) => StreamingSketch.DocEvent(id, l, t) }

    val input = MemoryStream[StreamingSketch.DocEvent]
    val query = StreamingSketch.sketchStream(input.toDS())
      .writeStream.format("memory").queryName("kmv_out").outputMode("append")
      .start()
    input.addData(docs.take(200))
    query.processAllAvailable()
    // re-deliver a slice already seen, then the rest
    input.addData(docs.slice(100, 150))
    query.processAllAvailable()
    input.addData(docs.drop(200))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("kmv_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the estimate is monotone non-decreasing (below K it IS the state
    // size; at K the k-th minimum only shrinks, so (K−1)·H/h_(K) only
    // grows) ⇒ the final estimate is the maximum emitted
    val finalEst = rows.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._3).max }
    assert(finalEst == batch, s"stream $finalEst vs batch $batch")
  }
}
