package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Gates for streaming mixture resampling:
  *
  *  1. streaming copy counts ≡ the batch [[graft.pipeline.Mix.mixOf]]
  *     rows on the same skewed corpus, docs split across micro-batches;
  *  2. a re-delivered doc is resampled exactly once (state dedup);
  *  3. an unfitted domain emits copies = 0.
  */
class StreamingMixSpec extends SparkSpec {

  test("streaming resample equals the batch mixture rows; re-delivery and unknown domains handled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0 until 90).map(i => StreamingMix.DocEvent(i.toLong, "web")) ++
      (90 until 100).map(i => StreamingMix.DocEvent(i.toLong, "code"))
    val batch = graft.pipeline.Mix.mixOf(
      docs.map(d => (d.doc_id, d.source)).toDF("doc_id", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val counts = docs.groupBy(_.source).map { case (s, ds) => s -> ds.size.toLong }

    val input = MemoryStream[StreamingMix.DocEvent]
    val query = StreamingMix.mixStream(input.toDS(), counts)
      .writeStream.format("memory").queryName("mix_out").outputMode("append")
      .start()
    input.addData(docs.take(40))
    query.processAllAvailable()
    // re-delivery of doc 0 must not emit a second row; an unfitted
    // domain rides along in the same batch
    input.addData(docs.drop(40) :+ docs.head :+ StreamingMix.DocEvent(999L, "novel"))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("mix_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.count(_._1 == 0L) == 1, "re-delivered doc emitted twice")
    val novel = got.filter(_._1 == 999L)
    assert(novel.toSeq == Seq((999L, "novel", 0L)))
    assert(got.filterNot(_._1 == 999L).toSet == batch)
  }
}
