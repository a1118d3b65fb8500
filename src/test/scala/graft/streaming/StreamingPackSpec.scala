package graft.streaming

import graft.SparkSpec
import graft.pipeline.Export
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Gates for streaming sequence packing:
  *
  *  1. streaming offsets/context spans ≡ the batch
  *     [[Export.packSequencesOf]] rows on the same corpus at the same
  *     bucket count, with docs split across micro-batches;
  *  2. a re-delivered doc is packed exactly once (frontier dedup);
  *  3. empty docs carry no tokens and emit nothing (same as batch).
  */
class StreamingPackSpec extends SparkSpec {

  private def mkDocs: Seq[StreamingPack.DocEvent] = Seq(
    StreamingPack.DocEvent(0L, "a b c d e"),
    StreamingPack.DocEvent(1L, "f g"),
    StreamingPack.DocEvent(2L, ""), // empty: no tokens, no emission
    StreamingPack.DocEvent(3L, Seq.tabulate(600)(i => s"w$i").mkString(" ")), // spans contexts
    StreamingPack.DocEvent(4L, "x y z"),
    StreamingPack.DocEvent(5L, "p q r s"))

  test("streaming packing equals batch packing; re-delivery packs once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val nBuckets = 4L
    val docsDf = mkDocs.toDF("doc_id", "text")
    val batch = Export.packSequencesOf(docsDf, nBuckets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

    val input = MemoryStream[StreamingPack.DocEvent]
    val query = StreamingPack.packStream(input.toDS(), nBuckets)
      .writeStream.format("memory").queryName("pack_out").outputMode("append")
      .start()
    // batch 1: docs 0-2; batch 2: the rest plus a RE-delivery of doc 1,
    // which is at-or-below its bucket's frontier and must emit nothing
    input.addData(mkDocs.take(3))
    query.processAllAvailable()
    input.addData(mkDocs.drop(3) :+ mkDocs(1))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.sql(
      "select doc_id, bucket, n_toks, start_off, ctx_first, ctx_last from pack_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(streamed.length == streamed.map(_._1).distinct.length, "doc packed twice")
    assert(streamed.toSet == batch, s"stream ${streamed.toSet} != batch $batch")
    assert(!streamed.exists(_._1 == 2L), "empty doc must not emit")
  }
}
