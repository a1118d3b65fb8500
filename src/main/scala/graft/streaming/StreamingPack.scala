package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Export

/** Streaming sequence packing — the stream twin of the batch
  * `pack_sequences`: documents arrive as a stream and each is appended
  * to its md5 bucket's concat stream, emitting the token offsets and
  * the fixed-length-context span it occupies.
  *
  * Scale shape: token counting and bucket assignment are map-side
  * column expressions (the SAME expressions the batch query uses); the
  * per-bucket fold is a `flatMapGroupsWithState` whose state is two
  * longs — the bucket's running token offset and its packing frontier
  * (highest doc_id packed) — O(1) per bucket regardless of stream
  * length.
  *
  * Semantics vs batch: the batch packer concatenates each bucket in
  * doc_id order; the stream packs in arrival order, sorting within a
  * micro-batch, so a per-bucket doc_id-ordered stream reproduces the
  * batch packing exactly (spec-gated ≡ [[Export.packSequencesOf]]).
  * A re-delivered or late doc at-or-below the frontier is dropped — an
  * offset stream is append-only, so late data CANNOT be spliced in
  * without repacking; the drop is the honest semantics and mirrors the
  * at-least-once dedup of the other stream twins.
  */
object StreamingPack {

  final case class DocEvent(doc_id: Long, text: String)
  final case class Packed(doc_id: Long, bucket: Long, n_toks: Long,
      start_off: Long, ctx_first: Long, ctx_last: Long)
  final case class BucketState(endOff: Long, maxDoc: Long)

  def packStream(docs: Dataset[DocEvent], nBuckets: Long)(
      implicit spark: SparkSession): Dataset[Packed] = {
    import spark.implicits._
    docs.toDF()
      .select(col("doc_id"), Export.tokCount(col("text")).as("n_toks"),
        Export.bucketOf(col("text"), nBuckets).as("bucket"))
      .filter(col("n_toks") >= 1)
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (bucket: Long, events: Iterator[(Long, Long, Long)],
         state: GroupState[BucketState]) => {
          val st0 = state.getOption.getOrElse(BucketState(0L, Long.MinValue))
          var endOff = st0.endOff
          var maxDoc = st0.maxDoc
          val out = Vector.newBuilder[Packed]
          for ((id, nToks, _) <- events.toVector.sortBy(_._1) if id > maxDoc) {
            val start = endOff
            endOff += nToks
            maxDoc = id
            out += Packed(id, bucket, nToks, start,
              start / Export.CtxLen, (endOff - 1) / Export.CtxLen)
          }
          state.update(BucketState(endOff, maxDoc))
          out.result().iterator
        })
  }
}
