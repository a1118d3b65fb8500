package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Dedup

/** Streaming NEAR-duplicate candidate generation — the stateful twin of
  * the batch MinHash-LSH blocking stage (`dedup_minhash_lsh`): each
  * arriving document is shingled (word 3-grams), MinHash-signed (the
  * same 32 affine permutations the batch plan computes as
  * min-aggregates) and banded (8 bands × 4 rows); per band bucket the
  * state keeps the FIRST-seen doc id (the cluster anchor), and every
  * later arrival in the bucket emits a candidate row pointing at its
  * anchor.
  *
  * Semantics vs batch: the batch self-join emits ALL bucket pairs
  * (a < b); the stream emits the anchor STAR per bucket — exactly the
  * keep-first dedup decision ("does an earlier doc share a bucket with
  * me"), with O(1) state per distinct (band, bandkey) instead of
  * O(bucket size). A doc colliding with its anchor in several bands
  * yields one row per band — consumers that want distinct pairs
  * aggregate on (doc_id, anchor). Candidates are LSH candidates, not
  * verified duplicates; route them through the batch verify join (exact
  * jaccard over capped shingles) or any downstream scorer.
  *
  * Scale shape: state cardinality = distinct band buckets (≤ 8 × docs,
  * shrinking with duplication), partitioned by the state store on the
  * bucket key — the same key the batch plan shuffles. Per-record work
  * is shingles × 32 integer ops, map-side.
  */
object StreamingNearDup {

  final case class DocEvent(doc_id: Long, text: String)
  final case class BandEvent(band: Int, bandkey: String, doc_id: Long)
  final case class CandEvent(doc_id: Long, band: Int, anchor: Long)
  final case class BucketState(anchor: Long)

  /** Expand a document to its 8 band-bucket events (no Spark needed —
    * reused by tests and by the batch-parity spec).
    */
  def bandEvents(d: DocEvent): Seq[BandEvent] = {
    val sh = Dedup.shinglesLocal(d.text)
    if (sh.isEmpty) Seq.empty
    else Dedup.bandKeysLocal(Dedup.sigLocal(sh)).map { case (b, k) =>
      BandEvent(b, k, d.doc_id)
    }
  }

  /** Attach the stateful candidate generator to a document stream.
    * Within one micro-batch bucket group, events fold in doc_id order
    * (arrival order inside a group is undefined; a deterministic fold
    * keeps the stream batch-comparable). The first doc of a bucket is
    * the anchor and emits nothing; every later doc emits its anchor.
    */
  def candidateStream(docs: Dataset[DocEvent])(
      implicit spark: SparkSession): Dataset[CandEvent] = {
    import spark.implicits._
    docs
      .flatMap(bandEvents _)
      .groupByKey(e => (e.band, e.bandkey))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: (Int, String), events: Iterator[BandEvent], state: GroupState[BucketState]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[CandEvent]
          var anchor = state.getOption.map(_.anchor).getOrElse(-1L)
          events.toSeq.sortBy(_.doc_id).foreach { e =>
            if (anchor < 0L) anchor = e.doc_id
            else if (e.doc_id != anchor) out += CandEvent(e.doc_id, e.band, anchor)
          }
          state.update(BucketState(anchor))
          out.iterator
        })
  }
}
