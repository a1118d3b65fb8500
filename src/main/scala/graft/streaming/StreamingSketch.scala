package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.{Curation, Sketches}

/** Streaming KMV cardinality sketch — the stream twin of the batch
  * `sketch_distinct_grams`: per language the state is the K smallest
  * distinct 60-bit gram hashes seen so far (a bounded sorted array —
  * KMV's whole point is that this state never grows past K), and each
  * micro-batch emits the language's refreshed estimate. Merging is a
  * set union + truncate, so re-delivered documents are IDEMPOTENT — no
  * seen-bit needed, unlike the funnel/mix twins. Estimates refine
  * monotonically toward the batch value (spec-gated: final stream
  * estimate ≡ the batch query's, including the small-set exact rule);
  * per-record gram hashing is [[Curation.gramsLocal]], bit-identical
  * to the batch column form.
  */
object StreamingSketch {

  final case class DocEvent(doc_id: Long, lang: String, text: String)
  final case class Estimate(lang: String, state_size: Long, kmv_estimate: Long)

  def sketchStream(docs: Dataset[DocEvent])(
      implicit spark: SparkSession): Dataset[Estimate] = {
    import spark.implicits._
    docs
      .groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (lang: String, evs: Iterator[DocEvent], state: GroupState[Array[Long]]) => {
          val incoming = evs.flatMap(d => Curation.gramsLocal(d.text)).toArray
          if (incoming.isEmpty) Iterator.empty
          else {
            val merged = (state.getOption.getOrElse(Array.empty[Long]) ++ incoming)
              .distinct.sorted.take(Sketches.K)
            state.update(merged)
            Iterator.single(Estimate(lang, merged.length.toLong,
              Sketches.estimateLocal(merged.length, merged.last)))
          }
        })
  }
}
