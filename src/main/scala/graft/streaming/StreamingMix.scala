package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Export

/** Streaming domain-mixture resampling — the stream twin of the batch
  * `mix_domains`: documents arrive as a stream and each is assigned its
  * deterministic replication count against a BATCH-FITTED mixture model
  * (the per-domain corpus counts). The fit stays a batch job — mixture
  * rates are global corpus statistics — and the stream applies the
  * broadcast model, the same fit/apply split as [[StreamingScore]].
  *
  * Per-record arithmetic is bit-identical to the batch column form
  * (spec-gated stream ≡ batch): copies = N div (S·n_s) + [md5("mix:" ‖
  * doc_id) mod (S·n_s) < N mod (S·n_s)], via the executor-local md5
  * twin. State is one seen-bit per doc (at-least-once dedup, like
  * [[StreamingDecon]]); the decision itself is stateless and
  * idempotent. Documents from a domain absent from the fitted model
  * emit copies = 0 — not part of the target mixture.
  */
object StreamingMix {

  final case class DocEvent(doc_id: Long, source: String)
  final case class Resample(doc_id: Long, source: String, copies: Long)

  /** Attach mixture resampling to a document stream.
    *
    * @param counts the fitted model: per-domain document counts from
    *               the batch corpus (model-sized — one entry per domain)
    */
  def mixStream(docs: Dataset[DocEvent], counts: Map[String, Long])(
      implicit spark: SparkSession): Dataset[Resample] = {
    import spark.implicits._
    require(counts.nonEmpty, "mixture model must cover at least one domain")
    val nd = counts.values.sum
    val st = counts.size.toLong
    val bc = spark.sparkContext.broadcast(counts)
    docs
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: Long, events: Iterator[DocEvent], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            events.toSeq.headOption.iterator.map { d =>
              bc.value.get(d.source) match {
                case Some(ns) =>
                  val den = st * ns
                  val extra =
                    if (Export.md5LongLocal(s"mix:${d.doc_id}") % den < nd % den) 1L else 0L
                  Resample(d.doc_id, d.source, nd / den + extra)
                case None => Resample(d.doc_id, d.source, 0L)
              }
            }
          }
        })
  }
}
