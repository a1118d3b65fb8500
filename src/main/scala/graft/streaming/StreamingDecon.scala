package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Curation

/** Streaming benchmark decontamination — the stream twin of the batch
  * `decon_ngram_overlap`: documents arrive as a stream and each is
  * screened against a STATIC eval-benchmark gram table, emitting one
  * verdict row (n_grams, hit_grams, contaminated) per document.
  *
  * Scale shape: the eval gram dictionary stays a DataFrame on the
  * static side of a stream-static left join (never collected, never
  * hint-broadcast — it is benchmark-sized but the planner decides);
  * the per-doc roll-up is a `flatMapGroupsWithState` whose state is one
  * boolean per doc (screened-already dedup for at-least-once sources),
  * NOT the gram set. All grams of a doc co-arrive in its micro-batch
  * (one event expands to its grams map-side), so the roll-up never
  * waits on state across batches.
  *
  * Semantics vs batch: identical verdict per doc (spec-gated ≡
  * [[Curation.deconOf]], including sub-8-token docs which carry a
  * sentinel event so they still emit a clean verdict); re-deliveries of
  * an already-screened doc are suppressed by the state bit.
  */
object StreamingDecon {

  final case class DocEvent(doc_id: Long, text: String)
  final case class GramEvent(doc_id: Long, gh: Long)
  final case class Verdict(doc_id: Long, n_grams: Long, hit_grams: Long, contaminated: Long)

  /** A gh value [[graft.pipeline.Export.md5LongLocal]] can never
    * produce (hashes are 60-bit non-negative) — the sentinel for docs
    * too short for any 8-gram.
    */
  private[streaming] val NoGram = Long.MinValue

  /** Expand one training document to its distinct hashed-gram events;
    * docs too short for any 8-gram yield a single sentinel event (joins
    * to nothing, still produces a verdict).
    */
  def gramEvents(d: DocEvent): Seq[GramEvent] = {
    val gs = Curation.gramsLocal(d.text)
    if (gs.isEmpty) Seq(GramEvent(d.doc_id, NoGram))
    else gs.map(GramEvent(d.doc_id, _))
  }

  /** Attach the screening pipeline to a document stream.
    *
    * @param docs      streaming training documents (eval-split docs, if
    *                  present, are ignored — they ARE the benchmark)
    * @param evalGrams static one-column (`gh`) distinct hashed
    *                  benchmark grams
    */
  def verdictStream(docs: Dataset[DocEvent], evalGrams: DataFrame)(
      implicit spark: SparkSession): Dataset[Verdict] = {
    import spark.implicits._
    val grams = docs
      .filter(d => d.doc_id % Curation.EvalMod != 0L)
      .flatMap(gramEvents _)
    grams.toDF()
      .join(evalGrams.select(col("gh"), lit(1L).as("hit")), Seq("gh"), "left")
      .select(col("doc_id"), col("gh"), coalesce(col("hit"), lit(0L)).as("hit"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (id: Long, events: Iterator[(Long, Long, Long)], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            var n = 0L; var h = 0L
            events.foreach { case (_, gh, hit) => if (gh != NoGram) { n += 1; h += hit } }
            Iterator(Verdict(id, n, h, if (h > 0) 1L else 0L))
          }
        })
  }
}
