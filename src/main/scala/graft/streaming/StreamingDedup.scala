package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication over a document stream — the stateful
  * twin of the batch `dedup_exact` operator (digest-groupBy keep-first):
  * per md5(text) digest the state carries the first-seen doc id and the
  * running copy count, and every arriving document emits one row telling
  * whether it is the keeper or the n-th duplicate.
  *
  * Semantics: keeper = first arrival for the digest (equals the batch
  * twin's MIN(doc_id) whenever arrival follows id order). State is one
  * (long, long) per distinct digest — the same cardinality the batch
  * groupBy shuffles, here resident in the state store and scalable via
  * state-store partitioning. For bounded state at 100 TB ingest, cap
  * retention with a watermark upstream (`withWatermark` +
  * `dropDuplicatesWithinWatermark` is the built-in keep-first-only form;
  * this operator additionally reports the duplicate index and keeper id,
  * which the built-in drops).
  */
object StreamingDedup {

  final case class DocEvent(doc_id: Long, text: String)
  final case class DupEvent(doc_id: Long, h: String, keeper: Long, copy_idx: Long)
  final case class DupState(keeper: Long, copies: Long)

  /** Lowercase md5 hex — identical to Spark SQL's `md5()`. */
  def digest(text: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Attach the stateful dedup to a document stream. Within one
    * micro-batch group, events are processed in doc_id order (micro-batch
    * arrival order inside a group is not defined, and a deterministic
    * fold is what makes the streaming result batch-comparable).
    */
  def dedupStream(docs: Dataset[DocEvent])(
      implicit spark: SparkSession): Dataset[DupEvent] = {
    import spark.implicits._
    docs
      .groupByKey(d => digest(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (h: String, events: Iterator[DocEvent], state: GroupState[DupState]) => {
          var st = state.getOption.getOrElse(DupState(-1L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[DupEvent]
          events.toSeq.sortBy(_.doc_id).foreach { d =>
            val keeper = if (st.copies == 0L) d.doc_id else st.keeper
            st = DupState(keeper, st.copies + 1L)
            out += DupEvent(d.doc_id, h, keeper, st.copies)
          }
          state.update(st)
          out.iterator
        })
  }
}
