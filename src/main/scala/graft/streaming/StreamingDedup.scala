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

  private val hexDigits = "0123456789abcdef".toCharArray
  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Lowercase md5 hex — identical to Spark SQL's `md5()`. Table-driven
    * hex over a thread-cached digest instance: this runs once per EVENT
    * on the hot state path, where the idiomatic per-byte
    * `"%02x".format` costs more than the MD5 itself (locale lookup +
    * boxing + format parse per byte).
    */
  def digest(text: String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(text.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = hexDigits(b >>> 4)
      out(2 * i + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new String(out)
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
          // hot path: one state fold per group per micro-batch — sort the
          // group's events in place and fold with primitive locals (the
          // per-event case-class state allocation was measurable at the
          // bench's 100k-event load)
          val arr = events.toArray
          if (arr.length > 1) arr.sortInPlaceBy(_.doc_id)
          val st0 = state.getOption.getOrElse(DupState(-1L, 0L))
          var keeper = st0.keeper
          var copies = st0.copies
          val out = new Array[DupEvent](arr.length)
          var i = 0
          while (i < arr.length) {
            val d = arr(i)
            if (copies == 0L) keeper = d.doc_id
            copies += 1L
            out(i) = DupEvent(d.doc_id, h, keeper, copies)
            i += 1
          }
          state.update(DupState(keeper, copies))
          out.iterator
        })
  }
}
