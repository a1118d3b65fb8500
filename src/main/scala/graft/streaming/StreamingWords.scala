package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.sfa.{SFAModel, Words}

/** Streaming SFA word extraction (SURVEY §7.1 step 11): the momentary
  * Fourier recurrence (MFT.java:127-151) is exactly an incremental
  * per-event update, so a fitted SFA model scores an event stream with
  * `flatMapGroupsWithState` — per series key the state carries the last
  * window ring, the running window sums and the complex MFT vector, and
  * every arriving point costs O(l) and emits at most one word.
  *
  * Model fitting stays a batch job (quantizer bins don't drift per
  * event); the stream applies the broadcast model. This is the
  * "frequent model updates / streaming mining" surface the reference
  * motivates (README.md:239-241).
  */
object StreamingWords {

  /** Per-key recurrence state. `ring` holds the last `windowSize` values
    * (ring buffer at `pos`), `mft` the interleaved coefficient vector of
    * the current window.
    */
  final case class MftState(
      ring: Array[Double],
      pos: Int,
      count: Long,
      sum: Double,
      sqSum: Double,
      mft: Array[Double])

  final case class PointEvent(user_id: Long, seq: Long, value: Double)
  final case class WordEvent(user_id: Long, offset: Long, word: Long)

  /** One point through the recurrence; returns the emitted word, if the
    * window is complete. Mirrors Fourier.transformWindowing step-wise.
    */
  private def step(model: SFAModel, st: MftState, x: Double): (MftState, Option[WordEvent]) = {
    val w = model.windowSize
    val startOffset = if (model.normMean) 2 else 0
    var wordLength = math.min(w, model.wordLength + startOffset)
    wordLength += wordLength % 2

    val ring = st.ring.clone()
    val outgoing = ring(st.pos)
    ring(st.pos) = x
    val pos = (st.pos + 1) % w
    val count = st.count + 1
    val sum = st.sum + x - (if (st.count >= w) outgoing else 0.0)
    val sqSum = st.sqSum + x * x - (if (st.count >= w) outgoing * outgoing else 0.0)

    if (count < w) (MftState(ring, pos, count, sum, sqSum, st.mft), None)
    else {
      val mft =
        if (count == w) {
          // first complete window: direct DFT over the ring in order
          val ordered = Array.tabulate(w)(i => ring((pos + i) % w))
          graft.sfa.Fourier.rawWindowDft(ordered, 0, w, wordLength)
        } else {
          val m = st.mft.clone()
          var k = 0
          while (k < wordLength) {
            val phiRe = math.cos(2.0 * math.Pi * (k / 2) / w)
            val phiIm = math.sin(2.0 * math.Pi * (k / 2) / w)
            val re1 = m(k) + x - outgoing
            val im1 = m(k + 1)
            m(k) = re1 * phiRe - im1 * phiIm
            m(k + 1) = re1 * phiIm + im1 * phiRe
            k += 2
          }
          m
        }
      val mean = sum / w
      val buf = sqSum / w - mean * mean
      val std = if (buf > 0) math.sqrt(buf) else 0.0
      val norm = if (model.lowerBounding) 1.0 / math.sqrt(w) else 1.0
      val factor = (if (model.applyZNorm && std > 0) 1.0 / std else 1.0) * norm
      val approx = graft.sfa.Fourier.cutAndNorm(mft, startOffset, model.wordLength, factor)
      val word = Words.createWord(model.quantize(approx), model.wordLength, model.usedBits)
      (MftState(ring, pos, count, sum, sqSum, mft),
        Some(WordEvent(0L, count - w, word))) // user filled by caller
    }
  }

  /** Attach the stateful word extraction to a stream of per-series
    * points. Input must be per-key ordered (upstream watermark/sort);
    * output is one word per completed sliding window.
    */
  def wordStream(points: Dataset[PointEvent], model: SFAModel)(
      implicit spark: SparkSession): Dataset[WordEvent] = {
    import spark.implicits._
    points
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, events: Iterator[PointEvent], state: GroupState[MftState]) => {
          val w = model.windowSize
          var st = state.getOption.getOrElse(
            MftState(new Array[Double](w), 0, 0L, 0.0, 0.0, null))
          val out = scala.collection.mutable.ArrayBuffer.empty[WordEvent]
          events.toSeq.sortBy(_.seq).foreach { ev =>
            val (next, emitted) = step(model, st, ev.value)
            st = next
            emitted.foreach(we => out += we.copy(user_id = key))
          }
          state.update(st)
          out.iterator
        })
  }
}
