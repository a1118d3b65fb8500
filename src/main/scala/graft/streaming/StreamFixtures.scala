package graft.streaming

/** THE bench-scale streaming fixture, defined once: `graft.Bench`'s
  * tracked streaming lines and the bounded-state gate
  * (StreamingStateSizeSpec) must measure the SAME load — independent
  * copies would let a bench retune silently strand the state gate on a
  * distribution the bench no longer runs. 100k events over 4
  * micro-batches of [[ChunkSize]]; keys: [[DedupKeys]] distinct
  * digests / [[WordUsers]] series.
  */
object StreamFixtures {

  val ChunkSize = 25000

  // ---- dedup twin: 100k docs, ~30% duplicates over 70k digests ------
  val DedupEvents = 100000
  val DedupKeys = 70000

  def dedupDocEvents: IndexedSeq[StreamingDedup.DocEvent] =
    (0 until DedupEvents).map(i =>
      StreamingDedup.DocEvent(i.toLong, s"document body number ${i % DedupKeys}"))

  // ---- words twin: 200 series x 500 points through the MFT state ----
  val WordUsers = 200
  val WordPoints = 500

  def wordModel: graft.sfa.SFAModel = {
    val walk = graft.ts.Loaders.randomWalk(WordPoints, 999L)
    graft.sfa.SFA.fitWindowing(Array((walk, 0.0)), 16, 8, 4,
      normMean = false, lowerBounding = true)
  }

  /** Interleaved by seq so chunked feeding preserves per-key order. */
  def wordPointEvents: IndexedSeq[StreamingWords.PointEvent] = {
    val walks = (0 until WordUsers).map(u => graft.ts.Loaders.randomWalk(WordPoints, 1000L + u))
    (0 until WordPoints).flatMap(i => (0 until WordUsers).map(u =>
      StreamingWords.PointEvent(u.toLong, i.toLong, walks(u)(i))))
  }
}
