package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding near-dup candidate generation — the stateful
  * twin of the batch multi-probe IVF-cell blocking (`dedup_embed_cosine`
  * in [[graft.pipeline.Similarity]]): each arriving vector is assigned
  * its `probes` nearest cells against a BROADCAST centroid table (the
  * batch plan's one-Lloyd-step integer centroids, fitted offline — at
  * cluster scale the centroid refresh is a periodic batch job, the
  * stream only assigns), and per cell the state keeps the FIRST-seen
  * vector id (the cluster anchor); every later arrival in the cell
  * emits a candidate row pointing at its anchor.
  *
  * Semantics vs batch: the batch cell self-join emits ALL same-cell
  * pairs (a < b); the stream emits the anchor STAR per cell — the
  * keep-first dedup decision, with O(1) state per distinct cell instead
  * of O(cell size). A vector probing several of its anchor's cells
  * yields one row per cell — consumers wanting distinct pairs aggregate
  * on (vec_id, anchor). Candidates are blocking candidates, not
  * verified duplicates; route them through the exact integer-cosine
  * re-score exactly like the batch plan does.
  *
  * Scale shape: state cardinality = distinct cells (C ≈ N / target cell
  * size, fixed per centroid generation), partitioned by the state store
  * on the cell key — the same key the batch plan shuffles on. Per-record
  * work = C integer dot products, map-side against the broadcast
  * centroids.
  */
object StreamingEmbedDup {

  final case class VecEvent(vec_id: Long, iv: Array[Long])
  final case class CellEvent(cell: Long, vec_id: Long)
  final case class CandEvent(vec_id: Long, cell: Long, anchor: Long)
  final case class CellState(anchor: Long)

  /** One centroid: (cell id, integer centroid vector, its squared norm). */
  final case class Centroid(cell: Long, cv: Array[Long], cn2: Long)

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The `probes` nearest cells of one vector — EXACTLY the batch
    * membership ranking (`dupMembership`): score = dot/√cn2 descending,
    * ties to the smaller cell id.
    */
  def probeCells(iv: Array[Long], centroids: Seq[Centroid], probes: Int): Seq[Long] =
    centroids
      .map(c => (c.cell, dot(iv, c.cv) / math.sqrt(c.cn2.toDouble)))
      .sortBy { case (cell, score) => (-score, cell) }
      .take(probes)
      .map(_._1)

  /** Attach the stateful candidate generator to a vector stream. Within
    * one micro-batch cell group, events fold in vec_id order (arrival
    * order inside a group is undefined; a deterministic fold keeps the
    * stream batch-comparable). The first vector of a cell is the anchor
    * and emits nothing; every later vector emits its anchor.
    */
  def candidateStream(
      vecs: Dataset[VecEvent],
      centroids: Seq[Centroid],
      probes: Int)(implicit spark: SparkSession): Dataset[CandEvent] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    vecs
      .flatMap(v => probeCells(v.iv, bc.value, probes).map(c => CellEvent(c, v.vec_id)))
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: Long, events: Iterator[CellEvent], state: GroupState[CellState]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[CandEvent]
          var anchor = state.getOption.map(_.anchor).getOrElse(-1L)
          events.toSeq.sortBy(_.vec_id).foreach { e =>
            if (anchor < 0L) anchor = e.vec_id
            else if (e.vec_id != anchor) out += CandEvent(e.vec_id, e.cell, anchor)
          }
          state.update(CellState(anchor))
          out.iterator
        })
  }
}
