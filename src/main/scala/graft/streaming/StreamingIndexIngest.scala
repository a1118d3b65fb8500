package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous index ingestion — the streaming twin of the maintenance
  * lifecycle (the reference motivates exactly this surface: "frequent
  * model updates / streaming mining", README.md:239-241, over the
  * trie's single-process insert, SFATrie.java:299-380): window records
  * arriving on a stream are bulk-INSERTed into the persisted
  * prefix-partitioned k-NN layout once per micro-batch via
  * `ModelIO.appendIndexBatch` — partition-wise files, packing fail-fast
  * against the layout's sidecar, serialized by the single-maintainer
  * lock. A micro-batch racing a compaction FAILS FAST at the lock; the
  * exception terminates the streaming query, and a restart from the
  * checkpoint replays the batch (at-least-once delivery — foreachBatch
  * does not retry in place). Queries need no refresh step: the append's
  * manifest commit publishes rows and merged box stats atomically, so
  * every record whose batch committed is immediately searchable.
  *
  * Delivery semantics: EXACTLY-ONCE. The publish point of an append is
  * the layout manifest's single atomic rename, which carries (in one
  * commit with the file list) a per-lineage watermark header
  * `ingest.<streamId> = batchId`. A replayed batch at or below its own
  * lineage's watermark is a no-op; a crash BEFORE the rename leaves
  * only orphan files no later manifest adopts (appends publish
  * `old ∪ created` from an under-lock before/after listing); a crash
  * AFTER it is fully committed. The r9 design's residual — append and
  * marker as two commits, able to duplicate one batch — is closed, not
  * narrowed: there is no state between "not published" and "published
  * with the watermark". Watermarks are keyed by the checkpoint's own
  * lineage id, so a recreated checkpoint's renumbered batches are NEW
  * data (never muted), and several streams feeding one layout keep
  * independent watermarks (they serialize at the maintenance lock and
  * cannot mute each other). Residual (documented): one watermark header
  * per lineage lives in the manifest for the layout's lifetime — a few
  * bytes each; a layout fed by unboundedly many distinct checkpoints
  * over years should prune dead lineages' keys during scheduled
  * maintenance (dropping a key only re-opens replay for that one
  * retired checkpoint).
  */
object StreamingIndexIngest {

  /** One index record, the same shape `BulkLoad.windowRecords` emits. */
  final case class WindowRecord(
      id: Long, data: Seq[Double], word: Seq[Int], approx: Seq[Double])

  /** Batch id of the most recent committed micro-batch of ANY lineage
    * (−1 = none) — observability; the replay guard reads the
    * per-lineage watermark headers, not this.
    */
  def lastCommitted(s: SparkSession, path: String): Long =
    graft.util.Maintenance.readManifest(s, path)
      .flatMap(_.header(graft.sfa.ModelIO.LastIngestHeader))
      .flatMap(_.split(":", 2).lastOption)
      .flatMap(_.toLongOption)
      .getOrElse(-1L)

  /** This lineage's committed watermark (−1 = none). */
  def lastCommitted(s: SparkSession, path: String, streamId: String): Long =
    graft.util.Maintenance.readManifest(s, path)
      .flatMap(_.header(graft.sfa.ModelIO.ingestHeader(streamId)))
      .flatMap(_.toLongOption)
      .getOrElse(-1L)

  /** Append one micro-batch exactly-once: skipped ONLY when the
    * manifest's watermark FOR THIS stream lineage (`streamId`) is at or
    * above `batchId`. Micro-batch ids are CHECKPOINT-scoped — a
    * recreated checkpoint renumbers from 0, so a layout-scoped bare
    * batch-id guard would silently drop whole batches of brand-new
    * data; keying the watermark by the stream's identity confines the
    * skip to genuine replays of one lineage. Returns whether the batch
    * was appended. Exposed for the spec's replay-guard gates.
    */
  def appendBatch(batch: DataFrame, streamId: String, batchId: Long,
      usedBits: Int, prefixLen: Int, path: String): Boolean =
    graft.sfa.ModelIO.appendIndexBatch(batch, usedBits, prefixLen, path,
      ingestKey = Some((streamId, batchId)))

  /** The query id Structured Streaming persisted in `checkpoint`'s own
    * `metadata` file — minted when the checkpoint is created and stable
    * across restarts of it, i.e. exactly the lineage whose batch ids
    * are comparable. Exposed for the spec.
    */
  def checkpointStreamId(s: SparkSession, checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    val text = try Iterator.continually(in.readLine()).takeWhile(_ != null).mkString
    finally in.close()
    "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(text) match {
      case Some(m) => m.group(1)
      case None => throw new IllegalStateException(
        s"no query id in checkpoint metadata $p — cannot scope the commit watermark")
    }
  }

  /** Attach the ingest to a window-record stream. The layout at `path`
    * should exist (written by `ModelIO.saveIndex`, which makes it
    * self-describing); a first append onto a fresh path annotates it
    * with the asserted packing instead.
    */
  def ingest(records: Dataset[WindowRecord], usedBits: Int, prefixLen: Int,
      path: String, checkpoint: String): StreamingQuery = {
    val s = records.sparkSession
    // resolved on the FIRST batch (the engine writes the checkpoint
    // metadata at query start, before any batch fires)
    lazy val streamId = checkpointStreamId(s, checkpoint)
    val sink: (Dataset[WindowRecord], Long) => Unit = (batch, id) => {
      appendBatch(batch.toDF(), streamId, id, usedBits, prefixLen, path)
      ()
    }
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(sink)
      .start()
  }
}
