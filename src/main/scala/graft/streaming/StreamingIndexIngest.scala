package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous index ingestion — the streaming twin of the r9
  * maintenance lifecycle (the reference motivates exactly this surface:
  * "frequent model updates / streaming mining", README.md:239-241, over
  * the trie's single-process insert, SFATrie.java:299-380): window
  * records arriving on a stream are bulk-INSERTed into the persisted
  * prefix-partitioned k-NN layout once per micro-batch via the SAME
  * `ModelIO.appendIndex` the batch path uses — partition-wise files,
  * packing fail-fast against the layout's sidecar, serialized by the
  * single-maintainer lock (a micro-batch racing a compaction FAILS
  * FAST, Structured Streaming retries the batch, no row is lost).
  * Queries need no refresh step: `IndexOps.knnOverLayout` derives its
  * per-prefix boxes from the layout at query time, so every record
  * whose batch committed is immediately searchable.
  *
  * Delivery semantics: foreachBatch is at-least-once — a batch REPLAYED
  * after a restart would double-append. The ingest therefore records
  * the last committed (streamId, batchId) pair in its own sidecar
  * (write-then-rename, the shared [[graft.util.Maintenance]] pattern)
  * and SKIPS ids at or below the watermark OF THE SAME LINEAGE — the
  * standard idempotent-sink recipe, closing the restart/replay path
  * without ever muting a NEW checkpoint's renumbered batches. Residual (documented, not hidden): a crash
  * BETWEEN the append job and the marker commit can duplicate that one
  * batch, because the parquet append is not atomic with the marker —
  * if the source cannot guarantee effectively-once feeding across such
  * a crash, dedup on `id` at read time.
  */
object StreamingIndexIngest {

  /** One index record, the same shape `BulkLoad.windowRecords` emits. */
  final case class WindowRecord(
      id: Long, data: Seq[Double], word: Seq[Int], approx: Seq[Double])

  private val CommitFile = "_graft_ingest_commit"

  /** Highest micro-batch id already appended into `path` (−1 = none). */
  def lastCommitted(s: SparkSession, path: String): Long =
    committed(s, path).map(_._2).getOrElse(-1L)

  /** (streamId, batchId) of the last committed micro-batch. */
  private def committed(s: SparkSession, path: String): Option[(String, Long)] =
    graft.util.Maintenance.readSidecar(s, path, CommitFile).flatMap { kv =>
      for {
        sid <- kv.get("streamId")
        bid <- kv.get("batchId").flatMap(_.toLongOption)
      } yield (sid, bid)
    }

  /** Append one micro-batch (idempotent on replay): skipped ONLY when
    * the watermark carries the SAME stream lineage (`streamId`) and an
    * id at or above `batchId`. Micro-batch ids are CHECKPOINT-scoped —
    * a recreated checkpoint renumbers from 0, so a layout-scoped bare
    * batch-id guard would silently drop whole batches of brand-new
    * data; keying the watermark by the stream's identity confines the
    * skip to genuine replays of one lineage. Returns whether the batch
    * was appended. Exposed for the spec's replay-guard gates.
    */
  def appendBatch(batch: DataFrame, streamId: String, batchId: Long,
      usedBits: Int, prefixLen: Int, path: String): Boolean = {
    val s = batch.sparkSession
    if (committed(s, path).exists { case (sid, bid) => sid == streamId && batchId <= bid })
      false
    else {
      graft.sfa.ModelIO.appendIndex(batch, usedBits, prefixLen, path)
      graft.util.Maintenance.writeSidecar(s, path, CommitFile,
        Seq("streamId" -> streamId, "batchId" -> batchId.toString))
      true
    }
  }

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
