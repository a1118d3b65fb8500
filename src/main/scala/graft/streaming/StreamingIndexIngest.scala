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
  * the last committed batch id in its own sidecar (write-then-rename,
  * the shared [[graft.util.Maintenance]] pattern) and SKIPS ids at or
  * below it — the standard idempotent-sink recipe, closing the
  * restart/replay path. Residual (documented, not hidden): a crash
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
    graft.util.Maintenance.readSidecar(s, path, CommitFile)
      .flatMap(_.get("batchId")).flatMap(_.toLongOption).getOrElse(-1L)

  /** Append one micro-batch (idempotent on replay): ids at or below the
    * committed watermark are skipped. Returns whether the batch was
    * appended. Exposed for the spec's replay-guard gate.
    */
  def appendBatch(batch: DataFrame, batchId: Long,
      usedBits: Int, prefixLen: Int, path: String): Boolean = {
    val s = batch.sparkSession
    if (batchId <= lastCommitted(s, path)) false
    else {
      graft.sfa.ModelIO.appendIndex(batch, usedBits, prefixLen, path)
      graft.util.Maintenance.writeSidecar(s, path, CommitFile,
        Seq("batchId" -> batchId.toString))
      true
    }
  }

  /** Attach the ingest to a window-record stream. The layout at `path`
    * should exist (written by `ModelIO.saveIndex`, which makes it
    * self-describing); a first append onto a fresh path annotates it
    * with the asserted packing instead.
    */
  def ingest(records: Dataset[WindowRecord], usedBits: Int, prefixLen: Int,
      path: String, checkpoint: String): StreamingQuery = {
    val sink: (Dataset[WindowRecord], Long) => Unit = (batch, id) => {
      appendBatch(batch.toDF(), id, usedBits, prefixLen, path)
      ()
    }
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(sink)
      .start()
  }
}
