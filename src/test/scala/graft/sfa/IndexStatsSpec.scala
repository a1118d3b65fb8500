package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders
import org.apache.spark.sql.functions._

/** Gates for the MAINTAINED per-prefix box stats — the r10 answer to
  * the r9 verdict's #2 residual (phase 0 of `knnOverLayout` aggregated
  * the whole layout's `approx` column per call):
  *
  *  - `saveIndex` publishes the [[IndexOps.boxTable]] with the file
  *    list in ONE manifest commit; `appendIndex` merge-updates it under
  *    the same commit — and the stats are BIT-IDENTICAL to a full
  *    query-time scan of the layout (what keeps the j6 oracles
  *    hash-unchanged);
  *  - the proof is at the METRICS level, not intent: resolving the
  *    stats reads O(prefixes) records; the fallback aggregate reads
  *    O(corpus) records;
  *  - compaction is row-invariant and carries the stats pointer across
  *    its manifest update unchanged.
  */
class IndexStatsSpec extends SparkSpec {

  private val W = 16
  private val L = 8
  private val Alpha = 8

  /** Total records read by Spark jobs launched inside `body`. */
  private def recordsRead(body: => Unit): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (e.taskMetrics != null)
          total.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    total.get()
  }

  test("save+append maintain stats bit-identical to a full scan; phase 0 reads O(prefixes)") {
    val n = 2000
    val walk = Loaders.randomWalk(n + W - 1, 20261010L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), W, L, Alpha,
      normMean = false, lowerBounding = true)
    val corpus = BulkLoad.windowRecords(spark, walk, 2, n / 2, W, L, model).cache()
    val path = graft.util.Warehouse.dir(spark, "stats_spec_index")
    ModelIO.saveIndex(corpus.filter(col("id") < 1000), model.usedBits, prefixLen = 2, path)
    ModelIO.appendIndex(corpus.filter(col("id") >= 1000), model.usedBits, prefixLen = 2, path)

    // merged (save ∪ append) stats == one full scan of the layout,
    // tuple-for-tuple: min/max/count are order-independent and exact
    val scanBoxes = IndexOps.boxTable(
        graft.util.Maintenance.readLayout(spark, path)
          .select(col("prefix").cast("long").as("prefix"), col("approx")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2), r.getSeq[Double](3)))
      .sortBy(_._1)
    var statsBoxes: Array[(Long, Long, Seq[Double], Seq[Double])] = Array.empty
    val statsRecords = recordsRead {
      statsBoxes = ModelIO.readBoxStats(spark, path).get.sortBy(_._1)
    }
    assert(statsBoxes.length == scanBoxes.length && statsBoxes.nonEmpty)
    statsBoxes.zip(scanBoxes).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._2 == b._2, s"prefix/count drift: $a vs $b")
      assert(a._3 == b._3 && a._4 == b._4, s"box drift at prefix ${a._1}")
    }
    assert(statsBoxes.map(_._2).sum == n.toLong)

    // the metrics-level scale gate: stats resolve in O(prefixes)
    // records; the fallback aggregate pays O(corpus)
    val fallbackRecords = recordsRead {
      IndexOps.boxTable(
        graft.util.Maintenance.readLayout(spark, path)
          .select(col("prefix").cast("long").as("prefix"), col("approx")))
        .collect()
      ()
    }
    info(s"phase-0 records read: stats=$statsRecords fallback=$fallbackRecords " +
      s"(prefixes=${statsBoxes.length}, corpus=$n)")
    assert(statsRecords == statsBoxes.length.toLong,
      s"stats path read $statsRecords records, expected exactly ${statsBoxes.length} (one per prefix)")
    assert(fallbackRecords >= n.toLong,
      s"fallback must scan the corpus ($fallbackRecords < $n?) — gate fixture broken")

    // compaction (row-invariant) carries the stats pointer through its
    // manifest update: same boxes before and after, and the layout's
    // manifest still resolves every file
    val extra = corpus.filter(col("id") < 200)
    (1 to 3).foreach(i => ModelIO.appendIndex(
      extra.withColumn("id", col("id") + lit(i * 10000L)), model.usedBits, 2, path))
    val preCompact = ModelIO.readBoxStats(spark, path).get.sortBy(_._1).toSeq
    assert(ModelIO.compactIndex(path, maxFilesPerPrefix = 2)(spark).nonEmpty)
    val postCompact = ModelIO.readBoxStats(spark, path).get.sortBy(_._1).toSeq
    assert(postCompact == preCompact, "compaction must not move row-derived stats")
    assert(graft.util.Maintenance.readLayout(spark, path).count() == n.toLong + 600L)
    corpus.unpersist()
  }
}
