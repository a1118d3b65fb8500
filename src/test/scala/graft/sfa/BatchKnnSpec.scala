package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Large-query-batch gate for the layout-backed k-NN
  * ([[IndexOps.knnOverLayout]]): the probe/τ planner collects one query
  * BATCH of (qid, qapprox) rows at a time (`queryBatchRows`), so driver
  * state per batch is bounded by the batch size regardless of how many
  * queries arrive. This spec drives a 10,000-query set through the
  * persisted layout with a batch size that forces SEVEN probe-plan
  * batches and pins:
  *   - exactness: the batched result equals the brute-force scan on
  *     every (qid, rank, id, d2) row — batching never changes answers;
  *   - batch-invariance: the 7-batch run equals the single-batch run
  *     row for row, so the slicing itself is semantics-free;
  *   - the per-batch driver collect is ≤ queryBatchRows by construction
  *     ([[graft.util.Gated.chunk]] slices by qid hash), which this spec
  *     makes observable by checking the chunk count the gate derives.
  */
class BatchKnnSpec extends SparkSpec {

  private val W = 16
  private val L = 8
  private val Alpha = 8
  private val K = 3
  private val Probe = 32
  private val NQueries = 10000
  private val BatchRows = 1500L

  test("10k-query batch over the layout: 7 probe-plan batches, exact and batch-invariant") {
    val nChunks = 2
    val chunkSize = 1000
    val walk = Loaders.randomWalk(nChunks * chunkSize + W - 1, 20260815L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), W, L, Alpha,
      normMean = false, lowerBounding = true)
    val corpus = BulkLoad.windowRecords(spark, walk, nChunks, chunkSize, W, L, model)
    val path = graft.util.Warehouse.dir(spark, "batch_knn_spec_index")
    ModelIO.saveIndex(corpus, model.usedBits, prefixLen = 2, path)

    // 10k query windows cut at stride W from an unrelated walk
    val qwalk = Loaders.randomWalk(NQueries * W + W, 424242L)
    val queries = BulkLoad.queryWindows(spark, qwalk, NQueries, W, L, model)
      .cache()
    assert(queries.count() == NQueries.toLong)
    assert(graft.util.Gated.numChunks(NQueries.toLong, BatchRows) == 7)

    def collectKnn(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Double)] =
      df.orderBy("qid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    val (batchedDf, stats) = IndexOps.knnOverLayout(
      path, queries, model.bins, model.normMean, K, Probe, prefixLen = 2,
      queryBatchRows = BatchRows)(spark)
    val batched = collectKnn(batchedDf)
    assert(stats.queryRows == NQueries.toLong)
    assert(batched.length == NQueries * K)

    // exactness against the brute scan, every row
    val want = collectKnn(IndexOps.knnScan(
      ModelIO.loadIndex(path)(spark).select("id", "data"),
      queries.select("qid", "qdata"), K))
    assert(want.length == NQueries * K)
    batched.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3,
        s"qid=${g._1} rank=${g._2}: batched id ${g._3} vs scan ${w._3}")
      assert(math.abs(g._4 - w._4) < 1e-9)
    }

    // batch-invariance: one big batch plans once and must agree row for row
    val (oneDf, oneStats) = IndexOps.knnOverLayout(
      path, queries, model.bins, model.normMean, K, Probe, prefixLen = 2)(spark)
    assert(oneStats.queryRows == NQueries.toLong)
    assert(collectKnn(oneDf).sameElements(batched))

    queries.unpersist()
  }
}
