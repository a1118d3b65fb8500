package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Bulk-load scale gate, mirroring the reference's chunked subsequence
  * bulk load (SFABulkLoadTest.java:170-238): one long random walk is cut
  * into chunks with w−1 overlap, each chunk runs the MFT recurrence
  * independently (the reference restarts its transform per chunk for the
  * same reason), the per-window (id, data, word, approx) records are
  * bulk-written into the prefix-partitioned index layout, and exact
  * k-NN over the LOADED index must equal the brute-force scan.
  *
  * The always-on gate indexes 200k windows; the reference's full
  * 2,000,000-window scale (20 × 100k-point chunks) is tagged
  * `graft.Slow`. Last full 2M run (round 3): bulk transform + layout
  * write + 3-query exact k-NN in 34 s total on local[32], knn ≡ scan
  * (run via `sbt 'set Test / testOptions := Seq(Tests.Argument(
  * TestFrameworks.ScalaTest, "-n", "graft.Slow"))'
  * "testOnly graft.sfa.BulkLoadSpec"` — the default -l exclusion and
  * a -n include cancel out if merely appended).
  *
  * Windows are stored 1/σ-scaled (exactly the scaling their Fourier
  * approximations carry), so Parseval holds between the stored payload
  * and the approximation and the SFA lower bound is valid for the
  * stored distance — word = quantize(approx) by construction, which is
  * all lbDistance's interval bound needs.
  */
class BulkLoadSpec extends SparkSpec {

  private val W = 32
  private val L = 8
  private val Alpha = 8
  private val K = 5
  private val Probe = 64

  private def run(nChunks: Int, chunkSize: Int): Unit = {
    val n = nChunks * chunkSize
    val walk = Loaders.randomWalk(n + W - 1, 20260812L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), W, L, Alpha,
      normMean = false, lowerBounding = true)

    // chunked bulk transform: one row per chunk, MFT per chunk on the
    // executors, one (id, data, word, approx) record per sliding window
    // (shared with Bench's layout-backed k-NN line item)
    val corpus0 = BulkLoad.windowRecords(spark, walk, nChunks, chunkSize, W, L, model)

    val path = s"/tmp/graft_bulk_index_${nChunks}x$chunkSize"
    // fixture hygiene: a CRASHED previous run may have left the
    // maintenance lock behind (the documented fail-fast contract); this
    // /tmp fixture carries no state worth recovering. Via the REAL
    // naming helper, so a lock-placement change can't silently no-op it.
    new java.io.File(graft.util.Maintenance.lockPath(path).toUri.getPath).delete()
    ModelIO.saveIndex(corpus0, model.usedBits, prefixLen = 2, path)
    val corpus = ModelIO.loadIndex(path)(spark).select("id", "data", "word", "approx")
    val total = corpus.count()
    assert(total == n.toLong, s"indexed $total windows, expected $n")

    // queries: windows of an unrelated walk, same 1/σ scaling
    val qwalk = Loaders.randomWalk(4 * W, 777L)
    val queries = BulkLoad.queryWindows(spark, qwalk, 3, W, L, model)

    val (gotDf, stats) = IndexOps.knnWithStats(
      corpus, queries, model.bins, model.normMean, K, Probe)(spark)
    val got = gotDf.orderBy("qid", "rank").collect()
    // the box prune must actually prune: the trie's subtree-skip analogue
    assert(stats.scanFraction < 0.30,
      f"box pruning LB-scanned ${stats.scanFraction * 100}%.1f%% of corpus×query (≥30%%)")
    val want = IndexOps.knnScan(
        corpus.select("id", "data"), queries.select("qid", "qdata"), K)
      .orderBy("qid", "rank").collect()
    assert(got.length == 3 * K && want.length == 3 * K)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1))
      assert(g.getLong(2) == w.getLong(2),
        s"qid=${g.getLong(0)} rank=${g.getLong(1)}: knn id ${g.getLong(2)} vs scan ${w.getLong(2)}")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9)
    }
    info(s"windows=$total prefix-partitioned index at $path: knn == scan for 3 queries")

    // the same index through the PERSISTED path (knnOverLayout): results
    // must still equal the scan, the box prune must still prune, and —
    // the scale point — the probe/survivor prefix lists must reach the
    // layout scans as PartitionFilters (directory skips), so the k-NN
    // never reads the pruned prefixes' files at all
    val (lDf, lStats) = IndexOps.knnOverLayout(
      path, queries, model.bins, model.normMean, K, Probe, prefixLen = 2)(spark)
    val lGot = lDf.orderBy("qid", "rank").collect()
    assert(lGot.length == 3 * K)
    lGot.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1)
        && g.getLong(2) == w.getLong(2))
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9)
    }
    assert(lStats.scanFraction < 0.30,
      f"layout path LB-scanned ${lStats.scanFraction * 100}%.1f%% of corpus×query (≥30%%)")
    lDf.collect()
    val plan = lDf.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/graft_bulk_plan_${nChunks}x$chunkSize.txt"), plan)
    assert("PartitionFilters: \\[[^\\]]*prefix#\\d+".r.findFirstIn(plan).isDefined,
      s"expected pruned layout scans in:\n${plan.take(4000)}")

    // ---- maintenance at scale: partition-wise bulk INSERT ---------------
    // a quarter-size second walk appended under shifted ids (the trie
    // insert analogue at this corpus size — the 2M gate appends 500k
    // windows); k-NN over the GROWN layout must stay exact, and queries
    // cut from the appended walk force appended records to win (d2 = 0),
    // so reachability cannot depend on random-walk luck. Compaction
    // cost-boundedness is pinned at fixture scale by IndexAppendSpec.
    import org.apache.spark.sql.functions.{col, lit}
    val aChunks = math.max(1, nChunks / 4)
    val awalk = Loaders.randomWalk(aChunks * chunkSize + W - 1, 31415L)
    val idShift = 10000000L
    ModelIO.appendIndex(
      BulkLoad.windowRecords(spark, awalk, aChunks, chunkSize, W, L, model)
        .withColumn("id", col("id") + lit(idShift)),
      model.usedBits, prefixLen = 2, path)
    val grown = ModelIO.loadIndex(path)(spark).select("id", "data", "word", "approx")
    val grownN = grown.count()
    assert(grownN == (n + aChunks * chunkSize).toLong,
      s"append-grown layout holds $grownN windows")
    val aq = BulkLoad.queryWindows(spark, awalk.slice(100, 100 + 4 * W), 3, W, L, model)
    val (aDf, aStats) = IndexOps.knnOverLayout(
      path, aq, model.bins, model.normMean, K, Probe, prefixLen = 2)(spark)
    val aGot = aDf.orderBy("qid", "rank").collect()
    val aWant = IndexOps.knnScan(
        grown.select("id", "data"), aq.select("qid", "qdata"), K)
      .orderBy("qid", "rank").collect()
    assert(aGot.length == 3 * K && aWant.length == 3 * K)
    aGot.zip(aWant).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1)
        && g.getLong(2) == w.getLong(2),
        s"append-grown qid=${g.getLong(0)} rank=${g.getLong(1)}: " +
          s"knn id ${g.getLong(2)} vs scan ${w.getLong(2)}")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9)
    }
    assert(aGot.exists(_.getLong(2) >= idShift),
      "no appended record ever won — the append-reachability gate is vacuous")
    assert(aStats.corpusRows == grownN)
    info(s"append-grown to $grownN windows: knn == scan, appended records reachable")
  }

  test("bulk-loaded index (200k windows): k-NN over the layout equals the scan") {
    run(nChunks = 4, chunkSize = 50000)
  }

  test("bulk-loaded index at the reference's 2M-window scale", graft.Slow) {
    run(nChunks = 20, chunkSize = 100000)
  }
}
