package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders
import org.apache.spark.sql.functions._

/** Index exactness suite, mirroring the reference's SFATrieTest: the SFA
  * lower-bound filter-and-refine k-NN must return exactly the
  * brute-force scan's neighbors (reference asserts distance equality
  * within 0.003; ours shares the distance kernel so we assert exact id
  * equality and 1e-9 distance agreement).
  */
class IndexSpec extends SparkSpec {

  test("LB filter-and-refine k-NN equals the brute-force scan on random walks") {
    import spark.implicits._
    val n = 120
    val len = 64
    val l = 8
    val alpha = 8
    val walks = (0 until n).map(i => (i.toLong, Loaders.znorm(Loaders.randomWalk(len, 1000 + i))))

    val approx = walks.map { case (id, d) =>
      (id, d, Fourier.transformWindow(d, 0, len, l, normMean = false, lowerBounding = true))
    }
    // equi-width bins on the corpus orderline (trie histogram type)
    val corpusApprox = approx.filter(_._1 % 2 == 0)
    val bins = Array.tabulate(l) { c =>
      val vals = corpusApprox.map(a => SFA.roundAt(a._3(c), 2)).sorted.toArray
      SFA.equiWidthEdges(vals, alpha)
    }
    def quant(a: Array[Double]): Array[Int] = a.indices.map { i =>
      val edges = bins(i)
      var c = 0
      while (c < edges.length && a(i) >= edges(c)) c += 1
      c
    }.toArray

    val corpus = corpusApprox.map { case (id, d, a) => (id, d, quant(a), a) }
      .toDF("id", "data", "word", "approx")
    val queries = approx.filter(_._1 % 2 == 1).take(15)
      .map { case (id, d, a) => (id, d, quant(a), a) }
      .toDF("qid", "qdata", "qword", "qapprox")

    val scan = IndexOps.knnScan(corpus, queries, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val idx = IndexOps.knn(corpus, queries, bins, normed = false, k = 3, probe = 6)(spark)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    assert(scan.nonEmpty && scan.size == idx.size)
    scan.foreach { case (key, (id, d2)) =>
      val (iId, iD2) = idx(key)
      assert(iId == id, s"$key: index id $iId != scan id $id")
      assert(math.abs(iD2 - d2) < 1e-9)
    }

    // query-side batching (forced: 4 queries per probe-plan slice) must
    // reproduce the single-batch results exactly
    val (batchedDf, batchedStats) = IndexOps.knnWithStats(
      corpus, queries, bins, normed = false, k = 3, probe = 6,
      queryBatchRows = 4)(spark)
    val batched = batchedDf.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(batched == idx)
    assert(batchedStats.queryRows == 15L)
  }

  test("adaptive prefix depth follows the integer-exact bulk-load rule") {
    // round(log_8(N/100)) with exact integer comparisons
    assert(IndexOps.adaptiveDepth(100, 8, 6) === 1)
    assert(IndexOps.adaptiveDepth(750, 8, 6) === 1) // log_8(7.5) ≈ 0.97 → 1
    assert(IndexOps.adaptiveDepth(2262, 8, 6) === 1) // 8^1.5·100 ≈ 2262.7: boundary below
    assert(IndexOps.adaptiveDepth(2263, 8, 6) === 2) // first N that rounds to 2
    assert(IndexOps.adaptiveDepth(200000, 8, 6) === 4) // log_8(2000) ≈ 3.65 → 4
    assert(IndexOps.adaptiveDepth(2000000, 8, 8) === 5) // log_8(20000) ≈ 4.76 → 5
    assert(IndexOps.adaptiveDepth(2000000, 8, 3) === 3) // clamped to max depth
  }

  /** KnnStats reconciliation: the telemetry the `j6_scan_fraction`
    * query emits must equal an independent driver-side recompute of the
    * same box-prune plan (boxes → probe sets → τ from exact distances →
    * survivor member counts).
    */
  test("knnWithStats telemetry equals an independent recompute") {
    import spark.implicits._
    val n = 120
    val len = 64
    val l = 8
    val alpha = 8
    val prefixLen = 2
    val probe = 6
    val k = 3
    val walks = (0 until n).map(i => (i.toLong, Loaders.znorm(Loaders.randomWalk(len, 1000 + i))))
    val approx = walks.map { case (id, d) =>
      (id, d, Fourier.transformWindow(d, 0, len, l, normMean = false, lowerBounding = true))
    }
    val corpusApprox = approx.filter(_._1 % 2 == 0)
    val bins = Array.tabulate(l) { c =>
      SFA.equiWidthEdges(corpusApprox.map(a => SFA.roundAt(a._3(c), 2)).sorted.toArray, alpha)
    }
    def quant(a: Array[Double]): Array[Int] = a.indices.map { i =>
      val edges = bins(i)
      var c = 0
      while (c < edges.length && a(i) >= edges(c)) c += 1
      c
    }.toArray
    val corpusRows = corpusApprox.map { case (id, d, a) => (id, d, quant(a), a) }
    val queryRows = approx.filter(_._1 % 2 == 1).take(15)
      .map { case (id, d, a) => (id, d, quant(a), a) }
    val corpus = corpusRows.toDF("id", "data", "word", "approx")
    val queries = queryRows.toDF("qid", "qdata", "qword", "qapprox")

    val (_, stats) = IndexOps.knnWithStats(
      corpus, queries, bins, normed = false, k = k, probe = probe,
      prefixStart = 0, prefixLen = prefixLen)(spark)

    // independent recompute, straight loops
    def prefixOf(w: Array[Int]): Long = w.take(prefixLen).foldLeft(0L)(_ * 256 + _)
    val byPrefix = corpusRows.groupBy(r => prefixOf(r._3))
    val boxes = byPrefix.map { case (p, ms) =>
      val mns = Array.tabulate(l)(c => ms.map(_._4(c)).min)
      val mxs = Array.tabulate(l)(c => ms.map(_._4(c)).max)
      (p, ms.size.toLong, mns, mxs)
    }.toSeq
    def boxLb(mns: Array[Double], mxs: Array[Double], qa: Array[Double]): Double = {
      def dist(i: Int): Double =
        if (qa(i) < mns(i)) mns(i) - qa(i) else if (qa(i) > mxs(i)) qa(i) - mxs(i) else 0.0
      var d = dist(0) * dist(0) // normed = false: DC pair at weight 1, slot 1 skipped
      var i = 2
      while (i < l) { val v = dist(i); d += 2.0 * v * v; i += 1 }
      d
    }
    def ed2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // decision-grade rounding, same as the engine (IndexOps.knnCore r7):
    // ranking and the boxLB-vs-τ test compare 6-dp-rounded values
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    var probeVerified = 0L
    var lbScanned = 0L
    queryRows.foreach { case (_, qd, _, qa) =>
      val ranked = boxes.map { case (p, cnt, mns, mxs) => (p, cnt, boxLb(mns, mxs, qa)) }
        .sortBy { case (p, _, lb) => (r6(lb), p) }
      var cum = 0L
      val probed = ranked.takeWhile { case (_, cnt, _) =>
        val before = cum; cum += cnt; before < probe
      }
      probeVerified += probed.map(_._2).sum
      val probedSet = probed.map(_._1).toSet
      val probedDists = corpusRows.filter(r => probedSet(prefixOf(r._3)))
        .map(r => ed2(r._2, qd)).sorted
      if (probedDists.length >= k) {
        val tau = probedDists(k - 1)
        lbScanned += ranked.collect {
          case (p, cnt, lb) if !probedSet(p) && r6(lb) <= r6(tau) => cnt
        }.sum
      }
    }
    assert(stats.corpusRows === corpusRows.size.toLong)
    assert(stats.queryRows === queryRows.size.toLong)
    assert(stats.probeVerified === probeVerified)
    assert(stats.lbScanned === lbScanned)
  }

  test("SFA LB distance lower-bounds the true Euclidean distance") {
    val l = 8
    val alpha = 8
    val walks = (0 until 40).map(i => Loaders.znorm(Loaders.randomWalk(64, 2000 + i)))
    val approx = walks.map(d => Fourier.transformWindow(d, 0, 64, l, normMean = false, lowerBounding = true))
    val bins = Array.tabulate(l) { c =>
      SFA.equiWidthEdges(approx.map(a => SFA.roundAt(a(c), 2)).sorted.toArray, alpha)
    }
    def quant(a: Array[Double]): Array[Int] = a.indices.map { i =>
      val edges = bins(i)
      var c = 0
      while (c < edges.length && a(i) >= edges(c)) c += 1
      c
    }.toArray
    for (i <- walks.indices; j <- walks.indices if i != j) {
      val ed2 = walks(i).zip(walks(j)).map { case (a, b) => (a - b) * (a - b) }.sum
      val lb = IndexOps.lbDistance(quant(approx(i)), quant(approx(j)), approx(j), bins, normed = false)
      assert(lb <= ed2 + 1e-9, s"pair ($i,$j): lb=$lb > ed2=$ed2")
    }
  }
}
