package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Gates for the persisted k-NN index layout (the S10 at-rest form j6
  * now runs over): exactness through the parquet roundtrip (layout k-NN
  * ≡ brute scan ≡ in-memory k-NN, bit-for-bit ids and 1e-9 distances)
  * and — the scale claim — that the member/payload scans of both phases
  * carry non-empty PartitionFilters on the prefix column in the
  * EXECUTED plan, i.e. the driver's probe/survivor plan became
  * directory skips, not a full-layout read.
  */
class IndexLayoutSpec extends SparkSpec {

  test("layout-backed k-NN equals brute scan and prunes partitions at the scan") {
    import spark.implicits._
    val n = 120
    val len = 64
    val l = 8
    val alpha = 8
    val walks = (0 until n).map(i => (i.toLong, Loaders.znorm(Loaders.randomWalk(len, 2000 + i))))
    val approx = walks.map { case (id, d) =>
      (id, d, Fourier.transformWindow(d, 0, len, l, normMean = false, lowerBounding = true))
    }
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
    val queries = approx.filter(_._1 % 2 == 1).take(12)
      .map { case (id, d, a) => (id, d, quant(a), a) }
      .toDF("qid", "qdata", "qword", "qapprox")

    val plen = 2
    val path = graft.util.Warehouse.dir(spark, "test_knnidx")
    ModelIO.saveIndex(corpus, usedBits = Words.binlog(alpha), prefixLen = plen,
      path, prefixStart = 2, base = 256)

    val (layoutDf, layoutStats) = IndexOps.knnOverLayout(
      path, queries, bins, normed = false, k = 3, probe = 6, prefixLen = plen)(spark)
    val got = layoutDf.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    val scan = IndexOps.knnScan(corpus, queries, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(scan.nonEmpty && got.size == scan.size)
    scan.foreach { case (key, (id, d2)) =>
      val (gId, gD2) = got(key)
      assert(gId == id, s"$key: layout id $gId != scan id $id")
      assert(math.abs(gD2 - d2) < 1e-9)
    }

    // same plan telemetry as the in-memory path (shared knnCore)
    val (_, memStats) = IndexOps.knnWithStats(
      corpus, queries, bins, normed = false, k = 3, probe = 6,
      prefixStart = 2, prefixLen = plen)
    assert(layoutStats == memStats)

    // the scale gate: the executed plan's layout scans prune on the
    // prefix partition column — the probe/survivor lists became
    // PartitionFilters (directory skips), and at least one scan read
    // strictly fewer prefixes than the layout holds
    layoutDf.collect()
    val plan = layoutDf.queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[[^\\]]*prefix#\\d+".r.findAllIn(plan).size
    assert(pruned >= 1, s"expected pruned layout scans in:\n${plan.take(4000)}")
    assert(!plan.contains("PartitionFilters: []") || pruned >= 1)
  }
}
