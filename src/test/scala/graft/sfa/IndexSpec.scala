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
