package graft.sfa

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.Loaders

/** Invariants for the PAA/PLA/DWT/APCA representations — the
  * tightness-of-lower-bounds study of the reference
  * (src/test/java/sfa/transformation/TightnessOfLowerBounds.java) turned
  * into assertions: each representation's distance must lower-bound the
  * true Euclidean distance, and the wavelet transform must round-trip.
  */
class RepresentationsSpec extends AnyFunSuite {

  private def walks(n: Int, len: Int) =
    (0 until n).map(i => Loaders.znorm(Loaders.randomWalk(len, 3000 + i))).toArray

  private def ed2(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("Haar lifting transform round-trips") {
    val data = Loaders.randomWalk(64, 9L)
    val vec = data.clone()
    Representations.haarForward(vec)
    Representations.haarInverse(vec)
    vec.zip(data).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("PAA distance lower-bounds the Euclidean distance") {
    val ws = walks(12, 128)
    for (l <- Seq(4, 8, 16); i <- ws.indices; j <- ws.indices if i < j) {
      val d = ed2(ws(i), ws(j))
      val lb = Representations.paaDistance(
        Representations.paa(ws(i), l), Representations.paa(ws(j), l), 128, Double.MaxValue)
      assert(lb <= d + 1e-9, s"PAA l=$l ($i,$j): $lb > $d")
    }
  }

  test("DWT distance lower-bounds the Euclidean distance") {
    val ws = walks(12, 128)
    for (l <- Seq(4, 8, 16, 32); i <- ws.indices; j <- ws.indices if i < j) {
      val d = ed2(ws(i), ws(j))
      val lb = Representations.dwtDistance(
        Representations.dwt(ws(i), l), Representations.dwt(ws(j), l), 128, Double.MaxValue)
      assert(lb <= d + 1e-9, s"DWT l=$l ($i,$j): $lb > $d")
    }
  }

  test("PLA distance lower-bounds the Euclidean distance") {
    val ws = walks(12, 128)
    for (l <- Seq(4, 8, 16); i <- ws.indices; j <- ws.indices if i < j) {
      val d = ed2(ws(i), ws(j))
      val lb = Representations.plaDistance(
        Representations.pla(ws(i), l), Representations.pla(ws(j), l), 128, Double.MaxValue)
      assert(lb <= d + 1e-6, s"PLA l=$l ($i,$j): $lb > $d")
    }
  }

  test("PAA of a constant series reconstructs exactly") {
    val c = Array.fill(64)(2.5)
    val rec = Representations.paaInverse(Representations.paa(c, 8), 64)
    rec.foreach(v => assert(math.abs(v - 2.5) < 1e-12))
  }

  test("APCA yields covering segments with exact interval means") {
    val data = Loaders.znorm(Loaders.randomWalk(64, 77L))
    val n = 8
    val apca = Representations.apca(data, n)
    assert(apca.length == n)
    // end indices strictly increasing, last covers the (padded) series
    val ends = (1 until n by 2).map(apca(_).toInt)
    assert(ends.zip(ends.tail).forall { case (a, b) => a <= b })
    assert(ends.last >= data.length)
    // segment values are the means of the original data over the interval
    var start = 0
    for (k <- 0 until n by 2 if apca(k + 1).toInt > start && start < data.length) {
      val end = math.min(apca(k + 1).toInt, data.length)
      val mean = data.slice(start, end).sum / (end - start)
      assert(math.abs(apca(k) - mean) < 1e-9, s"segment at $start..$end")
      start = end
    }
    // distance to itself is zero; to another series non-negative
    val other = Representations.apca(Loaders.znorm(Loaders.randomWalk(64, 78L)), n)
    assert(Representations.apcaDistance(apca, apca, 64, Double.MaxValue) == 0.0)
    assert(Representations.apcaDistance(apca, other, 64, Double.MaxValue) >= 0.0)
  }
}
