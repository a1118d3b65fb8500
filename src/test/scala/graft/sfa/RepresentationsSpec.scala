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

  test("APCA distance to the raw query lower-bounds the Euclidean distance") {
    // the study's form (APCA.java:243-273): APCA segments of one series
    // vs the raw points of the other; 256 = power of two as in the study
    val ws = walks(12, 256)
    for (l <- Seq(8, 16, 32); i <- ws.indices; j <- ws.indices if i < j) {
      val d = ed2(ws(i), ws(j))
      val lb = Representations.apcaDistanceToSeries(
        Representations.apca(ws(i), l), ws(j), Double.MaxValue)
      assert(lb <= d + 1e-4, s"APCA l=$l ($i,$j): $lb > $d")
    }
  }

  test("tightness-of-lower-bounds study: mean TLB per representation, zero violations") {
    // TightnessOfLowerBounds.java:15-135 at reduced count: 100 pairs of
    // 256-point z-normed walks; TLB = lb/ed (1 when ed ~ 0), violation =
    // lb - ed > 1e-4; tightness must grow with l for every representation
    val n = 256
    val count = 100
    val s1 = (0 until count).map(i => Loaders.znorm(Loaders.randomWalk(n, 5000 + i))).toArray
    val s2 = (0 until count).map(i => Loaders.znorm(Loaders.randomWalk(n, 6000 + i))).toArray
    val trueD = Array.tabulate(count)(q => ed2(s1(q), s2(q)))
    val ls = Seq(8, 32, 128)
    val results = for (l <- ls) yield {
      val reps = Seq[(String, Int => Double)](
        ("paa", q => Representations.paaDistance(
          Representations.paa(s1(q), l), Representations.paa(s2(q), l), n, Double.MaxValue)),
        ("pla", q => Representations.plaDistance(
          Representations.pla(s1(q), l), Representations.pla(s2(q), l), n, Double.MaxValue)),
        ("dwt", q => Representations.dwtDistance(
          Representations.dwt(s1(q), l), Representations.dwt(s2(q), l), n, Double.MaxValue)),
        ("apca", q => Representations.apcaDistanceToSeries(
          Representations.apca(s1(q), l), s2(q), Double.MaxValue)))
      reps.map { case (name, dist) =>
        var tlb = 0.0
        var violations = 0
        (0 until count).foreach { q =>
          val d = dist(q)
          if (d - trueD(q) > 1e-4) violations += 1
          tlb += (if (trueD(q) > 1e-4) d / trueD(q) else 1.0)
        }
        (name, l, tlb / count, violations)
      }
    }
    results.flatten.foreach { case (name, l, tlb, violations) =>
      info(f"$name%-5s l=$l%3d TLB=$tlb%.3f violations=$violations")
      assert(violations == 0, s"$name l=$l has $violations LB violations")
      assert(tlb >= 0.0 && tlb <= 1.0 + 1e-9)
    }
    // monotone tightness in l per representation
    for (name <- Seq("paa", "pla", "dwt", "apca")) {
      val byL = results.flatten.filter(_._1 == name).sortBy(_._2).map(_._3)
      byL.zip(byL.tail).foreach { case (lo, hi) =>
        assert(hi >= lo - 1e-9, s"$name tightness not monotone in l: $byL")
      }
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
