package graft.sfa

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.Loaders

/** SFA quantizer invariants, mirroring the reference's SFAWordsTest /
  * SFAWordsWindowingTest (bins monotonically increasing, symbols within
  * the alphabet) plus the equi-depth dedup subtlety (SFA.java:444-445).
  */
class SFASpec extends AnyFunSuite {

  private def trainSeries(n: Int): Array[(Array[Double], Double)] =
    Array.tabulate(n)(i => (Loaders.znorm(Loaders.randomWalk(256, 100 + i)), (i % 3).toDouble))

  test("equi-depth edges: plain case") {
    val sorted = Array(1.0, 1, 1, 1, 2, 2, 3, 3)
    val edges = SFA.equiDepthEdges(sorted, 4)
    assert(edges.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("equi-depth edges: adjacent-duplicate boundaries are deduplicated") {
    val sorted = Array(1.0, 1, 1, 1, 1, 1, 2, 2)
    val edges = SFA.equiDepthEdges(sorted, 4)
    assert(edges(0) == 1.0 && edges(1) == 2.0 && edges(2) == Double.MaxValue)
  }

  test("fitted bins are monotonically increasing per coefficient") {
    for (hist <- Seq(HistogramType.EquiDepth, HistogramType.EquiWidth, HistogramType.InformationGain)) {
      val wins = trainSeries(20).flatMap { case (d, lab) =>
        SFA.disjointWindows(d, 32, normMean = true).map((_, lab))
      }
      val (model, _) = SFA.fitWindows(wins, 32, 8, 8, normMean = true,
        lowerBounding = true, hist)
      model.bins.zipWithIndex.foreach { case (row, i) =>
        val assigned = row.filter(_ != Double.MaxValue)
        assigned.zip(assigned.tail).foreach { case (a, b) =>
          // equi-depth dedup guarantees strict increase; info-gain may
          // legally repeat an edge value (the symbol is then skipped),
          // exactly as the reference's recursive splitter does.
          if (hist == HistogramType.InformationGain)
            assert(a <= b, s"$hist coef $i edges decreasing: ${row.toSeq}")
          else
            assert(a < b, s"$hist coef $i edges not strictly increasing: ${row.toSeq}")
        }
      }
    }
  }

  test("quantized symbols stay within the alphabet; words are valid") {
    val series = trainSeries(10)
    for (alpha <- Seq(2, 4, 8); l <- Seq(4, 8, 16)) {
      val model = SFA.fitWindowing(series, 64, l, alpha, normMean = false, lowerBounding = true)
      series.foreach { case (d, _) =>
        val syms = model.transformWindowingSymbols(d)
        assert(syms.nonEmpty)
        syms.foreach { word =>
          assert(word.length == l)
          assert(word.forall(s => s >= 0 && s < alpha), s"alpha=$alpha l=$l: ${word.toSeq}")
        }
        val packed = model.transformWindowingWords(d, l)
        assert(packed.length == syms.length)
      }
    }
  }

  test("quantize is the edge-count rank: symbol == #edges <= value") {
    val series = trainSeries(8)
    val model = SFA.fitWindowing(series, 32, 8, 4, normMean = true, lowerBounding = true)
    val approx = Fourier.transformWindowing(series(0)._1, 32, 8, normMean = true, lowerBounding = true)
    approx.foreach { a =>
      val word = model.quantize(a)
      a.indices.foreach { i =>
        val expected = model.bins(i).count(e => e != Double.MaxValue && a(i) >= e)
        assert(word(i) == expected)
      }
    }
  }

  test("equi-depth histogram balances symbol frequencies on the fit windows") {
    val wins = trainSeries(30).flatMap { case (d, lab) =>
      SFA.disjointWindows(d, 32, normMean = true).map((_, lab))
    }
    val (model, approx) = SFA.fitWindows(wins, 32, 4, 4, normMean = true,
      lowerBounding = true, HistogramType.EquiDepth)
    // each coefficient's symbol distribution should be roughly uniform
    val n = approx.length
    for (coef <- 0 until 4) {
      val counts = approx.map(a => model.quantize(a)(coef))
        .groupBy(identity).view.mapValues(_.length)
      counts.values.foreach { c =>
        assert(c <= n * 0.55, s"coef $coef skewed: $counts")
      }
    }
  }

  test("supervised info-gain binning is reproducible across runs") {
    val wins = trainSeries(20).flatMap { case (d, lab) =>
      SFA.disjointWindows(d, 32, normMean = true).map((_, lab))
    }
    val runs = (1 to 3).map { _ =>
      SFA.fitWindows(wins, 32, 8, 8, normMean = true, lowerBounding = true,
        HistogramType.InformationGain)._1.bins.map(_.toSeq).toSeq
    }
    assert(runs.forall(_ == runs.head))
  }
}
