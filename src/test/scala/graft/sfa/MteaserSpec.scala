package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders
import org.apache.spark.sql.functions._

/** MTEASER gate on the bundled PenDigits fixture
  * (MTEASERClassifierTest.java drives the same data with S=10 and
  * derivatives; the reference ships no asserted multivariate golden —
  * its MTS tests are print-only — so, like MuseSpec, this asserts an
  * accuracy floor plus genuinely-early decisions, and the cascade
  * invariants the reference guarantees by construction.)
  */
class MteaserSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/multivariate"

  test("MTEASER early-classifies PenDigits well above chance with early decisions") {
    val train0 = Loaders.loadMultivariate(spark, s"$base/PenDigits/PenDigits_TRAIN3",
      applyZNorm = false)
    val test0 = Loaders.loadMultivariate(spark, s"$base/PenDigits/PenDigits_TEST3",
      applyZNorm = false)
    val train = Loaders.withDerivatives(train0, 2)
    val test = Loaders.withDerivatives(test0, 2).filter(col("id") <= 500)

    // reference test config: S=10; slave grid reduced for runtime (the
    // full MUSE grid is gated by MuseSpec — here the cascade is under test)
    val clf = new MteaserClassifier(
      Mteaser.Config(s = 10),
      Muse.Config(minF = 2, maxF = 4, folds = 2,
        histTypes = Seq(HistogramType.EquiDepth), normalization = Seq(false)))
    val (model, acc, earl) = clf.eval(train, test)
    info(f"PenDigits MTEASER acc=$acc%.4f earliness=$earl%.4f threshold=${model.threshold} " +
      s"snapshots=${model.slaves.keys.toSeq.sorted.mkString(",")}")

    // 10 classes; chance = 0.1
    assert(acc >= 0.6, s"accuracy $acc below MTEASER floor 0.6")
    assert(earl < 1.0, s"earliness $earl shows no early decisions")
    assert(earl > 0.0)
    assert(model.threshold >= 2 && model.threshold <= 5)
    assert(model.slaves.keySet == model.masters.keySet,
      "every slave snapshot must carry a master")
    // snapshots only at offsets >= max(4, MIN_WINDOW_LENGTH)
    assert(model.slaves.keys.forall(s => model.offsets(s) >= 4))
  }

  test("MTEASER predictDF decides every sample and never exceeds its length") {
    val train0 = Loaders.loadMultivariate(spark, s"$base/ShapesRandom/ShapesRandom_TRAIN3",
      applyZNorm = false)
    val test0 = Loaders.loadMultivariate(spark, s"$base/ShapesRandom/ShapesRandom_TEST3",
      applyZNorm = false)
    // ShapesRandom channels are length-varying; keep it small
    val train = train0.filter(col("id") <= 40)
    val test = test0.filter(col("id") <= 20)

    val clf = new MteaserClassifier(
      Mteaser.Config(s = 6),
      Muse.Config(minF = 2, maxF = 2, folds = 2, bigrams = false,
        histTypes = Seq(HistogramType.EquiDepth), normalization = Seq(false)))
    val model = clf.fit(train)
    val res = clf.predictDF(model, test).cache()
    val n = test.select("id").distinct().count()
    assert(res.count() == n)
    assert(res.filter(col("pred").isNull).count() == 0,
      "the final snapshot must force a decision for every sample")
    assert(res.filter(col("earliness") > 1.0 + 1e-9).count() == 0)
    res.unpersist()
  }
}
