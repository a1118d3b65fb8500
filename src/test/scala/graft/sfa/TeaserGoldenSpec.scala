package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** TEASER gates.
  *
  * The full golden replicates TEASERClassifierTest exactly: S = 10
  * (the test sets `TEASERClassifier.S = 10`), full CBF train/test
  * split, goldens accuracy 0.982 / earliness 0.64 with the reference's
  * own DELTA = 0.05 (AbstractClassifierTest.java:25,110-125). Measured
  * full-run result (2026-08-14, liblinear-parity OvR slaves — see
  * [[LinModel]]): accuracy 0.9844 ✓, earliness 0.685 ✓ — BOTH inside
  * the reference's own ±0.05 band. (History: multinomial-softmax
  * slaves measured earliness 0.5836 — the sharper probability geometry
  * made the one-class master accept early; round 3's quantile master
  * was at 0.77. The OvR weights closed deviation D2, BASELINE.md.)
  * It trains 9 WEASEL slaves + one-class SVM masters and runs ~15 min
  * on local[*] — it is tagged `graft.Slow` and excluded from the
  * default `sbt test` (run explicitly via
  * `sbt 'set Test/testOptions := Seq(Tests.Argument(TestFrameworks.ScalaTest, "-n", "graft.Slow"))'
  * "testOnly graft.sfa.TeaserGoldenSpec"`).
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
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST").toSeq.toDF()

    val clf = new TeaserClassifier(Teaser.Config(s = 10))
    val (model, acc, earliness) = clf.eval(train, test)
    info(s"CBF threshold=${model.threshold} slaves=${model.slaves.size} " +
      f"acc=$acc%.4f earliness=$earliness%.3f")
    assert(math.abs(acc - 0.982) <= 0.05, s"accuracy $acc vs golden 0.982")
    assert(math.abs(earliness - 0.64) <= 0.05, s"earliness $earliness vs golden 0.64")
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
