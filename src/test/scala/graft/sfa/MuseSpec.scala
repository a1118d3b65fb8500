package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders
import org.apache.spark.sql.functions._

/** MUSE sanity gate on the bundled PenDigits fixture (the reference ships
  * no asserted multivariate golden — its MTS tests are print-only
  * drivers — so this asserts a sane accuracy floor on a fixed test
  * subset, with derivative channels like the reference driver uses).
  */
class MuseSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/multivariate"

  test("MUSE classifies PenDigits (2 dims + derivatives) well above chance") {
    val train0 = Loaders.loadMultivariate(spark, s"$base/PenDigits/PenDigits_TRAIN3",
      applyZNorm = false)
    val test0 = Loaders.loadMultivariate(spark, s"$base/PenDigits/PenDigits_TEST3",
      applyZNorm = false)
    val train = Loaders.withDerivatives(train0, 2)
    val test = Loaders.withDerivatives(test0, 2).filter(col("id") <= 1000)

    val clf = new MuseClassifier()
    val (model, acc) = clf.eval(train, test)
    info(s"PenDigits hist=${model.hist} norm=${model.norm} f=${model.features} " +
      s"cv=${model.trainCorrect}/300 dict=${model.dictSize} acc=$acc")
    // 10 classes; chance = 0.1. MUSE on PenDigits scores ≈ 0.9+ in the
    // reference's published results; assert a conservative floor.
    assert(acc >= 0.8, s"accuracy $acc below MUSE floor 0.8")
  }
}
