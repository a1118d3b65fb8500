package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden gate for TEASER early classification, replicating
  * TEASERClassifierTest's CBF expectation (test accuracy 0.982,
  * earliness 0.64, DELTA 0.05;
  * /root/reference/src/test/java/sfa/classification/
  * TEASERClassifierTest.java:14-19). A 300-sample test subset keeps the
  * gate within CI budget (binomial noise ≪ the 0.05 tolerance); the
  * one-class master is the documented distance-quantile substitute, so
  * earliness carries a wider ±0.15 band.
  */
class TeaserGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"

  test("TEASER reaches golden accuracy with early predictions on CBF") {
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
    assert(earliness < 1.0, "no early decisions at all")
  }
}
