package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden accuracy gate for BOSS VS, replicating the reference's
  * BossVSClassifierTest (CBF expected train 1.0 / test 0.998,
  * DELTA 0.05; /root/reference/src/test/java/sfa/classification/
  * BossVSClassifierTest.java:11-17).
  */
class BossVSGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"
  private val delta = 0.05

  test("BOSS VS reaches golden accuracy on CBF") {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/CBF/CBF_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST").toSeq.toDF()

    val clf = new BossVSEnsemble()
    val (model, testAcc) = clf.eval(train, test)
    info(s"CBF models=${model.models.length} test=$testAcc")
    assert(model.models.nonEmpty)
    assert(math.abs(testAcc - 0.998) <= delta, s"test accuracy $testAcc vs golden 0.998")
  }
}
