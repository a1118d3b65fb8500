package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden end-to-end accuracy gate for the BOSS ensemble, replicating
  * the reference's BossEnsembleClassifierTest (CBF expected train 1.0 /
  * test 0.999, DELTA 0.05;
  * /root/reference/src/test/java/sfa/classification/
  * BossEnsembleClassifierTest.java:12-18, AbstractClassifierTest.java:25).
  */
class BossGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"
  private val delta = 0.05

  test("BOSS ensemble reaches golden accuracy on CBF") {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/CBF/CBF_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST").toSeq.toDF()

    val clf = new BossEnsemble()
    val model = clf.fit(train)
    assert(model.models.nonEmpty, "empty ensemble")

    val trainAcc = Boss.accuracy(clf.predict(model, train), 30L)
    val testAcc = Boss.accuracy(clf.predict(model, test), 900L)
    info(s"CBF train=$trainAcc test=$testAcc (${model.models.length} models)")
    assert(math.abs(trainAcc - 1.0) <= delta, s"train accuracy $trainAcc vs golden 1.0")
    assert(math.abs(testAcc - 0.999) <= delta, s"test accuracy $testAcc vs golden 0.999")
  }
}
