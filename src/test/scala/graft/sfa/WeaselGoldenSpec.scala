package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden accuracy gate for WEASEL, replicating the reference's
  * WEASELClassifierTest (CBF expected train 0.967 / test 0.998,
  * DELTA 0.05; /root/reference/src/test/java/sfa/classification/
  * WEASELClassifierTest.java:11-17).
  */
class WeaselGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"
  private val delta = 0.05

  test("WEASEL reaches golden accuracy on CBF") {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/CBF/CBF_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST").toSeq.toDF()

    val clf = new WeaselClassifier()
    val (model, testAcc) = clf.eval(train, test)
    info(s"CBF norm=${model.norm} f=${model.features} cvCorrect=${model.trainCorrect} " +
      s"dict=${model.dictSize} test=$testAcc")
    assert(math.abs(testAcc - 0.998) <= delta, s"test accuracy $testAcc vs golden 0.998")
  }
}
