package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden accuracy gates for WEASEL, replicating the reference's
  * WEASELClassifierTest dataset matrix (DELTA 0.05;
  * /root/reference/src/test/java/sfa/classification/
  * WEASELClassifierTest.java:11-17).
  *
  * The golden is asserted as a FLOOR (acc ≥ golden − DELTA): the linear
  * model is MLlib LogisticRegression (LBFGS) instead of the reference's
  * liblinear L2R_LR_DUAL, which can land slightly above the golden —
  * Beef scores 0.867 vs the reference's 0.8 (the other datasets match
  * two-sided).
  */
class WeaselGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"
  private val delta = 0.05

  private def gate(dataset: String, goldenTest: Double): Unit = {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/$dataset/${dataset}_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/$dataset/${dataset}_TEST").toSeq.toDF()

    val clf = new WeaselClassifier()
    val (model, testAcc) = clf.eval(train, test)
    info(s"$dataset norm=${model.norm} f=${model.features} cvCorrect=${model.trainCorrect} " +
      s"dict=${model.dictSize} test=$testAcc")
    assert(testAcc >= goldenTest - delta,
      s"$dataset test accuracy $testAcc below golden floor $goldenTest - $delta")
    assert(testAcc <= 1.0)
  }

  test("WEASEL reaches golden accuracy on CBF") {
    gate("CBF", 0.998)
  }

  test("WEASEL reaches golden accuracy on Coffee") {
    gate("Coffee", 1.0)
  }

  test("WEASEL reaches golden accuracy on Beef") {
    gate("Beef", 0.8)
  }

  test("WEASEL reaches golden accuracy on variable_length") {
    gate("variable_length", 0.964)
  }
}
