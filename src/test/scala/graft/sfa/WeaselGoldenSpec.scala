package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden accuracy gates for WEASEL, replicating the reference's
  * WEASELClassifierTest dataset matrix (DELTA 0.05;
  * /root/reference/src/test/java/sfa/classification/
  * WEASELClassifierTest.java:11-17).
  *
  * TWO-SIDED at the reference's own ±0.05 since r5 (deviation D4
  * closed): with the liblinear-parity OvR fits (`LinModel`) the r2-r4
  * floor-only rationale (MLlib LBFGS landing above the golden) no
  * longer applies.
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
    assert(math.abs(testAcc - goldenTest) <= delta,
      s"$dataset test accuracy $testAcc vs golden $goldenTest ± $delta")
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
