package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden accuracy gates for BOSS VS, replicating the reference's
  * BossVSClassifierTest dataset matrix (DELTA 0.05;
  * /root/reference/src/test/java/sfa/classification/
  * BossVSClassifierTest.java:11-17).
  */
class BossVSGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"
  private val delta = 0.05

  private def gate(dataset: String, goldenTest: Double): Unit = {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/$dataset/${dataset}_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/$dataset/${dataset}_TEST").toSeq.toDF()

    val clf = new BossVSEnsemble()
    val (model, testAcc) = clf.eval(train, test)
    info(s"$dataset models=${model.models.length} test=$testAcc")
    assert(model.models.nonEmpty)
    assert(math.abs(testAcc - goldenTest) <= delta,
      s"$dataset test accuracy $testAcc vs golden $goldenTest")
  }

  test("BOSS VS reaches golden accuracy on CBF") {
    gate("CBF", 0.998)
  }

  test("BOSS VS reaches golden accuracy on Coffee") {
    gate("Coffee", 1.0)
  }

  test("BOSS VS reaches golden accuracy on Beef") {
    gate("Beef", 0.833)
  }
}
