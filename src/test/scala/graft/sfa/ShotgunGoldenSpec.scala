package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden accuracy gates for the Shotgun classifiers, replicating
  * ShotgunClassifierTest (CBF test 0.969) and
  * ShotgunEnsembleClassifierTest (CBF test 0.991), DELTA 0.05
  * (/root/reference/src/test/java/sfa/classification/).
  */
class ShotgunGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"
  private val delta = 0.05

  test("Shotgun (best window) reaches golden accuracy on CBF") {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/CBF/CBF_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST").toSeq.toDF()
    val clf = new ShotgunClassifier()
    val (models, acc) = clf.eval(train, test)
    info(s"CBF best window=${models.head.windowLength} norm=${models.head.norm} test=$acc")
    assert(math.abs(acc - 0.969) <= delta, s"test accuracy $acc vs golden 0.969")
  }

  test("Shotgun ensemble reaches golden accuracy on CBF") {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/CBF/CBF_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST").toSeq.toDF()
    val clf = new ShotgunClassifier(ensemble = true)
    val (models, acc) = clf.eval(train, test)
    info(s"CBF ensemble models=${models.length} test=$acc")
    assert(math.abs(acc - 0.991) <= delta, s"test accuracy $acc vs golden 0.991")
  }
}
