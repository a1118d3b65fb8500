package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders

/** Golden accuracy gates for the Shotgun classifiers, replicating
  * ShotgunClassifierTest and ShotgunEnsembleClassifierTest across the
  * reference's dataset matrix, DELTA 0.05
  * (/root/reference/src/test/java/sfa/classification/).
  */
class ShotgunGoldenSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"
  private val delta = 0.05

  private def gate(dataset: String, ensemble: Boolean, goldenTest: Double): Unit = {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/$dataset/${dataset}_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/$dataset/${dataset}_TEST").toSeq.toDF()
    val clf = new ShotgunClassifier(ensemble = ensemble)
    val (models, acc) = clf.eval(train, test)
    info(s"$dataset ensemble=$ensemble models=${models.length} " +
      s"window=${models.head.windowLength} test=$acc")
    assert(math.abs(acc - goldenTest) <= delta,
      s"$dataset test accuracy $acc vs golden $goldenTest")
  }

  test("Shotgun (best window) reaches golden accuracy on CBF") {
    gate("CBF", ensemble = false, 0.969)
  }

  test("Shotgun ensemble reaches golden accuracy on CBF") {
    gate("CBF", ensemble = true, 0.991)
  }

  test("Shotgun (best window) reaches golden accuracy on Coffee") {
    gate("Coffee", ensemble = false, 1.0)
  }

  test("Shotgun ensemble reaches golden accuracy on Coffee") {
    gate("Coffee", ensemble = true, 0.929)
  }

  test("Shotgun (best window) reaches golden accuracy on Beef") {
    gate("Beef", ensemble = false, 0.8)
  }

  test("Shotgun ensemble reaches golden accuracy on Beef") {
    gate("Beef", ensemble = true, 0.9)
  }

  /** The distributed pair plan (train corpus too large to collect —
    * forced with a zero broadcast budget) must reproduce the broadcast
    * path's models and predictions exactly: same windows kept, same
    * train scores, same test predictions per id.
    */
  test("distributed Shotgun fallback ≡ collect-and-broadcast path", graft.Slow) {
    import spark.implicits._
    val train = Loaders.loadUcrLocal(s"$base/Coffee/Coffee_TRAIN").toSeq.toDF()
    val test = Loaders.loadUcrLocal(s"$base/Coffee/Coffee_TEST").toSeq.toDF()
    val small = Shotgun.Config(maxWindowLength = 60)
    val cBroad = new ShotgunClassifier(small, ensemble = true)
    val cDist = new ShotgunClassifier(small.copy(broadcastMaxBytes = 0L), ensemble = true)
    val mB = cBroad.fit(train)
    val mD = cDist.fit(train)
    assert(mD === mB)
    val pB = cBroad.predict(mB, train, test)
      .select("id", "pred").as[(Long, Double)].collect().sortBy(_._1)
    val pD = cDist.predict(mD, train, test)
      .select("id", "pred").as[(Long, Double)].collect().sortBy(_._1)
    assert(pD === pB)
  }
}
