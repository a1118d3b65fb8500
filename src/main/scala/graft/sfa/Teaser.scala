package graft.sfa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEASER — Two-tier Early and Accurate Series classifiER
  * (/root/reference/src/main/java/sfa/classification/TEASERClassifier.java).
  *
  * S prefix snapshots (5% steps): per snapshot a WEASEL slave is trained
  * on truncated series, and a one-class master decides whether the
  * slave's probability vector looks like the vectors it produced on
  * correctly-classified training samples. A prediction is accepted when
  * the master approves the same label `threshold` consecutive times;
  * the threshold (2..5) maximizes the harmonic mean of train accuracy
  * and earliness (TEASERClassifier.java:163-189).
  *
  * Master substitute (SURVEY §7.3): the reference's libsvm one-class
  * RBF SVM (ν=0.05, γ grid) has no offline Spark equivalent. The
  * master input is tiny (≤ trainN vectors of K+1 dims), so we use a
  * deterministic novelty rule with the same contract: accept a feature
  * vector iff its nearest-neighbor distance to the training vectors is
  * within the 95th percentile (≙ ν=0.05 outlier budget) of the training
  * vectors' own leave-one-out nearest-neighbor distances. Golden
  * accuracy/earliness tolerances (±0.05) absorb the substitution.
  *
  * Feature vector = class probabilities :+ (max − closest runner-up),
  * the reference's generateFeatures (TEASERClassifier.java:405-425).
  */
object Teaser {

  final case class Config(
      s: Int = 20,
      minThreshold: Int = 2,
      maxThreshold: Int = 5,
      nu: Double = 0.05,
      minLen: Int = 3,
      maxWindowLength: Int = 250)

  /** One-class novelty master: training vectors + acceptance radius. */
  final case class Master(vectors: Array[Array[Double]], tau: Double) {
    def accepts(x: Array[Double]): Boolean = {
      if (vectors.isEmpty) false
      else {
        var best = Double.MaxValue
        vectors.foreach { v =>
          var d = 0.0
          var i = 0
          while (i < v.length && i < x.length) { val t = v(i) - x(i); d += t * t; i += 1 }
          if (d < best) best = d
        }
        math.sqrt(best) <= tau
      }
    }
  }

  final case class TeaserModel(
      offsets: Array[Int], // index s → prefix length (0 = unused slot)
      slaves: Map[Int, Weasel.WeaselModel],
      masters: Map[Int, Master],
      threshold: Int)

  /** Per-sample cascade outcome. */
  final case class Early(id: Long, label: Double, pred: Double, offset: Int, earliness: Double)

  private[sfa] def features(probs: Array[Double]): Array[Double] = {
    var maxId = 0
    var mx = 0.0
    probs.indices.foreach { i => if (probs(i) > mx) { mx = probs(i); maxId = i } }
    var minDiff = 1.0
    probs.indices.foreach { i => if (i != maxId) minDiff = math.min(minDiff, mx - probs(i)) }
    probs :+ minDiff
  }

  private[sfa] def fitMaster(correctFeatures: Array[Array[Double]], nu: Double): Master = {
    if (correctFeatures.length < 2) Master(correctFeatures, Double.MaxValue)
    else {
      val nnDists = correctFeatures.indices.map { i =>
        var best = Double.MaxValue
        correctFeatures.indices.foreach { j =>
          if (j != i) {
            var d = 0.0
            var k = 0
            val a = correctFeatures(i); val b = correctFeatures(j)
            while (k < a.length) { val t = a(k) - b(k); d += t * t; k += 1 }
            if (d < best) best = d
          }
        }
        math.sqrt(best)
      }.sorted
      // acceptance radius at the (1−2ν) quantile: an NN-ball union is a
      // looser boundary than the reference's one-class RBF SVM, so the
      // quantile is tightened beyond the ν outlier budget to compensate
      // (eager acceptance trades accuracy for earliness)
      val q = math.max(0.0, 1.0 - 2 * nu)
      val idx = math.min(nnDists.length - 1, math.ceil(q * nnDists.length).toInt)
      Master(correctFeatures, math.max(nnDists(idx), 1e-9))
    }
  }

  /** Truncate every series to `offset` points and re-z-norm the prefix
    * (TimeSeries.getSubsequence norms the slice, TimeSeries.java:177-182).
    */
  private[sfa] def truncate(data: DataFrame, offset: Int): DataFrame = {
    val sliceUdf = udf { (d: Seq[Double]) =>
      graft.ts.Loaders.znorm(d.take(offset).toArray)
    }
    data.select(col("id"), col("label"), sliceUdf(col("data")).as("data"))
  }
}

/** TEASER over (id, label, data) DataFrames with a WEASEL slave. */
class TeaserClassifier(
    cfg: Teaser.Config = Teaser.Config(),
    slaveCfg: Weasel.Config = Weasel.Config(maxWindowLength = 250)) {
  import Teaser._

  /** Per-snapshot slave probabilities for a data set, collected per id:
    * Map(id → (trueLabel, pred, features)).
    */
  private def snapshotProba(
      slave: Weasel.WeaselModel,
      weasel: WeaselClassifier,
      data: DataFrame,
      offset: Int)(implicit spark: SparkSession): Map[Long, (Double, Double, Array[Double])] = {
    weasel.predictProba(slave, truncate(data, offset))(spark).collect().map { r =>
      r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        features(r.getSeq[Double](3).toArray))
    }.toMap
  }

  /** Walk the cascade over precomputed per-snapshot outcomes. */
  private def cascade(
      ids: Seq[(Long, Double, Int)], // (id, label, seriesLen)
      offsets: Array[Int],
      outcomes: Map[Int, Map[Long, (Double, Double, Array[Double])]],
      masters: Map[Int, Master],
      threshold: Int): Seq[Early] = {
    ids.map { case (id, label, len) =>
      var pred = Double.NaN
      var predOffset = 0
      var streakLabel = Double.NaN
      var streak = 0
      var s = 2
      var done = false
      while (s < offsets.length && !done) {
        outcomes.get(s).flatMap(_.get(id)).foreach { case (_, p, feats) =>
          val forced = s >= cfg.s || offsets(s) >= len
          val acceptedByMaster = masters.get(s).exists(_.accepts(feats))
          if (forced || acceptedByMaster) {
            if (p == streakLabel) streak += 1
            else { streakLabel = p; streak = 1 }
            if (streak >= threshold || forced) {
              pred = p
              predOffset = offsets(s)
              done = true
            }
          }
        }
        s += 1
      }
      val earliness = math.min(1.0, predOffset.toDouble / len)
      Early(id, label, pred, predOffset, earliness)
    }
  }

  def fit(train: DataFrame)(implicit spark: SparkSession): TeaserModel = {
    val weasel = new WeaselClassifier(slaveCfg)
    val maxLen = train.select(max(size(col("data")))).head.getInt(0)
    val maxL = math.min(maxLen, cfg.maxWindowLength)
    val step = maxL / cfg.s.toDouble
    val offsets = new Array[Int](cfg.s + 1)

    val slaves = scala.collection.mutable.Map.empty[Int, Weasel.WeaselModel]
    val masters = scala.collection.mutable.Map.empty[Int, Master]
    val trainOutcomes = scala.collection.mutable.Map.empty[Int, Map[Long, (Double, Double, Array[Double])]]

    for (s <- 2 to cfg.s) {
      offsets(s) = math.round(step * s).toInt
      if (offsets(s) >= cfg.minLen) {
        val truncated = truncate(train, offsets(s))
        val slave = weasel.fit(truncated)
        slaves(s) = slave
        val out = snapshotProba(slave, weasel, train, offsets(s))
        trainOutcomes(s) = out
        val correctFeats = out.values.collect {
          case (label, pred, feats) if label == pred => feats
        }.toArray
        masters(s) = fitMaster(correctFeats, cfg.nu)
      }
    }

    // tune the consecutive-acceptance threshold on the harmonic mean of
    // train accuracy and earliness
    val ids = train.select(col("id"), col("label"), size(col("data")).as("len"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    var bestF1 = -1.0
    var bestT = cfg.minThreshold
    for (t <- cfg.minThreshold to cfg.maxThreshold) {
      val res = cascade(ids, offsets, trainOutcomes.toMap, masters.toMap, t)
      val acc = res.count(e => e.pred == e.label).toDouble / res.length
      val earl = 1.0 - res.map(_.earliness).sum / res.length
      val f1 = 2 * acc * earl / (acc + earl)
      if (f1 > bestF1) { bestF1 = f1; bestT = t }
    }

    TeaserModel(offsets, slaves.toMap, masters.toMap, bestT)
  }

  /** Early-classify test rows → per-sample (pred, offset, earliness).
    * Snapshots are evaluated in order and only for still-undecided
    * samples (the reference's early exit): most series decide on an
    * early prefix and never pay for the late slaves.
    */
  def predict(model: TeaserModel, test: DataFrame)(implicit spark: SparkSession): Seq[Early] = {
    val weasel = new WeaselClassifier(slaveCfg)
    val all = test.select(col("id"), col("label"), size(col("data")).as("len"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    var undecided = all.map(_._1).toSet
    val streaks = scala.collection.mutable.Map.empty[Long, (Double, Int)]
    val decided = scala.collection.mutable.Map.empty[Long, (Double, Int)]
    val lenOf = all.map(t => t._1 -> t._3).toMap

    var s = 2
    while (s < model.offsets.length && undecided.nonEmpty) {
      model.slaves.get(s).foreach { slave =>
        val subset = test.filter(col("id").isInCollection(undecided))
        val out = snapshotProba(slave, weasel, subset, model.offsets(s))
        out.foreach { case (id, (_, p, feats)) =>
          if (undecided.contains(id)) {
            val forced = s >= cfg.s || model.offsets(s) >= lenOf(id)
            val accepted = model.masters.get(s).exists(_.accepts(feats))
            if (forced || accepted) {
              val (lbl, cnt) = streaks.getOrElse(id, (Double.NaN, 0))
              val streak = if (p == lbl) cnt + 1 else 1
              streaks(id) = (p, streak)
              if (streak >= model.threshold || forced) {
                decided(id) = (p, model.offsets(s))
                undecided -= id
              }
            }
          }
        }
      }
      s += 1
    }
    all.map { case (id, label, len) =>
      val (pred, off) = decided.getOrElse(id, (Double.NaN, 0))
      Early(id, label, pred, off, math.min(1.0, off.toDouble / len))
    }
  }

  /** (accuracy, average earliness) — A7 evaluation. */
  def eval(train: DataFrame, test: DataFrame)(implicit spark: SparkSession): (TeaserModel, Double, Double) = {
    val model = fit(train)
    val res = predict(model, test)
    val acc = res.count(e => e.pred == e.label).toDouble / res.length
    val earliness = res.map(_.earliness).sum / res.length
    (model, acc, earliness)
  }
}
