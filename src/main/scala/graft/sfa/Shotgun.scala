package graft.sfa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shotgun distance classifiers (whole-series 1-NN;
  * /root/reference/src/main/java/sfa/classification/
  * ShotgunClassifier.java, ShotgunEnsembleClassifier.java).
  *
  * Shotgun distance: the query is cut into disjoint windows; each window
  * is matched against every aligned sliding window of the candidate
  * (z-normed via precomputed rolling mean/std; mean kept at 0 when
  * normMean is off) and contributes its minimum Euclidean distance;
  * early abandoning on both levels. O(N²·n·w) by nature — the reference
  * documents the same cost; the Spark shape is (config × query) rows
  * with the train set broadcast, so the quadratic work parallelizes
  * per-query while keeping the reference's pruning inside the kernel.
  */
object Shotgun {

  final case class Config(
      minWindowLength: Int = 5,
      maxWindowLength: Int = 250,
      factor: Double = 0.92, // ensemble; the single classifier uses 1.0
      normalization: Seq[Boolean] = Seq(true, false),
      /** Train-corpus byte ceiling for the collect-and-broadcast 1-NN
        * path; beyond it the classifier switches to the distributed
        * pair plan (no driver-sized state). 256 MB default — the same
        * order as Spark's own broadcast comfort zone on an 8 GB driver.
        */
      broadcastMaxBytes: Long = 256L << 20)

  final case class ShotgunModel(
      norm: Boolean,
      windowLength: Int,
      trainCorrect: Long)

  /** Exact Shotgun distance of one query to one candidate: Σ over the
    * query's disjoint windows of the min aligned ED² over every
    * candidate offset (ShotgunClassifier.java:152-238, without the
    * cross-candidate early abandon — this is the distance itself, not
    * the 1-NN search).
    */
  def distance(
      query: Array[Double],
      ts: Array[Double],
      windowLength: Int,
      normMean: Boolean = true): Double = {
    val wq = math.min(query.length, windowLength)
    val queryWindows = SFA.disjointWindows(query, wq, normMean)
    val w = math.min(windowLength, ts.length)
    val end = ts.length - windowLength + 1
    val (means, stds) = Fourier.rollingMeanStd(ts, w)
    var total = 0.0
    var qi = 0
    while (qi < queryWindows.length) {
      val q = queryWindows(qi)
      var result = Double.MaxValue
      var ww = 0
      while (ww < end) {
        val mean = if (normMean) means(ww) else 0.0
        val inv = if (stds(ww) > 0) 1.0 / stds(ww) else 1.0
        var d = 0.0
        var k = 0
        while (k < q.length && d < result) {
          val v = q(k) - (ts(ww + k) - mean) * inv
          d += v * v
          k += 1
        }
        if (d < result) result = d
        ww += 1
      }
      total += result
      qi += 1
    }
    total
  }

  /** 1-NN by Shotgun distance over a broadcast train set. Returns
    * (trainIdx, label) of the nearest neighbor, −1 when none qualifies.
    * Mirrors ShotgunClassifier.predict (strict improvement, train order
    * wins ties, `excludeId` replicates the reference's identity skip).
    */
  def nn1(
      query: Array[Double],
      excludeId: Long,
      train: Array[(Long, Double, Array[Double])],
      windowLength: Int,
      normMean: Boolean): (Long, Double) = {
    val wq = math.min(query.length, windowLength)
    val queryWindows = SFA.disjointWindows(query, wq, normMean)
    var best = Double.MaxValue
    var bestId = -1L
    var bestLabel = Double.NaN
    var j = 0
    while (j < train.length) {
      val (tid, tLabel, ts) = train(j)
      if (tid != excludeId) {
        val end = ts.length - windowLength + 1
        val w = math.min(windowLength, ts.length)
        val (means, stds) = Fourier.rollingMeanStd(ts, w)
        var total = 0.0
        var qi = 0
        var abandoned = false
        while (qi < queryWindows.length && !abandoned) {
          val q = queryWindows(qi)
          // when the candidate is shorter than the window, no offset
          // qualifies and the window contributes `best` (reference
          // behavior: the min stays at its seed) → abandoned below
          var result = best
          var ww = 0
          while (ww < end) {
            val mean = if (normMean) means(ww) else 0.0
            val inv = if (stds(ww) > 0) 1.0 / stds(ww) else 1.0
            var d = 0.0
            var k = 0
            var live = true
            while (k < q.length && live) {
              val v = q(k) - (ts(ww + k) - mean) * inv
              d += v * v
              if (d >= result) { live = false; d = Double.MaxValue }
              k += 1
            }
            if (d < result) result = d
            ww += 1
          }
          total += result
          if (total > best) abandoned = true
          qi += 1
        }
        if (!abandoned && total < best) {
          best = total
          bestId = tid
          bestLabel = tLabel
        }
      }
      j += 1
    }
    (bestId, bestLabel)
  }

  /** Predictions of every (norm, w) config for every input row, with the
    * train set broadcast: (norm, w, id, label, predLabel).
    */
  def predictGrid(
      data: DataFrame,
      train: Array[(Long, Double, Array[Double])],
      cfgs: Seq[(Boolean, Int)],
      loo: Boolean)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(train)
    val cfgDf = cfgs.toDF("norm", "w")
    val nnUdf = udf { (data: Seq[Double], id: Long, norm: Boolean, w: Int) =>
      val (_, label) = nn1(data.toArray, if (loo) id else -1L, bc.value, w, norm)
      label
    }
    data.crossJoin(broadcast(cfgDf))
      .select(col("norm"), col("w"), col("id"), col("label"),
        nnUdf(col("data"), col("id"), col("norm"), col("w")).as("predLabel"))
      .filter(!isnan(col("predLabel")))
  }

  /** Distributed twin of [[predictGrid]]: the train corpus stays a
    * DataFrame (no driver collect, no corpus broadcast) and the 1-NN
    * reduces as crossJoin → per-pair exact [[distance]] → map-side
    * partial `min(struct(total, rid))`. Semantics are identical —
    * per-window mins are the same FP sums, strict-improvement ties
    * resolve to the lowest train id via the struct ordering, and a
    * candidate any of whose windows admits no aligned offset
    * accumulates ≥ Double.MaxValue, which both paths exclude. The
    * cross-candidate early abandon is lost (each pair is independent),
    * which trades compute for unbounded scale — the reference's own
    * cost is the same O(N²·n·w).
    */
  def predictGridDistributed(
      data: DataFrame,
      train: DataFrame,
      cfgs: Seq[(Boolean, Int)],
      loo: Boolean)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cfgDf = cfgs.toDF("norm", "w")
    val t = train.select(col("id").as("rid"), col("label").as("rlabel"), col("data").as("rdata"))
    val pairUdf = udf { (q: Seq[Double], ts: Seq[Double], norm: Boolean, w: Int) =>
      distance(q.toArray, ts.toArray, w, norm)
    }
    val looFilter = if (loo) col("id") =!= col("rid") else lit(true)
    data.select(col("id"), col("label"), col("data"))
      .crossJoin(t)
      .filter(looFilter)
      .crossJoin(broadcast(cfgDf))
      .withColumn("total", pairUdf(col("data"), col("rdata"), col("norm"), col("w")))
      .filter(col("total") < lit(Double.MaxValue))
      .groupBy("norm", "w", "id", "label")
      .agg(min(struct(col("total"), col("rid"), col("rlabel"))).as("m"))
      .select(col("norm"), col("w"), col("id"), col("label"),
        col("m.rlabel").as("predLabel"))
  }
}

/** Single best-window Shotgun classifier (factor 1.0 → one model per
  * norm, best norm kept) and the factor-0.92 ensemble variant.
  */
class ShotgunClassifier(cfg: Shotgun.Config = Shotgun.Config(), ensemble: Boolean = false) {
  import Shotgun._

  private def collectTrain(train: DataFrame): Array[(Long, Double, Array[Double])] =
    train.select("id", "label", "data").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)

  /** (rows, data cells, max series length) in one narrow agg — the
    * size gate that decides collect-and-broadcast vs the distributed
    * pair plan without ever collecting the corpus first.
    */
  private def trainStats(train: DataFrame): (Long, Long, Int) = {
    val r = train.agg(count(lit(1)), sum(size(col("data"))), max(size(col("data")))).head()
    (r.getLong(0), r.getLong(1), r.getInt(2))
  }

  private def gridPredictions(
      data: DataFrame,
      train: DataFrame,
      trainArr: Option[Array[(Long, Double, Array[Double])]],
      grid: Seq[(Boolean, Int)],
      loo: Boolean)(implicit spark: SparkSession): DataFrame =
    trainArr match {
      case Some(arr) => predictGrid(data, arr, grid, loo)
      case None => predictGridDistributed(data, train, grid, loo)
    }

  def fit(train: DataFrame)(implicit spark: SparkSession): Seq[ShotgunModel] = {
    val (_, cells, maxLen) = trainStats(train)
    // collect the corpus only while it provably fits the broadcast
    // budget; past that the distributed pair plan takes over (same
    // predictions, no driver-sized state)
    val trainArr =
      if (cells * 8L <= cfg.broadcastMaxBytes) Some(collectTrain(train))
      else {
        System.err.println(
          s"[gated] shotgun train corpus: ${cells * 8L} B > ${cfg.broadcastMaxBytes} B — distributed pair plan")
        None
      }
    val windows = cfg.minWindowLength to math.min(maxLen, cfg.maxWindowLength)
    val factor = if (ensemble) cfg.factor else 1.0

    val perNorm = cfg.normalization.map { nm =>
      import train.sparkSession.implicits._
      val grid = windows.map(w => (nm, w))
      val loo = gridPredictions(train, train, trainArr, grid, loo = true).cache()
      val scores = loo.filter(col("predLabel") === col("label"))
        .groupBy("norm", "w").agg(count(lit(1)).as("correct"))
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
      val best = if (scores.isEmpty) 0L else scores.values.max
      // models within factor; the "highest scoring" = max (score, w)
      val kept = windows.filter(w => scores.getOrElse(w, 0L) >= best * factor)
        .map(w => ShotgunModel(nm, w, scores.getOrElse(w, 0L)))
        .sortBy(m => (-m.trainCorrect, -m.windowLength))
      // the ensemble's per-norm score is the WEIGHTED VOTE's train
      // accuracy (self-excluded), not the best single window —
      // ShotgunEnsembleClassifier.fit evaluates predict(model, train)
      val votedCorrect =
        if (!ensemble || kept.isEmpty) best
        else {
          val sel = kept.map(m => (m.norm, m.windowLength, m.trainCorrect))
            .toDF("norm", "w", "weight")
          Boss.vote(loo.join(broadcast(sel), Seq("norm", "w")))
            .filter(col("pred") === col("label")).count()
        }
      loo.unpersist()
      (nm, kept, votedCorrect)
    }
    // best norm: single → strictly greater (first norm wins ties);
    // ensemble → reference uses <= (later norm wins ties)
    val chosen =
      if (ensemble) perNorm.foldLeft(perNorm.head) { (a, c) => if (c._3 >= a._3) c else a }
      else perNorm.foldLeft(perNorm.head) { (a, c) => if (c._3 > a._3) c else a }
    if (ensemble) chosen._2 else chosen._2.take(1)
  }

  def predict(models: Seq[ShotgunModel], train: DataFrame, test: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    val (_, cells, _) = trainStats(train)
    val trainArr =
      if (cells * 8L <= cfg.broadcastMaxBytes) Some(collectTrain(train)) else None
    val preds = gridPredictions(test, train, trainArr,
      models.map(m => (m.norm, m.windowLength)), loo = false)
    val weights = models.map(m => ((m.norm, m.windowLength), m.trainCorrect)).toMap
    val wUdf = udf { (norm: Boolean, w: Int) => weights((norm, w)) }
    Boss.vote(preds.withColumn("weight", wUdf(col("norm"), col("w"))))
  }

  def eval(train: DataFrame, test: DataFrame)(implicit spark: SparkSession): (Seq[ShotgunModel], Double) = {
    val models = fit(train)
    val total = test.count()
    val correct = predict(models, train, test).filter(col("pred") === col("label")).count()
    (models, correct.toDouble / total)
  }
}
