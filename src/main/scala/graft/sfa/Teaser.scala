package graft.sfa

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Master = a one-class RBF SVM with the reference's own configuration
  * (ν=0.05, γ grid {100…1} by 10-fold CV — [[OneClassSVM]] replicates
  * libsvm's solver and the reference's CV permutation). Its training
  * input is model-sized by design (correct-sample probability vectors,
  * ≤ trainN × (#classes+1) doubles — the same driver-side libsvm
  * problem the reference builds); ACCEPTANCE is applied distributedly
  * via a broadcast model inside a UDF.
  *
  * The cascade itself is a distributed fold: per snapshot the slave's
  * (id, pred, accepted) outcomes join the per-sample streak state —
  * a DataFrame, never a driver map — so the test side scales out.
  * Driver-side state is O(S) DataFrame handles plus the models.
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

  final case class TeaserModel(
      offsets: Array[Int], // index s → prefix length (0 = unused slot)
      slaves: Map[Int, Weasel.WeaselModel],
      masters: Map[Int, OneClassSVM.Model],
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

  /** (id, p, accepted) from slave probabilities + broadcast master. */
  private def outcomeOf(
      proba: DataFrame,
      master: OneClassSVM.Model)(implicit spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(master)
    val acceptUdf = udf { (probs: Seq[Double]) =>
      bc.value.accepts(features(probs.toArray))
    }
    proba.select(col("id"), col("pred").as("p"), acceptUdf(col("probs")).as("accepted"))
  }

  /** One distributed cascade step: join a snapshot's outcomes into the
    * undecided rows of `state` and update streaks/decisions. State
    * schema: (id, t, label, len, slabel, streak, pred, off).
    */
  private def cascadeStep(
      state: DataFrame,
      out: DataFrame,
      offset: Int,
      sIdx: Int): DataFrame = {
    val undec = state.filter(col("pred").isNull)
    val dec = state.filter(col("pred").isNotNull)
    val forced: Column = lit(sIdx >= cfg.s) || (lit(offset) >= col("len"))
    val acc = col("p").isNotNull && (col("accepted") || forced)
    val newLabel = when(acc, col("p")).otherwise(col("slabel"))
    val newStreak = when(!acc, col("streak"))
      .when(col("p") === col("slabel"), col("streak") + 1)
      .otherwise(lit(1))
    val decide = acc && (newStreak >= col("t") || forced)
    val stepped = undec.join(out, Seq("id"), "left")
      .select(col("id"), col("t"), col("label"), col("len"),
        when(decide, lit(null).cast("double")).otherwise(newLabel).as("slabel"),
        when(decide, lit(0)).otherwise(newStreak).as("streak"),
        when(decide, col("p")).otherwise(lit(null).cast("double")).as("pred"),
        when(decide, lit(offset)).otherwise(lit(0)).as("off"))
    dec.unionByName(stepped)
  }

  /** Final per-sample results from a finished state. */
  private def finish(state: DataFrame): DataFrame =
    state.select(col("id"), col("label"), col("pred"), col("off"),
      least(lit(1.0), col("off").cast("double") / col("len")).as("earliness"))

  def fit(train: DataFrame)(implicit spark: SparkSession): TeaserModel = {
    val weasel = new WeaselClassifier(slaveCfg)
    val maxLen = train.select(max(size(col("data")))).head.getInt(0)
    val maxL = math.min(maxLen, cfg.maxWindowLength)
    val step = maxL / cfg.s.toDouble
    val offsets = new Array[Int](cfg.s + 1)

    val slaves = scala.collection.mutable.Map.empty[Int, Weasel.WeaselModel]
    val masters = scala.collection.mutable.Map.empty[Int, OneClassSVM.Model]
    val outcomes = scala.collection.mutable.Map.empty[Int, DataFrame]

    for (s <- 2 to cfg.s) {
      offsets(s) = math.round(step * s).toInt
      if (offsets(s) >= cfg.minLen) {
        val truncated = truncate(train, offsets(s))
        val slave = weasel.fit(truncated)
        slaves(s) = slave
        val proba = weasel.predictProba(slave, truncated).cache()
        // the ONLY collect: correct-sample features — the reference's
        // driver-side libsvm problem (model-sized by design)
        val correctFeats = proba.filter(col("label") === col("pred"))
          .select(col("probs")).collect()
          .map(r => features(r.getSeq[Double](0).toArray))
        val master = OneClassSVM.fitGrid(correctFeats, cfg.nu)
        masters(s) = master
        val out = outcomeOf(proba, master).cache()
        out.count()
        proba.unpersist()
        outcomes(s) = out
      }
    }

    // threshold tuning: ONE distributed fold evaluating every candidate
    // threshold at once (state rows carry t; streak logic reads it)
    val thresholds: List[Int] = (cfg.minThreshold to cfg.maxThreshold).toList
    var state = train
      .select(col("id"), col("label"), size(col("data")).as("len"))
      .withColumn("t", explode(typedlit(thresholds)))
      .withColumn("slabel", lit(null).cast("double"))
      .withColumn("streak", lit(0))
      .withColumn("pred", lit(null).cast("double"))
      .withColumn("off", lit(0))
      .select("id", "t", "label", "len", "slabel", "streak", "pred", "off")
      .localCheckpoint(true)
    // localCheckpoint per step: an iterative fold's LOGICAL plan grows
    // per iteration even under cache(); checkpointing truncates lineage
    for (s <- 2 to cfg.s if outcomes.contains(s)) {
      state = cascadeStep(state, outcomes(s), offsets(s), s).localCheckpoint(true)
    }
    val byT = state.groupBy("t").agg(
      avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)).as("acc"),
      avg(least(lit(1.0), col("off").cast("double") / col("len"))).as("earl"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    outcomes.values.foreach(_.unpersist())
    var bestF1 = -1.0
    var bestT = cfg.minThreshold
    byT.foreach { case (t, acc, earl) =>
      val e = 1.0 - earl
      val f1 = if (acc + e == 0) 0.0 else 2 * acc * e / (acc + e)
      if (f1 > bestF1) { bestF1 = f1; bestT = t }
    }

    TeaserModel(offsets, slaves.toMap, masters.toMap, bestT)
  }

  /** Early-classify test rows, fully distributed: per snapshot the
    * slave runs on the still-undecided subset (the reference's early
    * exit) and the streak state folds forward as a DataFrame.
    * Output: (id, label, pred, off, earliness).
    */
  def predictDF(model: TeaserModel, test: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val weasel = new WeaselClassifier(slaveCfg)
    var state = test
      .select(col("id"), col("label"), size(col("data")).as("len"))
      .withColumn("t", lit(model.threshold))
      .withColumn("slabel", lit(null).cast("double"))
      .withColumn("streak", lit(0))
      .withColumn("pred", lit(null).cast("double"))
      .withColumn("off", lit(0))
      .select("id", "t", "label", "len", "slabel", "streak", "pred", "off")
      .localCheckpoint(true)
    var undecided = state.count()
    var s = 2
    while (s < model.offsets.length && undecided > 0) {
      model.slaves.get(s).foreach { slave =>
        val subset = test.join(
          state.filter(col("pred").isNull).select("id"), Seq("id"), "left_semi")
        val out = outcomeOf(
          weasel.predictProba(slave, truncate(subset, model.offsets(s))),
          model.masters(s))
        // localCheckpoint truncates the per-iteration lineage growth
        state = cascadeStep(state, out, model.offsets(s), s).localCheckpoint(true)
        undecided = state.filter(col("pred").isNull).count()
      }
      s += 1
    }
    finish(state)
  }

  /** Compatibility form of [[predictDF]] (collects the per-sample
    * RESULT rows — 5 scalars each — not any intermediate state).
    */
  def predict(model: TeaserModel, test: DataFrame)(implicit spark: SparkSession): Seq[Early] =
    predictDF(model, test).collect().toSeq.map { r =>
      Early(r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        r.getInt(3), r.getDouble(4))
    }

  /** (accuracy, average earliness) — A7 evaluation, aggregated
    * distributedly.
    */
  def eval(train: DataFrame, test: DataFrame)(implicit spark: SparkSession): (TeaserModel, Double, Double) = {
    val model = fit(train)
    val res = predictDF(model, test).cache()
    val row = res.agg(
      avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)),
      avg(col("earliness"))).head
    res.unpersist()
    (model, row.getDouble(0), row.getDouble(1))
  }
}
