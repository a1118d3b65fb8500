package graft.sfa

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TEASER-family early-classification cascade as a distributed
  * DataFrame fold, shared by the univariate [[TeaserClassifier]]
  * (WEASEL slave, TEASERClassifier.java) and the multivariate
  * [[MteaserClassifier]] (MUSE slave, MTEASERClassifier.java:278-345).
  *
  * State schema: one row per (sample, candidate threshold) —
  * `(id, t, label, len, slabel, streak, pred, off)`. A sample is
  * decided when `pred` is non-null; the fold only ever touches the
  * undecided slice, mirroring the reference's `predictedLabels[ind]
  * == null` early exit. Thresholds ride as a data column so tuning
  * evaluates every candidate in ONE pass over the snapshots.
  */
private[sfa] object EarlyCascade {

  /** The master's feature vector: class probabilities :+ (max −
    * closest runner-up) — generateFeatures/getMinDiff
    * (TEASERClassifier.java:405-425, MTEASERClassifier.java:404-441).
    */
  def features(probs: Array[Double]): Array[Double] = {
    var maxId = 0
    var mx = 0.0
    probs.indices.foreach { i => if (probs(i) > mx) { mx = probs(i); maxId = i } }
    var minDiff = 1.0
    probs.indices.foreach { i => if (i != maxId) minDiff = math.min(minDiff, mx - probs(i)) }
    probs :+ minDiff
  }

  /** (id, p, accepted) from slave probabilities + broadcast one-class
    * master — acceptance runs distributedly, the model is model-sized.
    */
  def outcomeOf(proba: DataFrame, master: OneClassSVM.Model)(
      implicit spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(master)
    val acceptUdf = udf { (probs: Seq[Double]) =>
      bc.value.accepts(features(probs.toArray))
    }
    proba.select(col("id"), col("pred").as("p"), acceptUdf(col("probs")).as("accepted"))
  }

  /** Base state: one row per sample × candidate threshold.
    * `samples` = (id, label, len).
    */
  def init(samples: DataFrame, thresholds: Seq[Int]): DataFrame =
    samples
      .withColumn("t", explode(typedlit(thresholds.toList)))
      .withColumn("slabel", lit(null).cast("double"))
      .withColumn("streak", lit(0))
      .withColumn("pred", lit(null).cast("double"))
      .withColumn("off", lit(0))
      .select("id", "t", "label", "len", "slabel", "streak", "pred", "off")
      .localCheckpoint(true)

  /** One cascade step: join a snapshot's outcomes `(id, p, accepted)`
    * into the undecided rows and update streaks/decisions
    * (TEASERClassifier.java:300-340). `sIdx >= sTotal` or a snapshot
    * covering the whole series forces a decision.
    */
  def step(state: DataFrame, out: DataFrame, offset: Int, sIdx: Int, sTotal: Int): DataFrame = {
    val undec = state.filter(col("pred").isNull)
    val dec = state.filter(col("pred").isNotNull)
    val forced: Column = lit(sIdx >= sTotal) || (lit(offset) >= col("len"))
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
    // cap partitions: `out` is broadcast-joined, so `stepped` keeps
    // undec's partitioning and the union would otherwise DOUBLE the
    // partition count every snapshot (p·2^S tasks by the last step).
    // coalesce is narrow — no shuffle, just a per-step merge.
    val parts = math.max(1, state.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    dec.unionByName(stepped).coalesce(parts)
  }

  /** Final per-sample results: (id, label, pred, off, earliness). */
  def finish(state: DataFrame): DataFrame =
    state.select(col("id"), col("label"), col("pred"), col("off"),
      least(lit(1.0), col("off").cast("double") / col("len")).as("earliness"))

  /** Pick the threshold maximizing the harmonic mean of accuracy and
    * (1 − earliness) from a fully-folded multi-threshold state
    * (TEASERClassifier.java:163-189; strict improvement, ascending t).
    */
  def bestThreshold(state: DataFrame, minThreshold: Int): Int = {
    val byT = state.groupBy("t").agg(
      avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)).as("acc"),
      avg(least(lit(1.0), col("off").cast("double") / col("len"))).as("earl"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    var bestF1 = -1.0
    var bestT = minThreshold
    byT.foreach { case (t, acc, earl) =>
      val e = 1.0 - earl
      val f1 = if (acc + e == 0) 0.0 else 2 * acc * e / (acc + e)
      if (f1 > bestF1) { bestF1 = f1; bestT = t }
    }
    bestT
  }
}
