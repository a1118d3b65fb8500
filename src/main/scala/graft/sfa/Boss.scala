package graft.sfa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** BOSS — Bag-of-SFA-Symbols dictionary classifier, Spark-first.
  *
  * Reference behavior (/root/reference/src/main/java/sfa/):
  *  - transformation/BOSS.java        (words, numerosity-reduced bags)
  *  - classification/BOSSEnsembleClassifier.java (window grid, asymmetric
  *    1-NN bag distance, weighted vote)
  *
  * Architecture: the reference grids over ~240 (windowLength, norm)
  * configurations with a thread pool; here the configuration is a *data
  * column*, so the whole grid is a handful of Spark jobs regardless of
  * grid size — fit bins (one groupBy per (cfg, coefficient)), build words
  * (one UDF pass), build bags (one lag+groupBy), and leave-one-out 1-NN
  * (one equi-join on (cfg, word) — never a cross join; pairs sharing no
  * word have distance == noMatch and are skipped by the reference too, so
  * the equi-join loses nothing).
  *
  * Scale notes (100 TB): every shuffle is keyed by (cfg, series) or
  * (cfg, word) — both high-cardinality and bounded-skew (word vocabulary
  * ≤ alphabet^wordLength; bag counts are numerosity-reduced). Train-side
  * bags of a fitted model are small (ensemble models × train vocabulary)
  * and are broadcast at predict time.
  */
object Boss {

  /** Default training parameters (BOSSEnsembleClassifier.java:23-30). */
  final case class Config(
      minF: Int = 6,
      maxF: Int = 16,
      alphabetSize: Int = 4,
      factor: Double = 0.92,
      minWindowLength: Int = 10,
      maxWindowLength: Int = 250,
      normalization: Seq[Boolean] = Seq(true, false))

  /** One fitted window model of the ensemble. */
  final case class WindowModel(
      norm: Boolean,
      windowLength: Int,
      features: Int,
      trainCorrect: Long,
      sfa: SFAModel)

  /** A fitted ensemble: selected window models + their train bags.
    * `trainBags` columns: (norm, w, id, label, word, cnt) for the
    * selected (norm, w) configs at each model's feature length.
    */
  final case class EnsembleModel(
      models: Seq[WindowModel],
      trainBags: DataFrame,
      trainSize: Long)

  private def cfgCols = Seq(col("norm"), col("w"))

  /** Fit SFA bins for every (norm, windowLength) config in one pass.
    * Returns driver-side models keyed by (norm, w) — the bins are tiny
    * (l × (α−1) doubles per config) and broadcast with the closure.
    */
  def fitBinsGrid(
      train: DataFrame,
      windows: Seq[Int],
      norms: Seq[Boolean],
      wordLength: Int,
      alphabetSize: Int)(implicit spark: SparkSession): Map[(Boolean, Int), SFAModel] = {
    import spark.implicits._
    val cfgs = norms.flatMap(n => windows.map(w => (n, w))).toDF("norm", "w")

    val disjointApprox = udf { (data: Seq[Double], w: Int, norm: Boolean) =>
      val arr = data.toArray
      SFA.disjointWindows(arr, w, norm).map { win =>
        Fourier.transformWindow(win, 0, w, wordLength, norm, lowerBounding = true)
          .map(SFA.roundAt(_, 2))
      }
    }

    val orderline = train
      .crossJoin(cfgs)
      .select(col("norm"), col("w"), col("label"),
        explode(disjointApprox(col("data"), col("w"), col("norm"))).as("approx"))
      .select(col("norm"), col("w"), col("label"), posexplode(col("approx")).as(Seq("coef", "v")))

    // exact per-coefficient orderline → reference equi-depth scan; the
    // collect_list group is one (cfg, coefficient) slice of the training
    // windows — bounded by the fit sample, which at extreme scale is
    // itself a sample (the reference trains on disjoint windows for the
    // same reason).
    val edgesUdf = udf { (vals: Seq[Double]) =>
      SFA.equiDepthEdges(vals.sorted.toArray, alphabetSize)
    }
    val binRows = orderline
      .groupBy(col("norm"), col("w"), col("coef"))
      .agg(edgesUdf(collect_list(col("v"))).as("edges"))
      .groupBy(col("norm"), col("w"))
      .agg(sort_array(collect_list(struct(col("coef"), col("edges")))).as("perCoef"))
      .collect()

    binRows.map { r =>
      val norm = r.getBoolean(0)
      val w = r.getInt(1)
      val perCoef = r.getSeq[org.apache.spark.sql.Row](2)
      val bins = Array.fill(wordLength)(Array.fill(alphabetSize - 1)(Double.MaxValue))
      perCoef.foreach { pc => bins(pc.getInt(0)) = pc.getSeq[Double](1).toArray }
      (norm, w) -> SFAModel(w, wordLength, alphabetSize, norm,
        lowerBounding = true, applyZNorm = true, bins = bins)
    }.toMap
  }

  /** Sliding packed words (at maxF symbols) for every config — one UDF
    * pass per (series, cfg) via the MFT recurrence. Columns:
    * (norm, w, id, label, offset, word).
    */
  def slidingWordsGrid(
      train: DataFrame,
      models: Map[(Boolean, Int), SFAModel],
      maxF: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(models)
    val cfgs = models.keys.toSeq.toDF("norm", "w")
    val wordsUdf = udf { (data: Seq[Double], norm: Boolean, w: Int) =>
      bc.value((norm, w)).transformWindowingWords(data.toArray, maxF)
    }
    train.crossJoin(cfgs)
      .select(col("norm"), col("w"), col("id"), col("label"),
        posexplode(wordsUdf(col("data"), col("norm"), col("w"))).as(Seq("offset", "word")))
  }

  /** Numerosity-reduced bags at feature length f: mask the packed word to
    * f symbols, drop offsets whose masked word equals the previous
    * offset's, count per (cfg, series, word) (BOSS.java:116-145).
    * Input must carry (norm, w, id, label, offset, word).
    */
  def bagsAt(words: DataFrame, f: Int, usedBits: Int): DataFrame = {
    val m = Words.mask(f, usedBits)
    val byOffset = Window.partitionBy(col("norm"), col("w"), col("id")).orderBy(col("offset"))
    words
      .withColumn("wf", col("word").bitwiseAND(lit(m)))
      .withColumn("prev", lag(col("wf"), 1).over(byOffset))
      .filter(col("prev").isNull || col("prev") =!= col("wf"))
      .groupBy(col("norm"), col("w"), col("id"), col("label"), col("wf"))
      .agg(count(lit(1)).as("cnt"))
      .withColumnRenamed("wf", "word")
  }

  /** Asymmetric 1-NN bag join: for each test bag, the nearest train bag
    * under dist = Σ_{test words} (tc − nc)², candidates from the
    * (cfg, word) equi-join, with the reference's guards — skip self,
    * skip dist == noMatch (no effective overlap) and dist == 0; ties
    * broken by the smaller train id (= reference scan order)
    * (BOSSEnsembleClassifier.java:184-236).
    *
    * Returns (norm, w, id, label, predLabel).
    */
  def nn1(
      testBags: DataFrame,
      trainBags: DataFrame,
      broadcastTrain: Boolean = false,
      excludeSameId: Boolean = true,
      keys: Seq[String] = Seq("norm", "w")): DataFrame = {
    val k = keys.map(col)
    val t = testBags.select(
      k :+ col("id").as("test_id") :+ col("label").as("test_label") :+
        col("word") :+ col("cnt").as("tc"): _*)
    val n0 = trainBags.select(
      k :+ col("id").as("train_id") :+ col("label").as("train_label") :+
        col("word") :+ col("cnt").as("nc"): _*)
    val n = if (broadcastTrain) broadcast(n0) else n0

    val noMatch = t.groupBy(k :+ col("test_id"): _*)
      .agg(sum(col("tc") * col("tc")).as("no_match"))

    // dist = noMatch + Σ_shared ((tc−nc)² − tc²); partial aggregation is
    // map-side combinable, so the only shuffle is on (cfg, pair).
    // the reference's self-skip is OBJECT identity — it only bites in
    // LOO scoring (test == train array); on test prediction a test id
    // numerically equal to a train id is a DIFFERENT series and must
    // compete (BOSSEnsembleClassifier.java:206)
    val pairs0 = t.join(n, keys :+ "word")
    val pairs = (if (excludeSameId) pairs0.filter(col("test_id") =!= col("train_id")) else pairs0)
      .groupBy(k :+ col("test_id") :+ col("test_label") :+
        col("train_id") :+ col("train_label"): _*)
      .agg(sum((col("tc") - col("nc")) * (col("tc") - col("nc")) - col("tc") * col("tc"))
        .as("delta"))
      .join(noMatch, keys :+ "test_id")
      .withColumn("dist", col("delta") + col("no_match"))
      .filter(col("dist") =!= col("no_match") && col("dist") > 0)

    val byDist = Window.partitionBy(k :+ col("test_id"): _*)
      .orderBy(col("dist").asc, col("train_id").asc)
    pairs.withColumn("rn", row_number().over(byDist))
      .filter(col("rn") === 1)
      .select(k :+ col("test_id").as("id") :+
        col("test_label").as("label") :+ col("train_label").as("predLabel"): _*)
  }

  /** Weighted majority vote across ensemble models per test id; tie-break:
    * larger label wins (Classifier.java:569-615, ENSEMBLE_WEIGHTS on).
    * Input: (id, label, predLabel, weight). Output: (id, label, pred).
    */
  def vote(preds: DataFrame): DataFrame = {
    val byCount = Window.partitionBy(col("id")).orderBy(col("votes").desc, col("predLabel").desc)
    preds.groupBy(col("id"), col("label"), col("predLabel"))
      .agg(sum(col("weight")).as("votes"))
      .withColumn("rn", row_number().over(byCount))
      .filter(col("rn") === 1)
      .select(col("id"), col("label"), col("predLabel").as("pred"))
  }

  /** Accuracy of (label, pred) rows over a known total (unpredicted rows
    * count as wrong, as in the reference's null labels).
    */
  def accuracy(preds: DataFrame, total: Long): Double = {
    val correct = preds.filter(col("pred") === col("label")).count()
    correct.toDouble / total
  }
}

/** The BOSS window-grid ensemble (M1): fit all (norm, windowLength)
  * configurations, sweep word length f by leave-one-out 1-NN on the train
  * bags, keep models within `factor` of the best train score, predict by
  * weighted vote.
  */
class BossEnsemble(cfg: Boss.Config = Boss.Config()) {
  import Boss._

  private def usedBits = Words.binlog(cfg.alphabetSize)

  /** Fit on (id LONG, label DOUBLE, data ARRAY<DOUBLE>). */
  def fit(train: DataFrame)(implicit spark: SparkSession): EnsembleModel = {
    val trainCount = train.count()
    // fixture-scale fits drop AQE/auto-broadcast to stay few-job
    graft.util.Pipelines.smallFitScope(spark, trainCount) { fitBody(train, trainCount) }
  }

  private def fitBody(train: DataFrame, trainCount: Long)(
      implicit spark: SparkSession): EnsembleModel = {
    val maxLen = train.select(max(size(col("data")))).head.getInt(0)
    val maxW = math.min(maxLen, cfg.maxWindowLength)
    val windows = (cfg.minWindowLength to maxW).toSeq

    val models = fitBinsGrid(train, windows, cfg.normalization, cfg.maxF, cfg.alphabetSize)
    val words = slidingWordsGrid(train, models, cfg.maxF).cache()
    words.count() // materialize once; reused for every f

    // f-sweep: LOO per-sample predictions per (norm, w, f) — ONE batched
    // job over the f-tagged union instead of a job chain per f value.
    // Cached: the ensemble vote below reuses these rows instead of
    // re-running the whole 1-NN join on the selected configs.
    val fValues = (cfg.minF to cfg.maxF by 2).toSeq
    val allBags = fValues
      .map(f => bagsAt(words, f, usedBits).withColumn("f", lit(f)))
      .reduce(_ unionByName _)
    val looAll = nn1(allBags, allBags, keys = Seq("norm", "w", "f")).cache()
    val scores: Map[(Boolean, Int, Int), Long] =
      looAll
        .filter(col("predLabel") === col("label"))
        .groupBy(col("norm"), col("w"), col("f")).agg(count(lit(1)).as("correct"))
        .collect()
        .map(r => (r.getBoolean(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
        .toMap

    // per config: the reference scans f ascending and keeps the first
    // strictly-better score → smallest f among the maxima.
    val perCfg: Map[(Boolean, Int), (Int, Long)] =
      models.keys.map { case (n, w) =>
        val byF = fValues.map(f => (f, scores.getOrElse((n, w, f), 0L)))
        val best = byF.maxBy(_._2)._2
        val bestF = byF.collectFirst { case (f, c) if c == best => f }.get
        (n, w) -> (bestF, best)
      }.toMap

    // per norm: ensemble = configs within factor of the best train score
    val candidates: Map[Boolean, Seq[WindowModel]] = cfg.normalization.map { n =>
      val ofNorm = perCfg.collect { case ((`n`, w), (f, c)) => WindowModel(n, w, f, c, models((n, w))) }.toSeq
      val best = if (ofNorm.isEmpty) 0L else ofNorm.map(_.trainCorrect).max
      n -> ofNorm.filter(_.trainCorrect >= best * cfg.factor)
        .sortBy(m => (-m.trainCorrect, -m.windowLength))
    }.toMap

    // evaluate each norm's ensemble by its weighted vote on train: the
    // per-sample LOO predictions at each model's own f are already in
    // the cached sweep result — select them, attach weights, vote.
    def looPreds(ms: Seq[WindowModel]): Option[DataFrame] = {
      import spark.implicits._
      if (ms.isEmpty) None
      else {
        val sel = ms.map(m => (m.norm, m.windowLength, m.features, m.trainCorrect))
          .toDF("norm", "w", "f", "weight")
        Some(looAll.join(broadcast(sel), Seq("norm", "w", "f")))
      }
    }

    val evaluated = cfg.normalization.map { n =>
      val correct = looPreds(candidates(n)) match {
        case Some(p) => vote(p).filter(col("pred") === col("label")).count()
        case None => 0L
      }
      (n, candidates(n), correct)
    }
    val (_, ensemble, _) = evaluated.maxBy(_._3)
    looAll.unpersist()

    // persist train bags of the selected models (each at its own f);
    // carry f so predict-side bags can be matched per model.
    val trainBags = bagsByF(words, ensemble).cache()
    trainBags.count()
    words.unpersist()

    EnsembleModel(ensemble, trainBags, trainCount)
  }

  /** Bags for a set of models, one pass per distinct f, tagged with `f`. */
  private def bagsByF(words: DataFrame, ms: Seq[WindowModel])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ms.groupBy(_.features).map { case (f, group) =>
      val sel = group.map(m => (m.norm, m.windowLength)).toDF("norm", "w")
      bagsAt(words.join(broadcast(sel), Seq("norm", "w")), f, usedBits)
        .withColumn("f", lit(f))
    }.reduce(_ unionByName _)
  }

  /** Train-bag rows the predict-side 1-NN may broadcast: the train-bag
    * model table is train-corpus-proportional (the reference's own
    * model shape), so past the ceiling the join falls back to the
    * shuffle plan nn1 already supports.
    */
  private val BroadcastBagMaxRows = 2000000L

  /** Predict labels for (id, label, data) rows → (id, label, pred). */
  def predict(model: EnsembleModel, test: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sfaModels = model.models.map(m => (m.norm, m.windowLength) -> m.sfa).toMap
    val words = slidingWordsGrid(test, sfaModels, cfg.maxF)
    // trainBags is cached by fit — the count gate is cheap
    val bcTrain = model.trainBags.count() <= BroadcastBagMaxRows
    if (!bcTrain)
      System.err.println("[gated] BOSS predict: train bags above broadcast ceiling — shuffle 1-NN join")

    val preds = model.models.groupBy(_.features).map { case (f, group) =>
      val sel = group.map(m => (m.norm, m.windowLength)).toDF("norm", "w")
      val bags = bagsAt(words.join(broadcast(sel), Seq("norm", "w")), f, usedBits)
      val trainB = model.trainBags.filter(col("f") === f).drop("f")
      val wts = group.map(m => (m.norm, m.windowLength, m.trainCorrect))
        .toDF("norm", "w", "weight")
      nn1(bags, trainB, broadcastTrain = bcTrain, excludeSameId = false)
        .join(broadcast(wts), Seq("norm", "w"))
    }.reduce(_ unionByName _)
    vote(preds)
  }

  /** Train + test accuracy, reference `eval` semantics. */
  def eval(train: DataFrame, test: DataFrame)(implicit spark: SparkSession): (EnsembleModel, Double) = {
    val model = fit(train)
    val testCount = test.count()
    val preds = predict(model, test)
    (model, Boss.accuracy(preds, testCount))
  }
}
