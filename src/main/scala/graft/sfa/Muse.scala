package graft.sfa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.linalg.Vectors

/** WEASEL+MUSE — the multivariate WEASEL
  * (/root/reference/src/main/java/sfa/transformation/MUSE.java,
  * classification/MUSEClassifier.java).
  *
  * Differences from WEASEL, all replicated here:
  *  - input is long-format multivariate (id, dim, label, data); one
  *    *unsupervised* SFA quantizer per (histogramType, norm, window,
  *    dim) — plain equi-depth/equi-width bins, no ANOVA-F selection;
  *  - z-normalization is OFF throughout (the reference flips the global
  *    `APPLY_Z_NORM`; here that is simply applyZNorm=false and no
  *    window norming), lowerBounding off;
  *  - bag keys carry the dimension: (word2, word, dim, windowIdx)
  *    packed into a long; bigrams (prev, current) only when the largest
  *    window is < 200;
  *  - χ² selection has no top-k cap: the reference zeroes non-selected
  *    counts, which is equivalent to dropping them from the sparse
  *    vectors;
  *  - grid = histogramType × norm × f ∈ {2,4,6}, scored by 10-fold CV
  *    logistic regression (liblinear L2R_LR ↦ MLlib, λ = 1/n).
  *
  * Like [[Weasel]], the quantizers are fitted once per config at maxF
  * and shorter word lengths reuse them by masking — identical math to
  * the reference's per-f refits, without re-transforming.
  */
object Muse {

  final case class Config(
      minF: Int = 2,
      maxF: Int = 6,
      alphabetSize: Int = 4,
      chiLimit: Double = 2.0,
      minWindowLength: Int = 2,
      maxWindowLength: Int = 450,
      bigrams: Boolean = true,
      folds: Int = 10,
      histTypes: Seq[HistogramType] = Seq(HistogramType.EquiDepth, HistogramType.EquiWidth),
      normalization: Seq[Boolean] = Seq(true, false),
      // liblinear-parity OvR by default (see [[LinModel]])
      solver: String = LinModel.Ovr,
      // L-BFGS iteration cap (see Weasel.Config.lrMaxIter): reduced
      // fixture fits cap it low; the default matches liblinear's
      // effectively-unbounded inner loop
      lrMaxIter: Int = 100)

  final case class MuseModel(
      hist: HistogramType,
      norm: Boolean,
      features: Int,
      trainCorrect: Long,
      quantizers: Map[(Int, Int), SFAModel], // (windowLength, dim) → model
      windows: Seq[Int],                     // full fitted grid (w_idx = position)
      selected: DataFrame,                   // (key, dict_idx)
      dictSize: Int,
      lr: LinModel)

  /** Key packing: ((word2·4096 + word)·64 + dim)·512 + w_idx. Bigram and
    * unigram keys collide exactly when the reference's MuseWord would
    * (word2 = 0).
    */
  private val DimBits = 6
  private val WIdxBits = 9
  private val WordBits = 12

  /** Fit bins for every (norm, w, dim) of one histogram type in one
    * aggregation pass (the MUSE fit is unsupervised — labels unused).
    */
  def fitBinsGrid(
      series: DataFrame, // (id, dim, label, data)
      windows: Seq[Int],
      norms: Seq[Boolean],
      hist: HistogramType,
      maxF: Int,
      alphabetSize: Int)(implicit spark: SparkSession): Map[(Boolean, Int, Int), SFAModel] = {
    import spark.implicits._
    val cfgs = norms.flatMap(n => windows.map(w => (n, w))).toDF("norm", "w")
    val disjointApprox = udf { (data: Seq[Double], w: Int, norm: Boolean) =>
      val arr = data.toArray
      // no z-norm of windows (APPLY_Z_NORM off); normMean only drops DC
      val amount = arr.length / w
      Array.tabulate(amount) { i =>
        Fourier.transformWindow(arr, i * w, w, maxF, norm, lowerBounding = false)
          .map(SFA.roundAt(_, 2))
      }
    }
    val orderline = series.crossJoin(cfgs)
      .filter(size(col("data")) >= col("w"))
      .select(col("norm"), col("w"), col("dim"),
        explode(disjointApprox(col("data"), col("w"), col("norm"))).as("approx"))
      .select(col("norm"), col("w"), col("dim"), posexplode(col("approx")).as(Seq("coef", "v")))
    val edgesUdf = udf { (vals: Seq[Double]) =>
      val sorted = vals.sorted.toArray
      hist match {
        case HistogramType.EquiWidth => SFA.equiWidthEdges(sorted, alphabetSize)
        case _                       => SFA.equiDepthEdges(sorted, alphabetSize)
      }
    }
    orderline
      .groupBy("norm", "w", "dim", "coef")
      .agg(edgesUdf(collect_list(col("v"))).as("edges"))
      .groupBy("norm", "w", "dim")
      .agg(sort_array(collect_list(struct(col("coef"), col("edges")))).as("perCoef"))
      .collect()
      .map { r =>
        val bins = Array.fill(maxF)(Array.fill(alphabetSize - 1)(Double.MaxValue))
        r.getSeq[org.apache.spark.sql.Row](3).foreach { pc =>
          bins(pc.getInt(0)) = pc.getSeq[Double](1).toArray
        }
        (r.getBoolean(0), r.getInt(1), r.getInt(2)) ->
          SFAModel(r.getInt(1), maxF, alphabetSize, r.getBoolean(0),
            lowerBounding = false, applyZNorm = false, bins = bins)
      }.toMap
  }

  /** Sliding packed words per (norm, w, dim, id, offset). */
  def wordsGrid(
      series: DataFrame,
      models: Map[(Boolean, Int, Int), SFAModel],
      windowIdx: Map[Int, Int],
      maxF: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(models)
    val cfgs = models.keys.map { case (n, w, _) => (n, w, windowIdx(w)) }.toSeq.distinct
      .toDF("norm", "w", "w_idx")
    val wordsUdf = udf { (data: Seq[Double], norm: Boolean, w: Int, dim: Int) =>
      bc.value.get((norm, w, dim))
        .map(_.transformWindowingWords(data.toArray, maxF))
        .getOrElse(Array.empty[Long])
    }
    series.crossJoin(cfgs)
      .filter(size(col("data")) >= col("w"))
      .select(col("norm"), col("w"), col("w_idx"), col("dim"), col("id"), col("label"),
        posexplode(wordsUdf(col("data"), col("norm"), col("w"), col("dim")))
          .as(Seq("offset", "word")))
  }

  /** MUSE bag keys at word length f: unigrams always, bigrams when the
    * largest window < 200; a window contributes only if w ≥ f
    * (MUSE.java:235-275). Output: (norm, f, id, label, key, cnt).
    */
  def bags(words: DataFrame, f: Int, usedBits: Int, maxWindow: Int, cfg: Config): DataFrame = {
    val m = Words.mask(f, usedBits)
    def pack(word2: org.apache.spark.sql.Column, word: org.apache.spark.sql.Column) =
      shiftleft(shiftleft(shiftleft(word2, WordBits).bitwiseOR(word), DimBits)
        .bitwiseOR(col("dim")), WIdxBits).bitwiseOR(col("w_idx"))
    val eligible = words.filter(col("w") >= f)
      .withColumn("wf", col("word").bitwiseAND(lit(m)))
    val unigrams = eligible.select(col("norm"), col("id"), col("label"),
      pack(lit(0L), col("wf")).as("key"))
    val all =
      if (cfg.bigrams && maxWindow < 200) {
        val prevs = eligible.select(col("norm"), col("w"), col("dim"), col("id"),
          (col("offset") + col("w")).as("offset"), col("wf").as("prevw"))
        val bigrams = eligible
          .join(prevs, Seq("norm", "w", "dim", "id", "offset"))
          .select(col("norm"), col("id"), col("label"),
            pack(col("prevw"), col("wf")).as("key"))
        unigrams.unionByName(bigrams)
      } else unigrams
    all.groupBy("norm", "id", "label", "key")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("f", lit(f))
  }
}

/** The MUSE classifier over long-format (id, dim, label, data) rows. */
class MuseClassifier(cfg: Muse.Config = Muse.Config()) {
  import Muse._

  private val usedBits = Words.binlog(cfg.alphabetSize)

  private def fitLin(vecs: DataFrame, n: Long): LinModel =
    LinModel.fit(cfg.solver, vecs, n, maxIter = cfg.lrMaxIter)

  private def chiFilter(b: DataFrame, nSamples: Long): DataFrame = {
    val presence = b.filter(col("cnt") > 0)
      .select(col("norm"), col("f"), col("key"), col("id"), col("label"))
    val featCount = presence.groupBy("norm", "f", "key").agg(count(lit(1)).as("fc"))
    val obs = presence.groupBy("norm", "f", "key", "label").agg(count(lit(1)).as("obs"))
    val classCount = presence.select("norm", "f", "id", "label").distinct()
      .groupBy("norm", "f", "label").agg(count(lit(1)).as("cc"))
    featCount.join(classCount, Seq("norm", "f"))
      .join(obs, Seq("norm", "f", "key", "label"), "left")
      .na.fill(0L, Seq("obs"))
      .withColumn("expected", col("cc").cast("double") / nSamples * col("fc"))
      .withColumn("chi",
        (col("obs") - col("expected")) * (col("obs") - col("expected")) / col("expected"))
      .groupBy("norm", "f", "key").agg(max("chi").as("chi"))
      .filter(col("chi") >= cfg.chiLimit)
      .select("norm", "f", "key")
  }

  /** `samples` (id, label) = the complete sample set: a sample sharing
    * no selected feature still gets an all-zero vector (LR intercept
    * path) — the reference scores every sample.
    */
  private def vectorsOf(
      b: DataFrame,
      dict: DataFrame,
      dims: Map[(Boolean, Int), Int],
      samples: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val dimsB = spark.sparkContext.broadcast(dims)
    val toVec = udf { (norm: Boolean, f: Int, idx: Seq[Int], cnt: Seq[Long]) =>
      val dim = dimsB.value((norm, f)) + 1
      if (idx == null) Vectors.sparse(dim, Array.empty[Int], Array.empty[Double])
      else {
        val pairs = idx.zip(cnt.map(_.toDouble)).sortBy(_._1)
        Vectors.sparse(dim, pairs.map(_._1).toArray, pairs.map(_._2).toArray)
      }
    }
    samples.select(col("id"), col("label")).distinct()
      .crossJoin(b.select("norm", "f").distinct())
      .join(b.join(dict, Seq("norm", "f", "key"))
        .groupBy("norm", "f", "id", "label")
        .agg(collect_list(col("dict_idx")).as("idx"), collect_list(col("cnt")).as("cnt")),
        Seq("norm", "f", "id", "label"), "left")
      .select(col("norm"), col("f"), col("id"), col("label"),
        toVec(col("norm"), col("f"), col("idx"), col("cnt")).as("features"))
  }

  def fit(train: DataFrame)(implicit spark: SparkSession): MuseModel = {
    val (model, vecs) = fitCore(train)
    vecs.unpersist()
    model
  }

  /** Fit AND return the train-set probabilities (id, label, pred,
    * probs) in one pass — see [[WeaselClassifier.fitWithProba]]; used
    * by the MTEASER per-snapshot loop.
    */
  private[sfa] def fitWithProba(train: DataFrame)(implicit spark: SparkSession): (MuseModel, DataFrame) = {
    val (model, vecs) = fitCore(train)
    val vecToArr = udf { v: org.apache.spark.ml.linalg.Vector => v.toArray }
    val proba = model.lr.transform(vecs)
      .select(col("id"), col("label"), col("prediction").as("pred"),
        vecToArr(col("probability")).as("probs"))
      .localCheckpoint(true)
    vecs.unpersist()
    (model, proba)
  }

  private def fitCore(train: DataFrame)(implicit spark: SparkSession): (MuseModel, DataFrame) = {
    val n = train.select("id").distinct().count()
    // fixture-scale fits drop AQE/auto-broadcast to stay few-job
    graft.util.Pipelines.smallFitScope(spark, n) { fitCoreBody(train, n) }
  }

  private def fitCoreBody(train: DataFrame, n: Long)(
      implicit spark: SparkSession): (MuseModel, DataFrame) = {
    import spark.implicits._
    val maxLen = train.select(max(size(col("data")))).head.getInt(0)

    def windowsFor(norm: Boolean): Seq[Int] = {
      val min = if (norm && cfg.minWindowLength <= 2) math.max(3, cfg.minWindowLength)
      else cfg.minWindowLength
      (min to math.min(maxLen, cfg.maxWindowLength)).toSeq
    }
    val allWindows = windowsFor(false)
    val maxWindow = allWindows.max
    val wIdx = allWindows.zipWithIndex.toMap

    val byLabel = Window.partitionBy("label").orderBy("id")
    val folds = train.select("id", "label").distinct()
      .withColumn("fold", ((row_number().over(byLabel) - 1) % cfg.folds).cast("int"))
      .select("id", "fold")

    var best: (HistogramType, Boolean, Int, Long) =
      (cfg.histTypes.head, cfg.normalization.head, cfg.minF, -1L)
    val fitted = scala.collection.mutable.Map.empty[HistogramType, Map[(Boolean, Int, Int), SFAModel]]

    // CV exists only to pick the winning (hist, norm, f) — with a
    // single candidate the pick is forced, so skip the fold fits and
    // score trainCorrect on the final model instead (reduced configs
    // like the MTEASER slave grid hit this path)
    val singleCandidate =
      cfg.histTypes.size == 1 && cfg.normalization.size == 1 && cfg.minF == cfg.maxF

    for (hist <- cfg.histTypes) {
      val models = fitBinsGrid(train, allWindows, cfg.normalization, hist, cfg.maxF, cfg.alphabetSize)
        .filter { case ((nm, w, _), _) => windowsFor(nm).contains(w) }
      fitted(hist) = models
      val words = wordsGrid(train, models, wIdx, cfg.maxF).cache()
      for (nm <- cfg.normalization; f <- cfg.minF to cfg.maxF by 2 if !singleCandidate) {
        val b = bags(words.filter(col("norm") === nm), f, usedBits, maxWindow, cfg).cache()
        val sel = chiFilter(b, n)
        val byKey = Window.partitionBy("norm", "f").orderBy("key")
        val dict = sel.withColumn("dict_idx", row_number().over(byKey)).cache()
        val dims = dict.groupBy("norm", "f").agg(max("dict_idx").as("d")).collect()
          .map(r => (r.getBoolean(0), r.getInt(1)) -> r.getInt(2)).toMap
        if (dims.nonEmpty) {
          // coalesce before the iterative LR fits: see Pipelines.fitParallelism
          val vecs = vectorsOf(b, dict, dims, train).join(folds, "id")
            .coalesce(graft.util.Pipelines.fitParallelism(n)).cache()
          val correct = (0 until cfg.folds).map { k =>
            val tr = vecs.filter(col("fold") =!= k)
            val te = vecs.filter(col("fold") === k)
            if (tr.isEmpty || te.isEmpty) 0L
            else {
              val mdl = fitLin(tr, n)
              mdl.transform(te).filter(col("prediction") === col("label")).count()
            }
          }.sum
          vecs.unpersist()
          if (correct > best._4) best = (hist, nm, f, correct)
        }
        b.unpersist(); dict.unpersist()
      }
      words.unpersist()
    }

    val (bestHist, bestNorm, bestF, bestCorrect) = best
    val models = fitted(bestHist).filter { case ((nm, _, _), _) => nm == bestNorm }
    val words = wordsGrid(train, models, wIdx, cfg.maxF)
    val fb = bags(words, bestF, usedBits, maxWindow, cfg).cache()
    val sel = chiFilter(fb, n)
    val byKey = Window.partitionBy("norm", "f").orderBy("key")
    val dict = sel.withColumn("dict_idx", row_number().over(byKey)).cache()
    val dims = dict.groupBy("norm", "f").agg(max("dict_idx").as("d")).collect()
      .map(r => (r.getBoolean(0), r.getInt(1)) -> r.getInt(2)).toMap
    val vecs = vectorsOf(fb, dict, dims, train)
      .coalesce(graft.util.Pipelines.fitParallelism(n)).cache()
    val lr = fitLin(vecs, n)
    // single-candidate path skipped CV: trainCorrect = final-model score
    val correct =
      if (!singleCandidate) bestCorrect
      else lr.transform(vecs).filter(col("prediction") === col("label")).count()
    fb.unpersist()

    (MuseModel(bestHist, bestNorm, bestF, correct,
      models.map { case ((_, w, d), m) => (w, d) -> m },
      allWindows,
      dict.select("key", "dict_idx").cache(), dims.getOrElse((bestNorm, bestF), 0), lr), vecs)
  }

  def predict(model: MuseModel, test: DataFrame)(implicit spark: SparkSession): DataFrame =
    predictFull(model, test)
      .select(col("id"), col("label"), col("prediction").as("pred"))

  /** Predict with per-class probabilities → (id, label, pred, probs) —
    * MUSEClassifier.predictProbabilities, consumed by the MTEASER
    * cascade ([[MteaserClassifier]]). `probs` follows MLlib's
    * class-index order (labels are class ids).
    */
  def predictProba(model: MuseModel, test: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val vecToArr = udf { v: org.apache.spark.ml.linalg.Vector => v.toArray }
    predictFull(model, test)
      .select(col("id"), col("label"), col("prediction").as("pred"),
        vecToArr(col("probability")).as("probs"))
  }

  private def predictFull(model: MuseModel, test: DataFrame)(implicit spark: SparkSession): DataFrame = {
    // the w_idx mapping and the bigram maxWindow toggle MUST come from
    // the fitted full grid carried in the model — re-deriving from
    // quantizers.keys compacts indices when fit drops a window and can
    // flip the `maxWindow < 200` bigram decision at the boundary
    val allWindows = model.windows
    val wIdx = allWindows.zipWithIndex.toMap
    val models = model.quantizers.map { case ((w, d), m) => (model.norm, w, d) -> m }
    val words = wordsGrid(test, models, wIdx, cfg.maxF)
    val b = bags(words, model.features, usedBits, allWindows.max, cfg)
    val dim = model.dictSize + 1
    val toVec = udf { (idx: Seq[Int], cnt: Seq[Long]) =>
      if (idx == null) Vectors.sparse(dim, Array.empty[Int], Array.empty[Double])
      else {
        val pairs = idx.zip(cnt.map(_.toDouble)).sortBy(_._1)
        Vectors.sparse(dim, pairs.map(_._1).toArray, pairs.map(_._2).toArray)
      }
    }
    // left-join from ALL test samples: zero-feature samples still get an
    // LR prediction via the intercept (reference behavior)
    val vecs = test.select(col("id"), col("label")).distinct()
      .join(b.join(broadcast(model.selected), Seq("key"))
        .groupBy("id", "label")
        .agg(collect_list(col("dict_idx")).as("idx"), collect_list(col("cnt")).as("cnt")),
        Seq("id", "label"), "left")
      .select(col("id"), col("label"), toVec(col("idx"), col("cnt")).as("features"))
    model.lr.transform(vecs)
  }

  def eval(train: DataFrame, test: DataFrame)(implicit spark: SparkSession): (MuseModel, Double) = {
    val model = fit(train)
    val total = test.select("id").distinct().count()
    val correct = predict(model, test).filter(col("pred") === col("label")).count()
    (model, correct.toDouble / total)
  }
}
