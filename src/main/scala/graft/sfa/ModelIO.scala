package graft.sfa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model persistence (SURVEY §2.1 S8/S9/S10), re-expressed as columnar
  * artifacts instead of the reference's Java/Kryo serialization
  * (SFA.java:582-599, Classifier.java:748-766, SFATrie.java:946-971):
  *
  *  - an SFA quantizer is a tiny parquet of (coef, pos, edge) rows plus
  *    one metadata row — engine-portable and diffable;
  *  - a fitted BOSS ensemble is a directory with the model table and
  *    the train bags (needed at predict time, like the reference's
  *    `BOSSModel.bag`);
  *  - the k-NN index layout is parquet *partitioned by word prefix* with
  *    columnar min/max stats — the trie's bulk-load design at rest; a
  *    reader prunes partitions by prefix before the LB scan.
  */
object ModelIO {

  // ---- S8: SFA quantizer ---------------------------------------------

  def saveSFA(model: SFAModel, path: String)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    val bins = for {
      (row, coef) <- model.bins.zipWithIndex.toSeq
      (edge, pos) <- row.zipWithIndex
      if edge != Double.MaxValue
    } yield (coef, pos, edge)
    bins.toDF("coef", "pos", "edge").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/bins")
    Seq((model.windowSize, model.wordLength, model.alphabetSize,
      model.normMean, model.lowerBounding, model.applyZNorm))
      .toDF("windowSize", "wordLength", "alphabetSize", "normMean", "lowerBounding", "applyZNorm")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadSFA(path: String)(implicit spark: SparkSession): SFAModel = {
    val meta = spark.read.parquet(s"$path/meta").head
    val wordLength = meta.getInt(1)
    val alpha = meta.getInt(2)
    val bins = Array.fill(wordLength)(Array.fill(alpha - 1)(Double.MaxValue))
    spark.read.parquet(s"$path/bins").collect().foreach { r =>
      bins(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    SFAModel(meta.getInt(0), wordLength, alpha, meta.getBoolean(3),
      meta.getBoolean(4), meta.getBoolean(5), bins)
  }

  // ---- S9: BOSS ensemble ---------------------------------------------

  def saveBossEnsemble(model: Boss.EnsembleModel, path: String)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    model.models.zipWithIndex.foreach { case (m, i) =>
      saveSFA(m.sfa, s"$path/sfa/m$i")
    }
    model.models.zipWithIndex.map { case (m, i) =>
      (i, m.norm, m.windowLength, m.features, m.trainCorrect)
    }.toDF("idx", "norm", "w", "features", "trainCorrect")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/models")
    model.trainBags.write.mode("overwrite").parquet(s"$path/trainBags")
    Seq(model.trainSize).toDF("trainSize")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadBossEnsemble(path: String)(implicit spark: SparkSession): Boss.EnsembleModel = {
    val models = spark.read.parquet(s"$path/models").collect()
      .sortBy(_.getInt(0))
      .map { r =>
        Boss.WindowModel(r.getBoolean(1), r.getInt(2), r.getInt(3), r.getLong(4),
          loadSFA(s"$path/sfa/m${r.getInt(0)}"))
      }.toSeq
    val bags = spark.read.parquet(s"$path/trainBags")
    val trainSize = spark.read.parquet(s"$path/meta").head.getLong(0)
    Boss.EnsembleModel(models, bags, trainSize)
  }

  // ---- S10: k-NN index layout ----------------------------------------

  /** Persist an index corpus partitioned by the word's first `prefixLen`
    * symbols — queries whose LB prune excludes a prefix never read its
    * files (partition pruning ≙ the trie's subtree skip).
    */
  def saveIndex(corpus: DataFrame, usedBits: Int, prefixLen: Int, path: String): Unit = {
    val prefixMask = (1L << (usedBits * prefixLen)) - 1
    corpus
      .withColumn("prefix",
        expr(s"aggregate(slice(word, 1, $prefixLen), 0L, (acc, s) -> acc * ${1 << usedBits} + s)"))
      .write.mode("overwrite").partitionBy("prefix").parquet(path)
  }

  def loadIndex(path: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(path)
}
