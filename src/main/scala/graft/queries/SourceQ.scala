package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.QueryDef
import graft.sfa.{ModelIO, SFAModel, SFAOps}
import graft.ts.Loaders

/** Source/sink queries (SURVEY §2.1): the reference's own file formats
  * read through the Spark loaders, and the columnar model roundtrip.
  * Rows-only — the inputs are the reference's bundled fixtures, not the
  * driver's parquet tables, so no DuckDB oracle runs over them; parsing
  * semantics are asserted against the reference's loaders by
  * LoadersSpec / ModelIOSpec.
  */
object SourceQ {

  private val Base = "/root/reference/src/main/resources/datasets"

  /** S1: UCR archive file → (id, label, len, head). */
  private def s1(s: SparkSession, dir: String): DataFrame =
    Loaders.loadUcr(s, s"$Base/univariate/CBF/CBF_TRAIN")
      .select(col("id"), col("label"), size(col("data")).cast("long").as("len"),
        round(element_at(col("data"), 1), 6).as("head"))
      .orderBy("id")

  /** S2: multivariate file → one row per (sample, dim). */
  private def s2(s: SparkSession, dir: String): DataFrame =
    Loaders.loadMultivariate(s, s"$Base/multivariate/PenDigits/PenDigits_TRAIN3",
      applyZNorm = false)
      .select(col("id"), col("dim"), col("label"), size(col("data")).cast("long").as("len"))
      .orderBy("id", "dim")

  /** S5: whole-file long series (first value per line). */
  private def s5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val data = Loaders.readSampleSubsequenceLocal(s"$Base/indexing/power_data.dat")
    data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("i", "v").orderBy("i")
  }

  /** S6: one query series per line. */
  private def s6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Loaders.readQuerySeriesLocal(s"$Base/indexing/query_lightcurves.txt")
    qs.zipWithIndex.map { case (q, i) => (i.toLong, q.length.toLong, q.head) }.toSeq
      .toDF("qid", "len", "head").orderBy("qid")
  }

  /** S8: SFA quantizer → parquet artifact → reload → emit bins. The fit
    * is the same single-config pipeline as SfaQ; the roundtrip must be
    * lossless (ModelIOSpec asserts exact equality).
    */
  private def s8(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val ser = SFAOps.seriesOf(graft.util.Tables.load(s, dir, "events"))
    val approx = SFAOps.disjointApprox(ser, 16, 8, normMean = false)
    val bins = SFAOps.collectBins(SFAOps.equiDepthBins(approx, 4), 8, 4)
    val model = SFAModel(16, 8, 4, normMean = false, lowerBounding = true,
      applyZNorm = true, bins = bins)
    val path = s"${java.lang.System.getProperty("java.io.tmpdir")}/graft_s8_model"
    ModelIO.saveSFA(model, path)
    val loaded = ModelIO.loadSFA(path)
    import s.implicits._
    (for {
      (row, coef) <- loaded.bins.zipWithIndex.toSeq
      (edge, pos) <- row.zipWithIndex
      if edge != Double.MaxValue
    } yield (coef.toLong, pos.toLong, edge))
      .toDF("coef", "pos", "edge").orderBy("coef", "pos")
  }

  /** S9: a 1-window BOSS ensemble fitted on the events series → columnar
    * classifier artifact → reload → emit the model table. The full
    * multi-window roundtrip is exercised by ModelIOSpec.
    */
  private def s9(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val train = graft.queries.SfaQ.series(s, dir)
      .filter(size(col("data")) >= 16)
      .select(col("user_id").as("id"), (col("user_id") % 3).cast("double").as("label"),
        col("data"))
    val cfg = graft.sfa.Boss.Config(minWindowLength = 16, maxWindowLength = 16,
      maxF = 8, normalization = Seq(false))
    val model = new graft.sfa.BossEnsemble(cfg).fit(train)
    val path = s"${java.lang.System.getProperty("java.io.tmpdir")}/graft_s9_clf"
    ModelIO.saveBossEnsemble(model, path)
    val loaded = ModelIO.loadBossEnsemble(path)
    import s.implicits._
    loaded.models.map(m => (m.norm, m.windowLength.toLong, m.features.toLong, m.trainCorrect))
      .toDF("norm", "w", "features", "train_correct")
      .orderBy("w")
  }

  /** S10: the k-NN corpus persisted partitioned by word prefix (the
    * trie's at-rest layout; prefix pruning ≙ subtree skip), reloaded,
    * per-prefix record counts emitted.
    */
  private def s10(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val corpus = IndexQ.slices(s, dir)
      .filter(col("user_id") % 2 === 0)
      .withColumn("word",
        expr("transform(slice(data, 1, 4), x -> CAST(CASE WHEN x < 0 THEN 0 ELSE 1 END AS INT))"))
      .select(col("user_id").as("id"), col("data"), col("word"))
    val path = s"${java.lang.System.getProperty("java.io.tmpdir")}/graft_s10_index"
    ModelIO.saveIndex(corpus, usedBits = 1, prefixLen = 2, path)
    ModelIO.loadIndex(path)
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prefix")
  }

  val defs: Map[String, QueryDef] = Map(
    "s9_classifier_roundtrip" -> QueryDef.rowsOnly(s9,
      "BOSS ensemble -> columnar artifact -> reload; exact roundtrip " +
        "gate in ModelIOSpec"),
    "s10_index_layout" -> QueryDef.rowsOnly(s10,
      "prefix-partitioned index layout roundtrip; ModelIOSpec/IndexSpec"),
    "s1_ucr_load" -> QueryDef.rowsOnly(s1,
      "UCR loader on the reference's CBF fixture; parsing vs the " +
        "reference loader asserted by LoadersSpec"),
    "s2_mv_load" -> QueryDef.rowsOnly(s2,
      "multivariate loader on the PenDigits fixture; LoadersSpec"),
    "s5_sample_subsequence" -> QueryDef.rowsOnly(s5,
      "whole-file long-series reader on power_data.dat"),
    "s6_query_series" -> QueryDef.rowsOnly(s6,
      "query-series reader on query_lightcurves.txt"),
    "s8_model_roundtrip" -> QueryDef.rowsOnly(s8,
      "SFA quantizer fit → parquet artifact → reload; exact-equality " +
        "gate in ModelIOSpec"))
}
