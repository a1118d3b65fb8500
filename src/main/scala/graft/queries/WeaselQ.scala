package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Pipelines, QueryDef}

/** WEASEL feature-space queries (SURVEY §2.4/§2.6/§2.7) over the events
  * series' sliding SFA words (single config, see [[SfaQ]]). The full
  * grid/CV classifier lives in [[graft.sfa.Weasel]] (golden-gated by
  * WeaselGoldenSpec); these expose the operator shapes through the
  * driver's oracle contract.
  *
  *  - a2_bigram_bags → WEASEL uni+bigram bag (WEASEL.java:142-215):
  *    unigram key = word << (binlog(maxWindowLen)+1) | windowIdx (one
  *    window ⇒ idx 0), bigram key = prevWord << 32 | unigramKey with
  *    prev at offset − windowLength; no numerosity reduction.
  *  - o4_feature_cap → χ² top-k cap split by uni/bigram
  *    (WEASEL.java:287-324): the reference caps 10000+10000; scaled to
  *    20+20 at test SF. Expected counts computed in DOUBLE (wtot·ltot
  *    at 100 TB overflows int64).
  *  - f9_word_dict → dense feature ids over the selected keys
  *    (WEASEL.java:497-543): dictionary = row_number over sorted keys.
  *  - f12_logreg_score → MLlib multinomial LogisticRegression on the
  *    capped dictionary features, even users train / odd test
  *    (Classifier.java:355-430, liblinear → MLlib; J3 scoring =
  *    model.transform). Rows-only: the trained-model path has no SQL
  *    oracle; the real classifier is golden-gated on CBF.
  */
object WeaselQ {

  private val WinLen = 16
  private val UniShift = 32L // 1 << (binlog(16) + 1)
  private val BigShift = 4294967296L // 1 << 32
  private val TopK = 20

  /** (user_id, key, cnt) uni+bigram bags. The sliding-words input is
    * cached — it feeds both the unigram and bigram branches.
    */
  private def bags(s: SparkSession, dir: String): DataFrame =
    Pipelines.cachedDF(s, s"weasel.bags:$dir") {
    val words = SfaQ.slidingWords(s, dir)
    val byWin = Window.partitionBy("user_id").orderBy("win")
    val uni = words.select(col("user_id"), (col("word") * UniShift).as("key"))
    val big = words
      .withColumn("prev", lag(col("word"), WinLen).over(byWin))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), (col("prev") * BigShift + col("word") * UniShift).as("key"))
    uni.unionByName(big)
      .groupBy("user_id", "key")
      .agg(count(lit(1)).as("cnt"))
    }

  private def a2(s: SparkSession, dir: String): DataFrame =
    bags(s, dir).orderBy("user_id", "key")

  /** (key, is_bigram, chi2, rn): χ² of key counts vs class (user_id%3),
    * zero cells included, top-$TopK per uni/bigram partition.
    */
  private def chiRanked(s: SparkSession, dir: String): DataFrame =
    chiRankedFrom(bags(s, dir))

  /** `cell` is cached: wt / lt / nt / the join all consume it — without
    * the cache each consumer re-runs the whole sliding-words pipeline.
    */
  private def chiRankedFrom(bagsDF: DataFrame): DataFrame = {
    val cell = bagsDF
      .groupBy((col("user_id") % 3).as("cls"), col("key"))
      .agg(sum(col("cnt")).as("obs"))
      .cache()
    cell.count() // materialize before the concurrently-submitted chi² subtrees
    val wt = cell.groupBy("key").agg(sum(col("obs")).as("wtot"))
    val lt = cell.groupBy("cls").agg(sum(col("obs")).as("ltot"))
    val nt = cell.agg(sum(col("obs")).as("n"))
    val chi = wt.crossJoin(lt).crossJoin(nt)
      .join(cell, Seq("key", "cls"), "left")
      .na.fill(0L, Seq("obs"))
      .withColumn("exp", col("wtot").cast("double") * col("ltot") / col("n"))
      .groupBy("key")
      .agg(sum((col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp")).as("chi2"))
    val isBig = when(col("key") >= BigShift, 1L).otherwise(0L)
    chi.withColumn("is_bigram", isBig)
      .withColumn("rn", row_number()
        .over(Window.partitionBy("is_bigram").orderBy(col("chi2").desc, col("key").asc))
        .cast("long"))
      .filter(col("rn") <= TopK)
  }

  private def o4(s: SparkSession, dir: String): DataFrame =
    chiRanked(s, dir)
      .select(col("key"), col("is_bigram"), graft.util.Rnd.jround(col("chi2"), 6).as("chi2"), col("rn"))
      .orderBy("key")

  private def f9(s: SparkSession, dir: String): DataFrame =
    chiRanked(s, dir)
      .select(col("key"))
      .withColumn("fid", row_number().over(Window.orderBy("key")).cast("long"))
      .orderBy("key")

  private def f12(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val bagsDF = bags(s, dir)
    val dict = chiRankedFrom(bagsDF)
      .select(col("key"))
      .withColumn("fid", row_number().over(Window.orderBy("key")).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1).toInt - 1)).toMap
    val dim = dict.size
    val bc = s.sparkContext.broadcast(dict)
    val vecUdf = udf { (keys: Seq[Long], cnts: Seq[Long]) =>
      val pairs = keys.zip(cnts)
        .flatMap { case (k, c) => bc.value.get(k).map(_ -> c.toDouble) }
        .sortBy(_._1)
      Vectors.sparse(dim, pairs.map(_._1).toArray, pairs.map(_._2).toArray)
    }
    // the vector table is tiny (one row per series); collapse it to a
    // few partitions so each L-BFGS iteration's treeAggregate doesn't
    // pay 32-task scheduling overhead — at real scale the partition
    // count follows the data and this coalesce is a no-op cost-wise
    val feat = bagsDF
      .groupBy("user_id")
      .agg(collect_list(col("key")).as("ks"), collect_list(col("cnt")).as("cs"))
      .withColumn("features", vecUdf(col("ks"), col("cs")))
      .withColumn("label", (col("user_id") % 3).cast("double"))
      .coalesce(4)
    val train = feat.filter(col("user_id") % 2 === 0)
    val test = feat.filter(col("user_id") % 2 === 1)
    val lr = new LogisticRegression()
      .setFamily("multinomial").setMaxIter(30).setRegParam(0.01).setTol(1e-6)
    lr.fit(train).transform(test)
      .select(col("user_id").as("test_id"), col("prediction").cast("long").as("pred"))
      .orderBy("test_id")
  }

  // ---- DuckDB oracles --------------------------------------------------

  private val bagCtes =
    s""", uni AS (SELECT user_id, win, word * $UniShift AS key FROM sword
      |), big AS (
      |  SELECT user_id, win,
      |    LAG(word, $WinLen) OVER (PARTITION BY user_id ORDER BY win) * $BigShift
      |      + word * $UniShift AS key
      |  FROM sword
      |), wbag AS (
      |  SELECT user_id, key, COUNT(*) AS cnt FROM (
      |    SELECT user_id, key FROM uni
      |    UNION ALL
      |    SELECT user_id, key FROM big WHERE key IS NOT NULL) u
      |  GROUP BY 1, 2
      |)""".stripMargin

  private val chiCtes =
    s""", cellsum AS (
      |  SELECT user_id % 3 AS cls, key, SUM(cnt) AS obs FROM wbag GROUP BY 1, 2
      |), wt AS (SELECT key, SUM(obs) AS wtot FROM cellsum GROUP BY 1
      |), lt AS (SELECT cls, SUM(obs) AS ltot FROM cellsum GROUP BY 1
      |), nt AS (SELECT SUM(obs) AS n FROM cellsum
      |), chi AS (
      |  SELECT w.key,
      |    SUM((COALESCE(c.obs, 0) - CAST(w.wtot AS DOUBLE) * l.ltot / n.n)
      |      * (COALESCE(c.obs, 0) - CAST(w.wtot AS DOUBLE) * l.ltot / n.n)
      |      / (CAST(w.wtot AS DOUBLE) * l.ltot / n.n)) AS chi2
      |  FROM wt w CROSS JOIN lt l CROSS JOIN nt n
      |  LEFT JOIN cellsum c ON c.key = w.key AND c.cls = l.cls
      |  GROUP BY 1
      |), ranked AS (
      |  SELECT key, CASE WHEN key >= $BigShift THEN 1 ELSE 0 END AS is_bigram, chi2,
      |    CAST(ROW_NUMBER() OVER (
      |      PARTITION BY (CASE WHEN key >= $BigShift THEN 1 ELSE 0 END)
      |      ORDER BY chi2 DESC, key) AS BIGINT) AS rn
      |  FROM chi
      |)""".stripMargin

  private val a2Sql = SfaQ.prefix + SfaQ.slidingCtes + bagCtes +
    "\nSELECT user_id, key, cnt FROM wbag ORDER BY user_id, key"

  private val o4Sql = SfaQ.prefix + SfaQ.slidingCtes + bagCtes + chiCtes +
    s"""
      |SELECT key, CAST(is_bigram AS BIGINT) AS is_bigram, FLOOR(chi2 * 1e6 + 0.5) / 1e6 AS chi2, rn
      |FROM ranked WHERE rn <= $TopK ORDER BY key""".stripMargin

  private val f9Sql = SfaQ.prefix + SfaQ.slidingCtes + bagCtes + chiCtes +
    s"""
      |SELECT key, CAST(ROW_NUMBER() OVER (ORDER BY key) AS BIGINT) AS fid
      |FROM (SELECT key FROM ranked WHERE rn <= $TopK) s ORDER BY key""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "a2_bigram_bags" -> QueryDef.sql(a2, a2Sql),
    "o4_feature_cap" -> QueryDef.sql(o4, o4Sql),
    "f9_word_dict" -> QueryDef.sql(f9, f9Sql),
    "f12_logreg_score" -> QueryDef.rowsOnly(f12,
      "MLlib multinomial LR on capped dictionary features (F12+J3); " +
        "real classifier golden-gated by WeaselGoldenSpec"))
}
