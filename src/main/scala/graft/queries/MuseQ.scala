package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Pipelines, QueryDef, Tables}

/** MUSE (multivariate) query surface over a 2-dimension view of the
  * events table (dim = event_id % 2, series key = (user_id, dim) packed
  * as user_id·2 + dim). The full grid classifier is
  * [[graft.sfa.Muse]] (MuseSpec gates it on PenDigits).
  *
  *  - a3_muse_bags → MUSE bag build (MUSE.java:235-275): word keys carry
  *    the dimension (struct(windowIdx, dim, word) — one window ⇒ key =
  *    word·2 + dim), NO numerosity reduction (BOSS-only, P7).
  *  - f8_chi2_zeroing → MUSE's chi² variant (MUSE.java:281-333): counts
  *    of non-selected keys are ZEROED rather than removed — every key
  *    stays in the output with `kept_cnt` = total when selected, 0
  *    otherwise (top-$TopK by (χ², key)).
  */
object MuseQ {

  private val TopK = 30

  private def mtsEvents(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("user_id", col("user_id") * 2 + col("event_id") % 2)

  /** (user_id, dim, key, cnt) — dimension-keyed word bags. Session-cached:
    * a3 and f8 both consume the full MUSE word chain.
    */
  private def bags(s: SparkSession, dir: String): DataFrame =
    Pipelines.cachedDF(s, s"muse.bags:$dir") {
      SfaQ.slidingWordsOf(mtsEvents(s, dir))
        .groupBy(col("user_id"), col("word"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dim", col("user_id") % 2)
        .withColumn("doc", ((col("user_id") - col("dim")) / 2).cast("long"))
        .select(col("doc").as("user_id"), col("dim"),
          (col("word") * 2 + col("dim")).as("key"), col("cnt"))
    }

  private def a3(s: SparkSession, dir: String): DataFrame =
    bags(s, dir).orderBy("user_id", "dim", "key")

  private def f8(s: SparkSession, dir: String): DataFrame = {
    val cell = Pipelines.tracked(s, bags(s, dir)
      .groupBy((col("user_id") % 3).as("cls"), col("key"))
      .agg(sum(col("cnt")).as("obs")))
    cell.count() // materialize: the chi² compose consumes it from
    // concurrently-submitted subtrees, each of which would recompute
    // the word chain against a cold cache
    val wt = cell.groupBy("key").agg(sum(col("obs")).as("wtot"))
    val lt = cell.groupBy("cls").agg(sum(col("obs")).as("ltot"))
    val nt = cell.agg(sum(col("obs")).as("n"))
    val chi = wt.crossJoin(lt).crossJoin(nt)
      .join(cell, Seq("key", "cls"), "left")
      .na.fill(0L, Seq("obs"))
      .withColumn("exp", col("wtot").cast("double") * col("ltot") / col("n"))
      .groupBy("key")
      .agg(max(col("wtot")).as("wtot"),
        sum((col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp")).as("chi2"))
    // Selection boundary instead of a global row_number: an unfiltered
    // rank over the full vocabulary has no WindowGroupLimit rewrite and
    // would sort every key on ONE partition. The boundary row b = the
    // TopK-th key under (chi2 desc, key asc) comes from a distributed
    // TakeOrdered (per-partition heaps, K rows to the driver); a key is
    // selected iff it sorts at-or-before b. With < TopK keys b is the
    // global last row, so everything stays selected — same as rn <= TopK.
    // chiC is materialized once so the boundary and the predicate see
    // bit-identical chi2 values (a re-executed double agg could differ
    // in the last ulp and flip a boundary tie).
    val chiC = Pipelines.tracked(chi.sparkSession, chi)
    chiC.count() // materialize: the broadcast-exchange thread and the main
    // plan would otherwise race to fill the cache from separate executions
    val bound = chiC.orderBy(col("chi2").desc, col("key").asc).limit(TopK)
      .orderBy(col("chi2").asc, col("key").desc).limit(1)
      .select(col("chi2").as("bchi"), col("key").as("bkey"))
    val selected = col("chi2") > col("bchi") ||
      (col("chi2") === col("bchi") && col("key") <= col("bkey"))
    chiC.crossJoin(broadcast(bound))
      .select(col("key"), graft.util.Rnd.jround(col("chi2"), 6).as("chi2"),
        when(selected, col("wtot")).otherwise(0L).as("kept_cnt"))
      .orderBy("key")
  }

  private val mtsChain = (SfaQ.prefix + SfaQ.slidingCtes).replaceFirst(
    "FROM events",
    "FROM (SELECT user_id * 2 + event_id % 2 AS user_id, ts, event_id, value FROM events) mts0")

  private val a3Sql = mtsChain +
    """
      |, mbag AS (
      |  SELECT user_id // 2 AS user_id, user_id % 2 AS dim,
      |    word * 2 + user_id % 2 AS key, COUNT(*) AS cnt
      |  FROM sword GROUP BY 1, 2, 3
      |)
      |SELECT user_id, dim, key, cnt FROM mbag ORDER BY user_id, dim, key""".stripMargin

  private val f8Sql = mtsChain +
    s"""
      |, mbag AS (
      |  SELECT user_id // 2 AS user_id, user_id % 2 AS dim,
      |    word * 2 + user_id % 2 AS key, COUNT(*) AS cnt
      |  FROM sword GROUP BY 1, 2, 3
      |), cellsum AS (
      |  SELECT user_id % 3 AS cls, key, SUM(cnt) AS obs FROM mbag GROUP BY 1, 2
      |), wt AS (SELECT key, SUM(obs) AS wtot FROM cellsum GROUP BY 1
      |), lt AS (SELECT cls, SUM(obs) AS ltot FROM cellsum GROUP BY 1
      |), nt AS (SELECT SUM(obs) AS n FROM cellsum
      |), chi AS (
      |  SELECT w.key, MAX(w.wtot) AS wtot,
      |    SUM((COALESCE(c.obs, 0) - CAST(w.wtot AS DOUBLE) * l.ltot / n.n)
      |      * (COALESCE(c.obs, 0) - CAST(w.wtot AS DOUBLE) * l.ltot / n.n)
      |      / (CAST(w.wtot AS DOUBLE) * l.ltot / n.n)) AS chi2
      |  FROM wt w CROSS JOIN lt l CROSS JOIN nt n
      |  LEFT JOIN cellsum c ON c.key = w.key AND c.cls = l.cls
      |  GROUP BY 1
      |), rk AS (
      |  SELECT key, chi2, wtot,
      |    ROW_NUMBER() OVER (ORDER BY chi2 DESC, key ASC) AS rn
      |  FROM chi
      |)
      |SELECT key, FLOOR(chi2 * 1e6 + 0.5) / 1e6 AS chi2,
      |  CAST(CASE WHEN rn <= $TopK THEN wtot ELSE 0 END AS BIGINT) AS kept_cnt
      |FROM rk ORDER BY key""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "a3_muse_bags" -> QueryDef.sql(a3, a3Sql),
    "f8_chi2_zeroing" -> QueryDef.sql(f8, f8Sql))
}
