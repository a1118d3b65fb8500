package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{QueryDef, Tables}

/** Time-series operators from SURVEY §2.2/§2.3/§2.6, expressed over the
  * `events` table (series key = user_id, time order = (ts, event_id)).
  *
  * Each maps 1:1 onto a reference operator:
  *  - p1_znorm      → TimeSeries.norm            (TimeSeries.java:52-130)
  *  - p3_rolling    → calcIncrementalMeanStddev  (TimeSeries.java:218-248)
  *  - p4_disjoint   → getDisjointSequences       (TimeSeries.java:256-270)
  *  - t4_paa        → PAA.transform              (PAA.java:28-55)
  *  - s4_deriv      → TimeSeriesLoader.getDerivatives (TimeSeriesLoader.java:225-241)
  *  - p7_numerosity → BOSS numerosity reduction  (BOSS.java:132-141)
  *  - s7_cumsum     → generateRandomWalkData shape (TimeSeriesLoader.java:321-332)
  *  - f3_equiwidth + a1_bag → SFA.divideEquiWidthHistogram + BOSS bag
  *  - a5_vote       → ensemble majority vote     (Classifier.java:569-615)
  *
  * All are single-shuffle plans: one hash partition by user_id, then
  * window/aggregate work stays partition-local. At 100 TB the series key
  * has high cardinality, so the shuffle is well balanced; none of these
  * collect to the driver.
  */
object TimeSeriesQ {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("cents", round(col("value") * 100).cast("long"))

  private val tsOrder = Seq(col("ts"), col("event_id"))

  /** P1: per-series z-normalisation. mean/std from exact integer sums so the
    * result is bit-identical to the SQL oracle. std==0 ⇒ x−mean (reference
    * semantics, TimeSeries.java:118-127).
    */
  private def znorm(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    events(s, dir)
      .withColumn("sc", sum("cents").over(w))
      .withColumn("ssq", sum(col("cents") * col("cents")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("mean", col("sc") / col("n") / 100.0)
      .withColumn("ex2", col("ssq") / col("n") / 10000.0)
      .withColumn("std", sqrt(greatest(col("ex2") - col("mean") * col("mean"), lit(0.0))))
      .withColumn("z", graft.util.Rnd.jround(
        when(col("std") > 0, (col("value") - col("mean")) / col("std"))
          .otherwise(col("value") - col("mean")), 6))
      .select("event_id", "user_id", "z")
      .orderBy("event_id")
  }

  private val znormSql =
    """WITH e AS (
      |  SELECT event_id, user_id, value, CAST(ROUND(value*100) AS BIGINT) AS cents FROM events
      |), st AS (
      |  SELECT *,
      |    CAST(SUM(cents) OVER (PARTITION BY user_id) AS BIGINT) AS sc,
      |    CAST(SUM(cents*cents) OVER (PARTITION BY user_id) AS BIGINT) AS ssq,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM e
      |), m AS (
      |  SELECT *, sc/n/100.0 AS mean, ssq/n/10000.0 AS ex2 FROM st
      |), sd AS (
      |  SELECT *, SQRT(GREATEST(ex2 - mean*mean, 0.0)) AS std FROM m
      |)
      |SELECT event_id, user_id,
      |  FLOOR((CASE WHEN std > 0 THEN (value-mean)/std ELSE value-mean END) * 1e6 + 0.5) / 1e6 AS z
      |FROM sd ORDER BY event_id""".stripMargin

  /** P3: rolling mean/std over the w=8 window STARTING at each row —
    * exactly the reference's per-offset window stats. Catalyst's sliding
    * frame is the direct analogue of the O(n) incremental loop.
    */
  private def rolling(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsOrder: _*)
      .rowsBetween(Window.currentRow, 7)
    events(s, dir)
      .withColumn("sc", sum("cents").over(w))
      .withColumn("ssq", sum(col("cents") * col("cents")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rmean", graft.util.Rnd.jround(col("sc") / col("n") / 100.0, 6))
      .withColumn("ex2", col("ssq") / col("n") / 10000.0)
      .withColumn("m", col("sc") / col("n") / 100.0)
      .withColumn("rstd", graft.util.Rnd.jround(sqrt(greatest(col("ex2") - col("m") * col("m"), lit(0.0))), 6))
      .select("event_id", "user_id", "rmean", "rstd")
      .orderBy("event_id")
  }

  private val rollingSql =
    """WITH e AS (
      |  SELECT event_id, user_id, ts, CAST(ROUND(value*100) AS BIGINT) AS cents FROM events
      |), st AS (
      |  SELECT event_id, user_id,
      |    CAST(SUM(cents) OVER win AS BIGINT) AS sc,
      |    CAST(SUM(cents*cents) OVER win AS BIGINT) AS ssq,
      |    COUNT(*) OVER win AS n
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
      |)
      |SELECT event_id, user_id,
      |  FLOOR(sc/n/100.0 * 1e6 + 0.5) / 1e6 AS rmean,
      |  FLOOR(SQRT(GREATEST(ssq/n/10000.0 - (sc/n/100.0)*(sc/n/100.0), 0.0)) * 1e6 + 0.5) / 1e6 AS rstd
      |FROM st ORDER BY event_id""".stripMargin

  /** P4: disjoint windows of length 16 (quantizer-training sampling). */
  private def disjoint(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsOrder: _*)
    events(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("win", expr("(rn - 1) div 16"))
      .groupBy("user_id", "win")
      .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
      .withColumn("wmean", graft.util.Rnd.jround(col("sc") / col("n") / 100.0, 6))
      .drop("sc")
      .orderBy("user_id", "win")
  }

  private val disjointSql =
    """WITH e AS (
      |  SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
      |  FROM events
      |)
      |SELECT user_id, (rn-1)//16 AS win, COUNT(*) AS n,
      |  FLOOR(CAST(SUM(cents) AS BIGINT)/COUNT(*)/100.0 * 1e6 + 0.5) / 1e6 AS wmean
      |FROM e GROUP BY 1, 2 ORDER BY user_id, win""".stripMargin

  /** T4: PAA with l=8 segments per series — segment index by the reference's
    * integer mapping i*l/n (PAA.java:35-46).
    */
  private def paa(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsOrder: _*)
    val cw = Window.partitionBy("user_id")
    events(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(cw))
      .withColumn("seg", expr("((rn - 1) * 8) div cnt"))
      .groupBy("user_id", "seg")
      .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
      .withColumn("segmean", graft.util.Rnd.jround(col("sc") / col("n") / 100.0, 6))
      .select("user_id", "seg", "segmean")
      .orderBy("user_id", "seg")
  }

  private val paaSql =
    """WITH e AS (
      |  SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS cnt
      |  FROM events
      |)
      |SELECT user_id, ((rn-1)*8)//cnt AS seg,
      |  FLOOR(CAST(SUM(cents) AS BIGINT)/COUNT(*)/100.0 * 1e6 + 0.5) / 1e6 AS segmean
      |FROM e GROUP BY 1, 2 ORDER BY user_id, seg""".stripMargin

  /** S4: derivative channel |x[i] − x[i−1]|. */
  private def deriv(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsOrder: _*)
    events(s, dir)
      .withColumn("prev", lag("value", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("d", graft.util.Rnd.jround(abs(col("value") - col("prev")), 6))
      .select("event_id", "user_id", "d")
      .orderBy("event_id")
  }

  private val derivSql =
    """SELECT event_id, user_id, FLOOR(ABS(value - prev) * 1e6 + 0.5) / 1e6 AS d FROM (
      |  SELECT event_id, user_id, value,
      |    LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events) t
      |WHERE prev IS NOT NULL ORDER BY event_id""".stripMargin

  /** P7: numerosity reduction — drop an event if its type equals the
    * previous one in the same series; count the survivors per type.
    */
  private def numerosity(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsOrder: _*)
    events(s, dir)
      .withColumn("prevType", lag("event_type", 1).over(w))
      .filter(col("prevType").isNull || col("prevType") =!= col("event_type"))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("kept"))
      .orderBy("user_id", "event_type")
  }

  private val numerositySql =
    """SELECT user_id, event_type, COUNT(*) AS kept FROM (
      |  SELECT user_id, event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events) t
      |WHERE prev IS NULL OR prev <> event_type
      |GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin

  /** S7: running (random-walk-style) cumulative sum — exact integer cents. */
  private def cumsum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("cum_c", sum("cents").over(w))
      .select("event_id", "user_id", "cum_c")
      .orderBy("event_id")
  }

  private val cumsumSql =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
      |FROM events ORDER BY event_id""".stripMargin

  /** F3 + T8: global equi-width binning into α=8 symbols, then quantize.
    * Mirrors SFA.divideEquiWidthHistogram + quantization lookup. min/max are
    * order-independent, so the symbol is bit-deterministic.
    */
  private def equiwidthSym(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val mm = e.agg(min("value").as("mn"), max("value").as("mx"))
    e.crossJoin(broadcast(mm))
      .withColumn("sym",
        least(lit(7L), floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / 8.0))).cast("long"))
      .select("event_id", "user_id", "sym")
      .orderBy("event_id")
  }

  private val equiwidthSql =
    """WITH mm AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events)
      |SELECT event_id, user_id,
      |  CAST(LEAST(7, CAST(FLOOR((value-mn)/((mx-mn)/8.0)) AS BIGINT)) AS BIGINT) AS sym
      |FROM events, mm ORDER BY event_id""".stripMargin

  /** A1: bag-of-patterns — count quantized symbols per series. */
  private def bag(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val mm = e.agg(min("value").as("mn"), max("value").as("mx"))
    e.crossJoin(broadcast(mm))
      .withColumn("sym",
        least(lit(7L), floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / 8.0))).cast("long"))
      .groupBy("user_id", "sym")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("user_id", "sym")
  }

  private val bagSql =
    """WITH mm AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events)
      |SELECT user_id,
      |  CAST(LEAST(7, CAST(FLOOR((value-mn)/((mx-mn)/8.0)) AS BIGINT)) AS BIGINT) AS sym,
      |  COUNT(*) AS cnt
      |FROM events, mm GROUP BY 1, 2 ORDER BY user_id, sym""".stripMargin

  /** A5: majority vote per series over event_type "predictions"; reference
    * tie-break = larger label wins (Classifier.java:596-597) → DESC type.
    */
  private def vote(s: SparkSession, dir: String): DataFrame = {
    val counts = events(s, dir).groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user_id").orderBy(desc("cnt"), desc("event_type"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("winner"), col("cnt"))
      .orderBy("user_id")
  }

  private val voteSql =
    """SELECT user_id, event_type AS winner, cnt FROM (
      |  SELECT user_id, event_type, COUNT(*) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type DESC) AS rn
      |  FROM events GROUP BY 1, 2) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "p1_znorm" -> QueryDef.sql(znorm, znormSql),
    "p3_rolling_stats" -> QueryDef.sql(rolling, rollingSql),
    "p4_disjoint_windows" -> QueryDef.sql(disjoint, disjointSql),
    "t4_paa" -> QueryDef.sql(paa, paaSql),
    "s4_derivative" -> QueryDef.sql(deriv, derivSql),
    "p7_numerosity" -> QueryDef.sql(numerosity, numerositySql),
    "s7_cumsum_walk" -> QueryDef.sql(cumsum, cumsumSql),
    "f3_equiwidth_quantize" -> QueryDef.sql(equiwidthSym, equiwidthSql),
    "a1_bag_of_patterns" -> QueryDef.sql(bag, bagSql),
    "a5_majority_vote" -> QueryDef.sql(vote, voteSql))
}
