package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{QueryDef, Tables}
import graft.sfa.Representations

/** Representation-transform queries (SURVEY §2.3 T5/T6/T7) over disjoint
  * 16-point windows of the events series (complete windows only — same
  * `dw` frame as SfaQ's oracle prefix).
  *
  * - t5_pla  → PLA least-squares segments (PLA.java:35-69): 4 segments of
  *   frame 4 per window, stored as (12a, 6b). The grouped-sum form
  *   (Σ(t−constA)x, Σ(t−constB)x) is exactly the reference's loop, so
  *   both engines evaluate the identical expressions → full oracle.
  * - t7_dwt  → Haar DWT (DWT.java:23-48, lifting scheme): the window
  *   length 16 is a power of two, where each Haar coefficient is a
  *   closed-form difference of dyadic block means — coefficient c ≥ 1
  *   with level p = ⌊log2 c⌋, block k = c−2^p of size B = 16/2^p is
  *   −0.5·(mean(second half) − mean(first half)); c = 0 is −0.5·mean.
  *   Both engines evaluate that closed form (the in-place lifting kernel
  *   [[Representations.haarForward]] is proven equal to it by
  *   RepresentationsSpec) → full oracle.
  * - t6_apca → APCA adaptive segments (APCA.java:30-149): the sequential
  *   merge-by-reconstruction-error loop is not SQL-expressible →
  *   rows-only; semantics validated against the reference by
  *   RepresentationsSpec.
  */
object RepresentationQ {

  private val W = 16

  /** (user_id, win, j, t, value): complete disjoint windows, j = offset
    * in window, t = 1-based offset within the PLA segment.
    */
  private def windows(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .withColumn("idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")))
    e.filter(col("idx") / W < floor(col("n") / W))
      .select(col("user_id"), (col("idx") / W).cast("long").as("win"),
        (col("idx") % W).as("j"), col("value"))
  }

  // ---- T5: PLA ---------------------------------------------------------

  private val Frame = 4.0 // 16 points / (l=8 / 2) segments
  private val ConstA = (Frame + 1) / 2.0 // 2.5
  private val ConstB = (2 * Frame + 1) / 3.0 // 3.0

  private def t5(s: SparkSession, dir: String): DataFrame = {
    val seg = windows(s, dir)
      .withColumn("seg", (col("j") / 4).cast("long"))
      .withColumn("t", (col("j") % 4 + 1).cast("double"))
      .groupBy("user_id", "win", "seg")
      .agg(sum((col("t") - ConstA) * col("value")).as("sa"),
        sum((col("t") - ConstB) * col("value")).as("sb"))
    seg.select(col("user_id"), col("win"),
      expr(s"stack(2, seg * 2, round(sa / (${Frame} * (${Frame} + 1) * (${Frame} - 1)) * 12, 6)," +
        s" seg * 2 + 1, round(sb / (${Frame} * (1 - ${Frame})) * 6, 6)) AS (coef, v)"))
      .orderBy("user_id", "win", "coef")
  }

  private val t5Sql =
    s"""WITH e AS (
      |  SELECT user_id, value,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) - 1 AS idx,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events
      |), dw AS (
      |  SELECT user_id, idx // $W AS win, idx % $W AS j, value
      |  FROM e WHERE idx // $W < n // $W
      |), seg AS (
      |  SELECT user_id, win, j // 4 AS seg,
      |    SUM((j % 4 + 1 - $ConstA) * value) AS sa,
      |    SUM((j % 4 + 1 - $ConstB) * value) AS sb
      |  FROM dw GROUP BY 1, 2, 3
      |), pla AS (
      |  SELECT user_id, win, seg * 2 AS coef,
      |    ROUND(sa / ($Frame * ($Frame + 1) * ($Frame - 1)) * 12, 6) AS v
      |  FROM seg
      |  UNION ALL
      |  SELECT user_id, win, seg * 2 + 1 AS coef,
      |    ROUND(sb / ($Frame * (1 - $Frame)) * 6, 6) AS v
      |  FROM seg
      |)
      |SELECT user_id, win, coef, v FROM pla ORDER BY user_id, win, coef""".stripMargin

  // ---- T7: Haar DWT ----------------------------------------------------

  private val L = 8

  // Half-block size H and block start per coefficient (levels of the
  // 16-point Haar pyramid); divisor = 16 for the c=0 mean, else H.
  private val Hs = "CASE WHEN coef = 1 THEN 8 WHEN coef < 4 THEN 4 ELSE 2 END"
  private val Base = "CASE WHEN coef < 2 THEN 0 WHEN coef < 4 THEN (coef - 2) * 8 ELSE (coef - 4) * 4 END"
  private val WeightCase =
    s"""CASE WHEN coef = 0 THEN 1.0
      | WHEN j >= ($Base) AND j < ($Base) + ($Hs) THEN -1.0
      | WHEN j >= ($Base) + ($Hs) AND j < ($Base) + 2 * ($Hs) THEN 1.0
      | ELSE 0.0 END""".stripMargin
  private val DivisorCase = s"CASE WHEN coef = 0 THEN 16.0 ELSE CAST(($Hs) AS DOUBLE) END"

  private def t7(s: SparkSession, dir: String): DataFrame =
    windows(s, dir)
      .crossJoin(s.range(L).select(col("id").as("coef")))
      .withColumn("w", expr(WeightCase))
      .groupBy("user_id", "win", "coef")
      .agg(expr(s"round(-0.5 * sum(value * w) / ($DivisorCase), 6)").as("v"))
      .orderBy("user_id", "win", "coef")

  private val t7Sql =
    s"""WITH e AS (
      |  SELECT user_id, value,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) - 1 AS idx,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events
      |), dw AS (
      |  SELECT user_id, idx // $W AS win, idx % $W AS j, value
      |  FROM e WHERE idx // $W < n // $W
      |), coefs AS (SELECT UNNEST(RANGE($L)) AS coef
      |), wts AS (
      |  SELECT user_id, win, coef, value,
      |    $WeightCase AS w
      |  FROM dw CROSS JOIN coefs
      |)
      |SELECT user_id, win, coef,
      |  ROUND(-0.5 * SUM(value * w) / ($DivisorCase), 6) AS v
      |FROM wts GROUP BY 1, 2, 3 ORDER BY user_id, win, coef""".stripMargin

  // ---- T6: APCA (rows-only) -------------------------------------------

  private def t6(s: SparkSession, dir: String): DataFrame = {
    val apcaUdf = udf { (vals: Seq[Double]) =>
      Representations.apca(vals.toArray, L)
    }
    windows(s, dir)
      .groupBy("user_id", "win")
      .agg(sort_array(collect_list(struct(col("j"), col("value")))).as("pts"))
      .select(col("user_id"), col("win"),
        posexplode(apcaUdf(expr("transform(pts, p -> p.value)"))).as(Seq("i", "v")))
      .select(col("user_id"), col("win"), col("i").cast("long").as("i"), round(col("v"), 6).as("v"))
      .orderBy("user_id", "win", "i")
  }

  val defs: Map[String, QueryDef] = Map(
    "t5_pla" -> QueryDef.sql(t5, t5Sql),
    "t7_dwt" -> QueryDef.sql(t7, t7Sql),
    "t6_apca" -> QueryDef.rowsOnly(t6,
      "APCA adaptive segments; sequential merge loop not SQL-expressible; " +
        "semantics vs reference proven by RepresentationsSpec"))
}
