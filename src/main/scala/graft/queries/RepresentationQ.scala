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

  /** Sum-order determinism: `value` is cents-exact, and the PLA weights
    * (t − 2.5, t − 3) are exact halves/integers — so both engines sum
    * the INTEGER quantities Σ(2t−5)·cents and Σ(t−3)·cents (exact,
    * order-independent) and apply identical scalar ops after.
    */
  private def t5(s: SparkSession, dir: String): DataFrame = {
    val seg = windows(s, dir)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("seg", (col("j") / 4).cast("long"))
      .withColumn("t", col("j") % 4 + 1)
      .groupBy("user_id", "win", "seg")
      .agg(sum((col("t") * 2 - 5) * col("cents")).as("isa"),
        sum((col("t") - 3) * col("cents")).as("isb"))
    // folded constants (integer literals → double division in BOTH
    // engines): 12a = 12·(isa/100)/2/(f(f+1)(f−1)) = isa/1000;
    // 6b = 6·(isb/100)/(f(1−f)) = −isb/200, f = 4
    seg.select(col("user_id"), col("win"),
      expr("stack(2, seg * 2, round(isa / 1000, 6)," +
        " seg * 2 + 1, round(-isb / 200, 6)) AS (coef, v)"))
      .orderBy("user_id", "win", "coef")
  }

  private val t5Sql =
    s"""WITH e AS (
      |  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) - 1 AS idx,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events
      |), dw AS (
      |  SELECT user_id, idx // $W AS win, idx % $W AS j, cents
      |  FROM e WHERE idx // $W < n // $W
      |), seg AS (
      |  SELECT user_id, win, j // 4 AS seg,
      |    SUM(((j % 4 + 1) * 2 - 5) * cents) AS isa,
      |    SUM((j % 4 + 1 - 3) * cents) AS isb
      |  FROM dw GROUP BY 1, 2, 3
      |), pla AS (
      |  SELECT user_id, win, seg * 2 AS coef,
      |    ROUND(isa / 1000, 6) AS v
      |  FROM seg
      |  UNION ALL
      |  SELECT user_id, win, seg * 2 + 1 AS coef,
      |    ROUND(-isb / 200, 6) AS v
      |  FROM seg
      |)
      |SELECT user_id, win, coef, v FROM pla ORDER BY user_id, win, coef""".stripMargin

  // ---- T7: Haar DWT ----------------------------------------------------

  private val L = 8

  // Half-block size H and block start per coefficient (levels of the
  // 16-point Haar pyramid); divisor = 16 for the c=0 mean, else H.
  private val Hs = "CASE WHEN coef = 1 THEN 8 WHEN coef < 4 THEN 4 ELSE 2 END"
  private val Base = "CASE WHEN coef < 2 THEN 0 WHEN coef < 4 THEN (coef - 2) * 8 ELSE (coef - 4) * 4 END"
  // Integer weights (±1/0) over integer cents → the sum is exact and
  // order-independent. The Haar values are exact multiples of 1/3200
  // (cents/(100·2H) with H ∈ {1..8}) — they land EXACTLY on decimal
  // rounding boundaries, where Spark (BigDecimal HALF_UP) and DuckDB
  // (float-multiply round) disagree — so the query emits the EXACT
  // integer numerator v3200 = v·3200 = −Σ(cents·w)·(16/H) instead of a
  // rounded double (the integer-cents determinism rule, see QueryDef).
  private val WeightCase =
    s"""CASE WHEN coef = 0 THEN 1
      | WHEN j >= ($Base) AND j < ($Base) + ($Hs) THEN -1
      | WHEN j >= ($Base) + ($Hs) AND j < ($Base) + 2 * ($Hs) THEN 1
      | ELSE 0 END""".stripMargin
  // 3200 / (200·H), with H = 16 for the c = 0 mean (divisor 16·2·100)
  private val FactorCase =
    "CASE WHEN coef = 0 THEN 1 WHEN coef = 1 THEN 2 WHEN coef < 4 THEN 4 ELSE 8 END"

  private def t7(s: SparkSession, dir: String): DataFrame =
    windows(s, dir)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .crossJoin(s.range(L).select(col("id").as("coef")))
      .withColumn("w", expr(WeightCase))
      .groupBy("user_id", "win", "coef")
      .agg(expr(s"-sum(cents * w) * ($FactorCase)").as("v3200"))
      .orderBy("user_id", "win", "coef")

  private val t7Sql =
    s"""WITH e AS (
      |  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) - 1 AS idx,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events
      |), dw AS (
      |  SELECT user_id, idx // $W AS win, idx % $W AS j, cents
      |  FROM e WHERE idx // $W < n // $W
      |), coefs AS (SELECT UNNEST(RANGE($L)) AS coef
      |), wts AS (
      |  SELECT user_id, win, coef, cents,
      |    $WeightCase AS w
      |  FROM dw CROSS JOIN coefs
      |)
      |SELECT user_id, win, coef,
      |  CAST(-SUM(cents * w) * ($FactorCase) AS BIGINT) AS v3200
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
