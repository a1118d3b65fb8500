package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{QueryDef, Tables}

/** Temporal joins over the events stream — the two join shapes Spark's
  * built-in operators don't provide directly and a naive formulation
  * turns into a per-key range cross join:
  *
  *  - **as-of join** (`evt_asof_join`): each click matched to the same
  *    user's latest error at-or-before it. Implemented as the
  *    union-and-carry-forward composition: tag both sides, ONE shuffle
  *    on user_id, one sort by (ts, side), and a running `last(…,
  *    ignoreNulls)` window carries the most recent error onto every
  *    click — O(n log n) per key, no range explosion, the plan a
  *    dedicated as-of operator would produce. The oracle is DuckDB's
  *    NATIVE `ASOF LEFT JOIN` — an entirely independent implementation
  *    of the semantics.
  *  - **bounded range join** (`evt_range_join`): every (click, error)
  *    pair of the same user with the error inside the 6-hour window
  *    before the click. Interval bucketing: both sides key on
  *    (user_id, ts-bucket of the window width), clicks probe their own
  *    and the previous bucket, one equi-join shuffle + a residual
  *    filter — bounded 2× fan-out instead of a range cross join.
  *
  * Timestamps: the parquet column is TIMESTAMP(MICROS); Spark reads it
  * as TIMESTAMP_NTZ and the UTC session pins its epoch, so
  * `unix_micros(cast(ts))` ≡ DuckDB's `epoch_us(ts)` exactly and gaps
  * are exact integer microseconds.
  *
  * Ties are pinned: errors sharing (user_id, ts) resolve to the largest
  * event_id — the Spark side orders the carry-forward by (ts, prio,
  * err_id), the oracle dedups to MAX(event_id) before its ASOF (whose
  * pick among equal keys is otherwise arbitrary) — and a click at
  * exactly the error's ts matches it (at-or-before) in both engines.
  */
object EventJoins {

  /** Range-join window width: 6 hours in microseconds — sized so the
    * fixture's ~11 h inter-event spacing still yields a few hundred
    * pairs; the bucketing cost shape is width-independent.
    */
  private val WindowUs = 21600000000L

  /** Events with `tsus` = exact epoch microseconds (UTC session). */
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("tsus", unix_micros(col("ts").cast("timestamp")))
      .drop("ts")

  private[graft] def asofOf(ev: DataFrame): DataFrame = {
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("tsus"), lit(0).as("prio"),
        col("event_id").as("err_id"), lit(null).cast("long").as("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tsus"), lit(1).as("prio"),
        lit(null).cast("long").as("err_id"), col("event_id"))
    // sort order IS the tie rule: errors before clicks at equal ts
    // (at-or-before matches), errors at equal ts ascending by id so the
    // carry-forward keeps the largest — no pre-dedup shuffle needed;
    // the whole join is ONE hash exchange on user_id (spec-asserted)
    val w = Window.partitionBy("user_id").orderBy(col("tsus"), col("prio"), col("err_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    errs.unionByName(clicks)
      .withColumn("m_err", last("err_id", ignoreNulls = true).over(w))
      .withColumn("m_ts", last(when(col("prio") === 0, col("tsus")), ignoreNulls = true).over(w))
      .filter(col("prio") === 1)
      .select(col("event_id"), col("user_id"), col("m_err").as("err_id"),
        (col("tsus") - col("m_ts")).as("gap_us"))
      .orderBy("event_id")
  }

  private def asofJoin(s: SparkSession, dir: String): DataFrame =
    asofOf(events(s, dir))

  private val asofSql =
    """WITH errs AS (
      |  SELECT user_id, ts, MAX(event_id) AS err_id
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
      |), clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
      |)
      |SELECT c.event_id, c.user_id, e.err_id,
      |  CAST(epoch_us(c.ts) - epoch_us(e.ts) AS BIGINT) AS gap_us
      |FROM clicks c ASOF LEFT JOIN errs e
      |  ON c.user_id = e.user_id AND c.ts >= e.ts
      |ORDER BY c.event_id""".stripMargin

  private[queries] def rangeOf(ev: DataFrame): DataFrame = {
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("tsus").as("ets"), col("event_id").as("err_id"))
      .withColumn("bkt", call_function("div", col("ets"), lit(WindowUs)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tsus").as("cts"), col("event_id"))
      .withColumn("bkt", explode(array(
        call_function("div", col("cts"), lit(WindowUs)),
        call_function("div", col("cts"), lit(WindowUs)) - 1)))
    clicks.join(errs, Seq("user_id", "bkt"))
      .withColumn("gap_us", col("cts") - col("ets"))
      .filter(col("gap_us") >= 0 && col("gap_us") < WindowUs)
      .select("event_id", "err_id", "gap_us")
      .orderBy("event_id", "err_id")
  }

  private def rangeJoin(s: SparkSession, dir: String): DataFrame =
    rangeOf(events(s, dir))

  private val rangeSql =
    s"""SELECT c.event_id, e.event_id AS err_id,
      |  CAST(epoch_us(c.ts) - epoch_us(e.ts) AS BIGINT) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON c.user_id = e.user_id
      | AND epoch_us(c.ts) - epoch_us(e.ts) >= 0
      | AND epoch_us(c.ts) - epoch_us(e.ts) < $WindowUs
      |ORDER BY 1, 2""".stripMargin

  /** Sessionization inactivity gap: 12 h in microseconds (sized to the
    * fixture's ~11 h mean inter-event spacing → ~3 events/session).
    */
  private[queries] val SessionGapUs = 43200000000L

  /** Gap-based sessionization: a session breaks where the same user's
    * inter-event gap exceeds $SessionGapUs. The classic two-window
    * composition — lag() marks session starts, a running sum numbers
    * them — then one aggregation rolls sessions up. All three steps
    * cluster on user_id, so the whole query is ONE hash exchange
    * (the aggregation keys (user_id, sess) are a superset of the window
    * partitioning, which Spark's ClusteredDistribution accepts without
    * re-shuffling; spec-asserted).
    */
  private[queries] def sessionizeOf(ev: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("tsus"), col("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("gap", col("tsus") - lag("tsus", 1).over(order))
      .withColumn("brk", when(col("gap").isNull || col("gap") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("sess", sum("brk").over(run))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        (max("tsus") - min("tsus")).as("duration_us"),
        min("event_id").as("first_event"))
      .orderBy("user_id", "sess")
  }

  private def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeOf(events(s, dir))

  private val sessionizeSql =
    s"""WITH o AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tsus,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), marked AS (
      |  SELECT user_id, event_id, tsus,
      |    CAST(SUM(CASE WHEN gap IS NULL OR gap > $SessionGapUs THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY tsus, event_id
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
      |  FROM o)
      |SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(tsus) - MIN(tsus) AS BIGINT) AS duration_us,
      |  MIN(event_id) AS first_event
      |FROM marked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Funnel step deadline: each next step must land within 24 h of the
    * previous one (unbounded, the dense fixture converts ~everyone).
    */
  private val FunnelWindowUs = 86400000000L

  /** Ordered conversion funnel view → click → purchase: step n's
    * timestamp is the user's earliest qualifying event within
    * $FunnelWindowUs of step n−1. Three aggregations, all keyed on
    * user_id — after the first shuffle the cluster-by-user_id
    * partitioning satisfies every later join and aggregation, so the
    * funnel depth adds no exchanges, only passes.
    */
  private[queries] def funnelOf(ev: DataFrame): DataFrame = {
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tsus").as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("tsus") >= col("t1") && col("tsus") < col("t1") + FunnelWindowUs)
      .groupBy("user_id").agg(min("tsus").as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("tsus") >= col("t2") && col("tsus") < col("t2") + FunnelWindowUs)
      .groupBy("user_id").agg(min("tsus").as("t3"))
    def step(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("users")).select(lit(name).as("step"), col("users"))
    step("1_view", t1).unionByName(step("2_click", t2)).unionByName(step("3_purchase", t3))
      .orderBy("step")
  }

  private def funnel(s: SparkSession, dir: String): DataFrame =
    funnelOf(events(s, dir))

  private val funnelSql =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsus FROM events),
      |t1 AS (SELECT user_id, MIN(tsus) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id, MIN(e.tsus) AS t2
      |  FROM ev e JOIN t1 ON t1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.tsus >= t1.t1 AND e.tsus < t1.t1 + $FunnelWindowUs
      |  GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id, MIN(e.tsus) AS t3
      |  FROM ev e JOIN t2 ON t2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.tsus >= t2.t2 AND e.tsus < t2.t2 + $FunnelWindowUs
      |  GROUP BY 1)
      |SELECT step, users FROM (
      |  SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS users FROM t1
      |  UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM t2
      |  UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM t3) u
      |ORDER BY step""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "evt_funnel" -> QueryDef.sql(funnel, funnelSql,
      "ordered conversion funnel view→click→purchase, each step within " +
        "24 h of the previous; per-step user counts, one shuffle total"),
    "evt_sessionize" -> QueryDef.sql(sessionize, sessionizeSql,
      "gap-based sessionization (12 h inactivity break): lag-marked " +
        "session starts + running-sum numbering + rollup, one shuffle"),
    "evt_asof_join" -> QueryDef.sql(asofJoin, asofSql,
      "as-of join (click → latest same-user error at-or-before) via " +
        "union + carry-forward window; oracle = DuckDB's native ASOF JOIN"),
    "evt_range_join" -> QueryDef.sql(rangeJoin, rangeSql,
      "bounded time-range join (errors within 6 h before each click) " +
        "via interval bucketing — one equi-join shuffle, 2x probe fan-out"))
}
