package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{QueryDef, Tables}

/** Cardinality sketching — the 100 TB substitute for exact COUNT
  * DISTINCT (here: distinct 8-grams per language, the dedup family's
  * own unit). Spark's own approx_count_distinct (HLL++) is not
  * engine-portable, so the sketch here is KMV (k-minimum-values,
  * public: Bar-Yossef et al. 2002): over the 60-bit md5 hash of each
  * distinct gram, the k-th smallest value h_(k) estimates the
  * cardinality as (k−1)·H / h_(k) with H = 2⁶⁰ — every input to the
  * estimate is a deterministic integer, and the one floating division
  * is the same IEEE operation in both engines.
  *
  * Scale shape: the rank-filter over (lang ORDER BY h) compiles to
  * WindowGroupLimit — each task keeps a bounded k-heap per group
  * map-side (the same partial-aggregate a hand-written KMV maintains),
  * so the sketch never materializes a group's full distinct set in one
  * place. The EXACT distinct count is also emitted — it is the gate's
  * measurement baseline (like the ANN recall gates), exactly the
  * quantity the sketch exists to avoid at scale.
  */
object Sketches {

  /** Sketch size: estimate stderr ≈ 1/√k ≈ 6%. */
  private[graft] val K = 256

  /** The KMV estimate from a merged state of `size` distinct minimum
    * hashes whose largest is `kth` — the executor-local twin of the
    * column expression (same doubles, same floor), shared with
    * [[graft.streaming.StreamingSketch]].
    */
  private[graft] def estimateLocal(size: Int, kth: Long): Long =
    if (size < K) size.toLong
    else math.floor((K - 1).toDouble * 1152921504606846976.0 / kth).toLong

  private[pipeline] def kmvOf(d: DataFrame): DataFrame = {
    // the corpus 8-gram convention (Curation.gramsOf), with lang carried:
    // grams are the high-cardinality unit here (the per-lang token
    // vocabulary is fixture-small, which would leave KMV vacuous)
    val gn = Curation.GramN
    val grams = d
      .select(col("lang"), filter(split(col("text"), " "), w => w =!= "").as("ws"))
      .withColumn("n", size(col("ws")))
      .filter(col("n") >= gn)
      .select(col("lang"), explode(
        expr(s"transform(sequence(0, n - $gn), i -> array_join(slice(ws, i + 1, $gn), ' '))")).as("g"))
    val toks = grams
      .select(col("lang"), Export.md5Long(col("g")).as("h"))
      .distinct()
    val byLang = Window.partitionBy("lang").orderBy("h")
    // rn <= K (not rn = K) so InferWindowGroupLimit applies — the k-th
    // value is then the max of the bounded prefix, and a group that ran
    // out of rows before K is the small-set case
    val kth = toks.withColumn("rn", row_number().over(byLang))
      .filter(col("rn") <= K)
      .groupBy("lang").agg(count(lit(1)).as("kn"), max("h").as("hk"))
      .filter(col("kn") === K)
      .select("lang", "hk")
    // exact baseline over the RAW gram strings (not the 60-bit hashes
    // the sketch ranks): at trillions of grams the hash space itself
    // collides, and a baseline that silently conflated colliding grams
    // would no longer be exact. This leg shuffles gram text — it is BY
    // DESIGN the expensive measurement the sketch exists to replace.
    val exact = grams.select("lang", "g").distinct()
      .groupBy("lang").agg(count(lit(1)).as("exact_distinct"))
    // fewer than K distinct values ⇒ the sketch holds them all and IS
    // the exact count (the standard small-set rule)
    exact.join(kth, Seq("lang"), "left")
      .withColumn("kmv_estimate",
        when(col("hk").isNull, col("exact_distinct"))
          .otherwise(floor(lit((K - 1).toDouble) * lit(1152921504606846976.0) / col("hk")).cast("long")))
      .withColumn("rel_err", graft.util.Rnd.jround(
        abs(col("kmv_estimate") - col("exact_distinct")) / col("exact_distinct"), 6))
      .select("lang", "exact_distinct", "kmv_estimate", "rel_err")
      .orderBy("lang")
  }

  private def kmv(s: SparkSession, dir: String): DataFrame =
    kmvOf(Tables.load(s, dir, "documents"))

  private val kmvSql =
    s"""WITH grams AS (
      |  SELECT lang, array_to_string(ws[i:i+${Curation.GramN - 1}], ' ') AS g
      |  FROM (SELECT lang, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents) w,
      |       UNNEST(generate_series(1, len(ws) - ${Curation.GramN - 1})) AS t(i)
      |  WHERE len(ws) >= ${Curation.GramN}
      |), toks AS (
      |  SELECT DISTINCT lang, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM grams
      |), ranked AS (
      |  SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn FROM toks
      |), kth AS (SELECT lang, h AS hk FROM ranked WHERE rn = $K
      |), exact AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS exact_distinct
      |  FROM (SELECT DISTINCT lang, g FROM grams) GROUP BY 1
      |), est AS (
      |  SELECT e.lang, e.exact_distinct,
      |    CASE WHEN k.hk IS NULL THEN e.exact_distinct
      |         ELSE CAST(FLOOR(${K - 1}.0 * 1152921504606846976.0 / k.hk) AS BIGINT) END AS kmv_estimate
      |  FROM exact e LEFT JOIN kth k ON k.lang = e.lang)
      |SELECT lang, exact_distinct, kmv_estimate,
      |  FLOOR(ABS(kmv_estimate - exact_distinct) / CAST(exact_distinct AS DOUBLE) * 1e6 + 0.5) / 1e6 AS rel_err
      |FROM est ORDER BY lang""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "sketch_distinct_grams" -> QueryDef.sql(kmv, kmvSql,
      s"KMV (k=$K minimum hash values) distinct-8-gram estimate per " +
        "language, with the exact count and relative error as the gate"))
}
