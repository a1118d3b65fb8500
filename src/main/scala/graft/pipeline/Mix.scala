package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{QueryDef, Tables}

/** Domain-mixture resampling — the pretraining-pipeline step that turns
  * a skewed raw corpus into the mixture training actually wants (public
  * recipe: per-domain weights as in The Pile / DoReMi; the mechanism
  * here is deterministic per-document replication counts rather than an
  * RNG draw, so the resample is reproducible and engine-portable).
  *
  * ONE arithmetic serves both variants: for total weight W over S
  * domains with per-domain weight w_s, a domain's per-document rate is
  * W / (S·w_s) — kept EXACT as an integer part plus a remainder
  * Bernoulli decided by the corpus md5 hash convention:
  * copies = W div (S·w_s) + [md5(prefix ‖ doc_id) mod (S·w_s) <
  * W mod (S·w_s)]. Over any domain the expected weighted copy mass is
  * W/S — a balanced mixture — while every decision is a pure function
  * of (doc_id, corpus sums). `mix_domains` weights each document 1
  * (balanced document counts); `mix_tokens` weights by token count
  * (real pretraining mixtures target TOKEN budgets — a domain of few
  * long documents thins where the count rule would upsample it), with
  * zero-token domains emitting zero copies and an independent hash
  * prefix so the two resamples draw independent Bernoullis.
  *
  * Scale shape: the weights table is one row per domain (model-sized,
  * broadcast); everything else is a map-side projection — no
  * fact-proportional shuffle, no collect. Oversampled domains emit
  * copies > 1 (an epochs column, not duplicated bytes); undersampled
  * ones get copies ∈ {0, 1}.
  */
object Mix {

  /** The shared resample: `d` must carry (doc_id, source); `weight` is
    * the per-document mixture weight expression.
    */
  private def resample(d: DataFrame, weight: Column, prefix: String): DataFrame = {
    val n = d.groupBy("source").agg(sum(weight).as("ws_"))
    val tot = n.agg(sum("ws_").as("wt"), count(lit(1)).as("st"))
    val den = col("st") * col("ws_")
    d.join(broadcast(n), "source")
      .crossJoin(broadcast(tot))
      .withColumn("h", Export.md5Long(concat(lit(prefix), col("doc_id"))))
      .withColumn("copies",
        when(col("ws_") === 0L, 0L).otherwise(
          call_function("div", col("wt"), den) +
            when(col("h") % den < col("wt") % den, 1L).otherwise(0L)))
  }

  /** The shared oracle template over a `dt` CTE carrying (doc_id,
    * source, w) — the same sums, integer rate, and md5-Bernoulli as
    * [[resample]], with `extraCols` appended to the projection.
    */
  private def resampleSql(dt: String, prefix: String, extraCols: String): String =
    s"""WITH dt AS ($dt),
      |n AS (SELECT source, CAST(SUM(w) AS BIGINT) AS ws_ FROM dt GROUP BY 1),
      |tot AS (SELECT CAST(SUM(ws_) AS BIGINT) AS wt,
      |               (SELECT CAST(COUNT(*) AS BIGINT) FROM n) AS st
      |        FROM n)
      |SELECT d.doc_id, d.source$extraCols,
      |  CAST(CASE WHEN n.ws_ = 0 THEN 0
      |    ELSE t.wt // (t.st * n.ws_)
      |      + CASE WHEN ('0x' || substr(md5('$prefix' || d.doc_id), 1, 15))::BIGINT % (t.st * n.ws_)
      |                  < t.wt % (t.st * n.ws_)
      |             THEN 1 ELSE 0 END END AS BIGINT) AS copies
      |FROM dt d JOIN n USING (source) CROSS JOIN tot t
      |ORDER BY doc_id""".stripMargin

  private def mixDomains(s: SparkSession, dir: String): DataFrame =
    mixOf(Tables.load(s, dir, "documents").select("doc_id", "source"))

  private[graft] def mixOf(d: DataFrame): DataFrame =
    resample(d, lit(1L), "mix:")
      .select(col("doc_id"), col("source"), col("copies"))
      .orderBy("doc_id")

  private val mixSql = resampleSql(
    "SELECT doc_id, source, 1 AS w FROM documents", "mix:", "")

  private def mixTokens(s: SparkSession, dir: String): DataFrame =
    mixTokensOf(Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), Export.tokCount(col("text")).as("toks")))

  private[graft] def mixTokensOf(d: DataFrame): DataFrame =
    resample(d, col("toks"), "mixtok:")
      .select(col("doc_id"), col("source"), col("toks"), col("copies"))
      .orderBy("doc_id")

  private val mixTokensSql = resampleSql(
    """SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS w
      |  FROM documents""".stripMargin,
    "mixtok:", ", d.w AS toks")

  val defs: Map[String, QueryDef] = Map(
    "mix_domains" -> QueryDef.sql(mixDomains, mixSql,
      "domain-mixture resampling to a balanced source mixture: exact " +
        "integer rate + md5-Bernoulli remainder → per-doc copy counts"),
    "mix_tokens" -> QueryDef.sql(mixTokens, mixTokensSql,
      "token-mass-weighted mixture resampling: every domain contributes " +
        "T/S expected tokens; same integer-rate arithmetic over token sums"))
}
