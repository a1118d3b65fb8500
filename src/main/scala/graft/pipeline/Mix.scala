package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{QueryDef, Tables}

/** Domain-mixture resampling — the pretraining-pipeline step that turns
  * a skewed raw corpus into the mixture training actually wants (public
  * recipe: per-domain weights as in The Pile / DoReMi; the mechanism
  * here is deterministic per-document replication counts rather than an
  * RNG draw, so the resample is reproducible and engine-portable).
  *
  * Target mixture: uniform over the `source` domains present (balancing
  * is the canonical default; any weight vector slots into the same
  * arithmetic). For domain s with n_s of N documents over S domains the
  * ideal per-document rate is N / (S·n_s) — kept EXACT as an integer
  * part plus a remainder Bernoulli decided by the corpus md5 hash
  * convention: copies = N div (S·n_s) + [md5("mix:" ‖ doc_id) mod
  * (S·n_s) < N mod (S·n_s)]. Over any domain the expected copy total is
  * N/S, so the output mixture is balanced while every decision is a
  * pure function of (doc_id, corpus counts).
  *
  * Scale shape: the counts table is one row per domain (model-sized,
  * broadcast); everything else is a map-side projection — no
  * fact-proportional shuffle, no collect. Oversampled domains emit
  * copies > 1 (an epochs column, not duplicated bytes); undersampled
  * ones get copies ∈ {0, 1}.
  */
object Mix {

  private def mixDomains(s: SparkSession, dir: String): DataFrame =
    mixOf(Tables.load(s, dir, "documents").select("doc_id", "source"))

  private[graft] def mixOf(d: DataFrame): DataFrame = {
    val n = d.groupBy("source").agg(count(lit(1)).as("ns"))
    val tot = n.agg(sum("ns").as("nd"), count(lit(1)).as("st"))
    val den = col("st") * col("ns")
    d.join(broadcast(n), "source")
      .crossJoin(broadcast(tot))
      .withColumn("h", Export.md5Long(concat(lit("mix:"), col("doc_id"))))
      .withColumn("copies",
        call_function("div", col("nd"), den) +
          when(col("h") % den < col("nd") % den, 1L).otherwise(0L))
      .select(col("doc_id"), col("source"), col("copies"))
      .orderBy("doc_id")
  }

  private val mixSql =
    """WITH n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |               (SELECT CAST(COUNT(*) AS BIGINT) FROM n) AS st
      |        FROM documents)
      |SELECT d.doc_id, d.source,
      |  CAST(t.nd // (t.st * n.ns)
      |    + CASE WHEN ('0x' || substr(md5('mix:' || d.doc_id), 1, 15))::BIGINT % (t.st * n.ns)
      |                < t.nd % (t.st * n.ns)
      |           THEN 1 ELSE 0 END AS BIGINT) AS copies
      |FROM documents d JOIN n USING (source) CROSS JOIN tot t
      |ORDER BY doc_id""".stripMargin

  /** Token-mass-weighted variant: real pretraining mixtures target
    * TOKEN budgets, not document counts — here every domain contributes
    * T/S expected tokens (T = corpus token total over S domains), so a
    * domain of few long documents is thinned where the document-count
    * rule would upsample it. Same integer-rate + md5-Bernoulli
    * arithmetic over per-domain token sums (the corpus whitespace
    * tokenization convention); a domain with zero tokens emits zero
    * copies. The hash key is "mixtok:"-prefixed so the two resamples
    * draw independent Bernoullis.
    */
  private def mixTokens(s: SparkSession, dir: String): DataFrame =
    mixTokensOf(Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), Export.tokCount(col("text")).as("toks")))

  private[graft] def mixTokensOf(d: DataFrame): DataFrame = {
    val n = d.groupBy("source").agg(sum("toks").as("ts_"))
    val tot = n.agg(sum("ts_").as("tt"), count(lit(1)).as("st"))
    val den = col("st") * col("ts_")
    d.join(broadcast(n), "source")
      .crossJoin(broadcast(tot))
      .withColumn("h", Export.md5Long(concat(lit("mixtok:"), col("doc_id"))))
      .withColumn("copies",
        when(col("ts_") === 0L, 0L).otherwise(
          call_function("div", col("tt"), den) +
            when(col("h") % den < col("tt") % den, 1L).otherwise(0L)))
      .select(col("doc_id"), col("source"), col("toks"), col("copies"))
      .orderBy("doc_id")
  }

  private val mixTokensSql =
    """WITH dt AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS toks
      |  FROM documents
      |), n AS (SELECT source, CAST(SUM(toks) AS BIGINT) AS ts_ FROM dt GROUP BY 1),
      |tot AS (SELECT CAST(SUM(ts_) AS BIGINT) AS tt,
      |               (SELECT CAST(COUNT(*) AS BIGINT) FROM n) AS st
      |        FROM n)
      |SELECT d.doc_id, d.source, d.toks,
      |  CAST(CASE WHEN n.ts_ = 0 THEN 0
      |    ELSE t.tt // (t.st * n.ts_)
      |      + CASE WHEN ('0x' || substr(md5('mixtok:' || d.doc_id), 1, 15))::BIGINT % (t.st * n.ts_)
      |                  < t.tt % (t.st * n.ts_)
      |             THEN 1 ELSE 0 END END AS BIGINT) AS copies
      |FROM dt d JOIN n USING (source) CROSS JOIN tot t
      |ORDER BY doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "mix_domains" -> QueryDef.sql(mixDomains, mixSql,
      "domain-mixture resampling to a balanced source mixture: exact " +
        "integer rate + md5-Bernoulli remainder → per-doc copy counts"),
    "mix_tokens" -> QueryDef.sql(mixTokens, mixTokensSql,
      "token-mass-weighted mixture resampling: every domain contributes " +
        "T/S expected tokens; same integer-rate arithmetic over token sums"))
}
