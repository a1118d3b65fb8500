package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{QueryDef, Tables}

/** Text-analysis operators for the training-data pipeline: token counting,
  * quality scoring, language-ID, document fingerprinting. All are
  * shuffle-light: narrow per-row expressions plus one groupBy at most.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def withTokens(df: DataFrame): DataFrame =
    df.withColumn("toks", filter(split(col("text"), " "), w => w =!= ""))

  /** Token counts: whitespace tokens + a BPE-ish proxy (4 chars ≈ 1 token,
    * ceil) + distinct-token count.
    */
  private def tokens(s: SparkSession, dir: String): DataFrame =
    withTokens(docs(s, dir))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("bpe_est", ceil(length(col("text")) / lit(4.0)).cast("long"))
      .select("doc_id", "n_tokens", "n_uniq", "bpe_est")
      .orderBy("doc_id")

  private val tokensSql =
    """WITH t AS (
      |  SELECT doc_id, text, list_filter(string_split(text, ' '), w -> w <> '') AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
      |  CAST(CEIL(length(text)/4.0) AS BIGINT) AS bpe_est
      |FROM t ORDER BY doc_id""".stripMargin

  /** Quality scoring: length, mean token length, stopword ratio,
    * type-token ratio. Ratios are integer-over-integer divisions → bit
    * deterministic; rounded to 6 dp.
    */
  private def quality(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("a", "the")
    withTokens(docs(s, dir))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("chars", aggregate(col("toks"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("stopn", size(filter(col("toks"), w => w.isin(stop: _*))).cast("long"))
      .withColumn("uniq", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("mean_tok_len", graft.util.Rnd.jround(col("chars") / col("n").cast("double"), 6))
      .withColumn("stop_ratio", graft.util.Rnd.jround(col("stopn") / col("n").cast("double"), 6))
      .withColumn("ttr", graft.util.Rnd.jround(col("uniq") / col("n").cast("double"), 6))
      .select("doc_id", "n", "mean_tok_len", "stop_ratio", "ttr")
      .orderBy("doc_id")
  }

  private val qualitySql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n,
      |    CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT) AS chars,
      |    CAST(len(list_filter(toks, w -> w IN ('a', 'the'))) AS BIGINT) AS stopn,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS uniq
      |  FROM t)
      |SELECT doc_id, n,
      |  FLOOR(chars / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_tok_len,
      |  FLOOR(stopn / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS stop_ratio,
      |  FLOOR(uniq / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS ttr
      |FROM m ORDER BY doc_id""".stripMargin

  /** Language-ID by weighted marker-token profiles (Cavnar–Trenkle-style
    * scoring with pluggable profiles; the profile matrix here is a fixed
    * demo constant — swap in real per-language n-gram weights for real
    * corpora). pred = argmax score, tie → lexicographically first lang.
    */
  private val markers = Seq("table", "join", "window", "spark", "agg", "data")
  private val profile: Map[String, Seq[Int]] = Map(
    "en" -> Seq(3, 1, 2, 1, 1, 2),
    "de" -> Seq(1, 3, 1, 2, 2, 1),
    "es" -> Seq(2, 2, 3, 1, 1, 1),
    "fr" -> Seq(1, 1, 2, 3, 1, 2),
    "zh" -> Seq(2, 1, 1, 1, 3, 2))

  private def langid(s: SparkSession, dir: String): DataFrame = {
    var df = withTokens(docs(s, dir))
    markers.zipWithIndex.foreach { case (m, i) =>
      df = df.withColumn(s"c$i", size(filter(col("toks"), w => w === m)).cast("long"))
    }
    profile.foreach { case (lang, ws) =>
      val score = ws.zipWithIndex.map { case (wgt, i) => col(s"c$i") * wgt }
        .reduce(_ + _)
      df = df.withColumn(s"score_$lang", score)
    }
    val langs = profile.keys.toSeq.sorted
    val best = langs.map(l => struct(col(s"score_$l").as("sc"), lit(l).as("lg")))
      .reduce((a, b) => when(b.getField("sc") > a.getField("sc"), b).otherwise(a))
    df.withColumn("pred", best.getField("lg"))
      .withColumn("hit", (col("pred") === col("lang")).cast("long"))
      .select("doc_id", "pred", "hit")
      .orderBy("doc_id")
  }

  private val langidSql = {
    val counts = markers.zipWithIndex.map { case (m, i) =>
      s"CAST(len(list_filter(toks, w -> w = '$m')) AS BIGINT) AS c$i"
    }.mkString(",\n    ")
    val scores = profile.toSeq.sortBy(_._1).map { case (lang, ws) =>
      ws.zipWithIndex.map { case (wgt, i) => s"c$i*$wgt" }.mkString(" + ") + s" AS score_$lang"
    }.mkString(",\n    ")
    val langs = profile.keys.toSeq.sorted
    // fold langs left-to-right with strict > (first lang wins ties)
    val argmax = langs.tail.foldLeft(
      s"struct_pack(sc := score_${langs.head}, lg := '${langs.head}')") {
      (acc, l) =>
        s"CASE WHEN score_$l > ($acc).sc THEN struct_pack(sc := score_$l, lg := '$l') ELSE $acc END"
    }
    s"""WITH t AS (
      |  SELECT doc_id, lang, list_filter(string_split(text, ' '), w -> w <> '') AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang,
      |    $counts
      |  FROM t),
      |sc AS (
      |  SELECT doc_id, lang,
      |    $scores
      |  FROM c)
      |SELECT doc_id, (pick).lg AS pred,
      |  CAST(CASE WHEN (pick).lg = lang THEN 1 ELSE 0 END AS BIGINT) AS hit
      |FROM (SELECT doc_id, lang, $argmax AS pick FROM sc) z
      |ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: min-of-md5 over 5-gram shingles (a
    * deterministic 1-perm winnowing proxy); docs sharing a fingerprint are
    * near-dup candidates.
    */
  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    withTokens(docs(s, dir))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 5)
      .withColumn("fp", expr(
        "array_min(transform(sequence(0, n-5), i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))))"))
      .select("doc_id", "fp")
      .orderBy("doc_id")

  private val fingerprintSql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  list_min(list_transform(generate_series(1, len(toks)-4),
      |    i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS fp
      |FROM t WHERE len(toks) >= 5 ORDER BY doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "text_token_stats" -> QueryDef.sql(tokens, tokensSql),
    "text_quality" -> QueryDef.sql(quality, qualitySql),
    "text_langid" -> QueryDef.sql(langid, langidSql),
    "text_fingerprint" -> QueryDef.sql(fingerprint, fingerprintSql))
}
