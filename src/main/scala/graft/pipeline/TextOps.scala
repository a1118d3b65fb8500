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

  /** Session-shared tokenized-documents stage: token_stats, quality,
    * langid, lm_score, fingerprint, repetition and chunks all start from
    * the SAME whitespace tokenization, but each re-ran the documents
    * scan + split per query. The first consumer pays tokenize + persist
    * (row count logged by the cache line — the silent-cap rule for a
    * fact-proportional token-level frame); the rest of the family reads
    * the stage. `tchars` carries the one non-token input (text length
    * for the BPE estimate) so no consumer needs the raw text again.
    */
  private def toksStage(s: SparkSession, dir: String): DataFrame =
    graft.util.Pipelines.cachedDF(s, s"text.toks:$dir")(
      withTokens(docs(s, dir))
        .select(col("doc_id"), col("lang"), col("toks"),
          length(col("text")).as("tchars")))

  /** Token counts: whitespace tokens + a BPE-ish proxy (4 chars ≈ 1 token,
    * ceil) + distinct-token count.
    */
  private def tokens(s: SparkSession, dir: String): DataFrame =
    toksStage(s, dir)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("bpe_est", ceil(col("tchars") / lit(4.0)).cast("long"))
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
    toksStage(s, dir)
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

  /** Language-ID by TRAINED rank-order token profiles (Cavnar–Trenkle,
    * "N-Gram-Based Text Categorization", 1994 — word unigrams instead
    * of char n-grams, matching this corpus' tokenization):
    *
    *  - fit: per-language top-[[LangProfileK]] token ranks from the
    *    training split (doc_id % 10 != 0), ties → token asc. The
    *    profile is model-sized (langs × K rows) and broadcast.
    *  - classify: every doc's own top-K token ranks, out-of-place
    *    distance Σ |doc_rank − profile_rank| with penalty K for tokens
    *    absent from a language's profile; pred = argmin distance,
    *    tie → lexicographically first lang.
    *
    * All counts/ranks/distances are integers → bit-deterministic
    * cross-engine. Scale shape: two groupBys (lang×token, doc×token),
    * rank-limit windows (WindowGroupLimit keeps the per-key top-K from
    * shuffling whole groups), one broadcast join; no all-pairs work.
    *
    * Row contract: a document with no tokens has no rank profile and
    * emits NO row (like text_repetition's "< 2 tokens" rule) — callers
    * counting rows-per-doc must left-join, not assume totality.
    */
  private val LangProfileK = 20

  private def langid(s: SparkSession, dir: String): DataFrame =
    // keyed session cache (the f12/j1 fit-query precedent): the language
    // profiles are a model fitted on the training split, and the build
    // collects the language list — plans never canonicalize equal across
    // re-runs, so without the key every re-run re-ran fit + classify
    graft.util.Pipelines.cachedDF(s, s"text.langid:$dir") { langidBody(s, dir) }
      .orderBy("doc_id")

  private def langidBody(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = toksStage(s, dir)
      .select(col("doc_id"), col("lang"), explode(col("toks")).as("w"))
    // fit: per-language rank profiles on the training split
    val byLang = Window.partitionBy("lang").orderBy(col("n").desc, col("w").asc)
    val prof = tok.filter(col("doc_id") % 10 =!= 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
      .withColumn("prank", row_number().over(byLang).cast("long"))
      .filter(col("prank") <= LangProfileK)
      .select(col("lang").as("plang"), col("w"), col("prank"))
    // classify: per-doc rank profile against every language's profile
    val byDoc = Window.partitionBy("doc_id").orderBy(col("n").desc, col("w").asc)
    val docTop = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
      .withColumn("drank", row_number().over(byDoc).cast("long"))
      .filter(col("drank") <= LangProfileK)
    val langs = docTop.sparkSession.createDataFrame(
      prof.select("plang").distinct().collect().map(r => Tuple1(r.getString(0))).toSeq
    ).toDF("plang")
    val dists = docTop.crossJoin(broadcast(langs))
      .join(broadcast(prof), Seq("plang", "w"), "left")
      .withColumn("d", coalesce(abs(col("drank") - col("prank")), lit(LangProfileK.toLong)))
      .groupBy("doc_id", "plang").agg(sum("d").as("dist"))
    val byDist = Window.partitionBy("doc_id").orderBy(col("dist").asc, col("plang").asc)
    val pred = dists.withColumn("rn", row_number().over(byDist)).filter(col("rn") === 1)
      .select(col("doc_id"), col("plang").as("pred"))
    docs(s, dir).select(col("doc_id"), col("lang")).join(pred, "doc_id")
      .withColumn("hit", (col("pred") === col("lang")).cast("long"))
      .select("doc_id", "pred", "hit")
  }

  private val langidSql =
    s"""WITH tok AS (
      |  SELECT doc_id, lang, UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS w
      |  FROM documents),
      |prof AS (
      |  SELECT lang AS plang, w,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, w ASC) AS BIGINT) AS prank
      |  FROM tok WHERE doc_id % 10 <> 0 GROUP BY lang, w
      |  QUALIFY prank <= $LangProfileK),
      |doctop AS (
      |  SELECT doc_id, w,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, w ASC) AS BIGINT) AS drank
      |  FROM tok GROUP BY doc_id, w
      |  QUALIFY drank <= $LangProfileK),
      |langs AS (SELECT DISTINCT plang FROM prof),
      |dists AS (
      |  SELECT t.doc_id, l.plang,
      |    SUM(COALESCE(ABS(t.drank - p.prank), $LangProfileK)) AS dist
      |  FROM doctop t CROSS JOIN langs l
      |  LEFT JOIN prof p ON p.plang = l.plang AND p.w = t.w
      |  GROUP BY t.doc_id, l.plang),
      |pred AS (
      |  SELECT doc_id, plang AS pred
      |  FROM dists
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist ASC, plang ASC) = 1)
      |SELECT d.doc_id, pred,
      |  CAST(CASE WHEN pred = d.lang THEN 1 ELSE 0 END AS BIGINT) AS hit
      |FROM documents d JOIN pred USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Document fingerprinting: min-of-md5 over 5-gram shingles (a
    * deterministic 1-perm winnowing proxy); docs sharing a fingerprint are
    * near-dup candidates.
    */
  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    // native shingle kernel (graft.sfa.expr.MinShingleMd5Expr): the
    // expression-tree form allocated a joined string + a MessageDigest
    // + a hex string PER SHINGLE and compared hex strings in array_min;
    // the kernel feeds one thread-cached digest the identical bytes and
    // hex-encodes only the winner — same fingerprint bit-for-bit
    toksStage(s, dir)
      .filter(size(col("toks")) >= 5)
      .withColumn("fp", org.apache.spark.sql.graft.Bridge.column(
        graft.sfa.expr.MinShingleMd5Expr(
          org.apache.spark.sql.graft.Bridge.expression(col("toks")), 5)))
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

  /** Repetition signals (the Gopher/C4 family of quality filters):
    * per-doc fraction of word-2-gram occurrences belonging to the single
    * most frequent 2-gram (`top2_frac` — catches boilerplate loops) and
    * to any repeated 2-gram (`dup2_frac` — catches template spam).
    * Docs with < 2 tokens emit no row (no 2-grams to judge), matching
    * the oracle's inner semantics. Scale shape: one explode + groupBy
    * keyed (doc_id, gram) with map-side partial counts, then a per-doc
    * re-aggregate — both shuffles keyed on doc_id ⊕ gram, no skew
    * hotspot, no all-pairs work. Integer counts; ratios rounded 6 dp.
    */
  private def repetition(s: SparkSession, dir: String): DataFrame = {
    // adjacent-pair zip, NOT per-index element_at: CollapseProject
    // inlines the `toks` split into whatever consumes it, and an
    // indexed lambda (element_at(toks, i) per i) would re-run the split
    // once per ELEMENT — O(tokens²) splits per doc (measured 8 s vs
    // 1.3 s at sf0.1). zip_with over two slices references toks a
    // constant number of times per ROW, so the inlining stays linear.
    val grams = toksStage(s, dir)
      .withColumn("grams", expr(
        "CASE WHEN size(toks) >= 2 THEN zip_with(" +
          "slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), " +
          "(a, b) -> concat(a, ' ', b)) ELSE array() END"))
      .select(col("doc_id"), explode(col("grams")).as("g"))
    grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n2"), max("c").as("top"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"))
      .select(col("doc_id"), col("n2"),
        graft.util.Rnd.jround(col("top") / col("n2").cast("double"), 6).as("top2_frac"),
        graft.util.Rnd.jround(col("dup") / col("n2").cast("double"), 6).as("dup2_frac"))
      .orderBy("doc_id")
  }

  private val repetitionSql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
      |  FROM t, UNNEST(RANGE(1, len(toks))) AS r(i)
      |  WHERE len(toks) >= 2),
      |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n2,
      |  FLOOR(MAX(c) / CAST(SUM(c) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS top2_frac,
      |  FLOOR(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(SUM(c) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS dup2_frac
      |FROM c GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---- overlapping chunking ----------------------------------------------

  /** Chunk size / overlap (tokens) for retrieval-style document
    * chunking; stride = size − overlap.
    */
  val ChunkTokens = 64
  val ChunkOverlap = 16
  private val Stride = ChunkTokens - ChunkOverlap

  /** Overlapping fixed-size token chunking (the retrieval/RAG and
    * long-doc-training prep step): each document yields chunks of
    * [[ChunkTokens]] tokens starting every [[Stride]] tokens, so
    * consecutive chunks share [[ChunkOverlap]] tokens; the last chunk
    * may be shorter, and a start is only emitted while it adds tokens
    * beyond the previous chunk's coverage (start ≤ n − overlap − 1).
    * Token-empty documents yield no chunks. A narrow map-side explode —
    * the output is ~n/stride rows per doc with no shuffle before the
    * ordering; md5 of the rejoined chunk text puts every chunk byte
    * under the hash oracle.
    */
  private def chunks(s: SparkSession, dir: String): DataFrame =
    chunksTokenized(toksStage(s, dir))

  private[pipeline] def chunksOf(d: DataFrame): DataFrame =
    chunksTokenized(withTokens(d))

  private def chunksTokenized(td: DataFrame): DataFrame =
    td
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, greatest(size(toks) - ${ChunkOverlap + 1}, 0), $Stride)")).as("start"))
      .select(col("doc_id"), (col("start") / Stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        slice(col("toks"), col("start") + 1, lit(ChunkTokens)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("start"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")

  private val chunksSql =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, toks, s.s AS start
      |  FROM t, UNNEST(generate_series(0, GREATEST(len(toks) - ${ChunkOverlap + 1}, 0), $Stride)) AS s(s)
      |  WHERE len(toks) > 0),
      |ch AS (
      |  SELECT doc_id, CAST(start / $Stride AS BIGINT) AS chunk_id,
      |    CAST(start AS BIGINT) AS start,
      |    toks[start + 1 : start + $ChunkTokens] AS chunk
      |  FROM st)
      |SELECT doc_id, chunk_id, start,
      |  CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
      |  md5(array_to_string(chunk, ' ')) AS chunk_fp
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  // ---- LM quality scoring ------------------------------------------------

  /** Corpus-fitted bigram language-model scoring (the CCNet/Gopher
    * "perplexity under a reference LM" quality signal, here with the LM
    * fitted on the corpus's own doc_id%10≠0 split like `text_langid`):
    * every document scores the add-one-smoothed transition probability
    * of each of its token bigrams, P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V).
    *
    * Determinism across engines: each bigram's log-probability is
    * floored to INTEGER micro-nats before the per-doc sum, so the only
    * order-varying step (the sum) runs on exact integers — the same
    * integer-cents rule every aggregate in the registry follows. The
    * count tables are vocabulary-sized (never broadcast by hint; the
    * planner may), and the plan is one explode + two key joins + one
    * groupBy — the shuffle keys are words, bounded by vocabulary, not
    * corpus.
    */
  private def lmScore(s: SparkSession, dir: String): DataFrame =
    lmScoreTokenized(toksStage(s, dir))

  private[pipeline] def lmScoreOf(d: DataFrame): DataFrame =
    lmScoreTokenized(withTokens(d))

  private def lmScoreTokenized(td: DataFrame): DataFrame = {
    val toks = td.select(col("doc_id"), col("toks"))
    val bigrams = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val train = bigrams.filter(col("doc_id") % 10 =!= 0)
    val uni = train.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = train.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val vocab = toks.filter(col("doc_id") % 10 =!= 0)
      .select(explode(col("toks")).as("w")).agg(countDistinct("w").as("v"))
    val scored = bigrams
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(vocab)
      .select(col("doc_id"),
        floor(log((coalesce(col("c2"), lit(0L)) + 1L) /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * 1e6)
          .cast("long").as("nats"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nats")).as("sum_micro_nats"))
    td.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_micro_nats"), lit(0L)).as("sum_micro_nats"))
      .withColumn("avg_nats", graft.util.Rnd.jround(
        col("sum_micro_nats") / (lit(1e6) * greatest(col("n_bigrams"), lit(1L)).cast("double")), 6))
      .orderBy("doc_id")
  }

  private val lmScoreSql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS s(i)
      |  WHERE len(toks) >= 2),
      |tr AS (SELECT * FROM bg WHERE doc_id % 10 <> 0),
      |uni AS (SELECT w1, COUNT(*) AS c1 FROM tr GROUP BY 1),
      |bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM tr GROUP BY 1, 2),
      |vv AS (
      |  SELECT COUNT(DISTINCT w.w) AS v
      |  FROM t, UNNEST(t.toks) AS w(w) WHERE t.doc_id % 10 <> 0),
      |sc AS (
      |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
      |    CAST(SUM(CAST(FLOOR(LN((COALESCE(bi.c2, 0) + 1) /
      |      CAST(COALESCE(uni.c1, 0) + vv.v AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS sum_micro_nats
      |  FROM bg
      |  LEFT JOIN bi ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
      |  LEFT JOIN uni ON bg.w1 = uni.w1
      |  CROSS JOIN vv
      |  GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(s.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(s.sum_micro_nats, 0) AS sum_micro_nats,
      |  FLOOR(COALESCE(s.sum_micro_nats, 0) /
      |    (1e6 * CAST(GREATEST(COALESCE(s.n_bigrams, 0), 1) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS avg_nats
      |FROM documents d LEFT JOIN sc s USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---- PII redaction ----------------------------------------------------
  // The Java-regex and RE2 (DuckDB) dialects agree on everything used
  // here: ASCII classes, {m,n} bounds, \d, \b.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhonePat = "\\b\\d{3}-\\d{4}\\b"

  /** PII redaction (the C4/CCNet/Dolma curation step): mask emails,
    * IPv4 addresses, and phone-shaped numbers in a text column,
    * reporting per-doc match counts and the cleaned text. Pure per-row
    * `regexp_count`/`regexp_replace` — codegen'd, shuffle-free, no UDF;
    * at 100 TB this is a map-only pass fused into whatever scan feeds
    * it. Masking runs as a fixed cascade (email → ip → phone), and each
    * count is taken on the PREVIOUS stage's output, so counts always
    * equal masks inserted — a mask boundary can create a `\b` that the
    * raw text didn't have (e.g. an email glued to a phone number), and
    * counting the raw text would then under-report what was masked.
    * PiiScrubSpec pins the semantics on adversarial plants and
    * idempotence.
    */
  def piiScrub(df: DataFrame): DataFrame =
    df.withColumn("n_email", regexp_count(col("text"), lit(EmailPat)).cast("long"))
      .withColumn("t1", regexp_replace(col("text"), EmailPat, "<EMAIL>"))
      .withColumn("n_ip", regexp_count(col("t1"), lit(IpPat)).cast("long"))
      .withColumn("t2", regexp_replace(col("t1"), IpPat, "<IP>"))
      .withColumn("n_phone", regexp_count(col("t2"), lit(PhonePat)).cast("long"))
      .withColumn("clean", regexp_replace(col("t2"), PhonePat, "<PHONE>"))
      .drop("t1", "t2")

  /** The registered query: the synthetic corpus carries no PII, so both
    * engines first append the SAME deterministic doc_id-derived contact
    * block (emails / phone / IP on residue-class schedules, so zero-,
    * one- and two-match docs all occur) and then scrub it. The md5 of
    * the cleaned text puts every masked byte under the hash oracle.
    */
  private def pii(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val aug = docs(s, dir).withColumn("text", concat(
      col("text"),
      when(pmod(id, lit(3)) =!= 2,
        concat(lit(" contact user"), id.cast("string"), lit("@example.com"))).otherwise(lit("")),
      when(pmod(id, lit(7)) === 0,
        concat(lit(" cc user"), id.cast("string"), lit("b@mail.example.org"))).otherwise(lit("")),
      when(pmod(id, lit(5)) =!= 0,
        concat(lit(" phone 555-"), lpad(pmod(id, lit(10000)).cast("string"), 4, "0"))).otherwise(lit("")),
      when(pmod(id, lit(4)) === 1,
        concat(lit(" ip 10.0."), pmod(id, lit(256)).cast("string"), lit("."),
          pmod(shiftright(id, 8), lit(256)).cast("string"))).otherwise(lit("")),
      // the dialect-stress plant: an email GLUED to a phone number (no
      // separator), so the mask-boundary \b case PiiScrubSpec pins is
      // also under the cross-engine hash oracle
      when(pmod(id, lit(11)) === 3,
        concat(lit(" glued x"), id.cast("string"), lit("@ex.co555-1234"))).otherwise(lit(""))))
    piiScrub(aug)
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        length(col("clean")).cast("long").as("clean_chars"),
        md5(col("clean")).as("clean_fp"))
      .orderBy("doc_id")
  }

  private val piiSql =
    """WITH aug AS (
      |  SELECT doc_id, text
      |    || CASE WHEN doc_id % 3 <> 2 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
      |    || CASE WHEN doc_id % 7 = 0 THEN ' cc user' || CAST(doc_id AS VARCHAR) || 'b@mail.example.org' ELSE '' END
      |    || CASE WHEN doc_id % 5 <> 0 THEN ' phone 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |    || CASE WHEN doc_id % 4 = 1 THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id // 256) % 256 AS VARCHAR) ELSE '' END
      |    || CASE WHEN doc_id % 11 = 3 THEN ' glued x' || CAST(doc_id AS VARCHAR) || '@ex.co555-1234' ELSE '' END
      |    AS text
      |  FROM documents),
      |s1 AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      |  FROM aug),
      |s2 AS (
      |  SELECT doc_id, n_email,
      |    CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
      |    regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
      |  FROM s1),
      |s3 AS (
      |  SELECT doc_id, n_email, n_ip,
      |    CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
      |    regexp_replace(t2, '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean
      |  FROM s2)
      |SELECT doc_id, n_email, n_phone, n_ip,
      |  CAST(length(clean) AS BIGINT) AS clean_chars,
      |  md5(clean) AS clean_fp
      |FROM s3 ORDER BY doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "text_token_stats" -> QueryDef.sql(tokens, tokensSql),
    "text_pii_scrub" -> QueryDef.sql(pii, piiSql,
      "PII redaction: email/IPv4/phone masking with per-doc counts over " +
        "a deterministic doc_id-derived contact augmentation"),
    "text_quality" -> QueryDef.sql(quality, qualitySql),
    "text_chunks" -> QueryDef.sql(chunks, chunksSql,
      s"overlapping $ChunkTokens-token chunking (stride $Stride) with " +
        "per-chunk fingerprints — the retrieval/long-doc prep step"),
    "text_lm_score" -> QueryDef.sql(lmScore, lmScoreSql,
      "bigram-LM quality scoring: add-one-smoothed transition log-probs " +
        "(integer micro-nats) under the corpus-fitted doc_id%10≠0 model"),
    "text_langid" -> QueryDef.sql(langid, langidSql),
    "text_fingerprint" -> QueryDef.sql(fingerprint, fingerprintSql),
    "text_repetition" -> QueryDef.sql(repetition, repetitionSql,
      "Gopher-style repetition quality signals: top/dup 2-gram fractions"))
}
