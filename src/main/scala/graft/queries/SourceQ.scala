package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.QueryDef
import graft.sfa.{ModelIO, SFAModel, SFAOps}
import graft.ts.Loaders

/** Source/sink queries (SURVEY §2.1): the reference's own file formats
  * read through the Spark loaders, and the columnar model roundtrip.
  *
  * The loader queries (s1/s2/s5/s6) carry DuckDB oracles that re-parse
  * the SAME fixture files via `read_text`/`read_csv` and replicate the
  * loader semantics (separator sniffing, NaN/header skipping, z-norm) in
  * SQL — an independent second implementation of the parsing contract.
  * The roundtrip queries (s8/s10) pair the artifact IO with oracles
  * that recompute the persisted CONTENT from the raw tables (equi-depth
  * bins, per-prefix counts) — the roundtrip is lossless, so the
  * reloaded artifact must hash-match the direct computation. s9 (fitted
  * classifier ensembles) stays rows-only with ModelIOSpec's
  * predictions-equal gates.
  */
object SourceQ {

  private val Base = "/root/reference/src/main/resources/datasets"

  /** S1: UCR archive file → (id, label, len, head). */
  private def s1(s: SparkSession, dir: String): DataFrame =
    Loaders.loadUcr(s, s"$Base/univariate/CBF/CBF_TRAIN")
      .select(col("id"), col("label"), size(col("data")).cast("long").as("len"),
        graft.util.Rnd.jround(element_at(col("data"), 1), 6).as("head"))
      .orderBy("id")

  /** Oracle: the UCR parse re-expressed over `read_text` — line index =
    * id, separator sniffed per line, empty/NaN cells dropped, per-series
    * z-norm (population σ, σ=0 ⇒ ÷1) recomputed in SQL.
    */
  private val s1Sql =
    s"""WITH raw AS (
      |  SELECT string_split(content, chr(10)) AS lines
      |  FROM read_text('$Base/univariate/CBF/CBF_TRAIN')
      |), l AS (
      |  SELECT unnest(lines) AS line, generate_subscripts(lines, 1) - 1 AS id FROM raw
      |), p AS (
      |  SELECT id, TRIM(line) AS t FROM l
      |  WHERE TRIM(line) <> '' AND NOT starts_with(TRIM(line), '@')
      |), cells AS (
      |  SELECT id, list_filter(string_split_regex(t,
      |      CASE WHEN contains(t, ',') THEN '[,\\s]+' ELSE '\\s+' END),
      |    c -> c <> '' AND lower(c) <> 'nan') AS cs
      |  FROM p
      |), ok AS (
      |  SELECT id, CAST(cs[1] AS DOUBLE) AS label,
      |    list_transform(cs[2:], c -> CAST(c AS DOUBLE)) AS vals
      |  FROM cells WHERE len(cs) >= 2
      |), st AS (
      |  SELECT id, label, len(vals) AS n, list_sum(vals) AS s,
      |    list_sum(list_transform(vals, x -> x * x)) AS sq, vals[1] AS v0
      |  FROM ok
      |), z AS (
      |  SELECT id, label, n, s / n AS mean,
      |    CASE WHEN (sq / n - (s / n) * (s / n)) > 0
      |         THEN SQRT(sq / n - (s / n) * (s / n)) ELSE 0.0 END AS std,
      |    v0
      |  FROM st
      |)
      |SELECT CAST(id AS BIGINT) AS id, label, CAST(n AS BIGINT) AS len,
      |  FLOOR((v0 - mean) * (CASE WHEN std <> 0 THEN 1.0 / std ELSE 1.0 END) * 1e6 + 0.5) / 1e6 AS head
      |FROM z ORDER BY id""".stripMargin

  /** S2: multivariate file → one row per (sample, dim). */
  private def s2(s: SparkSession, dir: String): DataFrame =
    Loaders.loadMultivariate(s, s"$Base/multivariate/PenDigits/PenDigits_TRAIN3",
      applyZNorm = false)
      .select(col("id"), col("dim"), col("label"), size(col("data")).cast("long").as("len"))
      .orderBy("id", "dim")

  private val s2Sql =
    s"""WITH r AS (
      |  SELECT * FROM read_csv('$Base/multivariate/PenDigits/PenDigits_TRAIN3',
      |    sep=' ', header=false, auto_detect=false,
      |    columns={'sid': 'BIGINT', 'ts': 'DOUBLE', 'label': 'DOUBLE',
      |             'd1': 'DOUBLE', 'd2': 'DOUBLE'})
      |), g AS (
      |  SELECT sid AS id, ANY_VALUE(label) AS label, COUNT(*) AS len FROM r GROUP BY sid
      |)
      |SELECT CAST(id AS BIGINT) AS id, CAST(dims.dim AS INTEGER) AS dim, label,
      |  CAST(len AS BIGINT) AS len
      |FROM g CROSS JOIN (SELECT unnest([0, 1]) AS dim) dims
      |ORDER BY id, dim""".stripMargin

  /** S3: ARFF multivariate loader on a deterministic fixture (the
    * reference bundles no ARFF files; its own test writes one too). The
    * fixture exercises every parse rule: `@`/`%`/empty skipping,
    * `\n`-escaped dimension blocks, `?` missing values, string labels
    * mapped to doubles in encounter order, numeric labels passed through
    * (TimeSeriesLoader.java:93-167).
    */
  // process-unique: concurrent JVMs must not read a half-written fixture
  private val S3Path =
    s"${java.lang.System.getProperty("java.io.tmpdir")}/graft_s3_${ProcessHandle.current().pid()}.arff"

  private def writeS3Fixture(): Unit = {
    val content =
      """@relation graft_s3
        |% deterministic ARFF fixture
        |'1.0,2.0,3.0\n4.0,?,6.0',cat
        |'7.5,8.5,9.5\n10.5,11.5,12.5',dog
        |'0.5,1.5,2.5\n3.5,4.5,5.5',cat
        |'13.0,14.0,15.0\n16.0,17.0,18.0',7.5
        |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(S3Path),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def s3(s: SparkSession, dir: String): DataFrame = {
    writeS3Fixture()
    val mapping = scala.collection.mutable.Map.empty[String, Double]
    val recs = Loaders.loadArffLocal(S3Path, "s3", mapping)
    import s.implicits._
    recs.toSeq
      .map { case (id, dim, label, vals) =>
        (id, dim, label, vals.length.toLong, vals.headOption.getOrElse(Double.NaN))
      }
      .toDF("id", "dim", "label", "len", "head")
      .orderBy("id", "dim")
  }

  /** Oracle: the ARFF parse re-expressed over `read_text` — skip
    * `@`/`%`/empty lines, body = chars 2..lastComma−1 with literal `\n`
    * replaced by `;`, dimensions split on `;`, `?` cells dropped, string
    * labels numbered by first appearance (size+1 order), numeric labels
    * cast through.
    */
  private val s3Sql =
    s"""WITH raw AS (
      |  SELECT string_split(content, chr(10)) AS lines FROM read_text('$S3Path')
      |), l AS (
      |  SELECT unnest(lines) AS line, generate_subscripts(lines, 1) AS ln FROM raw
      |), keep AS (
      |  SELECT line, ln FROM l
      |  WHERE line <> '' AND NOT contains(line, '@') AND NOT contains(line, '%')
      |), ids AS (
      |  SELECT line, ROW_NUMBER() OVER (ORDER BY ln) - 1 AS id FROM keep
      |), parts AS (
      |  SELECT id,
      |    regexp_extract(line, '[^,]*$$') AS lbl,
      |    replace(substr(regexp_replace(line, ',[^,]*$$', ''), 2,
      |      len(regexp_replace(line, ',[^,]*$$', '')) - 2), '\\n', ';') AS body
      |  FROM ids
      |), lmap AS (
      |  SELECT lbl, ROW_NUMBER() OVER (ORDER BY MIN(id)) AS lid
      |  FROM parts WHERE TRY_CAST(lbl AS DOUBLE) IS NULL GROUP BY lbl
      |), lab AS (
      |  SELECT p.id, p.body,
      |    COALESCE(TRY_CAST(p.lbl AS DOUBLE), CAST(m.lid AS DOUBLE)) AS label
      |  FROM parts p LEFT JOIN lmap m ON p.lbl = m.lbl
      |), dims AS (
      |  SELECT id, label, unnest(string_split(body, ';')) AS dstr,
      |    generate_subscripts(string_split(body, ';'), 1) - 1 AS dim
      |  FROM lab
      |), vals AS (
      |  SELECT id, dim, label,
      |    list_transform(
      |      list_filter(string_split(dstr, ','),
      |        c -> c <> '?' AND TRY_CAST(c AS DOUBLE) IS NOT NULL),
      |      c -> CAST(c AS DOUBLE)) AS vs
      |  FROM dims
      |)
      |SELECT CAST(id AS BIGINT) AS id, CAST(dim AS INTEGER) AS dim, label,
      |  CAST(len(vs) AS BIGINT) AS len,
      |  COALESCE(vs[1], CAST('nan' AS DOUBLE)) AS head
      |FROM vals ORDER BY id, dim""".stripMargin

  /** S5: whole-file long series (first value per line). */
  private def s5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val data = Loaders.readSampleSubsequenceLocal(s"$Base/indexing/power_data.dat")
    data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("i", "v").orderBy("i")
  }

  private val s5Sql =
    s"""WITH raw AS (
      |  SELECT string_split(content, chr(10)) AS lines
      |  FROM read_text('$Base/indexing/power_data.dat')
      |), l AS (
      |  SELECT unnest(lines) AS line, generate_subscripts(lines, 1) AS ln FROM raw
      |), p AS (
      |  SELECT ln, TRIM(line) AS t FROM l WHERE TRIM(line) <> ''
      |)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY ln) - 1 AS BIGINT) AS i,
      |  CAST(string_split_regex(t, '\\s+')[1] AS DOUBLE) AS v
      |FROM p ORDER BY i""".stripMargin

  /** S6: one query series per line. */
  private def s6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Loaders.readQuerySeriesLocal(s"$Base/indexing/query_lightcurves.txt")
    qs.zipWithIndex.map { case (q, i) => (i.toLong, q.length.toLong, q.head) }.toSeq
      .toDF("qid", "len", "head").orderBy("qid")
  }

  private val s6Sql =
    s"""WITH raw AS (
      |  SELECT string_split(content, chr(10)) AS lines
      |  FROM read_text('$Base/indexing/query_lightcurves.txt')
      |), l AS (
      |  SELECT unnest(lines) AS line, generate_subscripts(lines, 1) AS ln FROM raw
      |), p AS (
      |  -- Scala trim strips ALL whitespace (tabs/CR); DuckDB TRIM only
      |  -- spaces — a trailing tab would otherwise add an empty token
      |  SELECT ln,
      |    list_filter(string_split_regex(TRIM(line), '\\s+'), c -> c <> '') AS toks
      |  FROM l WHERE TRIM(line, ' ' || chr(9) || chr(13)) <> ''
      |)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY ln) - 1 AS BIGINT) AS qid,
      |  CAST(len(toks) AS BIGINT) AS len,
      |  CAST(toks[1] AS DOUBLE) AS head
      |FROM p ORDER BY qid""".stripMargin

  /** S8: SFA quantizer → parquet artifact → reload → emit bins. The fit
    * is the same single-config pipeline as SfaQ; the roundtrip must be
    * lossless (ModelIOSpec asserts exact equality).
    */
  private def s8(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val ser = SFAOps.seriesOf(graft.util.Tables.load(s, dir, "events"))
    val approx = SFAOps.disjointApprox(ser, 16, 8, normMean = false)
    val bins = SFAOps.collectBins(SFAOps.equiDepthBins(approx, 4), 8, 4)
    val model = SFAModel(16, 8, 4, normMean = false, lowerBounding = true,
      applyZNorm = true, bins = bins)
    val path = graft.util.Warehouse.dir(s, "s8_model")
    ModelIO.saveSFA(model, path)
    val loaded = ModelIO.loadSFA(path)
    import s.implicits._
    (for {
      (row, coef) <- loaded.bins.zipWithIndex.toSeq
      (edge, pos) <- row.zipWithIndex
      if edge != Double.MaxValue
    } yield (coef.toLong, pos.toLong, edge))
      .toDF("coef", "pos", "edge").orderBy("coef", "pos")
  }

  /** S9: classifier sink/source round-trips (the roundtrip under test is
    * the ModelIO sink/source, not the fit): a sampled-corpus BOSS
    * ensemble grid fit AND a reduced-config WEASEL (fitted on the
    * bundled CBF fixture) → columnar artifacts → reload → emit each
    * loaded model's table. Predictions-equal gates for
    * BOSS/WEASEL/MUSE/TEASER live in ModelIOSpec.
    */
  /** The two s9 input fits, forced through their session caches. The
    * fits are the query's INPUT ARTIFACTS, not the operator under test
    * (that is the ModelIO sink/source) — Bench calls this outside the
    * timed region so the s9 line measures save+load+emit, not a cold
    * BOSS-ensemble fit that belongs to no operator's cost.
    */
  private[graft] def prefitS9(s: SparkSession, dir: String): Unit = {
    graft.queries.ClassifierQ.bossGridFit(s, dir)
    weaselS9Fit(s)
    // the fit transitively built the shared series stage (SfaQ.series
    // cachedDF); DROP it so only the fit OBJECTS stay warm — a prefit
    // that also pre-warmed the series cache would flatter the first
    // measured series consumer's time. The model's own trainBags cache
    // is materialized inside fit, so it survives this drop.
    graft.util.Pipelines.dropDF(s, s"sfa.series:$dir")
    ()
  }

  private def weaselS9Fit(s: SparkSession): graft.sfa.Weasel.WeaselModel =
    graft.util.Pipelines.cachedObj(s, "weasel.s9fit") {
      implicit val sp: SparkSession = s
      // cache: the WEASEL fit's many actions would re-parse the CSV each
      val train = graft.ts.Loaders.loadUcr(s,
        "/root/reference/src/main/resources/datasets/univariate/CBF/CBF_TRAIN").cache()
      // reduced fixture: the round-trip under test is save/load equality
      // (ModelIOSpec asserts predictions-equal on the full config); two
      // windows keep the persisted-artifact shape without a grid sweep
      new graft.sfa.WeaselClassifier(graft.sfa.Weasel.Config(
        minF = 4, maxF = 4, folds = 2, normalization = Seq(true),
        minWindowLength = 8, maxWindowLength = 9, lrMaxIter = 5)).fit(train)
    }

  private def s9(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import s.implicits._
    // artifact paths under the process-unique Warehouse root: the
    // write-then-reload inside one query must never race a concurrent
    // JVM's identical query on a shared tmpdir
    val clfPath = graft.util.Warehouse.dir(s, "s9_clf")
    val model = graft.queries.ClassifierQ.bossGridFit(s, dir)
    ModelIO.saveBossEnsemble(model, clfPath)
    val boss = ModelIO.loadBossEnsemble(clfPath)
    val bossRows = boss.models
      .map(m => ("boss", m.norm, m.windowLength.toLong, m.features.toLong, m.trainCorrect))

    val weasel = weaselS9Fit(s)
    val weaselPath = graft.util.Warehouse.dir(s, "s9_weasel")
    ModelIO.saveWeasel(weasel, weaselPath)
    val w = ModelIO.loadWeasel(weaselPath)
    val weaselRows = Seq(
      ("weasel", w.norm, w.windows.size.toLong, w.features.toLong, w.trainCorrect))

    (bossRows ++ weaselRows)
      .toDF("algo", "norm", "w", "features", "train_correct")
      .orderBy("algo", "w")
  }

  /** S10: the k-NN corpus persisted partitioned by word prefix (the
    * trie's at-rest layout; prefix pruning ≙ subtree skip), reloaded,
    * per-prefix record counts emitted.
    */
  private def s10(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val corpus = IndexQ.slices(s, dir)
      .filter(col("user_id") % 2 === 0)
      .withColumn("word",
        expr("transform(slice(data, 1, 4), x -> CAST(CASE WHEN x < 0 THEN 0 ELSE 1 END AS INT))"))
      .select(col("user_id").as("id"), col("data"), col("word"))
    val path = graft.util.Warehouse.dir(s, "s10_index")
    // save/append split on id mod 4 (corpus ids are the even user_ids):
    // per-prefix counts are arrangement-invariant, so the oracle gates
    // the append path of a WORD-ONLY layout (no box stats) every round
    ModelIO.saveIndex(corpus.filter(col("id") % 4 === 0), usedBits = 1, prefixLen = 2, path)
    ModelIO.appendIndex(corpus.filter(col("id") % 4 =!= 0), usedBits = 1, prefixLen = 2, path)
    ModelIO.loadIndex(path)
      // partition-column inference types small prefixes int32; the
      // oracle emits BIGINT — align exactly rather than rely on the
      // comparer's numeric normalization
      .groupBy(col("prefix").cast("long").as("prefix"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prefix")
  }

  /** S10 oracle: recompute the index content from the raw events — the
    * 32-point z-normed slices of even users, word = sign bits of the
    * first 4 points, prefix = integer-packed first 2 bits (saveIndex's
    * aggregate fold with usedBits = 1), counted per prefix. Sign bits
    * are FP-robust cross-engine: the sign of (value − mean)·(1/σ)
    * equals the sign of (value − mean)/σ exactly.
    */
  private val s10Sql = IndexQ.symCtes +
    s"""
      |, pb AS (
      |  SELECT user_id,
      |    CAST(SUM((CASE WHEN x < 0 THEN 0 ELSE 1 END)
      |             * (CASE WHEN j = 0 THEN 2 ELSE 1 END)) AS BIGINT) AS prefix
      |  FROM sl WHERE user_id % 2 = 0 AND j < 2 GROUP BY 1
      |)
      |SELECT prefix, COUNT(*) AS n FROM pb GROUP BY 1 ORDER BY prefix""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "s9_classifier_roundtrip" -> QueryDef.rowsOnly(s9,
      "BOSS ensemble -> columnar artifact -> reload; exact roundtrip " +
        "gate in ModelIOSpec"),
    "s10_index_layout" -> QueryDef.sql(s10, s10Sql,
      "prefix-partitioned index layout roundtrip; the oracle recomputes " +
        "the per-prefix counts from the raw events (sign-bit words over " +
        "the z-normed slices), so a lossy save/load would hash-mismatch; " +
        "also ModelIOSpec/IndexSpec"),
    "s1_ucr_load" -> QueryDef.sql(s1, s1Sql,
      "UCR loader on the reference's CBF fixture; oracle re-parses the " +
        "same file via read_text; also LoadersSpec"),
    "s2_mv_load" -> QueryDef.sql(s2, s2Sql,
      "multivariate loader on the PenDigits fixture; oracle re-parses " +
        "via read_csv; also LoadersSpec"),
    "s3_arff_load" -> QueryDef.sql(s3, s3Sql,
      "ARFF multivariate loader on a deterministic fixture; oracle " +
        "re-parses the same file via read_text; also LoadersSpec"),
    "s5_sample_subsequence" -> QueryDef.sql(s5, s5Sql,
      "whole-file long-series reader on power_data.dat; read_text oracle"),
    "s6_query_series" -> QueryDef.sql(s6, s6Sql,
      "query-series reader on query_lightcurves.txt; read_text oracle"),
    "s8_model_roundtrip" -> QueryDef.sql(s8, SfaQ.f2Sql,
      "SFA quantizer fit → parquet artifact → reload; the roundtrip is " +
        "lossless (exact-equality gate in ModelIOSpec), so the reloaded " +
        "bins must equal the directly-fitted ones — the oracle IS the " +
        "f2 equi-depth SQL, making a lossy artifact hash-mismatch"))
}
