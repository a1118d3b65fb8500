package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{Pipelines, QueryDef, Rnd, Tables}

/** Training-data export operators: the last mile of the 100 TB
  * pipeline, after dedup/quality/curation — sequence packing into
  * fixed-length contexts, deterministic sharded export, and vocabulary
  * coverage analysis.
  *
  * Design for 100 TB:
  *  - sequence packing is the GPT-style concat-and-slice: documents are
  *    concatenated in deterministic order and cut at every CTX-token
  *    boundary. A single global concat order would serialize the
  *    cumulative sum, so the corpus first splits into md5 buckets whose
  *    COUNT GROWS WITH THE CORPUS (~1000 docs each) — each bucket is an
  *    independent bounded concat stream, the per-bucket prefix-sum
  *    window sorts ~1000 rows, and buckets pack in parallel on every
  *    executor. No stage touches more than one bucket.
  *  - shard assignment is a pure per-row md5 predicate (like
  *    [[Curation]]'s stratified sampler): no global sort, no window —
  *    a scan that any engine distributes perfectly, bit-identical
  *    across engines. The physical writer pays ONE shuffle on the
  *    shard key and writes per-shard sorted parquet.
  *  - vocabulary coverage takes the global top-K of the
  *    (fact-proportional) token vocabulary via TakeOrderedAndProject —
  *    per-partition bounded heaps, K rows to the driver — so the full
  *    vocabulary never sorts on one partition (an UNPARTITIONED rank
  *    filter gets no WindowGroupLimit rewrite; ExportSpec pins the
  *    TakeOrdered shape on the executed plan).
  */
object Export {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Fixed training-context length in tokens. */
  private[graft] val CtxLen = 512

  /** Target documents per packing bucket: bounds the per-bucket window
    * sort at any corpus size (the bucket COUNT scales, not the bucket).
    */
  private val DocsPerBucket = 1000L

  /** md5-derived 32-bit integer of the document text — THE deterministic
    * hash convention for bucketing/sharding/sampling (engine-portable,
    * unlike Spark's `hash`/DuckDB's `hash`); [[Curation]]'s stratified
    * sampler uses the same pair.
    */
  private[graft] def md5Int(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB text twin of [[md5Int]] over the SQL expression `e`. */
  private[graft] def md5IntSql(e: String): String =
    s"('0x' || substr(md5($e), 1, 8))::BIGINT"

  private val md5IntText = md5IntSql("text")

  /** 60-bit md5-derived long (15 hex chars — the widest prefix that
    * cannot overflow a signed BIGINT in either engine, the same width
    * as [[Dedup]]'s SimHash fingerprint): the key-compression hash for
    * fact-proportional join/group keys like n-grams, where 32 bits
    * would collide at corpus scale.
    */
  private[graft] def md5Long(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB text twin of [[md5Long]]. */
  private[graft] def md5LongSql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Executor-local twin of [[md5Long]], bit-identical to the column
    * form (lowercase-hex md5 of the UTF-8 bytes, first 15 hex chars) —
    * for streaming per-record paths.
    */
  private[graft] def md5LongLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = the top 7.5 bytes of the digest
    val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Whitespace token count — the corpus-wide tokenization convention
    * (split on single space, drop empties), shared with the stream twin.
    */
  private[graft] def tokCount(c: org.apache.spark.sql.Column) =
    size(filter(split(c, " "), w => w =!= "")).cast("long")

  /** Deterministic packing-bucket assignment, shared with the stream twin. */
  private[graft] def bucketOf(c: org.apache.spark.sql.Column, nBuckets: Long) =
    md5Int(c) % nBuckets

  /** GPT-style sequence packing map: concatenating each bucket's
    * documents in doc_id order and slicing every $CtxLen tokens, which
    * contexts does each document land in? Output per doc: the bucket,
    * the token start offset in the bucket stream, and the first/last
    * context index it occupies. Empty documents carry no tokens and are
    * excluded. The packing is fully deterministic: md5 buckets,
    * doc_id order.
    */
  private def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequencesOf(docs(s, dir))

  private[pipeline] def packSequencesOf(d: DataFrame): DataFrame = {
    val nDocs = d.count()
    packSequencesOf(d, math.max(32L, (nDocs + DocsPerBucket - 1) / DocsPerBucket))
  }

  private[graft] def packSequencesOf(d: DataFrame, nBuckets: Long): DataFrame =
    packCore(d, nBuckets).orderBy("doc_id")

  /** The packing map without the output ordering (shared by the per-doc
    * query and the per-context rollup).
    */
  private def packCore(d: DataFrame, nBuckets: Long): DataFrame = {
    val byDoc = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.select(col("doc_id"), tokCount(col("text")).as("n_toks"),
        bucketOf(col("text"), nBuckets).as("bucket"))
      .filter(col("n_toks") >= 1)
      .withColumn("end_off", sum(col("n_toks")).over(byDoc))
      .select(col("doc_id"), col("bucket"), col("n_toks"),
        (col("end_off") - col("n_toks")).as("start_off"),
        floor((col("end_off") - col("n_toks")) / lit(CtxLen.toDouble)).cast("long").as("ctx_first"),
        floor((col("end_off") - 1L) / lit(CtxLen.toDouble)).cast("long").as("ctx_last"))
  }

  /** Shared DuckDB CTE chain: the packing map (doc_id, bucket, n_toks,
    * start_off, ctx_first, ctx_last) as relation `pk`.
    */
  private val packCte =
    s"""n AS (SELECT GREATEST(32, CAST(CEIL(COUNT(*) / $DocsPerBucket.0) AS BIGINT)) AS b
      |      FROM documents),
      |t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_toks,
      |    $md5IntText % n.b AS bucket
      |  FROM documents, n),
      |p AS (
      |  SELECT doc_id, bucket, n_toks,
      |    SUM(n_toks) OVER (PARTITION BY bucket ORDER BY doc_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
      |  FROM t WHERE n_toks >= 1),
      |pk AS (
      |  SELECT doc_id, bucket, n_toks, CAST(end_off - n_toks AS BIGINT) AS start_off,
      |    CAST(FLOOR((end_off - n_toks) / $CtxLen.0) AS BIGINT) AS ctx_first,
      |    CAST(FLOOR((end_off - 1) / $CtxLen.0) AS BIGINT) AS ctx_last
      |  FROM p)""".stripMargin

  private val packSql =
    s"""WITH $packCte
      |SELECT doc_id, bucket, n_toks, start_off, ctx_first, ctx_last
      |FROM pk ORDER BY doc_id""".stripMargin

  /** Per-context packing rollup: for every (bucket, context) the number
    * of documents intersecting it and its token fill. Concat-and-slice
    * fills every context exactly except each bucket's tail, so the
    * interesting numbers are fragmentation (docs per context) and tail
    * waste — the packing-efficiency metrics. The expansion is one row
    * per (doc, context) span ≈ corpus_tokens/$CtxLen rows: linear, all
    * map-side until the final (bucket, ctx) aggregate.
    */
  private def packContexts(s: SparkSession, dir: String): DataFrame =
    packContextsOf(docs(s, dir))

  private[pipeline] def packContextsOf(d: DataFrame): DataFrame = {
    val nDocs = d.count()
    val core = packCore(d, math.max(32L, (nDocs + DocsPerBucket - 1) / DocsPerBucket))
    core.select(col("bucket"), col("start_off"),
        (col("start_off") + col("n_toks")).as("end_off"),
        explode(sequence(col("ctx_first"), col("ctx_last"))).as("ctx"))
      .select(col("bucket"), col("ctx"),
        (least(col("end_off"), (col("ctx") + 1L) * CtxLen) -
          greatest(col("start_off"), col("ctx") * CtxLen)).as("toks"))
      .groupBy("bucket", "ctx")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy("bucket", "ctx")
  }

  private val packCtxSql =
    s"""WITH $packCte,
      |e AS (
      |  SELECT bucket, c.ctx,
      |    LEAST(start_off + n_toks, (c.ctx + 1) * $CtxLen)
      |      - GREATEST(start_off, c.ctx * $CtxLen) AS toks
      |  FROM pk, UNNEST(generate_series(pk.ctx_first, pk.ctx_last)) AS c(ctx))
      |SELECT bucket, ctx, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shards used by the export QUERY (the writer takes its own). */
  private[pipeline] val NShards = 16L

  /** Deterministic shard manifest: every document maps to shard
    * md5 % $NShards; output is the per-shard rollup (doc/token/char
    * totals and the doc_id range) that an export job publishes next to
    * the data — uniformity is readable off the doc counts.
    */
  private def exportShards(s: SparkSession, dir: String): DataFrame =
    exportShardsOf(docs(s, dir))

  private[pipeline] def withShard(d: DataFrame, nShards: Long): DataFrame =
    d.withColumn("shard", md5Int(col("text")) % nShards)

  private[pipeline] def exportShardsOf(d: DataFrame): DataFrame =
    withShard(d, NShards)
      .withColumn("n_toks", tokCount(col("text")))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("shard")

  private val shardsSql =
    s"""SELECT $md5IntText % $NShards AS shard, COUNT(*) AS n_docs,
      |  CAST(SUM(CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Physical sharded writer: one shuffle on the shard key, per-shard
    * doc_id-sorted parquet under `path/shard=<k>/`. The shard column is
    * the same md5 assignment the manifest query publishes, so the
    * manifest and the files agree by construction.
    */
  def writeShards(d: DataFrame, path: String, nShards: Int): Unit =
    withShard(d, nShards.toLong)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)

  /** Top tokens of the whole corpus. */
  private[pipeline] val VocabTopK = 100

  /** Vocabulary coverage curve: the $VocabTopK most frequent tokens
    * with each prefix's cumulative share of all corpus tokens — the
    * standard "how much does a K-entry vocab cover" diagnostic before
    * tokenizer training. The top-K comes from a distributed TakeOrdered;
    * the rank/cumulative windows run over ≤ K rows.
    */
  private def vocabCoverage(s: SparkSession, dir: String): DataFrame =
    vocabCoverageOf(docs(s, dir))

  private[pipeline] def vocabCoverageOf(d: DataFrame): DataFrame = {
    // materialized once: the total-tokens broadcast subtree and the
    // top-K path would otherwise each pay the full tokenize+aggregate
    // corpus pass
    val counts = Pipelines.tracked(d.sparkSession, d
      .select(explode(filter(split(col("text"), " "), w => w =!= "")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt")))
    counts.count()
    val total = counts.agg(sum(col("cnt")).as("total"))
    val byCnt = Window.orderBy(col("cnt").desc, col("token").asc)
    val cum = Window.orderBy(col("cnt").desc, col("token").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // global top-K via TakeOrderedAndProject (per-partition heaps, K rows
    // to the driver) — an UNPARTITIONED rank filter gets no
    // WindowGroupLimit rewrite, so orderBy+limit is the distributed form;
    // the rank/cumsum windows then run over ≤ K rows
    counts.orderBy(col("cnt").desc, col("token").asc).limit(VocabTopK)
      .withColumn("rank", row_number().over(byCnt).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("cnt"),
        Rnd.jround(sum(col("cnt")).over(cum) / col("total"), 6).as("coverage"))
      .orderBy("rank")
  }

  private val vocabSql =
    s"""WITH c AS (
      |  SELECT t.token, COUNT(*) AS cnt
      |  FROM documents, UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS t(token)
      |  GROUP BY 1),
      |tot AS (SELECT SUM(cnt) AS total FROM c),
      |r AS (SELECT token, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank FROM c)
      |SELECT rank, token, cnt,
      |  ${Rnd.jroundSql(
           "SUM(cnt) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total", 6)} AS coverage
      |FROM r, tot WHERE rank <= $VocabTopK ORDER BY rank""".stripMargin

  // ---- seeded deterministic global shuffle (training order) -----------

  /** Epoch seed of the registered query; a new epoch is a new seed
    * string, not a new algorithm.
    */
  private[graft] val ShuffleSeed = "epoch-42:"
  private val ShuffleShards = 8L

  /** Seeded deterministic global shuffle — the training-order
    * primitive: every document gets a unique position 0..N−1 in the
    * order of md5(seed ‖ doc_id), plus its round-robin shard. Scale
    * shape: the leading hex chars of the sort key (width adaptive in
    * the corpus size — [[adaptiveHexChars]]) are a PREFIX of the global
    * order, so positions come from per-bucket ranks plus a small
    * broadcast offset table — never a single-partition global
    * row_number. Determinism: same seed ⇒ same permutation on any
    * cluster at ANY bucket width; no RNG state, no driver coordination.
    */
  private def exportShuffled(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // the width probe's row count is memoized per session+dir: a parquet
    // count is footer-cheap but still a job, and it must not re-run on
    // every call (Bench repeats, multi-epoch sessions)
    val n = Pipelines.cachedObj(s, s"export.docCount:$dir")(
      java.lang.Long.valueOf(d.count())).longValue()
    shuffledOf(d, ShuffleSeed, adaptiveHexChars(n))
  }

  /** Per-bucket rank-sort budget: the adaptive prefix keeps each
    * bucket's in-task sort at roughly this many rows.
    */
  private val BucketRankRows = 4000000L

  /** Adaptive bucket width (hex chars of the md5 key): the smallest
    * prefix in [2, 5] whose 16^p buckets hold ≤ [[BucketRankRows]] rows
    * each in expectation — the same grow-with-the-corpus rule as
    * `IndexOps.adaptiveDepth`. Fixed at 2 (r8) each bucket sorted N/256
    * keys in ONE task: a multi-GB single-task sort at 10^10–10^11 docs.
    * The cap of 5 bounds the offset table at 16^5 ≈ 1M rows (~25 MB
    * broadcast, single-task prefix-sum still trivial) — headroom to
    * ~4·10^12 docs, far past a 100 TB corpus. The OUTPUT is
    * width-invariant by construction (the bucket is a PREFIX of the
    * global sort key, so per-bucket rank + offset = global rank at any
    * width — SplitShuffleSpec pins byte-equality at 2 vs 3).
    */
  private[pipeline] def adaptiveHexChars(n: Long): Int = {
    var p = 2
    var cap = BucketRankRows * 256L
    while (p < 5 && n > cap) { p += 1; cap *= 16L }
    p
  }

  /** `hexChars` = 0 derives the width from `d.count()` AT CONSTRUCTION
    * (an eager job — correctness-first fallback for ad-hoc callers);
    * the registered query passes the width explicitly from a memoized
    * count so plan construction stays action-free on the hot path.
    */
  private[graft] def shuffledOf(d: DataFrame, seed: String, hexChars: Int = 0): DataFrame = {
    val width = if (hexChars > 0) hexChars else adaptiveHexChars(d.count())
    val keyed = d.select(col("doc_id"),
        md5(concat(lit(seed), col("doc_id").cast("string"))).as("k"))
      .withColumn("bucket", substring(col("k"), 1, width))
    val inBucket = Window.partitionBy("bucket").orderBy(col("k"), col("doc_id"))
    val ranked = keyed.withColumn("r", row_number().over(inBucket).cast("long"))
    // rows BEFORE each bucket in global key order — ≤ 16^width rows, so
    // the unpartitioned window is a constant-size driver-light aggregate
    val offsets = ranked.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "off")
    ranked.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), (col("off") + col("r") - 1L).as("pos"))
      .withColumn("shard", col("pos") % ShuffleShards)
      .orderBy("pos")
  }

  private val shuffledSql = {
    val rn = s"ROW_NUMBER() OVER (ORDER BY md5('$ShuffleSeed' || CAST(doc_id AS VARCHAR)), doc_id)"
    s"""SELECT doc_id, CAST($rn - 1 AS BIGINT) AS pos,
      |  CAST(($rn - 1) % $ShuffleShards AS BIGINT) AS shard
      |FROM documents ORDER BY pos""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "export_shuffled" -> QueryDef.sql(exportShuffled, shuffledSql,
      "seeded deterministic global shuffle (training order): md5-keyed " +
        "permutation via per-bucket ranks + 256-row offset table, " +
        "round-robin shards"),
    "pack_sequences" -> QueryDef.sql(packSequences, packSql,
      s"GPT-style concat-and-slice packing into $CtxLen-token contexts over scaling md5 buckets"),
    "pack_contexts" -> QueryDef.sql(packContexts, packCtxSql,
      "per-context packing rollup: docs-per-context fragmentation + tail fill"),
    "export_shards" -> QueryDef.sql(exportShards, shardsSql,
      s"deterministic md5 shard manifest ($NShards shards) with per-shard doc/token/char rollups"),
    "vocab_coverage" -> QueryDef.sql(vocabCoverage, vocabSql,
      s"top-$VocabTopK token vocabulary with cumulative corpus coverage (TakeOrdered global top-K)"))
}
