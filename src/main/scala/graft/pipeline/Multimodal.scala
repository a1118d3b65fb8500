package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{QueryDef, Tables}

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata. The decode/feature-extract step is
  * STUBBED (no media libraries in this environment) with a deterministic
  * fake decoder; everything Spark-side — schema, batching, partitioning,
  * per-partition invocation shape — is real. In production the stub body is
  * replaced by a JNI/FFI call (or `mapInPandas`/`mapInArrow` from PySpark
  * bindings); the dataflow is identical.
  *
  * The testdata has no binary column, so payloads are the UTF-8 bytes of
  * `documents.text` — the plumbing does not care. The texts are ASCII, so
  * the DuckDB oracle can recompute the stub byte-exactly via ascii().
  */
object Multimodal {

  /** Decoded-feature record produced per payload by the stub decoder. */
  final case class Decoded(
      doc_id: Long,
      width: Long,
      features: Array[Double],
      sampled_n: Long,
      sampled_sum: Long)

  private def payloads(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Metadata extraction on the binary column — pure built-ins, stays in
    * whole-stage codegen.
    */
  private def meta(s: SparkSession, dir: String): DataFrame =
    payloads(s, dir)
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("header_hex", hex(substring(col("payload"), 1, 4)))
      .withColumn("digest", md5(col("payload")))
      .select("doc_id", "byte_len", "header_hex", "digest")
      .orderBy("doc_id")

  private val metaSql =
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
      |  substr(hex(CAST(text AS BLOB)), 1, 8) AS header_hex,
      |  md5(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** STUB decoder: stands in for image decode + feature extraction.
    * Deterministic: "pixels" are the payload bytes; features are 8 mean
    * values over equal byte stripes ("resize to 8"), plus a frame-sample
    * of every 64th byte. Runs per-partition over a typed iterator (the
    * exact batch shape a vectorized/FFI decoder needs) — Dataset
    * `mapPartitions`, not the raw RDD API, so the optimizer stays in
    * play. Empty payloads yield zero features (no crash). Output is all
    * scalar columns so downstream compares/sorts work.
    */
  private def decodeStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = payloads(s, dir).as[(Long, Array[Byte])]
    val decoded = in.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val n = bytes.length
        val stripes = 8
        // ??? real decoder goes here; deterministic fake below
        val feat =
          if (n == 0) Array.fill(stripes)(0.0)
          else Array.tabulate(stripes) { k =>
            val from = k * n / stripes
            val until = math.max(from + 1, (k + 1) * n / stripes)
            var sum = 0L
            var i = from
            while (i < until) { sum += (bytes(i) & 0xff); i += 1 }
            sum.toDouble / (until - from)
          }
        val idxs = if (n == 0) Array.empty[Int] else bytes.indices.by(64).toArray
        Decoded(id, n.toLong, feat,
          idxs.length.toLong, idxs.map(i => (bytes(i) & 0xff).toLong).sum)
      }
    }
    decoded.toDF()
      .select(
        col("doc_id") +: col("width") +:
          (0 until 8).map(k => graft.util.Rnd.jround(col("features")(k), 6).as(s"f$k")) :+
          col("sampled_n") :+ col("sampled_sum"): _*)
      .orderBy("doc_id")
  }

  private val decodeSql =
    """WITH b AS (
      |  SELECT doc_id, text, length(text) AS n FROM documents
      |), stripes AS (
      |  SELECT b.doc_id, b.n, ks.k,
      |    (ks.k * b.n) // 8 AS frm,
      |    GREATEST((ks.k * b.n) // 8 + 1, ((ks.k + 1) * b.n) // 8) AS untl
      |  FROM b, (SELECT UNNEST(RANGE(8)) AS k) ks
      |  WHERE b.n > 0
      |), feat AS (
      |  SELECT s.doc_id, s.k,
      |    FLOOR(SUM(ascii(substr(b2.text, CAST(p.p AS INTEGER), 1)))
      |          / CAST(s.untl - s.frm AS DOUBLE) * 1e6 + 0.5) / 1e6 AS f
      |  FROM stripes s
      |  JOIN b b2 ON s.doc_id = b2.doc_id,
      |  UNNEST(generate_series(s.frm + 1, s.untl)) AS p(p)
      |  GROUP BY s.doc_id, s.k, s.untl, s.frm
      |), fw AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN k = 0 THEN f END) AS f0, MAX(CASE WHEN k = 1 THEN f END) AS f1,
      |    MAX(CASE WHEN k = 2 THEN f END) AS f2, MAX(CASE WHEN k = 3 THEN f END) AS f3,
      |    MAX(CASE WHEN k = 4 THEN f END) AS f4, MAX(CASE WHEN k = 5 THEN f END) AS f5,
      |    MAX(CASE WHEN k = 6 THEN f END) AS f6, MAX(CASE WHEN k = 7 THEN f END) AS f7
      |  FROM feat GROUP BY doc_id
      |), samp AS (
      |  SELECT b.doc_id, COUNT(*) AS sampled_n,
      |    CAST(SUM(ascii(substr(b.text, CAST(p.p AS INTEGER), 1))) AS BIGINT) AS sampled_sum
      |  FROM b, UNNEST(generate_series(1, b.n, 64)) AS p(p)
      |  WHERE b.n > 0
      |  GROUP BY b.doc_id
      |)
      |SELECT b.doc_id, CAST(b.n AS BIGINT) AS width,
      |  COALESCE(fw.f0, 0.0) AS f0, COALESCE(fw.f1, 0.0) AS f1,
      |  COALESCE(fw.f2, 0.0) AS f2, COALESCE(fw.f3, 0.0) AS f3,
      |  COALESCE(fw.f4, 0.0) AS f4, COALESCE(fw.f5, 0.0) AS f5,
      |  COALESCE(fw.f6, 0.0) AS f6, COALESCE(fw.f7, 0.0) AS f7,
      |  COALESCE(samp.sampled_n, 0) AS sampled_n,
      |  COALESCE(samp.sampled_sum, 0) AS sampled_sum
      |FROM b
      |LEFT JOIN fw ON b.doc_id = fw.doc_id
      |LEFT JOIN samp ON b.doc_id = samp.doc_id
      |ORDER BY b.doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "mm_binary_meta" -> QueryDef.sql(meta, metaSql),
    "mm_decode_features" -> QueryDef.sql(decodeStub, decodeSql))
}
