package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.{QueryDef, Tables}

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata. The decode/feature-extract step is
  * STUBBED (no media libraries in this environment) with a deterministic
  * fake decoder; everything Spark-side — schema, batching, partitioning,
  * per-partition invocation shape — is real. In production the stub body is
  * replaced by a JNI/FFI call (or `mapInPandas` from PySpark bindings); the
  * dataflow is identical.
  *
  * The testdata has no binary column, so payloads are the UTF-8 bytes of
  * `documents.text` — the plumbing does not care.
  */
object Multimodal {

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
    * values over equal byte stripes ("resize to 8"), plus a frame-sample of
    * every 64th byte. Runs per-partition over an iterator — the exact
    * batch shape a vectorized/FFI decoder needs.
    */
  private def decodeStub(s: SparkSession, dir: String): DataFrame = {
    val in = payloads(s, dir)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("sampled_bytes", ArrayType(LongType, containsNull = false), nullable = false)))
    val rdd = in.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = bytes.length
        // ??? real decoder goes here; deterministic fake below
        val stripes = 8
        val feat = Array.tabulate(stripes) { k =>
          val from = k * n / stripes; val until = math.max(from + 1, (k + 1) * n / stripes)
          var sum = 0L; var i = from
          while (i < until) { sum += (bytes(i) & 0xff); i += 1 }
          sum.toDouble / (until - from)
        }
        val sampled = bytes.indices.by(64).map(i => (bytes(i) & 0xff).toLong).toArray
        Row(id, n.toLong, feat, sampled)
      }
    }
    s.createDataFrame(rdd, outSchema).orderBy("doc_id")
  }

  val defs: Map[String, QueryDef] = Map(
    "mm_binary_meta" -> QueryDef.sql(meta, metaSql),
    "mm_decode_features" -> QueryDef.rowsOnly(decodeStub,
      "stubbed media decode → typed feature columns (per-partition batch shape)"))
}
