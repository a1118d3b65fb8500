package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Pipelines, QueryDef}

/** Document clustering over the embedding column, plus the curation op
  * it enables: cluster-balanced subsampling (take a per-cluster quota so
  * the sample covers the embedding space instead of its densest mode —
  * the diversity-sampling recipe behind SemDeDup/DSIR-style pipelines,
  * public literature).
  *
  * K-means is deterministic and engine-portable by the same construction
  * as [[Similarity]]'s IVF centroids: seeds = the K smallest vec_ids,
  * assignment by cosine, and a centroid is the element-wise INTEGER SUM
  * of its members — cosine is scale-invariant, so the sum stands in for
  * the mean and every score is exact BIGINT-over-sqrt arithmetic that
  * DuckDB reproduces bit-for-bit. Two Lloyd iterations (fixed, so the
  * oracle is plain SQL — no recursion); empty clusters drop out of the
  * GROUP BY identically in both engines.
  *
  * Scale shape: centroids are model-sized (K rows) and broadcast; each
  * Lloyd iteration is one map-side scored scan + one keyed aggregation —
  * the textbook distributed k-means round. The quota sample adds one
  * per-cluster windowed top-N on a deterministic md5 order.
  */
object Cluster {

  /** Cluster count (model-sized: K centroids broadcast). */
  private val K = 16

  /** Per-cluster quota for the balanced sample. */
  private val Quota = 8

  import Similarity.{assignCells, centroidSums, emb, ivfCentroids}

  /** Two Lloyd iterations over `base` (id, iv) → (id, cell), built from
    * the ONE assignment/centroid-sum implementation ([[Similarity]]).
    */
  private[pipeline] def kmeansOf(base: DataFrame, k: Int): DataFrame = {
    val cent1 = ivfCentroids(base, k) // seeds → assign → sums = iteration 1
    val cent2 = centroidSums(assignCells(base, cent1), base) // iteration 2
    assignCells(base, cent2)
  }

  /** Final (vec_id → cluster) assignment after two Lloyd iterations,
    * cached: the kmeans query and the balanced sample share it.
    */
  private def kmeansAssign(s: SparkSession, dir: String): DataFrame =
    Pipelines.cachedDF(s, s"cluster.km:$dir") {
      kmeansOf(emb(s, dir).select(col("vec_id").as("id"), col("iv")), K)
    }

  /** (vec_id, cluster, csize) after two Lloyd iterations. */
  private def kmeans(s: SparkSession, dir: String): DataFrame = {
    val m = kmeansAssign(s, dir)
    val sizes = m.groupBy("cell").agg(count(lit(1)).as("csize"))
    m.join(sizes, "cell")
      .select(col("id").as("vec_id"), col("cell").as("cluster"), col("csize"))
      .orderBy("vec_id")
  }

  /** Cluster-balanced subsample: per cluster, the $Quota members with
    * the smallest md5("cs:" ‖ vec_id) — a deterministic pseudo-random
    * draw (the corpus hash convention, [[Export.md5Long]]), so the
    * sample is reproducible and engine-portable. `pick` is the 1-based
    * draw order within the cluster.
    */
  private def balancedSample(s: SparkSession, dir: String): DataFrame = {
    val m = kmeansAssign(s, dir)
    val h = Export.md5Long(concat(lit("cs:"), col("id")))
    val w = Window.partitionBy("cell").orderBy(col("h"), col("id"))
    m.withColumn("h", h)
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter(col("pick") <= Quota)
      .select(col("id").as("vec_id"), col("cell").as("cluster"), col("pick"))
      .orderBy("vec_id")
  }

  /** One assignment round in SQL: score every vector against centroid
    * CTE `cent` (cell, i, cx / `centn` cell, cn2), keep the argmax.
    * Emits `<p>a` (scores) / `<p>r` (ranked) / `<p>m` (id → cell).
    */
  private def assignCtes(cent: String, centn: String, p: String): String =
    s"""${p}a AS (
      |  SELECT f.vec_id AS id, c.cell, SUM(f.x * c.cx) AS dot
      |  FROM flat f JOIN $cent c ON c.i = f.i
      |  GROUP BY 1, 2
      |), ${p}r AS (
      |  SELECT ${p}a.id, ${p}a.cell,
      |    ROW_NUMBER() OVER (PARTITION BY ${p}a.id ORDER BY ${p}a.dot / SQRT(n.cn2) DESC, ${p}a.cell) AS rn
      |  FROM ${p}a JOIN $centn n ON n.cell = ${p}a.cell
      |), ${p}m AS (SELECT id, cell FROM ${p}r WHERE rn = 1)""".stripMargin

  /** Centroid integer sums of assignment CTE `m`: `<p>c` / `<p>cn`. */
  private def sumCtes(m: String, p: String): String =
    s"""${p}c AS (
      |  SELECT $m.cell, f.i, SUM(f.x) AS cx
      |  FROM $m JOIN flat f ON f.vec_id = $m.id
      |  GROUP BY 1, 2
      |), ${p}cn AS (SELECT cell, SUM(cx * cx) AS cn2 FROM ${p}c GROUP BY 1)""".stripMargin

  /** Seeds (as a degenerate centroid table) + two Lloyd iterations:
    * final assignment CTE is `k2m`.
    */
  private val kmeansCtes =
    s"""kseed AS (SELECT vec_id AS cell FROM iv ORDER BY vec_id LIMIT $K
      |), k0c AS (
      |  SELECT s.cell, f.i, f.x AS cx FROM kseed s JOIN flat f ON f.vec_id = s.cell
      |), k0cn AS (SELECT cell, SUM(cx * cx) AS cn2 FROM k0c GROUP BY 1
      |), ${assignCtes("k0c", "k0cn", "k0")},
      |${sumCtes("k0m", "k1")},
      |${assignCtes("k1c", "k1cn", "k1")},
      |${sumCtes("k1m", "k2")},
      |${assignCtes("k2c", "k2cn", "k2")}""".stripMargin

  private val kmeansSql =
    s"""WITH ${Similarity.baseCtes}, $kmeansCtes,
      |sizes AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS csize FROM k2m GROUP BY 1)
      |SELECT m.id AS vec_id, m.cell AS cluster, s.csize
      |FROM k2m m JOIN sizes s ON s.cell = m.cell
      |ORDER BY vec_id""".stripMargin

  private val sampleSql =
    s"""WITH ${Similarity.baseCtes}, $kmeansCtes,
      |picked AS (
      |  SELECT id, cell,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY cell
      |      ORDER BY ('0x' || substr(md5('cs:' || id), 1, 15))::BIGINT, id) AS BIGINT) AS pick
      |  FROM k2m)
      |SELECT id AS vec_id, cell AS cluster, pick
      |FROM picked WHERE pick <= $Quota
      |ORDER BY vec_id""".stripMargin

  /** Per-cluster curation profile: each k-means cluster joined back to
    * its documents (vec_id ≡ doc_id in the corpus) — member count,
    * exact total characters, and the dominant language (ties → smaller
    * lang, the engine-wide rule). The inspection step between
    * clustering and a sampling/filtering decision; one fact⋈fact join
    * on the id plus a two-level aggregation.
    */
  private def clusterProfile(s: SparkSession, dir: String): DataFrame = {
    val m = kmeansAssign(s, dir)
    val d = graft.util.Tables.load(s, dir, "documents")
      .select(col("doc_id").as("id"), col("lang"), col("n_chars"))
    val joined = m.join(d, "id")
    val byLang = joined.groupBy("cell", "lang")
      .agg(count(lit(1)).as("ln"), sum("n_chars").as("lchars"))
    val w = Window.partitionBy("cell").orderBy(desc("ln"), col("lang"))
    byLang
      .withColumn("rn", row_number().over(w))
      .groupBy("cell")
      .agg(sum("ln").as("n_docs"), sum("lchars").as("total_chars"),
        min(when(col("rn") === 1, col("lang"))).as("top_lang"),
        min(when(col("rn") === 1, col("ln"))).as("top_lang_docs"))
      .select(col("cell").as("cluster"), col("n_docs"), col("total_chars"),
        col("top_lang"), col("top_lang_docs"))
      .orderBy("cluster")
  }

  private val profileSql =
    s"""WITH ${Similarity.baseCtes}, $kmeansCtes,
      |bylang AS (
      |  SELECT m.cell, d.lang, CAST(COUNT(*) AS BIGINT) AS ln,
      |    CAST(SUM(d.n_chars) AS BIGINT) AS lchars
      |  FROM k2m m JOIN documents d ON d.doc_id = m.id
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT cell, lang, ln, lchars,
      |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY ln DESC, lang) AS rn
      |  FROM bylang)
      |SELECT cell AS cluster, CAST(SUM(ln) AS BIGINT) AS n_docs,
      |  CAST(SUM(lchars) AS BIGINT) AS total_chars,
      |  MIN(CASE WHEN rn = 1 THEN lang END) AS top_lang,
      |  MIN(CASE WHEN rn = 1 THEN ln END) AS top_lang_docs
      |FROM ranked GROUP BY cell ORDER BY cluster""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "cluster_profile" -> QueryDef.sql(clusterProfile, profileSql,
      "per-cluster curation profile: member count, exact char mass, " +
        "dominant language — kmeans clusters joined back to documents"),
    "embed_kmeans" -> QueryDef.sql(kmeans, kmeansSql,
      s"deterministic $K-means over embeddings (integer-sum centroids, " +
        "2 Lloyd iterations): vector → cluster + cluster size"),
    "sample_clusters" -> QueryDef.sql(balancedSample, sampleSql,
      s"cluster-balanced subsample: per-cluster quota of $Quota by " +
        "deterministic md5 draw order — diversity sampling for curation"))
}
