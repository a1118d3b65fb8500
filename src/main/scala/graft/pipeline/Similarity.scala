package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{QueryDef, Tables}

/** Similarity search over the embedding column (SURVEY §7.1 step 10 /
  * driver north-star). Two paths:
  *
  *  - brute-force cosine top-k (the correctness baseline): query set is
  *    broadcast; the corpus scan is embarrassingly parallel; per-query
  *    top-k via window rank. Wrong plan at 100 TB only if the query set is
  *    large — then switch to the LSH-bucketed variant;
  *  - sign-LSH bucketed ANN: 16-bit random-hyperplane sketch (hyperplanes
  *    derived deterministically from md5, no RNG), equi-join on bucket →
  *    candidates → exact re-rank. One shuffle on the bucket key.
  *
  * Dot products use integer-scaled elements (×10⁴, exact long arithmetic
  * via a sequential `aggregate` fold) so results are bit-identical across
  * engines and the ranking is stable.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .withColumn("iv", expr("transform(embedding, v -> cast(round(cast(v as double) * 10000) as bigint))"))
      .withColumn("nrm2", expr("aggregate(iv, 0L, (acc, x) -> acc + x*x)"))

  /** Brute-force cosine top-5: queries = vec_id < 10, corpus = the rest. */
  private def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("iv").as("qiv"), col("nrm2").as("qn"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("c_id"), col("iv").as("civ"), col("nrm2").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("dot", expr(
        "aggregate(zip_with(qiv, civ, (a, b) -> a*b), 0L, (acc, x) -> acc + x)"))
      .withColumn("cos", round(col("dot") / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), col("c_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("q_id", "rk", "c_id", "cos")
      .orderBy("q_id", "rk")
  }

  // The oracle unnests both vectors positionally; products and norms are
  // exact BIGINTs, so SUM order does not matter.
  private val cosineSql =
    """WITH iv AS (
      |  SELECT vec_id,
      |    list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS iv
      |  FROM embeddings
      |), flat AS (
      |  SELECT vec_id, UNNEST(iv) AS x, UNNEST(generate_series(1, len(iv))) AS i FROM iv
      |), nrm AS (
      |  SELECT vec_id, CAST(SUM(x*x) AS BIGINT) AS n2 FROM flat GROUP BY 1
      |), dots AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS c_id, CAST(SUM(q.x * c.x) AS BIGINT) AS dot
      |  FROM flat q JOIN flat c ON q.i = c.i
      |  WHERE q.vec_id < 10 AND c.vec_id >= 10
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT d.q_id, d.c_id,
      |    ROUND(d.dot / (SQRT(nq.n2) * SQRT(nc.n2)), 6) AS cos
      |  FROM dots d JOIN nrm nq ON d.q_id = nq.vec_id JOIN nrm nc ON d.c_id = nc.vec_id
      |), ranked AS (
      |  SELECT q_id, c_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
      |  FROM scored
      |)
      |SELECT q_id, rk, c_id, cos FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** Sign-LSH sketch: bit b = sign(Σ_d s(b,d)·x_d) where s(b,d) ∈ {−1,+1}
    * comes from a parity of md5(b‖','‖d) — deterministic pseudo-random
    * hyperplanes. Bucket = 16-bit sketch; ANN = same-bucket candidates
    * re-ranked exactly. Reported: per-query top-3 among bucket mates.
    */
  /** Deterministic ±1 hyperplane matrix (16 bits × up to 256 dims) derived
    * from md5 parity — computed once at plan build, embedded as a literal
    * so the per-row work is pure arithmetic inside codegen.
    */
  private lazy val signMatrix: Array[Array[Int]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(16, 256) { (b, d) =>
      val h = digest.digest(s"$b,$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1 else -1
    }
  }

  private def lshAnn(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val signs = signMatrix // stable closure copy for the UDF
    val sketchUdf = udf { iv: Seq[Long] =>
      var sk = 0L
      var b = 0
      while (b < 16) {
        var dot = 0L; var d = 0
        while (d < iv.length) { dot += signs(b)(d) * iv(d); d += 1 }
        if (dot > 0) sk |= (1L << b)
        b += 1
      }
      sk
    }
    val sketch = e.withColumn("sketch", sketchUdf(col("iv")))
    val l = sketch.select(col("sketch"), col("vec_id").as("q_id"), col("iv").as("qiv"), col("nrm2").as("qn"))
    val r = sketch.select(col("sketch"), col("vec_id").as("c_id"), col("iv").as("civ"), col("nrm2").as("cn"))
    val scored = l.join(r, "sketch").filter(col("q_id") =!= col("c_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(qiv, civ, (a, b) -> a*b), 0L, (acc, x) -> acc + x)"))
      .withColumn("cos", round(col("dot") / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), col("c_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "c_id", "cos")
      .orderBy("q_id", "rk")
  }

  val defs: Map[String, QueryDef] = Map(
    "sim_cosine_topk" -> QueryDef.sql(cosineTopK, cosineSql),
    "sim_lsh_ann" -> QueryDef.rowsOnly(lshAnn,
      "sign-LSH bucketed ANN with exact re-rank (scale path for sim_cosine_topk)"))
}
