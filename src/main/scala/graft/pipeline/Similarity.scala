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
      .withColumn("cos", graft.util.Rnd.jround(col("dot") / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
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
      |    FLOOR(d.dot / (SQRT(nq.n2) * SQRT(nc.n2)) * 1e6 + 0.5) / 1e6 AS cos
      |  FROM dots d JOIN nrm nq ON d.q_id = nq.vec_id JOIN nrm nc ON d.c_id = nc.vec_id
      |), ranked AS (
      |  SELECT q_id, c_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
      |  FROM scored
      |)
      |SELECT q_id, rk, c_id, cos FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** Sign-LSH banding: 4 hash tables × 8-bit buckets. Bit (t,b) of a
    * vector's sketch in table t = [Σ_d s(t·8+b, d)·x_d > 0], with
    * s(i,d) ∈ {−1,+1} from the parity of md5(i‖','‖d)'s first byte —
    * deterministic pseudo-random hyperplanes, engine-portable (the DuckDB
    * oracle recomputes the identical matrix). A query's candidates are
    * the union over tables of same-bucket vectors (multi-table banding —
    * recall comes from table count, not from one lucky 16-bit bucket),
    * re-ranked by exact integer cosine. One equi-join per table, no
    * cross join; at 100 TB the bucket key is the shuffle key and table
    * count scales recall without touching the corpus layout.
    */
  private val Tables_ = 4
  private val BitsPerTable = 8

  /** (vec_id, tbl, bucket) sign-LSH sketches: `tables` hash tables of
    * `bits`-bit buckets, hyperplane signs from md5 parity (deterministic,
    * engine-portable).
    */
  private def sketchesOf(s: SparkSession, e: DataFrame, tables: Int, bits: Int): DataFrame = {
    val numPlanes = tables * bits
    val digest = java.security.MessageDigest.getInstance("MD5")
    val signs = Array.tabulate(numPlanes, 64) { (i, d) =>
      val h = digest.digest(s"$i,$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1 else -1
    }
    // the sign matrix is a compile-time constant: fold each plane's dot
    // product into a codegen'd aggregate(zip_with(...)) expression — no
    // dimension explosion, no join, no extra shuffle; the sketch is a
    // per-row projection
    def planeDot(i: Int): String = {
      val arr = signs(i).map(v => s"${v}L").mkString("array(", ",", ")")
      s"aggregate(zip_with(iv, $arr, (x, s) -> x * s), 0L, (acc, x) -> acc + x)"
    }
    val bucketExprs = (0 until tables).map { t =>
      (0 until bits).map { b =>
        s"(case when ${planeDot(t * bits + b)} > 0 then ${1L << b}L else 0L end)"
      }.mkString("(", " + ", ")")
    }
    e.select(col("vec_id"),
      posexplode(expr(bucketExprs.mkString("array(", ",", ")"))).as(Seq("tbl", "bucket")))
  }

  private def lshAnn(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val sketches = sketchesOf(s, e, Tables_, BitsPerTable)

    val l = sketches.select(col("tbl"), col("bucket"), col("vec_id").as("q_id"))
      .filter(col("q_id") < 10)
    val r = sketches.select(col("tbl"), col("bucket"), col("vec_id").as("c_id"))
      .filter(col("c_id") >= 10)
    val cand = l.join(r, Seq("tbl", "bucket")).select("q_id", "c_id").distinct()

    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("iv").as("qiv"), col("nrm2").as("qn"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("c_id"), col("iv").as("civ"), col("nrm2").as("cn"))
    val scored = cand.join(broadcast(q), "q_id").join(c, "c_id")
      .withColumn("dot", expr(
        "aggregate(zip_with(qiv, civ, (a, b) -> a*b), 0L, (acc, x) -> acc + x)"))
      .withColumn("cos", graft.util.Rnd.jround(col("dot") / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), col("c_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "c_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** The oracle recomputes the sign matrix from md5 parity (first hex
    * byte), the integer sketch dots, bucket keys, candidate union and
    * the exact re-rank — all integer/deterministic arithmetic.
    */
  private val lshSql = {
    val numPlanes = Tables_ * BitsPerTable
    s"""WITH iv AS (
      |  SELECT vec_id,
      |    list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS iv
      |  FROM embeddings
      |), flat AS (
      |  SELECT vec_id, UNNEST(iv) AS x, UNNEST(generate_series(1, len(iv))) AS i FROM iv
      |), nrm AS (
      |  SELECT vec_id, CAST(SUM(x*x) AS BIGINT) AS n2 FROM flat GROUP BY 1
      |), planes AS (
      |  SELECT p.plane, d.d,
      |    CASE WHEN CAST(('0x' || substring(md5(p.plane || ',' || d.d), 1, 2)) AS INTEGER) % 2 = 0
      |         THEN 1 ELSE -1 END AS sgn
      |  FROM (SELECT UNNEST(RANGE($numPlanes)) AS plane) p,
      |       (SELECT UNNEST(RANGE(64)) AS d) d
      |), sketch AS (
      |  SELECT f.vec_id, pl.plane // $BitsPerTable AS tbl,
      |    CASE WHEN SUM(pl.sgn * f.x) > 0
      |         THEN CAST(1 AS BIGINT) << CAST(pl.plane % $BitsPerTable AS INTEGER)
      |         ELSE 0 END AS bitv
      |  FROM flat f JOIN planes pl ON f.i - 1 = pl.d
      |  GROUP BY f.vec_id, pl.plane
      |), buckets AS (
      |  SELECT vec_id, tbl, CAST(SUM(bitv) AS BIGINT) AS bucket FROM sketch GROUP BY 1, 2
      |), cand AS (
      |  SELECT DISTINCT l.vec_id AS q_id, r.vec_id AS c_id
      |  FROM buckets l JOIN buckets r ON l.tbl = r.tbl AND l.bucket = r.bucket
      |  WHERE l.vec_id < 10 AND r.vec_id >= 10
      |), dots AS (
      |  SELECT cd.q_id, cd.c_id, CAST(SUM(q.x * c.x) AS BIGINT) AS dot
      |  FROM cand cd
      |  JOIN flat q ON q.vec_id = cd.q_id
      |  JOIN flat c ON c.vec_id = cd.c_id AND q.i = c.i
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT d.q_id, d.c_id,
      |    FLOOR(d.dot / (SQRT(nq.n2) * SQRT(nc.n2)) * 1e6 + 0.5) / 1e6 AS cos
      |  FROM dots d JOIN nrm nq ON d.q_id = nq.vec_id JOIN nrm nc ON d.c_id = nc.vec_id
      |), ranked AS (
      |  SELECT q_id, c_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
      |  FROM scored
      |)
      |SELECT q_id, rk, c_id, cos FROM ranked WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  }

  // ---- embedding-cosine near-dup (dedup family) -----------------------

  /** Near-duplicate pairs by embedding cosine ≥ $DupThreshold, blocked by
    * a recall-oriented sign-LSH banding (8 tables × 4 bits — more, shorter
    * bands than the ANN search path: near-dup blocking wants recall at a
    * fixed similarity floor, not top-k precision). Candidates = pairs
    * sharing ≥1 bucket; exact integer cosine re-scores candidates; the
    * (unrounded) threshold filter is identical in both engines. At 100 TB
    * the plan is: one shuffle to sketch, one equi-join per table on the
    * bucket key, exact re-rank only on candidates — the all-pairs join
    * never happens. Blocking recall (~93% at 0.45 on the test corpus) is
    * deterministic and replicated bit-exactly by the oracle.
    */
  private val DupTables = 8
  private val DupBits = 4
  private val DupThreshold = 0.45

  private def embedCosine(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val sk = sketchesOf(s, e, DupTables, DupBits)
    val l = sk.select(col("tbl"), col("bucket"), col("vec_id").as("a"))
    val r = sk.select(col("tbl"), col("bucket"), col("vec_id").as("b"))
    val cand = l.join(r, Seq("tbl", "bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val va = e.select(col("vec_id").as("a"), col("iv").as("aiv"), col("nrm2").as("an"))
    val vb = e.select(col("vec_id").as("b"), col("iv").as("biv"), col("nrm2").as("bn"))
    cand.join(va, "a").join(vb, "b")
      .withColumn("dot", expr(
        "aggregate(zip_with(aiv, biv, (x, y) -> x*y), 0L, (acc, x) -> acc + x)"))
      .withColumn("cosRaw", col("dot") / (sqrt(col("an")) * sqrt(col("bn"))))
      .filter(col("cosRaw") >= DupThreshold)
      .withColumn("cos", graft.util.Rnd.jround(col("cosRaw"), 6))
      .select("a", "b", "cos")
      .orderBy("a", "b")
  }

  private val embedCosineSql = {
    val numPlanes = DupTables * DupBits
    s"""WITH iv AS (
      |  SELECT vec_id,
      |    list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS iv
      |  FROM embeddings
      |), flat AS (
      |  SELECT vec_id, UNNEST(iv) AS x, UNNEST(generate_series(1, len(iv))) AS i FROM iv
      |), nrm AS (
      |  SELECT vec_id, CAST(SUM(x*x) AS BIGINT) AS n2 FROM flat GROUP BY 1
      |), planes AS (
      |  SELECT p.plane, d.d,
      |    CASE WHEN CAST(('0x' || substring(md5(p.plane || ',' || d.d), 1, 2)) AS INTEGER) % 2 = 0
      |         THEN 1 ELSE -1 END AS sgn
      |  FROM (SELECT UNNEST(RANGE($numPlanes)) AS plane) p,
      |       (SELECT UNNEST(RANGE(64)) AS d) d
      |), sketch AS (
      |  SELECT f.vec_id, pl.plane // $DupBits AS tbl,
      |    CASE WHEN SUM(pl.sgn * f.x) > 0
      |         THEN CAST(1 AS BIGINT) << CAST(pl.plane % $DupBits AS INTEGER)
      |         ELSE 0 END AS bitv
      |  FROM flat f JOIN planes pl ON f.i - 1 = pl.d
      |  GROUP BY f.vec_id, pl.plane
      |), buckets AS (
      |  SELECT vec_id, tbl, CAST(SUM(bitv) AS BIGINT) AS bucket FROM sketch GROUP BY 1, 2
      |), cand AS (
      |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
      |  FROM buckets l JOIN buckets r ON l.tbl = r.tbl AND l.bucket = r.bucket
      |  WHERE l.vec_id < r.vec_id
      |), dots AS (
      |  SELECT cd.a, cd.b, CAST(SUM(q.x * c.x) AS BIGINT) AS dot
      |  FROM cand cd
      |  JOIN flat q ON q.vec_id = cd.a
      |  JOIN flat c ON c.vec_id = cd.b AND q.i = c.i
      |  GROUP BY 1, 2
      |)
      |SELECT d.a, d.b,
      |  FLOOR(d.dot / (SQRT(na.n2) * SQRT(nb.n2)) * 1e6 + 0.5) / 1e6 AS cos
      |FROM dots d JOIN nrm na ON d.a = na.vec_id JOIN nrm nb ON d.b = nb.vec_id
      |WHERE d.dot / (SQRT(na.n2) * SQRT(nb.n2)) >= $DupThreshold
      |ORDER BY a, b""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "sim_cosine_topk" -> QueryDef.sql(cosineTopK, cosineSql),
    "sim_lsh_ann" -> QueryDef.sql(lshAnn, lshSql),
    "dedup_embed_cosine" -> QueryDef.sql(embedCosine, embedCosineSql,
      "embedding-cosine near-dup pairs via recall-oriented sign-LSH blocking"))
}
