package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{QueryDef, Tables}

/** Deduplication operators for the large-scale training-data pipeline.
  *
  * Design for 100 TB:
  *  - exact dedup is a hash-groupBy on a digest — one shuffle on md5(text),
  *    never on the raw text bytes;
  *  - near-dup via shingling uses an inverted-index equi-join (shingle →
  *    postings) with a postings-list frequency cap to bound the pair
  *    blow-up on stop-shingles — the standard scalable formulation;
  *  - MinHash LSH shuffles once on the band key; signature hashes are
  *    md5-based so they are engine-portable and deterministic (no RNG).
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Exact dedup: digest-groupBy keeping the smallest doc_id per text. */
  private def exact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("h", md5(col("text")))
      .groupBy("h")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"))
      .orderBy("h")

  private val exactSql =
    """SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS copies
      |FROM documents GROUP BY 1 ORDER BY h""".stripMargin

  /** Word 3-gram shingles, DISTINCT per doc. Spark side. */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("ws", filter(col("ws"), w => w =!= ""))
      .withColumn("n", size(col("ws")))
      .filter(col("n") >= 3)
    tok.select(col("doc_id"),
        explode(expr("transform(sequence(0, n-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("sh"))
      .distinct()
  }

  /** Shared CTE producing the same distinct shingles in DuckDB. */
  private val shinglesCte =
    """ws AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents
      |),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      |  FROM ws, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
      |  WHERE len(ws) >= 3)""".stripMargin

  /** N-gram Jaccard near-dup: candidate pairs share ≥1 shingle whose
    * postings list is ≤ 200 docs (stop-shingle cap); jaccard = |∩|/|∪| from
    * exact integer set sizes; report pairs with jaccard ≥ 0.1.
    */
  private def jaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val postings = sh.groupBy("sh").agg(count(lit(1)).as("pf"))
    val rare = sh.join(postings.filter(col("pf") <= 200), "sh")
    val a = rare.select(col("sh"), col("doc_id").as("a"))
    val b = rare.select(col("sh"), col("doc_id").as("b"))
    val inter = a.join(b, "sh").filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jac", round(col("inter") / (col("sza") + col("szb") - col("inter")).cast("double"), 6))
      .filter(col("jac") >= 0.1)
      .select("a", "b", "inter", "jac")
      .orderBy("a", "b")
  }

  private val jaccardSql =
    s"""WITH $shinglesCte,
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      |pf AS (SELECT sh AS shingle, COUNT(*) AS pf FROM sh GROUP BY 1),
      |rare AS (SELECT s.doc_id, s.sh FROM sh s JOIN pf ON s.sh = pf.shingle WHERE pf.pf <= 200),
      |inter AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
      |  FROM rare x JOIN rare y ON x.sh = y.sh AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT i.a, i.b, i.inter,
      |  ROUND(i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) AS jac
      |FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
      |WHERE i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.1
      |ORDER BY a, b""".stripMargin

  /** MinHash signatures: h_i(doc) = min over shingles of md5(i‖'|'‖shingle)
    * (lexicographic min of hex digests — portable, deterministic, no RNG).
    * k=6 hashes → 3 bands × 2 rows; band key = md5(h_{2b}‖h_{2b+1}).
    * Candidates share a band; verified candidates report their exact
    * jaccard. One shuffle per stage; band join is an equi-join.
    */
  private def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir).cache()
    val hashed = sh
      .crossJoin(broadcast(s.range(6).select(col("id").as("hi"))))
      .withColumn("hv", md5(concat(col("hi").cast("string"), lit("|"), col("sh"))))
      .groupBy("doc_id", "hi").agg(min("hv").as("sig"))
    val bands = hashed
      .withColumn("band", expr("hi div 2"))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws("", sort_array(collect_list(struct(col("hi"), col("sig"))))
        .getField("sig"))).as("bandkey"))
    val l = bands.select(col("band"), col("bandkey"), col("doc_id").as("a"))
    val r = bands.select(col("band"), col("bandkey"), col("doc_id").as("b"))
    val cand = l.join(r, Seq("band", "bandkey")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val x = sh.select(col("sh"), col("doc_id").as("a"))
    val y = sh.select(col("sh"), col("doc_id").as("b"))
    val inter = x.join(y, "sh").filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    cand.join(inter, Seq("a", "b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jac", round(col("inter") / (col("sza") + col("szb") - col("inter")).cast("double"), 6))
      .select("a", "b", "jac")
      .orderBy("a", "b")
  }

  private val minhashSql =
    s"""WITH $shinglesCte,
      |hashed AS (
      |  SELECT doc_id, hi, MIN(md5(CAST(hi AS VARCHAR) || '|' || sh)) AS sig
      |  FROM sh, UNNEST(generate_series(0, 5)) AS h(hi)
      |  GROUP BY 1, 2
      |),
      |bands AS (
      |  SELECT doc_id, hi//2 AS band,
      |    md5(string_agg(sig, '' ORDER BY hi)) AS bandkey
      |  FROM hashed GROUP BY 1, 2
      |),
      |cand AS (
      |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      |  FROM bands l JOIN bands r ON l.band = r.band AND l.bandkey = r.bandkey
      |  WHERE l.doc_id < r.doc_id
      |),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
      |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT c.a AS a, c.b AS b,
      |  ROUND(COALESCE(i.inter, 0) / CAST(sa.sz + sb.sz - COALESCE(i.inter, 0) AS DOUBLE), 6) AS jac
      |FROM cand c
      |LEFT JOIN inter i ON c.a = i.a AND c.b = i.b
      |JOIN sizes sa ON c.a = sa.doc_id JOIN sizes sb ON c.b = sb.doc_id
      |ORDER BY c.a, c.b""".stripMargin

  /** SimHash (64-bit via two 32-bit halves from md5 hex nibbles): per doc,
    * bit b of the fingerprint = sign of Σ over distinct shingles of
    * (bit b of md5(shingle) ? +1 : −1). Emitted as the per-doc fingerprint;
    * engine-portable arithmetic, but the SQL twin is heavy, so this one is
    * driver-checked rows-only for now.
    */
  private def simhash(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
      .withColumn("h", md5(col("sh")))
      .withColumn("bits", expr(
        "transform(sequence(0, 15), i -> conv(substring(h, i*2+1, 2), 16, 10))"))
    // 16 bytes → 16 signed contributions per nibble-pair; fingerprint =
    // concat of per-byte majority bits.
    val contrib = sh.select(col("doc_id"), posexplode(col("bits")).as(Seq("byte", "bv")))
      .withColumn("bv", col("bv").cast("int"))
    val perBit = (0 until 8).map { b =>
      sum(when(((col("bv") / (1 << b)).cast("int") % 2) === 1, 1).otherwise(-1)).as(s"s$b")
    }
    contrib.groupBy("doc_id", "byte").agg(perBit.head, perBit.tail: _*)
      .withColumn("bytebits", (0 until 8).map(b => when(col(s"s$b") > 0, 1 << b).otherwise(0))
        .reduce((a, b) => a + b))
      .groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("byte"), col("bytebits"))))
        .getField("bytebits")).as("simhash"))
      .orderBy("doc_id")
  }

  val defs: Map[String, QueryDef] = Map(
    "dedup_exact" -> QueryDef.sql(exact, exactSql),
    "dedup_ngram_jaccard" -> QueryDef.sql(jaccard, jaccardSql),
    "dedup_minhash_lsh" -> QueryDef.sql(minhashLsh, minhashSql),
    "dedup_simhash" -> QueryDef.rowsOnly(simhash, "64-bit simhash fingerprint per doc"))
}
