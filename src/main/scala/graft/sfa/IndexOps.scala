package graft.sfa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact k-NN similarity search, Spark-native SFATrie equivalent
  * (/root/reference/src/main/java/sfa/index/SFATrie.java).
  *
  * The reference's trie is a single-process best-first branch-and-bound.
  * The distributed re-expression (its own bulk-load design,
  * SFABulkLoadTest.java:162-331, scaled out):
  *
  *  - layout: records partitioned by SFA word prefix, each carrying its
  *    word and Fourier approximation — at rest this is parquet
  *    partitioned by prefix with min/max column stats, so the LB prune
  *    maps onto partition/row-group pruning;
  *  - query: filter-and-refine. Phase 1 ranks candidates by the SFA
  *    lower-bounding distance (SFADistance.java:22-67: per-coefficient
  *    distance of the query's Fourier value to the candidate symbol's
  *    bin interval, Σ 2·d²) and verifies the best `probe` candidates
  *    with the exact distance to obtain a threshold τ = current k-th
  *    best; phase 2 verifies every record with LB ≤ τ. Because LB
  *    lower-bounds the true distance, no qualifying record can be
  *    missed — the result is EXACT, the same guarantee the trie's
  *    best-first search gives (SFATrieTest.java:75-86 asserts equality
  *    with a sequential scan; our j6 oracle is exactly that scan).
  *
  * At 100 TB the LB pass is a narrow column scan (word LONG + small
  * approx array) with partial top-k per partition; only τ-qualifying
  * rows touch the full series.
  */
object IndexOps {

  /** SFA lower-bounding distance of a query's Fourier values to a stored
    * word, given the fitted bin edges (SFADistance.java:22-67). `normed`
    * drops the DC pair (its distance only counts when the series keep
    * their means).
    */
  def lbDistance(
      word: Array[Int],
      queryWord: Array[Int],
      queryApprox: Array[Double],
      bins: Array[Array[Double]],
      normed: Boolean): Double = {
    def dist(i: Int): Double = {
      val c1 = word(i)
      val c2 = queryWord(i)
      if (c1 == c2) 0.0
      else if (c1 > c2) bins(i)(c1 - 1) - queryApprox(i)
      else queryApprox(i) - bins(i)(c1)
    }
    var d = 0.0
    var i = 0
    if (!normed) {
      val v = dist(0)
      d = v * v
      i = 2
    }
    while (i < word.length) {
      val v = dist(i)
      d += 2.0 * v * v
      i += 1
    }
    d
  }

  /** Exact squared Euclidean distance between fixed-length slices. */
  private val ed2Udf = udf { (a: Seq[Double], b: Seq[Double]) =>
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** Exact k-NN by LB filter-and-refine.
    *
    * @param corpus  (id, data ARRAY<DOUBLE>, word ARRAY<INT>, approx ARRAY<DOUBLE>)
    * @param queries (qid, qdata, qword, qapprox)
    * @param bins    fitted SFA bin edges (broadcast with the closure)
    * @param k       neighbors per query
    * @param probe   phase-1 verification budget per query (≥ k)
    * @return (qid, rank, id, dist2) — identical to a brute scan
    */
  def knn(
      corpus: DataFrame,
      queries: DataFrame,
      bins: Array[Array[Double]],
      normed: Boolean,
      k: Int,
      probe: Int)(implicit spark: SparkSession): DataFrame = {
    val lbUdf = udf { (w: Seq[Int], qw: Seq[Int], qa: Seq[Double]) =>
      lbDistance(w.toArray, qw.toArray, qa.toArray, bins, normed)
    }
    // LB pass reads only the narrow (id, word) columns of the corpus —
    // at rest this is the columnar scan the prefix-partitioned layout
    // prunes; series payloads are joined back by id at verify time only.
    val narrow = corpus.select(col("id"), col("word"))
    val payload = corpus.select(col("id"), col("data"))
    val qNarrow = queries.select(col("qid"), col("qword"), col("qapprox"))
    val qPayload = queries.select(col("qid"), col("qdata"))
    val pairs = narrow.crossJoin(broadcast(qNarrow))
      .withColumn("lb", lbUdf(col("word"), col("qword"), col("qapprox")))
      .select(col("qid"), col("id"), col("lb"))

    def verify(cand: DataFrame): DataFrame = cand
      .join(payload, Seq("id"))
      .join(broadcast(qPayload), Seq("qid"))
      .withColumn("d2", ed2Udf(col("data"), col("qdata")))
      .drop("data", "qdata")

    // phase 1: verify the `probe` best-LB candidates → τ = kth best dist
    val byLb = Window.partitionBy(col("qid")).orderBy(col("lb").asc, col("id").asc)
    val byD = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("id").asc)
    val probed = verify(pairs.withColumn("lbrn", row_number().over(byLb))
      .filter(col("lbrn") <= probe).drop("lbrn"))
    val tau = probed.withColumn("drn", row_number().over(byD))
      .filter(col("drn") === k)
      .select(col("qid"), col("d2").as("tau"))

    // phase 2: verify every record whose LB ≤ τ (exactness: LB ≤ true d2)
    val fin = verify(pairs.join(broadcast(tau), Seq("qid"))
      .filter(col("lb") <= col("tau")))
    fin.withColumn("rank", row_number().over(byD).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("d2"))
  }

  /** Brute-force scan k-NN — the exactness oracle (J9,
    * SFATrieTest.java:75-86 / 247-275).
    */
  def knnScan(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val byD = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("id").asc)
    corpus.crossJoin(broadcast(queries))
      .withColumn("d2", ed2Udf(col("data"), col("qdata")))
      .withColumn("rank", row_number().over(byD).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("d2"))
  }

  /** ε-range search (J7, SFATrie.java:593-649): all records within
    * squared distance ε², LB-pruned first — exact because LB ≤ true d2.
    */
  def rangeSearch(
      corpus: DataFrame,
      queries: DataFrame,
      bins: Array[Array[Double]],
      normed: Boolean,
      eps2: Double)(implicit spark: SparkSession): DataFrame = {
    val lbUdf = udf { (w: Seq[Int], qw: Seq[Int], qa: Seq[Double]) =>
      lbDistance(w.toArray, qw.toArray, qa.toArray, bins, normed)
    }
    corpus.select(col("id"), col("word"), col("data"))
      .crossJoin(broadcast(queries.select(col("qid"), col("qword"), col("qapprox"), col("qdata"))))
      .withColumn("lb", lbUdf(col("word"), col("qword"), col("qapprox")))
      .filter(col("lb") <= eps2)
      .withColumn("d2", ed2Udf(col("data"), col("qdata")))
      .filter(col("d2") <= eps2)
      .select(col("qid"), col("id"), col("d2"))
  }

  /** Approximate 1-leaf search (J8, SFATrie.java:511-559): scan only the
    * records sharing the query's first `prefixLen` word symbols (the
    * trie's leaf walk ≙ one partition lookup); 1-NN within the bucket.
    */
  def approxPrefixSearch(
      corpus: DataFrame,
      queries: DataFrame,
      usedBits: Int,
      prefixLen: Int,
      startSymbol: Int = 0): DataFrame = {
    def prefixOf(word: org.apache.spark.sql.Column) =
      expr(s"aggregate(slice(${word.toString}, ${startSymbol + 1}, $prefixLen), 0L, (acc, s) -> acc * ${1 << usedBits} + s)")
    val c = corpus.select(col("id"), col("data"), prefixOf(col("word")).as("prefix"))
    val q = queries.select(col("qid"), col("qdata"), prefixOf(col("qword")).as("prefix"))
    val byD = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("id").asc)
    c.join(broadcast(q), Seq("prefix"))
      .withColumn("d2", ed2Udf(col("data"), col("qdata")))
      .withColumn("rank", row_number().over(byD))
      .filter(col("rank") === 1)
      .select(col("qid"), col("id"), col("d2"))
  }
}
