package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-case gate for the bigram-LM quality score: hand-built
  * counts, add-one smoothing, unseen-bigram and unseen-left backoff,
  * empty/short docs, and the eval split never influencing the model.
  */
class LmScoreSpec extends SparkSpec {

  private def micro(p: Double): Long = math.floor(math.log(p) * 1e6).toLong

  test("scores match the hand-computed smoothed bigram model") {
    import spark.implicits._
    // train split (doc_id % 10 != 0): docs 1 and 2; eval: docs 10, 20
    val d = Seq(
      (1L, "a b a b a"), // c(a,b)=2 c(b,a)=2; lefts: c1(a)=2 c1(b)=2
      (2L, "c d"), // c(c,d)=1, c1(c)=1
      (10L, "a b x"), // eval: seen bigram + unseen right
      (20L, "z")) // eval: no bigrams at all
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    // V = |{a, b, c, d}| = 4 distinct train tokens
    val pAB = 3.0 / 6.0 // (2+1)/(2+4)
    val pBA = 3.0 / 6.0
    val pCD = 2.0 / 5.0 // (1+1)/(1+4)
    val pBX = 1.0 / 6.0 // unseen bigram, seen left: (0+1)/(2+4)
    val got = TextOps.lmScoreOf(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def avg(sum: Long, n: Long): Double =
      math.floor(sum / (1e6 * math.max(n, 1)) * 1e6 + 0.5) / 1e6
    val s1 = 2 * micro(pAB) + 2 * micro(pBA)
    assert(got(1L) == ((4L, s1, avg(s1, 4))))
    val s2 = micro(pCD)
    assert(got(2L) == ((1L, s2, avg(s2, 1))))
    val s10 = micro(pAB) + micro(pBX)
    assert(got(10L) == ((2L, s10, avg(s10, 2))))
    assert(got(20L) == ((0L, 0L, 0.0)), "bigram-free doc scores zero")
    // the eval doc's 'x'/'z' never entered the model: V stays 4, so a
    // fully-unseen transition (left not in train) costs exactly 1/V
    val d2 = d.unionByName(Seq((30L, "q r")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long")))
    val g2 = TextOps.lmScoreOf(d2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g2(30L) == micro(1.0 / 4.0), "unseen-left backoff = 1/V")
  }
}
