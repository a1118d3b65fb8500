package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-case gates for the curation operators, independent of the
  * DuckDB oracles (which re-check the same semantics over the fixture
  * corpus at sf0.01).
  */
class CurationSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private val gram8 = "g1 g2 g3 g4 g5 g6 g7 g8"

  test("decontamination flags exactly the train docs sharing an eval 8-gram") {
    // doc 0 (0 % 97 == 0) is the eval doc; doc 1 copies its 8-gram,
    // doc 2 is disjoint, doc 3 is too short to carry any 8-gram
    val d = mkDocs(Seq(
      (0L, s"e0 $gram8 e1", "en", "s"),
      (1L, s"t0 t1 $gram8 t2", "en", "s"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "en", "s"),
      (3L, "short doc", "en", "s")))
    val got = Curation.deconOf(d, Curation.gramsOf(d))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(!got.contains(0L), "eval doc must not be screened")
    assert(got(1L) == (1L, 1L), "copying doc: one hit, contaminated")
    assert(got(2L)._2 == 0L, "disjoint doc is clean")
    assert(got(3L) == (0L, 0L), "sub-8-token doc has no grams and is clean")
  }

  test("dup-span coverage marks exactly the shared 8-gram's positions") {
    // docs 10/11 share one 8-gram (coverage 8 of 10 tokens = 0.8);
    // doc 12 shares nothing
    val d = mkDocs(Seq(
      (10L, s"a0 $gram8 a1", "en", "s"),
      (11L, s"b0 b1 $gram8", "en", "s"),
      (12L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10", "en", "s")))
    val got = Curation.dupSpansOf(d, Curation.gramsOf(d))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == Set(
      (10L, 10L, 8L, 0.8), (11L, 10L, 8L, 0.8), (12L, 10L, 0L, 0.0)))
  }

  test("span removal excises exactly the covered positions; removed ≡ coverage") {
    val d = mkDocs(Seq(
      (10L, s"a0 $gram8 a1", "en", "s"), // shares the 8-gram: middle excised
      (11L, s"b0 b1 $gram8", "en", "s"), // same 8-gram at the tail
      (12L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10", "en", "s"), // untouched
      (13L, s"$gram8 g9", "en", "s"), // 13 ≡ 14: overlapping dup grams,
      (14L, s"$gram8 g9", "en", "s"), //   union = all 9 positions → ''
      (15L, "tiny", "en", "s"))) // sub-gram doc: untouched
    val got = Curation.spanRemovalOf(d, Curation.gramsOf(d))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(10L) == ((10L, 8L, fp("a0 a1"))))
    assert(got(11L) == ((10L, 8L, fp("b0 b1"))))
    assert(got(12L) == ((10L, 0L, fp("c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))))
    assert(got(13L) == ((9L, 9L, fp(""))))
    assert(got(14L) == ((9L, 9L, fp(""))))
    assert(got(15L) == ((1L, 0L, fp("tiny"))))
    // the removal count IS the coverage union, doc for doc
    val cov = Curation.dupSpansOf(d, Curation.gramsOf(d))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (_, removed, _)) => assert(removed == cov(id)) }
  }

  test("funnel drops the planted duplicate, contaminated, and low-quality docs in order") {
    // 20-token good text (all-distinct tokens → ttr = 1)
    def good(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    val d = mkDocs(Seq(
      (0L, s"e0 $gram8 e1", "en", "s"), // eval doc (0 % 97 == 0): dropped at decon
      (1L, good("a"), "en", "s"), // survives everything (bucket-dependent sampling)
      (2L, good("a"), "en", "s"), // exact duplicate of 1: dropped at dedup
      (3L, s"t0 t1 $gram8 t2 " + good("b"), "en", "s"), // contaminated: dropped at decon
      (4L, "x1 x2 x1 x2", "en", "s"), // 4 tokens: dropped at quality
      (5L, good("c"), "en", "s"))) // survives to quality
    val got = Curation.funnelOf(d, Curation.gramsOf(d))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) == 6L, "raw count")
    assert(got(1L) == 5L, "dedup drops the exact copy")
    assert(got(2L) == 3L, "decon drops the eval doc and the contaminated doc")
    assert(got(3L) == 2L, "quality drops the 4-token doc")
    // single stratum at target size → rate 1e6 ppm → all survivors kept
    assert(got(4L) == 2L, "sampling keeps the single-stratum survivors")
  }

  test("export manifest = final funnel survivors × span-removal rows") {
    def good(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    // same planted funnel corpus: 1 and 5 survive to stage 3, and the
    // single-stratum rate keeps both through sampling (stage 4); doc 2
    // is an exact copy of 1 so their shared grams also make doc 1's
    // text one big duplicated span — the export must carry the CLEANED
    // fingerprint, not the raw one
    val d = mkDocs(Seq(
      (0L, s"e0 $gram8 e1", "en", "s"),
      (1L, good("a"), "en", "s"),
      (2L, good("a"), "en", "s"),
      (3L, s"t0 t1 $gram8 t2 " + good("b"), "en", "s"),
      (4L, "x1 x2 x1 x2", "en", "s"),
      (5L, good("c"), "en", "s")))
    val g = Curation.gramsOf(d)
    val got = Curation.curationExportOf(d, g).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got.map(_._1).toSeq == Seq(1L, 5L), "exactly the stage-4 survivors, ordered")
    val removal = Curation.spanRemovalOf(d, g).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    got.foreach { case (id, lang, source, n, rem, fp) =>
      assert((lang, source) == (("en", "s")))
      assert(removal(id) == ((n, rem, fp)), s"doc $id must carry the span-removal row")
    }
    // doc 1 (≡ doc 2) is fully duplicated: its whole text is excised
    val r1 = got.find(_._1 == 1L).get
    assert(r1._5 == r1._4 && r1._5 == 20L, "the duplicate-pair doc exports fully excised")
  }

  test("span removal ≡ coverage and planted spans excise at 100k docs", graft.Slow) {
    // 100k seeded word-soup docs; every doc_id % 10 == 7 carries the
    // same planted 8-gram boilerplate block at a varying offset — a
    // 10%-of-corpus cross-document duplicated span, the shape a real
    // boilerplate passage has. Gate: removal ≡ coverage doc-for-doc at
    // scale, planted docs lose ≥ the 8 planted positions, clean docs
    // lose nothing (their random 8-grams are unique w.p. ~1).
    import spark.implicits._
    val n = 100000
    val boiler = (1 to 8).map(i => s"boil$i").mkString(" ")
    val d = spark.range(n).select(col("id").as("doc_id"))
      .withColumn("base", expr(
        // seeded per-doc word soup over a 50k-word vocabulary: unique
        // grams across docs except the planted block
        "array_join(transform(sequence(0, 19), i -> concat('w', pmod(hash(doc_id * 37 + i), 50000))), ' ')"))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 7,
          concat_ws(" ", substring_index(col("base"), " ", 10), lit(boiler),
            expr("substring(base, length(substring_index(base, ' ', 10)) + 2)")))
          .otherwise(col("base")))
      .select(col("doc_id"), col("text"))
    val g = Curation.gramsOf(d)
    val rem = Curation.spanRemovalOf(d, g)
      .select("doc_id", "removed").as[(Long, Long)].collect().toMap
    val cov = Curation.dupSpansOf(d, g)
      .select("doc_id", "covered").as[(Long, Long)].collect().toMap
    assert(rem.size == n && cov.size == n)
    assert(rem.forall { case (id, r) => cov(id) == r }, "removed ≡ covered at 100k docs")
    val (planted, clean) = rem.partition(_._1 % 10 == 7)
    assert(planted.forall(_._2 >= 8L), "every planted doc excises at least its boilerplate block")
    // random 20-word docs over a 50k vocab: expected accidental dup
    // grams ≈ 0; allow a vanishing tail rather than exact zero
    val dirty = clean.count(_._2 > 0L)
    assert(dirty <= n / 1000, s"$dirty clean docs lost tokens (expected ~0)")
  }

  test("stratified sampling keeps the whole smallest stratum and respects rates") {
    val rnd = new scala.util.Random(7)
    def words(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(50)}").mkString(" ")
    val d = mkDocs(
      (0 until 40).map(i => (i.toLong, words(12), "en", "s")) ++
        (40 until 50).map(i => (i.toLong, words(12), "de", "s")))
    val got = Curation.sampleStratifiedOf(d).collect()
    // smallest stratum (de, n = 10 = target) has rate 1e6 ppm: all kept
    assert(got.count(_.getString(1) == "de") == 10)
    // en rate = floor(1e6 * 10/40) = 250000; every kept row's recomputed
    // md5 bucket must satisfy the predicate (engine-portable determinism)
    val md = java.security.MessageDigest.getInstance("MD5")
    val textOf = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { r =>
      val hex = md.digest(textOf(r.getLong(0)).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val bucket = java.lang.Long.parseLong(hex, 16) % 1000000L
      assert(bucket == r.getLong(4) && bucket < r.getLong(3))
    }
    // and nothing outside the predicate was dropped from en
    val enKept = got.count(_.getString(1) == "en")
    val enExpect = (0 until 40).count { i =>
      val hex = md.digest(textOf(i.toLong).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1000000L < 250000L
    }
    assert(enKept == enExpect)
  }
}
