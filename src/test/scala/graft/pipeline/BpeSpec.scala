package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the rows-only BPE queries: the fit on the paper's own
  * worked example, determinism, the monotone-max-count property, and
  * Spark ≡ driver-local reference for the applied token counts.
  */
class BpeSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  // Sennrich et al. 2016, §3.2 example dictionary:
  //   low:5  lower:2  newest:6  widest:3
  private val paperTypes = Seq[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("fit reproduces the paper's example merge sequence") {
    val ms = Bpe.fitMerges(paperTypes, 5)
    // (e,s) 9 from newest+widest; (es,t) 9; (est,</w>) 9; then the
    // 7-weight 'lo' pair from low+lower: (l,o) 7; (lo,w) 7
    assert(ms.take(5).map { case (_, l, r, c) => (l, r, c) } == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    assert(ms.map(_._1) == ms.indices.map(_.toLong))
  }

  test("fit is deterministic and max pair count is monotone non-increasing") {
    val a = Bpe.fitMerges(paperTypes, 50)
    val b = Bpe.fitMerges(paperTypes, 50)
    assert(a == b)
    val counts = a.map(_._4)
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y },
      s"merge counts must not increase: $counts")
    // exhaustion: every pair left is below MinFreq, so the table is
    // shorter than the requested 50 rounds on this tiny dictionary
    assert(a.size < 50)
  }

  test("apply segments by lowest rank first and counts the end marker") {
    val rank = Bpe.fitMerges(paperTypes, 50)
      .map { case (i, l, r, _) => (l, r) -> i.toInt }.toMap
    // 'lowest' was never a type: 'low' merges via (l,o)+(lo,w), 'est'
    // via (e,s)+(es,t); 'est</w>' requires the (est,</w>) merge which
    // applies here too => [low, est</w>] = 2 symbols
    assert(Bpe.applyBpe("lowest", rank) == 2)
    // unseen characters stay singletons: 'xyz' -> x y z </w>
    assert(Bpe.applyBpe("xyz", rank) == 4)
    // 'low' is a frequent type: the full fit merges it to ONE symbol
    // (low</w>), unlike the novel 'lowest' whose (low, est</w>) pair
    // never occurred in training
    assert(Bpe.applyBpe("low", rank) == 1)
  }

  test("query output equals a driver-local reference over a corpus") {
    val d = mkDocs(Seq(
      1L -> "low low low low low lower lower",
      2L -> "newest newest newest newest newest newest",
      3L -> "widest widest widest lowest",
      4L -> ""))
    val got = Bpe.bpeTokensOf(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // reference: fit on the same corpus types, apply per word locally
    val types = d.collect().flatMap(_.getString(1).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val rank = Bpe.fitMerges(types, Bpe.Merges)
      .map { case (i, l, r, _) => (l, r) -> i.toInt }.toMap
    val expect = d.collect().map { row =>
      val ws = row.getString(1).split(" ").filter(_.nonEmpty)
      (row.getLong(0), ws.length.toLong, ws.map(w => Bpe.applyBpe(w, rank).toLong).sum)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    val m = got.map(t => t._1 -> t).toMap
    assert(m(4L) == ((4L, 0L, 0L)), "empty doc: zero words, zero tokens")
    // heavily repeated types compress to at most 2 symbols per word
    assert(m(2L)._3 <= 2 * m(2L)._2)
  }

  test("distributed trainer equals the driver loop merge-for-merge") {
    import spark.implicits._
    // the paper dictionary plus shared-prefix noise types so several
    // rounds have competing pairs and tie-breaks to exercise
    val types = paperTypes ++ Seq[(String, Long)](
      ("news", 4L), ("wide", 4L), ("lows", 3L), ("widen", 2L), ("zzz", 1L))
    val dictDf = types.toDF("w", "f")
    val dist = Bpe.fitMergesDistributed(dictDf, 50)
    val local = Bpe.fitMerges(types, 50)
    assert(dist == local)
    assert(dist.nonEmpty)
  }

  test("non-BMP symbols: driver and distributed trainers share one total order") {
    import spark.implicits._
    // U+1D54F (𝕏) is a supplementary code point: its UTF-16 encoding
    // starts with a surrogate (0xD835) that Java String order sorts
    // BELOW the BMP char U+FFFD, while code-point/UTF-8 order sorts it
    // ABOVE. Equal-count pairs differing only in these symbols force
    // the tie-break to decide — both trainers must pick U+FFFD first.
    val x = new String(Character.toChars(0x1D54F))
    val f = "�"
    val types = Seq[(String, Long)]((s"a${x}", 3L), (s"a${f}", 3L), ("aq", 2L))
    val local = Bpe.fitMerges(types, 3)
    val dist = Bpe.fitMergesDistributed(types.toDF("w", "f"), 3)
    assert(dist == local)
    // the first merge's RIGHT symbol is the full code point U+FFFD
    // (code-point order: (a,�) < (a,𝕏)), never a lone surrogate
    assert(local.head._3 == f, s"tie must break to U+FFFD by code-point order: $local")
    assert(local.map(_._3).forall(s => !s.exists(ch =>
      Character.isSurrogate(ch) && s.length == 1)), "no lone surrogates in symbols")
  }

  test("cpOrder equals Spark's UTF8String binary order on random Unicode") {
    // the BPE tie-break claim verbatim: the driver's comparator and the
    // order Spark's TakeOrdered uses (UTF8String binary compareTo) must
    // agree in SIGN for any valid strings — sampled across ASCII, BMP
    // (incl. U+FFFD and surrogate-adjacent U+D7FF/U+E000), and
    // supplementary planes
    val rnd = new scala.util.Random(20260815L)
    val pools = Array(
      (0x20, 0x7E), (0xA0, 0x2FF), (0xD7F0, 0xD7FF), (0xE000, 0xE010),
      (0xFFF0, 0xFFFD), (0x10000, 0x1001F), (0x1D540, 0x1D55F), (0x10FFF0, 0x10FFFF))
    def randStr(): String = {
      val sb = new java.lang.StringBuilder
      (0 until rnd.nextInt(6)).foreach { _ =>
        val (lo, hi) = pools(rnd.nextInt(pools.length))
        sb.appendCodePoint(lo + rnd.nextInt(hi - lo + 1))
      }
      sb.toString
    }
    (0 until 5000).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      val ours = Integer.signum(Bpe.cpOrder.compare(a, b))
      val utf8 = Integer.signum(org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)))
      assert(ours == utf8, s"cpOrder(${a.codePoints.toArray.toSeq}, " +
        s"${b.codePoints.toArray.toSeq}) = $ours but UTF8 binary = $utf8")
    }
  }

  test("distributed trainer schedules a bounded number of jobs per merge round") {
    import spark.implicits._
    // dictionary with a long merge chain so many rounds run
    val types = paperTypes ++ Seq[(String, Long)](
      ("news", 4L), ("wide", 4L), ("lows", 3L), ("widen", 2L))
    val dictDf = types.toDF("w", "f")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val dist = Bpe.fitMergesDistributed(dictDf, 50)
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark.sparkContext)
      val rounds = dist.size
      assert(rounds >= 8, s"want a multi-round fit to measure: $rounds")
      // constant jobs per round (argmax + delta-fold checkpoint, ≤2
      // jobs each under AQE; the symbolization checkpoints only every
      // ReprCkptEvery rounds) + constant setup — NOT the full-recount
      // trainer's dictionary-wide aggregate per round
      assert(jobs.get() <= 8L * rounds + 12,
        s"jobs ${jobs.get()} for $rounds rounds — per-round job count must be O(1)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("over-cap dictionary switches to the distributed trainer, nothing dropped",
      graft.Slow) {
    import spark.implicits._
    // > MaxTypes synthetic types; every type unique so the capped driver
    // loop would LOSE tail types — the distributed path must not. The
    // numeral-suffix words share digit pairs, so merges exist.
    val n = Bpe.MaxTypes + 5
    val dictDf = spark.range(n)
      .select(concat(lit("w"), col("id").cast("string")).as("w"), lit(1L).as("f"))
    val errBuf = new java.io.ByteArrayOutputStream()
    val old = System.err
    val dist =
      try {
        System.setErr(new java.io.PrintStream(errBuf, true))
        Bpe.fitOn(dictDf) // dispatch decides; must take the distributed path
      } finally System.setErr(old)
    assert(new String(errBuf.toByteArray).contains("distributed per-round trainer"))
    // driver reference over the FULL dictionary (fits in test memory)
    val types = (0L until n.toLong).map(i => (s"w$i", 1L))
    val local = Bpe.fitMerges(types, Bpe.Merges)
    assert(dist == local)
    assert(dist.nonEmpty)
  }
}
