package graft.pipeline

import graft.SparkSpec

/** Mixture-resampling semantics on a planted skewed corpus: the exact
  * integer rate arithmetic, and every remainder-Bernoulli decision
  * recomputed independently via the local md5 twin.
  */
class MixSpec extends SparkSpec {

  test("planted 90/10 corpus: rare domain replicated exactly, common domain hash-thinned") {
    import spark.implicits._
    val d = ((0 until 90).map(i => (i.toLong, "web")) ++
      (90 until 100).map(i => (i.toLong, "code"))).toDF("doc_id", "source")
    val out = Mix.mixOf(d).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 100)

    // code: N=100, S=2, den = 2·10 = 20 → rate 5 rem 0 → exactly 5 copies
    out.filter(_._2 == "code").foreach { case (id, _, c) => assert(c == 5L, s"doc $id") }

    // web: den = 2·90 = 180 → rate 0 rem 100 → copies ∈ {0,1}, each
    // decision recomputed from the hash convention
    val web = out.filter(_._2 == "web")
    web.foreach { case (id, _, c) =>
      val expect = if (Export.md5LongLocal(s"mix:$id") % 180L < 100L) 1L else 0L
      assert(c == expect, s"doc $id: got $c expected $expect")
    }
    // both domains target N/S = 50 expected copies
    assert(out.filter(_._2 == "code").map(_._3).sum == 50L)
    val webTotal = web.map(_._3).sum
    assert(webTotal > 25L && webTotal < 75L, s"web copy total $webTotal far off the 50 target")
  }

  test("token-weighted mixture: exact rates on token mass, zero-token domain drops") {
    import spark.implicits._
    // T = 1500 tokens over S = 3 domains → 500-token target each:
    // "long" (1 doc × 1000) thins to p = 0.5; "short" (100 × 5)
    // replicates exactly once; "empty" emits zero copies
    val d = (Seq((0L, "long", 1000L)) ++
      (1 to 100).map(i => (i.toLong, "short", 5L)) ++
      Seq((101L, "empty", 0L), (102L, "empty", 0L)))
      .toDF("doc_id", "source", "toks")
    val out = Mix.mixTokensOf(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    out.filter(_._2 == "short").foreach { case (id, _, c) => assert(c == 1L, s"doc $id") }
    out.filter(_._2 == "empty").foreach { case (id, _, c) => assert(c == 0L, s"doc $id") }
    val long = out.filter(_._2 == "long")
    assert(long.length == 1)
    val expect = if (Export.md5LongLocal("mixtok:0") % 3000L < 1500L) 1L else 0L
    assert(long.head._3 == expect)
  }

  test("sf0.001 resample is deterministic and keeps every document exactly once in the output") {
    val q = graft.SparkEntry.queries("mix_domains")(spark, "/root/testdata/sf0.001")
    val a = q.collect().toSeq
    val b = graft.SparkEntry.queries("mix_domains")(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(0)).distinct.length == a.length)
    assert(a.forall(_.getLong(2) >= 0L))
  }
}
