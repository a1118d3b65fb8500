package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics gates the oracle can't express: clustering quality on a
  * PLANTED separable corpus, and an independent recompute of the
  * balanced sample's draw order.
  */
class ClusterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("planted well-separated groups cluster with purity 1") {
    import spark.implicits._
    // 3 axis-aligned direction groups in 64-dim with deterministic
    // jitter far below the separation; ids interleave the groups so the
    // k smallest ids (the seeds) cover every group
    val rows = for (g <- 0 until 3; j <- 0 until 10) yield {
      val iv = Array.tabulate(64) { d =>
        val base = if (d == g) 10000L else 0L
        base + ((g * 31 + j * 7 + d * 13) % 11) - 5L
      }
      (j * 3L + g, iv.toSeq)
    }
    val base = rows.toDF("id", "iv")
    val m = Cluster.kmeansOf(base, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 30)
    val byGroup = (0 until 3).map(g => (0 until 10).map(j => m(j * 3L + g)).toSet)
    byGroup.foreach(cs => assert(cs.size == 1, s"planted group split across clusters: $byGroup"))
    assert(byGroup.map(_.head).toSet.size == 3, s"planted groups merged: $byGroup")
  }

  test("kmeans is a total assignment with consistent sizes; sample honors quotas in md5 order") {
    val km = graft.SparkEntry.queries("embed_kmeans")(spark, dir)
    val rows = km.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == rows.length) // one row per vector
    val sizes = rows.groupBy(_._2).map { case (c, rs) => c -> rs.length.toLong }
    rows.foreach { case (_, c, cs) => assert(cs == sizes(c), s"csize mismatch in cluster $c") }

    val sm = graft.SparkEntry.queries("sample_clusters")(spark, dir)
    val picks = sm.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per-cluster count = min(csize, quota), and the picked members are
    // exactly the cluster's min(csize, 8) smallest by (md5("cs:"‖id), id)
    // — an executor-independent recompute via the local md5 twin
    val byCluster = picks.groupBy(_._2)
    sizes.foreach { case (c, sz) =>
      val got = byCluster.getOrElse(c, Array.empty).sortBy(_._3)
      assert(got.length == math.min(sz, 8L).toInt, s"quota violated in cluster $c")
      val members = rows.filter(_._2 == c).map(_._1)
      val expect = members.sortBy(id => (Export.md5LongLocal(s"cs:$id"), id))
        .take(got.length).toSeq
      assert(got.map(_._1).toSeq == expect, s"draw order diverges in cluster $c")
      assert(got.map(_._3).toSeq == (1L to got.length).toSeq)
    }
  }
}
