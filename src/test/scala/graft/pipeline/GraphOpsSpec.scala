package graft.pipeline

import graft.SparkSpec

/** Structural invariants over the graph family (exactness is the DuckDB
  * oracle's job): kNN degree/ordering bounds, PageRank mass accounting
  * under truncation, and the triangle handshake identity.
  */
class GraphOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kNN graph: at most K neighbors per src, cosines descending, no self-loops") {
    val rows = graft.SparkEntry.queries("graph_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (src, es) =>
      assert(es.length <= 3, s"src $src has ${es.length} neighbors")
      val sorted = es.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to es.length).toSeq)
      val cs = sorted.map(_._3)
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, s"src $src not descending")
      es.foreach(e => assert(e._1 != e._2, s"self-loop at $src"))
    }
  }

  test("pagerank: positive ranks, mass bounded by the scale, truncation only loses mass") {
    val pr = graft.SparkEntry.queries("graph_pagerank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pr.length == 500)
    assert(pr.forall(_._2 > 0L))
    val mass = pr.map(_._2).sum
    // truncating divisions and dropped dangling mass only ever LOSE
    // mass, so the total stays within (0, scale]
    assert(mass <= 1000000000000L, s"mass $mass exceeds the scale")
    assert(mass > 150000000000L, s"mass $mass below the teleport floor")
  }

  test("components: labels are consistent across every edge and rooted at minima") {
    val comp = graft.SparkEntry.queries("graph_components")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 500)
    comp.foreach { case (v, c) => assert(c <= v, s"root $c above member $v") }
    // every kNN edge joins vertices of one component
    val edges = graft.SparkEntry.queries("graph_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (u, v) =>
      assert(comp(u) == comp(v), s"edge ($u,$v) crosses components")
    }
    // roots label themselves
    comp.values.toSet.foreach { (c: Long) => assert(comp(c) == c, s"root $c not fixed") }
  }

  test("triangles: the global count is the per-vertex sum over 3") {
    val t = graft.SparkEntry.queries("graph_triangles")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = t.find(_._1 == -1L).map(_._2).getOrElse(0L)
    val perVertexSum = t.filter(_._1 >= 0L).map(_._2).sum
    assert(perVertexSum == 3 * total, s"handshake violated: $perVertexSum vs 3×$total")
    assert(total > 0L, "fixture kNN graph should close at least one triangle")
  }
}
