package graft.pipeline

import graft.SparkSpec

/** Gates for the large-star/small-star connected components
  * ([[Dedup.ccLabels]]):
  *
  *  1. labels ≡ a driver-side union-find on seeded random graphs
  *     (the algorithm-independent ground truth);
  *  2. a long path graph — the adversarial case for the r4 min-label
  *     propagation, which needed diameter rounds — converges within
  *     the star-contraction round budget.
  */
class DedupComponentsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the component MIN (union by min keeps roots minimal)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("star-contraction labels equal driver union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 6) {
      val n = 40 + trial * 30
      val nEdges = n / 2 + rnd.nextInt(n)
      val edges = (0 until nEdges).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val vertices = (0 until n).map(i => Tuple1(i.toLong)).toDF("doc_id")
      val got = Dedup.ccLabels(vertices, edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, edges)
      assert(got == want, s"trial $trial (n=$n, edges=$nEdges)")
    }
  }

  test("a 300-node path converges in far fewer rounds than its diameter") {
    import spark.implicits._
    val n = 300
    val vertices = (0 until n).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    // r4's min-label propagation needed 299 rounds here and would trip
    // the 50-round cap; star contraction must label everything 0
    val got = Dedup.ccLabels(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L))
    assert(got.size == n)
  }
}
