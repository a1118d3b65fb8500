package graft.ts

import graft.SparkSpec

/** Loader suite over the reference's bundled UCR fixtures (read-only at
  * /root/reference/src/main/resources/datasets/). Verifies the S1 parse
  * rules — label = first column, `,`/space sniffing, ragged rows — and
  * that load-time z-normalization leaves mean≈0, σ≈1.
  */
class LoadersSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets"

  test("S1 local: CBF_TRAIN parses 30 labeled series of length 128, z-normed") {
    val ts = Loaders.loadUcrLocal(s"$base/univariate/CBF/CBF_TRAIN")
    assert(ts.length == 30)
    assert(ts.forall(_.data.length == 128))
    assert(ts.map(_.label).distinct.sorted.toSeq == Seq(1.0, 2.0, 3.0))
    ts.foreach { t =>
      val m = t.data.sum / t.data.length
      val v = t.data.map(x => x * x).sum / t.data.length - m * m
      assert(math.abs(m) < 1e-9, s"series ${t.id} mean $m")
      assert(math.abs(math.sqrt(math.max(v, 0)) - 1.0) < 1e-6, s"series ${t.id} std")
    }
  }

  test("S1 local: variable_length dataset keeps ragged lengths") {
    val ts = Loaders.loadUcrLocal(s"$base/univariate/variable_length/variable_length_TRAIN")
    assert(ts.length > 0)
    assert(ts.map(_.data.length).distinct.length > 1, "expected ragged series lengths")
  }

  test("S1 Spark: DataFrame load matches the local loader") {
    val local = Loaders.loadUcrLocal(s"$base/univariate/CBF/CBF_TRAIN")
    val df = Loaders.loadUcr(spark, s"$base/univariate/CBF/CBF_TRAIN")
    val rows = df.collect()
    assert(rows.length == local.length)
    val byId = rows.map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Double](2))).toMap
    local.foreach { t =>
      val (lab, data) = byId(t.id)
      assert(lab == t.label)
      assert(data.length == t.data.length)
      data.zip(t.data).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }

  test("S7: random walk is seeded-deterministic") {
    val a = Loaders.randomWalk(100, 42L)
    val b = Loaders.randomWalk(100, 42L)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 100)
  }
}
