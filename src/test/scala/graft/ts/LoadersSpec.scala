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

  test("S3: ARFF parse — dimension split, '?' missing, label mapping") {
    // no ARFF fixture ships with the reference; a minimal file covering
    // the parse rules of TimeSeriesLoader.java:93-167 (escaped \n
    // dimension separator, '?' skipped, string labels → dense doubles)
    val f = java.io.File.createTempFile("graft_arff", ".arff")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.println("@relation test")
    w.println("% comment")
    w.println("'1.0,2.0,3.0\\n4.0,?,6.0',cat")
    w.println("'7.0,8.0\\n9.0,10.0',dog")
    w.println("'1.5,2.5\\n3.5,4.5',cat")
    w.close()
    val mapping = scala.collection.mutable.Map.empty[String, Double]
    val recs = Loaders.loadArffLocal(f.getPath, "test", mapping)
    assert(recs.length == 6, "2 dims × 3 samples")
    assert(recs.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    // '?' dropped: sample 0 dim 1 has 2 values
    val s0d1 = recs.find(r => r._1 == 0L && r._2 == 1).get
    assert(s0d1._4.toSeq == Seq(4.0, 6.0))
    // same string label → same numeric id; distinct labels distinct ids
    val labels = recs.groupBy(_._1).map { case (id, rs) => id -> rs.head._3 }
    assert(labels(0L) == labels(2L))
    assert(labels(0L) != labels(1L))
  }

  test("S5/S6: long-series and query-series readers on the indexing fixtures") {
    val walk = Loaders.readSampleSubsequenceLocal(s"$base/indexing/power_data.dat")
    assert(walk.length > 10000, s"power_data length ${walk.length}")
    val qs = Loaders.readQuerySeriesLocal(s"$base/indexing/query_lightcurves.txt")
    assert(qs.length == 9)
    assert(qs.forall(_.length > 100))
  }

  test("S7: random walk is seeded-deterministic") {
    val a = Loaders.randomWalk(100, 42L)
    val b = Loaders.randomWalk(100, 42L)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 100)
  }
}
