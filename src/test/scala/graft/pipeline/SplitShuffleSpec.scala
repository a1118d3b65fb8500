package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the training-order shuffle and the leakage-safe split.
  * Oracle equality (vs DuckDB) proves the exact assignments; what it
  * cannot express are the op-level invariants pinned here: the shuffle
  * is a permutation whose order changes with the seed, and no duplicate
  * cluster ever straddles a split.
  */
class SplitShuffleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("export_shuffled is a seeded permutation: every doc exactly once, pos dense") {
    val d = graft.util.Tables.load(spark, dir, "documents").select("doc_id")
    val n = d.count()
    val a = Export.shuffledOf(d, "epoch-1:").cache()
    try {
      assert(a.count() == n)
      assert(a.select(countDistinct(col("doc_id"))).head.getLong(0) == n)
      // dense positions 0..N-1
      val mm = a.agg(min("pos"), max("pos"), countDistinct(col("pos"))).head
      assert(mm.getLong(0) == 0L && mm.getLong(1) == n - 1 && mm.getLong(2) == n)
      // shards are round-robin over pos: sizes differ by at most 1
      val sh = a.groupBy("shard").count().select("count")
        .collect().map(_.getLong(0))
      assert(sh.max - sh.min <= 1, sh.toSeq.toString)
      // a different seed is a different permutation (not a shifted one):
      // some doc must land on a different position
      val b = Export.shuffledOf(d, "epoch-2:")
      val moved = a.join(b.withColumnRenamed("pos", "pos2"), "doc_id")
        .filter(col("pos") =!= col("pos2")).count()
      assert(moved > n / 2, s"seed change moved only $moved of $n docs")
    } finally { a.unpersist(); () }
  }

  test("export_shuffled plan: ranks run bucket-partitioned, offsets broadcast — no global data window") {
    val df = graft.SparkEntry.queries("export_shuffled")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the data-sized window is partitioned by the 256-value bucket
    assert(p.contains("hashpartitioning(bucket"), p.take(3000))
    // exactly two windows: the bucket-partitioned row_number and the
    // 256-row unpartitioned offset prefix-sum (constant-sized by
    // construction) — a THIRD / data-sized global window would mean the
    // single-partition row_number crept back in
    val windows = "Window ".r.findAllIn(p).size
    assert(windows == 2, s"expected 2 Window ops, got $windows\n${p.take(3000)}")
    // the offset table joins broadcast, not shuffled
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("shuffledOf output is bucket-width-invariant (2 vs 3 hex chars) and the width adapts") {
    val d = graft.util.Tables.load(spark, dir, "documents").select("doc_id")
    // positions are a pure function of the global md5 order — the bucket
    // prefix only chooses HOW the rank is computed, never what it is
    val w2 = Export.shuffledOf(d, "epoch-7:", hexChars = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w3 = Export.shuffledOf(d, "epoch-7:", hexChars = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(w2 == w3)
    // the adaptive rule: fixture-sized corpora stay at 2; the width grows
    // with the corpus and caps at 5 (16^5 buckets bound the offset table)
    assert(Export.adaptiveHexChars(60000L) == 2)
    assert(Export.adaptiveHexChars(1000000000L) == 2)
    assert(Export.adaptiveHexChars(5000000000L) == 3)
    assert(Export.adaptiveHexChars(100000000000L) == 4)
    assert(Export.adaptiveHexChars(Long.MaxValue / 4) == 5)
  }

  test("split_group_holdout: no duplicate cluster straddles a split") {
    val split = graft.SparkEntry.queries("split_group_holdout")(spark, dir).cache()
    try {
      // every component maps to exactly one split — the leakage gate
      val straddlers = split.groupBy("comp")
        .agg(countDistinct(col("split")).as("k"))
        .filter(col("k") > 1).count()
      assert(straddlers == 0L, s"$straddlers components straddle splits")
      // all three splits exist and the hash split is near 80/10/10 by
      // COMPONENT count (docs skew with cluster sizes; the hash is
      // uniform over components)
      val byComp = split.select("comp", "split").distinct()
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byComp.keySet == Set("train", "val", "test"), byComp.toString)
      val total = byComp.values.sum.toDouble
      assert(byComp("train") / total > 0.6 && byComp("train") / total < 0.95,
        byComp.toString)
      // membership agrees with dedup_components' clusters
      val comps = graft.SparkEntry.queries("dedup_components")(spark, dir)
        .select("doc_id", "comp")
      assert(split.select("doc_id", "comp").except(comps).count() == 0L)
    } finally { split.unpersist(); () }
  }
}
