package graft.pipeline

import graft.{SparkEntry, SparkSpec}

/** Gates for the persisted cell-partitioned IVF layout:
  *
  *  1. the ANN scan over the layout actually PRUNES — the executed plan
  *     carries a non-empty PartitionFilters on the cell column (not a
  *     post-scan filter that reads every cell);
  *  2. results equal the in-memory `sim_ivf_ann` path row-for-row (the
  *     layout is a physical re-arrangement, not a semantic change).
  */
class IvfLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("layout ANN prunes partitions and equals the in-memory IVF path") {
    val layout = SparkEntry.queries("layout_ivf_ann")(spark, dir)
    val plan = layout.queryExecution.executedPlan.toString
    // NB: Spark truncates long INSET lists with "…" (no closing bracket),
    // so match the filter's head rather than a bracketed span.
    assert("PartitionFilters: \\[cell#\\d+L? (INSET|IN)".r.findFirstIn(plan).isDefined,
      s"expected a non-empty PartitionFilters on cell in:\n${plan.take(4000)}")

    val mem = SparkEntry.queries("sim_ivf_ann")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val lay = layout
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(lay.sameElements(mem), "layout ANN != in-memory IVF ANN")
  }

  test("appendIvfLayout: partition-wise insert against the persisted centroids, fail-fast without them") {
    import org.apache.spark.sql.functions._
    val e = Similarity.emb(spark, dir)
    val members = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("c_id"), col("iv").as("civ"), col("nrm2").as("cn"))
      .cache()
    try {
      val cent = Similarity.ivfCentroids(
        members.select(col("c_id").as("id"), col("civ").as("iv")), 8)
      val loc = graft.util.Warehouse.dir(spark, "ivf_append_spec")

      // the append refuses a directory with no persisted centroid table
      intercept[IllegalStateException] {
        Similarity.appendIvfLayout(spark, members.limit(5), loc)
      }

      Similarity.saveIvfLayout(spark, members.filter(col("c_id") % 2 === 0), cent, loc)
      val stamps = java.nio.file.Files.walk(java.nio.file.Paths.get(loc)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => p.toString.endsWith(".parquet") && p.toString.contains("cell="))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
      assert(stamps.nonEmpty)

      Similarity.appendIvfLayout(spark, members.filter(col("c_id") % 2 =!= 0), loc)
      // partition-wise: every pre-append member file survives untouched
      stamps.foreach { case (f, ts) =>
        val p = java.nio.file.Paths.get(f)
        assert(java.nio.file.Files.exists(p) &&
          java.nio.file.Files.getLastModifiedTime(p).toMillis == ts,
          s"pre-append file rewritten: $f")
      }
      // the grown layout holds exactly the one-shot assignment of the
      // full corpus: same (cell, c_id) set, nothing lost or rescattered
      val grown = spark.read.parquet(loc)
        .select(col("cell").cast("long"), col("c_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val oneShot = Similarity.assignCells(
          members.select(col("c_id").as("id"), col("civ").as("iv")), cent)
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
      assert(grown == oneShot)
      // and the persisted centroid table is byte-meaningful: reloading it
      // reproduces the same assignment for a sample member
      val reCent = Similarity.loadIvfCentroids(spark, loc)
      val again = Similarity.assignCells(
          members.limit(20).select(col("c_id").as("id"), col("civ").as("iv")), reCent)
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
      assert(again.subsetOf(oneShot))

      // compaction over the append-grown cells: fragmented cells collapse
      // to one file, membership unchanged, centroids + sidecar survive
      val compacted = Similarity.compactIvfLayout(spark, loc, maxFilesPerCell = 1)
      assert(compacted.nonEmpty, "save+append must fragment at least one cell")
      compacted.foreach { c =>
        val n = java.nio.file.Files.list(java.nio.file.Paths.get(loc, s"cell=$c"))
          .toArray.count(_.toString.endsWith(".parquet"))
        assert(n == 1, s"cell=$c still holds $n files")
      }
      val afterCompact = spark.read.parquet(loc)
        .select(col("cell").cast("long"), col("c_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterCompact == grown)
      assert(Similarity.loadIvfCentroids(spark, loc).count() == 8L)
    } finally { members.unpersist(); () }
  }
}
