package graft.sfa

import graft.SparkSpec
import graft.ts.Loaders
import org.apache.spark.sql.functions._

/** Incremental bulk-insert gate ([[ModelIO.appendIndex]] — the trie
  * insert analogue for the at-rest layout): half the corpus is saved,
  * the other half appended, and exact k-NN over the COMBINED layout
  * must equal the brute-force scan over the full corpus — no rebuild,
  * no refresh step (the per-prefix boxes are derived from the layout at
  * query time, so appended members are covered the moment the write
  * commits). Also pins that the append is partition-wise: untouched
  * prefix directories keep their original files.
  */
class IndexAppendSpec extends SparkSpec {

  private val W = 16
  private val L = 8
  private val Alpha = 8
  private val K = 5
  private val Probe = 48

  test("appendIndex: k-NN over the appended layout equals the brute scan, old files untouched") {
    val nChunks = 4
    val chunkSize = 1000
    val walk = Loaders.randomWalk(nChunks * chunkSize + W - 1, 20260816L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), W, L, Alpha,
      normMean = false, lowerBounding = true)
    val corpus = BulkLoad.windowRecords(spark, walk, nChunks, chunkSize, W, L, model)
      .cache()
    val half = (nChunks * chunkSize / 2).toLong
    // per-PID warehouse path: concurrent test JVMs can never clobber
    // each other's in-flight layout, and the shutdown hook cleans up
    val path = graft.util.Warehouse.dir(spark, "append_spec_index")

    ModelIO.saveIndex(corpus.filter(col("id") < half), model.usedBits, prefixLen = 2, path)
    // DATA files only: the maintained box-stats tables live in hidden
    // `_boxes_*` dirs that appends legitimately supersede and drop
    val filesBefore = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(java.nio.file.Paths.get(path)).forEach { p =>
      if (p.toString.endsWith(".parquet") && p.getParent.getFileName.toString.startsWith("prefix="))
        filesBefore(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis
    }
    assert(filesBefore.nonEmpty)

    // the layout is self-describing, and a mismatched append fails fast
    // instead of scattering records across wrong prefix directories
    assert(ModelIO.readIndexMeta(spark, path)
      .contains(ModelIO.IndexMeta(model.usedBits, 2, 0, 0)))
    intercept[IllegalArgumentException] {
      ModelIO.appendIndex(corpus.filter(col("id") >= half), model.usedBits, prefixLen = 3, path)
    }

    ModelIO.appendIndex(corpus.filter(col("id") >= half), model.usedBits, prefixLen = 2, path)
    // partition-wise append: every pre-append file is still there, byte
    // timestamps untouched (nothing was rewritten)
    filesBefore.foreach { case (f, ts) =>
      val p = java.nio.file.Paths.get(f)
      assert(java.nio.file.Files.exists(p), s"original file rewritten away: $f")
      assert(java.nio.file.Files.getLastModifiedTime(p).toMillis == ts,
        s"original file modified: $f")
    }
    val loaded = ModelIO.loadIndex(path)(spark)
    assert(loaded.count() == nChunks.toLong * chunkSize)

    // 3 queries from an unrelated walk + 3 cut from the APPENDED region
    // of the corpus walk: the latter match stored windows exactly
    // (d2 = 0), so an appended record MUST win — the non-vacuousness
    // guard below cannot depend on random-walk luck
    val fromAppended = BulkLoad.queryWindows(
        spark, walk.slice(half.toInt + 100, half.toInt + 100 + 4 * W), 3, W, L, model)
      .withColumn("qid", col("qid") + 3L)
    val queries = BulkLoad.queryWindows(
      spark, Loaders.randomWalk(8 * W, 31337L), 3, W, L, model)
      .unionByName(fromAppended)
    val (gotDf, stats) = IndexOps.knnOverLayout(
      path, queries, model.bins, model.normMean, K, Probe, prefixLen = 2)(spark)
    val got = gotDf.orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = IndexOps.knnScan(
        loaded.select("id", "data"), queries.select("qid", "qdata"), K)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 6 * K && want.length == 6 * K)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3,
        s"qid=${g._1} rank=${g._2}: knn id ${g._3} vs scan ${w._3}")
      assert(math.abs(g._4 - w._4) < 1e-9)
    }
    // the appended half must actually be reachable: with ids split by
    // position and queries from an unrelated walk, at least one nearest
    // neighbor should come from the appended records
    assert(got.exists(_._3 >= half), "no appended record ever won — gate is vacuous")
    assert(stats.corpusRows == nChunks.toLong * chunkSize)

    // ---- compaction over the append-grown layout -----------------------
    // grow fragmentation: two more small appends (re-packing a slice of
    // the same corpus under fresh ids keeps the model contract)
    val extra = corpus.filter(col("id") < 200)
    ModelIO.appendIndex(extra.withColumn("id", col("id") + 10000L),
      model.usedBits, prefixLen = 2, path)
    ModelIO.appendIndex(extra.withColumn("id", col("id") + 20000L),
      model.usedBits, prefixLen = 2, path)
    def filesPerPrefix(): Map[String, Int] = {
      val m = scala.collection.mutable.Map.empty[String, Int]
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).forEach { p =>
        if (p.toString.endsWith(".parquet") &&
            p.getParent.getFileName.toString.startsWith("prefix=")) {
          val pfx = p.getParent.getFileName.toString
          m(pfx) = m.getOrElse(pfx, 0) + 1
        }
      }
      m.toMap
    }
    val before = filesPerPrefix()
    val maxFiles = 2
    assert(before.values.exists(_ > maxFiles), s"fixture never fragmented: $before")
    val lightBefore = before.filter(_._2 <= maxFiles).keySet
    val lightStamps = java.nio.file.Files.walk(java.nio.file.Paths.get(path)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.toString.endsWith(".parquet") &&
        lightBefore(p.getParent.getFileName.toString))
      .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
    val total = ModelIO.loadIndex(path)(spark).count()

    val compacted = ModelIO.compactIndex(path, maxFilesPerPrefix = maxFiles)(spark)
    assert(compacted.nonEmpty)
    // every heavy prefix collapsed to one COMMITTED file (merge-beside:
    // the superseded small files stay on disk as tombstoned garbage
    // until vacuum), light prefixes' entries untouched
    val committed = graft.util.Maintenance.readManifest(spark, path).get.files
      .groupBy(_.takeWhile(_ != '/')).view.mapValues(_.size).toMap
    compacted.foreach(p => assert(committed(s"prefix=$p") == 1,
      s"prefix=$p: ${committed.toSeq.sorted}"))
    lightStamps.foreach { case (f, ts) =>
      val p = java.nio.file.Paths.get(f)
      assert(java.nio.file.Files.exists(p) &&
        java.nio.file.Files.getLastModifiedTime(p).toMillis == ts,
        s"light prefix file rewritten: $f")
    }
    // the vacuum reclaims the superseded small files: now the DIRECTORY
    // also holds one file per compacted prefix
    assert(graft.util.Maintenance.vacuumOrphans(spark, path).dataFiles.nonEmpty)
    val after = filesPerPrefix()
    compacted.foreach(p => assert(after(s"prefix=$p") == 1, s"prefix=$p: ${after.toSeq}"))
    // compaction must leave the root-level metadata sidecar in place
    assert(ModelIO.readIndexMeta(spark, path)
      .contains(ModelIO.IndexMeta(model.usedBits, 2, 0, 0)))
    // no rows lost or duplicated, and k-NN over the compacted layout is
    // still exact vs the brute scan of the (now larger) corpus
    val loaded2 = ModelIO.loadIndex(path)(spark)
    assert(loaded2.count() == total)
    val (gotC, _) = IndexOps.knnOverLayout(
      path, queries, model.bins, model.normMean, K, Probe, prefixLen = 2)(spark)
    val wantC = IndexOps.knnScan(
        loaded2.select("id", "data"), queries.select("qid", "qdata"), K)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val gotCArr = gotC.orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    gotCArr.zip(wantC).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 1e-9)
    }
    corpus.unpersist()
  }

  test("maintenance lock: an append inside compact's read->overwrite window fails fast; no row lost") {
    val n = 800
    val walk = Loaders.randomWalk(n + W - 1, 20260901L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), W, L, Alpha,
      normMean = false, lowerBounding = true)
    val corpus = BulkLoad.windowRecords(spark, walk, 2, n / 2, W, L, model).cache()
    val path = graft.util.Warehouse.dir(spark, "interleave_spec_index")
    ModelIO.saveIndex(corpus.filter(col("id") < 400), model.usedBits, prefixLen = 2, path)
    // fragment a prefix so compaction has work
    val extra = corpus.filter(col("id") < 100)
    (1 to 3).foreach { i =>
      ModelIO.appendIndex(extra.withColumn("id", col("id") + lit(i * 1000L)),
        model.usedBits, prefixLen = 2, path)
    }
    val preCompact = ModelIO.loadIndex(path)(spark).count()
    val lateRows = corpus.filter(col("id") >= 400).withColumn("id", col("id") + 50000L)
    @volatile var hookRan = false
    @volatile var interleaved: Option[Throwable] = None
    graft.util.Maintenance.onCompactBeforeWriteBack = () => {
      hookRan = true
      // the append that would previously be silently LOST: its prefix
      // files land just before the dynamic overwrite clears those dirs
      interleaved = scala.util.Try(
        ModelIO.appendIndex(lateRows, model.usedBits, prefixLen = 2, path)).failed.toOption
    }
    val compacted = try ModelIO.compactIndex(path, maxFilesPerPrefix = 2)(spark)
    finally graft.util.Maintenance.onCompactBeforeWriteBack = () => ()
    assert(compacted.nonEmpty && hookRan)
    // the interleaved append failed FAST at the lock, before writing a row
    val err = interleaved.getOrElse(fail("interleaved append did not fail"))
    assert(err.isInstanceOf[IllegalStateException] &&
      err.getMessage.contains("another maintainer"), err.toString)
    assert(ModelIO.loadIndex(path)(spark).count() == preCompact,
      "compaction lost or gained rows")
    // compact released the lock on success: the retried append lands,
    // and k-NN over the final layout is exact vs the brute scan
    ModelIO.appendIndex(lateRows, model.usedBits, prefixLen = 2, path)
    val loaded = ModelIO.loadIndex(path)(spark)
    assert(loaded.count() == preCompact + 400)
    val queries = BulkLoad.queryWindows(
      spark, Loaders.randomWalk(6 * W, 4242L), 2, W, L, model)
    val (gotDf, _) = IndexOps.knnOverLayout(
      path, queries, model.bins, model.normMean, K, Probe, prefixLen = 2)(spark)
    val got = gotDf.orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = IndexOps.knnScan(
        loaded.select("id", "data"), queries.select("qid", "qdata"), K)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 2 * K)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 1e-9)
    }
    corpus.unpersist()
  }
}
