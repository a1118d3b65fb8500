package graft.util

import graft.SparkSpec

/** Direct gates for the shared maintenance primitives — the properties
  * the layout specs rely on but exercise only single-threaded:
  *
  *  - lock acquire is ATOMIC under genuine thread contention (the local
  *    filesystem path routes through O_CREAT|O_EXCL, not Hadoop's
  *    check-then-act create) — at no instant do two maintainers hold
  *    one layout's lock;
  *  - the sidecar round-trips, overwrites atomically, and a corrupted
  *    sidecar FAILS the read instead of silently skipping the check.
  */
class MaintenanceSpec extends SparkSpec {

  test("lock acquire is mutually exclusive under thread contention") {
    val path = Warehouse.dir(spark, "maint_lock_race")
    new java.io.File(path).mkdirs()
    val threads = 16
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(threads)
    (1 to threads).foreach { _ =>
      new Thread(() => {
        start.await()
        try {
          Maintenance.withLock(spark, path, "race-test") {
            val a = active.incrementAndGet()
            maxActive.getAndUpdate(m => math.max(m, a))
            Thread.sleep(20)
            active.decrementAndGet()
            wins.incrementAndGet()
          }
        } catch {
          case _: IllegalStateException => losses.incrementAndGet()
        } finally done.countDown()
      }).start()
    }
    start.countDown()
    assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(wins.get() + losses.get() == threads)
    // all 16 hit create inside each other's hold window; at least one
    // must win, and NO TWO may ever be inside the critical section —
    // the property Hadoop's check-then-act local create() violates
    assert(wins.get() >= 1, "no thread ever acquired the lock")
    assert(losses.get() >= 1, s"no contention materialized (wins=${wins.get()}) — gate vacuous")
    assert(maxActive.get() == 1, s"${maxActive.get()} maintainers held the lock at once")
    // the last winner released: the lock file is gone
    assert(!new java.io.File(Maintenance.lockPath(path).toUri.getPath).exists)
  }

  test("a compaction crash before publish leaves the layout unchanged; retry lands it; pinned readers survive") {
    import graft.sfa.{BulkLoad, ModelIO, SFA}
    import org.apache.spark.sql.functions._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val W = 16
    val walk = graft.ts.Loaders.randomWalk(1000 + W - 1, 20260930L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), W, 8, 8,
      normMean = false, lowerBounding = true)
    val corpus = BulkLoad.windowRecords(spark, walk, 2, 500, W, 8, model).cache()
    val path = Warehouse.dir(spark, "recover_spec_index")
    ModelIO.saveIndex(corpus, model.usedBits, prefixLen = 2, path)
    val extra = corpus.filter(col("id") < 150)
    (1 to 2).foreach(i => ModelIO.appendIndex(
      extra.withColumn("id", col("id") + lit(i * 10000L)), model.usedBits, 2, path))
    val preRows = ModelIO.loadIndex(path)(spark).count()
    val preFiles = Maintenance.readManifest(spark, path).get.files.toSet

    // a reader pinned BEFORE the compaction: merge-beside + manifest
    // swap must keep its snapshot scannable through crash, retry, and
    // successful compaction (snapshot isolation — the old in-place
    // overwrite design deleted its files here)
    val pinned = ModelIO.loadIndex(path)(spark)

    // crash at the publish point: merged files durable but UNPUBLISHED
    Maintenance.onBeforeManifestCommit =
      () => throw new RuntimeException("killed at the compaction publish point")
    val died = scala.util.Try(ModelIO.compactIndex(path, maxFilesPerPrefix = 2)(spark))
    Maintenance.onBeforeManifestCommit = () => ()
    assert(died.isFailure, "fixture: the compaction was supposed to crash")
    // layout unchanged (same committed files, same rows), the merged
    // files are orphans, and the lock released with the failure — the
    // documented recovery for a pre-publish compaction crash is RETRY,
    // no dedicated procedure exists because none is needed
    assert(Maintenance.readManifest(spark, path).get.files.toSet == preFiles)
    assert(ModelIO.loadIndex(path)(spark).count() == preRows)
    assert(!new java.io.File(Maintenance.lockPath(path).toUri.getPath).exists,
      "an in-process compaction failure must release the lock")
    assert(Maintenance.listDataFiles(spark, path).filterNot(preFiles).nonEmpty,
      "the crashed compaction must leave its merged files as orphans")

    // retry: the merge lands, one manifest rename swaps old-for-merged
    val compacted = ModelIO.compactIndex(path, maxFilesPerPrefix = 2)(spark)
    assert(compacted.nonEmpty, "fixture never fragmented")
    assert(ModelIO.loadIndex(path)(spark).count() == preRows)
    val byPrefix = Maintenance.readManifest(spark, path).get.files
      .groupBy(_.takeWhile(_ != '/'))
    assert(byPrefix.forall(_._2.size <= 2),
      s"compaction left a heavy prefix: ${byPrefix.view.mapValues(_.size).toMap}")
    // the pinned pre-compact reader still scans its COMPLETE snapshot
    // (its files are tombstoned, not deleted)
    assert(pinned.count() == preRows,
      "a reader pinned across compaction must keep its snapshot")
    // vacuum reclaims the superseded + crashed files; committed state intact
    val report = Maintenance.vacuumOrphans(spark, path)
    assert(report.dataFiles.nonEmpty)
    assert(ModelIO.loadIndex(path)(spark).count() == preRows)
    // and maintenance works again post-compaction
    ModelIO.appendIndex(extra.withColumn("id", col("id") + lit(30000L)),
      model.usedBits, 2, path)
    assert(ModelIO.loadIndex(path)(spark).count() == preRows + 150L)
    corpus.unpersist()
  }

  test("inspectAndRelease: releases exactly when the layout is coherent") {
    import graft.sfa.{BulkLoad, ModelIO, SFA}
    import org.apache.spark.sql.functions._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val W = 16
    val walk = graft.ts.Loaders.randomWalk(800 + W - 1, 20261012L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), W, 8, 8,
      normMean = false, lowerBounding = true)
    val corpus = BulkLoad.windowRecords(spark, walk, 2, 400, W, 8, model).cache()
    val path = Warehouse.dir(spark, "inspect_spec_index")
    ModelIO.saveIndex(corpus.filter(col("id") < 400), model.usedBits, prefixLen = 2, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // no lock -> nothing to release
    intercept[IllegalStateException](Maintenance.inspectAndRelease(spark, path))

    // manufacture a KILLED APPEND: durable-but-unpublished data files
    // (orphans), _temporary job residue, and the held lock
    Maintenance.onBeforeManifestCommit =
      () => throw new RuntimeException("killed mid-append")
    val died = scala.util.Try(ModelIO.appendIndex(
      corpus.filter(col("id") >= 400), model.usedBits, 2, path))
    Maintenance.onBeforeManifestCommit = () => ()
    assert(died.isFailure)
    fs.create(Maintenance.lockPath(path), false).close() // the crash left its lock
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "_temporary/0"))
    val preRows = ModelIO.loadIndex(path)(spark).count()
    assert(preRows == 400L)

    // coherent (the orphans don't damage the snapshot): released, the
    // orphans reported, the residue cleaned
    val orphans = Maintenance.inspectAndRelease(spark, path)
    assert(orphans.nonEmpty, "the killed append's files must be reported as orphans")
    assert(!fs.exists(Maintenance.lockPath(path)), "a coherent layout must be released")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "_temporary")))
    assert(ModelIO.loadIndex(path)(spark).count() == preRows)
    // maintenance resumes: the retried append lands once
    ModelIO.appendIndex(corpus.filter(col("id") >= 400), model.usedBits, 2, path)
    assert(ModelIO.loadIndex(path)(spark).count() == 800L)

    // real damage (a manifest-listed file missing) -> refused, lock kept
    fs.create(Maintenance.lockPath(path), false).close()
    val victim = Maintenance.readManifest(spark, path).get.files.head
    val victimPath = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(path), victim)
    val bytes = {
      val in = fs.open(victimPath)
      val b = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, b, 65536, true)
      b.toByteArray
    }
    fs.delete(victimPath, false)
    val e2 = intercept[IllegalStateException](Maintenance.inspectAndRelease(spark, path))
    assert(e2.getMessage.contains("NOT coherent"))
    assert(fs.exists(Maintenance.lockPath(path)), "damage must keep the lock")
    // restore -> releases
    val out = fs.create(victimPath, true); out.write(bytes); out.close()
    Maintenance.inspectAndRelease(spark, path)
    assert(!fs.exists(Maintenance.lockPath(path)))
    corpus.unpersist()
  }

  test("sidecar: round-trip, atomic overwrite, corrupted read fails fast") {
    val dir = Warehouse.dir(spark, "maint_sidecar")
    new java.io.File(dir).mkdirs()
    assert(Maintenance.readSidecar(spark, dir, "_meta").isEmpty)
    Maintenance.writeSidecar(spark, dir, "_meta", Seq("a" -> "1", "b" -> "x y"))
    assert(Maintenance.readSidecar(spark, dir, "_meta")
      .contains(Map("a" -> "1", "b" -> "x y")))
    // overwrite-rename replaces the content in one step
    Maintenance.writeSidecar(spark, dir, "_meta", Seq("a" -> "2"))
    assert(Maintenance.readSidecar(spark, dir, "_meta").contains(Map("a" -> "2")))
    // a PRESENT but empty sidecar yields an empty map (the caller's
    // schema check is the caller's fail-fast — ModelIO.readIndexMeta
    // throws on missing keys)
    Maintenance.writeSidecar(spark, dir, "_empty", Seq.empty)
    assert(Maintenance.readSidecar(spark, dir, "_empty").contains(Map.empty[String, String]))
    // CORRUPTION fails the read instead of silently skipping the check:
    // overwriting the file out-of-band leaves the Hadoop checksum stale,
    // and the reader must surface that as the documented
    // IllegalStateException, never as a clean "no sidecar" fallback
    val f = new java.io.File(dir, "_meta")
    java.nio.file.Files.writeString(f.toPath, "tampered out-of-band\n")
    val e = intercept[IllegalStateException] {
      Maintenance.readSidecar(spark, dir, "_meta")
    }
    assert(e.getMessage.contains("unreadable"))
  }
}
