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

  test("recoverCompaction restores a failed write-back: rows back, temp and lock released") {
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

    // manufacture EXACTLY the state a mid-overwrite crash leaves behind:
    // a complete phase-1 temp copy of the heavy prefixes, one heavy
    // prefix directory already cleared from the layout, and the lock
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val heavy = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("prefix="))
      .filter(d => fs.listStatus(d.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) > 2)
      .map(_.getPath.getName.stripPrefix("prefix="))
    assert(heavy.nonEmpty, "fixture never fragmented")
    val tmp = new org.apache.hadoop.fs.Path(root.getParent,
      s"${root.getName}_compact_tmp_sim_1")
    spark.read.option("basePath", path)
      .parquet(heavy.map(h => s"$path/prefix=$h"): _*)
      .repartition(heavy.size, col("prefix"))
      .write.mode("overwrite").partitionBy("prefix").parquet(tmp.toString)
    assert(fs.delete(new org.apache.hadoop.fs.Path(root, s"prefix=${heavy.head}"), true))
    fs.create(Maintenance.lockPath(path), false).close()
    // the manifest-pinned read FAILS LOUDLY on the damaged layout — the
    // committed-snapshot contract: a reader never silently sees a subset
    val loud = scala.util.Try(ModelIO.loadIndex(path)(spark).count())
    assert(loud.isFailure, "a manifest-pinned read of a half-swapped layout must fail, not subset")
    // the raw directory view confirms rows are physically gone
    val damaged = spark.read.parquet(path).count()
    assert(damaged < preRows, "the simulated crash must actually lose rows")

    val recovered = Maintenance.recoverCompaction(spark, path, "prefix")
    assert(recovered.toSet == heavy.toSet)
    assert(ModelIO.loadIndex(path)(spark).count() == preRows, "recovery must restore every row")
    heavy.foreach { h =>
      val n = fs.listStatus(new org.apache.hadoop.fs.Path(root, s"prefix=$h"))
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      assert(n == 1, s"prefix=$h holds $n files after recovery")
    }
    assert(!fs.exists(tmp) && !fs.exists(Maintenance.lockPath(path)))
    // idempotent: nothing left to recover
    assert(Maintenance.recoverCompaction(spark, path, "prefix").isEmpty)
    // and maintenance works again post-recovery
    ModelIO.appendIndex(extra.withColumn("id", col("id") + lit(30000L)),
      model.usedBits, 2, path)
    assert(ModelIO.loadIndex(path)(spark).count() == preRows + 150L)

    // a lock with NO temp is NOT a failed write-back: refuse
    fs.create(Maintenance.lockPath(path), false).close()
    intercept[IllegalStateException] {
      Maintenance.recoverCompaction(spark, path, "prefix")
    }
    fs.delete(Maintenance.lockPath(path), false)
    corpus.unpersist()
  }

  test("recoverCompaction: partial temps are dropped, complete temps apply oldest-first") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = Warehouse.dir(spark, "recover_order")
    val path = s"$dir/layout"
    Seq((1L, "base")).toDF("p", "v").write.mode("overwrite").partitionBy("p").parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a phase-1 crash artifact: partition dir + junk, NO _SUCCESS marker —
    // its rows must never reach the layout
    val partial = new org.apache.hadoop.fs.Path(s"$dir/layout_compact_tmp_partial_0")
    fs.mkdirs(new org.apache.hadoop.fs.Path(partial, "p=1"))
    val junk = fs.create(new org.apache.hadoop.fs.Path(partial, "p=1/part-junk.parquet"), true)
    junk.write("not parquet".getBytes("UTF-8")); junk.close()
    // two COMPLETE temps (Spark writes commit _SUCCESS) with conflicting
    // contents for the same partition; explicit modification times make
    // the ordering deterministic
    val oldTmp = s"$dir/layout_compact_tmp_old_1"
    val newTmp = s"$dir/layout_compact_tmp_new_2"
    Seq((1L, "old")).toDF("p", "v").write.partitionBy("p").parquet(oldTmp)
    Seq((1L, "new")).toDF("p", "v").write.partitionBy("p").parquet(newTmp)
    fs.setTimes(new org.apache.hadoop.fs.Path(oldTmp), 1000000000L, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(newTmp), 2000000000L, -1)

    val recovered = graft.util.Maintenance.recoverCompaction(spark, path, "p")
    assert(recovered == Seq("1"))
    // the NEWEST snapshot won, the partial temp's junk never landed
    val vs = spark.read.parquet(path).filter(col("p") === 1L)
      .select("v").collect().map(_.getString(0)).toSeq
    assert(vs == Seq("new"), s"expected the newest temp's rows, got $vs")
    assert(!fs.exists(partial) && !fs.exists(new org.apache.hadoop.fs.Path(oldTmp)) &&
      !fs.exists(new org.apache.hadoop.fs.Path(newTmp)), "all temps must be consumed")
    assert(!fs.exists(Maintenance.lockPath(path)), "recovery must release its lock")
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

    // a compaction temp -> refused (recoverCompaction's job), lock kept
    fs.create(Maintenance.lockPath(path), false).close()
    val tmp = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path).getParent, "inspect_spec_index_compact_tmp_x")
    fs.mkdirs(tmp)
    val e1 = intercept[IllegalStateException](Maintenance.inspectAndRelease(spark, path))
    assert(e1.getMessage.contains("recoverCompaction"))
    assert(fs.exists(Maintenance.lockPath(path)), "refusal must keep the lock")
    fs.delete(tmp, true)

    // real damage (a manifest-listed file missing) -> refused, lock kept
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
