package graft.util

import graft.SparkSpec
import graft.sfa.{BulkLoad, IndexOps, ModelIO, SFA}
import org.apache.spark.sql.functions._

/** Crash monkey for the manifest commit protocol: a seeded random
  * schedule of maintenance ops (plain appends, streaming-keyed appends,
  * compactions, vacuums) with a crash injected at the PUBLISH POINT
  * (the manifest rename) of randomly chosen ops, each followed by its
  * documented one-call recovery. After every step the layout must obey
  * the committed-snapshot model:
  *
  *  - the manifest-pinned row count equals the model's expected count
  *    (a crashed op published nothing; its retry published exactly
  *    once — orphans are never adopted);
  *  - the maintained box stats' member counts sum to the same number.
  *
  * At the end, the strongest gates: the persisted box stats equal a
  * from-scratch scan aggregate tuple-for-tuple, and k-NN over the
  * survivor layout equals the brute scan. This is the randomized
  * counterpart of the hand-built crash cases in MaintenanceSpec /
  * ManifestSpec / StreamingIndexIngestSpec — same invariants, schedule
  * drawn by a fixed seed instead of by hand.
  */
class CrashMonkeySpec extends SparkSpec {

  private val W = 16

  test("randomized maintenance schedule with publish-point crashes keeps every invariant") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val n = 4000
    val batchRows = 250
    val walk = graft.ts.Loaders.randomWalk(n + W - 1, 20261015L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), W, 8, 8,
      normMean = false, lowerBounding = true)
    val corpus = BulkLoad.windowRecords(spark, walk, 4, n / 4, W, 8, model).cache()
    corpus.count()
    val path = Warehouse.dir(spark, "crash_monkey_index")
    val rng = new scala.util.Random(20261015L)

    def batch(i: Int) =
      corpus.filter(col("id") >= i * batchRows && col("id") < (i + 1) * batchRows)

    ModelIO.saveIndex(batch(0), model.usedBits, prefixLen = 2, path)
    var expected = batchRows.toLong
    var ingestBid = -1L
    var crashes = 0

    def checkInvariants(stage: String): Unit = {
      val rows = ModelIO.loadIndex(path)(spark).count()
      assert(rows == expected, s"[$stage] pinned rows $rows != model $expected")
      val boxSum = ModelIO.readBoxStats(spark, path).get.map(_._2).sum
      assert(boxSum == expected, s"[$stage] box-stat members $boxSum != model $expected")
    }

    def crashThenRecover(opName: String)(op: => Unit)(recover: => Unit): Unit = {
      var armed = true
      Maintenance.onBeforeManifestCommit = () =>
        if (armed) { armed = false; throw new RuntimeException(s"monkey crash in $opName") }
      val died = scala.util.Try(op)
      Maintenance.onBeforeManifestCommit = () => ()
      assert(died.isFailure, s"$opName was supposed to crash")
      crashes += 1
      recover
      checkInvariants(s"$opName/post-crash")
    }

    (1 until n / batchRows).foreach { i =>
      // every batch gets appended (plain or streaming-keyed, possibly
      // crashing first); compaction/vacuum interleave as extra ops
      val crash = rng.nextDouble() < 0.4
      if (rng.nextBoolean()) { // plain append
        if (crash) {
          crashThenRecover(s"append#$i")(
            ModelIO.appendIndex(batch(i), model.usedBits, 2, path))(
            // a killed append leaves only orphans + (in a real kill)
            // its lock; nothing to repair before the retry
            ())
        }
        ModelIO.appendIndex(batch(i), model.usedBits, 2, path)
      } else { // streaming-keyed append (exactly-once)
        ingestBid += 1
        if (crash) {
          crashThenRecover(s"ingest#$ingestBid")(
            ModelIO.appendIndexBatch(batch(i), model.usedBits, 2, path,
              ingestKey = Some(("monkey", ingestBid))): Unit)(())
        }
        assert(ModelIO.appendIndexBatch(batch(i), model.usedBits, 2, path,
          ingestKey = Some(("monkey", ingestBid))))
        // a replay of the same bid must be a no-op
        assert(!ModelIO.appendIndexBatch(batch(i), model.usedBits, 2, path,
          ingestKey = Some(("monkey", ingestBid))))
      }
      expected += batchRows
      // a compaction with nothing heavy never reaches its publish point
      // (no manifest write), so only the crash variant needs the guard
      def anyHeavy: Boolean = Maintenance.readManifest(spark, path).get.files
        .groupBy(_.takeWhile(_ != '/')).exists(_._2.size > 2)
      rng.nextInt(4) match {
        case 0 => // compaction (row-invariant)
          if (rng.nextBoolean() && anyHeavy) {
            // a compaction crash at the publish point leaves the layout
            // unchanged (the merged files are unpublished orphans) and
            // releases the lock; the documented recovery is RETRY
            crashThenRecover(s"compact#$i")(
              ModelIO.compactIndex(path, maxFilesPerPrefix = 2)(spark): Unit)(
              ModelIO.compactIndex(path, maxFilesPerPrefix = 2)(spark): Unit)
          } else {
            ModelIO.compactIndex(path, maxFilesPerPrefix = 2)(spark)
            ()
          }
        case 1 => // vacuum (no publish point of its own); half the time
          // with a retention window, under which tombstoned state (the
          // appends' superseded _boxes_ generations) must be RETAINED —
          // only never-published crash residue may sweep
          if (rng.nextBoolean()) Maintenance.vacuumOrphans(spark, path)
          else {
            // everything tombstoned in this test is seconds old, so
            // nothing tombstoned may sweep under an hour-long window
            val tombs = Maintenance.readManifest(spark, path).get
              .tombstones.map(_._2).toSet
            val r = Maintenance.vacuumOrphans(spark, path, minAgeMs = 3600L * 1000L)
            val bad = (r.dataFiles ++ r.dirs).filter(tombs)
            assert(bad.isEmpty,
              s"a windowed vacuum swept inside the retention window: $bad")
          }
          ()
        case _ => ()
      }
      checkInvariants(s"step#$i")
    }

    // the directory may still hold orphans from crashed ops; the
    // committed state must be exactly the model regardless
    val report = Maintenance.vacuumOrphans(spark, path)
    info(s"schedule done: rows=$expected, $crashes publish-point crashes injected, " +
      s"final vacuum swept ${report.dataFiles.size} orphan files / " +
      s"${report.dirs.size} dirs / ${report.bytes} bytes")
    assert(crashes >= 3, s"only $crashes crashes fired - the schedule is near-vacuous")
    checkInvariants("final")
    assert(expected == n.toLong, "the schedule must have applied every batch")

    // strongest gates: stats ≡ scan aggregate, k-NN ≡ brute scan
    val scanBoxes = IndexOps.boxTable(
        Maintenance.readLayout(spark, path)
          .select(col("prefix").cast("long").as("prefix"), col("approx")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2), r.getSeq[Double](3)))
      .sortBy(_._1).toSeq
    val statBoxes = ModelIO.readBoxStats(spark, path).get.sortBy(_._1).toSeq
    assert(statBoxes == scanBoxes, "maintained stats drifted from the scan aggregate")
    val queries = BulkLoad.queryWindows(
      spark, graft.ts.Loaders.randomWalk(8 * W, 777L), 3, W, 8, model)
    val loaded = ModelIO.loadIndex(path)(spark)
    val got = IndexOps.knnOverLayout(path, queries, model.bins, model.normMean,
        5, 48, prefixLen = 2)(spark)._1
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = IndexOps.knnScan(
        loaded.select("id", "data"), queries.select("qid", "qdata"), 5)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 15)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 1e-9)
    }
    corpus.unpersist()
  }
}
