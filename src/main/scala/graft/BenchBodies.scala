package graft
import org.apache.spark.sql.SparkSession

/** The bench's extra tracked items (not registered queries), factored out
  * of [[Bench]] so local micro-benchmarks (DevBench) drive EXACTLY the
  * load the bench times — an independent copy could drift and tune the
  * wrong thing. Bodies only; the measurement protocol stays in the
  * caller.
  */
object BenchBodies {

  /** Layout-backed bulk k-NN at BulkLoadSpec's always-on scale (200k
    * windows): bulk MFT transform → prefix-partitioned layout write →
    * partition-pruned exact k-NN. Exactness at this very scale is
    * BulkLoadSpec's gate (k-NN ≡ brute scan, PartitionFilters pinned).
    */
  def bulkKnnBody(spark: SparkSession): Unit = {
    import graft.sfa.{BulkLoad, IndexOps, ModelIO, SFA}
    val (w, l) = (32, 8)
    val (nChunks, chunkSize) = (4, 50000)
    val walk = graft.ts.Loaders.randomWalk(nChunks * chunkSize + w - 1, 20260812L)
    val model = SFA.fitWindowing(Array((walk, 0.0)), w, l, 8,
      normMean = false, lowerBounding = true)
    val corpus = BulkLoad.windowRecords(spark, walk, nChunks, chunkSize, w, l, model)
    val path = graft.util.Warehouse.dir(spark, "bench_bulk_knn")
    ModelIO.saveIndex(corpus, model.usedBits, prefixLen = 2, path)
    val queries = BulkLoad.queryWindows(
      spark, graft.ts.Loaders.randomWalk(4 * w, 777L), 3, w, l, model)
    val (df, _) = IndexOps.knnOverLayout(
      path, queries, model.bins, model.normMean, k = 5, probe = 64, prefixLen = 2)(spark)
    df.write.format("noop").mode("overwrite").save()
  }

  /** Streaming state-path drive: source → stateful op → noop sink,
    * checkpoint included — 100k events over 4 micro-batches so
    * GroupState crosses batch boundaries (see Bench's rationale).
    */
  def streamingWordsBody(spark: SparkSession,
      model: graft.sfa.SFAModel,
      events: IndexedSeq[graft.streaming.StreamingWords.PointEvent]): Unit = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.StreamingWords.PointEvent]
    // state partitions sized from the fixture's true key cardinality
    // (the stream owner's estimate — see StreamTuning): the per-batch
    // state-store commit floor, not the fold, dominated at
    // partitions = cores
    val q = graft.streaming.StreamTuning.withStatePartitions(
        spark, graft.streaming.StreamFixtures.WordUsers.toLong) {
      graft.streaming.StreamingWords.wordStream(input.toDS(), model)(spark)
        .writeStream.format("noop").outputMode("append").start()
    }
    try {
      events.grouped(graft.streaming.StreamFixtures.ChunkSize).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
  }

  def streamingDedupBody(spark: SparkSession,
      events: IndexedSeq[graft.streaming.StreamingDedup.DocEvent]): Unit = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.StreamingDedup.DocEvent]
    val q = graft.streaming.StreamTuning.withStatePartitions(
        spark, graft.streaming.StreamFixtures.DedupKeys.toLong) {
      graft.streaming.StreamingDedup.dedupStream(input.toDS())(spark)
        .writeStream.format("noop").outputMode("append").start()
    }
    try {
      events.grouped(graft.streaming.StreamFixtures.ChunkSize).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
  }
}

/** Local micro-bench over a subset of the bench's items (registered
  * queries by name, or the extra bodies by their bench keys): same
  * session shape, same noop-sink methodology, first + min-of-k per item.
  * Dev tooling only — the driver contract lives in [[Bench]].
  *
  * Usage: DevBench <sfDir> <reps> <item1,item2,...>
  */
object DevBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val items = if (args.length > 2) args(2).split(",").toSeq
      else Seq("streaming_words_100k", "streaming_dedup_100k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    lazy val wordModel = graft.streaming.StreamFixtures.wordModel
    lazy val wordEvents = graft.streaming.StreamFixtures.wordPointEvents
    lazy val docEvents = graft.streaming.StreamFixtures.dedupDocEvents
    def body(name: String): () => Unit = name match {
      case "bulk_knn_layout_200k" => () => BenchBodies.bulkKnnBody(spark)
      case "streaming_words_100k" =>
        val (m, e) = (wordModel, wordEvents)
        () => BenchBodies.streamingWordsBody(spark, m, e)
      case "streaming_dedup_100k" =>
        val e = docEvents
        () => BenchBodies.streamingDedupBody(spark, e)
      case q =>
        val fn = SparkEntry.queries(q)
        () => fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    if (sys.env.contains("DEVBENCH_STREAM_PROFILE")) {
      // one instrumented words drive: per-batch duration breakdown
      import spark.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.StreamingWords.PointEvent]
      val q = graft.streaming.StreamingWords.wordStream(input.toDS(), wordModel)(spark)
        .writeStream.format("noop").outputMode("append").start()
      try {
        wordEvents.grouped(graft.streaming.StreamFixtures.ChunkSize).foreach { chunk =>
          val t0 = System.nanoTime()
          input.addData(chunk); q.processAllAvailable()
          println(f"[profile] batch wall=${(System.nanoTime() - t0) / 1e9}%.3f")
        }
        q.recentProgress.foreach(p =>
          println(s"[profile] batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}"))
      } finally q.stop()
    }
    items.foreach { name =>
      val f = body(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[devbench] $name%-28s first=${times.head}%7.3f min=${times.min}%7.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
