package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Export-operator gates: packing invariants, shard-writer round-trip,
  * and the vocab plan shape.
  */
class ExportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.util.Tables.load(spark, dir, "documents")

  test("pack_sequences: contiguous per-bucket streams, correct context spans") {
    val p = Export.packSequencesOf(docs).collect()
    assert(p.nonEmpty)
    val byBucket = p.groupBy(_.getAs[Long]("bucket"))
    for ((_, rows) <- byBucket) {
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      // stream is gapless: each doc starts where the previous ended
      var expect = 0L
      for (r <- sorted) {
        assert(r.getAs[Long]("start_off") == expect,
          s"gap at doc ${r.getAs[Long]("doc_id")}")
        expect += r.getAs[Long]("n_toks")
        // context span matches the offsets
        assert(r.getAs[Long]("ctx_first") == r.getAs[Long]("start_off") / Export.CtxLen)
        assert(r.getAs[Long]("ctx_last") == (expect - 1) / Export.CtxLen)
      }
    }
  }

  test("pack_contexts: every context full except each bucket's tail; totals reconcile") {
    val p = Export.packSequencesOf(docs).collect()
    val ctx = Export.packContextsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lastCtx = ctx.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    for ((b, c, _, toks) <- ctx if c < lastCtx(b))
      assert(toks == Export.CtxLen, s"non-tail context ($b,$c) has $toks tokens")
    assert(ctx.map(_._4).sum == p.map(_.getAs[Long]("n_toks")).sum,
      "context token total != packed token total")
  }

  test("writeShards: partitioned files agree with the manifest query") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Export.writeShards(docs, out, 8)
      val back = spark.read.parquet(out)
      // every doc present exactly once, shard dirs exist
      assert(back.count() == docs.count())
      assert(back.select("doc_id").distinct().count() == docs.count())
      val dirs = new java.io.File(out).listFiles().count(_.getName.startsWith("shard="))
      assert(dirs == 8, s"expected 8 shard dirs, got $dirs")
      // the written shard equals the deterministic md5 assignment
      val expected = Export.withShard(docs, 8L).select(col("doc_id"), col("shard"))
      val mismatch = back.select(col("doc_id"), col("shard").cast("long").as("s2"))
        .join(expected, "doc_id")
        .filter(col("s2") =!= col("shard")).count()
      assert(mismatch == 0)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("vocab_coverage: monotone coverage ending at ~1 when K >= |vocab|, TakeOrdered plan") {
    val vdf = Export.vocabCoverageOf(docs)
    val plan = vdf.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
    val v = vdf.collect()
    assert(v.nonEmpty && v.length <= Export.VocabTopK)
    val covs = v.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("coverage"))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b })
    if (v.length < Export.VocabTopK) // whole vocab listed → full coverage
      assert(math.abs(covs.last - 1.0) < 1e-6)
  }
}
