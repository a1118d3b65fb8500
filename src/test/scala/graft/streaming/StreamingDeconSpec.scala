package graft.streaming

import graft.SparkSpec
import graft.pipeline.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Gates for streaming decontamination:
  *
  *  1. streaming verdicts ≡ the batch [[Curation.deconOf]] rows on the
  *     same corpus (docs split across micro-batches), including the
  *     sentinel path for sub-8-token docs;
  *  2. a re-delivered doc is screened exactly once (state dedup).
  */
class StreamingDeconSpec extends SparkSpec {

  private val gram8 = "g1 g2 g3 g4 g5 g6 g7 g8"

  private def mkDocs: Seq[StreamingDecon.DocEvent] = Seq(
    // doc 0: eval split (0 % 97 == 0) — the benchmark itself
    StreamingDecon.DocEvent(0L, s"e0 $gram8 e1"),
    StreamingDecon.DocEvent(1L, s"t0 t1 $gram8 t2"), // contaminated
    StreamingDecon.DocEvent(2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"), // clean
    StreamingDecon.DocEvent(3L, "short doc"), // sentinel path
    StreamingDecon.DocEvent(4L, s"x1 x2 x3 $gram8")) // contaminated

  test("streaming verdicts equal the batch decontamination rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = mkDocs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val batch = Curation.deconOf(docsDf, Curation.gramsOf(docsDf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet

    val evalGrams = Curation.gramsOf(docsDf)
      .filter(col("doc_id") % Curation.EvalMod === 0)
      .select("gh").distinct()

    val input = MemoryStream[StreamingDecon.DocEvent]
    val query = StreamingDecon.verdictStream(input.toDS(), evalGrams)
      .writeStream.format("memory").queryName("decon_out").outputMode("append")
      .start()
    // micro-batch 1: eval doc + one contaminated; batch 2: the rest,
    // plus a RE-delivery of doc 1 which must not emit a second verdict
    input.addData(mkDocs.take(2))
    query.processAllAvailable()
    input.addData(mkDocs.drop(2) :+ mkDocs(1))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.sql("select doc_id, n_grams, hit_grams, contaminated from decon_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.length == streamed.map(_._1).distinct.length, "duplicate verdicts emitted")
    assert(streamed.toSet == batch, s"stream ${streamed.toSet} != batch $batch")
  }
}
