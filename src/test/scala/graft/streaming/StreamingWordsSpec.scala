package graft.streaming

import graft.SparkSpec
import graft.sfa.SFA
import graft.ts.Loaders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** The streaming word extractor must emit exactly the words the batch
  * MFT path produces, including across micro-batch boundaries (the
  * recurrence state lives in GroupState between batches).
  */
class StreamingWordsSpec extends SparkSpec {

  test("streaming words equal batch words across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val data = Loaders.znorm(Loaders.randomWalk(120, 4242L))
    val model = SFA.fitWindowing(
      Array((data, 0.0)), 16, 8, 4, normMean = false, lowerBounding = true)
    val batchWords = model.transformWindowingWords(data, 8)

    val input = MemoryStream[StreamingWords.PointEvent]
    val words = StreamingWords.wordStream(input.toDS(), model)(spark)
    val query = words.writeStream
      .format("memory")
      .queryName("words_out")
      .outputMode("append")
      .start()

    // feed the series in three chunks, forcing distinct micro-batches so
    // the recurrence state must survive batch boundaries
    val events = data.zipWithIndex.map { case (v, i) => StreamingWords.PointEvent(7L, i.toLong, v) }
    events.grouped(40).foreach { chunk =>
      input.addData(chunk.toSeq)
      query.processAllAvailable()
    }
    query.stop()

    val out = spark.sql("select offset, word from words_out order by offset")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == batchWords.length,
      s"streamed ${out.length} words, batch ${batchWords.length}")
    out.foreach { case (offset, word) =>
      assert(word == batchWords(offset.toInt),
        s"offset $offset: streamed $word vs batch ${batchWords(offset.toInt)}")
    }
  }
}
