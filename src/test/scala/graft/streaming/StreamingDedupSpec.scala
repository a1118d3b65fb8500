package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming dedup must agree with the batch digest-groupBy on the
  * same documents, including duplicates split across micro-batch
  * boundaries (the digest state lives in GroupState between batches).
  */
class StreamingDedupSpec extends SparkSpec {

  test("streaming dedup equals batch keep-first across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .as[StreamingDedup.DocEvent]
      .collect()
      .sortBy(_.doc_id)
    // the sf0.001 fixture has no exact-duplicate texts; re-append every
    // 20th text under a high id so duplicates exist AND arrive in a
    // later micro-batch than their keeper
    val dups = base.zipWithIndex.collect {
      case (d, i) if i % 20 == 0 => d.copy(doc_id = d.doc_id + 100000L)
    }
    val docs = (base ++ dups).sortBy(_.doc_id)

    val input = MemoryStream[StreamingDedup.DocEvent]
    val dedup = StreamingDedup.dedupStream(input.toDS())(spark)
    val query = dedup.writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .start()

    // id-ordered arrival in three micro-batches: duplicates of one text
    // may land in different batches, so keep-first must span state
    docs.grouped((docs.length + 2) / 3).foreach { chunk =>
      input.addData(chunk.toSeq)
      query.processAllAvailable()
    }
    query.stop()

    val streamed = spark.sql("select doc_id, h, keeper, copy_idx from dedup_out")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // batch truth: keeper = min doc_id per digest, copies = group size
    val byDigest = docs.groupBy(d => StreamingDedup.digest(d.text))
    assert(streamed.length == docs.length, "one emitted row per document")
    val streamedById = streamed.map(t => t._1 -> t).toMap
    byDigest.foreach { case (h, group) =>
      val keeper = group.map(_.doc_id).min
      group.sortBy(_.doc_id).zipWithIndex.foreach { case (d, i) =>
        val (_, sh, sk, idx) = streamedById(d.doc_id)
        assert(sh == h, s"doc ${d.doc_id} digest $sh vs $h")
        assert(sk == keeper, s"doc ${d.doc_id} keeper $sk vs $keeper")
        assert(idx == i + 1L, s"doc ${d.doc_id} copy_idx $idx vs ${i + 1}")
      }
    }
    val dupCount = streamed.count(_._4 > 1L)
    info(s"docs=${docs.length} digests=${byDigest.size} duplicates=$dupCount")
    assert(dupCount > 0, "fixture contains duplicate texts")
  }
}
