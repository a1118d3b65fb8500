package graft.streaming

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Gates for the streaming MinHash near-dup candidate generator:
  *
  *  1. the per-record Scala signature/banding must be bit-identical to
  *     the batch plan's codegen'd SQL expressions (same md5-truncated
  *     base hash, same affine permutations, same bandkey encoding);
  *  2. the stateful anchor-star candidates must equal the expected
  *     keep-first fold of the band buckets, including buckets whose
  *     members arrive in different micro-batches.
  */
class StreamingNearDupSpec extends SparkSpec {

  private def mkDocs: Seq[StreamingNearDup.DocEvent] = {
    // three exact/near clusters + singletons; ≥3 words each so shingles
    // exist. Near-dups share most 3-gram shingles → same minhash bands
    // with high probability; exact copies share ALL bands certainly.
    val a = "query batch data batch slow key column scan sort vector big filter"
    val b = a // exact copy → all 8 bands collide
    val c = a.replace("vector", "merge") // near copy
    val d = "stream group agg merge row small part window table fast hash join"
    val e = d
    Seq(
      StreamingNearDup.DocEvent(1L, a),
      StreamingNearDup.DocEvent(2L, b),
      StreamingNearDup.DocEvent(3L, c),
      StreamingNearDup.DocEvent(10L, d),
      StreamingNearDup.DocEvent(11L, e),
      StreamingNearDup.DocEvent(20L, "alpha beta gamma delta epsilon zeta"))
  }

  test("local signature pipeline is bit-identical to the batch SQL expressions") {
    import spark.implicits._
    val docs = mkDocs.toDF("doc_id", "text")
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("ws", filter(col("ws"), w => w =!= ""))
      .withColumn("n", size(col("ws")))
      .filter(col("n") >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, n-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("sh"))
      .distinct()
    val minCols = (0 until Dedup.NumHashes).map(i =>
      min(expr(s"(${Dedup.permA(i)}L * hv + ${Dedup.permB(i)}L) % ${Dedup.MinhashP}L")).as(s"m$i"))
    val sqlSigs = sh
      .withColumn("hv", expr("cast(conv(substring(md5(sh), 1, 7), 16, 10) as bigint)"))
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to Dedup.NumHashes).map(r.getLong).toArray)
      .toMap
    mkDocs.foreach { d =>
      val local = Dedup.sigLocal(Dedup.shinglesLocal(d.text))
      assert(sqlSigs(d.doc_id).toSeq == local.toSeq, s"signature mismatch for doc ${d.doc_id}")
    }
  }

  test("streaming anchor-star candidates equal the keep-first bucket fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = mkDocs

    val input = MemoryStream[StreamingNearDup.DocEvent]
    val query = StreamingNearDup.candidateStream(input.toDS())(spark)
      .writeStream.format("memory").queryName("neardup_out").outputMode("append")
      .start()
    // two micro-batches split INSIDE the {1,2,3} cluster: doc 3's
    // candidates must come from cross-batch state
    input.addData(docs.take(2))
    query.processAllAvailable()
    input.addData(docs.drop(2))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.sql("select doc_id, band, anchor from neardup_out")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // expected: keep-first fold of the band buckets in arrival order
    // (= doc_id order here)
    val expected = scala.collection.mutable.Set.empty[(Long, Int, Long)]
    val anchors = scala.collection.mutable.Map.empty[(Int, String), Long]
    docs.sortBy(_.doc_id).foreach { d =>
      StreamingNearDup.bandEvents(d).foreach { e =>
        anchors.get((e.band, e.bandkey)) match {
          case None => anchors((e.band, e.bandkey)) = d.doc_id
          case Some(a) if a != d.doc_id => expected += ((d.doc_id, e.band, a))
          case _ =>
        }
      }
    }
    assert(streamed == expected.toSet)
    // sanity on the fixture: the exact copy pairs (2→1, 11→10) collide
    // in every band, and the near copy 3 found anchor 1 in ≥1 band
    assert((0 until 8).forall(b => streamed.contains((2L, b, 1L))))
    assert((0 until 8).forall(b => streamed.contains((11L, b, 10L))))
    assert(streamed.exists { case (d, _, a) => d == 3L && a == 1L })
  }
}
