package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gates for the streaming IVF-cell near-dup candidate generator:
  *
  *  1. the local per-record cell assignment must equal the batch
  *     membership plan (crossJoin against broadcast centroids → score
  *     desc / cell asc window → top `probes`) on the same centroids;
  *  2. the stateful anchor-star candidates must equal the expected
  *     keep-first fold of the cell buckets, including cells whose
  *     members arrive in different micro-batches.
  */
class StreamingEmbedDupSpec extends SparkSpec {

  private val Probes = 2

  // 12 deterministic 8-dim integer vectors in three direction clusters
  // (scaled copies share a cosine direction → same nearest cells)
  private def mkVecs: Seq[StreamingEmbedDup.VecEvent] = {
    val d1 = Array(5L, 1L, 0L, 0L, 2L, 0L, 1L, 0L)
    val d2 = Array(0L, 4L, 5L, 1L, 0L, 2L, 0L, 0L)
    val d3 = Array(1L, 0L, 0L, 5L, 4L, 0L, 0L, 3L)
    def scale(v: Array[Long], k: Long) = v.map(_ * k)
    Seq(
      StreamingEmbedDup.VecEvent(1L, d1),
      StreamingEmbedDup.VecEvent(2L, scale(d1, 3)),
      StreamingEmbedDup.VecEvent(3L, d1.updated(1, 2L)),
      StreamingEmbedDup.VecEvent(10L, d2),
      StreamingEmbedDup.VecEvent(11L, scale(d2, 2)),
      StreamingEmbedDup.VecEvent(20L, d3),
      StreamingEmbedDup.VecEvent(21L, scale(d3, 4)),
      StreamingEmbedDup.VecEvent(30L, Array(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L)))
  }

  // centroids = the three cluster directions (integer, with exact norms)
  private def mkCentroids: Seq[StreamingEmbedDup.Centroid] = {
    def c(cell: Long, v: Array[Long]) =
      StreamingEmbedDup.Centroid(cell, v, v.map(x => x * x).sum)
    Seq(
      c(0L, Array(5L, 1L, 0L, 0L, 2L, 0L, 1L, 0L)),
      c(1L, Array(0L, 4L, 5L, 1L, 0L, 2L, 0L, 0L)),
      c(2L, Array(1L, 0L, 0L, 5L, 4L, 0L, 0L, 3L)),
      c(3L, Array(2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L)))
  }

  test("local cell assignment equals the batch membership window plan") {
    import spark.implicits._
    val vecs = mkVecs
    val cents = mkCentroids
    val base = vecs.map(v => (v.vec_id, v.iv.toSeq)).toDF("id", "iv")
    val centDf = cents.map(c => (c.cell, c.cv.toSeq, c.cn2)).toDF("cell", "cv", "cn2")
    // the batch dupMembership plan shape, with the generic SQL dot
    // (same integer arithmetic as the codegen'd LongDotExpr)
    val byId = Window.partitionBy("id").orderBy(desc("score"), col("cell"))
    val batch = base.crossJoin(broadcast(centDf))
      .withColumn("dotv",
        expr("aggregate(zip_with(iv, cv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("score", col("dotv") / sqrt(col("cn2")))
      .withColumn("rn", row_number().over(byId))
      .filter(col("rn") <= Probes)
      .select("id", "cell")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    vecs.foreach { v =>
      val local = StreamingEmbedDup.probeCells(v.iv, cents, Probes).toSet
      assert(batch(v.vec_id) == local, s"membership mismatch for vec ${v.vec_id}")
    }
  }

  test("streaming anchor-star candidates equal the keep-first cell fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vecs = mkVecs
    val cents = mkCentroids

    val input = MemoryStream[StreamingEmbedDup.VecEvent]
    val query = StreamingEmbedDup.candidateStream(input.toDS(), cents, Probes)(spark)
      .writeStream.format("memory").queryName("embeddup_out").outputMode("append")
      .start()
    // split micro-batches INSIDE the first cluster: vec 3's candidate
    // must come from cross-batch state
    input.addData(vecs.take(2))
    query.processAllAvailable()
    input.addData(vecs.drop(2))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.sql("select vec_id, cell, anchor from embeddup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // expected: keep-first fold of the cell buckets in vec_id order
    val expected = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val anchors = scala.collection.mutable.Map.empty[Long, Long]
    vecs.sortBy(_.vec_id).foreach { v =>
      StreamingEmbedDup.probeCells(v.iv, cents, Probes).foreach { cell =>
        anchors.get(cell) match {
          case None => anchors(cell) = v.vec_id
          case Some(a) if a != v.vec_id => expected += ((v.vec_id, cell, a))
          case _ =>
        }
      }
    }
    assert(streamed == expected.toSet)
    // fixture sanity: the scaled copies share their direction's cell and
    // point at the cluster's first vector
    assert(streamed.exists { case (v, _, a) => v == 2L && a == 1L })
    assert(streamed.exists { case (v, _, a) => v == 11L && a == 10L })
    assert(streamed.exists { case (v, _, a) => v == 21L && a == 20L })
  }
}
