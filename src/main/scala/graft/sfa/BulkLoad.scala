package graft.sfa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunked subsequence bulk load — the reference's SFATrie bulk-load
  * shape (SFABulkLoadTest.java:170-238): one long series is cut into
  * chunks with w−1 overlap, each chunk runs the MFT recurrence
  * independently on its executor (the reference restarts its transform
  * per chunk for the same reason), and every sliding window becomes one
  * (id, data, word, approx) index record.
  *
  * Windows are stored 1/σ-scaled — exactly the scaling their Fourier
  * approximations carry — so Parseval holds between the stored payload
  * and the approximation and the SFA lower bound is valid for the
  * stored distance; word = quantize(approx) by construction.
  *
  * Shared by BulkLoadSpec (exactness gates at 200k and 2M windows) and
  * Bench's layout-backed k-NN line item (wall-time tracking at 200k).
  */
object BulkLoad {

  /** Per-window index records of `walk` as `nChunks` × `chunkSize`
    * overlapping chunks (`walk` must hold nChunks·chunkSize + w − 1
    * points). One input row per chunk; the MFT explode happens on the
    * executors.
    */
  def windowRecords(spark: SparkSession, walk: Array[Double], nChunks: Int,
      chunkSize: Int, w: Int, l: Int, model: SFAModel): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val chunks = (0 until nChunks).map { c =>
      (c.toLong * chunkSize,
        walk.slice(c * chunkSize, c * chunkSize + chunkSize + w - 1).toSeq)
    }.toDF("base", "cdata")
    val winUdf = udf { (cdata: Seq[Double]) =>
      val arr = cdata.toArray
      val m = bc.value
      val approx = Fourier.transformWindowing(
        arr, w, l, m.normMean, m.lowerBounding, applyZNorm = true)
      val (_, stds) = Fourier.rollingMeanStdDirect(arr, w)
      approx.indices.map { t =>
        val f = if (stds(t) > 0) 1.0 / stds(t) else 1.0
        (t.toLong, arr.slice(t, t + w).map(_ * f).toSeq,
          m.quantize(approx(t)).toSeq, approx(t).toSeq)
      }
    }
    chunks
      .select(col("base"), explode(winUdf(col("cdata"))).as("wr"))
      .select((col("base") + col("wr._1")).as("id"), col("wr._2").as("data"),
        col("wr._3").as("word"), col("wr._4").as("approx"))
  }

  /** Query windows (qid, qdata, qword, qapprox) cut from `qwalk` at
    * stride w, 1/σ-scaled like the corpus records.
    */
  def queryWindows(spark: SparkSession, qwalk: Array[Double], nQueries: Int,
      w: Int, l: Int, model: SFAModel): DataFrame = {
    import spark.implicits._
    (0 until nQueries).map { i =>
      val raw = qwalk.slice(i * w, i * w + w)
      val mean = raw.sum / w
      val sq = raw.map(x => x * x).sum / w - mean * mean
      val std = if (sq > 0) math.sqrt(sq) else 0.0
      val f = if (std > 0) 1.0 / std else 1.0
      val qa = Fourier.transformWindow(raw, 0, w, l, model.normMean, model.lowerBounding)
        .map(_ * f)
      (i.toLong, raw.map(_ * f).toSeq, model.quantize(qa).toSeq, qa.toSeq)
    }.toDF("qid", "qdata", "qword", "qapprox")
  }
}
