package graft.streaming

import graft.SparkSpec
import graft.sfa.SFA
import graft.ts.Loaders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming BOSS VS scoring must converge to the batch prediction once
  * a series' words have all arrived, with anytime predictions emitted
  * per micro-batch along the way (the running-score state lives in
  * GroupState between batches).
  */
class StreamingScoreSpec extends SparkSpec {

  private val base = "/root/reference/src/main/resources/datasets/univariate"
  private val W = 32
  private val L = 8
  private val Alpha = 4

  test("streaming scores converge to the batch tf-idf prediction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val train = Loaders.loadUcrLocal(s"$base/CBF/CBF_TRAIN")
    val test = Loaders.loadUcrLocal(s"$base/CBF/CBF_TEST").filter(_.id % 90 == 0) // 10 series

    val model = SFA.fitWindowing(
      train.map(r => (r.data, r.label)), W, L, Alpha,
      normMean = false, lowerBounding = true)

    def bagOf(data: Array[Double]): Map[Long, Long] = {
      val words = model.transformWindowingWords(data, L)
      val bag = scala.collection.mutable.Map.empty[Long, Long]
      var prev = -1L
      words.foreach { w =>
        if (w != prev) { bag(w) = bag.getOrElse(w, 0L) + 1L; prev = w }
      }
      bag.toMap
    }

    // batch tf-idf class matrix (BOSSVS.java:58-110 formula, L2-normed)
    val labels = train.map(_.label).distinct.sorted
    val k = labels.length
    val tf = scala.collection.mutable.Map.empty[(Double, Long), Long]
    train.foreach { r =>
      bagOf(r.data).foreach { case (w, c) =>
        tf((r.label, w)) = tf.getOrElse((r.label, w), 0L) + c
      }
    }
    val wc = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.map(_._1).toSet.size }
    val rawW = tf.map { case ((lab, w), t) =>
      (lab, w) -> (if (wc(w) == k) 0.0
                   else (1.0 + math.log10(t.toDouble)) / math.log10(1.0 + k.toDouble / wc(w)))
    }
    val l2 = labels.map(lab =>
      lab -> math.sqrt(rawW.collect { case ((`lab`, _), v) => v * v }.sum)).toMap
    val weights: Map[Long, Array[Double]] = rawW.keys.map(_._2).toSeq.distinct.map { w =>
      w -> labels.map { lab =>
        val v = rawW.getOrElse((lab, w), 0.0)
        if (l2(lab) != 0.0) v / l2(lab) else 0.0
      }.toArray
    }.toMap

    // batch predictions: argmax Σ tc·nweight, ties → smaller label
    def batchPred(data: Array[Double]): Double = {
      val scores = labels.map { lab =>
        bagOf(data).map { case (w, c) =>
          c * weights.get(w).map(_(labels.indexOf(lab))).getOrElse(0.0)
        }.sum
      }
      labels.zip(scores).reduceLeft { (a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
      }._1
    }

    // stream: per-series words in three micro-batches through the scorer
    val wordEvents = test.flatMap { r =>
      model.transformWindowingWords(r.data, L).zipWithIndex.map { case (w, off) =>
        StreamingWords.WordEvent(r.id, off.toLong, w)
      }
    }
    val input = MemoryStream[StreamingWords.WordEvent]
    val preds = StreamingScore.scoreStream(input.toDS(), weights, labels.toArray)(spark)
    val query = preds.writeStream
      .format("memory").queryName("score_out").outputMode("append").start()
    wordEvents.grouped((wordEvents.length + 2) / 3).foreach { chunk =>
      input.addData(chunk.toSeq)
      query.processAllAvailable()
    }
    query.stop()

    val rows = spark.sql("select user_id, windows, pred from score_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length > test.length, "anytime predictions: more rows than series")
    val finals = rows.groupBy(_._1).map { case (id, rs) => id -> rs.maxBy(_._2)._3 }
    var correct = 0
    test.foreach { r =>
      val want = batchPred(r.data)
      val got = finals(r.id)
      assert(got == want, s"series ${r.id}: streamed $got vs batch $want")
      if (want == r.label) correct += 1
    }
    info(s"series=${test.length} anytime_rows=${rows.length} batch_agreement=ok correct=$correct")
    assert(correct >= test.length / 2, "single-window tf-idf should beat chance on CBF")

    // Update-mode variant: same state machine through an update sink;
    // latest row per key must equal the append run's finals
    val input2 = MemoryStream[StreamingWords.WordEvent]
    val preds2 = StreamingScore.scoreStreamLatest(input2.toDS(), weights, labels.toArray)(spark)
    val query2 = preds2.writeStream
      .format("memory").queryName("score_out_upd").outputMode("update").start()
    wordEvents.grouped((wordEvents.length + 2) / 3).foreach { chunk =>
      input2.addData(chunk.toSeq)
      query2.processAllAvailable()
    }
    query2.stop()
    val updRows = spark.sql("select user_id, windows, pred from score_out_upd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val updFinals = updRows.groupBy(_._1).map { case (id, rs) => id -> rs.maxBy(_._2)._3 }
    assert(updFinals == finals, "update-mode finals differ from append-mode finals")
  }
}
