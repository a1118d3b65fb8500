package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 1-NN bag join picks its physical plan from vocabulary
  * cardinality (dense count-vectors vs posting-list equi-join). The
  * two plans must be result-identical on any input — this gate runs
  * both over the same seeded bag table and compares exactly.
  */
class StatsSpec extends SparkSpec {

  test("dense and sparse 1-NN bag plans return identical results") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 12).map(i => f"w$i%02d")
    // 40 docs × ~8 distinct words with counts 1..5; every doc keeps at
    // least one word so no doc drops out of the bag table entirely
    val rows = for {
      doc <- 0 until 40
      w <- rnd.shuffle(vocab).take(1 + rnd.nextInt(8))
    } yield (doc.toLong, w, (1 + rnd.nextInt(5)).toLong)
    val allBags = rows.toDF("doc_id", "word", "c").cache()

    val dense = Stats.nnDense(spark, allBags, vocab.toArray.sorted)
      .orderBy("tid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sparse = Stats.nnSparse(allBags)
      .orderBy("tid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(dense.nonEmpty, "test split produced no 1-NN rows")
    assert(dense.toSeq == sparse.toSeq)

    // size-gated physical variants: the chunked (block-nested-loop)
    // dense broadcast and the sparse shuffle-join fallback must both
    // reproduce the ungated plans exactly
    val denseChunked = Stats.nnDense(spark, allBags, vocab.toArray.sorted, maxBroadcastRows = 2)
      .orderBy("tid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(denseChunked.toSeq == dense.toSeq)
    val sparseShuffle = Stats.nnSparse(allBags, maxBroadcastRows = 0)
      .orderBy("tid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sparseShuffle.toSeq == sparse.toSeq)
  }
}
