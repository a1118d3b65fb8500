package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Scale gate for the packing path, tagged `graft.Slow`: 1M synthetic
  * documents (deterministic lengths, no fixture dependency) packed into
  * contexts. Asserts the claims the sf-scale ExportSpec cannot:
  *
  *  - the bucket count derives from the corpus (1M docs → 1000
  *    buckets), so the per-bucket prefix-sum window stays ~1000 rows at
  *    ANY corpus size — the packing plan's scale invariant;
  *  - per-bucket streams are gapless and context totals reconcile at
  *    volume (checked distributively — no driver collect of the map);
  *  - non-tail contexts are exactly full.
  *
  * Invocation (the default build filters the Slow tag):
  * `sbt 'set Test/testOptions := Seq()' "testOnly graft.pipeline.PackScaleSpec -- -n graft.Slow"`
  */
class PackScaleSpec extends SparkSpec {

  test("packing invariants hold at 1M documents", graft.Slow) {
    import spark.implicits._
    val n = 1000000L
    // deterministic variable-length texts: 1..40 repeated tokens
    val docsDf = spark.range(n).toDF("doc_id")
      .withColumn("len", (col("doc_id") % 40L) + 1L)
      // doc_id in every token keeps texts distinct — md5 bucketing
      // co-locates EQUAL texts by design (dedup affinity), so a corpus
      // of 1000 repeated texts would occupy only ~632 of 1000 buckets
      .withColumn("text", expr("array_join(transform(sequence(1, CAST(len AS INT)), i -> concat('d', CAST(doc_id AS STRING), 'w', CAST(i AS STRING))), ' ')"))
      .select("doc_id", "text")
    val packed = Export.packSequencesOf(docsDf).cache()

    // bucket count derived from the corpus: 1M/1000 = 1000 buckets,
    // each holding ~1000 docs (md5-uniform)
    val bstats = packed.groupBy("bucket").agg(count(lit(1)).as("c"))
      .agg(min("c").as("mn"), max("c").as("mx"), count(lit(1)).as("nb")).first()
    assert(bstats.getLong(2) == 1000L, s"expected 1000 buckets, got ${bstats.getLong(2)}")
    assert(bstats.getLong(0) > 700L && bstats.getLong(1) < 1300L,
      s"bucket occupancy skew outside md5-uniform bounds: [${bstats.getLong(0)}, ${bstats.getLong(1)}]")

    // gapless per-bucket streams, checked distributively: within each
    // bucket ordered by doc_id, every start equals the previous end
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket").orderBy("doc_id")
    val gaps = packed
      .withColumn("prev_end", lag(col("start_off") + col("n_toks"), 1, 0L).over(w))
      .filter(col("start_off") =!= col("prev_end")).count()
    assert(gaps == 0L, s"$gaps gapped docs")

    // context totals reconcile; non-tail contexts exactly full
    val ctx = Export.packContextsOf(docsDf).cache()
    val tokTotal = packed.agg(sum("n_toks")).first().getLong(0)
    assert(ctx.agg(sum("n_tokens")).first().getLong(0) == tokTotal)
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("bucket")
    val notFull = ctx.withColumn("last", max("ctx").over(wb))
      .filter(col("ctx") < col("last") && col("n_tokens") =!= Export.CtxLen).count()
    assert(notFull == 0L, s"$notFull non-tail contexts not full")
    packed.unpersist(); ctx.unpersist()
  }
}
