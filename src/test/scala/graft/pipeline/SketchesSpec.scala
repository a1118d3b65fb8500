package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV gates the oracle can't see: the small-set exact rule, a planted
  * accuracy check at 10× the sketch size, and the plan gate that the
  * rank filter actually compiles to the bounded WindowGroupLimit (the
  * property that makes the sketch scale).
  */
class SketchesSpec extends SparkSpec {

  test("small sets report exactly; a 10x-K set estimates within 3/sqrt(K)") {
    import spark.implicits._
    // lang 'a': 93 distinct 8-grams (< K=256) → exact; 'b': 2553
    val docs = Seq(
      (1L, (0 until 100).map(i => s"a$i").mkString(" "), "a"),
      (2L, (0 until 2560).map(i => s"b$i").mkString(" "), "b"))
      .toDF("doc_id", "text", "lang")
    val out = Sketches.kmvOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") == ((93L, 93L, 0.0)), s"small set must report exactly: ${out("a")}")
    val (exact, est, _) = out("b")
    assert(exact == 2553L)
    val bound = 3.0 / math.sqrt(256.0) // 3σ ≈ 0.1875
    assert(math.abs(est - 2553.0) / 2553.0 <= bound,
      s"KMV estimate $est off exact 2553 by more than $bound")
  }

  test("the per-group rank filter compiles to WindowGroupLimit") {
    val df = graft.SparkEntry.queries("sketch_distinct_grams")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("WindowGroupLimit"),
      s"expected the bounded per-group top-k operator:\n$plan")
    // and the fixture numbers themselves stay honest
    val rows = df.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(3) <= 0.2, s"rel_err blew past 3/sqrt(K) on ${r.getString(0)}: $r")
    }
  }
}
