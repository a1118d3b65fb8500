package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SC}

/** Randomized gates for the algebraic kernels the hash oracles check
  * on only one corpus shape: the interval-union fold behind dup-span
  * coverage/removal, and the BPE fit/apply invariants.
  */
class CurationPropsSpec extends SparkSpec {

  private def passes(p: Prop): Unit = {
    val r = SC.check(SC.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("property: interval-union fold ≡ naive position union (production expression)") {
    // randomized start sets through the PRODUCTION coveredExpr, one
    // DataFrame for all cases; naive union computed driver-side
    val rnd = new scala.util.Random(42)
    val cases: Seq[(Long, Seq[Int])] = (0 until 500).map { i =>
      val n = rnd.nextInt(12)
      i.toLong -> Seq.fill(n)(rnd.nextInt(60)).distinct.sorted
    }
    import spark.implicits._
    val got = cases.toDF("id", "starts")
      .select(col("id"), Curation.coveredExpr.as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (id, starts) =>
      val naive = starts.flatMap(x => x until x + 8).distinct.size.toLong
      assert(got(id) == naive, s"starts=$starts fold=${got(id)} naive=$naive")
    }
  }

  private val word = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString.take(12))
  private val dict = Gen.nonEmptyListOf(Gen.zip(word, Gen.choose(1L, 20L)))
    .map(_.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }.toSeq.sortBy(_._1))

  test("property: BPE segmentation shrinks monotonically in the merge-table prefix") {
    // applying rank-ordered greedy merges: a longer prefix of the
    // fitted table can only merge further — counts are non-increasing
    // in k, bounded by [1, len+1], and the empty table gives len+1
    passes(Prop.forAll(dict, word) { (types, w) =>
      val ms = Bpe.fitMerges(types, 30)
      val counts = (0 to ms.size).map { k =>
        Bpe.applyBpe(w, ms.take(k).map { case (i, l, r, _) => (l, r) -> i.toInt }.toMap)
      }
      counts.head == w.length + 1 &&
        counts.forall(c => c >= 1 && c <= w.length + 1) &&
        counts.zip(counts.tail).forall { case (a, b) => b <= a }
    })
  }

  test("property: BPE fit is a pure function of the dictionary with non-increasing counts") {
    passes(Prop.forAll(dict) { types =>
      val a = Bpe.fitMerges(types, 30)
      val b = Bpe.fitMerges(rnd(types), 30)
      a == b && a.map(_._4).sliding(2).forall {
        case Seq(x, y) => y <= x
        case _         => true
      }
    })
  }

  /** Deterministic shuffle — the fit must not depend on input order. */
  private def rnd[T](xs: Seq[T]): Seq[T] =
    new scala.util.Random(xs.size).shuffle(xs)
}
