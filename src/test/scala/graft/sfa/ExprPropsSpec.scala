package graft.sfa

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}
import org.apache.spark.sql.catalyst.expressions.Literal

/** Randomized parity gates for the native codegen kernels: the fixed
  * worked examples in ExtensionsSpec pin representative values; these
  * drive the SAME expressions through both evaluation paths on random
  * inputs — interpreted (`nullSafeEval`, per case) and whole-stage
  * codegen (one DataFrame over all cases) — against the driver-side
  * Scala reference, exact equality. Catches codegen/interpreted drift
  * and knife-edges (length mismatches, zero vectors, max symbols) the
  * hand-picked cases miss.
  */
class ExprPropsSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260815L)

  private def litArr[T](v: Seq[T], et: org.apache.spark.sql.types.DataType) =
    Literal.create(v, ArrayType(et))

  test("property: Ed2Expr ≡ Scala kernel, interpreted and codegen") {
    import spark.implicits._
    val cases = (0 until 300).map { i =>
      val n = rnd.nextInt(12) // incl. 0-length
      val m = if (i % 7 == 0) rnd.nextInt(12) else n // occasional mismatch
      (i.toLong,
        Seq.fill(n)(rnd.nextDouble() * 20 - 10),
        Seq.fill(m)(rnd.nextDouble() * 20 - 10))
    }
    def ref(a: Seq[Double], b: Seq[Double]): Double = {
      val n = math.min(a.length, b.length)
      var d = 0.0; var i = 0
      while (i < n) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    // interpreted
    cases.foreach { case (_, a, b) =>
      val got = graft.sfa.expr.Ed2Expr(
        litArr(a, DoubleType), litArr(b, DoubleType)).eval(null)
      assert(got == ref(a, b))
    }
    // codegen (one job over all cases)
    val df = cases.toDF("id", "a", "b")
    val expCol = org.apache.spark.sql.graft.Bridge.column(graft.sfa.expr.Ed2Expr(
      org.apache.spark.sql.graft.Bridge.expression(col("a")),
      org.apache.spark.sql.graft.Bridge.expression(col("b"))))
    val got = df.select(col("id"), expCol.as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (id, a, b) => assert(got(id) == ref(a, b), s"case $id") }
  }

  test("property: BossDistExpr ≡ Scala fold, interpreted and codegen") {
    import spark.implicits._
    val cases = (0 until 300).map { i =>
      val n = rnd.nextInt(10)
      // small counts with many zeros so overlap/no-overlap both occur
      (i.toLong,
        Seq.fill(n)(math.max(0L, rnd.nextInt(6) - 3L)),
        Seq.fill(n)(math.max(0L, rnd.nextInt(6) - 3L)))
    }
    def ref(a: Seq[Long], b: Seq[Long]): Long = {
      var d = 0L; var ov = false; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val t = a(i)
        if (t > 0) { val x = t - b(i); d += x * x; if (b(i) > 0) ov = true }
        i += 1
      }
      if (ov) d else -1L
    }
    cases.foreach { case (_, a, b) =>
      val got = graft.sfa.expr.BossDistExpr(
        litArr(a, LongType), litArr(b, LongType)).eval(null)
      assert(got == ref(a, b))
    }
    val df = cases.toDF("id", "a", "b")
    val expCol = org.apache.spark.sql.graft.Bridge.column(graft.sfa.expr.BossDistExpr(
      org.apache.spark.sql.graft.Bridge.expression(col("a")),
      org.apache.spark.sql.graft.Bridge.expression(col("b"))))
    val got = df.select(col("id"), expCol.as("d")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (id, a, b) => assert(got(id) == ref(a, b), s"case $id") }
  }

  test("property: LbDistExpr ≡ IndexOps.lbDistance, interpreted and codegen, both weightings") {
    import spark.implicits._
    val l = 6
    val alpha = 5
    val bins = Array.fill(l)(Array.iterate(rnd.nextDouble() - 2, alpha - 1)(
      _ + rnd.nextDouble() + 1e-3)) // strictly increasing edges per coef
    val binsSeq = bins.map(_.toSeq).toSeq
    val cases = (0 until 300).map { i =>
      (i.toLong,
        Seq.fill(l)(rnd.nextInt(alpha)), // symbols 0..alpha-1
        Seq.fill(l)(rnd.nextInt(alpha)),
        Seq.fill(l)(rnd.nextDouble() * 6 - 3))
    }
    for (normed <- Seq(true, false)) {
      cases.foreach { case (_, w, qw, qa) =>
        val got = graft.sfa.expr.LbDistExpr(
          litArr(w, IntegerType), litArr(qw, IntegerType), litArr(qa, DoubleType),
          Literal.create(binsSeq, ArrayType(ArrayType(DoubleType))), normed).eval(null)
        val want = IndexOps.lbDistance(w.toArray, qw.toArray, qa.toArray, bins, normed)
        assert(got == want, s"normed=$normed w=$w qw=$qw")
      }
      val df = cases.toDF("id", "w", "qw", "qa")
      val got = df.select(col("id"),
          IndexOps.lbCol(col("w"), col("qw"), col("qa"), bins, normed).as("lb"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      cases.foreach { case (id, w, qw, qa) =>
        val want = IndexOps.lbDistance(w.toArray, qw.toArray, qa.toArray, bins, normed)
        assert(got(id) == want, s"codegen normed=$normed case $id")
      }
    }
  }

  test("property: ShotgunDistExpr ≡ Shotgun.distance, interpreted and codegen") {
    import spark.implicits._
    val w = 8
    val cases = (0 until 120).map { i =>
      // lengths straddle the window: shorter-than-w queries take the
      // truncated-window path, longer series exercise the sliding scan
      val nq = w / 2 + rnd.nextInt(3 * w)
      val nt = w + rnd.nextInt(4 * w)
      (i.toLong,
        Seq.fill(nq)(rnd.nextDouble() * 20 - 10),
        Seq.fill(nt)(rnd.nextDouble() * 20 - 10))
    }
    def ref(q: Seq[Double], t: Seq[Double]): Double =
      Shotgun.distance(q.toArray, t.toArray, w)
    cases.foreach { case (_, q, t) =>
      val got = graft.sfa.expr.ShotgunDistExpr(
        litArr(q, DoubleType), litArr(t, DoubleType), w).eval(null)
      assert(got == ref(q, t))
    }
    val df = cases.toDF("id", "q", "t")
    val expCol = org.apache.spark.sql.graft.Bridge.column(graft.sfa.expr.ShotgunDistExpr(
      org.apache.spark.sql.graft.Bridge.expression(col("q")),
      org.apache.spark.sql.graft.Bridge.expression(col("t")), w))
    val got = df.select(col("id"), expCol.as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (id, q, t) => assert(got(id) == ref(q, t), s"case $id") }
  }

  test("property: MinShingleMd5Expr ≡ md5(concat_ws) expression tree") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "δelta", "ε", "zz", "многоязычный", "x")
    val cases = (0 until 200).map { i =>
      val n = rnd.nextInt(12) // incl. < 5 tokens (null fingerprint)
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.size))))
    }
    val df = cases.toDF("id", "toks")
    val B = org.apache.spark.sql.graft.Bridge
    val got = df.select(col("id"),
        B.column(graft.sfa.expr.MinShingleMd5Expr(B.expression(col("toks")), 5)).as("fp"),
        when(size(col("toks")) >= 5, expr(
          "array_min(transform(sequence(0, size(toks)-5), i -> " +
            "md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))))"))
          .as("want"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("fp") == r.getAs[String]("want"), s"case ${r.getLong(0)}")
    }
    // interpreted path too
    cases.foreach { case (_, toks) =>
      val e = graft.sfa.expr.MinShingleMd5Expr(
        Literal.create(toks, ArrayType(org.apache.spark.sql.types.StringType)), 5)
      val v = Option(e.eval(null)).map(_.toString)
      val want =
        if (toks.size < 5) None
        else Some((0 to toks.size - 5).map(i =>
          org.apache.commons.codec.digest.DigestUtils.md5Hex(
            toks.slice(i, i + 5).mkString(" "))).min)
      assert(v == want)
    }
  }

  test("property: DFT expressions ≡ Scala kernels, interpreted and codegen") {
    import spark.implicits._
    val (l, w) = (6, 8)
    val cases = (0 until 80).map { i =>
      // lengths straddle the window (short series: sliding yields no
      // rows, disjoint yields none or partial, MFT pads)
      val n = 1 + rnd.nextInt(4 * w)
      (i.toLong, Seq.fill(n)(rnd.nextDouble() * 20 - 10))
    }
    def deep(a: Any): Seq[Seq[Double]] = a match {
      case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until ad.numElements()).map(i => ad.getArray(i).toDoubleArray().toSeq)
    }
    for (normMean <- Seq(true, false)) {
      cases.foreach { case (_, d) =>
        val dj = graft.sfa.expr.DisjointDftExpr(
          litArr(d, DoubleType), Literal(w), l, normMean).eval(null)
        assert(deep(dj) == SFAOps.disjointKernel(d, w, l, normMean).map(_.toSeq).toSeq)
        val sl = graft.sfa.expr.SlidingDftExpr(
          litArr(d, DoubleType), Literal(w), l, normMean).eval(null)
        assert(deep(sl) == SFAOps.slidingKernel(d, w, l, normMean).map(_.toSeq).toSeq)
        val mf = graft.sfa.expr.MftDftExpr(
          litArr(d, DoubleType), w, l, normMean).eval(null)
        assert(deep(mf) == Fourier.transformWindowing(
          d.toArray, w, l, normMean, lowerBounding = true, applyZNorm = true)
          .map(_.toSeq).toSeq)
      }
      // codegen: one DataFrame pass per expression over all cases
      val df = cases.toDF("id", "d")
      val B = org.apache.spark.sql.graft.Bridge
      val got = df.select(col("id"),
          B.column(graft.sfa.expr.DisjointDftExpr(
            B.expression(col("d")), B.expression(lit(w)), l, normMean)).as("dj"),
          B.column(graft.sfa.expr.SlidingDftExpr(
            B.expression(col("d")), B.expression(lit(w)), l, normMean)).as("sl"),
          B.column(graft.sfa.expr.MftDftExpr(
            B.expression(col("d")), w, l, normMean)).as("mf"))
        .collect()
        .map(r => r.getLong(0) -> (
          r.getSeq[Seq[Double]](1), r.getSeq[Seq[Double]](2), r.getSeq[Seq[Double]](3)))
        .toMap
      cases.foreach { case (id, d) =>
        val (dj, sl, mf) = got(id)
        assert(dj == SFAOps.disjointKernel(d, w, l, normMean).map(_.toSeq).toSeq, s"dj $id")
        assert(sl == SFAOps.slidingKernel(d, w, l, normMean).map(_.toSeq).toSeq, s"sl $id")
        assert(mf == Fourier.transformWindowing(
          d.toArray, w, l, normMean, lowerBounding = true, applyZNorm = true)
          .map(_.toSeq).toSeq, s"mf $id")
      }
    }
  }
}
