package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{QueryDef, Tables}
import graft.util.Rnd.jround
import graft.sfa.SFAOps

/** Parameter-sweep ("meta") queries — SURVEY §2.9's grids expressed as
  * single declarative queries where the grid axis is a column, each with
  * a full DuckDB oracle. The full fit-quality grids (LOOCV / CV-scored)
  * live in the classifier classes and are golden-gated; these queries
  * pin the GRID MECHANICS — per-config fit, per-config score, ranked
  * model pick — to bit-exact oracles.
  *
  *  - m2_window_grid   → BOSS VS window-length grid
  *    (BOSSVSClassifier.java:88-209): per w ∈ {8,16} fit equi-depth SFA
  *    + tf-idf class matrix on the train split, score the held-out
  *    split, rank models desc by (score, w) — the rank column IS the O3
  *    model sort (Classifier.java:300-308).
  *  - m3_weasel_grid   → WEASEL f-sweep (WEASELClassifier.java:214-309):
  *    words computed ONCE at maxF, swept f ∈ {4,6,8} via the word-mask
  *    trick (BOSS.java:122-141 — no re-transform), per-f uni/bigram χ²
  *    feature counts at the reference's χ² ≥ 2 limit.
  *  - m4_muse_grid     → MUSE histogram-type grid
  *    (MUSEClassifier.java:29-30,163-268): EQUI_DEPTH vs EQUI_WIDTH
  *    binning of the same spectra, vocabulary/window counts per type.
  *  - m5_teaser_cascade → TEASER snapshot cascade
  *    (TEASERClassifier.java:129-195): per snapshot length s ∈
  *    {24,32,48} a fresh slave fitted on the truncated series (fit bins
  *    → words → bags → 1-NN) and its accuracy — the cascade's
  *    per-snapshot quality curve.
  *
  * Scale: every grid point is a data column (norm/w/f/hist/snap), not a
  * separate job — one plan per query, shuffles keyed on (user_id ⊕ grid
  * axis), the same architecture the classifier grids use.
  */
object GridQ {

  private val L = 8
  private val Alpha = 4
  private val Bits = 2
  private val NumClasses = 3

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ---- M2: BOSS VS window grid {8, 16} --------------------------------

  private val M2Windows = Seq(8, 16)

  /** tf-idf class matrix from train bags; score the test split; (w,
    * correct, total). Mirrors [[ClassifierQ]]'s j2 chain per window.
    */
  private def m2(s: SparkSession, dir: String): DataFrame = {
    // SfaQ.series is already an eagerly-materialized session cache —
    // both windows' pipelines below scan it from the block store
    val ser = SfaQ.series(s, dir)
    // a window-grid FIT at fixture input size is plan-depth-bound:
    // run it (and the result materialization) in the small-fit scope
    graft.util.Pipelines.smallFitScope(s, ser.count()) { m2Body(s, ser) }
  }

  private def m2Body(s: SparkSession, ser: DataFrame): DataFrame = {
    // the grid axis `w` is a COLUMN, not a driver loop: both windows'
    // quantizer fits run in ONE grouped aggregate, the word/bag/tf-idf
    // chain is keyed by (w, …) throughout, and the whole grid is ONE
    // plan — exactly the architecture a 1000-config sweep needs
    // (GridPlanSpec pins shuffle-count independence on THIS pipeline)
    val bags = graft.util.Pipelines.tracked(s,
      SFAOps.windowGridBags(ser, M2Windows, L, Alpha, Bits))
    // materialize before composing the tf-idf chain: its broadcast
    // subtrees are submitted concurrently, and against a cold cache
    // each would recompute the whole word pipeline independently
    bags.count()
    val train = bags.filter(col("user_id") % 2 === 0)
      .withColumn("cls", col("user_id") % NumClasses)
    val tf = train.groupBy("w", "cls", "word").agg(sum(col("cnt")).as("tf"))
    val wc = tf.groupBy("w", "word").agg(count(lit(1)).as("wc"))
    val wt = tf.join(wc, Seq("w", "word"))
      .withColumn("weight",
        when(col("wc") === NumClasses, lit(0.0))
          .otherwise((lit(1.0) + log10(col("tf").cast("double"))) /
            log10(lit(1.0) + lit(NumClasses) / col("wc").cast("double"))))
    val l2 = wt.groupBy("w", "cls").agg(sqrt(sum(col("weight") * col("weight"))).as("l2"))
    val nw = wt.join(l2, Seq("w", "cls"))
      .withColumn("nweight",
        when(col("l2") =!= 0.0, col("weight") / col("l2")).otherwise(lit(0.0)))
      .select(col("w"), col("cls"), col("word"), col("nweight"))
    val test = bags.filter(col("user_id") % 2 === 1)
      .select(col("w"), col("user_id"), col("word"), col("cnt"))
    // per-w class list (the old per-branch crossJoin, now a w-keyed join)
    val classes = nw.select(col("w"), col("cls")).distinct()
    val byScore = Window.partitionBy("w", "user_id")
      .orderBy(col("score").desc, col("cls").asc)
    val graded = test.join(broadcast(classes), Seq("w"))
      .join(nw, Seq("w", "cls", "word"), "left")
      .na.fill(0.0, Seq("nweight"))
      .groupBy("w", "user_id", "cls")
      .agg(sum(col("cnt") * col("nweight")).as("score"))
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") === 1)
      .groupBy("w")
      .agg(
        sum(when(col("cls") === col("user_id") % NumClasses, 1L).otherwise(0L)).as("correct"),
        count(lit(1)).as("total"))
    // left-join from the axis dim: an EMPTY grid point still emits its
    // row (correct NULL, total 0) exactly like the per-branch global
    // aggregate the oracle's UNION ALL computes
    import s.implicits._
    val wDim = M2Windows.map(_.toLong).toDF("w")
    val full = wDim.join(graded, Seq("w"), "left")
      .withColumn("total", coalesce(col("total"), lit(0L)))
    val byModel = Window.orderBy(col("correct").desc, col("w").desc)
    val res = graft.util.Pipelines.tracked(s, full
      .withColumn("rank", row_number().over(byModel).cast("long"))
      .orderBy("w"))
    res.count() // materialize inside the small-fit scope
    res
  }

  private def m2Branch(w: Int): String =
    "(" + SfaQ.prefixFor(w) + SfaQ.slidingCtesFor(w) + s"""
      |, trb AS (
      |  SELECT user_id % $NumClasses AS cls, user_id, word, cnt FROM bags WHERE user_id % 2 = 0
      |), tf AS (SELECT cls, word, SUM(cnt) AS tf FROM trb GROUP BY 1, 2
      |), wc AS (SELECT word, COUNT(*) AS wc FROM tf GROUP BY 1
      |), wt AS (
      |  SELECT t.cls, t.word,
      |    CASE WHEN w.wc = $NumClasses THEN 0.0
      |         ELSE (1.0 + LOG10(CAST(t.tf AS DOUBLE)))
      |              / LOG10(1.0 + $NumClasses / CAST(w.wc AS DOUBLE)) END AS weight
      |  FROM tf t JOIN wc w ON t.word = w.word
      |), l2 AS (SELECT cls, SQRT(SUM(weight * weight)) AS l2 FROM wt GROUP BY 1
      |), nw AS (
      |  SELECT w.cls, w.word,
      |    CASE WHEN n.l2 <> 0 THEN w.weight / n.l2 ELSE 0.0 END AS nweight
      |  FROM wt w JOIN l2 n ON w.cls = n.cls
      |), teb AS (
      |  SELECT user_id, word, cnt FROM bags WHERE user_id % 2 = 1
      |), sc AS (
      |  SELECT b.user_id, c.cls, SUM(b.cnt * COALESCE(n.nweight, 0.0)) AS score
      |  FROM teb b
      |  CROSS JOIN (SELECT DISTINCT cls FROM nw) c
      |  LEFT JOIN nw n ON n.cls = c.cls AND n.word = b.word
      |  GROUP BY 1, 2
      |), pick AS (
      |  SELECT user_id, cls,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY score DESC, cls ASC) AS rn
      |  FROM sc
      |)
      |SELECT CAST($w AS BIGINT) AS w,
      |  CAST(SUM(CASE WHEN cls = user_id % $NumClasses THEN 1 ELSE 0 END) AS BIGINT) AS correct,
      |  COUNT(*) AS total
      |FROM pick WHERE rn = 1)""".stripMargin

  private def m2Sql: String =
    s"""SELECT w, correct, total,
      |  CAST(ROW_NUMBER() OVER (ORDER BY correct DESC, w DESC) AS BIGINT) AS rank
      |FROM (${M2Windows.map(m2Branch).mkString(" UNION ALL ")}) g ORDER BY w""".stripMargin

  // ---- M3: WEASEL f-sweep {4, 6, 8} -----------------------------------

  private val M3Fs = Seq(4, 6, 8)
  private val UniShift = 32L
  private val BigShift = 1L << 32
  private val ChiLimit = 2.0

  /** One sliding-words pass at maxF; per f the words are MASKED (the
    * compute-once-mask-for-all-f rewrite), bagged with bigrams, and the
    * per-(f, uni/bigram) χ² ≥ limit feature counts emitted.
    */
  private def m3(s: SparkSession, dir: String): DataFrame = {
    // an f-sweep GRID at fixture input size is plan-depth-bound — same
    // small-fit scoping as m2 (no-op at real scale)
    graft.util.Pipelines.smallFitScope(s, SfaQ.series(s, dir).count()) { m3Body(s, dir) }
  }

  private def m3Body(s: SparkSession, dir: String): DataFrame = {
    val words = SfaQ.slidingWords(s, dir) // eagerly-materialized cache
    val byWin = Window.partitionBy("user_id").orderBy("win")
    // the sweep axis `f` is a COLUMN: the bigram lag runs ONCE on the
    // unmasked words (lag-then-mask ≡ mask-then-lag since the mask is
    // deterministic per f), each word row fans out to the |F| (f, mask)
    // pairs in a map-only explode, and every aggregate/join below is
    // keyed by (f, …) — the whole sweep is ONE plan whose shuffle count
    // is independent of |F|
    val fm = array(M3Fs.map(f =>
      struct(lit(f.toLong).as("f"), lit(1L << (Bits * f)).as("mask"))): _*)
    val masked = words
      .withColumn("prevw", lag(col("word"), 16).over(byWin))
      .select(col("user_id"), col("word"), col("prevw"), explode(fm).as("x"))
      .select(col("user_id"), col("x.f").as("f"),
        (col("word") % col("x.mask")).as("wf"),
        (col("prevw") % col("x.mask")).as("prev"))
    val uni = masked.select(col("f"), col("user_id"), (col("wf") * UniShift).as("key"))
    val big = masked.filter(col("prev").isNotNull)
      .select(col("f"), col("user_id"), (col("prev") * BigShift + col("wf") * UniShift).as("key"))
    val bags = uni.unionByName(big)
      .groupBy("f", "user_id", "key").agg(count(lit(1)).as("cnt"))
    val cell = graft.util.Pipelines.tracked(s, bags
      .groupBy(col("f"), (col("user_id") % NumClasses).as("cls"), col("key"))
      .agg(sum(col("cnt")).as("obs")))
    cell.count() // materialize before the concurrently-submitted chi² subtrees
    val wt = cell.groupBy("f", "key").agg(sum(col("obs")).as("wtot"))
    val lt = cell.groupBy("f", "cls").agg(sum(col("obs")).as("ltot"))
    val nt = cell.groupBy("f").agg(sum(col("obs")).as("n"))
    val res = graft.util.Pipelines.tracked(s, wt
      .join(broadcast(lt), Seq("f"))
      .join(broadcast(nt), Seq("f"))
      .join(cell, Seq("f", "key", "cls"), "left")
      .na.fill(0L, Seq("obs"))
      .withColumn("exp", col("wtot").cast("double") * col("ltot") / col("n"))
      .groupBy("f", "key")
      .agg(sum((col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp")).as("chi2"))
      .groupBy(col("f"), when(col("key") >= BigShift, 1L).otherwise(0L).as("is_bigram"))
      .agg(count(lit(1)).as("n_features"),
        sum(when(col("chi2") >= ChiLimit, 1L).otherwise(0L)).as("n_selected"))
      .select(col("f"), col("is_bigram"), col("n_features"), col("n_selected"))
      .orderBy("f", "is_bigram"))
    res.count() // materialize inside the small-fit scope
    res
  }

  private def m3Branch(f: Int): String = {
    val mask = 1L << (Bits * f)
    "(" + SfaQ.prefixFor(16) + SfaQ.slidingCtesFor(16) + s"""
      |, uni AS (SELECT user_id, win, (word % $mask) * $UniShift AS key FROM sword
      |), big AS (
      |  SELECT user_id, win,
      |    (LAG(word, 16) OVER (PARTITION BY user_id ORDER BY win) % $mask) * $BigShift
      |      + (word % $mask) * $UniShift AS key
      |  FROM sword
      |), wbag AS (
      |  SELECT user_id, key, COUNT(*) AS cnt FROM (
      |    SELECT user_id, key FROM uni
      |    UNION ALL
      |    SELECT user_id, key FROM big WHERE key IS NOT NULL) u
      |  GROUP BY 1, 2
      |), cellsum AS (
      |  SELECT user_id % $NumClasses AS cls, key, SUM(cnt) AS obs FROM wbag GROUP BY 1, 2
      |), wt2 AS (SELECT key, SUM(obs) AS wtot FROM cellsum GROUP BY 1
      |), lt AS (SELECT cls, SUM(obs) AS ltot FROM cellsum GROUP BY 1
      |), nt AS (SELECT SUM(obs) AS n FROM cellsum
      |), chi AS (
      |  SELECT w.key,
      |    SUM((COALESCE(c.obs, 0) - CAST(w.wtot AS DOUBLE) * l.ltot / n.n)
      |      * (COALESCE(c.obs, 0) - CAST(w.wtot AS DOUBLE) * l.ltot / n.n)
      |      / (CAST(w.wtot AS DOUBLE) * l.ltot / n.n)) AS chi2
      |  FROM wt2 w CROSS JOIN lt l CROSS JOIN nt n
      |  LEFT JOIN cellsum c ON c.key = w.key AND c.cls = l.cls
      |  GROUP BY 1
      |)
      |SELECT CAST($f AS BIGINT) AS f,
      |  CAST(CASE WHEN key >= $BigShift THEN 1 ELSE 0 END AS BIGINT) AS is_bigram,
      |  COUNT(*) AS n_features,
      |  CAST(SUM(CASE WHEN chi2 >= $ChiLimit THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
      |FROM chi GROUP BY 1, 2)""".stripMargin
  }

  private def m3Sql: String =
    s"""SELECT * FROM (${M3Fs.map(m3Branch).mkString(" UNION ALL ")}) g
      |ORDER BY f, is_bigram""".stripMargin

  // ---- M4: MUSE histogram-type grid -----------------------------------

  /** EQUI_DEPTH vs EQUI_WIDTH quantization of the same sliding spectra
    * (fit on the disjoint-window orderline): vocabulary and window
    * counts per histogram type.
    */
  private def m4(s: SparkSession, dir: String): DataFrame = {
    val disjoint = SfaQ.disjointApprox(s, dir)
    val sliding = SfaQ.slidingApprox(s, dir)

    val edBins = SFAOps.equiDepthBins(disjoint, Alpha)
    val mm = disjoint
      .select(col("coef"), jround(col("v"), 2).as("v2"))
      .groupBy("coef").agg(min("v2").as("mn"), max("v2").as("mx"))
    val ewBins = mm
      .select(col("coef"), explode(expr("array(0, 1, 2)")).as("pos"),
        col("mn"), col("mx"))
      .withColumn("edge", (col("mx") - col("mn")) / Alpha * (col("pos") + 1) + col("mn"))
      .select("coef", "pos", "edge")

    // the histogram type is a COLUMN: both quantizers' edge tables are
    // unioned under a `hist` key, the sliding spectra fan out map-only
    // to both types, and one keyed packWords + one aggregate cover the
    // whole grid (same shuffle count for 2 or 20 histogram types)
    val bins = edBins.withColumn("hist", lit("EQUI_DEPTH"))
      .unionByName(ewBins.withColumn("hist", lit("EQUI_WIDTH")))
    val slidingH = sliding.select(
      explode(array(lit("EQUI_DEPTH"), lit("EQUI_WIDTH"))).as("hist"), col("*"))
    val counts = SFAOps.packWords(slidingH, bins, Bits, Seq("hist"))
      .groupBy("hist")
      .agg(countDistinct(col("word")).as("n_words"), count(lit(1)).as("n_windows"))
    // empty inputs still emit one zero row per histogram type, like the
    // oracle's per-branch global aggregates
    import s.implicits._
    val histDim = Seq("EQUI_DEPTH", "EQUI_WIDTH").toDF("hist")
    // tracked: all-builtin expressions over cached stages, so a re-run
    // canonicalizes equal and reuses the materialized grid instead of
    // re-running both quantizers (outputs are integer counts —
    // partitioning-invariant)
    val res = graft.util.Pipelines.tracked(s, histDim.join(counts, Seq("hist"), "left")
      .na.fill(0L, Seq("n_words", "n_windows"))
      .orderBy("hist"))
    res.count()
    res
  }

  private def m4Sql: String = {
    val ed = "(" + SfaQ.prefixFor(16) + SfaQ.slidingCtesFor(16) +
      "\nSELECT 'EQUI_DEPTH' AS hist, COUNT(DISTINCT word) AS n_words, COUNT(*) AS n_windows FROM sword)"
    val ssymEw =
      s""", mm AS (
        |  SELECT coef, MIN(v2) AS mn, MAX(v2) AS mx FROM ol GROUP BY 1
        |), ssym AS (
        |  SELECT d.user_id, d.win, d.coef,
        |    (SELECT COUNT(*) FROM (SELECT UNNEST(RANGE(${Alpha - 1})) AS c) cs
        |     WHERE d.v >= (mm.mx - mm.mn) / $Alpha * (cs.c + 1) + mm.mn) AS symbol
        |  FROM sdft d JOIN mm ON d.coef = mm.coef
        |)""".stripMargin
    val ew = "(" + SfaQ.prefixFor(16) + SfaQ.slidingCtesFor(16, ssymEw) +
      "\nSELECT 'EQUI_WIDTH' AS hist, COUNT(DISTINCT word) AS n_words, COUNT(*) AS n_windows FROM sword)"
    s"SELECT * FROM ($ed UNION ALL $ew) g ORDER BY hist"
  }

  // ---- M5: TEASER snapshot cascade ------------------------------------

  private val M5Snaps = Seq(24, 32, 48)

  /** Per snapshot length s: a fresh slave on the s-point series prefixes
    * (fit bins → sliding words → numerosity bags → asymmetric 1-NN bag
    * join, odd test vs even train) and its accuracy — TEASER's
    * per-snapshot quality curve.
    */
  private val M5W = 16

  private def m5(s: SparkSession, dir: String): DataFrame = {
    // the snapshot length is a COLUMN: the series assemble ONCE (the
    // shared session cache), each series fans out map-only to its
    // qualifying snapshot prefixes via slice (the first `snap` points by
    // (ts, event_id) — identical to truncating the event log), and the
    // fit → words → bags → 1-NN cascade runs as ONE plan keyed by
    // (snap, …). No per-snapshot event shuffle, no per-snapshot barrier.
    val ser = SfaQ.series(s, dir)
    val perSnap = ser
      .select(explode(array(M5Snaps.map(v => lit(v.toLong)): _*)).as("snap"),
        col("user_id"), col("data"))
      .filter(size(col("data")) >= col("snap"))
      .select(col("snap"), col("user_id"),
        slice(col("data"), lit(1), col("snap")).as("data"))
    val bins = SFAOps.equiDepthBins(
      SFAOps.disjointApprox(perSnap, M5W, L, normMean = false, Seq("snap")),
      Alpha, Seq("snap"))
    val bags = graft.util.Pipelines.tracked(s, SFAOps.bagOfWords(
      SFAOps.packWords(
        SFAOps.slidingApproxDirect(perSnap, M5W, L, normMean = false, Seq("snap")),
        bins, Bits, Seq("snap")),
      Seq("snap")))
    // materialize before the 1-NN join: its test/train/no-match subtrees
    // are scheduled concurrently and would each recompute the whole
    // 3-snapshot word pipeline against a cold cache (same hazard as m2)
    bags.count()
    val graded = SFAOps.nnBagJoin(
        bags.filter(col("user_id") % 2 === 1),
        bags.filter(col("user_id") % 2 === 0), Seq("snap"))
      .groupBy("snap")
      .agg(
        sum(when(col("nn_id") % NumClasses === col("test_id") % NumClasses, 1L)
          .otherwise(0L)).as("correct"),
        count(lit(1)).as("total"))
    // a snapshot with no decided pairs still emits its row (correct
    // NULL, total 0, acc NULL) like the oracle's per-branch aggregate
    import s.implicits._
    val snapDim = M5Snaps.map(_.toLong).toDF("snap")
    // tracked: the whole cascade re-ran its 1-NN join per re-run
    // otherwise (acc derives from integer counts — partitioning-safe)
    val res = graft.util.Pipelines.tracked(s, snapDim.join(graded, Seq("snap"), "left")
      .withColumn("total", coalesce(col("total"), lit(0L)))
      .withColumn("acc", jround(col("correct").cast("double") / col("total"), 6))
      .orderBy("snap"))
    res.count()
    res
  }

  private def m5Branch(snap: Int): String = {
    val src =
      s"""(SELECT user_id, ts, event_id, value FROM (
        |      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn0,
        |        COUNT(*) OVER (PARTITION BY user_id) AS n0
        |      FROM events) t0 WHERE n0 >= $snap AND rn0 <= $snap)""".stripMargin
    "(" + SfaQ.prefixFor(16, src) + SfaQ.slidingCtesFor(16) + s"""
      |, tb AS (SELECT * FROM bags WHERE user_id % 2 = 1
      |), nb AS (SELECT * FROM bags WHERE user_id % 2 = 0
      |), nm AS (SELECT user_id AS test_id, SUM(cnt*cnt) AS no_match FROM tb GROUP BY 1
      |), pr AS (
      |  SELECT t.user_id AS test_id, n.user_id AS train_id,
      |    SUM((t.cnt - n.cnt)*(t.cnt - n.cnt) - t.cnt*t.cnt) AS delta
      |  FROM tb t JOIN nb n ON t.word = n.word
      |  GROUP BY 1, 2
      |), pd AS (
      |  SELECT p.test_id, p.train_id, p.delta + m.no_match AS dist
      |  FROM pr p JOIN nm m ON p.test_id = m.test_id
      |  WHERE p.delta + m.no_match <> m.no_match AND p.delta + m.no_match > 0
      |), nn AS (
      |  SELECT test_id, train_id AS nn_id,
      |    ROW_NUMBER() OVER (PARTITION BY test_id ORDER BY dist, train_id) AS rn
      |  FROM pd
      |)
      |SELECT CAST($snap AS BIGINT) AS snap,
      |  CAST(SUM(CASE WHEN nn_id % $NumClasses = test_id % $NumClasses THEN 1 ELSE 0 END) AS BIGINT) AS correct,
      |  COUNT(*) AS total
      |FROM nn WHERE rn = 1)""".stripMargin
  }

  private def m5Sql: String =
    s"""SELECT snap, correct, total,
      |  FLOOR(CAST(correct AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS acc
      |FROM (${M5Snaps.map(m5Branch).mkString(" UNION ALL ")}) g ORDER BY snap""".stripMargin

  // ---- MTEASER: multivariate early-classification cascade -------------

  /** The real MTEASER (MUSE slave + one-class SVM masters +
    * distributed streak fold, MTEASERClassifier.java) on the bundled
    * PenDigits MTS fixture with a reduced slave grid; output = the
    * decision histogram of the early classifier (offset at which each
    * test sample was decided, with per-offset accuracy). Rows-only by
    * design (an iterative classifier fit is not SQL-expressible);
    * semantics gated by MteaserSpec.
    */
  private def mteaser(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val base = "/root/reference/src/main/resources/datasets/multivariate"
    // fixture-scale fit: run the whole build (fits AND the eager
    // cachedDF materialization) in the small-fit scope — see
    // Pipelines.smallFitScope
    val res = graft.util.Pipelines.smallFitScope(s, n = 60) {
     graft.util.Pipelines.cachedDF(s, "mteaser.pendigits") {
      val train0 = graft.ts.Loaders.loadMultivariate(s, s"$base/PenDigits/PenDigits_TRAIN3",
        applyZNorm = false)
      val test0 = graft.ts.Loaders.loadMultivariate(s, s"$base/PenDigits/PenDigits_TEST3",
        applyZNorm = false)
      // raw 2-dim channels (no derivatives), 2 snapshots: the cascade
      // mechanics under test, the full driver config is MteaserSpec's.
      // Each MUSE slave fit costs ~5 s of PLAN DEPTH regardless of row
      // count (quantizer grid → bags → χ² → dict → LR), so the fixture
      // trims rows AND snapshots, and the bench cost is slave-fit
      // depth, not data
      // cache the filtered fixtures: the cascade fit/predict run ~15
      // actions, and uncached each one re-parses the 4 MB CSV and
      // re-runs the long-format groupBy
      val train = graft.util.Pipelines.tracked(s, train0.filter(col("id") <= 60))
      val test = graft.util.Pipelines.tracked(s, test0.filter(col("id") <= 60))
      train.count(); test.count()
      val clf = new graft.sfa.MteaserClassifier(
        graft.sfa.Mteaser.Config(s = 3),
        graft.sfa.Muse.Config(minF = 2, maxF = 2, folds = 2, bigrams = false,
          histTypes = Seq(graft.sfa.HistogramType.EquiDepth),
          normalization = Seq(false), lrMaxIter = 20))
      val model = clf.fit(train)
      clf.predictDF(model, test)
     }
    }
    res.groupBy(col("off").cast("long").as("off"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("correct"))
      .orderBy("off")
  }

  val defs: Map[String, QueryDef] = Map(
    "m2_window_grid" -> QueryDef.sql(m2, m2Sql,
      "BOSS VS window grid + O3 ranked model sort"),
    "m3_weasel_grid" -> QueryDef.sql(m3, m3Sql,
      "WEASEL f-sweep via the word-mask trick, per-f chi2 feature counts"),
    "m4_muse_grid" -> QueryDef.sql(m4, m4Sql,
      "MUSE histogram-type grid: EQUI_DEPTH vs EQUI_WIDTH vocabularies"),
    "m5_teaser_cascade" -> QueryDef.sql(m5, m5Sql,
      "TEASER snapshot cascade: per-snapshot slave accuracy curve"),
    "mteaser_cascade" -> QueryDef.rowsOnly(mteaser,
      "MTEASER (MUSE slave) early-decision histogram on PenDigits; gated by MteaserSpec"))
}
