package graft.sfa

import scala.collection.mutable.ArrayBuffer

/** Dimensionality-reduction representations with lower-bounding
  * distances (SURVEY §2.3 T4–T7), semantics from
  * /root/reference/src/main/java/sfa/transformation/{PAA,PLA,DWT,APCA}.java
  * and library/wavelets/lift/ (Haar lifting scheme). Pure array kernels —
  * used inside per-row UDFs; parallelism comes from Spark rows.
  */
object Representations {

  private def nextPowerOfTwo(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  // ---- PAA (T4) -------------------------------------------------------

  /** l segment means; frames by floor/ceil boundaries (PAA.java:28-50). */
  def paa(data: Array[Double], l: Int): Array[Double] = {
    val n = data.length
    val frame = n.toDouble / l
    Array.tabulate(l) { i =>
      val s = math.floor(frame * i).toInt
      val e = math.min(n, math.ceil(frame * (i + 1))).toInt
      var sum = 0.0
      var cnt = 0
      var j = s
      while (j < e) { sum += data(j); cnt += 1; j += 1 }
      if (cnt > 0) sum / cnt else 0.0
    }
  }

  /** PAA reconstruction: step function (PAA.java:52-67). */
  def paaInverse(means: Array[Double], n: Int): Array[Double] = {
    val l = means.length
    val frame = n.toDouble / l
    val out = new Array[Double](n)
    for (i <- 0 until l; j <- math.ceil(frame * i).toInt until math.ceil(frame * (i + 1)).toInt)
      out(j) = means(i)
    out
  }

  /** Σ Δ²·(n/l) lower bound (PAA.java:69-85). */
  def paaDistance(a: Array[Double], b: Array[Double], n: Int, minValue: Double): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) {
      val v = a(i) - b(i)
      d += v * v
      if (d > minValue) return Double.PositiveInfinity
      i += 1
    }
    d * (n / a.length)
  }

  // ---- PLA (T5) -------------------------------------------------------

  /** l/2 least-squares line segments, stored as (12a, 6b) pairs
    * (PLA.java:35-69).
    */
  def pla(data: Array[Double], l: Int): Array[Double] = {
    val n = data.length
    val values = new Array[Double](l)
    val frame = n.toDouble / (l / 2)
    var i = 0
    while (i < l / 2.0) {
      var a = 0.0
      var b = 0.0
      val constA = (frame + 1) / 2.0
      val constB = (2 * frame + 1) / 3.0
      var t = 1
      var j = math.ceil(frame * i).toInt
      val e = math.min(n, math.ceil(frame * (i + 1))).toInt
      while (j < e) {
        a += (t - constA) * data(j)
        b += (t - constB) * data(j)
        t += 1
        j += 1
      }
      a /= frame * (frame + 1) * (frame - 1)
      b /= frame * (1 - frame)
      values(i * 2) = 12 * a
      values(i * 2 + 1) = 6 * b
      i += 1
    }
    values
  }

  /** Lower-bounding distance with the segment cross terms
    * (PLA.java:94-125).
    */
  def plaDistance(a: Array[Double], b: Array[Double], n: Int, minValue: Double): Double = {
    val l = a.length
    val segments = l / 2.0
    val frame = (n / segments).toInt.toDouble
    val constB = frame * (frame + 1)
    val constA = constB * (2 * frame + 1) / 6.0
    var d = 0.0
    var i = 0
    while (i < l) {
      val dai = a(i) - b(i)
      val dbi = a(i + 1) - b(i + 1)
      d += constA * dai * dai + constB * dai * dbi + frame * dbi * dbi
      if (d > minValue) return Double.PositiveInfinity
      i += 2
    }
    d
  }

  // ---- DWT (T7, Haar lifting scheme) ----------------------------------

  private def haarSplit(vec: Array[Double], n: Int): Unit = {
    var start = 1
    var end = n - 1
    while (start < end) {
      var i = start
      while (i < end) {
        val tmp = vec(i); vec(i) = vec(i + 1); vec(i + 1) = tmp
        i += 2
      }
      start += 1
      end -= 1
    }
  }

  private def haarMerge(vec: Array[Double], n: Int): Unit = {
    val half = n >> 1
    var start = half - 1
    var end = half
    while (start > 0) {
      var i = start
      while (i < end) {
        val tmp = vec(i); vec(i) = vec(i + 1); vec(i + 1) = tmp
        i += 2
      }
      start -= 1
      end += 1
    }
  }

  /** In-place forward Haar lifting transform (Liftbase.java:199-207,
    * Haar.java predict/update).
    */
  def haarForward(vec: Array[Double]): Unit = {
    var n = vec.length
    while (n > 1) {
      haarSplit(vec, n)
      val half = n >> 1
      var i = 0
      while (i < half) { vec(i + half) -= vec(i); i += 1 } // predict
      i = 0
      while (i < half) { vec(i) += vec(i + half) / 2.0; i += 1 } // update
      n >>= 1
    }
  }

  /** In-place inverse Haar lifting transform (Liftbase.java:222-230). */
  def haarInverse(vec: Array[Double]): Unit = {
    var n = 2
    while (n <= vec.length) {
      val half = n >> 1
      var i = 0
      while (i < half) { vec(i) -= vec(i + half) / 2.0; i += 1 } // update⁻¹
      i = 0
      while (i < half) { vec(i + half) += vec(i); i += 1 } // predict⁻¹
      haarMerge(vec, n)
      n <<= 1
    }
  }

  /** First l Haar coefficients × −0.5 (DWT.java:23-48). */
  def dwt(data: Array[Double], l: Int): Array[Double] = {
    val vec = java.util.Arrays.copyOf(data, nextPowerOfTwo(data.length))
    haarForward(vec)
    Array.tabulate(l)(i => if (i < vec.length) -0.5 * vec(i) else 0.0)
  }

  /** Level-wise ×2 distance with early exit (DWT.java:70-107). */
  def dwtDistance(a: Array[Double], b: Array[Double], n: Int, minValue: Double): Double = {
    val l = a.length
    val diff = Array.tabulate(l) { i => val v = a(i) - b(i); v * v }
    val log2n = (math.log(nextPowerOfTwo(n)) / math.log(2)).toInt
    var si = diff(0)
    var i = 1
    while (i <= log2n) {
      var result = si
      var j = 1 << (i - 1)
      val hi = 1 << i
      while (j < hi && j < l) {
        result += diff(j)
        if (result + result > minValue) return Double.PositiveInfinity
        j += 1
      }
      si = 2 * result
      i += 1
    }
    si
  }

  // ---- APCA (T6) ------------------------------------------------------

  /** Adaptive piecewise-constant approximation: keep the n largest
    * normalized Haar coefficients, reconstruct, merge equal-value runs,
    * then greedily join intervals minimizing the reconstruction-error
    * increase until n/2 segments remain; output interleaved
    * (mean, endIdx) pairs (APCA.java:30-149).
    */
  def apca(data: Array[Double], n: Int): Array[Double] = {
    val t1Size = data.length
    val m = n / 2
    require(n <= t1Size, "too many coefficients selected")

    // wavelet transform, keep n largest normalized coefficients (skip DC)
    val pow2 = nextPowerOfTwo(t1Size)
    val wav = java.util.Arrays.copyOf(data, pow2)
    haarForward(wav)
    val ranked = (1 until pow2).map { i =>
      val divisor = if (i > 1) (math.log(i) / math.log(2)).toInt else 0
      val norm = math.pow(2, divisor / 2.0)
      (-math.abs(wav(i) / norm), i)
    }.sorted.take(n)
    val kept = new Array[Double](pow2)
    ranked.foreach { case (_, pos) => kept(pos) = wav(pos) }
    haarInverse(kept)
    val truncated = kept

    // join equal-value runs
    val keys = ArrayBuffer.empty[Int]
    val values = ArrayBuffer.empty[Double]
    var oldValue = truncated(1)
    var i = 1
    while (i < truncated.length) {
      val cur = truncated(i)
      if (oldValue != cur) {
        keys += i
        values += oldValue
        oldValue = cur
      }
      i += 1
    }
    keys += truncated.length
    values += truncated(truncated.length - 1)

    // replace segment values by true means over the original data
    var start = 0
    var p = 0
    while (p < keys.length) {
      val end = math.min(keys(p), t1Size)
      var mean = 0.0
      var j = start
      while (j < end) { mean += data(j); j += 1 }
      values(p) = if (end > start) mean / (end - start) else 0.0
      start = end
      p += 1
    }

    def segError(pos: Int): Double = {
      val s = if (pos > 0) math.min(keys(pos - 1), t1Size) else 0
      val e = math.min(keys(pos), t1Size)
      val mean = values(pos)
      var err = 0.0
      var j = s
      while (j < e) { val v = mean - data(j); err += v * v; j += 1 }
      err
    }
    def jointError(pos: Int): Double = {
      val s = if (pos > 0) math.min(keys(pos - 1), t1Size) else 0
      val mid = math.min(keys(pos), t1Size)
      val e = math.min(keys(pos + 1), t1Size)
      val mean =
        if (e > s) ((mid - s) * values(pos) + (e - mid) * values(pos + 1)) / (e - s)
        else 0.0
      var err = 0.0
      var j = s
      while (j < e) { val v = mean - data(j); err += v * v; j += 1 }
      err
    }

    // greedy merge to m segments
    while (keys.length > m) {
      var minDelta = Double.PositiveInfinity
      var minPos = 0
      var errRight = segError(0)
      var pos = 0
      while (pos < keys.length - 1) {
        val errLeft = errRight
        errRight = segError(pos + 1)
        val both = jointError(pos)
        val delta = both - (errLeft + errRight)
        if (delta < minDelta) { minDelta = delta; minPos = pos }
        pos += 1
      }
      val startFirst = if (minPos > 0) keys(minPos - 1) else 0
      val endFirst = keys(minPos)
      val endSecond = keys(minPos + 1)
      val mean = ((endFirst - startFirst) * values(minPos) +
        (endSecond - endFirst) * values(minPos + 1)) / (endSecond - startFirst).toDouble
      values(minPos + 1) = mean
      keys.remove(minPos)
      values.remove(minPos)
    }

    // interleave (value, endIdx)
    val out = new Array[Double](n)
    var k = 1
    keys.foreach { key => out(k) = key.toDouble; k += 2 }
    k = 0
    values.foreach { v => out(k) = v; k += 2 }
    if (keys.length < m) {
      var j = 2 * keys.length
      while (j < n) {
        out(j + 1) = truncated.length.toDouble
        out(j) = truncated(truncated.length - 1)
        j += 2
      }
    }
    out
  }

  /** APCA-to-raw-series lower bound (APCA.java:243-273, the form the
    * reference's TightnessOfLowerBounds study exercises): walk the
    * representation's segments, compare each segment mean against the
    * QUERY's true mean over the same interval, weight by segment
    * length. Σ len·(m₁−m₂)² ≤ Σ (a−b)² per segment by Cauchy–Schwarz,
    * so this lower-bounds the squared Euclidean distance. Query indices
    * beyond its length read the zero padding APCA itself used
    * (copyOf-to-power-of-two, [[apca]]).
    */
  def apcaDistanceToSeries(a: Array[Double], query: Array[Double], minValue: Double): Double = {
    var distance = 0.0
    var start = 0
    var q = 1
    while (q < a.length) {
      val end = a(q).toInt
      if (end > start) {
        var mean = 0.0
        var i = start
        while (i < end) { mean += (if (i < query.length) query(i) else 0.0); i += 1 }
        mean /= end - start
        val v = a(q - 1) - mean
        distance += v * v * (end - start)
        if (distance > minValue) return Double.PositiveInfinity
      }
      start = end
      q += 2
    }
    distance
  }

  /** Interval-walk lower bound between two APCA representations
    * (APCA.java:201-241).
    */
  def apcaDistance(a: Array[Double], b: Array[Double], n: Int, minValue: Double): Double = {
    var distance = 0.0
    var offset1 = 1
    var offset2 = 1
    var start = 0
    var end1 = 0
    var end2 = 0
    while (end1 < n || end2 < n) {
      end1 = a(offset1).toInt
      end2 = b(offset2).toInt
      val end = math.min(end1, end2)
      var j = start
      while (j < end) {
        val v = a(offset1 - 1) - b(offset2 - 1)
        distance += v * v
        j += 1
      }
      start = end
      if (start >= end1) offset1 += 2
      if (start >= end2) offset2 += 2
      if (distance > minValue) return Double.PositiveInfinity
    }
    distance
  }
}
