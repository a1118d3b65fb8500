package graft.sfa

/** SFA word bit-packing: one symbol per Fourier value, `usedBits =
  * log2(alphabet)` bits per symbol, symbol i occupying bits
  * `[i·usedBits, (i+1)·usedBits)` (LSB-first), at most `60/usedBits`
  * symbols per long. Matches the reference packing
  * (/root/reference/src/main/java/sfa/classification/Classifier.java:163-192),
  * which makes the word-length mask trick (`word & ((1<<bits·f)-1)`) reuse
  * long words for every shorter f without re-transforming.
  */
object Words {

  /** Integer log2 for power-of-two alphabet sizes. */
  def binlog(bits: Int): Int = 31 - Integer.numberOfLeadingZeros(bits)

  /** Pack the first `features` symbols into one long. */
  def createWord(symbols: Array[Int], features: Int, usedBits: Int): Long = {
    val to = math.min(math.min(symbols.length, features), 60 / usedBits)
    var bits = 0L
    var i = 0
    while (i < to) {
      bits |= (symbols(i).toLong & ((1L << usedBits) - 1)) << (i * usedBits)
      i += 1
    }
    bits
  }

  /** Mask keeping the first `features` symbols of a packed word. */
  def mask(features: Int, usedBits: Int): Long = (1L << (usedBits * features)) - 1L
}
