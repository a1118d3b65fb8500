package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-case gate for overlapping chunking: boundary sizes, the
  * no-redundant-tail rule, overlap identity, and empty docs.
  */
class TextChunkSpec extends SparkSpec {

  private def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunk boundaries, overlap, and fingerprints") {
    import spark.implicits._
    def words(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val d = Seq(
      (1L, words("a", 65)), // 2 chunks: [0,64) and [48,65)
      (2L, words("b", 64)), // exactly one full chunk
      (3L, words("c", 10)), // one short chunk
      (4L, "")) // no tokens -> no chunks
      .toDF("doc_id", "text")
    val got = TextOps.chunksOf(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 0L), (1L, 1L), (2L, 0L), (3L, 0L)))
    val m = got.map(t => (t._1, t._2) -> t).toMap
    assert(m((1L, 0L))._4 == 64L && m((1L, 0L))._3 == 0L)
    assert(m((1L, 1L))._4 == 17L && m((1L, 1L))._3 == 48L)
    assert(m((2L, 0L))._4 == 64L)
    assert(m((3L, 0L))._4 == 10L)
    // fingerprints are of the exact token slices (overlap included)
    val a = (0 until 65).map(i => s"a$i")
    assert(m((1L, 0L))._5 == fp(a.slice(0, 64).mkString(" ")))
    assert(m((1L, 1L))._5 == fp(a.slice(48, 65).mkString(" ")))
    assert(m((3L, 0L))._5 == fp((0 until 10).map(i => s"c$i").mkString(" ")))
  }
}
