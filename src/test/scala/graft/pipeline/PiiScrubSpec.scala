package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Semantics gates for the PII scrubber beyond what the synthetic
  * augmentation in `text_pii_scrub` exercises: adversarial plants
  * (boundary cases, multiple matches, non-matches) and idempotence.
  */
class PiiScrubSpec extends SparkSpec {

  private def scrub(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    TextOps.piiScrub(rows.toDF("doc_id", "text"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"), col("clean"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
  }

  test("plants: emails, phones, ips masked with correct counts") {
    val out = scrub(Seq(
      1L -> "mail a.b+tag@sub.domain.co now",
      2L -> "call 555-1234 or 555-999 soon",
      3L -> "host 192.168.0.1 up",
      4L -> "two u@e.co and v.w@f.org plus 555-0000",
      5L -> "clean text with no contact at all",
      6L -> "punctuated user@ex.co, done"))
    assert(out(1L) == ((1L, 0L, 0L, "mail <EMAIL> now")))
    // 555-999 is a digit short of the phone shape
    assert(out(2L) == ((0L, 1L, 0L, "call <PHONE> or 555-999 soon")))
    assert(out(3L) == ((0L, 0L, 1L, "host <IP> up")))
    assert(out(4L) == ((2L, 1L, 0L, "two <EMAIL> and <EMAIL> plus <PHONE>")))
    assert(out(5L) == ((0L, 0L, 0L, "clean text with no contact at all")))
    assert(out(6L) == ((1L, 0L, 0L, "punctuated <EMAIL>, done")))
  }

  test("dialect-agreement plants: backtracking and word boundaries") {
    val out = scrub(Seq(
      // greedy domain backtracks to the last dot-letters suffix (Java
      // regex and RE2 agree); the raw text has no \b before the glued
      // digits, but the `>` of the inserted <EMAIL> mask creates one —
      // stepwise counting reports the phone that therefore IS masked
      1L -> "glued u1@e.co555-1234 tail",
      // \d{1,3} is a SHAPE check, not a value check: 300 still matches
      2L -> "odd 10.0.300.5 addr"))
    assert(out(1L) == ((1L, 1L, 0L, "glued <EMAIL><PHONE> tail")))
    assert(out(2L) == ((0L, 0L, 1L, "odd <IP> addr")))
  }

  test("scrub is map-only: the physical plan introduces no exchange") {
    import spark.implicits._
    val plan = TextOps.piiScrub(Seq((1L, "t")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a shuffle-free plan:\n$plan")
  }

  test("scrubbing is idempotent and masks carry no residual PII shape") {
    val once = scrub(Seq(1L -> "u@e.co then 555-1234 at 10.0.0.1"))(1L)
    assert(once == ((1L, 1L, 1L, "<EMAIL> then <PHONE> at <IP>")))
    val twice = scrub(Seq(1L -> once._4))(1L)
    assert(twice == ((0L, 0L, 0L, once._4)))
  }
}
