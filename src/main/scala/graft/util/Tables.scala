package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-provided testdata directories
  * (TESTDATA.md). At cluster scale these would be catalog tables; the
  * `dir`-parameterised form keeps the library storage-agnostic.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** A named query plus (optionally) the ANSI-SQL oracle the driver runs in
  * DuckDB over the same parquet tables. Column names and types must match
  * the Spark result exactly (driver sorts columns by name, then hashes).
  *
  * Determinism rules used throughout (see SURVEY §7.4 #1):
  *  - monetary/measure doubles are scaled to integer "cents" before
  *    summing, so aggregate sums are order-independent and bit-exact
  *    across engines;
  *  - derived doubles are produced by identical scalar expressions on
  *    those exact integers (IEEE ops are deterministic; only sum ORDER
  *    varies between engines);
  *  - every result has a total ORDER BY over a unique key.
  */
final case class QueryDef(
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  def sql(impl: (SparkSession, String) => DataFrame, oracleSql: String, doc: String = ""): QueryDef =
    QueryDef(impl, Some(oracleSql), doc)
  def rowsOnly(impl: (SparkSession, String) => DataFrame, doc: String = ""): QueryDef =
    QueryDef(impl, None, doc)
}
