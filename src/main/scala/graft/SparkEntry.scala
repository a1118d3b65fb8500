package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.util.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered by the operator modules; each carries its own
  * DuckDB oracle SQL (or is flagged rows-only for non-SQL-expressible
  * operators such as Fourier transforms).
  */
object SparkEntry {

  private lazy val registry: Map[String, QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.TimeSeriesQ.defs ++
      graft.queries.Stats.defs ++
      graft.pipeline.Dedup.defs ++
      graft.pipeline.TextOps.defs ++
      graft.pipeline.Similarity.defs ++
      graft.pipeline.Cluster.defs ++
      graft.pipeline.Sketches.defs ++
      graft.pipeline.GraphOps.defs ++
      graft.pipeline.Mix.defs ++
      graft.pipeline.Multimodal.defs ++
      graft.pipeline.Curation.defs ++
      graft.pipeline.Layout.defs ++
      graft.pipeline.Export.defs ++
      graft.pipeline.Bpe.defs ++
      graft.queries.EventJoins.defs ++
      graft.queries.Profile.defs ++
      graft.queries.SfaQ.defs ++
      graft.queries.IndexQ.defs ++
      graft.queries.RepresentationQ.defs ++
      graft.queries.WeaselQ.defs ++
      graft.queries.ClassifierQ.defs ++
      graft.queries.SourceQ.defs ++
      graft.queries.MuseQ.defs ++
      graft.queries.GridQ.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q1_agg").impl(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.impl }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
