package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
  * registered here as a named query over the TESTDATA parquet tables, with
  * a DuckDB oracle where the semantics are SQL-expressible.
  */
object SparkEntry {
  /** All query modules; each covers one SURVEY.md §2 area. */
  def modules: Seq[QueryModule] =
    Seq(Relational, Aggregations, GroupBys, Joins, Positional,
      Strings, MissingData, Dedup, TextAnalysis, Similarity, Fingerprints,
      UnaryMath, Windows, MultimodalQ, SetOps, IoQ, Sampling, Pipelines,
      CorpusQuality, CorpusStats, Spectral, Lakehouse, TpchDeep, PandasExt,
      StreamingQ)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
