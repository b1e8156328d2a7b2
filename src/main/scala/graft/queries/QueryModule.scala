package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Contract (see /root/repo/src/main/scala/graft/SparkEntry.scala): every
  * query has a deterministic result — explicit ORDER BY on a unique key in
  * BOTH the Spark plan and the DuckDB oracle, aggregate doubles rounded the
  * same on both sides — so the driver's column-sorted value hash matches.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** Materialize any shared per-corpus artifacts (posting index,
    * quantized vectors, ordinal index — see [[graft.Caches]]) this
    * module's queries read. Bench calls this before the timed loop so
    * the one-off build cost is measured separately ("prep") instead of
    * landing in whichever query happens to run first.
    */
  def prewarm(s: SparkSession, dir: String): Unit = {}

  /** DuckDB-runnable ANSI SQL per query key; omit a key for ops whose
    * semantics aren't SQL-expressible (driver falls back to rows>0).
    */
  def oracleSql: Map[String, String]
}
