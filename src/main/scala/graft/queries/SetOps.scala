package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 — set operations + pivot (the reference has NONE of
  * these; closest are unique/drop_duplicates). All are native Catalyst
  * operators: UNION/INTERSECT/EXCEPT plan as aggregates/joins over one
  * shuffle; pivot is a single-pass hash aggregate over a known column
  * domain (never a per-value query loop).
  */
object SetOps extends QueryModule {

  private def highQty(s: SparkSession, dir: String) =
    Tables.lineitem(s, dir).filter(col("l_quantity") >= 50.0).select("l_partkey")
  private def bigPrice(s: SparkSession, dir: String) =
    Tables.lineitem(s, dir).filter(col("l_extendedprice") >= 95000.0).select("l_partkey")

  /** UNION (distinct) of two part sets. */
  def qUnion(s: SparkSession, dir: String): DataFrame =
    highQty(s, dir).union(bigPrice(s, dir)).distinct().orderBy("l_partkey")

  /** INTERSECT — parts in both sets. */
  def qIntersect(s: SparkSession, dir: String): DataFrame =
    highQty(s, dir).intersect(bigPrice(s, dir)).orderBy("l_partkey")

  /** EXCEPT — parts with max-qty lines but no top-price lines. */
  def qExcept(s: SparkSession, dir: String): DataFrame =
    highQty(s, dir).except(bigPrice(s, dir)).orderBy("l_partkey")

  /** Pivot: events value sums per user_mod bucket × event_type column —
    * one pass, fixed column domain.
    */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select((col("user_id") % 10).as("user_mod"), col("event_type"), col("value"))
      .groupBy("user_mod")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(Q.dsum(col("value")))
      .orderBy("user_mod")

  /** Unpivot/melt — pivot's inverse (pandas `melt`): three measure
    * columns become (measure, value) rows. Plans as ONE Expand over a
    * single scan — map-only, 3× the rows out — where the naive
    * UNION-ALL spelling scans the table once per measure. The output
    * order carries `value` as the tie-break because (orderkey,
    * linenumber) is non-unique in this corpus (planted duplicates).
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure", "value")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union" -> (qUnion(_, _)),
    "q_intersect" -> (qIntersect(_, _)),
    "q_except" -> (qExcept(_, _)),
    "q_pivot" -> (qPivot(_, _)),
    "q_unpivot" -> (qUnpivot(_, _)))

  private val hq = "SELECT l_partkey FROM lineitem WHERE l_quantity >= 50.0"
  private val bp = "SELECT l_partkey FROM lineitem WHERE l_extendedprice >= 95000.0"

  val oracleSql: Map[String, String] = Map(
    "q_union" -> s"$hq UNION $bp ORDER BY l_partkey",
    "q_intersect" -> s"$hq INTERSECT $bp ORDER BY l_partkey",
    "q_except" -> s"$hq EXCEPT $bp ORDER BY l_partkey",
    "q_pivot" -> {
      val cols = Seq("click", "error", "purchase", "signup", "view").map(t =>
        s"${Q.sqlDsum(s"CASE WHEN event_type = '$t' THEN value END")} AS $t")
        .mkString(",\n  ")
      s"""SELECT user_id % 10 AS user_mod,
         |  $cols
         |FROM events GROUP BY user_id % 10 ORDER BY user_mod""".stripMargin
    },
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber,
        |    'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber,
        |    'l_discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin)
}
