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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union" -> (qUnion(_, _)),
    "q_intersect" -> (qIntersect(_, _)),
    "q_except" -> (qExcept(_, _)),
    "q_pivot" -> (qPivot(_, _)))

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
    })
}
