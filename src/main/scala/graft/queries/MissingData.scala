package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §1.3 + §2.3 — missing-data operations on real SQL NULLs.
  *
  * The reference encodes missing as sentinels (−999 / b'None' / false,
  * `/root/reference/baloo/weld/convertors/encoders.py:181-190`) because
  * Weld has no nullability; `isna` is `== sentinel`
  * (`baloo/core/generic.py:69-73`), `fillna` a sentinel→value map
  * (`weld_ops.py:658-697`), `dropna` an AND-reduce of notna
  * (`frame.py:1026-1044`). Per SURVEY §1.3 we use NULL semantics —
  * `isNull` / `na.fill` / `na.drop` — which is both what Spark
  * vectorizes natively (null bitmaps in the parquet scan) and what any
  * SQL oracle expects.
  *
  * The testdata has no NULLs, so each query first derives nullable
  * columns with `nullif` — the inverse of the reference's sentinel
  * convention.
  */
object MissingData extends QueryModule {

  private def withNulls(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        expr("nullif(l_discount, 0.0)").as("disc"),
        expr("nullif(l_tax, 0.0)").as("tax"))

  /** isna/notna → bool columns (`generic.py:69-73`). */
  def qIsna(s: SparkSession, dir: String): DataFrame =
    withNulls(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("disc").isNull.as("disc_isna"),
        col("disc").isNotNull.as("disc_notna"),
        col("tax").isNull.as("tax_isna"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "disc_isna", "tax_isna")

  /** fillna with a per-column value map (`frame.py:1046-1072`). */
  def qFillna(s: SparkSession, dir: String): DataFrame =
    withNulls(s, dir)
      .na.fill(Map("disc" -> -1.0, "tax" -> -2.0))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "disc", "tax")

  /** dropna on a subset: keep rows where EVERY subset column is present
    * (`frame.py:1026-1044`).
    */
  def qDropna(s: SparkSession, dir: String): DataFrame =
    withNulls(s, dir)
      .na.drop(Seq("disc", "tax"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "disc", "tax")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_isna" -> (qIsna(_, _)),
    "q_fillna" -> (qFillna(_, _)),
    "q_dropna" -> (qDropna(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_isna" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  nullif(l_discount, 0.0) IS NULL AS disc_isna,
        |  nullif(l_discount, 0.0) IS NOT NULL AS disc_notna,
        |  nullif(l_tax, 0.0) IS NULL AS tax_isna
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, disc_isna, tax_isna""".stripMargin,
    "q_fillna" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc,
        |  coalesce(nullif(l_tax, 0.0), -2.0) AS tax
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, disc, tax""".stripMargin,
    "q_dropna" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  nullif(l_discount, 0.0) AS disc,
        |  nullif(l_tax, 0.0) AS tax
        |FROM lineitem
        |WHERE nullif(l_discount, 0.0) IS NOT NULL
        |  AND nullif(l_tax, 0.0) IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity, disc, tax""".stripMargin)
}
