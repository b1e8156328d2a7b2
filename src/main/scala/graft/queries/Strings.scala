package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — the 11 `Series.str` operations.
  *
  * Reference: `/root/reference/baloo/core/strings.py` (API) +
  * `baloo/weld/weld_str.py` (hand-rolled ASCII loop kernels). Every op
  * maps to codegen'd `org.apache.spark.sql.functions` expressions — no
  * UDFs — so they inline into whole-stage codegen and cost one pass over
  * the string column at any scale. Reference quirks preserved:
  *  - `capitalize` is first-char-upper + rest-lower (NOT per-word
  *    `initcap`) — `strings.py:32-40`;
  *  - `get(i)` supports negative i and yields missing (NULL here) when
  *    out of range — `strings.py:42-56`;
  *  - `replace` replaces the FIRST occurrence only (`strings.py:171`),
  *    unlike Spark's replace-all `regexp_replace` — built from
  *    locate+concat;
  *  - `split(pat)` splits ONCE and returns the left or right part
  *    (`strings.py:191-219`), which is `substring_index`-style logic on
  *    the first occurrence, not split-all.
  */
object Strings extends QueryModule {

  /** lower/upper/capitalize/strip/get over documents.source (+ a padded
    * variant so `strip` actually strips something).
    */
  def qStrBasic(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"), col("source"),
        lower(col("source")).as("lo"),
        upper(col("source")).as("up"),
        concat(upper(substring(col("source"), 1, 1)),
          lower(expr("substring(source, 2)"))).as("cap"),
        trim(concat(lit("  "), col("source"), lit(" "))).as("stripped"),
        // get(2): 0-based 3rd char; '' → NULL when out of range
        nullif(substring(col("source"), 3, 1), lit("")).as("get2"),
        // get(-1): last char via negative-position substring
        nullif(expr("substring(source, -1, 1)"), lit("")).as("get_m1"))
      .orderBy("doc_id")

  /** contains/startswith/endswith/find/slice over documents.text. */
  def qStrSearch(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        col("text").contains("merge").as("has_merge"),
        col("text").startsWith("the").as("starts_the"),
        col("text").endsWith("scan").as("ends_scan"),
        // find: first 0-based index of 'join', -1 when absent
        (locate("join", col("text")) - 1).as("find_join"),
        // find confined to [5, 60): match must fit inside the window
        // (reference strings.py:143-169 clamps both bounds)
        when(locate("join", substring(col("text"), 6, 55)) > 0,
          locate("join", substring(col("text"), 6, 55)) + 4)
          .otherwise(lit(-1)).cast("int").as("find_join_5_60"),
        // slice [10:25)
        substring(col("text"), 11, 15).as("slice_10_25"))
      .orderBy("doc_id")

  /** First-occurrence-only replace + split-once left/right. */
  def qStrReplaceSplit(s: SparkSession, dir: String): DataFrame = {
    val pos = locate("join", col("text"))
    val spacePos = locate(" ", col("text"))
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        // replace first 'join' → 'JOIN' (later occurrences untouched)
        when(pos > 0,
          concat(expr("substring(text, 1, locate('join', text) - 1)"),
            lit("JOIN"),
            expr("substring(text, locate('join', text) + 4)")))
          .otherwise(col("text")).as("repl_first"),
        // split once on first space: left and right parts
        when(spacePos > 0, expr("substring(text, 1, locate(' ', text) - 1)"))
          .otherwise(col("text")).as("split_left"),
        when(spacePos > 0, expr("substring(text, locate(' ', text) + 1)"))
          .otherwise(lit(null)).as("split_right"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_basic" -> (qStrBasic(_, _)),
    "q_str_search" -> (qStrSearch(_, _)),
    "q_str_replace_split" -> (qStrReplaceSplit(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_str_basic" ->
      """SELECT doc_id, source,
        |  lower(source) AS lo,
        |  upper(source) AS up,
        |  upper(substring(source, 1, 1)) || lower(substring(source, 2)) AS cap,
        |  trim('  ' || source || ' ') AS stripped,
        |  nullif(substring(source, 3, 1), '') AS get2,
        |  nullif(substring(source, -1, 1), '') AS get_m1
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_str_search" ->
      """SELECT doc_id,
        |  contains(text, 'merge') AS has_merge,
        |  starts_with(text, 'the') AS starts_the,
        |  ends_with(text, 'scan') AS ends_scan,
        |  CAST(strpos(text, 'join') - 1 AS INTEGER) AS find_join,
        |  CAST(CASE WHEN strpos(substring(text, 6, 55), 'join') > 0
        |    THEN strpos(substring(text, 6, 55), 'join') + 4
        |    ELSE -1 END AS INTEGER) AS find_join_5_60,
        |  substring(text, 11, 15) AS slice_10_25
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_str_replace_split" ->
      """SELECT doc_id,
        |  CASE WHEN strpos(text, 'join') > 0
        |    THEN substring(text, 1, strpos(text, 'join') - 1) || 'JOIN'
        |         || substring(text, strpos(text, 'join') + 4)
        |    ELSE text END AS repl_first,
        |  CASE WHEN strpos(text, ' ') > 0
        |    THEN substring(text, 1, strpos(text, ' ') - 1)
        |    ELSE text END AS split_left,
        |  CASE WHEN strpos(text, ' ') > 0
        |    THEN substring(text, strpos(text, ' ') + 1)
        |    ELSE NULL END AS split_right
        |FROM documents ORDER BY doc_id""".stripMargin)
}
