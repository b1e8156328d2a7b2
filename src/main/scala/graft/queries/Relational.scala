package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The relational spine: scan → filter → project → aggregate → sort.
  *
  * Covers SURVEY.md §2.2 (projection/selection/filtering), §2.3 (column
  * arithmetic), §2.7 (sorting) — the reference's `df[cols]`, `df[mask]`,
  * comparison/boolean ops (`/root/reference/baloo/core/generic.py:51-104`),
  * element-wise arithmetic (`weld_ops.py:232-275,417-459`) and
  * `sort_values` (`frame.py:755-796`; single-column only there — Spark's
  * `orderBy` is multi-column for free).
  *
  * All plans are pure `DataFrame` API: filters and projections reach the
  * parquet scan (PushedFilters / ReadSchema), sorts are range-partitioned
  * shuffles — nothing here would change shape at 1000 executors.
  */
object Relational extends QueryModule {

  /** TPC-H Q1-shaped flagship: the baloo benchmark pipeline
    * (filter → agg → groupby, `/root/reference/benchmarks/run.py:12-19`)
    * recast on lineitem. Partial aggregation map-side, one shuffle on the
    * 6-value group key.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Q.dsum(col("l_quantity")).as("sum_qty"),
        Q.dsum(col("l_extendedprice")).as("sum_base_price"),
        Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Q.davg(col("l_quantity")).as("avg_qty"),
        Q.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** 3-predicate filter (baloo bench op 1: `run.py:13`, kernel
    * `weld_filter` `weld_ops.py:97-133`). All three predicates push to
    * parquet; projection prunes the scan to 5 columns.
    */
  def qFilter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 10.0 && col("l_discount") < 0.08 && col("l_returnflag") =!= "A")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")

  /** Multi-column projection, order-preserving (`frame.py:352-362`). */
  def qProj(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")

  /** Element-wise scalar arithmetic (baloo bench op 3: `run.py:15-17`,
    * kernel `weld_element_wise_op` `weld_ops.py:417-459`): *2, +1, -23,
    * plus col⊕col (`weld_array_op` `weld_ops.py:232-275`) and pow.
    * Per-row IEEE arithmetic is deterministic — no rounding needed.
    */
  def qScalarOps(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * 2.0).as("price_x2"),
        (col("l_quantity") + 1.0).as("qty_p1"),
        (col("l_tax") - 23.0).as("tax_m23"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        pow(col("l_quantity"), 2.0).as("qty_sq"))
      .orderBy("l_orderkey", "l_linenumber", "price_x2", "qty_p1", "tax_m23",
        "net_price", "qty_sq")

  /** Comparisons + boolean algebra producing bool columns
    * (`weld_compare` `weld_ops.py:51-94`, `weld_array_op`, `weld_invert`).
    */
  def qBoolOps(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") > 25.0).as("big_qty"),
        (col("l_discount") >= 0.05).as("deep_disc"),
        ((col("l_quantity") > 25.0) && (col("l_discount") >= 0.05)).as("both"),
        ((col("l_quantity") > 25.0) || (col("l_discount") >= 0.05)).as("either"),
        (!(col("l_quantity") > 25.0)).as("small_qty"))
      .orderBy("l_orderkey", "l_linenumber", "big_qty", "deep_disc", "both",
        "either", "small_qty")

  /** Multi-column sort with mixed direction (`sort_values`
    * `frame.py:755-796`; descending = negate-key there, native here).
    * Tie-broken to a total order for the oracle hash.
    */
  def qSort(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy(col("l_quantity").desc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_extendedprice").asc)

  /** astype: numeric↔numeric lazy casts (`series.py:211-217`,
    * `weld_utils.py:240-309`).
    */
  def qAstype(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty_i64"),
        col("l_quantity").cast("int").as("qty_i32"),
        col("l_linenumber").cast("double").as("ln_f64"),
        col("l_extendedprice").cast("long").as("price_i64"))
      .orderBy("l_orderkey", "l_linenumber", "qty_i64", "price_i64")

  /** The reference's user-supplied-IR UDF surface routed through the
    * REAL operator (`BalooSeries.applyExpr`, reference `Series.apply`
    * `series.py:529-546` / `weld_udf` `weld_ops.py:700-725`): the
    * template is the reference benchmark's scalar pipeline. Catalyst
    * parses it into the same codegen'd plan as a native expression.
    */
  def qApplyUdf(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val ser = new graft.core.BalooSeries(
      base.select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity").as("qty_udf")),
      Seq("l_orderkey", "l_linenumber", "l_extendedprice"), "qty_udf")
    ser.applyExpr("{self} * 2.0 + 1.0").toDF
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "qty_udf")
  }

  /** pow col⊕col through the REAL `BalooSeries.**` zip operator
    * (reference `weld_array_op` `weld_ops.py:232-275`, §2.3). Index is
    * the 4-column total order (unique — the zip guard asserts it);
    * exponent ≤ 7 and base ≤ 50 keep every value integer-exact in f64,
    * so the oracle compare needs no rounding.
    */
  def qPowCols(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"),
      col("l_quantity").as("qty_v"), col("l_linenumber").as("ln_v"))
    val idx = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val a = new graft.core.BalooSeries(
      base.select((idx.map(col) :+ col("qty_v")): _*), idx, "qty_v")
    val b = new graft.core.BalooSeries(
      base.select((idx.map(col) :+ col("ln_v")): _*), idx, "ln_v")
    (a ** b).toDF.withColumnRenamed("qty_v", "pow_qty")
      // Results are integers by construction; round away the ≤1-ulp
      // libm difference between JVM Math.pow and DuckDB's C pow.
      .withColumn("pow_qty", round(col("pow_qty"), 0))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
  }

  /** Frame-level comparisons, isna, and df⊕list through the REAL
    * [[graft.core.BalooFrame]] API (reference `BinaryOps` mixin,
    * `generic.py:51-91`, dispatched by `frame.py:260-289`): `df < s` /
    * `df >= s` produce bool frames that DROP string data columns
    * (`_drop_str_columns`, asserted by `test_frame.py::test_comparison`),
    * `df.isna()` the NULL mask (sentinel −999 there, SQL NULL here —
    * SURVEY §1.3), and the list forms of `-`, `/`, `**` apply one scalar
    * per numeric column positionally. The four derived frames re-join on
    * the UNIQUE o_orderkey index (lineitem's (orderkey, linenumber) is
    * not unique in this testdata) — the alignment semantics every frame
    * op preserves. The `**` leg squares an integer-valued column with a
    * round(,0) (the q_pow_cols libm rule); the `/` and exponent-1.0
    * legs are IEEE-exactly-rounded, so no rounding needed.
    */
  def qFrameCompare(s: SparkSession, dir: String): DataFrame = {
    val idx = Seq("o_orderkey")
    val base = new graft.core.BalooFrame(
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice").as("price"),
        expr("nullif(o_custkey % 5, 0)").as("ia"), col("o_orderstatus")),
      idx)
    val lt = base < 4.0
    val ge = base >= 4.0
    val na = base.isna()
    val listed = ((base - Seq(0.5, 1.0)) / Seq(2.0, 1.0)) ** Seq(1.0, 2.0)
    lt.df.select(col("o_orderkey"),
        col("price").as("price_lt"), col("ia").as("ia_lt"))
      .join(ge.df.select(col("o_orderkey"), col("ia").as("ia_ge")), idx)
      .join(na.df.select(col("o_orderkey"), col("ia").as("ia_isna")), idx)
      .join(listed.df.select(col("o_orderkey"),
        col("price").as("price_norm"), round(col("ia"), 0).as("ia_sq")), idx)
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg(_, _)),
    "q_filter" -> (qFilter(_, _)),
    "q_proj" -> (qProj(_, _)),
    "q_frame_compare" -> (qFrameCompare(_, _)),
    "q_scalar_ops" -> (qScalarOps(_, _)),
    "q_bool_ops" -> (qBoolOps(_, _)),
    "q_sort" -> (qSort(_, _)),
    "q_astype" -> (qAstype(_, _)),
    "q_apply_udf" -> (qApplyUdf(_, _)),
    "q_pow_cols" -> (qPowCols(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Q.sqlDsum("l_quantity")} AS sum_qty,
         |  ${Q.sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${Q.sqlDavg("l_quantity")} AS avg_qty,
         |  ${Q.sqlDavg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 10.0 AND l_discount < 0.08 AND l_returnflag <> 'A'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,
    "q_proj" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin,
    "q_frame_compare" ->
      """SELECT o_orderkey,
        |  o_totalprice < 4.0 AS price_lt,
        |  nullif(o_custkey % 5, 0) < 4.0 AS ia_lt,
        |  nullif(o_custkey % 5, 0) >= 4.0 AS ia_ge,
        |  nullif(o_custkey % 5, 0) IS NULL AS ia_isna,
        |  pow((o_totalprice - 0.5) / 2.0, 1.0) AS price_norm,
        |  round(pow((nullif(o_custkey % 5, 0) - 1.0) / 1.0, 2.0), 0) AS ia_sq
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q_scalar_ops" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * 2.0 AS price_x2,
        |  l_quantity + 1.0 AS qty_p1,
        |  l_tax - 23.0 AS tax_m23,
        |  l_extendedprice * (1.0 - l_discount) AS net_price,
        |  pow(l_quantity, 2.0) AS qty_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, price_x2, qty_p1,
        |  tax_m23, net_price, qty_sq""".stripMargin,
    "q_bool_ops" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity > 25.0 AS big_qty,
        |  l_discount >= 0.05 AS deep_disc,
        |  l_quantity > 25.0 AND l_discount >= 0.05 AS both,
        |  l_quantity > 25.0 OR l_discount >= 0.05 AS either,
        |  NOT (l_quantity > 25.0) AS small_qty
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, big_qty, deep_disc,
        |  "both", either, small_qty""".stripMargin,
    "q_sort" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC,
        |  l_extendedprice ASC""".stripMargin,
    "q_apply_udf" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  l_quantity * 2.0 + 1.0 AS qty_udf
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, qty_udf""".stripMargin,
    "q_pow_cols" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  round(pow(l_quantity, l_linenumber), 0) AS pow_qty
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    // NB: Spark's non-ANSI double→int cast truncates toward zero while
    // DuckDB's CAST rounds to nearest — the oracle spells out trunc().
    "q_astype" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(trunc(l_quantity) AS BIGINT) AS qty_i64,
        |  CAST(trunc(l_quantity) AS INTEGER) AS qty_i32,
        |  CAST(l_linenumber AS DOUBLE) AS ln_f64,
        |  CAST(trunc(l_extendedprice) AS BIGINT) AS price_i64
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, qty_i64, price_i64""".stripMargin)
}
