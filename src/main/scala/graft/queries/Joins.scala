package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 — joins.
  *
  * Reference: `DataFrame.merge/join` (`/root/reference/baloo/core/frame.py:
  * 798-980`) — equi-join only, sort-merge only, single-threaded, and
  * restricted to UNIQUE, pre-sorted keys (`frame.py:860-870`). Spark drops
  * every restriction: duplicate keys, unsorted input, and all four `how`
  * kinds are native, plus semi/anti which the reference lacks.
  *
  * Scale notes baked into each query:
  *  - fact ⋈ dimension uses `broadcast(dim)` — at 100 TB the fact side
  *    never shuffles for a 15k-row dimension;
  *  - fact ⋈ fact (self-join) shuffles both sides on the join key once —
  *    Catalyst plans sort-merge with AQE skew splitting;
  *  - outer-join NULL fill is native (the reference emits `-999`
  *    sentinels, `weld_ops.py:370-414`; we use SQL NULL per SURVEY §1.3).
  * Row order after a Spark join is partition-nondeterministic, so every
  * query re-sorts on a total order; NULLS FIRST is spelled on both sides
  * (Spark's asc default) since DuckDB defaults to NULLS LAST.
  */
object Joins extends QueryModule {

  /** Inner fact⋈dim with explicit broadcast (`merge(how='inner')`,
    * kernel `weld_joins.py:76-156`).
    */
  def qJoinInner(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"), "inner")
      .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
      .orderBy("o_orderkey")

  /** Left join keeping customers with no orders (NULL-filled right side;
    * reference fills sentinel via `weld_iloc_indices_with_missing`).
    */
  def qJoinLeft(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** Right join (`merge(how='right')`). */
  def qJoinRight(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "right")
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** Full outer join with gaps on BOTH sides: high-balance suppliers vs
    * per-supplier lineitem counts (`merge(how='outer')`,
    * `weld_joins.py:159-286`); the coalesced key is the reference's
    * merged-key index column.
    */
  def qJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
      .filter(col("s_acctbal") > 5000.0)
      .select("s_suppkey", "s_name")
    val la = Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45.0)
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_items"))
    sup.join(la, col("s_suppkey") === col("l_suppkey"), "full_outer")
      .select(
        coalesce(col("s_suppkey"), col("l_suppkey")).as("suppkey"),
        col("s_name"), col("n_items"))
      .orderBy("suppkey")
  }

  /** Multi-key equi-join (reference `on=['a','b']`,
    * `_generate_checks` `weld_joins.py:60-73`) as a lineitem self-join on
    * the (orderkey, linenumber) unique key.
    */
  def qJoinMultiKey(s: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val price = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    qty.join(price, Seq("l_orderkey", "l_linenumber"), "inner")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount")
  }

  /** Index alignment (`weld_align`, `weld_joins.py:289-344`; used by
    * `df['c'] = series` when indexes differ, `frame.py:414-425`): attach
    * a per-order aggregate series back onto every lineitem row = left
    * join on the index key.
    */
  def qAlign(s: SparkSession, dir: String): DataFrame = {
    val series = Tables.lineitem(s, dir)
      .groupBy("l_orderkey").agg(Q.dsum(col("l_quantity")).as("order_qty"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .join(series, Seq("l_orderkey"), "left")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
  }

  /** Semi/anti joins — beyond the reference (SURVEY §2.8 "not present"),
    * table stakes for a Spark engine: EXISTS / NOT EXISTS without
    * materializing the right side's payload.
    */
  def qJoinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  def qJoinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** TPC-H-Q3-shaped 3-table pipeline: filter both fact sides, broadcast
    * the dimension, aggregate revenue per order, top-10. The plan is the
    * 100 TB blueprint: both parquet scans arrive pre-filtered
    * (PushedFilters), customer broadcasts, lineitem⋈orders shuffles once
    * on orderkey, partial aggregation precedes the final top-k
    * (TakeOrderedAndProject) — no full sort anywhere.
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1995-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1995-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H-Q5-shaped 6-table star join — the deepest relational plan in
    * the suite: region gates nation (broadcast), the gated nation list
    * broadcasts into customer AND supplier, orders arrives
    * date-pruned (PushedFilters), and the only big shuffles are
    * lineitem⋈orders on orderkey and the result⋈customer on custkey.
    * The local-supplier predicate (c_nationkey = s_nationkey) rides the
    * supplier broadcast join, so no extra exchange. This is the
    * canonical 100 TB shape: every dimension broadcast, exactly two
    * fact shuffles, partial aggregation before the 5-row result.
    */
  def q5LocalRevenue(s: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, dir)
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H-Q18-shaped large-volume-customer query. The HAVING aggregate
    * IS the output aggregate: a group of the final GROUP BY is exactly
    * one o_orderkey (unique in orders; the customer and order keys are
    * functionally dependent on it), so the group's sum_qty ≡ the dsum
    * the qualifying filter already computed — both exact decimal sums,
    * bit-identical. Keeping that sum drops the second lineitem scan,
    * the fact-side gate join and the wide re-aggregation exchange the
    * r13 shape paid (guide §2.4 — don't recompute what an earlier
    * aggregate already proved). Remaining shape: one lineitem pass into
    * a per-order aggregate (map-side partials, one exchange), the ≈1%
    * qualifying set joins dimension-style against orders/customer, and
    * the top-100 is TakeOrderedAndProject.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val hot = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey")
      .agg(Q.dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 200.0)
    hot
      .join(Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "sum_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H-Q7-shaped bilateral trade volume — the DUAL-ROLE dimension
    * plan no other TPC-H query here exercises: `nation` joins the fact
    * twice under different aliases (supplier's nation, customer's
    * nation) with the symmetric pair predicate applied AFTER both
    * attachments. Both nation copies broadcast (dimension-sized), the
    * date filter pushes into the lineitem scan, and the fact shuffles
    * only on its join keys (orderkey, then custkey) — the year is
    * derived AFTER the joins so nothing blocks pushdown. The adapted
    * constants (NATION_1/NATION_2, ship years 1996–97) match the
    * generator's vocabulary.
    */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1998-01-01"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H-Q8-shaped national market share — the CONDITIONAL-aggregate
    * star: a 7-table join (fact + part/supplier/orders/customer/nation×2
    * /region) whose answer is a RATIO of two sums over the same joined
    * rows (share = Σ volume where supplier-nation = target / Σ volume).
    * Every dimension broadcasts; the region filter reaches the customer
    * side through nation, the p_type filter prunes part before its
    * broadcast; both sums fold through exact decimals so the final
    * division is one double op on identical scalars cross-engine.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val amNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01")
            && col("o_orderdate") < lit("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(amNations), col("c_nationkey") === col("c_nk"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((Q.dsum(when(col("nation") === "NATION_3", col("volume")).otherwise(lit(0.0)))
        / Q.dsum(col("volume"))).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H-Q10-shaped returned-item revenue report — the WIDE-GROUP
    * top-k: the aggregate keys carry the whole customer record (8
    * grouping columns), so the shuffle rows are wide but the group
    * count is customer-bounded; the returnflag filter prunes ⅔ of the
    * fact at the scan, orders gates the quarter, nation broadcasts,
    * and the final 20 rows come off a TakeOrderedAndProject — no
    * global sort of the aggregate output.
    */
  def q10Returned(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01")
            && col("o_orderdate") < lit("1996-04-01"))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir)
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  /** TPC-H-Q14-shaped promo revenue share — fact⋈dim with a
    * DIM-ATTRIBUTE conditional: the numerator condition lives on the
    * joined part attribute, so the broadcast must carry `p_type` (not
    * just the key) and the share is again a ratio of two exact-decimal
    * sums over one joined pass. The month window pushes into the
    * lineitem scan.
    */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01")
        && col("l_shipdate") < lit("1996-04-01"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .agg((lit(100.0)
        * Q.dsum(when(col("p_type") === "PROMO", col("volume")).otherwise(lit(0.0)))
        / Q.dsum(col("volume"))).as("promo_revenue"))

  /** Cross join (beyond reference — SURVEY §2.8 "not present"): the
    * 125-row nation×region grid with a computed pairing label. Spark
    * makes cross products explicit (`crossJoin`) — the right default
    * for an engine where an accidental cross product over 100 TB is a
    * cluster-killer; a legitimate small-grid enumeration broadcasts the
    * smaller side, as here.
    */
  def qJoinCross(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select("n_nationkey", "n_name")
      .crossJoin(broadcast(Tables.region(s, dir).select("r_regionkey", "r_name")))
      .withColumn("pair", concat_ws("-", col("n_name"), col("r_name")))
      .orderBy("n_nationkey", "r_regionkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_shipping" -> (q3Shipping(_, _)),
    "q5_local_revenue" -> (q5LocalRevenue(_, _)),
    "q18_large_orders" -> (q18LargeOrders(_, _)),
    "q7_nation_volume" -> (q7NationVolume(_, _)),
    "q8_market_share" -> (q8MarketShare(_, _)),
    "q10_returned" -> (q10Returned(_, _)),
    "q14_promo_share" -> (q14PromoShare(_, _)),
    "q_join_cross" -> (qJoinCross(_, _)),
    "q_join_inner" -> (qJoinInner(_, _)),
    "q_join_left" -> (qJoinLeft(_, _)),
    "q_join_right" -> (qJoinRight(_, _)),
    "q_join_outer" -> (qJoinOuter(_, _)),
    "q_join_multikey" -> (qJoinMultiKey(_, _)),
    "q_align" -> (qAlign(_, _)),
    "q_join_semi" -> (qJoinSemi(_, _)),
    "q_join_anti" -> (qJoinAnti(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q18_large_orders" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |  ${Q.sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_orderkey IN (
         |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         |  HAVING ${Q.sqlDsum("l_quantity")} > 200.0)
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
         |LIMIT 100""".stripMargin,
    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         |  ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         |  ${Q.sqlDsum("CASE WHEN n1.n_name = 'NATION_3' " +
            "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |    / ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region ON n2.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,
    "q14_promo_share" ->
      s"""SELECT 100.0
         |  * ${Q.sqlDsum("CASE WHEN p_type = 'PROMO' " +
            "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |  / ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q10_returned" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    "q_join_cross" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name,
        |  n_name || '-' || r_name AS pair
        |FROM nation CROSS JOIN region
        |ORDER BY n_nationkey, r_regionkey""".stripMargin,
    "q3_shipping" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         |  ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15'
         |  AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey ASC
         |LIMIT 10""".stripMargin,
    "q5_local_revenue" ->
      s"""SELECT n_name, ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_outer" ->
      """SELECT coalesce(s_suppkey, l_suppkey) AS suppkey, s_name, n_items
        |FROM (SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal > 5000.0) s
        |FULL OUTER JOIN (
        |  SELECT l_suppkey, count(*) AS n_items FROM lineitem
        |  WHERE l_quantity > 45.0 GROUP BY l_suppkey) la
        |ON s_suppkey = l_suppkey
        |ORDER BY suppkey""".stripMargin,
    "q_join_multikey" ->
      """SELECT a.l_orderkey, a.l_linenumber, a.l_quantity,
        |       b.l_extendedprice, b.l_discount
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem) a
        |JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |      FROM lineitem) b
        |USING (l_orderkey, l_linenumber)
        |ORDER BY a.l_orderkey, a.l_linenumber, a.l_quantity,
        |  b.l_extendedprice, b.l_discount""".stripMargin,
    "q_align" ->
      s"""SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, s.order_qty
         |FROM lineitem l
         |LEFT JOIN (SELECT l_orderkey, ${Q.sqlDsum("l_quantity")} AS order_qty
         |           FROM lineitem GROUP BY l_orderkey) s
         |USING (l_orderkey)
         |ORDER BY l.l_orderkey, l.l_linenumber, l.l_quantity""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)
}
