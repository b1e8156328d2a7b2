package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The decorrelation suite — the TPC-H shapes whose SQL is written with
  * correlated subqueries (EXISTS / NOT EXISTS / scalar-subquery / NOT IN /
  * correlated aggregates). Beyond the reference (baloo has no subquery
  * surface at all — SURVEY.md §2.8), but essential engine capability: at
  * 100 TB a correlated subquery either decorrelates into ONE distributed
  * join/aggregate pass or it re-executes per outer row and never finishes.
  * Each query here is declared with the DataFrame API in the decorrelated
  * form directly — semi/anti joins with extra non-equi conjuncts,
  * per-group aggregate thresholds joined back on the (already shuffled)
  * group key, one-row global aggregates broadcast via crossJoin — i.e. the
  * plan Catalyst's RewriteCorrelatedScalarSubquery / RewritePredicateSubquery
  * rules produce from the SQL the DuckDB oracle runs verbatim.
  *
  * Determinism contract (Q.scala): every money sum folds through exact
  * DECIMAL partials, so thresholds compared against floats are bit-identical
  * across engines; every result carries a total ORDER BY.
  */
object TpchDeep extends QueryModule {

  /** TPC-H-Q4-shaped late-shipment priority count — EXISTS with a
    * CORRELATED NON-EQUI predicate (l_shipdate > o_orderdate + 60 days).
    * Declared as a left-semi hash join on the order key carrying the date
    * inequality as an extra conjunct: one shuffle on orderkey, no
    * per-order re-scan, duplicate lineitems collapse inside the semi join
    * (no distinct needed).
    */
  def q4Priority(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1996-07-01"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** TPC-H-Q13-shaped customer order-count distribution — the DOUBLE
    * aggregation over a LEFT OUTER join: count(o_orderkey) must count
    * NULLs from customers with no (non-urgent) orders as 0, then the
    * distribution groups on that count. Both aggregations are plain hash
    * aggs; the outer join shuffles on custkey once and the second agg's
    * key space is tiny (distinct order counts).
    */
  def q13OrderDist(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select("c_custkey")
      .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H-Q17-shaped small-quantity revenue — the CORRELATED AGGREGATE
    * threshold (l_quantity < 0.5 × that part's average quantity).
    * Decorrelated: the per-part average aggregates once over the fact
    * (shuffle on partkey), then joins back on the SAME key — at scale the
    * exchange is reused, so the whole query is one partkey shuffle plus
    * the broadcast Brand#1 filter; the threshold average folds through
    * exact decimals so the float comparison is cross-engine safe.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val thresholds = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((Q.davg(col("l_quantity")) * lit(0.5)).as("qty_thr"))
    li.join(broadcast(Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#1").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(thresholds, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_thr"))
      .agg((Q.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H-Q21-shaped sole-fault supplier report — the EXISTS + NOT
    * EXISTS pair with ANTI-correlation on the supplier (another lineitem
    * of the same order from a DIFFERENT supplier). One left-semi and one
    * left-anti hash join, both on the order key with the `suppkey <>`
    * inequality as a residual conjunct — three shuffles on orderkey
    * total, never a per-row subquery; supplier names broadcast.
    */
  def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val l1 = li.filter(col("l_returnflag") === "R").select("l_orderkey", "l_suppkey")
    val anyOther = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val otherR = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    l1.join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(anyOther,
        col("o2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"), "left_semi")
      .join(otherR,
        col("o3") === col("l_orderkey") && col("s3") =!= col("l_suppkey"), "left_anti")
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(50)
  }

  /** TPC-H-Q22-shaped dormant-rich-customer report — the GLOBAL SCALAR
    * subquery (acctbal above the positive-balance average) plus NOT
    * EXISTS orders. The scalar aggregates to ONE row and crossJoin-
    * broadcasts to every customer partition (no driver collect); the NOT
    * EXISTS is a left-anti hash join on custkey.
    */
  def q22NoOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val avgBal = cust.filter(col("c_acctbal") > lit(0.0))
      .agg(Q.davg(col("c_acctbal")).as("avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01")).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("numcust"), Q.dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("segment")
  }

  /** TPC-H-Q11-shaped important-part value list — HAVING against a
    * FRACTION OF THE GLOBAL total. The global total RE-AGGREGATES the
    * per-part aggregate (2000 rows) instead of re-scanning the fact join
    * — the two branches then share one identical shuffle (reused
    * exchange), and the one-row threshold crossJoin-broadcasts against
    * the per-part rows. Decimal-summing the per-part doubles keeps the
    * threshold bit-identical with the oracle, which folds the same way.
    */
  def q11Important(s: SparkSession, dir: String): DataFrame = {
    val suppIn = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val base = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(suppIn), col("l_suppkey") === col("s_suppkey"))
      .withColumn("val", col("l_extendedprice") * col("l_quantity"))
    val perPart = base.groupBy("l_partkey").agg(Q.dsum(col("val")).as("value"))
    val threshold = perPart.agg((Q.dsum(col("value")) * lit(0.001)).as("thr"))
    perPart.crossJoin(broadcast(threshold))
      .filter(col("value") > col("thr"))
      .select("l_partkey", "value")
      .orderBy(col("value").desc, col("l_partkey").asc)
      .limit(100)
  }

  /** TPC-H-Q15-shaped top supplier — revenue view + scalar MAX over the
    * same view. The revenue aggregate is computed once (shuffle on
    * suppkey, 100 groups); its max is one broadcast row; the equality
    * filter on exact-decimal doubles is cross-engine safe.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_rev"))
    Tables.supplier(s, dir).select("s_suppkey", "s_name")
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** TPC-H-Q16-shaped supplier diversity count — NOT IN subquery +
    * COUNT(DISTINCT). The NOT IN is a left-anti broadcast join (suppkey
    * is non-null, so anti-join ≡ NOT IN); the distinct count is Spark's
    * two-phase partial-distinct aggregate, shuffling (brand,type,size,
    * suppkey) pairs — never a global set on one node.
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
            && col("p_size").isin(1, 5, 9, 13, 17))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)
          .filter(col("s_acctbal") < lit(0.0)).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)

  /** TPC-H-Q19-shaped disjunctive-predicate revenue — the OR-of-ANDs
    * mixing fact and dimension attributes. The common p_partkey equi-
    * conjunct stays a broadcast hash join; the disjunction evaluates as
    * a residual filter inside whole-stage codegen (NOT a fallback to
    * nested-loop, which an OR-join naively plans as).
    */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11)
          && col("p_size").between(1, 5))
        || (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20)
          && col("p_size").between(1, 10))
        || (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30)
          && col("p_size").between(1, 15)))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))

  /** TPC-H-Q2-shaped min-cost supplier — the CORRELATED MIN with
    * tie-broken argmin. Per part, the supplier offering the lowest unit
    * price: ONE hash aggregate of min(struct(unit_price, suppkey)) —
    * lexicographic struct ordering gives "lowest price, then lowest
    * suppkey among ties" with map-side partials and no join-back or
    * per-part sort window.
    */
  def q2MinCost(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      .groupBy("l_partkey")
      .agg(min(struct(col("unit_price"), col("l_suppkey"))).as("best"))
      .select(col("l_partkey"), col("best.l_suppkey").as("best_supp"),
        col("best.unit_price").as("min_price"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("best_supp") === col("s_suppkey"))
      .select("l_partkey", "best_supp", "s_name", "min_price")
      .orderBy("l_partkey")

  /** TPC-H-Q6-shaped forecasting revenue — the pure SCAN-BOUND query:
    * three range predicates and one sum, no join. Exists to pin the
    * pushdown contract: all three predicates reach the parquet scan as
    * PushedFilters and only three columns are read; at 100 TB this is
    * the query where row-group statistics do all the work.
    */
  def q6SimpleRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(Q.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** TPC-H-Q9-shaped product-type profit — the WIDEST star (5 tables)
    * with a LIKE dimension filter and an expression mixing fact and two
    * dimension attributes (revenue minus a retail-price-based cost).
    * part prunes through the LIKE before broadcasting; nation arrives
    * through supplier; the (nation, year) aggregate is dimension-sized.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").contains("bolt"))
          .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - col("p_retailprice") * col("l_quantity") * lit(0.1)).as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)

  /** TPC-H-Q12-shaped shipping-priority matrix — the POST-JOIN
    * CONDITIONAL COUNT pair: one orders⋈lineitem join, then two CASE
    * counts per group keyed on a dimension attribute of the OTHER
    * table. (l_linestatus stands in for l_shipmode, absent from this
    * schema.) The date window pushes into the lineitem scan; the join
    * shuffles once on orderkey.
    */
  def q12Priority(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01"))
      .select("l_orderkey", "l_linestatus")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")

  /** TPC-H-Q20-shaped excess-supply supplier list — the NESTED IN with
    * a PER-GROUP aggregate threshold: suppliers who shipped more than
    * half their all-time quantity of a 'bolt' part during 1996 alone
    * (the availqty>half-demand test recast on this schema's facts).
    * The inner query is ONE hash aggregate with two conditional sums —
    * threshold and value from the same pass, no join-back — and the
    * outer IN is a left-semi broadcast join; nation gates the supplier
    * side before output.
    */
  def q20ExcessSupply(s: SparkSession, dir: String): DataFrame = {
    val hoarders = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").contains("bolt")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(
        Q.dsum(when(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1997-01-01"), col("l_quantity"))
          .otherwise(lit(0.0))).as("qty_1996"),
        Q.dsum(col("l_quantity")).as("qty_total"))
      .filter(col("qty_1996") > col("qty_total") * lit(0.5))
      .select("l_suppkey").distinct()
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(hoarders, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_simple_revenue" -> (q6SimpleRevenue(_, _)),
    "q9_product_profit" -> (q9ProductProfit(_, _)),
    "q12_priority" -> (q12Priority(_, _)),
    "q20_excess_supply" -> (q20ExcessSupply(_, _)),
    "q2_min_cost" -> (q2MinCost(_, _)),
    "q4_priority" -> (q4Priority(_, _)),
    "q11_important" -> (q11Important(_, _)),
    "q13_order_dist" -> (q13OrderDist(_, _)),
    "q15_top_supplier" -> (q15TopSupplier(_, _)),
    "q16_supplier_cnt" -> (q16SupplierCnt(_, _)),
    "q17_small_qty" -> (q17SmallQty(_, _)),
    "q19_disjunctive" -> (q19Disjunctive(_, _)),
    "q21_waiting" -> (q21Waiting(_, _)),
    "q22_no_orders" -> (q22NoOrders(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q6_simple_revenue" ->
      s"""SELECT ${Q.sqlDsum("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation,
         |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         |  ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)" +
            " - p_retailprice * l_quantity * 0.1")} AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%bolt%'
         |GROUP BY 1, 2
         |ORDER BY nation ASC, o_year DESC""".stripMargin,
    "q12_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q20_excess_supply" ->
      s"""SELECT s_suppkey, s_name, s_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name IN ('NATION_1', 'NATION_2')
         |  AND s_suppkey IN (
         |    SELECT l_suppkey
         |    FROM lineitem JOIN part ON l_partkey = p_partkey
         |    WHERE p_name LIKE '%bolt%'
         |    GROUP BY l_suppkey, l_partkey
         |    HAVING ${Q.sqlDsum("CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' " +
            "AND l_shipdate < TIMESTAMP '1997-01-01' THEN l_quantity ELSE 0.0 END")}
         |      > ${Q.sqlDsum("l_quantity")} * 0.5)
         |ORDER BY s_suppkey""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q13_order_dist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_qty" ->
      s"""SELECT ${Q.sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |JOIN (SELECT l_partkey AS t_partkey,
         |        ${Q.sqlDavg("l_quantity")} * 0.5 AS qty_thr
         |      FROM lineitem GROUP BY l_partkey) t
         |  ON l_partkey = t_partkey
         |WHERE p_brand = 'Brand#1' AND l_quantity < qty_thr""".stripMargin,
    "q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM orders
        |    WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 50""".stripMargin,
    "q22_no_orders" ->
      s"""SELECT c_mktsegment AS segment, count(*) AS numcust,
         |  ${Q.sqlDsum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (
         |    SELECT ${Q.sqlDavg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |    AND o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY c_mktsegment
         |ORDER BY segment""".stripMargin,
    "q11_important" ->
      s"""WITH perpart AS (
         |  SELECT l_partkey, ${Q.sqlDsum("l_extendedprice * l_quantity")} AS value
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
         |  GROUP BY l_partkey)
         |SELECT l_partkey, value
         |FROM perpart
         |WHERE value > (SELECT ${Q.sqlDsum("value")} * 0.001 FROM perpart)
         |ORDER BY value DESC, l_partkey ASC
         |LIMIT 100""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 13, 17)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT ${Q.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
         |    AND p_size BETWEEN 1 AND 5)
         |  OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
         |    AND p_size BETWEEN 1 AND 10)
         |  OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
         |    AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q2_min_cost" ->
      """WITH u AS (
        |  SELECT l_partkey, l_suppkey,
        |    l_extendedprice / l_quantity AS unit_price
        |  FROM lineitem),
        |m AS (
        |  SELECT l_partkey, min(unit_price) AS min_price
        |  FROM u GROUP BY l_partkey),
        |b AS (
        |  SELECT u.l_partkey, min(u.l_suppkey) AS best_supp, m.min_price
        |  FROM u
        |  JOIN m ON u.l_partkey = m.l_partkey AND u.unit_price = m.min_price
        |  GROUP BY u.l_partkey, m.min_price)
        |SELECT b.l_partkey, b.best_supp, s_name, b.min_price
        |FROM b JOIN supplier ON b.best_supp = s_suppkey
        |ORDER BY b.l_partkey""".stripMargin)
}
