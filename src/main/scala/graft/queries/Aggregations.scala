package graft.queries

import graft.Tables
import graft.functions.GraftFunctions.prod
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — full-column aggregations.
  *
  * Reference: `Series.sum/prod/min/max/count/mean/var/std`
  * (`/root/reference/baloo/core/series.py:350-366`, kernels
  * `baloo/weld/weld_aggs.py`), multi-agg `Series.agg(list)` /
  * `DataFrame.agg` (`series.py:370-388`, `frame.py:594-666`) whose result
  * is a little table keyed by aggregation name with all values f64.
  *
  * Spark shape: ONE `agg(...)` computes every measure in a single pass
  * (partial/final hash agg — the multi-agg CSE the reference hand-builds
  * in `weld_aggs.py:186-268` is free here); the name-keyed matrix is a
  * trailing `stack` over the one-row result, so the 100 TB scan happens
  * exactly once.
  *
  * Float determinism vs the oracle: sums/means/vars go through exact
  * decimal moments ([[Q.dsum]]/[[Q.davg]]/[[Q.dvar]]); `prod` over the
  * whole column saturates to +inf identically on both engines (every
  * l_quantity ≥ 1), and per-group products are over small integers
  * (exact in double).
  */
object Aggregations extends QueryModule {

  /** Per-column aggregate row (`DataFrame._aggregate_columns`
    * `frame.py:594-639`): every reduction in one pass over lineitem.
    */
  def qAggRow(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      Q.dsum(col("l_quantity")).as("sum_qty"),
      Q.davg(col("l_quantity")).as("mean_qty"),
      Q.dvar(col("l_quantity")).as("var_qty"),
      Q.dstd(col("l_quantity")).as("std_qty"),
      count(col("l_quantity")).as("count_qty"),
      prod(col("l_quantity")).as("prod_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      Q.dsum(col("l_extendedprice")).as("sum_price"),
      Q.davg(col("l_extendedprice")).as("mean_price"))

  /** Baloo's `Series.agg(['min','max','sum','mean','var','std','count',
    * 'prod'])` result shape — rows keyed by agg name, all f64
    * (`series.py:370-388,622-627`). One aggregation pass + `stack`.
    */
  def qAggMatrix(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      min(col("l_quantity")).cast("double").as("vmin"),
      max(col("l_quantity")).cast("double").as("vmax"),
      Q.dsum(col("l_quantity")).as("vsum"),
      Q.davg(col("l_quantity")).as("vmean"),
      Q.dvar(col("l_quantity")).as("vvar"),
      Q.dstd(col("l_quantity")).as("vstd"),
      count(col("l_quantity")).cast("double").as("vcount"),
      prod(col("l_quantity")).as("vprod"))
    .selectExpr(
      """stack(8,
        |  'count', vcount, 'max', vmax, 'mean', vmean, 'min', vmin,
        |  'prod', vprod, 'std', vstd, 'sum', vsum, 'var', vvar
        |) AS (agg, value)""".stripMargin)
    .orderBy("agg")

  /** Table profiling — the ANALYZE/data-quality pass a pipeline runs
    * before relying on a table: per-column row/null/distinct counts and
    * min/max, ONE aggregation pass over the scan (multiple
    * count-distincts plan as a single Expand + two-level aggregate —
    * rows × #distinct-cols expansion, the standard Catalyst shape), then
    * a `stack` to the (column, stat…) presentation. At 100 TB swap the
    * exact distincts for `approx_count_distinct` and the same plan
    * loses the Expand entirely; exact is kept here because the oracle
    * must hash-match.
    */
  def qProfile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n_rows"),
      count(col("l_quantity")).as("nn_qty"),
      countDistinct(col("l_quantity")).as("nd_qty"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      count(col("l_discount")).as("nn_disc"),
      countDistinct(col("l_discount")).as("nd_disc"),
      min(col("l_discount")).as("min_disc"),
      max(col("l_discount")).as("max_disc"),
      count(col("l_extendedprice")).as("nn_price"),
      countDistinct(col("l_extendedprice")).as("nd_price"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))
    .selectExpr(
      """stack(3,
        |  'l_discount', n_rows, nn_disc, nd_disc, min_disc, max_disc,
        |  'l_extendedprice', n_rows, nn_price, nd_price, min_price, max_price,
        |  'l_quantity', n_rows, nn_qty, nd_qty, min_qty, max_qty
        |) AS (column, n_rows, n_notnull, n_distinct, vmin, vmax)""".stripMargin)
    .orderBy("column")

  /** Equi-width histogram of l_extendedprice in [[HistBins]] buckets —
    * distribution profiling. Bounds come from one tiny min/max
    * aggregate broadcast as a scalar; bucketing is then map-only and
    * the histogram itself one hash aggregate over small integer keys.
    * Bucket edges are the same double arithmetic on both engines, so
    * boundary assignment is bit-identical.
    */
  private val HistBins = 10

  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi"))
    li.select(col("l_extendedprice").as("x"))
      .crossJoin(broadcast(bounds))
      .withColumn("w", (col("hi") - col("lo")) / HistBins)
      // degenerate column (min == max → w = 0): every row in bucket 0,
      // rather than Spark's NULL-on-divide vs DuckDB's inf diverging
      .withColumn("bucket",
        when(col("w") === 0d, lit(0))
          .otherwise(least(floor((col("x") - col("lo")) / col("w")).cast("int"),
            lit(HistBins - 1))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        first(col("lo")).as("flo"), first(col("w")).as("fw"))
      .select(col("bucket"),
        (col("flo") + col("bucket") * col("fw")).as("b_lo"),
        (col("flo") + (col("bucket") + 1) * col("fw")).as("b_hi"),
        col("n"))
      .orderBy("bucket")
  }

  /** Whole-table content checksum — the integrity handshake two
    * pipeline stages exchange across a handoff (same rows in any order
    * and partitioning ⇒ same checksum; any changed row flips it).
    * Order-independent by construction: a COMMUTATIVE sum of per-row
    * 60-bit md5 hashes, accumulated in DECIMAL(38) so no corpus size
    * can overflow it, reduced mod 2^31−1. One scan with map-side
    * partials, one scalar row out. Row serialization concatenates the
    * (non-null by schema) document columns with an explicit separator,
    * identically on both engines.
    */
  private val ChkP = Q.ChkP

  def qTableChecksum(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(expr(
        "CAST(conv(substring(md5(concat_ws('|', CAST(doc_id AS STRING), " +
          s"lang, source, text)), 1, 15), 16, 10) AS BIGINT) % $ChkP").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"CAST(sum(CAST(h AS DECIMAL(38,0))) % $ChkP AS BIGINT)")
          .as("checksum"))

  /** Pairwise Pearson correlation matrix of the four numeric lineitem
    * measures — pandas `df.corr()` (a DataFrame-surface op the reference
    * never got to). ONE pass, ONE aggregate row: all 4 first-moment and
    * 10 second-moment sums accumulate in exact DECIMAL with map-side
    * partials (shuffle = one 15-value row per partition), then the 6
    * correlations are pure driver-free double arithmetic on that row —
    * the textbook corr = (n·Σxy − Σx·Σy)/(√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²))
    * spelled identically in the oracle, rounded at 1e-6: once the
    * second-moment sums pass 2^53 (sf0.1+) the decimal→double CAST
    * itself differs by an ulp between engines (single rounding vs
    * DuckDB's significand/10^scale double rounding), so raw quotients
    * stop being bitwise-comparable. At 100 TB this
    * is a single scan; nothing grows with n but the partial count.
    */
  private val CorrCols = Seq(
    "l_discount" -> "d", "l_extendedprice" -> "p",
    "l_quantity" -> "q", "l_tax" -> "t")

  def qCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 4)
    val pairs = for {
      (i, (_, a)) <- CorrCols.zipWithIndex.map(_.swap)
      (_, b) <- CorrCols.drop(i)
    } yield (a, b)
    val sums =
      count(lit(1)).as("n") +:
        CorrCols.map { case (c, a) => sum(col(c).cast(dec18)).as(s"s_$a") } ++:
        pairs.map { case (a, b) =>
          sum((col(CorrCols.find(_._2 == a).get._1).cast(dec18) *
            col(CorrCols.find(_._2 == b).get._1).cast(dec18))).as(s"s_$a$b")
        }
    def D(name: String) = col(name).cast("double")
    val aggd = Tables.lineitem(s, dir).agg(sums.head, sums.tail: _*)
      .select(D("n").as("nd") +:
        CorrCols.map { case (_, a) => D(s"s_$a").as(s"d_$a") } ++:
        pairs.map { case (a, b) => D(s"s_$a$b").as(s"d_$a$b") }: _*)
    def varTerm(a: String) =
      sqrt(col("nd") * col(s"d_$a$a") - col(s"d_$a") * col(s"d_$a"))
    val offDiag = pairs.filter { case (a, b) => a != b }
    // round(·, 6): the decimal sums pass 2^53 at sf0.1+, where the
    // decimal→double cast itself diverges by an ulp between engines
    // (Spark single-rounds via BigDecimal; DuckDB divides the int128
    // significand by 10^scale in floating point — a double rounding),
    // so the raw quotients are no longer bitwise-comparable. A
    // correlation at 1e-6 grain is square in the repo's rounding rule
    // (|v|·10⁶ ≤ 10⁶ ≪ 2^53).
    val corrs = aggd.select(offDiag.map { case (a, b) =>
      round((col("nd") * col(s"d_$a$b") - col(s"d_$a") * col(s"d_$b")) /
        (varTerm(a) * varTerm(b)), 6).as(s"c_$a$b")
    }: _*)
    val stackArgs = offDiag.map { case (a, b) =>
      val (na, nb) = (CorrCols.find(_._2 == a).get._1, CorrCols.find(_._2 == b).get._1)
      s"'$na', '$nb', c_$a$b"
    }.mkString(", ")
    corrs.select(expr(
      s"stack(${offDiag.size}, $stackArgs) AS (col_x, col_y, corr)"))
      .orderBy("col_x", "col_y")
  }

  /** Data-quality CONTRACT report — the Deequ/dbt-test-style gate a
    * pipeline runs before publishing a table: one row per constraint
    * with its violation count and verdict. Checks exercised: primary-
    * key uniqueness (count − distinct), referential integrity
    * (lineitem → orders orphans via left_anti), null-rate, and a value-
    * range invariant. Each check is one aggregate or one anti-join
    * count; at 100 TB the uniqueness check's distinct is the only
    * full-width shuffle and swaps to approx_count_distinct when an
    * exact audit is not required (exact kept here for the oracle).
    */
  def qDqContract(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    def check(i: Int, name: String, viol: DataFrame): DataFrame =
      viol.select(lit(i).as("check_id"), lit(name).as("check_name"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
    val pkDup = orders.agg(
      (count(col("o_orderkey")) - countDistinct(col("o_orderkey")))
        .as("n_violations"))
    val fkOrphan = li.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val qtyNull = li.agg(
      (count(lit(1)) - count(col("l_quantity"))).as("n_violations"))
    val discRange = li.agg(count(when(
      col("l_discount") < 0.0 || col("l_discount") > 1.0, 1)).as("n_violations"))
    check(0, "orders_pk_unique", pkDup)
      .unionAll(check(1, "lineitem_fk_orders", fkOrphan))
      .unionAll(check(2, "l_quantity_not_null", qtyNull))
      .unionAll(check(3, "l_discount_in_range", discRange))
      .orderBy("check_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_contract" -> (qDqContract(_, _)),
    "q_corr_matrix" -> (qCorrMatrix(_, _)),
    "q_agg_row" -> (qAggRow(_, _)),
    "q_agg_matrix" -> (qAggMatrix(_, _)),
    "q_profile" -> (qProfile(_, _)),
    "q_histogram" -> (qHistogram(_, _)),
    "q_table_checksum" -> (qTableChecksum(_, _)))

  /** q_corr_matrix oracle — generated from the same [[CorrCols]]/pair
    * list as the Spark plan so the double formulas stay token-identical.
    */
  private val corrOracle: String = {
    val pairs = for {
      (i, (_, a)) <- CorrCols.zipWithIndex.map(_.swap)
      (_, b) <- CorrCols.drop(i)
    } yield (a, b)
    def src(a: String) = CorrCols.find(_._2 == a).get._1
    // DECIMAL(19,4) (vs Spark's (18,4)) forces DuckDB's int128 multiply
    // path — both engines' decimal intermediates are EXACT either way;
    // the final double casts can differ by an ulp past 2^53 (see the
    // Spark-side comment), absorbed by the shared round(·, 6).
    val momentSums = (
      CorrCols.map { case (c, a) =>
        s"sum(CAST($c AS DECIMAL(19,4))) AS s_$a" } ++
      pairs.map { case (a, b) =>
        s"sum(CAST(${src(a)} AS DECIMAL(19,4)) * CAST(${src(b)} AS DECIMAL(19,4))) AS s_$a$b" })
      .mkString(",\n|    ")
    val dCols = (
      CorrCols.map { case (_, a) => s"CAST(s_$a AS DOUBLE) AS d_$a" } ++
      pairs.map { case (a, b) => s"CAST(s_$a$b AS DOUBLE) AS d_$a$b" })
      .mkString(",\n|    ")
    def varT(a: String) = s"sqrt(nd * d_$a$a - d_$a * d_$a)"
    val rows = pairs.filter { case (a, b) => a != b }.map { case (a, b) =>
      s"SELECT '${src(a)}' AS col_x, '${src(b)}' AS col_y,\n" +
        s"|    round((nd * d_$a$b - d_$a * d_$b) / (${varT(a)} * ${varT(b)}), 6) AS corr FROM d"
    }.mkString("\n|  UNION ALL\n|  ")
    s"""WITH s AS (SELECT count(*) AS n,
       |    $momentSums
       |  FROM lineitem),
       |d AS (SELECT CAST(n AS DOUBLE) AS nd,
       |    $dCols
       |  FROM s)
       |SELECT col_x, col_y, corr FROM (
       |  $rows)
       |ORDER BY col_x, col_y""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_dq_contract" ->
      """SELECT 0 AS check_id, 'orders_pk_unique' AS check_name,
        |  CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
        |  count(o_orderkey) - count(DISTINCT o_orderkey) = 0 AS pass
        |FROM orders
        |UNION ALL
        |SELECT 1, 'lineitem_fk_orders',
        |  CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT),
        |  count(*) FILTER (o_orderkey IS NULL) = 0
        |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT 2, 'l_quantity_not_null',
        |  CAST(count(*) - count(l_quantity) AS BIGINT),
        |  count(*) - count(l_quantity) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 3, 'l_discount_in_range',
        |  CAST(count(*) FILTER (l_discount < 0.0 OR l_discount > 1.0) AS BIGINT),
        |  count(*) FILTER (l_discount < 0.0 OR l_discount > 1.0) = 0
        |FROM lineitem
        |ORDER BY check_id""".stripMargin,
    "q_corr_matrix" -> corrOracle,
    "q_agg_row" ->
      s"""SELECT
         |  min(l_quantity) AS min_qty,
         |  max(l_quantity) AS max_qty,
         |  ${Q.sqlDsum("l_quantity")} AS sum_qty,
         |  ${Q.sqlDavg("l_quantity")} AS mean_qty,
         |  ${Q.sqlDvar("l_quantity")} AS var_qty,
         |  ${Q.sqlDstd("l_quantity")} AS std_qty,
         |  count(l_quantity) AS count_qty,
         |  product(l_quantity) AS prod_qty,
         |  min(l_extendedprice) AS min_price,
         |  max(l_extendedprice) AS max_price,
         |  ${Q.sqlDsum("l_extendedprice")} AS sum_price,
         |  ${Q.sqlDavg("l_extendedprice")} AS mean_price
         |FROM lineitem""".stripMargin,
    "q_profile" ->
      """WITH m AS (SELECT count(*) AS n_rows,
        |  count(l_quantity) AS nn_qty, count(DISTINCT l_quantity) AS nd_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  count(l_discount) AS nn_disc, count(DISTINCT l_discount) AS nd_disc,
        |  min(l_discount) AS min_disc, max(l_discount) AS max_disc,
        |  count(l_extendedprice) AS nn_price, count(DISTINCT l_extendedprice) AS nd_price,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem)
        |SELECT 'l_discount' AS "column", n_rows, nn_disc AS n_notnull,
        |  nd_disc AS n_distinct, min_disc AS vmin, max_disc AS vmax FROM m
        |UNION ALL SELECT 'l_extendedprice', n_rows, nn_price, nd_price,
        |  min_price, max_price FROM m
        |UNION ALL SELECT 'l_quantity', n_rows, nn_qty, nd_qty,
        |  min_qty, max_qty FROM m
        |ORDER BY "column"""".stripMargin,
    "q_histogram" ->
      s"""WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
         |  FROM lineitem),
         |x AS (SELECT l_extendedprice AS x, lo, (hi - lo) / $HistBins AS w
         |  FROM lineitem, b),
         |g AS (SELECT CASE WHEN w = 0 THEN 0
         |    ELSE least(CAST(floor((x - lo) / w) AS INTEGER), ${HistBins - 1}) END AS bucket,
         |    count(*) AS n, any_value(lo) AS flo, any_value(w) AS fw
         |  FROM x GROUP BY 1)
         |SELECT bucket, flo + bucket * fw AS b_lo,
         |  flo + (bucket + 1) * fw AS b_hi, n
         |FROM g ORDER BY bucket""".stripMargin,
    "q_table_checksum" ->
      s"""WITH h AS (SELECT
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || lang
         |      || '|' || source || '|' || text), 1, 15))::BIGINT % $ChkP AS h
         |  FROM documents)
         |SELECT count(*) AS n_rows,
         |  CAST(sum(h) % $ChkP AS BIGINT) AS checksum
         |FROM h""".stripMargin,
    "q_agg_matrix" ->
      s"""WITH m AS (SELECT
         |  CAST(min(l_quantity) AS DOUBLE) AS vmin,
         |  CAST(max(l_quantity) AS DOUBLE) AS vmax,
         |  ${Q.sqlDsum("l_quantity")} AS vsum,
         |  ${Q.sqlDavg("l_quantity")} AS vmean,
         |  ${Q.sqlDvar("l_quantity")} AS vvar,
         |  ${Q.sqlDstd("l_quantity")} AS vstd,
         |  CAST(count(l_quantity) AS DOUBLE) AS vcount,
         |  product(l_quantity) AS vprod
         |FROM lineitem)
         |SELECT 'count' AS agg, vcount AS value FROM m
         |UNION ALL SELECT 'max', vmax FROM m
         |UNION ALL SELECT 'mean', vmean FROM m
         |UNION ALL SELECT 'min', vmin FROM m
         |UNION ALL SELECT 'prod', vprod FROM m
         |UNION ALL SELECT 'std', vstd FROM m
         |UNION ALL SELECT 'sum', vsum FROM m
         |UNION ALL SELECT 'var', vvar FROM m
         |ORDER BY agg""".stripMargin)
}
