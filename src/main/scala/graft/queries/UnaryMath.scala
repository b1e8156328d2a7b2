package graft.queries

import graft.Tables
import graft.functions.GraftFunctions.erf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 unary math — `exp log sqrt sin cos tan asin acos atan
  * sinh cosh tanh erf` (`/root/reference/baloo/functions/unary.py:4-83`).
  *
  * All but `erf` are codegen'd builtins; `erf` is our custom
  * [[graft.functions.Erf]] Catalyst expression. Results are rounded to
  * 1e−4 for the oracle because libm implementations (JVM vs DuckDB's C
  * runtime) may differ in the last ulp; inputs here take only ~60
  * distinct values, so the rounding-boundary risk is nil. The oracle
  * spells erf with the SAME Abramowitz-Stegun 7.1.26 constants and
  * operation order as [[graft.functions.GraftMath.erf]].
  */
object UnaryMath extends QueryModule {

  def qUnaryMath(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"),
        round(exp(col("l_discount")), 4).as("exp_disc"),
        round(log(col("l_quantity")), 4).as("ln_qty"),
        round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
        round(sin(col("l_quantity")), 4).as("sin_qty"),
        round(cos(col("l_quantity")), 4).as("cos_qty"),
        round(tan(col("l_discount")), 4).as("tan_disc"),
        round(asin(col("l_discount")), 4).as("asin_disc"),
        round(acos(col("l_discount")), 4).as("acos_disc"),
        round(atan(col("l_quantity")), 4).as("atan_qty"),
        round(sinh(col("l_discount")), 4).as("sinh_disc"),
        round(cosh(col("l_discount")), 4).as("cosh_disc"),
        round(tanh(col("l_discount")), 4).as("tanh_disc"),
        round(erf(col("l_discount")), 4).as("erf_disc"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unary_math" -> (qUnaryMath(_, _)))

  /** DuckDB spelling of [[graft.functions.GraftMath.erf]] — keep the
    * constants and operation order in lock-step with the Scala impl.
    */
  private def sqlErf(x: String): String =
    s"""(CASE WHEN ($x) < 0.0 THEN -1.0 ELSE 1.0 END) *
       |    (1.0 - ((((1.061405429 * (1.0 / (1.0 + 0.3275911 * abs($x)))
       |      - 1.453152027) * (1.0 / (1.0 + 0.3275911 * abs($x)))
       |      + 1.421413741) * (1.0 / (1.0 + 0.3275911 * abs($x)))
       |      - 0.284496736) * (1.0 / (1.0 + 0.3275911 * abs($x)))
       |      + 0.254829592) * (1.0 / (1.0 + 0.3275911 * abs($x)))
       |      * exp(-abs($x) * abs($x)))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_unary_math" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
         |  round(exp(l_discount), 4) AS exp_disc,
         |  round(ln(l_quantity), 4) AS ln_qty,
         |  round(sqrt(l_quantity), 4) AS sqrt_qty,
         |  round(sin(l_quantity), 4) AS sin_qty,
         |  round(cos(l_quantity), 4) AS cos_qty,
         |  round(tan(l_discount), 4) AS tan_disc,
         |  round(asin(l_discount), 4) AS asin_disc,
         |  round(acos(l_discount), 4) AS acos_disc,
         |  round(atan(l_quantity), 4) AS atan_qty,
         |  round((exp(l_discount) - exp(-l_discount)) / 2.0, 4) AS sinh_disc,
         |  round((exp(l_discount) + exp(-l_discount)) / 2.0, 4) AS cosh_disc,
         |  round((exp(2.0 * l_discount) - 1.0) / (exp(2.0 * l_discount) + 1.0), 4) AS tanh_disc,
         |  round(${sqlErf("l_discount")}, 4) AS erf_disc
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin)
}
