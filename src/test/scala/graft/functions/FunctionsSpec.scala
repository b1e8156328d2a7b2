package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions.{erf, prod}
import org.apache.spark.sql.functions._

/** Custom Catalyst expression specs: graft_prod (DeclarativeAggregate)
  * and graft_erf (codegen'd UnaryExpression).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("prod multiplies, skips nulls, empty/all-null → null") {
    val df = Seq(Some(2.0), Some(3.0), None, Some(4.0)).toDF("x")
    assert(df.agg(prod(col("x"))).head().getDouble(0) == 24.0)
    assert(Seq.empty[Double].toDF("x").agg(prod(col("x"))).head().isNullAt(0))
    assert(Seq[Option[Double]](None, None).toDF("x")
      .agg(prod(col("x"))).head().isNullAt(0))
  }

  test("prod participates in grouped aggregation with partial merge") {
    val df = Seq((1, 2.0), (1, 3.0), (2, 5.0), (2, 7.0), (2, 2.0))
      .toDF("k", "x").repartition(4)
    val out = df.groupBy("k").agg(prod(col("x")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out == Map(1 -> 6.0, 2 -> 70.0))
  }

  test("prod accepts integer input through the registry cast") {
    val out = Seq(1L, 2L, 3L, 4L).toDF("x")
      .selectExpr("graft_prod(x) AS p").head().getDouble(0)
    assert(out == 24.0)
  }

  test("erf matches known values within the A&S 7.1.26 bound (1.5e-7)") {
    val cases = Map(0.0 -> 0.0, 0.5 -> 0.5204998778, 1.0 -> 0.8427007929,
      2.0 -> 0.9953222650, -1.0 -> -0.8427007929)
    val df = cases.keys.toSeq.toDF("x").select(col("x"), erf(col("x")).as("e"))
    df.collect().foreach { r =>
      val (x, e) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(e - cases(x)) < 1.5e-7, s"erf($x) = $e")
    }
  }

  test("erf is null-safe and works from SQL after registration") {
    val out = Seq(Some(1.0), None).toDF("x").selectExpr("graft_erf(x) AS e").collect()
    assert(math.abs(out(0).getDouble(0) - 0.8427007929) < 1.5e-7)
    assert(out(1).isNullAt(0))
  }
}
