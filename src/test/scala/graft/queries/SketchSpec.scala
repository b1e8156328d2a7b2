package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Error-bound evidence for the APPROXIMATE at-scale alternatives the
  * exact queries document (`approx_count_distinct` for the nunique
  * Expand, `approx_percentile` for unbounded-domain describe): the
  * sketches must land within their published error on this corpus, or
  * the "swap in the sketch at 100 TB" advice is hollow.
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact on every profiled column") {
    val li = Tables.lineitem(spark, sf)
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")) {
      val row = li.agg(
        countDistinct(col(c)).as("exact"),
        approx_count_distinct(col(c), 0.02).as("approx")).head()
      val (exact, approx) = (row.getLong(0), row.getLong(1))
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"$c: HLL $approx vs exact $exact")
    }
  }

  test("approx_percentile within rank tolerance of the exact order statistic") {
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    val sorted = li.select("l_extendedprice").collect()
      .map(_.getDouble(0)).sorted
    for (p <- Seq(0.25, 0.5, 0.75, 0.99)) {
      val got = li.agg(
        expr(s"approx_percentile(l_extendedprice, $p, 1000)")).head().getDouble(0)
      // rank of the sketch's answer must be within n/1000 + 1 of the
      // target rank (the accuracy contract of the KLL-style sketch)
      val rank = sorted.count(_ <= got)
      val target = p * n
      assert(math.abs(rank - target) <= n / 1000 + 1,
        s"p=$p: sketch value $got at rank $rank, target $target")
    }
  }
}
