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

  test("q_hll_distinct: registers merge by max (split ∪ merge ≡ whole); estimate within 5%") {
    // The sketch's 100 TB contract is MERGEABILITY: per-shard register
    // tables combine by element-wise max into exactly the whole-corpus
    // registers — replay the register build over two disjoint halves
    // and assert the merged registers equal the one-pass registers.
    import graft.queries.{Fingerprints => F}
    val ev = Tables.events(spark, sf).select("event_type", "user_id")
    def registers(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"),
        expr(F.hashOfSql("CAST(user_id AS STRING)")).as("h"))
      .select(col("event_type"),
        expr("CAST(h % 256 AS INT)").as("reg"), expr("h DIV 256").as("w"))
      .select(col("event_type"), col("reg"),
        expr("CASE WHEN w = 0 THEN 53 ELSE 53 - length(conv(w, 10, 2)) END").as("rho"))
      .groupBy("event_type", "reg").agg(max("rho").as("m"))
    val whole = registers(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val a = registers(ev.filter(col("user_id") % 2 === 0)).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val b = registers(ev.filter(col("user_id") % 2 =!= 0)).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
    assert(merged == whole, "merged half-registers differ from the one-pass registers")
    // and the estimate the query emits is within sketch accuracy
    GroupBys.qHllDistinct(spark, sf).collect().foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2))
      assert(math.abs(est - exact) / exact <= 0.05,
        s"${r.getString(0)}: HLL $est vs exact $exact")
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
