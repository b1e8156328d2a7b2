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

  test("q_quantile_sketch: buckets merge by sum (split ∪ merge ≡ whole); error ≤ W/2") {
    // Mergeability — the sketch's 100 TB contract: per-shard bucket
    // tables combine by per-bucket count SUM into exactly the
    // whole-corpus buckets (the quantile analog of the HLL max-merge).
    val ev = Tables.events(spark, sf).select("event_type", "value")
    def buckets(df: org.apache.spark.sql.DataFrame) =
      GroupBys.quantileBuckets(df).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = buckets(ev)
    val a = buckets(ev.filter(expr("CAST(value * 100 AS BIGINT) % 2 = 0")))
    val b = buckets(ev.filter(expr("CAST(value * 100 AS BIGINT) % 2 <> 0")))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "merged half-buckets differ from the one-pass buckets")
    // the structural error bound: the elected bucket CONTAINS the exact
    // rank element, so |est − exact| ≤ W/2 (= 1.25 value units) at every
    // reported quantile of every group — not a tolerance, a guarantee
    val rows = GroupBys.qQuantileSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(3, 6, 9).foreach { errIdx => // err_p50, err_p90, err_p99
        assert(r.getDouble(errIdx) <= 1.25 + 1e-9,
          s"${r.getString(0)}: err column $errIdx = ${r.getDouble(errIdx)} > W/2")
      }
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
