package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts for the pandas-API extension queries — the
  * invariants the driver's hash-compare can't state: qcut's partition
  * property, cumulative-window prefix identities, idxmax tie-breaking,
  * crosstab margins, concat null-padding, and clip bound saturation.
  */
class PandasExtSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("qcut buckets partition the domain in order and conserve counts") {
    val rows = PandasExt.qQcutBins(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
    assert(rows.map(_.getInt(0)).forall(b => b >= 0 && b <= 3))
    // ordered, non-overlapping value ranges: max(bucket i) < min(bucket i+1)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getInt(3) < b.getInt(2),
        s"bucket ranges overlap: ${a.getInt(3)} !< ${b.getInt(2)}")
      case _ =>
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.Tables.part(spark, sf).count())
    // quantile balance: no bucket holds more than half the rows (p_size
    // is near-uniform over 1..50, so 4 buckets are roughly even)
    assert(rows.map(_.getLong(1)).max <= total / 2)
  }

  test("cumulative ops: prefix identities per customer") {
    val r = PandasExt.qCumOps(spark, sf)
    // final running sum per customer == the customer's exact total
    val lastRow = r.groupBy("o_custkey")
      .agg(max(struct(col("o_orderkey"), col("run_sum"))).as("m"))
      .select(col("o_custkey"), col("m.run_sum").as("last_sum"))
    val totals = graft.Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(Q.dsum(col("o_totalprice")).as("tot"))
    val joined = lastRow.join(totals, "o_custkey")
    assert(joined.filter(abs(col("last_sum") - col("tot")) > 1e-9).count() == 0)
    // run_max is nondecreasing and run_min nonincreasing along o_orderkey
    val viol = r.withColumn("pm",
        lag("run_max", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderkey")))
      .withColumn("pn",
        lag("run_min", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderkey")))
      .filter(col("pm").isNotNull &&
        (col("run_max") < col("pm") || col("run_min") > col("pn")))
    assert(viol.count() == 0)
  }

  test("idxmax/idxmin break ties to the smallest label") {
    val docs = graft.Tables.documents(spark, sf)
    val got = PandasExt.qIdxmax(spark, sf).collect()
    got.foreach { row =>
      val lang = row.getString(0)
      val slice = docs.filter(col("lang") === lang)
        .select("doc_id", "n_chars").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val mx = slice.map(_._2).max
      val mn = slice.map(_._2).min
      assert(row.getLong(1) == mx)
      assert(row.getLong(2) == slice.filter(_._2 == mx).map(_._1).min,
        s"idxmax must take the smallest doc_id among ties for $lang")
      assert(row.getLong(3) == mn)
      assert(row.getLong(4) == slice.filter(_._2 == mn).map(_._1).min)
    }
  }

  test("describe: percentiles are exact order statistics of the column") {
    val got = PandasExt.qDescribe(spark, sf).collect()
      .map(r => r.getString(1) -> (r.getDouble(2), r.getDouble(3))).toMap
    val qs = graft.Tables.lineitem(spark, sf)
      .select("l_quantity").collect().map(_.getDouble(0)).sorted
    val ds = graft.Tables.lineitem(spark, sf)
      .select("l_discount").collect().map(_.getDouble(0)).sorted
    // percentile_disc semantics: smallest v with cdf(v) >= p
    def pdisc(v: Array[Double], p: Int): Double =
      v((v.length * p + 99) / 100 - 1)
    for ((label, p) <- Seq("25%" -> 25, "50%" -> 50, "75%" -> 75)) {
      assert(got(label)._1 == pdisc(qs, p), s"quantity $label")
      assert(got(label)._2 == pdisc(ds, p), s"discount $label")
    }
    assert(got("count")._1 == qs.length.toDouble)
    assert(got("min")._1 == qs.head && got("max")._1 == qs.last)
  }

  test("duplicated flag ≡ key multiplicity > 1, and clip saturates bounds") {
    val dup = PandasExt.qDuplicated(spark, sf)
    val recount = dup.groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("c"), first("is_dup").as("f"),
        countDistinct("is_dup").as("nf"))
    // the flag is constant per key and equals (multiplicity > 1)
    assert(recount.filter(col("nf") =!= 1).count() == 0)
    assert(recount.filter((col("c") > 1) =!= col("f")).count() == 0)

    val clip = PandasExt.qClip(spark, sf).collect()
    val raw = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(Q.dsum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    clip.foreach { row =>
      val (rawSum, n) = raw(row.getString(0))
      assert(row.getLong(4) == n)
      // clipping moved the sum only if some row hit a bound, and the
      // clipped sum stays within [5000n, 50000n]
      assert(row.getDouble(1) >= 5000.0 * n - 1e-6)
      assert(row.getDouble(1) <= 50000.0 * n + 1e-6)
      if (row.getLong(2) == 0 && row.getLong(3) == 0)
        assert(math.abs(row.getDouble(1) - rawSum) < 1e-6)
    }
  }

  test("crosstab margins reconcile and get_dummies rows are one-hot") {
    val ct = PandasExt.qCrosstab(spark, sf).collect()
    ct.foreach { r =>
      val cells = (1 to 5).map(r.getLong)
      assert(cells.sum == r.getLong(6), "row total must equal cell sum")
    }
    assert(ct.map(_.getLong(6)).sum ==
      graft.Tables.documents(spark, sf).count())

    val gd = PandasExt.qGetDummies(spark, sf).collect()
    assert(gd.length == 25)
    gd.foreach { r =>
      assert((2 to 6).map(r.getInt).sum == 1, "exactly one indicator set")
    }
  }

  test("concat outer null-pads exactly the missing side's columns") {
    val cc = PandasExt.qConcatOuter(spark, sf)
    val nCust = graft.Tables.customer(spark, sf).count()
    val nSupp = graft.Tables.supplier(spark, sf).count()
    assert(cc.count() == nCust + nSupp)
    assert(cc.filter(col("origin") === "cust" && col("nationkey").isNotNull)
      .count() == 0)
    assert(cc.filter(col("origin") === "supp" && col("segment").isNotNull)
      .count() == 0)
    assert(cc.filter(col("bal").isNull).count() == 0)
  }

  test("pct_change: first observation per user is null, arithmetic holds") {
    val pc = PandasExt.qPctChange(spark, sf)
    val firstNull = pc.groupBy("user_id").agg(count(lit(1)).as("n"),
      sum(when(col("pct").isNull, 1).otherwise(0)).as("nulls"))
    // at least one null per user (the first row; more only if a zero or
    // repeated-null guard fired — values are continuous so expect exactly 1)
    assert(firstNull.filter(col("nulls") < 1).count() == 0)
    // rank_pct: percent_rank bounded, dense_rank contiguous from 1
    val rp = PandasExt.qRankPct(spark, sf)
    assert(rp.filter(col("prank") < 0.0 || col("prank") > 1.0).count() == 0)
    val perSeg = rp.groupBy("c_mktsegment")
      .agg(min("drank").as("lo"), max("drank").as("hi"),
        countDistinct("drank").as("nd"))
    assert(perSeg.filter(col("lo") =!= 1).count() == 0)
    assert(perSeg.filter(col("hi") =!= col("nd")).count() == 0,
      "dense ranks must be contiguous")
  }

  test("merge indicator categories reconcile with both side cardinalities; combine_first patches only nulls") {
    val sf = "/root/testdata/sf0.001"
    val mi = PandasExt.qMergeIndicator(spark, sf)
      .groupBy("_merge").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mi.keySet == Set("both", "left_only", "right_only"))
    val nAct = graft.Tables.events(spark, sf).select("user_id").distinct().count()
    val nCrm = graft.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 3 =!= 0).count()
    assert(mi("both") + mi("left_only") == nAct)
    assert(mi("both") + mi("right_only") == nCrm)
    val cf = PandasExt.qCombineFirst(spark, sf).collect()
    val bal = graft.Tables.customer(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        ((r.getAs[Double]("c_acctbal"), r.getAs[String]("c_mktsegment")))).toMap
    cf.foreach { r =>
      val (key, b) = (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      val (rawBal, rawSeg) = bal(key)
      if (rawBal >= 0) {          // df1 non-null wins everywhere
        assert(b.contains(rawBal) && r.getString(2) == rawSeg)
      } else if (key % 2 == 0) {  // patched from df2
        assert(b.contains(rawBal) && r.getString(2) == rawSeg)
      } else {                    // no donor: hole survives
        assert(b.isEmpty && r.getString(2) == rawSeg)
      }
    }
  }

  test("q_rolling_corr equals the Pearson formula recomputed per user over 7-pair frames") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts_ns", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = events.groupBy(_._2).iterator.flatMap { case (_, evs) =>
      val seq = evs.sortBy(e => (e._3, e._1))
      val cents = seq.map(e => math.round(e._4 * 100))
      // pairs (x_i, y_i = x_{i-1}); full 7-pair trailing frames only
      val pairs = (1 until seq.length).map(i => (seq(i)._1, cents(i), cents(i - 1)))
      pairs.indices.drop(6).map { j =>
        val w = pairs.slice(j - 6, j + 1)
        val (sx, sy) = (w.map(_._2).sum, w.map(_._3).sum)
        val sxy = w.map(p => p._2 * p._3).sum
        val sxx = w.map(p => p._2 * p._2).sum
        val syy = w.map(p => p._3 * p._3).sum
        val den = math.sqrt((7L * sxx - sx * sx).toDouble) *
          math.sqrt((7L * syy - sy * sy).toDouble)
        w(6)._1 -> (if (den == 0.0) None
          else Some((7L * sxy - sx * sy).toDouble / den))
      }
    }.toMap
    val got = PandasExt.qRollingCorr(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.size == want.size)
    want.foreach { case (id, w) => assert(got(id) == w, s"event $id") }
    // correlations are well-defined and bounded
    assert(got.values.flatten.forall(c => c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
  }

  test("q_ewm equals the pandas adjust-mode formula recomputed per user (BigInt)") {
    val sf = "/root/testdata/sf0.001"
    // per-user event sequence in the query's order
    val events = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts_ns", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val K = 16
    val want: Map[Long, Double] = events.groupBy(_._2).iterator.flatMap {
      case (_, evs) =>
        val seq = evs.sortBy(e => (e._3, e._1))
        val cents = seq.map(e => BigInt(math.round(e._4 * 100)))
        seq.zipWithIndex.map { case (e, i) =>
          val ks = 0 until math.min(i + 1, K)
          val num = ks.map(k => cents(i - k) * BigInt(1L << (K - 1 - k))).sum
          val den = BigInt(100) * ks.map(k => BigInt(1L << (K - 1 - k))).sum
          e._1 -> (num.toDouble / den.toDouble)
        }
    }.toMap
    // pandas contract: for i < K the truncation is inert, so those rows
    // also equal the untruncated ewm(alpha=.5, adjust=True).mean()
    val got = PandasExt.qEwm(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.size == want.size)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"event $id: ${got(id)} != $w")
    }
  }
}
