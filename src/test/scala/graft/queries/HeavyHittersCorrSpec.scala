package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts for the two-phase heavy hitters and the one-pass
  * correlation matrix that the driver's oracle compare can't state:
  * pigeonhole completeness (≡ naive groupBy under any partitioning) and
  * agreement with Spark's own `corr` estimator.
  */
class HeavyHittersCorrSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two-phase heavy hitters ≡ naive full groupBy, under any partitioning") {
    val naive = {
      val bgs = graft.Tables.documents(spark, sf)
        .select(split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(words) - 2), " +
            "i -> concat(words[i], ' ', words[i + 1]))")).as("bg"))
      val total = bgs.count()
      bgs.groupBy("bg").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 1000 > total)
        .orderBy(col("cnt").desc, col("bg"))
        .collect().toSeq
    }
    assert(naive.nonEmpty, "fixture must produce heavy hitters")
    val twoPhase = TextAnalysis.qHeavyHitters(spark, sf).collect().toSeq
    assert(twoPhase == naive)
    // the phase-1 candidate threshold depends on the partition count;
    // the exact confirm must erase that dependence
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      Seq("1", "7").foreach { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p)
        assert(TextAnalysis.qHeavyHitters(spark, sf).collect().toSeq == naive,
          s"heavy hitters changed at shuffle.partitions=$p")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("every reported heavy hitter exceeds the support threshold; none missed") {
    val bgsTotal = graft.Tables.documents(spark, sf)
      .select(greatest(size(split(col("text"), " ")) - 1, lit(0)).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val r = TextAnalysis.qHeavyHitters(spark, sf).collect()
    assert(r.forall(_.getLong(1) * 1000 > bgsTotal))
    // counts are in (desc, bg asc) total order
    val pairs = r.map(x => (-x.getLong(1), x.getString(0))).toSeq
    assert(pairs == pairs.sorted)
  }

  test("one-pass exact-decimal corr matrix agrees with Spark's corr estimator") {
    val got = Aggregations.qCorrMatrix(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(got.size == 6)
    val li = graft.Tables.lineitem(spark, sf)
    got.keys.foreach { case (a, b) =>
      val want = li.agg(corr(col(a), col(b))).collect()(0).getDouble(0)
      // the query publishes round(corr, 6) — the cross-engine grain for
      // wide-decimal→double casts past 2^53 — so agreement with the
      // unrounded estimator is to half that grain
      assert(math.abs(got((a, b)) - want) <= 5e-7,
        s"corr($a,$b): ${got((a, b))} vs Spark's $want")
    }
    // correlation is bounded; the synthetic generator draws the four
    // measures independently, so no pair should look strongly coupled
    assert(got.values.forall(v => v >= -1.0 && v <= 1.0))
    assert(got.values.forall(v => math.abs(v) < 0.5))
  }

  test("BM25 micro-scores reproduce an exact BigInt brute force") {
    val terms = Seq("customer", "join", "window")
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").toSeq)
    val n = BigInt(docs.length)
    val tl = BigInt(docs.map(_._2.length.toLong).sum)
    val dfT = terms.map(t =>
      t -> BigInt(docs.count(_._2.contains(t)))).toMap
    // per-doc exact integer micro-score sum — the query's documented
    // scoring function, independently spelled with BigInt (no DECIMAL,
    // no DIV, no engine arithmetic)
    val want = docs.flatMap { case (id, words) =>
      val dl = BigInt(words.length.toLong)
      val scores = terms.flatMap { t =>
        val tf = BigInt(words.count(_ == t).toLong)
        if (tf == 0) None
        else Some(((2 * n - 2 * dfT(t) + 1) * 22 * tf * tl * 1000000) /
          ((2 * dfT(t) + 1) * (10 * tl * tf + 3 * tl + 9 * dl * n)))
      }
      if (scores.isEmpty) None
      else Some(id -> (scores.size.toLong, scores.sum.toLong))
    }.toMap
    val topWant = want.toSeq.map { case (id, (nh, s)) => (id, nh, s) }
      .sortBy { case (id, _, s) => (-s, id) }.take(10)
    val got = TextAnalysis.qBm25Search(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("score"))).toSeq
    assert(got == topWant, s"got $got\nwant $topWant")
    // saturation sanity: every score is positive and bounded by the
    // zero-length-normalization ceiling 10^6 · idf_max · (k1+1)/1
    assert(got.forall(_._3 > 0))
  }

  test("multi-query BM25: query 0 projects to exactly the single-query ranking") {
    // MultiQueries(0) is Bm25Terms verbatim, so the N-query pass must
    // reproduce q_bm25_search's ranking as its query_id = 0 slice —
    // the "adding queries never perturbs existing rankings" contract.
    val single = TextAnalysis.qBm25Search(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("score"))).toSeq
    val multi = TextAnalysis.qBm25Multi(spark, sf).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("score"))).toSeq
    assert(multi == single, s"multi q0 $multi\nsingle $single")
    // every query returns a full (or corpus-exhausting) ranked page with
    // contiguous ranks from 1
    val byQ = TextAnalysis.qBm25Multi(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"query $q ranks $ranks")
    }
  }

  test("hybrid search: results come from the BM25 candidate set, reranked by exact cosine") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cand = TextAnalysis.bm25Scores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .sortBy { case (id, s) => (-s, id) }.take(50)
    val candIds = cand.map(_._1).toSet
    val got = TextAnalysis.qHybridSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length <= 10)
    // stage-1 containment and the query doc's self-exclusion
    assert(got.forall(r => candIds.contains(r._1)))
    assert(!got.exists(_._1 == 0L))
    // rerank order: non-increasing (cos, bm25) with doc_id tiebreak
    got.sliding(2).foreach {
      case Array((ida, ba, ca), (idb, bb, cb)) =>
        assert(ca > cb || (ca == cb && (ba > bb || (ba == bb && ida < idb))))
      case _ =>
    }
    // cosine of quantized unit-ish vectors stays in [-1, 1] + slack
    assert(got.forall(r => r._3 >= -1.000001 && r._3 <= 1.000001))
    // exact-cosine recompute for the winner, straight from the parquet
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // Spark SQL round() is HALF_UP (away from zero), unlike math.round
    // which sends negative halves toward +∞ — and the quantizer DOES
    // round values ending in .5 when floats scale by 2^20
    def qv(id: Long): Array[Long] = emb(id).map(x =>
      java.math.BigDecimal.valueOf(x.toDouble * 1048576.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val q0 = qv(0L)
    got.foreach { case (id, _, c) => assert(c == cos(q0, qv(id)), s"doc $id") }
  }
}
