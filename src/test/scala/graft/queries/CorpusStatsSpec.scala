package graft.queries

import graft.SparkSpec

/** Invariant + brute-force parity specs for the corpus-statistics
  * additions: KS drift, per-source standardization, sparse cosine
  * similarity, and cluster-balanced resampling.
  */
class CorpusStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ks drift equals the brute-force two-sample statistic") {
    val row = CorpusStats.qKsDrift(spark, dir).collect().head
    val (na, nb, ksNum) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"),
      row.getAs[Long]("ks_num"))
    // brute force: collect both samples, max over all thresholds
    val docs = graft.Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_chars"))
    val a = docs.filter(_._1 == "src0").map(_._2).sorted
    val b = docs.filter(_._1 == "src1").map(_._2).sorted
    assert(a.length.toLong == na && b.length.toLong == nb)
    val thresholds = (a ++ b).distinct
    val expect = thresholds.map { t =>
      math.abs(a.count(_ <= t).toLong * nb - b.count(_ <= t).toLong * na)
    }.max
    assert(ksNum == expect)
    val ks = row.getAs[Double]("ks")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("standardize: counts preserved, per-source z sums to ~0, order-preserving") {
    val z = CorpusStats.qStandardize(spark, dir).collect()
    val docs = graft.Tables.documents(spark, dir).count()
    assert(z.length.toLong == docs)
    z.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val zs = rows.map(_.getAs[Double]("z"))
      assert(math.abs(zs.sum / zs.length) < 1e-3, s"$src mean z not ~0")
      // monotone: larger n_chars within a source never gets a smaller z
      val byLen = rows.sortBy(_.getAs[Long]("n_chars")).map(_.getAs[Double]("z"))
      assert(byLen.zip(byLen.tail).forall { case (x, y) => x <= y }, s"$src z not monotone")
    }
  }

  test("sparse doc similarity matches a brute-force set-cosine top-k") {
    val got = CorpusStats.qDocSimSparse(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("dot"), r.getAs[Long]("simq")))
    // brute force over the same posting index + df cut
    val posts = Fingerprints.postings(spark, dir)
      .select("doc_id", "h").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("h"))
    val df = posts.groupBy(_._2).view.mapValues(_.length).toMap
    val kept = posts.filter(p => df(p._2) >= 2 && df(p._2) <= 50)
    val byDoc = kept.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = byDoc.keys.toSeq.sorted
    val pairs = for {
      i <- ids; j <- ids if i < j
      dot = byDoc(i).intersect(byDoc(j)).size.toLong if dot > 0
    } yield (i, j, dot, dot * dot * 1000000L / (byDoc(i).size.toLong * byDoc(j).size))
    val expect = pairs.sortBy(p => (-p._4, p._1, p._2)).take(20)
    assert(got.toSeq == expect)
  }

  test("group OLS equals brute-force least squares on collected points") {
    val got = CorpusStats.qGroupOls(spark, dir).collect()
    val pts = graft.Tables.events(spark, dir)
      .selectExpr("event_type", "unix_micros(ts) DIV 86400000000L AS x",
        "CAST(round(value * 100) AS BIGINT) AS y").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("x"), r.getAs[Long]("y")))
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val g = pts.filter(_._1 == et)
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(p => p._2 * p._3).sum; val sxx = g.map(p => p._2 * p._2).sum
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("sx") == sx && r.getAs[Long]("sy") == sy)
      val sl = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(math.abs(r.getAs[Double]("slope") - sl) < 1e-6)
      val ic = (sy.toDouble - sl * sx.toDouble) / n.toDouble
      assert(math.abs(r.getAs[Double]("intercept") - ic) < 1e-4)
    }
  }

  test("PMI collocations equal the brute-force quantized-lift top-k") {
    val got = TextAnalysis.qCollocationsPmi(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_ab"), r.getAs[Long]("r")))
    val bgs = graft.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
      .flatMap { t => val w = t.split(" ", -1); w.zip(w.drop(1)) }
    val cAb = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cl = bgs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cr = bgs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = bgs.length.toLong
    val expect = cAb.toSeq.collect {
      case ((a, b), c) if c >= 5 => (a, b, c, c * n * 1000000L / (cl(a) * cr(b)))
    }.sortBy(p => (-p._4, p._1, p._2)).take(20)
    assert(got.toSeq == expect)
  }

  test("quantile normalization equals brute-force rank remap and preserves order") {
    val got = CorpusStats.qQuantileNorm(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("qn")))
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val globalSorted = docs.map(_._3).sorted
    val n = docs.length.toLong
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val ns = g.length.toLong
      g.sortBy(d => (d._3, d._1)).zipWithIndex.map { case (d, idx) =>
        val p = ((idx + 1) * n + ns - 1) / ns
        (d._1, d._2, d._3, globalSorted((p - 1).toInt))
      }
    }.sortBy(_._1)
    assert(got.toSeq == expect)
    // within a source, normalization preserves the length order
    got.groupBy(_._2).values.foreach { g =>
      val s = g.sortBy(r => (r._3, r._1)).map(_._4)
      assert(s.zip(s.tail).forall { case (a, b) => a <= b })
    }
  }

  test("source HHI equals brute-force share arithmetic and bounds hold") {
    val r = CorpusStats.qSourceHhi(spark, dir).collect().head
    val counts = graft.Tables.documents(spark, dir)
      .select("source").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = counts.values.sum
    val s2 = counts.values.map(c => c * c).sum
    assert(r.getAs[Long]("n_sources") == counts.size.toLong)
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("max_share_ppm") == counts.values.max * 1000000L / n)
    assert(r.getAs[Long]("hhi_ppm") == s2 * 1000000L / (n * n))
    assert(r.getAs[Long]("eff_sources_milli") == n * n * 1000L / s2)
    // bounds: uniform → hhi = 1/k; monopoly → 1. Effective ≤ actual.
    assert(r.getAs[Long]("hhi_ppm") >= 1000000L / counts.size - 1)
    assert(r.getAs[Long]("eff_sources_milli") <= counts.size * 1000L)
  }

  test("robust stats equal brute-force lower-median and MAD") {
    val got = CorpusStats.qRobustStats(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n"),
        r.getAs[Long]("med"), r.getAs[Long]("mad")))
    val docs = graft.Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_chars")))
    def lowerMed(xs: Seq[Long]): Long = xs.sorted.apply(((xs.length + 1) / 2) - 1)
    val expect = docs.groupBy(_._1).toSeq.map { case (src, g) =>
      val vals = g.map(_._2).toSeq
      val m = lowerMed(vals)
      (src, vals.length.toLong, m, lowerMed(vals.map(v => math.abs(v - m))))
    }.sortBy(_._1)
    assert(got.toSeq == expect)
  }

  test("chi2 association equals brute-force contingency arithmetic") {
    val got = CorpusStats.qChi2Assoc(spark, dir).collect()
    val docs = graft.Tables.documents(spark, dir)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val rm = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cells = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.length == cells.size)
    got.foreach { r =>
      val (src, lg) = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val o = cells((src, lg))
      assert(r.getAs[Long]("o") == o)
      assert(r.getAs[Long]("e6") == rm(src) * cm(lg) * 1000000L / n)
      val a = BigInt(n * o - rm(src) * cm(lg))
      assert(BigInt(r.getAs[Long]("chi6")) == a * a * 1000000 / (BigInt(n) * rm(src) * cm(lg)))
    }
  }

  test("event paths equal brute-force trigram mining") {
    val got = Windows.qEventPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n_occ"), r.getAs[Long]("n_users")))
    val evs = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val tris = evs.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val seq = g.sortBy(e => (e._2, e._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).map(t => (uid, (t(0), t(1), t(2))))
    }
    val expect = tris.groupBy(_._2).toSeq.map { case (p, occ) =>
      (p._1, p._2, p._3, occ.length.toLong, occ.map(_._1).distinct.length.toLong)
    }.sortBy(p => (-p._4, p._1, p._2, p._3)).take(15)
    assert(got.toSeq == expect)
  }

  test("cluster balance: quota respected, ranks contiguous, admission deterministic") {
    val rows = Similarity.qClusterBalance(spark, dir).collect()
    rows.groupBy(_.getAs[Long]("cid")).foreach { case (cid, members) =>
      val rns = members.map(_.getAs[Int]("rn")).sorted
      assert(rns.length <= 25, s"cluster $cid over quota")
      assert(rns.toSeq == (1 to rns.length), s"cluster $cid ranks not contiguous")
      val cs = members.map(_.getAs[Long]("c_size")).distinct
      assert(cs.length == 1 && cs.head >= rns.length)
    }
    // deterministic under re-run
    val again = Similarity.qClusterBalance(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
