package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts for the resample / global-rank / paragraph-dedup
  * queries that the driver's oracle hash-compare can't state directly:
  * grid density, fill totality, rank bijectivity, and reassembly
  * losslessness.
  */
class ResampleRankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("interval union: sweep-line islands reconcile with brute force") {
    import org.apache.spark.sql.functions._
    val span = 30L * 1000000L
    val got = Windows.qIntervalUnion(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    // brute-force per user: merge sorted intervals in driver code
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    evs.foreach { case (u, starts) =>
      var islands = 0; var covered = 0L
      var curStart = -1L; var curEnd = -1L
      starts.foreach { t =>
        if (curEnd < 0 || t > curEnd) {
          if (curEnd >= 0) { covered += curEnd - curStart; islands += 1 }
          curStart = t; curEnd = t + span
        } else curEnd = math.max(curEnd, t + span)
      }
      covered += curEnd - curStart; islands += 1
      assert(got(u) == ((islands.toLong, covered)), s"user $u")
    }
    // structural sanity: covered time never exceeds events × span and
    // never undershoots a single span
    got.values.foreach { case (n, c) =>
      assert(n >= 1L && c >= span)
    }
  }

  test("resample grid is dense per user and forward-fill is total") {
    val r = Windows.qEventsResample(spark, sf).collect()
    assert(r.nonEmpty)
    // dense hourly grid: per user, row count == span hours + 1, and
    // consecutive buckets differ by exactly 1 hour
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val hs = rows.map(_.getTimestamp(1).getTime).sorted
      val hours = (hs.last - hs.head) / 3600000L + 1
      assert(hs.length.toLong == hours, s"grid has holes: ${hs.length} vs $hours")
      hs.sliding(2).foreach {
        case Array(a, b) => assert(b - a == 3600000L)
        case _ =>
      }
    }
    // first bucket per user is observed (grid starts at min observed
    // hour), so the forward-fill never leaves a null
    assert(r.forall(!_.isNullAt(3)), "value_ffill must be total")
    // ffill carries the last non-null observation
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      var lastSeen: Option[Double] = None
      rows.sortBy(_.getTimestamp(1).getTime).foreach { row =>
        if (!row.isNullAt(2)) lastSeen = Some(row.getDouble(2))
        assert(row.getDouble(3) == lastSeen.get)
      }
    }
  }

  test("resample observed buckets equal a direct hourly aggregate") {
    val r = Windows.qEventsResample(spark, sf)
      .filter(col("avg_value").isNotNull)
      .select("user_id", "h", "avg_value").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1), x.getDouble(2))).toSet
    val direct = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(Q.davg(col("value")).as("avg_value")).collect()
      .map(x => (x.getLong(0), x.getTimestamp(1), x.getDouble(2))).toSet
    assert(r == direct)
  }

  test("global rank is the bijective 1..n rank of the total order") {
    val r = Positional.qRankGlobal(spark, sf).collect()
    val n = r.length
    assert(r.map(_.getLong(2)).toSeq == (1L to n.toLong), "rnk must be 1..n")
    // rnk order must equal the (n_chars desc, doc_id asc) total order
    val sorted = r.sortBy(x => (-x.getLong(1), x.getLong(0))).map(_.getLong(0)).toSeq
    assert(r.sortBy(_.getLong(2)).map(_.getLong(0)).toSeq == sorted)
    // dense rank increments exactly on value change, starting at 1
    val byRank = r.sortBy(_.getLong(2))
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        val expectStep = if (b.getLong(1) == a.getLong(1)) 0L else 1L
        assert(b.getLong(3) - a.getLong(3) == expectStep)
      case _ =>
    }
    assert(byRank.head.getLong(3) == 1L)
    // percent_rank endpoints
    assert(byRank.head.getDouble(4) == 0.0)
    assert(byRank.last.getDouble(4) == 1.0)
  }

  test("paragraph dedup reassembly is lossless for untouched documents") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), md5(col("text")).as("orig_hash"),
        length(col("text")).as("orig_len"))
    val r = Dedup.qDedupParagraph(spark, sf)
    val joined = r.join(docs, "doc_id")
      .select("doc_id", "n_kept", "clean_hash", "n_chars_clean", "orig_hash", "orig_len")
      .collect()
    assert(joined.nonEmpty)
    var untouched = 0
    joined.foreach { row =>
      val (cleanLen, origLen) = (row.getInt(3), row.getInt(5))
      assert(cleanLen <= origLen)
      if (cleanLen == origLen) {
        // nothing excised → rebuilt text must be byte-identical
        assert(row.getString(2) == row.getString(4),
          s"doc ${row.getLong(0)}: reassembly not lossless")
        untouched += 1
      }
    }
    // the synthetic corpus has both untouched and trimmed documents
    assert(untouched > 0 && untouched < joined.length)
  }

  test("paragraph dedup keeps exactly one occurrence of every distinct segment") {
    // total kept segments across the corpus == number of distinct
    // segment strings (first-occurrence-wins keeps one per distinct)
    val kept = Dedup.qDedupParagraph(spark, sf)
      .agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctSegs = graft.Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("words"))
      .select(explode(expr(
        "transform(sequence(0, greatest(cast(ceil(size(words) / 10.0) as int), 1) - 1), " +
          "i -> array_join(slice(words, i * 10 + 1, 10), ' '))")).as("seg"))
      .distinct().count()
    assert(kept == distinctSegs)
  }
}
