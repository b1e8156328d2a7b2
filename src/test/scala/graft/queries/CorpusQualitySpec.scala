package graft.queries

import graft.SparkSpec
import graft.functions.GraftFunctions.spanhashes
import graft.functions.SpanHashMath
import org.apache.spark.sql.functions._

/** Corpus-quality suite specs: the SpanHashes expression's window math
  * and the repetition / mixture-weight invariants the driver queries
  * rely on.
  */
class CorpusQualitySpec extends SparkSpec {
  import spark.implicits._

  test("spanhashes: short string → empty; uniform string → one hash") {
    val rows = Seq("short", "a" * 40).toDF("text")
      .select(spanhashes(col("text")).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0).isEmpty)
    // every 32-char window of "aaaa…" is identical → exactly one
    // distinct hash
    assert(rows(1).length == 1)
  }

  test("spanhashes: ascending distinct, matches brute-force window hashes") {
    val s = "the quick brown fox jumps over the lazy dog repeatedly and often"
    val got = Seq(s).toDF("text")
      .select(spanhashes(col("text")).as("h"))
      .head().getSeq[Long](0)
    val brute = (0 to s.length - SpanHashMath.W).map { i =>
      (0 until SpanHashMath.W)
        .map(j => s.charAt(i + j).toLong * SpanHashMath.Pow(j))
        .sum % SpanHashMath.P
    }.distinct.sorted
    assert(got == brute)
    assert(got == got.distinct.sorted)
  }

  test("shared 32-char span across docs is detected; disjoint docs are not") {
    val span = "0123456789abcdefghijklmnopqrstuv" // exactly 32 chars
    assert(span.length == SpanHashMath.W)
    val docs = Seq(
      (1L, s"prefix one $span suffix alpha"),
      (2L, s"other start $span closing words"),
      (3L, "completely unrelated text with no overlap at all here ok"))
      .toDF("doc_id", "text")
    val hits = docs
      .select(col("doc_id"), explode(spanhashes(col("text"))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    // docs 1 and 2 share the span; doc 3 shares nothing
    assert(hits.count() >= 1)
    val sharedDocs = docs
      .select(col("doc_id"), explode(spanhashes(col("text"))).as("h"))
      .join(hits.select("h"), "h")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(sharedDocs == Set(1L, 2L))
  }

  test("repetition metrics on a degenerate all-same-word doc") {
    // 10 identical words: 1 distinct, dup_word_frac = 0.9, a single
    // bigram claims all 9 bigram slots
    val words = Seq.fill(10)("spam").mkString(" ")
    val df = Seq((0L, words)).toDF("doc_id", "text")
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_words", size(col("words")))
    val base = df.select(
      size(array_distinct(col("words"))).as("n_distinct"),
      col("n_words")).head()
    assert(base.getInt(0) == 1)
    assert(base.getInt(1) == 10)
    val bigrams = df.select(explode(expr(
      "transform(sequence(1, n_words - 1), i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"))
      .as("bg"))
    assert(bigrams.count() == 9)
    assert(bigrams.distinct().count() == 1)
  }

  test("mixture weights sum to ~1 and budgets never exceed the total") {
    val out = CorpusQuality.qMixWeights(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-9)
    val budget = rows.map(_.getAs[Long]("n_target")).sum
    assert(budget <= 100000L)
    // √-temperature flattens: a 4:1 count ratio compresses to a 2:1
    // weight ratio (√4 = 2), never the raw 4:1
    val byCount = rows.map(r => r.getAs[Long]("n_docs") -> r.getAs[Double]("weight"))
    val (nMax, wMax) = byCount.maxBy(_._1)
    val (nMin, wMin) = byCount.minBy(_._1)
    if (nMax > nMin)
      assert(wMax / wMin < nMax.toDouble / nMin,
        s"weight ratio ${wMax / wMin} not flattened vs count ratio ${nMax.toDouble / nMin}")
  }

  test("equal per-source counts → equal mixture weights") {
    import spark.implicits._
    // fixture with three sources of identical size; weights must all be
    // exactly equal (the quantized √count integers are identical)
    val docs = (0 until 30).map(i => (i.toLong, s"src${i % 3}", s"doc $i"))
      .toDF("doc_id", "source", "text")
    val out = CorpusQuality.mixWeights(docs).collect()
    val ws = out.map(_.getAs[Double]("weight")).toSeq
    assert(ws.length == 3 && ws.distinct.length == 1,
      s"equal counts must give equal weights, got $ws")
    // and a 4:1 fixture flattens to exactly 2:1 (√-temperature)
    val skewed = ((0 until 40).map(i => (i.toLong, "big", "x")) ++
      (0 until 10).map(i => (100L + i, "small", "x")))
      .toDF("doc_id", "source", "text")
    val w2 = CorpusQuality.mixWeights(skewed).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    assert(math.abs(w2("big") / w2("small") - 2.0) < 1e-5,
      s"4:1 counts must give ~2:1 weights, got ${w2("big") / w2("small")}")
  }

  test("quality gate thresholds are observed order statistics at the decile") {
    val out = QCache.qualityGate
    val n = out.length
    val dThr = out.head.getAs[Double]("d_thr")
    val wThr = out.head.getAs[Int]("w_thr")
    // percentile_disc picks an ACTUAL element, never an interpolation
    assert(out.exists(_.getAs[Double]("diversity") == dThr))
    assert(out.exists(_.getAs[Int]("n_words") == wThr))
    // ⌈0.1n⌉ rows sit at or below the decile threshold, so strictly
    // fewer than that are below it — the defining order-statistic bound
    assert(out.count(_.getAs[Double]("diversity") < dThr) < math.ceil(0.1 * n))
    assert(out.count(_.getAs[Int]("n_words") < wThr) < math.ceil(0.25 * n))
    // verdict column is consistent with its inputs row by row
    out.foreach { r =>
      val expect = r.getAs[Double]("diversity") >= dThr &&
        r.getAs[Int]("n_words") >= wThr
      assert(r.getAs[Boolean]("keep") == expect)
    }
  }

  test("self-repetition: repeated span flagged, unique text scores zero") {
    import spark.implicits._
    val para = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, para + " " + para + " " + para), // the same 60-char span 3×
      (2L, ('a' to 'z').mkString + ('A' to 'Z').mkString), // all unique
      (3L, "short")) // < 32 chars → filtered out
      .toDF("doc_id", "text")
    val out = CorpusQuality.selfrep(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val byId = out.map(r => r.getLong(0) -> r.getAs[Double]("selfrep_frac")).toMap
    assert(byId(1L) > 0.5, s"3x repeated paragraph must score high, got ${byId(1L)}")
    assert(byId(2L) == 0.0, "unique text must score zero")
    // windows accounting: n_windows = len - 31 exactly
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Int]("n_windows") == (para.length * 3 + 2) - 31)
  }

  test("BPE compression drops by exactly each merge's pair count") {
    val sf = "/root/testdata/sf0.001"
    val merges = CorpusQuality.qBpeMerges(spark, sf).collect()
      .map(r => r.getAs[Int]("round") ->
        ((r.getAs[String]("sym_a"), r.getAs[String]("sym_b"), r.getAs[Long]("n"))))
      .toMap
    val traj = CorpusQuality.qBpeCompression(spark, sf).collect()
      .sortBy(_.getAs[Int]("round"))
    // occurrences never change; a merge of a NON-self-overlapping pair
    // (a ≠ b) with count n removes exactly n symbols under leftmost
    // non-overlapping replace; a self-overlapping pair (a == b, counted
    // with overlaps) removes between ⌈n/2⌉ and n
    assert(traj.map(_.getAs[Long]("n_occ")).distinct.length == 1)
    traj.sliding(2).foreach { case Array(prev, cur) =>
      val r = cur.getAs[Int]("round")
      val (a, b, n) = merges(r)
      val drop = prev.getAs[Long]("n_symbols") - cur.getAs[Long]("n_symbols")
      if (a != b)
        assert(drop == n, s"round $r: symbol drop $drop != merge pair count $n")
      else
        assert(drop <= n && drop >= (n + 1) / 2,
          s"round $r: self-overlapping pair drop $drop outside [⌈$n/2⌉, $n]")
    }
  }

  test("bigram-LM micro-scores reproduce an exact BigInt brute force") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").toSeq)
    val bigrams = docs.flatMap { case (id, ws) =>
      ws.sliding(2).collect { case Seq(a, b) => (id, a, b) } }
    val cAb = bigrams.groupBy(t => (t._2, t._3)).view.mapValues(g => BigInt(g.length)).toMap
    val cl = bigrams.groupBy(_._2).view.mapValues(g => BigInt(g.length)).toMap
    val v = BigInt(docs.flatMap(_._2).distinct.length)
    // per-doc exact integer micro-probability sums — the query's scoring
    // function independently spelled with BigInt
    val want = bigrams.groupBy(_._1).view.mapValues { g =>
      val ms = g.map { case (_, a, b) =>
        ((cAb((a, b)) + 1) * BigInt(1000000000)) / (cl(a) + v) }
      (g.length.toLong, ms.sum.toLong, (ms.sum / BigInt(g.length)).toLong)
    }.toMap
    val got = CorpusQuality.qTextBigramScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("score"),
          r.getAs[Long]("mean_micro")))).toMap
    assert(got == want)
    // smoothing keeps every micro-probability strictly positive
    assert(got.values.forall(_._2 > 0))
  }

  private object QCache {
    lazy val qualityGate =
      CorpusQuality.qQualityGate(spark, "/root/testdata/sf0.001").collect()
  }

  test("spanhashesPos: positional brute-force parity; distinct-sorted ≡ spanhashes") {
    import graft.functions.GraftFunctions.spanhashesPos
    // includes a surrogate pair (𝄞) to pin code-point (not UTF-16) windows
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog repeatedly and often",
      "notes 𝄞 and more notes 𝄞 and yet more notes to pad past the window size",
      "short")
    val got = texts.toDF("text")
      .select(spanhashesPos(col("text")).as("h"), spanhashes(col("text")).as("d"))
      .collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    texts.zip(got).foreach { case (s, (pos, dis)) =>
      val cps = s.codePoints().toArray
      val brute = (0 to cps.length - SpanHashMath.W).map { i =>
        val h1 = (0 until SpanHashMath.W)
          .map(j => cps(i + j).toLong * SpanHashMath.Pow(j))
          .sum % SpanHashMath.P
        val h2 = (0 until SpanHashMath.W)
          .map(j => BigInt(cps(i + j).toLong) * SpanHashMath.Pow2(j))
          .sum % SpanHashMath.P2
        h1 * SpanHashMath.P2 + h2.toLong
      }
      assert(pos == brute, s"positional hashes for: $s")
      // family 1 is recoverable as DIV P2 and must match the narrow
      // distinct-set expression exactly
      assert(pos.map(_ / SpanHashMath.P2).distinct.sorted == dis,
        s"family-1 parity for: $s")
    }
  }

  test("substring runs: planted shared span found at its position; clean doc absent") {
    // 96-char span shared verbatim by docs 1 and 2 at different offsets.
    // Boundary chars around each occurrence DIFFER across docs ('<'/'>'
    // vs start-of-doc/'!') so no window straddling the span edge is
    // itself duplicated — the run must be exactly the planted copy.
    val span = "0123456789abcdefghijklmnopqrstuv" * 3
    val docs = Seq(
      (1L, s"intro text before the copy<$span>trailing words"),
      (2L, s"$span!different ending entirely here"),
      (3L, "no shared content in this document at all, just filler prose"))
      .toDF("doc_id", "text")
    val runs = CorpusQuality.substringRuns(docs, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(runs.map(_._1).toSet == Set(1L, 2L))
    val r1 = runs.find(_._1 == 1L).get
    val r2 = runs.find(_._1 == 2L).get
    // doc 2's copy starts at offset 0; doc 1's at its planted offset
    assert(r2._2 == 0L && r2._3 == 96L)
    assert(r1._2 == "intro text before the copy<".length.toLong && r1._3 == 96L)
  }

  test("substring cut: covered chars are the exact interval union, clean docs retained 1.0") {
    // two duplicated spans in doc 1 separated by a >32-char unique gap →
    // two runs whose char coverage must NOT double-count; every span
    // occurrence gets distinct boundary chars so coverage is exactly
    // the planted spans
    val a = "A" + ("0123456789abcdefghijklmnopqrstuv" * 2) // 65 chars
    val b = "B" + ("zyxwvutsrqponmlkjihgfedcba987654" * 2) // distinct 65 chars
    val gap = "this connecting passage is unique and well over thirty-two characters long"
    val docs = Seq(
      (1L, s"${a}x${gap}y$b"),
      (2L, s"left context<$a>right side"),
      (3L, s"other frame[$b]closing"),
      (4L, "entirely unique document with zero duplicated spans inside"))
      .toDF("doc_id", "text")
    val cut = CorpusQuality.substringCut(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1: both spans fully covered, gap untouched → 2 runs, 130 chars
    val n1 = 130 + 2 + gap.length
    assert(cut(1L) == ((2L, 130L, 1.0 - 130.0 / n1)))
    assert(cut(2L)._1 == 1L && cut(2L)._2 == 65L)
    assert(cut(4L) == ((0L, 0L, 1.0)))
  }

  test("substring rewrite: canonical occurrence intact, repeats cut, full copies emptied") {
    // 96 DISTINCT chars — an internally periodic span (e.g. s32×3) would
    // itself be keep-one-collapsed inside the canonical doc, correctly
    val span = (0 until 96).map(i => ('!' + i).toChar).mkString
    val twin = "the same entire document text repeated verbatim in both places ok"
    val docs = Seq(
      (1L, s"pre<$span>post"),          // canonical (min okey) — intact
      (2L, s"AA[$span]BB"),             // repeat — span cut, context kept
      (3L, "nothing shared with anyone here, just unique filler text"),
      (4L, twin),                        // canonical of the full-copy pair
      (5L, twin))                        // full copy — cut to empty
      .toDF("doc_id", "text")
    val got = CorpusQuality.substringRewrite(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((s"pre<$span>post".length.toLong,
      s"pre<$span>post".length.toLong, s"pre<$span>post")))
    assert(got(2L) == ((102L, 6L, "AA[]BB")))
    assert(got(3L)._1 == got(3L)._2) // untouched
    assert(got(4L) == ((twin.length.toLong, twin.length.toLong, twin)))
    assert(got(5L) == ((twin.length.toLong, 0L, "")))
    // retention: every DUPLICATED window hash survives in the cleaned
    // corpus — the keep-one guarantee (exact here because the canonical
    // docs carry no cuts; in general a canonical occurrence can lose
    // chars to an overlapping OTHER hash's cut interval — unique
    // straddling windows die with their context by design)
    val before = docs
      .select(col("doc_id"), explode(spanhashes(col("text"))).as("h"))
      .groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    val after = CorpusQuality.substringRewrite(docs)
      .select(explode(spanhashes(col("clean_text"))).as("h")).distinct()
    assert(before.join(after, Seq("h"), "left_anti").count() == 0)
  }

  test("q_dedup_keep_best: winner is the longest member (min id on ties) of its cluster") {
    val sf = "/root/testdata/sf0.001"
    val labels = Fingerprints.qDedupCluster(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val lens = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = labels.groupBy(_._2).view.mapValues { ms =>
      val members = ms.map(_._1)
      val best = members.map(lens).max
      (members.length.toLong, best, members.filter(lens(_) == best).min)
    }.toMap
    val got = Fingerprints.qDedupKeepBest(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    assert(want.nonEmpty) // the corpus does contain near-dup clusters
  }
}
