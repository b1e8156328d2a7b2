package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's own published examples replayed through the graft
  * API — the literal "a user of the reference could switch" check.
  *
  * Part 1 replays the `DataFrame` doctest sequence
  * (`/root/reference/baloo/core/frame.py:33-123`) value for value; the
  * single deliberate deviation is missing data: the reference's −999
  * sentinel (`doc/source/intro.rst:75-84`) is SQL NULL here (SURVEY.md
  * §1.3 design decision), so `dropna`/`fillna` act on NULLs.
  *
  * Part 2 replays the README benchmark pipeline
  * (`/root/reference/README.md:20-27`, `benchmarks/run.py:12-19`) on a
  * small deterministic frame with hand-computed expectations.
  */
class MigrationSpec extends SparkSpec {
  import spark.implicits._

  private def doctestFrame: BalooFrame = new BalooFrame(
    Seq((0L, 5L, 1L), (1L, 6L, 0L), (2L, 7L, 2L)).toDF("idx", "a", "b"),
    Seq("idx"))

  private def rows(bf: BalooFrame, cols: String*): Seq[Seq[Any]] =
    bf.toDF.orderBy("idx").select(cols.map(col): _*)
      .collect().map(_.toSeq.toList).toList

  test("frame.py doctest: construction, broadcast arithmetic, agg matrix") {
    val df = doctestFrame
    assert(df.columns == Seq("a", "b"))
    assert(df.toDF.count() == 3)
    // df * 2
    assert(rows(df * 2.0, "a", "b") ==
      Seq(Seq(10.0, 2.0), Seq(12.0, 0.0), Seq(14.0, 4.0)))
    // df * [2, 3] — one scalar per column
    assert(rows(df * Seq(2.0, 3.0), "a", "b") ==
      Seq(Seq(10.0, 3.0), Seq(12.0, 0.0), Seq(14.0, 6.0)))
    // df.min() / df.mean() — per-column agg row, f64 convention
    val mins = df.aggAll("min").head()
    assert(mins.getDouble(0) == 5.0 && mins.getDouble(1) == 0.0)
    val means = df.aggAll("mean").head()
    assert(means.getDouble(0) == 6.0 && means.getDouble(1) == 1.0)
    // df.agg(['var', 'count']) — matrix keyed by agg name
    val m = df.agg(Seq("var", "count")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m("var") == ((1.0, 1.0)))
    assert(m("count") == ((3.0, 3.0)))
  }

  test("frame.py doctest: rename, drop, index round-trips, sort, merge") {
    val df = doctestFrame
    assert(df.rename(Map("a" -> "c")).columns == Seq("c", "b"))
    assert(df.drop("a").columns == Seq("b"))
    // reset_index: old index becomes a data column
    assert(df.resetIndex().columns.contains("idx"))
    // set_index('b'): a selectable through the new index
    val byB = df.setIndex("b")
    assert(byB.toDF.filter(col("b") === 0L).select("a").head().getLong(0) == 6L)
    // sort_values('b') → a-order 6, 5, 7
    val sorted = df.sortValues(Seq("b")).toDF
      .select("a").collect().map(_.getLong(0)).toSeq
    assert(sorted == Seq(6L, 5L, 7L))
    // merge on 'b' (inner): b=0 → a=6, b=2 → a=7; no key restrictions
    // (the reference requires sorted unique keys — dropped here)
    val df2 = new BalooFrame(
      Seq((0L, 0L), (1L, 2L)).toDF("idx", "b"), Seq("idx"))
    val merged = df.merge(df2, Seq("b")).toDF
      .select("b", "a").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == Map(0L -> 6L, 2L -> 7L))
  }

  test("frame.py doctest: dropna / fillna (NULL replaces the -999 sentinel)") {
    val df3 = new BalooFrame(
      Seq((-999L, Some(1.0)), (1L, None), (2L, Some(3.0)))
        .toDF("idx", "a"), Seq("idx"))
    val kept = df3.dropna().toDF.orderBy("idx")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(kept == Seq((-999L, 1.0), (2L, 3.0)))
    val filled = df3.fillna(15.0).toDF.orderBy("idx")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(filled == Seq((-999L, 1.0), (1L, 15.0), (2L, 3.0)))
  }

  test("frame.py doctest: groupby('a').sum()") {
    val g = new BalooFrame(
      Seq((0L, 0L, 1L), (1L, 1L, 2L), (2L, 1L, 3L), (3L, 2L, 4L))
        .toDF("idx", "a", "b"), Seq("idx"))
      .groupby("a").sum().toDF
      .orderBy("a").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(g == Seq((0L, 1L), (1L, 5L), (2L, 4L)))
  }

  test("series.py doctest: arithmetic, series-series zip, aggregations") {
    // sr = bl.Series([0, 1, 2])
    val sr = new BalooSeries(
      Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("idx", "v"), Seq("idx"), "v")
    assert(sr.toDF.count() == 3)
    // (sr + 2) → [2, 3, 4]
    assert((sr + 2.0).toDF.orderBy("idx").collect().map(_.getDouble(1)).toSeq
      == Seq(2.0, 3.0, 4.0))
    // (sr - Index(arange(3))) → [0, 0, 0] (index-aligned zip)
    val other = new BalooSeries(
      Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("idx", "w"), Seq("idx"), "w")
    assert((sr - other).toDF.orderBy("idx").collect().map(_.getLong(1)).toSeq
      == Seq(0L, 0L, 0L))
    // sr.max() = 2, sr.var() = 1.0 (sample)
    assert(sr.max() == 2.0)
    assert(sr.variance() == 1.0)
    // sr.agg(['min', 'std']) → min 0, std 1
    val m = sr.agg(Seq("min", "std")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("min" -> 0.0, "std" -> 1.0))
  }

  test("strings.py find(sub, start, end) + stepped df[a:b:step] replay") {
    // sr = bl.Series(['abz', 'zabz', 'zab']); sr.str.find('ab', 0, 3)
    // → [0, 1, 1]; the window clamps BOTH bounds (strings.py:143-169)
    val sr = new BalooSeries(
      Seq((0L, "abz"), (1L, "zabz"), (2L, "zab")).toDF("idx", "s"), Seq("idx"), "s")
    assert(sr.str.find("ab", 0, 3).toDF.orderBy("idx")
      .collect().map(_.getInt(1)).toSeq == Seq(0, 1, 1))
    // start >= end → ValueError in the reference (strings.py:162-163)
    intercept[IllegalArgumentException](sr.str.find("ab", 2, 2))

    // df[0:5:2] strided slice (weld_ops.py:136-187, step != 1 branch):
    // positions 0, 2, 4 of a 5-row frame
    val df = new BalooFrame(
      Seq((0L, 10L), (1L, 11L), (2L, 12L), (3L, 13L), (4L, 14L))
        .toDF("idx", "v"), Seq("idx"))
    assert(df.slice(0, 5, 2).toDF.orderBy("idx")
      .collect().map(_.getLong(1)).toSeq == Seq(10L, 12L, 14L))
  }

  test("README benchmark pipeline replayed op for op") {
    // col1 f64, col2 f64, col3 i64, col4 i32 — the reference's schema
    val base = new BalooFrame(
      Seq((0L, 2.0, 10.0, 5L, 1), (1L, -1.0, 20.0, 7L, 2),
        (2L, 4.0, 9.0, 3L, 3), (3L, 6.0, 30.0, 40L, 4),
        (4L, 8.0, 15.0, 2L, 5))
        .toDF("idx", "col1", "col2", "col3", "col4"), Seq("idx"))
    // filter: col1 > 0 & col2 >= 10 & col3 < 30 → rows 0 and 4
    val filtered = base.where(
      col("col1") > 0.0 && col("col2") >= 10.0 && col("col3") < 30L)
    assert(filtered.toDF.select("idx").collect().map(_.getLong(0)).toSet
      == Set(0L, 4L))
    // 4x agg over col1: min −1, prod −384, mean 3.8, std (sample)
    val aggs = base.agg(Seq("min", "prod", "mean", "std"))
      .select(col("agg"), col("col1")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(aggs("min") == -1.0)
    assert(aggs("prod") == 2.0 * -1.0 * 4.0 * 6.0 * 8.0)
    assert(aggs("mean") == (2.0 - 1.0 + 4.0 + 6.0 + 8.0) / 5)
    assert(math.abs(aggs("std") - 3.4928498393145961) < 1e-12)
    // 3x scalar op: col1 * 2 + 1 − 23
    val op = (base("col1") * 2.0 + 1.0 - 23.0).toDF
    assert(op.orderBy("idx").collect().map(_.getDouble(1)).toSeq
      == Seq(-18.0, -24.0, -14.0, -10.0, -6.0))
    // udf np.exp(col1)
    val ex = base("col1").apply(exp).toDF.orderBy("idx")
      .collect().map(_.getDouble(1)).toSeq
    assert(ex.zip(Seq(2.0, -1.0, 4.0, 6.0, 8.0).map(math.exp))
      .forall { case (a, b) => a == b })
    // groupby(col2, col4).var and self-join on col3: shapes + one value
    val gv = base.groupby("col2", "col4").variance().toDF
    assert(gv.count() == 5) // all groups singletons here → var NULL
    val joined = base.select("col3", "col1")
      .merge(base.select("col3", "col2"), Seq("col3")).toDF
    assert(joined.count() == 5)
  }
}
