package graft.core

import graft.SparkSpec

/** Series + `.str` specs mirroring `tests/core/test_series.py` and
  * `test_series_str.py` (fixtures `/root/reference/tests/conftest.py:
  * 13-40`; see FIXTURES.md §1).
  */
class BalooSeriesSpec extends SparkSpec {
  import spark.implicits._

  /** data_i64 [1..5] with RangeIndex. */
  private def sI64 = new BalooSeries(
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("idx", "v"), Seq("idx"), "v")

  /** data_str ['a','Abc','goosfraba','   dC  ','secrETariat'] (conftest.py:28-30). */
  private def sStr = new BalooSeries(
    Seq((0L, "a"), (1L, "Abc"), (2L, "goosfraba"), (3L, "   dC  "), (4L, "secrETariat"))
      .toDF("idx", "s"), Seq("idx"), "s")

  /** series_str_2 ['abz','zabz','zab','  ab  ','a'] (conftest.py:38-40). */
  private def sStr2 = new BalooSeries(
    Seq((0L, "abz"), (1L, "zabz"), (2L, "zab"), (3L, "  ab  "), (4L, "a"))
      .toDF("idx", "s"), Seq("idx"), "s")

  private def vals(s: BalooSeries): Seq[Any] =
    s.df.orderBy("idx").collect().toSeq.map(_.get(1))

  test("comparisons produce bool series") {
    assert(vals(sI64 > 3L) == Seq(false, false, false, true, true))
    assert(vals(sI64 !== 3L) == Seq(true, true, false, true, true))
  }

  test("bool algebra & | ! with index alignment") {
    val big = sI64 > 3L
    val odd = sI64.apply(c => c % 2 === 1)
    assert(vals(big & odd) == Seq(false, false, false, false, true))
    assert(vals(big | odd) == Seq(true, false, true, true, true))
    assert(vals(!big) == Seq(true, true, true, false, false))
  }

  test("scalar and series arithmetic") {
    assert(vals(sI64 * 2.0) == Seq(2.0, 4.0, 6.0, 8.0, 10.0))
    assert(vals(sI64 ** 2.0) == Seq(1.0, 4.0, 9.0, 16.0, 25.0))
    assert(vals(sI64 + sI64) == Seq(2L, 4L, 6L, 8L, 10L))
  }

  test("filter by mask keeps aligned rows") {
    assert(vals(sI64.filter(sI64 > 3L)).sortBy(_.toString) == Seq(4L, 5L))
  }

  test("aggregations: f64 results, sample variance (weld_aggs.py:113-151)") {
    assert(sI64.sum() == 15.0)
    assert(sI64.prod() == 120.0)
    assert(sI64.min() == 1.0 && sI64.max() == 5.0)
    assert(sI64.count() == 5L)
    assert(sI64.mean() == 3.0)
    assert(math.abs(sI64.variance() - 2.5) < 1e-12)
    assert(math.abs(sI64.std() - math.sqrt(2.5)) < 1e-12)
  }

  test("agg list → name-keyed matrix") {
    val rows = sI64.agg(Seq("min", "max", "mean")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rows == Map("min" -> 1.0, "max" -> 5.0, "mean" -> 3.0))
  }

  test("unique is a hash distinct") {
    val dup = new BalooSeries(
      Seq((0L, 1L), (1L, 1L), (2L, 2L)).toDF("idx", "v"), Seq("idx"), "v")
    assert(dup.unique().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("str.lower/upper/capitalize (capitalize != initcap)") {
    assert(vals(sStr.str.lower()) ==
      Seq("a", "abc", "goosfraba", "   dc  ", "secretariat"))
    assert(vals(sStr.str.upper()) ==
      Seq("A", "ABC", "GOOSFRABA", "   DC  ", "SECRETARIAT"))
    assert(vals(sStr.str.capitalize()) ==
      Seq("A", "Abc", "Goosfraba", "   dc  ", "Secretariat"))
  }

  test("str.get with negative index and out-of-range → null") {
    assert(vals(sStr.str.get(1)) == Seq(null, "b", "o", " ", "e"))
    assert(vals(sStr.str.get(-1)) == Seq("a", "c", "a", " ", "t"))
    assert(vals(sStr.str.get(7)) == Seq(null, null, "b", null, "r"))
  }

  test("str.strip trims spaces") {
    assert(vals(sStr.str.strip()) == Seq("a", "Abc", "goosfraba", "dC", "secrETariat"))
  }

  test("str.slice [start, stop)") {
    assert(vals(sStr.str.slice(1, 4)) == Seq("", "bc", "oos", "  d", "ecr"))
  }

  test("str.contains/startswith/endswith") {
    assert(vals(sStr2.str.contains("ab")) == Seq(true, true, true, true, false))
    assert(vals(sStr2.str.startswith("ab")) == Seq(true, false, false, false, false))
    assert(vals(sStr2.str.endswith("b")) == Seq(false, false, true, false, false))
  }

  test("str.find first index or -1") {
    assert(vals(sStr2.str.find("ab")) == Seq(0, 1, 1, 2, -1))
    assert(vals(sStr2.str.find("z", start = 1)) == Seq(2, 3, -1, -1, -1))
  }

  test("str.find with end bound confines the match to [start, end)") {
    // window excludes matches that start before `start` or spill past `end`
    assert(vals(sStr2.str.find("ab", 0, 3)) == Seq(0, 1, 1, -1, -1))
    assert(vals(sStr2.str.find("ab", 2, 4)) == Seq(-1, -1, -1, 2, -1))
    // end beyond the string length behaves like the start-only form
    assert(vals(sStr2.str.find("z", 1, 100)) == Seq(2, 3, -1, -1, -1))
    // start >= end raises, as the reference does (strings.py:162-163)
    intercept[IllegalArgumentException](sStr2.str.find("a", 3, 3))
  }

  test("str.replace replaces FIRST occurrence only") {
    val s = new BalooSeries(
      Seq((0L, "xaxa"), (1L, "bb")).toDF("idx", "s"), Seq("idx"), "s")
    assert(vals(s.str.replace("xa", "Y")) == Seq("Yxa", "bb"))
  }

  test("str.split once, left/right parts") {
    val s = new BalooSeries(
      Seq((0L, "a-b-c"), (1L, "nodash")).toDF("idx", "s"), Seq("idx"), "s")
    assert(vals(s.str.split("-", "left")) == Seq("a", "nodash"))
    assert(vals(s.str.split("-", "right")) == Seq("b-c", null))
  }

  test("missing data: isna/fillna/dropna on NULLs") {
    val s = new BalooSeries(
      Seq((0L, Some(1.0)), (1L, None), (2L, Some(3.0))).toDF("idx", "v"), Seq("idx"), "v")
    assert(vals(s.isna) == Seq(false, true, false))
    assert(vals(s.fillna(-9.0)) == Seq(1.0, -9.0, 3.0))
    assert(s.dropna().df.count() == 2)
  }

  test("head/tail/iloc under index order (series.py:112-348)") {
    val s = new BalooSeries(
      (0L until 10L).map(i => (i, i * 10.0)).toDF("idx", "v"), Seq("idx"), "v")
    assert(vals(s.head(3)) == Seq(0.0, 10.0, 20.0))
    assert(vals(s.tail(2)) == Seq(80.0, 90.0))
    assert(vals(s.iloc(7L)) == Seq(70.0))
  }

  test("pandas-ext: value_counts / clip / nunique") {
    val s = new BalooSeries(
      Seq((0L, 2L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 2L), (5L, 1L))
        .toDF("idx", "v"), Seq("idx"), "v")
    val vc = s.valueCounts().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(vc.toSeq == Seq((2L, 3L), (1L, 2L), (3L, 1L)))
    assert(vals(sI64.clip(2.0, 4.0)) == Seq(2.0, 2.0, 3.0, 4.0, 4.0))
    assert(s.nunique() == 3L)
  }

  test("pandas-ext: cumsum/cummax/cummin under the index order") {
    val s = new BalooSeries(
      Seq((0L, 3.0), (1L, 1.0), (2L, 4.0), (3L, 1.0), (4L, 5.0))
        .toDF("idx", "v"), Seq("idx"), "v")
    assert(vals(s.cumsum()) == Seq(3.0, 4.0, 8.0, 9.0, 14.0))
    assert(vals(s.cummax()) == Seq(3.0, 3.0, 4.0, 4.0, 5.0))
    assert(vals(s.cummin()) == Seq(3.0, 1.0, 1.0, 1.0, 1.0))
  }

  test("pandas-ext: shift/diff/pct_change, null at the frontier") {
    val s = new BalooSeries(
      Seq((0L, 2.0), (1L, 4.0), (2L, 8.0)).toDF("idx", "v"), Seq("idx"), "v")
    assert(vals(s.shift(1)) == Seq(null, 2.0, 4.0))
    assert(vals(s.shift(-1)) == Seq(4.0, 8.0, null))
    assert(vals(s.diff(1)) == Seq(null, 2.0, 4.0))
    assert(vals(s.pctChange(1)) == Seq(null, 1.0, 1.0))
    // zero previous value → NULL, not an engine-specific infinity
    val z = new BalooSeries(
      Seq((0L, 0.0), (1L, 5.0)).toDF("idx", "v"), Seq("idx"), "v")
    assert(vals(z.pctChange(1)) == Seq(null, null))
  }

  test("pandas-ext: rolling(3) sum/mean/min/max, null until the window fills") {
    val s = new BalooSeries(
      Seq((0L, 3.0), (1L, 1.0), (2L, 4.0), (3L, 1.0), (4L, 5.0))
        .toDF("idx", "v").repartition(3), Seq("idx"), "v")
    assert(vals(s.rolling(3).sum()) == Seq(null, null, 8.0, 6.0, 10.0))
    assert(vals(s.rolling(3).mean()) == Seq(null, null, 8.0 / 3, 2.0, 10.0 / 3))
    assert(vals(s.rolling(3).min()) == Seq(null, null, 1.0, 1.0, 1.0))
    assert(vals(s.rolling(3).max()) == Seq(null, null, 4.0, 4.0, 5.0))
    // n=1 degenerates to the identity
    assert(vals(s.rolling(1).sum()) == Seq(3.0, 1.0, 4.0, 1.0, 5.0))
  }

  test("pandas-ext: isin/between/abs/round/replace masks and maps") {
    val s = new BalooSeries(
      Seq((0L, -2.5), (1L, 1.4), (2L, 3.6), (3L, -1.4)).toDF("idx", "v"),
      Seq("idx"), "v")
    assert(vals(s.isin(Seq(1.4, 3.6))) == Seq(false, true, true, false))
    assert(vals(s.between(-2.0, 2.0)) == Seq(false, true, false, true))
    assert(vals(s.abs()) == Seq(2.5, 1.4, 3.6, 1.4))
    assert(vals(s.round(0)) == Seq(-3.0, 1.0, 4.0, -1.0))
    assert(vals(s.replace(Map(1.4 -> 99.0))) == Seq(-2.5, 99.0, 3.6, -1.4))
  }

  test("pandas-ext: where/mask keep-or-replace under the aligned mask") {
    val s = new BalooSeries(
      Seq((0L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("idx", "v"), Seq("idx"), "v")
    val cond = s > 1.5
    assert(vals(s.where(cond)) == Seq(null, 2.0, 3.0))
    assert(vals(s.where(cond, -1.0)) == Seq(-1.0, 2.0, 3.0))
    assert(vals(s.mask(cond)) == Seq(1.0, null, null))
  }

  test("pandas-ext: mode and value ranks (min + dense), pandas tie rules") {
    val s = new BalooSeries(
      Seq((0L, 30L), (1L, 10L), (2L, 30L), (3L, 20L), (4L, 10L), (5L, 40L))
        .toDF("idx", "v").repartition(3), Seq("idx"), "v")
    // counts: 10→2, 30→2, 20→1, 40→1; tie between 10 and 30 → smallest
    assert(s.mode().head().getLong(0) == 10L)
    // values 10,10,20,30,30,40 → min-rank 1,1,3,4,4,6; dense 1,1,2,3,3,4
    assert(vals(s.rank("min")) == Seq(4L, 1L, 4L, 3L, 1L, 6L))
    assert(vals(s.rank("dense")) == Seq(3L, 1L, 3L, 2L, 1L, 4L))
  }
}
