package graft.core

import graft.SparkSpec

/** Frame-level operator specs mirroring the reference's
  * `tests/core/test_frame.py` / `test_join.py` / `test_group.py`
  * fixtures (`/root/reference/tests/conftest.py:73-111`; see
  * /root/repo/FIXTURES.md).
  */
class BalooFrameSpec extends SparkSpec {
  import spark.implicits._

  /** df1: a=[0..4] i64, b=[1..5] f32, index idx=[2..6] (conftest.py:93-95). */
  private def df1 = new BalooFrame(
    Seq((2L, 0L, 1.0f), (3L, 1L, 2.0f), (4L, 2L, 3.0f), (5L, 3L, 4.0f), (6L, 4L, 5.0f))
      .toDF("idx", "a", "b"), Seq("idx"))

  /** df2: b=[3,4,5] f32, c=[4,5,6] i64, index idx=[1,3,5] (conftest.py:98-103). */
  private def df2 = new BalooFrame(
    Seq((1L, 3.0f, 4L), (3L, 4.0f, 5L), (5L, 5.0f, 6L)).toDF("idx", "b", "c"), Seq("idx"))

  /** df_dupl: a f32 [0,1,1,2,3], b i64 [4,5,5,6,6], c i64 [1..5] (conftest.py:106-111). */
  private def dfDupl = new BalooFrame(
    Seq((0L, 0.0f, 4L, 1L), (1L, 1.0f, 5L, 2L), (2L, 1.0f, 5L, 3L),
      (3L, 2.0f, 6L, 4L), (4L, 3.0f, 6L, 5L)).toDF("idx", "a", "b", "c"), Seq("idx"))

  test("select is order-preserving and KeyErrors on miss") {
    assertCols(df1.select("b", "a").toDF, Seq("idx", "b", "a"))
    intercept[IllegalArgumentException](df1.select("nope"))
  }

  test("filter by bool series keeps matching index rows") {
    val out = df1.filter(df1("a") > 1L).toDF.orderBy("idx")
    assertFrame(out, Seq(Seq(4L, 2L, 3.0f), Seq(5L, 3L, 4.0f), Seq(6L, 4L, 5.0f)))
  }

  test("head/tail/slice/iloc under index order") {
    assertFrame(df1.head(2).toDF, Seq(Seq(2L, 0L, 1.0f), Seq(3L, 1L, 2.0f)))
    assertFrame(df1.tail(2).toDF, Seq(Seq(5L, 3L, 4.0f), Seq(6L, 4L, 5.0f)))
    assertFrame(df1.slice(1, 3).toDF.orderBy("idx"),
      Seq(Seq(3L, 1L, 2.0f), Seq(4L, 2L, 3.0f)))
    assertFrame(df1.iloc(4).toDF, Seq(Seq(6L, 4L, 5.0f)))
  }

  test("stepped slice df[a:b:step] keeps every step-th position") {
    // positions 0,2,4 of [0,5) → idx 2,4,6 (weld_ops.py:136-187 strided)
    assertFrame(df1.slice(0, 5, 2).toDF.orderBy("idx"),
      Seq(Seq(2L, 0L, 1.0f), Seq(4L, 2L, 3.0f), Seq(6L, 4L, 5.0f)))
    // step past the end of the window: only the start position survives
    assertFrame(df1.slice(1, 3, 5).toDF.orderBy("idx"),
      Seq(Seq(3L, 1L, 2.0f)))
    intercept[IllegalArgumentException](df1.slice(0, 5, 0).toDF.collect())
  }

  test("withColumn aligns a differently-indexed series (weld_align analog)") {
    val out = df1.withColumn("c", df2("c")).toDF.orderBy("idx")
    assertFrame(out, Seq(
      Seq(2L, 0L, 1.0f, null), Seq(3L, 1L, 2.0f, 5L), Seq(4L, 2L, 3.0f, null),
      Seq(5L, 3L, 4.0f, 6L), Seq(6L, 4L, 5.0f, null)))
  }

  test("broadcast arithmetic touches numeric data cols, not the index") {
    val out = (df1 * 2.0).toDF.orderBy("idx")
    assertFrame(out, Seq(
      Seq(2L, 0.0, 2.0), Seq(3L, 2.0, 4.0), Seq(4L, 4.0, 6.0),
      Seq(5L, 6.0, 8.0), Seq(6L, 8.0, 10.0)))
  }

  test("frame comparison vs scalar drops string cols (test_frame.py::test_comparison)") {
    // df_small analog: a f32, b i64, c str — `df < 3` keeps only a, b as bools
    val dfSmall = new BalooFrame(
      Seq((0L, 1.0f, 1L, "a"), (1L, 2.0f, 2L, "Abc"), (2L, 3.0f, 3L, "goosfraba"),
        (3L, 4.0f, 4L, "   dC  "), (4L, 5.0f, 5L, "secrETariat"))
        .toDF("idx", "a", "b", "c"), Seq("idx"))
    val out = (dfSmall < 3.0).toDF.orderBy("idx")
    assertCols(out, Seq("idx", "a", "b")) // string col c dropped
    assertFrame(out, Seq(
      Seq(0L, true, true), Seq(1L, true, true), Seq(2L, false, false),
      Seq(3L, false, false), Seq(4L, false, false)))
    // the other comparison dunders share the dispatch
    assertFrame((dfSmall >= 3.0).toDF.orderBy("idx").select("a"),
      Seq(Seq(false), Seq(false), Seq(true), Seq(true), Seq(true)))
    assertFrame((dfSmall === 3.0).toDF.orderBy("idx").select("b"),
      Seq(Seq(false), Seq(false), Seq(true), Seq(false), Seq(false)))
    assertFrame((dfSmall =!= 3.0).toDF.orderBy("idx").select("b"),
      Seq(Seq(true), Seq(true), Seq(false), Seq(true), Seq(true)))
  }

  test("frame isna/notna masks NULLs per non-string column (test_frame.py::test_isna)") {
    // reference fixture uses −999 sentinels; ours is SQL NULL (SURVEY §1.3)
    val df = new BalooFrame(
      Seq((0L, Some(0.0f), Some(4L)), (1L, Some(1.0f), None), (2L, None, None),
        (3L, Some(2.0f), Some(6L)), (4L, None, Some(6L)))
        .toDF("idx", "a", "b"), Seq("idx"))
    assertFrame(df.isna().toDF.orderBy("idx"), Seq(
      Seq(0L, false, false), Seq(1L, false, true), Seq(2L, true, true),
      Seq(3L, false, false), Seq(4L, true, false)))
    assertFrame(df.notna().toDF.orderBy("idx"), Seq(
      Seq(0L, true, true), Seq(1L, true, false), Seq(2L, false, false),
      Seq(3L, true, true), Seq(4L, false, true)))
  }

  test("df ⊕ list applies one scalar per numeric column for all five dunders") {
    // generic.py:78-91 / frame.py:270-289: +, -, *, /, ** all dispatch
    // through _element_wise_operation with list support
    assertFrame((df1 - Seq(1.0, 2.0)).toDF.orderBy("idx").limit(2), Seq(
      Seq(2L, -1.0, -1.0), Seq(3L, 0.0, 0.0)))
    assertFrame((df1 / Seq(2.0, 0.5)).toDF.orderBy("idx").limit(2), Seq(
      Seq(2L, 0.0, 2.0), Seq(3L, 0.5, 4.0)))
    assertFrame((df1 ** Seq(2.0, 1.0)).toDF.orderBy("idx").limit(2), Seq(
      Seq(2L, 0.0, 1.0), Seq(3L, 1.0, 2.0)))
    // arity mismatch fails fast, as the reference raises ValueError
    intercept[IllegalArgumentException](df1 - Seq(1.0))
  }

  test("arithmetic drops string cols from the result; bools promote to int") {
    // frame.py:270-289 routes scalar AND list arithmetic through
    // _drop_str_columns: the str column is ABSENT from the result (not
    // merely untouched), and bool participates with numpy's promotion
    val mixed = new BalooFrame(
      Seq((0L, 1.0, true, "x"), (1L, 2.0, false, "y"))
        .toDF("idx", "a", "flag", "s"), Seq("idx"))
    val scaled = (mixed * 2.0).toDF.orderBy("idx")
    assertCols(scaled, Seq("idx", "a", "flag"))
    assertFrame(scaled, Seq(Seq(0L, 2.0, 2), Seq(1L, 4.0, 0)))
    // list form counts NON-STRING columns (a, flag) — 2 scalars, not 1
    val listed = (mixed + Seq(10.0, 5.0)).toDF.orderBy("idx")
    assertCols(listed, Seq("idx", "a", "flag"))
    assertFrame(listed, Seq(Seq(0L, 11.0, 6.0), Seq(1L, 12.0, 5.0)))
    // comparisons keep bool columns too (reference drops ONLY str dtype)
    val cmp = (mixed < 1.5).toDF.orderBy("idx")
    assertCols(cmp, Seq("idx", "a", "flag"))
    assertFrame(cmp, Seq(Seq(0L, true, true), Seq(1L, false, true)))
  }

  test("astype per-column map") {
    val out = df1.astype(Map("b" -> "long")).toDF.orderBy("idx")
    assertFrame(out, Seq(
      Seq(2L, 0L, 1L), Seq(3L, 1L, 2L), Seq(4L, 2L, 3L), Seq(5L, 3L, 4L), Seq(6L, 4L, 5L)))
  }

  test("agg matrix: one pass, rows keyed by agg name, f64") {
    val out = df1.agg(Seq("min", "max", "sum")).orderBy("agg")
    assertFrame(out, Seq(
      Seq("max", 4.0, 5.0), Seq("min", 0.0, 1.0), Seq("sum", 10.0, 15.0)))
  }

  test("sortValues multi-column + descending") {
    val out = dfDupl.sortValues(Seq("a", "c"), ascending = false).toDF
    assertFrame(out.select("a", "c"), Seq(
      Seq(3.0f, 5L), Seq(2.0f, 4L), Seq(1.0f, 3L), Seq(1.0f, 2L), Seq(0.0f, 1L)))
  }

  test("dropDuplicates keep=min merges payload (reference semantics)") {
    val out = dfDupl.dropDuplicates(Seq("a", "b"), "min").toDF.orderBy("a")
    assertFrame(out.select("a", "b", "c"), Seq(
      Seq(0.0f, 4L, 1L), Seq(1.0f, 5L, 2L), Seq(2.0f, 6L, 4L), Seq(3.0f, 6L, 5L)))
  }

  test("dropDuplicates keep='+' sums payload") {
    val out = dfDupl.dropDuplicates(Seq("a", "b"), "+").toDF.orderBy("a")
    assertFrame(out.select("a", "b", "c"), Seq(
      Seq(0.0f, 4L, 1L), Seq(1.0f, 5L, 5L), Seq(2.0f, 6L, 4L), Seq(3.0f, 6L, 5L)))
  }

  test("dropDuplicatesFirst keeps first under index order") {
    val out = dfDupl.dropDuplicatesFirst(Seq("a", "b")).toDF.orderBy("idx")
    assertFrame(out.select("idx", "c"), Seq(
      Seq(0L, 1L), Seq(1L, 2L), Seq(3L, 4L), Seq(4L, 5L)))
  }

  test("merge inner on index suffixes collisions _x/_y, on-cols become index") {
    val m = df1.merge(df2, Seq("idx"), "inner")
    assert(m.indexCols == Seq("idx"))
    assertCols(m.toDF.select("b_x", "b_y", "c"), Seq("b_x", "b_y", "c"))
    assertFrame(m.toDF.orderBy("idx").select("idx", "a", "b_x", "b_y", "c"),
      Seq(Seq(3L, 1L, 2.0f, 4.0f, 5L), Seq(5L, 3L, 4.0f, 5.0f, 6L)))
  }

  test("merge outer null-fills both sides (reference fills sentinels)") {
    val m = df1.merge(df2, Seq("idx"), "outer").toDF.orderBy("idx")
    assertFrame(m.select("idx", "a", "c"), Seq(
      Seq(1L, null, 4L), Seq(2L, 0L, null), Seq(3L, 1L, 5L), Seq(4L, 2L, null),
      Seq(5L, 3L, 6L), Seq(6L, 4L, null)))
  }

  test("groupby sum/mean/size; keys become index; hash order (sorted compare)") {
    val g = dfDupl.drop("idx").groupby("a")
    assertFrame(g.sum().toDF.select("a", "b", "c"), Seq(
      Seq(0.0f, 4L, 1L), Seq(1.0f, 10L, 5L), Seq(2.0f, 6L, 4L), Seq(3.0f, 6L, 5L)),
      sort = true)
    assertFrame(g.mean().toDF.select("a", "c"), Seq(
      Seq(0.0f, 1.0), Seq(1.0f, 2.5), Seq(2.0f, 4.0), Seq(3.0f, 5.0)), sort = true)
    assertFrame(g.size().toDF, Seq(
      Seq(0.0f, 1L), Seq(1.0f, 2L), Seq(2.0f, 1L), Seq(3.0f, 1L)), sort = true)
  }

  test("groupby cannot group by all columns (frame.py:1092-1093)") {
    intercept[IllegalArgumentException](
      new BalooFrame(Seq((1L, 2L)).toDF("a", "b"), Nil).groupby("a", "b"))
  }

  test("rename/drop/setIndex/resetIndex track the index") {
    val r = df1.rename(Map("idx" -> "i2", "a" -> "a2"))
    assert(r.indexCols == Seq("i2"))
    assertCols(r.toDF, Seq("i2", "a2", "b"))
    assert(df1.drop("a").toDF.columns.toSeq == Seq("idx", "b"))
    assert(df1.resetIndex().indexCols.isEmpty)
    assert(df1.resetIndex().setIndex("a").indexCols == Seq("a"))
  }

  test("columns/dtypes/empty/keys accessors (frame.py:149-526)") {
    assert(df1.columns == Seq("a", "b"))
    assert(df1.dtypes.toMap.apply("a") == "bigint")
    assert(!df1.empty)
    assert(df1.keys().columns.toSeq == Seq("idx"))
    assert(new BalooFrame(
      Seq.empty[(Long, Double)].toDF("idx", "v"), Seq("idx")).empty)
  }

  test("withRangeIndex attaches a distributed 0-based ordinal") {
    val r = df1.withRangeIndex("pos").toDF.orderBy("pos")
    assertFrame(r.select("pos", "idx"), Seq(
      Seq(0L, 2L), Seq(1L, 3L), Seq(2L, 4L), Seq(3L, 5L), Seq(4L, 6L)))
  }

  test("pandas-ext: describe matrix — stats × numeric columns") {
    val d = df1.describe().collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(d("count") == ((5.0, 5.0)))
    assert(d("mean") == ((2.0, 3.0)))
    assert(d("min") == ((0.0, 1.0)) && d("max") == ((4.0, 5.0)))
    assert(d("50%") == ((2.0, 3.0)))
    assert(math.abs(d("std")._1 - math.sqrt(2.5)) < 1e-12)
  }

  test("pandas-ext: nlargest/nsmallest/clip/nunique/duplicated") {
    val top = df1.nlargest(2, "a").toDF.orderBy("idx")
      .collect().map(_.getLong(1)).toSeq
    assert(top == Seq(3L, 4L))
    assert(df1.nsmallest(2, "a").toDF.orderBy("idx")
      .collect().map(_.getLong(1)).toSeq == Seq(0L, 1L))
    // float bounds upcast the i64 column, like pandas clip with floats
    val clipped = df1.clip(1.0, 3.0).toDF.orderBy("idx")
      .collect().map(_.getDouble(1)).toSeq
    assert(clipped == Seq(1.0, 1.0, 2.0, 3.0, 3.0))
    val nu = df1.nunique().collect().head
    assert(nu.getLong(0) == 5L && nu.getLong(1) == 5L)
    val dup = new BalooFrame(
      Seq((0L, 1L, 1.0), (1L, 1L, 2.0), (2L, 2L, 3.0))
        .toDF("idx", "k", "v"), Seq("idx"))
      .duplicated(Seq("k"))
    assert(dup.df.orderBy("idx").collect().map(_.getBoolean(1)).toSeq
      == Seq(true, true, false))
  }

  test("pandas-ext: groupby mixed-aggregate map, one pass") {
    val f = new BalooFrame(
      Seq((1L, 1.0, 10L), (1L, 3.0, 10L), (2L, 5.0, 20L))
        .toDF("k", "a", "b"), Nil)
    val r = f.groupby("k").agg(Map("a" -> "mean", "b" -> "nunique"))
    assert(r.indexCols == Seq("k"))
    val rows = r.toDF.orderBy("k").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq
    assert(rows == Seq((1L, 2.0, 1L), (2L, 5.0, 1L)))
    intercept[IllegalArgumentException] {
      f.groupby("k").agg(Map("a" -> "median")).toDF.collect()
    }
    intercept[IllegalArgumentException] {
      f.groupby("k").agg(Map.empty[String, String])
    }
  }

  test("pandas-ext: pivot_table and melt round the shape trip") {
    val f = new BalooFrame(
      Seq((1L, "x", 2.0), (1L, "y", 3.0), (2L, "x", 5.0))
        .toDF("k", "c", "v"), Nil)
    val piv = f.pivotTable("k", "c", "v", Seq("x", "y"))
    assert(piv.indexCols == Seq("k"))
    val rows = piv.toDF.orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).getDouble(1) == 2.0 && rows(0).getDouble(2) == 3.0)
    assert(rows(1).getDouble(1) == 5.0 && rows(1).isNullAt(2))
    val melted = piv.melt(Seq("k"), Seq("x", "y"))
    assert(melted.toDF.columns.toSeq == Seq("k", "variable", "value"))
    assert(melted.toDF.count() == 4)
  }
}
