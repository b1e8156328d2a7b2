package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empty-frame edge cases (reference `tests/core/test_empty.py`) and the
  * UDF-surface additions (applyExpr, df⊕list, stepped str.slice).
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def empty = new BalooFrame(
    Seq.empty[(Long, Long, Double)].toDF("idx", "a", "b"), Seq("idx"))

  test("empty frame: filter/head/sort/arith stay empty with schema intact") {
    assert(empty.where(col("a") > 0L).toDF.count() == 0)
    assert(empty.head(5).toDF.count() == 0)
    assert((empty * 2.0).toDF.columns.toSeq == Seq("idx", "a", "b"))
    assert(empty.sortValues(Seq("a")).toDF.count() == 0)
  }

  test("empty frame: aggregates are NULL/0 like SQL, count is 0") {
    val s = empty("a")
    assert(s.count() == 0L)
    val row = empty.toDF.agg(sum("a"), count(lit(1))).head()
    assert(row.isNullAt(0) && row.getLong(1) == 0L)
  }

  test("empty/degenerate frame comparisons keep schema; all-string frame compares to index-only") {
    // empty frame: bool schema out, zero rows
    val lt = (empty < 1.0).toDF
    assert(lt.columns.toSeq == Seq("idx", "a", "b") && lt.count() == 0)
    assert(lt.schema.fields.filter(_.name != "idx")
      .forall(_.dataType.typeName == "boolean"))
    assert((empty.isna()).toDF.count() == 0)
    // a frame whose data columns are ALL strings: comparison drops them
    // all (reference _drop_str_columns), leaving just the index
    val allStr = new BalooFrame(
      Seq((1L, "x"), (2L, "y")).toDF("idx", "s"), Seq("idx"))
    assert((allStr < 1.0).toDF.columns.toSeq == Seq("idx"))
    assert((allStr < 1.0).toDF.count() == 2)
  }

  test("empty frame: join with non-empty yields empty inner, full right") {
    val nonEmpty = new BalooFrame(
      Seq((1L, 9L, 1.0)).toDF("idx", "a", "b"), Seq("idx"))
    assert(empty.merge(nonEmpty, Seq("idx"), "inner").toDF.count() == 0)
    assert(empty.merge(nonEmpty, Seq("idx"), "outer").toDF.count() == 1)
  }

  test("frame fillna dispatches on scalar type; unsupported types throw") {
    val f = new BalooFrame(
      Seq((0L, Some(1), Some(1.5)), (1L, None, None))
        .toDF("idx", "i", "d"), Seq("idx"))
    assertFrame(f.fillna(7).toDF.orderBy("idx"),
      Seq(Seq(0L, 1, 1.5), Seq(1L, 7, 7.0)))
    assertFrame(f.fillna(2.5f).toDF.orderBy("idx"),
      Seq(Seq(0L, 1, 1.5), Seq(1L, 2, 2.5)))
    intercept[IllegalArgumentException](f.fillna(java.time.LocalDate.now()))
  }

  test("applyExpr binds {self} — the weld-template UDF analog") {
    val s = new BalooSeries(
      Seq((0L, 2.0), (1L, 3.0)).toDF("idx", "v"), Seq("idx"), "v")
    val out = s.applyExpr("{self} * 2 + 1").df.orderBy("idx")
      .collect().map(_.getDouble(1)).toSeq
    assert(out == Seq(5.0, 7.0))
  }

  test("df ⊕ list applies one scalar per numeric column") {
    val f = new BalooFrame(
      Seq((0L, 1.0, 10.0), (1L, 2.0, 20.0)).toDF("idx", "a", "b"), Seq("idx"))
    val out = (f * Seq(2.0, 0.5)).toDF.orderBy("idx")
    assertFrame(out, Seq(Seq(0L, 2.0, 5.0), Seq(1L, 4.0, 10.0)))
    intercept[IllegalArgumentException](f + Seq(1.0))
  }

  test("stepped str.slice takes every k-th char") {
    val s = new BalooSeries(
      Seq((0L, "abcdefg"), (1L, "ab")).toDF("idx", "s"), Seq("idx"), "s")
    val out = s.str.slice(0, 6, 2).df.orderBy("idx").collect().map(_.getString(1)).toSeq
    assert(out == Seq("ace", "a"))
    assert(s.str.slice(3, 2, 2).df.collect().map(_.getString(1)).toSeq == Seq("", ""))
  }
}
