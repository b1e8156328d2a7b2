package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions.{erf, prod}
import org.apache.spark.sql.functions._

/** Custom Catalyst expression specs: graft_prod (DeclarativeAggregate)
  * and graft_erf (codegen'd UnaryExpression).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("prod multiplies, skips nulls, empty/all-null → null") {
    val df = Seq(Some(2.0), Some(3.0), None, Some(4.0)).toDF("x")
    assert(df.agg(prod(col("x"))).head().getDouble(0) == 24.0)
    assert(Seq.empty[Double].toDF("x").agg(prod(col("x"))).head().isNullAt(0))
    assert(Seq[Option[Double]](None, None).toDF("x")
      .agg(prod(col("x"))).head().isNullAt(0))
  }

  test("prod participates in grouped aggregation with partial merge") {
    val df = Seq((1, 2.0), (1, 3.0), (2, 5.0), (2, 7.0), (2, 2.0))
      .toDF("k", "x").repartition(4)
    val out = df.groupBy("k").agg(prod(col("x")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out == Map(1 -> 6.0, 2 -> 70.0))
  }

  test("prod accepts integer input through the registry cast") {
    val out = Seq(1L, 2L, 3L, 4L).toDF("x")
      .selectExpr("graft_prod(x) AS p").head().getDouble(0)
    assert(out == 24.0)
  }

  test("erf matches known values within the A&S 7.1.26 bound (1.5e-7)") {
    val cases = Map(0.0 -> 0.0, 0.5 -> 0.5204998778, 1.0 -> 0.8427007929,
      2.0 -> 0.9953222650, -1.0 -> -0.8427007929)
    val df = cases.keys.toSeq.toDF("x").select(col("x"), erf(col("x")).as("e"))
    df.collect().foreach { r =>
      val (x, e) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(e - cases(x)) < 1.5e-7, s"erf($x) = $e")
    }
  }

  test("rollhash: hand-computed window min, short-string sentinel, edit stability") {
    import graft.functions.RollingHashMath.{rollhash, B, P, W}
    import org.apache.spark.unsafe.types.UTF8String
    def bruteExact(s: String): Long =
      if (s.length < W) -1L
      else (0 to s.length - W).map { i =>
        (0 until W).map(j => s.charAt(i + j).toLong
          * graft.functions.RollingHashMath.Pow(j)).sum % P
      }.min
    val samples = Seq("the quick brown fox", "aaaaaaaaaa", "short", "exactly8")
    samples.foreach { s =>
      assert(rollhash(UTF8String.fromString(s)) == bruteExact(s), s)
    }
    // stability: edit far from the minimizing window often preserves rh
    val doc = "alpha beta gamma delta epsilon zeta"
    assert(rollhash(UTF8String.fromString(doc)) ==
      bruteExact(doc))
  }

  test("rollhash runs codegen'd from SQL and distributes") {
    val out = Seq("abcdefghij", "zz").toDF("t")
      .selectExpr("graft_rollhash(t) AS rh").collect()
    assert(out(0).getLong(0) >= 0 && out(1).getLong(0) == -1L)
  }

  test("erf is null-safe and works from SQL after registration") {
    val out = Seq(Some(1.0), None).toDF("x").selectExpr("graft_erf(x) AS e").collect()
    assert(math.abs(out(0).getDouble(0) - 0.8427007929) < 1.5e-7)
    assert(out(1).isNullAt(0))
  }

  test("sinter: sorted intersection count matches array_intersect, null-safe") {
    val rows = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)), // {3,9} -> 2
      (Seq.empty[Long], Seq(1L, 2L)),              // 0
      (Seq(4L, 8L), Seq(4L, 8L)),                  // 2
      (Seq(1L, 2L, 3L), Seq(7L, 8L)))              // 0
    val out = rows.toDF("a", "b")
      .selectExpr("graft_sinter(a, b) AS s",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS ref")
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    val nul = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .selectExpr("graft_sinter(a, b) AS s").collect()
    assert(nul(0).isNullAt(0))
  }

  test("every graft function is callable from pure SQL (extension surface)") {
    // the same (name, builder) list GraftExtensions injects cluster-wide
    val r = spark.sql(
      """SELECT graft_erf(1.0) AS e,
        |  graft_rollhash('abcdefghij') AS rh,
        |  graft_spanhashes(repeat('a', 40)) AS sh,
        |  graft_dotl(array(1L, 2L), array(3L, 4L)) AS d,
        |  graft_sinter(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS si""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 0.8427007929) < 1.5e-7)
    assert(r.getLong(1) >= 0L)
    assert(r.getSeq[Long](2).length == 1) // uniform string -> one span hash
    assert(r.getLong(3) == 11L)
    assert(r.getLong(4) == 2L)
    val p = spark.sql("SELECT graft_prod(x) FROM VALUES (2.0), (3.0) AS t(x)")
      .head().getDouble(0)
    assert(p == 6.0)
    // bloom build + probe: the filter comes in as a scalar subquery; a
    // member always hits (no false negatives), and a 4096-bit filter on
    // 2 items makes a false positive on the probe below ~impossible
    val bl = spark.sql(
      """SELECT
        |  graft_might_contain((SELECT graft_bloom_agg(h, 10L, 4096L)
        |    FROM VALUES (CAST(7 AS BIGINT)), (42) AS t(h)), 42L) AS hit,
        |  graft_might_contain((SELECT graft_bloom_agg(h, 10L, 4096L)
        |    FROM VALUES (CAST(7 AS BIGINT)), (42) AS t(h)), 123456789L) AS miss""".stripMargin)
      .head()
    assert(bl.getBoolean(0) && !bl.getBoolean(1))
    // the injected list covers every registered builder
    val names = graft.functions.GraftFunctions.builders.map(_._1).toSet
    assert(names == Set("graft_prod", "graft_erf", "graft_rollhash",
      "graft_spanhashes", "graft_spanhashes_pos", "graft_dotl", "graft_sinter",
      "graft_bloom_agg", "graft_might_contain"))
    // and the positional variant answers from pure SQL too
    val sp = spark.sql(
      "SELECT size(graft_spanhashes_pos(repeat('ab', 20)))").head().getInt(0)
    assert(sp == 40 - 32 + 1)
  }
}
