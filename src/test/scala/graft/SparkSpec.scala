package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + frame-comparison helpers — the analog of
  * the reference's `assert_dataframe_equal` fixtures
  * (`/root/reference/tests/core/test_frame.py:11-23`): compare values,
  * schema names, and length, with optional row sort for
  * hash-order-nondeterministic ops and float tolerance.
  */
object SparkSpec {
  /** One scratch root for the whole test JVM, recursively deleted on
    * exit — specs that write files use [[SparkSpec.tmpDir]] instead of
    * leaking a fresh `Files.createTempDirectory` per test run.
    */
  lazy val scratch: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_test_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(root.toFile)
    }))
    root
  }

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Tables.prep(s)
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark

  /** A unique subdirectory under the JVM-wide auto-cleaned scratch. */
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(SparkSpec.scratch, prefix).toString

  /** Normalize a row for comparison: floats rounded to `places`. */
  private def norm(r: Row, places: Int): Seq[Any] =
    r.toSeq.map {
      case d: Double => BigDecimal(d).setScale(places, BigDecimal.RoundingMode.HALF_UP)
      case f: Float => BigDecimal(f.toDouble).setScale(places, BigDecimal.RoundingMode.HALF_UP)
      case x => x
    }

  /** Assert frame contents equal `expected` (Seq of tuples-as-Seq),
    * sorting both sides when `sort` (groupby/distinct outputs are in
    * hash order in both the reference — README.md:29-30 — and Spark).
    */
  def assertFrame(df: DataFrame, expected: Seq[Seq[Any]],
      sort: Boolean = false, places: Int = 6): Unit = {
    val got = df.collect().toSeq.map(norm(_, places))
    val want = expected.map(r => norm(Row.fromSeq(r), places))
    val (g, w) = if (sort) (got.sortBy(_.toString), want.sortBy(_.toString)) else (got, want)
    assert(g == w, s"\ngot:  ${g.mkString("; ")}\nwant: ${w.mkString("; ")}")
  }

  def assertCols(df: DataFrame, cols: Seq[String]): Unit =
    assert(df.columns.toSeq == cols, s"columns ${df.columns.toSeq} != $cols")
}
