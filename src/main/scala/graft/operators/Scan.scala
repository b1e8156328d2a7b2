package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix aggregates (running sum/max/min under a
  * total order) — the engine behind pandas `cumsum`/`cummax`/`cummin`
  * when the order spans the whole frame, not a group.
  *
  * The naive spelling, `sum(v).over(Window.orderBy(order))`, collapses
  * the dataset into ONE partition — the same non-starter
  * [[Ordinal.withOrdinal]] documents for row numbers. The classic
  * two-phase scan fixes it the same way:
  *
  *   1. `repartitionByRange(order)` — partition i strictly precedes
  *      partition i+1 in the total order (deterministic, seeded bounds);
  *   2. ONE tiny per-partition aggregate (≤ #partitions rows) →
  *      exclusive running offsets over the partition ids, broadcast back;
  *   3. row result = offset(partition) ⊕ within-partition running
  *      aggregate (a keyed window over `__pid` — never SinglePartition).
  *
  * Cost: one range exchange + one #partitions-row broadcast + one
  * partition-local sort that the range layout already did. Every step
  * is a DataFrame op — codegen survives, 1000 executors each scan their
  * own slice.
  *
  * Determinism: `order` must be a TOTAL order — on a tied key, which
  * of the tied rows "precedes" the other is not defined, so their
  * running values depend on the partition layout (true of any engine's
  * window-with-ties, but here silently so). All in-repo callers comply
  * (the Series API orders by the frame's unique index). Because the
  * check costs a full aggregate job at plan-build time, it is gated:
  * set `spark.graft.scan.assertTotalOrder=true` (debug/CI profile) and
  * every scan validates key uniqueness up front, failing fast with a
  * tie-break hint instead of returning layout-dependent prefixes.
  */
object Scan {

  /** Session conf flag: when "true", [[runningAggs]] asserts the order
    * is duplicate-free before building the scan (one aggregate job).
    */
  val AssertTotalOrderKey = "spark.graft.scan.assertTotalOrder"

  /** The order key as a groupable expression: `col(x).desc`-style
    * columns wrap a SortOrder node, which `groupBy` rejects with an
    * AnalysisException instead of performing the check — strip to the
    * child (direction is irrelevant to key uniqueness).
    */
  private def sortKey(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.stripSortOrder(c)

  private def assertTotalOrder(df: DataFrame, order: Seq[Column]): Unit = {
    val on = df.sparkSession.conf.getOption(AssertTotalOrderKey)
      .exists(_.equalsIgnoreCase("true"))
    if (on) {
      // aliased count: a bare .count() column would collide with (and
      // silently check) any pre-existing user column named "count"
      val tied = df.groupBy(order.map(sortKey): _*)
        .agg(count(lit(1)).as("__tied_n"))
        .filter(col("__tied_n") > 1).limit(1).count()
      require(tied == 0L,
        "Scan order has tied keys: running aggregates over a non-total " +
          "order are partition-layout-dependent. Append a unique " +
          "tie-break column to the order (e.g. the frame's index).")
    }
  }

  /** One running aggregate per (value, how, name) triple, all computed
    * over a SINGLE range layout and one offsets broadcast. `how` ∈
    * {sum, max, min}.
    */
  def runningAggs(df: DataFrame, order: Seq[Column],
      specs: Seq[(Column, String, String)]): DataFrame = {
    require(specs.nonEmpty)
    assertTotalOrder(df, order)
    def aggF(how: String): Column => Column = how match {
      case "sum" => sum(_)
      case "max" => max(_)
      case "min" => min(_)
      case other => throw new IllegalArgumentException(s"unknown scan agg: $other")
    }
    // offset(first partition) is NULL (empty exclusive prefix): sum
    // treats it as 0; max/min fall through to the local value alone
    // (greatest/least skip NULL inputs).
    def combine(how: String): (Column, Column) => Column = how match {
      case "sum" => (off, loc) => coalesce(off, lit(0)) + loc
      case "max" => (off, loc) => greatest(off, loc)
      case "min" => (off, loc) => least(off, loc)
    }
    val vals = specs.zipWithIndex.map { case ((v, _, _), i) => v.as(s"__v$i") }
    // The range layout is consumed TWICE (the per-partition offsets
    // aggregate and the main windowed branch), and correctness requires
    // both to see the SAME partition boundaries — the layout is frozen
    // and shared through [[FrozenLayout]] (see there for the measured
    // divergence under a persist() wrapper and the memoization rationale).
    val ranged = FrozenLayout.freeze(df.select(col("*") +: vals: _*), order)
    val pagg = specs.zipWithIndex.map { case ((_, how, _), i) =>
      aggF(how)(col(s"__v$i")).as(s"__pagg$i") }
    val offs = specs.zipWithIndex.map { case ((_, how, _), i) =>
      aggF(how)(col(s"__pagg$i")).over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1))
        .as(s"__off$i") }
    // ≤ #partitions rows: the Window.orderBy here is over the partition
    // ids, bounded by cluster parallelism — the same documented shape as
    // Ordinal's offsets frame.
    val offsets = ranged.groupBy(col("__pid")).agg(pagg.head, pagg.tail: _*)
      .select(col("__pid") +: offs: _*)
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = specs.zipWithIndex.foldLeft(
      ranged.join(broadcast(offsets), "__pid")) {
      case (d, ((_, how, name), i)) =>
        d.withColumn(name,
          combine(how)(col(s"__off$i"), aggF(how)(col(s"__v$i")).over(w)))
    }
    out.drop("__pid" +:
      specs.indices.flatMap(i => Seq(s"__v$i", s"__off$i")): _*)
  }

  /** Single running aggregate — see [[runningAggs]]. */
  def runningAgg(df: DataFrame, order: Seq[Column], value: Column,
      how: String, name: String): DataFrame =
    runningAggs(df, order, Seq((value, how, name)))
}
