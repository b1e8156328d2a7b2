package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach the most recent right row
  * with equal keys and `right.ts <= left.ts` (inclusive). The classic
  * trades⋈quotes operator; Spark has no builtin (the brief names it as
  * a canonical custom operator).
  *
  * Implementation composes existing operators (preference (a) of the
  * custom-op ladder): tag + union both sides, one window partitioned by
  * the keys ordered by (ts, side) carrying `last(payload, ignoreNulls)`,
  * then keep left rows. Cost: ONE shuffle on the keys + a sorted window
  * per key — no per-key iteration, no range-condition join explosion,
  * state O(payload) per partition stream. This is the shape that holds
  * at 100 TB (a range join would rewrite as an O(n·m) nested loop per
  * key; a per-key collect would not distribute).
  *
  * Right rows sort BEFORE left rows at equal ts (side 0 < 1), making the
  * match inclusive — the same semantics as DuckDB's
  * `ASOF LEFT JOIN … ON q.ts <= t.ts`, which the driver oracle uses.
  * If several right rows share (keys, ts), the last in (ts, side) order
  * wins — callers needing a specific winner should pre-aggregate.
  */
object AsOfJoin {

  /** @param payload right-side value columns to carry (must not collide
    *                with left column names)
    * @param rightTsAs if nonempty, also emit the matched right timestamp
    * @param toleranceUs if ≥ 0, a match farther than this many
    *                microseconds from the left timestamp is discarded
    *                (payload columns NULL) — pandas `merge_asof`'s
    *                `tolerance`. Applied as a post-predicate on the
    *                struct-carried match timestamp: zero extra shuffles.
    * @param direction "backward" (default): most recent right row with
    *                ts ≤ left ts — or "forward": earliest right row with
    *                ts ≥ left ts (pandas `merge_asof` `direction`).
    *                Forward is the same one-shuffle plan traversed in
    *                descending ts order; DuckDB mirrors it with
    *                `ASOF … ON right.ts >= left.ts`.
    *
    * The whole right payload (+ its ts) travels as ONE struct through a
    * single `last(_, ignoreNulls)` — all emitted payload columns come
    * from the SAME matched right row even when some of its fields are
    * NULL (per-column lasts would stitch a chimera row from different
    * quotes), and the matched ts keeps tsCol's exact type.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], rightTsAs: String = "",
      toleranceUs: Long = -1L, direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"right payload ${payload.intersect(left.columns.toSeq)} collides with left columns")
    val leftOnly = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val payStruct = struct((col(tsCol).as("__ts") +: payload.map(col)): _*)

    val lTagged = leftOnly.map(col) ++ keys.map(col) ++ Seq(
      col(tsCol), lit(1).as("__side"),
      lit(null).cast(right.select(payStruct).schema.head.dataType).as("__pay"))
    val rTagged = leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side"), payStruct.as("__pay"))

    val unioned = left.select(lTagged: _*).unionByName(right.select(rTagged: _*))
    val tsOrder =
      if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled0 = unioned
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val gapUs =
      if (direction == "backward")
        unix_micros(col(tsCol)) - unix_micros(col("__match").getField("__ts"))
      else
        unix_micros(col("__match").getField("__ts")) - unix_micros(col(tsCol))
    val filled =
      if (toleranceUs < 0) filled0
      else filled0.withColumn("__match", when(gapUs <= toleranceUs, col("__match")))
    val withPayload = payload.foldLeft(filled) { (df, p) =>
      df.withColumn(p, col("__match").getField(p))
    }
    val out =
      if (rightTsAs.nonEmpty)
        withPayload.withColumn(rightTsAs, col("__match").getField("__ts"))
      else withPayload
    out.drop("__side", "__pay", "__match")
  }
}
