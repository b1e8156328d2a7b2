package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * @param direction pandas `merge_asof` `direction`: "backward"
    *                (default, most recent right with ts ≤ left ts),
    *                "forward" (earliest right with ts ≥ left ts — the
    *                same one-shuffle plan traversed in descending ts
    *                order; DuckDB mirrors it with
    *                `ASOF … ON right.ts >= left.ts`), or "nearest"
    *                (whichever of the two is closer; backward wins
    *                ties, pandas' rule — both candidate matches come
    *                from two windows over the SAME keyed partitioning,
    *                so still one shuffle, two partition-local sorts).
    * @param allowExactMatches pandas `allow_exact_matches`: when false
    *                the inequality is strict (right at the exact left
    *                ts is not a match) — implemented purely by flipping
    *                which side sorts first at equal timestamps.
    *
    * The whole right payload (+ its ts) travels as ONE struct through a
    * single `last(_, ignoreNulls)` — all emitted payload columns come
    * from the SAME matched right row even when some of its fields are
    * NULL (per-column lasts would stitch a chimera row from different
    * quotes), and the matched ts keeps tsCol's exact type.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], rightTsAs: String = "",
      toleranceUs: Long = -1L, direction: String = "backward",
      allowExactMatches: Boolean = true): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward, forward, or nearest, got $direction")
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
    // at equal ts, the right row sorts before the left (inclusive match)
    // unless exact matches are disallowed — then the left sorts first
    // and never sees the equal-ts right
    val sideOrder =
      if (allowExactMatches) col("__side").asc else col("__side").desc
    def win(desc: Boolean) = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (desc) col(tsCol).desc else col(tsCol).asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def gapOf(m: Column, forward: Boolean): Column =
      if (forward) unix_micros(m.getField("__ts")) - unix_micros(col(tsCol))
      else unix_micros(col(tsCol)) - unix_micros(m.getField("__ts"))

    val filled0 = direction match {
      case "backward" | "forward" =>
        unioned
          .withColumn("__match",
            last(col("__pay"), ignoreNulls = true).over(win(direction == "forward")))
          .filter(col("__side") === 1)
      case "nearest" =>
        // both candidates from two windows over the SAME partitioning;
        // backward wins ties (pandas)
        val b = last(col("__pay"), ignoreNulls = true).over(win(desc = false))
        val f = last(col("__pay"), ignoreNulls = true).over(win(desc = true))
        unioned
          .withColumn("__mb", b).withColumn("__mf", f)
          .filter(col("__side") === 1)
          .withColumn("__match",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(gapOf(col("__mb"), forward = false)
                <= gapOf(col("__mf"), forward = true), col("__mb"))
              .otherwise(col("__mf")))
          .drop("__mb", "__mf")
    }
    val gapUs =
      if (direction == "nearest")
        // the directed gaps are negatives of each other; the true
        // absolute distance is whichever is positive
        greatest(gapOf(col("__match"), forward = false),
          gapOf(col("__match"), forward = true))
      else gapOf(col("__match"), direction == "forward")
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
