package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers for oracle-parity determinism.
  *
  * Floating-point sums are order-dependent; Spark's partial aggregation
  * order differs from DuckDB's sequential scan, so a raw `sum(double)`
  * hash-mismatches the oracle in the low bits. We therefore sum through
  * an exact decimal representation (associative ⇒ order-independent ⇒
  * bit-identical on both engines) and cast back to double. Small-magnitude
  * moments (var/std/avg on bounded columns) instead round to a grain far
  * above the error bound.
  *
  * Scale note: decimal aggregation is also the right call at 100 TB —
  * money columns summed as doubles drift; decimal partial aggregates stay
  * exact and still vectorize in Tungsten's hash aggregate.
  */
object Q {
  private val dec = DecimalType(28, 4)

  /** Order-independent exact sum of a (≤4-decimal) numeric column. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast(DoubleType)

  /** Order-independent mean: exact decimal sum / non-null count. */
  def davg(c: Column): Column = sum(c.cast(dec)).cast(DoubleType) / count(c)

  /** Round to grain 1e-4 — used for true floating moments (var/std) on
    * small-magnitude columns where the cross-engine error is ≪ 1e-8.
    */
  def r4(c: Column): Column = round(c, 4)

  /** DuckDB-side spellings of the same helpers. */
  def sqlDsum(e: String): String = s"CAST(sum(CAST(($e) AS DECIMAL(28,4))) AS DOUBLE)"
  def sqlDavg(e: String): String = s"CAST(sum(CAST(($e) AS DECIMAL(28,4))) AS DOUBLE) / count($e)"
}
