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

  /** Order-independent sample variance via exact decimal moments:
    * (Σx² − (Σx)²/n) / (n−1), with both sums carried in decimal and the
    * final scalar arithmetic done in double — bit-identical on any engine
    * that evaluates the same expression on the same three scalars. The
    * reference's var is sample variance (`weld_aggs.py:113-151`).
    *
    * Determinism constraint: the decimal sums must stay under 2^53 in
    * unscaled units (≈9e11 at scale 4) — beyond that DuckDB's
    * decimal→double cast double-rounds (hugeint→double, then /10^s)
    * while Spark rounds once, and the last ulp can differ. So use this
    * on bounded columns (quantities, rates), not large money columns.
    */
  def dvar(c: Column): Column = {
    val s1 = sum(c.cast(dec)).cast(DoubleType)
    val s2 = sum((c * c).cast(dec)).cast(DoubleType)
    val n = count(c).cast(DoubleType)
    (s2 - (s1 * s1) / n) / (n - lit(1.0))
  }

  /** Order-independent sample std = sqrt(dvar). */
  def dstd(c: Column): Column = sqrt(dvar(c))

  /** Round to grain 1e-4 — used for true floating moments (var/std) on
    * small-magnitude columns where the cross-engine error is ≪ 1e-8.
    */
  def r4(c: Column): Column = round(c, 4)

  /** DuckDB-side spellings of the same helpers. */
  def sqlDsum(e: String): String = s"CAST(sum(CAST(($e) AS DECIMAL(28,4))) AS DOUBLE)"
  def sqlDavg(e: String): String = s"CAST(sum(CAST(($e) AS DECIMAL(28,4))) AS DOUBLE) / count($e)"
  def sqlDvar(e: String): String = {
    val s1 = sqlDsum(e)
    val s2 = s"CAST(sum(CAST((($e)*($e)) AS DECIMAL(28,4))) AS DOUBLE)"
    val n = s"CAST(count($e) AS DOUBLE)"
    s"(($s2) - (($s1)*($s1))/($n)) / (($n) - 1.0)"
  }
  def sqlDstd(e: String): String = s"sqrt(${sqlDvar(e)})"

  /** Modulus of the order-independent content checksum (2³¹−1) —
    * ONE definition for every manifest/handshake spelling on both
    * engines (the round-10 lesson: hand-synced constants drift).
    */
  val ChkP = 2147483647L

  /** Order-independent content checksum aggregate of text column `c`:
    * commutative DECIMAL(38,0) sum of per-row 60-bit md5 prefixes
    * ([[Fingerprints.hashOfSql]]), reduced mod [[ChkP]] — same rows in
    * any order/partitioning ⇒ same value; any changed row flips it.
    * Spark spelling.
    */
  def checksum(c: String): Column =
    expr(s"CAST(sum(CAST(${Fingerprints.hashOfSql(c)} AS DECIMAL(38,0)))" +
      s" % $ChkP AS BIGINT)")

  /** DuckDB spelling of [[checksum]] (same 60-bit md5 prefix read via
    * the 0x-literal cast).
    */
  def sqlChecksum(c: String): String =
    s"CAST(sum(CAST(${Fingerprints.sqlHashOf(c)}" +
      s" AS DECIMAL(38,0))) % $ChkP AS BIGINT)"
}
