package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint via Karp–Rabin rolling hash: the minimum
  * polynomial hash over all [[RollingHashMath.W]]-char windows of the
  * text — a winnowing-style content fingerprint that is stable under
  * edits outside the minimizing window (unlike md5-of-normalized-text,
  * which any one-char edit changes).
  *
  * Codegen'd `UnaryExpression` (static call inlined into the
  * whole-stage loop). Integer-only arithmetic, so the DuckDB oracle in
  * `graft.queries.TextAnalysis` reproduces it exactly; constants and
  * operation order are mirrored there — keep in sync. Windows are
  * counted in code points, matching the oracle's `ascii()`/`length()`
  * semantics on any text.
  */
object RollingHashMath {
  val W = 8
  val P = 2147483647L // 2^31 − 1
  val B = 257L
  /** Pow(j) = B^(W−1−j) mod P. */
  val Pow: Array[Long] = {
    val a = new Array[Long](W)
    var v = 1L
    var j = W - 1
    while (j >= 0) { a(j) = v; v = v * B % P; j -= 1 }
    a
  }

  /** Min windowed hash; −1 for strings shorter than W code points
    * (mirrored as a CASE in the oracle). Iterates CODE POINTS so the
    * window positions and values agree with the oracle's
    * `ascii()`/`length()` code-point semantics on any text. Window sums
    * stay < 2^55 (code point < 2^21, Pow < 2^31, 8 terms), so a single
    * mod per window is exact — same as the SQL spelling.
    */
  def rollhash(s: UTF8String): Long = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < W) return -1L
    var min = Long.MaxValue
    var i = 0
    while (i <= n - W) {
      var sum = 0L
      var j = 0
      while (j < W) { sum += cps(i + j).toLong * Pow(j); j += 1 }
      val h = sum % P
      if (h < min) min = h
      i += 1
    }
    min
  }
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_rollhash"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RollingHashMath.rollhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashMath.rollhash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
