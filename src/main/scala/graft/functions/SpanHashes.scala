package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All distinct Karp–Rabin hashes of the [[SpanHashMath.W]]-char windows
  * of a document — the building block of exact substring deduplication
  * (flag/remove long character spans that recur across a corpus, the
  * "exact substring dedup" of training-data pipelines; cf. the suffix
  * -array approach the single-node literature uses — a rolling-hash
  * bucket join is its shuffle-friendly distributed analog).
  *
  * Same constants and window math as [[RollingHashMath]] (reference
  * fingerprint spec: winnowing-style content hash) but W=32 chars — a
  * span long enough that a cross-document match is evidence of copying
  * rather than a shared phrase — and returns EVERY distinct window hash
  * (ascending) instead of the minimum, so the caller can explode and
  * count cross-document recurrences with one hash aggregate.
  *
  * Codegen'd `UnaryExpression`; integer-only arithmetic mirrored by the
  * DuckDB oracle in [[graft.queries.CorpusQuality]] — keep in sync.
  * Scale note: per-doc work is O(n·W) with O(distinct windows) memory;
  * the downstream plan shuffles only (hash, doc) pairs, never text.
  */
object SpanHashMath {
  val W = 32
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

  /** B^(W−1) mod P — the leading-coefficient weight [[spanHashesPos]]'s
    * rolling update subtracts when the window slides one code point.
    */
  val PowTop: Long = Pow(0)

  /** Distinct ascending window hashes; empty for strings shorter than W
    * code points. Iterates CODE POINTS, not UTF-16 units, so windows and
    * values agree with the DuckDB oracle's `ascii()`/`length()`
    * (code-point) semantics on any text, surrogate pairs included.
    * Window sums stay < 2^57 (code point < 2^21, Pow < 2^31, 32 terms),
    * so a single mod per window is exact — the SQL spelling computes the
    * identical value.
    */
  def spanHashes(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < W) return new GenericArrayData(Array.empty[Long])
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= n - W) {
      var sum = 0L
      var j = 0
      while (j < W) { sum += cps(i + j).toLong * Pow(j); j += 1 }
      set.add(sum % P)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  /** Second independent hash family for the WIDE positional hash:
    * different base and (prime) modulus, same window math.
    */
  val P2 = 2147483629L // prime < 2^31
  val B2 = 263L
  val Pow2: Array[Long] = {
    val a = new Array[Long](W)
    var v = 1L
    var j = W - 1
    while (j >= 0) { a(j) = v; v = v * B2 % P2; j -= 1 }
    a
  }
  val PowTop2: Long = Pow2(0)

  /** POSITIONAL window hashes: element i = 62-bit hash of the window
    * starting at code point i (length n−W+1; empty below W code
    * points), keeping position and multiplicity so a consumer can merge
    * adjacent duplicated windows into maximal duplicated SUBSTRING runs
    * (exact-substring dedup à la the suffix-array method).
    *
    * WIDE on purpose: the value is h1·P2 + h2 with two independent
    * Karp–Rabin families (h1 = [[spanHashes]]' family, recoverable as
    * `value DIV P2`). A single 2^31-modulus hash birthday-collides at
    * ~10⁴ false pairs per ~10⁷ windows — found by the 10× scale-stress
    * (planted seeds lost chars to windows they never shared; invisible
    * at the oracle scale because BOTH engines compute the same colliding
    * hash). The 62-bit product space pushes the expected corpus-wide
    * false pair below 10⁻⁵ at 10⁷ windows; at true 100 TB window counts
    * (≳10¹³) widen again — two independent 61-bit families or a
    * confirm-on-text pass. Every intermediate here and in the DuckDB
    * spelling stays under 2^63: h1 < 2^31, h1·P2 < 2^62, products in
    * the rolling update < 2^40.
    *
    * True rolling update, O(n): H(i+1) = (H(i) − cp(i)·B^(W−1))·B +
    * cp(i+W) mod P, per family.
    */
  def spanHashesPos(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < W) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - W + 1)
    var h1 = 0L
    var h2 = 0L
    var j = 0
    while (j < W) {
      h1 += cps(j).toLong * Pow(j) % P
      h2 += cps(j).toLong * Pow2(j) % P2
      j += 1
    }
    h1 %= P
    h2 %= P2
    out(0) = h1 * P2 + h2
    var i = 1
    while (i <= n - W) {
      h1 = (h1 - cps(i - 1).toLong * PowTop % P) % P
      if (h1 < 0) h1 += P
      h1 = (h1 * B + cps(i + W - 1).toLong) % P
      h2 = (h2 - cps(i - 1).toLong * PowTop2 % P2) % P2
      if (h2 < 0) h2 += P2
      h2 = (h2 * B2 + cps(i + W - 1).toLong) % P2
      out(i) = h1 * P2 + h2
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SpanHashes(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_spanhashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    SpanHashMath.spanHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanHashMath.spanHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

/** Positional variant of [[SpanHashes]] — see
  * [[SpanHashMath.spanHashesPos]]. Exposed as `graft_spanhashes_pos`.
  */
case class SpanHashesPos(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_spanhashes_pos"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    SpanHashMath.spanHashesPos(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanHashMath.spanHashesPos($c)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashesPos =
    copy(child = newChild)
}
