package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Distinct 3-word shingles over a token array, emitted as PRE-HASHED
  * int64 keys — a single-pass codegen'd stage that replaces both the
  * interpreted string-shingle HOF chain it replaced and every
  * downstream per-shingle re-hash (`xxhash64(s)` in the inverted index,
  * `transform(sh, s -> xxhash64(s))` ahead of minhash banding).
  *
  * Hashing at creation is the scale design: shingle strings (~3 words,
  * ~20 bytes UTF8) never materialize, so shingle-set memory roughly
  * halves and every set operation downstream — exact-Jaccard
  * `array_intersect`/`array_union` verification, inverted-index
  * grouping, minhash — runs on fixed-width longs instead of per-element
  * UTF8 comparisons.
  *
  * Portable hash contract (replicated in the DuckDB oracle,
  * TextOps.docShinglesCteD): per token, SimHash63.tokenHash — the left
  * fold `(a*31 + codePoint) mod 1e9+7` the oracle computes with
  * `list_reduce(string_split(t, ''), ...)`; per window (h1, h2, h3),
  * two independent combinations
  * `lo = ((h1*31 + h2) mod M * 31 + h3) mod M` and
  * `hi = ((h1*37 + h2) mod M * 37 + h3) mod M`, packed as
  * `hi * 2^30 + lo` (lo < M < 2^30, so the packing is injective and
  * every intermediate fits a 64-bit signed integer in both engines —
  * DuckDB BIGINT arithmetic errors on overflow just like ANSI Spark).
  * ~60 bits of shingle identity: window-level collisions need BOTH
  * 30-bit forms to collide (~1/M² per distinct pair); token-level
  * collisions (30-bit token space) are possible but produced
  * IDENTICALLY by both engines, so oracle parity is exact either way.
  * In production, where cross-engine bit-parity is not required, swap
  * tokenHash for xxhash64 (same shape, full 64-bit identity).
  *
  * Dedup keeps first occurrence (LinkedHashSet — same contract as
  * `array_distinct`; every consumer treats the result as a set, so
  * order never reaches an oracle hash anyway). Fewer than 3 tokens →
  * empty array. Null elements do not occur (tokens are derived
  * non-null by construction).
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any =
    Shingles3.compute(input.asInstanceOf[ArrayData])

  // One static call keeps the operator inside whole-stage codegen (no
  // CodegenFallback row-at-a-time path); the loop itself gains nothing
  // from being inlined into generated Java.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Shingles3.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): Shingles3 = copy(child = newChild)
}

object Shingles3 {

  private val Mod = 1000000007L

  /** Public so generated code can call it. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // Enforce the no-nulls contract instead of silently hashing a
    // wrong 2-token window where the string formulation yields null.
    var c = 0
    while (c < n) {
      if (arr.isNullAt(c)) throw new IllegalArgumentException(
        "shingles3: null token (input contract is non-null elements)")
      c += 1
    }
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = SimHash63.tokenHash(arr.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    i = 0
    while (i <= n - 3) {
      val lo = ((th(i) * 31L + th(i + 1)) % Mod * 31L + th(i + 2)) % Mod
      val hi = ((th(i) * 37L + th(i + 1)) % Mod * 37L + th(i + 2)) % Mod
      seen.add(hi * 1073741824L + lo)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    ArrayData.toArrayData(out)
  }
}
