package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection — the distinct set of
  * min-md5-per-window fingerprints over character 8-grams (window 4),
  * as one O(chars) pass. Semantically identical to the HOF formulation
  *
  * {{{
  *   array_distinct(
  *     if(size(grams) >= 4,
  *        transform(sequence(1, size(grams) - 3),
  *          j -> array_min(slice(grams, j, 4))),
  *        array(array_min(grams))))
  *   -- grams = if(length(s) >= 8,
  *   --           transform(sequence(1, length(s) - 7),
  *   --             i -> md5(substring(s, i, 8))),
  *   --           array(md5(s)))
  * }}}
  *
  * (WinnowFpsSpec asserts element equality) but ~1000× cheaper on real
  * documents: the HOF chain is interpreted (ArrayTransform never enters
  * codegen), materializes two O(n) string arrays per row, pays
  * O(position) per `substring` call (UTF8String seeks from the start —
  * the chain is O(n²) per document), and — fatally for the span-dup
  * query — gets inlined by InferFiltersFromGenerate + projection
  * collapse into a pre-Generate PREDICATE, so the whole chain runs
  * per-row as an interpreted filter before running again in the
  * Generate (measured: span_dup_rate at sf0.1 did not finish in 10
  * minutes interpreted; < 1 s native). Here: one byte-offset table,
  * md5 over byte slices in place (no substring copies), a 4-element
  * min scan, and a hash set for distinctness.
  *
  * Portability contract: md5 of the UTF-8 bytes of each 8-CHARACTER
  * (code point) window, lowercase hex, lexicographic min — exactly
  * Spark's `md5(substring(...))` and DuckDB's `md5(...[i:i+7])` on the
  * same text, so oracle hash-parity is preserved. First-occurrence
  * order matches `array_distinct`.
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String])

  // One static call keeps the operator inside whole-stage codegen (the
  // SimHash63 pattern); the loop gains nothing from inlined Java.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowFps.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFps = copy(child = newChild)
}

object WinnowFps {

  private[functions] val GramChars = 8
  private[functions] val WindowSize = 4

  private val hexDigits = "0123456789abcdef".toCharArray

  // MessageDigest is stateful and not thread-safe; one per executor
  // thread, reset per gram (getInstance per call measured ~3× the md5
  // itself on 8-byte inputs).
  private[functions] val tlMd5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Byte offset of each character (code point) start in `bytes`, plus
    * an end sentinel; returns (offsets, nChars).
    */
  private[functions] def charOffsets(
      bytes: Array[Byte]): (Array[Int], Int) = {
    val nBytes = bytes.length
    val offs = new Array[Int](nBytes + 1)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      offs(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nChars) = nBytes
    (offs, nChars)
  }

  private def md5hex(md: MessageDigest, bytes: Array[Byte], off: Int,
      len: Int): String = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distinct winnowing-selected fingerprints of `s`. Public so
    * generated code can call it.
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    val md = tlMd5.get()
    // Window i (1-based char position) spans
    // bytes[offs(i-1), offs(i-1+GramChars)).
    val (offs, nChars) = charOffsets(bytes)
    val grams: Array[String] =
      if (nChars >= GramChars) {
        val m = nChars - (GramChars - 1)
        val g = new Array[String](m)
        var j = 0
        while (j < m) {
          g(j) = md5hex(md, bytes, offs(j), offs(j + GramChars) - offs(j))
          j += 1
        }
        g
      } else Array(md5hex(md, bytes, 0, nBytes))
    val m = grams.length
    // LinkedHashSet preserves first-occurrence order = array_distinct.
    val selected = new java.util.LinkedHashSet[String]()
    if (m >= WindowSize) {
      var j = 0
      while (j + WindowSize <= m) {
        var mn = grams(j)
        var k = j + 1
        while (k < j + WindowSize) {
          if (grams(k).compareTo(mn) < 0) mn = grams(k)
          k += 1
        }
        selected.add(mn)
        j += 1
      }
    } else {
      var mn = grams(0)
      var k = 1
      while (k < m) {
        if (grams(k).compareTo(mn) < 0) mn = grams(k)
        k += 1
      }
      selected.add(mn)
    }
    val out = new Array[AnyRef](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(it.next())
      o += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** [[WinnowFps]] emitting 60-bit integer fingerprints (the first 15
  * hex chars of each selected md5 parsed base-16 — always positive in
  * a signed long) instead of 32-char hex strings. The shuffle-heavy
  * consumers ([[graft.operators.Corpus.docFps]] feeding the span
  * operators) group/join on the fingerprint, and an 8-byte long
  * shuffles, hashes, and compares several times cheaper than a 32-byte
  * UTF8String — the same win as the round-6 int64 pre-hashed shingles.
  *
  * Parity contract: selection compares grams by their UNSIGNED 64-bit
  * md5 prefix, which orders identically to the lexicographic hex
  * compare wherever the prefixes differ; on a 64-bit prefix tie the
  * full-hex min and the prefix min can disagree about WHICH gram is
  * selected, but both truncate to the same 60-bit value, so the
  * emitted set is identical to `transform(winnow_fps(s), x ->
  * conv(substring(x, 1, 15), 16, 10))` element-for-element
  * (WinnowFpsSpec pins this; DuckDB mirrors it as
  * `CAST('0x' || substring(fp, 1, 15) AS BIGINT)`). 60-bit collision
  * bound: distinct spans collide at the 2^30-span birthday scale —
  * acceptable for the dup-RATE measure (winnowing sampling is already
  * an approximation), identical in both engines by construction.
  */
case class WinnowFps64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fps64"

  override def nullSafeEval(input: Any): Any =
    WinnowFps64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowFps64.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFps64 = copy(child = newChild)
}

object WinnowFps64 {

  import WinnowFps.{GramChars, WindowSize, charOffsets, tlMd5}

  /** Unsigned big-endian 64-bit prefix of md5(bytes[off, off+len)). */
  private def md5Prefix(md: java.security.MessageDigest,
      bytes: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v
  }

  /** Distinct winnowing-selected 60-bit fingerprints of `s`. Public so
    * generated code can call it.
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    val md = tlMd5.get()
    val (offs, nChars) = charOffsets(bytes)
    val grams: Array[Long] =
      if (nChars >= GramChars) {
        val m = nChars - (GramChars - 1)
        val g = new Array[Long](m)
        var j = 0
        while (j < m) {
          g(j) = md5Prefix(md, bytes, offs(j), offs(j + GramChars) - offs(j))
          j += 1
        }
        g
      } else Array(md5Prefix(md, bytes, 0, nBytes))
    val m = grams.length
    // LinkedHashSet preserves first-occurrence order = array_distinct
    // over the truncated values.
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    if (m >= WindowSize) {
      var j = 0
      while (j + WindowSize <= m) {
        var mn = grams(j)
        var k = j + 1
        while (k < j + WindowSize) {
          if (java.lang.Long.compareUnsigned(grams(k), mn) < 0) mn = grams(k)
          k += 1
        }
        selected.add(mn >>> 4)
        j += 1
      }
    } else {
      var mn = grams(0)
      var k = 1
      while (k < m) {
        if (java.lang.Long.compareUnsigned(grams(k), mn) < 0) mn = grams(k)
        k += 1
      }
      selected.add(mn >>> 4)
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = it.next()
      o += 1
    }
    ArrayData.toArrayData(out)
  }
}
