package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text normalization — native replacement for the
  * two-regex chain `trim(regexp_replace(regexp_replace(lower(text),
  * '[^a-z0-9 ]', ''), ' +', ' '))` (TextOps.normS), which runs the
  * java.util.regex engine twice over every document and dominated the
  * tokenize-heavy queries' CPU.
  *
  * Semantics are EXACTLY the regex chain's (TextOpsSpec asserts
  * equality on the corpus and on adversarial strings): lowercase, drop
  * every code point outside [a-z0-9 ], collapse space runs, trim.
  * ASCII inputs take a byte-level fast path; any non-ASCII input falls
  * back to Spark's own `UTF8String.toLowerCase` (the same call
  * `lower()` makes) followed by per-code-point filtering, so parity
  * with the regex formulation holds beyond ASCII too.
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "norm_text"

  override def nullSafeEval(input: Any): Any =
    NormTokens.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NormTokens.normalize($a);")

  override protected def withNewChildInternal(
      newChild: Expression): NormText = copy(child = newChild)
}

/** Normalized-token array — `filter(split(norm, ' '), x -> x != '')`
  * over the NormText normalization, in the same single pass (no
  * intermediate normalized string, no interpreted HOF filter).
  */
case class NormTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "norm_tokens"

  override def nullSafeEval(input: Any): Any =
    NormTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NormTokens.tokens($a);")

  override protected def withNewChildInternal(
      newChild: Expression): NormTokens = copy(child = newChild)
}

object NormTokens {

  private def isKept(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Lowercased byte stream with non-[a-z0-9 ] dropped, or null when
    * the input needs the non-ASCII fallback.
    */
  private def asciiFiltered(s: UTF8String): Array[Byte] = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var i = 0
    while (i < in.length) {
      var b = in(i)
      if (b < 0) return null // non-ASCII: caller falls back
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if (isKept(b) || b == ' ') { out(n) = b; n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Non-ASCII fallback: Spark's own lowercase (what `lower()` calls),
    * then the identical per-code-point filter.
    */
  private def unicodeFiltered(s: UTF8String): Array[Byte] = {
    val lowered = s.toLowerCase.toString
    val sb = new java.lang.StringBuilder(lowered.length)
    var i = 0
    while (i < lowered.length) {
      val cp = lowered.codePointAt(i)
      if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') ||
        cp == ' ') sb.append(cp.toChar)
      i += Character.charCount(cp)
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  private def filtered(s: UTF8String): Array[Byte] = {
    val fast = asciiFiltered(s)
    if (fast != null) fast else unicodeFiltered(s)
  }

  /** Public so generated code can call it. */
  def normalize(s: UTF8String): UTF8String = {
    val in = filtered(s)
    val out = new Array[Byte](in.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if (b == ' ') { if (n > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out(n) = ' '; n += 1; pendingSpace = false }
        out(n) = b; n += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  /** Public so generated code can call it. */
  def tokens(s: UTF8String): ArrayData = {
    val in = filtered(s)
    val toks = new java.util.ArrayList[AnyRef]()
    var start = -1
    var i = 0
    while (i <= in.length) {
      val boundary = i == in.length || in(i) == ' '
      if (boundary) {
        if (start >= 0) {
          toks.add(UTF8String.fromBytes(in, start, i - start))
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    new GenericArrayData(
      toks.toArray(new Array[AnyRef](toks.size)).asInstanceOf[Array[Any]])
  }
}
