package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 3-word shingles over a token array — a single-pass codegen'd
  * replacement for the interpreted
  * `array_distinct(zip_with(zip_with(slice, slice, concat), slice,
  * concat))` chain (TextOps.shinglesS), which allocated three slice
  * copies plus two zipped intermediates per row and re-evaluated
  * interpreted lambdas per element.
  *
  * Output is EXACTLY the HOF formulation's: space-joined consecutive
  * token triples, deduplicated preserving first occurrence (the same
  * contract as `array_distinct` and the DuckDB oracle's
  * `list_distinct` — and since every consumer treats the result as a
  * set, order never reaches an oracle hash anyway). Fewer than 3 tokens
  * → empty array. Null elements do not occur (tokens are derived
  * non-null by construction).
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

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

  private val Space = UTF8String.fromString(" ")

  /** Public so generated code can call it. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // Enforce the no-nulls contract instead of silently diverging from
    // the HOF formulation (concatWs would skip a null and emit a wrong
    // 2-token shingle where the HOF chain yields null).
    var c = 0
    while (c < n) {
      if (arr.isNullAt(c)) throw new IllegalArgumentException(
        "shingles3: null token (input contract is non-null elements)")
      c += 1
    }
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i <= n - 3) {
      seen.add(UTF8String.concatWs(Space, arr.getUTF8String(i),
        arr.getUTF8String(i + 1), arr.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(
      seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
  }
}
