package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge pass: replace every adjacent symbol pair (a, b) in
  * `syms` with the concatenated symbol `a || b`, greedy left-to-right —
  * the apply step of byte-pair-encoding training/encoding (Sennrich et
  * al. 2016). Greedy means: scan once; a match at position i is taken
  * iff position i was not consumed by a taken match at i-1 (so in a run
  * of overlapping matches — only possible when a = b — the 1st, 3rd, …
  * are taken: "aaaa" + (a,a) → [aa, aa], "aaa" → [aa, a]).
  *
  * This is the SINGLE definition of merge-application semantics; the
  * DuckDB oracle mirrors it relationally (match flags on the original
  * sequence → runs via gaps-and-islands → even offsets taken →
  * consumed successors dropped), and BpeSpec pins the two formulations
  * equal on the adversarial shapes (overlap runs, repeats, no-match,
  * single-symbol words). A merged symbol never re-matches within the
  * same pass — `a || b` equals `a` only if `b` is empty, and empty
  * symbols cannot occur (symbols are non-empty char splits and
  * concatenations thereof).
  */
case class BpeMergePass(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string, string), got " +
          s"(${s.catalogString}, ${a.catalogString}, ${b.catalogString})")
    }

  // containsNull mirrors the INPUT's: symbols never occur null on the
  // training path (char splits and concatenations thereof), but the
  // static type of e.g. a Seq[String]-encoded column is
  // containsNull=true, and declaring false over such an input would
  // lie to downstream null handling (ADVICE r13). compute propagates
  // null elements untouched (a null is never a merge operand).
  override def dataType: DataType =
    ArrayType(StringType, containsNull = first.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

  override def prettyName: String = "bpe_merge"

  override def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    BpeMergePass.compute(syms.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, a, b) =>
      s"${ev.value} = graft.functions.BpeMergePass.compute($s, $a, $b);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeMergePass =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMergePass {

  /** Greedy left-to-right merge of adjacent (a, b) into a||b. Public so
    * generated code can call it. Output strings are fresh copies —
    * inputs may alias transient row buffers. Null elements (possible
    * under a containsNull=true input type, never on the training path)
    * pass through unchanged and never match either operand — without
    * the explicit isNullAt guard, getUTF8String on a null slot would
    * NPE (ADVICE r13).
    */
  def compute(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (syms.isNullAt(i)) {
        out.add(null)
        i += 1
      } else {
        val cur = syms.getUTF8String(i)
        if (i + 1 < n && cur.equals(a) && !syms.isNullAt(i + 1) &&
            syms.getUTF8String(i + 1).equals(b)) {
          out.add(UTF8String.concat(a, b))
          i += 2
        } else {
          out.add(UTF8String.fromBytes(cur.getBytes))
          i += 1
        }
      }
    }
    ArrayData.toArrayData(out.toArray)
  }
}
