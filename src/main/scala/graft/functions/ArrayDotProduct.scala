package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array&lt;double&gt; columns — the custom
  * Catalyst Expression path SURVEY.md §7.3 reserves for exactly this
  * operator: the higher-order-function formulation
  * (`aggregate(zip_with(a, b, ...), ...)`) is interpreted (HOFs have no
  * codegen), allocates a zipped intermediate array per row, and
  * re-boxes every element; this expression is a whole-stage-codegen'd
  * tight loop over the unsafe array data.
  *
  * Summation is the same left-to-right sequential fold as the HOF
  * version and the DuckDB oracle's list_reduce — results are
  * bit-identical, so swapping implementations does not perturb any
  * oracle hash.
  *
  * Null handling: null arrays propagate null (BinaryExpression default);
  * null *elements* read as 0.0 (embeddings carry none — documented
  * contract, avoids a per-element branch in the hot loop). Lengths may
  * differ; the shorter bounds the loop.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native functions into a session's function
  * registry, so queries reach them through `expr("array_dot(a, b)")` —
  * the stable public route across Spark 4's Column API changes.
  */
object GraftFunctions {

  // Idempotency guard: registration is called from every query entry
  // point (Tables.t), and re-registering logs a replacement WARN per
  // function per call otherwise.
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      registered.add(spark)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "array_dot",
        exprs => ArrayDotProduct(exprs.head, exprs(1)),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "simhash63",
        exprs => SimHash63(exprs.head),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "minhash_bands16x2",
        exprs => MinHashBands(exprs.head, 16, 2),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "shingles3",
        exprs => Shingles3(exprs.head),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "norm_text",
        exprs => NormText(exprs.head),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "winnow_fps",
        exprs => WinnowFps(exprs.head),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "winnow_fps64",
        exprs => WinnowFps64(exprs.head),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "norm_tokens",
        exprs => NormTokens(exprs.head),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "scrub_spans64",
        exprs => ScrubSpans64(exprs.head, exprs(1)),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bpe_merge",
        exprs => BpeMergePass(exprs.head, exprs(1), exprs(2)),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "pair_expand_sz",
        exprs => PairExpandSz(exprs.head,
          litInt(exprs(1), "pair_expand_sz p"),
          litInt(exprs(2), "pair_expand_sz q")),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "pair_expand_cap",
        exprs => PairExpandCap(exprs.head,
          litInt(exprs(1), "pair_expand_cap cap")),
        "built-in")
    }
  }

  /** Fold a literal int argument at registration time (the generator's
    * thresholds are plan constants, not per-row expressions). Shared
    * with GraftExtensions.
    */
  private[functions] def litIntArg(e: Expression, what: String): Int =
    litInt(e, what)

  private def litInt(e: Expression, what: String): Int = e match {
    case lit if lit.foldable =>
      lit.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$what must be an integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(
      s"$what must be a literal")
  }
}
