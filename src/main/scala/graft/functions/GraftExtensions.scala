package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production registration of graft's native expressions via the
  * extensions mechanism:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions …
  * }}}
  *
  * injects every graft function into each session built on the context —
  * no per-session `GraftFunctions.register` call needed, and the
  * functions resolve in plain SQL (`spark.sql("SELECT array_dot(a,b) …")`)
  * on executors-only deployments like Thrift/Connect servers.
  * `GraftFunctions.register` remains the in-process route (tests, ad-hoc
  * sessions); both bind the same expression constructors, so plans are
  * identical either way (GraftExtensionsSpec asserts resolution and
  * result parity).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String)(
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name), build))

    inject("array_dot")(es => ArrayDotProduct(es.head, es(1)))
    inject("simhash63")(es => SimHash63(es.head))
    inject("minhash_bands16x2")(es => MinHashBands(es.head, 16, 2))
    inject("shingles3")(es => Shingles3(es.head))
    inject("norm_text")(es => NormText(es.head))
    inject("winnow_fps")(es => WinnowFps(es.head))
    inject("winnow_fps64")(es => WinnowFps64(es.head))
    inject("norm_tokens")(es => NormTokens(es.head))
    inject("scrub_spans64")(es => ScrubSpans64(es.head, es(1)))
    inject("bpe_merge")(es => BpeMergePass(es.head, es(1), es(2)))
    inject("pair_expand_sz")(es => PairExpandSz(es.head,
      GraftFunctions.litIntArg(es(1), "pair_expand_sz p"),
      GraftFunctions.litIntArg(es(2), "pair_expand_sz q")))
    inject("pair_expand_cap")(es => PairExpandCap(es.head,
      GraftFunctions.litIntArg(es(1), "pair_expand_cap cap")))
  }
}
