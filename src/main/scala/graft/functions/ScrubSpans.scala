package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Span-level dedup SCRUB (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better" — the REMOVE counterpart of the
  * span-dup MEASURES): given a document's normalized text and the set
  * of its winnowing-selected fingerprints that have an EARLIER carrier
  * elsewhere in the corpus (`staleFps` — computed relationally by
  * [[graft.operators.Corpus.spanScrub]] as min(doc_id)-per-fp over the
  * [[graft.operators.Corpus.docFps]] table), drop every character that
  * any stale span covers and return what survives.
  *
  * Contract (the DuckDB oracle mirrors it CTE-for-rule):
  *   - gram i (1-based char position, i ∈ [1, nChars-7]) is the
  *     8-character window starting at i; a document with fewer than 8
  *     characters has ONE gram at position 1 covering the whole text —
  *     exactly [[WinnowFps64]]'s gram grid, so fingerprints here and
  *     in the selection are the same 60-bit values ((unsigned 64-bit
  *     md5 prefix) >>> 4 = first 15 hex chars parsed base-16).
  *   - a gram position is SCRUBBED iff its fingerprint ∈ `staleFps`.
  *     Membership, not window-selection: fp equality means the 8-gram
  *     TEXT is identical (mod 60-bit collision, same both engines), so
  *     every occurrence of a duplicated span is removed, including
  *     occurrences the winnowing window happened not to select.
  *   - kept_text = the characters covered by NO scrubbed gram, in
  *     order (union-of-intervals complement); kept_chars counts them;
  *     n_scrubbed counts scrubbed gram START positions (pre-merge —
  *     the count an auditor can re-derive without interval logic).
  *
  * One O(chars) pass per document: the md5 grid is recomputed in place
  * (byte-offset table, no substring copies — the [[WinnowFps]]
  * machinery), stale membership is one hash-set probe per gram, and
  * coverage is a boolean array. No per-character explode exists
  * anywhere on the Spark side — the oracle's char-level reconstruction
  * is the DuckDB-side formulation only.
  */
case class ScrubSpans64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ScrubSpans64.outType

  override def prettyName: String = "scrub_spans64"

  override def nullSafeEval(text: Any, stale: Any): Any =
    ScrubSpans64.compute(text.asInstanceOf[UTF8String],
      stale.asInstanceOf[ArrayData])

  // One static call keeps the operator inside whole-stage codegen (the
  // WinnowFps pattern); the loop gains nothing from inlined Java.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, f) =>
      s"${ev.value} = graft.functions.ScrubSpans64.compute($t, $f);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ScrubSpans64 =
    copy(left = newLeft, right = newRight)
}

object ScrubSpans64 {

  import WinnowFps.{GramChars, charOffsets, tlMd5}

  val outType: StructType = StructType(Seq(
    StructField("kept_text", StringType, nullable = false),
    StructField("kept_chars", IntegerType, nullable = false),
    StructField("n_scrubbed", IntegerType, nullable = false)))

  /** Unsigned big-endian 64-bit prefix of md5(bytes[off, off+len)) —
    * shared with [[WinnowFps64]]'s selection (same value, same
    * truncation downstream).
    */
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

  /** Scrub `s` against the stale fingerprint set. Public so generated
    * code can call it.
    */
  def compute(s: UTF8String, stale: ArrayData): InternalRow = {
    val bytes = s.getBytes
    val (offs, nChars) = charOffsets(bytes)
    val nStale = stale.numElements()
    if (nStale == 0)
      return InternalRow(UTF8String.fromBytes(bytes), nChars, 0)
    // Null elements (possible under a containsNull=true static type —
    // e.g. coalesce against a DDL-cast empty array) are SKIPPED, not
    // read: getLong on a null slot silently yields 0, and 0 is a
    // legitimate 60-bit fingerprint value (ADVICE r13).
    val staleSet = new java.util.HashSet[java.lang.Long](
      Math.max(4, nStale * 2))
    var i = 0
    while (i < nStale) {
      if (!stale.isNullAt(i)) staleSet.add(stale.getLong(i))
      i += 1
    }
    if (staleSet.isEmpty)
      return InternalRow(UTF8String.fromBytes(bytes), nChars, 0)
    val md = tlMd5.get()
    var nScrubbed = 0
    val covered = new Array[Boolean](nChars)
    if (nChars >= GramChars) {
      val m = nChars - (GramChars - 1)
      var j = 0
      while (j < m) {
        val fp =
          md5Prefix(md, bytes, offs(j), offs(j + GramChars) - offs(j)) >>> 4
        if (staleSet.contains(fp)) {
          nScrubbed += 1
          var k = j
          while (k < j + GramChars) {
            covered(k) = true
            k += 1
          }
        }
        j += 1
      }
    } else {
      // The whole-text degenerate gram covers every character — a
      // sub-8-char document whose single fingerprint is stale keeps
      // nothing (it IS a verbatim copy of an earlier document).
      val fp = md5Prefix(md, bytes, 0, bytes.length) >>> 4
      if (staleSet.contains(fp)) {
        nScrubbed += 1
        var k = 0
        while (k < nChars) {
          covered(k) = true
          k += 1
        }
      }
    }
    if (nScrubbed == 0)
      return InternalRow(UTF8String.fromBytes(bytes), nChars, 0)
    // Kept bytes: copy each uncovered character's byte range once.
    var keptChars = 0
    var keptBytes = 0
    var c = 0
    while (c < nChars) {
      if (!covered(c)) {
        keptChars += 1
        keptBytes += offs(c + 1) - offs(c)
      }
      c += 1
    }
    val out = new Array[Byte](keptBytes)
    var o = 0
    c = 0
    while (c < nChars) {
      if (!covered(c)) {
        val len = offs(c + 1) - offs(c)
        System.arraycopy(bytes, offs(c), out, o, len)
        o += len
      }
      c += 1
    }
    InternalRow(UTF8String.fromBytes(out), keptChars, nScrubbed)
  }
}
