package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native combination expansion for dedup candidate generation — the
  * Generator replacement for the interpreted
  * `explode(flatten(transform(ids, (x, i) -> transform(slice(...), ...))))`
  * chain (higher-order functions have no codegen, and the nested-lambda
  * formulation allocates O(k²) intermediate structs and slice copies per
  * bucket before the Generate pass re-walks them). One `eval` per bucket
  * row emits the pair rows directly.
  *
  * `pair_expand_sz(ids, p, q)` — `ids: array<struct<doc_id:long, sz:int>>`
  * (one element per doc in an inverted-index bucket; any order — the
  * generator sorts by doc_id so emitted pairs are canonical da < db).
  * Emits (da, sa, db, sb) for every i < j combination that survives the
  * SIZE-RATIO prefilter `q·min(sa,sb) ≥ p·max(sa,sb)`. The ratio filter
  * is a pure relaxation of the downstream count-prefilter
  * `c·(q+p) ≥ p·(sa+sb)` — shared-shingle count c never exceeds
  * min(sa,sb), so c·(q+p) ≥ p·(sa+sb) implies min·(q+p) ≥ p·(min+max),
  * i.e. q·min ≥ p·max — dropping these pairs BEFORE the candidate
  * shuffle cannot change the operator's output, it only removes rows
  * the aggregate-side filter was going to discard.
  *
  * `pair_expand_cap(ids, cap)` — `ids: array<long>` (an LSH (band, sig)
  * bucket; any order, sorted internally). Buckets within `cap` emit all
  * i < j combinations (da, db); buckets over it emit the bounded STAR —
  * min id × each other member, B−1 rows (see Dedup.BandCap for why
  * over-cap buckets must not be dropped: bands are fully correlated at
  * j≈1, so "another band catches it" does not hold).
  *
  * Both run as CodegenFallback generators: one interpreted call per
  * BUCKET (tens of thousands), each a tight primitive loop — versus the
  * HOF chain's per-element interpreted lambda dispatch over millions of
  * emitted structs.
  */
abstract class PairExpandBase extends UnaryExpression with Generator
    with CodegenFallback {

  // Reconcile UnaryExpression's concrete `eval: Any` with Generator's
  // abstract `eval: IterableOnce[InternalRow]`: the concrete override
  // here wins the linearization and delegates to `expand`.
  protected def expand(input: InternalRow): IterableOnce[InternalRow]

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    expand(input)

  /** Rows are freshly allocated per emit: GenerateExec may buffer the
    * iterator (outer generate, whole-stage consume), so a reused
    * mutable row would alias.
    */
  protected def row4(da: Long, sa: Int, db: Long, sb: Int): InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    r.setLong(0, da); r.setInt(1, sa); r.setLong(2, db); r.setInt(3, sb)
    r
  }

  protected def row2(da: Long, db: Long): InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    r.setLong(0, da); r.setLong(1, db)
    r
  }
}

case class PairExpandSz(child: Expression, p: Int, q: Int)
    extends PairExpandBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<long,int>>, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("da", LongType, nullable = false),
    StructField("sa", IntegerType, nullable = false),
    StructField("db", LongType, nullable = false),
    StructField("sb", IntegerType, nullable = false)))

  override def prettyName: String = "pair_expand_sz"

  override protected def expand(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = new Array[Long](n)
    val szs = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      // Null elements are treated as absent (collect_list never emits
      // them; direct SQL callers might).
      if (!arr.isNullAt(i)) {
        val st = arr.getStruct(i, 2)
        ids(m) = st.getLong(0)
        szs(m) = st.getInt(1)
        m += 1
      }
      i += 1
    }
    PairExpandBase.sortByIds(ids, szs, m)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val sa = szs(i); val sb = szs(j)
        val mn = if (sa < sb) sa else sb
        val mx = if (sa < sb) sb else sa
        if (q.toLong * mn >= p.toLong * mx)
          out += row4(ids(i), sa, ids(j), sb)
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): PairExpandSz = copy(child = newChild)
}

case class PairExpandCap(child: Expression, cap: Int)
    extends PairExpandBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("da", LongType, nullable = false),
    StructField("db", LongType, nullable = false)))

  override def prettyName: String = "pair_expand_cap"

  override protected def expand(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n0 = arr.numElements()
    if (n0 < 2) return Iterator.empty
    // Null elements are treated as absent (collect_list never emits
    // them; direct SQL callers might).
    val ids = new Array[Long](n0)
    var n = 0
    var k = 0
    while (k < n0) {
      if (!arr.isNullAt(k)) { ids(n) = arr.getLong(k); n += 1 }
      k += 1
    }
    java.util.Arrays.sort(ids, 0, n)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    if (n <= cap) {
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { out += row2(ids(i), ids(j)); j += 1 }
        i += 1
      }
    } else {
      // Bounded star: min id × each other member (B−1 rows, linear).
      var j = 1
      while (j < n) { out += row2(ids(0), ids(j)); j += 1 }
    }
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): PairExpandCap = copy(child = newChild)
}

object PairExpandBase {
  /** In-place dual-array insertion sort by ids over the first `n`
    * slots (buckets are df-capped, n ≤ a few hundred — allocation-free
    * beats asymptotics here).
    */
  def sortByIds(ids: Array[Long], szs: Array[Int], n: Int): Unit = {
    var i = 1
    while (i < n) {
      val id = ids(i); val sz = szs(i)
      var j = i - 1
      while (j >= 0 && ids(j) > id) {
        ids(j + 1) = ids(j); szs(j + 1) = szs(j); j -= 1
      }
      ids(j + 1) = id; szs(j + 1) = sz
      i += 1
    }
  }
}
