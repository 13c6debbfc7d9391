package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native pair-expansion generators must emit exactly the pairs the
  * interpreted HOF formulation they replaced emitted (modulo the
  * provably output-neutral size-ratio prefilter, asserted separately).
  */
class PairExpandSpec extends AnyFunSuite {

  private val expandPairsHof: String =
    """flatten(transform(ids, (x, i) ->
      |  transform(slice(ids, i + 2, size(ids) - i - 1),
      |    y -> named_struct('da', x.doc_id, 'sa', x.sz,
      |                      'db', y.doc_id, 'sb', y.sz))))""".stripMargin

  private val starPairsHof: String =
    """transform(slice(ids, 2, size(ids) - 1),
      |  y -> named_struct('da', element_at(ids, 1), 'db', y))""".stripMargin

  private val fullPairsHof: String =
    """flatten(transform(ids, (x, i) ->
      |  transform(slice(ids, i + 2, size(ids) - i - 1),
      |    y -> named_struct('da', x, 'db', y))))""".stripMargin

  private def buckets(seed: Long, n: Int, maxB: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { g =>
      val k = 1 + rnd.nextInt(maxB)
      // Distinct ids per bucket (an inverted-index bucket never repeats
      // a doc); random order to exercise the generator's internal sort.
      val ids = rnd.shuffle((1 to 500).toList).take(k).map(_.toLong)
      val szs = ids.map(_ => 1 + rnd.nextInt(100))
      (g.toLong, ids.zip(szs))
    }
  }

  test("pair_expand_sz equals sorted HOF expansion with the ratio filter " +
    "applied") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val (p, q) = (3, 10)
    val df = buckets(7L, 200, 30).toDF("g", "pairs")
      .select(col("g"), expr(
        "transform(pairs, s -> named_struct('doc_id', s._1, 'sz', s._2))")
        .as("ids"))
    val native = df.select(expr(s"pair_expand_sz(ids, $p, $q)"))
      .select("da", "sa", "db", "sb")
    val hof = df
      .select(expr(s"sort_array(ids)").as("ids"))
      .select(explode(expr(expandPairsHof)).as("pr"))
      .select(col("pr.da").as("da"), col("pr.sa").as("sa"),
        col("pr.db").as("db"), col("pr.sb").as("sb"))
      .filter(expr(s"$q * least(sa, sb) >= $p * greatest(sa, sb)"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // Canonical ordering: da < db on every emitted row.
    assert(native.filter(col("da") >= col("db")).isEmpty)
  }

  test("ratio filter is a pure relaxation of the count-prefilter: " +
    "every pair passing c·(q+p) ≥ p·(sa+sb) has q·min ≥ p·max") {
    // c ≤ min(sa, sb), so c·(q+p) ≥ p·(sa+sb) ⇒ min·(q+p) ≥ p·(min+max)
    // ⇒ q·min ≥ p·max. Exhaustive over the fixture-relevant domain.
    val (p, q) = (3, 10)
    for (sa <- 1 to 120; sb <- 1 to 120) {
      val cMax = math.min(sa, sb)
      val passesCount = cMax.toLong * (q + p) >= p.toLong * (sa + sb)
      val passesRatio =
        q.toLong * math.min(sa, sb) >= p.toLong * math.max(sa, sb)
      assert(!passesCount || passesRatio,
        s"count-prefilter admits ($sa,$sb) but ratio filter rejects")
    }
  }

  test("pair_expand_cap equals HOF full expansion under the cap and the " +
    "HOF star over it") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val cap = 10
    val rnd = new scala.util.Random(11L)
    val df = (1 to 200).map { g =>
      val k = 2 + rnd.nextInt(25)
      (g.toLong, rnd.shuffle((1 to 500).toList).take(k).map(_.toLong))
    }.toDF("g", "ids")
    val native = df.select(expr(s"pair_expand_cap(ids, $cap)"))
      .select("da", "db")
    val hof = df.select(expr("sort_array(ids)").as("ids"))
      .select(explode(expr(
        s"if(size(ids) <= $cap, $fullPairsHof, $starPairsHof)")).as("pr"))
      .select(col("pr.da").as("da"), col("pr.db").as("db"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("null ELEMENTS are treated as absent (collect_list never emits " +
    "them; direct SQL callers might)") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(Some(3L), None, Some(1L), Some(2L))))
      .toDF("g", "ids")
    val cap = df.select(expr("pair_expand_cap(ids, 10)")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cap === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val sz = df.select(expr(
      "transform(ids, x -> if(x is null, null, " +
        "named_struct('doc_id', x, 'sz', 5)))").as("ids"))
      .select(expr("pair_expand_sz(ids, 3, 10)")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(sz === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("degenerate buckets: empty, singleton, and null arrays emit " +
    "nothing") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[Long])),
      (2L, Some(Seq(42L))),
      (3L, None)
    ).toDF("g", "ids")
    assert(df.select(expr("pair_expand_cap(ids, 5)")).count() === 0)
    val szDf = df.select(col("g"), expr(
      "transform(ids, x -> named_struct('doc_id', x, 'sz', 3))").as("ids"))
    assert(szDf.select(expr("pair_expand_sz(ids, 3, 10)")).count() === 0)
  }
}
