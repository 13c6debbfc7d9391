package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for [[Profile.dataProfile]] the oracle row cannot carry:
  * null semantics on a designed frame, the double micro-quantization,
  * and the single-scan plan shape (stack over ONE aggregate — not a
  * union of per-column scans).
  */
class ProfileSpec extends AnyFunSuite {

  test("profile counts nulls and distincts per column, quantizes " +
    "doubles to micro, and NULLs the unused representation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a"), Some(1.25)),
      (Some(2L), None, Some(-0.0000015)),
      (Some(2L), Some("b"), None),
      (None, Some("b"), Some(1.25)))
      .toDF("k", "s", "v")
    val rows = Profile.dataProfile(df, Seq(
        "k" -> Profile.IntLike, "s" -> Profile.StrLike,
        "v" -> Profile.DblLike))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getLong(1) == 4L && k.getLong(2) == 3L && k.getLong(3) == 2L)
    assert(k.getString(4) == "1" && k.getString(5) == "2")
    assert(k.isNullAt(6) && k.isNullAt(7))
    val s = rows("s")
    assert(s.getLong(2) == 3L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    val v = rows("v")
    assert(v.getLong(2) == 3L && v.getLong(3) == 2L)
    assert(v.isNullAt(4) && v.isNullAt(5))
    // floor(-0.0000015e6 + 0.5) = floor(-1) = -1; 1.25e6 exact.
    assert(v.getLong(6) == -1L && v.getLong(7) == 1250000L)
  }

  test("quality checks fail loudly on a designed bad drop and pass " +
    "a clean or empty one, with the violation witness observed") {
    val spark = TestSpark.spark
    import spark.implicits._
    val bad = Seq(
      (Some(1L), Some(10.0)), (Some(1L), Some(-3.5)),
      (None, Some(700000.0)), (Some(3L), None))
      .toDF("k", "v")
    val checks = Seq(
      Profile.Complete("k", 1000000L),
      Profile.Unique("k"),
      Profile.InRange("v", 0L, 600000000000L))
    val got = Profile.qualityChecks(bad, checks).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // 3 of 4 non-null → 750000 micro, fails the 1.0 bar.
    assert(got(("complete", "k")) == (750000L, false))
    // distinct 2 < non-null 3 → dup key.
    assert(got(("unique", "k")) == (2L, false))
    // min -3.5 breaches lo → the min is the witness.
    assert(got(("in_range", "v")) == (-3500000L, false))
    val empty = bad.filter(lit(false))
    assert(Profile.qualityChecks(empty, checks).collect()
      .forall(_.getBoolean(3)),
      "an empty drop must pass every check (nothing to reject)")
    val clean = Seq((1L, 10.0), (2L, 20.5)).toDF("k", "v")
    assert(Profile.qualityChecks(clean, checks).collect()
      .forall(_.getBoolean(3)))
  }

  test("approx profile: ONE ungrouped aggregate over one scan — no " +
    "expand, no sort — with distincts inside the HLL envelope") {
    val spark = TestSpark.spark
    val df = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val colsSpec = Seq(
      "o_orderkey" -> Profile.IntLike,
      "o_orderstatus" -> Profile.StrLike,
      "o_totalprice" -> Profile.DblLike)
    val out = Profile.approxProfile(df, colsSpec)
    val plan = out.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1 &&
      !plan.contains("Expand") && !plan.contains("Sort ["),
      s"approx profile must be one streaming pass:\n$plan")
    val got = out.collect().map(r => r.getString(0) -> r).toMap
    val exact = Profile.dataProfile(df, colsSpec).collect()
      .map(r => r.getString(0) -> r).toMap
    colsSpec.foreach { case (c, _) =>
      val (a, e) = (got(c), exact(c))
      // Everything but n_distinct is computed identically.
      assert(a.getLong(1) == e.getLong(1) &&
        a.getString(4) == e.getString(4) && a.getString(5) == e.getString(5),
        s"$c: non-distinct fields must match the exact profile")
      val (ad, ed) = (a.getLong(3).toDouble, e.getLong(3).toDouble)
      assert(math.abs(ad - ed) / math.max(ed, 1.0) < 0.05,
        s"$c: approx distinct $ad too far from exact $ed")
    }
  }

  test("the profile is two sortless streaming passes: no per-column " +
    "union of scans, and no Sort anywhere in the plan") {
    val spark = TestSpark.spark
    val df = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val plan = Profile.dataProfile(df, Seq(
        "o_orderkey" -> Profile.IntLike,
        "o_orderstatus" -> Profile.StrLike,
        "o_totalprice" -> Profile.DblLike))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"),
      s"profile must not union per-column scans:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 2,
      s"profile must be exactly the two aggregate passes:\n$plan")
    // The regression this pins: string min/max mixed into the
    // countDistinct aggregate demotes it to a SortAggregate that
    // sorts the expanded input — a corpus sort at scale.
    assert(!plan.contains("Sort ["),
      s"profile must never sort the input:\n$plan")
  }
}
