package graft.operators

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The repeat-cadence DISCRIMINATING witness for curation_chain_incr2
  * (VERDICT r15 #3): the fixture corpora rarely produce a batch-2 doc
  * that near-dups an epoch-1 doc, so the declared query's oracle gates
  * the semantics but the data cannot separate "probes the post-append
  * snapshot" from the two wrong memberships — probing ALL of batch 1
  * (a budget-dropped doc would still shadow batch 2) or probing only
  * the original residents (an admitted doc would never shadow). This
  * corpus forces both edges at once:
  *
  *  - X (batch 1) survives dedup and is budget-ADMITTED → in the
  *    post-epoch-1 snapshot → its batch-2 near-dup X' MUST be flagged.
  *  - Y (batch 1) survives dedup but is budget-DROPPED → absent from
  *    the snapshot → its batch-2 near-dup Y' MUST NOT be flagged.
  *
  * A membership bug in either direction changes the dup set; asserting
  * the exact ids (not counts) pins it.
  */
class ChainIncr2Spec extends AnyFunSuite {

  private def words(pfx: String, n: Int): String =
    (1 to n).map(i => f"$pfx$i%03d").mkString(" ")

  test("epoch-2 probes exactly the post-epoch-1 snapshot: admitted " +
    "batch-1 docs shadow batch 2, budget-dropped ones do not") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-incr2spec").toString

    val xText = words("xa", 100) // ~500 norm chars — admitted first
    val yText = words("yb", 80) //  ~400 — prefix-sum rejects (X+Y > B)
    val zText = words("zc", 40) //  ~200 — rejected too
    // Near-dups: identical but for the last word → 3 of ~n-2 token
    // 3-shingles differ; jaccard ≈ 0.94/0.93 ≥ 0.8.
    val xDup = words("xa", 99) + " other"
    val yDup = words("yb", 79) + " other"
    val rows = Seq(
      (1L, words("ra", 50)), (3L, words("rb", 50)),
      (5L, words("rc", 50)), // residents (odd)
      (4L, xText), (8L, yText), (12L, zText), // batch 1 (% 4 == 0)
      (6L, xDup), (10L, yDup), (14L, words("wd", 20)) // batch 2 (% 4 == 2)
    )
    rows.map { case (id, tx) => (id, tx, "en", "s1", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet

    assert(ids(ChainQueries.incr2Dups1(spark, dir)) === Set.empty[Long],
      "no batch-1 doc near-dups a resident")
    assert(ids(ChainQueries.incr2Adm1(spark, dir)) === Set(4L),
      "the per-language budget (half the batch mass) admits only the " +
        "largest survivor X; Y and Z are prefix-sum rejected")
    assert(ids(ChainQueries.incr2Dups2(spark, dir)) === Set(6L),
      "X' must be flagged (X is a snapshot member) and Y' must NOT be " +
        "(Y was budget-dropped and never entered the store)")
    val store = StoreManifest.snapshotRead(spark,
      ChainQueries.incr2Store(spark, dir))
    assert(ids(store) === Set(1L, 3L, 5L, 4L),
      "final snapshot = residents + epoch-1's admitted X (epoch 2 " +
        "admits nothing here: Y' alone exceeds its half-mass budget)")
  }
}
