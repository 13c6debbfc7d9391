package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("ivfTopK with probe-all equals brute-force cosineTopK exactly") {
    val spark = TestSpark.spark
    val e = Similarity.prepared(Tables.t(spark, dir, "embeddings"))
    // Probing every centroid list makes IVF exhaustive — the result must
    // be bit-identical to the brute-force top-k (same tie-break).
    val ivf = Similarity.ivfTopK(e, 5, 8, nProbe = 8, k = 5)
      .orderBy("q_id", "rn").collect()
    val brute = Similarity.cosineTopK(e, 5, 5)
      .orderBy("q_id", "rn").collect()
    assert(ivf.length == 25)
    assert(ivf.toSeq == brute.toSeq)
  }

  test("ivfTopK with nProbe < nCentroids returns k candidates per query " +
    "whose cosines are exact (subset of the brute-force ranking)") {
    val spark = TestSpark.spark
    val e = Similarity.prepared(Tables.t(spark, dir, "embeddings"))
    val ivf = Similarity.ivfTopK(e, 5, 8, nProbe = 2, k = 5).collect()
    assert(ivf.length == 25)
    val brute = Similarity.cosineTopK(e, 5, 500)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // Every returned (q, n) pair carries the same exact cosine the
    // brute-force scan computes — IVF narrows candidates, never alters
    // the metric.
    ivf.foreach { r =>
      assert(brute((r.getLong(0), r.getLong(1))) == r.getDouble(3))
    }
  }
}
