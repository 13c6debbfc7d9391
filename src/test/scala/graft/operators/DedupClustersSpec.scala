package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DedupClustersSpec extends AnyFunSuite {

  test("min-label propagation finds components: chain, triangle, pair") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("da", "db")
    val out = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a long chain converges within the iteration cap") {
    val spark = TestSpark.spark
    import spark.implicits._
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("da", "db")
    val out = Dedup.nearDupClusters(chain).as[(Long, Long)].collect()
    assert(out.length == 31 && out.forall(_._2 == 0L))
  }
}
