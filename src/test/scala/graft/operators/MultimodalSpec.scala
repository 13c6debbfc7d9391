package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  test("binary payload decode plumbing: schema, batching, determinism") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.documentsAsMedia(docs)
    val meta = Multimodal.extractMeta(media).cache()

    assert(meta.count() == docs.count())
    val m = meta.filter(_.doc_id == 0L).head()
    // Deterministic stub: dims derived from payload length.
    assert(m.width == m.byte_len % 640 + 1)
    assert(m.height == m.byte_len % 480 + 1)
    assert(Set("png", "jpeg", "empty").contains(m.format))
    // Running twice yields identical results (stub is pure).
    val again = Multimodal.extractMeta(media)
    assert(meta.collect().sortBy(_.doc_id)
      .sameElements(again.collect().sortBy(_.doc_id)))
    meta.unpersist()
  }

  test("frame sampling emits every kth fixed-size frame; resize keeps " +
    "the size contract; features feed the similarity operators") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.documentsAsMedia(docs)

    val frames = Multimodal.sampleFrames(media, frameBytes = 64, every = 5)
    val f = frames.filter(_.doc_id == 0L).collect().sortBy(_.frame_idx)
    assert(f.nonEmpty && f.map(_.frame_idx).forall(_ % 5 == 0))
    assert(f.init.forall(_.frame.length == 64)) // only the tail is short

    assert(Multimodal.resizeStub(Array[Byte](1, 2, 3), 4, 2).length == 8)
    assert(Multimodal.resizeStub(new Array[Byte](100), 4, 2).length == 8)

    val feats = Multimodal.byteHistogram(media)
    val v = feats.filter(_.doc_id == 0L).head().features
    assert(v.length == 16 && math.abs(v.sum - 1.0) < 1e-9)
    // The features column is directly consumable by the similarity API
    // (same shape as an embedding column).
    val e = feats.toDF("vec_id", "embedding")
    assert(Similarity.prepared(e).select("nrm").head().getDouble(0) > 0)
  }
}
