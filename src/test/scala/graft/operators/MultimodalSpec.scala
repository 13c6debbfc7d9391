package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  /** Expected decoded pixel sum per the renderPayload rule. */
  private def expectedSum(id: Long): Long = {
    val (w, h) = (Multimodal.ruleWidth(id), Multimodal.ruleHeight(id))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += (if (id % 3 == 0)
        (7L * x + id) % 256 + (13L * y + id) % 256 + (x + y + id) % 256
      else (7L * x + 13L * y + id) % 256)
    sum
  }

  test("payloads are genuine PNG/JPEG byte streams (magic bytes)") {
    val png = Multimodal.renderPayload(1L) // 1 % 4 != 0 → png
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
      png(3) == 'G')
    val jpg = Multimodal.renderPayload(4L) // 4 % 4 == 0 → jpeg
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
  }

  test("ImageIO decode recovers dimensions, bands, format, and exact " +
    "pixels for PNG") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(40)
    val media = Multimodal.mediaTable(docs)
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == 40)
    meta.foreach { m =>
      assert(m.width == Multimodal.ruleWidth(m.doc_id))
      assert(m.height == Multimodal.ruleHeight(m.doc_id))
      assert(m.channels == Multimodal.ruleChannels(m.doc_id))
      assert(m.format == Multimodal.ruleFormat(m.doc_id))
      if (m.format == "png")
        assert(m.px_sum.contains(expectedSum(m.doc_id)),
          s"doc ${m.doc_id}: decoded sum ${m.px_sum} != expected")
      else assert(m.px_sum.isEmpty)
    }
  }

  test("nearest-neighbor resize round-trips through a real PNG " +
    "re-encode with exact integer source mapping") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 6L, 9L, 11L) // png rows, gray + rgb
    val media = Multimodal.mediaTable(ids.toDF("doc_id"))
    val out = Multimodal.decodeMeta(
      Multimodal.resizeNearest(media, 12, 10)).collect()
    assert(out.length == ids.length)
    out.foreach { m =>
      assert(m.width == 12 && m.height == 10)
      assert(m.channels == Multimodal.ruleChannels(m.doc_id))
      val (srcW, srcH) = (Multimodal.ruleWidth(m.doc_id),
        Multimodal.ruleHeight(m.doc_id))
      var exp = 0L
      for (y <- 0 until 10; x <- 0 until 12) {
        val sx = x * srcW / 12
        val sy = y * srcH / 10
        exp += (if (m.doc_id % 3 == 0)
          (7L * sx + m.doc_id) % 256 + (13L * sy + m.doc_id) % 256 +
            (sx + sy + m.doc_id) % 256
        else (7L * sx + 13L * sy + m.doc_id) % 256)
      }
      assert(m.px_sum.contains(exp), s"doc ${m.doc_id}")
    }
  }

  test("permissive decode quarantines corrupt payloads without failing " +
    "the batch; strict decode dies on the same input") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(60)
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val planted = ids.filter(Multimodal.ruleCorrupt).toSet
    assert(planted.nonEmpty && planted.size < ids.length,
      "fixture must carry both corrupt and clean payloads")
    val media = Multimodal.corruptedMediaTable(docs)
    // The batch COMPLETES — one row per input, never a task failure.
    val out = Multimodal.decodeMetaPermissive(media).collect()
    assert(out.length == ids.length)
    out.foreach { r =>
      if (planted(r.doc_id)) {
        assert(!r.decode_ok && r.error.nonEmpty,
          s"doc ${r.doc_id}: planted corruption not quarantined")
        assert(r.width.isEmpty && r.height.isEmpty && r.channels.isEmpty
          && r.format.isEmpty && r.px_sum.isEmpty)
      } else {
        assert(r.decode_ok && r.error.isEmpty,
          s"doc ${r.doc_id}: clean payload misclassified: ${r.error}")
        assert(r.width.contains(Multimodal.ruleWidth(r.doc_id)) &&
          r.height.contains(Multimodal.ruleHeight(r.doc_id)) &&
          r.channels.contains(Multimodal.ruleChannels(r.doc_id)) &&
          r.format.contains(Multimodal.ruleFormat(r.doc_id)))
      }
    }
    // Both planted shapes appear: claimed-then-failed (truncated) and
    // never-claimed (garbage bytes) — the two distinct failure paths.
    val errs = out.filter(r => planted(r.doc_id))
      .map(r => (r.doc_id, r.error.get))
    assert(errs.exists(_._1 % 7 == 3) &&
      errs.exists(e => e._1 % 7 != 3 && e._1 % 11 == 5))
    // Contrast: the strict path fails the job on the same input — the
    // behavior the permissive variant exists to avoid.
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(media).collect()
    }
    assert(ex.getMessage != null)
  }

  test("decompression-bomb guard: a payload declaring huge dimensions " +
    "is quarantined from the HEADER alone, never decoded") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Craft the classic bomb: a real (small) JPEG whose SOF0 header is
    // edited to declare 65500×65500 (the JDK reader's own per-axis
    // maximum, so the header parses cleanly) — JPEG carries no CRC, so
    // the reader trusts it; fully decoding would allocate a ~12.9 GB
    // raster and die fatally (OutOfMemoryError), which the NonFatal
    // quarantine cannot catch. The guard must reject on header dims
    // before any raster exists.
    val base = Multimodal.renderPayload(4L) // 4 % 4 == 0 → jpeg
    val bomb = base.clone()
    val sof = bomb.indices.dropRight(1).find(j =>
      (bomb(j) & 0xff) == 0xff && (bomb(j + 1) & 0xff) == 0xc0).get
    // SOF0 layout: marker(2) len(2) precision(1) height(2) width(2);
    // 65500 = 0xFFDC.
    Seq(5, 7).foreach { k =>
      bomb(sof + k) = 0xff.toByte
      bomb(sof + k + 1) = 0xdc.toByte
    }
    val out = Multimodal.decodeMetaPermissive(
      Seq(Multimodal.MediaRow(1L, bomb), Multimodal.MediaRow(2L, base))
        .toDS()).collect().map(r => r.doc_id -> r).toMap
    val b = out(1L)
    assert(!b.decode_ok && b.width.isEmpty &&
      b.error.exists(_.contains("pixel budget exceeded")),
      s"bomb not quarantined at the header: $b")
    val ok = out(2L)
    assert(ok.decode_ok && ok.format.contains("jpeg") &&
      ok.width.contains(Multimodal.ruleWidth(4L)))
    // A generous budget admits the same small image unchanged.
    val wide = Multimodal.decodeMetaPermissive(
      Seq(Multimodal.MediaRow(2L, base)).toDS(),
      maxPixels = Long.MaxValue).collect().head
    assert(wide.decode_ok)
  }

  test("decode is deterministic across runs") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(20)
    val a = Multimodal.decodeMeta(Multimodal.mediaTable(docs))
      .collect().sortBy(_.doc_id)
    val b = Multimodal.decodeMeta(Multimodal.mediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(a.sameElements(b))
  }

  test("frame sampling emits every kth fixed-size frame of the opaque " +
    "payload") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.documentsAsMedia(docs)
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, every = 5)
    val f = frames.filter(_.doc_id == 0L).collect().sortBy(_.frame_idx)
    assert(f.nonEmpty && f.map(_.frame_idx).forall(_ % 5 == 0))
    assert(f.init.forall(_.frame.length == 64)) // only the tail is short
    // Empty payload → exactly one (empty) frame 0: the closed form the
    // multimodal_meta oracle uses for null-text documents (DuckDB's
    // greatest(NULL // 64, 1) skips the NULL), so the query's
    // null→empty coalesce keeps row counts aligned with the oracle.
    import spark.implicits._
    val empty = Multimodal.sampleFrames(
      Seq(Multimodal.MediaRow(99L, Array.emptyByteArray)).toDS(),
      frameBytes = 64, every = 5).collect()
    assert(empty.length == 1 && empty.head.frame_idx == 0 &&
      empty.head.frame.isEmpty)
  }

  test("pixel histogram is computed from DECODED samples and feeds the " +
    "similarity operators") {
    val spark = TestSpark.spark
    import spark.implicits._
    val media = Multimodal.mediaTable(
      Seq(1L, 2L, 3L, 5L).toDF("doc_id"))
    val feats = Multimodal.pixelHistogram(media)
    val rows = feats.collect()
    rows.foreach { r =>
      assert(r.features.length == 16 &&
        math.abs(r.features.sum - 1.0) < 1e-9)
    }
    // Cross-check one histogram against the rule (gray doc 1).
    val (w, h) = (Multimodal.ruleWidth(1L), Multimodal.ruleHeight(1L))
    val counts = new Array[Double](16)
    for (y <- 0 until h; x <- 0 until w)
      counts((((7L * x + 13L * y + 1L) % 256) >> 4).toInt) += 1.0
    val got = rows.find(_.doc_id == 1L).get.features
    assert(got.zip(counts.map(_ / (w * h))).forall {
      case (a, b) => math.abs(a - b) < 1e-9
    })
    // The features column is directly consumable by the similarity API
    // (same shape as an embedding column).
    val e = feats.toDF("vec_id", "embedding")
    assert(Similarity.prepared(e).select("nrm").head().getDouble(0) > 0)
  }

  test("binaryFile ingest: image FILES on disk decode identically to " +
    "the in-plan media table, and sidecar files are skipped") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-files")
    val ids = (1L to 40L).toSeq
    ids.foreach { id =>
      val ext = Multimodal.ruleFormat(id) match {
        case "jpeg" => "jpg"
        case f => f
      }
      java.nio.file.Files.write(
        dir.resolve(s"img-$id.$ext"), Multimodal.renderPayload(id))
    }
    // A crawl directory carries sidecars — they must be skipped, not
    // fail the scan or fabricate rows.
    java.nio.file.Files.write(dir.resolve("manifest.txt"),
      "not an image".getBytes("UTF-8"))
    val namePat = "img-(\\d+)\\.(png|jpg)".r
    val fromFiles = Multimodal.mediaFromBinaryFiles(spark, dir.toString,
      {
        case namePat(id, _) => Some(id.toLong)
        case _ => None
      })
    val viaFiles = Multimodal.decodeMeta(fromFiles).collect()
      .map(d => d.doc_id -> d).toMap
    val viaTable = Multimodal.decodeMeta(
      Multimodal.mediaTable(ids.toDF("doc_id"))).collect()
      .map(d => d.doc_id -> d).toMap
    assert(viaFiles.keySet == ids.toSet,
      s"ingest must yield exactly the image files: ${viaFiles.keySet}")
    assert(viaFiles == viaTable,
      "file-ingested payloads must decode identically to in-plan ones")
  }
}
