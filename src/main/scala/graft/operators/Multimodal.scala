package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, decoded batch-wise per partition.
  *
  * The decode itself is a STUB — no image/audio codecs exist in this
  * container — but everything Spark-side is real: the binary schema, the
  * typed Dataset boundary, the per-partition batched iteration (the shape
  * a vectorized decoder needs: amortize codec init across a batch, bound
  * memory by batch size), and the metadata schema.
  */
object Multimodal {

  /** A media payload riding the pipeline as opaque bytes. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed metadata the decode stage emits. */
  final case class MediaMeta(doc_id: Long, byte_len: Int, width: Int,
      height: Int, format: String, frames: Int)

  /** Batch size for per-partition decoding — bounds peak memory per task
    * regardless of partition size.
    */
  val DecodeBatchSize = 64

  /** STUB decoder: a real implementation would hand `bytes` to an image
    * codec. Deterministic fake so tests are stable: dimensions derived
    * from payload length, format from the first byte.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, String) = {
    val w = bytes.length % 640 + 1
    val h = bytes.length % 480 + 1
    val fmt = if (bytes.isEmpty) "empty"
      else if (bytes(0) % 2 == 0) "png" else "jpeg"
    (w, h, fmt)
  }

  /** Decode metadata for every payload, batched per partition. Runs
    * entirely on executors; the driver never sees a payload.
    */
  def extractMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        // One codec-init per batch in a real decoder.
        batch.map { r =>
          val (w, h, fmt) = decodeImageStub(r.payload)
          MediaMeta(r.doc_id, r.payload.length, w, h, fmt,
            r.payload.length % 30 + 1)
        }
      }
    }
  }

  /** Adapt the documents table into media rows (text bytes standing in
    * for image payloads — the testdata carries no real media).
    */
  def documentsAsMedia(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    // Null payloads reject here, at the boundary: every downstream
    // decode stub dereferences payload unguarded (a null-text document
    // would NPE the task mid-pipeline otherwise).
    df.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(col("payload").isNotNull)
      .as[MediaRow]
  }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int,
      frame: Array[Byte])

  /** Fixed-width numeric features extracted from a payload. */
  final case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** STUB resize: a real implementation rescales pixels to (w, h); the
    * stand-in deterministically truncates / zero-pads to w*h bytes so the
    * output size contract (every row same byte length) is real.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    java.util.Arrays.copyOf(bytes, w * h)

  /** Frame sampling as a dataflow op: every `every`-th frame of each
    * payload, one output row per sampled frame (the flatMap/explode
    * shape — downstream stages parallelize over frames, not videos,
    * which is what keeps one long video from pinning one task). Frames
    * are stubbed as fixed-size byte slices.
    */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int,
      every: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val nFrames = math.max(r.payload.length / frameBytes, 1)
      (0 until nFrames by every).map { i =>
        val from = math.min(i * frameBytes, r.payload.length)
        val until = math.min(from + frameBytes, r.payload.length)
        MediaFrame(r.doc_id, i,
          java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Feature extraction: a 16-bin normalized byte histogram per payload —
    * the embedding-extraction shape (a real model would emit a float
    * vector; the histogram is a deterministic stand-in with the same
    * schema). Batched like extractMeta so a vectorized model would
    * amortize its init per batch, and the output is exactly the
    * `Array[Double]` column the Similarity operators consume.
    */
  def byteHistogram(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val counts = new Array[Double](16)
          r.payload.foreach(b => counts((b & 0xff) >> 4) += 1.0)
          val n = math.max(r.payload.length, 1).toDouble
          MediaFeatures(r.doc_id, counts.map(_ / n))
        }
      }
    }
  }
}
