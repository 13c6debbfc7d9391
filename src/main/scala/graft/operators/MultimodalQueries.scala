package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata derived engine-side. The testdata has no
  * real media, so the payload is the UTF-8 document text treated as bytes;
  * the *decode* step is stubbed (see graft.operators.Multimodal for the
  * mapPartitions batch-decode plumbing) but the schema, byte handling, and
  * metadata extraction are real and oracle-checked.
  */
object MultimodalQueries {

  import Tables.t

  val all: Seq[QuerySpec] = Seq(

    QuerySpec("multimodal_meta",
      """SELECT doc_id,
        |       octet_length(CAST(text AS BLOB)) AS byte_len,
        |       hex(CAST(substring(text, 1, 8) AS BLOB)) AS header_hex,
        |       CAST(octet_length(CAST(text AS BLOB)) % 640 + 1
        |            AS INTEGER) AS width,
        |       CAST(octet_length(CAST(text AS BLOB)) % 480 + 1
        |            AS INTEGER) AS height,
        |       CAST(octet_length(CAST(text AS BLOB)) % 30 + 1
        |            AS INTEGER) AS frames,
        |       array_to_string(list_transform(
        |         range(0, CAST((octet_length(CAST(text AS BLOB)) % 30)
        |                       // 5 AS INTEGER) + 1),
        |         k -> CAST(k * 5 AS INTEGER)), ',') AS sampled_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("byte_len"),
          hex(expr("cast(substring(text, 1, 8) as binary)"))
            .as("header_hex"),
          (octet_length(col("payload")) % 640 + 1).cast("int").as("width"),
          (octet_length(col("payload")) % 480 + 1).cast("int")
            .as("height"),
          (octet_length(col("payload")) % 30 + 1).cast("int").as("frames"))
        // Frame sampling: every 5th frame index of [0, frames) — the
        // video path's decode-every-kth-frame selection. Serialized to a
        // CSV string: the gate's pandas comparator can't sort/hash raw
        // array cells (unhashable ndarray); drop the array_join to get
        // the array-typed column back library-side.
        .withColumn("sampled_frames",
          expr("array_join(transform(sequence(0, (frames - 1) div 5), " +
            "k -> cast(k * 5 as string)), ',')"))
        .orderBy("doc_id")
    }
  )
}
