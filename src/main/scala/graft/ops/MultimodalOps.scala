package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, processed batch-wise in executors.
  *
  * The container has no image/audio codecs, so the decode step is a
  * STUB — a deterministic fake derived from the payload bytes (marked
  * below). Everything around it is the real Spark shape a multimodal
  * pipeline needs at 100 TB: binary column + metadata struct, a
  * partition-wise typed map (the Scala analog of mapInPandas: one
  * iterator pass per partition, no per-row UDF dispatch), and
  * integer-exact features an oracle can replay.
  */
object MultimodalOps {
  import Derived.table

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      media_type: String, byte_len: Long)
  final case class MediaFeatures(doc_id: Long, byte_len: Long,
      checksum: Long, width: Long, frames: Long)

  /** Attach a binary payload column (here: utf-8 text bytes standing in
    * for image/audio bytes) plus metadata.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("image/fake").as("media_type"),
      col("n_chars").cast("long").as("byte_len"))

  /** Batch feature extraction over payload bytes. The decode itself is
    * a STUB (no codecs in this container): features are deterministic
    * functions of the raw bytes so the plumbing — schema, partition
    * iteration, batch shape — is real and oracle-checkable.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        // STUB decode: a real implementation would decode image/audio
        // here; we derive deterministic fake features from the bytes.
        var checksum = 0L
        var i = 0
        while (i < r.payload.length) {
          checksum += r.payload(i) & 0xffL
          i += 1
        }
        MediaFeatures(r.doc_id, r.byte_len, checksum,
          width = r.byte_len % 640, frames = r.byte_len / 100 + 1)
      }
    }.toDF()
  }

  val queries: Map[String, Q] = Map(
    // Multimodal decode/feature-extract plumbing (stubbed decode)
    "mm_decode_features" -> Q(
      (s, dir) => extractFeatures(mediaTable(s, dir)),
      Some("""WITH i AS (SELECT doc_id, text, n_chars,
        |            unnest(generate_series(1, length(text))) AS i
        |        FROM documents),
        |c AS (SELECT doc_id, CAST(sum(unicode(substr(text, i, 1))) AS BIGINT)
        |        AS checksum
        |      FROM i GROUP BY doc_id)
        |SELECT d.doc_id, d.n_chars AS byte_len, c.checksum,
        |       d.n_chars % 640 AS width, d.n_chars // 100 + 1 AS frames
        |FROM documents d JOIN c USING (doc_id)""".stripMargin)),
  )
}
