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

  final case class PooledRow(doc_id: Long, pooled_h: Long, pooled_w: Long,
      pooled_sum: Long)
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_sum: Long)

  /** 2x2 average-pool "resize" over the payload interpreted as a
    * width-16 u8 image (zero-padded). The pixel interpretation is the
    * deterministic stand-in for a decoded image; the pooling math,
    * partition-wise batch iteration, and integer-exact output are the
    * real downsample shape (floor-average, like a uint8 area resize).
    */
  def resizePooled(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val w = 16
        val h = (r.payload.length + w - 1) / w
        val ph = (h + 1) / 2
        val pw = w / 2
        def px(row: Int, colIdx: Int): Long = {
          val i = row * w + colIdx
          if (row < 0 || row >= h || colIdx < 0 || colIdx >= w ||
            i >= r.payload.length) 0L
          else r.payload(i) & 0xffL
        }
        var sum = 0L
        var pr = 0
        while (pr < ph) {
          var pc = 0
          while (pc < pw) {
            sum += (px(2 * pr, 2 * pc) + px(2 * pr, 2 * pc + 1) +
              px(2 * pr + 1, 2 * pc) + px(2 * pr + 1, 2 * pc + 1)) / 4
            pc += 1
          }
          pr += 1
        }
        PooledRow(r.doc_id, ph.toLong, pw.toLong, sum)
      }
    }.toDF()
  }

  /** Frame sampling over the payload interpreted as a 64-byte-per-
    * frame "video": keep every 3rd frame, emit per-frame byte sums —
    * the sample-then-featurize shape of a video ingest pipeline (one
    * row per kept frame, exploded in the executor pass).
    */
  def sampleFrames(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val fsz = 64
        val nframes = (r.payload.length + fsz - 1) / fsz
        (0 until nframes by 3).map { f =>
          var sum = 0L
          var i = f * fsz
          val end = math.min((f + 1) * fsz, r.payload.length)
          while (i < end) { sum += r.payload(i) & 0xffL; i += 1 }
          FrameRow(r.doc_id, f.toLong, sum)
        }
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

    // mm resize: 2x2 floor-average pooling over the width-16 pixel
    // interpretation — integer-exact, replayed cell-by-cell in SQL
    "mm_resize_pool" -> Q(
      (s, dir) => resizePooled(mediaTable(s, dir)),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len,
        |         (length(text) + 15) // 16 AS h FROM documents),
        |cells AS (SELECT doc_id, text, len, h,
        |            unnest(range(0, (h + 1) // 2)) AS pr FROM d),
        |cells2 AS (SELECT doc_id, text, len, h, pr,
        |             unnest(range(0, 8)) AS pc FROM cells),
        |px AS (SELECT doc_id, h, pr, pc,
        |  (CASE WHEN 2*pr*16 + 2*pc < len AND 2*pr < h
        |        THEN unicode(substr(text, 2*pr*16 + 2*pc + 1, 1)) ELSE 0 END
        |   + CASE WHEN 2*pr*16 + 2*pc + 1 < len AND 2*pr < h
        |        THEN unicode(substr(text, 2*pr*16 + 2*pc + 2, 1)) ELSE 0 END
        |   + CASE WHEN (2*pr+1)*16 + 2*pc < len AND 2*pr+1 < h
        |        THEN unicode(substr(text, (2*pr+1)*16 + 2*pc + 1, 1)) ELSE 0 END
        |   + CASE WHEN (2*pr+1)*16 + 2*pc + 1 < len AND 2*pr+1 < h
        |        THEN unicode(substr(text, (2*pr+1)*16 + 2*pc + 2, 1)) ELSE 0 END
        |  ) // 4 AS pv
        |  FROM cells2)
        |SELECT doc_id, (h + 1) // 2 AS pooled_h, 8 AS pooled_w,
        |       CAST(sum(pv) AS BIGINT) AS pooled_sum
        |FROM px GROUP BY doc_id, h""".stripMargin)),

    // mm audio energy: payload as u8 "samples" around a 128 midpoint,
    // per-256-sample-window energy (sum of squared deviations) — the
    // windowed feature pass of an audio ingest, integer-exact
    "mm_audio_energy" -> Q(
      (s, dir) => {
        val media = mediaTable(s, dir)
        val sess = media.sparkSession
        import sess.implicits._
        media.as[MediaRow].mapPartitions { rows =>
          rows.flatMap { r =>
            val wsz = 256
            val nw = (r.payload.length + wsz - 1) / wsz
            (0 until nw).map { w =>
              var energy = 0L
              var i = w * wsz
              val end = math.min((w + 1) * wsz, r.payload.length)
              while (i < end) {
                val d = (r.payload(i) & 0xffL) - 128L
                energy += d * d
                i += 1
              }
              (r.doc_id, w.toLong, energy)
            }
          }
        }.toDF("doc_id", "window_idx", "energy")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len,
        |         (length(text) + 255) // 256 AS nw FROM documents),
        |w AS (SELECT doc_id, text, len, unnest(range(0, nw)) AS wi FROM d),
        |b AS (SELECT doc_id, wi, text,
        |        unnest(range(wi * 256, least((wi + 1) * 256, len))) AS i
        |      FROM w),
        |e AS (SELECT doc_id, wi,
        |        sum((unicode(substr(text, i + 1, 1)) - 128)
        |            * (unicode(substr(text, i + 1, 1)) - 128)) AS energy
        |      FROM b GROUP BY doc_id, wi)
        |SELECT doc_id, wi AS window_idx, CAST(energy AS BIGINT) AS energy
        |FROM e""".stripMargin)),

    // mm frame sampling: every 3rd 64-byte frame, per-frame byte sums
    "mm_frame_sample" -> Q(
      (s, dir) => sampleFrames(mediaTable(s, dir)),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len,
        |         (length(text) + 63) // 64 AS nf FROM documents),
        |fr AS (SELECT doc_id, text, len, unnest(range(0, nf)) AS f FROM d),
        |kept AS (SELECT * FROM fr WHERE f % 3 = 0),
        |b AS (SELECT doc_id, f, text, len,
        |        unnest(range(f * 64, least((f + 1) * 64, len))) AS i
        |      FROM kept)
        |SELECT doc_id, f AS frame_idx,
        |       CAST(sum(unicode(substr(text, i + 1, 1))) AS BIGINT) AS frame_sum
        |FROM b GROUP BY doc_id, f""".stripMargin)),
  )
}
