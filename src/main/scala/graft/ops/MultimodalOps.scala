package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, processed batch-wise in executors.
  *
  * All six ops are REAL end-to-end: mm_decode_png / mm_resize_pool /
  * mm_decode_features synthesize genuine PNG images (javax.imageio)
  * and mm_decode_wav / mm_audio_energy / mm_frame_sample genuine
  * RIFF/WAVE PCM audio (javax.sound.sampled) into the binary column,
  * decode them through the platform decoders in a partition-wise pass
  * (the Scala analog of mapInPandas), and the oracle checks the
  * decoded, integer-exact features against the generation parameters
  * — a lossless round-trip through the actual formats.
  */
object MultimodalOps {
  import Derived.table

  // memory-cache ImageIO streams (see core/Codec.scala — the default
  // file-backed cache writes a temp file per decoded image)
  javax.imageio.ImageIO.setUseCache(false)

  final case class RasterFeatures(doc_id: Long, width: Long, height: Long,
      pix_sum: Long, pix_sq_sum: Long, edge_h: Long, edge_v: Long)

  /** payload -> (width, height, row-major gray8 pixels): the pure-JVM
    * scanline decoder (core/PngDecode — one inflate + one defilter
    * pass) with ImageIO as the fallback for anything outside its
    * envelope. The mm images are KB-scale, so ImageIO's per-image
    * framework cost (stream + reader reset + metadata + color model)
    * dominated the decode; PngDecodeSpec pins byte-exact agreement on
    * every fixture byte shape.
    */
  private def gray8(payload: Array[Byte]): (Int, Int, Array[Byte]) =
    graft.core.PngDecode.gray8(payload).getOrElse {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      val w = img.getWidth; val h = img.getHeight
      val r = img.getRaster
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = r.getSample(x, y, 0).toByte; x += 1 }
        y += 1
      }
      (w, h, out)
    }

  /** Raster-statistics feature extraction over REAL decoded PNG
    * payloads: per-image pixel sum + sum of squares (mean/variance)
    * and horizontal/vertical edge energy (sum of |neighbor deltas|) —
    * all integer-exact so the oracle can replay the deterministic
    * pixel formula cell-by-cell.
    */
  def extractFeatures(png: DataFrame): DataFrame = {
    val s = png.sparkSession
    import s.implicits._
    png.as[(Long, Array[Byte])].mapPartitions { rows =>
      rows.map { case (id, payload) =>
        val (w, h, px) = gray8(payload)
        var sum = 0L; var sq = 0L; var eh = 0L; var ev = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = (px(y * w + x) & 0xff).toLong
            sum += p
            sq += p * p
            if (x + 1 < w)
              eh += math.abs((px(y * w + x + 1) & 0xff).toLong - p)
            if (y + 1 < h)
              ev += math.abs((px((y + 1) * w + x) & 0xff).toLong - p)
            x += 1
          }
          y += 1
        }
        RasterFeatures(id, w.toLong, h.toLong, sum, sq, eh, ev)
      }
    }.toDF()
  }

  final case class PooledRow(doc_id: Long, pooled_h: Long, pooled_w: Long,
      pooled_sum: Long)
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_sum: Long)

  /** 2x2 floor-average pool ("area resize") over REAL decoded PNG
    * rasters: ImageIO decodes the genuine payload bytes, the pool
    * reads actual pixels (zero-padded at odd edges, /4 always — a
    * uint8 area downsample). One reader per partition, like
    * mm_decode_png.
    */
  def resizePooledPng(png: DataFrame): DataFrame = {
    val s = png.sparkSession
    import s.implicits._
    png.as[(Long, Array[Byte])].mapPartitions { rows =>
      rows.map { case (id, payload) =>
        val (w, h, pxa) = gray8(payload)
        val ph = (h + 1) / 2
        val pw = (w + 1) / 2
        def px(y: Int, x: Int): Long =
          if (x >= w || y >= h) 0L else (pxa(y * w + x) & 0xff).toLong
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
        PooledRow(id, ph.toLong, pw.toLong, sum)
      }
    }.toDF()
  }

  /** Decode REAL RIFF/WAVE payload bytes to signed 16-bit LE PCM
    * samples via AudioSystem (shared by the windowed-energy and
    * frame-sample passes).
    */
  private def decodePcm(payload: Array[Byte]): Array[Long] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian, s"unexpected WAV format $fmt")
    val pcm = ais.readAllBytes()
    val out = new Array[Long](pcm.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toLong
      i += 1
    }
    out
  }

  /** Windowed energy over REAL decoded PCM: 256-sample windows (the
    * last one ragged), energy = sum of squared sample values — the
    * windowed feature pass of an audio ingest over genuine WAV bytes.
    */
  def windowEnergyWav(wav: DataFrame): DataFrame = {
    val s = wav.sparkSession
    import s.implicits._
    wav.as[(Long, Array[Byte])].mapPartitions { rows =>
      rows.flatMap { case (id, payload) =>
        val samples = decodePcm(payload)
        val wsz = 256
        val nw = (samples.length + wsz - 1) / wsz
        (0 until nw).map { w =>
          var energy = 0L
          var i = w * wsz
          val end = math.min((w + 1) * wsz, samples.length)
          while (i < end) { energy += samples(i) * samples(i); i += 1 }
          (id, w.toLong, energy)
        }
      }
    }.toDF("doc_id", "window_idx", "energy")
  }

  /** Frame sampling over REAL decoded PCM: 64-sample frames, keep
    * every 3rd, per-frame sample sums — the sample-then-featurize
    * shape of a media ingest (one row per kept frame).
    */
  def sampleFramesWav(wav: DataFrame): DataFrame = {
    val s = wav.sparkSession
    import s.implicits._
    wav.as[(Long, Array[Byte])].mapPartitions { rows =>
      rows.flatMap { case (id, payload) =>
        val samples = decodePcm(payload)
        val fsz = 64
        val nframes = (samples.length + fsz - 1) / fsz
        (0 until nframes by 3).map { f =>
          var sum = 0L
          var i = f * fsz
          val end = math.min((f + 1) * fsz, samples.length)
          while (i < end) { sum += samples(i); i += 1 }
          FrameRow(id, f.toLong, sum)
        }
      }
    }.toDF()
  }

  /** doc_id -> deterministic grayscale test image dims/pixels (the
    * oracle replays these formulas; PNG is lossless so decode must
    * recover them exactly).
    */
  private def pngDims(docId: Long): (Int, Int) =
    ((8 + docId % 25).toInt, (6 + docId % 17).toInt)
  private def pngPixel(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 13) % 256).toInt

  /** Real image modality: synthesize PNG bytes per document
    * (executor-side), producing an (id, payload) binary column like an
    * ingested image corpus.
    */
  def pngTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents").select(col("doc_id").cast("long"))
      // the corpus arrives as ONE small parquet file -> one input
      // partition; encode is embarrassingly parallel, so spread it
      // across the session's shuffle width (at 100 TB the input is
      // already many splits and this is a no-op by comparison)
      .repartition(col("doc_id"))
      .as[Long].mapPartitions { ids =>
        // one writer per partition (see mm_decode_png: the static
        // ImageIO entry points pay a synchronized registry lookup per
        // image — measurable contention across 32 encode threads)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        ids.map { id =>
          val (w, h) = pngDims(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, pngPixel(id, x, y)); x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          try writer.write(img) finally ios.close()
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** doc_id -> deterministic 16-bit PCM samples. */
  private def wavSamples(docId: Long): Array[Short] =
    Array.tabulate((256 + docId % 256).toInt) { i =>
      (((docId * 7 + i * 31) % 4096 - 2048) * 8).toShort
    }

  /** Real audio modality: synthesize RIFF/WAVE bytes (16-bit mono PCM)
    * per document via javax.sound.sampled.
    */
  def wavTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents").select(col("doc_id").cast("long"))
      .repartition(col("doc_id")) // same single-input-file note as pngTable
      .as[Long].mapPartitions { ids =>
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, 1, true, false) // 8 kHz, s16le, mono
        ids.map { id =>
          val samples = wavSamples(id)
          val pcm = new Array[Byte](samples.length * 2)
          var i = 0
          while (i < samples.length) {
            pcm(2 * i) = (samples(i) & 0xff).toByte
            pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  val queries: Map[String, Q] = Map(
    // REAL image decode: the binary column holds genuine PNG bytes;
    // ImageIO decodes them in a partition-wise pass; the oracle
    // replays the generation formulas — decode must recover width,
    // height, and every pixel (summed) exactly
    "mm_decode_png" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        pngTable(s, dir).as[(Long, Array[Byte])].mapPartitions { rows =>
          rows.map { case (id, payload) =>
            val (w, h, px) = gray8(payload)
            var sum = 0L
            var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (id, w.toLong, h.toLong, sum)
          }
        }.toDF("doc_id", "width", "height", "pix_sum")
      },
      Some("""WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |               6 + doc_id % 17 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |ys AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT)
        |    AS pix_sum
        |FROM ys GROUP BY 1, 2, 3""".stripMargin)),

    // REAL audio decode: genuine RIFF/WAVE PCM bytes decoded through
    // AudioSystem; sample count + integer energy must match the
    // generation formulas exactly (PCM is lossless)
    "mm_decode_wav" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        wavTable(s, dir).as[(Long, Array[Byte])].mapPartitions { rows =>
          rows.map { case (id, payload) =>
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
            val pcm = ais.readAllBytes()
            var energy = 0L
            var i = 0
            while (i + 1 < pcm.length) {
              val v = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toLong
              energy += v * v
              i += 2
            }
            (id, (pcm.length / 2).toLong, energy)
          }
        }.toDF("doc_id", "n_samples", "energy")
      },
      Some("""WITH d AS (SELECT doc_id, 256 + doc_id % 256 AS n
        |        FROM documents),
        |i AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d)
        |SELECT doc_id, n AS n_samples,
        |  CAST(sum(((doc_id * 7 + i * 31) % 4096 - 2048) * 8
        |         * (((doc_id * 7 + i * 31) % 4096 - 2048) * 8))
        |       AS BIGINT) AS energy
        |FROM i GROUP BY 1, 2""".stripMargin)),

    // REAL raster features: mean/variance base sums + edge energy over
    // genuine decoded PNG pixels — the oracle replays the pixel
    // formula (doc_id*31 + 7x + 13y) % 256 including the neighbor
    // deltas, so decode + statistics must be bit-exact
    "mm_decode_features" -> Q(
      (s, dir) => extractFeatures(pngTable(s, dir)),
      Some("""WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |               6 + doc_id % 17 AS h FROM documents),
        |ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d),
        |xs AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
        |px AS (SELECT doc_id, w, h, x, y,
        |         (doc_id * 31 + x * 7 + y * 13) % 256 AS p FROM xs)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(sum(p) AS BIGINT) AS pix_sum,
        |  CAST(sum(p * p) AS BIGINT) AS pix_sq_sum,
        |  CAST(sum(CASE WHEN x < w - 1 THEN
        |    abs((doc_id * 31 + (x + 1) * 7 + y * 13) % 256 - p)
        |    ELSE 0 END) AS BIGINT) AS edge_h,
        |  CAST(sum(CASE WHEN y < h - 1 THEN
        |    abs((doc_id * 31 + x * 7 + (y + 1) * 13) % 256 - p)
        |    ELSE 0 END) AS BIGINT) AS edge_v
        |FROM px GROUP BY doc_id, w, h""".stripMargin)),

    // mm resize: 2x2 floor-average pooling over REAL decoded PNG
    // rasters (genuine payload bytes through ImageIO); the oracle
    // replays the deterministic pixel-generation formulas cell-by-cell
    // — decode + pool must recover them exactly (PNG is lossless)
    "mm_resize_pool" -> Q(
      (s, dir) => resizePooledPng(pngTable(s, dir)),
      Some("""WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |               6 + doc_id % 17 AS h FROM documents),
        |prs AS (SELECT doc_id, w, h,
        |          unnest(range(0, (h + 1) // 2)) AS pr FROM d),
        |pcs AS (SELECT doc_id, w, h, pr,
        |          unnest(range(0, (w + 1) // 2)) AS pc FROM prs),
        |px AS (SELECT doc_id, w, h,
        |  (CASE WHEN 2*pc < w AND 2*pr < h
        |        THEN (doc_id*31 + 2*pc*7 + 2*pr*13) % 256 ELSE 0 END
        |   + CASE WHEN 2*pc+1 < w AND 2*pr < h
        |        THEN (doc_id*31 + (2*pc+1)*7 + 2*pr*13) % 256 ELSE 0 END
        |   + CASE WHEN 2*pc < w AND 2*pr+1 < h
        |        THEN (doc_id*31 + 2*pc*7 + (2*pr+1)*13) % 256 ELSE 0 END
        |   + CASE WHEN 2*pc+1 < w AND 2*pr+1 < h
        |        THEN (doc_id*31 + (2*pc+1)*7 + (2*pr+1)*13) % 256 ELSE 0 END
        |  ) // 4 AS pv
        |  FROM pcs)
        |SELECT doc_id, (h + 1) // 2 AS pooled_h, (w + 1) // 2 AS pooled_w,
        |       CAST(sum(pv) AS BIGINT) AS pooled_sum
        |FROM px GROUP BY doc_id, w, h""".stripMargin)),

    // mm audio energy: 256-sample windows over REAL decoded PCM
    // (genuine RIFF/WAVE bytes through AudioSystem), energy = sum of
    // squared s16 samples; last window ragged (n in [256, 511])
    "mm_audio_energy" -> Q(
      (s, dir) => windowEnergyWav(wavTable(s, dir)),
      Some("""WITH d AS (SELECT doc_id, 256 + doc_id % 256 AS n
        |        FROM documents),
        |w AS (SELECT doc_id, n,
        |        unnest(range(0, (n + 255) // 256)) AS wi FROM d),
        |b AS (SELECT doc_id, wi,
        |        unnest(range(wi * 256, least((wi + 1) * 256, n))) AS i
        |      FROM w)
        |SELECT doc_id, wi AS window_idx,
        |  CAST(sum((((doc_id * 7 + i * 31) % 4096 - 2048) * 8)
        |         * (((doc_id * 7 + i * 31) % 4096 - 2048) * 8))
        |       AS BIGINT) AS energy
        |FROM b GROUP BY doc_id, wi""".stripMargin)),

    // mm frame sampling: 64-sample frames over REAL decoded PCM, keep
    // every 3rd, per-frame sample sums
    "mm_frame_sample" -> Q(
      (s, dir) => sampleFramesWav(wavTable(s, dir)),
      Some("""WITH d AS (SELECT doc_id, 256 + doc_id % 256 AS n
        |        FROM documents),
        |fr AS (SELECT doc_id, n,
        |         unnest(range(0, (n + 63) // 64)) AS f FROM d),
        |kept AS (SELECT * FROM fr WHERE f % 3 = 0),
        |b AS (SELECT doc_id, f,
        |        unnest(range(f * 64, least((f + 1) * 64, n))) AS i
        |      FROM kept)
        |SELECT doc_id, f AS frame_idx,
        |  CAST(sum(((doc_id * 7 + i * 31) % 4096 - 2048) * 8) AS BIGINT)
        |    AS frame_sum
        |FROM b GROUP BY doc_id, f""".stripMargin)),

    // Perceptual average-hash over REAL decoded PNGs (the image-dedup
    // pass of a multimodal pipeline): pool each raster onto an 8x4
    // grid (cx = x*8/w, cy = y*4/h — the standard aHash cell map,
    // grid coarse enough that every cell is nonempty at the fixture's
    // minimum 8x6 size), set bit (cy*8+cx) iff the cell mean exceeds
    // the image mean via exact cross-multiplied integers (ties -> 0),
    // then bucket-count hash collisions — near-dup images collide,
    // and at 100 TB the groupBy carries 8 bytes per image, not
    // pixels. Decode + hash is one partition-wise pass.
    "mm_image_ahash" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        val hashed = pngTable(s, dir).as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, payload) =>
              val (w, h, px) = gray8(payload)
              val cellSum = new Array[Long](32)
              val cellN = new Array[Long](32)
              var tot = 0L
              var y = 0
              while (y < h) {
                val cy = y * 4 / h
                var x = 0
                while (x < w) {
                  val p = (px(y * w + x) & 0xff).toLong
                  val c = cy * 8 + x * 8 / w
                  cellSum(c) += p; cellN(c) += 1; tot += p
                  x += 1
                }
                y += 1
              }
              val nTot = w.toLong * h
              var hash = 0L
              var c = 0
              while (c < 32) {
                if (cellSum(c) * nTot > tot * cellN(c))
                  hash |= 1L << (31 - c)
                c += 1
              }
              (id, hash)
            }
          }.toDF("doc_id", "ahash")
        val buckets = hashed.groupBy("ahash")
          .agg(count(lit(1)).as("n_bucket"))
        hashed.join(buckets, "ahash")
          .select("doc_id", "ahash", "n_bucket")
      },
      Some("""WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |               6 + doc_id % 17 AS h FROM documents),
        |ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d),
        |xs AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
        |px AS (SELECT doc_id, w, h, x, y,
        |         (y * 4) // h * 8 + (x * 8) // w AS c,
        |         (doc_id * 31 + x * 7 + y * 13) % 256 AS p FROM xs),
        |cells AS (SELECT doc_id, w, h, c,
        |            CAST(sum(p) AS BIGINT) AS cs, count(*) AS cn
        |          FROM px GROUP BY 1, 2, 3, 4),
        |tots AS (SELECT doc_id, CAST(sum(cs) AS BIGINT) AS tot,
        |           CAST(sum(cn) AS BIGINT) AS nt
        |         FROM cells GROUP BY 1),
        |hashes AS (SELECT c.doc_id,
        |             CAST(sum(CASE WHEN c.cs * t.nt > t.tot * c.cn
        |               THEN 1::BIGINT << (31 - c.c) ELSE 0 END)
        |               AS BIGINT) AS ahash
        |           FROM cells c JOIN tots t USING (doc_id)
        |           GROUP BY 1),
        |b AS (SELECT ahash, count(*) AS n_bucket FROM hashes
        |      GROUP BY 1)
        |SELECT h.doc_id, h.ahash, b.n_bucket
        |FROM hashes h JOIN b USING (ahash)""".stripMargin)),

    // Keyframe election per scene (the thumbnail/representative-frame
    // pass after shot segmentation): scenes = cumulative scene-cut
    // count per video (the mm_scene_cut predicate), keyframe = the
    // scene's brightest frame by mean luminance (ties -> earliest).
    // Both engines IEEE-divide the same exact integers for the
    // ordering ratio, so ranks agree bit-for-bit. Decode narrow,
    // windows per video, election per (video, scene) partition — the
    // same shape at a million videos.
    "mm_video_keyframes" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        val frames = pngTable(s, dir).as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, payload) =>
              val (w, h, px) = gray8(payload)
              var sum = 0L
              var i = 0
              while (i < px.length) { sum += px(i) & 0xff; i += 1 }
              (id % 50, id / 50, sum, w.toLong * h)
            }
          }.toDF("video_id", "frame_idx", "lum_sum", "n_px")
        val w = Window.partitionBy("video_id").orderBy("frame_idx")
        val scenes = frames
          .withColumn("prev_sum", lag("lum_sum", 1).over(w))
          .withColumn("prev_n", lag("n_px", 1).over(w))
          .withColumn("is_cut", (col("prev_n").isNotNull &&
            abs(col("lum_sum") * col("prev_n") -
              col("prev_sum") * col("n_px")) >=
              col("n_px") * col("prev_n") * 20).cast("long"))
          .withColumn("scene", sum("is_cut").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        scenes.withColumn("rk", row_number().over(
            Window.partitionBy("video_id", "scene")
              .orderBy((col("lum_sum").cast("double") / col("n_px")).desc,
                col("frame_idx").asc)))
          .filter(col("rk") === 1)
          .groupBy("video_id", "scene")
          .agg(max("frame_idx").as("keyframe_idx"),
            max("lum_sum").as("key_lum_sum"), max("n_px").as("key_n_px"))
      },
      Some("""WITH f AS (SELECT doc_id, doc_id % 50 AS video_id,
        |          doc_id // 50 AS frame_idx, 8 + doc_id % 25 AS w,
        |          6 + doc_id % 17 AS h FROM documents),
        |px AS (SELECT doc_id, video_id, frame_idx, w, h,
        |         unnest(range(0, w * h)) AS k FROM f),
        |s AS (SELECT video_id, frame_idx, CAST(w * h AS BIGINT) AS n_px,
        |        CAST(sum((doc_id * 31 + (k % w) * 7 + (k // w) * 13)
        |          % 256) AS BIGINT) AS lum_sum
        |      FROM px GROUP BY video_id, frame_idx, w, h),
        |lg AS (SELECT video_id, frame_idx, lum_sum, n_px,
        |         lag(lum_sum) OVER vw AS prev_sum,
        |         lag(n_px) OVER vw AS prev_n
        |       FROM s WINDOW vw AS (PARTITION BY video_id
        |         ORDER BY frame_idx)),
        |sc AS (SELECT video_id, frame_idx, lum_sum, n_px,
        |         CAST(sum(CASE WHEN prev_n IS NOT NULL
        |             AND abs(lum_sum * prev_n - prev_sum * n_px)
        |               >= 20 * n_px * prev_n THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY video_id ORDER BY frame_idx
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS scene
        |       FROM lg),
        |rk AS (SELECT video_id, scene, frame_idx, lum_sum, n_px,
        |         row_number() OVER (PARTITION BY video_id, scene
        |           ORDER BY CAST(lum_sum AS DOUBLE) / n_px DESC,
        |             frame_idx ASC) AS rk
        |       FROM sc)
        |SELECT video_id, scene, CAST(frame_idx AS BIGINT)
        |    AS keyframe_idx,
        |  lum_sum AS key_lum_sum, n_px AS key_n_px
        |FROM rk WHERE rk = 1""".stripMargin)),

    // Histogram equalization over REAL decoded PNGs (the contrast
    // normalization pass before visual feature extraction): 16-bin
    // luminance histogram, CDF, and the classic remap p' =
    // (cdf(bin(p)) - cdf_min) * 255 div (n_px - cdf_min) — all
    // integer, so both engines agree exactly; the entry emits the
    // equalized pixel sum (decode + histogram + remap must all be
    // bit-exact). Per-image local work stays inside the decode task —
    // histograms of one raster never need a shuffle; the oracle
    // replays the pixel formula through groupBy bin + a per-doc
    // cumulative window.
    "mm_hist_equalize" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        pngTable(s, dir).as[(Long, Array[Byte])].mapPartitions { rows =>
          rows.map { case (id, payload) =>
            val (w, h, px) = gray8(payload)
            val hist = new Array[Long](16)
            var i = 0
            while (i < px.length) { hist((px(i) & 0xff) / 16) += 1; i += 1 }
            val cdf = new Array[Long](16)
            var acc = 0L
            var b = 0
            var cdfMin = 0L
            while (b < 16) {
              acc += hist(b); cdf(b) = acc
              if (cdfMin == 0L && hist(b) > 0) cdfMin = acc
              b += 1
            }
            val nPx = w.toLong * h
            var eqSum = 0L
            i = 0
            while (i < px.length) {
              val c = cdf((px(i) & 0xff) / 16)
              if (nPx > cdfMin)
                eqSum += (c - cdfMin) * 255 / (nPx - cdfMin)
              i += 1
            }
            (id, nPx, cdfMin, eqSum)
          }
        }.toDF("doc_id", "n_px", "cdf_min", "eq_sum")
      },
      Some("""WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |               6 + doc_id % 17 AS h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM d),
        |pv AS (SELECT doc_id, w, h,
        |         ((doc_id * 31 + (k % w) * 7 + (k // w) * 13) % 256) // 16
        |           AS b FROM px),
        |hist AS (SELECT doc_id, w, h, b, CAST(count(*) AS BIGINT) AS n
        |         FROM pv GROUP BY 1, 2, 3, 4),
        |cdf AS (SELECT doc_id, w, h, b, n,
        |          CAST(sum(n) OVER (PARTITION BY doc_id ORDER BY b)
        |            AS BIGINT) AS cdf
        |        FROM hist),
        |cm AS (SELECT doc_id, CAST(w * h AS BIGINT) AS n_px,
        |         CAST(min(cdf) AS BIGINT) AS cdf_min
        |       FROM cdf GROUP BY doc_id, w, h),
        |eq AS (SELECT pv.doc_id,
        |         CAST(sum(CASE WHEN cm.n_px > cm.cdf_min THEN
        |           (cdf.cdf - cm.cdf_min) * 255 // (cm.n_px - cm.cdf_min)
        |           ELSE 0 END) AS BIGINT) AS eq_sum
        |       FROM pv JOIN cdf ON cdf.doc_id = pv.doc_id
        |         AND cdf.b = pv.b
        |       JOIN cm ON cm.doc_id = pv.doc_id
        |       GROUP BY 1)
        |SELECT cm.doc_id, cm.n_px, cm.cdf_min, eq.eq_sum
        |FROM cm JOIN eq USING (doc_id)""".stripMargin)),

    // Voice-activity detection over REAL decoded PCM (the speech-data
    // curation gate: keep utterance spans, drop silence): 64-sample
    // frame energies, a frame is active when energy >= 4.5e9, and
    // runs of >= 2 consecutive active frames become speech segments
    // (start/end frame, length, total energy). The island scan runs
    // INSIDE the decode task — a payload's frames are sequential by
    // nature and already resident, so shuffling per-frame rows into a
    // window would move 64x more rows for zero extra parallelism (the
    // file is the unit of work); the oracle replays the islands with
    // the classic row_number gaps-and-islands instead.
    "mm_audio_vad" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        wavTable(s, dir).as[(Long, Array[Byte])].mapPartitions { rows =>
          rows.flatMap { case (id, payload) =>
            val samples = decodePcm(payload)
            val fsz = 64
            val nf = (samples.length + fsz - 1) / fsz
            val energy = new Array[Long](nf)
            var f = 0
            while (f < nf) {
              var e = 0L
              var i = f * fsz
              val end = math.min((f + 1) * fsz, samples.length)
              while (i < end) { e += samples(i) * samples(i); i += 1 }
              energy(f) = e; f += 1
            }
            val segs = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, Long, Long)]
            var start = -1; var segE = 0L
            var g = 0
            while (g <= nf) {
              val active = g < nf && energy(g) >= 4500000000L
              if (active) {
                if (start < 0) { start = g; segE = 0L }
                segE += energy(g)
              } else if (start >= 0) {
                val len = g - start
                if (len >= 2)
                  segs += ((id, start.toLong, (g - 1).toLong,
                    len.toLong, segE))
                start = -1
              }
              g += 1
            }
            segs
          }
        }.toDF("doc_id", "start_f", "end_f", "n_frames", "seg_energy")
      },
      Some("""WITH d AS (SELECT doc_id, 256 + doc_id % 256 AS n
        |          FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |pv AS (SELECT doc_id, i // 64 AS f,
        |         ((doc_id * 7 + i * 31) % 4096 - 2048) * 8 AS p FROM sm),
        |en AS (SELECT doc_id, f, CAST(sum(p * p) AS BIGINT) AS energy
        |       FROM pv GROUP BY 1, 2),
        |act AS (SELECT doc_id, f, energy,
        |          CAST(energy >= 4500000000 AS INT) AS a FROM en),
        |isl AS (SELECT doc_id, f, energy, a,
        |          f - CAST(row_number() OVER (PARTITION BY doc_id, a
        |            ORDER BY f) AS BIGINT) AS grp
        |        FROM act),
        |seg AS (SELECT doc_id, CAST(min(f) AS BIGINT) AS start_f,
        |          CAST(max(f) AS BIGINT) AS end_f,
        |          CAST(count(*) AS BIGINT) AS n_frames,
        |          CAST(sum(energy) AS BIGINT) AS seg_energy
        |        FROM isl WHERE a = 1 GROUP BY doc_id, grp)
        |SELECT * FROM seg WHERE n_frames >= 2""".stripMargin)),

    // Scene-cut detection over REAL decoded PNG frames (the video
    // shot-segmentation pass of a multimodal ingest): frames group
    // into videos (video_id = doc_id % 50, frame_idx = doc_id / 50 —
    // the corpus as 50 synthetic videos), each frame's luminance sum
    // comes off the genuine decoded raster, and a cut fires when the
    // mean-luminance delta to the previous frame is >= 20 gray levels
    // — tested as EXACT cross-multiplied integers (|s1·n2 - s2·n1| >=
    // 20·n1·n2, frames differ in size so means never share a
    // denominator). Scale shape: decode is a partition-wise narrow
    // pass; the lag window partitions by video (millions of
    // independent partitions at scale, never one global window) and
    // carries 3 longs per frame, not pixels.
    "mm_scene_cut" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        val frames = pngTable(s, dir).as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, payload) =>
              val (w, h, px) = gray8(payload)
              var sum = 0L
              var i = 0
              while (i < px.length) { sum += px(i) & 0xff; i += 1 }
              (id % 50, id / 50, sum, w.toLong * h)
            }
          }.toDF("video_id", "frame_idx", "lum_sum", "n_px")
        val w = Window.partitionBy("video_id").orderBy("frame_idx")
        frames
          .withColumn("prev_sum", lag("lum_sum", 1).over(w))
          .withColumn("prev_n", lag("n_px", 1).over(w))
          .filter(col("prev_n").isNotNull &&
            abs(col("lum_sum") * col("prev_n") -
              col("prev_sum") * col("n_px")) >=
              col("n_px") * col("prev_n") * 20)
          .select("video_id", "frame_idx", "lum_sum", "n_px",
            "prev_sum", "prev_n")
      },
      Some("""WITH f AS (SELECT doc_id, doc_id % 50 AS video_id,
        |          doc_id // 50 AS frame_idx, 8 + doc_id % 25 AS w,
        |          6 + doc_id % 17 AS h FROM documents),
        |px AS (SELECT doc_id, video_id, frame_idx, w, h,
        |         unnest(range(0, w * h)) AS k FROM f),
        |s AS (SELECT video_id, frame_idx, CAST(w * h AS BIGINT) AS n_px,
        |        CAST(sum((doc_id * 31 + (k % w) * 7 + (k // w) * 13)
        |          % 256) AS BIGINT) AS lum_sum
        |      FROM px GROUP BY video_id, frame_idx, w, h),
        |lg AS (SELECT video_id, frame_idx, lum_sum, n_px,
        |         lag(lum_sum) OVER (PARTITION BY video_id
        |           ORDER BY frame_idx) AS prev_sum,
        |         lag(n_px) OVER (PARTITION BY video_id
        |           ORDER BY frame_idx) AS prev_n
        |       FROM s)
        |SELECT video_id, frame_idx, lum_sum, n_px, prev_sum, prev_n
        |FROM lg WHERE prev_n IS NOT NULL
        |  AND abs(lum_sum * prev_n - prev_sum * n_px)
        |    >= 20 * n_px * prev_n""".stripMargin)),

    // ViT-style patch extraction over REAL decoded PNGs: each image is
    // cut into non-overlapping 4x4 patches (the patchify step of
    // vision-transformer training prep — image -> patch sequence);
    // per patch we emit integer stats (sum/min/max) the oracle can
    // replay against the generation formula. Partition-wise decode
    // with one reusable reader, flatMap fan-out to patch rows — the
    // same batch shape mapInPandas gives a Python pipeline. Only FULL
    // patches are emitted (edge remainders dropped), matching the
    // crop-to-multiple convention of patch tokenizers. At 100 TB the
    // fan-out is narrow (no shuffle): rows multiply inside the
    // partition and flow straight to the sink/consumer.
    "mm_image_tiles" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        pngTable(s, dir).as[(Long, Array[Byte])].mapPartitions { rows =>
          rows.flatMap { case (id, payload) =>
            val (w, h, px) = gray8(payload)
            val tw = w / 4
            val th = h / 4
            for { ty <- 0 until th; tx <- 0 until tw } yield {
              var sum = 0L; var mn = 255L; var mx = 0L
              var y = ty * 4
              while (y < ty * 4 + 4) {
                var x = tx * 4
                while (x < tx * 4 + 4) {
                  val p = (px(y * w + x) & 0xff).toLong
                  sum += p
                  if (p < mn) mn = p
                  if (p > mx) mx = p
                  x += 1
                }
                y += 1
              }
              (id, tx.toLong, ty.toLong, sum, mn, mx)
            }
          }
        }.toDF("doc_id", "tile_x", "tile_y", "tile_sum", "tile_min",
          "tile_max")
      },
      Some("""WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |               6 + doc_id % 17 AS h FROM documents),
        |t AS (SELECT doc_id, w, h, unnest(range(0, w // 4)) AS tx
        |      FROM d),
        |t2 AS (SELECT doc_id, w, h, tx, unnest(range(0, h // 4)) AS ty
        |       FROM t),
        |px AS (SELECT doc_id, tx, ty, unnest(range(0, 4)) AS ix
        |       FROM t2),
        |py AS (SELECT doc_id, tx, ty, ix, unnest(range(0, 4)) AS iy
        |       FROM px),
        |v AS (SELECT doc_id, tx, ty,
        |        (doc_id * 31 + (tx * 4 + ix) * 7 + (ty * 4 + iy) * 13)
        |          % 256 AS p
        |      FROM py)
        |SELECT doc_id, tx AS tile_x, ty AS tile_y,
        |  CAST(sum(p) AS BIGINT) AS tile_sum,
        |  CAST(min(p) AS BIGINT) AS tile_min,
        |  CAST(max(p) AS BIGINT) AS tile_max
        |FROM v GROUP BY 1, 2, 3""".stripMargin)),

    // Zero-crossing rate + peak amplitude over REAL decoded WAV PCM —
    // the classic cheap voicing/noisiness features (ZCR separates
    // voiced from fricative/noise segments; peak feeds clipping
    // detection). Same partition-wise AudioSystem decode as
    // mm_decode_wav; integer counts so the oracle replays the
    // synthesis formula sample-by-sample, including the sign logic.
    "mm_audio_zcr" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        wavTable(s, dir).as[(Long, Array[Byte])].mapPartitions { rows =>
          rows.map { case (id, payload) =>
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
            val pcm = ais.readAllBytes()
            var zc = 0L; var peak = 0L; var prev = 0L; var first = true
            var i = 0
            while (i + 1 < pcm.length) {
              val v = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toLong
              if (!first && prev * v < 0) zc += 1
              if (math.abs(v) > peak) peak = math.abs(v)
              prev = v; first = false
              i += 2
            }
            (id, (pcm.length / 2).toLong, zc, peak)
          }
        }.toDF("doc_id", "n_samples", "zero_crossings", "peak")
      },
      Some("""WITH d AS (SELECT doc_id, 256 + doc_id % 256 AS n
        |        FROM documents),
        |i AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |p AS (SELECT doc_id, n, i,
        |        ((doc_id * 7 + i * 31) % 4096 - 2048) * 8 AS s1,
        |        ((doc_id * 7 + (i - 1) * 31) % 4096 - 2048) * 8 AS s0
        |      FROM i)
        |SELECT doc_id, n AS n_samples,
        |  CAST(sum(CASE WHEN i >= 1 AND s0 * s1 < 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS zero_crossings,
        |  CAST(max(abs(s1)) AS BIGINT) AS peak
        |FROM p GROUP BY 1, 2""".stripMargin)),
  )
}
