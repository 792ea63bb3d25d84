package graft.sources

import java.nio.file.{Files, Paths, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Real Neuroglancer precomputed layer I/O on a filesystem.
  *
  * A layer is a directory: `info` JSON at the root plus one directory
  * per scale `key` holding chunk objects named "x0-x1_y0-y1_z0-z1"
  * (image/common.py:137-155). Chunk payloads are encoded per the
  * scale's `encoding` and second-stage compressed per
  * `should_compress` (datasource/precomputed/common.py:18-29); on a
  * filesystem the compressed objects carry a `.gz` suffix (as the
  * reference's file fixtures under test_seg_unsharded/8_8_40/ do).
  *
  * Write path = S9 aligned write (image/tx.py:193-260): the chunk
  * DataFrame is already partitioned by chunk key, so each executor
  * task encodes and writes only its own chunks — the same shape a
  * 1000-executor object-store ingest uses (PUT per chunk, no driver
  * funnel). Read path = S4/S8 (image/rx.py:239-379): grid enumeration
  * is metadata-sized and happens at planning time; file reads happen
  * in executor tasks. For object stores, the file read becomes a GET —
  * the plan shape is identical.
  */
object PrecomputedIO {

  /** Write `info` (metadata.py:295-334 commit_info). */
  def writeInfo(layerDir: String, meta: VolumeMeta): Unit = {
    Files.createDirectories(Paths.get(layerDir))
    Files.writeString(Paths.get(layerDir, "info"), VolumeMeta.toJson(meta))
  }

  def readInfo(layerDir: String): VolumeMeta = VolumeMeta.readInfo(layerDir)

  /** Chunk object path (without compression suffix) for a grid point. */
  def chunkPath(layerDir: String, scale: ScaleMeta, g: Vec3): Path = {
    val name = Geom.chunkBbox(g, scale.bounds, scale.chunkSize).toFilename
    Paths.get(layerDir, scale.key, name)
  }

  /** Read one chunk object; tries `name` then `name.gz` (gunzipping).
    * Returns None when the object is missing (S15 fill_missing decides
    * what that means upstream).
    */
  def readChunkBytes(layerDir: String, scale: ScaleMeta, g: Vec3): Option[Array[Byte]] = {
    val p = chunkPath(layerDir, scale, g)
    val gz = Paths.get(p.toString + ".gz")
    val br = Paths.get(p.toString + ".br")
    if (Files.exists(p)) Some(Files.readAllBytes(p))
    else if (Files.exists(gz)) Some(Codec.gunzip(Files.readAllBytes(gz)))
    else if (Files.exists(br))
      // ceiling = chunk voxels x widest dtype (uint64) + slack: a corrupt
      // object must error, not OOM the executor (see Brotli.decompress)
      Some(Brotli.decompress(Files.readAllBytes(br),
        maxOutput = chunkDecodeCeiling(scale)))
    else None
  }

  /** Decoded-payload ceiling for one chunk (second-stage decompression
    * bound; the image codec then enforces exact size). */
  def chunkDecodeCeiling(scale: ScaleMeta): Int =
    chunkDecodeCeiling(scale.chunkSize)

  def chunkDecodeCeiling(chunkSize: Vec3): Int = {
    val voxels = chunkSize.x * chunkSize.y * chunkSize.z
    (math.min(voxels * 8L + (1L << 20), Int.MaxValue.toLong)).toInt
  }

  /** S9 aligned write: chunk rows (gx, gy, gz, payload) — payload
    * already encoded for the scale's encoding — written as real chunk
    * objects. Executor-side, one file per chunk (tx.py:314-475
    * threaded_upload_chunks; Spark tasks replace the thread pool).
    * With `deleteBlack`, all-background chunks are elided (S14,
    * tx.py:445-456) — pass background payload bytes to compare.
    */
  def writeChunks(chunks: DataFrame, layerDir: String, meta: VolumeMeta,
      mip: Int, deleteBlack: Option[Array[Byte]] = None,
      compress: Option[Boolean] = None,
      codec: Option[String] = None): Unit = {
    // P10 write-lock guard (metadata.py:840-885, frontends/
    // precomputed.py:57-59): refuse writes to locked mips
    if (meta.lockedMips.contains(mip))
      throw new IllegalStateException(
        s"mip $mip is write-locked (scale ${meta.scale(mip).key})")
    val scale = meta.scale(mip)
    val dir = Paths.get(layerDir, scale.key)
    Files.createDirectories(dir)
    // compress=Some(b) overrides the per-encoding policy, like the
    // reference's `compress` kwarg on upload (tx.py:35-61); codec
    // selects the second-stage method itself ("gzip" | "br" | "none",
    // the reference's compress='gzip'/'br'/False values) and takes
    // precedence over the boolean form
    val method = codec.getOrElse(
      if (compress.getOrElse(Codec.shouldCompress(scale.encoding))) "gzip"
      else "none")
    require(Set("gzip", "br", "none")(method),
      s"unsupported chunk compression codec: $method")
    val bounds = scale.bounds
    val cs = scale.chunkSize
    val dirStr = dir.toString
    chunks.select(col("gx"), col("gy"), col("gz"), col("payload"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val g = Vec3(r.getLong(0), r.getLong(1), r.getLong(2))
          val payload = r.getAs[Array[Byte]](3)
          val black = deleteBlack.exists(bg => java.util.Arrays.equals(bg, payload))
          if (!black) {
            val name = Geom.chunkBbox(g, bounds, cs).toFilename
            method match {
              case "gzip" =>
                Files.write(Paths.get(dirStr, name + ".gz"), Codec.gzip(payload))
              case "br" =>
                Files.write(Paths.get(dirStr, name + ".br"),
                  graft.core.Brotli.compress(payload))
              case _ =>
                Files.write(Paths.get(dirStr, name), payload)
            }
          }
        }
      }
  }

  /** S8 raw-file read via the DSv2 source: chunk rows over a bbox
    * (or the whole volume) without decoding. Filters on gx/gy/gz are
    * pushed into the scan (partition pruning); dropping `payload`
    * skips file IO entirely.
    */
  def readChunks(spark: SparkSession, layerDir: String, mip: Int = 0,
      fillMissing: Boolean = false): DataFrame =
    spark.read.format("neuroglancer")
      .option("mip", mip)
      .option("fill_missing", fillMissing)
      .load(layerDir)

  /** S4 cutout read: decode chunks intersecting `bbox` into clipped
    * voxel rows (x, y, z, label). Decode happens once per chunk in the
    * scan projection; the voxel explosion is for oracle-checkability —
    * production cutouts stay at chunk granularity (rx.py:239-379).
    */
  def cutoutVoxels(spark: SparkSession, layerDir: String, bbox: Bbox,
      mip: Int = 0, fillMissing: Boolean = false,
      background: Long = 0L): DataFrame = {
    val meta = readInfo(layerDir)
    // never reinterpret IEEE float payloads as integers — that is
    // silent data corruption, not a decode
    require(!meta.dataType.startsWith("float"),
      s"${meta.dataType} layer — use cutoutVoxelsFloat")
    val scale = meta.scale(mip)
    // ROI coarse-pruning short-circuit (metadata.py:702-722
    // overlaps_roi, used rx.py:63-67,281-285): a request entirely
    // outside the declared ROIs returns a background buffer with ZERO
    // chunk IO — the planning-time check SURVEY §4 calls for. Mip>0
    // requests are first lifted to mip 0 where ROIs are declared.
    val inRoi = meta.sortedRois match {
      case Some(rois) if mip == 0 => rois.exists(_.overlapsBbox(bbox))
      case _ => true // no ROI list (or non-0 mip in this subset) = all in
    }
    if (!inRoi) {
      val clip = bbox.intersection(scale.bounds)
      import spark.implicits._
      val sz = clip.size
      return spark.range(math.max(sz.x * sz.y * sz.z, 0L)).select(
        (col("id") % sz.x + clip.minpt.x).as("x"),
        ((col("id") / sz.x).cast("long") % sz.y + clip.minpt.y).as("y"),
        ((col("id") / (sz.x * sz.y)).cast("long") + clip.minpt.z).as("z"),
        lit(background).as("label"))
    }
    val chunks = readChunks(spark, layerDir, mip, fillMissing)
      .filter(col("x1") > bbox.minpt.x && col("x0") < bbox.maxpt.x &&
        col("y1") > bbox.minpt.y && col("y0") < bbox.maxpt.y &&
        col("z1") > bbox.minpt.z && col("z0") < bbox.maxpt.z)
    decodeToVoxels(chunks, bbox, scale, meta.dtypeBytes, background)
  }

  /** S4 float-image cutout (float32/float64 raw layers — the
    * reference's float dtype support; fpzip-compressed float chunks
    * are n/a with the other C++ codecs). Same pruned scan + clip loop
    * as the integer path, but voxels decode as IEEE doubles and the
    * value column is DOUBLE.
    *
    * @return voxel rows (x, y, z, value: double)
    */
  def cutoutVoxelsFloat(spark: SparkSession, layerDir: String, bbox: Bbox,
      mip: Int = 0, fillMissing: Boolean = false): DataFrame = {
    val meta = readInfo(layerDir)
    val scale = meta.scale(mip)
    require(meta.dataType.startsWith("float"),
      s"${meta.dataType} layer — use cutoutVoxels")
    require(scale.encoding == "raw",
      s"float cutout reads raw encoding, not ${scale.encoding}")
    val dtb = meta.dtypeBytes
    val chunks = readChunks(spark, layerDir, mip, fillMissing)
      .filter(col("x1") > bbox.minpt.x && col("x0") < bbox.maxpt.x &&
        col("y1") > bbox.minpt.y && col("y0") < bbox.maxpt.y &&
        col("z1") > bbox.minpt.z && col("z0") < bbox.maxpt.z)
    val decodeUdf = udf((x0: Long, y0: Long, z0: Long, x1: Long, y1: Long,
        z1: Long, payload: Array[Byte]) => {
      val sx = x1 - x0; val sy = y1 - y0; val sz = z1 - z0
      val vox =
        if (payload == null) new Array[Double]((sx * sy * sz).toInt)
        else Codec.decodeRawFloatsToDoubles(payload, dtb)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Double)]
      val lox = math.max(x0, bbox.minpt.x); val hix = math.min(x1, bbox.maxpt.x)
      val loy = math.max(y0, bbox.minpt.y); val hiy = math.min(y1, bbox.maxpt.y)
      val loz = math.max(z0, bbox.minpt.z); val hiz = math.min(z1, bbox.maxpt.z)
      var z = loz
      while (z < hiz) {
        var y = loy
        while (y < hiy) {
          var x = lox
          while (x < hix) {
            val i = (x - x0) + sx * ((y - y0) + sy * (z - z0))
            out += ((x, y, z, vox(i.toInt)))
            x += 1
          }
          y += 1
        }
        z += 1
      }
      out.toSeq
    })
    chunks
      .select(explode(decodeUdf(col("x0"), col("y0"), col("z0"),
        col("x1"), col("y1"), col("z1"), col("payload"))).as("vx"))
      .select(col("vx._1").as("x"), col("vx._2").as("y"),
        col("vx._3").as("z"), col("vx._4").as("value"))
  }

  /** P2/S4 multi-channel cutout: chunk payloads hold all channels in
    * F-order with channel SLOWEST (a uint8 RGBA chunk is 4 contiguous
    * x-fastest planes — chunks.py:323-325 encode_raw tobytes('F'),
    * frontends/precomputed.py:348-351 shape (x,y,z,channels)).
    * `channels` is the reified channel slice of the reference's 4-D
    * __getitem__ (frontends/precomputed.py:582-588 channel_slice):
    * only requested channels become rows, so the selection prunes
    * inside the decode rather than after the explode.
    *
    * @return voxel rows (x, y, z, c, value)
    */
  def cutoutVoxelsChannels(spark: SparkSession, layerDir: String,
      bbox: Bbox, channels: Seq[Int], mip: Int = 0,
      fillMissing: Boolean = false): DataFrame = {
    val meta = readInfo(layerDir)
    val scale = meta.scale(mip)
    // png/jpeg chunks hold the same 4-D data as one interleaved-pixel
    // image (chunks.py:207-218 as2d; decoded back to the planar raw
    // layout); jpeg is RGB-only per the reference (chunks.py:277)
    require(Set("raw", "png", "jpeg").contains(scale.encoding),
      s"multi-channel cutout reads raw/png/jpeg, not ${scale.encoding}")
    val isPng = scale.encoding == "png"
    val isJpeg = scale.encoding == "jpeg"
    require(!(isPng || isJpeg) || meta.dataType == "uint8",
      s"${scale.encoding} encoding requires uint8, not ${meta.dataType}")
    val dtb = meta.dtypeBytes
    val nc = meta.numChannels
    require(!isJpeg || nc == 3,
      s"jpeg multi-channel requires 3 channels, got $nc")
    require(channels.nonEmpty && channels.forall(c => c >= 0 && c < nc),
      s"channel slice $channels out of range for $nc channels")
    val chans = channels.toArray
    val chunks = readChunks(spark, layerDir, mip, fillMissing)
      .filter(col("x1") > bbox.minpt.x && col("x0") < bbox.maxpt.x &&
        col("y1") > bbox.minpt.y && col("y0") < bbox.maxpt.y &&
        col("z1") > bbox.minpt.z && col("z0") < bbox.maxpt.z)
    val decodeUdf = udf((x0: Long, y0: Long, z0: Long, x1: Long, y1: Long,
        z1: Long, payload: Array[Byte]) => {
      val sx = x1 - x0; val sy = y1 - y0; val sz = z1 - z0
      val plane = (sx * sy * sz).toInt
      val vox =
        if (payload == null) new Array[Long](plane * nc)
        else if (isPng) Codec.decodePngChannelsToLongs(payload, nc)
        else if (isJpeg) Codec.decodeJpegChannelsToLongs(payload)
        else Codec.decodeRawToLongs(payload, dtb)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long)]
      val lox = math.max(x0, bbox.minpt.x); val hix = math.min(x1, bbox.maxpt.x)
      val loy = math.max(y0, bbox.minpt.y); val hiy = math.min(y1, bbox.maxpt.y)
      val loz = math.max(z0, bbox.minpt.z); val hiz = math.min(z1, bbox.maxpt.z)
      var z = loz
      while (z < hiz) {
        var y = loy
        while (y < hiy) {
          var x = lox
          while (x < hix) {
            val i = ((x - x0) + sx * ((y - y0) + sy * (z - z0))).toInt
            var ci = 0
            while (ci < chans.length) {
              out += ((x, y, z, chans(ci).toLong, vox(i + plane * chans(ci))))
              ci += 1
            }
            x += 1
          }
          y += 1
        }
        z += 1
      }
      out.toSeq
    })
    chunks
      .select(explode(decodeUdf(col("x0"), col("y0"), col("z0"),
        col("x1"), col("y1"), col("z1"), col("payload"))).as("vx"))
      .select(col("vx._1").as("x"), col("vx._2").as("y"),
        col("vx._3").as("z"), col("vx._4").as("c"),
        col("vx._5").as("value"))
  }

  /** Shared decode stage: chunk rows (x0..z1, payload) -> voxel rows
    * clipped to `bbox`, dispatching on the scale's encoding.
    * `background` is the fill value for missing (null-payload) chunks —
    * the reference's background_color option (image/rx.py background
    * buffers; test_cloudvolume.py:85-140), default 0.
    */
  def decodeToVoxels(chunks: DataFrame, bbox: Bbox, scale: ScaleMeta,
      dtb: Int, background: Long = 0L): DataFrame = {
    val enc = scale.encoding
    val csegBs = scale.csegBlockSize.getOrElse(Vec3(8, 8, 8))
    val bg = background
    // the UDF name carries the codec parameters so the ContainsGateRule
    // optimizer rule can synthesize a payload-level contains() gate
    // for label-equality filters above this decode (see
    // graft.functions.ContainsGateRule); the trailing field is the
    // background value the gate must credit to null payloads
    val decodeUdf = udf((x0: Long, y0: Long, z0: Long, x1: Long, y1: Long,
        z1: Long, payload: Array[Byte]) => {
      val sx = x1 - x0; val sy = y1 - y0; val sz = z1 - z0
      val vox =
        if (payload == null) Array.fill((sx * sy * sz).toInt)(bg)
        else if (enc == "compressed_segmentation")
          Cseg.decode(payload, Vec3(sx, sy, sz), csegBs, dtb)
        else if (enc == "compresso") Compresso.decode(payload)._2
        else if (enc == "png" && dtb == 2) Codec.decodePng16(payload)
        else if (enc == "png")
          Codec.decodeRawToLongs(Codec.decodePng(payload), 1)
        else if (enc == "npz") Codec.decodeNpz(payload)._2
        else Codec.decodeRawToLongs(payload, dtb)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      val lox = math.max(x0, bbox.minpt.x); val hix = math.min(x1, bbox.maxpt.x)
      val loy = math.max(y0, bbox.minpt.y); val hiy = math.min(y1, bbox.maxpt.y)
      val loz = math.max(z0, bbox.minpt.z); val hiz = math.min(z1, bbox.maxpt.z)
      var z = loz
      while (z < hiz) {
        var y = loy
        while (y < hiy) {
          var x = lox
          while (x < hix) {
            val i = (x - x0) + sx * ((y - y0) + sy * (z - z0))
            out += ((x, y, z, vox(i.toInt)))
            x += 1
          }
          y += 1
        }
        z += 1
      }
      out.toSeq
    }).withName(s"graft_decode_voxels:$enc:$dtb:" +
      s"${csegBs.x}_${csegBs.y}_${csegBs.z}:$bg")
    chunks
      .select(explode(decodeUdf(col("x0"), col("y0"), col("z0"),
        col("x1"), col("y1"), col("z1"), col("payload"))).as("vx"))
      .select(col("vx._1").as("x"), col("vx._2").as("y"),
        col("vx._3").as("z"), col("vx._4").as("label"))
  }
}
