package graft.sources

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Zarr v3 array I/O (S18) — the essential subset the reference's
  * zarr3 datasource reads (datasource/zarr3/metadata.py:66-261,
  * zarr3/image.py:49-139):
  *
  * - `zarr.json` with shape, data_type, regular chunk_grid,
  *   default chunk_key_encoding ("c/<i>/<j>/<k>"), fill_value, and a
  *   codec chain of `bytes` (little-endian) + optional `gzip`.
  * - Chunk objects are FULL-size (edge chunks padded with fill_value,
  *   unlike precomputed's clamped chunks) and laid out in C order —
  *   shape's last dimension fastest. The engine's canonical voxel
  *   order is Fortran (x fastest), so the bytes codec transposes at
  *   the boundary, exactly where the reference applies its transpose
  *   codec (zarr3/image.py:79-103).
  *
  * The zarr time axis / 5-D model (§2.9) shares this layout with `t`
  * appended to the chunk key; the 3-D subset here is the read-path
  * core.
  */
object Zarr3IO {

  final case class Zarr3Meta(
      shape: Vec3, // logical (x, y, z)
      chunkShape: Vec3,
      dataType: String,
      fillValue: Long,
      gzipped: Boolean) {
    def dtypeBytes: Int = dataType match {
      case "uint8" => 1
      case "uint16" => 2
      case "uint32" => 4
      case "uint64" => 8
      case d => throw new IllegalArgumentException(s"zarr data_type $d")
    }
    def gridSize: Vec3 = shape.ceilDiv(chunkShape)
  }

  private val om = new ObjectMapper()

  def writeMeta(dir: String, m: Zarr3Meta): Unit = {
    val root = om.createObjectNode()
    root.put("zarr_format", 3)
    root.put("node_type", "array")
    val sh = root.putArray("shape")
    sh.add(m.shape.x); sh.add(m.shape.y); sh.add(m.shape.z)
    root.put("data_type", m.dataType)
    val grid = root.putObject("chunk_grid")
    grid.put("name", "regular")
    val gc = grid.putObject("configuration").putArray("chunk_shape")
    gc.add(m.chunkShape.x); gc.add(m.chunkShape.y); gc.add(m.chunkShape.z)
    val cke = root.putObject("chunk_key_encoding")
    cke.put("name", "default")
    cke.putObject("configuration").put("separator", "/")
    root.put("fill_value", m.fillValue)
    val codecs = root.putArray("codecs")
    val bytesCodec = codecs.addObject()
    bytesCodec.put("name", "bytes")
    bytesCodec.putObject("configuration").put("endian", "little")
    if (m.gzipped) {
      val gz = codecs.addObject()
      gz.put("name", "gzip")
      gz.putObject("configuration").put("level", 5)
    }
    val names = root.putArray("dimension_names")
    names.add("x"); names.add("y"); names.add("z")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "zarr.json"),
      om.writerWithDefaultPrettyPrinter.writeValueAsString(root))
  }

  def readMeta(dir: String): Zarr3Meta = {
    val root = om.readTree(Files.readString(Paths.get(dir, "zarr.json")))
    require(root.get("zarr_format").asInt == 3, "not a zarr v3 array")
    require(root.get("node_type").asText == "array")
    val sh = root.get("shape")
    val grid = root.get("chunk_grid")
    require(grid.get("name").asText == "regular")
    val cs = grid.get("configuration").get("chunk_shape")
    val codecs = root.get("codecs")
    val codecNames = (0 until codecs.size).map(codecs.get(_).get("name").asText)
    require(codecNames.headOption.contains("bytes"),
      s"unsupported codec chain $codecNames")
    // the engine decodes little-endian only; a big-endian array would
    // otherwise be silently misread, so reject it here
    val endian = Option(codecs.get(0).get("configuration"))
      .flatMap(c => Option(c.get("endian"))).map(_.asText).getOrElse("little")
    require(endian == "little", s"unsupported bytes endian '$endian'")
    Zarr3Meta(
      shape = Vec3(sh.get(0).asLong, sh.get(1).asLong, sh.get(2).asLong),
      chunkShape = Vec3(cs.get(0).asLong, cs.get(1).asLong, cs.get(2).asLong),
      dataType = root.get("data_type").asText,
      fillValue = Option(root.get("fill_value")).map(_.asLong).getOrElse(0L),
      gzipped = codecNames.contains("gzip"))
  }

  /** C-order chunk bytes -> F-order Long voxels (the bytes-codec
    * transpose at the canonical-order boundary).
    */
  def decodeChunkToF(payload: Array[Byte], cs: Vec3, dtb: Int): Array[Long] = {
    val c = Codec.decodeRawToLongs(payload, dtb)
    require(c.length == cs.x * cs.y * cs.z,
      s"chunk has ${c.length} voxels, expected ${cs.x * cs.y * cs.z}")
    val out = new Array[Long](c.length)
    var x = 0L
    while (x < cs.x) {
      var y = 0L
      while (y < cs.y) {
        var z = 0L
        while (z < cs.z) {
          // C order of shape (x,y,z): z fastest; F order: x fastest
          out((x + cs.x * (y + cs.y * z)).toInt) =
            c((z + cs.z * (y + cs.y * x)).toInt)
          z += 1
        }
        y += 1
      }
      x += 1
    }
    out
  }

  /** F-order voxels -> C-order chunk bytes (write-side transpose). */
  def encodeChunkFromF(vox: Array[Long], cs: Vec3, dtb: Int): Array[Byte] = {
    val c = new Array[Long](vox.length)
    var x = 0L
    while (x < cs.x) {
      var y = 0L
      while (y < cs.y) {
        var z = 0L
        while (z < cs.z) {
          c((z + cs.z * (y + cs.y * x)).toInt) =
            vox((x + cs.x * (y + cs.y * z)).toInt)
          z += 1
        }
        y += 1
      }
      x += 1
    }
    Codec.encodeRawFromLongs(c, dtb)
  }

  /** Write chunk rows (gx, gy, gz, vox: F-order full-chunk Long array)
    * as zarr chunk objects `c/<gx>/<gy>/<gz>`.
    */
  def writeChunks(chunks: DataFrame, dir: String, m: Zarr3Meta): Unit = {
    val cs = m.chunkShape
    val dtb = m.dtypeBytes
    val gz = m.gzipped
    val dirStr = dir
    chunks.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.foreach { r =>
        val bytes = encodeChunkFromF(r.getSeq[Long](3).toArray, cs, dtb)
        val payload = if (gz) Codec.gzip(bytes) else bytes
        val p = Paths.get(dirStr, "c", r.getLong(0).toString,
          r.getLong(1).toString)
        Files.createDirectories(p)
        Files.write(p.resolve(r.getLong(2).toString), payload)
      }
    }
  }

  /** S18 cutout: enumerate the pruned grid at planning time, read +
    * decode chunk objects in executor tasks, clip padded edge voxels
    * to the array shape and the request bbox.
    */
  def cutoutVoxels(spark: SparkSession, dir: String, bbox: Bbox): DataFrame = {
    val m = readMeta(dir)
    val cs = m.chunkShape
    val dtb = m.dtypeBytes
    val isGz = m.gzipped
    val bounds = Bbox(Vec3(0, 0, 0), m.shape)
    val pts = Geom.gridpoints(bbox, bounds, cs)
    val dirStr = dir
    val clip = bbox.intersection(bounds)
    val fill = m.fillValue
    import spark.implicits._
    spark.createDataset(pts.map(g => (g.x, g.y, g.z)))
      .repartition(math.max(pts.size / 4, 1))
      .flatMap { case (gx, gy, gz) =>
        val p = Paths.get(dirStr, "c", gx.toString, gy.toString, gz.toString)
        // zarr defines an absent chunk key as a fill_value-filled chunk
        // (the reference raises EmptyVolumeException unless
        // fill_missing; zarr3/image.py:49-139)
        val vox =
          if (!Files.exists(p)) Array.fill((cs.x * cs.y * cs.z).toInt)(fill)
          else {
            val raw = Files.readAllBytes(p)
            decodeChunkToF(if (isGz) Codec.gunzip(raw) else raw, cs, dtb)
          }
        val lo = Vec3(gx * cs.x, gy * cs.y, gz * cs.z)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var z = math.max(lo.z, clip.minpt.z)
        while (z < math.min(lo.z + cs.z, clip.maxpt.z)) {
          var y = math.max(lo.y, clip.minpt.y)
          while (y < math.min(lo.y + cs.y, clip.maxpt.y)) {
            var x = math.max(lo.x, clip.minpt.x)
            while (x < math.min(lo.x + cs.x, clip.maxpt.x)) {
              out += ((x, y, z,
                vox(((x - lo.x) + cs.x * ((y - lo.y) + cs.y * (z - lo.z))).toInt)))
              x += 1
            }
            y += 1
          }
          z += 1
        }
        out
      }.toDF("x", "y", "z", "label")
  }
}
