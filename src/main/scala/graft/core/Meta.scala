package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Layer metadata: the Neuroglancer precomputed `info` JSON schema
  * (datasource/precomputed/metadata.py:124-155 create_info,
  * `:157-222` parse/fetch). The schema is *declared*, never inferred
  * (SURVEY.md §1.3): `num_channels`, `type`, `data_type`, `scales[]`
  * where each scale has `encoding`, `chunk_sizes`, `key`, `resolution`,
  * `voxel_offset`, `size` and optionally
  * `compressed_segmentation_block_size` and `sharding`.
  *
  * Uses Jackson (already on the Spark classpath) with the tree API —
  * no reflection mapping, so field handling is explicit and tolerant
  * of extra keys, like the reference's dict access.
  */
final case class ScaleMeta(
    key: String,
    encoding: String,
    resolution: Seq[Double],
    chunkSize: Vec3,
    size: Vec3,
    voxelOffset: Vec3,
    csegBlockSize: Option[Vec3] = None,
    sharding: Option[ShardingSpec] = None,
    locked: Boolean = false,
    rois: Option[Seq[Bbox]] = None) {

  /** Volume bounds of this scale in voxel space (metadata.py bounds). */
  def bounds: Bbox = Bbox(voxelOffset, voxelOffset + size)

  def isSharded: Boolean = sharding.isDefined

  /** Grid extent: number of chunks per axis (lib.py:864-867). */
  def gridSize: Vec3 = size.ceilDiv(chunkSize)

  def numChunks: Long = { val g = gridSize; g.x * g.y * g.z }
}

final case class VolumeMeta(
    layerType: String, // "image" | "segmentation"
    dataType: String, // uint8/16/32/64, float32
    numChannels: Int,
    scales: Seq[ScaleMeta],
    mesh: Option[String] = None,
    skeletons: Option[String] = None,
    redirect: Option[String] = None) {

  def scale(mip: Int): ScaleMeta = scales(mip)

  /** Bytes per voxel (metadata.py:529-532). uint64 labels live in Long
    * two's-complement (SURVEY §7 risk register).
    */
  def dtypeBytes: Int = dataType match {
    case "uint8" => 1
    case "uint16" => 2
    case "uint32" | "float32" => 4
    case "uint64" | "float64" => 8
    case d => throw new IllegalArgumentException(s"unsupported data_type $d")
  }

  /** Write locks per mip (metadata.py:840-885 lock_mips /
    * locked_mips): scales carry a `locked` flag in the info JSON.
    */
  def lockedMips: Set[Int] =
    scales.zipWithIndex.collect { case (s, i) if s.locked => i }.toSet

  /** ROIs of mip 0, z-sorted at parse time like parse_rois
    * (metadata.py:191-201). None = the whole volume is in-ROI.
    */
  def sortedRois: Option[Seq[Bbox]] =
    scales.headOption.flatMap(_.rois).map(_.sortBy(_.minpt.z))

  /** F8 add_scale (metadata.py:743-838): derive the scale for
    * `factor` relative to mip 0 — resolution scales by the factor,
    * voxel_offset floors, size ceils, key joins the new resolution.
    */
  def addScale(factor: Vec3): ScaleMeta = {
    val full = scales.head
    val res = Seq(full.resolution(0) * factor.x, full.resolution(1) * factor.y,
      full.resolution(2) * factor.z)
    val key = res.map(r =>
      if (r == math.floor(r)) r.toLong.toString else r.toString).mkString("_")
    full.copy(
      key = key,
      resolution = res,
      chunkSize = Geom.findClosestDivisor(full.chunkSize, Vec3(64, 64, 64)),
      voxelOffset = full.voxelOffset.floorDiv(factor),
      size = full.size.ceilDiv(factor),
      // the reference's newscale dict carries none of these
      // (metadata.py:803-809): rois are mip-0-coordinate boxes, locks
      // are per-mip, sharding is per-scale — leaking them would lock
      // or mis-mask the derived mip
      locked = false,
      rois = None,
      sharding = None)
  }
}

object VolumeMeta {
  private val om = new ObjectMapper()

  private def vec3(n: JsonNode): Vec3 =
    Vec3(n.get(0).asLong, n.get(1).asLong, n.get(2).asLong)

  private def parseSharding(n: JsonNode): ShardingSpec = {
    val t = n.get("@type").asText
    require(t == "neuroglancer_uint64_sharded_v1", s"unknown sharding $t")
    ShardingSpec(
      preshiftBits = n.get("preshift_bits").asInt,
      minishardBits = n.get("minishard_bits").asInt,
      shardBits = n.get("shard_bits").asInt,
      hashName = n.get("hash").asText,
      minishardIndexEncoding =
        Option(n.get("minishard_index_encoding")).map(_.asText).getOrElse("raw"),
      dataEncoding =
        Option(n.get("data_encoding")).map(_.asText).getOrElse("raw"))
  }

  def parseScale(n: JsonNode): ScaleMeta = ScaleMeta(
    key = n.get("key").asText,
    encoding = n.get("encoding").asText,
    resolution = {
      val r = n.get("resolution")
      (0 until r.size).map(i => r.get(i).asDouble)
    },
    chunkSize = vec3(n.get("chunk_sizes").get(0)),
    size = vec3(n.get("size")),
    voxelOffset = Option(n.get("voxel_offset")).map(vec3).getOrElse(Vec3(0, 0, 0)),
    csegBlockSize = Option(n.get("compressed_segmentation_block_size")).map(vec3),
    sharding = Option(n.get("sharding")).map(parseSharding),
    locked = Option(n.get("locked")).exists(_.asBoolean),
    // rois render as [x0,y0,z0,x1,y1,z1] lists (Bbox.from_list,
    // metadata.py:191-199)
    rois = Option(n.get("rois")).map { r =>
      (0 until r.size).map { i =>
        val b = r.get(i)
        Bbox(Vec3(b.get(0).asLong, b.get(1).asLong, b.get(2).asLong),
          Vec3(b.get(3).asLong, b.get(4).asLong, b.get(5).asLong))
      }
    })

  def fromJson(json: String): VolumeMeta = {
    val root = om.readTree(json)
    val scalesNode = Option(root.get("scales"))
      .map(s => (0 until s.size).map(i => parseScale(s.get(i))))
      .getOrElse(Seq.empty)
    VolumeMeta(
      layerType = Option(root.get("type")).map(_.asText).getOrElse("image"),
      dataType = Option(root.get("data_type")).map(_.asText).getOrElse("uint8"),
      numChannels = Option(root.get("num_channels")).map(_.asInt).getOrElse(1),
      scales = scalesNode,
      mesh = Option(root.get("mesh")).map(_.asText),
      skeletons = Option(root.get("skeletons")).map(_.asText),
      redirect = Option(root.get("redirect")).map(_.asText))
  }

  /** Canonical JSON commit (metadata.py:295-334): stable key order,
    * integer resolutions rendered as ints.
    */
  def toJson(meta: VolumeMeta): String = {
    val root = om.createObjectNode()
    root.put("num_channels", meta.numChannels)
    root.put("type", meta.layerType)
    root.put("data_type", meta.dataType)
    val scales = root.putArray("scales")
    meta.scales.foreach { s => renderScale(scales.addObject(), s) }
    meta.mesh.foreach(root.put("mesh", _))
    meta.skeletons.foreach(root.put("skeletons", _))
    meta.redirect.foreach(root.put("redirect", _))
    om.writerWithDefaultPrettyPrinter.writeValueAsString(root)
  }

  private def putVec(o: ObjectNode, field: String, v: Vec3): Unit = {
    val a = o.putArray(field)
    a.add(v.x); a.add(v.y); a.add(v.z)
  }

  private def renderScale(o: ObjectNode, s: ScaleMeta): Unit = {
    o.put("encoding", s.encoding)
    val cs = o.putArray("chunk_sizes").addArray()
    cs.add(s.chunkSize.x); cs.add(s.chunkSize.y); cs.add(s.chunkSize.z)
    o.put("key", s.key)
    val res = o.putArray("resolution")
    s.resolution.foreach { r =>
      if (r == math.floor(r)) res.add(r.toLong) else res.add(r)
    }
    putVec(o, "voxel_offset", s.voxelOffset)
    putVec(o, "size", s.size)
    if (s.locked) o.put("locked", true)
    s.rois.foreach { rs =>
      val arr = o.putArray("rois")
      rs.foreach { b =>
        val e = arr.addArray()
        e.add(b.minpt.x); e.add(b.minpt.y); e.add(b.minpt.z)
        e.add(b.maxpt.x); e.add(b.maxpt.y); e.add(b.maxpt.z)
      }
    }
    s.csegBlockSize.foreach(putVec(o, "compressed_segmentation_block_size", _))
    s.sharding.foreach { sp =>
      val sh = o.putObject("sharding")
      sh.put("@type", "neuroglancer_uint64_sharded_v1")
      sh.put("preshift_bits", sp.preshiftBits)
      sh.put("hash", sp.hashName)
      sh.put("minishard_bits", sp.minishardBits)
      sh.put("shard_bits", sp.shardBits)
      sh.put("minishard_index_encoding", sp.minishardIndexEncoding)
      sh.put("data_encoding", sp.dataEncoding)
    }
  }

  /** Read `<layerDir>/info`, following `redirect` fields up to
    * `maxRedirects` hops with cycle detection (metadata.py:224-293).
    * Redirect values are treated as local layer paths (the file://
    * analog of cloudpath redirects).
    */
  def readInfo(layerDir: String, maxRedirects: Int = 10): VolumeMeta = {
    var dir = layerDir
    var seen = Set.empty[String]
    var hops = 0
    while (true) {
      if (seen.contains(dir))
        throw new IllegalStateException(s"redirect cycle at $dir")
      seen += dir
      val meta = fromJson(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "info")))
      meta.redirect match {
        case None => return meta
        case Some(r) =>
          hops += 1
          if (hops > maxRedirects)
            throw new IllegalStateException(s"too many redirects (> $maxRedirects)")
          dir = r.stripPrefix("file://")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
