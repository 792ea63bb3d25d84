package graft.core

/** Neuroglancer sharded-format addressing and index math.
  *
  * Re-specifies `datasource/precomputed/sharding.py:38-277`
  * (ShardingSpecification) from the public format spec. A label (chunk
  * morton code or segid) maps to a (shard file, minishard) pair via
  * preshift + hash + bit masks (`sharding.py:154-162`, masks
  * `:109-126`). Minishard indexes store labels delta-encoded in
  * ascending order with offsets as running sums (`sharding.py:902-932`
  * encode, `:401-417` decode).
  */
final case class ShardingSpec(
    preshiftBits: Int,
    minishardBits: Int,
    shardBits: Int,
    hashName: String = "identity", // or "murmurhash3_x86_128"
    minishardIndexEncoding: String = "raw", // or "gzip"
    dataEncoding: String = "raw", // or "gzip"
) {
  require(preshiftBits >= 0 && minishardBits >= 0 && shardBits >= 0)
  // sharding.py ShardingSpecification.validate (test_sharding.py:127):
  // the two bit fields must fit a uint64 TOGETHER — 64+0 and 0+64 are
  // valid, 64+1 and 1+64 are SpecViolations
  require(minishardBits + shardBits <= 64,
    s"shard_bits ($shardBits) + minishard_bits ($minishardBits) " +
      "must be <= 64")
  require(hashName == "identity" || hashName == "murmurhash3_x86_128",
    s"unknown hash $hashName")

  // JVM shifts are mod 64, so the legal 64-bit-wide masks need the
  // explicit all-ones case ((1L << 64) - 1 would wrap to 0)
  private def lowMask(n: Int): Long = if (n >= 64) -1L else (1L << n) - 1L
  val minishardMask: Long = lowMask(minishardBits)
  val shardMask: Long = lowMask(minishardBits + shardBits) ^ minishardMask

  def applyHash(v: Long): Long = hashName match {
    case "identity" => v
    case "murmurhash3_x86_128" => MurmurHash3_128.hashUint64LE(v)
  }

  /** (shardNumber, minishardNumber) for a label (sharding.py:154-162). */
  def shardLocation(label: Long): (Long, Long) = {
    val chunkId = applyHash(label >>> preshiftBits)
    val minishard = chunkId & minishardMask
    val shard = (chunkId & shardMask) >>> minishardBits
    (shard, minishard)
  }

  /** Shard filename: lowercase hex, zero-filled to ceil(shardBits/4)
    * digits, ".shard" suffix (sharding.py:160-162).
    */
  def shardFilename(shardNumber: Long): String = {
    val digits = math.max(1, (shardBits + 3) / 4)
    f"%%0${digits}x".format(shardNumber) + ".shard"
  }
}

object ShardingSpec {

  /** Parse a `neuroglancer_uint64_sharded_v1` JSON object (the
    * `sharding` block images, skeletons, meshes, and annotation id
    * indexes all share).
    */
  def fromJson(n: com.fasterxml.jackson.databind.JsonNode): ShardingSpec = {
    val t = n.get("@type").asText
    require(t == "neuroglancer_uint64_sharded_v1", s"unknown sharding $t")
    ShardingSpec(
      preshiftBits = n.get("preshift_bits").asInt,
      minishardBits = n.get("minishard_bits").asInt,
      shardBits = n.get("shard_bits").asInt,
      hashName = n.get("hash").asText,
      minishardIndexEncoding = Option(n.get("minishard_index_encoding"))
        .map(_.asText).getOrElse("raw"),
      dataEncoding = Option(n.get("data_encoding"))
        .map(_.asText).getOrElse("raw"))
  }

  /** Inverse of [[fromJson]]: fill `o` with the spec's fields. */
  def putJson(o: com.fasterxml.jackson.databind.node.ObjectNode,
      sp: ShardingSpec): Unit = {
    o.put("@type", "neuroglancer_uint64_sharded_v1")
    o.put("preshift_bits", sp.preshiftBits)
    o.put("hash", sp.hashName)
    o.put("minishard_bits", sp.minishardBits)
    o.put("shard_bits", sp.shardBits)
    o.put("minishard_index_encoding", sp.minishardIndexEncoding)
    o.put("data_encoding", sp.dataEncoding)
  }

  /** Static flat-arg shard/minishard computation for codegen callsites
    * (graft.functions — Janino resolves these through the static
    * forwarders on `graft.core.ShardingSpec`).
    */
  def shardOf(label: Long, preshiftBits: Int, minishardBits: Int,
      shardBits: Int, mmh3: Boolean): Long = {
    val chunkId = hashOf(label, preshiftBits, mmh3)
    val minishardMask = if (minishardBits == 0) 0L else (1L << minishardBits) - 1L
    val full = (1L << (minishardBits + shardBits)) - 1L
    ((chunkId & (full ^ minishardMask)) >>> minishardBits)
  }

  def minishardOf(label: Long, preshiftBits: Int, minishardBits: Int,
      mmh3: Boolean): Long = {
    val chunkId = hashOf(label, preshiftBits, mmh3)
    chunkId & (if (minishardBits == 0) 0L else (1L << minishardBits) - 1L)
  }

  private def hashOf(label: Long, preshiftBits: Int, mmh3: Boolean): Long = {
    val v = label >>> preshiftBits
    if (mmh3) MurmurHash3_128.hashUint64LE(v) else v
  }
}

object ShardIndex {
  /** Delta-encode an ascending label list: first label absolute, then
    * successive differences (sharding.py:902-932).
    */
  def deltaEncode(labels: Seq[Long]): Seq[Long] =
    if (labels.isEmpty) Seq.empty
    // note: sliding(2) on a 1-element list yields a single 1-element
    // window, so pair off explicitly (a singleton list is just its head)
    else labels.head +: labels.zip(labels.tail).map { case (a, b) => b - a }

  /** Inverse: cumulative sum (sharding.py:401-417). */
  def deltaDecode(deltas: Seq[Long]): Seq[Long] =
    deltas.scanLeft(0L)(_ + _).tail

  /** Coalesce sorted (start, end) byte ranges into covering bundles when
    * adjacent or within `gap` bytes (sharding.py:731-766) — the
    * gaps-and-islands pattern.
    */
  def coalesceRanges(ranges: Seq[(Long, Long)], gap: Long = 0)
      : Seq[(Long, Long)] = {
    val sorted = ranges.sortBy(_._1)
    sorted.foldLeft(List.empty[(Long, Long)]) {
      case (Nil, r) => r :: Nil
      case (acc @ ((s0, e0) :: rest), (s, e)) =>
        if (s <= e0 + gap) (s0, math.max(e0, e)) :: rest else (s, e) :: acc
    }.reverse
  }
}

/** Sharding-scheme planners (sharding.py:985-1083
  * compute_shard_params_for_hashed / compute_shard_params_for_image,
  * :1215-1260 image_shard_shape_from_spec) — the utilities that pick
  * (shard_bits, minishard_bits, preshift_bits) when CREATING a sharded
  * layer, sized so shard/minishard indices stay cache- and
  * network-friendly. Pure arithmetic, mirrored exactly (including the
  * 0.55-utilization shard-bit giveback and the z-slice preshift
  * padding) so specs planned here agree with the reference's.
  */
object ShardParams {

  private def ceilLog2(x: Double): Double = math.ceil(math.log(x) / math.log(2))

  /** For uniformly-hashed keys (skeletons/meshes; murmurhash spreads
    * them): preshift bits are useless, so solve for shard/minishard
    * bits against the index-size budgets. Known answers:
    * test_sharding.py:474-519.
    *
    * @return (shardBits, minishardBits, preshiftBits=0)
    */
  def forHashed(numLabels: Long, shardIndexBytes: Long = 1L << 13,
      minishardIndexBytes: Long = 1L << 15, minShards: Long = 1)
      : (Int, Int, Int) = {
    require(minShards >= 1, s"minShards $minShards must be >= 1")
    if (numLabels <= 0) return (0, 0, 0)
    val numMinishardsPerShard = shardIndexBytes / 2.0 / 8.0
    val labelsPerMinishard = minishardIndexBytes / 3.0 / 8.0
    val labelsPerShard = numMinishardsPerShard * labelsPerMinishard
    var (shardBits, minishardBits) =
      if (numLabels >= labelsPerShard) {
        val msb = ceilLog2(numMinishardsPerShard)
        (ceilLog2(numLabels / (labelsPerMinishard * math.pow(2, msb))), msb)
      } else if (numLabels >= labelsPerMinishard) {
        (0.0, ceilLog2(numLabels / labelsPerMinishard))
      } else (0.0, 0.0)
    val capacity = labelsPerShard * math.pow(2, shardBits)
    if (numLabels / capacity <= 0.55) shardBits -= 1
    shardBits = math.max(shardBits, 0)
    // np.round = banker's rounding = Math.rint
    val minShardBits = math.rint(math.log(minShards.toDouble) / math.log(2))
    val delta = math.max(minShardBits - shardBits, 0)
    shardBits += delta
    minishardBits -= delta
    shardBits = math.max(shardBits, minShardBits)
    minishardBits = math.max(minishardBits, 0)
    (shardBits.toInt, minishardBits.toInt, 0)
  }

  /** For morton-coded image chunks: pack ~`uncompressedShardBytes` of
    * chunks per shard via preshift bits, split minishards until the
    * per-minishard label count and both index sizes fit their budgets,
    * and pad z-slice layers' preshift so shard shapes stay cubic in
    * x/y (sharding.py:1060-1213). Invariant checks mirror the
    * reference's ValueErrors.
    *
    * @return (shardBits, minishardBits, preshiftBits)
    */
  def forImage(datasetSize: Vec3, chunkSize: Vec3, byteWidth: Int,
      uncompressedShardBytes: Long = 3500000000L,
      maxShardIndexBytes: Long = 8192,
      maxMinishardIndexBytes: Long = 40000,
      maxLabelsPerMinishard: Long = 4000): (Int, Int, Int) = {
    val grid = Vec3(
      (datasetSize.x + chunkSize.x - 1) / chunkSize.x,
      (datasetSize.y + chunkSize.y - 1) / chunkSize.y,
      (datasetSize.z + chunkSize.z - 1) / chunkSize.z)
    val numChunks = grid.x * grid.y * grid.z
    val chunkVoxels = chunkSize.x * chunkSize.y * chunkSize.z
    var maxBits = Seq(grid.x, grid.y, grid.z)
      .map(g => ceilLog2(g.toDouble).toInt).sum
    var chunksPerShard = math.pow(2, math.floor(math.log(math.ceil(
      uncompressedShardBytes.toDouble / (chunkVoxels * byteWidth))) /
      math.log(2)))
    if (numChunks < chunksPerShard)
      chunksPerShard = math.pow(2, ceilLog2(numChunks.toDouble))
    var numShards = numChunks / chunksPerShard
    var shardBits = 0
    var preshiftBits = 0
    def updateBits(): Unit = {
      shardBits = ceilLog2(numShards).toInt
      preshiftBits = math.min(ceilLog2(chunksPerShard).toInt,
        maxBits - shardBits)
    }
    updateBits()
    var labelsPerMinishard = chunksPerShard
    var minishardBits = 0
    while (labelsPerMinishard > maxLabelsPerMinishard) {
      labelsPerMinishard /= 2
      minishardBits += 1
      val minishardSize = 3 * 8 * labelsPerMinishard
      val shardIndexSize = 2L * 8 * (1L << minishardBits)
      val minishardIndexTooBig =
        minishardSize > maxMinishardIndexBytes && minishardBits > preshiftBits
      if (minishardIndexTooBig || shardIndexSize > maxShardIndexBytes) {
        minishardBits -= 1
        numShards *= 2
        updateBits()
      }
    }
    preshiftBits -= minishardBits
    if (datasetSize.z == chunkSize.z) {
      // single-z-slice layers: pad preshift so shard shapes stay
      // squarish in x/y, banking the extra information in max_bits
      val additionalBits = preshiftBits / 3
      var i = 0
      while (i < additionalBits) {
        maxBits += 1
        preshiftBits += 1
        if (preshiftBits % 3 != 0) i += 1
      }
    }
    shardBits = math.max(maxBits - preshiftBits - minishardBits, 0)
    require(maxBits <= 64,
      s"$maxBits bits needed for chunk positions exceeds uint64")
    require(preshiftBits >= 0, s"negative preshift_bits $preshiftBits")
    require(preshiftBits + shardBits + minishardBits <= maxBits,
      s"$preshiftBits + $shardBits + $minishardBits > $maxBits")
    (shardBits, minishardBits, preshiftBits)
  }

  /** Shard shape in voxels for an image sharding spec
    * (sharding.py:1215-1260): distribute preshift+minishard bits over
    * the axes round-robin (capped per-axis by the grid), then scale by
    * the chunk size.
    */
  def imageShardShape(datasetSize: Vec3, chunkSize: Vec3,
      preshiftBits: Int, minishardBits: Int): Vec3 = {
    val shapeBits = preshiftBits + minishardBits
    require(shapeBits < 64,
      s"preshift ($preshiftBits) + minishard ($minishardBits) must be < 64")
    val grid = Vec3(
      (datasetSize.x + chunkSize.x - 1) / chunkSize.x,
      (datasetSize.y + chunkSize.y - 1) / chunkSize.y,
      (datasetSize.z + chunkSize.z - 1) / chunkSize.z)
    val shape = Array(0L, 0L, 0L)
    val over = Array(false, false, false)
    val gs = Array(grid.x, grid.y, grid.z)
    var i = 0
    var done = false
    while (i < shapeBits && !done) {
      var changed = false
      var dim = 0
      while (dim < 3 && i < shapeBits) {
        if (math.pow(2, shape(dim) + 1) < gs(dim) * 2 && !over(dim)) {
          if (math.pow(2, shape(dim) + 1) >= gs(dim)) over(dim) = true
          shape(dim) += 1
          i += 1
          changed = true
        }
        dim += 1
      }
      if (!changed) done = true
    }
    Vec3(chunkSize.x * (1L << shape(0)), chunkSize.y * (1L << shape(1)),
      chunkSize.z * (1L << shape(2)))
  }
}
