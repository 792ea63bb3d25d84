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
  require(hashName == "identity" || hashName == "murmurhash3_x86_128",
    s"unknown hash $hashName")

  val minishardMask: Long =
    if (minishardBits == 0) 0L else (1L << minishardBits) - 1L
  val shardMask: Long = {
    val full = (1L << (minishardBits + shardBits)) - 1L
    full ^ minishardMask
  }

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
