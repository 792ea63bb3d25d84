package graft.core

/** Graphene bit-packed uint64 label codec.
  *
  * Layout (reference `datasource/graphene/metadata.py:183-250,271-330`):
  * from the top bit downward — [layer : layerBits][x : ct][y : ct]
  * [z : ct][segid : 64 - layerBits - 3*ct], where ct =
  * spatialBitCount(layer) comes from the graph metadata. Labels are
  * uint64; we carry them in Scala Long (two's complement) and use
  * unsigned shifts throughout.
  */
final case class GrapheneLabelSpec(
    layerBits: Int,
    spatialBitCount: Int => Int,
) {
  def segidBits(layer: Int): Int = 64 - layerBits - 3 * spatialBitCount(layer)

  def decodeLayer(label: Long): Int = (label >>> (64 - layerBits)).toInt

  def decode(label: Long): (Int, Long, Long, Long, Long) = {
    val layer = decodeLayer(label)
    val ct = spatialBitCount(layer)
    val sb = segidBits(layer)
    val mask = if (ct == 0) 0L else (1L << ct) - 1L
    val x = (label >>> (sb + 2 * ct)) & mask
    val y = (label >>> (sb + ct)) & mask
    val z = (label >>> sb) & mask
    val segid = label & ((1L << sb) - 1L)
    (layer, x, y, z, segid)
  }

  def encode(layer: Int, x: Long, y: Long, z: Long, segid: Long): Long = {
    val ct = spatialBitCount(layer)
    val sb = segidBits(layer)
    require(x < (1L << ct) && y < (1L << ct) && z < (1L << ct),
      s"chunk coordinate ($x,$y,$z) out of range for $ct bits")
    (layer.toLong << (64 - layerBits)) | (x << (sb + 2 * ct)) |
      (y << (sb + ct)) | (z << sb) | (segid & ((1L << sb) - 1L))
  }

  /** Chunk id = label with segid zeroed (metadata.py:201-206). */
  def chunkId(label: Long): Long = {
    val sb = segidBits(decodeLayer(label))
    label & ~((1L << sb) - 1L)
  }
}
