package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Precomputed skeleton binary codec (pure Scala).
  *
  * The reference delegates decode to the external `osteoid` package
  * (skeleton.py:1-2; callsite datasource/precomputed/skeleton/
  * unsharded.py:93-95); the wire format is the public Neuroglancer
  * skeleton spec the fixtures in test/test_skeletons.py exercise:
  *
  *   u32 num_vertices | u32 num_edges
  *   num_vertices * 3 * f32 positions
  *   num_edges * 2 * u32 edges
  *   then each declared vertex attribute, nv * components * dtype
  *   (here the reference's default_info pair — f32 "radius" and u8
  *   "vertex_types"; skeleton/metadata.py:117-140)
  */
object SkeletonCodec {

  final case class Skeleton(
      vertices: Array[Float], // 3*nv
      edges: Array[Int], // 2*ne
      radii: Array[Float], // nv
      vertexTypes: Array[Byte]) { // nv
    def nv: Int = vertices.length / 3
    def ne: Int = edges.length / 2
  }

  def encode(s: Skeleton): Array[Byte] = {
    require(s.vertices.length % 3 == 0 && s.edges.length % 2 == 0)
    require(s.radii.length == s.nv, s"radii ${s.radii.length} != nv ${s.nv}")
    require(s.vertexTypes.length == s.nv,
      s"vertex_types ${s.vertexTypes.length} != nv ${s.nv}")
    val buf = ByteBuffer.allocate(
      8 + 4 * s.vertices.length + 4 * s.edges.length + 4 * s.radii.length +
        s.vertexTypes.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(s.nv)
    buf.putInt(s.ne)
    s.vertices.foreach(buf.putFloat)
    s.edges.foreach(buf.putInt)
    s.radii.foreach(buf.putFloat)
    buf.put(s.vertexTypes)
    buf.array()
  }

  def decode(binary: Array[Byte]): Skeleton = {
    val buf = ByteBuffer.wrap(binary).order(ByteOrder.LITTLE_ENDIAN)
    val nv = buf.getInt()
    val ne = buf.getInt()
    require(binary.length == 8 + 12 * nv + 8 * ne + 4 * nv + nv,
      s"skeleton binary ${binary.length}B != expected for nv=$nv ne=$ne")
    val vertices = Array.fill(3 * nv)(buf.getFloat())
    val edges = Array.fill(2 * ne)(buf.getInt())
    val radii = Array.fill(nv)(buf.getFloat())
    val vtypes = new Array[Byte](nv)
    buf.get(vtypes)
    Skeleton(vertices, edges, radii, vtypes)
  }
}
