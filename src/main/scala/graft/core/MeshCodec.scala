package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Precomputed mesh binary codecs (pure Scala, no Spark deps).
  *
  * Single-resolution fragment format (mesh.py:174-230 from_precomputed
  * / to_precomputed):
  *
  *   uint32 Nv | Nv * 3 * float32 vertices | 3 * uint32 faces to end
  *
  * Multi-resolution manifest format (mesh/multilod.py:327-466,
  * mirroring the Neuroglancer spec): little-endian header
  *   chunk_shape f32x3 | grid_origin f32x3 | num_lods u32 |
  *   lod_scales f32[L] | vertex_offsets f32[L*3] |
  *   num_fragments_per_lod u32[L]
  * followed per lod by fragment_positions u32[3*n] (column-major:
  * all x, then all y, then all z — numpy order="F" at
  * multilod.py:373-375) and fragment_offsets u32[n] (byte sizes;
  * a fragment's byte start is the running sum of all prior offsets —
  * multilod.py:276-289, W5).
  */
object MeshCodec {

  /** A decoded single-resolution mesh fragment: vertices flattened as
    * (x0,y0,z0,x1,...), faces as vertex-index triples.
    */
  final case class MeshFragment(vertices: Array[Float], faces: Array[Int])

  def encode(m: MeshFragment): Array[Byte] = {
    require(m.vertices.length % 3 == 0 && m.faces.length % 3 == 0)
    val nv = m.vertices.length / 3
    val buf = ByteBuffer.allocate(4 + 4 * m.vertices.length + 4 * m.faces.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(nv)
    m.vertices.foreach(buf.putFloat)
    m.faces.foreach(buf.putInt)
    buf.array()
  }

  /** OBJ text export (mesh.py:277-283): one `v x y z` line per vertex
    * (5 decimals) followed by one 1-indexed `f a b c` line per face,
    * '\n'-joined with a trailing newline.
    */
  def toObj(m: MeshFragment): Array[Byte] = {
    require(m.vertices.length % 3 == 0 && m.faces.length % 3 == 0)
    val sb = new StringBuilder
    var i = 0
    while (i < m.vertices.length) {
      sb.append(String.format(java.util.Locale.ROOT, "v %.5f %.5f %.5f\n",
        Float.box(m.vertices(i)), Float.box(m.vertices(i + 1)),
        Float.box(m.vertices(i + 2))))
      i += 3
    }
    var j = 0
    while (j < m.faces.length) {
      sb.append(s"f ${m.faces(j) + 1} ${m.faces(j + 1) + 1} " +
        s"${m.faces(j + 2) + 1}\n")
      j += 3
    }
    sb.toString.getBytes("UTF-8")
  }

  /** Binary PLY export (mesh.py:285-312): ASCII header declaring
    * vertex/face counts, then f32-LE vertex triples, then per face
    * int32-LE [3, a, b, c].
    */
  def toPly(m: MeshFragment): Array[Byte] = {
    require(m.vertices.length % 3 == 0 && m.faces.length % 3 == 0)
    val nv = m.vertices.length / 3
    val nf = m.faces.length / 3
    val header = ("ply\nformat binary_little_endian 1.0\n" +
      s"element vertex $nv\n" +
      "property float x\nproperty float y\nproperty float z\n" +
      s"element face $nf\n" +
      "property list int int vertex_indices\nend_header\n").getBytes("UTF-8")
    val buf = ByteBuffer.allocate(header.length + 4 * m.vertices.length +
      16 * nf).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(header)
    m.vertices.foreach(buf.putFloat)
    var j = 0
    while (j < m.faces.length) {
      buf.putInt(3)
      buf.putInt(m.faces(j)); buf.putInt(m.faces(j + 1))
      buf.putInt(m.faces(j + 2))
      j += 3
    }
    buf.array()
  }

  def decode(binary: Array[Byte]): MeshFragment = {
    val buf = ByteBuffer.wrap(binary).order(ByteOrder.LITTLE_ENDIAN)
    val nv = buf.getInt()
    // nv >= 0 first, and compare in Long: a negative or 2^28+ count
    // would otherwise pass the Int-overflowed size check and throw a
    // raw NegativeArraySizeException (or allocate GBs) below
    require(nv >= 0 && binary.length.toLong >= 4L + 12L * nv,
      s"mesh binary too small: ${binary.length}B for $nv vertices")
    val vertices = new Array[Float](3 * nv)
    var i = 0
    while (i < vertices.length) { vertices(i) = buf.getFloat(); i += 1 }
    val nf = (binary.length - 4 - 12 * nv) / 4
    require(nf % 3 == 0, s"face section not a multiple of 3 uint32s: $nf")
    val faces = new Array[Int](nf)
    i = 0
    while (i < nf) { faces(i) = buf.getInt(); i += 1 }
    MeshFragment(vertices, faces)
  }

  /** Multires manifest. fragmentPositions(lod) is flattened (x,y,z)
    * per fragment row-major; fragmentOffsets(lod) are byte sizes.
    */
  final case class MultiresManifest(
      chunkShape: Array[Float],
      gridOrigin: Array[Float],
      lodScales: Array[Float],
      vertexOffsets: Array[Float], // numLods * 3
      fragmentPositions: Seq[Array[Int]], // per lod, 3*n row-major
      fragmentOffsets: Seq[Array[Int]]) { // per lod, n byte sizes
    def numLods: Int = lodScales.length
  }

  def encodeManifest(m: MultiresManifest): Array[Byte] = {
    val l = m.numLods
    require(m.vertexOffsets.length == 3 * l)
    val nFrags = m.fragmentOffsets.map(_.length).sum
    val size = 4 * (3 + 3 + 1 + l + 3 * l + l) + (3 * 4 + 4) * nFrags
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    m.chunkShape.foreach(buf.putFloat)
    m.gridOrigin.foreach(buf.putFloat)
    buf.putInt(l)
    m.lodScales.foreach(buf.putFloat)
    m.vertexOffsets.foreach(buf.putFloat)
    m.fragmentOffsets.foreach(o => buf.putInt(o.length))
    (0 until l).foreach { lod =>
      val pos = m.fragmentPositions(lod)
      val n = pos.length / 3
      // column-major on the wire (order="F"): all x, all y, all z
      (0 until 3).foreach(c => (0 until n).foreach(i => buf.putInt(pos(3 * i + c))))
      m.fragmentOffsets(lod).foreach(buf.putInt)
    }
    buf.array()
  }

  def decodeManifest(binary: Array[Byte]): MultiresManifest = {
    val buf = ByteBuffer.wrap(binary).order(ByteOrder.LITTLE_ENDIAN)
    val chunkShape = Array.fill(3)(buf.getFloat())
    val gridOrigin = Array.fill(3)(buf.getFloat())
    val l = buf.getInt()
    val lodScales = Array.fill(l)(buf.getFloat())
    val vertexOffsets = Array.fill(3 * l)(buf.getFloat())
    val nPerLod = Array.fill(l)(buf.getInt())
    val positions = Seq.newBuilder[Array[Int]]
    val offsets = Seq.newBuilder[Array[Int]]
    nPerLod.foreach { n =>
      val colMajor = Array.fill(3 * n)(buf.getInt())
      val pos = new Array[Int](3 * n)
      var i = 0
      while (i < n) {
        pos(3 * i) = colMajor(i)
        pos(3 * i + 1) = colMajor(n + i)
        pos(3 * i + 2) = colMajor(2 * n + i)
        i += 1
      }
      positions += pos
      offsets += Array.fill(n)(buf.getInt())
    }
    require(!buf.hasRemaining, "trailing bytes after manifest")
    MultiresManifest(chunkShape, gridOrigin, lodScales, vertexOffsets,
      positions.result(), offsets.result())
  }
}
