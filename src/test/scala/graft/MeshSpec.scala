package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.MeshCodec
import graft.core.MeshCodec.{MeshFragment, MultiresManifest}

/** Mesh binary codec known-answer + round-trip tests.
  *
  * Wire layout per mesh.py:174-230: u32 Nv | Nv*3 f32 LE | u32*3
  * faces. Manifest layout per mesh/multilod.py:327-466 with
  * column-major fragment positions.
  */
class MeshSpec extends AnyFunSuite {

  test("mesh fragment known-answer bytes") {
    val m = MeshFragment(Array(1f, 2f, 3f), Array(0, 0, 0))
    val b = MeshCodec.encode(m)
    // u32 1 | f32 1,2,3 | u32 0,0,0
    assert(b.length === 4 + 12 + 12)
    assert(b.take(4).toSeq === Seq[Byte](1, 0, 0, 0))
    // 1.0f LE = 00 00 80 3f
    assert(b.slice(4, 8).toSeq === Seq[Byte](0, 0, -128, 0x3f))
    val d = MeshCodec.decode(b)
    assert(d.vertices.toSeq === m.vertices.toSeq)
    assert(d.faces.toSeq === m.faces.toSeq)
  }

  test("mesh fragment round-trip with empty faces") {
    val m = MeshFragment(Array(5f, 6f, 7f, 8f, 9f, 10f), Array.empty)
    val d = MeshCodec.decode(MeshCodec.encode(m))
    assert(d.vertices.toSeq === m.vertices.toSeq)
    assert(d.faces.isEmpty)
  }

  test("multires manifest round-trip (column-major positions)") {
    val m = MultiresManifest(
      chunkShape = Array(7f, 6f, 5f),
      gridOrigin = Array(0f, 1f, 2f),
      lodScales = Array(1f, 2f),
      vertexOffsets = Array.fill(6)(0.5f),
      fragmentPositions = Seq(Array(1, 2, 3, 4, 5, 6), Array(9, 8, 7)),
      fragmentOffsets = Seq(Array(100, 200), Array(300)))
    val b = MeshCodec.encodeManifest(m)
    // header: 3+3+1+2+6+2 words; body: (3+1)*3 frag words
    assert(b.length === 4 * (17 + 12))
    val d = MeshCodec.decodeManifest(b)
    assert(d.numLods === 2)
    assert(d.chunkShape.toSeq === m.chunkShape.toSeq)
    assert(d.lodScales.toSeq === m.lodScales.toSeq)
    assert(d.vertexOffsets.toSeq === m.vertexOffsets.toSeq)
    assert(d.fragmentPositions.map(_.toSeq) === m.fragmentPositions.map(_.toSeq))
    assert(d.fragmentOffsets.map(_.toSeq) === m.fragmentOffsets.map(_.toSeq))
    // column-major on the wire: lod0 positions serialize as
    // x0,x1,y0,y1,z0,z1 = 1,4,2,5,3,6 (multilod.py:373-375 order="F")
    val body = b.drop(4 * 17).grouped(4)
      .map(w => java.nio.ByteBuffer.wrap(w).order(
        java.nio.ByteOrder.LITTLE_ENDIAN).getInt).toSeq
    assert(body.take(6) === Seq(1, 4, 2, 5, 3, 6))
  }

  test("obj + ply export match the reference serializations") {
    import graft.core.MeshCodec
    val m = MeshCodec.MeshFragment(
      Array(0f, 1f, 2f, 3.5f, 4f, 5f, 6f, 7f, 8.25f),
      Array(0, 1, 2))
    // to_obj (mesh.py:277-283): 5-decimal vertices, 1-indexed faces
    assert(new String(MeshCodec.toObj(m), "UTF-8") ===
      "v 0.00000 1.00000 2.00000\n" +
      "v 3.50000 4.00000 5.00000\n" +
      "v 6.00000 7.00000 8.25000\n" +
      "f 1 2 3\n")
    // to_ply (mesh.py:285-312): ASCII header, f32-LE vertices, then
    // int32-LE [3, a, b, c] per face
    val ply = MeshCodec.toPly(m)
    val headerEnd = new String(ply, "UTF-8").indexOf("end_header\n") +
      "end_header\n".length
    val header = new String(ply.take(headerEnd), "UTF-8")
    assert(header.startsWith("ply\nformat binary_little_endian 1.0\n"))
    assert(header.contains("element vertex 3\n"))
    assert(header.contains("element face 1\n"))
    val bb = java.nio.ByteBuffer.wrap(ply, headerEnd,
      ply.length - headerEnd).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val verts = (0 until 9).map(_ => bb.getFloat)
    assert(verts === m.vertices.toSeq)
    assert((0 until 4).map(_ => bb.getInt) === Seq(3, 0, 1, 2))
    assert(!bb.hasRemaining)
  }
}
