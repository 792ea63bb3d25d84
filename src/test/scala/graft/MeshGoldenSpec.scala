package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Codec, MeshCodec}

/** Byte-golden parity against the reference's committed unsharded mesh
  * fixture (test_seg_unsharded/mesh_mip_2_err_40) using the reference's
  * OWN test assertions as the oracle — every expected number below is
  * copied from test/test_meshing.py (manifest fragment lists, vertex and
  * face counts for segid 16649205, the fused-dedup count, and the
  * non-standard fragment-name manifest 1:0). SURVEY §5 pattern (b).
  */
class MeshGoldenSpec extends AnyFunSuite {

  private val Dir = "/root/reference/test/test_seg_unsharded/mesh_mip_2_err_40"

  private def manifest(segid: Long): Seq[String] = {
    val txt = new String(
      Files.readAllBytes(Paths.get(Dir, s"$segid:0")), "UTF-8")
    // {"fragments": ["name", ...]} — tolerate whitespace
    "\"([^\"]+)\"".r.findAllMatchIn(txt).map(_.group(1)).toSeq
      .filterNot(_ == "fragments")
  }

  private def fragment(name: String): MeshCodec.MeshFragment = {
    val p = Paths.get(Dir, name + ".gz")
    val raw =
      if (Files.exists(p)) Codec.gunzip(Files.readAllBytes(p))
      else Files.readAllBytes(Paths.get(Dir, name))
    MeshCodec.decode(raw)
  }

  test("manifest fragment lists match test_meshing.py:16-26") {
    assert(manifest(13614423L) == Seq("13614423:0:0-256_0-256_0-448"))
    assert(manifest(22270104L).sorted == Seq(
      "22270104:0:0-256_0-256_0-448", "22270104:0:0-256_0-256_448-512"))
  }

  test("segid 16649205 decodes to the reference's counts (test_meshing.py:28-42)") {
    val frags = manifest(16649205L).map(fragment)
    // unfused concatenation: 5176 vertices, 9876 faces
    assert(frags.map(_.vertices.length / 3).sum == 5176)
    assert(frags.map(_.faces.length / 3).sum == 9876)
    // fused: exact-duplicate vertices deduplicate to 4956, faces keep 9876
    val verts = scala.collection.mutable.LinkedHashMap.empty[(Float, Float, Float), Int]
    var faceCount = 0
    frags.foreach { f =>
      val remap = new Array[Int](f.vertices.length / 3)
      var i = 0
      while (i < remap.length) {
        val key = (f.vertices(3 * i), f.vertices(3 * i + 1), f.vertices(3 * i + 2))
        remap(i) = verts.getOrElseUpdate(key, verts.size)
        i += 1
      }
      faceCount += f.faces.length / 3
    }
    assert(verts.size == 4956)
    assert(faceCount == 9876)
  }

  test("non-standard fragment name: manifest 1:0 aliases 94081437 (test_meshing.py:65-70)") {
    // 1:0 contains {"fragments":["randomname"]} — a copy of 94081437's mesh
    assert(manifest(1L) == Seq("randomname"))
    val alias = fragment("randomname")
    val orig = manifest(94081437L).map(fragment)
    assert(orig.map(_.vertices.length).sum == alias.vertices.length ||
      orig.head.vertices.sameElements(alias.vertices))
  }
}
