package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{AnnotationCodec, Codec}
import graft.ops.AnnotationQueries.{H01Dir, H01Enum, H01Spec}

/** Byte-for-byte parity with the reference's committed H01-derived
  * annotation layer, asserting the numbers the reference's own test
  * asserts (test/test_annotations.py). */
class AnnotationGoldenSpec extends AnyFunSuite {

  private def gz(parts: String*): Array[Byte] =
    Codec.gunzip(Files.readAllBytes(Paths.get(H01Dir, parts: _*)))

  test("spatial0 tile: 10043 POINTs, 7 label strings, distinct ids") {
    val anns = AnnotationCodec.decode(H01Spec, gz("spatial0", "0_0_0.gz"))
    assert(anns.size == 10043)                       // test_annotations.py:29
    assert(anns.map(_.id).distinct.size == 10043)    // :35-36 split_by_id
    val names = anns.map(a => H01Enum(a.props(0).toLong)).toSet
    assert(names.size == 7, names)                   // :32-33
  }

  test("by_id 3867588737: exact geometry + relationship section") {
    val (a, rels) = AnnotationCodec.decodeSingle(
      H01Spec, nRels = 1, id = 3867588737L, gz("by_id", "3867588737.gz"))
    // test_annotations.py:19-21 known-answer geometry
    assert(math.abs(a.geometry(0) - 1.937760e6f) < 1f)
    assert(math.abs(a.geometry(1) - 1.318752e6f) < 1f)
    assert(math.abs(a.geometry(2) - 9.69210e4f) < 1f)
    assert(rels == Seq(Seq(4781447896L)))
  }

  test("skeleton_id 243895108: 4 annotations, all axon") {
    val anns = AnnotationCodec.decode(H01Spec, gz("skeleton_id", "243895108.gz"))
    assert(anns.size == 4)                           // test_annotations.py:24
    assert(anns.forall(a => H01Enum(a.props(0).toLong) == "axon")) // :26-27
  }
}
