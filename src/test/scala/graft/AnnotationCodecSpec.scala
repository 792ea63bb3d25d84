package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.AnnotationCodec
import graft.core.AnnotationCodec.{Annotation, AnnotationSpec, PropSpec}

/** Annotation wire-format tests (annotation/reader.py:151-181,
  * property dtypes + padding per annotation/metadata.py:27-60).
  */
class AnnotationCodecSpec extends AnyFunSuite {

  test("record size includes 4-byte padding of the property block") {
    // props: u8(1) + u16(2) + f32(4) + rgb(3) = 10 -> pad to 12
    val spec = AnnotationSpec("POINT", 3, Seq(
      PropSpec("a", "uint8"), PropSpec("b", "uint16"),
      PropSpec("c", "float32"), PropSpec("d", "rgb")))
    assert(spec.recordBytes === 12 + 12)
    // no props -> no padding
    assert(AnnotationSpec("LINE", 3, Seq.empty).recordBytes === 24)
  }

  test("multi-annotation round-trip with properties") {
    val spec = AnnotationSpec("POINT", 3, Seq(
      PropSpec("a", "uint8"), PropSpec("b", "uint16"),
      PropSpec("c", "float32"), PropSpec("d", "rgb")))
    val anns = Seq(
      Annotation(7L, Array(1f, 2f, 3f), Array(255, 60000, 1.5, 10, 20, 30)),
      Annotation(9L, Array(4f, 5f, 6f), Array(0, 0, -2.25, 0, 0, 255)))
    val b = AnnotationCodec.encode(spec, anns)
    // u64 count + 2 * (24B record) + 2 * u64 ids
    assert(b.length === 8 + 2 * 24 + 16)
    val d = AnnotationCodec.decode(spec, b)
    assert(d.map(_.id) === Seq(7L, 9L))
    assert(d(0).geometry.toSeq === Seq(1f, 2f, 3f))
    assert(d(0).props.toSeq === Seq(255.0, 60000.0, 1.5, 10.0, 20.0, 30.0))
    assert(d(1).props.toSeq === Seq(0.0, 0.0, -2.25, 0.0, 0.0, 255.0))
  }

  test("two-point geometry types carry 2*ndim floats") {
    val spec = AnnotationSpec("AXIS_ALIGNED_BOUNDING_BOX", 3, Seq.empty)
    val anns = Seq(Annotation(1L, Array(0f, 1f, 2f, 3f, 4f, 5f), Array.empty))
    val d = AnnotationCodec.decode(spec, AnnotationCodec.encode(spec, anns))
    assert(d.head.geometry.toSeq === Seq(0f, 1f, 2f, 3f, 4f, 5f))
  }

  test("count header is little-endian u64") {
    val spec = AnnotationSpec("POINT", 3, Seq.empty)
    val b = AnnotationCodec.encode(spec,
      Seq(Annotation(1L, Array(0f, 0f, 0f), Array.empty)))
    assert(b.take(8).toSeq === Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
  }
}
