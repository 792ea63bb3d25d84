package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{AnnotationCodec, ShardingSpec}
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

  test("POLYLINE records carry u32 count + variable vertex list") {
    // metadata.py:436-447: [u32 num_points][num_points*ndim f32]
    // [props][pad-to-4]; records in one file may differ in length
    val spec = AnnotationSpec("POLYLINE", 3, Seq(PropSpec("w", "uint16")))
    val anns = Seq(
      Annotation(3L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f), Array(77)),
      Annotation(5L, Array(10f, 11f, 12f, 13f, 14f, 15f), Array(88)))
    val b = AnnotationCodec.encode(spec, anns)
    // u64 count + (4 + 36 + 2 + 2pad) + (4 + 24 + 2 + 2pad) + 2 ids
    assert(b.length === 8 + 44 + 32 + 16)
    // first record's u32le vertex count
    assert(java.nio.ByteBuffer.wrap(b, 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt === 3)
    val d = AnnotationCodec.decode(spec, b)
    assert(d.map(_.id) === Seq(3L, 5L))
    assert(d(0).geometry.toSeq === (1 to 9).map(_.toFloat))
    assert(d(1).geometry.toSeq === (10 to 15).map(_.toFloat))
    assert(d.map(_.props.head) === Seq(77.0, 88.0))
    // single-annotation format round-trips too (by-id path)
    val (one, rels) = AnnotationCodec.decodeSingle(spec, 1, 3L,
      AnnotationCodec.encodeSingle(spec, anns.head, Seq(Seq(42L))))
    assert(one.geometry.toSeq === anns.head.geometry.toSeq)
    assert(rels === Seq(Seq(42L)))
    // a corrupt vertex count larger than the buffer fails loudly
    val bad = b.clone()
    java.nio.ByteBuffer.wrap(bad, 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1000000)
    assertThrows[IllegalArgumentException](AnnotationCodec.decode(spec, bad))
  }

  test("count header is little-endian u64") {
    val spec = AnnotationSpec("POINT", 3, Seq.empty)
    val b = AnnotationCodec.encode(spec,
      Seq(Annotation(1L, Array(0f, 0f, 0f), Array.empty)))
    assert(b.take(8).toSeq === Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
  }

  test("spatial-index levels round-trip through the info JSON") {
    val dir = java.nio.file.Files.createTempDirectory("ann_spatial").toString
    val spec = AnnotationSpec("POINT", 3, Seq.empty)
    val levels = Seq(
      AnnotationCodec.SpatialLevel("spatial0", Seq(1L, 1L, 1L),
        Seq(64L, 64L, 32L), 150L),
      AnnotationCodec.SpatialLevel("spatial1", Seq(2L, 2L, 1L),
        Seq(32L, 32L, 32L), Long.MaxValue))
    AnnotationCodec.writeInfo(dir, spec, spatial = levels)
    assert(AnnotationCodec.readSpatial(dir) === levels)
    // a layer without a spatial block reads as no levels
    val dir2 = java.nio.file.Files.createTempDirectory("ann_plain").toString
    AnnotationCodec.writeInfo(dir2, spec)
    assert(AnnotationCodec.readSpatial(dir2).isEmpty)
  }

  test("sharded index declarations round-trip (by_id, relationship, " +
      "spatial — reader.py:183-205,319-339,253-257 routing)") {
    val dir = java.nio.file.Files.createTempDirectory("ann_sharded").toString
    val spec = AnnotationSpec("POINT", 3, Seq.empty)
    val sh = ShardingSpec(preshiftBits = 0, minishardBits = 2,
      shardBits = 1, hashName = "murmurhash3_x86_128",
      minishardIndexEncoding = "gzip", dataEncoding = "gzip")
    AnnotationCodec.writeInfo(dir, spec,
      byId = Some(("by_id", Some(sh))),
      relationships = Seq(("presynaptic_to", "rel_pre"),
        ("postsynaptic_to", "rel_post")),
      relSharding = Map("presynaptic_to" -> sh),
      spatial = Seq(AnnotationCodec.SpatialLevel("spatial0",
        Seq(2L, 2L, 1L), Seq(32L, 32L, 32L), 150L, sharding = Some(sh))))
    assert(AnnotationCodec.readByIdIndex(dir) === Some(("by_id", Some(sh))))
    // only the declared-sharded relation carries a spec; the other is
    // unsharded; an undeclared id resolves to None
    assert(AnnotationCodec.readRelationshipIndex(dir, "presynaptic_to")
      === Some(("rel_pre", Some(sh))))
    assert(AnnotationCodec.readRelationshipIndex(dir, "postsynaptic_to")
      === Some(("rel_post", None)))
    assert(AnnotationCodec.readRelationshipIndex(dir, "nope").isEmpty)
    val lvl = AnnotationCodec.readSpatial(dir).head
    assert(lvl.sharding === Some(sh))
    // declaration order is preserved (decodeSingle section order)
    assert(AnnotationCodec.readRelationships(dir).map(_._1)
      === Seq("presynaptic_to", "postsynaptic_to"))
  }
}
