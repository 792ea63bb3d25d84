package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** compressed_segmentation codec: byte-level known-answer vectors
  * hand-derived from the public format spec, plus round-trips over
  * partial blocks, uint64, and the shared-table cache.
  */
class CsegSpec extends AnyFunSuite {

  private def words(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(bytes.length / 4)(i => bb.getInt(4 * i))
  }

  test("known-answer: one 2x2x2 block, 4 labels, 2-bit packing") {
    // F-order voxels [5,5,6,6,7,7,8,8] -> table [5,6,7,8], bits=2,
    // packed indices 0,0,1,1,2,2,3,3 -> single word 0x0000FA50
    val enc = Cseg.encode(Array(5, 5, 6, 6, 7, 7, 8, 8),
      Vec3(2, 2, 2), Vec3(2, 2, 2), 4)
    assert(words(enc).toSeq == Seq(
      1, // channel 0 starts at word 1
      0x02000003, // table offset 3 | bits 2 << 24
      2, // values offset 2
      0x0000FA50, // packed indices
      5, 6, 7, 8)) // lookup table
  }

  test("known-answer: uniform block encodes 0 bits, no values array") {
    val enc = Cseg.encode(Array.fill(8)(9L), Vec3(2, 2, 2), Vec3(2, 2, 2), 4)
    assert(words(enc).toSeq == Seq(1, 0x00000002, 2, 9))
  }

  test("round-trip: random uint32 volume with partial edge blocks") {
    val rng = new scala.util.Random(7)
    val vol = Vec3(13, 9, 6) // none divisible by block 8x8x8 or 4x4x4
    for (bs <- Seq(Vec3(8, 8, 8), Vec3(4, 4, 4))) {
      val vox = Array.fill((vol.x * vol.y * vol.z).toInt)(rng.nextInt(100).toLong)
      val enc = Cseg.encode(vox, vol, bs, 4)
      assert(Cseg.decode(enc, vol, bs, 4).toSeq == vox.toSeq)
    }
  }

  test("round-trip: uint64 labels incl > 2^63 (negative Long)") {
    val vol = Vec3(8, 8, 8)
    val vox = Array.tabulate(512)(i =>
      if (i % 3 == 0) -1L // 0xFFFF... = uint64 max
      else if (i % 3 == 1) (1L << 62) + i
      else i.toLong)
    val enc = Cseg.encode(vox, vol, Vec3(8, 8, 8), 8)
    assert(Cseg.decode(enc, vol, Vec3(8, 8, 8), 8).toSeq == vox.toSeq)
  }

  test("identical blocks share one lookup table (encoder cache)") {
    // two blocks with identical content
    val vol = Vec3(4, 2, 2); val bs = Vec3(2, 2, 2)
    val vox = Array[Long](1, 2, 1, 2, /* block 0 z=0 */ 1, 2, 1, 2,
      3, 4, 3, 4, 3, 4, 3, 4)
    // F-order 4x2x2: x fastest. block0 = x in 0..1, block1 = x in 2..3
    val enc = Cseg.encode(vox, vol, bs, 4)
    val dec = Cseg.decode(enc, vol, bs, 4)
    assert(dec.toSeq == vox.toSeq)
    // headers: 2 blocks * 2 words; each block: 1 values word; shared
    // table would dedupe only if contents equal — here they differ;
    // instead verify cache via two truly identical blocks:
    val vox2 = Array[Long](1, 2, 1, 2, 1, 2, 1, 2,
      1, 2, 1, 2, 1, 2, 1, 2)
    val enc2 = Cseg.encode(vox2, vol, bs, 4)
    // 1 chan word + 4 header + 2 values words + ONE shared table (2)
    assert(words(enc2).length == 1 + 4 + 2 + 2)
    assert(Cseg.decode(enc2, vol, bs, 4).toSeq == vox2.toSeq)
  }

  test("labels/contains pushdown agree with full decode") {
    val rng = new scala.util.Random(11)
    val vol = Vec3(16, 16, 8)
    val vox = Array.fill((vol.x * vol.y * vol.z).toInt)(
      (rng.nextInt(37) * 1000).toLong)
    val enc = Cseg.encode(vox, vol, Vec3(8, 8, 8), 4)
    val viaDecode = Cseg.decode(enc, vol, Vec3(8, 8, 8), 4).toSet
    assert(Cseg.labels(enc, vol, Vec3(8, 8, 8), 4).toSet == viaDecode)
    assert(Cseg.contains(enc, vol, Vec3(8, 8, 8), 4, vox(17)))
    assert(!Cseg.contains(enc, vol, Vec3(8, 8, 8), 4, 999999L))
  }

  test("readVoxel random access matches decode at every position") {
    val rng = new scala.util.Random(13)
    val vol = Vec3(10, 6, 5) // partial blocks with bs 4
    val vox = Array.fill((vol.x * vol.y * vol.z).toInt)(rng.nextInt(9).toLong)
    val enc = Cseg.encode(vox, vol, Vec3(4, 4, 4), 4)
    val dec = Cseg.decode(enc, vol, Vec3(4, 4, 4), 4)
    for (z <- 0L until vol.z; y <- 0L until vol.y; x <- 0L until vol.x) {
      val i = (x + vol.x * (y + vol.y * z)).toInt
      assert(Cseg.readVoxel(enc, vol, Vec3(4, 4, 4), 4, x, y, z) == dec(i))
    }
  }

  test("16-bit and 32-bit index widths (high-cardinality blocks)") {
    // 8x8x8 block with 300 distinct labels -> bits=16
    val vox = Array.tabulate(512)(i => (i % 300).toLong)
    val enc = Cseg.encode(vox, Vec3(8, 8, 8), Vec3(8, 8, 8), 4)
    assert(Cseg.decode(enc, Vec3(8, 8, 8), Vec3(8, 8, 8), 4).toSeq == vox.toSeq)
    val w0 = words(enc)(1)
    assert((w0 >>> 24) == 16)
  }
}
