package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.core.{Cseg, Vec3}

/** Randomized round-trips of the compressed_segmentation codec over
  * arbitrary volume/block geometries (partial edge blocks in every
  * axis), both dtype widths, and label regimes from constant to
  * high-cardinality (16/32-bit index widths) including uint64 labels
  * past 2^63. The codec-level pushdowns (labels/contains/readVoxel)
  * must agree with the full decode on every generated volume —
  * breadth the known-answer CsegSpec fixtures can't provide.
  */
object CsegPropertySpec extends Properties("graft.core.cseg") {

  private val geomGen: Gen[(Vec3, Vec3)] = for {
    vx <- Gen.choose(1L, 18L); vy <- Gen.choose(1L, 14L)
    vz <- Gen.choose(1L, 10L)
    bs <- Gen.oneOf(Vec3(8, 8, 8), Vec3(4, 4, 4), Vec3(8, 4, 2))
  } yield (Vec3(vx, vy, vz), bs)

  private val dtypeGen: Gen[Int] = Gen.oneOf(4, 8)

  private def volume(vol: Vec3, dtype: Int, flavor: Int, seed: Long): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    val n = (vol.x * vol.y * vol.z).toInt
    Array.fill(n)(flavor match {
      case 0 => 7L // constant: 0-bit blocks, no values array
      case 1 => rnd.nextInt(3).toLong // low cardinality: 1-2 bit packing
      case 2 => rnd.nextInt(500).toLong // high cardinality: wide indexes
      case _ => // full dtype domain, incl. > 2^63 for uint64
        if (dtype == 8) rnd.nextLong()
        else rnd.nextLong() & 0xFFFFFFFFL
    })
  }

  private val caseGen: Gen[(Vec3, Vec3, Int, Int, Long)] = for {
    (vol, bs) <- geomGen
    dtype <- dtypeGen
    flavor <- Gen.choose(0, 3)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (vol, bs, dtype, flavor, seed)

  property("encode -> decode is lossless; pushdowns agree with the decode") =
    Prop.forAll(caseGen) { case (vol, bs, dtype, flavor, seed) =>
      val vox = volume(vol, dtype, flavor, seed)
      val enc = Cseg.encode(vox, vol, bs, dtype)
      val back = Cseg.decode(enc, vol, bs, dtype)
      val distinct = vox.toSet
      val lossless = java.util.Arrays.equals(vox, back)
      val labelsOk = Cseg.labels(enc, vol, bs, dtype).toSet == distinct
      val containsOk = distinct.forall(l => Cseg.contains(enc, vol, bs, dtype, l))
      val probe = 1234567891011L
      val absentOk = distinct.contains(probe) ||
        !Cseg.contains(enc, vol, bs, dtype, probe)
      // random access at a handful of positions (full sweep is in CsegSpec)
      val rnd = new scala.util.Random(seed ^ 0x5eed)
      val readOk = (0 until 8).forall { _ =>
        val x = rnd.nextInt(vol.x.toInt); val y = rnd.nextInt(vol.y.toInt)
        val z = rnd.nextInt(vol.z.toInt)
        Cseg.readVoxel(enc, vol, bs, dtype, x, y, z) ==
          vox((x + vol.x * (y + vol.y * z)).toInt)
      }
      lossless && labelsOk && containsOk && absentOk && readOk
    }

  property("codec-level remap == voxel-level remap (shared tables, both widths)") =
    Prop.forAll(caseGen) { case (vol, bs, dtype, flavor, seed) =>
      val vox = volume(vol, dtype, flavor, seed)
      val enc = Cseg.encode(vox, vol, bs, dtype)
      // partial mapping: every 3rd distinct label moves, rest preserved
      val distinct = vox.distinct.sorted
      val mapping = distinct.zipWithIndex.collect {
        case (l, i) if i % 3 == 0 =>
          l -> (if (dtype == 4) (l + 1) & 0xFFFFFFFFL else l + 1)
      }.toMap
      val remapped = Cseg.remap(enc, vol, bs, dtype, mapping,
        preserveMissing = true)
      val back = Cseg.decode(remapped, vol, bs, dtype)
      val expect = vox.map(v => mapping.getOrElse(v, v))
      val valuesOk = java.util.Arrays.equals(expect, back)
      // strict mode raises on any unmapped label
      val strictOk = mapping.size == distinct.length || {
        try { Cseg.remap(enc, vol, bs, dtype, mapping,
          preserveMissing = false); false }
        catch { case _: NoSuchElementException => true }
      }
      valuesOk && strictOk
    }
}
