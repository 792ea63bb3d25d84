package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.core.{Compresso, Vec3}

/** Randomized round-trips of the compresso v1 codec over label volumes
  * spanning its interesting regimes — constant blocks, spatially
  * coherent segmentation-like labels, and adversarial per-voxel noise
  * (which maximizes explicit location codes and the >= 7 literal
  * branch). Complements CompressoSpec's golden-layer parity with
  * breadth the committed fixtures can't provide.
  */
object CompressoPropertySpec extends Properties("graft.core.compresso") {

  private val dimsGen: Gen[Vec3] = for {
    sx <- Gen.oneOf(4L, 8L, 12L, 16L)
    sy <- Gen.oneOf(4L, 8L, 12L)
    sz <- Gen.choose(1L, 5L)
  } yield Vec3(sx, sy, sz)

  private sealed trait Flavor
  private case object Blocky extends Flavor
  private case object Noise extends Flavor
  private case object Sparse extends Flavor

  private val volGen: Gen[(Vec3, Array[Long], Long)] = for {
    dims <- dimsGen
    flavor <- Gen.oneOf(Blocky, Noise, Sparse)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val sx = dims.x.toInt; val sy = dims.y.toInt; val sz = dims.z.toInt
    val vox = new Array[Long](sx * sy * sz)
    var i = 0
    while (i < vox.length) {
      val x = i % sx; val y = (i / sx) % sy; val z = i / (sx * sy)
      vox(i) = flavor match {
        case Blocky => (x / 3 + (y / 4) * 7L + (z % 2) * 13L) * 1000003L
        // near the top of the u32-7 literal domain (labels are u32 in
        // v1 dataWidth=4; out-of-range labels are rejected loudly —
        // pinned below)
        case Noise => rnd.nextInt(6).toLong * 715827882L
        case Sparse => if (rnd.nextInt(10) == 0) rnd.nextInt(3) + 1L else 0L
      }
      i += 1
    }
    (dims, vox, seed)
  }

  property("encode -> decode is lossless and the fast paths agree") =
    Prop.forAll(volGen) { case (dims, vox, _) =>
      val enc = Compresso.encode(vox, dims)
      val (d2, back) = Compresso.decode(enc)
      val distinct = vox.toSet
      d2 == dims &&
        java.util.Arrays.equals(vox, back) &&
        Compresso.labels(enc).toSet == distinct &&
        distinct.forall(l => Compresso.contains(enc, l)) &&
        !Compresso.contains(enc, 4294967123L)
    }

  property("labels past the u32-7 literal domain are rejected, not truncated") =
    Prop.forAll(Gen.choose(0L, 6L)) { off =>
      // a wrapped literal used to decode as a small location code and
      // corrupt the volume silently
      val vox = Array.fill(16)(0xFFFFFFFFL - off)
      Prop.throws(classOf[IllegalArgumentException])(
        Compresso.encode(vox, Vec3(4, 4, 1)))
    }
}
