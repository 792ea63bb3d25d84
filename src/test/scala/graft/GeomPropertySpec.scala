package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.core._

/** Property tests for the geometry/codec core: the invariants the
  * chunk engine relies on, over randomized inputs (the reference's
  * randomized round-trip style, test/layer_harness.py:20-58).
  * Runs under scalacheck's own sbt framework.
  */
object GeomPropertySpec extends Properties("graft.core") {

  private val coord = Gen.choose(0L, 200L)
  private val sz = Gen.choose(1L, 64L)

  private val bboxGen: Gen[Bbox] = for {
    x0 <- coord; y0 <- coord; z0 <- coord
    dx <- sz; dy <- sz; dz <- sz
  } yield Bbox(Vec3(x0, y0, z0), Vec3(x0 + dx, y0 + dy, z0 + dz))

  private val chunkGen: Gen[Vec3] = for {
    cx <- Gen.choose(1L, 32L); cy <- Gen.choose(1L, 32L)
    cz <- Gen.choose(1L, 32L)
  } yield Vec3(cx, cy, cz)

  property("expand contains input, shrink contained, chunk-aligned") =
    Prop.forAll(bboxGen, chunkGen) { (b: Bbox, cs: Vec3) =>
      val e = b.expandToChunkSize(cs)
      val sh = b.shrinkToChunkSize(cs)
      e.containsBbox(b) &&
        e.minpt.x % cs.x == 0 && e.maxpt.x % cs.x == 0 &&
        e.minpt.y % cs.y == 0 && e.maxpt.y % cs.y == 0 &&
        (sh.isEmpty || b.containsBbox(sh))
    }

  property("gridpoints cover the clamped request") =
    Prop.forAll(bboxGen, chunkGen) { (b: Bbox, cs: Vec3) =>
      val bounds = Bbox(Vec3(0, 0, 0), Vec3(128, 128, 128))
      val pts = Geom.gridpoints(b, bounds, cs)
      val clamped = b.intersection(bounds)
      if (clamped.isEmpty) pts.isEmpty
      else {
        val allIntersect = pts.forall(g =>
          Geom.chunkBbox(g, bounds, cs).intersects(clamped))
        val cornerCovered = pts.exists(g =>
          Geom.chunkBbox(g, bounds, cs).contains(clamped.minpt))
        val lastCovered = pts.exists(g =>
          Geom.chunkBbox(g, bounds, cs).contains(clamped.maxpt - Vec3(1, 1, 1)))
        allIntersect && cornerCovered && lastCovered
      }
    }

  property("filename codec inverse") =
    Prop.forAll(bboxGen) { b: Bbox => Bbox.fromFilename(b.toFilename) == b }

  private val gridGen = for {
    nx <- Gen.choose(1L, 12L); ny <- Gen.choose(1L, 12L)
    nz <- Gen.choose(1L, 12L)
  } yield Vec3(nx, ny, nz)

  property("morton encode/decode inverse on irregular grids") =
    Prop.forAll(gridGen) { grid: Vec3 =>
      (0L until grid.x).forall { gx =>
        (0L until grid.y).forall { gy =>
          (0L until grid.z).forall { gz =>
            val g = Vec3(gx, gy, gz)
            Morton.decode(Morton.encode(g, grid), grid) == g
          }
        }
      }
    }

  property("raw codec round-trip at every dtype width") =
    Prop.forAll(Gen.listOfN(64, Gen.choose(Long.MinValue, Long.MaxValue))) {
      vs: List[Long] =>
        Seq(1, 2, 4, 8).forall { dtb =>
          val mask = if (dtb == 8) -1L else (1L << (8 * dtb)) - 1
          val masked = vs.map(_ & mask).toArray
          Codec.decodeRawToLongs(Codec.encodeRawFromLongs(masked, dtb), dtb)
            .sameElements(masked)
        }
    }

  private val volGen = for {
    sx <- Gen.choose(1L, 12L); sy <- Gen.choose(1L, 12L)
    sz0 <- Gen.choose(1L, 12L)
  } yield Vec3(sx, sy, sz0)

  property("cseg round-trip incl. partial edge blocks") =
    Prop.forAll(volGen, Gen.choose(0L, 5L)) { (vol: Vec3, seed: Long) =>
      val n = (vol.x * vol.y * vol.z).toInt
      val vox = Array.tabulate(n)(i => (i * 2654435761L + seed) % 7)
      val enc = Cseg.encode(vox, vol, Vec3(8, 8, 8), 4)
      Cseg.decode(enc, vol, Vec3(8, 8, 8), 4).sameElements(vox) &&
        Cseg.labels(enc, vol, Vec3(8, 8, 8), 4).toSet == vox.toSet
    }

  property("minishard delta encode/decode inverse") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 1L << 40)).map(_.sorted)) {
      ls: List[Long] =>
        ShardIndex.deltaDecode(ShardIndex.deltaEncode(ls)) == ls
    }

  property("png codec lossless at random sizes") =
    Prop.forAll(Gen.choose(1, 32), Gen.choose(1, 64), Gen.choose(0, 255)) {
      (sx: Int, h: Int, seed: Int) =>
        val vox = Array.tabulate(sx * h)(i => ((i * 31 + seed) % 256).toByte)
        Codec.decodePng(Codec.encodePng(vox, sx)).sameElements(vox)
    }

  property("blosc frame round-trip over the full parameter space") =
    Prop.forAll(
      Gen.choose(0, 70000), // spans empty, sub-block, and multi-block
      Gen.oneOf(1, 2, 3, 4, 8, 16, 17), // 17: typesize > MaxSplits
      Gen.oneOf("lz4", "lz4hc", "zlib", "zstd"),
      Gen.oneOf(0, 1),
      Gen.oneOf(0, 777, 4096), // 777: blocksize not a typesize multiple
      Gen.choose(0, Int.MaxValue)) {
      (n: Int, ts: Int, cname: String, shuf: Int, bs0: Int, seed: Int) =>
        val rnd = new scala.util.Random(seed)
        // mixed-entropy payload: half compressible pattern, half noise
        val data = Array.tabulate(n) { i =>
          if (i % 2 == 0) ((i * 7 + seed) & 0xFF).toByte
          else rnd.nextInt().toByte
        }
        Blosc.decompress(
          Blosc.compress(data, ts, cname, 5, shuf, bs0)).sameElements(data)
    }
}
