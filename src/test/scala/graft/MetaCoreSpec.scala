package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Core metadata math + write-lock guard tests. */
class MetaCoreSpec extends AnyFunSuite {

  test("find_closest_divisor matches reference tie-break") {
    // divisors of 12 enumerated 1,12,2,6,3,4 (lib.py:199-204); ct=5:
    // distances 4,7,3,1,2,1 -> 6 wins (first to reach distance 1)
    assert(Geom.findClosestDivisor(Vec3(12, 12, 12), Vec3(5, 5, 5)).x === 6)
    assert(Geom.findClosestDivisor(Vec3(16, 16, 16), Vec3(64, 64, 64)).x === 16)
    assert(Geom.findClosestDivisor(Vec3(100, 100, 100), Vec3(64, 64, 64)).x === 50)
    assert(Geom.findClosestDivisor(Vec3(7, 7, 7), Vec3(3, 3, 3)).x === 1)
  }

  test("reify_slice binds None to bounds and clamps (autocrop)") {
    assert(Geom.reifySlice(None, None, None, 0, 64) === ((0L, 64L, 1L)))
    assert(Geom.reifySlice(Some(-5), Some(100), Some(2), 0, 64) === ((0L, 64L, 2L)))
    assert(Geom.reifySlice(Some(10), Some(20), None, 0, 64) === ((10L, 20L, 1L)))
    intercept[IllegalArgumentException] {
      Geom.reifySlice(None, None, Some(-1), 0, 64)
    }
  }

  test("add_scale: size ceils, offset floors, key re-renders") {
    val m = VolumeMeta("image", "uint8", 1, Seq(ScaleMeta(
      key = "4_4_40", encoding = "raw", resolution = Seq(4, 4, 40),
      chunkSize = Vec3(16, 16, 8), size = Vec3(60, 60, 28),
      voxelOffset = Vec3(3, 5, 2))))
    val sc = m.addScale(Vec3(4, 4, 1))
    assert(sc.key === "16_16_40")
    assert(sc.size === Vec3(15, 15, 28))
    assert(sc.voxelOffset === Vec3(0, 1, 2))
    assert(sc.chunkSize === Vec3(16, 16, 8))
  }

  test("locked scales round-trip through info JSON and block writes") {
    val m = VolumeMeta("image", "uint8", 1, Seq(ScaleMeta(
      key = "1_1_1", encoding = "raw", resolution = Seq(1, 1, 1),
      chunkSize = Vec3(4, 4, 4), size = Vec3(8, 8, 8),
      voxelOffset = Vec3(0, 0, 0), locked = true)))
    val parsed = VolumeMeta.fromJson(VolumeMeta.toJson(m))
    assert(parsed.lockedMips === Set(0))
    assert(parsed.scale(0).locked)
  }

  test("rois round-trip and z-sort at parse (metadata.py:191-201)") {
    val rois = Seq(
      Bbox(Vec3(0, 0, 20), Vec3(5, 5, 25)),
      Bbox(Vec3(0, 0, 1), Vec3(5, 5, 6)))
    val m = VolumeMeta("image", "uint8", 1, Seq(ScaleMeta(
      key = "1_1_1", encoding = "raw", resolution = Seq(1, 1, 1),
      chunkSize = Vec3(4, 4, 4), size = Vec3(8, 8, 8),
      voxelOffset = Vec3(0, 0, 0), rois = Some(rois))))
    val parsed = VolumeMeta.fromJson(VolumeMeta.toJson(m))
    // stored order preserved; sortedRois z-sorts
    assert(parsed.scale(0).rois.get === rois)
    assert(parsed.sortedRois.get.map(_.minpt.z) === Seq(1L, 20L))
  }

  test("overlapsBbox is inclusive at the boundary (lib.py:889-895)") {
    val a = Bbox(Vec3(0, 0, 0), Vec3(10, 10, 10))
    assert(a.overlapsBbox(Bbox(Vec3(10, 0, 0), Vec3(20, 10, 10))))
    assert(!a.overlapsBbox(Bbox(Vec3(11, 0, 0), Vec3(20, 10, 10))))
  }

  test("intersectionZero returns the zero box for disjoint inputs") {
    val a = Bbox(Vec3(0, 0, 0), Vec3(10, 10, 10))
    assert(Bbox.intersectionZero(a, Bbox(Vec3(20, 20, 20), Vec3(30, 30, 30)))
      === Bbox(Vec3(0, 0, 0), Vec3(0, 0, 0)))
    // touching faces do NOT intersect (strict test, lib.py:460-467)
    assert(Bbox.intersectionZero(a, Bbox(Vec3(10, 0, 0), Vec3(20, 10, 10)))
      === Bbox(Vec3(0, 0, 0), Vec3(0, 0, 0)))
    assert(Bbox.intersectionZero(a, Bbox(Vec3(5, 5, 5), Vec3(30, 30, 30)))
      === Bbox(Vec3(5, 5, 5), Vec3(10, 10, 10)))
  }
}
