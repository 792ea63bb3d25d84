package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Sharding-scheme planners against the reference's known answers
  * (test_sharding.py:474-519 for hashed; :415-446 property invariants
  * for image specs).
  */
class ShardParamsSpec extends AnyFunSuite {

  test("forHashed known answers (test_shard_bits_calculation_for_hashed)") {
    assert(ShardParams.forHashed(1000000000L, 1L << 13, 1L << 15) == (11, 9, 0))
    assert(ShardParams.forHashed(1000000L, 1L << 13, 1L << 15) == (1, 9, 0))
    assert(ShardParams.forHashed(10000000L, 1L << 13, 1L << 15) == (4, 9, 0))
    assert(ShardParams.forHashed(1000L, 1L << 13, 1L << 15) == (0, 0, 0))
    assert(ShardParams.forHashed(1000L, 1L << 13, 1L << 15,
      minShards = 1000) == (10, 0, 0))
    assert(ShardParams.forHashed(0L) == (0, 0, 0))
  }

  test("forImage invariants (test_sharded_image_bits shape)") {
    // representative EM-scale geometries
    val cases = Seq(
      (Vec3(4096, 4096, 4096), Vec3(64, 64, 64)),
      (Vec3(96537, 114390, 21520), Vec3(128, 128, 32)),
      (Vec3(1024, 1024, 64), Vec3(128, 128, 64)),
      (Vec3(62464, 40960, 2048), Vec3(128, 128, 16)))
    for ((ds, cs) <- cases) {
      val (sb, msb, psb) = ShardParams.forImage(ds, cs, byteWidth = 1)
      assert(sb >= 0 && msb >= 0 && psb >= 0, s"negative bits for $ds")
      val shape = ShardParams.imageShardShape(ds, cs, psb, msb)
      // shard shape is chunk-aligned powers of two per axis
      assert(shape.x % cs.x == 0 && shape.y % cs.y == 0 && shape.z % cs.z == 0)
      // the number of shard-shaped boxes covering the dataset fits in
      // 2^shard_bits (the reference's min/max_num_shards assertion)
      def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
      val maxShards = ceilDiv(ds.x, shape.x) * ceilDiv(ds.y, shape.y) *
        ceilDiv(ds.z, shape.z)
      assert(maxShards > 0 && maxShards <= (1L << sb),
        s"$maxShards shards > 2^$sb for $ds / $shape")
    }
  }

  test("forImage z-slice layers pad preshift (dataset z == chunk z)") {
    val (sb, msb, psb) =
      ShardParams.forImage(Vec3(1048576, 1048576, 64), Vec3(128, 128, 64), 1)
    assert(psb >= 0 && sb >= 0 && msb >= 0)
    val shape = ShardParams.imageShardShape(
      Vec3(1048576, 1048576, 64), Vec3(128, 128, 64), psb, msb)
    assert(shape.z == 64) // z never exceeds the single slice
  }
}
