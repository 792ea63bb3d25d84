package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {
  val cs = Vec3(16, 16, 8)

  test("expand/shrink to chunk size") {
    val b = Bbox(Vec3(5, 17, 3), Vec3(20, 33, 9))
    assert(b.expandToChunkSize(cs) == Bbox(Vec3(0, 16, 0), Vec3(32, 48, 16)))
    assert(b.shrinkToChunkSize(cs) == Bbox(Vec3(16, 32, 8), Vec3(16, 32, 8)))
    val b2 = Bbox(Vec3(10, 0, 0), Vec3(50, 16, 8))
    assert(b2.shrinkToChunkSize(cs) == Bbox(Vec3(16, 0, 0), Vec3(48, 16, 8)))
  }

  test("expand is idempotent and contains original") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val lo = rnd.nextLong(201) - 100
      val len = rnd.nextLong(100) + 1
      val b = Bbox(Vec3(lo, lo + 1, lo + 2), Vec3(lo + len, lo + 1 + len, lo + 2 + len))
      val e = b.expandToChunkSize(cs)
      assert(e.containsBbox(b))
      assert(e.expandToChunkSize(cs) == e)
    }
  }

  test("filename codec round trip") {
    val b = Bbox(Vec3(128, 64, 0), Vec3(256, 128, 16))
    assert(b.toFilename == "128-256_64-128_0-16")
    assert(Bbox.fromFilename(b.toFilename) == b)
  }

  test("gridpoints cover and clamp") {
    val vol = Bbox(Vec3(0, 0, 0), Vec3(100, 100, 20))
    val gps = Geom.gridpoints(Bbox(Vec3(10, 10, 0), Vec3(40, 20, 9)), vol, cs)
    assert(gps.toSet == Set(Vec3(0, 0, 0), Vec3(1, 0, 0), Vec3(2, 0, 0),
      Vec3(0, 1, 0), Vec3(1, 1, 0), Vec3(2, 1, 0),
      Vec3(0, 0, 1), Vec3(1, 0, 1), Vec3(2, 0, 1),
      Vec3(0, 1, 1), Vec3(1, 1, 1), Vec3(2, 1, 1)))
    // chunk at volume edge is clamped
    val names = Geom.chunknames(Bbox(Vec3(96, 96, 16), Vec3(100, 100, 20)), vol, cs)
    assert(names == Seq("96-100_96-100_16-20"))
    // out-of-volume request yields nothing
    assert(Geom.gridpoints(Bbox(Vec3(200, 0, 0), Vec3(300, 10, 5)), vol, cs).isEmpty)
  }

  test("bbox_to_mip is iterative floor/ceil, not one-shot divide") {
    // two mip steps of factor (2,2,1): 5 -> floor 2 -> floor 1 ; one-shot 5//4=1 agrees
    // maxpt: 5 -> ceil 3 -> ceil 2 ; one-shot ceil(5/4)=2 agrees... pick a case that differs:
    // maxpt 9: ceil(9/2)=5 -> ceil(5/2)=3 ; one-shot ceil(9/4)=3. minpt 7: 3 -> 1; 7//4 = 1.
    // A genuinely diverging case: maxpt 6: 3 -> 2 vs ceil(6/4) = 2. Use floor side with negatives:
    val steps = Seq(Vec3(2, 2, 1), Vec3(2, 2, 1))
    val r = Geom.bboxToMip(Bbox(Vec3(-5, 0, 0), Vec3(9, 8, 4)), steps)
    assert(r == Bbox(Vec3(-2, 0, 0), Vec3(3, 2, 4)))
  }

  test("union and intersection") {
    val a = Bbox(Vec3(0, 0, 0), Vec3(10, 10, 10))
    val b = Bbox(Vec3(5, 5, 5), Vec3(15, 15, 15))
    assert(a.union(b) == Bbox(Vec3(0, 0, 0), Vec3(15, 15, 15)))
    assert(a.intersection(b) == Bbox(Vec3(5, 5, 5), Vec3(10, 10, 10)))
    assert(a.intersects(b))
    assert(!a.intersects(Bbox(Vec3(10, 0, 0), Vec3(20, 10, 10)))) // half-open
  }
}

class MortonSpec extends AnyFunSuite {
  // Known-answer vectors cf. reference test/test_sharding.py:70-99
  test("compressed morton code grid (3,3,3)") {
    val g = Vec3(3, 3, 3)
    assert(Morton.encode(Vec3(0, 0, 0), g) == 0L)
    assert(Morton.encode(Vec3(1, 0, 0), g) == 1L)
    assert(Morton.encode(Vec3(2, 0, 0), g) == 8L)
    assert(Morton.encode(Vec3(2, 2, 0), g) == 0x18L)
    assert(Morton.encode(Vec3(2, 2, 1), g) == 0x1cL)
    assertThrows[IllegalArgumentException](Morton.encode(Vec3(3, 0, 0), g))
  }

  test("compressed morton code irregular grids") {
    assert(Morton.encode(Vec3(1, 2, 0), Vec3(2, 3, 1)) == 5L)
    assert(Morton.encode(Vec3(3, 3, 0), Vec3(4, 4, 1)) == 0xfL)
    assert(Morton.encode(Vec3(5, 5, 0), Vec3(8, 8, 2)) == 0x63L)
    assertThrows[IllegalArgumentException](Morton.encode(Vec3(0, 0, 7), Vec3(2, 3, 1)))
  }

  test("morton decode inverts encode") {
    val grid = Vec3(1944, 1048, 442)
    for (g <- Seq(Vec3(0, 0, 0), Vec3(1131, 411, 177), Vec3(1943, 1047, 441))) {
      assert(Morton.decode(Morton.encode(g, grid), grid) == g)
    }
  }
}

class ShardingSpec_ extends AnyFunSuite {
  // cf. reference test/test_sharding.py:34-67 (known-answer)
  test("shard location with murmurhash3_x86_128") {
    val spec = ShardingSpec(preshiftBits = 6, minishardBits = 11,
      shardBits = 7, hashName = "murmurhash3_x86_128")
    val (shard, minishard) = spec.shardLocation(1822975381L)
    assert(minishard == 18L)
    assert(shard == 0x42L)
    assert(spec.shardFilename(shard) == "42.shard")
  }

  test("shard location with identity hash") {
    val spec = ShardingSpec(preshiftBits = 2, minishardBits = 3, shardBits = 3)
    val (shard, minishard) = spec.shardLocation(0xaaL) // 0b10101010
    assert(minishard == 2L) // 0b010
    assert(shard == 5L)     // 0b101
  }

  // cf. reference test/test_sharding.py:103-124 (image sharding)
  test("image sharding: morton + identity location") {
    val spec = ShardingSpec(preshiftBits = 9, minishardBits = 6, shardBits = 16)
    val grid = Vec3(
      Geom.ceilDiv(248832, 128), Geom.ceilDiv(134144, 128), Geom.ceilDiv(7063, 16))
    val gridpt = Vec3(
      Geom.ceilDiv(144689, 128), Geom.ceilDiv(52487, 128), Geom.ceilDiv(2829, 16))
    val code = Morton.encode(gridpt, grid)
    val (shard, _) = spec.shardLocation(code)
    assert(spec.shardFilename(shard) == "458d.shard")
  }

  test("delta encode/decode round trip") {
    val labels = Seq(3L, 10L, 11L, 400L, 1L << 40)
    val enc = ShardIndex.deltaEncode(labels)
    assert(enc == Seq(3L, 7L, 1L, 389L, (1L << 40) - 400L))
    assert(ShardIndex.deltaDecode(enc) == labels)
  }

  test("byte range coalescing (gaps and islands)") {
    val rs = Seq((0L, 10L), (10L, 20L), (25L, 30L), (28L, 40L), (100L, 110L))
    assert(ShardIndex.coalesceRanges(rs) ==
      Seq((0L, 20L), (25L, 40L), (100L, 110L)))
    assert(ShardIndex.coalesceRanges(rs, gap = 5) ==
      Seq((0L, 40L), (100L, 110L)))
  }
}

class MurmurSpec extends AnyFunSuite {
  test("x86_128 known answers") {
    // Public known-answer: murmur3_x86_128("", 0) = 0 (all lanes)
    assert(MurmurHash3_128.hash128(Array.emptyByteArray) == (0, 0, 0, 0))
    // Verified indirectly through the sharding vector in ShardingSpec_;
    // also check stability of the uint64-LE path.
    assert(MurmurHash3_128.hashUint64LE(1822975381L >>> 6) ==
      MurmurHash3_128.low64(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(1822975381L >>> 6).array()))
  }
}

class CodecSpec extends AnyFunSuite {
  test("raw codec round trips all dtypes") {
    val vox = Array(0L, 1L, 255L, 65535L, 7L, 42L)
    for (d <- Seq(1, 2, 4, 8)) {
      val masked =
        if (d == 8) vox
        else vox.map(_ & ((1L << (8L * d)) - 1))
      assert(Codec.decodeRawToLongs(Codec.encodeRawFromLongs(masked, d), d)
        .sameElements(masked))
    }
  }

  test("uint semantics: high-bit values decode unsigned") {
    assert(Codec.decodeRawToLongs(Array(0xff.toByte), 1).head == 255L)
    assert(Codec.decodeRawToLongs(
      Codec.encodeRawFromLongs(Array(40000L), 2), 2).head == 40000L)
  }

  test("labels / contains / read_voxel on raw") {
    val vox = Array(5L, 5L, 9L, 0L, 9L, 7L) // 3x2x1 F-order
    val pay = Codec.encodeRawFromLongs(vox, 4)
    assert(Codec.rawLabels(pay, 4).toSet == Set(5L, 9L, 0L, 7L))
    assert(Codec.rawContains(pay, 4, 7L))
    assert(!Codec.rawContains(pay, 4, 8L))
    assert(Codec.rawReadVoxel(pay, 4, 2, 1, 0, 3, 2) == 7L)
  }

  test("gzip round trip") {
    val data = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val gz = Codec.gzip(data)
    assert(gz.length < data.length)
    assert(Codec.gunzip(gz).sameElements(data))
  }
}

class GrapheneSpec extends AnyFunSuite {
  val spec = GrapheneLabelSpec(layerBits = 8, spatialBitCount = _ => 10)

  test("encode/decode round trip") {
    val label = spec.encode(2, 5, 11, 3, 777L)
    assert(spec.decode(label) == ((2, 5L, 11L, 3L, 777L)))
    assert(spec.decodeLayer(label) == 2)
  }

  test("chunk id zeroes segid") {
    val label = spec.encode(3, 1, 2, 3, 999L)
    assert(spec.chunkId(label) == spec.encode(3, 1, 2, 3, 0L))
  }

  test("uint64 top-bit labels survive (layer >= 128)") {
    val label = spec.encode(200, 1, 1, 1, 42L)
    assert(label < 0) // sign bit set in Long carrier
    assert(spec.decode(label) == ((200, 1L, 1L, 1L, 42L)))
  }
}
