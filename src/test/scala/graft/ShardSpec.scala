package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Shard synthesis <-> reader invertibility (test_sharding.py:244-286
  * shape) plus fixed/minishard index structural checks.
  */
class ShardSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(5)

  private def randomGroup(spec: ShardingSpec, shard: Long, n: Int)
      : Seq[(Long, Array[Byte])] = {
    // draw labels that land in `shard` under the spec
    Iterator.continually(rng.nextLong().abs % 100000)
      .filter(l => spec.shardLocation(l)._1 == shard)
      .distinct.take(n)
      .map(l => l -> Array.fill(rng.nextInt(50) + 1)(rng.nextInt.toByte))
      .toSeq
  }

  for (
    (miEnc, dEnc) <- Seq(("raw", "raw"), ("gzip", "gzip"));
    hash <- Seq("identity", "murmurhash3_x86_128")
  ) test(s"synthesize -> read round-trip (index=$miEnc data=$dEnc hash=$hash)") {
    val spec = ShardingSpec(preshiftBits = 1, minishardBits = 3,
      shardBits = 4, hashName = hash,
      minishardIndexEncoding = miEnc, dataEncoding = dEnc)
    val group = randomGroup(spec, shard = 3, n = 40)
    val shard = ShardCodec.synthesizeShard(spec, group)
    // every label's payload comes back byte-identical
    group.foreach { case (label, bytes) =>
      assert(ShardCodec.getData(shard, spec, label).get.toSeq == bytes.toSeq)
    }
    // absent labels (same shard) return None
    val absent = Iterator.continually(rng.nextLong().abs % 100000 + 100000)
      .filter(l => spec.shardLocation(l)._1 == 3).take(5)
    absent.foreach(l => assert(ShardCodec.getData(shard, spec, l).isEmpty))
    // inventory: all labels present, ascending within each minishard
    val entries = ShardCodec.allEntries(shard, spec)
    assert(entries.map(_._2.label).toSet == group.map(_._1).toSet)
    entries.groupBy(_._1).values.foreach { es =>
      val ls = es.map(_._2.label)
      assert(ls == ls.sorted)
      // minishard number consistent with the spec
      es.foreach { case (msn, e) =>
        assert(spec.shardLocation(e.label)._2 == msn)
      }
    }
  }

  test("u64 labels straddling 2^63: shard location + container round-trip " +
      "(identity and mmh3)") {
    // the reference fights uint64 exactly here (sharding.py:32-34
    // masks to uint64; spatial_index.py:876-879): a signed-shift
    // shardLocation would misroute every label with the top bit set.
    // Known answers, identity hash (preshift 2, msb 3, sb 3):
    // chunkId = label >>> 2 (UNSIGNED), minishard = chunkId & 7,
    // shard = (chunkId >>> 3) & 7.
    val idSpec = ShardingSpec(preshiftBits = 2, minishardBits = 3,
      shardBits = 3, hashName = "identity",
      minishardIndexEncoding = "raw", dataEncoding = "raw")
    // label = 2^63 + 13: chunkId = 2^61 + 3 -> minishard 3, shard 0
    val l1 = Long.MinValue + 13L
    assert(ShardingSpec.minishardOf(l1, 2, 3, mmh3 = false) == 3L)
    assert(ShardingSpec.shardOf(l1, 2, 3, 3, mmh3 = false) == 0L)
    // label = 0xFFFFFFFFFFFFFFFF (u64 max): chunkId = 0x3FFF... ->
    // minishard 7, shard 7
    assert(ShardingSpec.minishardOf(-1L, 2, 3, mmh3 = false) == 7L)
    assert(ShardingSpec.shardOf(-1L, 2, 3, 3, mmh3 = false) == 7L)
    // container round-trip with high labels, both hashes
    for (hash <- Seq("identity", "murmurhash3_x86_128")) {
      val spec = idSpec.copy(hashName = hash)
      val labels = Seq(Long.MinValue + 13L, Long.MinValue + 1337L, -1L,
        Long.MaxValue, 42L)
      val byShard = labels.groupBy(l => spec.shardLocation(l)._1)
      byShard.foreach { case (_, ls) =>
        val group = ls.map(l => l -> s"payload-$l".getBytes("UTF-8").toSeq.toArray)
        val shard = ShardCodec.synthesizeShard(spec, group)
        group.foreach { case (l, bytes) =>
          assert(ShardCodec.getData(shard, spec, l).get.toSeq == bytes.toSeq,
            s"hash=$hash label=$l")
        }
      }
    }
  }

  test("empty minishards have zero-length index ranges") {
    val spec = ShardingSpec(0, 2, 2, "identity")
    // labels 0 and 1 -> minishards 0 and 1 of shard 0; 2,3 empty
    val shard = ShardCodec.synthesizeShard(spec,
      Seq(0L -> Array[Byte](1), 1L -> Array[Byte](2)))
    val fixed = ShardCodec.decodeFixedIndex(
      shard.take(ShardCodec.indexLength(spec).toInt), spec)
    assert(fixed(0)._2 > fixed(0)._1)
    assert(fixed(1)._2 > fixed(1)._1)
    assert(fixed(2)._2 == fixed(2)._1)
    assert(fixed(3)._2 == fixed(3)._1)
  }

  test("preamble layout: records indexed past their preambles, gap in " +
      "the offset delta") {
    val spec = ShardingSpec(0, 2, 1, "identity",
      minishardIndexEncoding = "gzip", dataEncoding = "raw")
    val items = Seq(
      (0L, Array.fill(37)(9: Byte), Array[Byte](1, 1)),
      (4L, Array.fill(11)(8: Byte), Array[Byte](2, 2, 2)),
      (1L, Array.emptyByteArray, Array[Byte](3))) // empty preamble ok
    val shard = ShardCodec.synthesizeShardWithPreambles(spec, items)
    // record payloads resolve exactly (not the preamble bytes)
    items.foreach { case (label, _, rec) =>
      assert(ShardCodec.getData(shard, spec, label).get.toSeq == rec.toSeq)
    }
    // each record's absolute offset sits exactly preamble-length past
    // the previous record's end — the multires-mesh byte math
    // (manifest_byte_start = shard_offset - total_fragment_size)
    val entries = ShardCodec.allEntries(shard, spec).map(_._2)
      .sortBy(_.offset)
    val byLabel = items.map(t => t._1 -> t).toMap
    var expected = ShardCodec.indexLength(spec)
    entries.foreach { e =>
      val (_, pre, rec) = byLabel(e.label)
      expected += pre.length
      assert(e.offset == expected, s"label ${e.label}")
      assert(e.size == rec.length)
      expected += rec.length
      // the preamble bytes are recoverable at offset - pre.length
      val preBytes = shard.slice((e.offset - pre.length).toInt, e.offset.toInt)
      assert(preBytes.toSeq == pre.toSeq)
    }
    // gzip'd data encoding is rejected — gaps need raw byte math
    intercept[IllegalArgumentException] {
      ShardCodec.synthesizeShardWithPreambles(
        spec.copy(dataEncoding = "gzip"), items)
    }
  }

  test("spec validation: bit budget + hash names (test_sharding.py:127)") {
    // valid boundary cases per the reference's validate()
    ShardingSpec(6, 11, 7, "murmurhash3_x86_128", "gzip", "gzip")
    ShardingSpec(0, 0, 0)
    ShardingSpec(0, 64, 0)
    ShardingSpec(0, 0, 64)
    // 64-wide masks must be all-ones, not the JVM shift-wrap zero
    assert(ShardingSpec(0, 64, 0).minishardMask == -1L)
    assert(ShardingSpec(0, 0, 64).shardMask == -1L)
    assert(ShardingSpec(0, 32, 32).shardMask ==
      (-1L ^ ((1L << 32) - 1)))
    // violations: joint budget over 64, unknown/case-sensitive hash
    intercept[IllegalArgumentException] { ShardingSpec(0, 1, 64) }
    intercept[IllegalArgumentException] { ShardingSpec(0, 64, 1) }
    intercept[IllegalArgumentException] {
      ShardingSpec(0, 2, 2, "murmurhash3_X86_128") }
    intercept[IllegalArgumentException] {
      ShardingSpec(0, 2, 2, "something else") }
  }

  test("corrupt fixed index fails loudly instead of allocating the claimed range") {
    // index offsets/sizes are untrusted file bytes: a fixed-index entry
    // claiming a 2^40 range must be rejected against the file's real
    // length, never allocated (ShardedIO.rangedRead's bomb rail)
    val spec = ShardingSpec(preshiftBits = 1, minishardBits = 3,
      shardBits = 4, hashName = "identity",
      minishardIndexEncoding = "raw", dataEncoding = "raw")
    val group = randomGroup(spec, shard = 3, n = 8)
    val shard = ShardCodec.synthesizeShard(spec, group)
    val dir = java.nio.file.Files.createTempDirectory("shard_bomb")
    val p = dir.resolve("3.shard")
    val corrupt = shard.clone()
    // EVERY fixed-index entry's end offset = 2^40 (little-endian u64 at
    // bytes 8 + 16k), so whichever minishard the probe labels hash to
    // trips the rail — immune to the shared rng's state
    val bb = java.nio.ByteBuffer.wrap(corrupt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until (1 << spec.minishardBits)).foreach(k =>
      bb.putLong(8 + 16 * k, 1L << 40))
    java.nio.file.Files.write(p, corrupt)
    val e = intercept[IllegalArgumentException](
      graft.sources.ShardedIO.readLabelsRangedWithOffsets(
        p.toString, spec, group.map(_._1)))
    assert(e.getMessage.contains("corrupt shard index"), e.getMessage)
  }

  test("missing shard file reads as label-absent, not an error") {
    // sharding.py:573-579: a probe hashing to an unwritten shard
    // returns None per label — the ranged reader yields no rows
    val spec = ShardingSpec(0, 2, 1, "identity")
    val ghost = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_missing_${System.nanoTime()}.shard").toString
    assert(graft.sources.ShardedIO
      .readLabelsRanged(ghost, spec, Seq(1L, 2L, 3L)).isEmpty)
    assert(graft.sources.ShardedIO
      .readLabelsRangedWithOffsets(ghost, spec, Seq(7L)).isEmpty)
  }

  test("delta encoding in the wire bytes (labels ascending, first absolute)") {
    val spec = ShardingSpec(0, 0, 0, "identity") // single shard+minishard
    val shard = ShardCodec.synthesizeShard(spec,
      Seq(10L -> Array[Byte](1), 17L -> Array[Byte](2, 2), 40L -> Array[Byte](3)))
    // index region is the tail: 3 labels * 3 runs * 8 bytes = 72
    val idxBytes = shard.takeRight(72)
    val bb = java.nio.ByteBuffer.wrap(idxBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(Seq(bb.getLong(0), bb.getLong(8), bb.getLong(16)) == Seq(10L, 7L, 23L))
    assert(Seq(bb.getLong(48), bb.getLong(56), bb.getLong(64)) == Seq(1L, 2L, 1L))
  }

  test("delta wire bytes with labels STRADDLING 2^63: unsigned sort " +
      "order, exact deltas (r17 verdict item 4)") {
    // sharding.py:902-932 sorts a numpy uint64 array ascending; a
    // signed Long sort would put 2^63+5 FIRST and emit a negative
    // delta. Unsigned ascending order of {3, 2^63-1, 2^63+5} is
    // exactly that sequence, so the wire deltas are known answers:
    // first absolute (3), then 2^63-4, then 6.
    val spec = ShardingSpec(0, 0, 0, "identity") // single shard+minishard
    val labels = Seq(Long.MinValue + 5L, 3L, Long.MaxValue) // scrambled input
    val shard = ShardCodec.synthesizeShard(spec,
      labels.map(l => l -> Array[Byte](l.toByte)))
    val idxBytes = shard.takeRight(72) // 3 labels * 3 runs * 8 bytes
    val bb = java.nio.ByteBuffer.wrap(idxBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(Seq(bb.getLong(0), bb.getLong(8), bb.getLong(16)) ==
      Seq(3L, Long.MaxValue - 3L, 6L),
      "label-delta run must reflect UNSIGNED ascending order")
    // read-back order matches unsigned ascending, and every payload
    // survives the round-trip
    val entries = ShardCodec.allEntries(shard, spec).map(_._2.label)
    assert(entries == Seq(3L, Long.MaxValue, Long.MinValue + 5L))
    labels.foreach { l =>
      assert(ShardCodec.getData(shard, spec, l).get.toSeq == Seq(l.toByte))
    }
  }
}
