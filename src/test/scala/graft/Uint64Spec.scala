package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** uint64-label-space tests (SURVEY §7 risk register): labels above
  * 2^63 live in Long two's-complement; ordering, deltas, hashing, and
  * codecs must behave as unsigned.
  */
class Uint64Spec extends AnyFunSuite {

  private val big1 = java.lang.Long.parseUnsignedLong("18446744073709551610") // 2^64-6
  private val big2 = java.lang.Long.parseUnsignedLong("9223372036854775813") // 2^63+5

  test("raw codec round-trips top-bit uint64 values") {
    val vox = Array(0L, 1L, big2, big1, -1L)
    val enc = Codec.encodeRawFromLongs(vox, 8)
    assert(Codec.decodeRawToLongs(enc, 8).toSeq === vox.toSeq)
    assert(Codec.rawLabels(enc, 8).toSet === vox.toSet)
    assert(Codec.rawContains(enc, 8, big1))
  }

  test("shard synthesis orders labels unsigned and reads them back") {
    val spec = ShardingSpec(preshiftBits = 0, minishardBits = 1,
      shardBits = 0, hashName = "identity")
    // small positive and >= 2^63 labels landing in the same minishard
    // (identity hash, minishard = label & 1)
    val items = Seq(
      big1 -> "A".getBytes, // ...1610: even
      4L -> "B".getBytes,
      big2 -> "C".getBytes, // odd
      7L -> "D".getBytes)
    val shard = ShardCodec.synthesizeShard(spec, items)
    // every label retrievable despite the sign flip
    items.foreach { case (label, payload) =>
      assert(ShardCodec.getData(shard, spec, label).map(_.toSeq)
        === Some(payload.toSeq), s"label $label")
    }
    // minishard 0 lists 4 before big1 (unsigned ascending)
    val entries = ShardCodec.allEntries(shard, spec)
      .filter(_._1 == 0L).map(_._2.label)
    assert(entries === Seq(4L, big1))
  }

  test("mmh3 shard location is defined for top-bit labels") {
    val spec = ShardingSpec(preshiftBits = 1, minishardBits = 2,
      shardBits = 2, hashName = "murmurhash3_x86_128")
    val (shard, msn) = spec.shardLocation(big1)
    assert(shard >= 0 && shard < 4)
    assert(msn >= 0 && msn < 4)
    // preshift uses the UNSIGNED shift (>>>)
    val spec2 = spec.copy(hashName = "identity")
    assert(spec2.shardLocation(-1L)._2 === ((-1L >>> 1) & 3L))
  }

  test("delta encode/decode round-trips across the sign boundary") {
    val labels = Seq(5L, big2, big1) // unsigned ascending
    assert(ShardIndex.deltaDecode(ShardIndex.deltaEncode(labels)) === labels)
  }
}
