package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.core._

/** Randomized round-trips of the shard container (sharding.py:279-983
  * semantics): for arbitrary spec parameters and arbitrary uint64 label
  * sets — including labels past 2^63, where a signed sort would corrupt
  * the ascending delta encoding — synthesize each shard's file and read
  * every record back through the whole-file reader. Complements the
  * parameter-sweep known-answer tests in ShardSpec and the independent
  * python container implementation (tools/sharded_golden_gen.py) with
  * breadth over the spec space.
  */
object ShardPropertySpec extends Properties("graft.core.sharding") {

  private val specGen: Gen[ShardingSpec] = for {
    pre <- Gen.choose(0, 10)
    mini <- Gen.choose(0, 4)
    shard <- Gen.choose(0, 3)
    hash <- Gen.oneOf("identity", "murmurhash3_x86_128")
    miEnc <- Gen.oneOf("raw", "gzip")
    dEnc <- Gen.oneOf("raw", "gzip")
  } yield ShardingSpec(pre, mini, shard, hash, miEnc, dEnc)

  // uint64 label space: mix small ids (morton codes), ids around 2^63
  // (sign boundary), and fully random 64-bit ids
  private val labelGen: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 4096L),
    Gen.choose(Long.MaxValue - 4096L, Long.MaxValue)
      .map(v => v + 4096L), // wraps negative: labels >= 2^63
    Gen.long)

  private val itemsGen: Gen[Map[Long, Array[Byte]]] = for {
    n <- Gen.choose(1, 40)
    labels <- Gen.listOfN(n, labelGen)
  } yield labels.distinct.map { l =>
    // payload derived from the label so verification needs no capture
    val len = 1 + (l & 0x3f).toInt
    l -> Array.tabulate(len)(i => ((l >>> (i % 8)) ^ i).toByte)
  }.toMap

  property("synthesize -> read round-trips every record across the spec space") =
    Prop.forAll(specGen, itemsGen) { (spec, items) =>
      val byShard = items.toSeq.groupBy { case (l, _) => spec.shardLocation(l)._1 }
      byShard.forall { case (shardNo, grp) =>
        val file = ShardCodec.synthesizeShard(spec, grp.map { case (l, b) => (l, b) })
        // every written label reads back byte-identical
        val allBack = grp.forall { case (l, b) =>
          ShardCodec.getData(file, spec, l).exists(java.util.Arrays.equals(_, b))
        }
        // the index lists exactly this shard's labels, each in its
        // spec-computed minishard, ascending UNSIGNED within it
        val entries = ShardCodec.allEntries(file, spec)
        val labelsOk = entries.map(_._2.label).toSet == grp.map(_._1).toSet
        val minishardsOk = entries.forall { case (msn, e) =>
          spec.shardLocation(e.label)._2 == msn
        }
        val ascendingOk = entries.groupBy(_._1).values.forall { es =>
          es.map(_._2.label).sliding(2).forall {
            case Seq(a, b) => java.lang.Long.compareUnsigned(a, b) < 0
            case _ => true
          }
        }
        // an absent label (different shard or never written) is None,
        // never a wrong payload
        val absent = items.keys.find(l => spec.shardLocation(l)._1 != shardNo)
        val absentOk = absent.forall(l => ShardCodec.getData(file, spec, l).isEmpty)
        allBack && labelsOk && minishardsOk && ascendingOk && absentOk
      }
    }

  property("shardLocation splits the hashed id into disjoint bit fields") =
    Prop.forAll(specGen, labelGen) { (spec, label) =>
      val (shard, mini) = spec.shardLocation(label)
      val hashed = spec.applyHash(label >>> spec.preshiftBits)
      mini == (hashed & spec.minishardMask) &&
        shard == ((hashed & spec.shardMask) >>> spec.minishardBits) &&
        (spec.minishardMask & spec.shardMask) == 0L
    }
}
