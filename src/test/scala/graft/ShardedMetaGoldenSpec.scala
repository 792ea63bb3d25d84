package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Provenance, VolumeMeta}

/** Parse the reference's committed sharded-layer metadata
  * (test/test_cv_sharded): a compresso-encoded uint64-sharded scale and
  * the real igneous provenance audit log — the last committed fixture
  * files the engine had not read. */
class ShardedMetaGoldenSpec extends AnyFunSuite {

  private val dir = "/root/reference/test/test_cv_sharded"

  test("committed sharded info parses: compresso encoding + shard spec") {
    val meta = VolumeMeta.readInfo(dir)
    assert(meta.dataType == "uint32")
    assert(meta.numChannels == 1)
    val s0 = meta.scale(0)
    assert(s0.key == "8_8_40")
    assert(s0.encoding == "compresso")
    assert(s0.size == graft.core.Vec3(1024, 1024, 512))
    val sh = s0.sharding.get
    assert(sh.preshiftBits == 9 && sh.shardBits == 0 && sh.minishardBits == 0)
    assert(sh.dataEncoding == "gzip" && sh.hashName == "identity")
  }

  test("committed provenance parses: 4 igneous processing entries") {
    val p = Provenance.fromJson(
      Files.readString(Paths.get(dir, "provenance")))
    assert(p.processing.size == 4)
    val tasks = p.processing.map { e =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      om.readTree(e).path("method").path("task").asText
    }
    assert(tasks == Seq("ImageShardTransferTask", "DownsampleTask",
      "ImageShardDownsampleTask", "ImageShardDownsampleTask"))
    // commit roundtrip preserves the audit log
    val p2 = Provenance.fromJson(Provenance.toJson(p))
    assert(p2.processing.size == 4 && p2.description == p.description)
  }
}
