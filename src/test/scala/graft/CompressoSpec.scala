package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Codec, Compresso, Vec3}

/** Compresso v1 codec: golden decode of the reference's own committed
  * compresso layer (test_seg_unsharded) plus self-roundtrip. Known-answer
  * values come from tools/compresso_oracle_gen.py, an independent numpy
  * decoder that self-verifies by regenerating the boundary-window stream
  * from its decoded labels (see that file's VERIFY notes).
  */
class CompressoSpec extends AnyFunSuite {

  private val Ref = "/root/reference/test/test_seg_unsharded"

  private def readChunk(rel: String): Array[Byte] =
    Codec.gunzip(Files.readAllBytes(Paths.get(Ref, rel)))

  test("decode header of a reference chunk") {
    val h = Compresso.parseHeader(readChunk("32_32_40/0-256_0-256_0-64.gz"))
    assert(h.dataWidth == 4)
    assert((h.sx, h.sy, h.sz) == ((256, 256, 64)))
    assert(h.idSize == 23784)
    assert(h.valueSize == 6631)
    assert(h.locationSize == 46562)
  }

  test("decode a 2-label reference chunk exactly") {
    // independent-decoder ground truth: one segment + background blob
    val (dims, vox) = Compresso.decode(readChunk("8_8_40/512-768_0-256_128-192.gz"))
    assert(dims == Vec3(256, 256, 64))
    val uniq = vox.toSet
    assert(uniq == Set(0L, 25024949L))
    // slices 0..45 are pure segment (per-slice component trailer said so)
    assert(vox.slice(0, 256 * 256 * 45).forall(_ == 25024949L))
  }

  test("labels() fast path equals full-decode uniques (no voxel decode)") {
    for (rel <- Seq("32_32_40/0-256_0-256_448-512.gz",
        "16_16_40/0-256_0-256_0-64.gz")) {
      val payload = readChunk(rel)
      val fast = Compresso.labels(payload).toSet
      val full = Compresso.decode(payload)._2.toSet
      assert(fast == full, s"labels() mismatch for $rel")
    }
  }

  test("known-answer distinct-label count from the independent decoder") {
    // tools/compresso_oracle_gen.py logged 611 distinct labels here
    val payload = readChunk("32_32_40/0-256_0-256_448-512.gz")
    assert(Compresso.labels(payload).length == 611)
  }

  test("contains() probes without decode") {
    val payload = readChunk("8_8_40/512-768_0-256_128-192.gz")
    assert(Compresso.contains(payload, 25024949L))
    assert(Compresso.contains(payload, 0L))
    assert(!Compresso.contains(payload, 42L))
  }

  test("mutation/truncation fuzz: declared error type, bounded allocations") {
    // hostile-input contract (the brotli/draco pattern): mutated or
    // truncated payloads terminate as IllegalArgumentException or
    // decode to a self-consistent volume — never a hang, an escaped
    // bounds check, or a header-driven multi-GB allocation
    val base = readChunk("8_8_40/512-768_0-256_128-192.gz")
    val rnd = new scala.util.Random(20260816)
    for (_ <- 1 to 400) {
      val mutated = base.clone()
      rnd.nextInt(3) match {
        case 0 =>
          val i = rnd.nextInt(mutated.length)
          mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
        case 1 =>
          mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
        case _ => ()
      }
      val input = if (rnd.nextBoolean()) mutated
        else java.util.Arrays.copyOf(mutated, 1 + rnd.nextInt(mutated.length))
      try {
        val (dims, vox) = Compresso.decode(input)
        assert(vox.length == dims.x * dims.y * dims.z)
      } catch {
        case _: IllegalArgumentException => // declared rejection
      }
    }
    // the voxel ceiling specifically: a header claiming 30000^2 x 64
    // voxels must be rejected before allocation
    val bomb = base.clone()
    bomb(6) = 0x30; bomb(7) = 0x75 // sx = 30000
    bomb(8) = 0x30; bomb(9) = 0x75 // sy = 30000
    val e = intercept[IllegalArgumentException](Compresso.decode(bomb))
    assert(e.getMessage.contains("ceiling"), e.getMessage)
  }

  test("encode/decode roundtrip on synthetic volumes") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val dims = Vec3(16, 12, 4)
      val n = (dims.x * dims.y * dims.z).toInt
      // blocky segmentation-like data: a few labels, spatially coherent
      val vox = new Array[Long](n)
      var i = 0
      while (i < n) {
        val x = i % 16; val y = (i / 16) % 12; val z = i / (16 * 12)
        vox(i) = ((x / (2 + trial % 3)) + (y / 3) * 7 + (z % 2) * 13).toLong *
          (if (rnd.nextInt(50) == 0) 2 else 1) // occasional speckle
        i += 1
      }
      val enc = Compresso.encode(vox, dims)
      val (d2, back) = Compresso.decode(enc)
      assert(d2 == dims)
      assert(java.util.Arrays.equals(vox, back), s"roundtrip trial $trial")
      // fast label path agrees on encoder output too
      assert(Compresso.labels(enc).toSet == vox.toSet)
    }
  }

  test("reference chunk re-encodes through own encoder losslessly") {
    val payload = readChunk("16_16_40/256-512_0-256_128-192.gz")
    val (dims, vox) = Compresso.decode(payload)
    val re = Compresso.encode(vox, dims)
    val (d2, back) = Compresso.decode(re)
    assert(d2 == dims)
    assert(java.util.Arrays.equals(vox, back))
  }

  test("remapLabels rewrites the label table in place of a re-encode") {
    // on a REFERENCE chunk: remap +1000 must decode as voxel+1000, with
    // geometry sections byte-identical (only ids / explicit locations move)
    val payload = readChunk("16_16_40/256-512_0-256_128-192.gz")
    val (dims, vox) = Compresso.decode(payload)
    val mapped = Compresso.remapLabels(payload, _ + 1000L)
    val (d2, back) = Compresso.decode(mapped)
    assert(d2 == dims)
    assert(back.zip(vox).forall { case (b, v) => b == v + 1000L })
    assert(mapped.length == payload.length)
    // renumber -> encode -> remap-back is identity on decoded voxels
    // (the download_crackle z-stack chain, image/__init__.py:250-301)
    val fwd = new java.util.LinkedHashMap[Long, java.lang.Long]()
    val ren = vox.map { v =>
      var r = fwd.get(v)
      if (r == null) { r = java.lang.Long.valueOf(fwd.size + 1L); fwd.put(v, r) }
      r.longValue()
    }
    val inv = new java.util.HashMap[Long, Long]()
    fwd.forEach((k, v) => { inv.put(v.longValue(), k); () })
    val member = Compresso.remapLabels(Compresso.encode(ren, dims), inv.get(_))
    val (_, out) = Compresso.decode(member)
    assert(java.util.Arrays.equals(out, vox))
  }
}
