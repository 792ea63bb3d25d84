package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Blosc

/** Blosc v1 frame codec (F10/S18) — spec-conformance units for the
  * c-blosc 1.x container format zarr-python v2 writes by default
  * (reference decode: datasource/zarr2/image.py:65-67).
  */
class BloscSpec extends AnyFunSuite {

  private def pattern(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7 + (i >> 3)) & 0xFF).toByte)

  test("byte-shuffle known answer + tail passthrough") {
    // typesize 4, two elements + 3 tail bytes
    val src = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    val sh = Blosc.shuffle(4, src)
    assert(sh.toSeq === Seq[Byte](1, 5, 2, 6, 3, 7, 4, 8, 9, 10, 11))
    assert(Blosc.unshuffle(4, sh).toSeq === src.toSeq)
  }

  test("round-trip: every inner codec x shuffle on/off x typesizes") {
    for {
      cname <- Seq("lz4", "lz4hc", "zlib", "zstd")
      shuf <- Seq(0, 1)
      ts <- Seq(1, 2, 4, 8)
      n <- Seq(0, 1, 100, 4096, 70000) // 70000 spans >1 default block
    } {
      val data = pattern(n)
      val frame = Blosc.compress(data, ts, cname, 5, shuf)
      assert(Blosc.decompress(frame).toSeq === data.toSeq,
        s"cname=$cname shuf=$shuf ts=$ts n=$n")
    }
  }

  test("multi-block framing with explicit small blocksize") {
    val data = pattern(10000)
    // 1 KiB blocks -> 10 blocks incl. a ragged leftover (10000 % 1024)
    val frame = Blosc.compress(data, 4, "lz4", 5, 1, blocksize0 = 1024)
    assert(Blosc.decompress(frame).toSeq === data.toSeq)
  }

  test("incompressible input falls back to memcpy framing") {
    val rnd = new scala.util.Random(42)
    val data = new Array[Byte](4096)
    rnd.nextBytes(data)
    val frame = Blosc.compress(data, 4, "lz4", 5, 1)
    assert(frame.length === data.length + 16, "expected memcpy frame")
    assert((frame(2) & 0x2) != 0, "memcpy flag set")
    assert(Blosc.decompress(frame).toSeq === data.toSeq)
  }

  test("decodes a hand-built frame per the public header spec") {
    // Independent of our encoder: 16-byte header, bstarts, raw splits
    // (csize == split size means stored-raw). typesize 2, shuffle on,
    // lz4 code (1) in flags bits 5-7 -> split mode: 2 lane streams.
    // 256 bytes = 128 uint16 elements, one block.
    val plain = pattern(256)
    val shuffled = Blosc.shuffle(2, plain)
    val bb = java.nio.ByteBuffer.allocate(16 + 4 + 2 * (4 + 128))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte) // version
    bb.put(1.toByte) // versionlz
    bb.put((0x1 | (1 << 5)).toByte) // shuffle | lz4
    bb.put(2.toByte) // typesize
    bb.putInt(256) // nbytes
    bb.putInt(256) // blocksize
    bb.putInt(bb.capacity) // cbytes
    bb.putInt(20) // bstart of block 0
    bb.putInt(128); bb.put(shuffled, 0, 128) // lane 0, stored raw
    bb.putInt(128); bb.put(shuffled, 128, 128) // lane 1, stored raw
    assert(Blosc.decompress(bb.array).toSeq === plain.toSeq)
  }

  test("encoder stamps DONT_SPLIT (0x10) exactly when single-stream") {
    // c-blosc >= 1.14 decoders (numcodecs) take the per-block stream
    // count from flag 0x10, not the codec rule — a single-stream
    // zstd/zlib frame without it decodes as garbage in zarr-python.
    val data = pattern(4096)
    for (cname <- Seq("zstd", "zlib")) { // split rule: never split
      val f = Blosc.compress(data, 4, cname, 5, 1)
      assert((f(2) & 0x10) != 0, s"$cname frame must carry DONT_SPLIT")
    }
    // lz4, ts=4, blocksize/ts >= 128 -> forward-compat split mode
    val fSplit = Blosc.compress(data, 4, "lz4", 5, 1)
    assert((fSplit(2) & 0x10) == 0, "lz4 split frame must NOT carry DONT_SPLIT")
    // ts=1 is single-stream for every codec
    val f1 = Blosc.compress(data, 1, "lz4", 5, 0)
    assert((f1(2) & 0x10) != 0, "ts=1 frame must carry DONT_SPLIT")
  }

  test("decoder honors the split flag, not the codec rule") {
    // SPLITMODE=ALWAYS / pre-1.14 shape: a zlib frame WITHOUT 0x10
    // whose block IS split into typesize streams. The derived
    // forward-compat rule says zlib never splits — only the flag
    // decodes this correctly.
    val plain = pattern(256)
    val shuffled = Blosc.shuffle(2, plain)
    val bb = java.nio.ByteBuffer.allocate(16 + 4 + 2 * (4 + 128))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte)
    bb.put((0x1 | (3 << 5)).toByte) // shuffle | zlib, NO DONT_SPLIT
    bb.put(2.toByte) // typesize
    bb.putInt(256).putInt(256).putInt(bb.capacity)
    bb.putInt(20) // bstart
    bb.putInt(128); bb.put(shuffled, 0, 128) // lane 0 raw
    bb.putInt(128); bb.put(shuffled, 128, 128) // lane 1 raw
    assert(Blosc.decompress(bb.array).toSeq === plain.toSeq)

    // SPLITMODE=NEVER shape: an lz4 frame WITH 0x10 stored as ONE
    // stream even though the forward-compat rule says split.
    val bb2 = java.nio.ByteBuffer.allocate(16 + 4 + 4 + 256)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.put(2.toByte).put(1.toByte)
    bb2.put((0x1 | 0x10 | (1 << 5)).toByte) // shuffle | DONT_SPLIT | lz4
    bb2.put(2.toByte)
    bb2.putInt(256).putInt(256).putInt(bb2.capacity)
    bb2.putInt(20)
    bb2.putInt(256); bb2.put(shuffled, 0, 256) // one raw stream
    assert(Blosc.decompress(bb2.array).toSeq === plain.toSeq)
  }

  test("truncated memcpy frame fails loudly instead of zero-padding") {
    val rnd = new scala.util.Random(7)
    val noise = new Array[Byte](64); rnd.nextBytes(noise)
    val frame = Blosc.compress(noise, 4, "lz4", 5, 1) // memcpy framing
    assert((frame(2) & 0x2) != 0)
    val cut = java.util.Arrays.copyOf(frame, frame.length - 10)
    // keep header cbytes consistent with the truncated buffer so only
    // the nbytes-vs-length guard can catch it
    java.nio.ByteBuffer.wrap(cut).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(12, cut.length)
    assertThrows[IllegalArgumentException](Blosc.decompress(cut))
  }

  test("bit-shuffle and native-only codecs are rejected, not misread") {
    val frame = Blosc.compress(pattern(64), 4)
    frame(2) = (frame(2) | 0x4).toByte // set bit-shuffle flag
    assertThrows[IllegalArgumentException](Blosc.decompress(frame))
    assertThrows[IllegalArgumentException](
      Blosc.compress(pattern(64), 4, cname = "snappy"))
    assertThrows[IllegalArgumentException](
      Blosc.compress(pattern(64), 4, shuffleMode = 2))
  }

  test("zarr2 blosc meta round-trips through .zarray JSON") {
    import graft.sources.Zarr2IO
    import graft.core.Vec3
    val dir = Files_createTemp("blosc_zarr2_meta")
    val m = Zarr2IO.Zarr2Meta(
      shape = Vec3(8, 8, 8), chunkShape = Vec3(4, 4, 4),
      dtype = "<u2", fillValue = 0, compressor = "blosc",
      bloscCname = "zstd", bloscClevel = 3, bloscShuffle = 0)
    Zarr2IO.writeMeta(dir, m)
    val got = Zarr2IO.readMeta(dir)
    assert(got.compressor === "blosc")
    assert(got.bloscCname === "zstd")
    assert(got.bloscClevel === 3)
    assert(got.bloscShuffle === 0)
  }

  private def Files_createTemp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString
}
