package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Brotli

/** RFC 7932 stored-mode subset (see the scope note in core/Brotli.scala). */
class BrotliSpec extends AnyFunSuite {

  test("roundtrip: empty, small, multi-pattern payloads") {
    Seq(
      Array.emptyByteArray,
      "hello brotli".getBytes("UTF-8"),
      Array.tabulate(65537)(i => (i * 31 % 251).toByte),
      Array.fill(1 << 20)(0x5a.toByte)
    ).foreach { payload =>
      val enc = Brotli.compress(payload)
      assert(Brotli.decompress(enc).sameElements(payload))
    }
  }

  test("multi-block stream (block cap forces >1 uncompressed meta-block)") {
    // 2^24-1 is the per-block cap; 2^24+5 bytes must produce two blocks
    val payload = Array.tabulate((1 << 24) + 5)(i => (i % 97).toByte)
    val enc = Brotli.compress(payload)
    assert(Brotli.decompress(enc).sameElements(payload))
  }

  test("hand-built stream with a metadata skip-block decodes") {
    // WBITS=16 ('0'), metadata block: ISLAST=0, MNIBBLES code 3 (0),
    // reserved 0, MSKIPBYTES=1, MSKIPLEN-1=2 (skip 3 bytes), align,
    // 3 skip bytes; then one 4-byte uncompressed block; then last-empty.
    val bits = new StringBuilder
    def put(v: Int, n: Int): Unit = (0 until n).foreach(i => bits.append((v >> i) & 1))
    put(0, 1) // wbits=16
    put(0, 1); put(3, 2); put(0, 1); put(1, 2); put(2, 8) // metadata header
    while (bits.length % 8 != 0) put(0, 1)
    "MET".getBytes.foreach(b => put(b & 0xff, 8))
    put(0, 1); put(0, 2); put(3, 16); put(1, 1) // block: mlen=4, uncompressed
    while (bits.length % 8 != 0) put(0, 1)
    "DATA".getBytes.foreach(b => put(b & 0xff, 8))
    put(1, 1); put(1, 1) // islast + islastempty
    while (bits.length % 8 != 0) put(0, 1)
    val bytes = bits.toString.grouped(8).map { g =>
      g.zipWithIndex.foldLeft(0) { case (a, (c, i)) => a | ((c - '0') << i) }.toByte
    }.toArray
    assert(new String(Brotli.decompress(bytes), "UTF-8") == "DATA")
  }

  test("entropy-coded meta-block is rejected loudly") {
    // ISLAST=1, ISLASTEMPTY=0, MNIBBLES code 0 (4 nibbles), MLEN-1=0:
    // a last compressed block (ISUNCOMPRESSED bit only exists on
    // non-last blocks) -> must hit the unsupported path
    val bits = new StringBuilder
    def put(v: Int, n: Int): Unit = (0 until n).foreach(i => bits.append((v >> i) & 1))
    put(0, 1) // wbits
    put(1, 1); put(0, 1); put(0, 2); put(0, 16)
    put(0, 8) // padding for the would-be entropy data
    val bytes = (bits.toString + "0" * (8 - bits.length % 8)).grouped(8).map { g =>
      g.zipWithIndex.foldLeft(0) { case (a, (c, i)) => a | ((c - '0') << i) }.toByte
    }.toArray
    val e = intercept[UnsupportedOperationException](Brotli.decompress(bytes))
    assert(e.getMessage.contains("stored-mode"))
  }

  test("compress picks the minimal MNIBBLES (RFC 7932 §9.2)") {
    // 4-byte block -> 4 nibbles: header 1+1+2+16+1 = 21 bits = 3 bytes,
    // + 4 payload + 1 closing ISLAST/ISLASTEMPTY byte = 8 total
    assert(Brotli.compress("DATA".getBytes).length == 8)
    // 70000-byte block (> 2^16, <= 2^20) -> 5 nibbles: header 25 bits
    // = 4 bytes, + payload + 1
    assert(Brotli.compress(new Array[Byte](70000)).length == 70000 + 5)
  }

  test("non-minimal MNIBBLES is rejected (conforming-decoder parity)") {
    // the pre-r15 encoder's shape: a 4-byte block with a 6-nibble MLEN
    // field — standard brotli decoders reject this, and so do we
    val bits = new StringBuilder
    def put(v: Int, n: Int): Unit = (0 until n).foreach(i => bits.append((v >> i) & 1))
    put(0, 1) // wbits
    put(0, 1); put(2, 2); put(3, 24); put(1, 1) // mlen=4 in 6 nibbles
    while (bits.length % 8 != 0) put(0, 1)
    "DATA".getBytes.foreach(b => put(b & 0xff, 8))
    put(1, 1); put(1, 1)
    while (bits.length % 8 != 0) put(0, 1)
    val bytes = bits.toString.grouped(8).map { g =>
      g.zipWithIndex.foldLeft(0) { case (a, (c, i)) => a | ((c - '0') << i) }.toByte
    }.toArray
    val e = intercept[IllegalArgumentException](Brotli.decompress(bytes))
    assert(e.getMessage.contains("non-minimal MNIBBLES"))
  }

  test("truncated stream fails") {
    val enc = Brotli.compress("payload payload".getBytes)
    intercept[IllegalArgumentException](
      Brotli.decompress(java.util.Arrays.copyOf(enc, enc.length - 3)))
  }
}
