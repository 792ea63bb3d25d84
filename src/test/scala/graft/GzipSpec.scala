package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Codec

/** gunzip fast path (ISIZE-preallocated single-member decode): parity
  * with the streaming path across header variants, sizes, and the
  * multi-member fallback.
  */
class GzipSpec extends AnyFunSuite {

  private def streamGunzip(data: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(data))
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  test("roundtrip parity across sizes") {
    val rnd = new scala.util.Random(11)
    for (size <- Seq(0, 1, 100, 65535, 65536, 1 << 20, (1 << 22) + 17)) {
      val data = new Array[Byte](size)
      // compressible-but-nontrivial: runs + noise
      var i = 0
      while (i < size) { data(i) = (if ((i / 97) % 3 == 0) 0 else rnd.nextInt(7)).toByte; i += 1 }
      val gz = Codec.gzip(data)
      assert(java.util.Arrays.equals(Codec.gunzip(gz), data), s"size $size")
      assert(java.util.Arrays.equals(streamGunzip(gz), data))
    }
  }

  test("FNAME/FCOMMENT header variants decode") {
    val data = Array.tabulate[Byte](10000)(i => (i % 11).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    // build a gzip stream with FNAME set via deflater + manual header
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(data); deflater.finish()
    val body = new Array[Byte](65536)
    val blen = deflater.deflate(body)
    deflater.end()
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, 8, 0, 0, 0, 0, 0, 0)) // FLG=FNAME
    bos.write("chunk.raw".getBytes("UTF-8")); bos.write(0)
    bos.write(body, 0, blen)
    val crc = new java.util.zip.CRC32(); crc.update(data)
    val tr = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(crc.getValue.toInt).putInt(data.length)
    bos.write(tr.array())
    assert(java.util.Arrays.equals(Codec.gunzip(bos.toByteArray), data))
  }

  test("multi-member stream falls back and still decodes fully") {
    val a = Array.tabulate[Byte](5000)(i => (i % 5).toByte)
    val b = Array.tabulate[Byte](3000)(i => (i % 9).toByte)
    val cat = Codec.gzip(a) ++ Codec.gzip(b)
    assert(java.util.Arrays.equals(Codec.gunzip(cat), a ++ b))
  }

  test("corrupt CRC is rejected (not silently returned)") {
    val data = Array.tabulate[Byte](4096)(i => i.toByte)
    val gz = Codec.gzip(data)
    gz(gz.length - 5) = (gz(gz.length - 5) ^ 0x55).toByte // flip CRC byte
    // decoder-boundary contract (r17): corrupt in-memory streams fail
    // as IllegalArgumentException, never a library IOException
    intercept[IllegalArgumentException](Codec.gunzip(gz))
  }
}
