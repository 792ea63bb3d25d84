package graft.core

import java.io.ByteArrayOutputStream

/** RFC 7932 (brotli) second-stage wrap — the `br` content encoding the
  * reference lists beside gzip/zstd (datasource/precomputed/common.py:18-29).
  *
  * SCOPE, decided loudly: this environment has zero egress, no brotli
  * JVM artifact on any classpath, and no python brotli module — so the
  * 122 KB static dictionary (shipped only as a binary appendix of the
  * RFC) is unobtainable, and no real entropy-coded fixture can be
  * generated or verified offline. Implementing the full entropy path
  * (prefix-code groups, context maps, block switching, dictionary
  * transforms) without a single validating fixture would be unverified
  * code posing as coverage. Instead this implements the RFC's
  * STORED-MODE subset end to end:
  *
  *  - compress(): valid RFC 7932 streams made of uncompressed
  *    meta-blocks (ISUNCOMPRESSED=1, MLEN <= 2^24) + the closing empty
  *    ISLAST/ISLASTEMPTY block — byte-for-byte decodable by any
  *    standard brotli decoder;
  *  - decompress(): full stream-header + meta-block-header parse
  *    (WBITS, MNIBBLES incl. metadata skip-blocks), uncompressed
  *    meta-blocks decoded; ENTROPY-CODED meta-blocks are rejected with
  *    an explicit UnsupportedOperationException naming the constraint.
  *
  * The F12/F13 policy tables and the chunk read path accept `.br`
  * objects through this codec; writing with compress="br" emits
  * stored-mode streams.
  */
object Brotli {

  private final class BitReader(d: Array[Byte]) {
    var pos = 0L // bit position
    def bit(): Int = {
      val byteIx = (pos >> 3).toInt
      if (byteIx >= d.length)
        throw new IllegalArgumentException("truncated brotli stream")
      val v = ((d(byteIx) & 0xff) >> (pos & 7).toInt) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = {
      var out = 0; var i = 0
      while (i < n) { out |= bit() << i; i += 1 }
      out
    }
    def alignToByte(): Unit = pos = (pos + 7) & ~7L
    def readBytes(n: Int): Array[Byte] = {
      require((pos & 7) == 0, "not byte-aligned")
      val start = (pos >> 3).toInt
      if (start + n > d.length)
        throw new IllegalArgumentException("truncated brotli stream")
      pos += n.toLong * 8
      java.util.Arrays.copyOfRange(d, start, start + n)
    }
  }

  /** Parse WBITS (RFC 7932 §9.1). The value is irrelevant for
    * stored-mode streams (no back-references) but the variable-length
    * field must be consumed exactly to keep bit alignment. */
  private def readWbits(r: BitReader): Int = {
    if (r.bit() == 0) 16
    else {
      val n = r.bits(3)
      if (n != 0) 17 + n
      else {
        val m = r.bits(3)
        if (m == 0) 17
        else if (m == 1) throw new IllegalArgumentException("invalid WBITS")
        else 8 + m
      }
    }
  }

  def decompress(data: Array[Byte]): Array[Byte] = {
    val r = new BitReader(data)
    readWbits(r)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 2))
    var last = false
    while (!last) {
      last = r.bit() == 1
      if (last && r.bit() == 1) {
        // ISLASTEMPTY
      } else {
        val mnibbles = r.bits(2) match {
          case 3 => 0
          case k => k + 4
        }
        if (mnibbles == 0) {
          // metadata block: reserved bit + MSKIPBYTES + skip
          require(r.bit() == 0, "reserved bit set in metadata block")
          val skipBytes = r.bits(2)
          var skipLen = 0
          if (skipBytes > 0) {
            skipLen = r.bits(skipBytes * 8) + 1
            require(skipBytes == 1 || skipLen - 1 >= (1 << ((skipBytes - 1) * 8)),
              "non-minimal MSKIPLEN encoding")
          }
          r.alignToByte()
          if (skipBytes > 0) r.readBytes(skipLen)
        } else {
          val mlenM1 = r.bits(mnibbles * 4)
          // RFC 7932 §9.2: MNIBBLES must be minimal — with 5 or 6
          // nibbles the top nibble of MLEN-1 must be non-zero; a
          // conforming decoder rejects non-minimal encodings
          require(mnibbles == 4 || (mlenM1 >>> ((mnibbles - 1) * 4)) != 0,
            "non-minimal MNIBBLES encoding")
          val mlen = mlenM1 + 1
          val uncompressed = !last && r.bit() == 1
          if (uncompressed) {
            r.alignToByte()
            out.write(r.readBytes(mlen))
          } else {
            throw new UnsupportedOperationException(
              "entropy-coded brotli meta-block: only the RFC 7932 stored-mode " +
              "subset is implemented (the static dictionary and a validating " +
              "encoder are unavailable in this zero-egress environment); " +
              "re-encode with gzip or zstd, or with Brotli.compress")
          }
        }
      }
    }
    out.toByteArray
  }

  /** Emit a valid RFC 7932 stream of uncompressed meta-blocks. */
  def compress(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    var cur = 0
    var bitBuf = 0
    var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        bitBuf |= ((v >> i) & 1) << bitCnt
        bitCnt += 1
        if (bitCnt == 8) { out.write(bitBuf); bitBuf = 0; bitCnt = 0 }
        i += 1
      }
    }
    def align(): Unit = if (bitCnt > 0) { out.write(bitBuf); bitBuf = 0; bitCnt = 0 }
    putBits(0, 1) // WBITS = 16
    val MaxBlock = (1 << 24) - 1
    var off = 0
    while (off < data.length) {
      val n = math.min(MaxBlock, data.length - off)
      putBits(0, 1) // ISLAST = 0
      // minimal MNIBBLES (RFC 7932 §9.2: if MNIBBLES is 5 or 6 the top
      // nibble of MLEN-1 must be non-zero — conforming decoders reject
      // non-minimal encodings, so a fixed 6-nibble field would make
      // every block under 1 MiB invalid)
      val nibbles = if (n - 1 < (1 << 16)) 4
        else if (n - 1 < (1 << 20)) 5 else 6
      putBits(nibbles - 4, 2)      // MNIBBLES code 0/1/2 -> 4/5/6
      putBits(n - 1, nibbles * 4)  // MLEN - 1
      putBits(1, 1)                // ISUNCOMPRESSED
      align()
      out.write(data, off, n)
      off += n
    }
    putBits(1, 1) // ISLAST
    putBits(1, 1) // ISLASTEMPTY
    align()
    out.toByteArray
  }
}
