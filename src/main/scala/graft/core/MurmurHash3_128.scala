package graft.core

/** MurmurHash3 x86_128 (Austin Appleby's public-domain algorithm).
  *
  * The Neuroglancer sharded format hashes the preshifted chunk id with
  * the *x86* 128-bit variant and keeps the low 64 bits (reference:
  * `datasource/precomputed/mmh3.py:1-450`, used at `sharding.py:77` on
  * the uint64 little-endian bytes of the id). Implemented here from the
  * public algorithm spec; verified against known-answer vectors in
  * MurmurSpec (cf. reference `test/test_sharding.py:34`).
  */
object MurmurHash3_128 {
  private final val C1 = 0x239b961b
  private final val C2 = 0xab0e9789
  private final val C3 = 0x38b34ae5
  private final val C4 = 0xa1e38b93

  @inline private def rotl(x: Int, r: Int): Int = Integer.rotateLeft(x, r)

  @inline private def fmix32(hIn: Int): Int = {
    var h = hIn
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Full 128-bit hash as four 32-bit lanes (h1, h2, h3, h4). */
  def hash128(data: Array[Byte], seed: Int = 0): (Int, Int, Int, Int) = {
    val len = data.length
    val nblocks = len / 16
    var h1 = seed; var h2 = seed; var h3 = seed; var h4 = seed

    @inline def block32(i: Int): Int =
      (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)

    var b = 0
    while (b < nblocks) {
      val base = b * 16
      var k1 = block32(base)
      var k2 = block32(base + 4)
      var k3 = block32(base + 8)
      var k4 = block32(base + 12)
      k1 *= C1; k1 = rotl(k1, 15); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 19); h1 += h2; h1 = h1 * 5 + 0x561ccd1b
      k2 *= C2; k2 = rotl(k2, 16); k2 *= C3; h2 ^= k2
      h2 = rotl(h2, 17); h2 += h3; h2 = h2 * 5 + 0x0bcaa747
      k3 *= C3; k3 = rotl(k3, 17); k3 *= C4; h3 ^= k3
      h3 = rotl(h3, 15); h3 += h4; h3 = h3 * 5 + 0x96cd1c35
      k4 *= C4; k4 = rotl(k4, 18); k4 *= C1; h4 ^= k4
      h4 = rotl(h4, 13); h4 += h1; h4 = h4 * 5 + 0x32ac3b17
      b += 1
    }

    // tail
    val tail = nblocks * 16
    var k1 = 0; var k2 = 0; var k3 = 0; var k4 = 0
    val rem = len & 15
    if (rem >= 13) k4 ^= (data(tail + 12) & 0xff)
    if (rem >= 14) k4 ^= (data(tail + 13) & 0xff) << 8
    if (rem >= 15) k4 ^= (data(tail + 14) & 0xff) << 16
    if (rem >= 13) { k4 *= C4; k4 = rotl(k4, 18); k4 *= C1; h4 ^= k4 }
    if (rem >= 9) k3 ^= (data(tail + 8) & 0xff)
    if (rem >= 10) k3 ^= (data(tail + 9) & 0xff) << 8
    if (rem >= 11) k3 ^= (data(tail + 10) & 0xff) << 16
    if (rem >= 12) k3 ^= (data(tail + 11) & 0xff) << 24
    if (rem >= 9) { k3 *= C3; k3 = rotl(k3, 17); k3 *= C4; h3 ^= k3 }
    if (rem >= 5) k2 ^= (data(tail + 4) & 0xff)
    if (rem >= 6) k2 ^= (data(tail + 5) & 0xff) << 8
    if (rem >= 7) k2 ^= (data(tail + 6) & 0xff) << 16
    if (rem >= 8) k2 ^= (data(tail + 7) & 0xff) << 24
    if (rem >= 5) { k2 *= C2; k2 = rotl(k2, 16); k2 *= C3; h2 ^= k2 }
    if (rem >= 1) k1 ^= (data(tail) & 0xff)
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 4) k1 ^= (data(tail + 3) & 0xff) << 24
    if (rem >= 1) { k1 *= C1; k1 = rotl(k1, 15); k1 *= C2; h1 ^= k1 }

    // finalization
    h1 ^= len; h2 ^= len; h3 ^= len; h4 ^= len
    h1 += h2; h1 += h3; h1 += h4
    h2 += h1; h3 += h1; h4 += h1
    h1 = fmix32(h1); h2 = fmix32(h2); h3 = fmix32(h3); h4 = fmix32(h4)
    h1 += h2; h1 += h3; h1 += h4
    h2 += h1; h3 += h1; h4 += h1
    (h1, h2, h3, h4)
  }

  /** Low 64 bits of the 128-bit digest read little-endian:
    * bytes 0-3 = h1, bytes 4-7 = h2.
    */
  def low64(data: Array[Byte]): Long = {
    val (h1, h2, _, _) = hash128(data)
    (h1.toLong & 0xffffffffL) | (h2.toLong << 32)
  }

  /** Hash a uint64 value's little-endian byte representation and keep
    * the low 64 bits — the sharded-format hash of a chunk id.
    */
  def hashUint64LE(v: Long): Long = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    low64(b)
  }
}
