package graft.core

import scala.collection.mutable

/** Neuroglancer `compressed_segmentation` codec (pure Scala port from
  * the public format spec; the reference delegates to the C++
  * `compressed_segmentation` package via chunks.py:104-107/164-165).
  *
  * Format (little-endian 32-bit words throughout):
  *  - file header: one uint32 per channel = offset (in 32-bit units
  *    from file start) of that channel's data; we encode one channel.
  *  - channel: per-block headers (2 words each, x-fastest block grid
  *    order), then block payloads. Header word0 = lookup-table offset
  *    (low 24 bits, in words, relative to channel start) | encoded
  *    bits << 24; word1 = encoded-values offset (words, relative to
  *    channel start).
  *  - encoded bits ∈ {0,1,2,4,8,16,32} = smallest power-of-two width
  *    that indexes the block's distinct labels.
  *  - values: bit-packed lookup indices over the FULL block extent
  *    (partial edge blocks are padded by clamping to the last voxel),
  *    voxel order x-fastest; indices never straddle a word.
  *  - lookup table: distinct labels in first-appearance order; uint32
  *    = 1 word/label, uint64 = 2 words (low, high). Identical tables
  *    are shared between blocks (the spec'd encoder cache).
  *
  * Codec-level pushdowns (chunks.py:362-484): `labels`/`contains`
  * read only headers + tables (+ a bit-scan for the used-index high
  * water mark) — no voxel materialization; `readVoxel` is O(1).
  */
object Cseg {
  private def encodedBits(n: Int): Int =
    if (n <= 1) 0 else if (n <= 2) 1 else if (n <= 4) 2
    else if (n <= 16) 4 else if (n <= 256) 8
    else if (n <= 65536) 16 else 32

  /** Encode F-order voxels of a `volSize` chunk. dtypeBytes 4 or 8. */
  def encode(vox: Array[Long], volSize: Vec3, blockSize: Vec3,
      dtypeBytes: Int): Array[Byte] = {
    require(dtypeBytes == 4 || dtypeBytes == 8, s"cseg dtype $dtypeBytes")
    val vx = volSize.x.toInt; val vy = volSize.y.toInt; val vz = volSize.z.toInt
    require(vox.length == vx * vy * vz, s"${vox.length} voxels != $volSize")
    val bsx = blockSize.x.toInt; val bsy = blockSize.y.toInt; val bsz = blockSize.z.toInt
    val gx = Geom.ceilDiv(vx, bsx).toInt
    val gy = Geom.ceilDiv(vy, bsy).toInt
    val gz = Geom.ceilDiv(vz, bsz).toInt
    val nBlocks = gx * gy * gz
    val ch = mutable.ArrayBuffer.fill(nBlocks * 2)(0) // headers first
    val tableCache = mutable.HashMap.empty[Seq[Long], Int]
    var bi = 0
    var bz = 0
    while (bz < gz) {
      var by = 0
      while (by < gy) {
        var bx = 0
        while (bx < gx) {
          val x0 = bx * bsx; val y0 = by * bsy; val z0 = bz * bsz
          val ax = math.min(bsx, vx - x0)
          val ay = math.min(bsy, vy - y0)
          val az = math.min(bsz, vz - z0)
          // distinct labels in first-appearance order
          val table = mutable.ArrayBuffer.empty[Long]
          val index = mutable.HashMap.empty[Long, Int]
          var z = 0
          while (z < az) {
            var y = 0
            while (y < ay) {
              var x = 0
              while (x < ax) {
                val v = vox((x0 + x) + vx * ((y0 + y) + vy * (z0 + z)))
                if (!index.contains(v)) { index(v) = table.size; table += v }
                x += 1
              }
              y += 1
            }
            z += 1
          }
          val bits = encodedBits(table.size)
          val valuesOffset = ch.size
          if (bits > 0) {
            val nVals = bsx * bsy * bsz // FULL block extent
            val nWords = (bits * nVals + 31) / 32
            val words = new Array[Int](nWords)
            var i = 0
            var fz = 0
            while (fz < bsz) {
              val cz = math.min(fz, az - 1)
              var fy = 0
              while (fy < bsy) {
                val cy = math.min(fy, ay - 1)
                var fx = 0
                while (fx < bsx) {
                  val cx = math.min(fx, ax - 1)
                  val v = vox((x0 + cx) + vx * ((y0 + cy) + vy * (z0 + cz)))
                  val id = index(v)
                  val bitPos = i * bits
                  words(bitPos / 32) |= id << (bitPos % 32)
                  i += 1
                  fx += 1
                }
                fy += 1
              }
              fz += 1
            }
            ch ++= words
          }
          val tableOffset = tableCache.getOrElseUpdate(table.toSeq, {
            val off = ch.size
            table.foreach { v =>
              ch += v.toInt // low word
              if (dtypeBytes == 8) ch += (v >>> 32).toInt
            }
            off
          })
          require(tableOffset < (1 << 24), "lookup table offset exceeds 24 bits")
          ch(bi * 2) = tableOffset | (bits << 24)
          ch(bi * 2 + 1) = valuesOffset
          bi += 1
          bx += 1
        }
        by += 1
      }
      bz += 1
    }
    // assemble: [channel offset header][channel words]
    val buf = java.nio.ByteBuffer.allocate(4 * (1 + ch.size))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1) // single channel starts at word 1
    ch.foreach(buf.putInt)
    buf.array()
  }

  /** Word accessor over UNTRUSTED bytes: header offsets are file
    * content, so every dereference is bounds-checked and a corrupt
    * offset fails as IllegalArgumentException (the repo-wide hostile-
    * input contract) instead of a raw IndexOutOfBoundsException.
    */
  private final class Words(bytes: Array[Byte]) {
    private val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    private val nWords = bytes.length / 4
    def apply(i: Int): Int = {
      require(i >= 0 && i < nWords,
        s"corrupt cseg stream: word $i outside the $nWords-word payload")
      bb.getInt(4 * i)
    }
  }

  /** Encoded-bits header field must be one of the spec's widths; any
    * other value means a corrupt or non-cseg stream (and 1L << bits
    * would silently wrap for bits > 63).
    */
  private def checkBits(bits: Int): Int = {
    require(bits == 0 || bits == 1 || bits == 2 || bits == 4 ||
        bits == 8 || bits == 16 || bits == 32,
      s"corrupt cseg stream: encoded-bits $bits not in {0,1,2,4,8,16,32}")
    bits
  }

  /** Decode to F-order voxels. */
  def decode(bytes: Array[Byte], volSize: Vec3, blockSize: Vec3,
      dtypeBytes: Int): Array[Long] = {
    val w = new Words(bytes)
    val chOff = w(0)
    val vx = volSize.x.toInt; val vy = volSize.y.toInt; val vz = volSize.z.toInt
    val bsx = blockSize.x.toInt; val bsy = blockSize.y.toInt; val bsz = blockSize.z.toInt
    val gx = Geom.ceilDiv(vx, bsx).toInt
    val gy = Geom.ceilDiv(vy, bsy).toInt
    val gz = Geom.ceilDiv(vz, bsz).toInt
    val out = new Array[Long](vx * vy * vz)
    val tw = dtypeBytes / 4 // words per table entry
    var bi = 0
    var bz = 0
    while (bz < gz) {
      var by = 0
      while (by < gy) {
        var bx = 0
        while (bx < gx) {
          val w0 = w(chOff + bi * 2)
          val bits = checkBits(w0 >>> 24)
          val tableOff = chOff + (w0 & 0xffffff)
          val valOff = chOff + w(chOff + bi * 2 + 1)
          val mask = if (bits == 0) 0L else (1L << bits) - 1L
          val x0 = bx * bsx; val y0 = by * bsy; val z0 = bz * bsz
          val ax = math.min(bsx, vx - x0)
          val ay = math.min(bsy, vy - y0)
          val az = math.min(bsz, vz - z0)
          var z = 0
          while (z < az) {
            var y = 0
            while (y < ay) {
              var x = 0
              while (x < ax) {
                val i = x + bsx * (y + bsy * z) // FULL block dims
                val id =
                  if (bits == 0) 0
                  else {
                    val bitPos = i * bits
                    ((w(valOff + bitPos / 32) >>> (bitPos % 32)) & mask).toInt
                  }
                val lo = w(tableOff + id * tw).toLong & 0xffffffffL
                val label =
                  if (tw == 1) lo
                  else lo | (w(tableOff + id * tw + 1).toLong << 32)
                out((x0 + x) + vx * ((y0 + y) + vy * (z0 + z))) = label
                x += 1
              }
              y += 1
            }
            z += 1
          }
          bi += 1
          bx += 1
        }
        by += 1
      }
      bz += 1
    }
    out
  }

  /** Per-block iteration over (bits, tableOff, valOff, nFullVals),
    * shared by the pushdown paths.
    */
  private def blockMeta(w: Words, volSize: Vec3, blockSize: Vec3)
      : Seq[(Int, Int, Int)] = {
    val chOff = w(0)
    val gx = Geom.ceilDiv(volSize.x, blockSize.x).toInt
    val gy = Geom.ceilDiv(volSize.y, blockSize.y).toInt
    val gz = Geom.ceilDiv(volSize.z, blockSize.z).toInt
    (0 until gx * gy * gz).map { bi =>
      val w0 = w(chOff + bi * 2)
      (checkBits(w0 >>> 24), chOff + (w0 & 0xffffff),
        chOff + w(chOff + bi * 2 + 1))
    }
  }

  /** Highest lookup index actually used by a block (bit-scan of the
    * packed values; tables don't store their length).
    */
  private def maxIndex(w: Words, bits: Int, valOff: Int, nVals: Int): Int = {
    if (bits == 0) return 0
    val mask = (1L << bits) - 1L
    var mx = 0
    var i = 0
    while (i < nVals) {
      val bitPos = i * bits
      val id = ((w(valOff + bitPos / 32) >>> (bitPos % 32)) & mask).toInt
      if (id > mx) mx = id
      i += 1
    }
    mx
  }

  /** Distinct labels without voxel materialization (chunks.py:362-393
    * labels pushdown): headers + tables + one bit-scan per block.
    */
  def labels(bytes: Array[Byte], volSize: Vec3, blockSize: Vec3,
      dtypeBytes: Int): Array[Long] = {
    val w = new Words(bytes)
    val tw = dtypeBytes / 4
    val nVals = (blockSize.x * blockSize.y * blockSize.z).toInt
    val seen = mutable.LinkedHashSet.empty[Long]
    blockMeta(w, volSize, blockSize).foreach { case (bits, tableOff, valOff) =>
      val mx = maxIndex(w, bits, valOff, nVals)
      var id = 0
      while (id <= mx) {
        val lo = w(tableOff + id * tw).toLong & 0xffffffffL
        seen += (if (tw == 1) lo else lo | (w(tableOff + id * tw + 1).toLong << 32))
        id += 1
      }
    }
    seen.toArray
  }

  /** Membership test on the encoded stream (chunks.py:459-484). */
  def contains(bytes: Array[Byte], volSize: Vec3, blockSize: Vec3,
      dtypeBytes: Int, label: Long): Boolean = {
    val w = new Words(bytes)
    val tw = dtypeBytes / 4
    val nVals = (blockSize.x * blockSize.y * blockSize.z).toInt
    blockMeta(w, volSize, blockSize).exists { case (bits, tableOff, valOff) =>
      val mx = maxIndex(w, bits, valOff, nVals)
      (0 to mx).exists { id =>
        val lo = w(tableOff + id * tw).toLong & 0xffffffffL
        val v = if (tw == 1) lo else lo | (w(tableOff + id * tw + 1).toLong << 32)
        v == label
      }
    }
  }

  /** Codec-level remap (chunks.py:395-421 dispatch → cseg.remap):
    * rewrite each block's lookup-table entries through `mapping`,
    * leaving the bit-packed index streams untouched — no decode and
    * no label-array materialization. (Not O(tables) alone: a table's
    * length is recovered as the max used index over ALL blocks
    * sharing its offset — tables don't store a length — and that
    * recovery bit-scans each block's packed indices once, the same
    * cache-friendly pass labels() makes. The win over decode+remap+
    * encode is the absent voxel expansion and re-encode, not the
    * scan.) Shared tables (the encoder cache) are rewritten once.
    * preserveMissing=false raises on an unmapped label (fastremap's
    * KeyError semantics); true leaves it unchanged.
    */
  def remap(bytes: Array[Byte], volSize: Vec3, blockSize: Vec3,
      dtypeBytes: Int, mapping: collection.Map[Long, Long],
      preserveMissing: Boolean): Array[Byte] = {
    val out = bytes.clone()
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = new Words(bytes)
    val tw = dtypeBytes / 4
    val nVals = (blockSize.x * blockSize.y * blockSize.z).toInt
    val tableLen = mutable.HashMap.empty[Int, Int]
    blockMeta(w, volSize, blockSize).foreach { case (bits, tableOff, valOff) =>
      val n = maxIndex(w, bits, valOff, nVals) + 1
      tableLen(tableOff) = math.max(tableLen.getOrElse(tableOff, 0), n)
    }
    tableLen.foreach { case (tableOff, n) =>
      var id = 0
      while (id < n) {
        val lo = w(tableOff + id * tw).toLong & 0xffffffffL
        val v = if (tw == 1) lo
          else lo | (w(tableOff + id * tw + 1).toLong << 32)
        val m = mapping.getOrElse(v,
          if (preserveMissing) v
          else throw new NoSuchElementException(
            s"label $v not in remap mapping"))
        if (tw == 1) {
          require(m >= 0 && m <= 0xffffffffL,
            s"remapped label $m exceeds uint32")
          bb.putInt(4 * (tableOff + id), m.toInt)
        } else {
          bb.putInt(4 * (tableOff + id * 2), m.toInt)
          bb.putInt(4 * (tableOff + id * 2 + 1), (m >>> 32).toInt)
        }
        id += 1
      }
    }
    out
  }

  /** O(1) random access (chunks.py:423-457 read_voxel). */
  def readVoxel(bytes: Array[Byte], volSize: Vec3, blockSize: Vec3,
      dtypeBytes: Int, x: Long, y: Long, z: Long): Long = {
    val w = new Words(bytes)
    val chOff = w(0)
    val gx = Geom.ceilDiv(volSize.x, blockSize.x).toInt
    val gy = Geom.ceilDiv(volSize.y, blockSize.y).toInt
    val bx = (x / blockSize.x).toInt
    val by = (y / blockSize.y).toInt
    val bz = (z / blockSize.z).toInt
    val bi = bx + gx * (by + gy * bz)
    val w0 = w(chOff + bi * 2)
    val bits = checkBits(w0 >>> 24)
    val tableOff = chOff + (w0 & 0xffffff)
    val valOff = chOff + w(chOff + bi * 2 + 1)
    val i = (x % blockSize.x + blockSize.x *
      (y % blockSize.y + blockSize.y * (z % blockSize.z))).toInt
    val id =
      if (bits == 0) 0
      else {
        val bitPos = i * bits
        ((w(valOff + bitPos / 32) >>> (bitPos % 32)) & ((1L << bits) - 1L)).toInt
      }
    val tw = dtypeBytes / 4
    val lo = w(tableOff + id * tw).toLong & 0xffffffffL
    if (tw == 1) lo else lo | (w(tableOff + id * tw + 1).toLong << 32)
  }
}
