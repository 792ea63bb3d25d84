package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Compresso v1 segmentation codec (chunks.py:107-108,166-167,388-389 use
  * the external `compresso` package; scheme published in Matejek et al.,
  * "Compresso: Efficient Compression of Segmentation Data For
  * Connectomics", MICCAI 2017). Stream layout reverse-derived from the
  * reference's committed golden layer test_seg_unsharded (all three mips)
  * and validated by tools/compresso_oracle_gen.py, which decodes every
  * chunk with an independent numpy implementation and asserts that the
  * boundary mask recomputed from the decoded labels is bit-identical to
  * the stored window stream.
  *
  * Container (little-endian), version 1, 4x4x1 windows, u32 labels:
  *  - header 36 B: 'cpso', version u8, data_width u8, sx/sy/sz u16,
  *    xstep/ystep/zstep u8, id_size u64, value_size u32,
  *    location_size u64, connectivity u8 (4)
  *  - ids u32[id_size]: per-slice 4-connected component labels of the
  *    non-boundary voxels, slices ascending, raster discovery order
  *  - values u16[value_size]: sorted distinct 4x4 boundary-window bitmasks
  *    (bit = localY*4 + localX)
  *  - locations u32[location_size]: one code per indeterminate boundary
  *    voxel in forward raster order: 1 = copy east, 3 = copy south,
  *    c >= 7 = explicit label c-7
  *  - windows: u16 RLE tokens over the window grid (x-window fastest,
  *    then y-window, then slice): odd t = run of t>>1 all-zero windows,
  *    even t = literal values(t>>1)
  *  - trailer u32[sz] per-slice component counts + u32[sz] per-slice
  *    location counts shifted down one slice (random-access aid)
  *
  * Boundary semantics: a voxel is boundary iff its label differs from its
  * east (x+1) or south (y+1) in-slice neighbor (out-of-bounds neighbors
  * ignored). Consequently a boundary voxel whose north or west neighbor is
  * non-boundary provably shares that neighbor's label; only voxels with
  * boundary/absent north AND west neighbors consume a location code, and
  * codes reference east/south voxels, so they resolve in reverse raster
  * order.
  */
object Compresso {

  final case class Header(dataWidth: Int, sx: Int, sy: Int, sz: Int,
      idSize: Int, valueSize: Int, locationSize: Int)

  private def buf(payload: Array[Byte]) =
    ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)

  def parseHeader(payload: Array[Byte]): Header = {
    val b = buf(payload)
    require(b.get(0) == 'c' && b.get(1) == 'p' && b.get(2) == 's' &&
      b.get(3) == 'o', "not a compresso payload (magic)")
    val version = b.get(4) & 0xff
    require(version == 1, s"compresso version $version unsupported (expect 1)")
    val dw = b.get(5) & 0xff
    val sx = b.getShort(6) & 0xffff
    val sy = b.getShort(8) & 0xffff
    val sz = b.getShort(10) & 0xffff
    val xs = b.get(12) & 0xff; val ys = b.get(13) & 0xff; val zs = b.get(14) & 0xff
    require(xs == 4 && ys == 4 && zs == 1,
      s"compresso steps ${xs}x${ys}x$zs unsupported (expect 4x4x1)")
    val idSize = b.getLong(15)
    val valueSize = b.getInt(23)
    val locSize = b.getLong(27)
    val conn = b.get(35) & 0xff
    require(conn == 4, s"compresso connectivity $conn unsupported")
    Header(dw, sx, sy, sz, idSize.toInt, valueSize, locSize.toInt)
  }

  private def readLabel(b: ByteBuffer, off: Int, dw: Int): Long = dw match {
    case 1 => b.get(off) & 0xffL
    case 2 => b.getShort(off) & 0xffffL
    case 4 => b.getInt(off) & 0xffffffffL
    case 8 => b.getLong(off)
    case d => throw new IllegalArgumentException(s"data_width $d")
  }

  private def writeLabel(b: ByteBuffer, off: Int, dw: Int, v: Long): Unit = {
    require(dw == 8 || (v >>> (8 * dw)) == 0,
      s"label $v overflows data_width $dw")
    dw match {
      case 1 => b.put(off, v.toByte)
      case 2 => b.putShort(off, v.toShort)
      case 4 => b.putInt(off, v.toInt)
      case 8 => b.putLong(off, v)
      case d => throw new IllegalArgumentException(s"data_width $d")
    }
  }

  /** O(metadata) label-table rewrite: remap every label VALUE carried by
    * the binary — the per-component `ids` stream and the explicit
    * (code >= 7) location entries — without touching boundary windows or
    * geometry. This is the compresso analogue of crackle.remap, the step
    * that makes the reference's progressive z-stack build cheap
    * (image/__init__.py:250-301: download(renumber=True) per z-slab,
    * compress the small-alphabet array, then remap the label table back
    * to the global ids instead of re-encoding voxels).
    */
  def remapLabels(payload: Array[Byte], f: Long => Long): Array[Byte] = {
    val h = parseHeader(payload)
    val out = payload.clone()
    val b = buf(out)
    val idsOff = 36
    var i = 0
    while (i < h.idSize) {
      val off = idsOff + i * h.dataWidth
      writeLabel(b, off, h.dataWidth, f(readLabel(b, off, h.dataWidth)))
      i += 1
    }
    val locOff = idsOff + h.idSize * h.dataWidth + h.valueSize * 2
    var k = 0
    while (k < h.locationSize) {
      val off = locOff + 4 * k
      val c = b.getInt(off) & 0xffffffffL
      if (c >= 7) {
        val nv = f(c - 7) + 7
        require((nv >>> 32) == 0, s"remapped location label $nv overflows u32")
        b.putInt(off, nv.toInt)
      }
      k += 1
    }
    out
  }

  /** O(metadata) distinct-label set: every decoded voxel label comes either
    * from the component `ids` stream or from an explicit location code, so
    * unique(decode(x)) == unique(ids) ++ unique(explicit) exactly — no
    * voxel decode needed (reference compresso.labels(), chunks.py:388-389).
    */
  def labels(payload: Array[Byte]): Array[Long] = {
    val h = parseHeader(payload)
    val b = buf(payload)
    val set = new java.util.TreeSet[java.lang.Long]()
    var off = 36
    var i = 0
    while (i < h.idSize) { set.add(readLabel(b, off, h.dataWidth)); off += h.dataWidth; i += 1 }
    val locOff = 36 + h.idSize * h.dataWidth + h.valueSize * 2
    i = 0
    while (i < h.locationSize) {
      val c = b.getInt(locOff + 4 * i) & 0xffffffffL
      if (c >= 7) set.add(c - 7)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Codec-level contains() without decode (reference compresso remap/
    * CompressoArray pushdowns, chunks.py:411-412,441-484). */
  def contains(payload: Array[Byte], label: Long): Boolean =
    java.util.Arrays.binarySearch(labels(payload), label) >= 0

  /** Decode to voxel labels in F-order (index = x + sx*(y + sy*z)). */
  /** Decode-bomb ceiling: the header's u16 dims are untrusted bytes,
    * and sx*sy*sz drives the two output allocations — a corrupt header
    * can claim 30000³ voxels from a 40-byte payload (multi-GB alloc or
    * silent Int overflow), where real compresso chunks top out around
    * 512×512×64 = 2^24. Same concern as Brotli.decompress's maxOutput
    * and the draco count rails.
    */
  val MaxVoxels: Long = 1L << 25

  def decode(payload: Array[Byte]): (Vec3, Array[Long]) =
    try decodeImpl(payload)
    catch {
      case e: IndexOutOfBoundsException => // truncated stream: buffer reads
        throw new IllegalArgumentException(
          "truncated or corrupt compresso payload", e)
      case e: NegativeArraySizeException =>
        throw new IllegalArgumentException(
          "corrupt compresso payload (negative size field)", e)
    }

  private def decodeImpl(payload: Array[Byte]): (Vec3, Array[Long]) = {
    val h = parseHeader(payload)
    val b = buf(payload)
    val sx = h.sx; val sy = h.sy; val sz = h.sz
    require(sx.toLong * sy * sz <= MaxVoxels,
      s"compresso dims ${sx}x${sy}x$sz exceed the $MaxVoxels-voxel " +
        "decode ceiling")
    val nwx = sx / 4; val nwy = sy / 4
    val slice = sx * sy

    val idsOff = 36
    val valsOff = idsOff + h.idSize * h.dataWidth
    val locOff = valsOff + h.valueSize * 2
    val winOff = locOff + h.locationSize * 4

    // 1. boundary mask from RLE'd window tokens
    val boundary = new Array[Boolean](slice * sz)
    var wpos = 0L // window index over (z, wy, wx) with wx fastest
    val nWindows = nwx.toLong * nwy * sz
    var tok = winOff
    while (wpos < nWindows) {
      val t = b.getShort(tok) & 0xffff; tok += 2
      if ((t & 1) == 1) wpos += (t >> 1)
      else {
        val v = b.getShort(valsOff + 2 * (t >> 1)) & 0xffff
        if (v != 0) {
          val w = wpos.toInt
          val z = w / (nwx * nwy)
          val rem = w % (nwx * nwy)
          val wy = rem / nwx; val wx = rem % nwx
          val base = z * slice + (wy * 4) * sx + wx * 4
          var bit = 0
          while (bit < 16) {
            if (((v >> bit) & 1) != 0)
              boundary(base + (bit >> 2) * sx + (bit & 3)) = true
            bit += 1
          }
        }
        wpos += 1
      }
    }

    val out = new Array[Long](slice * sz)

    // 2. per-slice 4-connected components of the non-boundary voxels via
    //    run-based union-find; component labels consumed from `ids` in
    //    raster discovery order
    var idp = 0
    val parent = new ArrayBuffer[Int]()
    def find(a0: Int): Int = {
      var a = a0
      while (parent(a) != a) { parent(a) = parent(parent(a)); a = parent(a) }
      a
    }
    val runLab = new Array[Int](slice) // run id + 1 per voxel, 0 = boundary
    val prevRuns = new ArrayBuffer[(Int, Int, Int)]()
    val curRuns = new ArrayBuffer[(Int, Int, Int)]()
    var z = 0
    while (z < sz) {
      parent.clear()
      java.util.Arrays.fill(runLab, 0)
      prevRuns.clear()
      val zb = z * slice
      var y = 0
      while (y < sy) {
        curRuns.clear()
        var x = 0
        while (x < sx) {
          if (!boundary(zb + y * sx + x)) {
            val xs0 = x
            while (x < sx && !boundary(zb + y * sx + x)) x += 1
            val rid = parent.length
            parent += rid
            curRuns += ((xs0, x, rid))
            var xi = xs0
            while (xi < x) { runLab(y * sx + xi) = rid + 1; xi += 1 }
            var pi = 0
            while (pi < prevRuns.length) {
              val (pxs, pxe, prid) = prevRuns(pi)
              if (pxs < x && xs0 < pxe) {
                val ra = find(rid); val rb = find(prid)
                if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
              }
              pi += 1
            }
          } else x += 1
        }
        prevRuns.clear(); prevRuns ++= curRuns
        y += 1
      }
      // map run roots -> component labels in raster discovery order; the
      // union rule parent(max) = min makes each root the component's first
      // discovered run, so ascending rid order IS discovery order
      val rootLabel = new java.util.HashMap[Integer, java.lang.Long]()
      val runLabel = new Array[Long](parent.length)
      var rid = 0
      while (rid < parent.length) {
        val r = find(rid)
        var lab = rootLabel.get(r)
        if (lab == null) {
          lab = readLabel(b, idsOff + idp * h.dataWidth, h.dataWidth)
          idp += 1
          rootLabel.put(r, lab)
        }
        runLabel(rid) = lab
        rid += 1
      }
      var i = 0
      while (i < slice) {
        if (runLab(i) != 0) out(zb + i) = runLabel(runLab(i) - 1)
        i += 1
      }
      z += 1
    }
    require(idp == h.idSize, s"compresso ids stream: consumed $idp of ${h.idSize}")

    // 3. determinate boundary voxels (non-boundary north/west neighbor) +
    //    collection of indeterminate sites in forward raster order
    val indet = new ArrayBuffer[Int]()
    z = 0
    while (z < sz) {
      val zb = z * slice
      var y = 0
      while (y < sy) {
        var x = 0
        while (x < sx) {
          val i = zb + y * sx + x
          if (boundary(i)) {
            if (y > 0 && !boundary(i - sx)) out(i) = out(i - sx)
            else if (x > 0 && !boundary(i - 1)) out(i) = out(i - 1)
            else indet += i
          }
          x += 1
        }
        y += 1
      }
      z += 1
    }
    require(indet.length == h.locationSize,
      s"compresso locations: ${indet.length} indeterminate vs ${h.locationSize} entries")

    // 4. resolve indeterminates in reverse raster order (codes point east/south)
    var k = indet.length - 1
    while (k >= 0) {
      val i = indet(k)
      val c = b.getInt(locOff + 4 * k) & 0xffffffffL
      if (c >= 7) out(i) = c - 7
      else if (c == 1) out(i) = out(i + 1)
      else if (c == 3) out(i) = out(i + sx)
      else throw new IllegalArgumentException(s"compresso location code $c")
      k -= 1
    }
    (Vec3(sx, sy, sz), out)
  }

  /** Encode an F-order label volume; inverse of decode (self-roundtrip
    * tested; reference-byte parity is not asserted because the RLE token
    * choices are encoder-private). */
  def encode(vox: Array[Long], dims: Vec3, dataWidth: Int = 4): Array[Byte] = {
    val sx = dims.x.toInt; val sy = dims.y.toInt; val sz = dims.z.toInt
    require(sx % 4 == 0 && sy % 4 == 0, s"compresso encode needs 4|sx and 4|sy, got $dims")
    // the v1 streams this encoder writes are u32 (ids AND location
    // literals, which carry label + 7): a label past u32-7 would wrap
    // silently and decode as garbage — reject loudly instead (found by
    // CompressoPropertySpec: a wrapped literal decoded as location
    // code 2)
    require(dataWidth == 4, s"compresso encode supports dataWidth 4, got $dataWidth")
    var mi = 0
    while (mi < vox.length) {
      require(vox(mi) >= 0 && vox(mi) <= 0xFFFFFFFFL - 7,
        s"label ${vox(mi)} exceeds the u32-7 literal domain of compresso v1 dataWidth=4")
      mi += 1
    }
    val slice = sx * sy
    val nwx = sx / 4; val nwy = sy / 4
    val boundary = new Array[Boolean](slice * sz)
    var z = 0
    while (z < sz) {
      val zb = z * slice
      var y = 0
      while (y < sy) {
        var x = 0
        while (x < sx) {
          val i = zb + y * sx + x
          val v = vox(i)
          if ((x + 1 < sx && vox(i + 1) != v) || (y + 1 < sy && vox(i + sx) != v))
            boundary(i) = true
          x += 1
        }
        y += 1
      }
      z += 1
    }
    // windows
    val winVals = new Array[Int](nwx * nwy * sz)
    var w = 0
    z = 0
    while (z < sz) {
      var wy = 0
      while (wy < nwy) {
        var wx = 0
        while (wx < nwx) {
          val base = z * slice + wy * 4 * sx + wx * 4
          var v = 0; var bit = 0
          while (bit < 16) {
            if (boundary(base + (bit >> 2) * sx + (bit & 3))) v |= (1 << bit)
            bit += 1
          }
          winVals(w) = v; w += 1
          wx += 1
        }
        wy += 1
      }
      z += 1
    }
    val distinct = winVals.distinct.sorted
    val valIdx = distinct.zipWithIndex.toMap
    val tokens = new ArrayBuffer[Int]()
    var i = 0
    while (i < winVals.length) {
      if (winVals(i) == 0) {
        var run = 0
        while (i < winVals.length && winVals(i) == 0 && run < 0x7fff) { run += 1; i += 1 }
        tokens += ((run << 1) | 1)
      } else {
        tokens += (valIdx(winVals(i)) << 1)
        i += 1
      }
    }
    // per-slice CC ids + locations
    val ids = new ArrayBuffer[Long]()
    val locs = new ArrayBuffer[Long]()
    val compPerSlice = new Array[Int](sz)
    val locsPerSlice = new Array[Int](sz)
    z = 0
    while (z < sz) {
      val zb = z * slice
      val seen = new java.util.HashSet[Long]() // first-occurrence flat idx roots
      // raster scan: a non-boundary voxel whose west/north non-boundary
      // neighbors are unvisited components starts a new component — reuse
      // the decoder's run-based union-find for exactness
      val parent = new ArrayBuffer[Int]()
      val runStart = new ArrayBuffer[Int]() // flat in-slice index of run head
      def find(a0: Int): Int = {
        var a = a0
        while (parent(a) != a) { parent(a) = parent(parent(a)); a = parent(a) }
        a
      }
      val prevRuns = new ArrayBuffer[(Int, Int, Int)]()
      val curRuns = new ArrayBuffer[(Int, Int, Int)]()
      var y = 0
      while (y < sy) {
        curRuns.clear()
        var x = 0
        while (x < sx) {
          if (!boundary(zb + y * sx + x)) {
            val xs0 = x
            while (x < sx && !boundary(zb + y * sx + x)) x += 1
            val rid = parent.length
            parent += rid
            runStart += (y * sx + xs0)
            curRuns += ((xs0, x, rid))
            var pi = 0
            while (pi < prevRuns.length) {
              val (pxs, pxe, prid) = prevRuns(pi)
              if (pxs < x && xs0 < pxe) {
                val ra = find(rid); val rb = find(prid)
                if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
              }
              pi += 1
            }
          } else x += 1
        }
        prevRuns.clear(); prevRuns ++= curRuns
        y += 1
      }
      val emitted = new java.util.HashSet[Integer]()
      var rid = 0
      while (rid < parent.length) {
        val r = find(rid)
        if (!emitted.contains(r)) {
          emitted.add(r)
          // root = first discovered run of the component (union keeps the
          // min rid as root), so its head voxel carries the label
          ids += vox(zb + runStart(r))
          compPerSlice(z) += 1
        }
        rid += 1
      }
      // locations: forward raster over indeterminate voxels
      var yy = 0
      while (yy < sy) {
        var xx = 0
        while (xx < sx) {
          val li = zb + yy * sx + xx
          if (boundary(li) &&
              !(yy > 0 && !boundary(li - sx)) &&
              !(xx > 0 && !boundary(li - 1))) {
            val v = vox(li)
            val code =
              if (xx + 1 < sx && vox(li + 1) == v) 1L
              else if (yy + 1 < sy && vox(li + sx) == v) 3L
              else v + 7
            locs += code
            locsPerSlice(z) += 1
          }
          xx += 1
        }
        yy += 1
      }
      z += 1
    }
    val size = 36 + ids.length * dataWidth + distinct.length * 2 +
      locs.length * 4 + tokens.length * 2 + sz * 8
    val out = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    out.put('c'.toByte).put('p'.toByte).put('s'.toByte).put('o'.toByte)
    out.put(1.toByte).put(dataWidth.toByte)
    out.putShort(sx.toShort).putShort(sy.toShort).putShort(sz.toShort)
    out.put(4.toByte).put(4.toByte).put(1.toByte)
    out.putLong(ids.length.toLong).putInt(distinct.length).putLong(locs.length.toLong)
    out.put(4.toByte)
    ids.foreach { v =>
      dataWidth match {
        case 1 => out.put(v.toByte)
        case 2 => out.putShort(v.toShort)
        case 4 => out.putInt(v.toInt)
        case 8 => out.putLong(v)
      }
    }
    distinct.foreach(v => out.putShort(v.toShort))
    locs.foreach(v => out.putInt(v.toInt))
    tokens.foreach(t => out.putShort(t.toShort))
    compPerSlice.foreach(out.putInt)
    // per-slice location counts, shifted down one slice (trailer convention)
    out.putInt(0)
    var zi = 0
    while (zi < sz - 1) { out.putInt(locsPerSlice(zi)); zi += 1 }
    out.array()
  }
}
