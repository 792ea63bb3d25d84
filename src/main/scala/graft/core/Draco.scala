package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Draco bitstream v2.2 decoder for the subset the reference's committed
  * fixtures exercise (mesh.py:315-330 Mesh.from_draco; fixtures
  * test/test_cv/mesh_mip_2_draco_sv16): triangular mesh, edgebreaker
  * connectivity with the STANDARD traversal (rANS-coded start faces and
  * topology splits), one float32[3] POSITION attribute coded with the
  * sequential quantization decoder (difference or parallelogram
  * prediction, wrap transform).
  *
  * Re-derived from the public Draco bitstream specification; no draco
  * source was available in this environment. Orientation conventions
  * that the spec leaves ambiguous (R/L gluing side, split-edge side,
  * DFS right-corner definition and branch order) were locked by brute
  * force against the reference's own committed fixtures
  * (tools/draco_lock_conventions.py): three combos decode all 21
  * fragments with exact vertex/face counts and fully-exhausted buffers,
  * and — the end-to-end anchor — all three replay the reference's
  * chunk-boundary dedup (mesh.py:379-419) to exactly the 3 connected
  * components its own test asserts (test/test_graphene.py:490-501).
  * The residual ambiguity is connectivity-only: the gated family
  * produces IDENTICAL per-fragment vertex-position multisets (verified
  * by the tool), so positions and stitch components are unambiguous;
  * the committed combo is the family's unique minimal-median-edge-
  * length member, the tool's documented tie-break.
  *
  * Unsupported shapes (valence traversal, attribute seams, non-position
  * attributes, other prediction schemes) are rejected loudly.
  *
  * VALENCE TRAVERSAL SCOPE, decided loudly (same rigor as the Brotli
  * stored-mode note, core/Brotli.scala): the valence-coded edgebreaker
  * path (traversal byte 1, the default of several public encoders at
  * high compression levels) is deliberately NOT implemented, because it
  * is unverifiable in this environment:
  *  - every one of the reference's 21 committed fragments is STANDARD
  *    traversal (the convention-lock tool full-decodes all of them with
  *    the trav==0 parser), so there is no real valence fixture;
  *  - no draco library, binary, or python module exists in the
  *    container (no DracoPy, zero egress), so none can be generated;
  *  - the standard path's correctness rests on locking its four
  *    spec-ambiguous conventions against real fixtures; the valence
  *    path adds MORE unlockable state (per-valence-context symbol
  *    buffers plus incremental valence bookkeeping with per-symbol
  *    update rules) and would have zero real anchors — a from-memory
  *    implementation validated only against its own python inverse
  *    would be self-consistent, unverified code posing as coverage.
  * Real-world impact is bounded: the reference's own meshing pipeline
  * emits standard traversal (these fixtures are its output), and a
  * valence-coded file fails LOUDLY here with an actionable message.
  * One committed real valence fragment would unlock the path; until
  * then the rejection stands.
  */
object Draco {

  final case class Mesh(
    numVertices: Int,
    positions: Array[Double], // numVertices * 3, dequantized (nm)
    faces: Array[Int],        // numFaces * 3, indices into positions
    qBits: Int,
    qMin: Array[Double],
    qRange: Double)

  private val Invalid = -1
  private val TopC = 0; private val TopS = 1; private val TopL = 3
  private val TopR = 5; private val TopE = 7

  // ---------- primitive readers ----------

  private final class Buf(val d: Array[Byte], var p: Int) {
    def u8(): Int = { val v = d(p) & 0xff; p += 1; v }
    def i8(): Int = { val v = d(p).toInt; p += 1; v }
    def u16(): Int = { val v = (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8); p += 2; v }
    def i32(): Int = {
      val v = ByteBuffer.wrap(d, p, 4).order(ByteOrder.LITTLE_ENDIAN).getInt; p += 4; v
    }
    def f32(): Float = {
      val v = ByteBuffer.wrap(d, p, 4).order(ByteOrder.LITTLE_ENDIAN).getFloat; p += 4; v
    }
    def raw(n: Int): Array[Byte] = { val v = java.util.Arrays.copyOfRange(d, p, p + n); p += n; v }
    def varint(): Long = {
      var out = 0L; var shift = 0
      while (true) {
        val b = u8()
        out |= (b & 0x7f).toLong << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      out
    }
    def varintI(): Int = varint().toInt
    def remaining: Int = d.length - p
  }

  private final class Bits(d: Array[Byte], base: Int) {
    var off: Long = 0L
    def bit(): Int = {
      val b = d(base + (off >> 3).toInt) & 0xff
      val v = (b >> (off & 7).toInt) & 1
      off += 1
      v
    }
    def bits(n: Int): Int = {
      var out = 0; var i = 0
      while (i < n) { out |= bit() << i; i += 1 }
      out
    }
    def bytesConsumed: Int = ((off + 7) >> 3).toInt
  }

  /** Binary rANS decoder (prob_zero u8 + varint byte count + stream);
    * l_base = 4096, io_base = 256. */
  private final class RansBitDecoder(b: Buf) {
    private val probZero = b.u8()
    private val n = b.varintI()
    private val start = b.p
    private val buf = b.d
    b.p += n
    require(n >= 1, "empty rans bit stream")
    private var off = 0
    private var state = 0L
    locally {
      val last = buf(start + n - 1) & 0xff
      (last >> 6) match {
        case 0 => off = n - 1; state = last & 0x3f
        case 1 =>
          off = n - 2
          state = ((buf(start + n - 2) & 0xff) | (last << 8)) & 0x3fff
        case 2 =>
          off = n - 3
          state = ((buf(start + n - 3) & 0xff) | ((buf(start + n - 2) & 0xff) << 8) | (last << 16)) & 0x3fffff
        case _ => throw new IllegalArgumentException("bad rans bit init")
      }
      state += 4096
      require(state < 4096L * 256, "bad rans bit state")
    }
    def decodeBit(): Int = {
      val p = 256 - probZero
      if (state < 4096 && off > 0) {
        off -= 1
        state = state * 256 + (buf(start + off) & 0xff)
      }
      val x = state
      val quot = x / 256
      val rem = x % 256
      val xn = quot * p
      if (rem < p) { state = xn + rem; 1 }
      else { state = x - xn - p; 0 }
    }
  }

  /** Multi-symbol rANS decoder with explicit probability table;
    * precision = clamp(3L/2, 12, 20) bits. */
  private final class RansSymbolDecoder(b: Buf, uniqueSymbolsBitLength: Int) {
    private val precBits = math.max(12, math.min(20, (3 * uniqueSymbolsBitLength) / 2))
    private val precision = 1 << precBits
    private val lBase = precision.toLong * 4
    private val numSymbols = b.varintI()
    private val probs = new Array[Int](math.max(numSymbols, 1))
    locally {
      var i = 0
      while (i < numSymbols) {
        val pb = b.u8()
        val token = pb & 3
        if (token == 3) {
          val run = (pb >> 2) + 1
          require(i + run <= numSymbols, "prob zero-run overflow")
          i += run
        } else {
          var prob = pb >> 2
          var eb = 0
          while (eb < token) { prob |= b.u8() << (6 + 8 * eb); eb += 1 }
          probs(i) = prob
          i += 1
        }
      }
      if (numSymbols > 0)
        require(probs.take(numSymbols).map(_.toLong).sum == precision,
          s"prob table does not sum to $precision")
    }
    private val cum = new Array[Int](math.max(numSymbols, 1))
    private val lut = new Array[Int](precision)
    locally {
      var c = 0; var s = 0
      while (s < numSymbols) {
        cum(s) = c
        var j = 0
        while (j < probs(s)) { lut(c + j) = s; j += 1 }
        c += probs(s)
        s += 1
      }
    }
    private val n = b.varintI()
    private val start = b.p
    private val buf = b.d
    b.p += n
    require(n >= 1, "empty rans stream")
    private var off = 0
    private var state = 0L
    locally {
      val last = buf(start + n - 1) & 0xff
      (last >> 6) match {
        case 0 => off = n - 1; state = last & 0x3f
        case 1 =>
          off = n - 2
          state = ((buf(start + n - 2) & 0xff) | (last << 8)) & 0x3fff
        case 2 =>
          off = n - 3
          state = ((buf(start + n - 3) & 0xff) | ((buf(start + n - 2) & 0xff) << 8) | (last << 16)) & 0x3fffff
        case _ =>
          off = n - 4
          state = (((buf(start + n - 4) & 0xff).toLong) | ((buf(start + n - 3) & 0xff).toLong << 8) |
            ((buf(start + n - 2) & 0xff).toLong << 16) | (last.toLong << 24)) & 0x3fffffffL
      }
      state += lBase
      require(state < lBase * 256, "bad rans state")
    }
    def decode(): Int = {
      while (state < lBase && off > 0) {
        off -= 1
        state = state * 256 + (buf(start + off) & 0xff)
      }
      val quot = state / precision
      val rem = (state % precision).toInt
      val s = lut(rem)
      state = quot * probs(s) + rem - cum(s)
      s
    }
  }

  /** draco::DecodeSymbols — tagged (0) or raw (1) scheme. */
  private def decodeSymbols(b: Buf, numValues: Int, numComponents: Int): Array[Int] = {
    val out = new Array[Int](numValues)
    if (numValues == 0) return out
    b.u8() match {
      case 0 => // TAGGED: rANS-coded per-entry bit lengths + raw bits
        val tags = new RansSymbolDecoder(b, 5)
        val bits = new Bits(b.d, b.p)
        var pos = 0
        while (pos < numValues) {
          val blen = tags.decode()
          var c = 0
          while (c < numComponents) { out(pos) = bits.bits(blen); pos += 1; c += 1 }
        }
        b.p += bits.bytesConsumed
      case 1 => // RAW
        val maxBitLength = b.u8()
        val dec = new RansSymbolDecoder(b, maxBitLength)
        var i = 0
        while (i < numValues) { out(i) = dec.decode(); i += 1 }
      case other => throw new IllegalArgumentException(s"unknown symbol scheme $other")
    }
    out
  }

  private def zigzag(v: Int): Int = (v >>> 1) ^ -(v & 1)

  // ---------- edgebreaker topology ----------

  private final class EbMesh {
    val opp = new ArrayBuffer[Int]()
    val cvert = new ArrayBuffer[Int]()
    val parent = new ArrayBuffer[Int]()
    def addFace(): Int = {
      val c = opp.length
      var i = 0
      while (i < 3) { opp += Invalid; cvert += Invalid; i += 1 }
      c
    }
    def newVertex(): Int = { val v = parent.length; parent += v; v }
    def find(v0: Int): Int = {
      var v = v0
      while (parent(v) != v) { parent(v) = parent(parent(v)); v = parent(v) }
      v
    }
    def merge(keep: Int, kill: Int): Unit = parent(find(kill)) = find(keep)
    def vert(c: Int): Int = find(cvert(c))
    @inline def nxt(c: Int): Int = if (c % 3 == 2) c - 2 else c + 1
    @inline def prv(c: Int): Int = if (c % 3 == 0) c + 2 else c - 1
    def swingLeft(c: Int): Int = {
      val o = opp(nxt(c)); if (o == Invalid) Invalid else nxt(o)
    }
    def leftmost(c0: Int): Int = {
      var c = c0; var guard = opp.length + 3
      while (true) {
        val n = swingLeft(c)
        if (n == Invalid) return c
        if (n == c0) return c0
        c = n
        guard -= 1
        if (guard <= 0) throw new IllegalStateException("leftmost walk does not terminate")
      }
      c
    }
    def isBoundaryVertex(c0: Int): Boolean = {
      var c = c0; var guard = opp.length + 3
      while (true) {
        val n = swingLeft(c)
        if (n == Invalid) return true
        if (n == c0) return false
        c = n
        guard -= 1
        if (guard <= 0) throw new IllegalStateException("boundary walk does not terminate")
      }
      false
    }
    def setOpp(a: Int, bb: Int): Unit = { opp(a) = bb; opp(bb) = a }
  }

  /** Replay the edgebreaker symbol stream (decoded in reverse encoding
    * order). Locked conventions: R glues the active corner to the new
    * face's corner+2 (L mirrors with +1); a RIGHT split edge saves
    * Next(stack top); a saved split corner is pushed before the S pop so
    * it becomes corner_a. Returns the per-symbol processed corners
    * (attribute traversal seeds, in forward processed order). */
  private def decodeConnectivity(
      mesh: EbMesh, bits: Bits, startFaces: RansBitDecoder,
      numSymbols: Int, splitBySource: Map[Int, List[(Int, Int)]]): Array[Int] = {
    val stack = new ArrayBuffer[Int]()
    val splitCorners = scala.collection.mutable.Map[Int, Int]()
    val processed = new ArrayBuffer[Int]()
    val vcorner = scala.collection.mutable.Map[Int, Int]() // vertex -> live corner
    def track(c: Int): Unit = vcorner(mesh.vert(c)) = c

    var sid = 0
    while (sid < numSymbols) {
      val sym = if (bits.bit() == 0) TopC else 1 | (bits.bits(2) << 1)
      val corner = mesh.addFace()
      sym match {
        case TopC =>
          require(stack.nonEmpty, "C on empty stack")
          val ca = stack.last
          val vx = mesh.vert(mesh.nxt(ca))
          val lmc = mesh.leftmost(vcorner(vx))
          require(mesh.vert(lmc) == vx, "stale vertex corner")
          val cb = mesh.nxt(lmc)
          require(ca != cb, "degenerate C")
          mesh.setOpp(ca, corner + 1)
          mesh.setOpp(cb, corner + 2)
          mesh.cvert(corner) = vx
          mesh.cvert(corner + 1) = mesh.vert(mesh.prv(lmc))
          mesh.cvert(corner + 2) = mesh.vert(mesh.prv(ca))
          track(corner); track(corner + 1); track(corner + 2)
          stack(stack.length - 1) = corner
        case TopR | TopL =>
          require(stack.nonEmpty, "R/L on empty stack")
          val ca = stack.last
          val plus = if (sym == TopR) 2 else 1
          mesh.setOpp(ca, corner + plus)
          val nv = mesh.newVertex()
          if (plus == 2) { // shared edge = (corner, corner+1)
            mesh.cvert(corner) = mesh.vert(mesh.prv(ca))
            mesh.cvert(corner + 1) = mesh.vert(mesh.nxt(ca))
            mesh.cvert(corner + 2) = nv
          } else {         // shared edge = (corner+2, corner)
            mesh.cvert(corner) = mesh.vert(mesh.nxt(ca))
            mesh.cvert(corner + 2) = mesh.vert(mesh.prv(ca))
            mesh.cvert(corner + 1) = nv
          }
          track(corner); track(corner + 1); track(corner + 2)
          stack(stack.length - 1) = corner
        case TopS =>
          require(stack.nonEmpty, "S on empty stack")
          val cb = stack.remove(stack.length - 1)
          splitCorners.remove(sid).foreach(stack += _)
          require(stack.nonEmpty, "S without second corner")
          val ca = stack.last
          mesh.setOpp(ca, corner + 2)
          mesh.setOpp(cb, corner + 1)
          val vp = mesh.vert(mesh.prv(ca))
          val vn = mesh.vert(mesh.nxt(cb))
          if (vp != vn) mesh.merge(vp, vn)
          mesh.cvert(corner) = mesh.find(vp)
          mesh.cvert(corner + 1) = mesh.vert(mesh.nxt(ca))
          mesh.cvert(corner + 2) = mesh.vert(mesh.prv(cb))
          track(corner); track(corner + 1); track(corner + 2)
          stack(stack.length - 1) = corner
        case TopE =>
          mesh.cvert(corner) = mesh.newVertex()
          mesh.cvert(corner + 1) = mesh.newVertex()
          mesh.cvert(corner + 2) = mesh.newVertex()
          track(corner); track(corner + 1); track(corner + 2)
          stack += corner
        case other => throw new IllegalArgumentException(s"bad symbol $other")
      }
      processed += corner
      splitBySource.get(sid).foreach { evs =>
        evs.foreach { case (splitId, edge) =>
          val top = stack.last
          val saved = if (edge == 1) mesh.nxt(top) else mesh.prv(top)
          splitCorners(splitId) = saved
        }
      }
      sid += 1
    }
    // start faces: one config bit per remaining active corner; interior
    // config fills the triangular hole with one new face (no new verts)
    while (stack.nonEmpty) {
      val ca = stack.remove(stack.length - 1)
      val interior = startFaces.decodeBit() == 1
      if (interior) {
        val corner = mesh.addFace()
        var guard = mesh.opp.length + 3
        var cb = mesh.prv(ca)
        while (mesh.opp(cb) != Invalid) {
          cb = mesh.prv(mesh.opp(cb)); guard -= 1
          require(guard > 0, "hole walk does not terminate")
        }
        var cc = mesh.nxt(ca)
        while (mesh.opp(cc) != Invalid) {
          cc = mesh.nxt(mesh.opp(cc)); guard -= 1
          require(guard > 0, "hole walk does not terminate")
        }
        mesh.setOpp(corner, ca)
        mesh.setOpp(corner + 1, cb)
        mesh.setOpp(corner + 2, cc)
        mesh.cvert(corner + 1) = mesh.vert(mesh.nxt(ca))
        mesh.cvert(corner + 2) = mesh.vert(mesh.prv(ca))
        mesh.cvert(corner) = mesh.vert(mesh.nxt(cb))
        require(mesh.vert(mesh.prv(cc)) == mesh.vert(corner),
          "interior start face hole is not a triangle")
        processed += corner
      }
    }
    processed.toArray
  }

  /** Depth-first attribute traversal (locked: right corner =
    * Opposite(Previous), right branch first, seeds in forward processed
    * order). Returns (dataIndex -> vertex, dataIndex -> visit corner). */
  private def dfsOrder(mesh: EbMesh, seeds: Array[Int]): (Array[Int], Array[Int]) = {
    val nf = mesh.opp.length / 3
    val faceVisited = new Array[Boolean](nf)
    val vertToData = scala.collection.mutable.Map[Int, Int]()
    val order = new ArrayBuffer[Int]()
    val corners = new ArrayBuffer[Int]()
    def visit(v: Int, c: Int): Unit =
      if (!vertToData.contains(v)) { vertToData(v) = order.length; order += v; corners += c }
    @inline def right(c: Int): Int = mesh.opp(mesh.prv(c))
    @inline def left(c: Int): Int = mesh.opp(mesh.nxt(c))

    seeds.foreach { start =>
      if (!faceVisited(start / 3)) {
        val stack = new ArrayBuffer[Int]()
        stack += start
        visit(mesh.vert(mesh.nxt(start)), mesh.nxt(start))
        visit(mesh.vert(mesh.prv(start)), mesh.prv(start))
        while (stack.nonEmpty) {
          var c = stack.last
          var f = c / 3
          if (faceVisited(f)) stack.remove(stack.length - 1)
          else {
            var break = false
            while (!break) {
              faceVisited(f) = true
              val v = mesh.vert(c)
              var continued = false
              if (!vertToData.contains(v)) {
                val onBoundary = mesh.isBoundaryVertex(c)
                visit(v, c)
                if (!onBoundary) {
                  c = right(c); f = c / 3
                  continued = true
                }
              }
              if (!continued) {
                val rc = right(c); val lc = left(c)
                val rDone = rc == Invalid || faceVisited(rc / 3)
                val lDone = lc == Invalid || faceVisited(lc / 3)
                if (rDone && lDone) { stack.remove(stack.length - 1); break = true }
                else if (rDone) { c = lc; f = c / 3 }
                else if (lDone) { c = rc; f = c / 3 }
                else {
                  stack(stack.length - 1) = lc
                  stack += rc
                  c = rc; f = c / 3
                }
              }
            }
          }
        }
      }
    }
    (order.toArray, corners.toArray)
  }

  // ---------- top level ----------

  def decode(data: Array[Byte]): Mesh =
    // hostile-input contract: every failure mode surfaces as
    // IllegalArgumentException (the declared error type the chunk/mesh
    // readers catch) — a truncated buffer otherwise escapes as the
    // JVM's bounds check from the hot byte-reader paths
    try decodeImpl(data)
    catch {
      case e: IndexOutOfBoundsException => // array reads + ByteBuffer.wrap
        throw new IllegalArgumentException(
          "truncated or corrupt draco stream", e)
      case e: NegativeArraySizeException =>
        throw new IllegalArgumentException(
          "corrupt draco stream (negative size field)", e)
      case e: IllegalStateException =>
        // the walk-termination guards: a corrupt stream can encode
        // inconsistent connectivity whose boundary walks never close
        throw new IllegalArgumentException(
          "corrupt draco stream (inconsistent connectivity)", e)
    }

  private def decodeImpl(data: Array[Byte]): Mesh = {
    val b = new Buf(data, 0)
    require(new String(b.raw(5), "ASCII") == "DRACO", "not a draco stream")
    val major = b.u8(); val minor = b.u8()
    require(major == 2 && minor == 2, s"unsupported draco bitstream $major.$minor")
    val encType = b.u8(); val method = b.u8()
    require(encType == 1 && method == 1, "only edgebreaker triangular mesh supported")
    val flags = b.u16()
    if ((flags & 0x8000) != 0) {
      require(b.varint() == 0, "attribute metadata unsupported")
      val n = b.varintI()
      var i = 0
      while (i < n) { b.raw(b.u8()); b.raw(b.u8()); i += 1 } // file metadata (unused)
      require(b.varint() == 0, "sub metadata unsupported")
    }
    val trav = b.u8()
    require(trav == 0, s"only standard edgebreaker traversal supported, got $trav")
    // decode-bomb rail (same concern as Brotli.decompress's maxOutput):
    // the count varints drive array allocations, and a corrupt stream
    // can claim 2^31 faces from a few hundred bytes — an executor OOM,
    // not an error row. The per-byte bound is generous (256 elements
    // per input byte — real fragments carry 1-3 BYTES per vertex of
    // quantized position data) with a 2^26 absolute ceiling; every
    // committed real fragment sits orders of magnitude below both.
    val bombCap: Long =
      math.min(1L << 26, math.max(1024L, 256L * data.length))
    def capped(name: String): Int = {
      val v = b.varintI()
      require(v >= 0 && v <= bombCap,
        s"draco $name $v exceeds the ${bombCap}-element decode ceiling " +
          s"for a ${data.length}-byte stream")
      v
    }
    val numVertices = capped("vertex count")
    val numFaces = capped("face count")
    require(b.u8() == 0, "attribute seams unsupported")
    val numSymbols = capped("symbol count")
    b.varint() // num encoded split symbols (informational)
    // topology split events, inline before the traversal data
    val numSplits = capped("split count")
    var splitBySource = Map.empty[Int, List[(Int, Int)]]
    if (numSplits > 0) {
      val raw = new Array[(Int, Int)](numSplits)
      var last = 0
      var i = 0
      while (i < numSplits) {
        val src = b.varintI() + last
        val split = src - b.varintI()
        raw(i) = (src, split)
        last = src
        i += 1
      }
      val ebits = new Bits(b.d, b.p)
      i = 0
      while (i < numSplits) {
        val edge = ebits.bit()
        val (src, split) = raw(i)
        val dsource = numSymbols - src - 1
        val dsplit = numSymbols - split - 1
        splitBySource = splitBySource.updated(dsource,
          (dsplit, edge) :: splitBySource.getOrElse(dsource, Nil))
        i += 1
      }
      b.p += ebits.bytesConsumed
    }
    val symBytes = b.varintI()
    val bits = new Bits(b.d, b.p)
    b.p += symBytes
    val startFaces = new RansBitDecoder(b)
    val mesh = new EbMesh
    val seeds = decodeConnectivity(mesh, bits, startFaces, numSymbols, splitBySource)
    val nfActual = mesh.opp.length / 3
    require(nfActual == numFaces, s"face count $nfActual != $numFaces")
    // ---- attribute section ----
    require(b.u8() == 1, "expected exactly 1 attributes decoder")
    b.i8() // att_data_id (-1 for position)
    require(b.u8() == 0, "only MESH_VERTEX_ATTRIBUTE supported")
    require(b.u8() == 0, "only depth-first traversal supported")
    require(b.varint() == 1, "expected single attribute")
    val attType = b.u8(); val dataType = b.u8(); val nComp = b.u8(); b.u8()
    b.varint() // unique id
    require(attType == 0 && dataType == 9 && nComp == 3,
      s"expected float32[3] POSITION, got $attType/$dataType/$nComp")
    require(b.u8() == 2, "expected sequential quantization decoder")
    val predMethod = b.i8()
    require(predMethod == 0 || predMethod == 1,
      s"unsupported prediction method $predMethod")
    require(b.i8() == 1, "expected wrap prediction transform")
    val compressed = b.u8()
    val nVals = numVertices * 3
    val syms =
      if (compressed > 0) decodeSymbols(b, nVals, 3)
      else {
        val nBytes = b.u8()
        val out = new Array[Int](nVals)
        var i = 0
        while (i < nVals) {
          var v = 0L; var k = 0
          while (k < nBytes) { v |= (b.u8().toLong << (8 * k)); k += 1 }
          out(i) = v.toInt
          i += 1
        }
        out
      }
    val wrapMin = b.i32(); val wrapMax = b.i32()
    val dif = wrapMax.toLong - wrapMin + 1
    val (order, visitCorners) = dfsOrder(mesh, seeds)
    require(order.length == numVertices,
      s"traversal visited ${order.length} != $numVertices")
    val vals = new Array[Int](nVals)
    @inline def clamp(x: Long): Long =
      if (x < wrapMin) wrapMin else if (x > wrapMax) wrapMax else x
    def wrapApply(p0: Long, p1: Long, p2: Long, idx: Int): Unit = {
      val preds = Array(p0, p1, p2)
      var c = 0
      while (c < 3) {
        var v = clamp(preds(c)) + zigzag(syms(idx * 3 + c))
        if (v > wrapMax) v -= dif else if (v < wrapMin) v += dif
        vals(idx * 3 + c) = v.toInt
        c += 1
      }
    }
    val vertToData = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < order.length) { vertToData.put(order(i), i); i += 1 }
    wrapApply(0, 0, 0, 0)
    var p = 1
    while (p < numVertices) {
      var done = false
      if (predMethod == 1) { // parallelogram off the opposite face
        val ci = visitCorners(p)
        val oc = mesh.opp(ci)
        if (oc != Invalid) {
          val vo = vertToData.getOrDefault(mesh.vert(oc), Int.MaxValue)
          val vn = vertToData.getOrDefault(mesh.vert(mesh.nxt(oc)), Int.MaxValue)
          val vp = vertToData.getOrDefault(mesh.vert(mesh.prv(oc)), Int.MaxValue)
          if (vo < p && vn < p && vp < p) {
            wrapApply(
              vals(vn * 3).toLong + vals(vp * 3) - vals(vo * 3),
              vals(vn * 3 + 1).toLong + vals(vp * 3 + 1) - vals(vo * 3 + 1),
              vals(vn * 3 + 2).toLong + vals(vp * 3 + 2) - vals(vo * 3 + 2), p)
            done = true
          }
        }
      }
      if (!done)
        wrapApply(vals((p - 1) * 3), vals((p - 1) * 3 + 1), vals((p - 1) * 3 + 2), p)
      p += 1
    }
    val qMin = Array(b.f32().toDouble, b.f32().toDouble, b.f32().toDouble)
    val qRange = b.f32().toDouble
    val qBits = b.u8()
    require(b.remaining == 0, s"buffer not exhausted: ${b.remaining} bytes left")
    val scale = qRange / ((1 << qBits) - 1)
    val positions = new Array[Double](nVals)
    i = 0
    while (i < numVertices) {
      positions(i * 3) = qMin(0) + vals(i * 3) * scale
      positions(i * 3 + 1) = qMin(1) + vals(i * 3 + 1) * scale
      positions(i * 3 + 2) = qMin(2) + vals(i * 3 + 2) * scale
      i += 1
    }
    val faces = new Array[Int](nfActual * 3)
    var f = 0
    while (f < nfActual) {
      var k = 0
      while (k < 3) {
        faces(f * 3 + k) = vertToData.get(mesh.vert(3 * f + k))
        k += 1
      }
      f += 1
    }
    Mesh(numVertices, positions, faces, qBits, qMin, qRange)
  }
}
