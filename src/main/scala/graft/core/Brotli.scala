package graft.core

import java.io.ByteArrayOutputStream

/** RFC 7932 (brotli) second-stage codec — the `br` content encoding the
  * reference lists beside gzip/zstd (datasource/precomputed/common.py:18-29).
  *
  * decompress() implements the FULL RFC 7932 decoder: stream header,
  * uncompressed and entropy-coded meta-blocks (simple + complex prefix
  * codes, block switching in all three categories, literal/distance
  * context maps with RLE + inverse-MTF, the NPOSTFIX/NDIRECT distance
  * scheme with the 4-slot distance ring buffer, and static-dictionary
  * references with all 121 word transforms).  Metadata skip-blocks and
  * the large-window extension marker are handled per the RFC (skip /
  * reject respectively).
  *
  * The three static tables the format needs — the 122,784-byte
  * dictionary (RFC 7932 Appendix A, published only as a binary
  * appendix), the 121-row transform table (Appendix B), and the 2 KiB
  * literal-context lookup table (§7.1) — are loaded from classpath
  * resources under graft/brotli/.  They were extracted from the
  * system's public libbrotli 1.0.9 through its public C API
  * (BrotliGetDictionary / BrotliTransformDictionaryWord /
  * _kBrotliContextLookupTable; see tools/brotli_extract_tables.py,
  * which re-derives and invariant-checks them) — the same data any
  * brotli implementation ships; extraction just avoids hand-typing
  * 125 KB of RFC appendix.  MIT-licensed public content.
  *
  * Correctness evidence: byte-for-byte parity with the reference C
  * encoder/decoder on 90 committed stream pairs spanning qualities
  * 0/1/2/4/5/9/11, window sizes 10/18/22/24, generic/text/font modes,
  * forced NPOSTFIX 1-3 / NDIRECT up to 120 (tools/brotli_npostfix_gen.py),
  * and text / dictionary-heavy / UTF-8 / binary-segmentation / random
  * payloads (src/test/resources/golden/brotli_streams, generated and
  * C-round-trip-verified by the same tool), plus 180 golden transform
  * outputs on real dictionary words.
  *
  * compress() is a conforming ENTROPY encoder ("quality 2"-class:
  * greedy hash-chain LZ77 over a 4 MiB window, dynamic prefix codes,
  * single block types, NPOSTFIX=NDIRECT=0). Every emitted stream is
  * self-verified (decoded and compared before return) and falls back
  * to the stored-mode writer (compressStored) when entropy coding does
  * not win; tools/brotli_encoder_check.py cross-checks the encoder's
  * output against the reference C DECODER on text / binary / random /
  * real-chunk payloads.
  */
object Brotli {

  // ------------------------------------------------------------------
  // Static tables (classpath resources, see tools/brotli_extract_tables.py)
  // ------------------------------------------------------------------

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
    require(in != null, s"missing classpath resource graft/brotli/$name")
    try in.readAllBytes() finally in.close()
  }

  /** RFC 7932 Appendix A: 122,784 bytes; words of length 4..24. */
  private lazy val dictionary: Array[Byte] = {
    val d = resource("brotli_dictionary.bin")
    require(d.length == 122784, s"bad dictionary size ${d.length}")
    d
  }

  /** log2(number of words) for each word length 4..24 (RFC App. A). */
  private val DictSizeBits: Array[Int] =
    Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)

  private lazy val dictOffsets: Array[Int] = {
    val off = new Array[Int](26)
    var i = 4
    while (i <= 24) { off(i + 1) = off(i) + (i << DictSizeBits(i)); i += 1 }
    require(off(25) == 122784)
    off
  }

  /** §7.1 context lookup: 4 modes x (LUT0 | LUT1) x 256. */
  private lazy val contextLut: Array[Byte] = {
    val t = resource("brotli_context_lut.bin")
    require(t.length == 2048, s"bad context LUT size ${t.length}")
    // spot-check the LSB6 block so a wrong resource fails fast
    var b = 0
    while (b < 256) {
      require((t(b) & 0xff) == (b & 0x3f) && t(256 + b) == 0, "context LUT sanity")
      b += 1
    }
    t
  }

  /** Appendix B transform ops. */
  private final val OpIdentity = 0
  private final val OpFermentFirst = 10 // UppercaseFirst
  private final val OpFermentAll = 11   // UppercaseAll
  // OmitFirst1..9 encoded as 20+n, OmitLast1..9 as 30+n

  private final case class Transform(prefix: Array[Byte], op: Int, suffix: Array[Byte])

  private lazy val transforms: Array[Transform] = {
    val txt = new String(resource("brotli_transforms.tsv"), "ISO-8859-1")
    def unesc(s: String): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 3 < s.length && s.charAt(i + 1) == 'x') {
          out.write(Integer.parseInt(s.substring(i + 2, i + 4), 16)); i += 4
        } else { out.write(s.charAt(i).toInt); i += 1 }
      }
      out.toByteArray
    }
    val rows = txt.split("\n", -1).filter(_.nonEmpty).map { line =>
      val Array(p, op, s) = line.split("\t", -1)
      val opCode = op match {
        case "Identity"     => OpIdentity
        case "FermentFirst" => OpFermentFirst
        case "FermentAll"   => OpFermentAll
        case o if o.startsWith("OmitFirst") => 20 + o.substring(9).toInt
        case o if o.startsWith("OmitLast")  => 30 + o.substring(8).toInt
        case o => throw new IllegalArgumentException(s"bad transform op $o")
      }
      Transform(unesc(p), opCode, unesc(s))
    }
    require(rows.length == 121, s"expected 121 transforms, got ${rows.length}")
    rows
  }

  /** §8 "ferment" (uppercase) step — UTF-8 aware, operating in place.
    * Returns the number of bytes consumed at position `p`. */
  private def ferment(w: Array[Byte], p: Int): Int = {
    val b = w(p) & 0xff
    if (b < 192) { if (b >= 'a' && b <= 'z') w(p) = (b ^ 32).toByte; 1 }
    else if (b < 224) { if (p + 1 < w.length) w(p + 1) = (w(p + 1) ^ 32).toByte; 2 }
    else { if (p + 2 < w.length) w(p + 2) = (w(p + 2) ^ 5).toByte; 3 }
  }

  /** Apply transform `tid` to the dictionary word at (offset, len);
    * returns the transformed bytes (RFC 7932 §8). */
  private[core] def transformWord(wordOff: Int, len: Int, tid: Int): Array[Byte] = {
    val t = transforms(tid)
    var start = wordOff
    var n = len
    t.op match {
      case op if op >= 30 => n = math.max(0, n - (op - 30))            // OmitLast
      case op if op >= 20 => val k = math.min(op - 20, n); start += k; n -= k // OmitFirst
      case _ =>
    }
    val core = java.util.Arrays.copyOfRange(dictionary, start, start + n)
    if (t.op == OpFermentFirst) { if (n > 0) ferment(core, 0) }
    else if (t.op == OpFermentAll) {
      var p = 0
      while (p < n) p += ferment(core, p)
    }
    val out = new Array[Byte](t.prefix.length + n + t.suffix.length)
    System.arraycopy(t.prefix, 0, out, 0, t.prefix.length)
    System.arraycopy(core, 0, out, t.prefix.length, n)
    System.arraycopy(t.suffix, 0, out, t.prefix.length + n, t.suffix.length)
    out
  }

  /** Test hook: transform word #widx of length `len` with transform `tid`. */
  private[graft] def transformDictWord(len: Int, widx: Int, tid: Int): Array[Byte] =
    transformWord(dictOffsets(len) + widx * len, len, tid)

  // ------------------------------------------------------------------
  // Bit reader (LSB-first within bytes; prefix-code bits MSB-first)
  // ------------------------------------------------------------------

  private final class BitReader(d: Array[Byte]) {
    private val limit: Long = d.length.toLong * 8
    private var consumed = 0L // bits consumed so far (authoritative position)
    private var acc = 0L      // next unconsumed bits, LSB-first
    private var nbits = 0     // valid bits in acc
    private var bytePos = 0   // next byte to load (runs past end as zero pad)

    /** Peek up to 24 bits, zero-padded past end of stream. */
    def peek(n: Int): Int = {
      while (nbits < n) {
        if (bytePos < d.length) acc |= (d(bytePos) & 0xffL) << nbits
        bytePos += 1
        nbits += 8
      }
      (acc & ((1L << n) - 1)).toInt
    }
    def skip(n: Int): Unit = {
      if (nbits < n) peek(n)
      acc >>>= n
      nbits -= n
      consumed += n
      if (consumed > limit)
        throw new IllegalArgumentException("truncated brotli stream")
    }
    def bits(n: Int): Int = { val v = peek(n); skip(n); v }
    def bit(): Int = bits(1)
    def alignToByte(): Unit = skip(((8 - (consumed & 7)) & 7).toInt)
    def readBytes(n: Int): Array[Byte] = {
      require((consumed & 7) == 0, "not byte-aligned")
      val start = (consumed >> 3).toInt
      if (start + n > d.length)
        throw new IllegalArgumentException("truncated brotli stream")
      consumed += n.toLong * 8
      acc = 0L; nbits = 0; bytePos = start + n // resync the accumulator
      java.util.Arrays.copyOfRange(d, start, start + n)
    }
  }

  // ------------------------------------------------------------------
  // Prefix codes (§3): flat-table canonical decode
  // ------------------------------------------------------------------

  /** Decoding table: entry = (symbol << 5) | codeLength; index = next
    * `maxLen` stream bits (LSB-first order, i.e. bit-reversed canonical
    * codes).  maxLen == 0 means a degenerate single-symbol code that
    * consumes no bits. */
  private final class Huff(table: Array[Int], maxLen: Int) {
    def decode(r: BitReader): Int = {
      if (maxLen == 0) return table(0) >>> 5
      val e = table(r.peek(maxLen))
      val len = e & 31
      if (len == 0) throw new IllegalArgumentException("invalid prefix code word")
      r.skip(len)
      e >>> 5
    }
  }

  private def singleSymbol(sym: Int): Huff = new Huff(Array(sym << 5), 0)

  /** Canonical code from per-symbol lengths (0 = absent), complete-tree
    * checked.  Same-length symbols get codes in increasing symbol order. */
  private def fromLengths(lens: Array[Int]): Huff = {
    var maxLen = 0
    var nz = 0
    var lastSym = 0
    var i = 0
    while (i < lens.length) {
      if (lens(i) > 0) { nz += 1; lastSym = i; if (lens(i) > maxLen) maxLen = lens(i) }
      i += 1
    }
    if (nz == 1) return singleSymbol(lastSym)
    require(maxLen <= 15, "prefix code length > 15")
    val blCount = new Array[Int](16)
    i = 0
    while (i < lens.length) { if (lens(i) > 0) blCount(lens(i)) += 1; i += 1 }
    var total = 0L
    var l = 1
    while (l <= maxLen) { total += blCount(l).toLong << (maxLen - l); l += 1 }
    if (total != (1L << maxLen))
      throw new IllegalArgumentException("prefix code is not a complete tree")
    val nextCode = new Array[Int](16)
    var code = 0
    l = 1
    while (l <= maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code; l += 1 }
    val table = new Array[Int](1 << maxLen)
    var sym = 0
    while (sym < lens.length) {
      val len = lens(sym)
      if (len > 0) {
        val c = nextCode(len); nextCode(len) += 1
        var rev = 0
        var b = 0
        while (b < len) { rev = (rev << 1) | ((c >> b) & 1); b += 1 }
        var idx = rev
        val step = 1 << len
        while (idx < table.length) { table(idx) = (sym << 5) | len; idx += step }
      }
      sym += 1
    }
    new Huff(table, maxLen)
  }

  /** 4-bit peek table for the fixed code over code-length code lengths
    * (§3.5): canonical code for lengths {0:2, 1:4, 2:3, 3:2, 4:2, 5:4}. */
  private val ClLen = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClVal = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)

  /** §3.5 order in which code-length-code lengths are transmitted. */
  private val ClOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def log2ceil(n: Int): Int = 32 - Integer.numberOfLeadingZeros(n - 1)

  /** Read one prefix code over `alphabetSize` symbols (§3.4/§3.5). */
  private def readPrefixCode(r: BitReader, alphabetSize: Int): Huff = {
    val hskip = r.bits(2)
    if (hskip == 1) {
      // simple code: 1..4 symbols listed explicitly
      val nsym = r.bits(2) + 1
      val alphaBits = log2ceil(alphabetSize)
      val syms = Array.fill(nsym)(r.bits(alphaBits))
      syms.foreach(s => require(s < alphabetSize, "simple-code symbol out of range"))
      require(syms.distinct.length == nsym, "duplicate simple-code symbol")
      val lens = new Array[Int](alphabetSize)
      nsym match {
        case 1 => return singleSymbol(syms(0))
        case 2 => lens(syms(0)) = 1; lens(syms(1)) = 1
        case 3 => lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 2
        case 4 =>
          if (r.bit() == 1) { // tree-select: lengths 1,2,3,3
            lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 3; lens(syms(3)) = 3
          } else syms.foreach(s => lens(s) = 2)
      }
      fromLengths(lens)
    } else {
      // complex code: code-length code first
      val clLens = new Array[Int](18)
      var space = 0
      var numCodes = 0
      var i = hskip
      while (i < 18 && space < 32) {
        val p = r.peek(4)
        val len = ClLen(p)
        r.skip(len)
        val v = ClVal(p)
        clLens(ClOrder(i)) = v
        if (v != 0) { space += 32 >> v; numCodes += 1 }
        i += 1
      }
      require(numCodes == 1 || space == 32, "invalid code-length code")
      val clHuff = fromLengths(clLens)
      // symbol lengths with repeat codes 16 (prev non-zero, 2 extra) and
      // 17 (zero, 3 extra); consecutive same-repeat accumulation per §3.5
      val lens = new Array[Int](alphabetSize)
      var sym = 0
      var prevLen = 8
      var repeat = 0
      var repeatLen = 0
      var space2 = 32768
      while (sym < alphabetSize && space2 > 0) {
        val cl = clHuff.decode(r)
        if (cl < 16) {
          lens(sym) = cl
          sym += 1
          repeat = 0
          if (cl != 0) { prevLen = cl; space2 -= 32768 >> cl }
        } else {
          val extraBits = if (cl == 16) 2 else 3
          val newLen = if (cl == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val old = repeat
          if (repeat > 0) { repeat -= 2; repeat <<= extraBits }
          repeat += r.bits(extraBits) + 3
          val delta = repeat - old
          require(sym + delta <= alphabetSize, "repeat past end of alphabet")
          java.util.Arrays.fill(lens, sym, sym + delta, repeatLen)
          sym += delta
          if (repeatLen != 0) space2 -= delta * (32768 >> repeatLen)
        }
      }
      require(space2 == 0, "code lengths do not form a complete tree")
      fromLengths(lens)
    }
  }

  // ------------------------------------------------------------------
  // Meta-block header pieces
  // ------------------------------------------------------------------

  /** §9.1 WBITS (large-window marker '1 0000 001' rejected). */
  private def readWbits(r: BitReader): Int = {
    if (r.bit() == 0) 16
    else {
      val n = r.bits(3)
      if (n != 0) 17 + n
      else {
        val m = r.bits(3)
        if (m == 0) 17
        else if (m == 1)
          throw new IllegalArgumentException(
            "large-window brotli (non-RFC extension) is not supported")
        else 8 + m
      }
    }
  }

  /** §6 variable-length count in 1..256 (NBLTYPES / NTREES). */
  private def readVarCount(r: BitReader): Int = {
    if (r.bit() == 0) 1
    else { val n = r.bits(3); (1 << n) + r.bits(n) + 1 }
  }

  /** §6 block-count code: 26 symbols of (offset, extra-bits). */
  private val BlenOffset = Array(
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209,
    241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  private val BlenBits = Array(
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  private def readBlockLen(r: BitReader, huff: Huff): Int = {
    val s = huff.decode(r)
    BlenOffset(s) + r.bits(BlenBits(s))
  }

  /** §5 insert-length code: (offset, extra-bits) x 24. */
  private val InsOffset = Array(
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
    322, 578, 1090, 2114, 6210, 22594)
  private val InsBits = Array(
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)

  /** §5 copy-length code: (offset, extra-bits) x 24. */
  private val CopyOffset = Array(
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
    134, 198, 326, 582, 1094, 2118)
  private val CopyBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)

  /** §5: the 704-symbol insert-and-copy code's cell decomposition. */
  private val CellInsBase = Array(0, 0, 0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CellCopyBase = Array(0, 8, 0, 8, 0, 8, 16, 0, 16, 8, 16)

  /** §4 short distance codes relative to the ring buffer. */
  private val ShortIdx = Array(3, 2, 1, 0, 3, 3, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2)
  private val ShortOff = Array(0, 0, 0, 0, -1, 1, -2, 2, -3, 3, -1, 1, -2, 2, -3, 3)

  /** §7.3 context map: RLE of zeros + inverse move-to-front. */
  private def readContextMap(r: BitReader, nTrees: Int, size: Int): Array[Byte] = {
    val map = new Array[Byte](size)
    if (nTrees == 1) return map
    val rleMax = if (r.bit() == 1) r.bits(4) + 1 else 0
    val huff = readPrefixCode(r, nTrees + rleMax)
    var i = 0
    while (i < size) {
      val sym = huff.decode(r)
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rleMax) {
        val reps = (1 << sym) + r.bits(sym)
        require(i + reps <= size, "context-map zero run past end")
        i += reps // already zero
      } else {
        map(i) = (sym - rleMax).toByte
        i += 1
      }
    }
    if (r.bit() == 1) { // inverse move-to-front
      val mtf = Array.tabulate(256)(_.toByte)
      var k = 0
      while (k < size) {
        val idx = map(k) & 0xff
        val v = mtf(idx)
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        map(k) = v
        k += 1
      }
    }
    map
  }

  /** Per-category block-switching state (§6). */
  private final class BlockState(r: BitReader, val nTypes: Int) {
    val typeHuff: Huff = if (nTypes > 1) readPrefixCode(r, nTypes + 2) else null
    val lenHuff: Huff = if (nTypes > 1) readPrefixCode(r, 26) else null
    var btype = 0
    private var prev = 1
    var remaining: Int = if (nTypes > 1) readBlockLen(r, lenHuff) else Int.MaxValue

    def switchBlock(r: BitReader): Unit = {
      val sym = typeHuff.decode(r)
      val next = sym match {
        case 0 => prev
        case 1 => (btype + 1) % nTypes
        case k => k - 2
      }
      prev = btype
      btype = next
      remaining = readBlockLen(r, lenHuff)
    }
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  def decompress(data: Array[Byte]): Array[Byte] =
    decompress(data, Int.MaxValue)

  /** Decode with an output-size ceiling. Callers that know the expected
    * plaintext size (chunk readers do — the grid geometry fixes it)
    * should pass it: a corrupt or adversarial stream can otherwise
    * amplify a few hundred input bytes into gigabytes of copy commands
    * before any checksum would catch it, which on an executor is an OOM
    * kill, not an error row. */
  def decompress(data: Array[Byte], maxOutput: Int): Array[Byte] = {
    val r = new BitReader(data)
    val wbits = readWbits(r)
    val windowSize = (1 << wbits) - 16
    var out = new Array[Byte](math.max(64,
      math.min(maxOutput, math.min(windowSize, data.length * 4))))
    var outPos = 0
    def ensure(n: Int): Unit = {
      if (outPos + n > maxOutput || outPos + n < 0)
        throw new IllegalArgumentException(
          s"brotli output exceeds the $maxOutput-byte ceiling")
      if (outPos + n > out.length)
        out = java.util.Arrays.copyOf(out,
          math.min(maxOutput, math.max(out.length * 2L, outPos + n.toLong)).toInt)
    }
    // distance ring buffer: initial "last four distances" = 4, 11, 15, 16
    val ring = Array(16, 15, 11, 4)
    var ringPos = 4 // ring((ringPos-1)&3) is the most recent distance

    var last = false
    while (!last) {
      last = r.bit() == 1
      val lastEmpty = last && r.bit() == 1
      if (!lastEmpty) {
        val mnibbles = r.bits(2) match {
          case 3 => 0
          case k => k + 4
        }
        if (mnibbles == 0) {
          // metadata block (§9.2): skipped, never counted as output
          require(!last, "metadata block cannot be the last meta-block")
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
          // §9.2: MNIBBLES must be minimal
          require(mnibbles == 4 || (mlenM1 >>> ((mnibbles - 1) * 4)) != 0,
            "non-minimal MNIBBLES encoding")
          val mlen = mlenM1 + 1
          val uncompressed = !last && r.bit() == 1
          if (uncompressed) {
            r.alignToByte()
            val chunk = r.readBytes(mlen)
            ensure(mlen)
            System.arraycopy(chunk, 0, out, outPos, mlen)
            outPos += mlen
          } else {
            // ---- compressed meta-block header (§9.2) ----
            val bsL = new BlockState(r, readVarCount(r))
            val bsI = new BlockState(r, readVarCount(r))
            val bsD = new BlockState(r, readVarCount(r))
            val npostfix = r.bits(2)
            val ndirect = r.bits(4) << npostfix
            val postfixMask = (1 << npostfix) - 1
            val contextModes = Array.fill(bsL.nTypes)(r.bits(2))
            val nTreesL = readVarCount(r)
            val cmapL = readContextMap(r, nTreesL, bsL.nTypes * 64)
            val nTreesD = readVarCount(r)
            val cmapD = readContextMap(r, nTreesD, bsD.nTypes * 4)
            val litTrees = Array.fill(nTreesL)(readPrefixCode(r, 256))
            val icTrees = Array.fill(bsI.nTypes)(readPrefixCode(r, 704))
            val distAlpha = 16 + ndirect + (48 << npostfix)
            val distTrees = Array.fill(nTreesD)(readPrefixCode(r, distAlpha))

            // ---- command loop (§9.3) ----
            ensure(mlen)
            var remaining = mlen
            while (remaining > 0) {
              if (bsI.remaining == 0) bsI.switchBlock(r)
              bsI.remaining -= 1
              val cmd = icTrees(bsI.btype).decode(r)
              val cell = cmd >> 6
              val insCode = CellInsBase(cell) + ((cmd >> 3) & 7)
              val copyCode = CellCopyBase(cell) + (cmd & 7)
              val insLen = InsOffset(insCode) + r.bits(InsBits(insCode))
              val copyLen = CopyOffset(copyCode) + r.bits(CopyBits(copyCode))

              // literals
              require(insLen <= remaining, "insert length exceeds meta-block length")
              var i = 0
              while (i < insLen) {
                if (bsL.remaining == 0) bsL.switchBlock(r)
                bsL.remaining -= 1
                val mode = contextModes(bsL.btype)
                val p1 = if (outPos > 0) out(outPos - 1) & 0xff else 0
                val p2 = if (outPos > 1) out(outPos - 2) & 0xff else 0
                val ctx = (contextLut((mode << 9) + p1) & 0xff) |
                          (contextLut((mode << 9) + 256 + p2) & 0xff)
                val tree = litTrees(cmapL((bsL.btype << 6) + ctx) & 0xff)
                ensure(1)
                out(outPos) = tree.decode(r).toByte
                outPos += 1
                i += 1
              }
              remaining -= insLen

              if (remaining > 0) {
                // distance (implicit "last distance" when cmd < 128)
                var distance = 0
                var pushRing = false
                if (cmd < 128) {
                  distance = ring((ringPos - 1) & 3)
                } else {
                  if (bsD.remaining == 0) bsD.switchBlock(r)
                  bsD.remaining -= 1
                  val dctx = if (copyLen > 4) 3 else copyLen - 2
                  val tree = distTrees(cmapD((bsD.btype << 2) + dctx) & 0xff)
                  val dsym = tree.decode(r)
                  if (dsym < 16) {
                    distance = ring((ringPos + ShortIdx(dsym)) & 3) + ShortOff(dsym)
                    require(distance > 0, "non-positive ring distance")
                    pushRing = dsym != 0
                  } else if (dsym < 16 + ndirect) {
                    distance = dsym - 16 + 1
                    pushRing = true
                  } else {
                    val d = dsym - ndirect - 16
                    val ndistbits = 1 + (d >> (npostfix + 1))
                    val hcode = d >> npostfix
                    val lcode = d & postfixMask
                    val offset = ((2 + (hcode & 1)) << ndistbits) - 4
                    distance = ((offset + r.bits(ndistbits)) << npostfix) +
                      lcode + ndirect + 1
                    pushRing = true
                  }
                }
                val maxDistance = math.min(outPos, windowSize)
                if (distance <= maxDistance) {
                  require(copyLen <= remaining, "copy length exceeds meta-block length")
                  ensure(copyLen)
                  if (distance >= copyLen) {
                    System.arraycopy(out, outPos - distance, out, outPos, copyLen)
                    outPos += copyLen
                  } else {
                    var k = 0
                    while (k < copyLen) { // byte-wise: overlap is legal
                      out(outPos) = out(outPos - distance)
                      outPos += 1
                      k += 1
                    }
                  }
                  remaining -= copyLen
                  if (pushRing) { ring(ringPos & 3) = distance; ringPos += 1 }
                } else {
                  // static dictionary reference (§8); ring NOT updated
                  require(copyLen >= 4 && copyLen <= 24,
                    s"dictionary reference with copy length $copyLen")
                  val wordIdx = distance - maxDistance - 1
                  val shift = DictSizeBits(copyLen)
                  val wordId = wordIdx & ((1 << shift) - 1)
                  val tid = wordIdx >>> shift
                  require(tid < 121, s"dictionary transform $tid out of range")
                  val word = transformWord(dictOffsets(copyLen) + wordId * copyLen,
                    copyLen, tid)
                  require(word.length <= remaining,
                    "transformed word exceeds meta-block length")
                  ensure(word.length)
                  System.arraycopy(word, 0, out, outPos, word.length)
                  outPos += word.length
                  remaining -= word.length
                }
              }
            }
          }
        }
      }
    }
    if (outPos == out.length) out else java.util.Arrays.copyOf(out, outPos)
  }

  // ------------------------------------------------------------------
  // Encoders
  // ------------------------------------------------------------------

  /** Compress with the entropy encoder; every stream is SELF-VERIFIED
    * (decoded and compared before return) and falls back to the
    * stored-mode writer when entropy coding does not win or the
    * verification fails — so the write path can never emit a stream
    * this library would not read back byte-identically. Cross-checked
    * against the reference C decoder by tools/brotli_encoder_check.py.
    */
  def compress(data: Array[Byte]): Array[Byte] = {
    if (data.isEmpty) return compressStored(data)
    val entropy =
      try compressEntropy(data)
      catch { case _: RuntimeException => null }
    if (entropy != null && entropy.length < data.length + 16 &&
        java.util.Arrays.equals(decompress(entropy, data.length), data))
      entropy
    else compressStored(data)
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var bitBuf = 0
    private var bitCnt = 0
    /** Integer field, LSB-first (RFC §1.5.1). */
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        bitBuf |= ((v >> i) & 1) << bitCnt
        bitCnt += 1
        if (bitCnt == 8) { out.write(bitBuf); bitBuf = 0; bitCnt = 0 }
        i += 1
      }
    }
    /** Prefix-code word: first bit written = MSB of the canonical code. */
    def putCode(code: Int, len: Int): Unit = {
      var b = len - 1
      while (b >= 0) { putBits((code >> b) & 1, 1); b -= 1 }
    }
    def align(): Unit = if (bitCnt > 0) { out.write(bitBuf); bitBuf = 0; bitCnt = 0 }
    def toByteArray: Array[Byte] = out.toByteArray
  }

  /** Canonical codes from lengths (same assignment fromLengths decodes). */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    var maxLen = 0
    lens.foreach(l => if (l > maxLen) maxLen = l)
    val blCount = new Array[Int](16)
    lens.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code; l += 1 }
    val codes = new Array[Int](lens.length)
    var sym = 0
    while (sym < lens.length) {
      if (lens(sym) > 0) { codes(sym) = nextCode(lens(sym)); nextCode(lens(sym)) += 1 }
      sym += 1
    }
    codes
  }

  /** Huffman code lengths bounded by maxLen (frequency-flattening retry:
    * halving repeatedly converges to a balanced tree whose depth
    * ceil(log2 n) is within every bound this encoder uses). */
  private def huffLengths(freq: Array[Long], maxLen: Int): Array[Int] = {
    val used = freq.indices.filter(freq(_) > 0).toArray
    val lens = new Array[Int](freq.length)
    if (used.length == 0) return lens
    if (used.length == 1) { lens(used(0)) = 1; return lens }
    var f = used.map(freq(_))
    while (true) {
      val n = f.length
      val w = new Array[Long](2 * n - 1)
      val parent = new Array[Int](2 * n - 1)
      System.arraycopy(f, 0, w, 0, n)
      val pq = new java.util.PriorityQueue[Integer](n,
        (a: Integer, b: Integer) => java.lang.Long.compare(w(a), w(b)))
      (0 until n).foreach(i => pq.add(i))
      var next = n
      while (pq.size > 1) {
        val a = pq.poll(); val b = pq.poll()
        w(next) = w(a) + w(b)
        parent(a) = next; parent(b) = next
        pq.add(next); next += 1
      }
      val root = next - 1
      var maxD = 0
      val ds = new Array[Int](n)
      var i = 0
      while (i < n) {
        var d = 0; var j = i
        while (j != root) { j = parent(j); d += 1 }
        ds(i) = d; if (d > maxD) maxD = d
        i += 1
      }
      if (maxD <= maxLen) {
        i = 0
        while (i < n) { lens(used(i)) = ds(i); i += 1 }
        return lens
      }
      f = f.map(v => math.max(1L, v >> 2))
    }
    lens // unreachable
  }

  /** Fixed code for code-length-code lengths (§3.5), value -> (code, len)
    * in canonical MSB-first form (the inverse of ClLen/ClVal). */
  private val ClWriteCode = Array(0, 0xe, 0x6, 0x1, 0x2, 0xf)
  private val ClWriteLen = Array(2, 4, 3, 2, 2, 4)

  /** Emit one prefix code (§3.4 simple / §3.5 complex) for the given
    * frequency table and return the per-symbol (code << 5 | len) encode
    * table matching the decoder's canonical assignment. */
  private def writePrefixCode(w: BitWriter, freq: Array[Long]): Array[Int] = {
    val alphaBits = log2ceil(freq.length)
    val used = freq.indices.filter(freq(_) > 0).toArray
    require(used.nonEmpty, "cannot emit a prefix code with no symbols")
    val lens = new Array[Int](freq.length)
    if (used.length <= 4) {
      // simple code; order by descending frequency so NSYM=3's 1-bit
      // slot goes to the most frequent symbol
      val listed = used.sortBy(s => (-freq(s), s))
      w.putBits(1, 2)                 // HSKIP = 1
      w.putBits(listed.length - 1, 2) // NSYM - 1
      listed.foreach(s => w.putBits(s, alphaBits))
      listed.length match {
        case 1 => // zero-bit code: nothing more to write, lens stay 0
        case 2 => lens(listed(0)) = 1; lens(listed(1)) = 1
        case 3 => lens(listed(0)) = 1; lens(listed(1)) = 2; lens(listed(2)) = 2
        case 4 =>
          w.putBits(0, 1) // tree-select 0: lengths 2,2,2,2
          listed.foreach(s => lens(s) = 2)
      }
    } else {
      w.putBits(0, 2) // HSKIP = 0: complex code
      val full = huffLengths(freq, 15)
      System.arraycopy(full, 0, lens, 0, lens.length)
      // token stream over the per-symbol lengths: literal 0..15 plus
      // rep-17 zero runs (run-2 in bijective base 8 per the §3.5
      // consecutive-repeat accumulation); trailing zeros are omitted
      // (the decoder stops once the code space is complete)
      val toks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (sym, extra)
      var last = lens.length - 1
      while (last >= 0 && lens(last) == 0) last -= 1
      var i = 0
      while (i <= last) {
        if (lens(i) == 0) {
          var j = i
          while (j <= last && lens(j) == 0) j += 1
          val run = j - i
          if (run < 3) (0 until run).foreach(_ => toks += ((0, 0)))
          else {
            var m = (run - 2).toLong
            val digits = scala.collection.mutable.ArrayBuffer.empty[Int]
            while (m > 0) {
              var d = (m % 8).toInt
              var mm = m / 8
              if (d == 0) { d = 8; mm -= 1 }
              digits += d; m = mm
            }
            digits.reverseIterator.foreach(d => toks += ((17, d - 1)))
          }
          i = j
        } else { toks += ((lens(i), 0)); i += 1 }
      }
      val clFreq = new Array[Long](18)
      toks.foreach { case (s, _) => clFreq(s) += 1 }
      val clLens = huffLengths(clFreq, 5)
      // cl-code lengths in ClOrder, stopping exactly where the decoder
      // stops (space reaches 32, or all 18 when the code is degenerate)
      var space = 0
      var k = 0
      while (k < 18 && space < 32) {
        val v = clLens(ClOrder(k))
        w.putCode(ClWriteCode(v), ClWriteLen(v))
        if (v != 0) space += 32 >> v
        k += 1
      }
      val clCodes = canonicalCodes(clLens)
      // a DEGENERATE cl code (exactly one distinct token symbol — e.g.
      // every literal at length 8 on near-uniform random bytes) consumes
      // ZERO bits per token on the decode side (§3.5 num_codes == 1;
      // fromLengths -> singleSymbol), so the writer must emit none:
      // huffLengths assigns the lone symbol length 1, and writing that
      // 1-bit code per token desynced the stream (found by the r16
      // random-payload fuzz; masked before because the oversized stream
      // also failed compress()'s size gate and fell back to stored)
      val clDegenerate = clLens.count(_ > 0) == 1
      toks.foreach { case (s, extra) =>
        if (!clDegenerate) w.putCode(clCodes(s), clLens(s))
        if (s == 17) w.putBits(extra, 3)
      }
    }
    val codes = canonicalCodes(lens)
    lens.indices.map(s => (codes(s) << 5) | lens(s)).toArray
  }

  /** Find the code index whose [offset, offset + 2^bits) range holds v. */
  private def codeFor(offsets: Array[Int], bits: Array[Int], v: Int): Int = {
    var i = offsets.length - 1
    while (offsets(i) > v) i -= 1
    // offsets are ascending and ranges tile the domain, so i is the slot
    require(v - offsets(i) < (1 << bits(i)), s"value $v out of code range")
    i
  }

  /** Entropy encoder: greedy hash-chain LZ77 over a 4 MiB window into
    * single-block-type compressed meta-blocks with dynamic prefix codes
    * (one literal tree, one insert-and-copy tree, one distance tree;
    * NPOSTFIX = NDIRECT = 0, no context maps, no ring-buffer distance
    * codes) — a conforming "quality 2"-class writer. Throws on inputs
    * it cannot model; compress() catches and falls back to stored mode.
    */
  private[graft] def compressEntropy(data: Array[Byte]): Array[Byte] = {
    require(data.nonEmpty)
    val w = new BitWriter
    // WBITS = 22: '1' + 3-bit 5 (17 + 5)
    w.putBits(1, 1); w.putBits(5, 3)
    val window = (1 << 22) - 16
    val HashBits = 17
    val head = new Array[Int](1 << HashBits)
    java.util.Arrays.fill(head, -1)
    def hash(i: Int): Int = {
      val v = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      (v * 0x9e3779b1) >>> (32 - HashBits)
    }
    var blockStart = 0
    while (blockStart < data.length) {
      val blockEnd = math.min(blockStart + (1 << 24), data.length)
      val mlen = blockEnd - blockStart
      val isLast = blockEnd == data.length
      // ---- LZ parse of this meta-block ----
      // command = (litStart, litEnd, copyLen, dist); copyLen 0 marks the
      // trailing literal-only command
      val cmds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
      var litStart = blockStart
      var p = blockStart
      while (p < blockEnd) {
        var matched = false
        if (p + 4 <= data.length) {
          val h = hash(p)
          val cand = head(h)
          head(h) = p
          if (cand >= 0 && p - cand <= window &&
              data(cand) == data(p) && data(cand + 1) == data(p + 1) &&
              data(cand + 2) == data(p + 2) && data(cand + 3) == data(p + 3)) {
            var len = 4
            val cap = blockEnd - p
            while (len < cap && data(cand + len) == data(p + len)) len += 1
            if (len >= 4) {
              cmds += ((litStart, p, len, p - cand))
              var q = p + 1
              val qEnd = math.min(p + len, data.length - 4)
              while (q < qEnd) { head(hash(q)) = q; q += 1 }
              p += len
              litStart = p
              matched = true
            }
          }
        }
        if (!matched) p += 1
      }
      if (litStart < blockEnd || cmds.isEmpty)
        cmds += ((litStart, blockEnd, 0, 0)) // trailing literals
      // ---- symbol streams ----
      def insCode(l: Int) = codeFor(InsOffset, InsBits, l)
      def cpyCode(l: Int) = codeFor(CopyOffset, CopyBits, l)
      // explicit (never implicit-distance) cell for (insHigh, copyHigh)
      val cellByHighs = Array(2, 3, 6, 4, 5, 8, 7, 9, 10)
      def cmdSym(ic: Int, cc: Int): Int =
        cellByHighs((ic >> 3) * 3 + (cc >> 3)) * 64 + ((ic & 7) << 3) + (cc & 7)
      // distance -> (dcode, ndistbits, dextra) with NPOSTFIX=NDIRECT=0
      def distSym(d: Int): (Int, Int, Int) = {
        val big = d + 3 // = offset base + dextra + 4
        val nb = 30 - Integer.numberOfLeadingZeros(big)
        val base = 1 << (nb + 1)
        if (big - base < (1 << nb)) (16 + 2 * (nb - 1), nb, big - base)
        else (16 + 2 * (nb - 1) + 1, nb, big - 3 * (1 << nb))
      }
      val litFreq = new Array[Long](256)
      val cmdFreq = new Array[Long](704)
      val distFreq = new Array[Long](64)
      cmds.foreach { case (ls, le, cl, d) =>
        var i = ls
        while (i < le) { litFreq(data(i) & 0xff) += 1; i += 1 }
        val cLen = if (cl == 0) 4 else cl // trailing command: any copy code
        cmdFreq(cmdSym(insCode(le - ls), cpyCode(cLen))) += 1
        if (cl > 0) distFreq(distSym(d)._1) += 1
      }
      if (litFreq.forall(_ == 0)) litFreq(0) = 1   // all-copy block
      if (distFreq.forall(_ == 0)) distFreq(0) = 1 // literal-only block
      // ---- meta-block header ----
      if (isLast) { w.putBits(1, 1); w.putBits(0, 1) } // ISLAST, ISLASTEMPTY
      else w.putBits(0, 1)
      val nibbles = if (mlen - 1 < (1 << 16)) 4
        else if (mlen - 1 < (1 << 20)) 5 else 6
      w.putBits(nibbles - 4, 2)
      w.putBits(mlen - 1, nibbles * 4)
      if (!isLast) w.putBits(0, 1) // ISUNCOMPRESSED = 0
      w.putBits(0, 1); w.putBits(0, 1); w.putBits(0, 1) // NBLTYPES L/I/D = 1
      w.putBits(0, 2) // NPOSTFIX
      w.putBits(0, 4) // NDIRECT >> NPOSTFIX
      w.putBits(0, 2) // context mode LSB6 for the single literal block type
      w.putBits(0, 1) // NTREESL = 1 (no context map)
      w.putBits(0, 1) // NTREESD = 1 (no context map)
      val litTab = writePrefixCode(w, litFreq)
      val cmdTab = writePrefixCode(w, cmdFreq)
      val distTab = writePrefixCode(w, distFreq)
      // ---- command loop ----
      def putSym(tab: Array[Int], s: Int): Unit =
        w.putCode(tab(s) >>> 5, tab(s) & 31)
      cmds.foreach { case (ls, le, cl, d) =>
        val il = le - ls
        val cLen = if (cl == 0) 4 else cl
        val ic = insCode(il)
        val cc = cpyCode(cLen)
        putSym(cmdTab, cmdSym(ic, cc))
        w.putBits(il - InsOffset(ic), InsBits(ic))
        w.putBits(cLen - CopyOffset(cc), CopyBits(cc))
        var i = ls
        while (i < le) { putSym(litTab, data(i) & 0xff); i += 1 }
        if (cl > 0) {
          val (ds, nb, ex) = distSym(d)
          putSym(distTab, ds)
          w.putBits(ex, nb)
        }
      }
      blockStart = blockEnd
    }
    w.align()
    w.toByteArray
  }

  /** Emit a valid RFC 7932 stream of uncompressed meta-blocks. */
  def compressStored(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
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
      // minimal MNIBBLES (§9.2: with 5 or 6 nibbles the top nibble of
      // MLEN-1 must be non-zero — conforming decoders reject otherwise)
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
