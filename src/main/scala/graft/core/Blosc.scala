package graft.core

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** Blosc v1 frame codec (F10/S18) — the chunk-level compressor
  * zarr-python v2 applies by DEFAULT, which the reference decodes via
  * the `blosc` package (datasource/zarr2/image.py:65-67, encode
  * config zarr2/image.py:200-219). Implemented from the public
  * c-blosc 1.x container format (c-blosc README_HEADER.rst /
  * blosc.c), not from the reference:
  *
  *   16-byte header:
  *     0 version | 1 versionlz | 2 flags | 3 typesize
  *     4-7 nbytes (u32 LE) | 8-11 blocksize | 12-15 cbytes
  *   flags: bit0 byte-shuffle, bit1 pure-memcpy, bit2 bit-shuffle,
  *          bits 5-7 inner compressor code
  *   then (unless memcpy): one u32 LE absolute offset per block
  *   ("bstarts"), each block = nsplits × [i32 LE csize][stream],
  *   csize == split-size meaning the stream is stored raw.
  *
  * Blocks are shuffled INDEPENDENTLY (shuffle is block-local), and a
  * block is split into `typesize` byte-lane streams only for the
  * blosclz/lz4/lz4hc codecs when typesize <= 16 and
  * blocksize/typesize >= 128 (c-blosc's forward-compat split mode) —
  * the decoder must re-derive the same rule. Inner codecs supported
  * here: lz4 (raw block via lz4-java), zlib (Deflater), zstd
  * (zstd-jni) — all on the Spark classpath. blosclz/snappy and
  * bit-shuffle are rejected with a clear error (no offline JVM impl).
  */
object Blosc {

  // header flags (c-blosc blosc.h)
  private val DoShuffle = 0x1
  private val MemCpyed = 0x2
  private val DoBitShuffle = 0x4
  private val DontSplit = 0x10 // c-blosc >= 1.14: block is ONE stream

  // inner compressor codes, header flags bits 5-7
  private val CodeBloscLZ = 0
  private val CodeLz4 = 1 // lz4 and lz4hc share the stream format
  private val CodeSnappy = 2
  private val CodeZlib = 3
  private val CodeZstd = 4

  private val MaxSplits = 16 // BLOSC_MAX_STREAMS
  private val MinBufferSize = 128 // BLOSC_MIN_BUFFERSIZE

  def codeOf(cname: String): Int = cname match {
    case "blosclz" => CodeBloscLZ
    case "lz4" | "lz4hc" => CodeLz4
    case "snappy" => CodeSnappy
    case "zlib" => CodeZlib
    case "zstd" => CodeZstd
    case c => throw new IllegalArgumentException(s"unknown blosc cname '$c'")
  }

  /** c-blosc's forward-compat split rule (blosc.c split_block): only
    * the byte-oriented codecs split into typesize lane streams. Used
    * by the ENCODER to pick the frame's split decision (recorded in
    * header flag 0x10) and by the decoder only as the fallback for
    * pre-flag frames — c-blosc >= 1.14 decoders read the flag, so the
    * encoder MUST stamp it or single-stream zlib/zstd frames would be
    * mis-read as typesize split streams by numcodecs.
    */
  private def splitBlock(code: Int, typesize: Int, blocksize: Int): Boolean =
    (code == CodeBloscLZ || code == CodeLz4) &&
      typesize > 1 && typesize <= MaxSplits &&
      blocksize / typesize >= MinBufferSize &&
      blocksize % typesize == 0

  /** Byte-shuffle: gather byte-lane j of every complete element;
    * the tail (len % typesize bytes) is copied through unchanged
    * (c-blosc shuffle.c).
    */
  def shuffle(typesize: Int, src: Array[Byte]): Array[Byte] = {
    if (typesize <= 1) return src
    val n = src.length / typesize
    val out = new Array[Byte](src.length)
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < n) {
        out(j * n + i) = src(i * typesize + j)
        i += 1
      }
      j += 1
    }
    System.arraycopy(src, n * typesize, out, n * typesize,
      src.length - n * typesize)
    out
  }

  def unshuffle(typesize: Int, src: Array[Byte]): Array[Byte] = {
    if (typesize <= 1) return src
    val n = src.length / typesize
    val out = new Array[Byte](src.length)
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < n) {
        out(i * typesize + j) = src(j * n + i)
        i += 1
      }
      j += 1
    }
    System.arraycopy(src, n * typesize, out, n * typesize,
      src.length - n * typesize)
    out
  }

  // ---- inner codec streams ----

  private def lz4Factory = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()

  /** Compress one split; returns null when the codec cannot beat the
    * raw size (caller then stores the split raw, csize == neblock).
    */
  private def innerCompress(code: Int, clevel: Int, src: Array[Byte],
      off: Int, len: Int): Array[Byte] = code match {
    case CodeLz4 =>
      val c = if (clevel >= 7) lz4Factory.highCompressor()
        else lz4Factory.fastCompressor()
      val max = c.maxCompressedLength(len)
      val buf = new Array[Byte](max)
      val n = c.compress(src, off, len, buf, 0, max)
      if (n >= len) null else java.util.Arrays.copyOf(buf, n)
    case CodeZlib =>
      val d = new Deflater(math.min(math.max(clevel, 1), 9))
      d.setInput(src, off, len); d.finish()
      val bos = new ByteArrayOutputStream(len / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      val out = bos.toByteArray
      if (out.length >= len) null else out
    case CodeZstd =>
      val slice = java.util.Arrays.copyOfRange(src, off, off + len)
      val out = com.github.luben.zstd.Zstd.compress(slice,
        math.min(math.max(clevel * 2, 1), 19))
      if (out.length >= len) null else out
    case c => throw new IllegalArgumentException(
      s"blosc inner codec $c not supported (blosclz/snappy need native libs)")
  }

  private def innerDecompress(code: Int, src: Array[Byte], off: Int,
      csize: Int, destLen: Int): Array[Byte] = code match {
    case CodeLz4 =>
      val out = new Array[Byte](destLen)
      val n = lz4Factory.safeDecompressor()
        .decompress(src, off, csize, out, 0)
      require(n == destLen, s"blosc lz4 split: got $n want $destLen")
      out
    case CodeZlib =>
      val inf = new Inflater()
      inf.setInput(src, off, csize)
      val out = new Array[Byte](destLen)
      var got = 0
      while (got < destLen && !inf.finished())
        got += inf.inflate(out, got, destLen - got)
      inf.end()
      require(got == destLen, s"blosc zlib split: got $got want $destLen")
      out
    case CodeZstd =>
      val slice = java.util.Arrays.copyOfRange(src, off, off + csize)
      val out = com.github.luben.zstd.Zstd.decompress(slice, destLen)
      require(out.length == destLen,
        s"blosc zstd split: got ${out.length} want $destLen")
      out
    case CodeBloscLZ => throw new IllegalArgumentException(
      "blosc inner codec blosclz not supported (native-only)")
    case CodeSnappy => throw new IllegalArgumentException(
      "blosc inner codec snappy not supported (native-only)")
    case c => throw new IllegalArgumentException(s"blosc inner codec $c")
  }

  // ---- frame encode ----

  /** Encode a blosc frame (shuffle: 0 none, 1 byte, 2 bit — matching
    * numcodecs' NOSHUFFLE/SHUFFLE/BITSHUFFLE constants). Falls back
    * to memcpy framing when compression does not win, like c-blosc.
    */
  def compress(data: Array[Byte], typesize: Int, cname: String = "lz4",
      clevel: Int = 5, shuffleMode: Int = 1,
      blocksize0: Int = 0): Array[Byte] = {
    require(shuffleMode == 0 || shuffleMode == 1,
      s"blosc shuffle mode $shuffleMode unsupported (bit-shuffle is native-only)")
    val code = codeOf(cname)
    val ts = if (typesize < 1 || typesize > 255) 1 else typesize
    val nbytes = data.length
    // block size: 256 KiB default, trimmed to a typesize multiple so
    // shuffle lanes stay aligned (c-blosc compute_blksize rounds the
    // same way); a short buffer is one block
    val bs0 = if (blocksize0 > 0) blocksize0 else math.min(nbytes, 1 << 18)
    val bs = math.max(if (ts > 1) bs0 - bs0 % ts else bs0, 1)
    val nblocks = if (nbytes == 0) 0 else (nbytes + bs - 1) / bs
    val doShuf = shuffleMode == 1 && ts > 1
    // frame-level split decision, stamped into header flag 0x10 so
    // c-blosc >= 1.14 decoders (numcodecs) pick the same stream count
    val split = splitBlock(code, ts, bs)

    val body = new ByteArrayOutputStream(nbytes / 2 + 64)
    val bstarts = new Array[Int](nblocks)
    var b = 0
    while (b < nblocks) {
      bstarts(b) = 16 + 4 * nblocks + body.size()
      val bsize = math.min(bs, nbytes - b * bs)
      val block0 = java.util.Arrays.copyOfRange(data, b * bs, b * bs + bsize)
      val block = if (doShuf) shuffle(ts, block0) else block0
      val leftover = bsize != bs
      val nsplits = if (split && !leftover) ts else 1
      val neblock = bsize / nsplits
      var j = 0
      while (j < nsplits) {
        val comp = innerCompress(code, clevel, block, j * neblock, neblock)
        val sz = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        if (comp == null) { // raw split: csize == neblock
          sz.putInt(neblock)
          body.write(sz.array)
          body.write(block, j * neblock, neblock)
        } else {
          sz.putInt(comp.length)
          body.write(sz.array)
          body.write(comp)
        }
        j += 1
      }
      b += 1
    }

    val framed = 16 + 4 * nblocks + body.size()
    val splitFlag = if (split) 0 else DontSplit
    if (framed >= nbytes + 16) {
      // memcpy fallback: original (unshuffled) bytes after the header
      val out = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      out.put(2.toByte).put(1.toByte)
        .put((MemCpyed | splitFlag | (code << 5)).toByte).put(ts.toByte)
        .putInt(nbytes).putInt(bs).putInt(16 + nbytes)
      out.put(data)
      out.array
    } else {
      val flags = (if (doShuf) DoShuffle else 0) | splitFlag | (code << 5)
      val out = ByteBuffer.allocate(framed).order(ByteOrder.LITTLE_ENDIAN)
      out.put(2.toByte).put(1.toByte).put(flags.toByte).put(ts.toByte)
        .putInt(nbytes).putInt(bs).putInt(framed)
      bstarts.foreach(out.putInt)
      out.put(body.toByteArray)
      out.array
    }
  }

  // ---- frame decode ----

  def decompress(frame: Array[Byte],
      maxOutput: Int = Codec.MaxDecodedChunkBytes): Array[Byte] =
      Codec.asCorrupt("blosc") {
    require(frame.length >= 16, s"blosc frame too short: ${frame.length}")
    val hdr = ByteBuffer.wrap(frame, 0, 16).order(ByteOrder.LITTLE_ENDIAN)
    hdr.get() // format version (2 for all c-blosc1 frames — see below)
    hdr.get() // versionlz
    val flags = hdr.get() & 0xFF
    val ts = math.max(hdr.get() & 0xFF, 1)
    val nbytes = hdr.getInt
    val blocksize = hdr.getInt
    val cbytes = hdr.getInt
    // nbytes sizes the output allocation and is UNTRUSTED header
    // content — the decode-bomb rail (same contract as
    // Codec.MaxDecodedChunkBytes elsewhere) must fire before it
    require(nbytes >= 0 && nbytes <= maxOutput,
      s"blosc declared nbytes $nbytes outside [0, $maxOutput] " +
        "(corrupt frame or decode bomb)")
    require(cbytes <= frame.length,
      s"blosc cbytes $cbytes > frame ${frame.length}")
    require((flags & DoBitShuffle) == 0,
      "blosc bit-shuffle not supported (native-only)")
    if ((flags & MemCpyed) != 0) {
      require(frame.length >= 16 + nbytes,
        s"blosc memcpy frame truncated: need ${16 + nbytes}, have ${frame.length}")
      java.util.Arrays.copyOfRange(frame, 16, 16 + nbytes)
    } else if (nbytes == 0) Array.emptyByteArray
    else {
    require(blocksize > 0,
      s"corrupt blosc frame: blocksize $blocksize with nbytes $nbytes")
    val code = flags >>> 5
    val doShuf = (flags & DoShuffle) != 0 && ts > 1
    // c-blosc >= 1.14 records the split decision in flag 0x10. The
    // format version byte is 2 for ALL c-blosc1 frames (including
    // pre-1.14 encoders that never stamp the flag), so pre-1.14
    // single-stream zstd/zlib frames are indistinguishable and decode
    // as split — exactly what modern c-blosc >= 1.14 decoders do, so
    // numcodecs interop is unaffected. Trusting the flag is what makes
    // SPLITMODE=ALWAYS/NEVER frames decode right; `version` is parsed
    // only for the header dump.
    val frameSplit = (flags & DontSplit) == 0 && ts > 1
    val nblocks = (nbytes + blocksize - 1) / blocksize
    require(16L + 4L * nblocks <= frame.length,
      s"blosc frame truncated: $nblocks-entry block-start table " +
        s"does not fit in ${frame.length} bytes")
    val bst = ByteBuffer.wrap(frame, 16, 4 * nblocks)
      .order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Byte](nbytes)
    var b = 0
    while (b < nblocks) {
      var off = bst.getInt(16 + 4 * b)
      val bsize = math.min(blocksize, nbytes - b * blocksize)
      val leftover = bsize != blocksize
      val nsplits = if (frameSplit && !leftover) ts else 1
      val neblock = bsize / nsplits
      val block = new Array[Byte](bsize)
      var j = 0
      while (j < nsplits) {
        // block-start offsets and split sizes are untrusted frame
        // content: bound every dereference or a corrupt table reads
        // (or arraycopies) outside the frame
        require(off >= 0 && off + 4 <= frame.length,
          s"corrupt blosc frame: split header at $off outside " +
            s"${frame.length}-byte frame")
        val csize = ByteBuffer.wrap(frame, off, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        off += 4
        require(csize >= 0 && off.toLong + csize <= frame.length,
          s"corrupt blosc frame: split of $csize bytes at $off " +
            s"outside ${frame.length}-byte frame")
        // the final split of an unsplit leftover block may be ragged
        val want = if (j == nsplits - 1) bsize - j * neblock else neblock
        if (csize == want)
          System.arraycopy(frame, off, block, j * neblock, want)
        else
          System.arraycopy(
            innerDecompress(code, frame, off, csize, want), 0,
            block, j * neblock, want)
        off += csize
        j += 1
      }
      val plain = if (doShuf) unshuffle(ts, block) else block
      System.arraycopy(plain, 0, out, b * blocksize, bsize)
      b += 1
    }
    out
    }
  }
}
