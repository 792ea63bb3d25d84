package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{GZIPInputStream, GZIPOutputStream, Deflater}

/** Chunk payload codecs.
  *
  * The reference's `chunks.py:83-360` dispatches per-encoding; round 1
  * covers `raw` (Fortran-order little-endian voxel bytes,
  * chunks.py:323-325/353-354) and the second-stage gzip wrap
  * (`datasource/precomputed/common.py:7-53`). Canonical in-memory voxel
  * order is Fortran (x fastest), matching the wire format, so raw
  * encode/decode is a flat copy.
  */
object Codec {

  // ImageIO defaults to FILE-backed cache streams: with useCache=true
  // every png/jpeg (en|de)code writes a temp cache file to disk —
  // thousands of create/write/delete per chunked query, and the
  // latency couples the decode path to unrelated disk churn. Memory
  // cache is strictly better for our ByteArray-sized payloads. Object
  // init runs once per executor JVM before first decode.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decode a raw-encoded chunk into a Long-valued voxel array in
    * Fortran order. dtypeBytes in {1,2,4,8}; values are zero-extended
    * (uint semantics) except 8-byte which is passed through.
    */
  def decodeRawToLongs(payload: Array[Byte], dtypeBytes: Int,
      order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Long] = {
    require(payload.length % dtypeBytes == 0,
      s"payload ${payload.length}B not a multiple of $dtypeBytes")
    val n = payload.length / dtypeBytes
    val out = new Array[Long](n)
    val buf = ByteBuffer.wrap(payload).order(order)
    var i = 0
    dtypeBytes match {
      case 1 => while (i < n) { out(i) = buf.get(i) & 0xffL; i += 1 }
      case 2 => while (i < n) { out(i) = buf.getShort(2 * i) & 0xffffL; i += 1 }
      case 4 => while (i < n) { out(i) = buf.getInt(4 * i) & 0xffffffffL; i += 1 }
      case 8 => while (i < n) { out(i) = buf.getLong(8 * i); i += 1 }
      case d => throw new IllegalArgumentException(s"dtype bytes $d")
    }
    out
  }

  /** Decode raw little-endian IEEE float32/float64 voxels to doubles
    * (float image layers, metadata dtype table). Kept separate from
    * the Long path: reinterpreting float payloads as integers would be
    * silent corruption, so the integer cutouts reject float dtypes and
    * callers come through here.
    */
  def decodeRawFloatsToDoubles(payload: Array[Byte], dtypeBytes: Int,
      order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Double] = {
    require(payload.length % dtypeBytes == 0,
      s"payload ${payload.length}B not a multiple of $dtypeBytes")
    val n = payload.length / dtypeBytes
    val out = new Array[Double](n)
    val buf = ByteBuffer.wrap(payload).order(order)
    var i = 0
    dtypeBytes match {
      case 4 => while (i < n) { out(i) = buf.getFloat(4 * i).toDouble; i += 1 }
      case 8 => while (i < n) { out(i) = buf.getDouble(8 * i); i += 1 }
      case d => throw new IllegalArgumentException(s"float dtype bytes $d")
    }
    out
  }

  /** Encode doubles to raw little-endian float32/float64 bytes. */
  def encodeRawFloatsFromDoubles(vals: Array[Double], dtypeBytes: Int,
      order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Byte] = {
    val buf = ByteBuffer.allocate(vals.length * dtypeBytes).order(order)
    dtypeBytes match {
      case 4 => vals.foreach(v => buf.putFloat(v.toFloat))
      case 8 => vals.foreach(buf.putDouble)
      case d => throw new IllegalArgumentException(s"float dtype bytes $d")
    }
    buf.array()
  }

  /** Encode voxels (Fortran order) to raw little-endian bytes. */
  def encodeRawFromLongs(voxels: Array[Long], dtypeBytes: Int,
      order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Byte] = {
    val buf = ByteBuffer.allocate(voxels.length * dtypeBytes)
      .order(order)
    var i = 0
    dtypeBytes match {
      case 1 => while (i < voxels.length) { buf.put((voxels(i) & 0xff).toByte); i += 1 }
      case 2 => while (i < voxels.length) { buf.putShort((voxels(i) & 0xffff).toShort); i += 1 }
      case 4 => while (i < voxels.length) { buf.putInt((voxels(i) & 0xffffffffL).toInt); i += 1 }
      case 8 => while (i < voxels.length) { buf.putLong(voxels(i)); i += 1 }
      case d => throw new IllegalArgumentException(s"dtype bytes $d")
    }
    buf.array()
  }

  /** Distinct labels of a raw chunk without materializing a row per
    * voxel — the codec-level `labels()` pushdown (chunks.py:362-393).
    */
  def rawLabels(payload: Array[Byte], dtypeBytes: Int): Array[Long] = {
    val vox = decodeRawToLongs(payload, dtypeBytes)
    val seen = new java.util.HashSet[Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < vox.length) {
      if (seen.add(vox(i))) out += vox(i)
      i += 1
    }
    out.toArray
  }

  /** `contains(label)` on a raw chunk (chunks.py:459-484). */
  def rawContains(payload: Array[Byte], dtypeBytes: Int, label: Long): Boolean = {
    val vox = decodeRawToLongs(payload, dtypeBytes)
    var i = 0
    while (i < vox.length) { if (vox(i) == label) return true; i += 1 }
    false
  }

  /** Random access into a raw chunk: voxel at F-order position
    * x + sx*(y + sy*z) (chunks.py:423-457 read_voxel).
    */
  def rawReadVoxel(payload: Array[Byte], dtypeBytes: Int,
      x: Long, y: Long, z: Long, sx: Long, sy: Long): Long = {
    val idx = (x + sx * (y + sy * z)).toInt
    decodeRawToLongs(payload, dtypeBytes)(idx) // small chunks; fine for now
  }

  // ---- second-stage compression (datasource/precomputed/common.py) ----

  /** Hard ceiling on any single decompressed chunk payload (256 MiB —
    * comfortably above the largest real chunk in this engine, the
    * 105 MB benchmark volume, and far below executor OOM). Compressed
    * bytes are UNTRUSTED: a kilobyte-sized gzip/bzip2/zstd/blosc bomb
    * must fail as IllegalArgumentException at this rail, not OOM the
    * executor — the same decode-bomb contract as Brotli.decompress's
    * maxOutput and Draco/Compresso's element ceilings.
    */
  val MaxDecodedChunkBytes: Int = 1 << 28

  /** Decoder-boundary exception contract: these functions take
    * in-memory UNTRUSTED bytes, so an IOException (stream corruption
    * detected by the wrapped library), DataFormatException, or any
    * library RuntimeException (ZstdException, LZ4Exception,
    * BufferUnderflow) can only mean corrupt input — convert to the
    * repo-wide IllegalArgumentException with the cause preserved, so
    * every decode path fails the same declared way.
    */
  private[graft] def asCorrupt[T](what: String)(body: => T): T =
    try body
    catch {
      case e: IllegalArgumentException => throw e
      case e @ (_: java.io.IOException | _: RuntimeException |
          _: java.util.zip.DataFormatException) =>
        throw new IllegalArgumentException(
          s"corrupt $what stream: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}", e)
    }

  /** Drain a decompressor stream with the output ceiling enforced
    * incrementally, so a decode bomb fails before the big allocation.
    */
  private def readCapped(in: java.io.InputStream, maxOutput: Int,
      what: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64 * 1024)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) {
      if (bos.size.toLong + n > maxOutput)
        throw new IllegalArgumentException(
          s"$what output exceeds the $maxOutput-byte ceiling " +
            "(corrupt stream or decode bomb)")
      bos.write(buf, 0, n)
      n = in.read(buf)
    }
    bos.toByteArray
  }

  def gzip(data: Array[Byte], level: Int = Deflater.DEFAULT_COMPRESSION)
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new GZIPOutputStream(bos) {
      `def`.setLevel(level)
    }
    gz.write(data); gz.close()
    bos.toByteArray
  }

  def gunzip(data: Array[Byte],
      maxOutput: Int = MaxDecodedChunkBytes): Array[Byte] = {
    // fast path: single-member gzip carries the exact output size in the
    // ISIZE trailer — inflate straight into one right-sized array. The
    // streaming fallback's ByteArrayOutputStream doubles its way up to
    // the output size (for a 105 MB chunk payload: ~2x the bytes
    // memcpy'd plus a ladder of humongous garbage arrays, which the r13
    // bench breadcrumbs showed as 20-30 ms of GC INSIDE every timed
    // read rep). Integrity matches GZIPInputStream: CRC32 + ISIZE of
    // the inflated bytes are verified, any mismatch falls back.
    asCorrupt("gzip") {
      val fast = gunzipExact(data, maxOutput)
      if (fast != null) fast
      else {
        val in = new GZIPInputStream(new ByteArrayInputStream(data))
        readCapped(in, maxOutput, "gzip")
      }
    }
  }

  /** Single-member gzip decode into a preallocated ISIZE-sized array;
    * null when the payload is not a verifiable single member (multi-
    * member streams, >2 GB outputs, header variants that fail to
    * parse) — callers fall back to the streaming path.
    */
  private def gunzipExact(data: Array[Byte], maxOutput: Int): Array[Byte] = {
    val n = data.length
    if (n < 18 || (data(0) & 0xff) != 0x1f || (data(1) & 0xff) != 0x8b ||
      data(2) != 8) return null
    val flg = data(3) & 0xff
    var off = 10
    if ((flg & 4) != 0) { // FEXTRA
      if (off + 2 > n) return null
      off += 2 + ((data(off) & 0xff) | ((data(off + 1) & 0xff) << 8))
    }
    if ((flg & 8) != 0) { // FNAME
      while (off < n && data(off) != 0) off += 1
      off += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (off < n && data(off) != 0) off += 1
      off += 1
    }
    if ((flg & 2) != 0) off += 2 // FHCRC
    if (off >= n - 8) return null
    val isizeL = (data(n - 4) & 0xffL) | ((data(n - 3) & 0xffL) << 8) |
      ((data(n - 2) & 0xffL) << 16) | ((data(n - 1) & 0xffL) << 24)
    if (isizeL > Int.MaxValue - 8) return null
    // the ISIZE trailer is untrusted: a bomb claiming a huge output
    // must fail HERE, before the isize-sized allocation — the streaming
    // fallback would enforce the same ceiling, but only after this
    // path had already allocated the claimed size
    if (isizeL > maxOutput)
      throw new IllegalArgumentException(
        s"gzip ISIZE $isizeL exceeds the $maxOutput-byte ceiling " +
          "(corrupt stream or decode bomb)")
    val isize = isizeL.toInt
    val out = new Array[Byte](isize)
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data, off, n - off)
      var pos = 0
      while (!inf.finished()) {
        val k = inf.inflate(out, pos, isize - pos)
        pos += k
        if (!inf.finished() && (k == 0 || pos == isize)) return null
      }
      // exactly the 8-byte CRC32+ISIZE trailer may remain (single member)
      if (pos != isize || n - off - inf.getBytesRead != 8) return null
      val crc = new java.util.zip.CRC32()
      crc.update(out, 0, isize)
      val want = (data(n - 8) & 0xffL) | ((data(n - 7) & 0xffL) << 8) |
        ((data(n - 6) & 0xffL) << 16) | ((data(n - 5) & 0xffL) << 24)
      if (crc.getValue != want) return null
      out
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** zlib (RFC1950) wrap — the zarr2 "zlib" compressor
    * (datasource/zarr2/image.py:60-69 maps it onto gzip-family
    * decompression; java's Deflater emits zlib framing natively).
    */
  def zlibCompress(data: Array[Byte], level: Int = 5): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(data); d.finish()
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](65536)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  def zlibDecompress(data: Array[Byte],
      maxOutput: Int = MaxDecodedChunkBytes): Array[Byte] = asCorrupt("zlib") {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val bos = new ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](65536)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated zlib stream")
      if (bos.size.toLong + n > maxOutput)
        throw new IllegalArgumentException(
          s"zlib output exceeds the $maxOutput-byte ceiling " +
            "(corrupt stream or decode bomb)")
      bos.write(buf, 0, n)
    }
    inf.end()
    bos.toByteArray
  }

  /** F12: zstd second-stage wrap via the zstd-jni already on the Spark
    * classpath (datasource/precomputed/common.py:7-53 lists gzip, br,
    * zstd; `br` is handled by core/Brotli.scala — stored-mode RFC 7932
    * subset, scope documented there).
    */
  def zstd(data: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, level)

  def unzstd(data: Array[Byte],
      maxOutput: Int = MaxDecodedChunkBytes): Array[Byte] =
    asCorrupt("zstd") {
      // the frame-header content size is untrusted: bound it before the
      // n-sized allocation (and before n.toInt can truncate negative).
      // getFrameContentSize itself throws a raw AIOOBE on zero-length
      // input, so it must also sit inside the corrupt-stream boundary.
      require(data.nonEmpty, "empty zstd stream")
      val n = com.github.luben.zstd.Zstd.getFrameContentSize(data)
      require(n >= 0 && n <= maxOutput,
        s"zstd declared content size $n outside [0, $maxOutput] " +
          "(corrupt stream or decode bomb)")
      com.github.luben.zstd.Zstd.decompress(data, n.toInt)
    }

  /** F10 PNG codec for uint8 voxels: the 3-D chunk is reshaped to a
    * 2-D grayscale image (x wide, y*z tall — the reference's as2d,
    * chunks.py:279-284) and round-trips losslessly through the
    * JDK's ImageIO PNG support.
    */
  def encodePng(voxels: Array[Byte], sx: Int): Array[Byte] = {
    require(voxels.length % sx == 0, s"${voxels.length} not a multiple of $sx")
    val h = voxels.length / sx
    val img = new java.awt.image.BufferedImage(
      sx, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, sx, h, voxels)
    val bos = new ByteArrayOutputStream(voxels.length / 2 + 64)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodePng(payload: Array[Byte]): Array[Byte] =
    // pure-JVM scanline decoder (one inflate + one defilter pass);
    // ImageIO's generic reader remains the fallback for any stream
    // outside the gray8 envelope — and still enforces the dtype check
    PngDecode.gray8(payload) match {
      case Some((_, _, px)) => px
      case None =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
        require(img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
          s"expected 8-bit gray png, got type ${img.getType}")
        val out = new Array[Byte](img.getWidth * img.getHeight)
        img.getRaster.getDataElements(0, 0, img.getWidth, img.getHeight, out)
        out
    }

  /** F10 16-bit gray png (chunks.py:279-284 — encode_png accepts uint8
    * AND uint16; 16-bit grayscale is the standard microscopy raw
    * format). Input voxels are uint16 values in Longs, F-order, imaged
    * as width sx like the 8-bit variant.
    */
  def encodePng16(voxels: Array[Long], sx: Int): Array[Byte] = {
    require(voxels.length % sx == 0, s"${voxels.length} not a multiple of $sx")
    val h = voxels.length / sx
    val img = new java.awt.image.BufferedImage(
      sx, h, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val data = voxels.map { v =>
      require(v >= 0 && v <= 0xffff, s"value $v out of uint16 range")
      v.toShort
    }
    img.getRaster.setDataElements(0, 0, sx, h, data)
    val bos = new ByteArrayOutputStream(voxels.length + 64)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodePng16(payload: Array[Byte]): Array[Long] =
    PngDecode.gray16(payload) match {
      case Some((_, _, px)) => px
      case None =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
        require(img.getType == java.awt.image.BufferedImage.TYPE_USHORT_GRAY,
          s"expected 16-bit gray png, got type ${img.getType}")
        val out = new Array[Short](img.getWidth * img.getHeight)
        img.getRaster.getDataElements(0, 0, img.getWidth, img.getHeight, out)
        out.map(_ & 0xffffL)
    }

  /** F10 multi-channel png for uint8 chunks: the reference encodes the
    * 4-D (x,y,z,c) chunk as ONE interleaved-pixel image of width x and
    * height y*z — channel c of pixel (x, y + sy*z) is voxel (x,y,z,c)
    * (chunks.py:207-218 as2d reshape + :279-284 encode_png; jpeg uses
    * the same reshape with colorspace RGB when shape[3]>1,
    * chunks.py:341-347). Input is the engine's planar channel-slowest
    * F-order layout; nc must be 3 (RGB) or 4 (RGBA).
    */
  def encodePngChannels(planar: Array[Byte], sx: Int, nc: Int): Array[Byte] = {
    require(nc == 3 || nc == 4, s"png channel count must be 3 or 4, got $nc")
    require(planar.length % (sx * nc) == 0,
      s"${planar.length} bytes not a multiple of $sx*$nc")
    val plane = planar.length / nc
    val h = plane / sx
    val imgType =
      if (nc == 3) java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      else java.awt.image.BufferedImage.TYPE_4BYTE_ABGR
    val img = new java.awt.image.BufferedImage(sx, h, imgType)
    var i = 0
    while (i < plane) {
      val r = planar(i) & 0xff
      val g = planar(i + plane) & 0xff
      val b = planar(i + 2 * plane) & 0xff
      val a = if (nc == 4) planar(i + 3 * plane) & 0xff else 0xff
      img.setRGB(i % sx, i / sx, (a << 24) | (r << 16) | (g << 8) | b)
      i += 1
    }
    val bos = new ByteArrayOutputStream(planar.length / 2 + 64)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a multi-channel png chunk back to planar channel-slowest
    * Long voxels (the raw-encoding layout the cutout loop indexes).
    * Reads through getRGB so any internal raster layout decodes the
    * same way; png is lossless so values round-trip exactly.
    */
  def decodePngChannelsToLongs(payload: Array[Byte], nc: Int): Array[Long] = {
    require(nc == 3 || nc == 4, s"png channel count must be 3 or 4, got $nc")
    // scanline fast path (the getRGB fallback below converts through
    // the color model PER PIXEL — by far the slowest decode loop in
    // the png family); both produce identical planar values
    PngDecode.planar(payload, nc) match {
      case Some(out) => out
      case None =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
        val sx = img.getWidth
        val h = img.getHeight
        val plane = sx * h
        val out = new Array[Long](plane * nc)
        var i = 0
        while (i < plane) {
          val argb = img.getRGB(i % sx, i / sx)
          out(i) = (argb >>> 16) & 0xff
          out(i + plane) = (argb >>> 8) & 0xff
          out(i + 2 * plane) = argb & 0xff
          if (nc == 4) out(i + 3 * plane) = (argb >>> 24) & 0xff
          i += 1
        }
        out
    }
  }

  /** F10 JPEG codec for uint8 image chunks (chunks.py:286-301
    * encode_jpeg; same as2d reshape as png). LOSSY — the reference
    * treats jpeg layers as approximate (test_cloudvolume lossy
    * transfers); round-trips bound the error, never assert equality.
    */
  def encodeJpeg(voxels: Array[Byte], sx: Int, quality: Float = 0.85f)
      : Array[Byte] = {
    require(voxels.length % sx == 0)
    val h = voxels.length / sx
    val img = new java.awt.image.BufferedImage(
      sx, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, sx, h, voxels)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream(voxels.length / 4 + 64)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  def decodeJpeg(payload: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    val gray =
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val gr = g.createGraphics()
        gr.drawImage(img, 0, 0, null)
        gr.dispose()
        g
      }
    val out = new Array[Byte](gray.getWidth * gray.getHeight)
    gray.getRaster.getDataElements(0, 0, gray.getWidth, gray.getHeight, out)
    out
  }

  /** F10 3-channel jpeg: same as2d interleaved-image reshape as the
    * multi-channel png (chunks.py:252-277 encode_jpeg colorspace RGB —
    * the reference accepts only 1 or 3 channels for jpeg), LOSSY like
    * the gray variant: round-trips bound the error, never assert
    * equality. Input planar channel-slowest, nc fixed at 3.
    */
  def encodeJpegChannels(planar: Array[Byte], sx: Int,
      quality: Float = 0.85f): Array[Byte] = {
    require(planar.length % (sx * 3) == 0,
      s"${planar.length} bytes not a multiple of $sx*3")
    val plane = planar.length / 3
    val img = new java.awt.image.BufferedImage(sx, plane / sx,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var i = 0
    while (i < plane) {
      img.setRGB(i % sx, i / sx,
        ((planar(i) & 0xff) << 16) | ((planar(i + plane) & 0xff) << 8) |
          (planar(i + 2 * plane) & 0xff))
      i += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream(planar.length / 4 + 64)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Decode a 3-channel jpeg chunk to planar channel-slowest Longs
    * (chunks.py:341-347 decode_jpeg colorspace RGB for shape[3]>1).
    */
  def decodeJpegChannelsToLongs(payload: Array[Byte]): Array[Long] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    val sx = img.getWidth
    val plane = sx * img.getHeight
    val out = new Array[Long](plane * 3)
    var i = 0
    while (i < plane) {
      val argb = img.getRGB(i % sx, i / sx)
      out(i) = (argb >>> 16) & 0xff
      out(i + plane) = (argb >>> 8) & 0xff
      out(i + 2 * plane) = argb & 0xff
      i += 1
    }
    out
  }

  /** N5's lz4 compression: the jpountz LZ4 block-stream framing the
    * standard Java N5 library writes (Lz4Compression wraps
    * LZ4BlockOutputStream, default 64 KiB blocks); lz4-java ships on
    * the Spark classpath.
    */
  def lz4Block(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val out = new net.jpountz.lz4.LZ4BlockOutputStream(bos, 65536)
    out.write(data); out.close()
    bos.toByteArray
  }

  def unlz4Block(data: Array[Byte],
      maxOutput: Int = MaxDecodedChunkBytes): Array[Byte] = {
    asCorrupt("lz4") {
      val in = new net.jpountz.lz4.LZ4BlockInputStream(
        new ByteArrayInputStream(data))
      try readCapped(in, maxOutput, "lz4") finally in.close()
    }
  }

  /** N5's bzip2 compression (Bzip2Compression delegates to
    * commons-compress, also on the Spark classpath).
    */
  def bzip2(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val out = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  def unbzip2(data: Array[Byte],
      maxOutput: Int = MaxDecodedChunkBytes): Array[Byte] = {
    asCorrupt("bzip2") {
      val in = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorInputStream(new ByteArrayInputStream(data))
      try readCapped(in, maxOutput, "bzip2") finally in.close()
    }
  }

  /** N5's xz compression (XzCompression wraps the org.tukaani LZMA2
    * stream, default preset 6; xz-1.10 ships on the Spark classpath).
    */
  def xz(data: Array[Byte], preset: Int = 6): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val out = new org.tukaani.xz.XZOutputStream(bos,
      new org.tukaani.xz.LZMA2Options(preset))
    out.write(data); out.close()
    bos.toByteArray
  }

  def unxz(data: Array[Byte],
      maxOutput: Int = MaxDecodedChunkBytes): Array[Byte] = {
    asCorrupt("xz") {
      val in = new org.tukaani.xz.XZInputStream(new ByteArrayInputStream(data))
      try readCapped(in, maxOutput, "xz") finally in.close()
    }
  }

  /** F10 npz codec (chunks.py:286-300 encode_npz, :336-338
    * decode_npz): a zlib-wrapped .npy buffer — expressly NOT
    * np.savez; the npy v1 header carries dtype / order / shape
    * metadata that raw tobytes lacks. Chunks serialize 4-D F-order
    * (sx, sy, sz, 1) little-endian, the reference's chunk layout.
    */
  def encodeNpz(voxels: Array[Long], dims: Vec3, dtypeBytes: Int): Array[Byte] = {
    val descr = dtypeBytes match {
      case 1 => "|u1"; case 2 => "<u2"; case 4 => "<u4"; case 8 => "<u8"
      case b => throw new IllegalArgumentException(s"npz dtype bytes $b")
    }
    val dict = s"{'descr': '$descr', 'fortran_order': True, " +
      s"'shape': (${dims.x}, ${dims.y}, ${dims.z}, 1), }"
    // magic(6) + version(2) + hlen(2) + dict + pad + '\n' ≡ 0 mod 64
    val unpadded = 10 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val body = encodeRawFromLongs(voxels, dtypeBytes)
    val buf = java.nio.ByteBuffer.allocate(10 + header.length + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes("US-ASCII"))
    buf.put(1.toByte).put(0.toByte)
    buf.putShort(header.length.toShort)
    buf.put(header.getBytes("US-ASCII"))
    buf.put(body)
    zlibCompress(buf.array())
  }

  /** Inverse of [[encodeNpz]]; validates magic/version/layout and
    * returns (dims, voxels). Accepts 3-D or channel-1 4-D shapes.
    */
  def decodeNpz(payload: Array[Byte]): (Vec3, Array[Long]) = {
    val npy = zlibDecompress(payload)
    require(npy.length > 10 && (npy(0) & 0xff) == 0x93 &&
      new String(npy, 1, 5, "US-ASCII") == "NUMPY", "bad npy magic")
    require(npy(6) == 1, s"npy version ${npy(6)} unsupported")
    val hlen = ((npy(8) & 0xff) | ((npy(9) & 0xff) << 8))
    val header = new String(npy, 10, hlen, "US-ASCII")
    val descrRe = """'descr':\s*'([^']+)'""".r.unanchored
    val orderRe = """'fortran_order':\s*(True|False)""".r.unanchored
    val shapeRe = """'shape':\s*\(([0-9,\s]*)\)""".r.unanchored
    val descr = header match { case descrRe(d) => d
      case _ => throw new IllegalArgumentException("npy header: no descr") }
    val fortran = header match { case orderRe(o) => o == "True"
      case _ => throw new IllegalArgumentException("npy header: no order") }
    require(fortran, "npz chunks are F-order")
    val shape = (header match { case shapeRe(t) => t
      case _ => throw new IllegalArgumentException("npy header: no shape") })
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    require(shape.length == 3 || (shape.length == 4 && shape(3) == 1),
      s"npz shape ${shape.mkString("x")} not a single-channel volume")
    val dtb = descr match {
      case "|u1" | "|i1" => 1; case "<u2" | "<i2" => 2
      case "<u4" | "<i4" => 4; case "<u8" | "<i8" => 8
      case d => throw new IllegalArgumentException(s"npy descr $d")
    }
    val dims = Vec3(shape(0), shape(1), shape(2))
    val body = java.util.Arrays.copyOfRange(npy, 10 + hlen, npy.length)
    val vox = decodeRawToLongs(body, dtb)
    require(vox.length == dims.x * dims.y * dims.z,
      s"npz body ${vox.length} voxels != $dims")
    (dims, vox)
  }

  /** Default second-stage compression per encoding
    * (datasource/precomputed/common.py:18-29 should_compress): lossless
    * voxel codecs get gzip; already-compressed image codecs get none.
    */
  def shouldCompress(encoding: String): Boolean = encoding match {
    case "raw" | "compressed_segmentation" | "compresso" | "crackle" => true
    case "jpeg" | "jxl" | "png" | "fpzip" | "kempressed" | "zfpc" => false
    case _ => false
  }

  /** F12: HTTP Content-Type per chunk encoding
    * (datasource/precomputed/common.py:7-16).
    */
  def contentType(encoding: String): String = encoding match {
    case "jpeg" => "image/jpeg"
    case "png" => "image/png"
    case "jxl" => "image/jxl"
    case "compresso" | "compressed_segmentation" | "fpzip" |
        "kempressed" | "zfpc" | "crackle" => s"image/x.$encoding"
    case _ => "application/octet-stream"
  }

  /** F12: cdn_cache setting -> Cache-Control header
    * (common.py:32-53). None/absent and `true` mean the 1-hour
    * default, `false` and 0 mean no-cache, a positive int is a
    * max-age, a string passes through, negatives reject.
    */
  def cdnCacheControl(v: Option[Any]): String = v match {
    case None | Some(true) => "max-age=3600, s-max-age=3600"
    case Some(false) => "no-cache"
    case Some(s: String) => s
    case Some(i: Int) if i == 0 => "no-cache"
    case Some(i: Int) if i > 0 => s"max-age=$i, s-max-age=$i"
    case Some(i: Int) =>
      throw new IllegalArgumentException(
        s"cdn_cache must be a positive integer, boolean, or string. Got: $i")
    case Some(other) =>
      throw new IllegalArgumentException(
        s"${other.getClass} is not a supported cache_control setting.")
  }
}
