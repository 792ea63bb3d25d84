package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Brotli
import java.nio.file.{Files, Paths}

/** Full RFC 7932 decoder (see core/Brotli.scala).  The load-bearing
  * evidence is golden-stream parity: 90 committed (raw, br) pairs were
  * produced and round-trip-verified by the reference C encoder/decoder
  * (libbrotlienc/dec 1.0.9 via tools/brotli_extract_tables.py) across
  * qualities 0/1/2/4/5/9/11, windows 10/18/22/24, generic/text/font
  * modes, forced NPOSTFIX/NDIRECT distance schemes, and text /
  * dictionary-heavy / UTF-8 / binary / random payloads — every one
  * must decode byte-identically here.
  */
class BrotliSpec extends AnyFunSuite {

  private val streamsDir = Paths.get("src/test/resources/golden/brotli_streams")

  test("golden parity: every committed C-encoded stream decodes byte-identically") {
    val manifest = Files.readAllLines(streamsDir.resolve("MANIFEST.tsv"))
    assert(manifest.size >= 70)
    var totalRaw = 0L
    manifest.forEach { line =>
      val Array(base, rawLen, _) = line.split("\t")
      val raw = Files.readAllBytes(streamsDir.resolve(base + ".raw"))
      val br = Files.readAllBytes(streamsDir.resolve(base + ".br"))
      assert(raw.length == rawLen.toInt, base)
      val dec = Brotli.decompress(br)
      assert(dec.sameElements(raw), s"$base: decoded ${dec.length} bytes != ${raw.length}")
      totalRaw += raw.length
    }
    assert(totalRaw > 1000000L) // the corpus is not trivial
  }

  test("dictionary transforms match the reference implementation (180 goldens)") {
    val lines = Files.readAllLines(
      Paths.get("src/test/resources/golden/brotli_transform_golden.tsv"))
    assert(lines.size == 180)
    def unesc(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 3 < s.length && s.charAt(i + 1) == 'x') {
          out.write(Integer.parseInt(s.substring(i + 2, i + 4), 16)); i += 4
        } else { out.write(s.charAt(i).toInt); i += 1 }
      }
      out.toByteArray
    }
    lines.forEach { line =>
      val parts = line.split("\t", -1)
      val (len, widx, tid) = (parts(0).toInt, parts(1).toInt, parts(2).toInt)
      val expected = unesc(if (parts.length > 3) parts(3) else "")
      val got = Brotli.transformDictWord(len, widx, tid)
      assert(got.sameElements(expected), s"len=$len widx=$widx tid=$tid: " +
        s"got ${new String(got, "ISO-8859-1")} want ${new String(expected, "ISO-8859-1")}")
    }
  }

  test("roundtrip through own encoders: empty, small, multi-pattern") {
    Seq(
      Array.emptyByteArray,
      "hello brotli".getBytes("UTF-8"),
      Array.tabulate(65537)(i => (i * 31 % 251).toByte),
      Array.fill(1 << 20)(0x5a.toByte)
    ).foreach { payload =>
      assert(Brotli.decompress(Brotli.compress(payload)).sameElements(payload))
      assert(Brotli.decompress(Brotli.compressStored(payload)).sameElements(payload))
    }
  }

  test("entropy encoder compresses and roundtrips every golden raw payload") {
    val manifest = Files.readAllLines(streamsDir.resolve("MANIFEST.tsv"))
    var wins = 0
    var n = 0
    manifest.forEach { line =>
      val base = line.split("\t")(0)
      val raw = Files.readAllBytes(streamsDir.resolve(base + ".raw"))
      val enc = Brotli.compress(raw)
      assert(Brotli.decompress(enc).sameElements(raw), base)
      if (raw.length > 256) {
        n += 1
        if (enc.length < raw.length) wins += 1
      }
    }
    // entropy coding must actually WIN on the compressible corpus (the
    // random payloads legitimately fall back toward stored mode)
    assert(wins * 10 >= n * 8, s"only $wins of $n payloads compressed")
    // and decisively on run-heavy segmentation bytes
    val seg = Files.readAllBytes(streamsDir.resolve("053_seg_u32_q9_w22_m0.raw"))
    val segEnc = Brotli.compress(seg)
    assert(segEnc.length * 10 < seg.length,
      s"seg payload ${seg.length} -> ${segEnc.length}: expected >10x")
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

  test("compress picks the minimal MNIBBLES (RFC 7932 §9.2)") {
    // 4-byte block -> 4 nibbles: header 1+1+2+16+1 = 21 bits = 3 bytes,
    // + 4 payload + 1 closing ISLAST/ISLASTEMPTY byte = 8 total
    assert(Brotli.compressStored("DATA".getBytes).length == 8)
    // 70000-byte block (> 2^16, <= 2^20) -> 5 nibbles: header 25 bits
    // = 4 bytes, + payload + 1
    assert(Brotli.compressStored(new Array[Byte](70000)).length == 70000 + 5)
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

  test("large-window extension marker is rejected loudly") {
    // WBITS bits '1' + '000' + '001' is the large-window marker
    val b0 = (1 | (0 << 1) | (1 << 4)).toByte // bits: 1,000,001 LSB-first
    val e = intercept[IllegalArgumentException](Brotli.decompress(Array(b0, 0, 0)))
    assert(e.getMessage.contains("large-window"))
  }

  test("output ceiling rejects decode bombs instead of allocating") {
    val br = Files.readAllBytes(streamsDir.resolve("032_text_q11_w22_m0.br"))
    val full = Brotli.decompress(br)
    assert(full.length == 4000)
    val e = intercept[IllegalArgumentException](Brotli.decompress(br, 1000))
    assert(e.getMessage.contains("ceiling"))
    assert(Brotli.decompress(br, 4000).sameElements(full)) // exact fit passes
  }

  test("corruption fuzz: flipped/truncated streams terminate with an error or bounded output") {
    val rnd = new scala.util.Random(20260815)
    val bases = Seq("027_text_q5_w22_m0", "053_seg_u32_q9_w22_m0",
      "040_dictheavy_q11_w22_m0", "067_repeats_q9_w22_m0")
    for (base <- bases) {
      val br = Files.readAllBytes(streamsDir.resolve(base + ".br"))
      val rawLen = Files.readAllBytes(streamsDir.resolve(base + ".raw")).length
      for (_ <- 1 to 200) {
        val mutated = br.clone()
        rnd.nextInt(3) match {
          case 0 => // single bit flip
            val i = rnd.nextInt(mutated.length)
            mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
          case 1 => // random byte splat
            mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
          case _ => // handled below via truncation
        }
        val input = if (rnd.nextBoolean()) mutated
          else java.util.Arrays.copyOf(mutated, 1 + rnd.nextInt(mutated.length))
        // any outcome is fine EXCEPT a hang, a crash outside the decoder's
        // declared error type, or output past the ceiling
        try {
          val out = Brotli.decompress(input, maxOutput = rawLen * 4 + 1024)
          assert(out.length <= rawLen * 4 + 1024)
        } catch {
          case _: IllegalArgumentException => // rejected cleanly: fine
        }
      }
    }
  }

  test("truncated stream fails") {
    val enc = Brotli.compressStored("payload payload".getBytes)
    intercept[IllegalArgumentException](
      Brotli.decompress(java.util.Arrays.copyOf(enc, enc.length - 3)))
    // and a truncated entropy-coded stream from the golden corpus
    val br = Files.readAllBytes(streamsDir.resolve("027_text_q5_w22_m0.br"))
    intercept[Exception](Brotli.decompress(java.util.Arrays.copyOf(br, br.length / 2)))
  }
}
