package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property fuzzing of the brotli encoder↔decoder loop at corpus
  * scale (r15 verdict item 6): the golden suite proves C-parity on 90
  * committed streams, but the decoder is 1,000+ lines of bit-twiddling
  * on the hot read path and the encoder feeds the write lane — random
  * payloads across the regimes a chunk store actually sees must
  * roundtrip byte-identically, and mutated/truncated streams must fail
  * loudly, never hang or overrun the output ceiling.
  *
  * Lives in package graft.core so [[Brotli.compressEntropy]] is
  * reachable DIRECTLY: `compress()` self-verifies and silently falls
  * back to stored mode, which would shield an entropy-writer bug from
  * a roundtrip assertion.
  */
class BrotliPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x67726166L) // deterministic

  /** Payload generators per content regime. */
  private def randomBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  private def repetitive(n: Int): Array[Byte] = {
    // random run-length stretches over a tiny alphabet — the
    // copy-command regime (segmentation runs, padded volumes)
    val a = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val run = 1 + rnd.nextInt(512)
      val b = (rnd.nextInt(5) * 47).toByte
      var j = 0
      while (j < run && i < n) { a(i) = b; i += 1; j += 1 }
    }
    a
  }

  private def textLike(n: Int): Array[Byte] = {
    // words from a small vocabulary — the literal+dictionary regime
    val vocab = Array("the", "quick", "label", "chunk", "of", "and",
      "segmentation", "mesh", "graft", "volume", "a", "to")
    val sb = new StringBuilder
    while (sb.length < n)
      sb.append(vocab(rnd.nextInt(vocab.length))).append(' ')
    sb.toString.getBytes("UTF-8").take(n)
  }

  private def segLike(n: Int): Array[Byte] = {
    // little-endian u32 labels with small deltas — the voxel-payload
    // regime (what the chunk write lane actually compresses)
    val a = new Array[Byte](n)
    var v = 1000
    var i = 0
    while (i + 3 < n) {
      if (rnd.nextInt(8) == 0) v += rnd.nextInt(3) - 1
      a(i) = v.toByte; a(i + 1) = (v >> 8).toByte
      a(i + 2) = (v >> 16).toByte; a(i + 3) = (v >> 24).toByte
      i += 4
    }
    a
  }

  private val sizes =
    Seq(0, 1, 2, 3, 33, 1024, 65537, 1 << 20, (4 << 20) + 17)
  private val regimes = Seq[(String, Int => Array[Byte])](
    ("random", randomBytes), ("repetitive", repetitive),
    ("text", textLike), ("seg_u32", segLike))

  test("compress->decompress byte-equality across regimes and sizes 0..4MiB") {
    for ((name, gen) <- regimes; n <- sizes) {
      val raw = gen(n)
      val enc = Brotli.compress(raw)
      val dec = Brotli.decompress(enc, math.max(raw.length, 64))
      assert(dec.sameElements(raw), s"$name/$n: roundtrip mismatch")
    }
  }

  test("entropy encoder output (no stored fallback) decodes byte-identically") {
    // drive compressEntropy directly: when it produces a stream, that
    // stream must decode to the input with no self-verify safety net
    var produced = 0
    for ((name, gen) <- regimes; n <- sizes if n > 0) {
      val raw = gen(n)
      val enc =
        try Brotli.compressEntropy(raw)
        catch { case _: RuntimeException => null } // legitimate give-up
      if (enc != null) {
        produced += 1
        val dec = Brotli.decompress(enc, raw.length)
        assert(dec.sameElements(raw), s"$name/$n: entropy stream mismatch")
      }
    }
    // the entropy writer must actually engage on the compressible
    // regimes, or this test silently tests nothing
    assert(produced >= 20, s"entropy encoder produced only $produced streams")
  }

  test("mutation/truncation of own-encoded streams fails loudly within the ceiling") {
    // the golden fuzz mutates C-encoded streams; this mutates OUR
    // encoder's output — different code paths dominate (our encoder
    // leans on block splits and stored-mode trailers)
    for ((name, gen) <- Seq[(String, Int => Array[Byte])](
        ("repetitive", repetitive), ("text", textLike),
        ("seg_u32", segLike)); n <- Seq(1024, 65537)) {
      val raw = gen(n)
      val enc = Brotli.compress(raw)
      val ceiling = raw.length * 4 + 1024
      for (_ <- 1 to 300) {
        val mutated = enc.clone()
        rnd.nextInt(3) match {
          case 0 =>
            val i = rnd.nextInt(mutated.length)
            mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
          case _ => ()
        }
        val input = if (rnd.nextBoolean()) mutated
          else java.util.Arrays.copyOf(mutated, 1 + rnd.nextInt(mutated.length))
        try {
          val out = Brotli.decompress(input, maxOutput = ceiling)
          assert(out.length <= ceiling, s"$name/$n: ceiling overrun")
        } catch {
          case _: IllegalArgumentException => // clean rejection
          case _: ArrayIndexOutOfBoundsException =>
            fail(s"$name/$n: decoder escaped its own bounds checks")
        }
      }
    }
  }

  test("decoder never reads past a truncated buffer (every cut point, small stream)") {
    val raw = textLike(512)
    val enc = Brotli.compress(raw)
    for (cut <- 0 until enc.length) {
      val t = java.util.Arrays.copyOf(enc, cut)
      try {
        val out = Brotli.decompress(t, maxOutput = 4096)
        assert(out.length <= 4096)
      } catch {
        case _: IllegalArgumentException => // clean rejection
      }
    }
  }
}
