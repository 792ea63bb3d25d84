package graft

import graft.core.Brotli
import java.nio.file.{Files, Paths}

/** Dump (raw, own-encoder .br) pairs for the C-decoder cross-check:
  * `sbt "Test/runMain graft.BrotliEncodeDump"` then
  * `python3 tools/brotli_encoder_check.py` decodes every .br with
  * libbrotlidec 1.0.9 and asserts byte equality — the encoder-side
  * mirror of BrotliSpec's golden-stream decoder parity.
  */
object BrotliEncodeDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/brotli_enc_check")
    Files.createDirectories(outDir)
    val streams = Paths.get("src/test/resources/golden/brotli_streams")
    val manifest = Files.readAllLines(streams.resolve("MANIFEST.tsv"))
    var n = 0
    manifest.forEach { line =>
      val base = line.split("\t")(0)
      val raw = Files.readAllBytes(streams.resolve(base + ".raw"))
      Files.write(outDir.resolve(base + ".raw"), raw)
      Files.write(outDir.resolve(base + ".br"), Brotli.compress(raw))
      n += 1
    }
    // a multi-meta-block case (> 2^24 bytes) and a high-entropy large one
    val rnd = new scala.util.Random(42)
    val big = new Array[Byte]((1 << 24) + 123456)
    var i = 0
    while (i < big.length) { big(i) = ((i * 31) % 251).toByte; i += 1 }
    Files.write(outDir.resolve("big_multiblock.raw"), big)
    Files.write(outDir.resolve("big_multiblock.br"), Brotli.compress(big))
    val noise = new Array[Byte](300000)
    rnd.nextBytes(noise)
    Files.write(outDir.resolve("big_noise.raw"), noise)
    Files.write(outDir.resolve("big_noise.br"), Brotli.compress(noise))
    // RAW entropy streams (no size gate / stored fallback): the
    // degenerate-cl-code regime (near-uniform random literals) only
    // exercises the entropy writer when the oversized stream is kept —
    // exactly the stream shape the r16 fuzz caught desyncing, now
    // C-checked directly
    var extra = 2
    for ((name, size) <- Seq(("ent_noise_64k", 65537),
        ("ent_noise_4k", 4096), ("ent_noise_300k", 300000))) {
      val p = new Array[Byte](size)
      rnd.nextBytes(p)
      try {
        val enc = Brotli.compressEntropy(p)
        Files.write(outDir.resolve(name + ".raw"), p)
        Files.write(outDir.resolve(name + ".br"), enc)
        extra += 1
      } catch { case _: RuntimeException => () } // legitimate give-up
    }
    println(s"dumped ${n + extra} pairs to $outDir")
  }
}
