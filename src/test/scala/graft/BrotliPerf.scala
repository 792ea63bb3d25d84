package graft

import graft.core.Brotli
import java.nio.file.{Files, Paths}

/** Throughput probe for the RFC 7932 decoder (dev tool, not a spec):
  * `sbt "Test/runMain graft.BrotliPerf"`. Reports decoded MB/s per
  * golden payload family so a slow hot loop shows up as a number, not
  * a hunch. The `br` chunk-read lane at scale pays exactly this cost.
  */
object BrotliPerf {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/golden/brotli_streams")
    val cases = Seq(
      "053_seg_u32_q9_w22_m0",   // binary segmentation (the chunk shape)
      "054_seg_u32_q11_w22_m0",
      "032_text_q11_w22_m0",     // dictionary/text heavy
      "061_random_q11_w22_m0",   // incompressible -> literal-loop bound
      "068_repeats_q11_w22_m0")  // copy-loop bound
    for (base <- cases) {
      val br = Files.readAllBytes(dir.resolve(base + ".br"))
      val raw = Files.readAllBytes(dir.resolve(base + ".raw"))
      // warm
      (1 to 50).foreach(_ => Brotli.decompress(br))
      val reps = math.max(20, (64 << 20) / math.max(raw.length, 1))
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { Brotli.decompress(br); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      val mbps = raw.length.toDouble * reps / dt / 1e6
      println(f"$base%-28s raw=${raw.length}%7d reps=$reps%5d  ${mbps}%8.1f MB/s")
    }
  }
}
