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
    // ENCODER throughput (the write-lane cost): the bench's brotli
    // write family pays compress() per chunk — report MB/s per input
    // regime so the write_MBps_brotli number has an engine-side floor
    println("-- encoder --")
    val encCases = Seq(
      ("zeros_2m", Array.fill(2 << 20)(0.toByte)),
      ("seg_u32_2m", Array.tabulate(2 << 20)(i =>
        (Array(7, 0, 0, 0)((i & 3)) + (i >> 14)).toByte)),
      ("random_1m", { val r = new scala.util.Random(1); val a = new Array[Byte](1 << 20); r.nextBytes(a); a }))
    for ((name, raw) <- encCases) {
      (1 to 3).foreach(_ => Brotli.compress(raw))
      val reps = math.max(3, (16 << 20) / raw.length)
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { Brotli.compress(raw); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      val enc = Brotli.compress(raw)
      val mbps = raw.length.toDouble * reps / dt / 1e6
      println(f"$name%-28s raw=${raw.length}%7d -> ${enc.length}%8d  ${mbps}%8.1f MB/s")
    }
  }
}
