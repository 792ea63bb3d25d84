package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Codec, Vec3}
import graft.ops.SaveImages

/** F19 save_images export: written PNGs decode back to the expected
  * normalized pixels (lib.py:1015-1117), for both normalization modes
  * and the z-axis rot90+flipud orientation (which composes to pixel
  * (col=x, row=y)).
  */
class SaveImagesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-saveimages")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 3x2x2 volume, values = 10*(x + 3*(y + 2*z)) so every position is
  // distinct and min/max differ per slice
  private def voxels() = {
    import spark.implicits._
    val rows = for {
      z <- 0L until 2L; y <- 0L until 2L; x <- 0L until 3L
    } yield (x, y, z, 10L * (x + 3 * (y + 2 * z)))
    rows.toDF("x", "y", "z", "value")
  }

  private def norm(v: Long, lo: Long, hi: Long): Long =
    if (hi == lo) 0L else (v - lo) * 255 / (hi - lo)

  test("per-slice normalize: each z level spans the full u8 range") {
    val dir = Files.createTempDirectory("si_slice").toString
    val out = SaveImages.saveImages(spark, voxels(), dir, Vec3(3, 2, 2),
      axis = "z", globalNorm = false).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L).getString(2) == "00000.png")
    for (z <- 0L until 2L) {
      val px = Codec.decodePng(
        Files.readAllBytes(Paths.get(dir, f"$z%05d.png")))
      // slice z values span [10*6z, 10*(6z+5)]
      val lo = 60L * z; val hi = 60L * z + 50L
      var sum = 0L
      for (y <- 0L until 2L; x <- 0L until 3L) {
        val want = norm(10L * (x + 3 * (y + 2 * z)), lo, hi)
        // pixel (col=x, row=y): raster is row-major width 3
        assert((px((y * 3 + x).toInt) & 0xffL) == want,
          s"z=$z x=$x y=$y")
        sum += want
      }
      assert(out(z).getLong(5) == sum) // pxsum matches written bytes
    }
  }

  test("global normalize uses volume-wide bounds") {
    val dir = Files.createTempDirectory("si_global").toString
    SaveImages.saveImages(spark, voxels(), dir, Vec3(3, 2, 2),
      axis = "z", globalNorm = true).collect()
    val px0 = Codec.decodePng(Files.readAllBytes(Paths.get(dir, "00000.png")))
    // global range is [0, 110]; slice 0's max (50) must NOT hit 255
    assert((px0(5) & 0xffL) == norm(50, 0, 110))
    assert((px0(5) & 0xffL) != 255L)
  }

  test("axis x slices save pixel (col=z, row=y)") {
    val dir = Files.createTempDirectory("si_x").toString
    SaveImages.saveImages(spark, voxels(), dir, Vec3(3, 2, 2),
      axis = "x", globalNorm = true).collect()
    assert(Files.exists(Paths.get(dir, "00002.png")))
    val px = Codec.decodePng(Files.readAllBytes(Paths.get(dir, "00001.png")))
    // image is width=sz=2, height=sy=2; voxel (x=1,y=1,z=0) at row 1 col 0
    assert((px(2) & 0xffL) == norm(10L * (1 + 3), 0, 110))
  }
}
