package graft.ops

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Vec3

/** F19 save_images (lib.py:1015-1117): serialize a voxel table into
  * one grayscale PNG per slice along an axis, for visualization.
  *
  * Spark shape: ONE shuffle — pixels group by (slice, channel) via
  * groupByKey, and each slice becomes one task that normalizes,
  * rasterizes, and writes its file. No driver-side pixel loop; the
  * only driver work under global normalization is a 2-value min/max
  * aggregate (metadata-sized). At 100 TB the export parallelism is
  * the slice count, which is the natural unit of the output format.
  *
  * Axis orientation mirrors the reference exactly:
  * - axis z applies rot90(counterclockwise) then flipud
  *   (lib.py:1092-1096) — which composes to a transpose, so the saved
  *   pixel (col, row) = voxel (x, y) of the slice;
  * - axis x slices are (y, z) arrays and axis y slices (x, z) arrays
  *   saved as-is, i.e. pixel (col=z, row=y) resp. (col=z, row=x).
  *
  * Normalization follows normalize_float (lib.py:1062-1069) with
  * integer-exact math so a SQL oracle can replay it: u8 =
  * (v - lo) * 255 / (hi - lo) floor-divided, with the degenerate
  * hi == lo case pinned to 0 (the reference's 0/0 -> NaN -> uint8 0).
  * `globalNorm` picks volume-wide (lo, hi) computed once; otherwise
  * each (slice, channel) normalizes independently (lib.py:1087-1089).
  *
  * The reference normalizes ONLY floating dtypes (the
  * `np.issubdtype(image.dtype, np.floating)` gates at lib.py:1064 and
  * :1087) — integer volumes pass through to the rasterizer unchanged.
  * `normalize = false` models that path: values are written as-is,
  * clamped to the u8 raster range (exact for uint8 sources, which is
  * what the passthrough is for).
  *
  * Filenames: zero-padded "<level>.png", prefixed "<channel>-" when
  * the input carries a channel column (lib.py:1107-1110).
  *
  * @param voxels (x, y, z[, c], value) rows; absent positions render
  *               as background 0 (the raster starts zeroed)
  * @param shape  full (x, y, z) extents — fixes the image dimensions
  *               like the reference's image.shape
  * @return one row per written file:
  *         (level, c, filename, width, height, pxsum) where pxsum is
  *         the sum of written u8 values — the replayable checksum
  */
object SaveImages {

  // memory-cache ImageIO streams (see core/Codec.scala)
  javax.imageio.ImageIO.setUseCache(false)

  def saveImages(s: SparkSession, voxels: DataFrame, dir: String,
      shape: Vec3, axis: String = "z", globalNorm: Boolean = true,
      normalize: Boolean = true): DataFrame = {
    require(Set("x", "y", "z").contains(axis), s"axis $axis not in x,y,z")
    Files.createDirectories(Paths.get(dir))
    import s.implicits._
    val hasC = voxels.columns.contains("c")
    val base =
      if (hasC) voxels.select(col("x"), col("y"), col("z"), col("c"),
        col("value"))
      else voxels.select(col("x"), col("y"), col("z"), lit(0L).as("c"),
        col("value"))
    val (lvlCol, colCol, rowCol, w, h) = axis match {
      case "z" => ("z", "x", "y", shape.x, shape.y)
      case "y" => ("y", "z", "x", shape.z, shape.x)
      case "x" => ("x", "z", "y", shape.z, shape.y)
    }
    // global normalization bounds: a 2-long aggregate, computed once
    val gmm: Option[(Long, Long)] =
      if (!normalize || !globalNorm) None
      else {
        val r = base.agg(min(col("value")), max(col("value"))).head()
        Some((r.getLong(0), r.getLong(1)))
      }
    val doNorm = normalize
    val dirStr = dir
    val wi = w.toInt
    val hi = h.toInt
    base
      .select(col(lvlCol).as("level"), col("c"), col(colCol).as("px"),
        col(rowCol).as("py"), col("value"))
      .as[(Long, Long, Long, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Long, Long),
          rows: Iterator[(Long, Long, Long, Long, Long)]) =>
        val (level, c) = key
        val buf = rows.toArray
        val (lo, hiV) =
          if (!doNorm) (0L, 0L)
          else gmm.getOrElse {
            var mn = Long.MaxValue; var mx = Long.MinValue
            buf.foreach { r =>
              if (r._5 < mn) mn = r._5
              if (r._5 > mx) mx = r._5
            }
            (mn, mx)
          }
        val img = new java.awt.image.BufferedImage(
          wi, hi, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var pxsum = 0L
        buf.foreach { r =>
          val u8 =
            if (!doNorm) math.min(math.max(r._5, 0L), 255L)
            else if (hiV == lo) 0L
            else (r._5 - lo) * 255 / (hiV - lo)
          pxsum += u8
          raster.setSample(r._3.toInt, r._4.toInt, 0, u8.toInt)
        }
        val fname = (if (hasC) s"$c-" else "") + f"$level%05d.png"
        javax.imageio.ImageIO.write(img, "png",
          new java.io.File(dirStr, fname))
        (level, c, fname, w, h, pxsum)
      }
      .toDF("level", "c", "filename", "width", "height", "pxsum")
  }
}
