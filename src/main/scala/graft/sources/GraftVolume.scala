package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Bbox, CloudPath, Vec3}

/** S1 plugin-dispatch open (cloudvolume.py:78-302 + the
  * REGISTERED_IMAGE_PLUGINS registry at :25-35): parse the cloudpath,
  * dispatch to the format's reader. Only file:// is reachable in this
  * environment; the parse/dispatch layer is protocol-agnostic.
  */
object GraftVolume {

  /** Open a layer as its chunk-table DataFrame (precomputed) or voxel
    * table (zarr3 — chunkless logical model).
    */
  def open(spark: SparkSession, cloudpath: String): DataFrame = {
    val p = CloudPath.parse(cloudpath)
    require(p.protocol == "file",
      s"protocol ${p.protocol} not reachable here (zero egress); use file://")
    val dir = p.localPath
    p.format match {
      case "precomputed" => PrecomputedIO.readChunks(spark, dir)
      case "zarr3" | "zarr" =>
        val m = Zarr3IO.readMeta(dir)
        Zarr3IO.cutoutVoxels(spark, dir, Bbox(Vec3(0, 0, 0), m.shape))
      case f => throw new IllegalArgumentException(
        s"format $f has no registered reader (graphene/n5/boss: see SURVEY §2.1)")
    }
  }
}
